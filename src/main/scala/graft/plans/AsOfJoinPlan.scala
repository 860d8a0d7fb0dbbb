package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending,
  Attribute,
  GenericInternalRow,
  JoinedRow,
  RowOrdering,
  SortOrder,
  UnsafeProjection
}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Native backward as-of join — the plan-level showcase operator: a custom
  * `LogicalPlan` node, a `Strategy`, and a physical merge operator,
  * registered via [[graft.GraftExtensions]] (builder path) or lazily by
  * [[graft.operators.AsOfJoin.asofBackwardNative]] (running sessions).
  *
  * Physical shape: both sides hash-clustered on the match key and sorted
  * by (key, time) — EXACTLY the exchanges + sorts the union+window
  * composition ([[graft.operators.AsOfJoin.asofBackward]]) pays — then a
  * single streaming MERGE pass per partition: O(|L| + |R|) pointer walk,
  * one carried right row of state, no union row-blowup, no window
  * buffering, no post-filter. The composition remains the semantics twin
  * (spec-asserted equal); this node is the plan you'd want at 100 TB: the
  * two sorted scans stream, memory is O(1) per partition, and AQE still
  * owns the exchanges (skew/coalesce) because the node declares standard
  * `ClusteredDistribution` requirements.
  *
  * Hot-key note (shared with every order-dependent operator —
  * [[graft.operators.AsOfJoin.gapFill]] documents the same): one monster
  * key serializes its own partition's merge, and salting cannot apply
  * because the carry is order-dependent within the key. The node is
  * multi-key so that exposure has an OPERATOR answer, not a scaladoc one:
  * [[graft.operators.AsOfJoin.asofBackwardChunked]] appends an automatic
  * time-epoch chunk column to the key list (seed rows carry state across
  * chunk boundaries), spreading the monster key over nChunks independent
  * merge partitions.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    leftTime: Attribute,
    rightKeys: Seq[Attribute],
    rightTime: Attribute,
    rightValues: Seq[Attribute]
) extends BinaryNode {
  require(leftKeys.nonEmpty && leftKeys.size == rightKeys.size, "as-of key column counts differ")
  leftKeys.zip(rightKeys).foreach { case (l, r) =>
    require(
      l.dataType == r.dataType,
      s"as-of key types differ: ${l.dataType} vs ${r.dataType}"
    )
  }
  require(
    leftTime.dataType == rightTime.dataType,
    s"as-of time types differ: ${leftTime.dataType} vs ${rightTime.dataType}"
  )
  require(
    leftKeys.forall(k => RowOrdering.isOrderable(k.dataType)) &&
      RowOrdering.isOrderable(leftTime.dataType),
    "as-of key/time types must be orderable"
  )
  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan,
      newRight: LogicalPlan
  ): AsOfJoinNode = copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinNode]] to [[AsOfJoinExec]]; a no-op on everything else. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, lt, rk, rt, rv) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lt, rk, rt, rv) :: Nil
    case _ => Nil
  }
}

/** Streaming as-of merge over co-partitioned, (key, time)-sorted children.
  *
  * Per partition both iterators are sorted by (key, time); the merge keeps
  * ONE carried right row: advance the right pointer while its (key, time)
  * is lexicographically <= the left row's — recording the row whenever its
  * key equals the left key — then emit the left row joined to the carried
  * values (nulls when no right row at or before it). Right rows for keys
  * the left side has passed can never match again (sorted), so they drop
  * as they stream; nothing is ever buffered.
  *
  * Null keys group together (ordering-based equality), matching the
  * union+window twin's `partitionBy` semantics, and ties at the same
  * (key, time) carry the LAST right row in sort order — also the twin's
  * behavior.
  */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Attribute],
    leftTime: Attribute,
    rightKeys: Seq[Attribute],
    rightTime: Attribute,
    rightValues: Seq[Attribute]
) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending)
  )

  // the merge preserves the left side's partitioning and ordering — a
  // downstream groupBy/join on the same key re-uses the exchange
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending)

  protected override def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val outAttrs = output
    val (lKeys, lTime, rKeys, rTime, rVals) = (leftKeys, leftTime, rightKeys, rightTime, rightValues)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val keyTimeOrd =
        RowOrdering.createNaturalAscendingOrdering(lKeys.map(_.dataType) :+ lTime.dataType)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeys.map(_.dataType))
      val lKeyTime = UnsafeProjection.create(lKeys :+ lTime, leftOut)
      val rKeyTime = UnsafeProjection.create(rKeys :+ rTime, rightOut)
      val lKey = UnsafeProjection.create(lKeys, leftOut)
      val rKey = UnsafeProjection.create(rKeys, rightOut)
      val rVal = UnsafeProjection.create(rVals, rightOut)
      // bind the result projection against NULLABLE right values: the
      // no-match case emits an all-null row, and a nullable=false input
      // attribute would make the projection skip its null check and read
      // garbage zeros out of it
      val resultProj =
        UnsafeProjection.create(outAttrs, leftOut ++ rVals.map(_.withNullability(true)))
      val nullRow = new GenericInternalRow(rVals.size)
      val joined = new JoinedRow

      var rRow: InternalRow = if (rIter.hasNext) rIter.next() else null
      var carried: InternalRow = null
      var carriedKey: InternalRow = null

      lIter.map { l =>
        val lkt = lKeyTime(l)
        while (rRow != null && keyTimeOrd.compare(rKeyTime(rRow), lkt) <= 0) {
          if (keyOrd.compare(rKey(rRow), lKey(l)) == 0) {
            carried = rVal(rRow).copy()
            carriedKey = rKey(rRow).copy()
          }
          rRow = if (rIter.hasNext) rIter.next() else null
        }
        if (carried != null && keyOrd.compare(carriedKey, lKey(l)) != 0) {
          carried = null
          carriedKey = null
        }
        resultProj(joined(l, if (carried == null) nullRow else carried))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan,
      newRight: SparkPlan
  ): AsOfJoinExec = copy(left = newLeft, right = newRight)
}
