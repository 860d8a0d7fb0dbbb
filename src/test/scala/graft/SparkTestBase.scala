package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** One shared local SparkSession across all suites (getOrCreate reuses). */
trait SparkTestBase extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkTestBase.session
  val sfDir = "/root/testdata/sf0.001"

  /** Does any physical node satisfy `p`, recursing THROUGH AQE query-stage
    * boundaries (QueryStageExec is a leaf whose materialized subtree lives
    * in a field, so a plain `exists` never sees inside committed stages).
    */
  def planExists(
      plan: org.apache.spark.sql.execution.SparkPlan
  )(p: org.apache.spark.sql.execution.SparkPlan => Boolean): Boolean =
    plan.exists {
      case n if p(n) => true
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        planExists(a.executedPlan)(p)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        planExists(q.plan)(p)
      case _ => false
    }
}

object SparkTestBase {
  lazy val session: SparkSession = {
    val b = SparkSession
      .builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
    graft.sources.Tables.sessionConfigs.foreach { case (k, v) => b.config(k, v) }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
