package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

/** Data-quality profiling for corpus pipelines: one pass over a table
  * producing per-column null counts, numeric min/max, and string distinct
  * counts — the audit step that gates a 100 TB ingest before it fans out.
  *
  * Plan-shape honesty: nulls/min/max are decomposable (single partial-
  * aggregated scan), but EXACT multi-column distinct counts plan through
  * Catalyst's Expand — the input is replicated once per distinct column
  * before the shuffle. That is the price of exactness (and what the
  * driver's DuckDB oracle checks); at 100 TB pass `approx = true` to
  * swap in `approx_count_distinct` (HLL, fully decomposable, one scan
  * with no Expand) once exactness stops being worth the replication.
  */
object Audit {

  /** Wide one-row profile: `n_rows` plus, per column, `<c>_nulls`;
    * numerics add `<c>_min`/`<c>_max`; strings add `<c>_distinct`.
    */
  def profile(df: DataFrame, approx: Boolean = false): DataFrame = {
    val aggs = df.schema.fields.flatMap { f =>
      val c = col(f.name)
      val base = Seq(count(when(c.isNull, 1)).as(s"${f.name}_nulls"))
      f.dataType match {
        case _: NumericType =>
          base ++ Seq(min(c).as(s"${f.name}_min"), max(c).as(s"${f.name}_max"))
        case StringType =>
          val distinct =
            if (approx) approx_count_distinct(c) else countDistinct(c)
          base :+ distinct.as(s"${f.name}_distinct")
        case _ => base
      }
    }
    df.agg(count(lit(1)).as("n_rows"), aggs: _*)
  }
}
