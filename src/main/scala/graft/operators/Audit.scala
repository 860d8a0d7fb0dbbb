package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

/** Data-quality profiling for corpus pipelines: one pass over a table
  * producing per-column null counts, numeric min/max, and string distinct
  * counts — the audit step that gates a 100 TB ingest before it fans out
  * (all aggregates are decomposable, so the profile is a single partial-
  * aggregated scan, no extra shuffles beyond the final 1-row reduce).
  */
object Audit {

  /** Wide one-row profile: `n_rows` plus, per column, `<c>_nulls`;
    * numerics add `<c>_min`/`<c>_max`; strings add `<c>_distinct`.
    */
  def profile(df: DataFrame): DataFrame = {
    val aggs = df.schema.fields.flatMap { f =>
      val c = col(f.name)
      val base = Seq(count(when(c.isNull, 1)).as(s"${f.name}_nulls"))
      f.dataType match {
        case _: NumericType =>
          base ++ Seq(min(c).as(s"${f.name}_min"), max(c).as(s"${f.name}_max"))
        case StringType =>
          base :+ countDistinct(c).as(s"${f.name}_distinct")
        case _ => base
      }
    }
    df.agg(count(lit(1)).as("n_rows"), aggs: _*)
  }
}
