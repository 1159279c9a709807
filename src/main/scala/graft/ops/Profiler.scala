package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality profiling: per-column null and distinct counts in ONE
  * aggregation pass (not one job per column — at 100 TB the difference
  * is k full scans vs 1). Multiple exact `count(distinct)` aggregates
  * in one agg are planned by Catalyst with a single Expand (rows are
  * replicated k times map-side, then one shuffle), which trades CPU
  * for scans — the right trade when the scan is the cost. The wide
  * one-row result is melted to (col_name, n_nulls, n_distinct) rows
  * with `stack` so downstream checks are relational.
  */
object Profiler {

  def profile(df: DataFrame): DataFrame = {
    require(df.columns.nonEmpty, "profile: no columns")
    val aggs = df.columns.toSeq.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stackExpr =
      s"stack(${df.columns.length}, " +
        df.columns.map(c => s"'$c', `__nn_$c`, `__nd_$c`").mkString(", ") +
        ") as (col_name, n_nulls, n_distinct)"
    row.selectExpr(stackExpr)
  }
}
