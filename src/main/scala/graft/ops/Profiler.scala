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
    // backtick-quoted resolution + positional aliases sidestep any
    // quoting issue a raw column name (dots, quotes, backticks) could
    // inject into column lookup or the selectExpr below
    def quoted(c: String) = col("`" + c.replace("`", "``") + "`")
    val aggs = df.columns.toSeq.zipWithIndex.flatMap { case (c, i) =>
      Seq(
        sum(when(quoted(c).isNull, 1L).otherwise(0L)).as(s"__nn_$i"),
        countDistinct(quoted(c)).as(s"__nd_$i"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stackExpr =
      s"stack(${df.columns.length}, " +
        df.columns.zipWithIndex.map { case (c, i) =>
          // string-literal escape for the emitted col_name value
          val lit = c.replace("\\", "\\\\").replace("'", "\\'")
          s"'$lit', __nn_$i, __nd_$i"
        }.mkString(", ") +
        ") as (col_name, n_nulls, n_distinct)"
    row.selectExpr(stackExpr)
  }
}
