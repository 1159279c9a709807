package graft.queries

import org.apache.spark.sql.DataFrame

/** Stage-materialization strategy for multi-phase pipelines
  * (pipe1/pipe2): each phase boundary frame is referenced several
  * times downstream (gram explodes, per-side set fetches, anti-joins),
  * so it must be computed ONCE, not re-derived per reference.
  *
  * Two strategies, same semantics:
  *  - [[Staging.Memory]] — `persist()`. Right at gate/interactive
  *    scale: zero I/O, but the cache entry is sized by executor
  *    storage memory and outlives the query (CacheManager keys on the
  *    canonicalized plan, so repeated invocations reuse ONE bounded
  *    entry; long sessions reclaim via `spark.catalog.clearCache()`).
  *  - [[Staging.Parquet]] — write the stage to a parquet path and
  *    re-read it. The 100 TB path: a stage bigger than cluster memory
  *    writes once and every downstream reference is an independent
  *    columnar scan with pushdown/pruning, the lineage is CUT (no
  *    recompute-on-eviction cliffs, no giant plan trees), and a failed
  *    downstream phase restarts from the staged files instead of
  *    re-running the whole prefix — exactly what production pipelines
  *    do between phases.
  */
sealed trait Staging {
  /** Materialize `df` as the named stage; returns the frame downstream
    * phases should reference.
    */
  def stage(df: DataFrame, name: String): DataFrame
}

object Staging {

  case object Memory extends Staging {
    def stage(df: DataFrame, name: String): DataFrame = df.persist()
  }

  /** Stages land at `dir/<name>.parquet`, overwritten per run (a rerun
    * supersedes its own staging, mirroring the warehouse generation
    * contract of one artifact per (pipeline, stage) pair).
    */
  final case class Parquet(dir: String) extends Staging {
    def stage(df: DataFrame, name: String): DataFrame = {
      val path = s"$dir/$name.parquet"
      df.write.mode("overwrite").parquet(path)
      df.sparkSession.read.parquet(path)
    }
  }
}
