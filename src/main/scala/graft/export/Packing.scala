package graft.export

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-sequence packing: lay documents end-to-end in a
  * deterministic order and cut the concatenated stream into fixed
  * token-budget sequences — the standard pretraining "pack with
  * splitting" step (a doc crossing a budget boundary continues into
  * the next sequence). Each doc's placement is
  * `seq_id = start div budget`, `seq_offset = start mod budget`, where
  * `start` is the exact global prefix sum of lengths in id order.
  *
  * Scale shape — a distributed prefix sum, NOT a global window (a
  * single-partition window is the naive formulation and serializes
  * 100 TB through one task):
  *  1. range-partition (id, len) pairs by id — the heavy document
  *     payload never moves; placement is joined back by id;
  *  2. per-partition length totals: one slim row per partition,
  *     collected to the driver (thousands of rows at most) and
  *     cumulative-summed into per-partition base offsets;
  *  3. base offsets broadcast back; each partition computes exact
  *     global starts with a partition-local running sum.
  *
  * The result is partitioning-independent (the prefix sum is a
  * function of the id order alone), so any cluster size/layout
  * produces identical placements — asserted in ExportSpec.
  */
object Packing {

  /** @param df     any DataFrame with a unique integral id column and
    *               a non-negative integral length column
    * @param budget tokens (or chars) per packed sequence
    * @return (id, len, start, seq_id, seq_offset) — `start` kept for
    *         transparency/debugging; `len` echoes the input length
    */
  def packSequences(
      df: DataFrame,
      idCol: String,
      lenCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val spark = df.sparkSession
    // The (id, len, __pid) assignment is referenced by TWO jobs (the
    // totals collect below and the final placement query), and
    // spark_partition_id() after repartitionByRange is NOT stable
    // across executions: RangePartitioner re-samples per execution
    // (reservoir seeded by the rdd id) and AQE may coalesce
    // differently, so range boundaries can shift between jobs and a
    // row near a boundary would join a base offset computed from the
    // OTHER job's partitioning. Freeze the assignment by materializing
    // it exactly once — an eager localCheckpoint pins the physical
    // partitions (and truncates lineage), so both jobs read the same
    // blocks. Executor-local storage is the price of a stable
    // assignment; at cluster scale substitute a reliable checkpoint or
    // an intermediate parquet stage — the contract is "materialize the
    // assignment once", not the storage tier.
    val slim = df
      .select(col(idCol).cast("long").as("id"),
        col(lenCol).cast("long").as("len"))
      .repartitionByRange(col("id"))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)

    // phase 1+2: per-partition totals -> driver cumsum -> base offsets
    // (rows here = partition count, not data size)
    val totals = slim.groupBy(col("__pid"))
      .agg(sum(col("len")).as("__t"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .sortBy(_._1)
    var acc = 0L
    val bases = totals.map { case (pid, t) =>
      val base = (pid, acc); acc += t; base
    }
    val baseDf = broadcast(
      spark.createDataFrame(bases.toSeq).toDF("__pid", "__base"))

    // phase 3: partition-local running sum + base = exact global start.
    // The window keys on the CARRIED __pid values, so correctness does
    // not depend on the window shuffle preserving physical partitions.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pid")).orderBy(col("id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    slim.join(baseDf, Seq("__pid"))
      .withColumn("__start",
        coalesce(sum(col("len")).over(w), lit(0L)) + col("__base"))
      .select(col("id").as(idCol),
        col("len"),
        col("__start").as("start"),
        expr(s"__start DIV ${budget}L").as("seq_id"),
        pmod(col("__start"), lit(budget)).as("seq_offset"))
  }

  /** The dual of [[packSequences]]: documents LONGER than the context
    * budget are split into overlapping token windows (the standard
    * long-document chunking step before packing/training; overlap
    * preserves cross-boundary context).
    *
    * Chunk i covers tokens `[i*step, i*step + maxTokens)` with
    * `step = maxTokens - overlap`; a doc with n <= maxTokens tokens is
    * one chunk. Everything is columnar (`sequence` -> `transform` ->
    * `posexplode` over the token array) — per-row work, no shuffle at
    * all, and the short-doc fast path emits without building the
    * window list. Output: (id, chunk_id, n_chunks, chunk_text,
    * n_chunk_tokens).
    */
  def chunkDocuments(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxTokens: Int,
      overlap: Int): DataFrame = {
    require(maxTokens > 0 && overlap >= 0 && overlap < maxTokens,
      s"need 0 <= overlap < maxTokens, got overlap=$overlap max=$maxTokens")
    val step = maxTokens - overlap
    val toks = split(trim(col(textCol)), "\\s+")
    val n = size(toks)
    // 1 + ceil((n - maxTokens) / step); floor of the positive double
    // ratio == integer ceil-div here
    val nChunks = when(n <= maxTokens, lit(1L))
      .otherwise(lit(1L) + floor((n - maxTokens + lit(step - 1)) / lit(step)))
    df.select(col(idCol), toks.as("__toks"), n.as("__n"),
        nChunks.as("n_chunks"))
      .select(col(idCol), col("n_chunks"), col("__n"),
        posexplode(transform(
          sequence(lit(0L), col("n_chunks") - 1),
          i => concat_ws(" ",
            slice(col("__toks"), (i * step + 1).cast("int"),
              lit(maxTokens))))))
      .select(col(idCol),
        col("pos").cast("long").as("chunk_id"),
        col("n_chunks"),
        col("col").as("chunk_text"),
        // from the window bounds — no re-tokenization of chunk_text
        least(lit(maxTokens.toLong),
          (col("__n") - col("pos") * step).cast("long"))
          .as("n_chunk_tokens"))
  }
}
