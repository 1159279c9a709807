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

  /** Length-bucketed packing — the padding-efficiency variant of
    * [[packSequences]]: units are first banded by length
    * (`bucket = len div bucketWidth`) and packed independently WITHIN
    * each band, so every pack holds similar-length units and the
    * per-batch padding waste (batch pad = max len in batch) is bounded
    * by the band width instead of the corpus length spread — the
    * standard bucketed-batching trade: slightly more partially-filled
    * tail packs, far less padding.
    *
    * Scale shape: the same distributed prefix-sum recipe as
    * [[packSequences]], with the per-partition totals and base
    * offsets keyed by (partition, bucket) — NOT a per-bucket window
    * (a hot band would serialize into one partition). Range
    * partitioning on (bucket, id) keeps partitions balanced across
    * bands; the driver cumsum is over #partitions x #bands-touched
    * rows, both small.
    *
    * Output: (id, len, bucket, start, seq_id, seq_offset) with
    * `start` the prefix sum within the unit's band in id order and
    * (bucket, seq_id) the pack key.
    */
  def packSequencesBucketed(
      df: DataFrame,
      idCol: String,
      lenCol: String,
      budget: Long,
      bucketWidth: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val spark = df.sparkSession
    // same eager-materialization rationale as packSequences: two jobs
    // must see ONE partition assignment
    val slim = df
      .select(col(idCol).cast("long").as("id"),
        col(lenCol).cast("long").as("len"))
      .withColumn("bucket", expr(s"len div ${bucketWidth}L"))
      .repartitionByRange(col("bucket"), col("id"))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)

    val totals = slim.groupBy(col("__pid"), col("bucket"))
      .agg(sum(col("len")).as("__t"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    // driver cumsum per band across partitions in pid order
    val bases = totals
      .groupBy(_._2).iterator.flatMap { case (bucket, rows) =>
        var acc = 0L
        rows.sortBy(_._1).map { case (pid, _, t) =>
          val base = (pid, bucket, acc); acc += t; base
        }
      }.toSeq
    val baseDf = broadcast(
      spark.createDataFrame(bases).toDF("__pid", "bucket", "__base"))

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pid"), col("bucket")).orderBy(col("id"))
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    slim.join(baseDf, Seq("__pid", "bucket"))
      .withColumn("__start",
        coalesce(sum(col("len")).over(w), lit(0L)) + col("__base"))
      .select(col("id").as(idCol),
        col("len"),
        col("bucket"),
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

  /** Content-defined chunking: chunk boundaries fall AFTER any token
    * whose portable hash ([[graft.text.TextFunctions.wordHash]]) is
    * 0 mod `divisor` — so boundaries depend only on local CONTENT,
    * not position. That is the property fixed-width chunking
    * ([[chunkDocuments]]) lacks and dedup needs: insert one word at
    * the front of a document and every fixed-width chunk shifts
    * (nothing dedups), while CDC boundaries downstream of the edit
    * are unchanged and every unedited chunk still dedups exactly.
    * Mean chunk length = `divisor` tokens.
    *
    * Same scale shape as [[chunkDocuments]]: boundary positions,
    * starts, and per-chunk slices are all computed WITHIN the row
    * (filter/transform/zip over the token array), one posexplode at
    * the end — per-row work, no shuffle, and the portable hash keeps
    * the whole operator engine-checkable.
    * Output: (id, chunk_id, chunk_text, n_chunk_tokens).
    */
  def cdcChunkDocuments(
      df: DataFrame,
      idCol: String,
      textCol: String,
      divisor: Int = 16): DataFrame = {
    require(divisor > 0, s"divisor must be positive, got $divisor")
    val toks = split(trim(col(textCol)), "\\s+")
    val n = size(toks)
    // 1-based boundary positions: token i closes a chunk
    val bpos = filter(sequence(lit(1), n), i =>
      graft.text.TextFunctions.wordHash(element_at(toks, i))
        % divisor === 0)
    // chunk starts: position 1 plus (boundary+1) for each non-final
    // boundary (a boundary on the last token closes the last chunk,
    // it does not open an empty one)
    val starts = concat(array(lit(1)),
      transform(filter(bpos, p => p < n), p => p + 1))
    df.select(col(idCol), toks.as("__toks"), n.as("__n"),
        starts.as("__starts"))
      .select(col(idCol), col("__n"), col("__toks"),
        posexplode(transform(
          sequence(lit(1), size(col("__starts"))),
          k => struct(
            element_at(col("__starts"), k).as("s"),
            (when(k < size(col("__starts")),
              element_at(col("__starts"), k + 1) - 1)
              .otherwise(col("__n"))).as("e")))))
      .select(col(idCol),
        col("pos").cast("long").as("chunk_id"),
        concat_ws(" ", slice(col("__toks"), col("col.s"),
          col("col.e") - col("col.s") + 1)).as("chunk_text"),
        (col("col.e") - col("col.s") + 1).cast("long")
          .as("n_chunk_tokens"))
  }
}
