package graft

import org.apache.spark.sql.functions._

import graft.queries.Mining2

/** Batch-two round-10 operators: apriori triple recounts, HITS
  * normalization/determinism invariants, planted tail/head stitch
  * pairs, calibration bin algebra, grid-density noise definition,
  * event-trigram replay.
  */
class Mining2Spec extends SparkSpec {
  import spark.implicits._

  test("apr1: triples are canonical a<b<c and one support hand-recounts") {
    val out = Mining2.apr1FrequentTriples(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)), r.getLong(3)))
    assert(out.nonEmpty)
    assert(out.forall { case ((a, b, c), supp) => a < b && b < c && supp >= 2 })
    val ((a, b, c), supp) = out.head
    val baskets = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map(_._2.map(_._2).toSet)
      .filter(s => s.size >= 3 && s.size <= 50)
    assert(baskets.count(s =>
      s.contains(a) && s.contains(b) && s.contains(c)).toLong == supp)
  }

  test("hits1: both score families peak at exactly 1.0 and rerun identically") {
    val r1 = Mining2.hits1BipartiteHits(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val r2 = Mining2.hits1BipartiteHits(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(r1.sortBy(x => (x._1, x._2)).toSeq == r2.sortBy(x => (x._1, x._2)).toSeq)
    val hubs = r1.filter(_._1 == "hub").map(_._3)
    val auths = r1.filter(_._1 == "authority").map(_._3)
    assert(hubs.max == 1.0 && auths.max == 1.0)
    assert(hubs.forall(s => s > 0.0 && s <= 1.0))
    assert(auths.forall(s => s > 0.0 && s <= 1.0))
  }

  test("dd14: a split document's halves stitch across docs; every " +
      "chunk adjacency is rediscovered from content alone") {
    val dir = java.nio.file.Files.createTempDirectory("dd14").toString
    val overlap = (1 to 8).map(i => s"o$i").mkString(" ")
    val fragA = (1 to 12).map(i => s"a$i").mkString(" ") + " " + overlap
    val fragB = overlap + " " + (1 to 12).map(i => s"b$i").mkString(" ")
    val bg = (3 to 20).map(i =>
      (i.toLong, (1 to 20).map(j => s"w${i}_$j").mkString(" ")))
    val docs = (Seq((1L, fragA), (2L, fragB)) ++ bg).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Mining2.dd14OverlapStitch(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def u(doc: Long, ch: Long) = doc * 1048576L + ch
    // every 20-token doc chunks into (0: tokens 1-16, 1: tokens
    // 13-20), so chunk 0's last 4 == chunk 1's first 4 — the detector
    // must find all 20 within-doc adjacencies...
    val adjacencies = (1L to 20L).map(dId => u(dId, 0) -> u(dId, 1)).toSet
    // ...plus the one CROSS-doc stitch: fragA's chunk-0 tail (o1-o4)
    // is fragB's chunk-0 head — the split-document signature
    assert(out === adjacencies + (u(1L, 0) -> u(2L, 0)))
  }

  test("cal1: deciles partition the events; probabilities are monotone in bin") {
    val rows = Mining2.cal1Calibration(spark, sf).collect()
      .sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).forall(b => b >= 0 && b <= 9))
    val total = Tables.events(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_bin")).sum == total)
    val phats = rows.map(_.getAs[Double]("mean_phat6"))
    assert(phats.zip(phats.tail).forall { case (x, y) => x < y })
    assert(phats.forall(p => p >= 0.0 && p <= 1.0))
  }

  test("dbs1: noise flag is exactly (cell population < 3); all vectors scored") {
    val rows = Mining2.dbs1GridDensity(spark, sf).collect()
    assert(rows.length == Tables.embeddings(spark, sf).count().toInt)
    rows.foreach { r =>
      val (n, noise) = (r.getAs[Long]("cell_n"), r.getAs[Int]("is_noise"))
      assert(if (n < 3) noise == 1 else noise == 0)
    }
    // recount one cell from the raw table
    val r0 = rows.head
    val cnt = rows.count(r => r.getLong(1) == r0.getLong(1) &&
      r.getLong(2) == r0.getLong(2))
    assert(cnt.toLong == r0.getAs[Long]("cell_n"))
  }

  test("seq1: one user's trigram stream replays by hand") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("tsu"),
        col("event_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val uid = ev.groupBy(_._1).maxBy(_._2.length)._1
    val stream = ev.filter(_._1 == uid).sortBy(e => (e._2, e._3)).map(_._4)
    val expected = stream.sliding(3).filter(_.length == 3)
      .map(w => (w(0), w(1), w(2))).toSeq
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = Mining2.seq1EventTrigrams(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1), r.getString(2)),
        r.getAs[Long]("n_occ"))).toMap
    // the per-user stream contributes at most its own counts
    expected.foreach { case (tri, n) => assert(got(tri) >= n) }
    assert(got.values.sum == ev.groupBy(_._1)
      .map(g => math.max(0, g._2.length - 2)).sum.toLong)
  }
}
