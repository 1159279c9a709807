package graft

import org.scalatest.funsuite.AnyFunSuite

/** The contention-normalization semantics the bench's `above_band`
  * flags depend on: a hotter-than-baseline segment RAISES a query's
  * ceiling proportionally, a quieter host never tightens it, and the
  * canary pseudo-entry is metadata, never a band.
  */
class BenchBandsSpec extends AnyFunSuite {

  test("parse extracts hi ceilings and the canary ref") {
    val txt = """{"a_query":[0.0,2.5],"__canary_ref":[0.0,0.1],
                  "b":[0.0,14.0]}"""
    val b = BenchBands.parse(txt)
    assert(b("a_query") === 2.5)
    assert(b("b") === 14.0)
    assert(b(BenchBands.CanaryKey) === 0.1)
  }

  test("scale: contended segment raises, quiet host never tightens") {
    // bands measured at ref 0.1; this segment's canary read 0.4 ->
    // the host was 4x contended around this query's measurement
    assert(BenchBands.scale(0.4, 0.1, Some(0.1)) === 4.0)
    // quieter than baseline: floor at 1.0, never tighten
    assert(BenchBands.scale(0.05, 0.04, Some(0.1)) === 1.0)
    // the run-wide start ref is a contention floor even when this
    // segment's closing canary happened to read quiet
    assert(math.abs(BenchBands.scale(0.05, 0.3, Some(0.1)) - 3.0) < 1e-12)
    // no recorded ref (pre-normalization bands): raw ceilings
    assert(BenchBands.scale(9.9, 9.9, None) === 1.0)
    // degenerate zero ref: treated as absent
    assert(BenchBands.scale(9.9, 9.9, Some(0.0)) === 1.0)
  }

  test("ceiling: scaled per query; the canary key is never a band") {
    val bands = Map("q" -> 2.0, BenchBands.CanaryKey -> 0.1)
    assert(BenchBands.ceiling(bands, "q", 0.2, 0.1) === Some(4.0))
    assert(BenchBands.ceiling(bands, "q", 0.05, 0.05) === Some(2.0))
    assert(BenchBands.ceiling(bands, "missing", 0.2, 0.1) === None)
    assert(BenchBands.ceiling(bands, BenchBands.CanaryKey, 0.2, 0.1)
      === None)
  }

  test("retry rule: a contention flag is withdrawn when the hot " +
      "retry lands back inside band; a real regression stands") {
    val bands = Map("dd8_contamination" -> 7.97,
      BenchBands.CanaryKey -> 0.09)
    // r09 shape: dd8 measured 45.6 s under ~loadavg-20 contention
    // (first-pass flag), then the host quiets and the in-run retry
    // reads 4.3 s with a 0.1 canary — flag withdrawn
    assert(!BenchBands.standsAfterRetry(bands, "dd8_contamination",
      retrySec = 4.3, retryCanary = 0.1, runRef = 0.09))
    // a planted real regression: the retry ALSO reads ~45 s on a
    // quiet host (canary 0.1 -> scale ~1.1) — flag stands
    assert(BenchBands.standsAfterRetry(bands, "dd8_contamination",
      retrySec = 45.0, retryCanary = 0.1, runRef = 0.09))
    // a retry under continued contention: canary 0.7 scales the
    // ceiling ~7.8x to ~62 s, so a 45 s retry is STILL adjudicated
    // load, not code — conservative by design; a standing flag
    // requires the retry to exceed even the contention-scaled ceiling
    assert(!BenchBands.standsAfterRetry(bands, "dd8_contamination",
      retrySec = 45.0, retryCanary = 0.702, runRef = 0.09))
    // unbanded queries never stand
    assert(!BenchBands.standsAfterRetry(bands, "unbanded",
      retrySec = 99.0, retryCanary = 0.1, runRef = 0.09))
  }

  test("vintage: parse round-trips the stamp; hash is stable and " +
      "moves with file bytes") {
    assert(BenchBands.parseVintage(
      """{"a":[0,1],"__vintage":"ab12cd34ef56"}""")
      === Some("ab12cd34ef56"))
    assert(BenchBands.parseVintage("""{"a":[0,1]}""") === None)
    val dir = java.nio.file.Files.createTempDirectory("vintage").toFile
    try {
      val f = new java.io.File(dir, "documents.parquet")
      java.nio.file.Files.write(f.toPath, Array[Byte](1, 2, 3))
      val v1 = BenchBands.vintageHash(dir.getPath)
      assert(v1.exists(_.length == 12))
      assert(BenchBands.vintageHash(dir.getPath) === v1)
      java.nio.file.Files.write(f.toPath, Array[Byte](1, 2, 3, 4))
      assert(BenchBands.vintageHash(dir.getPath) !== v1)
      // non-parquet entries are ignored; empty dirs have no vintage
      val empty = java.nio.file.Files.createTempDirectory("v2").toFile
      assert(BenchBands.vintageHash(empty.getPath) === None)
      empty.delete()
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("r08 shape: a 4x mid-run excursion with a quiet run ref no " +
      "longer flags a query whose segment canary spiked with it") {
    // pca2's r08 reading: 17.52 s vs quiet 4.4-4.7; ceiling 8.87.
    // run ref 0.108 (quiet start), bands ref 0.12, and the excursion
    // segment's canary read ~0.417 (the run's recorded max)
    val eff = 8.87 * BenchBands.scale(0.417, 0.108, Some(0.12))
    assert(eff > 17.52, f"effective ceiling $eff%.2f should absorb " +
      "the contention excursion")
    // while a genuinely quiet segment keeps the tight ceiling
    val tight = 8.87 * BenchBands.scale(0.11, 0.108, Some(0.12))
    assert(tight < 9.0)
  }

  test("adjudicatedTotal substitutes ONLY withdrawn flags' retry " +
      "readings; standing and retry-failed flags keep first-pass") {
    // r10 shape (real readings): pipe4 189.7 s contended first pass,
    // retry 1.7 s withdrawn; pk1 28.0 -> 1.62 withdrawn; a standing
    // flag (hypothetical real regression) and an unflagged query
    // keep their first-pass seconds
    val firstPass = Seq(
      "pipe4_clean_select" -> 189.7,
      "pk1_sequence_pack" -> 28.0,
      "real_regression" -> 45.0, // flagged, retry ALSO slow: stands
      "retry_crashed" -> 30.0,   // flagged, retry threw: stands
      "q0_flagship_bldgs" -> 0.54)
    // only withdrawn flags enter the substitution map — the caller
    // (Bench) excludes standing and retry_failed entries
    val withdrawn = Map(
      "pipe4_clean_select" -> 1.7,
      "pk1_sequence_pack" -> 1.62)
    val adj = BenchBands.adjudicatedTotal(firstPass, withdrawn)
    assert(math.abs(adj - (1.7 + 1.62 + 45.0 + 30.0 + 0.54)) < 1e-9)
    // raw total untouched by construction (separate sum)
    assert(math.abs(firstPass.map(_._2).sum - 293.24) < 1e-9)
    // no withdrawals -> identical to the raw total
    assert(math.abs(BenchBands.adjudicatedTotal(firstPass, Map.empty)
      - 293.24) < 1e-9)
  }
}
