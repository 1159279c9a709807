package graft

import org.apache.spark.sql.functions._

import graft.ops.Agreement
import graft.queries.Pref

/** Preference/label-quality batch: Bradley–Terry MM against a
  * driver-side sequential reference, kappa goldens, annotator-audit
  * invariants.
  */
class PrefSpec extends SparkSpec {
  import spark.implicits._

  private def round9(v: Double): Double =
    BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("bradleyTerry: 3 MM rounds match a sequential reference on a " +
      "planted tournament") {
    // A beats B twice, B beats A once, A beats C once, C beats B once
    val duels = Seq(("A", "B"), ("A", "B"), ("B", "A"), ("A", "C"),
      ("C", "B")).toDF("winner", "loser")
    val got = Agreement.bradleyTerry(duels, iters = 3).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2),
          r.getDecimal(3).doubleValue())).toMap
    // reference: same pair aggregate + requantized MM, sequentially
    val pairs = Map(("A", "B") -> 3L, ("B", "A") -> 3L,
      ("A", "C") -> 1L, ("C", "A") -> 1L, ("B", "C") -> 1L,
      ("C", "B") -> 1L)
    val wins = Map("A" -> 3L, "B" -> 1L, "C" -> 1L)
    var p = Map("A" -> 1.0, "B" -> 1.0, "C" -> 1.0)
    for (_ <- 1 to 3) {
      p = p.keys.map { i =>
        val denom = pairs.collect { case ((a, j), n) if a == i =>
          round9(n.toDouble / (p(i) + p(j)))
        }.sum
        i -> round9(wins(i) / denom)
      }.toMap
    }
    val tot = p.values.sum
    for ((i, (w, g, r)) <- got) {
      assert(w == wins(i) && g == pairs.collect {
        case ((a, _), n) if a == i => n }.sum)
      assert(math.abs(r - round9(p(i) / tot)) < 1e-8,
        s"$i: got $r want ${p(i) / tot}")
    }
    // A dominates, B and C split their duels with A asymmetrically
    assert(got("A")._3 > got("B")._3 && got("A")._3 > got("C")._3)
  }

  test("bt1 on the star schema: ratings normalize to 1, all positive") {
    val rows = Pref.bt1BradleyTerry(spark, sf).collect()
    assert(rows.nonEmpty)
    val ratings = rows.map(_.getDouble(3)) // DOUBLE at the edge (r8)
    assert(math.abs(ratings.sum - 1.0) < 1e-6)
    assert(ratings.forall(_ > 0))
    rows.foreach(r => assert(r.getLong(1) <= r.getLong(2),
      "wins cannot exceed games"))
  }

  test("cohenKappa: perfect agreement gives kappa 1; constant raters " +
      "give NULL (pe = 1)") {
    val df = Seq((1, true, true), (2, false, false), (3, true, true))
      .toDF("id", "a", "b")
    val r = Agreement.cohenKappa(df, col("a"), col("b"), Seq(lit(1)
      .as("g"))).collect()(0)
    assert(r.getAs[Double]("po6") == 1.0)
    assert(r.getAs[Double]("kappa6") == 1.0)
    val const = Seq((1, true, true), (2, true, true)).toDF("id", "a", "b")
    val rc = Agreement.cohenKappa(const, col("a"), col("b"),
      Seq(lit(1).as("g"))).collect()(0)
    assert(rc.isNullAt(rc.fieldIndex("kappa6")))
  }

  test("annotatorAccuracy: perfect annotator scores 1; confusion " +
      "counts partition n") {
    val labels = Seq(
      (1L, 1, true), (1L, 2, true), (1L, 3, false),
      (2L, 1, false), (2L, 2, false), (2L, 3, true))
      .toDF("item", "annotator", "label")
    val rows = Agreement.annotatorAccuracy(labels).collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(rows(1).getAs[Double]("acc6") == 1.0)
    assert(rows(2).getAs[Double]("acc6") == 1.0)
    assert(rows(3).getAs[Double]("acc6") == 0.0)
    rows.values.foreach { r =>
      assert(r.getAs[Long]("tp") + r.getAs[Long]("fp") +
        r.getAs[Long]("fn") + r.getAs[Long]("tn") == r.getAs[Long]("n"))
    }
  }

  test("ds1: accuracy decreases with the planted noise rate") {
    val rows = Pref.ds1AnnotatorAccuracy(spark, sf).collect()
      .map(r => r.getInt(0) -> r.getAs[Double]("acc6")).toMap
    assert(rows.keySet == Set(1, 2, 3))
    assert(rows(1) > rows(2) && rows(2) > rows(3),
      s"noise ordering violated: $rows")
  }
}
