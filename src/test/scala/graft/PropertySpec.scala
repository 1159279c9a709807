package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.Ops._

/** Property tests for the two non-trivial Postgres-isms (SURVEY §5's
  * test plan): distinctOn returns exactly one member row per key and it
  * is the ordered head; firstOrderedBy equals sort-then-head. Plain
  * scalacheck generators sampled with fixed seeds (scalatestplus is not
  * in the offline dependency set).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rowsGen: Gen[List[(String, Int, Int)]] =
    Gen.listOfN(60, for {
      k <- Gen.oneOf("a", "b", "c", "d")
      v <- Gen.choose(-5, 5)
      t <- Gen.choose(0, 100)
    } yield (k, v, t))

  private def samples(n: Int): Seq[List[(String, Int, Int)]] =
    (1 to n).flatMap(i => rowsGen.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("distinctOn: exactly one row per key, and it is the ordered head") {
    samples(15).foreach { rows =>
      val df = rows.toDF("k", "v", "t")
      val got = df.distinctOn(Seq(col("k")), Seq(col("v").desc, col("t").asc))
        .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
      val expected = rows.groupBy(_._1).map { case (_, g) =>
        g.minBy(r => (-r._2, r._3))
      }.toSet
      assert(got.toSet === expected)
      assert(got.map(_._1).distinct.length === got.length)
    }
  }

  test("firstOrderedBy == sort-then-head per group") {
    samples(15).foreach { rows =>
      val df = rows.toDF("k", "v", "t")
      val got = df.firstOrderedBy(
        Seq(col("k")), Seq(col("v"), col("t")),
        Seq("top_v" -> col("v"), "top_t" -> col("t")))
        .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
      val expected = rows.groupBy(_._1).map { case (k, g) =>
        val top = g.maxBy(r => (r._2, r._3)); (k, top._2, top._3)
      }.toSet
      assert(got === expected)
    }
  }

  test("exactJaccardPairs == brute force on random short docs (edge shapes)") {
    val docGen: Gen[List[String]] =
      Gen.listOfN(30, for {
        n <- Gen.choose(0, 12)
        toks <- Gen.listOfN(n, Gen.oneOf("aa", "bb", "cc", "dd", "ee", "x"))
      } yield toks.mkString(" "))
    def grams(s: String): Set[String] = {
      val x = s.trim.toLowerCase
      if (x.length < 3) Set(x)
      else (0 to x.length - 3).map(i => x.substring(i, i + 3)).toSet
    }
    (1 to 8).foreach { seed =>
      val texts = docGen.apply(Gen.Parameters.default, Seed(seed.toLong)).get
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = graft.dedup.Dedup
        .exactJaccardPairs(df, "doc_id", "text", threshold = 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val g = texts.zipWithIndex.map { case (t, i) => i.toLong -> grams(t) }
      val want = (for {
        (a, ga) <- g; (b, gb) <- g if a < b
        inter = (ga & gb).size
        if inter > 0 && inter.toDouble / (ga.size + gb.size - inter) >= 0.5
      } yield (a, b)).toSet
      assert(got === want, s"seed=$seed")
    }
  }

  test("upsert == map-override semantics for any base/delta") {
    samples(15).foreach { rows =>
      val (baseRows, deltaRows) = rows.splitAt(rows.length / 2)
      // one row per key on each side (upsert contract: delta keyed)
      val base = baseRows.distinctBy(_._1)
      val delta = deltaRows.distinctBy(_._1)
      val got = graft.ops.Ops.upsert(
          base.toDF("k", "v", "t"), delta.toDF("k", "v", "t"), Seq("k"))
        .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
      val expected =
        (base.map(r => r._1 -> r).toMap ++ delta.map(r => r._1 -> r).toMap)
          .values.toSet
      assert(got === expected)
    }
  }
}
