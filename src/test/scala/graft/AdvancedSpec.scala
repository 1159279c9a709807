package graft

import org.apache.spark.sql.functions._

import graft.functions.StringSimilarity
import graft.graph.Triangles
import graft.queries.Advanced

/** Round-9 operators: triangle counting on known graphs, Jaro-Winkler
  * golden values, AUC pair-counting replay, MAD planted-anomaly
  * detection, EWMA local replay, snapshot-diff reconciliation, TF-IDF
  * cosine on planted duplicates, autocorrelation closed forms.
  */
@graft.tags.Slow
class AdvancedSpec extends SparkSpec {
  import spark.implicits._

  // ---- triangles -----------------------------------------------------

  test("tri: K4 has 3 triangles per node, coefficient 1.0 (dedup + reversed edges)") {
    // K4 with duplicate and reversed copies — canonicalization must collapse them
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L), (2L, 3L),
      (3L, 2L), (2L, 4L), (3L, 4L), (3L, 4L)).toDF("s", "t")
    val got = Triangles.clusteringCoefficients(edges, "s", "t")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(got.length == 4)
    got.foreach { case (_, tris, deg, coef) =>
      assert(tris == 3L && deg == 3L && coef == 1.0)
    }
  }

  test("tri: a path has no triangles; a single triangle is found once") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("s", "t")
    assert(Triangles.perNodeCounts(path, "s", "t").count() == 0)
    val tri = Seq((10L, 20L), (20L, 30L), (30L, 10L)).toDF("s", "t")
    val got = Triangles.perNodeCounts(tri, "s", "t").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(10L -> 1L, 20L -> 1L, 30L -> 1L))
  }

  // ---- jaro-winkler --------------------------------------------------

  test("jw: golden values match the pinned (DuckDB-verified) semantics") {
    val cases = Seq(
      ("martha", "marhta", 0.9611111111111111),
      ("DWAYNE", "DUANE", 0.84),
      ("DIXON", "DICKSONX", 0.8133333333333332),
      ("CRATE", "TRACE", 0.7333333333333333), // jaro ≤ 0.7+ε: no prefix boost
      ("ab", "cd", 0.0),
      ("xy", "yx", 0.0), // window floor: max(2,2)/2-1 = 0 -> no matches
      ("abcdefgh", "abcdefgh", 1.0),
      ("", "", 0.0), // DuckDB convention, not the textbook 1.0
      ("a", "", 0.0))
    val got = cases.map(_._1).zip(cases.map(_._2)).toDF("a", "b")
      .select(StringSimilarity.jaro_winkler(col("a"), col("b"))).as[Double]
      .collect()
    cases.map(_._3).zip(got).foreach { case (want, g) =>
      assert(math.abs(g - want) < 1e-12, s"want $want got $g")
    }
  }

  test("jw: null-safe and symmetric") {
    val df = Seq((Some("abc"), None: Option[String]), (None, Some("x")))
      .toDF("a", "b")
      .select(StringSimilarity.jaro_winkler(col("a"), col("b")).as("j"))
    assert(df.collect().forall(_.isNullAt(0)))
    val pairs = Seq(("martha", "marhta"), ("DIXON", "DICKSONX")).toDF("a", "b")
      .select(StringSimilarity.jaro_winkler(col("a"), col("b")).as("ab"),
        StringSimilarity.jaro_winkler(col("b"), col("a")).as("ba"))
      .collect()
    pairs.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  // ---- AUC -----------------------------------------------------------

  test("auc: matches brute-force pair counting with ties") {
    val rows = Seq( // (label, score) with score ties across classes
      ("p", 3.0), ("p", 2.0), ("p", 2.0), ("p", 1.0),
      ("n", 2.0), ("n", 1.0), ("n", 0.5), ("n", 0.5))
    val df = rows.toDF("lbl", "value")
    val Array(got) = Advanced.aucOn(df, col("lbl") === "p", col("value")).collect()
    val pos = rows.filter(_._1 == "p").map(_._2)
    val neg = rows.filter(_._1 == "n").map(_._2)
    val brute = (for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum / (pos.size * neg.size)
    assert(got.getAs[Long]("n_pos") == 4L && got.getAs[Long]("n_neg") == 4L)
    assert(math.abs(got.getAs[Double]("auc") - brute) < 1e-6)
  }

  test("auc: perfect separation scores 1.0, reversed scores 0.0") {
    val df = Seq(("p", 10.0), ("p", 9.0), ("n", 1.0), ("n", 2.0)).toDF("lbl", "value")
    assert(Advanced.aucOn(df, col("lbl") === "p", col("value"))
      .collect()(0).getAs[Double]("auc") == 1.0)
    assert(Advanced.aucOn(df, col("lbl") === "n", col("value"))
      .collect()(0).getAs[Double]("auc") == 0.0)
  }

  // ---- MAD outliers --------------------------------------------------

  test("mad: flags exactly the planted extreme, robust to the plant itself") {
    // group A: 1.00..99.00 + one 200.00 plant (median 50, MAD 25 barely moved);
    // group B: tight cluster, no plants
    val a = (1 to 99).map(i => (i.toLong, "A", i.toDouble)) :+ (999L, "A", 200.0)
    val b = (1 to 50).map(i => (1000L + i, "B", 10.0 + (i % 3) * 0.01))
    val df = (a ++ b).toDF("c_custkey", "c_mktsegment", "bal")
    val got = Advanced.madOutliersOn(df).collect()
    assert(got.map(_.getLong(0)).toSet == Set(999L))
    val z = got.head.getAs[Double]("robust_z")
    assert(z > 3.0)
  }

  // ---- EWMA ----------------------------------------------------------

  test("ewma: distributed window == local recursion replay (sf0.001)") {
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val got = Advanced.ewmaOn(ev).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val weights = Array(1.0, 0.5, 0.25, 0.125, 0.0625, 0.03125, 0.015625, 0.0078125)
    val byUser = ev.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getDouble(3)))
      .groupBy(_._2)
    var checked = 0
    byUser.values.foreach { rows =>
      val ordered = rows.sortBy(r => (r._3.getTime, r._1))
      ordered.indices.foreach { i =>
        var num = 0.0; var den = 0.0
        (0 to math.min(7, i)).foreach { j =>
          num += ordered(i - j)._4 * weights(j) // same left-assoc order as the plan
          den += weights(j)
        }
        val want = BigDecimal(num / den)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(got(ordered(i)._1) == want,
          s"event ${ordered(i)._1}: got ${got(ordered(i)._1)} want $want")
        checked += 1
      }
    }
    assert(checked == got.size)
  }

  // ---- snapshot diff -------------------------------------------------

  test("u4: applying the diff to the old snapshot reproduces the new one") {
    val o = Tables.orders(spark, sf).select(col("o_orderkey"),
      round(col("o_totalprice"), 2).cast("decimal(18,2)").as("price"))
    val old = o.filter(pmod(col("o_orderkey"), lit(97)) =!= 0)
    val neu = o.filter(pmod(col("o_orderkey"), lit(101)) =!= 0)
      .select(col("o_orderkey"),
        when(pmod(col("o_orderkey"), lit(89)) === 0,
          (col("price") + lit(10)).cast("decimal(18,2)"))
          .otherwise(col("price")).as("price"))
    val diff = Advanced.snapshotDiff(old, neu, "o_orderkey", "price").collect()
      .map(r => (r.getLong(0), r.getString(1),
        Option(r.getDecimal(2)), Option(r.getDecimal(3))))
    val oldMap = old.collect().map(r => r.getLong(0) -> r.getDecimal(1)).toMap
    val neuMap = neu.collect().map(r => r.getLong(0) -> r.getDecimal(1)).toMap
    val rebuilt = collection.mutable.Map(oldMap.toSeq: _*)
    diff.foreach {
      case (k, "added", None, Some(p)) => rebuilt(k) = p
      case (k, "deleted", Some(_), None) => rebuilt.remove(k)
      case (k, "changed", Some(_), Some(p)) => rebuilt(k) = p
      case other => fail(s"malformed diff row $other")
    }
    assert(rebuilt.toMap == neuMap)
    // and the diff is minimal: no row for unchanged keys
    val unchanged = oldMap.keySet.intersect(neuMap.keySet)
      .filter(k => oldMap(k) == neuMap(k))
    assert(diff.map(_._1).toSet.intersect(unchanged).isEmpty)
  }

  // ---- TF-IDF cosine -------------------------------------------------

  test("sim1: planted duplicate pair scores 1.0; disjoint docs never pair") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "omega psi chi phi upsilon")).toDF("doc_id", "text")
    val got = Advanced.tfidfCosineOn(docs, minCosine = 0.0).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getAs[Double]("cosine"))).toMap
    assert(got.keySet == Set((1L, 2L)))
    assert(got((1L, 2L)) == 1.0)
  }

  // ---- k-hop reach ---------------------------------------------------

  test("hop1: path graph 3-hop reach matches the closed form") {
    // hop1 over the production graph is oracle-checked; here the
    // composition h1∪h2∪h3 is replayed by brute force on sf0.001
    val got = queries.Advanced.hop1KhopReach(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // brute-force replay from the same edge construction
    val c = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    // rebuild groups: (nationkey, mktsegment, custkey%10) sorted by custkey
    val adj = collection.mutable.Map[Long, Set[Long]]().withDefaultValue(Set())
    c.groupBy(t => (t._2, t._3, t._1 % 10)).values.foreach { grp =>
      val ks = grp.map(_._1).sorted
      ks.sliding(2).foreach { case Array(a, b) =>
        adj(a) += b; adj(b) += a
      case _ => }
      ks.sliding(3).foreach { case Array(a, _, b) =>
        adj(a) += b; adj(b) += a
      case _ => }
    }
    val want = adj.keys.map { v =>
      var frontier = Set(v); var seen = Set(v)
      (1 to 3).foreach { _ =>
        frontier = frontier.flatMap(adj) -- seen
        seen ++= frontier
      }
      v -> (seen - v).size.toLong
    }.toMap
    assert(got == want)
  }

  // ---- count-min sketch ----------------------------------------------

  test("cms1: estimates never undercount and are exact for isolated buckets") {
    val rows = queries.Advanced.cms1CountMin(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("est_cnt") >= r.getAs[Long]("true_cnt"),
        s"CMS undercounted: $r")
      assert(r.getAs[Long]("overcount") ==
        r.getAs[Long]("est_cnt") - r.getAs[Long]("true_cnt"))
    }
  }

  // ---- 2-D skyline ---------------------------------------------------

  test("sky1: frontier equals brute-force dominance filter") {
    val o = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_totalprice"),
        col("o_orderdate").cast("timestamp").cast("long").as("t"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val want = o.filter { case (_, p, t) =>
      !o.exists { case (_, p2, t2) =>
        p2 >= p && t2 >= t && (p2 > p || t2 > t)
      }
    }.map(_._1).toSet
    val got = queries.Advanced.sky1Pareto2d(spark, sf).collect()
      .map(_.getLong(0)).toSet
    assert(got == want && got.nonEmpty)
  }

  // ---- autocorrelation -----------------------------------------------

  test("acf1: alternating daily counts give the closed-form lags") {
    // days 1..8 with counts 1,3,1,3,... -> dev ±1, den=8, r1=-7/8, r2=6/8, r3=-5/8
    val rows = (1 to 8).flatMap { d =>
      val n = if (d % 2 == 1) 1 else 3
      (1 to n).map(i => java.sql.Timestamp.valueOf(f"2024-03-$d%02d 0$i:00:00"))
    }
    val got = Advanced.autocorrOn(rows.toDF("ts")).collect()
      .map(r => r.getAs[Int]("lag") -> r.getAs[Double]("autocorr")).toMap
    assert(math.abs(got(1) - (-0.875)) < 1e-9)
    assert(math.abs(got(2) - 0.75) < 1e-9)
    assert(math.abs(got(3) - (-0.625)) < 1e-9)
  }
}
