package graft

import org.apache.spark.sql.functions._

import graft.queries.Analytics
import graft.similarity.Pca

/** Round-8 analytics operators: PCA local-replay equivalence, KS
  * statistic vs a brute-force local computation, fusion/negative-mining
  * contracts, quality-rule consistency.
  */
class AnalyticsSpec extends SparkSpec {

  private lazy val localVecs: Array[Array[Double]] =
    Tables.embeddings(spark, sf).orderBy(col("vec_id"))
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)

  test("pca1: distributed power iteration == local replay") {
    val dim = 64
    val n = localVecs.length.toDouble
    // same 9dp requantization as the production iterate (the
    // cross-engine fixed point that lets pca1 carry a DuckDB dual)
    def r9(x: Double): Double =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val means = Array.tabulate(dim)(j => r9(localVecs.map(_(j)).sum / n))
    val centered = localVecs.map(v => Array.tabulate(dim)(j => v(j) - means(j)))
    var v = Array.fill(dim)(1.0 / math.sqrt(dim))
    var eig = 0.0
    for (_ <- 0 until 8) {
      val acc = new Array[Double](dim)
      centered.foreach { x =>
        val s = (0 until dim).map(j => x(j) * v(j)).sum
        (0 until dim).foreach(j => acc(j) += x(j) * s)
      }
      val cv = acc.map(a => r9(a / n))
      eig = math.sqrt(cv.map(y => y * y).sum)
      v = cv.map(_ / eig)
    }
    val (vd, eigD) = Pca.topComponent(
      Tables.embeddings(spark, sf), "embedding", dim, iters = 8)
    assert(math.abs(eigD - eig) / eig < 1e-9,
      s"eigenvalue mismatch: distributed $eigD vs local $eig")
    val cos = (0 until dim).map(j => vd(j) * v(j)).sum
    assert(math.abs(cos - 1.0) < 1e-9,
      s"component direction mismatch, cos=$cos")
    // the top eigenvalue dominates the variance of every coordinate axis
    val coordVar = (0 until dim).map(j =>
      centered.map(x => x(j) * x(j)).sum / n).max
    assert(eigD >= coordVar - 1e-9,
      s"eigenvalue $eigD below max coordinate variance $coordVar")
  }

  test("ks1: matches brute-force ECDF sup-distance; bounded in [0,1]") {
    val ev = Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "view"))
      .select(col("event_type"), col("value")).collect()
    val a = ev.filter(_.getString(0) == "click").map(_.getDouble(1)).sorted
    val b = ev.filter(_.getString(0) == "view").map(_.getDouble(1)).sorted
    val grid = (a ++ b).distinct.sorted
    def ecdf(xs: Array[Double], t: Double): Double =
      xs.count(_ <= t).toDouble / xs.length
    val expected = grid.map(t => math.abs(ecdf(a, t) - ecdf(b, t))).max
    val row = Analytics.ks1Drift(spark, sf).head()
    assert(row.getLong(0) == a.length && row.getLong(1) == b.length)
    val ks = row.getDouble(2)
    assert(math.abs(ks - expected) < 1e-12,
      s"ks $ks != brute force $expected")
    assert(ks >= 0.0 && ks <= 1.0)
  }

  test("rrf1: dense-rank consistency and monotone fusion order") {
    val rows = Analytics.rrf1RankFusion(spark, sf).collect()
    assert(rows.length == 20)
    assert(rows.map(_.getInt(0)).toSeq == (1 to 20))
    val rrfs = rows.map(_.getDouble(4))
    assert(rrfs.zip(rrfs.tail).forall { case (x, y) => x >= y },
      "rrf scores must be non-increasing in rank")
    // every fused doc carries at least one system rank
    assert(rows.forall(r => !r.isNullAt(2) || !r.isNullAt(3)))
  }

  test("hn1: negatives have a different label and valid per-query ranks") {
    val emb = Tables.embeddings(spark, sf)
    val labelOf = emb.filter(col("vec_id").isin(0L, 1L, 2L))
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = Analytics.hn1HardNegatives(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (q, rank, vid, label) =
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3))
      assert(label != labelOf(q), s"query $q negative $vid shares label")
      assert(rank >= 1 && rank <= 5)
      assert(vid != q)
    }
    // exactly top-5 per query, ranks distinct
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to 5))
    }
  }

  test("qf1: keep is the conjunction of the per-rule flags") {
    val rows = Analytics.qf1QualityRules(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val flags = Seq(2, 3, 4, 5).map(r.getInt)
      assert(r.getInt(6) == flags.product,
        s"keep != AND(flags) for doc ${r.getLong(0)}")
    }
  }

  test("ent1: entropy bounded by ln(n_distinct); uniform doc is exact") {
    val rows = Analytics.ent1WordEntropy(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nd, h) = (r.getLong(2), r.getDouble(3))
      // decimal per-term rounding moves each of nd terms < 5e-7
      assert(h >= -1e-4 && h <= math.log(nd.toDouble) + 1e-4,
        s"entropy $h outside [0, ln($nd)] for doc ${r.getLong(0)}")
    }
  }

  test("fun1: funnel stages are monotonically non-increasing") {
    val r = Analytics.fun1Funnel(spark, sf).head()
    val (users, c, v, p) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(users >= c && c >= v && v >= p,
      s"funnel not monotone: $users >= $c >= $v >= $p")
    assert(c > 0, "no users entered the funnel")
  }

  test("coh1: week-0 cell exists per cohort and equals its user count") {
    val rows = Analytics.coh1Cohort(spark, sf).collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_._1)
    byCohort.foreach { case (day, cells) =>
      assert(cells.exists(_._2 == 0), s"cohort $day missing week 0")
      // week 0 contains every user of the cohort (their first event)
      val w0 = cells.find(_._2 == 0).get._3
      assert(cells.forall(_._3 <= w0),
        s"cohort $day has a retention cell above its week-0 size")
    }
  }

  test("nrm1: per-group z-scores have zero mean and unit variance") {
    val rows = Analytics.nrm1Zscore(spark, sf).collect()
      .map(r => (r.getString(1), r.getDouble(2)))
    rows.groupBy(_._1).foreach { case (g, zs) =>
      val n = zs.length.toDouble
      val mean = zs.map(_._2).sum / n
      val varr = zs.map(z => z._2 * z._2).sum / n - mean * mean
      assert(math.abs(mean) < 1e-9, s"group $g z-mean $mean != 0")
      assert(math.abs(varr - 1.0) < 1e-9, s"group $g z-var $varr != 1")
    }
  }

  test("reg2: in-plan Cramer solve matches a local normal-equations solve") {
    import graft.text.TextFunctions
    val f = Tables.documents(spark, sf).select(
      TextFunctions.tokenCount(col("text")).cast("double").as("x1"),
      TextFunctions.stopwordCount(col("text")).cast("double").as("x2"),
      col("n_chars").cast("double").as("y")).collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
    val n = f.length.toDouble
    val (s1, s2, sy) = (f.map(_._1).sum, f.map(_._2).sum, f.map(_._3).sum)
    val s11 = f.map(t => t._1 * t._1).sum
    val s12 = f.map(t => t._1 * t._2).sum
    val s22 = f.map(t => t._2 * t._2).sum
    val s1y = f.map(t => t._1 * t._3).sum
    val s2y = f.map(t => t._2 * t._3).sum
    def det(a: Array[Array[Double]]) =
      a(0)(0) * (a(1)(1) * a(2)(2) - a(1)(2) * a(2)(1)) -
        a(0)(1) * (a(1)(0) * a(2)(2) - a(1)(2) * a(2)(0)) +
        a(0)(2) * (a(1)(0) * a(2)(1) - a(1)(1) * a(2)(0))
    val aM = Array(Array(n, s1, s2), Array(s1, s11, s12), Array(s2, s12, s22))
    val b = Array(sy, s1y, s2y)
    val d0 = det(aM)
    def repl(i: Int) = aM.indices.map(r =>
      aM(r).indices.map(c => if (c == i) b(r) else aM(r)(c)).toArray).toArray
    val w = (0 to 2).map(i => det(repl(i)) / d0)
    val row = Analytics.reg2Multireg(spark, sf).head()
    (0 to 2).foreach { i =>
      assert(math.abs(row.getDouble(i) - w(i)) < 1e-4,
        s"w$i ${row.getDouble(i)} != local ${w(i)}")
    }
    // residual RMSE consistency
    val sse = f.map { case (x1, x2, y) =>
      val e = y - w(0) - w(1) * x1 - w(2) * x2; e * e
    }.sum
    assert(math.abs(row.getDouble(4) - math.sqrt(sse / n)) < 1e-4)
  }

  test("ks2: day with the reference's own distribution drifts ~0; " +
       "degenerate day drifts high") {
    val rows = Analytics.ks2DailyDrift(spark, sf).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (day, nDay, drift) =>
      assert(drift >= 0.0 && drift <= 1.0, s"$day drift $drift out of range")
      assert(nDay > 0)
    }
    // sanity: daily samples from the same generator should sit well
    // below the max possible drift
    assert(rows.map(_._3).max < 0.9)
  }

  test("sub1: trigram-index candidates == brute-force contains scan") {
    import graft.text.Search
    val got = Search.substringSearch(Tables.documents(spark, sf), "vector")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val want = Tables.documents(spark, sf)
      .filter(col("text").contains("vector"))
      .select(col("doc_id"),
        ((length(col("text")) -
          length(replace(col("text"), lit("vector"), lit("")))) / 6)
          .cast("int"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(got === want)
    assert(got.nonEmpty, "needle absent from corpus — pick another")
  }

  test("mmr1: more diverse than plain top-k, deterministic, rank-1 = top-1") {
    val rows = Analytics.mmr1Diversified(spark, sf).collect()
    assert(rows.length == 10)
    assert(rows.map(_.getInt(0)).toSeq == (1 to 10))
    // rank 1 is the pure-relevance argmax (empty selected set)
    val topIds = Tables.embeddings(spark, sf).filter(col("vec_id") =!= 0)
    val rel = rows.map(_.getDouble(2))
    assert(rel(0) == rel.max, "MMR must open with the most relevant item")
    // diversity: avg pairwise cosine of the MMR set below the plain
    // top-10's (lambda < 1 must trade some relevance for coverage)
    val vecs = Tables.embeddings(spark, sf)
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]) = {
      val d = a.zip(b).map(t => t._1 * t._2).sum
      d / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    def avgPairSim(ids: Seq[Long]) = {
      val ps = for (i <- ids.indices; j <- i + 1 until ids.length)
        yield cos(vecs(ids(i)), vecs(ids(j)))
      ps.sum / ps.length
    }
    val qv = vecs(0L)
    val plainTop = vecs.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, cos(qv, v)) }
      .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1)
    val mmrIds = rows.map(_.getLong(1)).toSeq
    assert(avgPairSim(mmrIds) <= avgPairSim(plainTop) + 1e-12,
      "MMR set is not more diverse than the plain top-10")
    // deterministic across invocations
    val again = Analytics.mmr1Diversified(spark, sf).collect()
      .map(_.getLong(1)).toSeq
    assert(again == mmrIds)
  }

  test("pca2: fused iteration runs ONE aggregation job per round " +
      "(15 rounds + fixed setup, not the former 30+)") {
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        counter.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      Analytics.pca2Top2Map(spark, sf).collect()
      // listener delivery is async (the bus is private[spark]): poll
      // until the count is stable for two consecutive reads
      var last = -1
      var spins = 0
      while (counter.get() != last && spins < 30) {
        last = counter.get(); Thread.sleep(100); spins += 1
      }
      // AQE runs ~2 jobs per aggregation (shuffle-stage
      // materialization + final): the fused loop measures ~39 =
      // 15 rounds x 2 + means/count/Rayleigh-Ritz/final-collect
      // overhead. The pre-fusion shape (two 15-round runs + the
      // deflated-column build) was ~2x that; 45 is the regression
      // tripwire between the two regimes.
      assert(counter.get() <= 45,
        s"pca2 ran ${counter.get()} jobs — fusion regressed?")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("pca2: components orthogonal; projections match local replay") {
    val dim = 64
    val rows = Analytics.pca2Top2Map(spark, sf).collect()
    assert(rows.length == localVecs.length)
    // orthogonality via the projection covariance: corr(p1, p2) ~ 0
    val p1 = rows.map(_.getDouble(1)); val p2 = rows.map(_.getDouble(2))
    val n = rows.length.toDouble
    val c12 = p1.zip(p2).map(t => t._1 * t._2).sum / n -
      (p1.sum / n) * (p2.sum / n)
    val v1 = p1.map(x => x * x).sum / n - math.pow(p1.sum / n, 2)
    val v2 = p2.map(x => x * x).sum / n - math.pow(p2.sum / n, 2)
    assert(math.abs(c12) / math.sqrt(v1 * v2) < 1e-3,
      s"top-2 projections correlated: ${c12 / math.sqrt(v1 * v2)}")
    // the first component explains at least as much variance
    assert(v1 >= v2 - 1e-9)
  }

  test("ks3: streaming-shape histogram plan == ks2's join+window plan, " +
       "bit for bit") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getDate(0).toString, r.getLong(1), r.getDouble(2))
    val ks2 = Analytics.ks2DailyDrift(spark, sf).collect().map(key).toSet
    val ks3 = Analytics.ks3WindowedDrift(spark, sf).collect().map(key).toSet
    assert(ks3 === ks2)
    assert(ks3.nonEmpty)
  }

  test("w5: winsorized mean lies between trimmed bounds and differs " +
       "from raw mean only inside the clip band") {
    val raw = Tables.events(spark, sf)
      .groupBy(col("event_type")).agg(min(col("value")).as("lo"),
        max(col("value")).as("hi")).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val rows = Analytics.w5Winsorize(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (g, m) = (r.getString(0), r.getDouble(2))
      val (lo, hi) = raw(g)
      assert(m >= lo && m <= hi, s"winsorized mean $m outside [$lo,$hi]")
    }
  }

  test("tw1: time-weighted mean is a convex combination of the user's values") {
    val vals = Tables.events(spark, sf)
      .select(col("user_id"), col("value")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
      .groupBy(_._1).map { case (u, vs) => u -> vs.map(_._2) }
    val rows = Analytics.tw1TimeWeighted(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (u, m) = (r.getLong(0), r.getDouble(2))
      val vs = vals(u)
      assert(m >= vs.min - 1e-9 && m <= vs.max + 1e-9,
        s"user $u tw mean $m outside [${vs.min},${vs.max}]")
    }
  }

  test("mk1: transition probabilities sum to 1 per source state") {
    val rows = Analytics.mk1MarkovTransitions(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (from, ps) =>
      val s = ps.map(_._2).sum
      assert(math.abs(s - 1.0) < 1e-9, s"P(.|$from) sums to $s")
    }
  }

  test("rfm1: quartile scores span 1..4 and recency/monetary are sane") {
    val rows = Analytics.rfm1RfmScores(spark, sf).collect()
    assert(rows.nonEmpty)
    Seq(4, 5, 6).foreach { i =>
      val scores = rows.map(_.getInt(i)).toSet
      assert(scores.subsetOf(Set(1, 2, 3, 4)), s"col $i scores $scores")
      assert(scores.contains(1) && scores.contains(4))
    }
    rows.foreach { r =>
      assert(r.getInt(1) >= 0, "recency before the reference date")
      assert(r.getDouble(3) > 0.0)
    }
  }

  test("chi1: statistic non-negative, cell count = |types| x |bands|") {
    val r = Analytics.chi1ChisqIndependence(spark, sf).head()
    assert(r.getLong(0) <= 15, "more cells than 5 types x 3 bands")
    assert(r.getDouble(1) >= 0.0)
  }

  test("reg1: slope/intercept match closed-form least squares locally") {
    val pts = Tables.events(spark, sf)
      .select(col("event_type"),
        (floor(col("ts").cast("timestamp").cast("long") / 3600) - 473352L)
          .cast("double").as("x"),
        col("value")).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val rows = Analytics.reg1GroupLinreg(spark, sf).collect()
    rows.foreach { r =>
      val g = pts.filter(_._1 == r.getString(0))
      val n = g.length.toDouble
      val sx = g.map(_._2).sum; val sy = g.map(_._3).sum
      val sxx = g.map(p => p._2 * p._2).sum
      val sxy = g.map(p => p._2 * p._3).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      assert(math.abs(r.getDouble(2) - slope) < 1e-6,
        s"slope mismatch for ${r.getString(0)}")
    }
  }
}
