package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.graph.ConnectedComponents
import graft.dedup.Dedup

/** Connected components (star contraction) vs a driver-side union-find
  * oracle, plus the dedup-cluster wrappers built on it. Plain
  * scalacheck generators with fixed seeds (PropertySpec's pattern).
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Reference union-find (path compression, driver-side). */
  private def unionFind(
      nodes: Set[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x
      while (parent.getOrElse(c, c) != c) {
        val next = parent.getOrElse(c, c); parent(c) = r; c = next
      }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    (nodes ++ edges.flatMap(e => Seq(e._1, e._2)))
      .map(n => n -> find(n)).toMap
  }

  private def ccMap(edges: Seq[(Long, Long)],
      nodes: Option[Seq[Long]] = None): Map[Long, Long] = {
    val e = edges.toDF("src", "dst")
    val n = nodes.map(_.toDF("node"))
    // run BOTH execution paths: the hybrid default (which driver-
    // finishes these small graphs) and the forced fully-distributed
    // star contraction; they must agree row for row
    val rows = ConnectedComponents.run(e, "src", "dst", n)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val distributed = ConnectedComponents
      .run(e, "src", "dst", n, driverFinishEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(rows.sorted.toSeq === distributed.sorted.toSeq,
      "hybrid and distributed paths disagree")
    val m = rows.toMap
    // one component per node — duplicate membership rows (the symptom
    // of a premature-convergence bug) must fail loudly, not be
    // silently collapsed by toMap
    assert(rows.length == m.size,
      s"duplicate node rows: ${rows.groupBy(_._1).filter(_._2.length > 1)}")
    m
  }

  test("path graph collapses to one component (worst case for label prop)") {
    val n = 200L
    val edges = (1L until n).map(i => (i, i + 1))
    val got = ccMap(scala.util.Random.shuffle(edges))
    assert(got.size == n)
    assert(got.values.toSet == Set(1L))
  }

  test("two components + isolated nodes via the nodes param") {
    val edges = Seq((10L, 11L), (11L, 12L), (20L, 21L))
    val got = ccMap(edges, Some(Seq(10L, 11L, 12L, 20L, 21L, 99L)))
    assert(got == Map(10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L, 99L -> 99L))
  }

  test("regression: mid-merge two-parent state must not be declared " +
      "converged (probe soundness counterexample)") {
    // After one round, {5-10, 5-20, 1-10, 2-20} becomes
    // {(5,1),(5,2),(10,1),(20,2)}: no parent is a child, but node 5
    // hangs under BOTH roots — a chain-free probe alone stops here and
    // returns node 5 in two components. All four edges are one
    // component with min 1.
    val got = ccMap(Seq((5L, 10L), (5L, 20L), (1L, 10L), (2L, 20L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 5L -> 1L, 10L -> 1L, 20L -> 1L))
  }

  test("self-loops and duplicate/reversed edges are harmless") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 1L), (2L, 3L), (3L, 2L))
    assert(ccMap(edges) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("random graphs match driver-side union-find") {
    val genEdges: Gen[(Int, List[(Long, Long)])] = for {
      nNodes <- Gen.choose(2, 60)
      nEdges <- Gen.choose(0, 90)
      edges <- Gen.listOfN(nEdges, for {
        a <- Gen.choose(0, nNodes - 1)
        b <- Gen.choose(0, nNodes - 1)
      } yield (a.toLong, b.toLong))
    } yield (nNodes, edges)
    (1 to 8).flatMap(i =>
      genEdges.apply(Gen.Parameters.default, Seed(i.toLong)))
      .foreach { case (nNodes, edges) =>
        val nodes = (0L until nNodes.toLong).toSeq
        val expected = unionFind(nodes.toSet, edges)
        val got = ccMap(edges.filter(e => e._1 != e._2), Some(nodes))
        assert(got == expected)
      }
  }

  test("deterministic across runs") {
    val edges = (1L to 50L).map(i => (i, i * 2 % 51)).filter(e => e._1 != e._2)
    assert(ccMap(edges) == ccMap(edges))
  }

  test("nearDupClusters/keepAfterClusters: transitive closure semantics") {
    val docs = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e"))
      .toDF("doc_id", "text")
    // chain 1~3, 2~3: one cluster {1,2,3}; greedy pairs would keep {1,2}
    val pairs = Seq((1L, 3L), (2L, 3L)).toDF("id_a", "id_b")
    val clusters = Dedup.nearDupClusters(docs, "doc_id", pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L))
    val kept = Dedup.keepAfterClusters(docs, "doc_id", pairs)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 4L, 5L))
    // contrast: greedy pair-based keep retains 2 (no smaller-id NEIGHBOR)
    val greedy = Dedup.keepAfterPairs(docs, "doc_id", pairs)
      .select("doc_id").as[Long].collect().toSet
    assert(greedy == Set(1L, 2L, 4L, 5L))
  }

  test("g1_components matches its analytic oracle shape on sf0.001") {
    val got = graft.queries.Extensions.g1Components(spark, sf)
    val expected = Tables.customer(spark, sf)
      .select(col("c_custkey").cast("long").as("node"),
        min(col("c_custkey").cast("long"))
          .over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("c_nationkey"), col("c_mktsegment"),
              pmod(col("c_custkey"), lit(10))))
          .as("component"))
    assert(got.except(expected).count() == 0 &&
      expected.except(got).count() == 0)
  }

  test("PageRank: conservation, dangling redistribution, star-graph order") {
    import graft.graph.PageRank
    // star: a,b,c -> hub; hub dangling (no out-edges)
    val edges = Seq(("a", "hub"), ("b", "hub"), ("c", "hub"))
      .toDF("src", "dst")
    val pr = PageRank.run(edges, iters = 8).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(pr.size === 4)
    // total mass conserved (to rounding): sums to ~1
    assert(math.abs(pr.values.sum - 1.0) < 1e-6, s"mass: ${pr.values.sum}")
    // hub collects from all spokes: strictly the largest
    assert(pr("hub") > pr("a") && pr("a") === pr("b") && pr("b") === pr("c"))
  }

  test("PageRank on sf0.001 trade graph: mass conserved, ranks positive") {
    val got = graft.queries.Extensions.g2Pagerank(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(1))
    assert(got.nonEmpty)
    val mass = got.map(_._2).sum
    assert(math.abs(mass - 1.0) < 1e-5, s"mass: $mass")
    assert(got.forall(_._2 > 0))
  }
}
