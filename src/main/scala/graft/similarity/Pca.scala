package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed top-principal-component extraction via fixed-iteration
  * power iteration — the dimensionality-reduction primitive an
  * embedding pipeline needs before energy-ordered quantization
  * (PQ/IVF build on it) and for cheap 1-D corpus maps.
  *
  * Scale design: the only state that moves between rounds is ONE
  * dim-length vector on the driver (what a parameter server would
  * hold); each round is a single scan of the cached centered column
  * plus a dim-row shuffle (posexplode -> groupBy(pos) partial sums).
  * Nothing here is quadratic in rows or dims; at 100 TB the cost is
  * `iters` cached columnar scans. Deterministic by construction: the
  * starting direction is the fixed all-ones unit vector, the
  * iteration count is fixed (no convergence races), and executors
  * only ever see broadcast literals.
  */
object Pca {

  /** Per-dimension means of an array column: one partial-aggregating
    * posexplode pass; exactly `dim` rows reach the shuffle.
    */
  def dimMeans(emb: DataFrame, vecCol: String, dim: Int): Array[Double] = {
    val rows = emb
      .select(posexplode(col(vecCol).cast("array<double>")).as(Seq("pos", "x")))
      .groupBy(col("pos")).agg(avg(col("x")).as("m"))
      .collect()
    val out = new Array[Double](dim)
    rows.foreach(r => out(r.getInt(0)) = r.getDouble(1))
    out
  }

  /** `iters` rounds of v <- normalize( Σ_x (x-m) ((x-m)·v) ), starting
    * from the all-ones unit direction. Returns (component, eigenvalue)
    * with eigenvalue = ||C v|| of the final step (the Rayleigh-quotient
    * limit, C the covariance matrix) — so the pair is directly
    * checkable against a local replay (AnalyticsSpec).
    */
  def topComponent(emb: DataFrame, vecCol: String, dim: Int,
                   iters: Int = 8): (Array[Double], Double) =
    iterate(emb, vecCol, dim, iters, dimMeans(emb, vecCol, dim))

  private def iterate(emb: DataFrame, vecCol: String, dim: Int,
                      iters: Int, means: Array[Double]): (Array[Double], Double) = {
    val n = emb.count().toDouble
    val centered = emb
      .select(zip_with(col(vecCol).cast("array<double>"),
        typedLit(means.toSeq), (x, m) => x - m).as("__c"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var v = Array.fill(dim)(1.0 / math.sqrt(dim))
    var eigen = 0.0
    try {
      for (_ <- 0 until iters) {
        val scored = centered.withColumn("__s",
          Similarity.dot(col("__c"), typedLit(v.toSeq)))
        val sums = scored
          .select(posexplode(transform(col("__c"), x => x * col("__s")))
            .as(Seq("pos", "xs")))
          .groupBy(col("pos")).agg(sum(col("xs")).as("s"))
          .collect()
        val acc = new Array[Double](dim)
        sums.foreach(r => acc(r.getInt(0)) = r.getDouble(1))
        val cv = acc.map(_ / n) // C v (covariance-matrix action)
        eigen = math.sqrt(cv.map(x => x * x).sum)
        v = if (eigen == 0.0) v else cv.map(_ / eigen)
      }
      (v, eigen)
    } finally centered.unpersist()
  }

  /** 1-D projection of every vector onto the top component:
    * (idCol, proj) with proj = (x - m)·v. One scan, no shuffle.
    */
  def projectTop(emb: DataFrame, idCol: String, vecCol: String,
                 dim: Int, iters: Int = 8): DataFrame = {
    val means = dimMeans(emb, vecCol, dim)
    val (v, _) = iterate(emb, vecCol, dim, iters, means)
    emb.select(col(idCol),
      Similarity.dot(
        zip_with(col(vecCol).cast("array<double>"),
          typedLit(means.toSeq), (x, m) => x - m),
        typedLit(v.toSeq)).as("proj"))
  }
}
