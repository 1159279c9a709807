package graft

import org.apache.spark.sql.functions._

import graft.queries.Shape

/** Distribution-shaping batch: the minimax isotonic fit must be
  * monotone, conserve the weighted mean, and equal a sequential
  * pool-adjacent-violators reference; quantile normalization's
  * reference row is the cross-group bin mean.
  */
@graft.tags.Slow
class ShapeSpec extends SparkSpec {

  /** Sequential weighted PAV (non-decreasing) over (mean, weight)
    * bins in order — the textbook stack algorithm.
    */
  private def pav(bins: Seq[(Double, Double)]): Seq[Double] = {
    case class Block(sum: Double, w: Double, size: Int) {
      def mean: Double = sum / w
    }
    val st = scala.collection.mutable.ArrayBuffer.empty[Block]
    for ((y, w) <- bins) {
      st += Block(y * w, w, 1)
      while (st.length >= 2 &&
          st(st.length - 2).mean >= st.last.mean - 1e-15) {
        val b = st.remove(st.length - 1)
        val a = st.remove(st.length - 1)
        st += Block(a.sum + b.sum, a.w + b.w, a.size + b.size)
      }
    }
    st.flatMap(b => Seq.fill(b.size)(b.mean)).toSeq
  }

  test("iso1: monotone, conserves the weighted sum, equals " +
      "sequential PAV") {
    val rows = Shape.iso1IsotonicRate(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Double]("rate6"), r.getAs[Double]("iso6")))
      .sortBy(_._1)
    assert(rows.length >= 5)
    val iso = rows.map(_._4)
    assert(iso.zip(iso.tail).forall { case (a, b) => b >= a - 1e-9 },
      "isotonic fit must be non-decreasing")
    val wSum = rows.map { case (_, n, _, is) => is * n }.sum
    val ySum = rows.map { case (_, n, rate, _) => rate * n }.sum
    assert(math.abs(wSum - ySum) < 1e-2,
      "PAV conserves the weighted outcome total")
    val ref = pav(rows.map { case (_, n, rate, _) =>
      (rate, n.toDouble) })
    iso.zip(ref).zipWithIndex.foreach { case ((got, want), i) =>
      assert(math.abs(got - want) < 1e-5,
        s"bin ${rows(i)._1}: minimax $got != PAV $want")
    }
  }

  test("qn1: reference row is the cross-group mean of bin means; " +
      "per-group means rise with the quantile bin") {
    val rows = Shape.qn1QuantileNormalize(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1),
        r.getAs[Double]("mean6"), r.getAs[Double]("ref6")))
    val groups = rows.map(_._1).distinct
    assert(groups.length == 5)
    rows.groupBy(_._2).foreach { case (_, g) =>
      val want = g.map(_._3).sum / g.length
      assert(math.abs(g.head._4 - want) < 1e-5)
      assert(g.map(_._4).distinct.length == 1)
    }
    rows.groupBy(_._1).foreach { case (_, g) =>
      val means = g.sortBy(_._2).map(_._3)
      assert(means.zip(means.tail).forall { case (a, b) =>
        b >= a - 1e-9 })
    }
  }
}
