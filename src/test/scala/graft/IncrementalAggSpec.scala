package graft

import org.apache.spark.sql.functions._

import graft.ops.IncrementalAgg

/** Incremental aggregation maintenance: folding delta batches into
  * mergeable per-key state must equal the direct aggregate over all
  * history — for plain partials (count/sum/min/max) and for sketch
  * blobs (HLL union), in any batch order.
  */
class IncrementalAggSpec extends SparkSpec {

  private val keys = Seq("o_orderpriority")

  test("fold over 3 arbitrary splits == direct aggregate, any order") {
    val orders = Tables.orders(spark, sf)
    val partial = Seq(
      count(lit(1)).as("n"),
      sum(col("o_totalprice").cast("decimal(18,2)")).as("total"))
    val merge = Seq(sum(col("n")).as("n"), sum(col("total")).as("total"))

    val batches = (0 until 3).map(i =>
      orders.filter(pmod(col("o_orderkey"), lit(3)) === i))
    def foldAll(order: Seq[Int]) =
      order.foldLeft(IncrementalAgg.emptyState(orders, keys, partial)) {
        (st, i) => IncrementalAgg.fold(st, batches(i), keys, partial, merge)
      }

    val direct = orders.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("total"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDecimal(2)))
      .toMap
    for (order <- Seq(Seq(0, 1, 2), Seq(2, 0, 1))) {
      val got = foldAll(order)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDecimal(2)))
        .toMap
      assert(got.keySet === direct.keySet)
      got.foreach { case (k, (n, t)) =>
        assert(n === direct(k)._1, k)
        assert(t.compareTo(direct(k)._2) === 0, k)
      }
    }
  }

  test("sketch state: folded HLL union == direct sketch (lossless merge)") {
    val orders = Tables.orders(spark, sf)
    val partial = Seq(hll_sketch_agg(col("o_custkey"), 14).as("sk"))
    val merge = Seq(hll_union_agg(col("sk"), lit(true)).as("sk"))
    val batches = (0 until 2).map(i =>
      orders.filter(pmod(col("o_orderkey"), lit(2)) === i))
    val folded = batches.foldLeft(
        IncrementalAgg.emptyState(orders, keys, partial)) {
      (st, b) => IncrementalAgg.fold(st, b, keys, partial, merge)
    }
    val gotEst = folded
      .select(col("o_orderpriority"), hll_sketch_estimate(col("sk")).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val directEst = orders.groupBy(col("o_orderpriority"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("o_custkey"), 14)).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gotEst === directEst) // identical sketches, not just close
  }

  test("fold into empty state == partial alone; empty delta is a no-op") {
    val orders = Tables.orders(spark, sf)
    val partial = Seq(count(lit(1)).as("n"))
    val merge = Seq(sum(col("n")).as("n"))
    val s0 = IncrementalAgg.emptyState(orders, keys, partial)
    assert(s0.count() === 0)
    val s1 = IncrementalAgg.fold(s0, orders, keys, partial, merge)
    val s2 = IncrementalAgg.fold(s1, orders.limit(0), keys, partial, merge)
    val direct = orders.groupBy(col("o_orderpriority")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    Seq(s1, s2).foreach { st =>
      val got = st.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === direct)
    }
  }
}
