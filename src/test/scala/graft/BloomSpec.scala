package graft

import org.apache.spark.sql.functions._

import graft.functions.{BloomFunctions, BloomUtil}

/** Bloom-filter aggregate + probe: no false negatives (the correctness
  * contract), fpp within sizing bounds, OR-mergeability across
  * partitions, SQL surface, and the composed prune==semi-join identity
  * the bf1 query relies on.
  */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  private val m = 1 << 14 // 16384 bits
  private val k = 7

  test("no false negatives: every inserted key probes true") {
    val keys = (1L to 1000L).map(_ * 37L)
    val blob = keys.toDF("id")
      .repartition(8)
      .agg(BloomFunctions.bloom_agg(col("id"), m, k).as("bf"))
      .select("bf").as[Array[Byte]].head()
    assert(keys.forall(BloomUtil.mightContain(blob, _)))
  }

  test("fpp stays near the sizing formula on non-members") {
    val n = 1000
    val blob = (1L to n.toLong).toDF("id")
      .agg(BloomFunctions.bloom_agg(col("id"), m, k).as("bf"))
      .select("bf").as[Array[Byte]].head()
    val probes = (1_000_001L to 1_020_000L)
    val fp = probes.count(BloomUtil.mightContain(blob, _)).toDouble / probes.size
    // theory: (1 - e^{-kn/m})^k ≈ 0.00022 at n=1000, m=16384, k=7;
    // allow a generous factor for hash variance
    assert(fp < 0.005, s"false-positive rate $fp")
  }

  test("partial buffers merge by OR: partitioned build == single-partition build") {
    val df = (1L to 5000L).toDF("id")
    val one = df.coalesce(1)
      .agg(BloomFunctions.bloom_agg(col("id"), m, k).as("bf"))
      .select("bf").as[Array[Byte]].head()
    val many = df.repartition(32)
      .agg(BloomFunctions.bloom_agg(col("id"), m, k).as("bf"))
      .select("bf").as[Array[Byte]].head()
    assert(java.util.Arrays.equals(one, many))
  }

  test("might_contain agrees between codegen and interpreted eval") {
    val blob = (1L to 100L).toDF("id")
      .agg(BloomFunctions.bloom_agg(col("id"), m, k).as("bf"))
      .select("bf").as[Array[Byte]].head()
    val probe = (1L to 200L).toDF("id")
    val viaExpr = probe
      .withColumn("bf", lit(blob))
      .filter(BloomFunctions.might_contain(col("bf"), col("id")))
      .select("id").as[Long].collect().toSet
    val viaUtil = (1L to 200L).filter(BloomUtil.mightContain(blob, _)).toSet
    assert(viaExpr === viaUtil)
    assert((1L to 100L).toSet.subsetOf(viaExpr))
  }

  test("SQL surface: bloom_agg + might_contain round-trip") {
    graft.functions.GraftExtensions.register(spark)
    (1L to 50L).toDF("id").createOrReplaceTempView("bloom_build")
    (1L to 100L).toDF("id").createOrReplaceTempView("bloom_probe")
    val kept = spark.sql(
      s"""SELECT p.id FROM bloom_probe p
          CROSS JOIN (SELECT bloom_agg(id, $m, $k) AS bf FROM bloom_build) b
          WHERE might_contain(b.bf, p.id)""")
      .as[Long].collect().toSet
    assert((1L to 50L).toSet.subsetOf(kept))
  }

  test("probe rejects corrupt blobs instead of disabling pruning or spinning") {
    // too short to hold header + bitset
    intercept[IllegalArgumentException] {
      BloomUtil.mightContain(Array[Byte](0, 0, 0), 42L)
    }
    // all-zero header (numHashes=0) would make every probe return true
    intercept[IllegalArgumentException] {
      BloomUtil.mightContain(new Array[Byte](16), 42L)
    }
    // absurd header (2^24) would probe ~16M positions per row
    val big = new Array[Byte](16); big(0) = 1
    intercept[IllegalArgumentException] {
      BloomUtil.mightContain(big, 42L)
    }
  }

  test("bloom prune + exact semi-join == plain semi-join (bf1 identity)") {
    val d = "/root/testdata/sf0.001"
    val got = graft.queries.Relational.bf1BloomPrune(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val urgent = Tables.orders(spark, d)
      .filter(col("o_orderpriority") === "1-URGENT" &&
        col("o_totalprice") > 150000)
      .select("o_orderkey")
    val want = Tables.lineitem(spark, d)
      .join(urgent, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
        graft.ops.Ops.dsum(col("l_quantity")).as("sum_qty"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === want)
  }
}
