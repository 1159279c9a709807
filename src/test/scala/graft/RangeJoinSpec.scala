package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  test("banded range join == naive cross-join filter, without the nested loop") {
    val rnd = new scala.util.Random(11)
    val points = (1 to 500).map(i => (i.toLong, ts(rnd.nextInt(600))))
      .toDF("pid", "pts")
    val intervals = (1 to 40).map { i =>
      val s = rnd.nextInt(550)
      (i.toLong, ts(s), ts(s + 1 + rnd.nextInt(90)))
    }.toDF("iid", "w_start", "w_end")

    val banded = RangeJoin.pointInInterval(
      points, "pts", intervals, "w_start", "w_end", bucketWidthSec = 1800)
      .select("pid", "iid").as[(Long, Long)].collect().toSet

    val naive = points.crossJoin(intervals)
      .filter(col("pts") >= col("w_start") && col("pts") < col("w_end"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet

    assert(banded === naive)
    assert(naive.nonEmpty)

    // the physical plan must be a hash equi-join on the bucket, not a
    // BroadcastNestedLoopJoin over the raw inequality
    val plan = RangeJoin.pointInInterval(
      points, "pts", intervals, "w_start", "w_end", bucketWidthSec = 1800)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop"), plan)
  }

  test("interval end is exclusive; empty/inverted intervals drop out") {
    val points = Seq((1L, ts(10)), (2L, ts(20))).toDF("pid", "pts")
    val intervals = Seq(
      (1L, ts(0), ts(10)),   // [0,10): excludes the ts(10) point
      (2L, ts(10), ts(21)),  // [10,21): both points
      (3L, ts(30), ts(30)),  // empty
      (4L, ts(40), ts(5))    // inverted
    ).toDF("iid", "w_start", "w_end")
    val out = RangeJoin.pointInInterval(
      points, "pts", intervals, "w_start", "w_end", bucketWidthSec = 60)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 2L), (2L, 2L)))
  }
}
