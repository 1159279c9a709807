package graft

import java.sql.Timestamp

import graft.ops.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  test("backward as-of: latest right at-or-before; null before first right") {
    val left = Seq(
      (1L, "u1", ts(0)),   // before any quote -> null
      (2L, "u1", ts(5)),   // quote@5 applies (equal ts matches)
      (3L, "u1", ts(7)),   // still quote@5
      (4L, "u1", ts(12)),  // quote@10
      (5L, "u2", ts(6))    // u2 quote@2
    ).toDF("event_id", "user", "ts")
    val right = Seq(
      ("u1", ts(5), 100.0),
      ("u1", ts(10), 200.0),
      ("u2", ts(2), 50.0),
      ("u3", ts(0), 9.0)   // key with no left rows
    ).toDF("user", "ts", "quote")

    val out = AsOfJoin.asofJoinBackward(left, right, "user", "ts", "ts")
      .orderBy("event_id").collect()
    assert(out.map(r => (r.getLong(0), if (r.isNullAt(3)) null else r.getDouble(3)))
      .toSeq === Seq(
      (1L, null), (2L, 100.0), (3L, 100.0), (4L, 200.0), (5L, 50.0)))
    // schema: left columns then payload
    assert(out.head.schema.fieldNames.toSeq ===
      Seq("event_id", "user", "ts", "quote"))
  }

  test("multiple right rows at the same ts: tiebreak pins the winner") {
    val left = Seq((1L, "u", ts(5))).toDF("id", "user", "ts")
    val right = Seq(("u", ts(5), 1.0), ("u", ts(5), 9.0))
      .toDF("user", "ts", "v")
    val out = AsOfJoin.asofJoinBackward(left, right, "user", "ts", "ts",
      rightTiebreak = Seq("v"))
    assert(out.head().getDouble(3) === 9.0) // last in (ts, v) order
  }

  test("null keys never match (SQL equi-join semantics)") {
    val left = Seq(
      (1L, Option("u"), ts(5)),
      (2L, Option.empty[String], ts(5)), // null key -> null payload
      (3L, Option.empty[String], ts(9))
    ).toDF("id", "user", "ts")
    val right = Seq(
      (Option("u"), ts(1), 7.0),
      (Option.empty[String], ts(1), 666.0) // null-keyed right: never carried
    ).toDF("user", "ts", "v")
    val out = AsOfJoin.asofJoinBackward(left, right, "user", "ts", "ts")
      .orderBy("id").collect()
    assert(out.map(r => (r.getLong(0), if (r.isNullAt(3)) null else r.getDouble(3)))
      .toSeq === Seq((1L, 7.0), (2L, null), (3L, null)))
  }

  test("empty right side leaves all payloads null") {
    val left = Seq((1L, "u", ts(1))).toDF("id", "user", "ts")
    val right = Seq.empty[(String, Timestamp, Double)].toDF("user", "ts", "v")
    val out = AsOfJoin.asofJoinBackward(left, right, "user", "ts", "ts")
    assert(out.count() === 1)
    assert(out.head().isNullAt(3))
  }
}
