package graft

import org.apache.spark.sql.functions._

import graft.queries.Uplift

/** Uplift-evaluation batch: decile partition, planted persuadables
  * surfacing in the top deciles, terminal Qini identity.
  */
class UpliftSpec extends SparkSpec {
  import spark.implicits._

  test("lift1: deciles partition the users; terminal Qini is finite") {
    val rows = Uplift.lift1QiniDeciles(spark, sf).collect()
      .sortBy(_.getInt(0))
    assert(rows.length == 10)
    val users = Tables.events(spark, sf)
      .select(col("user_id")).distinct().count()
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum == users)
    assert(!rows.last.getAs[Double]("qini6").isNaN)
  }

  test("lift1: planted persuadables (treated-only responders with " +
      "high scores) concentrate uplift in the top deciles") {
    def armOf(u: Long) = ((u * 2654435761L + 23L) % 4294967296L % 2).toInt
    def t(day: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")
    val dir = java.nio.file.Files.createTempDirectory("lift1").toString
    // 200 users; the 50 highest-score users respond post-period IFF
    // treated; everyone else never responds
    val users = (1L to 200L)
    val rows = users.flatMap { u =>
      val score = u.toDouble // user id IS the score
      val pre = Seq((u * 10, t(3), u, "purchase", score, "{}"))
      val persuadable = u > 150
      val post =
        if (persuadable && armOf(u) == 1)
          Seq((u * 10 + 1, t(20), u, "purchase", 1.0, "{}"))
        else Seq.empty
      pre ++ post
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value",
      "props").write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Uplift.lift1QiniDeciles(spark, dir).collect()
      .sortBy(_.getInt(0))
    // deciles 1-2 (top 40 scores within the top-50 block + spill)
    // carry all the uplift; the bottom half carries none
    assert(out.head.getAs[Double]("uplift6") > 0.5,
      s"top decile uplift ${out.head.getAs[Double]("uplift6")}")
    out.drop(5).foreach { r =>
      assert(math.abs(r.getAs[Double]("uplift6")) < 1e-9,
        s"decile ${r.getInt(0)} should carry no uplift")
    }
    // terminal Qini = Yt - Yc * Nt/Nc computed from the raw plant
    val nt = users.count(armOf(_) == 1).toDouble
    val nc = users.size - nt
    val ytTot = users.count(u => u > 150 && armOf(u) == 1).toDouble
    val want = ytTot - 0.0 * nt / nc
    assert(math.abs(out.last.getAs[Double]("qini6") - want) < 1e-6)
  }
}
