package graft

import org.apache.spark.sql.functions._

import graft.queries.Journey

/** Markov attribution: hand-solvable planted journeys, probability
  * laws on the real corpus.
  */
@graft.tags.Slow
class JourneySpec extends SparkSpec {
  import spark.implicits._

  private def t(day: Int, hour: Int) =
    java.sql.Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:00:00")

  test("mta1: a click-only funnel attributes everything to click") {
    val dir = java.nio.file.Files.createTempDirectory("mta1").toString
    // u1, u2: click -> purchase; u3: click -> no purchase
    // chain: start -> click (p=1); click -> conv (2/3), click -> null (1/3)
    val rows = Seq(
      (1L, t(1, 1), 1L, "click", 1.0, "{}"),
      (2L, t(1, 2), 1L, "purchase", 9.0, "{}"),
      (3L, t(1, 1), 2L, "click", 1.0, "{}"),
      (4L, t(1, 2), 2L, "purchase", 9.0, "{}"),
      (5L, t(1, 1), 3L, "click", 1.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Journey.mta1MarkovAttribution(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getAs[Double]("conv_prob6"),
        Option(r.getAs[Double]("removal_effect6"))))).toMap
    assert(math.abs(out("base")._1 - 2.0 / 3.0) < 1e-6)
    assert(out("base")._2.isEmpty)
    // removing click kills every conversion
    assert(out("no_click")._1 == 0.0)
    assert(math.abs(out("no_click")._2.get - 1.0) < 1e-9)
  }

  test("mta1: corpus probabilities are in [0,1]; removal effects in [0,1]; base is max") {
    val out = Journey.mta1MarkovAttribution(spark, sf).collect()
      .map(r => (r.getString(0), r.getAs[Double]("conv_prob6"),
        Option(r.get(2)).map(_.asInstanceOf[Double])))
    val base = out.find(_._1 == "base").get
    assert(base._2 > 0.0 && base._2 <= 1.0)
    out.filterNot(_._1 == "base").foreach { case (_, p, re) =>
      assert(p >= 0.0 && p <= base._2 + 1e-9)
      assert(re.get >= -1e-9 && re.get <= 1.0 + 1e-9)
    }
    // every non-purchase channel present as a variant
    val chans = Tables.events(spark, sf)
      .filter(col("event_type") =!= "purchase")
      .select(col("event_type")).distinct().count()
    assert(out.length.toLong == chans + 1)
  }
}
