package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join without an equi-key: each point row joins
  * every interval row whose `[start, end)` contains the point.
  *
  * Spark plans a pure inequality join as BroadcastNestedLoopJoin —
  * O(points x intervals) comparisons and a broadcast of one whole
  * side; correct, but dead at 100 TB. This implements the standard
  * banding decomposition both Flink interval joins and warehouse
  * range-join optimizations use (cf. SNIPPETS.md range-join notes):
  *
  *  1. quantize time into fixed-width buckets,
  *  2. explode each interval into the buckets it covers (`sequence`),
  *  3. bucket each point (one value — a point covers one bucket),
  *  4. hash equi-join on bucket,
  *  5. re-apply the exact `start <= t < end` predicate.
  *
  * Every qualifying (point, interval) pair meets in EXACTLY ONE
  * bucket — the point's — so no post-join dedup is needed. Shuffle =
  * |points| + sum(interval spans / width); the join is an ordinary
  * hash equi-join, so AQE skew splitting applies to hot buckets.
  * Pick `bucketWidthSec` near the typical interval length: too small
  * explodes intervals into many buckets, too large packs everything
  * into few buckets (degenerating toward the nested loop).
  *
  * Column names must be disjoint between the two inputs (standard
  * USING-join hygiene; rename before calling otherwise).
  */
object RangeJoin {

  def pointInInterval(
      points: DataFrame,
      pointTsCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      bucketWidthSec: Long): DataFrame = {
    require(bucketWidthSec > 0, "bucketWidthSec must be positive")
    val widthUs = bucketWidthSec * 1000000L

    def bucketOf(c: Column): Column = floor(unix_micros(c) / widthUs)

    val p = points.withColumn("__bucket", bucketOf(col(pointTsCol)))
    // [start, end): the last covered bucket is the one holding end-1us
    val i = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("__bucket",
        explode(sequence(bucketOf(col(startCol)),
          floor((unix_micros(col(endCol)) - 1) / widthUs))))

    p.join(i, Seq("__bucket"))
      .filter(col(pointTsCol) >= col(startCol) &&
        col(pointTsCol) < col(endCol))
      .drop("__bucket")
  }
}
