package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

/** As-of join: for every left row, attach the payload of the LATEST
  * right row with the same key and `rightTs <= leftTs` (left outer:
  * unmatched left rows keep null payload).
  *
  * Spark has no built-in as-of join, and the compositional encodings
  * are wrong at scale: an inequality theta-join explodes to
  * O(left x priorRights) before its max_by; a window over the union
  * can't carry *columns* across rows of different tables without
  * last(ignoreNulls) per payload column (one window function per
  * column, re-sorted). The right physical shape is the classic
  * streaming-merge: ONE hash shuffle on the key, ONE in-partition sort
  * by (key, ts, side), then a linear scan carrying the last-seen right
  * payload — implemented here with mapPartitions over the sorted
  * partition (SURVEY §2.3 noted as-of as absent; preference (d) per
  * the build rules is justified because the semantics are a
  * cross-row stateful carry that no built-in expresses without
  * blow-up).
  *
  * Scale: cost is shuffle(left+right) + sort, identical to a
  * sort-merge join; skewed keys behave like any skewed SMJ (AQE skew
  * handling applies to the exchange).
  *
  * Ties: right rows sort BEFORE left rows at equal (key, ts), so a
  * right row taking effect at t matches a left row at the same t
  * (DuckDB `ASOF JOIN ... ON l.ts >= r.ts` semantics). Multiple right
  * rows at the same (key, ts): the last in (key, ts, tiebreak) order
  * wins — pass `rightTiebreak` to pin it.
  */
object AsOfJoin {

  def asofJoinBackward(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTsCol: String,
      rightTsCol: String,
      rightTiebreak: Seq[String] = Nil): DataFrame = {
    val spark = left.sparkSession
    val leftCols = left.columns.toSeq
    val payloadCols = right.columns.toSeq
      .filterNot(c => c == keyCol || c == rightTsCol)

    // common layout: key, ts, side(0=right,1=left), left..., payload...
    val lNorm = left.select(
      col(keyCol).as("__k") +: col(leftTsCol).as("__ts") +: lit(1).as("__side") +:
        (leftCols.map(col) ++
          payloadCols.map(c => lit(null).cast(
            right.schema(c).dataType).as(s"__p_$c"))): _*)
    val rNorm = right.select(
      col(keyCol).as("__k") +: col(rightTsCol).as("__ts") +: lit(0).as("__side") +:
        (leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
          payloadCols.map(c => col(c).as(s"__p_$c"))): _*)

    val tieCols = rightTiebreak.map(c => col(s"__p_$c"))
    val sorted = lNorm.unionByName(rNorm)
      .repartition(col("__k"))
      .sortWithinPartitions(
        (col("__k") +: col("__ts") +: col("__side") +: tieCols): _*)

    val outSchema = StructType(
      left.schema.fields ++
        payloadCols.map(c => right.schema(c).copy(nullable = true)))
    val nLeft = leftCols.length
    val nPayload = payloadCols.length
    val rowEncoder = org.apache.spark.sql.Encoders.row(outSchema)

    val joined = sorted.mapPartitions { it =>
      var curKey: Any = null
      var lastPayload: Array[Any] = null
      it.flatMap { r =>
        val k = r.get(0)
        if (k != curKey) { curKey = k; lastPayload = null }
        // SQL equi-key semantics: NULL keys never match (DuckDB ASOF
        // JOIN drops them) — suppress the stateful carry entirely so
        // null-keyed left rows get a null payload.
        if (k == null) {
          if (r.getInt(2) == 0) Iterator.empty
          else {
            val leftVals = Array.tabulate(nLeft)(i => r.get(3 + i))
            Iterator.single(Row.fromSeq(
              leftVals.toIndexedSeq ++ Seq.fill[Any](nPayload)(null)))
          }
        } else if (r.getInt(2) == 0) {
          // right row: update carried payload
          lastPayload = Array.tabulate(nPayload)(i => r.get(3 + nLeft + i))
          Iterator.empty
        } else {
          val leftVals = Array.tabulate(nLeft)(i => r.get(3 + i))
          val payload =
            if (lastPayload != null) lastPayload
            else Array.fill[Any](nPayload)(null)
          Iterator.single(Row.fromSeq(
            leftVals.toIndexedSeq ++ payload.toIndexedSeq))
        }
      }
    }(rowEncoder)
    joined.toDF()
  }
}
