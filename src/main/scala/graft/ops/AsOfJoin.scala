package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of joins: for every left row, attach the payload of the right
  * row with the same key that is nearest in time under a direction
  * constraint (left outer: unmatched left rows keep null payload).
  *
  *  - backward: LATEST right with `rightTs <= leftTs` (the default
  *    financial-data semantics; DuckDB `ASOF JOIN ON l.ts >= r.ts`)
  *  - forward:  EARLIEST right with `rightTs >= leftTs`
  *    (DuckDB `ASOF JOIN ON l.ts <= r.ts`)
  *  - nearest:  whichever of the two is closer; ties -> backward
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
  * sort-merge join. Skewed keys concentrate in one partition (the
  * stateful carry needs each key's full timeline, and AQE's skew
  * splitting does not apply to this custom exchange) — mitigate by
  * pre-aggregating the right side per (key, ts) and pre-filtering
  * left to the keys of interest. `nearest` additionally buffers
  * the left rows between two consecutive right rows of one key (it
  * must see the next-future right before deciding) — bounded by the
  * left:right arrival ratio, not the partition size.
  *
  * Ties: right rows sort BEFORE left rows at equal (key, ts), so a
  * right row taking effect at t matches a left row at the same t.
  * Multiple right rows at the same (key, ts): the last in (key, ts,
  * tiebreak) order wins for backward, the first for forward — pass
  * `rightTiebreak` (or pre-dedup per (key, ts)) to pin it.
  *
  * NULL keys never match (SQL equi-join semantics, as DuckDB ASOF):
  * null-keyed left rows get a null payload, null-keyed right rows are
  * dropped.
  */
object AsOfJoin {

  def asofJoinBackward(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTsCol: String,
      rightTsCol: String,
      rightTiebreak: Seq[String] = Nil): DataFrame =
    asofScan(left, right, keyCol, leftTsCol, rightTsCol, rightTiebreak,
      forward = false)

  def asofJoinForward(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTsCol: String,
      rightTsCol: String,
      rightTiebreak: Seq[String] = Nil): DataFrame =
    asofScan(left, right, keyCol, leftTsCol, rightTsCol, rightTiebreak,
      forward = true)

  /** Shared one-shuffle merge scan. `forward = true` sweeps time
    * DESCENDING, so "last seen right" is the earliest right at-or-after
    * the left row — the exact mirror of the backward carry.
    */
  private def asofScan(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTsCol: String,
      rightTsCol: String,
      rightTiebreak: Seq[String],
      forward: Boolean): DataFrame = {
    val (sorted, outSchema, nLeft, nPayload) =
      normalize(left, right, keyCol, leftTsCol, rightTsCol, rightTiebreak,
        descendingTs = forward)
    val rowEncoder = org.apache.spark.sql.Encoders.row(outSchema)

    val joined = sorted.mapPartitions { it =>
      var curKey: Any = null
      var lastPayload: Array[Any] = null
      it.flatMap { r =>
        val k = r.get(0)
        if (k != curKey) { curKey = k; lastPayload = null }
        if (k == null || r.isNullAt(1)) {
          // SQL comparison semantics: NULL keys and NULL timestamps
          // never satisfy the as-of predicate — suppress the stateful
          // carry (null-ts rights are dropped regardless of where the
          // sweep direction sorts them) so such lefts get null payload
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

  /** Nearest-in-time as-of: per left row, the closer of the backward
    * and forward matches (ties -> backward). Single ascending merge
    * scan: left rows buffer until the next right row of their key
    * arrives (which fixes their forward candidate), then flush.
    */
  def asofJoinNearest(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTsCol: String,
      rightTsCol: String,
      rightTiebreak: Seq[String] = Nil): DataFrame = {
    val (sorted, outSchema, nLeft, nPayload) =
      normalize(left, right, keyCol, leftTsCol, rightTsCol, rightTiebreak,
        descendingTs = false)
    val rowEncoder = org.apache.spark.sql.Encoders.row(outSchema)

    val joined = sorted.mapPartitions { it =>
      var curKey: Any = null
      var lastPayload: Array[Any] = null
      var lastTs: Long = 0L
      // lefts since the previous right of this key: (vals, backDist or -1)
      val pending = scala.collection.mutable.ArrayBuffer
        .empty[(Array[Any], Long)]
      val out = scala.collection.mutable.Queue.empty[Row]

      def flush(fwdPayload: Array[Any], fwdTs: Long, haveFwd: Boolean): Unit = {
        pending.foreach { case (leftVals, backDist) =>
          val useBack =
            if (backDist < 0) false
            else if (!haveFwd) true
            else backDist <= fwdTs - tsOf(leftVals) // tie -> backward
          val payload =
            if (useBack) lastPayloadAt(leftVals) // captured below
            else if (haveFwd) fwdPayload
            else Array.fill[Any](nPayload)(null)
          out += Row.fromSeq(leftVals.take(nLeft).toIndexedSeq ++
            payload.toIndexedSeq)
        }
        pending.clear()
      }
      // leftVals layout: [left cols..., backPayload..., leftTsMicros]
      def tsOf(v: Array[Any]): Long = v(v.length - 1).asInstanceOf[Long]
      def lastPayloadAt(v: Array[Any]): Array[Any] =
        v.slice(nLeft, nLeft + nPayload)

      new Iterator[Row] {
        private var done = false
        private def fill(): Unit = {
          while (out.isEmpty && !done) {
            if (!it.hasNext) {
              flush(null, 0L, haveFwd = false)
              done = true
            } else {
              val r = it.next()
              val k = r.get(0)
              if (k != curKey) {
                flush(null, 0L, haveFwd = false)
                curKey = k; lastPayload = null; lastTs = 0L
              }
              if (k == null || r.isNullAt(1)) {
                // NULL keys/timestamps never satisfy the distance
                // predicate (SQL comparison semantics): lefts emit a
                // null payload immediately, rights are dropped
                if (r.getInt(2) != 0) {
                  val leftVals = Array.tabulate(nLeft)(i => r.get(3 + i))
                  out += Row.fromSeq(leftVals.toIndexedSeq ++
                    Seq.fill[Any](nPayload)(null))
                }
              } else if (r.getInt(2) == 0) {
                val ts = toMicros(r.get(1))
                val payload = Array.tabulate(nPayload)(i => r.get(3 + nLeft + i))
                flush(payload, ts, haveFwd = true)
                lastPayload = payload
                lastTs = ts
              } else {
                val ts = toMicros(r.get(1))
                val backDist = if (lastPayload != null) ts - lastTs else -1L
                val vals = new Array[Any](nLeft + nPayload + 1)
                var i = 0
                while (i < nLeft) { vals(i) = r.get(3 + i); i += 1 }
                val bp = if (lastPayload != null) lastPayload
                  else Array.fill[Any](nPayload)(null)
                System.arraycopy(bp, 0, vals, nLeft, nPayload)
                vals(nLeft + nPayload) = ts
                pending += ((vals, backDist))
              }
            }
          }
        }
        override def hasNext: Boolean = { fill(); out.nonEmpty }
        override def next(): Row = { fill(); out.dequeue() }
      }
    }(rowEncoder)
    joined.toDF()
  }

  /** Common layout: key, ts, side(0=right,1=left), left..., payload...,
    * hash-partitioned by key and sorted within partitions so a linear
    * scan sees each key's timeline in order (rights before lefts at
    * equal ts, in both sweep directions).
    */
  private def normalize(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTsCol: String,
      rightTsCol: String,
      rightTiebreak: Seq[String],
      descendingTs: Boolean) = {
    val leftCols = left.columns.toSeq
    val payloadCols = right.columns.toSeq
      .filterNot(c => c == keyCol || c == rightTsCol)

    val lNorm = left.select(
      col(keyCol).as("__k") +: col(leftTsCol).as("__ts") +: lit(1).as("__side") +:
        (leftCols.map(col) ++
          payloadCols.map(c => lit(null).cast(
            right.schema(c).dataType).as(s"__p_$c"))): _*)
    val rNorm = right.select(
      col(keyCol).as("__k") +: col(rightTsCol).as("__ts") +: lit(0).as("__side") +:
        (leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
          payloadCols.map(c => col(c).as(s"__p_$c"))): _*)

    val tsOrder = if (descendingTs) col("__ts").desc else col("__ts").asc
    // carry semantics: the LAST right processed at equal (key, ts)
    // wins. Backward promises the last in tiebreak order, forward the
    // FIRST (mirroring the nearest scan, whose forward candidate is
    // the first right it meets) — so the descending sweep sorts the
    // tiebreak descending to make the first-in-order right land last.
    val tieCols = rightTiebreak.map { c =>
      if (descendingTs) col(s"__p_$c").desc else col(s"__p_$c").asc
    }
    val sorted = lNorm.unionByName(rNorm)
      .repartition(col("__k"))
      .sortWithinPartitions(
        (col("__k") +: tsOrder +: col("__side") +: tieCols): _*)

    val outSchema = StructType(
      left.schema.fields ++
        payloadCols.map(c => right.schema(c).copy(nullable = true)))
    (sorted, outSchema, leftCols.length, payloadCols.length)
  }

  /** Event-time as micros for distance arithmetic (nearest). */
  private def toMicros(v: Any): Long = v match {
    case t: java.sql.Timestamp =>
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    case i: java.time.Instant =>
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    case l: java.lang.Long => l.longValue()
    case i: java.lang.Integer => i.longValue()
    case d: java.sql.Date => d.getTime * 1000L
    case d: java.time.LocalDate => d.toEpochDay * 86400L * 1000000L
    case other => throw new IllegalArgumentException(
      s"asofJoinNearest: unsupported ts type ${other.getClass}")
  }
}
