package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

/** Distributed global ordered scans — rank, prefix sum, prefix max —
  * the two-level kernel that replaces a partition-less
  * `Window.orderBy` (which WindowExec executes as a SINGLE-task sort
  * over its whole input) with a plan that scales: range-repartition
  * on the sort key, one tiny per-partition summary collected to the
  * driver (rows = number of partitions, not data size), a driver
  * scan over those summaries, and a broadcast join of the
  * per-partition base values back onto the data so a per-partition
  * window — now keyed by partition id — finishes with purely local
  * sorts.
  *
  * Same recipe as [[graft.export.Packing.packSequences]] (pk1,
  * oracle-green); factored here because ordered scans over
  * row-scaling domains recur across the query surface (Lorenz/Gini
  * rank, ABC cumulative share, NTILE deciles over per-user
  * aggregates, ECDFs over distinct-value aggregates, 2-D skyline
  * prefix max) and every ad-hoc global window there is a latent
  * single-task sort at 100x the data.
  *
  * Correctness notes, inherited from pk1:
  *  - `repartitionByRange` boundaries come from a per-execution
  *    reservoir sample, so the (row -> partition) assignment is NOT
  *    stable across jobs; the eager `localCheckpoint` pins ONE
  *    assignment that both the summary job and the final query read.
  *    At cluster scale substitute a reliable checkpoint or a parquet
  *    stage — the contract is "materialize the assignment once".
  *  - The per-partition window keys on the CARRIED `__pid` column, so
  *    correctness does not depend on the window shuffle preserving
  *    the physical partitioning.
  *  - Ranks are exact (row_number semantics) only when `sortCols` is
  *    a total order (unique key tuples); callers must include a
  *    tiebreak column, exactly as a global `row_number()` would need
  *    for determinism anyway.
  */
object GlobalRank {

  /** One requested scan column.
    *
    * @param name      output column name
    * @param value     input expression (for `sum` it is cast to long,
    *                  so sums are exact and cross-engine stable; for
    *                  `max` the value keeps its type — any orderable)
    * @param op        "sum" | "max"
    * @param inclusive true  -> frame (unbounded preceding, current)
    *                  false -> frame (unbounded preceding, -1); an
    *                  exclusive sum is 0 on the first row, an
    *                  exclusive max is NULL on the first row (the
    *                  "strictly before me" semantics a skyline needs)
    */
  final case class Scan(name: String, value: Column,
                        op: String = "sum", inclusive: Boolean = true) {
    require(op == "sum" || op == "max", s"unsupported op: $op")
  }

  /** Appends the requested scan columns (and optionally a 1-based
    * global rank column) to `df`, all ordered by `sortCols`
    * ascending-as-written (descending sort expressions are fine).
    */
  def prefixScan(df: DataFrame, sortCols: Seq[Column], scans: Seq[Scan],
                 rankCol: Option[String] = None): DataFrame = {
    require(sortCols.nonEmpty, "sortCols must be non-empty")
    require(scans.nonEmpty || rankCol.nonEmpty, "nothing to compute")
    val spark = df.sparkSession

    val staged = scans.zipWithIndex.foldLeft(df) { case (acc, (sc, i)) =>
      acc.withColumn(s"__v$i",
        if (sc.op == "sum") sc.value.cast("long") else sc.value)
    }
    val tagged = staged
      .repartitionByRange(sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)

    // per-partition (count, per-scan total) -> driver exclusive scan
    val aggs = (count(lit(1)).as("__c") +:
      scans.zipWithIndex.map { case (sc, i) =>
        (if (sc.op == "sum") sum(col(s"__v$i"))
         else max(col(s"__v$i"))).as(s"__t$i")
      }).toList
    val totalsDf = tagged.groupBy(col("__pid")).agg(aggs.head, aggs.tail: _*)
    val tSchema = totalsDf.schema
    val rows = totalsDf.collect().sortBy(_.getInt(0))

    var accC = 0L
    val accV = Array.fill[Any](scans.size)(null)
    scans.zipWithIndex.foreach { case (sc, i) =>
      if (sc.op == "sum") accV(i) = 0L
    }
    val baseRows = rows.map { r =>
      val out = Row.fromSeq(r.getInt(0) +: accC +: accV.toList)
      accC += r.getLong(1)
      scans.zipWithIndex.foreach { case (sc, i) =>
        val v = r.get(2 + i)
        if (v != null) {
          if (sc.op == "sum")
            accV(i) = accV(i).asInstanceOf[Long] + v.asInstanceOf[Long]
          else if (accV(i) == null ||
              v.asInstanceOf[Comparable[Any]].compareTo(accV(i)) > 0)
            accV(i) = v
        }
      }
      out
    }
    val baseSchema = StructType(
      StructField("__pid", IntegerType, nullable = false) ::
        StructField("__bc", LongType, nullable = false) ::
        scans.indices.map(i =>
          StructField(s"__b$i", tSchema(s"__t$i").dataType,
            nullable = true)).toList)
    val baseDf = broadcast(spark.createDataFrame(
      java.util.Arrays.asList(baseRows: _*), baseSchema))

    val w = Window.partitionBy(col("__pid")).orderBy(sortCols: _*)
    val joined = tagged.join(baseDf, Seq("__pid"))
    val withScans = scans.zipWithIndex.foldLeft(joined) {
      case (acc, (sc, i)) =>
        val frame =
          if (sc.inclusive) w.rowsBetween(Window.unboundedPreceding, 0)
          else w.rowsBetween(Window.unboundedPreceding, -1)
        val local =
          if (sc.op == "sum") sum(col(s"__v$i")).over(frame)
          else max(col(s"__v$i")).over(frame)
        val combined =
          if (sc.op == "sum")
            coalesce(local, lit(0L)) + col(s"__b$i")
          else greatest(local, col(s"__b$i")) // greatest skips NULLs
        acc.withColumn(sc.name, combined)
    }
    val withRank = rankCol match {
      case Some(n) => withScans.withColumn(n,
        row_number().over(w).cast("long") + col("__bc"))
      case None => withScans
    }
    val drops = Seq("__pid", "__bc") ++
      scans.indices.flatMap(i => Seq(s"__v$i", s"__b$i"))
    withRank.drop(drops: _*)
  }

  /** Global 1-based row_number (`i`) + inclusive prefix sum of
    * `valueCol` (`csum`, exact long), ordered by `sortCols`.
    */
  def rankAndPrefixSum(df: DataFrame, sortCols: Seq[Column],
                       valueCol: Column): DataFrame =
    prefixScan(df, sortCols, Seq(Scan("csum", valueCol)), Some("i"))

  /** Exact SQL NTILE(k) bucket from a 1-based global rank `i` over
    * `n` rows: the first (n mod k) buckets get ceil(n/k) rows, the
    * rest floor(n/k) — bit-identical to `ntile(k).over(orderBy(...))`
    * for every n and k (including n < k, where bucket = rank), so a
    * DuckDB oracle using NTILE stays hash-green while the plan runs
    * the distributed rank kernel instead of a single-task sort.
    */
  def ntileFromRank(i: Column, n: Column, k: Int): Column = {
    val m = n % k                   // buckets that get one extra row
    val big = idiv(n, lit(k)) + 1
    val small = idiv(n, lit(k))
    // n < k  =>  small = 0, but then the first branch always fires
    // (m = n, big = 1, i <= n), so the divide-by-zero branch is never
    // evaluated (CaseWhen short-circuits per row)
    when(i <= m * big, idiv(i - 1, big) + 1)
      .otherwise(m + idiv(i - m * big - 1, small) + 1)
      .cast("int")
  }

  /** Exact long integer division as a Column: (a - a mod b) / b. The
    * numerator is exactly divisible, so the double division is exact
    * for quotients below 2^53 (Column `/` is double division; a bare
    * floor(a/b) can round UP across an integer boundary for adversarial
    * magnitudes — this form cannot).
    */
  private def idiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast("long")
}
