package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BoundReference, Descending, GenericInternalRow,
  JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** As-of join as a first-class Catalyst operator: logical node +
  * planner strategy + physical plan (the preference-(c) tier of the
  * build rules — a whole-operator semantics Spark's built-ins cannot
  * express without blow-up; see `graft.ops.AsOfJoin` for why the
  * compositional encodings are wrong).
  *
  * Why a physical operator when the `mapPartitions` merge scan
  * (`AsOfJoin.asofScan`) is already correct: the scan pays its
  * repartition + sort UNCONDITIONALLY and hides the operator from the
  * planner behind an opaque RDD boundary. Declaring the requirement
  * instead ([[AsOfJoinExec.requiredChildDistribution]] /
  * [[AsOfJoinExec.requiredChildOrdering]]) lets `EnsureRequirements`
  * plant the exchange and sort ONLY where the child's existing layout
  * doesn't already satisfy them — a bucketed 100 TB quote table
  * (bucketBy + sortBy the key) as-of joins with ZERO shuffle and zero
  * sort on that side, and a frame the user already repartitioned by
  * the key is reused as-is (AsOfExecSpec proves both on the physical
  * plan). The children stay inside whole-stage codegen up to the
  * operator boundary, rows stay Unsafe end-to-end (the Row-codec
  * `mapPartitions` scan deserializes every field), and AQE can still
  * re-plan the exchanges it did insert.
  *
  * Semantics (identical to `AsOfJoin.asofJoinBackward`/`Forward`,
  * property-checked against them in AsOfExecSpec):
  *  - backward: LATEST right with rightTs <= leftTs, per key
  *  - forward:  EARLIEST right with rightTs >= leftTs, per key
  *  - left outer; NULL keys and NULL timestamps never match
  *  - right rows tie-break last-in-(ts, tiebreaks) for backward,
  *    first for forward
  *
  * Algorithm: both children hash-clustered on the key and sorted by
  * (key, ts `dir`) where `dir` flips for forward — then ONE linear
  * merge per partition carrying the last-seen valid right payload,
  * exactly a sort-merge join's cost with an O(1)-state scan instead
  * of buffered key groups. `nearest` stays on the scan/chunked
  * implementations (it must buffer lefts between two consecutive
  * rights, a different state shape), as do the skew-chunked variants
  * (they re-key the exchange itself).
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTs: Attribute,
    rightTs: Attribute,
    forward: Boolean,
    rightTiebreaks: Seq[Attribute]) extends BinaryNode {

  /** Left columns, then the right payload (right minus key/ts),
    * nullable — the scan implementations' exact output shape.
    */
  override def output: Seq[Attribute] =
    left.output ++ right.output
      .filterNot(a => a.exprId == rightKey.exprId || a.exprId == rightTs.exprId)
      .map(_.withNullability(true))

  override def maxRows: Option[Long] = left.maxRows

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinNode]] as [[AsOfJoinExec]]. Injected at
  * builder time by `GraftExtensions` (injectPlannerStrategy) and at
  * runtime through `experimentalMethods.extraStrategies` — both paths
  * are idempotent by object identity.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsOfJoinNode =>
      AsOfJoinExec(n.leftKey, n.rightKey, n.leftTs, n.rightTs, n.forward,
        n.rightTiebreaks, planLater(n.left), planLater(n.right)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKey: Attribute,
    rightKey: Attribute,
    leftTs: Attribute,
    rightTs: Attribute,
    forward: Boolean,
    rightTiebreaks: Seq[Attribute],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  private def payloadOut: Seq[Attribute] =
    right.output
      .filterNot(a => a.exprId == rightKey.exprId || a.exprId == rightTs.exprId)
      .map(_.withNullability(true))

  override def output: Seq[Attribute] = left.output ++ payloadOut

  /** The declarative heart: ask for co-clustering, let the planner
    * decide whether a shuffle is needed. `ClusteredDistribution` on
    * both children makes EnsureRequirements verify compatibility
    * (same keys, same partition count) and reuse any satisfying
    * layout — bucketed scans and prior repartitions join shuffle-free.
    */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  /** Forward sweeps time DESCENDING (so "last seen right" is the
    * earliest at-or-after), with the matching default null ordering
    * (Descending => NullsLast) mirrored by the merge comparator.
    */
  private def tsDir = if (forward) Descending else Ascending

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, tsDir)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, tsDir)) ++
      rightTiebreaks.map(SortOrder(_, tsDir)))

  // left outer: every left row passes through exactly once, in place
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override lazy val metrics = Map(
    "numOutputRows" ->
      SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val lOut = left.output
    val rOut = right.output
    val pOut = payloadOut
    val outAttrs = output
    val lKey = leftKey; val rKey = rightKey
    val lTs = leftTs; val rTs = rightTs
    val dir = tsDir

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // (key, ts) pair projections — two instances, two buffers, so a
      // left pair and a right pair are simultaneously valid
      val lPairProj = UnsafeProjection.create(Seq(lKey, lTs), lOut)
      val rPairProj = UnsafeProjection.create(Seq(rKey, rTs), rOut)
      val payloadProj = UnsafeProjection.create(pOut, rOut)
      val resultProj = UnsafeProjection.create(outAttrs, lOut ++ pOut)
      // comparators generated from the SAME SortOrder specs as
      // requiredChildOrdering (incl. null ordering), over pair rows
      val pairOrd = RowOrdering.create(Seq(
        SortOrder(BoundReference(0, lKey.dataType, nullable = true), Ascending),
        SortOrder(BoundReference(1, lTs.dataType, nullable = true), dir)), Nil)
      val keyOrd = RowOrdering.create(Seq(
        SortOrder(BoundReference(0, lKey.dataType, nullable = true), Ascending)),
        Nil)

      val nullPayload = new GenericInternalRow(pOut.length)
      val joined = new JoinedRow
      var rHead: InternalRow = if (rIter.hasNext) rIter.next() else null
      // last-seen VALID right (non-null key and ts): its (key, ts)
      // pair and its payload, copied out of the reused row buffers
      var carryPair: UnsafeRow = null
      var carryPayload: UnsafeRow = null

      lIter.map { l =>
        val lPair = lPairProj(l)
        var rPair: UnsafeRow = if (rHead != null) rPairProj(rHead) else null
        // consume rights up to and including the left's (key, ts) in
        // the sweep order; ties consume the right first, so a right
        // taking effect at t matches a left at the same t
        while (rHead != null && pairOrd.compare(rPair, lPair) <= 0) {
          if (!rPair.isNullAt(0) && !rPair.isNullAt(1)) {
            carryPair = rPair.copy()
            carryPayload = payloadProj(rHead).copy()
          }
          rHead = if (rIter.hasNext) rIter.next() else null
          rPair = if (rHead != null) rPairProj(rHead) else null
        }
        val matched = carryPair != null &&
          !lPair.isNullAt(0) && !lPair.isNullAt(1) &&
          keyOrd.compare(carryPair, lPair) == 0
        numOutputRows += 1
        resultProj(joined(l, if (matched) carryPayload else nullPayload))
      }
    }
  }
}
