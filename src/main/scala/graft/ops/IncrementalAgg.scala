package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregation maintenance — the rollup-table counterpart
  * of [[Ops.upsert]]/[[Ops.scd2Merge]]. The reference reloads whole
  * datasets when a source changes (`load_dataset.py:352-370`); at
  * 100 TB the viable shape is: keep a small per-key STATE table of
  * mergeable partial aggregates, and fold each new delta batch in with
  * one pass over the DELTA only. History is never rescanned.
  *
  * State columns must be mergeable partials: sums, counts, min/max —
  * or sketch blobs (HLL via `hll_merge_agg`-style unions, KLL, bloom
  * [[graft.functions.BloomFilterAgg]] all merge losslessly), so a
  * running "distinct users per segment" costs one sketch-merge pass
  * per day instead of a daily rescan of all history. Derived values
  * (avg = sum/n, estimates) are computed AT READ, never stored —
  * storing them would make the state non-mergeable.
  *
  * Plan shape per fold: delta groupBy (map-side combined, shuffle of
  * <= |keys| rows per task) + a union with the state and a second
  * groupBy over |state| + |delta keys| rows — independent of history
  * size. The state table itself publishes atomically via
  * [[graft.catalog.Warehouse.publishAtomically]] like any other table.
  */
object IncrementalAgg {

  /** One maintenance step: `state' = merge(state ∪ partial(delta))`.
    *
    * @param state      per-key partial-aggregate table (may be empty,
    *                   same schema as `partial(delta)`'s output)
    * @param delta      new raw rows
    * @param keys       grouping keys
    * @param partialAgg aggregate expressions turning raw delta rows
    *                   into per-key partial state
    * @param mergeAgg   aggregate expressions merging two partial
    *                   states (input column names = state column
    *                   names; output must keep the same names)
    */
  def fold(
      state: DataFrame,
      delta: DataFrame,
      keys: Seq[String],
      partialAgg: Seq[Column],
      mergeAgg: Seq[Column]): DataFrame = {
    require(partialAgg.nonEmpty && mergeAgg.nonEmpty,
      "incremental fold needs at least one aggregate")
    val d = delta.groupBy(keys.map(col): _*)
      .agg(partialAgg.head, partialAgg.tail: _*)
    state.unionByName(d)
      .groupBy(keys.map(col): _*)
      .agg(mergeAgg.head, mergeAgg.tail: _*)
  }

  /** Empty state with the schema `fold` expects: `partial(delta)` on
    * zero rows.
    */
  def emptyState(
      delta: DataFrame,
      keys: Seq[String],
      partialAgg: Seq[Column]): DataFrame =
    delta.limit(0).groupBy(keys.map(col): _*)
      .agg(partialAgg.head, partialAgg.tail: _*)
}
