package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Preference / label-agreement operators for training-data curation:
  * Bradley–Terry skill ratings from pairwise duels (the batch-parallel
  * alternative to sequential Elo for RLHF preference data), Cohen's
  * kappa inter-annotator agreement, and annotator accuracy against the
  * majority vote (a Dawid–Skene-lite label-quality audit).
  *
  * Scale notes: every operator aggregates the raw pair/label stream
  * FIRST (one shuffle on slim keys), then iterates or scores on the
  * item-bounded aggregate — Bradley–Terry's MM rounds run on a table
  * bounded by |items|^2 pairs regardless of how many billions of raw
  * duels fed it, and the agreement scores are single partial-agg
  * passes. Nothing here is driver-side except Catalyst's plan.
  */
object Agreement {

  /** Bradley–Terry ratings via Hunter's MM iteration:
    * {{{ p_i <- W_i / sum_j n_ij / (p_i + p_j) }}}
    * from a duel stream with `winner` / `loser` columns. Raw duels
    * collapse to the directed win-count aggregate immediately; the
    * fixed `iters` MM rounds then join only the |items|^2-bounded
    * pair table against the current ratings. Per-round values are
    * requantized to DECIMAL(18,9) (double divide -> round 9 -> cast,
    * the mta1/hits1 iterative rule) so every intermediate digit is
    * engine-portable; the returned `rating` is normalized to sum 1.
    *
    * Items appear iff they played at least one decided duel. Output:
    * (item, wins, games, rating) with rating DECIMAL(18,9).
    */
  def bradleyTerry(duels: DataFrame, iters: Int = 3): DataFrame = {
    // the ONE full-data pass: collapse the duel stream to the
    // |items|^2-bounded directed-win table and cut lineage THERE —
    // every downstream branch (pairs, wins, items, each MM round)
    // re-derives from this tiny checkpointed table for pennies.
    // (Checkpointing pairs/items instead leaves `wins` on a separate
    // branch that re-runs the whole duel pipeline: measured 6x the
    // necessary cost at the 100x probe.)
    val wl = duels.groupBy(col("winner"), col("loser"))
      .agg(count(lit(1)).as("w"))
      .localCheckpoint(true)
    // symmetric opponent table: games n_ij between i and j, both ways
    val pairs = wl.select(col("winner").as("i"), col("loser").as("j"),
        col("w").as("n"))
      .unionAll(wl.select(col("loser").as("i"), col("winner").as("j"),
        col("w").as("n")))
      .groupBy(col("i"), col("j")).agg(sum(col("n")).as("n"))
    val wins = wl.groupBy(col("winner")).agg(sum(col("w")).as("wins"))
      .select(col("winner").as("i"), col("wins"))
    val items = pairs.groupBy(col("i")).agg(sum(col("n")).as("games"))
      .join(wins, Seq("i"), "left")
      .select(col("i"), col("games"), coalesce(col("wins"), lit(0L))
        .as("wins"))
    // the MM rounds stay LAZY: pairs/items above are the only eager
    // lineage cuts. Each round references p twice (both endpoints),
    // but the doubled subplans are identical, so Spark's exchange
    // reuse collapses them — checkpointing every round costs ~6 eager
    // jobs (~2s of fixed overhead measured at sf0.01) for no benefit
    // at a fixed, small iteration count.
    var p = items.select(col("i"), lit(1).cast("decimal(18,9)").as("p"))
    for (_ <- 1 to iters) {
      val denom = pairs
        .join(p.select(col("i").as("pi_i"), col("p").as("pi")),
          col("i") === col("pi_i"))
        .join(p.select(col("i").as("pj_i"), col("p").as("pj")),
          col("j") === col("pj_i"))
        .select(col("i"),
          round(col("n").cast("double") /
            (col("pi") + col("pj")).cast("double"), 9)
            .cast("decimal(18,9)").as("term"))
        .groupBy(col("i")).agg(sum(col("term")).as("denom"))
      p = items.join(denom, Seq("i"))
        .select(col("i"),
          round(col("wins").cast("double") /
            col("denom").cast("double"), 9)
            .cast("decimal(18,9)").as("p"))
    }
    val tot = p.agg(sum(col("p")).as("tot"))
    items.join(p, Seq("i")).crossJoin(broadcast(tot))
      .select(col("i").as("item"), col("wins"), col("games"),
        round(col("p").cast("double") / col("tot").cast("double"), 9)
          .cast("decimal(18,9)").as("rating"))
  }

  /** Cohen's kappa per group: chance-corrected agreement between two
    * boolean rater columns. One conditional-aggregate pass — po is
    * raw agreement, pe the marginal-product chance rate. `kappa` is
    * NULL when pe = 1 (both raters constant — agreement is vacuous).
    */
  def cohenKappa(df: DataFrame, raterA: Column, raterB: Column,
      groups: Seq[Column]): DataFrame = {
    val base = df.select(groups :+ raterA.cast("int").as("la")
      :+ raterB.cast("int").as("lb"): _*)
    base.groupBy(groups: _*)
      .agg(count(lit(1)).as("n"),
        avg(when(col("la") === col("lb"), 1.0).otherwise(0.0)).as("po"),
        avg(col("la").cast("double")).as("pa"),
        avg(col("lb").cast("double")).as("pb"))
      .withColumn("pe", col("pa") * col("pb") +
        (lit(1.0) - col("pa")) * (lit(1.0) - col("pb")))
      .select(groups :+ col("n") :+ round(col("po"), 6).as("po6")
        :+ round(col("pe"), 6).as("pe6")
        :+ round((col("po") - col("pe")) /
            nullif(lit(1.0) - col("pe"), lit(0.0)), 6).as("kappa6"): _*)
  }

  /** Annotator quality vs the majority vote — Dawid–Skene's E-step
    * with the consensus as the latent truth: per annotator, accuracy
    * and the confusion-matrix counts against the per-item majority
    * label. `labels` must carry (item, annotator, label:boolean) with
    * an ODD annotator count per item (strict majority exists).
    * Two slim shuffles: the per-item vote aggregate, then the
    * per-annotator score aggregate after a broadcast-size-agnostic
    * equi-join back on item.
    */
  def annotatorAccuracy(labels: DataFrame): DataFrame = {
    val maj = labels.groupBy(col("item"))
      .agg((sum(col("label").cast("int")) * 2 > count(lit(1)))
        .as("maj"))
    labels.join(maj, Seq("item"))
      .groupBy(col("annotator"))
      .agg(count(lit(1)).as("n"),
        round(avg(when(col("label") === col("maj"), 1.0)
          .otherwise(0.0)), 6).as("acc6"),
        sum(when(col("label") && col("maj"), 1).otherwise(0)).as("tp"),
        sum(when(col("label") && !col("maj"), 1).otherwise(0)).as("fp"),
        sum(when(!col("label") && col("maj"), 1).otherwise(0)).as("fn"),
        sum(when(!col("label") && !col("maj"), 1).otherwise(0)).as("tn"))
  }
}
