package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Annotation and preference-label analytics for SFT/RLHF data QA:
  * consensus labels with agreement rates, per-annotator reliability,
  * chance-corrected inter-rater agreement (Cohen's kappa per annotator
  * pair, Fleiss' kappa overall), and Bradley-Terry skill ratings over
  * pairwise preference outcomes.
  *
  * Scale shapes: every operator reduces the corpus-sized annotation
  * table in ONE keyed aggregation whose key space is schema-sized, not
  * corpus-sized — (item,label) then item for consensus, the annotator
  * pair contingency table for kappa (|annotators|^2 * |labels|^2 rows),
  * the player-pair win matrix for Bradley-Terry (|players|^2 rows).
  * The iterative Bradley-Terry solve runs on the driver over that tiny
  * matrix (same discipline as k-means centroids / BPE vocab): the data
  * pass is a single map-side-combinable groupBy, corpus-independent
  * iteration cost. Cohen's kappa self-joins annotations on the item id
  * — annotations-per-item is bounded by the annotator pool, so the
  * join fans out |pool|^2 per item, not corpus^2.
  */
object Labels {

  /** One deterministic annotation per (item, annotator): where the
    * same annotator labeled one item more than once (re-annotation),
    * keep the SMALLEST label — a groupBy min, not dropDuplicates, so
    * conflicting re-annotations resolve the same way on every run and
    * every partitioning. All agreement stats below share this base. */
  private def dedupAnnotations(df: DataFrame, itemCol: String,
                               annotatorCol: String,
                               labelCol: String): DataFrame =
    df.groupBy(col(itemCol), col(annotatorCol))
      .agg(min(col(labelCol)).as(labelCol))

  /** Per-item consensus: majority label (ties broken toward the
    * smallest label — deterministic), annotator count, majority count,
    * and agreement = n_majority / n_annotators. One (item,label)
    * aggregation then one item aggregation; both map-side combinable.
    */
  def majorityVote(df: DataFrame, itemCol: String, annotatorCol: String,
                   labelCol: String): DataFrame = {
    val counts = dedupAnnotations(df, itemCol, annotatorCol, labelCol)
      .groupBy(col(itemCol), col(labelCol).as("__label"))
      .agg(count(lit(1)).as("__n"))
    // min_by over (-count, label): max count wins, ties break toward
    // the smallest label for ANY orderable label type (negating the
    // count, not the label — strings can't be negated).
    counts.groupBy(col(itemCol)).agg(
      min_by(col("__label"),
             struct((-col("__n")).as("__negn"), col("__label")))
        .as("consensus"),
      sum(col("__n")).cast("long").as("n_annotators"),
      max(col("__n")).cast("long").as("n_majority"),
      round(max(col("__n")).cast("double") / sum(col("__n")), 4)
        .as("agreement"))
  }

  /** Per-annotator reliability vs the majority-vote consensus:
    * items labeled, matches, accuracy. The consensus frame is
    * item-keyed (small relative to annotations); the join is a plain
    * equi-join on the item id that Spark can shuffle-or-broadcast as
    * sizes dictate. */
  def annotatorAccuracy(df: DataFrame, itemCol: String,
                        annotatorCol: String, labelCol: String): DataFrame = {
    val consensus = majorityVote(df, itemCol, annotatorCol, labelCol)
      .select(col(itemCol), col("consensus"))
    dedupAnnotations(df, itemCol, annotatorCol, labelCol)
      .join(consensus, itemCol)
      .groupBy(col(annotatorCol))
      .agg(
        count(lit(1)).cast("long").as("n_items"),
        sum(when(col(labelCol) === col("consensus"), 1L).otherwise(0L))
          .as("n_match"),
        round(sum(when(col(labelCol) === col("consensus"), 1.0)
                    .otherwise(0.0)) / count(lit(1)), 4).as("accuracy"))
  }

  /** Per-annotator confusion matrix vs the majority-vote consensus:
    * one row per (annotator, consensus, given) cell with its count —
    * WHERE each annotator's errors go, not just how many (accuracy).
    * Same join as [[annotatorAccuracy]]; the extra key is
    * labels-squared, still schema-sized. */
  def confusionMatrix(df: DataFrame, itemCol: String,
                      annotatorCol: String, labelCol: String): DataFrame = {
    val consensus = majorityVote(df, itemCol, annotatorCol, labelCol)
      .select(col(itemCol), col("consensus"))
    dedupAnnotations(df, itemCol, annotatorCol, labelCol)
      .join(consensus, itemCol)
      .groupBy(col(annotatorCol), col("consensus"),
        col(labelCol).as("given"))
      .agg(count(lit(1)).cast("long").as("n"))
  }

  /** Cohen's kappa for every annotator pair (a < b) over the items
    * both labeled: kappa = (po - pe) / (1 - pe) with po the observed
    * agreement and pe the chance agreement from the two annotators'
    * marginal label distributions. Returns one row per pair with
    * n_items, po, pe, kappa (rounded, signed-zero folded).
    *
    * Shape: self-join on the item id (fan-out = annotator-pool^2 per
    * item), reduced immediately to the (a, b, label_a, label_b)
    * contingency table — everything after that is arithmetic on a
    * frame of |pairs| * |labels|^2 rows. */
  def cohenKappa(df: DataFrame, itemCol: String, annotatorCol: String,
                 labelCol: String): DataFrame = {
    val base = dedupAnnotations(df, itemCol, annotatorCol, labelCol)
    val a = base.select(col(itemCol).as("__item"),
                        col(annotatorCol).as("annot_a"),
                        col(labelCol).as("__la"))
    val b = base.select(col(itemCol).as("__item"),
                        col(annotatorCol).as("annot_b"),
                        col(labelCol).as("__lb"))
    val cont = a.join(b, "__item")
      .where(col("annot_a") < col("annot_b"))
      .groupBy(col("annot_a"), col("annot_b"), col("__la"), col("__lb"))
      .agg(count(lit(1)).cast("double").as("__n"))
    val tot = cont.groupBy(col("annot_a"), col("annot_b")).agg(
      sum(col("__n")).as("__N"),
      sum(when(col("__la") === col("__lb"), col("__n")).otherwise(0.0))
        .as("__diag"))
    val rowm = cont.groupBy(col("annot_a"), col("annot_b"),
                            col("__la").as("__k"))
      .agg(sum(col("__n")).as("__rk"))
    val colm = cont.groupBy(col("annot_a"), col("annot_b"),
                            col("__lb").as("__k"))
      .agg(sum(col("__n")).as("__ck"))
    // pe sums p_a(k)*p_b(k) over labels BOTH annotators used (terms
    // where either marginal is 0 vanish); a pair with fully disjoint
    // label usage has no shared k at all — left join + coalesce keeps
    // the pair with pe = 0 instead of silently dropping it.
    val pe = rowm.join(colm, Seq("annot_a", "annot_b", "__k"))
      .groupBy(col("annot_a"), col("annot_b"))
      .agg(sum(col("__rk") * col("__ck")).as("__rc0"))
    tot.join(pe, Seq("annot_a", "annot_b"), "left")
      .withColumn("__rc", coalesce(col("__rc0"), lit(0.0)))
      .select(col("annot_a"), col("annot_b"),
        col("__N").cast("long").as("n_items"),
        (round(col("__diag") / col("__N"), 6) + lit(0.0)).as("po"),
        (round(col("__rc") / (col("__N") * col("__N")), 6) + lit(0.0))
          .as("pe"),
        (round((col("__diag") / col("__N") -
                col("__rc") / (col("__N") * col("__N"))) /
               (lit(1.0) - col("__rc") / (col("__N") * col("__N"))), 6)
          + lit(0.0)).as("kappa"))
  }

  /** Fleiss' kappa: chance-corrected agreement for >2 annotators.
    * Requires a fixed number of annotations per item (the classical
    * formula's assumption); items with fewer than 2 annotations are
    * excluded. Returns a single row: n_items, n_categories, p_bar
    * (mean per-item agreement), p_e (chance agreement from pooled
    * label shares), kappa. Two tiny keyed aggregations — (item,label)
    * then item — followed by a global reduce. */
  def fleissKappa(df: DataFrame, itemCol: String, annotatorCol: String,
                  labelCol: String): DataFrame = {
    val counts = dedupAnnotations(df, itemCol, annotatorCol, labelCol)
      .groupBy(col(itemCol), col(labelCol).as("__label"))
      .agg(count(lit(1)).cast("double").as("__nik"))
    val perItem = counts.groupBy(col(itemCol)).agg(
      sum(col("__nik")).as("__n"),
      sum(col("__nik") * col("__nik")).as("__sq"))
      .where(col("__n") >= 2)
      .select(col(itemCol), col("__n"),
        ((col("__sq") - col("__n")) / (col("__n") * (col("__n") - 1)))
          .as("__pi"))
    val pBarRow = perItem.agg(
      count(lit(1)).cast("long").as("n_items"),
      avg(col("__pi")).as("__pbar"),
      sum(col("__n")).as("__total"))
    // pooled label shares over the SAME filtered item set
    val kept = counts.join(perItem.select(col(itemCol)), itemCol)
    val labelShares = kept.groupBy(col("__label"))
      .agg(sum(col("__nik")).as("__nk"))
    val peRow = labelShares
      .crossJoin(broadcast(pBarRow.select(col("__total"))))
      .agg(count(lit(1)).cast("long").as("n_categories"),
           sum((col("__nk") / col("__total")) *
               (col("__nk") / col("__total"))).as("__pe"))
    pBarRow.crossJoin(broadcast(peRow)).select(
      col("n_items"), col("n_categories"),
      (round(col("__pbar"), 6) + lit(0.0)).as("p_bar"),
      (round(col("__pe"), 6) + lit(0.0)).as("p_e"),
      (round((col("__pbar") - col("__pe")) / (lit(1.0) - col("__pe")), 6)
        + lit(0.0)).as("kappa"))
  }

  /** Krippendorff's alpha (nominal data): chance-corrected agreement
    * that — unlike Fleiss — handles a VARYING number of annotations
    * per item (the real shape of crowdsourced labels). Items with
    * fewer than 2 annotations are excluded. Using n_uc = annotations
    * of value c on item u, m_u = their item total, n = grand total,
    * n_c = per-value total:
    *   D_o = (1/n) * sum_u (m_u^2 - sum_c n_uc^2) / (m_u - 1)
    *   D_e = (1/(n(n-1))) * sum_c n_c (n - n_c)
    *   alpha = 1 - D_o / D_e
    * Returns one row: n_items, n_annotations, d_o, d_e, alpha (null
    * when D_e = 0 — every annotation the same value, agreement
    * undefined). Same two tiny keyed aggregations as Fleiss. */
  def krippendorffAlpha(df: DataFrame, itemCol: String,
                        annotatorCol: String, labelCol: String): DataFrame = {
    val counts = dedupAnnotations(df, itemCol, annotatorCol, labelCol)
      .groupBy(col(itemCol), col(labelCol).as("__label"))
      .agg(count(lit(1)).cast("double").as("__nuc"))
    val perItem = counts.groupBy(col(itemCol))
      .agg(sum(col("__nuc")).as("__mu"),
           sum(col("__nuc") * col("__nuc")).as("__sq"))
      .where(col("__mu") >= 2)
    val obs = perItem.agg(
      count(lit(1)).cast("long").as("n_items"),
      sum(col("__mu")).as("__n"),
      sum((col("__mu") * col("__mu") - col("__sq")) / (col("__mu") - 1))
        .as("__dosum"))
    val kept = counts.join(perItem.select(col(itemCol)), itemCol)
    val exp = kept.groupBy(col("__label"))
      .agg(sum(col("__nuc")).as("__nc"))
      .crossJoin(broadcast(obs.select(col("__n").as("__nn"))))
      .agg(sum(col("__nc") * (col("__nn") - col("__nc"))).as("__desum"))
    val dO = col("__dosum") / col("__n")
    val dE = col("__desum") / (col("__n") * (col("__n") - 1))
    obs.crossJoin(broadcast(exp)).select(
      col("n_items"),
      col("__n").cast("long").as("n_annotations"),
      (round(dO, 6) + lit(0.0)).as("d_o"),
      (round(dE, 6) + lit(0.0)).as("d_e"),
      (round(when(dE =!= 0.0, lit(1.0) - dO / dE), 6) + lit(0.0))
        .as("alpha"))
  }

  /** Bradley-Terry skill ratings from pairwise preference outcomes
    * (winner, loser) via the classical MM / Zermelo iteration:
    *   p_i <- W_i / sum_j( g_ij / (p_i + p_j) )
    * normalized to sum to 1 after every iteration, run for a FIXED
    * `iters` so the result is deterministic and oracle-reproducible.
    *
    * The corpus-sized pass is ONE aggregation to the player-pair win
    * matrix (key space |players|^2 — players are a low-cardinality
    * domain: model names, sources, policies). The matrix is collected
    * and iterated on the driver (same discipline as k-means centroids
    * and the BPE vocab: driver state is key-domain-sized, never
    * corpus-sized). Self-games (winner == loser) are excluded.
    *
    * Returns one row per player: n_wins, n_games, rating (the
    * normalized BT strength, rounded to 6), rank (1 = strongest,
    * rating ties broken by player name). */
  def bradleyTerry(pairs: DataFrame, winnerCol: String, loserCol: String,
                   iters: Int = 8): DataFrame =
    bradleyTerryCounts(pairs.select(col(winnerCol), col(loserCol),
      lit(1L).as("__one")), winnerCol, loserCol, "__one", iters)

  /** [[bradleyTerry]] over a PRE-AGGREGATED win table (winner, loser,
    * count) — the form streaming partials and sharded pipelines hand
    * in. Identical solve, identical output. */
  def bradleyTerryCounts(counts: DataFrame, winnerCol: String,
                         loserCol: String, nCol: String,
                         iters: Int = 8): DataFrame = {
    val spark = counts.sparkSession
    import spark.implicits._
    val wins = counts
      .where(col(winnerCol) =!= col(loserCol))
      .groupBy(col(winnerCol).cast("string").as("__w"),
               col(loserCol).cast("string").as("__l"))
      .agg(sum(col(nCol)).cast("double").as("__n"))
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDouble(2)))
      .toMap
    val players = wins.keys.flatMap { case (w, l) => Seq(w, l) }
      .toSeq.distinct.sorted
    val winTotals: Map[String, Double] =
      players.map(p => p -> wins.collect {
        case ((w, _), n) if w == p => n
      }.sum).toMap
    val games: Map[(String, String), Double] =
      (for {
        i <- players; j <- players if i != j
        g = wins.getOrElse((i, j), 0.0) + wins.getOrElse((j, i), 0.0)
        if g > 0
      } yield (i, j) -> g).toMap
    var p: Map[String, Double] = players.map(_ -> 1.0 / players.size).toMap
    for (_ <- 1 to iters) {
      val next = players.map { i =>
        val denom = players.filter(_ != i).map { j =>
          games.get((i, j)).fold(0.0)(g => g / (p(i) + p(j)))
        }.sum
        i -> (if (denom == 0.0) p(i) else winTotals(i) / denom)
      }.toMap
      val total = next.values.sum
      p = next.map { case (k, v) => k -> v / total }
    }
    // HALF_UP to 6 decimals = Spark round = DuckDB round for positive
    // values; rank over the ROUNDED rating so both engines agree even
    // on sub-epsilon near-ties. +0.0 folds signed zero.
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble + 0.0
    players.map { pl =>
      (pl, winTotals(pl).toLong,
       players.filter(_ != pl)
         .map(j => games.getOrElse((pl, j), 0.0)).sum.toLong, r6(p(pl)))
    }.sortBy { case (pl, _, _, r) => (-r, pl) }
      .zipWithIndex
      .map { case ((pl, w, g, r), idx) => (pl, w, g, r, (idx + 1).toLong) }
      .toDF("player", "n_wins", "n_games", "rating", "rank")
  }
}
