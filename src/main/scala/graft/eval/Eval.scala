package graft.eval

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Evaluation gates (BASELINE.md): pairwise P/R/F1 against labeled pairs at
  * shared blocking keys + exact cluster-membership equality vs gold.
  * Reference analogue: accuracy vs IdMap (AMPI.scala:408-413).
  */
object Eval {

  final case class PairwiseMetrics(tp: Long, fp: Long, fn: Long, precision: Double, recall: Double, f1: Double)

  /** labeled_pairs(doc_id_a, doc_id_b, is_match) vs predicted same-cluster
    * from assignments(doc_id, cluster_id).
    */
  def pairwiseF1(assignments: DataFrame, labeledPairs: DataFrame): PairwiseMetrics = {
    val ca = assignments.select(col("doc_id").as("doc_id_a"), col("cluster_id").as("ca"))
    val cb = assignments.select(col("doc_id").as("doc_id_b"), col("cluster_id").as("cb"))
    val joined = labeledPairs
      .join(ca, Seq("doc_id_a"), "left")
      .join(cb, Seq("doc_id_b"), "left")
      .withColumn("pred", col("ca").isNotNull && col("ca") === col("cb"))
    // coalesce: sum() over zero labeled pairs is NULL, not 0
    val agg = joined.agg(
      coalesce(sum(when(col("pred") && col("is_match"), 1L).otherwise(0L)), lit(0L)).as("tp"),
      coalesce(sum(when(col("pred") && !col("is_match"), 1L).otherwise(0L)), lit(0L)).as("fp"),
      coalesce(sum(when(!col("pred") && col("is_match"), 1L).otherwise(0L)), lit(0L)).as("fn")
    ).collect()(0)
    val tp = agg.getLong(0); val fp = agg.getLong(1); val fn = agg.getLong(2)
    val p = if (tp + fp == 0) 1.0 else tp.toDouble / (tp + fp)
    val r = if (tp + fn == 0) 1.0 else tp.toDouble / (tp + fn)
    val f1 = if (p + r == 0) 0.0 else 2 * p * r / (p + r)
    PairwiseMetrics(tp, fp, fn, p, r, f1)
  }

  /** Blocking-recall tail: of ALL gold same-entity pairs, how many share at
    * least one blocking key (= appear in the candidate/labeled universe) vs
    * none. `missed` is the one number that separates a scorer miss from a
    * blocking miss when entities split at scale — a split entity with
    * missed = 0 lost its pairs at the score threshold, not in blocking.
    * The total comes from entity sizes (Σ n·(n−1)/2 — no pair join), the
    * covered count from the labeled candidate universe; both one
    * aggregate. Reference analogue: the recall side of the blocking slack
    * study, AMPI.scala:212-220.
    *
    * INTERPRETATION requires the entity-size distribution: for entities
    * LARGER than the block-size cap, candidate coverage is intentionally
    * sub-quadratic (refinement + chain recovery emit O(s·cap) pairs that
    * guarantee CONNECTIVITY, never all C(s,2)), so on hot-entity corpora
    * `missed` counts uncandidated-by-design pairs, not lost entities —
    * there the cluster-equality gate is the recall truth. On a uniform
    * corpus with per-entity sizes ≤ cap (e.g. the bench/headroom corpora,
    * 3 docs/entity), every gold pair should be a candidate and `missed`
    * reads directly as blocking misses.
    * Returns (goldPairsTotal, goldPairsBlocked, goldPairsMissed).
    */
  def blockingTail(labeled: DataFrame, gold: DataFrame): (Long, Long, Long) = {
    val total = gold.groupBy("entity_id").agg(count(lit(1)).as("n"))
      .agg(coalesce(sum(expr("n * (n - 1) / 2")), lit(0L)).cast("long"))
      .collect()(0).getLong(0)
    val covered = labeled.where(col("is_match")).count()
    (total, covered, total - covered)
  }

  /** Rank@k (reference AMPI_rank_result.scala:23-41: a match counts as a
    * hit when the ground-truth counterpart appears in the doc's top-k
    * scored candidates): per doc, candidates rank by score desc with a
    * deterministic tiebreak on xxhash64(counterpart) asc (the aggregator's
    * id channel — NOT lexicographic counterpart order) via the bounded
    * TopKAggregator — no per-doc window — and a doc with at least one gold
    * counterpart scores a hit iff any gold counterpart lands in its top-k.
    * Returns (hits, evaluated docs, hit-rate).
    */
  def rankAtK(scoredPairs: DataFrame, gold: DataFrame, k: Int): (Long, Long, Double) =
    rankAtKSym(symmetricPairs(scoredPairs), gold, k)

  /** The symmetric candidate view of a scored-pair set: every pair
    * contributes a candidate-list entry to BOTH ends. Carries `extra`
    * pass-through columns (e.g. the channel scores, so a sweep can persist
    * ONE symmetric view and re-blend per γ instead of re-shuffling the
    * full pair set per grid point).
    */
  def symmetricPairs(scoredPairs: DataFrame, extra: Seq[String] = Seq("score")): DataFrame = {
    val cols = (s: String, o: String) =>
      Seq(col(s).as("doc_id"), col(o).as("other")) ++ extra.map(col)
    scoredPairs.select(cols("doc_id_a", "doc_id_b"): _*)
      .unionByName(scoredPairs.select(cols("doc_id_b", "doc_id_a"): _*))
  }

  /** rankAtK over a pre-built (possibly persisted) symmetric view
    * (doc_id, other, score) — see symmetricPairs.
    */
  def rankAtKSym(sym: DataFrame, gold: DataFrame, k: Int): (Long, Long, Double) = {
    val spark = sym.sparkSession
    val topk = graft.functions.TopKAggregator.topK(k)
    val lists = sym
      .select(col("doc_id"), xxhash64(col("other")).as("oid"), col("score"))
      .groupBy("doc_id").agg(topk(col("oid"), col("score")).as("top_ids"))
    val ge = gold.select(col("doc_id"), col("entity_id"))
    // hashed id -> counterpart entity comes from GOLD (small, unique
    // doc_ids), never from the full symmetric pair set — the round-2 shape
    // dropDuplicates'd every pair row twice. Hash collisions are ~2^-64 and
    // affect rank order only. Non-gold counterparts drop at the inner join,
    // exactly as before.
    val goldHash = ge.select(xxhash64(col("doc_id")).as("oid"), col("entity_id").as("other_entity"))
    val withEnt = lists
      .join(ge, "doc_id")
      .select(col("doc_id"), col("entity_id"), explode(col("top_ids")).as("oid"))
      .join(goldHash, "oid")
      .groupBy("doc_id")
      .agg(max(when(col("entity_id") === col("other_entity"), 1L).otherwise(0L)).as("hit"))
    // evaluate only docs that HAVE a gold counterpart (entity size > 1)
    val multi = ge.groupBy("entity_id").agg(count(lit(1)).as("n"), collect_list(col("doc_id")).as("ds"))
      .where(col("n") > 1)
      .select(explode(col("ds")).as("doc_id"))
    val evald = multi.join(withEnt, Seq("doc_id"), "left")
      .agg(count(lit(1)).as("n"), coalesce(sum(col("hit")), lit(0L)).as("hits"))
      .collect()(0)
    val n = evald.getLong(0); val hits = evald.getLong(1)
    (hits, n, if (n == 0) 1.0 else hits.toDouble / n)
  }

  /** One grid point of the blend-parameter sweep. */
  final case class SweepPoint(gammaText: Double, threshold: Double,
                              tp: Long, fp: Long, fn: Long,
                              precision: Double, recall: Double, f1: Double) {
    def json: String =
      f"""{"gamma_text":$gammaText%.2f,"threshold":$threshold%.2f,"tp":$tp,"fp":$fp,"fn":$fn,""" +
        f""""precision":$precision%.6f,"recall":$recall%.6f,"f1":$f1%.6f}"""
  }

  /** γ-grid sweep over COMMITTED scored pairs (reference AMPI.scala:371-421
    * re-blends one cached scored RDD over a parameter grid; grid
    * aggregation AMPIResults.scala:15-33): for every (gammaText,
    * threshold) point, pairwise P/R/F1 against the labeled pairs, computed
    * by RE-BLENDING the committed per-channel scores (sim_text/sim_media/
    * sim_align + the media_usable/vetoed blend-path flags) — zero pairs are
    * re-scored, and the WHOLE grid is ONE aggregation pass (3·|grid| sum
    * columns over one join). Labeled pairs missing from the scored set
    * (prescreen-rejected) count as score-0 non-matches, exactly as the
    * pipeline treats them.
    */
  def sweepBlend(scoredPairs: DataFrame, labeledPairs: DataFrame,
                 cfg: graft.operators.PairScoring.ScoreConfig,
                 gammas: Seq[Double], thresholds: Seq[Double]): Seq[SweepPoint] = {
    val chans = scoredPairs.select(col("doc_id_a"), col("doc_id_b"),
      col("sim_text"), col("sim_media"), col("sim_align"), col("media_usable"), col("vetoed"))
    val j = labeledPairs.select(col("doc_id_a"), col("doc_id_b"), col("is_match"))
      .join(chans, Seq("doc_id_a", "doc_id_b"), "left")
      .select(col("is_match"),
        coalesce(col("sim_text"), lit(0.0)).as("st"),
        coalesce(col("sim_media"), lit(0.0)).as("sm"),
        coalesce(col("sim_align"), lit(0.0)).as("sa"),
        coalesce(col("media_usable"), lit(false)).as("mu"),
        coalesce(col("vetoed"), lit(false)).as("vt"))
    val grid = for (g <- gammas; t <- thresholds) yield (g, t)
    // coalesce: sum() over zero labeled pairs is NULL and getLong would NPE
    val aggs = grid.flatMap { case (g, t) =>
      val pred = graft.operators.PairScoring.blendColumn(
        col("st"), col("sm"), col("sa"), col("mu"), col("vt"), cfg, g) >= t
      Seq(
        coalesce(sum(when(pred && col("is_match"), 1L).otherwise(0L)), lit(0L)).as(f"tp_${g}_$t"),
        coalesce(sum(when(pred && !col("is_match"), 1L).otherwise(0L)), lit(0L)).as(f"fp_${g}_$t"),
        coalesce(sum(when(!pred && col("is_match"), 1L).otherwise(0L)), lit(0L)).as(f"fn_${g}_$t"))
    }
    val row = j.agg(aggs.head, aggs.tail: _*).collect()(0)
    grid.zipWithIndex.map { case ((g, t), i) =>
      val tp = row.getLong(3 * i); val fp = row.getLong(3 * i + 1); val fn = row.getLong(3 * i + 2)
      val p = if (tp + fp == 0) 1.0 else tp.toDouble / (tp + fp)
      val r = if (tp + fn == 0) 1.0 else tp.toDouble / (tp + fn)
      val f1 = if (p + r == 0) 0.0 else 2 * p * r / (p + r)
      SweepPoint(g, t, tp, fp, fn, p, r, f1)
    }
  }

  /** Exact cluster-membership equality: the partition induced by
    * `assignments` equals the partition induced by gold entity ids.
    * Checked by comparing canonicalized cluster signatures (min doc_id of
    * the gold entity vs predicted cluster_id per doc) over the FULL outer
    * doc universe — a doc present on only one side is an inequality, and
    * the row-count check catches a duplicated assignment row whose copies
    * agree (the old inner-join shape silently ignored both: an assignments
    * relation that DROPPED half its docs could still read "equal").
    */
  def clusterEquality(assignments: DataFrame, gold: DataFrame): Boolean = {
    val goldCanon = gold
      .groupBy(col("entity_id"))
      .agg(min(col("doc_id")).as("gold_cluster_id"))
      .join(gold, "entity_id")
      .select(col("doc_id"), col("gold_cluster_id"))
    assignments.join(goldCanon, Seq("doc_id"), "full")
      .where(col("cluster_id").isNull || col("gold_cluster_id").isNull ||
        col("cluster_id") =!= col("gold_cluster_id"))
      .isEmpty &&
      assignments.count() == gold.count()
  }

  /** Per-row span-sequence invariant (input_hint): the (kind, text,
    * media_ref, offset-order) sequence of every doc_id in `current` equals
    * the input's. Returns number of violating docs (0 = invariant holds).
    */
  def spanInvariantViolations(input: DataFrame, current: DataFrame): Long = {
    def canon(df: DataFrame, as: String) = df.select(
      col("doc_id"),
      sha2(to_json(array_sort(col("spans"),
        (a, b) => when(a.getField("offset") < b.getField("offset"), -1)
          .when(a.getField("offset") > b.getField("offset"), 1).otherwise(0))), 256).as(as))
    canon(input, "h_in").join(canon(current, "h_cur"), "doc_id")
      .where(col("h_in") =!= col("h_cur"))
      .count()
  }
}
