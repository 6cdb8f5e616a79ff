package graft.operators

import graft.functions.TextSim
import graft.model.ScoredPair
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Batched pairwise scoring within blocks (north rule: "Jaro-Winkler/
  * Levenshtein on span text plus media_ref overlap via weighted Jaccard,
  * vectorized through typed Dataset mapPartitions").
  *
  * Reference analogue: the per-pair merge-scan scorer of AMPI.scala:226-293
  * with its two evidence channels ol_1 (time coverage) / ol_2 (flow ratio)
  * blended under threshold rules (AMPI.scala:385-392), and SIG's
  * inverse-flow weighting of co-occurrence evidence (SIG.scala:46-55).
  *
  * The idf weights ride WITH the data as per-doc (token, weight) arrays
  * computed by a distributed aggregation — at 10¹² docs the media
  * vocabulary is far too large for any driver-side dictionary, so the
  * only driver artifact is the scalar corpus size. (The reference instead
  * collects whole dimension tables to the driver, AMPI.scala:20-66 — the
  * anti-pattern this engine exists to remove. A broadcast dictionary
  * variant is still available for genuinely small vocabularies.)
  */
object PairScoring {

  final case class ScoreConfig(
      /** blend weight of the text channel */
      gammaText: Double = 0.55,
      /** reject pair outright when text evidence is this weak — the
        * conflict-rejection analogue (AMPI.scala:280,293) */
      conflictTextFloor: Double = 0.15,
      /** max text tokens fed to the O(L^2) Levenshtein kernel */
      maxTokens: Int = 64,
      /** blend the media channel only when BOTH sides carry at least this
        * many media tokens — the conditional-blend analogue of
        * AMPI.scala:385-392 (ol_2 used only when consistent with ol_1):
        * a doc that lost its media spans must not have its perfect text
        * match dragged below threshold by an empty channel */
      minMediaEvidence: Int = 2,
      /** blend weight of the ordered-alignment channel (0 disables) —
        * the flagship matcher's distinctive normalization,
        * AMPI.scala:393-405: per-rank exponential decay over the in-order
        * aligned spans Q, normalized by Q+P+R */
      alignWeight: Double = 0.2,
      /** rank-decay rate γ₃ of the alignment channel (AMPI.scala:404:
        * score_i / e^{γ₃·i}) */
      alignDecay: Double = 0.05,
      /** γ₂-style inner blend between the decayed-coverage term and the
        * raw Q/(Q+P+R) term (AMPI.scala:393-405) */
      alignBlend: Double = 0.5,
      /** M3's cost-weighted denominator (reference Model.scala:529-535:
        * x₁·cost_co + x₂·cost_afcOnly + x₃·cost_apOnly with weights
        * (0.36, 0.14, 0.5)): the alignment ratio becomes
        * Q / (x₁·Q + x₂·P + x₃·R). (1,1,1) = the unweighted Q+P+R form. */
      alignCostCo: Double = 1.0,
      alignCostAOnly: Double = 1.0,
      alignCostBOnly: Double = 1.0,
      /** Candidate PRESCREEN (reference analogue: the top-station
        * intersection prefilter applied before any pair is scored,
        * Model.scala:432-441): when the exact token-overlap ratio
        * |A∩B| / max(|A|,|B|) falls below this, the pair scores 0 without
        * running the O(L²) char-level kernels. Blocking necessarily
        * over-generates (LSH bands fire on shared hot tokens); this is the
        * cheap second stage that keeps the expensive third stage spent on
        * plausible pairs only — measured ~10× scoring throughput on
        * junk-dominated candidate sets. 0 disables.
        *
        * RECALL-CRITICAL: exact-token overlap is only an approximation of
        * char-level similarity — a true pair whose tokens are typo'd on
        * BOTH sides can sit far below its JW/Levenshtein similarity (a
        * doc with 3 of 4 name tokens edited scores overlap ≈ 0.43 while
        * simText ≈ 0.85). The default stays well below the plausible
        * true-pair floor; raise it only with corpus-specific evidence. */
      prescreenOverlap: Double = 0.3,
      /** HARD CONFLICT ELIMINATION (reference M7,
        * MultiUserMatch.scala:104-121: a device observed ELSEWHERE at tap
        * time vetoes the pair regardless of similarity): media tokens
        * carrying this prefix are exclusive identity claims — if both docs
        * assert one and the sets are disjoint, the pair scores 0. Empty
        * string disables. */
      exclusivePrefix: String = "xid:")

  /** Inverse-document-frequency weights for media_ref tokens as a
    * DRIVER-side map — only for genuinely small vocabularies (tests,
    * per-block dictionaries). weight(t) = ln(1 + N/df(t)).
    */
  def mediaIdf(docs: DataFrame, minDf: Long = 1): (Map[String, Double], Long) = {
    graft.GraftExtensions.register(docs.sparkSession)
    val n = docs.count()
    val dfMap = docs
      .select(explode(Blocking.mediaTokens(col("spans"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("df"))
      .where(col("df") >= minDf)
      .collect()
      .map(r => r.getString(0) -> math.log1p(n.toDouble / r.getLong(1)))
      .toMap
    (dfMap, n)
  }

  /** Per-doc media features with idf weights computed DISTRIBUTEDLY:
    * explode media tokens → df counts (one hash aggregation) → join back →
    * re-aggregate to per-doc sorted (token, weight) arrays. No driver
    * dictionary at any scale; sort_array makes downstream double-summation
    * order deterministic across runs/partitionings.
    * Returns (doc_id, m_toks: array<string>, m_ws: array<double>).
    */
  def mediaFeatures(docs: DataFrame, nDocs: Long): DataFrame = {
    graft.GraftExtensions.register(docs.sparkSession)
    val toks = docs.select(col("doc_id"), explode(Blocking.mediaTokens(col("spans"))).as("tok"))
    // mediaTokens is distinct per doc => count(*) per token == document freq
    val w = toks.groupBy("tok").agg(count(lit(1)).as("df"))
      .select(col("tok"), log1p(lit(nDocs.toDouble) / col("df")).as("w"))
    toks.join(w, "tok")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("tok"), col("w")))).as("mw"))
      .select(col("doc_id"),
        transform(col("mw"), x => x.getField("tok")).as("m_toks"),
        transform(col("mw"), x => x.getField("w")).as("m_ws"))
  }

  /** Weighted Jaccard from aligned (token, weight) arrays; both sides carry
    * the same global weight for the same token, so
    * inter = Σ_{A∩B} w and union = Σ_A w + Σ_B w − inter.
    */
  def weightedJaccardArrays(
      ta: Seq[String], wa: Seq[Double],
      tb: Seq[String], wb: Seq[Double]): Double = {
    if (ta.isEmpty && tb.isEmpty) return 0.0
    val bset = tb.toSet
    var inter = 0.0
    var sa = 0.0
    var i = 0
    while (i < ta.length) {
      sa += wa(i)
      if (bset.contains(ta(i))) inter += wa(i)
      i += 1
    }
    var sb = 0.0
    var j = 0
    while (j < wb.length) { sb += wb(j); j += 1 }
    val uni = sa + sb - inter
    if (uni <= 0.0) 0.0 else inter / uni
  }

  /** Ordered-alignment channel (reference M1's distinctive normalization,
    * AMPI.scala:393-405): Q = in-order aligned tokens (LCS), P/R = each
    * side's unaligned remainder. The γ₂ blend combines
    *  - the rank-DECAYED coverage Σ_{i<Q} e^{-γ₃ i} / Σ_{i<min(na,nb)}
    *    e^{-γ₃ i} (early aligned spans dominate — the e^{γ₃·i} divisor of
    *    AMPI.scala:404 in normalized form; both sums are closed-form
    *    geometric series), and
    *  - the raw Σ s_i / (Q+P+R) with s_i = 1 — literally AMPI.scala:405's
    *    denominator, since Q+P+R = na+nb−Q.
    * 1.0 for identical sequences, → 0 for disjoint ones.
    */
  def alignScore(textA: Seq[String], textB: Seq[String], decay: Double, blend: Double,
                 costCo: Double = 1.0, costAOnly: Double = 1.0, costBOnly: Double = 1.0): Double = {
    val na = textA.length; val nb = textB.length
    if (na == 0 || nb == 0) return 0.0
    val q = TextSim.tokenLcs(textA, textB)
    if (q == 0) return 0.0
    def geo(n: Int): Double =
      if (decay <= 0.0) n.toDouble
      else (1.0 - math.exp(-decay * n)) / (1.0 - math.exp(-decay))
    val decayed = geo(q) / geo(math.min(na, nb))
    // M3 weighted denominator (Model.scala:529-535), Q+P+R at (1,1,1)
    val denom = costCo * q + costAOnly * (na - q) + costBOnly * (nb - q)
    val qpr = if (denom <= 0.0) 0.0 else costCo * q / denom
    blend * decayed + (1.0 - blend) * qpr
  }

  /** M7 hard conflict: both docs assert an exclusive-identity media token
    * (prefix-marked) and the claims are disjoint — the pair is vetoed no
    * matter how similar the text (reference MultiUserMatch.scala:104-121:
    * the device was provably elsewhere).
    */
  def exclusiveConflict(mToksA: Seq[String], mToksB: Seq[String], prefix: String): Boolean = {
    if (prefix.isEmpty) return false
    val xa = mToksA.filter(_.startsWith(prefix))
    if (xa.isEmpty) return false
    val xb = mToksB.filter(_.startsWith(prefix))
    if (xb.isEmpty) return false
    val sa = xa.toSet
    !xb.exists(sa.contains)
  }

  /** Exact MULTISET token-overlap ratio |A ⊓ B| / max(|A|,|B|) — O(n)
    * count-map probe. Multiset (not set) intersection: repeated tokens
    * (Zipf-head noise) must count with multiplicity or identical docs
    * carrying duplicates would under-score.
    */
  def tokenOverlapRatio(a: Seq[String], b: Seq[String]): Double = {
    if (a.isEmpty || b.isEmpty) return 0.0
    val (small, large) = if (a.length <= b.length) (a, b) else (b, a)
    val counts = new java.util.HashMap[String, Int](small.length * 2)
    small.foreach(t => counts.merge(t, 1, Integer.sum))
    var inter = 0
    val it = large.iterator
    while (it.hasNext) {
      val t = it.next()
      val c = counts.getOrDefault(t, 0)
      if (c > 0) { inter += 1; counts.put(t, c - 1) }
    }
    inter.toDouble / math.max(a.length, b.length)
  }

  /** Pure per-pair kernel (array-weights form), unit-testable off-Spark.
    * Returns (simText, simMedia, simAlign, blended score).
    */
  def scorePairArrays(
      textA: Seq[String], mToksA: Seq[String], mWsA: Seq[Double],
      textB: Seq[String], mToksB: Seq[String], mWsB: Seq[Double],
      cfg: ScoreConfig): (Double, Double, Double, Double) = {
    val ta = if (textA.length > cfg.maxTokens) textA.take(cfg.maxTokens) else textA
    val tb = if (textB.length > cfg.maxTokens) textB.take(cfg.maxTokens) else textB
    // stage 2 of the candidate funnel: cheap exact-overlap prescreen before
    // the O(L²) kernels (see ScoreConfig.prescreenOverlap)
    if (cfg.prescreenOverlap > 0.0 && tokenOverlapRatio(ta, tb) < cfg.prescreenOverlap)
      return (0.0, 0.0, 0.0, 0.0)
    val ja = ta.mkString(" ")
    val jb = tb.mkString(" ")
    val simText = 0.5 * TextSim.jaroWinkler(ja, jb) + 0.5 * TextSim.levenshteinRatio(ja, jb)
    val simMedia = weightedJaccardArrays(mToksA, mWsA, mToksB, mWsB)
    val simAlign =
      if (cfg.alignWeight <= 0.0) 0.0
      else alignScore(ta, tb, cfg.alignDecay, cfg.alignBlend,
        cfg.alignCostCo, cfg.alignCostAOnly, cfg.alignCostBOnly)
    val mediaUsable = math.min(mToksA.size, mToksB.size) >= cfg.minMediaEvidence
    val base =
      if (simText < cfg.conflictTextFloor) 0.0
      else if (!mediaUsable) simText
      else cfg.gammaText * simText + (1.0 - cfg.gammaText) * simMedia
    val blended =
      if (base == 0.0) 0.0
      else (1.0 - cfg.alignWeight) * base + cfg.alignWeight * simAlign
    val score =
      if (exclusiveConflict(mToksA, mToksB, cfg.exclusivePrefix)) 0.0 else blended
    (simText, simMedia, simAlign, score)
  }

  /** Pure per-pair kernel (dictionary form — small-vocabulary path). */
  def scorePair(
      textA: Seq[String], mediaA: Seq[String],
      textB: Seq[String], mediaB: Seq[String],
      idf: String => Double, cfg: ScoreConfig): (Double, Double, Double, Double) = {
    val (sa, sb) = (mediaA.map(idf), mediaB.map(idf))
    scorePairArrays(textA, mediaA, sa, textB, mediaB, sb, cfg)
  }

  /** Score all candidate pairs. Joins candidates to per-doc precomputed
    * token + weighted-media arrays (columnar, codegen'd), then runs the
    * typed kernel per partition. `nDocs` feeds the idf formula; pass the
    * cached docs count so no extra job runs here.
    */
  def score(
      spark: SparkSession,
      docs: DataFrame,
      candidates: DataFrame,
      nDocs: Long,
      cfg: ScoreConfig = ScoreConfig()): Dataset[ScoredPair] = {
    import spark.implicits._
    graft.GraftExtensions.register(spark)
    // columnar feature extraction once per doc (not per pair)
    val media = mediaFeatures(docs, nDocs)
    val feats = docs.select(
      col("doc_id"),
      Blocking.textTokens(col("spans")).as("toks"))
      .join(media, Seq("doc_id"), "left")
      .select(col("doc_id"), col("toks"),
        coalesce(col("m_toks"), array().cast("array<string>")).as("m_toks"),
        coalesce(col("m_ws"), array().cast("array<double>")).as("m_ws"))
    val fa = feats.select(col("doc_id").as("doc_id_a"), col("toks").as("toks_a"),
      col("m_toks").as("mt_a"), col("m_ws").as("mw_a"))
    val fb = feats.select(col("doc_id").as("doc_id_b"), col("toks").as("toks_b"),
      col("m_toks").as("mt_b"), col("m_ws").as("mw_b"))
    val joinedDf = candidates
      .join(fa, "doc_id_a")
      .join(fb, "doc_id_b")
      .select("doc_id_a", "doc_id_b", "block_key",
        "toks_a", "mt_a", "mw_a", "toks_b", "mt_b", "mw_b")
    // columnar prescreen BEFORE the typed decode: junk pairs are rejected
    // while still inside Tungsten rows (native token_overlap_milli over
    // UTF8String bytes) instead of paying the UnsafeRow→Scala decode of
    // five array columns each — the measured allocation hot spot on
    // junk-dominated candidate sets. Threshold floor()'d so the columnar
    // filter is a strict SUPERSET of the kernel's exact check (which
    // remains the authority).
    val screened =
      if (cfg.prescreenOverlap <= 0.0) joinedDf
      else {
        graft.GraftExtensions.register(spark)
        val thr = math.floor(cfg.prescreenOverlap * 1000).toInt
        joinedDf.where(graft.functions.TokenOverlapExpression.tokenOverlapMilli(
          slice(col("toks_a"), 1, cfg.maxTokens),
          slice(col("toks_b"), 1, cfg.maxTokens)) >= thr)
      }
    val joined = screened.as[(String, String, Long, Seq[String], Seq[String], Seq[Double],
           Seq[String], Seq[String], Seq[Double])]
    joined.mapPartitions { it =>
      it.map { case (a, b, bk, ta, mta, mwa, tb, mtb, mwb) =>
        val (st, sm, sa, sc) = scorePairArrays(ta, mta, mwa, tb, mtb, mwb, cfg)
        ScoredPair(a, b, bk, st, sm, sa, sc)
      }
    }
  }

  /** Broadcast-dictionary scoring variant (small vocabularies / per-block
    * dictionaries): same kernel, weights looked up in a broadcast map.
    */
  def scoreWithDictionary(
      spark: SparkSession,
      docs: DataFrame,
      candidates: DataFrame,
      idfBc: Broadcast[Map[String, Double]],
      defaultIdf: Double,
      cfg: ScoreConfig = ScoreConfig()): Dataset[ScoredPair] = {
    import spark.implicits._
    graft.GraftExtensions.register(spark)
    val feats = docs.select(
      col("doc_id"),
      Blocking.textTokens(col("spans")).as("toks"),
      Blocking.mediaTokens(col("spans")).as("media"))
    val fa = feats.select(col("doc_id").as("doc_id_a"), col("toks").as("toks_a"), col("media").as("media_a"))
    val fb = feats.select(col("doc_id").as("doc_id_b"), col("toks").as("toks_b"), col("media").as("media_b"))
    val joined = candidates
      .join(fa, "doc_id_a")
      .join(fb, "doc_id_b")
      .select("doc_id_a", "doc_id_b", "block_key", "toks_a", "media_a", "toks_b", "media_b")
      .as[(String, String, Long, Seq[String], Seq[String], Seq[String], Seq[String])]
    joined.mapPartitions { it =>
      val idf = idfBc.value
      val w: String => Double = t => idf.getOrElse(t, defaultIdf)
      it.map { case (a, b, bk, ta, ma, tb, mb) =>
        val (st, sm, sa, sc) = scorePair(ta, ma, tb, mb, w, cfg)
        ScoredPair(a, b, bk, st, sm, sa, sc)
      }
    }
  }
}
