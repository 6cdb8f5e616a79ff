package graft.operators

import graft.functions.TextSim
import graft.model.ScoredPair
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Batched pairwise scoring within blocks (north rule: "Jaro-Winkler/
  * Levenshtein on span text plus media_ref overlap via weighted Jaccard,
  * vectorized through typed Dataset mapPartitions with broadcast of
  * per-block dictionaries").
  *
  * Reference analogue: the per-pair merge-scan scorer of AMPI.scala:226-293
  * with its two evidence channels ol_1 (time coverage) / ol_2 (flow ratio)
  * blended under threshold rules (AMPI.scala:385-392), and SIG's
  * inverse-flow weighting of co-occurrence evidence (SIG.scala:46-55).
  */
object PairScoring {

  final case class ScoreConfig(
      /** blend weight of the text channel */
      gammaText: Double = 0.55,
      /** reject pair outright when text evidence is this weak — the
        * conflict-rejection analogue (AMPI.scala:280,293) */
      conflictTextFloor: Double = 0.15,
      /** max text tokens fed to the O(L^2) Levenshtein kernel */
      maxTokens: Int = 64)

  /** Inverse-document-frequency weights for media_ref tokens.
    * weight(t) = ln(1 + N/df(t)) — hot shared tokens (the Zipf head)
    * contribute almost nothing; distinctive device tokens dominate.
    *
    * The returned map is bounded by the media vocabulary; at extreme scale
    * the same computation is done per-block (dictionary of only the block's
    * tokens) — the API takes any Map so either feeding works.
    */
  def mediaIdf(docs: DataFrame, minDf: Long = 1): (Map[String, Double], Long) = {
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

  /** Pure per-pair kernel, unit-testable off-Spark. */
  def scorePair(
      textA: Seq[String], mediaA: Seq[String],
      textB: Seq[String], mediaB: Seq[String],
      idf: String => Double, cfg: ScoreConfig): (Double, Double, Double) = {
    val ja = textA.take(cfg.maxTokens).mkString(" ")
    val jb = textB.take(cfg.maxTokens).mkString(" ")
    val simText = 0.5 * TextSim.jaroWinkler(ja, jb) + 0.5 * TextSim.levenshteinRatio(ja, jb)
    val simMedia = TextSim.weightedJaccard(mediaA.toSet, mediaB.toSet, idf)
    val score =
      if (simText < cfg.conflictTextFloor) 0.0
      else cfg.gammaText * simText + (1.0 - cfg.gammaText) * simMedia
    (simText, simMedia, score)
  }

  /** Score all candidate pairs. Joins candidates to the docs' precomputed
    * token arrays (columnar, codegen'd), then runs the typed kernel per
    * partition with the broadcast idf dictionary.
    */
  def score(
      spark: SparkSession,
      docs: DataFrame,
      candidates: DataFrame,
      idfBc: Broadcast[Map[String, Double]],
      defaultIdf: Double,
      cfg: ScoreConfig = ScoreConfig()): Dataset[ScoredPair] = {
    import spark.implicits._
    // columnar feature extraction once per doc (not per pair)
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
      .as[(String, String, String, Seq[String], Seq[String], Seq[String], Seq[String])]
    joined.mapPartitions { it =>
      val idf = idfBc.value
      val w: String => Double = t => idf.getOrElse(t, defaultIdf)
      it.map { case (a, b, bk, ta, ma, tb, mb) =>
        val (st, sm, sc) = scorePair(ta, ma, tb, mb, w, cfg)
        ScoredPair(a, b, bk, st, sm, sc)
      }
    }
  }
}
