package graft.synth

import graft.model.{Doc, GoldCluster, Span}
import org.apache.spark.sql.{Dataset, SparkSession}

/** Deterministic synthetic corpus generator for the `docs` table
  * (BASELINE.json `input_hint` shape). Every random choice derives from a
  * single seed (unlike the reference's unseeded Random.shuffle,
  * SamplingAFCData.scala:34), and generation is a pure function of the
  * global row index — so the corpus is byte-identical regardless of
  * partitioning / parallelism, which is what makes the local[8] vs
  * local[32] scaling bench an apples-to-apples comparison.
  *
  * Shape (mirrors the reference's data reality, FIXTURES.md §1):
  *  - E entities × d docs each; per-entity template span sequence of mixed
  *    kinds ("text" ≈ AFC station token, "media" ≈ AP device observation);
  *  - per-doc perturbations: char-level typos on text (≈ AP observation
  *    noise), dropped/inserted media refs (≈ AP sampling ratios,
  *    SamplingAPData.scala:97-127), offset jitter that preserves order;
  *  - a Zipf head of shared hot tokens so some blocking keys are hot (the
  *    skew case MacCompression.scala:25 guards against).
  */
final case class GenConfig(
    numEntities: Int = 200,
    docsPerEntity: Int = 3,
    seed: Long = 42L,
    /** distinctive identity tokens per entity (drive blocking + scoring) */
    nameTokens: Int = 4,
    /** noise text tokens drawn from a shared Zipf vocabulary */
    noiseTokensMin: Int = 2,
    noiseTokensMax: Int = 16,
    /** per-entity media_ref device tokens */
    mediaTokensMin: Int = 4,
    mediaTokensMax: Int = 10,
    /** probability a text token gets a (<=2 char-edit) typo in a doc */
    typoProb: Double = 0.06,
    /** probability a media span is dropped in a doc */
    mediaDropProb: Double = 0.15,
    /** size of the shared hot-token vocabulary (Zipf head) */
    hotVocab: Int = 50,
    numPartitions: Int = 32) {
  def numDocs: Long = numEntities.toLong * docsPerEntity
}

object DocGen {

  /** Cheap splittable PRNG: derive an independent java Random from parts. */
  private def rng(parts: Long*): java.util.Random = {
    var h = -7046029254386353131L
    parts.foreach { p =>
      h ^= p
      h *= -4265267296055464877L
      h ^= (h >>> 32)
    }
    new java.util.Random(h)
  }

  private val letters = "abcdefghijklmnopqrstuvwxyz"

  private def randToken(r: java.util.Random, len: Int): String = {
    val sb = new StringBuilder(len)
    var i = 0
    while (i < len) { sb.append(letters.charAt(r.nextInt(26))); i += 1 }
    sb.toString
  }

  /** Zipf-ish draw over [0, n): index ~ floor(n * u^3) concentrates mass
    * on small indices (hot head) deterministically from the rng.
    */
  private def zipfIdx(r: java.util.Random, n: Int): Int = {
    val u = r.nextDouble()
    math.min(n - 1, (n * u * u * u).toInt)
  }

  private def typo(r: java.util.Random, s: String): String = {
    if (s.length < 3) return s
    val nEdits = 1 + r.nextInt(2)
    var out = s
    var e = 0
    while (e < nEdits && out.length >= 3) {
      val pos = r.nextInt(out.length)
      r.nextInt(3) match {
        case 0 => // substitute
          out = out.updated(pos, letters.charAt(r.nextInt(26)))
        case 1 => // delete
          out = out.substring(0, pos) + out.substring(pos + 1)
        case 2 => // insert
          out = out.substring(0, pos) + letters.charAt(r.nextInt(26)) + out.substring(pos)
      }
      e += 1
    }
    out
  }

  /** The per-entity template: distinctive name tokens first (they drive the
    * sorted-neighborhood key), then interleaved noise text + media spans.
    * Pure function of (seed, entityIdx).
    */
  private def template(cfg: GenConfig, entityIdx: Long): Vector[Span] = {
    val r = rng(cfg.seed, 0x7e3l, entityIdx)
    val name = Vector.fill(cfg.nameTokens)(randToken(r, 8))
    val nNoise = cfg.noiseTokensMin + r.nextInt(cfg.noiseTokensMax - cfg.noiseTokensMin + 1)
    val noise = Vector.fill(nNoise)(s"hot${zipfIdx(r, cfg.hotVocab)}")
    val nMedia = cfg.mediaTokensMin + r.nextInt(cfg.mediaTokensMax - cfg.mediaTokensMin + 1)
    // per-entity distinctive media tokens + a couple of hot shared ones
    val media = Vector.fill(nMedia)(s"dev_${randToken(r, 10)}") ++
      Vector.fill(2)(s"devhot${zipfIdx(r, cfg.hotVocab)}")
    val textSpans = (name ++ noise).map(t => Span("text", t, "", 0))
    val mediaSpans = media.map(m => Span("media", "", m, 0))
    // interleave: keep name tokens first (stable head), shuffle the rest
    // deterministically by rng-assigned sort keys
    val tail = (textSpans.drop(cfg.nameTokens) ++ mediaSpans)
      .map(s => (r.nextInt(1 << 30), s)).sortBy(_._1).map(_._2)
    textSpans.take(cfg.nameTokens) ++ tail
  }

  /** One document = entity template + seeded perturbations.
    * Pure function of (seed, entityIdx, docIdx).
    */
  def genDoc(cfg: GenConfig, globalIdx: Long): (Doc, String) = {
    val entityIdx = globalIdx / cfg.docsPerEntity
    val docIdx = globalIdx % cfg.docsPerEntity
    genAt(cfg, entityIdx, docIdx, f"d$globalIdx%012d")
  }

  private def genAt(cfg: GenConfig, entityIdx: Long, docIdx: Long, docId: String): (Doc, String) = {
    val r = rng(cfg.seed, 0xd0cL, entityIdx, docIdx)
    val tmpl = template(cfg, entityIdx)
    val spans = Vector.newBuilder[Span]
    var off = 0
    tmpl.foreach { s =>
      off += 1 + r.nextInt(5) // jitter, strictly increasing => order preserved
      if (s.kind == "text") {
        val t = if (r.nextDouble() < cfg.typoProb) typo(r, s.text) else s.text
        spans += Span("text", t, "", off)
      } else {
        if (r.nextDouble() >= cfg.mediaDropProb) spans += Span("media", "", s.media_ref, off)
      }
    }
    val entityId = f"e$entityIdx%09d"
    (Doc(docId, spans.result()), entityId)
  }

  /** Per-entity doc count in the POWER-LAW mode: entity e gets
    * max(docsPerEntity, head/(e+1)) docs — a 1/rank head of HOT ENTITIES
    * (entity 0 gets `head` docs, far above any block-size cap) decaying
    * into the uniform docsPerEntity tail. This is the block-size cap's
    * OTHER failure axis (hot entities, not just hot shared tokens): every
    * key a hot entity emits is hot, so its recall rides entirely on the
    * refinement + chain recovery paths.
    */
  private[graft] def skewedSize(cfg: GenConfig, entityIdx: Long, head: Int): Int =
    math.max(cfg.docsPerEntity, (head / (entityIdx + 1)).toInt)

  /** Power-law entity-size corpus (doc ids "s<entity>x<slot>" — a distinct
    * namespace from the uniform generator). Deterministic and
    * partition-count independent like docs().
    */
  def docsSkewed(spark: SparkSession, cfg: GenConfig, head: Int = 256): Dataset[Doc] = {
    import spark.implicits._
    spark.range(0, cfg.numEntities, 1, cfg.numPartitions).flatMap { e =>
      (0 until skewedSize(cfg, e, head)).iterator
        .map(d => genAt(cfg, e, d, f"s$e%09dx$d%05d")._1)
    }
  }

  def goldSkewed(spark: SparkSession, cfg: GenConfig, head: Int = 256): Dataset[GoldCluster] = {
    import spark.implicits._
    spark.range(0, cfg.numEntities, 1, cfg.numPartitions).flatMap { e =>
      (0 until skewedSize(cfg, e, head)).iterator
        .map(d => GoldCluster(f"s$e%09dx$d%05d", f"e$e%09d"))
    }
  }

  /** Distributed generation: spark.range → pure map. Scales to any size
    * (no driver-side materialization) and is partition-count independent.
    */
  def docs(spark: SparkSession, cfg: GenConfig): Dataset[Doc] = {
    import spark.implicits._
    spark.range(0, cfg.numDocs, 1, cfg.numPartitions)
      .map(i => genDoc(cfg, i)._1)
  }

  /** REVISED versions of the first `nDocs` uniform-corpus docs: the SAME
    * doc_id and entity template (identity preserved) with fresh seeded
    * perturbations — revision r re-perturbs at docIdx' = docIdx +
    * r·docsPerEntity, an rng stream disjoint from every generated doc. The
    * upsert ([[graft.pipeline.EntityResolution.replaceDocuments]]) input: a
    * revision changes typos/dropped-media noise, never entity identity, so
    * the gold clustering of a replaced corpus is unchanged.
    */
  def docsRevised(spark: SparkSession, cfg: GenConfig, nDocs: Long,
                  revision: Int = 1): Dataset[Doc] = {
    require(revision >= 1, "revision 0 IS the generated corpus")
    import spark.implicits._
    spark.range(0, nDocs, 1, cfg.numPartitions).map { i =>
      val entityIdx = i / cfg.docsPerEntity
      val docIdx = i % cfg.docsPerEntity + revision.toLong * cfg.docsPerEntity
      genAt(cfg, entityIdx, docIdx, f"d$i%012d")._1
    }
  }

  def gold(spark: SparkSession, cfg: GenConfig): Dataset[GoldCluster] = {
    import spark.implicits._
    spark.range(0, cfg.numDocs, 1, cfg.numPartitions).map { i =>
      val entityIdx = i / cfg.docsPerEntity
      GoldCluster(f"d$i%012d", f"e$entityIdx%09d")
    }
  }
}
