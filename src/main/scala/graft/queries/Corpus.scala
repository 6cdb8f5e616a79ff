package graft.queries

import graft.functions.CorpusExpr._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data-pipeline operators over the `documents` and `embeddings`
  * tables: deduplication (exact, MinHash+LSH, SimHash, n-gram Jaccard,
  * embedding-cosine near-dup), similarity search (brute-force cosine top-k
  * + IVF), and text analysis (language-ID, quality scoring, token counting,
  * fingerprinting). Every output column is a BIGINT/STRING or an
  * IEEE-bit-stable double so the DuckDB oracle hash-matches (see
  * CorpusExpr header for the determinism rules).
  *
  * Scale notes (the 100 TB story):
  *  - exact dedup = one hash-partitioned aggregation on a 128-bit content
  *    key — embarrassingly scalable;
  *  - MinHash LSH turns the O(n²) near-dup search into an equi-join on
  *    band keys (shuffle on key); only LSH candidates pay the exact-Jaccard
  *    verification, and band keys are plain codegen'd expressions so the
  *    whole stage is scan → project → explode → join;
  *  - IVF search shuffles once on the cell id; brute-force top-k broadcasts
  *    the (small) query set — the classic dim-broadcast pattern.
  */
object Corpus {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  private def docs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")

  private def emb(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "embeddings")

  /** Exact deduplication: hash-groupBy on the md5 content key; keeper =
    * min doc_id per group (deterministic representative).
    */
  def q19_dedup_exact(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .groupBy(md5(col("text")).as("content_key"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_docs"))

  /** MinHash+LSH near-duplicate pairs: word-2-shingles → one-pass native
    * 36-component minhash signature → 12 bands × 3 rows → band-key
    * equi-join on (band, doc_id) ONLY → pair dedup → exact Jaccard
    * verification ≥ 0.5, computed ONCE per surviving pair.
    *
    * Plan shape (the part that matters at 100 TB): the band join carries no
    * payload — shingle arrays never enter the shuffle, and a pair colliding
    * in all 12 bands is verified once, not 12 times. The shingle arrays are
    * joined back exactly once per DEDUPED candidate pair.
    *
    * Planted near-dups in the corpus sit at j ≥ 0.9 and background at
    * j < 0.15, so band recall at the threshold is effectively 1
    * (miss prob ≈ (1−0.9³)¹² ≈ 1e-7); the oracle brute-forces all pairs.
    * Internal band hashes use the native minhash_sig (never oracle-facing).
    */
  def q20_dedup_minhash_lsh(spark: SparkSession, dir: String): DataFrame = {
    graft.GraftExtensions.register(spark)
    val numBands = 12; val rowsPerBand = 3
    val sh = docs(spark, dir).select(col("doc_id"),
      shingles(tokens(col("text")), 2).as("sh"))
    val sig = sh.select(col("doc_id"),
      graft.functions.MinhashSigExpression.minhashSigNative(col("sh"), numBands * rowsPerBand, 0).as("sig"))
    val bands = sig.select(col("doc_id"),
      explode(transform(sequence(lit(0), lit(numBands - 1)),
        b => xxhash64(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)), b))).as("band"))
      // explicit partitioning: the band rows are tiny but the self-join
      // explodes — don't let AQE coalesce the join to one task (see q39)
      .repartition(spark.sparkContext.defaultParallelism, col("band"))
    val pairs = bands.select(col("band"), col("doc_id").as("doc_a"))
      .join(bands.select(col("band"), col("doc_id").as("doc_b")), "band")
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
    pairs
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"), jaccardMilli(col("sh_a"), col("sh_b")).as("jacc_milli"))
      .where(col("jacc_milli") >= 500)
  }

  /** n-gram (token-unigram) Jaccard dedup within a (lang, source) block —
    * the exact blocked variant: equi-join on the block key, pairwise exact
    * Jaccard ≥ 0.8 (tiny shared vocabulary makes lower thresholds
    * meaningless here).
    */
  def q21_dedup_ngram_jaccard(spark: SparkSession, dir: String): DataFrame = {
    // repartition: pair-join parallelism must not inherit the scan's split
    // count (see q39)
    val d = docs(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism, col("lang"), col("source"))
      .select(col("doc_id"), col("lang"), col("source"),
        array_distinct(tokens(col("text"))).as("toks"))
    val a = d.select(col("lang"), col("source"), col("doc_id").as("doc_a"), col("toks").as("toks_a"))
    val b = d.select(col("lang"), col("source"), col("doc_id").as("doc_b"), col("toks").as("toks_b"))
    a.join(b, Seq("lang", "source"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("lang"), col("doc_a"), col("doc_b"),
        jaccardMilli(col("toks_a"), col("toks_b")).as("jacc_milli"))
      .where(col("jacc_milli") >= 800)
  }

  /** SimHash fingerprints: 16-bit simhash over md5 token hashes, computed
    * by the native ONE-PASS SimhashExpression (each token md5'd once, all
    * 16 bit-counters in that pass — the 16-nested-`aggregate` columnar
    * fold it replaces walked the hash array once per bit and was the
    * round-2 bench regression). Docs agreeing on the full simhash are
    * near-dup candidates; output the fingerprint per doc plus its bucket
    * size.
    */
  def q22_dedup_simhash(spark: SparkSession, dir: String): DataFrame = {
    graft.GraftExtensions.register(spark)
    // empty/whitespace-only docs are excluded on BOTH sides: the oracle
    // derives simhash via unnest (which drops zero-token docs), so emitting
    // simhash=0 rows for them here would be a latent rows mismatch. The
    // filter tests the raw text (has any non-space char ⟺ ≥1 token), so
    // predicate pushdown cannot duplicate the tokenization into the filter.
    val d = docs(spark, dir)
      .where(length(replace(col("text"), lit(" "), lit(""))) > 0)
      .select(col("doc_id"),
        graft.functions.SimhashExpression.simhash16Native(tokens(col("text"))).as("simhash"))
    d.withColumn("bucket_size", count(lit(1)).over(Window.partitionBy(col("simhash"))))
  }

  /** Brute-force cosine top-k: queries = vec_id < 20 (broadcast), exact
    * integer-quantized cosine against all vectors, top-5 per query via the
    * bounded TopKAggregator — NOT a ranking window: a window partitioned by
    * #queries keys would funnel the entire corpus×queries product into
    * #queries partitions, while the aggregator's map-side partials shuffle
    * at most k rows per (query, input-partition).
    * The baseline ANN path; IVF below is the scale path.
    */
  def q23_embed_cosine_topk(spark: SparkSession, dir: String): DataFrame = {
    graft.GraftExtensions.register(spark)
    // repartition: the broadcast cross join streams e — parallelism must
    // not inherit the scan's split count (see q39)
    val e = emb(spark, dir).repartition(spark.sparkContext.defaultParallelism)
      .select(col("vec_id"), quantizeVec(col("embedding")).as("q"))
      .withColumn("n2", qnorm2(col("q")))
    val queries = e.where(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("q").as("qq"), col("n2").as("qn2"))
    val topk = graft.functions.TopKAggregator.topK(5)
    e.crossJoin(broadcast(queries))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        qcos(qdot(col("q"), col("qq")), col("n2"), col("qn2")).as("cos"))
      .groupBy("query_id")
      .agg(topk(col("vec_id"), col("cos")).as("nbrs"))
      .select(col("query_id"), posexplode(col("nbrs")))
      .select(col("query_id"), col("col").as("neighbor_id"), (col("pos") + 1).cast("bigint").as("rank"))
  }

  /** Upper vector-count bound for the brute-force q24 baseline: a cartesian
    * product over more vectors than this is a scale bug, not a query — the
    * LSH (q20) and IVF (q25) paths are the sanctioned near-dup operators
    * above it. 100k vectors ≈ 5e9 candidate pairs, the most a single-box
    * verification run can justify.
    */
  val NearDupBruteForceLimit = 100000L

  /** Embedding-cosine near-duplicate pairs: all pairs with quantized cosine
    * ≥ 0.35, emitted with the micro-scaled cosine floor (exact integer
    * arithmetic end-to-end; cos itself is IEEE-stable, see CorpusExpr.qcos).
    * GATED: this is the oracle-matching O(n²) baseline — above
    * `NearDupBruteForceLimit` vectors it refuses to run and points at the
    * scale paths (q20 MinHash-LSH, q25 IVF).
    */
  def q24_embed_neardup(spark: SparkSession, dir: String): DataFrame = {
    graft.GraftExtensions.register(spark)
    val nVecs = emb(spark, dir).count()
    require(nVecs <= NearDupBruteForceLimit,
      s"q24_embed_neardup is a brute-force all-pairs baseline; $nVecs vectors exceed " +
        s"the $NearDupBruteForceLimit cap. Use q20 (MinHash-LSH) or q25 (IVF) at scale.")
    val e = emb(spark, dir).repartition(spark.sparkContext.defaultParallelism)
      .select(col("vec_id"), quantizeVec(col("embedding")).as("q"))
      .withColumn("n2", qnorm2(col("q")))
    val a = e.select(col("vec_id").as("vec_a"), col("q").as("qa"), col("n2").as("na"))
    val b = e.select(col("vec_id").as("vec_b"), col("q").as("qb"), col("n2").as("nb"))
    a.crossJoin(b)
      .where(col("vec_a") < col("vec_b"))
      .withColumn("cos", qcos(qdot(col("qa"), col("qb")), col("na"), col("nb")))
      .where(col("cos") >= 0.35)
      .select(col("vec_a"), col("vec_b"), floor(col("cos") * 1000).cast("long").as("cos_milli"))
  }

  /** Number of Lloyd refinement rounds for q25's IVF index (unrolled
    * identically in the DuckDB oracle).
    */
  val IvfKmeansIters = 3

  /** IVF cell count (k-means k) and DEFAULT query-time multi-probe depth.
    * The recall dial (reference analogue: the AP sampling-ratio sweep,
    * AMPI_1.scala:192): more probes = more of the corpus scanned per query
    * = higher recall; probes = k degenerates to brute force. Measured
    * recall@3 vs brute force: the round-3 config (k=8, probes=3) read
    * 0.733; finer cells buy recall cheaper than deeper probes — at k=16,
    * probes=5 (~31% of cells scanned) reads 0.9167 on sf0.1 and 0.9333 on
    * sf0.01, the smallest depth clearing 0.9 WITH margin at both scales.
    * The bench emits the full recall-vs-probes curve each run so the dial
    * stays measured, not asserted.
    */
  val IvfK = 16
  val IvfProbes = 5

  /** A trained IVF index: the quantized+persisted vector relation and the
    * k learned integer centroids. Caller releases the cache.
    */
  final case class IvfIndex(vectors: DataFrame, cents: Array[(Long, Array[Long])]) {
    def release(): Unit = vectors.unpersist()
  }

  private def ivfCentStructs(cs: Array[(Long, Array[Long])]): org.apache.spark.sql.Column =
    array(cs.map { case (cid, cq) =>
      val cn2 = cq.map(x => x * x).sum
      struct(
        qcos(qdot(col("q"), typedLit(cq.toSeq)), col("n2"), lit(cn2)).as("s"),
        lit(-cid).as("nid"))
    }: _*)
  // argmax cosine, ties -> smaller cent_id (larger -cid)
  private def ivfCellCol(cs: Array[(Long, Array[Long])]): org.apache.spark.sql.Column =
    -array_max(ivfCentStructs(cs)).getField("nid")

  /** Train the IVF index: k centroids deterministically seeded from the
    * first k vectors, refined by `IvfKmeansIters` Lloyd rounds run as a
    * DataFrame loop — assignment is an argmax over broadcast centroid
    * literals (array_max over (cos, -cent_id) structs: ties to the smaller
    * id; no window), the update is ONE per-dimension hash aggregation
    * whose k×dim result is collected (centroids are a driver-side
    * dimension, like any broadcast dim). Centroid components are FLOORED
    * integer means so every cosine stays exact-integer-dot → the oracle
    * replays the same rounds bit-for-bit.
    * Scale shape: one shuffle per Lloyd round — never an all-pairs product.
    */
  def ivfBuild(spark: SparkSession, dir: String, k: Int = IvfK): IvfIndex = {
    graft.GraftExtensions.register(spark)
    val e = emb(spark, dir).repartition(spark.sparkContext.defaultParallelism)
      .select(col("vec_id"), quantizeVec(col("embedding")).as("q"))
      .withColumn("n2", qnorm2(col("q")))
      .persist()
    // seeded init: the first k vectors (deterministic, no RNG)
    var cents: Array[(Long, Array[Long])] = e.where(col("vec_id") < k)
      .select(col("vec_id"), col("q")).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray)).sortBy(_._1)
    (1 to IvfKmeansIters).foreach { _ =>
      val upd = e.select(ivfCellCol(cents).as("cell"), posexplode(col("q")))
        .groupBy("cell", "pos")
        .agg(sum(col("col")).as("s"), count(lit(1)).as("n"))
        .select(col("cell"), col("pos"),
          floor(col("s").cast("double") / col("n")).cast("long").as("m"))
        .collect()
      val byCell = upd.groupBy(_.getLong(0)).map { case (cell, rows) =>
        cell -> rows.sortBy(_.getInt(1)).map(_.getLong(2)).toArray
      }
      // empty-cell guard: a cell that attracted no vectors keeps its centroid
      cents = cents.map { case (cid, cq) => (cid, byCell.getOrElse(cid, cq)) }
    }
    IvfIndex(e, cents)
  }

  /** Query the trained index: each query (vec_id < 20) probes its
    * `probes` nearest cells (multi-probe = the recall dial; a per-row
    * array op over k elements, no shuffle), candidates rank by exact
    * quantized cosine through the bounded TopKAggregator. One equi-join
    * on cell at query time.
    */
  def ivfTopK(idx: IvfIndex, probes: Int, atK: Int = 3): DataFrame = {
    val e = idx.vectors
    val assigned = e.select(col("vec_id"), col("q"), col("n2"), ivfCellCol(idx.cents).as("cell"))
    val queries = e.where(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("q").as("qq"), col("n2").as("qn2"),
        slice(reverse(array_sort(ivfCentStructs(idx.cents))), 1, probes).as("top"))
      .select(col("query_id"), col("qq"), col("qn2"),
        explode(col("top")).as("probe"))
      .select(col("query_id"), col("qq"), col("qn2"), (-col("probe.nid")).as("cell"))
    val topk = graft.functions.TopKAggregator.topK(atK)
    assigned.join(broadcast(queries), "cell")
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        qcos(qdot(col("q"), col("qq")), col("n2"), col("qn2")).as("cos"))
      .groupBy("query_id")
      .agg(topk(col("vec_id"), col("cos")).as("nbrs"))
      .select(col("query_id"), posexplode(col("nbrs")))
      .select(col("query_id"), col("col").as("neighbor_id"), (col("pos") + 1).cast("bigint").as("rank"))
  }

  /** IVF (inverted-file) ANN: ivfBuild + ivfTopK at the default
    * `IvfProbes` dial (recall ≥ 0.9 at 3, measured per bench run).
    */
  def q25_embed_ivf_topk(spark: SparkSession, dir: String): DataFrame = {
    val idx = ivfBuild(spark, dir)
    val out = ivfTopK(idx, IvfProbes)
    // training used the cache (eager collects); the one query-time rescan
    // recomputes the cheap quantize projection from parquet
    idx.release()
    out
  }

  /** Recall-vs-probes curve: recall@`atK` of the IVF index against the
    * brute-force truth (q23) at each probe depth, ONE trained index
    * reused across depths — the artifact-visible recall dial.
    */
  def ivfRecallCurve(spark: SparkSession, dir: String, probesList: Seq[Int],
                     atK: Int = 3): Seq[(Int, Double)] = {
    val truth = q23_embed_cosine_topk(spark, dir)
      .where(col("rank") <= atK)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val idx = ivfBuild(spark, dir)
    val curve = probesList.map { p =>
      val got = ivfTopK(idx, p, atK)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      p -> (if (truth.isEmpty) 1.0 else (truth & got).size.toDouble / truth.size)
    }
    idx.release()
    curve
  }

  /** Language-ID by stopword-profile scoring: per-language marker lists;
    * score = # tokens in the profile; prediction = argmax score with
    * lexicographic tiebreak, 'und' when all scores are 0. (A deterministic
    * n-gram-free heuristic — the synthetic corpus shares one vocabulary
    * across langs, so this verifies the OPERATOR, not the labels.)
    */
  def q26_langid(spark: SparkSession, dir: String): DataFrame = {
    val profiles: Seq[(String, Seq[String])] = Seq(
      "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
      "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
      "es" -> Seq("el", "la", "de", "que", "y", "es"),
      "fr" -> Seq("le", "la", "de", "et", "un", "est"))
    val toks = tokens(col("text"))
    val scores = profiles.map { case (lang, words) =>
      struct(
        size(filter(toks, t => t.isin(words.map(lit(_)): _*))).cast("long").as("score"),
        lit(lang).as("lang"))
    }
    docs(spark, dir)
      .withColumn("best", array_max(array(scores: _*)))
      .select(col("doc_id"),
        when(col("best.score") > 0, col("best.lang")).otherwise(lit("und")).as("pred_lang"),
        col("best.score").as("score"))
  }

  /** Quality scoring: token count, type-token ratio, mean token length,
    * stopword ratio — all milli-scaled exact-integer ratios — plus a
    * quality bucket (the filter a 100 TB corpus pipeline would gate on).
    */
  def q27_quality_score(spark: SparkSession, dir: String): DataFrame = {
    val stop = Seq("the", "a", "of", "and", "to", "in", "is")
    val toks = tokens(col("text"))
    // n_tokens > 0 guard: the milli-ratios divide by n_tokens (ANSI mode
    // would throw on an empty doc); the oracle carries the same WHERE
    docs(spark, dir)
      .where(size(toks) > 0)
      .select(col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        size(array_distinct(toks)).cast("long").as("n_types"),
        aggregate(toks, lit(0L), (acc, x) => acc + length(x)).as("sum_len"),
        size(filter(toks, x => x.isin(stop.map(lit(_)): _*))).cast("long").as("n_stop"))
      .withColumn("ttr_milli", floor(lit(1000.0) * col("n_types") / col("n_tokens")).cast("long"))
      .withColumn("mean_len_milli", floor(lit(1000.0) * col("sum_len") / col("n_tokens")).cast("long"))
      .withColumn("stop_milli", floor(lit(1000.0) * col("n_stop") / col("n_tokens")).cast("long"))
      .withColumn("quality",
        when(col("n_tokens") >= 50 && col("ttr_milli") >= 300, lit("good"))
          .when(col("n_tokens") >= 20, lit("fair"))
          .otherwise(lit("poor")))
      .drop("sum_len")
  }

  /** Token counting: whitespace tokens + a BPE-ish regex segmentation
    * (letter runs / digit runs / single punctuation) — the two token
    * budgets a training pipeline tracks.
    */
  def q28_token_count(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"),
        size(tokens(col("text"))).cast("long").as("ws_tokens"),
        size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))
          .cast("long").as("bpe_tokens"))

  /** Document fingerprinting: order-sensitive rolling polynomial hash over
    * the token-hash sequence (mod 1e9+7) — content-addressable id robust to
    * whitespace-only changes, cheap to recompute incrementally.
    */
  def q29_fingerprint(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"), fingerprint(tokens(col("text"))).as("fp"))

  /** Multimodal column plumbing: a binary media payload (deterministic fake
    * bytes = unhex(md5(text)); real image/audio decoders are not in this
    * container) is pushed through a typed per-partition decode kernel —
    * the exact batch shape a Pandas-UDF/mapInPandas decode stage has:
    * (id, bytes) in, (id, width, height, channels, resized_w, resized_h,
    * n_bytes) out. The "decode" derives metadata from the leading bytes;
    * swap `decodeStub` for a real codec and nothing else changes.
    */
  def q30_media_features(spark: SparkSession, dir: String): DataFrame = {
    val withBytes = docs(spark, dir)
      .select(col("doc_id"), unhex(md5(col("text"))).as("media_bytes"))
    import spark.implicits._
    // typed kernel over the binary column — the multimodal decode slot
    val decoded = withBytes.as[(Long, Array[Byte])].mapPartitions { it =>
      it.map { case (id, bytes) =>
        val (w, h, c) = decodeStub(bytes)
        (id, w.toLong, h.toLong, c.toLong, ((w + 1) / 2).toLong, ((h + 1) / 2).toLong, bytes.length.toLong)
      }
    }
    decoded.toDF("doc_id", "width", "height", "channels", "resized_w", "resized_h", "n_bytes")
  }

  /** STUB decode: deterministic fake metadata from the payload's leading
    * bytes (stands in for an image decoder unavailable in this container).
    */
  private def decodeStub(bytes: Array[Byte]): (Int, Int, Int) = {
    val b0 = bytes(0) & 0xff; val b1 = bytes(1) & 0xff; val b2 = bytes(2) & 0xff
    (1 + (b0 % 64), 1 + (b1 % 64), 1 + (b2 % 3))
  }
}
