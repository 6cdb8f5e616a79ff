package graft.pipeline

import graft.ckpt.Snapshots
import graft.eval.Eval
import graft.operators.{Blocking, ConnectedComponents, PairScoring}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end entity-resolution pipeline (north rule):
  * blocking → batched pairwise scoring → transitive clustering, each stage
  * committed as a resumable snapshot with per-partition lineage + counters.
  *
  * Reference lifecycle analogue: AMPI.main (SURVEY.md §3.1) — dimension
  * broadcast, blocking flatMap, per-pair scoring, argmax + accuracy — with
  * the driver-side collect() of the full AP dataset (AMPI.scala:209)
  * replaced by distributed equi-joins on block keys.
  */
object EntityResolution {

  /** Aux snapshot stages committed by checkpointed batch runs ALONGSIDE the
    * three main stages — the durable base the incremental path
    * ([[addDocuments]]) reads so it never re-scans a committed document:
    *
    *  - `block_hot`: raw (block_key, doc_id) membership of every over-cap
    *    key (the blocking snapshot itself carries only the derived
    *    refinement/chain rows for those keys);
    *  - `doc_features`: per-doc weight-independent scoring features + the
    *    two refinement hashes (doc_id, refine0, refine1, txt, tok_ids,
    *    m_ids, x_ids) — the materialized token table;
    *  - `media_df`: (mid, df) media-token document frequencies, with the
    *    corpus size in the manifest counter `n_docs` — idf weights are
    *    re-derived as ln(1 + n_docs/df) so an increment reproduces batch
    *    weights EXACTLY after merging in the new docs' frequencies.
    */
  val StageBlockHot = "block_hot"
  val StageDocFeatures = "doc_features"
  val StageMediaDf = "media_df"

  final case class PipelineConfig(
      /** 12 bands × 4 minhash rows: same-entity recall per band ≈ j⁴
        * (0.9⁴ ≈ 0.66 → miss prob (1−0.66)¹² ≈ 2.6e-6) while halving the
        * false-candidate rate of 3-row bands on hot-token collisions
        * (false P per band j⁴ vs j³ at the junk-pair jaccard ~0.35) */
      numBands: Int = 12,
      rowsPerBand: Int = 4,
      maxBlockSize: Int = 64,
      /** token-set minhash bands; 0 disables the family, -1 = default */
      tokenBands: Int = 0,
      scoreThreshold: Double = 0.60,
      scoring: PairScoring.ScoreConfig = PairScoring.ScoreConfig(),
      maxCcIter: Int = 50)

  final case class Result(
      assignments: DataFrame,
      scoredPairs: DataFrame,
      blocking: DataFrame,
      ccIterations: Int,
      counters: Map[String, Long],
      private[pipeline] val toked: Option[DataFrame] = None,
      private[pipeline] val featMediaCache: Option[DataFrame] = None,
      private[pipeline] val ccCheckpointIds: Set[Int] = Set.empty) {
    /** Release EVERY cache a run materializes — the cached blocking
      * output, the shared tokenized relation, the scoring stage's
      * media-token cache, and the CC loop's final localCheckpoint — so
      * repeated runs in one session (sweep loops, services) cannot
      * accumulate leaked storage (PipelineSpec asserts zero surviving
      * persistent RDDs). After release(), `blocking`/`scoredPairs`
      * recompute from source; in a NON-checkpointed run (`runDir` unset)
      * `assignments` must not be reused — its backing localCheckpoint has
      * truncated lineage and is gone (checkpointed runs re-read parquet).
      */
    def release(): Unit = release(keepAssignments = false)

    /** keepAssignments=true frees every cache EXCEPT the CC loop's final
      * checkpoint, so the returned `assignments` stay readable — for
      * callers that hand the lazy relation onward (q36-as-query). The
      * kept checkpoint is one row per doc and lives until the session
      * ends or the caller frees it.
      */
    def release(keepAssignments: Boolean): Unit = {
      blocking.unpersist()
      toked.foreach(_.unpersist())
      featMediaCache.foreach(_.unpersist())
      if (!keepAssignments)
        ccCheckpointIds.foreach(id =>
          blocking.sparkSession.sparkContext.getPersistentRDDs.get(id)
            .foreach(_.unpersist(false)))
    }
  }

  /** Run the full pipeline. When `runDir` is given, each stage is committed
    * as a snapshot and `resume=true` skips already-committed stages
    * (byte-identical reuse — the resume gate of FIXTURES.md §6).
    */
  def run(spark: SparkSession, docs: DataFrame, cfg: PipelineConfig = PipelineConfig(),
          runDir: Option[String] = None, runId: String = "run0",
          resume: Boolean = false): Result = {

    def staged(stage: String, counters: => Map[String, Long])(compute: => DataFrame): (DataFrame, Map[String, Long]) =
      runDir match {
        case Some(dir) =>
          val cached = if (resume) Snapshots.loadCommitted(spark, dir, stage) else None
          cached match {
            case Some(df) => (df, Map(s"${stage}_resumed" -> 1L))
            case None =>
              val df = compute
              val c = counters
              val committed = Snapshots.commit(spark, df, dir, stage, runId, c)
              df.unpersist() // stage is durable now; drop any cache the compute left
              (spark.read.parquet(committed.path), c)
          }
        case None => (compute, counters)
      }

    // the shared tokenized relation: ONE span-extraction pass over the
    // source feeds blocking and scoring (Blocking.tokenized); the flat
    // (doc_id, toks, md) cache is far cheaper to rescan than the
    // nested-struct span table
    var tokedRef: Option[DataFrame] = None
    def toked: DataFrame = tokedRef.getOrElse {
      val t = Blocking.tokenized(docs)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      tokedRef = Some(t)
      t
    }

    // stage 1: blocking (in runDir mode the raw hot-key membership rides
    // along for the block_hot aux snapshot)
    var blockCounters = Map.empty[String, Long]
    var hotRowsRef: Option[DataFrame] = None
    val (blocking, c1) = staged("blocking", blockCounters) {
      val o = Blocking.blockTokenizedFull(toked, cfg.numBands, cfg.rowsPerBand,
        cfg.maxBlockSize, cfg.tokenBands, withHotRows = runDir.isDefined)
      blockCounters = o.counters
      hotRowsRef = o.hotRows
      o.rows
    }
    // aux: block_hot — committed only when the blocking stage computed
    // fresh (a resumed blocking stage either already has it, or the base
    // run predates the incremental stages and addDocuments will fail loud)
    for (dir <- runDir; h <- hotRowsRef) {
      if (Snapshots.lastCommitted(dir, StageBlockHot).isEmpty)
        Snapshots.commit(spark, h.select(col("block_key"), col("doc_id")),
          dir, StageBlockHot, runId, Map("hot_rows" -> h.count()))
      h.unpersist()
      hotRowsRef = None
    }

    // stage 2: scoring — idf weights computed distributedly and joined in
    // as per-doc hash-encoded arrays (no driver dictionary at any corpus
    // size); tokenization runs once per materialization via the shared
    // media-token exchange inside PairScoring.features (ReuseExchange)
    var scoreCounters = Map.empty[String, Long]
    var featCacheRef: Option[DataFrame] = None
    var featRef: Option[PairScoring.Features] = None
    var nDocsScored = 0L
    val (scored, c2) = staged("scored_pairs", scoreCounters) {
      val candidates = Blocking.candidatePairs(blocking)
      // corpus size from the persisted tokenized cache — the source table
      // itself is scanned exactly ONCE per run (into `toked`)
      val nDocs = toked.count()
      val f = PairScoring.featuresTokenized(toked, nDocs, cfg.scoring)
      featCacheRef = f.mediaTokenCache
      featRef = Some(f)
      nDocsScored = nDocs
      val s = PairScoring.scoreFeatures(spark, f.feats, candidates, cfg.scoring).toDF()
      scoreCounters = Map("docs_scored_against" -> nDocs)
      s
    }
    // aux: doc_features + media_df (the incremental base) — written while
    // the tokenized + media-token caches are still alive, only when the
    // scoring stage computed fresh and the aux stage is absent
    for (dir <- runDir; f <- featRef; mtok <- f.mediaTokenCache) {
      if (Snapshots.lastCommitted(dir, StageDocFeatures).isEmpty) {
        val stored = PairScoring.storedFeatures(toked, mtok, cfg.scoring)
          .join(Blocking.docRefine(toked), "doc_id")
          .select("doc_id", "refine0", "refine1", "txt", "tok_ids", "m_ids", "x_ids")
        Snapshots.commit(spark, stored, dir, StageDocFeatures, runId,
          Map("n_docs" -> nDocsScored))
      }
      if (Snapshots.lastCommitted(dir, StageMediaDf).isEmpty)
        f.dfRel.foreach(d => Snapshots.commit(spark, d, dir, StageMediaDf, runId,
          Map("n_docs" -> nDocsScored)))
    }
    // in runDir mode every consumer of the tokenized + media-token caches
    // is durable now — drop them here rather than at release()
    if (runDir.isDefined) {
      tokedRef.foreach(_.unpersist()); tokedRef = None
      featCacheRef.foreach(_.unpersist()); featCacheRef = None
    }

    // stage 3: clustering
    var ccIters = 0
    var ccCounters = Map.empty[String, Long]
    var ccCkptIds = Set.empty[Int]
    val (assignments, c3) = staged("cluster_assignments", ccCounters) {
      val edges = scored
        .where(col("score") >= cfg.scoreThreshold)
        .select(col("doc_id_a").as("src"), col("doc_id_b").as("dst"))
      // node universe from the tokenized cache when it exists (no extra
      // source scan); resumed runs fall back to the raw docs projection
      val allIds = tokedRef.map(_.select(col("doc_id"))).getOrElse(docs.select(col("doc_id")))
      // pairsPreDeduped: candidatePairs groupBys on (doc_id_a, doc_id_b),
      // so each unordered pair reaches scoring exactly once — CC can skip
      // its initial edge-dedup shuffle
      val cc = ConnectedComponents.assignAllTracked(spark, allIds, edges, cfg.maxCcIter,
        pairsPreDeduped = true)
      ccIters = cc.iterations
      ccCkptIds = cc.checkpointIds
      ccCounters = Map("cc_iterations" -> cc.iterations.toLong)
      cc.assignments
    }
    // in runDir mode the assignments are durable parquet now — the CC
    // loop's final checkpoint has no remaining consumer
    if (runDir.isDefined) {
      ccCkptIds.foreach(id =>
        spark.sparkContext.getPersistentRDDs.get(id).foreach(_.unpersist(false)))
      ccCkptIds = Set.empty
    }

    Result(assignments, scored, blocking, ccIters, c1 ++ c2 ++ c3, tokedRef, featCacheRef, ccCkptIds)
  }

  /** INCREMENTAL ER: extend a committed checkpointed run with `newDocs`
    * WITHOUT re-reading any committed document — the operation a standing
    * 100 TB deployment actually performs (daily arrivals against a
    * petabyte-scale committed corpus; a full batch re-run per increment is
    * the scalability cliff). Commits a NEW snapshot of every stage, so the
    * run directory becomes a time-travel log: snapshot K-1 is the corpus
    * before the increment, snapshot K after (Main --snapshot-id reads
    * either). Reference analogue: the reference re-runs its whole monthly
    * pipeline per data drop (AMPI.main, SURVEY §3.1) — this is the
    * snapshot-based replacement.
    *
    * What is EXACT vs a batch run over (committed ∪ new):
    *  - blocking rows and candidate pairs are bit-identical: the merged raw
    *    key table (small-key membership recovered from the blocking
    *    snapshot via [[Blocking.isRawKey]], hot membership from block_hot,
    *    refinement hashes from doc_features) is re-routed through the same
    *    [[Blocking.routeKeyed]] the batch path uses, so over-cap
    *    refinement/chain recovery — including keys crossing the cap only
    *    BECAUSE of the increment — is recomputed over merged membership;
    *  - newly-created pairs (any pair not in the committed scored set —
    *    new↔new, new↔old, and old↔old pairs created by re-routing) are
    *    scored with idf weights from the MERGED document frequencies
    *    (media_df + the new docs'), i.e. exactly the weights a batch run
    *    over the union would compute — their scores are bit-equal to that
    *    batch run (IncrementalSpec asserts this).
    *
    * What is deliberately NOT recomputed (the incremental contract):
    *  - committed pairs keep their committed channel scores — their idf
    *    weights reflect the corpus size at THEIR scoring time (drift per
    *    token is ln((1+N'/df')/(1+N/df)), second-order for any token worth
    *    weight); and
    *  - clustering is MERGE-MONOTONE: committed components enter the CC
    *    loop as star edges (doc_id → cluster_id, one row per non-singleton
    *    doc), so committed merges are never revisited even where
    *    re-routing dropped the pair that once justified them. A periodic
    *    batch run is the compaction that re-derives everything from
    *    current weights.
    *
    * Scale shape: new-doc tokenization/minhash/scoring is O(|new|); the
    * committed corpus is touched only through (a) the key-table re-route
    * (shuffles over compact long/string rows, no span decode), (b) the
    * candidate self-join, and (c) one weight re-attachment pass over the
    * stored feature table — no O(committed) span decode, minhash, or
    * pair scoring anywhere.
    *
    * Requires the base run to have been committed by a checkpointed run()
    * of this build (which writes block_hot/doc_features/media_df); fails
    * loud otherwise. `newDocs` doc_ids must be disjoint from the committed
    * corpus (checked).
    */
  def addDocuments(spark: SparkSession, newDocs: DataFrame, runDir: String,
                   cfg: PipelineConfig = PipelineConfig(),
                   runId: String = "incr"): Result = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    def loadStage(stage: String): DataFrame =
      Snapshots.loadCommitted(spark, runDir, stage).getOrElse(sys.error(
        s"addDocuments: no committed '$stage' snapshot under $runDir — the base must be a " +
          "checkpointed batch run of this build (run() with runDir commits the incremental " +
          s"base stages $StageBlockHot/$StageDocFeatures/$StageMediaDf alongside the main three)"))
    val oldBlocking = loadStage("blocking")
    val oldScored = loadStage("scored_pairs")
    val oldAssign = loadStage("cluster_assignments")
    val oldFeatures = loadStage(StageDocFeatures)
    val oldHot = loadStage(StageBlockHot)
    val oldDf = loadStage(StageMediaDf)
    val nOld = Snapshots.lastCounters(runDir, StageMediaDf).getOrElse("n_docs",
      sys.error(s"addDocuments: $StageMediaDf manifest lacks the n_docs counter"))

    val toked = Blocking.tokenized(newDocs).persist(MEMORY_AND_DISK)
    val nNew = toked.count()
    val dups = toked.select("doc_id").join(oldFeatures.select("doc_id"), "doc_id").count()
    require(dups == 0,
      s"addDocuments: $dups new doc_ids already exist in the committed corpus (increments must be disjoint)")

    // ---- blocking: reconstruct the committed raw key table (no content
    // re-read) and re-route it MERGED with the new docs' keys through the
    // batch code path
    val oldKeyed = oldBlocking.where(Blocking.isRawKey(col("block_key")))
      .select(col("block_key"), col("doc_id"))
      .unionByName(oldHot.select(col("block_key"), col("doc_id")))
      .join(oldFeatures.select(col("doc_id"), col("refine0"), col("refine1")), "doc_id")
      .select(col("doc_id"), col("refine0"), col("refine1"), col("block_key"))
    val newKeyed = Blocking.keyedDocs(toked, cfg.numBands, cfg.rowsPerBand, cfg.tokenBands)
    val route = Blocking.routeKeyed(oldKeyed.unionByName(newKeyed), cfg.maxBlockSize,
      withHotRows = true)
    val cBlock = Snapshots.commit(spark, route.rows, runDir, "blocking", runId, route.counters)
    route.hotRows.foreach { h =>
      Snapshots.commit(spark, h.select(col("block_key"), col("doc_id")), runDir, StageBlockHot,
        runId, Map("hot_rows" -> h.count()))
      h.unpersist()
    }
    route.rows.unpersist() // durable now
    val blocking = spark.read.parquet(cBlock.path)

    // ---- features: merged document frequencies → EXACT batch idf weights
    val nTotal = nOld + nNew
    val mtokNew = PairScoring.mediaTokenRows(toked, cfg.scoring.exclusivePrefix)
      .persist(MEMORY_AND_DISK)
    val dfNew = mtokNew.groupBy("mid").agg(count(lit(1)).as("df"))
    val dfMerged = oldDf.select(col("mid"), col("df").as("df_old"))
      .join(dfNew.select(col("mid"), col("df").as("df_new")), Seq("mid"), "full_outer")
      .select(col("mid"),
        (coalesce(col("df_old"), lit(0L)) + coalesce(col("df_new"), lit(0L))).as("df"))
    val cDf = Snapshots.commit(spark, dfMerged, runDir, StageMediaDf, runId,
      Map("n_docs" -> nTotal))
    val w = spark.read.parquet(cDf.path)
      .select(col("mid"), log1p(lit(nTotal.toDouble) / col("df")).as("w"))
    val newStored = PairScoring.storedFeatures(toked, mtokNew, cfg.scoring)
      .join(Blocking.docRefine(toked), "doc_id")
      .select("doc_id", "refine0", "refine1", "txt", "tok_ids", "m_ids", "x_ids")
    val cFeat = Snapshots.commit(spark, oldFeatures.unionByName(newStored), runDir,
      StageDocFeatures, runId, Map("n_docs" -> nTotal))
    // ONE weight re-attachment pass over the merged stored features serves
    // BOTH sides of the candidate join (hence the persist)
    val featsAll = PairScoring.featuresFromStored(spark.read.parquet(cFeat.path), w)
      .persist(MEMORY_AND_DISK)

    // ---- scoring: committed pairs keep their committed channels; only
    // pairs NEW to the universe are scored
    val cand = Blocking.candidatePairs(blocking)
    val oldCh = oldScored.select(col("doc_id_a"), col("doc_id_b"),
      struct(col("sim_text"), col("sim_media"), col("sim_align"), col("score"),
        col("media_usable"), col("vetoed")).as("old_ch"))
    val withOld = cand.join(oldCh, Seq("doc_id_a", "doc_id_b"), "left").persist(MEMORY_AND_DISK)
    val reused = withOld.where(col("old_ch").isNotNull)
      .select(col("doc_id_a"), col("doc_id_b"), col("block_key"),
        col("old_ch.sim_text").as("sim_text"), col("old_ch.sim_media").as("sim_media"),
        col("old_ch.sim_align").as("sim_align"), col("old_ch.score").as("score"),
        col("old_ch.media_usable").as("media_usable"), col("old_ch.vetoed").as("vetoed"))
    val freshCand = withOld.where(col("old_ch").isNull)
      .select(col("doc_id_a"), col("doc_id_b"), col("block_key"))
    val scoredFresh = PairScoring.scoreFeatures(spark, featsAll, freshCand, cfg.scoring)
      .toDF().persist(MEMORY_AND_DISK)
    val nFresh = scoredFresh.count()
    val cScore = Snapshots.commit(spark, reused.unionByName(scoredFresh), runDir,
      "scored_pairs", runId, Map("docs_scored_against" -> nTotal, "pairs_fresh" -> nFresh))
    val scored = spark.read.parquet(cScore.path)

    // ---- clustering: committed components enter as star edges (already at
    // fixpoint form — one edge per non-singleton doc), so only components
    // touched by fresh edges do real work; committed ≥-threshold pairs are
    // covered by their component's star and are NOT re-shuffled
    val starEdges = oldAssign.where(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id").as("src"), col("cluster_id").as("dst"))
    val freshEdges = scoredFresh.where(col("score") >= cfg.scoreThreshold)
      .select(col("doc_id_a").as("src"), col("doc_id_b").as("dst"))
    val allIds = oldAssign.select(col("doc_id")).unionByName(toked.select(col("doc_id")))
    val cc = ConnectedComponents.assignAllTracked(spark, allIds,
      freshEdges.unionByName(starEdges), cfg.maxCcIter, pairsPreDeduped = false)
    val cAssign = Snapshots.commit(spark, cc.assignments, runDir, "cluster_assignments",
      runId, Map("cc_iterations" -> cc.iterations.toLong))
    cc.releaseCheckpoints(spark)
    val assignments = spark.read.parquet(cAssign.path)

    // every cache this increment materialized is released — the returned
    // relations all read committed parquet
    toked.unpersist(); mtokNew.unpersist(); featsAll.unpersist()
    withOld.unpersist(); scoredFresh.unpersist()

    Result(assignments, scored, blocking, cc.iterations,
      route.counters ++ Map("docs_added" -> nNew, "docs_total" -> nTotal,
        "pairs_fresh" -> nFresh, "cc_iterations" -> cc.iterations.toLong))
  }

  /** Derive labeled pairs at shared blocking keys (FIXTURES.md §2):
    * candidate pairs from the blocking output, labeled by gold entity
    * equality — the evaluation universe of the F1 gate.
    */
  def labeledPairs(blocking: DataFrame, gold: DataFrame): DataFrame = {
    val pairs = Blocking.candidatePairs(blocking)
    val ga = gold.select(col("doc_id").as("doc_id_a"), col("entity_id").as("ea"))
    val gb = gold.select(col("doc_id").as("doc_id_b"), col("entity_id").as("eb"))
    pairs.join(ga, "doc_id_a").join(gb, "doc_id_b")
      .select(col("doc_id_a"), col("doc_id_b"), col("block_key"),
        (col("ea") === col("eb")).as("is_match"))
  }
}
