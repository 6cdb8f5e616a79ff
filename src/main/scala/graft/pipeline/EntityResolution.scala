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

    // stage 1: blocking
    var blockCounters = Map.empty[String, Long]
    val (blocking, c1) = staged("blocking", blockCounters) {
      val (b, c) = Blocking.blockTokenized(toked, cfg.numBands, cfg.rowsPerBand, cfg.maxBlockSize, cfg.tokenBands)
      blockCounters = c
      b
    }

    // stage 2: scoring — idf weights computed distributedly and joined in
    // as per-doc hash-encoded arrays (no driver dictionary at any corpus
    // size); tokenization runs once per materialization via the shared
    // media-token exchange inside PairScoring.features (ReuseExchange)
    var scoreCounters = Map.empty[String, Long]
    var featCacheRef: Option[DataFrame] = None
    val (scored, c2) = staged("scored_pairs", scoreCounters) {
      val candidates = Blocking.candidatePairs(blocking)
      // corpus size from the persisted tokenized cache — the source table
      // itself is scanned exactly ONCE per run (into `toked`)
      val nDocs = toked.count()
      val f = PairScoring.featuresTokenized(toked, nDocs, cfg.scoring)
      featCacheRef = f.mediaTokenCache
      val s = PairScoring.scoreFeatures(spark, f.feats, candidates, cfg.scoring).toDF()
      scoreCounters = Map("docs_scored_against" -> nDocs)
      s
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
