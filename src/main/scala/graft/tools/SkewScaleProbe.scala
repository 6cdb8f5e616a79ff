package graft.tools

import graft.eval.Eval
import graft.pipeline.EntityResolution
import graft.synth.{DocGen, GenConfig}
import org.apache.spark.sql.SparkSession

/** Ad-hoc entity-skew-at-scale probe (not part of the library surface):
  * runMain graft.tools.SkewScaleProbe [threads] [entities] [head] [strong] [minSide] [commit]
  *
  * The headroom table (BENCH/BASELINE.md) scales the UNIFORM corpus up;
  * this probe scales the block-size cap's OTHER failure axis — a
  * power-law entity-size distribution (head entity = `head` docs, tail
  * f(i) = max(dpe, head/(i+1))) at bench-scale doc counts. Every key a
  * 256-doc entity emits is over-cap, so its entire recall rides on the
  * refinement + chain recovery paths; the suite proves the semantics at
  * 300 entities (PipelineSpec), this measures wall/throughput/F1 with
  * cluster equality at ~600k docs. Corpus generation is untimed (written
  * to tmpfs parquet first, same rule as the bench legs).
  *
  * After the pipeline metrics it also runs the post-clustering WEAK-BRIDGE
  * audit (ClusterAudit.repair, strong/minSide from args 3/4, defaults
  * 0.75/2) and reports precision/recall/F1 and the merge/split tails
  * before vs after — the measured answer to "does the audit cut the mixed
  * clusters without splitting real entities" on the corpus that first
  * exhibited the merge tail (BENCH/round5_skew_scale.json: 2 mixed
  * clusters of 190k entities).
  *
  * With a 6th arg `commit` the pipeline runs in runDir mode (snapshots
  * committed to tmpfs) and the probe ADDITIONALLY measures the
  * PRODUCTION-shape audit — [[EntityResolution.auditRepair]] reading the
  * committed scored_pairs/cluster_assignments snapshots and committing the
  * repair as deltas + standing pair tombstones. Without it, the in-memory
  * audit wall includes re-deriving scoredPairs from the cached blocking
  * (a cost the committed path never pays). Commit mode then ALSO runs the
  * recall-side twin, [[EntityResolution.mergeRepair]], against the run the
  * cut audit left behind (the standing deployment order) and reports
  * whether corroborated near-miss evidence heals any of the natural split
  * tail — with the census counters separating "no split has band
  * evidence" (a blocking miss, unhealable by rescoring) from "healed".
  */
object SkewScaleProbe {
  def main(args: Array[String]): Unit = {
    val threads = if (args.nonEmpty) args(0).toInt else 32
    val entities = if (args.length > 1) args(1).toInt else 190000
    val head = if (args.length > 2) args(2).toInt else 256
    val spark = SparkSession.builder().master(s"local[$threads]")
      .appName("graft-skew-scale-probe")
      .config("spark.sql.shuffle.partitions", threads * 4)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", s"/dev/shm/graft-skewprobe-shuffle-${ProcessHandle.current().pid()}")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = s"/dev/shm/graft-skewscale-${ProcessHandle.current().pid()}"
    try {
      val cfg = GenConfig(numEntities = entities, docsPerEntity = 3, seed = 42L)
      val corpusDir = s"$root/corpus"
      DocGen.docsSkewed(spark, cfg, head).toDF()
        .write.mode("overwrite").parquet(corpusDir)
      spark.conf.set("spark.sql.files.maxPartitionBytes", (16L * 1024 * 1024).toString)
      val docs = spark.read.parquet(corpusDir)
      val commitMode = args.length > 5 && args(5) == "commit"
      val runDir = s"$root/run"
      val t0 = System.nanoTime()
      val res = EntityResolution.run(spark, docs,
        runDir = if (commitMode) Some(runDir) else None)
      val nDocs = res.assignments.count()
      val wall = (System.nanoTime() - t0) / 1e9
      val gold = DocGen.goldSkewed(spark, cfg, head).toDF().cache()
      gold.count()
      val labeled = EntityResolution.labeledPairs(res.blocking, gold).cache()
      val (gpTotal, gpBlocked, gpMissed) = Eval.blockingTail(labeled, gold)
      val m = Eval.pairwiseF1(res.assignments, labeled)
      val eq = Eval.clusterEquality(res.assignments, gold)
      // make the distance from exact equality legible: entities whose docs
      // span >1 predicted cluster (splits) and predicted clusters mixing
      // >1 entity (merges)
      import org.apache.spark.sql.functions.{col, countDistinct}
      val joined = res.assignments.join(gold, "doc_id").cache()
      val nSplit = joined.groupBy("entity_id")
        .agg(countDistinct(col("cluster_id")).as("k")).where(col("k") > 1).count()
      val nMerge = joined.groupBy("cluster_id")
        .agg(countDistinct(col("entity_id")).as("k")).where(col("k") > 1).count()
      joined.unpersist()
      val cnt = res.counters

      // --- weak-bridge audit: repair in memory, re-measure the tails
      val strong = if (args.length > 3) args(3).toDouble else 0.75
      val minSide = if (args.length > 4) args(4).toInt else 2
      val acfg = graft.operators.ClusterAudit.AuditConfig(
        strongScore = strong, minSideDocs = minSide)
      val ta = System.nanoTime()
      val rep = graft.operators.ClusterAudit.repair(res.assignments, res.scoredPairs, acfg)
      val repaired = rep.assignments.cache()
      repaired.count()
      val auditWall = (System.nanoTime() - ta) / 1e9
      val m2 = Eval.pairwiseF1(repaired, labeled)
      val joined2 = repaired.join(gold, "doc_id").cache()
      val nSplit2 = joined2.groupBy("entity_id")
        .agg(countDistinct(col("cluster_id")).as("k")).where(col("k") > 1).count()
      val nMerge2 = joined2.groupBy("cluster_id")
        .agg(countDistinct(col("entity_id")).as("k")).where(col("k") > 1).count()
      joined2.unpersist()
      val ac = rep.counters
      rep.release(); repaired.unpersist()

      // --- production-shape audit: census-free repair over the COMMITTED
      // snapshots (what `Main --audit-repair` pays), deltas + tombstones
      // committed to the run history
      val committedJson = if (commitMode) {
        val tc = System.nanoTime()
        val acRes = EntityResolution.auditRepair(spark, runDir, acfg)
        val commAssign = acRes.assignments.cache()
        commAssign.count()
        val commWall = (System.nanoTime() - tc) / 1e9
        val mC = Eval.pairwiseF1(commAssign, labeled)
        commAssign.unpersist()
        val auditJson =
          f""","audit_committed":{"wall_sec":$commWall%.1f,""" +
            f""""bridges_cut":${acRes.counters.getOrElse("audit_bridges_cut", -1L)},""" +
            f""""docs_reassigned":${acRes.counters.getOrElse("audit_docs_reassigned", -1L)},""" +
            f""""cut_pairs_removed":${acRes.counters.getOrElse("audit_cut_pairs_removed", 0L)},""" +
            f""""f1_after":${mC.f1}%.6f,"precision_after":${mC.precision}%.6f,""" +
            f""""recall_after":${mC.recall}%.6f}"""
        // --- merge audit (recall-side twin) over the run the cut audit
        // just committed: does corroborated near-miss evidence heal any of
        // the NATURAL split tail at this scale? A split whose fragments
        // were never scored (blocking miss) has no band evidence and
        // cannot qualify — the census counters make that distinction
        // legible either way.
        val tm = System.nanoTime()
        val mgRes = EntityResolution.mergeRepair(spark, runDir)
        val mgAssign = mgRes.assignments.cache()
        mgAssign.count()
        val mgWall = (System.nanoTime() - tm) / 1e9
        val mG = Eval.pairwiseF1(mgAssign, labeled)
        val joinedM = mgAssign.join(gold, "doc_id").cache()
        val nSplitM = joinedM.groupBy("entity_id")
          .agg(countDistinct(col("cluster_id")).as("k")).where(col("k") > 1).count()
        val nMergeM = joinedM.groupBy("cluster_id")
          .agg(countDistinct(col("entity_id")).as("k")).where(col("k") > 1).count()
        // --- split-tail DIAGNOSIS: classify each surviving split's
        // cross-cluster gold pairs by how far the pipeline took them.
        // The census cannot see pairs it was never shown; this can —
        // against the committed snapshots, O(split docs) rows:
        //   never_blocked    → no shared block key (a blocking-family gap)
        //   blocked_unscored → shared a key but no committed score (cap
        //                      recovery dropped the pair; CC transitivity
        //                      didn't bridge it either)
        //   scored_sub_floor → scored below mergeFloor (the scorer itself
        //                      rejects the pair; unhealable by evidence)
        //   scored_in_band   → evidence the merge audit SAW but did not
        //                      qualify (the honest minEvidence/minCoverage
        //                      residual)
        // Each bucket names a different fix; without the split a reader
        // can't tell a blocking miss from a scorer miss.
        import org.apache.spark.sql.functions.{broadcast, lit, when}
        val splitEnts = joinedM.groupBy("entity_id")
          .agg(countDistinct(col("cluster_id")).as("k")).where(col("k") > 1)
          .select("entity_id")
        val splitDocs = joinedM.join(broadcast(splitEnts), "entity_id")
          .select(col("entity_id"), col("doc_id"), col("cluster_id")).cache()
        val sA = splitDocs.select(col("entity_id"), col("doc_id").as("da"),
          col("cluster_id").as("ca"))
        val sB = splitDocs.select(col("entity_id"), col("doc_id").as("db"),
          col("cluster_id").as("cb"))
        val splitPairs = sA.join(sB, "entity_id")
          .where(col("da") < col("db") && col("ca") =!= col("cb"))
          .select("entity_id", "da", "db").cache()
        val nSplitPairs = splitPairs.count()
        val sDocs = splitDocs.select("doc_id").distinct()
        val bRows = graft.ckpt.Snapshots.loadCommitted(spark, runDir, "blocking").get
          .join(broadcast(sDocs), "doc_id")
          .select(col("block_key"), col("doc_id")).cache()
        val blockedPairs = bRows.as("l").join(bRows.as("r"),
            col("l.block_key") === col("r.block_key") && col("l.doc_id") < col("r.doc_id"))
          .select(col("l.doc_id").as("da"), col("r.doc_id").as("db")).distinct()
          .withColumn("blocked", lit(true))
        val floor = graft.operators.ClusterMerge.MergeConfig().mergeFloor
        val pairScores = graft.ckpt.Snapshots.loadCommitted(spark, runDir, "scored_pairs").get
          .select(col("doc_id_a").as("da"), col("doc_id_b").as("db"), col("score"))
          .join(broadcast(splitPairs.select("da", "db")), Seq("da", "db"))
        val diag = splitPairs
          .join(blockedPairs, Seq("da", "db"), "left")
          .join(pairScores, Seq("da", "db"), "left")
          .withColumn("bucket",
            when(col("score").isNotNull && col("score") >= floor, lit("scored_in_band"))
              .when(col("score").isNotNull, lit("scored_sub_floor"))
              .when(col("blocked"), lit("blocked_unscored"))
              .otherwise(lit("never_blocked")))
          .groupBy("bucket").agg(org.apache.spark.sql.functions.count(lit(1)).as("n"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        splitPairs.unpersist(); bRows.unpersist(); splitDocs.unpersist()
        joinedM.unpersist(); mgAssign.unpersist()
        val mc = mgRes.counters
        auditJson +
          f""","merge_committed":{"wall_sec":$mgWall%.1f,""" +
          f""""cluster_pairs_seen":${mc.getOrElse("merge_cluster_pairs_seen", -1L)},""" +
          f""""cluster_pairs_qualified":${mc.getOrElse("merge_cluster_pairs_qualified", -1L)},""" +
          f""""vetoed_tombstone":${mc.getOrElse("merge_vetoed_tombstone", -1L)},""" +
          f""""vetoed_conflict":${mc.getOrElse("merge_vetoed_conflict", -1L)},""" +
          f""""below_evidence":${mc.getOrElse("merge_pairs_below_evidence", -1L)},""" +
          f""""below_coverage":${mc.getOrElse("merge_pairs_below_coverage", -1L)},""" +
          f""""clusters_merged":${mc.getOrElse("merge_clusters_merged", -1L)},""" +
          f""""docs_relabeled":${mc.getOrElse("merge_docs_relabeled", -1L)},""" +
          f""""pairs_promoted":${mc.getOrElse("merge_pairs_promoted", -1L)},""" +
          f""""f1_after":${mG.f1}%.6f,"precision_after":${mG.precision}%.6f,""" +
          f""""recall_after":${mG.recall}%.6f,""" +
          f""""entities_split_after":$nSplitM,"clusters_mixed_after":$nMergeM},""" +
          f""""split_tail":{"entities":$nSplitM,"cross_pairs":$nSplitPairs,""" +
          f""""never_blocked":${diag.getOrElse("never_blocked", 0L)},""" +
          f""""blocked_unscored":${diag.getOrElse("blocked_unscored", 0L)},""" +
          f""""scored_sub_floor":${diag.getOrElse("scored_sub_floor", 0L)},""" +
          f""""scored_in_band":${diag.getOrElse("scored_in_band", 0L)}}"""
      } else ""

      res.release(keepAssignments = false)
      labeled.unpersist(); gold.unpersist()
      println(f"""{"docs":$nDocs,"entities":$entities,"head_entity_docs":$head,""" +
        f""""wall_sec":$wall%.1f,"docs_per_sec":${nDocs / wall}%.0f,""" +
        f""""f1":${m.f1}%.6f,"precision":${m.precision}%.6f,"recall":${m.recall}%.6f,""" +
        f""""cluster_equality":$eq,"entities_split":$nSplit,"clusters_mixed":$nMerge,""" +
        f""""cc_iterations":${cnt.getOrElse("cc_iterations", -1L)},""" +
        f""""capped_block_keys":${cnt.getOrElse("capped_block_keys", -1L)},""" +
        f""""capped_doc_rows":${cnt.getOrElse("capped_doc_rows", -1L)},""" +
        f""""gold_pairs_total":$gpTotal,"gold_pairs_blocked":$gpBlocked,""" +
        f""""gold_pairs_missed":$gpMissed,""" +
        f""""audit":{"strong":$strong,"min_side":$minSide,"wall_sec":$auditWall%.1f,""" +
        f""""bridges_cut":${ac("audit_bridges_cut")},""" +
        f""""clusters_cut":${ac("audit_clusters_cut")},""" +
        f""""docs_reassigned":${ac("audit_docs_reassigned")},""" +
        f""""clusters_over_cap":${ac("audit_clusters_over_cap")},""" +
        f""""clusters_disconnected":${ac("audit_clusters_disconnected")},""" +
        f""""f1_after":${m2.f1}%.6f,"precision_after":${m2.precision}%.6f,""" +
        f""""recall_after":${m2.recall}%.6f,""" +
        f""""entities_split_after":$nSplit2,"clusters_mixed_after":$nMerge2}$committedJson}""")
    } finally {
      spark.stop()
      new scala.reflect.io.Directory(new java.io.File(root)).deleteRecursively()
      new scala.reflect.io.Directory(new java.io.File(
        s"/dev/shm/graft-skewprobe-shuffle-${ProcessHandle.current().pid()}")).deleteRecursively()
    }
  }
}
