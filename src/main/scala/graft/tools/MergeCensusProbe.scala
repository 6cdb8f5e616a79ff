package graft.tools

import graft.ckpt.Snapshots
import graft.operators.ClusterMerge
import graft.pipeline.EntityResolution
import graft.synth.{DocGen, GenConfig}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc gold-labeled merge-census probe (not part of the library
  * surface): runMain graft.tools.MergeCensusProbe [threads] [entities] [head]
  *
  * Question it answers: on the corpus where the natural split/merge tails
  * first appear (the 571k-doc power-law skew corpus), which cross-cluster
  * evidence pairs does [[ClusterMerge.census]] see, and how do the
  * TRUE-split pairs (both clusters majority-label the same gold entity)
  * separate from the junk pairs (different entities) on the census stats
  * (n_band_edges, n_witnesses, max_score, avg_score)? The answer picks the
  * qualification dial with evidence instead of taste.
  *
  * Runs the DEPLOYMENT sequence against committed snapshots — pipeline
  * commit, then the cut audit ([[EntityResolution.auditRepair]]), then the
  * census over the committed post-audit state — releasing each stage's
  * caches before the next starts, so the probe's memory footprint is one
  * stage's, not the whole sequence's (the in-memory variant holding the
  * pipeline + audit + census lineages at once OOMs a 16g driver at this
  * scale).
  */
object MergeCensusProbe {
  def main(args: Array[String]): Unit = {
    val threads = if (args.nonEmpty) args(0).toInt else 32
    val entities = if (args.length > 1) args(1).toInt else 190000
    val head = if (args.length > 2) args(2).toInt else 256
    val spark = SparkSession.builder().master(s"local[$threads]")
      .appName("graft-merge-census-probe")
      .config("spark.sql.shuffle.partitions", threads * 4)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", s"/dev/shm/graft-mergecensus-shuffle-${ProcessHandle.current().pid()}")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = s"/dev/shm/graft-mergecensus-${ProcessHandle.current().pid()}"
    try {
      val cfg = GenConfig(numEntities = entities, docsPerEntity = 3, seed = 42L)
      val corpusDir = s"$root/corpus"
      DocGen.docsSkewed(spark, cfg, head).toDF()
        .write.mode("overwrite").parquet(corpusDir)
      spark.conf.set("spark.sql.files.maxPartitionBytes", (16L * 1024 * 1024).toString)
      val docs = spark.read.parquet(corpusDir)
      val runDir = s"$root/run"
      val res = EntityResolution.run(spark, docs, runDir = Some(runDir))
      println(s"pipeline committed: ${res.assignments.count()} docs")
      res.release(keepAssignments = false)

      // cut audit against the committed run (deltas + standing tombstones)
      val ac = EntityResolution.auditRepair(spark, runDir)
      println(s"cut audit committed: bridges_cut=${ac.counters.getOrElse("audit_bridges_cut", -1L)} " +
        s"cut_pairs_removed=${ac.counters.getOrElse("audit_cut_pairs_removed", -1L)}")

      // census over the committed post-audit state — the exact relation
      // mergeRepair would read
      val assign = Snapshots.loadCommitted(spark, runDir, "cluster_assignments").get
      val pairs = Snapshots.loadCommitted(spark, runDir, "scored_pairs").get
      val ts = Snapshots.loadCommitted(spark, runDir, EntityResolution.StageAuditTombstones)
      val cen = ClusterMerge.census(assign, pairs, ts).cache()

      // gold majority entity per predicted cluster — restricted to the
      // clusters the census touches (a few hundred, not the ~390k universe)
      val gold = DocGen.goldSkewed(spark, cfg, head).toDF()
      val touched = cen.select(col("cluster_a").as("cluster_id"))
        .unionByName(cen.select(col("cluster_b").as("cluster_id"))).distinct()
      val maj = assign.join(broadcast(touched), Seq("cluster_id"), "left_semi")
        .join(gold, "doc_id")
        .groupBy("cluster_id")
        .agg(count(lit(1)).as("n_docs"),
          count_distinct(col("entity_id")).as("n_entities"),
          min(col("entity_id")).as("ent0"))
        .cache()
      maj.count()
      // majority = mode entity; clusters here are post-precision-audit so
      // n_entities is 1 except pathology — flag it rather than vote.
      val labeled = cen
        .join(maj.select(col("cluster_id").as("cluster_a"), col("ent0").as("ent_a"),
          col("n_entities").as("pure_a")), Seq("cluster_a"))
        .join(maj.select(col("cluster_id").as("cluster_b"), col("ent0").as("ent_b"),
          col("n_entities").as("pure_b")), Seq("cluster_b"))
        .withColumn("same_entity", col("ent_a") === col("ent_b"))
        .cache()

      println("=== census rows joined to gold (ALL cross-cluster evidence pairs) ===")
      labeled.orderBy(col("qualifies").desc, col("same_entity").desc,
          col("n_band_edges").desc)
        .select("same_entity", "qualifies", "n_band_edges", "n_drift_edges",
          "n_witnesses", "coverage", "max_score", "avg_score",
          "tombstone_veto", "conflict_veto",
          "docs_a", "docs_b", "pure_a", "pure_b", "cluster_a", "cluster_b")
        .show(200, truncate = false)

      println("=== summary by (same_entity, qualifies) ===")
      labeled.groupBy("same_entity", "qualifies")
        .agg(count(lit(1)).as("n"),
          min("n_band_edges").as("min_band"), max("n_band_edges").as("max_band"),
          min("n_witnesses").as("min_wit"), max("n_witnesses").as("max_wit"),
          min("coverage").as("min_cov"), max("coverage").as("max_cov"),
          min("max_score").as("min_maxscore"), max("max_score").as("max_maxscore"),
          avg("avg_score").as("mean_avgscore"))
        .orderBy("same_entity", "qualifies").show(truncate = false)

      labeled.unpersist(); maj.unpersist(); cen.unpersist()
    } finally {
      spark.stop()
      import scala.reflect.io.Directory
      new Directory(new java.io.File(root)).deleteRecursively()
      new Directory(new java.io.File(s"/dev/shm/graft-mergecensus-shuffle-${ProcessHandle.current().pid()}")).deleteRecursively()
    }
  }
}
