package graft.pipeline

import graft.SparkSpec
import graft.ckpt.Snapshots
import graft.synth.{DocGen, GenConfig}
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Splice healing across a CHAIN of removed docs: when survivors' only
  * connectivity runs through two or more removed docs (k1–r1–r2–k2 with
  * r1 AND r2 removed), the heal candidates must bridge the removed GROUP's
  * surviving neighborhood — healing per removed doc alone would never emit
  * the (k1,k2) candidate and the cluster would silently split where a
  * batch run over the survivors keeps it whole.
  */
class ChainHealSpec extends SparkSpec {

  test("removing a 2-doc chain interior still reconnects the endpoints") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-chainheal").toString
    // entity 0 has docs d...0..d...3 (doc ids sort in entity order)
    val cfg = GenConfig(numEntities = 50, docsPerEntity = 4, seed = 7L)
    val docs = DocGen.docs(spark, cfg).toDF().cache()
    EntityResolution.run(spark, docs, runDir = Some(tmp), runId = "base").release()

    val e0 = DocGen.gold(spark, cfg).toDF()
      .where(col("entity_id") === "e000000000")
      .select("doc_id").as[String].collect().sorted
    assert(e0.length == 4)
    val Array(k1, r1, r2, k2) = e0

    // thin the committed pair set to the PATH k1–r1–r2–k2 within entity 0
    // (the committed-hot chain shape: only consecutive pairs were scored);
    // every other entity's pairs stay untouched
    val scored0 = Snapshots.loadCommitted(spark, tmp, "scored_pairs").get
    val inE0 = col("doc_id_a").isin(e0: _*) && col("doc_id_b").isin(e0: _*)
    val isPath = Seq((k1, r1), (r1, r2), (r2, k2)).map { case (a, b) =>
      col("doc_id_a") === least(lit(a), lit(b)) && col("doc_id_b") === greatest(lit(a), lit(b))
    }.reduce(_ || _)
    val thinned = scored0.where(!inE0 || isPath).localCheckpoint(true)
    val pathStrong = thinned.where(inE0 &&
      col("score") >= EntityResolution.PipelineConfig().scoreThreshold).count()
    assert(pathStrong == 3, s"path pairs must be strong (got $pathStrong of 3)")
    Snapshots.commit(spark, thinned, tmp, "scored_pairs", "thin",
      Snapshots.lastCounters(tmp, "scored_pairs"))
    // keep the simulated history in LOCKSTEP (no-op deltas on the other
    // stages, as every real verb commits) — removeDocuments now refuses
    // drift-state histories
    Seq("blocking", EntityResolution.StageBlockHot, EntityResolution.StageMediaDf,
        EntityResolution.StageDocFeatures, "cluster_assignments").foreach { s =>
      Snapshots.commitDelta(spark,
        Snapshots.loadCommitted(spark, tmp, s).get.limit(0).repartition(1), None,
        tmp, s, "thin", Snapshots.lastCounters(tmp, s),
        Snapshots.lastRows(tmp, s).getOrElse(0L))
    }

    val res = EntityResolution.removeDocuments(spark, Seq(r1, r2).toDF("doc_id"), tmp,
      runId = "rm-chain")
    // the (k1,k2) bridge must have been generated and scored...
    assert(res.counters("heal_pairs_scored") >= 1,
      s"no heal candidates generated: ${res.counters}")
    // ...and the endpoints must still share a cluster
    val cl = res.assignments.where(col("doc_id").isin(k1, k2))
      .select("cluster_id").as[String].collect().toSet
    assert(cl.size == 1, s"cluster split across the removed chain: $cl")
    docs.unpersist()
  }
}
