package graft.streaming

import graft.SparkSpec
import graft.ckpt.Snapshots
import graft.eval.Eval
import graft.model.Doc
import graft.pipeline.EntityResolution
import graft.synth.{DocGen, GenConfig}
import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming ingestion (StreamingIngest): micro-batches land as
  * insert-mode increments with per-stage delta snapshots; replayed
  * batches are skipped by the run_id certificate; compaction cadence
  * keys on chain depth; an interrupted increment fails loud and repair
  * restores the consistent floor.
  */
class StreamingIngestSpec extends SparkSpec {

  private def docsOf(cfg: GenConfig, prefix: String): Seq[Doc] = {
    import spark.implicits._
    DocGen.docs(spark, cfg).map(d => d.copy(doc_id = prefix + d.doc_id)).collect().toSeq
  }

  private def goldOf(cfg: GenConfig, prefix: String) = {
    import spark.implicits._
    DocGen.gold(spark, cfg)
      .map(g => g.copy(doc_id = prefix + g.doc_id, entity_id = prefix + g.entity_id)).toDF()
  }

  test("micro-batches ingest as increments: gold-exact, snapshot-per-batch, replay skipped") {
    import spark.implicits._
    val cfgA = GenConfig(numEntities = 60, docsPerEntity = 3, seed = 42L)
    val cfgB = GenConfig(numEntities = 20, docsPerEntity = 3, seed = 520L)
    val cfgC = GenConfig(numEntities = 20, docsPerEntity = 3, seed = 521L)
    val tmp = Files.createTempDirectory("graft-stream").toString
    EntityResolution.run(spark, DocGen.docs(spark, cfgA).toDF(),
      runDir = Some(tmp), runId = "base").release()

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[Doc]
    val q = StreamingIngest.start(spark, source.toDF(), tmp,
      compactEvery = 0, trigger = Trigger.ProcessingTime(0),
      checkpointLocation = Some(s"$tmp/_ckpt"))
    try {
      source.addData(docsOf(cfgB, "s1"))
      q.processAllAvailable()
      assert(Snapshots.lastCommitted(tmp, "cluster_assignments").contains(1L))
      source.addData(docsOf(cfgC, "s2"))
      q.processAllAvailable()
      assert(Snapshots.lastCommitted(tmp, "cluster_assignments").contains(2L))
    } finally q.stop()

    // every stage advanced in lockstep; both increments are deltas
    StreamingIngest.Stages.foreach(s =>
      assert(Snapshots.lastCommitted(tmp, s).contains(2L), s"stage $s not at snapshot 2"))
    assert(Snapshots.chainDepth(tmp, "cluster_assignments") == 2)

    // gold-exact over base ∪ both batches
    val gold = goldOf(cfgA, "").unionByName(goldOf(cfgB, "s1")).unionByName(goldOf(cfgC, "s2"))
    val assignments = Snapshots.loadCommitted(spark, tmp, "cluster_assignments").get
    assert(Eval.clusterEquality(assignments, gold), "streamed clusters != gold")
    assert(assignments.count() == cfgA.numDocs + cfgB.numDocs + cfgC.numDocs)

    // exactly-once: replaying a committed batchId is a skip, not a failure
    // (and not a duplicate increment) — even with a non-empty batch
    val replay = docsOf(cfgC, "s2").toDF()
    assert(StreamingIngest.ingestBatch(spark, replay, tmp, batchId = 1L) ==
      StreamingIngest.Skipped)
    assert(Snapshots.lastCommitted(tmp, "cluster_assignments").contains(2L))
  }

  test("compaction cadence: chain depth triggers a full-snapshot rewrite, relations unchanged") {
    import spark.implicits._
    val cfgA = GenConfig(numEntities = 40, docsPerEntity = 3, seed = 7L)
    val cfgB = GenConfig(numEntities = 15, docsPerEntity = 3, seed = 77L)
    val tmp = Files.createTempDirectory("graft-stream-cmp").toString
    EntityResolution.run(spark, DocGen.docs(spark, cfgA).toDF(),
      runDir = Some(tmp), runId = "base").release()

    val out = StreamingIngest.ingestBatch(spark, docsOf(cfgB, "s1").toDF(), tmp,
      batchId = 0L, compactEvery = 1)
    assert(out.asInstanceOf[StreamingIngest.Ingested].compacted)
    // delta (id 1) + compaction (id 2); the latest snapshot is FULL again
    assert(Snapshots.lastCommitted(tmp, "cluster_assignments").contains(2L))
    assert(Snapshots.chainDepth(tmp, "cluster_assignments") == 0)
    // compaction changed storage, not the relation
    val pre = Snapshots.loadSnapshot(spark, tmp, "cluster_assignments", 1L)
    val post = Snapshots.loadSnapshot(spark, tmp, "cluster_assignments", 2L)
    assert(pre.exceptAll(post).isEmpty && post.exceptAll(pre).isEmpty)
  }

  test("interrupted increment: unequal stage ids fail loud; repair trims to the common floor") {
    import spark.implicits._
    val cfgA = GenConfig(numEntities = 40, docsPerEntity = 3, seed = 9L)
    val tmp = Files.createTempDirectory("graft-stream-rep").toString
    EntityResolution.run(spark, DocGen.docs(spark, cfgA).toDF(),
      runDir = Some(tmp), runId = "base").release()

    // simulate a crash mid-increment: blocking committed its delta,
    // clustering never did
    val oneRow = Snapshots.loadCommitted(spark, tmp, "blocking").get.limit(1)
    Snapshots.commitDelta(spark, oneRow, None, tmp, "blocking", "stream-0",
      Map.empty, resolvedRows = 1L)
    val e = intercept[RuntimeException](StreamingIngest.ingestBatch(
      spark, DocGen.docs(spark, cfgA).toDF(), tmp, batchId = 0L))
    assert(e.getMessage.contains("repair"))

    assert(StreamingIngest.repair(tmp) == 0L)
    StreamingIngest.Stages.foreach(s =>
      assert(Snapshots.lastCommitted(tmp, s).contains(0L), s"stage $s not trimmed to 0"))
    // the run is whole again: the batch replays cleanly
    val cfgB = GenConfig(numEntities = 10, docsPerEntity = 3, seed = 99L)
    val out = StreamingIngest.ingestBatch(spark, docsOf(cfgB, "s1").toDF(), tmp, batchId = 0L)
    assert(out.isInstanceOf[StreamingIngest.Ingested])
    val gold = goldOf(cfgA, "").unionByName(goldOf(cfgB, "s1"))
    assert(Eval.clusterEquality(
      Snapshots.loadCommitted(spark, tmp, "cluster_assignments").get, gold))
  }
}
