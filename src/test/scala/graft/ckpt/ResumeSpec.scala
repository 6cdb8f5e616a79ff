package graft.ckpt

import graft.SparkSpec
import graft.pipeline.EntityResolution
import graft.synth.{DocGen, GenConfig}
import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** Resume gate (FIXTURES.md §6): with stages `blocking` and `scored_pairs`
  * committed and `cluster_assignments` absent, a resumed run must reuse the
  * first two byte-identically and produce clusters equal to an
  * uninterrupted run.
  */
class ResumeSpec extends SparkSpec {

  private val cfg = GenConfig(numEntities = 40, docsPerEntity = 3, seed = 7L)

  private def rmStage(dir: String, stage: String): Unit = {
    val p = Path.of(dir, stage)
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(Files.delete)
  }

  test("pipeline resumes from last committed snapshot") {
    val docs = DocGen.docs(spark, cfg).toDF().cache()
    val tmp = Files.createTempDirectory("graft-resume").toString

    // uninterrupted run with checkpoints
    val full = EntityResolution.run(spark, docs, runDir = Some(tmp), runId = "r1")
    val fullAssign = full.assignments.collect().map(r => (r.getString(0), r.getString(1))).sorted

    // simulate a crash after scoring: drop only the clustering snapshot
    rmStage(tmp, "cluster_assignments")
    assert(Snapshots.lastCommitted(tmp, "blocking").isDefined)
    assert(Snapshots.lastCommitted(tmp, "scored_pairs").isDefined)
    assert(Snapshots.lastCommitted(tmp, "cluster_assignments").isEmpty)

    val blockingBytes = Files.walk(Path.of(tmp, "blocking")).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet")).map(Files.size).toVector

    val resumed = EntityResolution.run(spark, docs, runDir = Some(tmp), runId = "r2", resume = true)
    val resumedAssign = resumed.assignments.collect().map(r => (r.getString(0), r.getString(1))).sorted
    assert(resumedAssign.toSeq == fullAssign.toSeq, "resumed clusters differ from uninterrupted run")
    assert(resumed.counters.contains("blocking_resumed"), "blocking stage was recomputed")
    assert(resumed.counters.contains("scored_pairs_resumed"), "scoring stage was recomputed")

    // committed snapshots untouched (byte-identical reuse)
    val blockingBytesAfter = Files.walk(Path.of(tmp, "blocking")).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet")).map(Files.size).toVector
    assert(blockingBytesAfter == blockingBytes)

    // lineage rows present for every committed stage
    val lin = Snapshots.lineage(spark, tmp).get
    val stages = lin.select("stage").distinct().collect().map(_.getString(0)).toSet
    assert(stages == Set("blocking", "scored_pairs", "cluster_assignments"))
    assert(lin.where("rows_out < 0").isEmpty)
  }
}
