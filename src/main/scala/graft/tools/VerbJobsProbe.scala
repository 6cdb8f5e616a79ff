package graft.tools

import graft.pipeline.EntityResolution
import graft.synth.{DocGen, GenConfig}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import scala.collection.concurrent.TrieMap

/** Ad-hoc per-JOB attribution of the deployment-verb legs the bench times
  * (not part of the library surface): runMain graft.tools.VerbJobsProbe
  * [threads] [entities] — replays the bench's incr section verb for verb
  * (committed batch base → +10% insert increment → removal → auditRepair →
  * incremental auditRepair → mergeRepair) in one session and prints every
  * Spark job's wall, Σtask CPU, task count, and call site, grouped by
  * verb. The bench publishes one wall number per verb; this is the
  * microscope for "which of a verb's jobs is the next target".
  */
object VerbJobsProbe {
  def main(args: Array[String]): Unit = {
    val threads = if (args.nonEmpty) args(0).toInt else 32
    val entities = if (args.length > 1) args(1).toInt else 200000
    val spark = SparkSession.builder().master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads * 4)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.files.maxPartitionBytes", (16L * 1024 * 1024).toString)
    import spark.implicits._

    case class Job(var site: String = "", var start: Long = 0L, var end: Long = 0L,
                   var cpuNs: Long = 0L, var tasks: Long = 0L, var phase: String = "")
    val jobs = TrieMap.empty[Int, Job]
    val stageToJob = TrieMap.empty[Int, Int]
    @volatile var phase = "setup"
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val job = jobs.getOrElseUpdate(j.jobId, Job())
        job.start = j.time
        job.phase = phase
        job.site = Option(j.properties)
          .flatMap(p => Option(p.getProperty("callSite.short")))
          .getOrElse("?")
        j.stageIds.foreach(s => stageToJob(s) = j.jobId)
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        jobs.get(j.jobId).foreach(_.end = j.time)
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        stageToJob.get(t.stageId).flatMap(jobs.get).foreach { job =>
          if (t.taskMetrics != null) job.cpuNs += t.taskMetrics.executorCpuTime
          if (t.taskInfo != null) job.tasks += 1
        }
    })

    val root = s"/dev/shm/graft-verbjobs-${ProcessHandle.current().pid()}"
    val baseDir = s"$root/base.parquet"
    val addDir = s"$root/add.parquet"
    val runDir = s"$root/run"
    def timed[T](name: String)(f: => T): T = {
      phase = name
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[verb $name] wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    try {
      val baseCfg = GenConfig(numEntities = entities, docsPerEntity = 3, seed = 42L)
      val addCfg = baseCfg.copy(numEntities = math.max(entities / 10, 1), seed = 1042L)
      DocGen.docs(spark, baseCfg).toDF().write.mode("overwrite").parquet(baseDir)
      DocGen.docs(spark, addCfg).map(d => d.copy(doc_id = "n" + d.doc_id)).toDF()
        .write.mode("overwrite").parquet(addDir)
      timed("base") {
        val r = EntityResolution.run(spark, spark.read.parquet(baseDir),
          runDir = Some(runDir), runId = "probe-base")
        r.assignments.count(); r.release()
      }
      timed("incr") {
        val r = EntityResolution.addDocuments(spark, spark.read.parquet(addDir), runDir,
          runId = "probe-incr")
        r.assignments.count()
      }
      timed("remove") {
        val r = EntityResolution.removeDocuments(spark,
          spark.read.parquet(addDir).select("doc_id"), runDir, runId = "probe-rm")
        r.assignments.count()
      }
      timed("audit") {
        val r = EntityResolution.auditRepair(spark, runDir, runId = "probe-audit")
        r.assignments.count(); r.release()
      }
      timed("audit-incr") {
        EntityResolution.auditRepair(spark, runDir, runId = "probe-audit2",
          incremental = true)
      }
      timed("merge") {
        val r = EntityResolution.mergeRepair(spark, runDir, runId = "probe-merge")
        r.assignments.count()
      }
      phase = "done"
      val byPhase = jobs.toSeq.groupBy(_._2.phase)
      Seq("base", "incr", "remove", "audit", "audit-incr", "merge").foreach { ph =>
        val js = byPhase.getOrElse(ph, Seq.empty)
        val wall = js.map(j => j._2.end - j._2.start).sum / 1e3
        val cpu = js.map(_._2.cpuNs).sum / 1e9
        println(f"== PHASE $ph%-10s jobs=${js.size}%3d Σjobwall=$wall%7.2f s Σcpu=$cpu%7.2f s")
        js.sortBy(-_._2.cpuNs).take(12).foreach { case (id, j) =>
          println(f"   JOB $id%3d wall=${(j.end - j.start) / 1e3}%6.2f s cpu=${j.cpuNs / 1e9}%6.2f s " +
            f"tasks=${j.tasks}%4d  ${j.site}")
        }
      }
    } finally {
      spark.stop()
      new scala.reflect.io.Directory(new java.io.File(root)).deleteRecursively()
    }
  }
}
