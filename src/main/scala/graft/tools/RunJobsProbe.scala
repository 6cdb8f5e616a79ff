package graft.tools

import graft.pipeline.EntityResolution
import graft.synth.{DocGen, GenConfig}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import scala.collection.concurrent.TrieMap

/** Ad-hoc per-JOB attribution of the full batch pipeline (not part of the
  * library surface): runMain graft.tools.RunJobsProbe [threads] [entities]
  * — writes the bench-shaped corpus once, runs [[EntityResolution.run]]
  * exactly as a scaling leg does, and prints every Spark job's wall, Σtask
  * CPU, task count, and the call site that triggered it, sorted by CPU.
  * The bench legs publish only the aggregate census; this is the
  * microscope for "which of the 44 jobs is the next target".
  */
object RunJobsProbe {
  def main(args: Array[String]): Unit = {
    val threads = if (args.nonEmpty) args(0).toInt else 4
    val entities = if (args.length > 1) args(1).toInt else 200000
    val spark = SparkSession.builder().master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // A/B toggle for join-strategy experiments (guide §3.1)
    if (sys.env.getOrElse("SPARK_GRAFT_PROBE_SHJ", "0") == "1") {
      spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
      System.err.println("[probe] preferSortMergeJoin=false")
    }
    import spark.implicits._

    val corpusDir = s"/tmp/graft-runjobs-corpus-$entities"
    if (!new java.io.File(s"$corpusDir/_SUCCESS").exists()) {
      DocGen.docs(spark, GenConfig(numEntities = entities, docsPerEntity = 3, seed = 42L))
        .toDF().write.mode("overwrite").parquet(corpusDir)
    }
    spark.conf.set("spark.sql.files.maxPartitionBytes", (16L * 1024 * 1024).toString)

    case class Job(var site: String = "", var start: Long = 0L, var end: Long = 0L,
                   var cpuNs: Long = 0L, var tasks: Long = 0L)
    case class Stg(var name: String = "", var site: String = "",
                   var cpuNs: Long = 0L, var tasks: Long = 0L,
                   var shuffleWriteB: Long = 0L, var shuffleReadB: Long = 0L)
    val jobs = TrieMap.empty[Int, Job]
    val stages = TrieMap.empty[Int, Stg]
    val stageToJob = TrieMap.empty[Int, Int]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val job = jobs.getOrElseUpdate(j.jobId, Job())
        job.start = j.time
        job.site = Option(j.properties)
          .flatMap(p => Option(p.getProperty("callSite.short")))
          .orElse(j.stageInfos.lastOption.map(si =>
            si.name + " | " + si.details.linesIterator
              .find(l => l.contains("graft.") && !l.contains("RunJobsProbe"))
              .getOrElse("").trim))
          .getOrElse("?")
        j.stageIds.foreach(s => stageToJob(s) = j.jobId)
        j.stageInfos.foreach { si =>
          val st = stages.getOrElseUpdate(si.stageId, Stg())
          st.name = si.name
          st.site = si.details.linesIterator
            .find(l => l.contains("graft.") && !l.contains("RunJobsProbe"))
            .getOrElse("").trim
        }
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        jobs.get(j.jobId).foreach(_.end = j.time)
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        stageToJob.get(t.stageId).flatMap(jobs.get).foreach { job =>
          if (t.taskMetrics != null) job.cpuNs += t.taskMetrics.executorCpuTime
          if (t.taskInfo != null) job.tasks += 1
        }
        stages.get(t.stageId).foreach { st =>
          if (t.taskMetrics != null) {
            st.cpuNs += t.taskMetrics.executorCpuTime
            st.shuffleWriteB += t.taskMetrics.shuffleWriteMetrics.bytesWritten
            st.shuffleReadB += t.taskMetrics.shuffleReadMetrics.totalBytesRead
          }
          if (t.taskInfo != null) st.tasks += 1
        }
      }
    })

    val t0 = System.nanoTime()
    val docs = spark.read.parquet(corpusDir)
    val res = EntityResolution.run(spark, docs)
    val n = res.assignments.count()
    res.release()
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"TOTAL wall=$wall%.1f s docs=$n jobs=${jobs.size}")
    jobs.toSeq.sortBy(-_._2.cpuNs).foreach { case (id, j) =>
      println(f"JOB $id%3d wall=${(j.end - j.start) / 1e3}%7.2f s cpu=${j.cpuNs / 1e9}%7.2f s " +
        f"tasks=${j.tasks}%4d  ${j.site}")
    }
    println("---- stages by cpu ----")
    stages.toSeq.sortBy(-_._2.cpuNs).take(40).foreach { case (id, s) =>
      println(f"STG $id%3d cpu=${s.cpuNs / 1e9}%7.2f s tasks=${s.tasks}%4d " +
        f"shW=${s.shuffleWriteB / 1e6}%8.1f MB shR=${s.shuffleReadB / 1e6}%8.1f MB  " +
        f"${s.name}%-28s ${s.site.take(120)}")
    }
    spark.stop()
  }
}
