package graft.tools

import graft.operators.ConnectedComponents
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc CC phase attribution (not part of the library surface):
  * runMain graft.tools.CcProbe [threads] [entities] — synthesizes the
  * ER-shaped edge set (one triangle per entity, doc ids "d%09d"), then
  * times each CC phase (canonical+checkpoint, signature, largeStar,
  * smallStar+distinct) separately with the task/cpu census, to attribute
  * the stage's thread-scaling CPU inflation.
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val threads = if (args.nonEmpty) args(0).toInt else 4
    val entities = if (args.length > 1) args(1).toInt else 200000
    val spark = SparkSession.builder().master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads * 4)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    val cpuNs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        if (t.taskInfo != null) taskMs.addAndGet(t.taskInfo.duration)
        if (t.taskMetrics != null) cpuNs.addAndGet(t.taskMetrics.executorCpuTime)
      }
    })
    def tm[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val m0 = taskMs.get; val c0 = cpuNs.get
      val r = f
      println(f"CCPHASE $name: ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        f"task=${(taskMs.get - m0) / 1e3}%.1f s cpu=${(cpuNs.get - c0) / 1e9}%.1f s")
      r
    }
    // one triangle per entity: (3e, 3e+1), (3e, 3e+2), (3e+1, 3e+2)
    val ids = spark.range(entities)
    val edges0 = ids.select(explode(array(
      struct(lit(0).as("a"), lit(1).as("b")),
      struct(lit(0).as("a"), lit(2).as("b")),
      struct(lit(1).as("a"), lit(2).as("b")))).as("p"), col("id"))
      .select(format_string("d%09d", col("id") * 3 + col("p.a")).as("src"),
        format_string("d%09d", col("id") * 3 + col("p.b")).as("dst"))
    val e0 = tm("canonical+ckpt") {
      val e = edges0.select(least(col("src"), col("dst")).as("src"),
        greatest(col("src"), col("dst")).as("dst"))
        .where(col("src") =!= col("dst")).distinct().localCheckpoint(true)
      e
    }
    tm("signature")(println("  n=" + e0.count()))
    val ls = tm("largeStar+ckpt")(ConnectedComponents.largeStar(e0).localCheckpoint(true))
    tm("ls count")(println("  ls=" + ls.count()))
    val ss = tm("smallStar+ckpt")(ConnectedComponents.smallStar(ls).localCheckpoint(true))
    tm("ss count")(println("  ss=" + ss.count()))
    val ls2 = tm("largeStar2+ckpt")(ConnectedComponents.largeStar(ss).localCheckpoint(true))
    val ss2 = tm("smallStar2+ckpt")(ConnectedComponents.smallStar(ls2).localCheckpoint(true))
    tm("ss2 count")(println("  ss2=" + ss2.count()))
    // the SAME phases over dictionary-encoded dense LONG node ids — the
    // round-5 loop representation; the string phases above are the
    // round-4 representation kept for the inflation comparison
    val e0L = tm("encodeLong+ckpt") {
      val idsL = e0.select(col("src").as("node")).union(e0.select(col("dst").as("node"))).distinct()
      import spark.implicits._
      val dict = idsL.orderBy("node").rdd.map(_.getString(0)).zipWithIndex.toDF("node", "nid")
        .localCheckpoint(true)
      e0.join(broadcast(dict).select(col("node").as("src"), col("nid").as("srcL")), "src")
        .join(broadcast(dict).select(col("node").as("dst"), col("nid").as("dstL")), "dst")
        .select(col("srcL").as("src"), col("dstL").as("dst")).localCheckpoint(true)
    }
    tm("e0L count")(println("  nL=" + e0L.count()))
    val lsL = tm("largeStarL+ckpt")(ConnectedComponents.largeStar(e0L).localCheckpoint(true))
    tm("lsL count")(println("  lsL=" + lsL.count()))
    val ssL = tm("smallStarL+ckpt")(ConnectedComponents.smallStar(lsL).localCheckpoint(true))
    tm("ssL count")(println("  ssL=" + ssL.count()))
    // the real loop end-to-end for reference
    val (assign, iters) = tm("full runLoop")(ConnectedComponents.assignAll(
      spark, edges0.select(col("src").as("doc_id")).distinct(), edges0))
    tm("assign count")(println("  rows=" + assign.count() + " iters=" + iters))
    spark.stop()
  }
}
