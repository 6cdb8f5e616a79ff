package graft.tools

import graft.functions.CorpusExpr
import graft.operators.{Blocking, ConnectedComponents, PairScoring}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage timing for the ER-as-query path (not part of the library
  * surface; kept for perf work).
  */
object TimeStages {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val threads = if (args.length > 1) args(1).toInt else 8
    val spark = SparkSession.builder().master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads * 2)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_ADVISORY", "64m"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    val cpuNs = new java.util.concurrent.atomic.AtomicLong
    val gcMs = new java.util.concurrent.atomic.AtomicLong
    val spillB = new java.util.concurrent.atomic.AtomicLong
    val shufWriteNs = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        if (t.taskInfo != null) { taskMs.addAndGet(t.taskInfo.duration); tasks.incrementAndGet() }
        if (t.taskMetrics != null) {
          cpuNs.addAndGet(t.taskMetrics.executorCpuTime)
          gcMs.addAndGet(t.taskMetrics.jvmGCTime)
          spillB.addAndGet(t.taskMetrics.memoryBytesSpilled)
          shufWriteNs.addAndGet(t.taskMetrics.shuffleWriteMetrics.writeTime)
        }
      }
    })
    def tm[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val m0 = taskMs.get; val c0 = cpuNs.get
      val g0 = gcMs.get; val s0 = spillB.get; val w0 = shufWriteNs.get; val k0 = tasks.get
      val r = f
      println(f"STAGE $name: ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        f"task=${(taskMs.get - m0) / 1e3}%.1f s cpu=${(cpuNs.get - c0) / 1e9}%.1f s " +
        f"gc=${(gcMs.get - g0) / 1e3}%.1f s spill=${(spillB.get - s0) / 1e6}%.0f MB " +
        f"shufWrite=${(shufWriteNs.get - w0) / 1e9}%.1f s tasks=${tasks.get - k0}")
      r
    }
    val toks = CorpusExpr.tokens(col("text"))
    val spans = transform(toks, (tk, i) =>
      struct(lit("text").as("kind"), tk.as("text"), lit("").as("media_ref"), i.cast("int").as("offset")))
    val docsDf = (if (dir.startsWith("synth:")) {
      val n = dir.stripPrefix("synth:").toInt
      graft.synth.DocGen.docs(spark, graft.synth.GenConfig(numEntities = n, docsPerEntity = 3)).toDF()
    } else spark.read.parquet(s"$dir/documents.parquet")
      .select(format_string("d%09d", col("doc_id")).as("doc_id"), spans.as("spans"))).cache()
    val synth = dir.startsWith("synth:")
    tm("materialize docs")(docsDf.count())
    tm("keyedDocs only")(println("  keyed rows=" +
      Blocking.keyedDocs(Blocking.tokenized(docsDf), 16, 3, 0).count()))
    val (blocking, c) = tm("block build")(
      if (synth) Blocking.block(docsDf) else Blocking.block(docsDf, 12, 3, 1000, 0))
    blocking.persist()
    tm("block materialize")(println("  block rows=" + blocking.count() + " counters=" + c))
    val cands = Blocking.candidatePairs(blocking).persist()
    tm("candidates")(println("  cand pairs=" + cands.count()))
    val nDocs = docsDf.count()
    val scored = tm("score")({
      val s = PairScoring.score(spark, docsDf, cands, nDocs,
        if (synth) PairScoring.ScoreConfig() else PairScoring.ScoreConfig(gammaText = 1.0)).toDF().persist()
      println("  scored=" + s.count())
      s
    })
    val edges = scored.where(col("score") >= (if (synth) 0.60 else 0.80))
      .select(col("doc_id_a").as("src"), col("doc_id_b").as("dst"))
    tm("edges")(println("  edges=" + edges.count()))
    val (assign, iters) = tm("cc")(ConnectedComponents.assignAll(spark, docsDf.select("doc_id"), edges))
    tm("assign materialize")(println("  rows=" + assign.count() + " iters=" + iters))
    spark.stop()
  }
}
