package graft.tools

import graft.pipeline.EntityResolution
import graft.streaming.StreamingIngest
import graft.synth.{DocGen, GenConfig}
import graft.eval.Eval
import org.apache.spark.sql.SparkSession

/** Ad-hoc arrival-pattern probe (not part of the library surface):
  * runMain graft.tools.IncrChainProbe [threads] [baseEntities]
  *   [chunkEntities] [chunks]
  *
  * Measures the SAME +N% of new docs arriving two ways against one
  * committed base run (the base is batch-run once, then the run dir is
  * file-copied so both arrival paths extend an identical base):
  *  - CHAINED: `chunks` micro-batches of `chunkEntities` each through
  *    StreamingIngest.ingestBatch (insert mode, compaction at the
  *    default cadence) — the streaming deployment pattern;
  *  - ONE-SHOT: a single insert increment of all chunks at once — the
  *    nightly-drop pattern.
  * Reports wall per link, totals, and the combined-gold F1 of BOTH end
  * states (they may legitimately differ in work done — chained pays
  * per-batch fixed costs, one-shot builds bigger intermediates — but
  * neither may drift from gold).
  */
object IncrChainProbe {
  def main(args: Array[String]): Unit = {
    val threads = if (args.nonEmpty) args(0).toInt else 32
    val baseEntities = if (args.length > 1) args(1).toInt else 200000
    val chunkEntities = if (args.length > 2) args(2).toInt else 4000
    val chunks = if (args.length > 3) args(3).toInt else 5
    val spark = SparkSession.builder().master(s"local[$threads]")
      .appName("graft-incr-chain-probe")
      .config("spark.sql.shuffle.partitions", threads * 4)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val root = s"/dev/shm/graft-incrprobe-${ProcessHandle.current().pid()}"
    val dirChain = s"$root/chain"
    val dirShot = s"$root/oneshot"
    def wall[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    try {
      val baseCfg = GenConfig(numEntities = baseEntities, docsPerEntity = 3, seed = 42L)
      val chunkCfgs = (1 to chunks).map(i =>
        GenConfig(numEntities = chunkEntities, docsPerEntity = 3, seed = 5200L + i))
      // pre-write every corpus so no leg times generation
      val baseP = s"$root/base.parquet"
      DocGen.docs(spark, baseCfg).toDF().write.parquet(baseP)
      val chunkPs = chunkCfgs.zipWithIndex.map { case (c, i) =>
        val p = s"$root/chunk$i.parquet"
        DocGen.docs(spark, c).map(d => d.copy(doc_id = s"c$i" + d.doc_id)).toDF()
          .write.parquet(p)
        p
      }
      val (_, tBase) = wall {
        EntityResolution.run(spark, spark.read.parquet(baseP),
          runDir = Some(dirChain), runId = "base").release()
      }
      // identical committed base for the one-shot path: snapshot dirs are
      // plain immutable files, so a file copy IS a second committed run
      val src = java.nio.file.Paths.get(dirChain)
      scala.util.Using.resource(java.nio.file.Files.walk(src))(_.forEach { p =>
        val dst = java.nio.file.Paths.get(dirShot).resolve(src.relativize(p))
        if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(dst)
        else java.nio.file.Files.copy(p, dst)
      })

      val linkWalls = chunkPs.zipWithIndex.map { case (p, i) =>
        val (_, t) = wall {
          StreamingIngest.ingestBatch(spark, spark.read.parquet(p), dirChain, batchId = i.toLong)
        }
        System.err.println(f"[probe] chain link $i: $t%.1f s")
        t
      }
      val (_, tShot) = wall {
        EntityResolution.addDocuments(spark,
          chunkPs.map(spark.read.parquet(_)).reduce(_ unionByName _), dirShot,
          runId = "oneshot").release()
      }

      val gold = chunkCfgs.zipWithIndex.foldLeft(DocGen.gold(spark, baseCfg).toDF()) {
        case (g, (c, i)) => g.unionByName(DocGen.gold(spark, c)
          .map(x => x.copy(doc_id = s"c$i" + x.doc_id, entity_id = s"c$i" + x.entity_id)).toDF())
      }
      def f1Of(dir: String): Double = {
        val a = graft.ckpt.Snapshots.loadCommitted(spark, dir, "cluster_assignments").get
        val b = graft.ckpt.Snapshots.loadCommitted(spark, dir, "blocking").get
        Eval.pairwiseF1(a, EntityResolution.labeledPairs(b, gold)).f1
      }
      val nAdd = chunks.toLong * chunkEntities * 3
      println(f"""{"base_docs":${baseCfg.numDocs},"added_docs":$nAdd,"chunks":$chunks,""" +
        f""""base_sec":$tBase%.1f,"chain_link_secs":[${linkWalls.map(t => f"$t%.1f").mkString(",")}],""" +
        f""""chain_total_sec":${linkWalls.sum}%.1f,"oneshot_sec":$tShot%.1f,""" +
        f""""chain_docs_per_sec":${nAdd / linkWalls.sum}%.0f,"oneshot_docs_per_sec":${nAdd / tShot}%.0f,""" +
        f""""f1_chain":${f1Of(dirChain)}%.6f,"f1_oneshot":${f1Of(dirShot)}%.6f,""" +
        f""""chain_depth_end":${graft.ckpt.Snapshots.chainDepth(dirChain, "cluster_assignments")}}""")
    } finally {
      spark.stop()
      new scala.reflect.io.Directory(new java.io.File(root)).deleteRecursively()
    }
  }
}
