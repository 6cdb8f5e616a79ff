package graft.tools

import graft.eval.Eval
import graft.pipeline.EntityResolution
import graft.synth.{DocGen, GenConfig}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc retraction-cost probe (not part of the library surface):
  * runMain graft.tools.RmScaleProbe [threads] [baseEntities] [fracsPct]
  *
  * Evidences removeDocuments' O(|removed| + their pairs + active
  * components) claim: ONE committed base run (batch, `baseEntities`
  * uniform entities), file-copied per leg (snapshot dirs are immutable
  * files, so a copy IS an identical committed run), then each leg removes
  * a different FRACTION of the corpus (first k entities in gold order —
  * whole entities, so active components ≈ removed entities) and reports
  * wall, per-stage counters, and surviving-gold F1/equality. If removal
  * cost is O(removed), wall grows with the fraction and stays decoupled
  * from the base wall; a hidden O(corpus) term would show as a flat,
  * base-scale wall at every fraction.
  */
object RmScaleProbe {
  def main(args: Array[String]): Unit = {
    val threads = if (args.nonEmpty) args(0).toInt else 32
    val baseEntities = if (args.length > 1) args(1).toInt else 200000
    val fracs = (if (args.length > 2) args(2) else "1,10,50")
      .split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder().master(s"local[$threads]")
      .appName("graft-rm-scale-probe")
      .config("spark.sql.shuffle.partitions", threads * 4)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = s"/dev/shm/graft-rmscale-${ProcessHandle.current().pid()}"
    def wall[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    try {
      val cfg = GenConfig(numEntities = baseEntities, docsPerEntity = 3, seed = 42L)
      val baseDir = s"$root/base"
      val (_, tBase) = wall {
        EntityResolution.run(spark, DocGen.docs(spark, cfg).toDF(),
          runDir = Some(baseDir), runId = "base").release()
      }
      System.err.println(f"[rm-scale] base ${cfg.numDocs} docs: $tBase%.1f s")
      val gold = DocGen.gold(spark, cfg).toDF().cache()
      gold.count()

      val legs = fracs.map { pct =>
        val k = baseEntities.toLong * pct / 100
        val dir = s"$root/rm$pct"
        val src = java.nio.file.Paths.get(baseDir)
        scala.util.Using.resource(java.nio.file.Files.walk(src))(_.forEach { p =>
          val dst = java.nio.file.Paths.get(dir).resolve(src.relativize(p))
          if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(dst)
          else java.nio.file.Files.copy(p, dst)
        })
        // first k entities in entity order — whole entities, docs derived
        // from gold exactly like Main --remove-entities
        val removed = gold.where(col("entity_id") < f"e$k%09d").select("doc_id").cache()
        val nRm = removed.count()
        val (res, t) = wall {
          val r = EntityResolution.removeDocuments(spark, removed, dir, runId = s"rm$pct")
          r.assignments.count() // materialize the resolved relation inside the leg
          r
        }
        val goldLeft = gold.join(removed, Seq("doc_id"), "left_anti")
        val m = Eval.pairwiseF1(res.assignments,
          EntityResolution.labeledPairs(res.blocking, goldLeft))
        val eq = Eval.clusterEquality(res.assignments, goldLeft)
        removed.unpersist()
        System.err.println(f"[rm-scale] $pct%%: removed $nRm docs in $t%.1f s " +
          f"(pairs_removed=${res.counters("pairs_removed")}, f1=${m.f1}%.6f, eq=$eq)")
        f"""{"pct":$pct,"docs_removed":$nRm,"remove_sec":$t%.1f,""" +
          f""""removed_docs_per_sec":${nRm / t}%.0f,""" +
          f""""pairs_removed":${res.counters("pairs_removed")},""" +
          f""""heal_pairs_scored":${res.counters("heal_pairs_scored")},""" +
          f""""clusters_recomputed":${res.counters("clusters_recomputed")},""" +
          f""""f1":${m.f1}%.6f,"cluster_equality":$eq}"""
      }
      println(f"""{"base_docs":${cfg.numDocs},"base_sec":$tBase%.1f,""" +
        s""""legs":[${legs.mkString(",")}]}""")
    } finally {
      spark.stop()
      new scala.reflect.io.Directory(new java.io.File(root)).deleteRecursively()
    }
  }
}
