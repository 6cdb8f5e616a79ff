package graft.tools

import graft.pipeline.EntityResolution
import graft.synth.{DocGen, GenConfig}
import org.apache.spark.sql.SparkSession

/** Ad-hoc insert-increment FRACTION sweep (not part of the library
  * surface; the RmScaleProbe twin the round-5 verdict asked for):
  * runMain graft.tools.IncrScaleProbe [threads] [baseEntities]
  *
  * One committed 3·baseEntities-doc batch base; each sweep point
  * file-copies the base run dir (identical committed history) and times
  * ONE insert increment of +0.1% / +1% / +10% new entities. Reports wall
  * and added-docs/s per point — the evidence that increment cost scales
  * with the DELTA (sublinear like removal's RmScaleProbe table), and
  * whether a small arrival batch pays the +10% point's fixed floor.
  */
object IncrScaleProbe {
  def main(args: Array[String]): Unit = {
    val threads = if (args.nonEmpty) args(0).toInt else 32
    val entities = if (args.length > 1) args(1).toInt else 200000
    val spark = SparkSession.builder().master(s"local[$threads]")
      .appName("graft-incr-scale-probe")
      .config("spark.sql.shuffle.partitions", threads * 4)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", s"/dev/shm/graft-incrscale-tmp-${ProcessHandle.current().pid()}")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.files.maxPartitionBytes", (16L * 1024 * 1024).toString)
    import spark.implicits._

    val root = s"/dev/shm/graft-incrscale-${ProcessHandle.current().pid()}"
    def copyDir(src: String, dst: String): Unit = {
      val s = java.nio.file.Paths.get(src)
      scala.util.Using.resource(java.nio.file.Files.walk(s))(_.forEach { p =>
        val d = java.nio.file.Paths.get(dst).resolve(s.relativize(p))
        if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(d)
        else java.nio.file.Files.copy(p, d)
      })
    }
    try {
      val baseCfg = GenConfig(numEntities = entities, docsPerEntity = 3, seed = 42L)
      val baseP = s"$root/base.parquet"
      DocGen.docs(spark, baseCfg).toDF().write.parquet(baseP)
      val baseDir = s"$root/run-base"
      val t0 = System.nanoTime()
      EntityResolution.run(spark, spark.read.parquet(baseP),
        runDir = Some(baseDir), runId = "base").release()
      val tBase = (System.nanoTime() - t0) / 1e9
      val fracs = Seq(0.001, 0.01, 0.1)
      val points = fracs.zipWithIndex.map { case (f, i) =>
        val addEntities = math.max((entities * f).toInt, 1)
        val addP = s"$root/add$i.parquet"
        DocGen.docs(spark, GenConfig(numEntities = addEntities, docsPerEntity = 3,
          seed = 9000L + i)).map(d => d.copy(doc_id = s"f$i" + d.doc_id)).toDF()
          .write.parquet(addP)
        val dir = s"$root/run$i"
        copyDir(baseDir, dir)
        val t1 = System.nanoTime()
        val r = EntityResolution.addDocuments(spark, spark.read.parquet(addP), dir,
          runId = s"sweep$i")
        val n = r.assignments.count()
        val w = (System.nanoTime() - t1) / 1e9
        val nAdd = addEntities.toLong * 3
        System.err.println(f"[incr-scale] +${f * 100}%.1f%% ($nAdd docs): $w%.1f s")
        (f, nAdd, w, n)
      }
      val pts = points.map { case (f, nAdd, w, _) =>
        f"""{"frac":$f,"docs_added":$nAdd,"incr_sec":$w%.3f,"added_docs_per_sec":${nAdd / w}%.1f}"""
      }.mkString(",")
      println(s"""{"base_docs":${entities.toLong * 3},"base_sec":$tBase,"points":[$pts]}""")
    } finally {
      spark.stop()
      new scala.reflect.io.Directory(new java.io.File(root)).deleteRecursively()
      new scala.reflect.io.Directory(new java.io.File(
        s"/dev/shm/graft-incrscale-tmp-${ProcessHandle.current().pid()}")).deleteRecursively()
    }
  }
}
