package graft.synth

import org.apache.spark.sql.SparkSession

/** Producer-side CLI: synthesize one deterministic docs corpus as a
  * single parquet FILE dropped into a directory — the upstream shape
  * `Main --ingest WATCH_DIR` consumes (the file stream source reads
  * files, not nested dirs, so the part file is moved up and the staging
  * dir removed). Doc/entity ids get `--prefix` so successive drops are
  * disjoint by construction.
  *
  * Usage: graft.synth.GenDocs --out DIR/name.parquet
  *          [--entities N] [--docs-per-entity D] [--seed S] [--prefix P]
  */
object GenDocs {
  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 1).collect {
      case Array(k, v) if k.startsWith("--") => k -> v
    }.toMap
    val out = opts.getOrElse("--out", sys.error("GenDocs: --out FILE.parquet is required"))
    val cfg = GenConfig(
      numEntities = opts.getOrElse("--entities", "50").toInt,
      docsPerEntity = opts.getOrElse("--docs-per-entity", "3").toInt,
      seed = opts.getOrElse("--seed", "600").toLong)
    val prefix = opts.getOrElse("--prefix", "w")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").appName("graft-gendocs").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val staging = out + ".staging"
    DocGen.docs(spark, cfg).map(d => d.copy(doc_id = prefix + d.doc_id))
      .toDF().coalesce(1).write.mode("overwrite").parquet(staging)
    val part = java.nio.file.Files.list(java.nio.file.Paths.get(staging))
    val src = scala.util.Using.resource(part)(_.toArray.toSeq.map(_.toString))
      .find(_.endsWith(".parquet")).getOrElse(sys.error("GenDocs: no part file written"))
    java.nio.file.Files.move(java.nio.file.Paths.get(src), java.nio.file.Paths.get(out),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    new scala.reflect.io.Directory(new java.io.File(staging)).deleteRecursively()
    println(s"""{"out":"$out","docs":${cfg.numDocs},"prefix":"$prefix"}""")
    spark.stop()
  }
}
