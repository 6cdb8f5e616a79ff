package graft.tools

import graft.ckpt.Snapshots
import graft.pipeline.EntityResolution
import graft.synth.{DocGen, GenConfig}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: reproduce the bench round-trip diff at mid scale and
  * attribute it (which docs changed cluster, what did they look like at
  * base vs after add→remove).
  */
object RmProbe {
  def main(args: Array[String]): Unit = {
    val nEnt = if (args.nonEmpty) args(0).toInt else 20000
    val spark = SparkSession.builder().master("local[16]")
      .appName("rm-probe")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val baseCfg = GenConfig(numEntities = nEnt, docsPerEntity = 3, seed = 42L)
    val addCfg = GenConfig(numEntities = math.max(nEnt / 10, 1), docsPerEntity = 3, seed = 1042L)
    val tmp = java.nio.file.Files.createTempDirectory("graft-rmprobe").toString
    val docsA = DocGen.docs(spark, baseCfg).toDF()
    val docsB = DocGen.docs(spark, addCfg).map(d => d.copy(doc_id = "n" + d.doc_id)).toDF()

    EntityResolution.run(spark, docsA, runDir = Some(tmp), runId = "base").release()
    EntityResolution.addDocuments(spark, docsB, tmp, runId = "ins")
    val rm = EntityResolution.removeDocuments(spark, docsB.select("doc_id"), tmp, runId = "rm")

    val baseAsg = Snapshots.loadSnapshot(spark, tmp, "cluster_assignments", 0L)
    println(s"rt_columns=${rm.assignments.columns.toSeq} base_columns=${baseAsg.columns.toSeq}")
    println(s"rt_rows=${rm.assignments.count()} rt_distinct_docs=${rm.assignments.select("doc_id").distinct().count()}")
    val d1 = rm.assignments.exceptAll(baseAsg)
    val d2 = baseAsg.exceptAll(rm.assignments)
    val n1 = d1.count(); val n2 = d2.count()
    println(s"ENTITIES=$nEnt diff_rt_minus_base=$n1 diff_base_minus_rt=$n2")
    if (n1 > 0) { println("sample d1 (rt minus base):"); d1.show(5, false) }
    println(s"counters=${rm.counters.toSeq.sortBy(_._1)}")
    if (n1 > 0) {
      val sample = rm.assignments.withColumnRenamed("cluster_id", "rt_cluster")
        .join(baseAsg.withColumnRenamed("cluster_id", "base_cluster"), "doc_id")
        .where(col("rt_cluster") =!= col("base_cluster"))
      println(s"docs_with_changed_cluster=${sample.count()}")
      sample.show(20, false)
    }
    spark.stop()
  }
}
