package graft.tools

import graft.pipeline.EntityResolution
import graft.synth.{DocGen, GenConfig}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic probe: score distribution of gold same-entity vs cross-entity
  * candidate pairs on the seed-42 corpus. Documents the band-separation
  * facts the merge audit's defaults and MergeRepairSpec's thresholds rest
  * on: same-entity pairs score in [0.62, 1.0], cross-entity ≤ 0.41 — so a
  * [mergeFloor, threshold) band at or above 0.50 contains same-entity
  * evidence only.
  */
object ScoreDistProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("score-dist").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cfg = GenConfig(numEntities = 300, docsPerEntity = 3, seed = 42)
    val docs = DocGen.docs(spark, cfg).toDF().cache()
    val res = EntityResolution.run(spark, docs)
    val gold = DocGen.gold(spark, cfg).toDF()
    val ga = gold.select(col("doc_id").as("doc_id_a"), col("entity_id").as("ea"))
    val gb = gold.select(col("doc_id").as("doc_id_b"), col("entity_id").as("eb"))
    val sp = res.scoredPairs.join(ga, "doc_id_a").join(gb, "doc_id_b")
      .withColumn("same", col("ea") === col("eb"))
    sp.groupBy(col("same"), floor(col("score") * 20).as("bucket"))
      .count().orderBy("same", "bucket")
      .collect().foreach(r => println(f"same=${r.get(0)} score=[${r.getLong(1) * 0.05}%.2f) n=${r.getLong(2)}"))
    // quantiles of same-entity scores
    val qs = sp.where(col("same")).stat.approxQuantile("score",
      Array(0.0, 0.01, 0.05, 0.1, 0.25, 0.5), 0.001)
    println("same-entity score quantiles (0,1,5,10,25,50%): " + qs.mkString(", "))
    val qc = sp.where(!col("same")).stat.approxQuantile("score",
      Array(0.5, 0.9, 0.99, 1.0), 0.001)
    println("cross-entity score quantiles (50,90,99,100%): " + qc.mkString(", "))
    spark.stop()
  }
}
