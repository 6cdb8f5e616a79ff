package graft.tools

import graft.operators.Blocking
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc diagnostic: which key family produces the candidate pairs, and
  * how many are same-entity (gold)? Not part of the library surface.
  */
object PairProvenance {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 100000
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val cfg = graft.synth.GenConfig(numEntities = n, docsPerEntity = 3)
    val docs = graft.synth.DocGen.docs(spark, cfg).toDF().cache()
    docs.count()
    val (blocking, c) = Blocking.block(docs)
    println("counters=" + c)
    val cands = Blocking.candidatePairs(blocking).persist()
    // family of the representative (min) key, from the famTag top bits
    val famId = shiftrightunsigned(col("block_key"), 60)
    val fam = when(famId === 1, "sn1").when(famId === 2, "sn2").when(famId === 3, "mh")
      .when(famId === 4, "md").when(famId === 5, "tk").when(famId === 6, "refined")
      .when(famId === 7, "chain").otherwise("?")
    // same entity iff doc index / docsPerEntity matches (doc_id = d%012d)
    val ent = (id: org.apache.spark.sql.Column) =>
      floor(substring(id, 2, 12).cast("long") / cfg.docsPerEntity)
    cands.groupBy(fam.as("family"))
      .agg(count(lit(1)).as("pairs"),
        sum(when(ent(col("doc_id_a")) === ent(col("doc_id_b")), 1L).otherwise(0L)).as("gold"))
      .orderBy(desc("pairs"))
      .show(20, false)
    spark.stop()
  }
}
