package graft.tools
import org.apache.spark.sql.SparkSession
import graft.queries.{Corpus, Relational, Sources, Trajectory}

/** Plan audit for the claims the docs make: pushdown/pruning (q02),
  * broadcast dims (q03), payload-free LSH band join (q20), aggregator
  * top-k without a per-query window exchange (q23), partition pruning
  * (q44), and no broadcast of token-derived tables (q35).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    println("==== q02 (expect PushedFilters + pruned ReadSchema)")
    Relational.q02_filter_project(spark, dir).explain("formatted")
    println("==== q03 (expect BroadcastHashJoin)")
    Relational.q03_join_agg(spark, dir).explain()
    println("==== q20 (expect band join WITHOUT shingle payload; one verify join per pair)")
    Corpus.q20_dedup_minhash_lsh(spark, dir).explain()
    println("==== q23 (expect ObjectHashAggregate partial_topkaggregator; NO Window over query_id)")
    Corpus.q23_embed_cosine_topk(spark, dir).explain()
    println("==== q35 (expect NO BroadcastExchange on the token-weight table)")
    Trajectory.q35_weighted_jaccard(spark, dir).explain()
    println("==== q44 (expect PartitionFilters: in(event_type, ...))")
    Sources.q44_partitioned_scan(spark, dir).explain("formatted")
    println("==== features (expect ReusedExchange on the media-token relation: one tokenization pass)")
    locally {
      import org.apache.spark.sql.functions._
      val docs = graft.synth.DocGen.docs(spark,
        graft.synth.GenConfig(numEntities = 100, docsPerEntity = 3)).toDF()
      val feats = graft.operators.PairScoring.features(docs, 300L)
      feats.count() // materialize: AQE stage reuse shows in the FINAL plan
      val plan = feats.queryExecution.executedPlan.toString
      println(if (plan.contains("ReusedExchange") || plan.contains("ReusedQueryStage"))
                "  OK: media-token exchange reused (one tokenization pass)"
              else "  MISSING ReusedExchange!\n" + plan.take(3000))
    }
    spark.stop()
  }
}
