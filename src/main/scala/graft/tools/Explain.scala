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
    println("==== features (expect the exploded media-token relation CACHED: both its")
    println("     consumers read InMemoryTableScan, i.e. one tokenization pass per run)")
    locally {
      val docs = graft.synth.DocGen.docs(spark,
        graft.synth.GenConfig(numEntities = 100, docsPerEntity = 3)).toDF()
      val f = graft.operators.PairScoring.features(docs, 300L)
      val plan = f.feats.queryExecution.executedPlan.toString
      val scans = "InMemoryTableScan".r.findAllIn(plan).length
      println(if (scans >= 2) s"  OK: $scans InMemoryTableScans of the shared media-token relation"
              else s"  MISSING shared cache (found $scans InMemoryTableScans)!\n" + plan.take(3000))
      f.release()
    }
    println("==== scoring (expect ONE ScorePairExpression.score call in the generated")
    println("     code: the 6 struct-field extractions must share a single kernel")
    println("     evaluation via ProjectExec subexpression elimination)")
    locally {
      import org.apache.spark.sql.execution.WholeStageCodegenExec
      // AQE off for the INSPECTION only: AdaptiveSparkPlanExec does not
      // expose its inner plan to collect() before execution
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val docs = graft.synth.DocGen.docs(spark,
        graft.synth.GenConfig(numEntities = 60, docsPerEntity = 3)).toDF()
      val toked = graft.operators.Blocking.tokenized(docs)
      val (blocking, _) = graft.operators.Blocking.blockTokenized(toked, 12, 4, 64, 0)
      val cands = graft.operators.Blocking.candidatePairs(blocking)
      val f = graft.operators.PairScoring.featuresTokenized(toked, 180L,
        persistMedia = false)
      val scored = graft.operators.PairScoring.scoreFeatures(spark, f.feats, cands)
      val calls = scored.queryExecution.executedPlan.collect {
        case w: WholeStageCodegenExec =>
          "ScorePairExpression\\.score\\(".r.findAllIn(w.doCodeGen()._2.body).length
      }
      val spans = calls.count(_ > 0)
      println(
        if (calls.sum == 1 && spans == 1)
          "  OK: exactly ONE ScorePairExpression.score call, inside one WholeStageCodegen span"
        else s"  UNEXPECTED: score-call counts per codegen span = $calls " +
          "(duplicated kernel evaluation or codegen fallback!)")
      blocking.unpersist()
    }
    spark.stop()
  }
}
