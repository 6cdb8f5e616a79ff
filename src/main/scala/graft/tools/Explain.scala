package graft.tools
import org.apache.spark.sql.SparkSession
import graft.queries.{Relational, Corpus}
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
    println("==== q20 (expect WholeStageCodegen around band derivation)")
    Corpus.q20_dedup_minhash_lsh(spark, dir).explain()
    spark.stop()
  }
}
