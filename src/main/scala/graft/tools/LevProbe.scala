package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-probe: decompose q39's cost (scratch). */
object LevProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("lang"), col("source"), substring(col("text"), 1, 64).as("head"))
    val a = d.select(col("lang"), col("source"), col("doc_id").as("doc_a"), col("head").as("head_a"))
    val b = d.select(col("lang"), col("source"), col("doc_id").as("doc_b"), col("head").as("head_b"))
    val joined = a.join(b, Seq("lang", "source"))
      .where(col("doc_a") < col("doc_b") && length(col("head_a")) > 0 && length(col("head_b")) > 0)
    def tm(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"LEVPROBE $name: ${(System.nanoTime() - t0) / 1e9}%.2f s (res=$r)")
    }
    tm("join_only")(joined.count())
    tm("join_only_again")(joined.count())
    tm("join_lenfilter")(joined.where(abs(length(col("head_a")) - length(col("head_b"))) * 10
      <= greatest(length(col("head_a")), length(col("head_b")))).count())
    tm("join_lev")(joined.select(levenshtein(col("head_a"), col("head_b")).as("l"))
      .agg(sum(col("l"))).collect()(0).getLong(0))
    tm("full_q39")(graft.queries.Trajectory.q39_lev_similarity(spark, dir).count())
    spark.stop()
  }
}
