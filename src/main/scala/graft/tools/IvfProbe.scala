package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc IVF recall-vs-probes probe (not part of the library surface):
  * runMain graft.tools.IvfProbe [sfDir] [threads] — prints recall@3 vs
  * brute force for every probe depth 1..IvfK over one trained index.
  */
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val threads = if (args.length > 1) args(1).toInt else 32
    val spark = SparkSession.builder().master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val curve = graft.queries.Corpus.ivfRecallCurve(spark, dir, 1 to graft.queries.Corpus.IvfK)
    curve.foreach { case (p, r) => println(f"IVF probes=$p recall@3=$r%.4f") }
    spark.stop()
  }
}
