package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timing probe (not part of the library surface):
  * runMain graft.tools.QueryProbe <queryName> [sfDir] [threads] [reps]
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val threads = if (args.length > 2) args(2).toInt else 32
    val reps = if (args.length > 3) args(3).toInt else 3
    val spark = SparkSession.builder().master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      println(f"PROBE $name rep=$i rows=$n wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
