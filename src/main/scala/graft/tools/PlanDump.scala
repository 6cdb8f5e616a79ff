package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan-artifact dumper (not part of the library surface):
  * runMain graft.tools.PlanDump <outDir> [sfDir] [q1,q2,...]
  * — writes `explain("formatted")` of each named query (default: all
  * registered queries) to <outDir>/<name>.txt, over the same session
  * config shape the bench uses (local[32], AQE on, 4×-cores shuffle
  * partitions), so the committed plan files match what the bench executes
  * (modulo AQE's runtime re-optimization, which `explain` cannot show
  * before execution).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val names =
      if (args.length > 2) args(2).split(",").toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus * 4)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"$name.txt"), plan)
      System.err.println(s"wrote $outDir/$name.txt")
    }
    spark.stop()
  }
}
