package graft.queries

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source-side operators of SURVEY.md §2.1 exercised as oracle-checked
  * queries: partition-restricted scans (S2), SQL over temp views with a
  * dynamically built predicate (S4), and schema'd CSV ingestion (S1).
  * Derived inputs (a partitioned copy of `events`, a CSV copy of `nation`)
  * are materialized ONCE per (SF, JVM) under /tmp — deterministic content,
  * idempotent creation — because the driver's testdata directory is
  * read-only.
  */
object Sources {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  private def sfTag(dir: String): String =
    new java.io.File(dir).getName.replaceAll("[^a-zA-Z0-9.]", "_")

  /** Write `df` to `path` once per SOURCE VERSION: the marker records a
    * (name, length, mtime) signature of the source parquet files, so a
    * regenerated testdata directory invalidates the derived copy instead
    * of silently serving stale data. Safe to call from every query
    * invocation.
    */
  private def materializeOnce(srcDir: String, srcTable: String, path: String, marker: String)(
      write: String => Unit): Unit =
    synchronized {
      val src = new java.io.File(s"$srcDir/$srcTable.parquet")
      val parts = Option(if (src.isDirectory) src.listFiles() else Array(src)).getOrElse(Array.empty)
      val sig = parts.sortBy(_.getName)
        .map(f => s"${f.getName}:${f.length}:${f.lastModified}").mkString("\n")
      val m = Paths.get(marker)
      // the data dir must ALSO exist: a selective tmp-cleaner can wipe the
      // derived dataset while leaving the marker, which would otherwise
      // skip the rewrite forever
      if (!Files.exists(m) || Files.readString(m) != sig || !Files.exists(Paths.get(path))) {
        write(path)
        Files.createDirectories(m.getParent)
        Files.writeString(m, sig)
      }
    }

  /** S2: partition-restricted scan (reference: path-glob input selection,
    * AMPI.scala:72 `part-000[0-6]*`). `events` is rewritten partitioned by
    * event_type; the query filters on the partition column, so the scan
    * reads only the matching directories — `.explain` shows the predicate
    * under PartitionFilters, not PushedFilters, and non-matching partitions
    * are never opened. At 100 TB partition pruning is the first and
    * cheapest 100× saver a user reaches for.
    */
  def q44_partitioned_scan(spark: SparkSession, dir: String): DataFrame = {
    val base = s"/tmp/graft-derived/${sfTag(dir)}/events_by_type"
    materializeOnce(dir, "events", base, s"$base._READY") { p =>
      t(spark, dir, "events").write.mode("overwrite").partitionBy("event_type").parquet(p)
    }
    spark.read.parquet(base)
      .where(col("event_type").isin("click", "view"))
      .groupBy(col("event_type"), hour(col("ts")).cast("bigint").as("hour"))
      .agg(count(lit(1)).as("n"),
        (sum(col("value").cast("decimal(18,2)")) * 100).cast("bigint").as("value_cents"))
  }

  /** S4: SQL over a temp view + dynamic membership predicate (reference:
    * createOrReplaceTempView + string-built `where mac in (...)`,
    * ReadParquet.scala:18-21 / PersonalMacInfo.scala:24-41). The id list is
    * collected driver-side (3 rows — a dimension, the legitimate collect)
    * and inlined into the SQL text exactly as the reference does.
    */
  def q45_sql_view(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "events").createOrReplaceTempView("events_v")
    val top = spark.sql(
      """SELECT event_type FROM events_v
        |GROUP BY event_type ORDER BY COUNT(*) DESC, event_type ASC LIMIT 3""".stripMargin)
      .collect().map(_.getString(0))
    // SQL-escape embedded quotes: the values are data, not trusted SQL text
    val inList = top.map(s => s"'${s.replace("'", "''")}'").mkString(", ")
    spark.sql(
      s"""SELECT user_id, event_type, COUNT(*) AS n,
         |  CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS value_cents
         |FROM events_v WHERE event_type IN ($inList)
         |GROUP BY user_id, event_type""".stripMargin)
  }

  /** S1: schema'd CSV scan (reference: sc.textFile + positional split of
    * every input, e.g. Model.scala:69-80 — upgraded to an explicit
    * StructType so types are declared, not guessed). `nation` is written to
    * CSV once, then read back with the declared schema and projected.
    */
  def q46_csv_scan(spark: SparkSession, dir: String): DataFrame = {
    val base = s"/tmp/graft-derived/${sfTag(dir)}/nation_csv"
    materializeOnce(dir, "nation", base, s"$base._READY") { p =>
      t(spark, dir, "nation")
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
        .write.mode("overwrite").option("header", "false").csv(p)
    }
    val schema = StructType(Seq(
      StructField("n_nationkey", LongType),
      StructField("n_name", StringType),
      StructField("n_regionkey", LongType)))
    spark.read.schema(schema).csv(base)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
  }
}
