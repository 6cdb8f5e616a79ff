package graft.ckpt

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Iceberg-style snapshot/lineage layer over Parquet.
  *
  * No Iceberg runtime jar ships in /opt/spark/jars (offline resolution), so
  * this implements the snapshot semantics the north rule actually uses —
  * atomic commit, per-partition lineage rows + counters, resume from the
  * last committed snapshot — behind a small interface; an Iceberg catalog
  * drops in behind the same calls when available (SURVEY.md §7.4).
  *
  * Layout: <runDir>/<stage>/snapshot=<id>/data/      (parquet files)
  *         <runDir>/<stage>/snapshot=<id>/lineage/   (parquet files)
  *         <runDir>/<stage>/snapshot=<id>/_COMMITTED (atomic marker)
  *
  * Reference analogue of lineage counters: LongAccumulator side channels
  * printed at job end (APCompletion.scala:210-258) — upgraded to durable
  * per-partition rows committed WITH the data they describe.
  */
object Snapshots {

  /** Snapshot FORMAT version, recorded in every manifest and checked on
    * read: a resume/audit against a snapshot written by an incompatible
    * layout fails with an explicit error instead of a downstream schema
    * mismatch. History: v1 (unversioned, rounds 1–2) = lineage column
    * `partition_id`, ScoredPair without media_usable/vetoed; v2 (round 3+)
    * = lineage `read_partition_id`, 9-column ScoredPair.
    */
  val FormatVersion = 2

  final case class Committed(stage: String, snapshotId: Long, path: String, rows: Long)

  final class IncompatibleSnapshotException(msg: String) extends RuntimeException(msg)

  private def stageDir(runDir: String, stage: String) = s"$runDir/$stage"

  /** All COMMITTED snapshot ids of a stage, ascending — the time-ordered
    * snapshot log (each commit is monotone, so id order = commit order).
    */
  def snapshots(runDir: String, stage: String): Seq[Long] = {
    val d = Paths.get(stageDir(runDir, stage))
    if (!Files.isDirectory(d)) return Seq.empty
    // Files.list holds a directory fd until closed — close it or a
    // long-lived resume/audit session leaks one fd per call
    val entries = scala.util.Using.resource(Files.list(d))(_.toArray.toSeq.map(_.toString))
    entries.flatMap { p =>
      val name = Paths.get(p).getFileName.toString
      if (name.startsWith("snapshot=") && Files.exists(Paths.get(p, "_COMMITTED")))
        Some(name.stripPrefix("snapshot=").toLong)
      else None
    }.sorted
  }

  /** Latest committed snapshot id for a stage, if any. */
  def lastCommitted(runDir: String, stage: String): Option[Long] =
    snapshots(runDir, stage).lastOption

  /** Atomically commit `df` as the next snapshot of `stage`:
    * write data → write per-partition lineage rows → fsync manifest →
    * move _COMMITTED marker into place. A crash at any earlier point
    * leaves no committed snapshot, so resume recomputes the stage.
    * Returns the committed handle; the DataFrame read back is the
    * canonical stage output (also truncates upstream lineage — doubles
    * as the reference's cache() of reused RDDs, FormatSmartCardData:48).
    */
  def commit(spark: SparkSession, df: DataFrame, runDir: String, stage: String,
             runId: String, counters: Map[String, Long]): Committed = {
    val snapId = lastCommitted(runDir, stage).getOrElse(-1L) + 1L
    val snapPath = s"${stageDir(runDir, stage)}/snapshot=$snapId"
    val dataPath = s"$snapPath/data"
    df.write.mode(SaveMode.Overwrite).parquet(dataPath)

    // ONE job re-reads the written parquet for per-partition lineage; the
    // snapshot row count is the sum of the collected per-partition counts
    // (round 2 ran a separate count() — a third job per commit). The
    // partition ids are the POST-READ partitioning of the committed files
    // (hence `read_partition_id`), not the writer tasks — what a resumed
    // consumer of the snapshot will actually see.
    val written = spark.read.parquet(dataPath)
    val parts = written
      .groupBy(spark_partition_id().as("read_partition_id"))
      .agg(count(lit(1)).as("rows_out"))
      .collect()
    val rows = parts.map(_.getLong(1)).sum
    import spark.implicits._
    val lineage = parts.toSeq
      .map(r => (r.getInt(0), r.getLong(1)))
      .toDF("read_partition_id", "rows_out")
      .withColumn("run_id", lit(runId))
      .withColumn("stage", lit(stage))
      .withColumn("snapshot_id", lit(snapId))
      .withColumn("counters",
        map(counters.toSeq.sortBy(_._1).flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*))
      .withColumn("committed_at", current_timestamp())
    // local-relation write: no cluster job re-scans the data for lineage
    lineage.coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$snapPath/lineage")
    val manifest =
      s"""{"format_version":$FormatVersion,"run_id":"$runId","stage":"$stage","snapshot_id":$snapId,"rows":$rows,
         |"counters":{${counters.toSeq.sortBy(_._1).map { case (k, v) => s""""$k":$v""" }.mkString(",")}}}""".stripMargin
    val tmp = Paths.get(s"$snapPath/_manifest.tmp")
    Files.writeString(tmp, manifest)
    Files.move(tmp, Paths.get(s"$snapPath/_manifest.json"), StandardCopyOption.ATOMIC_MOVE)
    Files.writeString(Paths.get(s"$snapPath/_COMMITTED.tmp"), "ok")
    Files.move(Paths.get(s"$snapPath/_COMMITTED.tmp"), Paths.get(s"$snapPath/_COMMITTED"),
      StandardCopyOption.ATOMIC_MOVE)
    Committed(stage, snapId, dataPath, rows)
  }

  /** Counters recorded in a committed snapshot's manifest (the durable
    * side-channel a later increment reads back — e.g. media_df's `n_docs`,
    * the corpus size behind the committed idf weights). Empty map when the
    * manifest is absent.
    */
  def counters(runDir: String, stage: String, snapshotId: Long): Map[String, Long] = {
    val m = Paths.get(s"${stageDir(runDir, stage)}/snapshot=$snapshotId/_manifest.json")
    if (!Files.exists(m)) return Map.empty
    "\"counters\"\\s*:\\s*\\{([^}]*)\\}".r.findFirstMatchIn(Files.readString(m))
      .map(_.group(1)).map { body =>
        "\"([A-Za-z0-9_]+)\"\\s*:\\s*(-?\\d+)".r.findAllMatchIn(body)
          .map(mm => mm.group(1) -> mm.group(2).toLong).toMap
      }.getOrElse(Map.empty)
  }

  /** Counters of the LATEST committed snapshot of a stage. */
  def lastCounters(runDir: String, stage: String): Map[String, Long] =
    lastCommitted(runDir, stage).map(counters(runDir, stage, _)).getOrElse(Map.empty)

  /** Manifest format version of a committed snapshot: absent field (or
    * absent manifest — pre-manifest layouts) reads as v1.
    */
  private def formatVersionOf(runDir: String, stage: String, id: Long): Int = {
    val m = Paths.get(s"${stageDir(runDir, stage)}/snapshot=$id/_manifest.json")
    if (!Files.exists(m)) return 1
    "\"format_version\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(Files.readString(m))
      .map(_.group(1).toInt).getOrElse(1)
  }

  private def checkVersion(runDir: String, stage: String, id: Long): Unit = {
    val v = formatVersionOf(runDir, stage, id)
    if (v != FormatVersion) throw new IncompatibleSnapshotException(
      s"snapshot $stage/snapshot=$id in $runDir has format_version $v, this build reads " +
        s"$FormatVersion — re-run the producing stage (resume from an older build's snapshots " +
        "would fail on schema mismatch downstream; failing loud here instead)")
  }

  /** Read the latest committed snapshot of a stage, if present. */
  def loadCommitted(spark: SparkSession, runDir: String, stage: String): Option[DataFrame] =
    lastCommitted(runDir, stage).map { id => loadSnapshot(spark, runDir, stage, id) }

  /** TIME-TRAVEL read: a SPECIFIC committed snapshot of a stage by id —
    * older snapshots stay readable (and byte-stable) after newer commits,
    * since a commit only ever adds a new snapshot=<id+1> directory.
    * Throws if the id was never committed or has an incompatible format.
    */
  def loadSnapshot(spark: SparkSession, runDir: String, stage: String, snapshotId: Long): DataFrame = {
    require(snapshots(runDir, stage).contains(snapshotId),
      s"no committed snapshot $stage/snapshot=$snapshotId under $runDir " +
        s"(committed: ${snapshots(runDir, stage).mkString(",")})")
    checkVersion(runDir, stage, snapshotId)
    spark.read.parquet(s"${stageDir(runDir, stage)}/snapshot=$snapshotId/data")
  }

  /** All lineage rows of a run directory (time-ordered snapshot log). */
  def lineage(spark: SparkSession, runDir: String): Option[DataFrame] = {
    val d = Paths.get(runDir)
    if (!Files.isDirectory(d)) return None
    val paths = scala.util.Using.resource(Files.walk(d))(_.toArray.toSeq.map(_.toString))
      .filter(_.endsWith("/lineage"))
    if (paths.isEmpty) None
    else Some(spark.read.parquet(paths: _*))
  }
}
