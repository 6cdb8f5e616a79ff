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
    * = lineage `read_partition_id`, 9-column ScoredPair; v3 (round 5+) =
    * DELTA snapshot (manifest carries `delta_base` + `remove_keys`; data/
    * holds only the added rows) — resolved on read against its base chain.
    * A reader accepts v2 (full) and v3 (delta) snapshots.
    */
  val FormatVersion = 2
  val DeltaFormatVersion = 3

  final case class Committed(stage: String, snapshotId: Long, path: String, rows: Long)

  final class IncompatibleSnapshotException(msg: String) extends RuntimeException(msg)

  /** Thrown when another writer published the same snapshot id while this
    * commit was staging — two uncoordinated writers share a run dir (e.g. a
    * streaming ingester plus a manual increment). The losing commit's staged
    * files are already deleted when this is thrown; nothing it wrote is
    * visible. Serialize writers per run dir and retry.
    */
  final class ConcurrentCommitException(msg: String) extends RuntimeException(msg)

  private def stageDir(runDir: String, stage: String) = s"$runDir/$stage"

  private def deleteRecursively(path: String): Unit = {
    val p = Paths.get(path)
    if (!Files.exists(p)) return
    val all = scala.util.Using.resource(Files.walk(p))(_.toArray.toSeq.map(_.toString))
    all.sorted.reverse.foreach(q => Files.deleteIfExists(Paths.get(q)))
  }

  /** Allocate a staging directory for a commit attempt, invisible to every
    * reader (readers only match `snapshot=` names; [[lineage]] skips
    * `_attempt_` paths). The commit point is [[publish]]'s atomic rename.
    */
  private def stageAttempt(stageD: String): String = {
    Files.createDirectories(Paths.get(stageD))
    s"$stageD/_attempt_${java.util.UUID.randomUUID().toString.take(12)}"
  }

  /** The single commit point: atomically rename a fully-written attempt dir
    * (data + lineage + manifest + _COMMITTED already inside) to its
    * `snapshot=<id>` name. rename(2) fails if the target exists, so when two
    * uncoordinated writers race the same next id, exactly one publishes; the
    * loser's staged files are deleted and it fails loud — never the previous
    * behavior of both writing into one shared directory with Overwrite.
    */
  private def publish(attempt: String, snapPath: String, runDir: String,
                      stage: String, snapId: Long, attemptsLeft: Int = 3): Unit = {
    def loseRace(how: String): Nothing = {
      deleteRecursively(attempt)
      throw new ConcurrentCommitException(
        s"$stage/snapshot=$snapId under $runDir was committed by another writer while " +
          s"this commit was staging (lost the publish race, $how) — " +
          "two uncoordinated writers share this run dir; serialize commits per run dir")
    }
    try Files.move(Paths.get(attempt), Paths.get(snapPath), StandardCopyOption.ATOMIC_MOVE)
    catch {
      // rename(2) onto an existing non-empty dir surfaces as EEXIST/ENOTEMPTY
      // (FileAlreadyExists/DirectoryNotEmpty/raw FileSystemException depending
      // on the JDK path); the target-exists guard keeps genuine IO errors
      // (EXDEV, EACCES, disk full) propagating untouched
      case e: java.nio.file.FileSystemException if Files.exists(Paths.get(snapPath)) =>
        if (attemptsLeft <= 0) loseRace("repeated absorb races, " + e.getClass.getSimpleName)
        else if (!Files.exists(Paths.get(snapPath, "_COMMITTED"))) {
          // a MARKER-LESS dir at this id is crash garbage (a pre-protocol
          // partial commit, or a dropSnapshot/repair interrupted mid-delete
          // after removing the marker), never a live writer — live writers
          // stage in _attempt_ dirs. Absorb it and publish; without this a
          // stale partial would permanently block the id with a misleading
          // concurrent-writer error. The absorb must NOT delete in place: a
          // RACING same-id writer can absorb the garbage and publish between
          // this marker check and the delete, and an in-place delete would
          // then destroy its COMMITTED snapshot with both writers reporting
          // success. Instead rename(2) moves the dir aside ATOMICALLY —
          // exactly one mover gains ownership — and the moved dir is
          // inspected privately: if it turns out to be a snapshot committed
          // after the marker check, it is moved straight back and this
          // writer loses normally.
          val aside = Paths.get(snapPath).getParent.resolve(
            s"_attempt_absorb_${java.util.UUID.randomUUID().toString.take(12)}")
          val owned =
            try { Files.move(Paths.get(snapPath), aside, StandardCopyOption.ATOMIC_MOVE); true }
            catch { case _: java.nio.file.NoSuchFileException => false } // a racer absorbed first
          if (owned && Files.exists(aside.resolve("_COMMITTED"))) {
            try Files.move(aside, Paths.get(snapPath), StandardCopyOption.ATOMIC_MOVE)
            catch {
              case restoreErr: java.nio.file.FileSystemException =>
                // a third writer published while we held the aside copy:
                // two committed snapshots now exist for one id — do NOT
                // delete either; surface both paths for manual repair
                deleteRecursively(attempt)
                throw new IllegalStateException(
                  s"$stage/snapshot=$snapId under $runDir: a concurrently committed snapshot " +
                    s"was moved aside during garbage absorption and could not be restored " +
                    s"(another writer re-published the id) — restore it manually from $aside",
                  restoreErr)
            }
            loseRace("published during garbage absorption")
          } else {
            if (owned) deleteRecursively(aside.toString) // privately-owned garbage
            // retry: if ANOTHER writer claimed the id meanwhile, the retry
            // loses through the committed-marker branch above
            publish(attempt, snapPath, runDir, stage, snapId, attemptsLeft - 1)
          }
        } else loseRace(e.getClass.getSimpleName)
      // snapPath ABSENT at guard time: a racing writer's absorb window — it
      // moved the target aside between our failed rename and this check
      // (the id was either freed or is about to be republished). Retrying
      // resolves both to win or lose-loudly instead of surfacing a spurious
      // raw IO failure (round-5 advice); genuine IO errors (EACCES, EXDEV,
      // disk full) still propagate once the retry budget is spent.
      case _: java.nio.file.FileSystemException
          if !Files.exists(Paths.get(snapPath)) && attemptsLeft > 0 =>
        publish(attempt, snapPath, runDir, stage, snapId, attemptsLeft - 1)
    }
  }

  /** DESTRUCTIVE: delete stale staged-commit attempt directories (left by a
    * writer that crashed BEFORE its publish rename — invisible to readers,
    * pure disk garbage). Repair's domain: only call when no writer is live
    * on the run dir, since a live writer's staging dir is indistinguishable
    * from a stale one. Returns the deleted paths.
    *
    * A directory under the `_attempt_` prefix that CONTAINS a `_COMMITTED`
    * marker is never garbage: it is a committed snapshot stranded mid
    * garbage-absorption (a crash between [[publish]]'s move-aside and
    * restore, or the documented restore-it-manually third-writer path) —
    * possibly the only copy of that committed data. Those are skipped and
    * reported loudly instead of deleted (round-5 advice: repair, the very
    * verb other error messages direct operators to run, must not destroy
    * what it exists to recover).
    */
  def cleanAttempts(runDir: String, stage: String): Seq[String] = {
    val d = Paths.get(stageDir(runDir, stage))
    if (!Files.isDirectory(d)) return Seq.empty
    val attempts = scala.util.Using.resource(Files.list(d))(_.toArray.toSeq.map(_.toString))
      .filter(p => Paths.get(p).getFileName.toString.startsWith("_attempt_"))
    val (strandedCommitted, garbage) =
      attempts.partition(p => Files.exists(Paths.get(p, "_COMMITTED")))
    strandedCommitted.foreach(p => System.err.println(
      s"[cleanAttempts] REFUSING to delete $p: it holds a _COMMITTED snapshot stranded " +
        "by an interrupted garbage absorption — restore it manually to its snapshot=<id> name"))
    garbage.foreach(deleteRecursively)
    garbage
  }

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

  /** ALL snapshot directory ids of a stage, committed or NOT — partial
    * (crash-interrupted, marker-less) directories included. Input to
    * repair; readers always use [[snapshots]]/[[lastCommitted]], which see
    * only committed ids.
    */
  def snapshotDirIds(runDir: String, stage: String): Seq[Long] = {
    val d = Paths.get(stageDir(runDir, stage))
    if (!Files.isDirectory(d)) return Seq.empty
    val entries = scala.util.Using.resource(Files.list(d))(_.toArray.toSeq.map(_.toString))
    entries.flatMap { p =>
      val name = Paths.get(p).getFileName.toString
      if (name.startsWith("snapshot=")) Some(name.stripPrefix("snapshot=").toLong) else None
    }.sorted
  }

  /** Atomically commit `df` as the next snapshot of `stage`: stage data +
    * per-partition lineage rows + manifest + _COMMITTED marker into a
    * private `_attempt_` directory (invisible to every reader), then
    * atomically rename it to `snapshot=<id>` — the rename is the single
    * commit point. A crash at any earlier point leaves only invisible
    * staging garbage, so resume recomputes the stage; a CONCURRENT writer
    * publishing the same id first makes this commit fail loud with
    * [[ConcurrentCommitException]] instead of both writers interleaving
    * files in one shared directory.
    * Returns the committed handle; the DataFrame read back is the
    * canonical stage output (also truncates upstream lineage — doubles
    * as the reference's cache() of reused RDDs, FormatSmartCardData:48).
    */
  def commit(spark: SparkSession, df: DataFrame, runDir: String, stage: String,
             runId: String, counters: Map[String, Long]): Committed =
    commitAt(spark, df, runDir, stage, runId, counters,
      lastCommitted(runDir, stage).getOrElse(-1L) + 1L)

  /** [[commit]] with a caller-chosen snapshot id — the CAS seam the
    * concurrency test drives deterministically (package-private).
    */
  private[ckpt] def commitAt(spark: SparkSession, df: DataFrame, runDir: String, stage: String,
                             runId: String, counters: Map[String, Long],
                             snapId: Long): Committed = {
    val snapPath = s"${stageDir(runDir, stage)}/snapshot=$snapId"
    val attempt = stageAttempt(stageDir(runDir, stage))
    val dataPath = s"$attempt/data"
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
    lineage.coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$attempt/lineage")
    val manifest =
      s"""{"format_version":$FormatVersion,"run_id":"$runId","stage":"$stage","snapshot_id":$snapId,"rows":$rows,
         |"counters":{${counters.toSeq.sortBy(_._1).map { case (k, v) => s""""$k":$v""" }.mkString(",")}}}""".stripMargin
    Files.writeString(Paths.get(s"$attempt/_manifest.json"), manifest)
    // marker rides INSIDE the attempt: the publish rename makes the
    // directory appear fully committed in one atomic step
    Files.writeString(Paths.get(s"$attempt/_COMMITTED"), "ok")
    publish(attempt, snapPath, runDir, stage, snapId)
    Committed(stage, snapId, s"$snapPath/data", rows)
  }

  /** Atomically commit a DELTA snapshot: `adds` rows plus an optional
    * keyed-remove relation against the PREVIOUS committed snapshot —
    * resolved on read as `base.antiJoin(removes, removeKeys) ∪ adds`. The
    * write is O(|adds| + |removes|) regardless of the base size — the
    * merge-on-read half of the incremental contract (the batch run is the
    * compaction that re-materializes a full snapshot). `resolvedRows` is
    * the caller-maintained logical row count of the RESOLVED relation
    * (recorded in the manifest like a full snapshot's count; callers of
    * the incremental path already maintain it by exact merge arithmetic).
    *
    * Read cost: one (typically broadcast) anti-join + union per delta in
    * the chain since the last full snapshot — keep chains short by
    * compacting (a full [[commit]]) every O(10) increments.
    */
  def commitDelta(spark: SparkSession, adds: DataFrame,
                  removes: Option[(DataFrame, Seq[String])],
                  runDir: String, stage: String, runId: String,
                  counters: Map[String, Long], resolvedRows: Long): Committed = {
    val baseId = lastCommitted(runDir, stage).getOrElse(
      sys.error(s"commitDelta: no committed base snapshot for $stage under $runDir"))
    val snapId = baseId + 1L
    val snapPath = s"${stageDir(runDir, stage)}/snapshot=$snapId"
    val attempt = stageAttempt(stageDir(runDir, stage))
    val dataPath = s"$attempt/data"
    adds.write.mode(SaveMode.Overwrite).parquet(dataPath)
    removes.foreach { case (rm, keys) =>
      rm.selectExpr(keys: _*).dropDuplicates(keys)
        .write.mode(SaveMode.Overwrite).parquet(s"$attempt/removes")
    }
    // lineage describes what THIS commit wrote (the delta adds)
    val written = spark.read.parquet(dataPath)
    val parts = written
      .groupBy(spark_partition_id().as("read_partition_id"))
      .agg(count(lit(1)).as("rows_out"))
      .collect()
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
    lineage.coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$attempt/lineage")
    val removeKeysJson = removes.map(_._2).getOrElse(Seq.empty)
      .map(k => s""""$k"""").mkString("[", ",", "]")
    val manifest =
      s"""{"format_version":$DeltaFormatVersion,"run_id":"$runId","stage":"$stage","snapshot_id":$snapId,"rows":$resolvedRows,
         |"delta_base":$baseId,"remove_keys":$removeKeysJson,
         |"counters":{${counters.toSeq.sortBy(_._1).map { case (k, v) => s""""$k":$v""" }.mkString(",")}}}""".stripMargin
    Files.writeString(Paths.get(s"$attempt/_manifest.json"), manifest)
    Files.writeString(Paths.get(s"$attempt/_COMMITTED"), "ok")
    // the CAS here also guards the delta-base arithmetic: a concurrent
    // writer that committed since our lastCommitted read claimed snapId
    // first, and publishing OUR delta (computed against the now-stale base)
    // on top of it would be wrong — failing the race is the correct outcome
    publish(attempt, snapPath, runDir, stage, snapId)
    Committed(stage, snapId, s"$snapPath/data", resolvedRows)
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

  /** Logical (resolved) row count recorded in a committed snapshot's
    * manifest — for a delta snapshot this is the caller-maintained count of
    * the RESOLVED relation, so increments can maintain the next count
    * without an O(committed) recount.
    */
  def committedRows(runDir: String, stage: String, snapshotId: Long): Option[Long] = {
    val m = Paths.get(s"${stageDir(runDir, stage)}/snapshot=$snapshotId/_manifest.json")
    if (!Files.exists(m)) return None
    "\"rows\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(Files.readString(m)).map(_.group(1).toLong)
  }

  /** Row count of the LATEST committed snapshot of a stage. */
  def lastRows(runDir: String, stage: String): Option[Long] =
    lastCommitted(runDir, stage).flatMap(committedRows(runDir, stage, _))

  /** `run_id` recorded in a committed snapshot's manifest — the commit
    * provenance tag. Streaming ingestion keys its exactly-once skip on it
    * (a replayed micro-batch whose increment already fully committed is
    * recognizable by the LAST stage's run_id).
    */
  def runIdOf(runDir: String, stage: String, snapshotId: Long): Option[String] = {
    val m = Paths.get(s"${stageDir(runDir, stage)}/snapshot=$snapshotId/_manifest.json")
    if (!Files.exists(m)) return None
    "\"run_id\"\\s*:\\s*\"([^\"]*)\"".r.findFirstMatchIn(Files.readString(m)).map(_.group(1))
  }

  /** Number of DELTA hops from the latest committed snapshot down to its
    * full base (0 = latest is a full snapshot; also 0 when the stage has
    * no snapshot). The merge-on-read cost a reader currently pays — the
    * number compaction cadence decisions key on.
    */
  def chainDepth(runDir: String, stage: String): Int = {
    @annotation.tailrec
    def walk(id: Long, depth: Int): Int = deltaMeta(runDir, stage, id) match {
      case Some((baseId, _)) => walk(baseId, depth + 1)
      case None => depth
    }
    lastCommitted(runDir, stage).map(walk(_, 0)).getOrElse(0)
  }

  /** DESTRUCTIVE: remove one snapshot directory (committed or partial).
    * Only for repair of an interrupted multi-stage increment — trimming
    * stages that ran ahead of a crash back to the last id every stage
    * reached ([[graft.streaming.StreamingIngest.repair]]). Refuses to drop
    * a snapshot that a LATER delta snapshot uses as its base (that would
    * orphan the chain); repair never trips this since it trims from the
    * top down.
    */
  def dropSnapshot(runDir: String, stage: String, snapshotId: Long): Unit = {
    val dependents = snapshots(runDir, stage).filter(_ > snapshotId)
      .filter(deltaMeta(runDir, stage, _).exists(_._1 == snapshotId))
    require(dependents.isEmpty,
      s"dropSnapshot: $stage/snapshot=$snapshotId is the delta base of " +
        s"snapshot(s) ${dependents.mkString(",")} — drop those first")
    val dir = Paths.get(s"${stageDir(runDir, stage)}/snapshot=$snapshotId")
    if (!Files.isDirectory(dir)) return
    // delete the commit marker FIRST so a crash mid-delete leaves an
    // uncommitted (invisible) partial, never a half-deleted committed one
    Files.deleteIfExists(dir.resolve("_COMMITTED"))
    deleteRecursively(dir.toString)
  }

  /** DESTRUCTIVE: retire old snapshots of a stage — keep the newest
    * `keepLast` committed ids (plus, transitively, any base a RETAINED
    * delta resolves against: expiration never breaks a live chain — compact
    * first to free a chain's base) and delete the rest. This is the
    * PHYSICAL-deletion half of retraction: `removeDocuments` retracts rows
    * from the latest snapshot logically, but pre-removal snapshot ids keep
    * them readable (and on disk) until expired here. Returns the dropped
    * ids. Uncommitted partial directories are repair's domain, not
    * expiration's — untouched.
    */
  def expire(runDir: String, stage: String, keepLast: Int): Seq[Long] = {
    require(keepLast >= 1, s"expire: keepLast must be >= 1 (got $keepLast)")
    val ids = snapshots(runDir, stage)
    val kept0 = ids.takeRight(keepLast).toSet
    def baseChain(id: Long): Set[Long] = deltaMeta(runDir, stage, id) match {
      case Some((b, _)) => baseChain(b) + b
      case None => Set.empty
    }
    val kept = kept0 ++ kept0.flatMap(baseChain)
    val dropped = ids.filterNot(kept)
    // newest-first: any delta depending on an expired base is itself
    // expired (a kept delta keeps its chain), so descending order always
    // satisfies dropSnapshot's dependent guard
    dropped.sorted.reverse.foreach(dropSnapshot(runDir, stage, _))
    dropped
  }

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
    if (v != FormatVersion && v != DeltaFormatVersion) throw new IncompatibleSnapshotException(
      s"snapshot $stage/snapshot=$id in $runDir has format_version $v, this build reads " +
        s"$FormatVersion/$DeltaFormatVersion — re-run the producing stage (resume from an " +
        "older build's snapshots would fail on schema mismatch downstream; failing loud here)")
  }

  /** Whether a committed snapshot is a DELTA (resolves against a base). */
  def isDelta(runDir: String, stage: String, snapshotId: Long): Boolean =
    deltaMeta(runDir, stage, snapshotId).isDefined

  /** The raw ADDS relation of one committed snapshot — a delta's appended
    * rows, or a full snapshot's entire data — with NO base resolution. For
    * consumers that scan the commit log itself (e.g. the incremental
    * audit's touched-cluster derivation reads each unaudited delta's adds
    * instead of resolving the whole chain).
    */
  def snapshotAdds(spark: SparkSession, runDir: String, stage: String,
                   snapshotId: Long): DataFrame =
    spark.read.parquet(s"${stageDir(runDir, stage)}/snapshot=$snapshotId/data")

  /** Delta metadata of a committed snapshot: (base snapshot id, remove-key
    * columns), or None for a full snapshot.
    */
  private def deltaMeta(runDir: String, stage: String, id: Long): Option[(Long, Seq[String])] = {
    val m = Paths.get(s"${stageDir(runDir, stage)}/snapshot=$id/_manifest.json")
    if (!Files.exists(m)) return None
    val body = Files.readString(m)
    "\"delta_base\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(body).map { bm =>
      val keys = "\"remove_keys\"\\s*:\\s*\\[([^\\]]*)\\]".r.findFirstMatchIn(body)
        .map(_.group(1)).getOrElse("")
        .split(",").map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty).toSeq
      (bm.group(1).toLong, keys)
    }
  }

  /** Resolve a snapshot to its logical relation: full snapshots read their
    * data dir directly; delta snapshots recursively resolve their base,
    * apply the keyed remove (anti-join — the remove relation is small and
    * Spark broadcasts it by file-size estimate), and union the adds.
    */
  private def resolve(spark: SparkSession, runDir: String, stage: String, id: Long): DataFrame = {
    val adds = spark.read.parquet(s"${stageDir(runDir, stage)}/snapshot=$id/data")
    deltaMeta(runDir, stage, id) match {
      case None => adds
      case Some((baseId, keys)) =>
        checkVersion(runDir, stage, baseId)
        val base = resolve(spark, runDir, stage, baseId)
        val rmPath = Paths.get(s"${stageDir(runDir, stage)}/snapshot=$id/removes")
        val kept =
          if (Files.isDirectory(rmPath) && keys.nonEmpty)
            // a USING-column anti-join moves the key columns to the front
            // of the output schema — restore the base's column order so a
            // resolved delta is schema-identical to its base snapshot
            // (positional consumers like exceptAll depend on it)
            base.join(spark.read.parquet(rmPath.toString), keys, "left_anti")
              .select(base.columns.map(col).toIndexedSeq: _*)
          else base
        kept.unionByName(adds)
    }
  }

  /** Read the latest committed snapshot of a stage, if present. */
  def loadCommitted(spark: SparkSession, runDir: String, stage: String): Option[DataFrame] =
    lastCommitted(runDir, stage).map { id => loadSnapshot(spark, runDir, stage, id) }

  /** TIME-TRAVEL read: a SPECIFIC committed snapshot of a stage by id —
    * older snapshots stay readable (and byte-stable) after newer commits,
    * since a commit only ever adds a new snapshot=<id+1> directory. Delta
    * snapshots resolve against their base chain transparently. Throws if
    * the id was never committed or has an incompatible format.
    */
  def loadSnapshot(spark: SparkSession, runDir: String, stage: String, snapshotId: Long): DataFrame = {
    require(snapshots(runDir, stage).contains(snapshotId),
      s"no committed snapshot $stage/snapshot=$snapshotId under $runDir " +
        s"(committed: ${snapshots(runDir, stage).mkString(",")})")
    checkVersion(runDir, stage, snapshotId)
    resolve(spark, runDir, stage, snapshotId)
  }

  /** MAJOR-compact a stage's delta chain: materialize the RESOLVED latest
    * relation as a full snapshot (next id), carrying the latest counters
    * forward. Subsequent reads stop paying the merge-on-read chain and
    * subsequent deltas rebase onto the compacted snapshot; time-travel to
    * pre-compaction ids is unaffected (compaction only appends). No-op
    * shape for an already-full latest snapshot (it just rewrites it) — the
    * caller decides cadence (every O(10) increments keeps chains short).
    */
  def compact(spark: SparkSession, runDir: String, stage: String, runId: String): Committed = {
    val id = lastCommitted(runDir, stage).getOrElse(
      sys.error(s"compact: no committed snapshot for $stage under $runDir"))
    // `compacted_from` marks this full snapshot as STORAGE-level (relation
    // bit-identical to snapshot `id`): log-scanning consumers — the
    // incremental audit's touched-cluster derivation — skip it instead of
    // treating an unmarked full snapshot as "everything may have changed"
    commit(spark, resolve(spark, runDir, stage, id), runDir, stage, runId,
      counters(runDir, stage, id) + ("compacted_from" -> id))
  }

  /** All lineage rows of a run directory (time-ordered snapshot log). */
  def lineage(spark: SparkSession, runDir: String): Option[DataFrame] = {
    val d = Paths.get(runDir)
    if (!Files.isDirectory(d)) return None
    val paths = scala.util.Using.resource(Files.walk(d))(_.toArray.toSeq.map(_.toString))
      .filter(p => p.endsWith("/lineage") && !p.contains("/_attempt_"))
    if (paths.isEmpty) None
    else Some(spark.read.parquet(paths: _*))
  }
}
