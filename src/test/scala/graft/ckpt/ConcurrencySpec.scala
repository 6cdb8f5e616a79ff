package graft.ckpt

import graft.SparkSpec
import java.nio.file.{Files, Paths}
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

/** Staged-commit concurrency contract: every commit writes into a private
  * `_attempt_` directory and publishes with ONE atomic rename, so (a) two
  * uncoordinated writers racing the same snapshot id produce exactly one
  * committed snapshot plus one loud ConcurrentCommitException — never a
  * shared directory with interleaved files; (b) a writer that crashes
  * before publishing leaves only invisible staging garbage, swept by
  * repair's cleanAttempts.
  */
class ConcurrencySpec extends SparkSpec {

  private def vals(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.collect().map(_.getLong(0)).toSet

  test("publish CAS: the id-losing commit fails loud and the winner's bytes are untouched") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-cas").toString
    Snapshots.commit(spark, Seq(1L, 2L).toDF("v"), tmp, "t", "writerA", Map.empty)
    val dataFiles = {
      val d = Paths.get(s"$tmp/t/snapshot=0/data")
      scala.util.Using.resource(Files.list(d))(_.toArray.toSeq.map(_.toString)).sorted
    }

    // a second writer that computed the SAME next id (the race, made
    // deterministic through the package-private commitAt seam)
    val ex = intercept[Snapshots.ConcurrentCommitException] {
      Snapshots.commitAt(spark, Seq(99L).toDF("v"), tmp, "t", "writerB", Map.empty, 0L)
    }
    assert(ex.getMessage.contains("snapshot=0") && ex.getMessage.contains("another writer"))

    // winner byte-identical: same file listing, same rows; loser invisible
    val after = {
      val d = Paths.get(s"$tmp/t/snapshot=0/data")
      scala.util.Using.resource(Files.list(d))(_.toArray.toSeq.map(_.toString)).sorted
    }
    assert(after == dataFiles)
    assert(vals(Snapshots.loadSnapshot(spark, tmp, "t", 0L)) == Set(1L, 2L))
    assert(Snapshots.snapshots(tmp, "t") == Seq(0L))
    // the loser's staged attempt was deleted on the failed publish
    val leftover = scala.util.Using.resource(Files.list(Paths.get(s"$tmp/t")))(
      _.toArray.toSeq.map(p => Paths.get(p.toString).getFileName.toString))
    assert(!leftover.exists(_.startsWith("_attempt_")), s"stale attempt left: $leftover")
  }

  test("two live writers racing one stage: exactly one committed snapshot per id, no interleaving") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-race").toString
    Snapshots.commit(spark, Seq(0L).toDF("v"), tmp, "t", "base", Map.empty)

    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(2)
    def writer(tag: Long) = pool.submit(new java.util.concurrent.Callable[String] {
      def call(): String = {
        start.await()
        try { Snapshots.commit(spark, Seq(tag, tag).toDF("v"), tmp, "t", s"w$tag", Map.empty); "ok" }
        catch { case _: Snapshots.ConcurrentCommitException => "lost" }
      }
    })
    val (fa, fb) = (writer(111L), writer(222L))
    start.countDown()
    val outcomes = Seq(fa, fb).map(_.get(120, TimeUnit.SECONDS)).sorted
    pool.shutdown()

    // both-win (serialized by timing: ids 1 and 2) or one-loses (id 1 only)
    // are the only legal outcomes; either way every committed snapshot
    // holds exactly ONE writer's rows and ids are contiguous
    val ids = Snapshots.snapshots(tmp, "t")
    assert(outcomes == Seq("ok", "ok") || outcomes == Seq("lost", "ok"), s"outcomes=$outcomes")
    assert(ids == (0L until (1L + outcomes.count(_ == "ok"))), s"ids=$ids outcomes=$outcomes")
    ids.drop(1).foreach { id =>
      val v = vals(Snapshots.loadSnapshot(spark, tmp, "t", id))
      assert(v == Set(111L) || v == Set(222L), s"snapshot=$id interleaved: $v")
    }
  }

  test("garbage absorb under a same-id race: exactly one winner, the garbage gone, no data loss") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-absorb").toString
    Snapshots.commit(spark, Seq(0L).toDF("v"), tmp, "t", "base", Map.empty) // id 0
    // crash garbage squatting on the NEXT id: a marker-less snapshot dir
    // (e.g. a pre-protocol partial commit) — both racing writers must
    // absorb it before publishing. An in-place delete here is the data-loss
    // bug: writer B's delete can land AFTER writer A absorbed and
    // published, destroying A's committed snapshot with both reporting
    // success. The atomic move-aside makes one-winner the only outcome.
    Seq(13L).toDF("v").write.parquet(s"$tmp/t/snapshot=1/data")
    assert(Snapshots.snapshots(tmp, "t") == Seq(0L)) // invisible to readers

    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(2)
    def writer(tag: Long) = pool.submit(new java.util.concurrent.Callable[String] {
      def call(): String = {
        start.await()
        try {
          Snapshots.commitAt(spark, Seq(tag).toDF("v"), tmp, "t", s"w$tag", Map.empty, 1L)
          "ok"
        } catch { case _: Snapshots.ConcurrentCommitException => "lost" }
      }
    })
    val (fa, fb) = (writer(111L), writer(222L))
    start.countDown()
    val outcomes = Seq(fa, fb).map(_.get(120, TimeUnit.SECONDS)).sorted
    pool.shutdown()

    assert(outcomes == Seq("lost", "ok"), s"outcomes=$outcomes")
    val v = vals(Snapshots.loadSnapshot(spark, tmp, "t", 1L))
    assert(v == Set(111L) || v == Set(222L), s"snapshot=1 holds $v — garbage or interleaved")
    assert(Snapshots.snapshots(tmp, "t") == Seq(0L, 1L))
    // neither the losing attempt nor any absorb-aside dir survives
    val leftover = scala.util.Using.resource(Files.list(Paths.get(s"$tmp/t")))(
      _.toArray.toSeq.map(p => Paths.get(p.toString).getFileName.toString))
    assert(!leftover.exists(_.startsWith("_attempt_")), s"stale dirs left: $leftover")
  }

  test("a crashed writer's staging dir is invisible to readers and swept by cleanAttempts") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-stale").toString
    Snapshots.commit(spark, Seq(7L).toDF("v"), tmp, "t", "r0", Map("n" -> 1L))

    // simulate a crash mid-staging: attempt dir with data+lineage, no publish
    val attempt = Paths.get(s"$tmp/t/_attempt_deadbeef")
    Seq(5L).toDF("v").write.parquet(s"$attempt/data")
    Seq(5L).toDF("rows_out").write.parquet(s"$attempt/lineage")

    assert(Snapshots.snapshots(tmp, "t") == Seq(0L))
    assert(Snapshots.snapshotDirIds(tmp, "t") == Seq(0L))
    assert(vals(Snapshots.loadCommitted(spark, tmp, "t").get) == Set(7L))
    // the run-wide lineage log never reads staged lineage
    assert(Snapshots.lineage(spark, tmp).get.select("rows_out").collect().map(_.getLong(0)).toSeq
      == Seq(1L))

    val swept = Snapshots.cleanAttempts(tmp, "t")
    assert(swept.size == 1 && swept.head.contains("_attempt_deadbeef"))
    assert(!Files.exists(attempt))
    // committed state untouched by the sweep
    assert(vals(Snapshots.loadCommitted(spark, tmp, "t").get) == Set(7L))
  }

  test("cleanAttempts refuses a stranded COMMITTED snapshot (interrupted absorb)") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-stranded").toString
    Snapshots.commit(spark, Seq(7L).toDF("v"), tmp, "t", "r0", Map("n" -> 1L))
    // a crash between publish's move-aside and restore leaves the COMMITTED
    // snapshot under an _attempt_absorb_* name — possibly the only copy
    val aside = Paths.get(s"$tmp/t/_attempt_absorb_cafe")
    Seq(9L).toDF("v").write.parquet(s"$aside/data")
    Files.writeString(aside.resolve("_COMMITTED"), "ok")
    // and genuine staging garbage next to it
    val garbage = Paths.get(s"$tmp/t/_attempt_feed")
    Seq(5L).toDF("v").write.parquet(s"$garbage/data")
    val swept = Snapshots.cleanAttempts(tmp, "t")
    assert(swept.size == 1 && swept.head.contains("_attempt_feed"))
    assert(!Files.exists(garbage))
    assert(Files.exists(aside.resolve("_COMMITTED")),
      "the stranded committed snapshot must survive the sweep")
  }
}
