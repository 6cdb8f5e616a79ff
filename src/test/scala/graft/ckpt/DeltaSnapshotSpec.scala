package graft.ckpt

import graft.SparkSpec
import java.nio.file.Files

/** Delta snapshots (Snapshots.commitDelta): merge-on-read resolution —
  * `base.antiJoin(removes, keys) ∪ adds` — over arbitrary chain depth,
  * with the base snapshot untouched (time-travel byte-stability) and the
  * manifest carrying format_version 3 + the caller-maintained resolved
  * row count.
  */
class DeltaSnapshotSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(String, Long)] =
    df.collect().map(r => (r.getString(0), r.getLong(1))).toSet

  test("commitDelta: adds, keyed removes, chained deltas, time-travel to base") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-delta").toString
    val base = Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("k", "v")
    Snapshots.commit(spark, base, tmp, "t", "r0", Map("n" -> 3L))

    // delta 1: replace b (remove by key + re-add), add d
    val adds1 = Seq(("b", 20L), ("d", 4L)).toDF("k", "v")
    val rm1 = Seq("b").toDF("k")
    val c1 = Snapshots.commitDelta(spark, adds1, Some((rm1, Seq("k"))), tmp, "t", "r1",
      Map("n" -> 4L), resolvedRows = 4L)
    assert(c1.snapshotId == 1L && c1.rows == 4L)
    assert(rows(Snapshots.loadSnapshot(spark, tmp, "t", 1L)) ==
      Set(("a", 1L), ("b", 20L), ("c", 3L), ("d", 4L)))

    // delta 2 on top of delta 1: remove a (no re-add), add e — resolution
    // recurses through the chain and the anti-join applies to the RESOLVED
    // base (delta-1 rows are removable too)
    val adds2 = Seq(("e", 5L)).toDF("k", "v")
    val rm2 = Seq("a", "d").toDF("k")
    Snapshots.commitDelta(spark, adds2, Some((rm2, Seq("k"))), tmp, "t", "r2",
      Map("n" -> 3L), resolvedRows = 3L)
    assert(rows(Snapshots.loadCommitted(spark, tmp, "t").get) ==
      Set(("b", 20L), ("c", 3L), ("e", 5L)))

    // time-travel: the full base and the intermediate delta stay readable
    assert(rows(Snapshots.loadSnapshot(spark, tmp, "t", 0L)) ==
      Set(("a", 1L), ("b", 2L), ("c", 3L)))
    assert(rows(Snapshots.loadSnapshot(spark, tmp, "t", 1L)) ==
      Set(("a", 1L), ("b", 20L), ("c", 3L), ("d", 4L)))

    // manifest bookkeeping: resolved row counts + counters per snapshot
    assert(Snapshots.committedRows(tmp, "t", 0L).contains(3L))
    assert(Snapshots.committedRows(tmp, "t", 2L).contains(3L))
    assert(Snapshots.lastRows(tmp, "t").contains(3L))
    assert(Snapshots.counters(tmp, "t", 2L)("n") == 3L)
  }

  test("resolved delta is schema-order-identical to its base (non-leading remove key)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val tmp = Files.createTempDirectory("graft-delta-ord").toString
    // base column order (doc, cl); remove keyed on the SECOND column — a
    // USING-column anti-join moves key columns to the front, which the
    // resolver must undo or positional consumers (exceptAll, parquet
    // appends) silently compare doc against cl
    val base = Seq(("x1", "c1"), ("x2", "c1"), ("y1", "c2")).toDF("doc", "cl")
    Snapshots.commit(spark, base, tmp, "t", "r0", Map.empty)
    val adds = Seq(("x9", "c9")).toDF("doc", "cl")
    Snapshots.commitDelta(spark, adds, Some((Seq("c2").toDF("cl"), Seq("cl"))),
      tmp, "t", "r1", Map.empty, resolvedRows = 3L)
    val resolved = Snapshots.loadCommitted(spark, tmp, "t").get
    assert(resolved.columns.toSeq == Seq("doc", "cl"),
      s"resolved delta reordered columns: ${resolved.columns.toSeq}")
    // positional equality with an equivalent full relation must hold
    val expected = Seq(("x1", "c1"), ("x2", "c1"), ("x9", "c9")).toDF("doc", "cl")
    assert(resolved.exceptAll(expected).isEmpty && expected.exceptAll(resolved).isEmpty)
    assert(resolved.where(col("doc") === "y1").isEmpty)
  }

  test("commitDelta without removes is a pure append; requires a committed base") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-delta-app").toString
    // no base -> fail loud
    val e = intercept[RuntimeException](Snapshots.commitDelta(spark,
      Seq(("x", 1L)).toDF("k", "v"), None, tmp, "t", "r", Map.empty, 1L))
    assert(e.getMessage.contains("no committed base"))
    Snapshots.commit(spark, Seq(("a", 1L)).toDF("k", "v"), tmp, "t", "r0", Map.empty)
    Snapshots.commitDelta(spark, Seq(("b", 2L)).toDF("k", "v"), None, tmp, "t", "r1",
      Map.empty, 2L)
    assert(rows(Snapshots.loadCommitted(spark, tmp, "t").get) == Set(("a", 1L), ("b", 2L)))
  }
}
