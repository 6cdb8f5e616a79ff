package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Smoke: every registered query runs at sf0.001 and yields a stable,
  * non-degenerate result; every oracle key has a matching query key.
  * (Value-level correctness vs DuckDB is covered by tools/check_oracle.py
  * and the driver's CORRECTNESS gate.)
  */
class QueriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without query impl: $missing")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sf)
      // force full execution, not just schema resolution
      val n = df.count()
      assert(n >= 0)
      // deterministic across two runs
      assert(df.count() == n)
    }
  }

  test("IVF recall dial: shipped default clears recall@3 >= 0.9 vs brute force (sf0.01)") {
    // the managed-recall gate (BASELINE-adjacent quality target): the
    // default (IvfK, IvfProbes) config must keep >= 0.9 of the exact
    // top-3 — measured here against the same corpus the driver benches,
    // so a future knob change that silently costs recall fails the suite
    val curve = Corpus.ivfRecallCurve(spark, "/root/testdata/sf0.01", Seq(Corpus.IvfProbes))
    val recall = curve.head._2
    assert(recall >= 0.9, f"recall@3 = $recall%.4f at probes=${Corpus.IvfProbes} (need >= 0.9)")
  }
}
