package graft.pipeline

import graft.SparkSpec
import graft.eval.Eval

/** Unit semantics of the cluster-equality gate (the end-to-end F1/equality
  * paths exercise it across every pipeline suite; this pins the DOC-UNIVERSE
  * side: the gate must see missing, extra, and duplicated docs — the old
  * inner-join shape silently ignored all three).
  */
class EvalSpec extends SparkSpec {
  import spark.implicits._

  private def gold =
    Seq(("a", "e1"), ("b", "e1"), ("c", "e2")).toDF("doc_id", "entity_id")

  test("clusterEquality: equal partitions (canonical min-doc ids) pass") {
    val a = Seq(("a", "a"), ("b", "a"), ("c", "c")).toDF("doc_id", "cluster_id")
    assert(Eval.clusterEquality(a, gold))
  }

  test("clusterEquality: a wrong membership fails") {
    val a = Seq(("a", "a"), ("b", "a"), ("c", "a")).toDF("doc_id", "cluster_id")
    assert(!Eval.clusterEquality(a, gold))
  }

  test("clusterEquality: a doc MISSING from assignments fails (not silently dropped)") {
    val a = Seq(("a", "a"), ("b", "a")).toDF("doc_id", "cluster_id")
    assert(!Eval.clusterEquality(a, gold))
  }

  test("clusterEquality: an EXTRA doc in assignments fails") {
    val a = Seq(("a", "a"), ("b", "a"), ("c", "c"), ("d", "d")).toDF("doc_id", "cluster_id")
    assert(!Eval.clusterEquality(a, gold))
  }

  test("clusterEquality: a duplicated agreeing assignment row fails the count check") {
    val a = Seq(("a", "a"), ("b", "a"), ("c", "c"), ("c", "c")).toDF("doc_id", "cluster_id")
    assert(!Eval.clusterEquality(a, gold))
  }
}
