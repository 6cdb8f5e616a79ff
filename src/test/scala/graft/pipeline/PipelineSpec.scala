package graft.pipeline

import graft.SparkSpec
import graft.eval.Eval
import graft.operators.Blocking
import graft.synth.{DocGen, GenConfig}
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {

  private val cfg = GenConfig(numEntities = 200, docsPerEntity = 3, seed = 42L)
  private lazy val docs = DocGen.docs(spark, cfg).toDF().cache()
  private lazy val gold = DocGen.gold(spark, cfg).toDF().cache()

  test("generator is deterministic and partition-independent") {
    val a = DocGen.docs(spark, cfg.copy(numPartitions = 3)).collect().sortBy(_.doc_id)
    val b = DocGen.docs(spark, cfg.copy(numPartitions = 17)).collect().sortBy(_.doc_id)
    assert(a.toSeq == b.toSeq)
    assert(a.length == cfg.numDocs)
  }

  test("blocking recall: >=99.5% of gold pairs share a blocking key") {
    val (blocking, _) = Blocking.block(docs)
    val labeled = EntityResolution.labeledPairs(blocking, gold).cache()
    val goldPairsInBlocks = labeled.where(col("is_match")).count()
    // total same-entity pairs: E * C(d,2)
    val totalGoldPairs = cfg.numEntities.toLong * cfg.docsPerEntity * (cfg.docsPerEntity - 1) / 2
    val recall = goldPairsInBlocks.toDouble / totalGoldPairs
    info(s"blocking recall = $recall ($goldPairsInBlocks / $totalGoldPairs)")
    assert(recall >= 0.995, s"blocking recall $recall too low")
  }

  test("end-to-end: pairwise F1 >= 0.99 and exact cluster equality") {
    val res = EntityResolution.run(spark, docs)
    val labeled = EntityResolution.labeledPairs(res.blocking, gold)
    val m = Eval.pairwiseF1(res.assignments, labeled)
    info(s"P=${m.precision} R=${m.recall} F1=${m.f1} tp=${m.tp} fp=${m.fp} fn=${m.fn}")
    assert(m.f1 >= 0.99, s"F1 ${m.f1} below gate (tp=${m.tp} fp=${m.fp} fn=${m.fn})")
    assert(Eval.clusterEquality(res.assignments, gold), "cluster membership != gold")
    assert(res.ccIterations < 20)
  }

  test("span-sequence invariant holds through the pipeline") {
    // docs are never mutated by the pipeline; assert the invariant checker
    // itself: identical input => 0 violations, a mutated doc => >0
    assert(Eval.spanInvariantViolations(docs, docs) == 0)
    val mutated = docs.withColumn("spans",
      expr("transform(spans, s -> named_struct('kind', s.kind, 'text', concat(s.text, 'X'), 'media_ref', s.media_ref, 'offset', s.offset))"))
    assert(Eval.spanInvariantViolations(docs, mutated) > 0)
  }
}
