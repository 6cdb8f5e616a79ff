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

  test("hot blocking keys are refined + chained, not dropped: planted hot-key entity stays whole") {
    import spark.implicits._
    // a 150-doc entity: EVERY key it emits (sn, mh bands, media) is shared
    // by all 150 docs => block size 150 > cap 64 => all its keys are hot.
    // Round-1 behavior (drop hot keys) would shatter it into singletons.
    val plantedCfg = GenConfig(numEntities = 1, docsPerEntity = 150, seed = 777L)
    val planted = DocGen.docs(spark, plantedCfg).map(d => d.copy(doc_id = "p" + d.doc_id))
    val plantedGold = DocGen.gold(spark, plantedCfg)
      .map(g => g.copy(doc_id = "p" + g.doc_id, entity_id = "p" + g.entity_id))
    val all = docs.unionByName(planted.toDF()).cache()
    val allGold = gold.unionByName(plantedGold.toDF()).cache()

    val res = EntityResolution.run(spark, all)
    assert(res.counters("capped_block_keys") > 0, "test corpus must actually produce hot keys")
    val plantedClusters = res.assignments
      .where(col("doc_id").startsWith("p")).select("cluster_id").distinct().count()
    assert(plantedClusters == 1, s"hot-key entity split into $plantedClusters clusters")
    val labeled = EntityResolution.labeledPairs(res.blocking, allGold)
    val m = Eval.pairwiseF1(res.assignments, labeled)
    info(s"hot-key corpus: P=${m.precision} R=${m.recall} F1=${m.f1} counters=${res.counters}")
    assert(m.f1 >= 0.99, s"F1 ${m.f1} below gate with hot keys present")
    assert(Eval.clusterEquality(res.assignments, allGold), "cluster membership != gold under hot keys")
    all.unpersist(); allGold.unpersist()
  }

  test("power-law entity sizes: hot entities stay whole, F1 gate + tail counter hold") {
    // hot ENTITIES (not just hot shared tokens) are the block-size cap's
    // other failure axis: every key a 256-doc entity emits is hot, so its
    // recall rides entirely on refinement + chain recovery
    val c = GenConfig(numEntities = 300, docsPerEntity = 3, seed = 5L)
    val d = DocGen.docsSkewed(spark, c).toDF().cache()
    val g = DocGen.goldSkewed(spark, c).toDF().cache()
    val res = EntityResolution.run(spark, d)
    assert(res.counters("capped_block_keys") > 0, "skewed corpus must produce hot keys")
    val labeled = EntityResolution.labeledPairs(res.blocking, g).cache()
    val (gpTotal, gpBlocked, gpMissed) = Eval.blockingTail(labeled, g)
    info(s"gold pairs: total=$gpTotal blocked=$gpBlocked missed=$gpMissed counters=${res.counters}")
    assert(gpTotal > 32000, "head entity alone contributes C(256,2) gold pairs")
    // above-cap entities are candidated sub-quadratically BY DESIGN
    // (connectivity, not all-pairs — see Eval.blockingTail scaladoc), so
    // the pair-level tail is large here; the recall truth on this corpus
    // is exact cluster equality below. Pairs of TAIL entities (size ≤
    // cap) must still be fully candidated: their per-entity C(3,2)=3
    // pairs all share ordinary small-block keys.
    assert(gpBlocked.toDouble >= 0.3 * gpTotal, "even the connectivity universe collapsed")
    val m = Eval.pairwiseF1(res.assignments, labeled)
    info(s"skewed corpus: P=${m.precision} R=${m.recall} F1=${m.f1}")
    assert(m.f1 >= 0.99, s"F1 ${m.f1} below gate on power-law entity sizes")
    assert(Eval.clusterEquality(res.assignments, g), "cluster membership != gold under entity skew")
    res.release(); labeled.unpersist(); d.unpersist(); g.unpersist()
  }

  test("rank@k: every doc's gold counterpart appears in its top-3 scored candidates") {
    val res = EntityResolution.run(spark, docs)
    val (hits, n, rate) = Eval.rankAtK(res.scoredPairs, gold, k = 3)
    info(s"rank@3 = $rate ($hits/$n)")
    assert(n > 0 && rate >= 0.99, s"rank@3 $rate ($hits/$n)")
  }

  test("F1 gate holds across additional seeds (mini corpora)") {
    // guards against single-seed blind spots: seed 99 once hid a
    // prescreen-recall bug the seed-42 corpus never exercised
    Seq(7L, 99L, 123L).foreach { seed =>
      val c = GenConfig(numEntities = 150, docsPerEntity = 3, seed = seed)
      val d = DocGen.docs(spark, c).toDF().cache()
      val g = DocGen.gold(spark, c).toDF()
      val res = EntityResolution.run(spark, d)
      val m = Eval.pairwiseF1(res.assignments, EntityResolution.labeledPairs(res.blocking, g))
      assert(m.f1 >= 0.99, s"seed $seed: F1 ${m.f1}")
      assert(Eval.clusterEquality(res.assignments, g), s"seed $seed: clusters != gold")
      res.release(); d.unpersist()
    }
  }

  test("sweep: default blend config is an argmax of the (gamma, threshold) F1 grid") {
    val res = EntityResolution.run(spark, docs)
    val labeled = EntityResolution.labeledPairs(res.blocking, gold).cache()
    val scored = res.scoredPairs.cache()
    val sc = EntityResolution.PipelineConfig().scoring
    val pts = Eval.sweepBlend(scored, labeled, sc,
      gammas = (0 to 10).map(_ / 10.0) :+ sc.gammaText, thresholds = Seq(0.5, 0.6, 0.7, 0.8))
    val best = pts.map(_.f1).max
    val default = pts.find(p => p.gammaText == sc.gammaText && p.threshold == 0.6)
    info(s"grid max F1 = $best; default point = $default")
    assert(default.isDefined, "default config's grid point missing")
    assert(default.get.f1 >= best - 1e-9,
      s"default config F1 ${default.get.f1} is not the grid argmax $best")
    // the re-blend column must reproduce the committed kernel score exactly
    // at the shipped gamma (same IEEE op order)
    val diff = scored.withColumn("re",
      graft.operators.PairScoring.blendColumn(col("sim_text"), col("sim_media"),
        col("sim_align"), col("media_usable"), col("vetoed"), sc, sc.gammaText))
      .where(col("re") =!= col("score"))
    assert(diff.isEmpty, "blendColumn diverges from the scoring kernel")
    labeled.unpersist(); scored.unpersist()
  }

  test("span-sequence invariant holds through the pipeline") {
    // docs are never mutated by the pipeline; assert the invariant checker
    // itself: identical input => 0 violations, a mutated doc => >0
    assert(Eval.spanInvariantViolations(docs, docs) == 0)
    val mutated = docs.withColumn("spans",
      expr("transform(spans, s -> named_struct('kind', s.kind, 'text', concat(s.text, 'X'), 'media_ref', s.media_ref, 'offset', s.offset))"))
    assert(Eval.spanInvariantViolations(docs, mutated) > 0)
  }

  test("Result.release() frees every cache a run materializes (no leak across runs)") {
    // the long-lived-session contract: repeated pipeline runs must not
    // accumulate persisted RDDs (blocking output, shared tokenized
    // relation, scoring's media-token cache all released)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val res = graft.pipeline.EntityResolution.run(spark,
      DocGen.docs(spark, GenConfig(numEntities = 30, docsPerEntity = 3, seed = 11L)).toDF())
    assert(res.assignments.count() > 0)
    assert(spark.sparkContext.getPersistentRDDs.keySet.size > before.size,
      "run should have materialized caches before release")
    res.release()
    val after = spark.sparkContext.getPersistentRDDs -- before
    assert(after.isEmpty, s"leaked persisted RDDs after release(): " +
      after.map { case (id, r) => s"$id=${r.name}:${r.getStorageLevel.description}" }.mkString("; "))
  }
}
