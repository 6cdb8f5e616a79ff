package graft

import graft.pipeline.EntityResolution
import graft.synth.{DocGen, GenConfig}
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): one JSON line with per-query seconds
  * over SPARK_GRAFT_SF_DIR, PLUS the north-rule scaling evidence — the ER
  * pipeline end-to-end on an identical deterministic synthetic corpus at
  * local[N] and local[4N] (stand-in for N vs 4N executors; no real cluster
  * in this sandbox), reporting docs/sec at both and the throughput scaling
  * efficiency tp(4N) / (4 · tp(N)), target ≥ 0.8.
  *
  * The scaling pair runs at local[N] vs local[4N] where N =
  * SPARK_GRAFT_SCALE_N (default 1, i.e. 1 vs 4 threads — the
  * bandwidth-UNSATURATED region of this box: measured task-CPU inflation
  * is ~1.1× at 4 threads vs ~2.4× at 8+, so 1→4 isolates algorithmic
  * scaling from the shared-memory-bus artifact a single box imposes; a
  * real N→4N cluster adds bandwidth with cores, see BENCH/BASELINE.md).
  * NOTE: this definition changed in round 2 (round 1 measured 2→8 without
  * interleaving) — cross-round efficiency numbers are not comparable.
  *
  * Ambient host load varies by tens of percent over minutes on this box,
  * so the legs are INTERLEAVED (N, 4N, N, 4N, …) over
  * SPARK_GRAFT_SCALE_REPS_N (default 3) / SPARK_GRAFT_SCALE_REPS
  * (default 5) runs, and the OFFICIAL efficiency is CENSUS-AWARE: each
  * leg's job census (wall, Σ task time, Σ task CPU, parallel core use) is
  * recorded, and a leg whose Σ task CPU exceeds its thread-count's
  * minimum by more than SPARK_GRAFT_SCALE_CPU_VETO (default 1.25×) is
  * VETOED — at unchanged parallel use, task-CPU inflation is the
  * signature of ambient load stealing memory bandwidth, so such a leg
  * measured the neighbors, not the engine. The official estimate is then
  * min wall over the surviving (vetted) legs per side; the per-leg census
  * with its vetoed flag, the veto factor, and a secondary estimator — the
  * per-interleaved-(N,4N)-pair efficiency list and its median, in BOTH a
  * raw form and a vetted form that drops pairs containing a vetoed leg —
  * are ALL emitted under "er_scaling"/"er_legs", so every veto/pairing
  * decision is auditable from the artifact itself.
  *
  * Env knobs: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS
  * (default 32), SPARK_GRAFT_BENCH_ENTITIES × SPARK_GRAFT_BENCH_DPE (ER
  * corpus size, default 200000 × 3 docs), SPARK_GRAFT_SCALE_N,
  * SPARK_GRAFT_SCALE_REPS[_N], SPARK_GRAFT_SKIP_SCALING / _SKIP_QUERIES /
  * _SKIP_INCR (the +10% addDocuments-vs-batch-rerun comparison, plus the
  * retraction leg that removes the same +10% again and checks the
  * add→remove round trip restores the base clustering bit-exactly, plus
  * the audit leg pricing `auditRepair` over the resulting committed run —
  * all ride with the scaling section unless skipped).
  */
object Bench {

  // tmpfs shuffle dir, PER PROCESS: a single box shares one disk across
  // all threads (serializing spill I/O corrupts thread-scaling numbers);
  // the pid suffix keeps a concurrent bench JVM from deleting our live
  // shuffle files at its exit
  private val localDir = s"/dev/shm/graft-spark-${ProcessHandle.current().pid()}"

  private def session(threads: Int): SparkSession = {
    new java.io.File(localDir).mkdirs()
    val s = SparkSession.builder()
      .master(s"local[$threads]")
      .appName(s"graft-bench-$threads")
      // 4× over-decomposition, same rule at every thread count (see Main)
      .config("spark.sql.shuffle.partitions", threads * 4)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", localDir)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** One leg's job census: wall plus scheduler-side totals. taskSec is Σ
    * task wall (includes shuffle wait), cpuSec is Σ executor CPU — their
    * divergence, and parallelUse = taskSec/(wall·threads), is what makes a
    * leg auditable for ambient load after the fact.
    */
  final case class Leg(threads: Int, rep: Int, docs: Long, wall: Double,
                       jobs: Long, taskSec: Double, cpuSec: Double,
                       calMs: Double = 0.0) {
    def parallelUse: Double = if (wall <= 0) 0.0 else taskSec / (wall * threads)
    def json(vetoed: Boolean): String =
      f"""{"threads":$threads,"rep":$rep,"wall_sec":$wall%.3f,"jobs":$jobs,""" +
        f""""task_sec":$taskSec%.1f,"cpu_sec":$cpuSec%.1f,"parallel_use":$parallelUse%.3f,""" +
        f""""cal_ms":$calMs%.1f,"vetoed":$vetoed}"""
  }

  /** Spark-independent ambient-load probe: wall of a fixed single-thread
    * CPU-bound kernel (xorshift64 sum, 5·10⁷ steps; min of 3 after one
    * warm-up run). On a quiet core this is a machine constant, and
    * hypervisor contention (CPU steal — which `uptime` load average does
    * NOT see) inflates it proportionally, so the per-leg `cal_ms` in the
    * artifact separates "the engine got slower" from "the box got slower"
    * without reference to any Spark metric. Informational only: the veto
    * stays keyed on task-CPU inflation (BenchEstimatorSpec).
    */
  private def calibrate(): Double = {
    def once(): Double = {
      val t0 = System.nanoTime()
      var x = 0x9E3779B97F4A7C15L; var s = 0L; var i = 0
      while (i < 50000000) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; s += x; i += 1 }
      if (s == 42L) System.err.print("") // defeat dead-code elimination
      (System.nanoTime() - t0) / 1e6
    }
    once()
    math.min(once(), math.min(once(), once()))
  }

  /** The census-vetted official estimate + the pair-median secondary, as a
    * PURE function of the measured legs (unit-tested in BenchEstimatorSpec;
    * main() only formats its output).
    */
  final case class ScalingEstimate(bestN: Leg, best4: Leg, efficiency: Double,
                                   pairEffs: Seq[Double], pairMedian: Double,
                                   pairEffsVetted: Seq[Double], pairMedianVetted: Double,
                                   vetoed: Set[(Int, Int)]) // (threads, rep)

  def officialEstimate(legs: Seq[Leg], nSmall: Int, vetoF: Double): ScalingEstimate = {
    require(legs.exists(_.threads == nSmall) && legs.exists(_.threads == nSmall * 4),
      "need at least one leg per side")
    // per-thread-count minimum Σ task CPU = the quietest window observed
    // for that config; a leg inflated beyond vetoF× it measured ambient
    // load, not the engine. The min-CPU leg can never veto itself, so
    // each side always keeps ≥ 1 leg.
    def minCpu(t: Int) = legs.filter(_.threads == t).map(_.cpuSec).min
    def isVetoed(l: Leg) = l.cpuSec > vetoF * minCpu(l.threads)
    val bestN = legs.filter(l => l.threads == nSmall && !isVetoed(l)).minBy(_.wall)
    val best4 = legs.filter(l => l.threads == nSmall * 4 && !isVetoed(l)).minBy(_.wall)
    val eff = (best4.docs / best4.wall) / (4.0 * (bestN.docs / bestN.wall))
    // secondary: efficiency per adjacent interleaved (N, 4N) pair — both
    // legs of a pair share one ambient window, so intermittent load
    // cancels in the ratio. The VETTED list (the headline secondary)
    // additionally drops any pair containing a census-vetoed leg: a
    // vetoed leg measured ambient load, and one such pair can drag the
    // raw median below the gate even when the quiet pairs agree (the raw
    // list is still emitted so every exclusion stays auditable). If
    // every pair touches a vetoed leg the raw list is the fallback —
    // pairing still cancels load better than nothing in that window.
    def median(xs: Seq[Double]) =
      if (xs.isEmpty) 0.0
      else if (xs.size % 2 == 1) xs(xs.size / 2)
      else (xs(xs.size / 2 - 1) + xs(xs.size / 2)) / 2.0
    val pairs = legs.filter(_.threads == nSmall).sortBy(_.rep).flatMap { a =>
      legs.find(l => l.threads == nSmall * 4 && l.rep == a.rep).map(b => (a, b))
    }
    val pairEffs = pairs.map { case (a, b) => a.wall / (4.0 * b.wall) }.sorted
    val vettedPairs = pairs.filter { case (a, b) => !isVetoed(a) && !isVetoed(b) }
    val pairEffsVetted =
      (if (vettedPairs.isEmpty) pairs else vettedPairs)
        .map { case (a, b) => a.wall / (4.0 * b.wall) }.sorted
    ScalingEstimate(bestN, best4, eff, pairEffs, median(pairEffs),
      pairEffsVetted, median(pairEffsVetted),
      legs.filter(isVetoed).map(l => (l.threads, l.rep)).toSet)
  }

  /** End-to-end ER wall time (scan + block + score + cluster + count) over
    * the pre-written tmpfs corpus: every leg reads the SAME parquet input
    * (the north rule measures the same job on the same input at two
    * parallelism levels) — corpus GENERATION is test fixture, not engine
    * work, and its ~1.6× 4-thread CPU inflation was polluting the ratio.
    */
  private def erRun(threads: Int, rep: Int, corpusDir: String): Leg = {
    val spark = session(threads)
    // the ~200 MB corpus must split across threads even though parquet
    // packs small files into 128 MB partitions by default
    spark.conf.set("spark.sql.files.maxPartitionBytes", (16L * 1024 * 1024).toString)
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    val cpuNs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        if (t.taskInfo != null) taskMs.addAndGet(t.taskInfo.duration)
        if (t.taskMetrics != null) cpuNs.addAndGet(t.taskMetrics.executorCpuTime)
      }
    })
    try {
      // sample this leg's ambient window BEFORE the timed work (outside
      // the measured wall): cal_ms rides in the leg census
      val cal = calibrate()
      val t0 = System.nanoTime()
      // no docs cache: the pipeline scans its source exactly once (into
      // the shared tokenized relation), so columnar-caching the nested
      // span structs would be pure encode/decode bandwidth
      val docs = spark.read.parquet(corpusDir)
      val res = EntityResolution.run(spark, docs)
      val n = res.assignments.count()
      res.release()
      val wall = (System.nanoTime() - t0) / 1e9
      val leg = Leg(threads, rep, n, wall, jobs.get, taskMs.get / 1e3, cpuNs.get / 1e9, cal)
      System.err.println(f"[erRun threads=$threads rep=$rep] wall=$wall%.1f s jobs=${jobs.get} " +
        f"taskTime=${leg.taskSec}%.1f s cpuTime=${leg.cpuSec}%.1f s parallelUse=${leg.parallelUse * 100}%.0f%% " +
        f"cal=${cal}%.0f ms")
      leg
    } finally {
      spark.stop()
      // settle between legs: drop the stopped context's garbage now so the
      // next leg does not inherit a GC debt it did not create
      System.gc()
      Thread.sleep(500)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val entities = sys.env.getOrElse("SPARK_GRAFT_BENCH_ENTITIES", "200000").toInt
    val skipScaling = sys.env.getOrElse("SPARK_GRAFT_SKIP_SCALING", "0") == "1"

    // 1) headline queries at local[cpus] — a failed query is RECORDED as a
    //    failure (name → error head), never as a normal-looking wall time
    val skipQueries = sys.env.getOrElse("SPARK_GRAFT_SKIP_QUERIES", "0") == "1"
    val (results, failures, observed): (Map[String, Double], Map[String, String], Map[String, String]) =
      if (skipQueries) (Map.empty, Map.empty, Map.empty) else {
        val spark = session(cpus)
        var fails = Map.empty[String, String]
        val r = SparkEntry.queries.map { case (name, fn) =>
          val t0 = System.nanoTime()
          try { fn(spark, sfDir).count() } catch {
            case e: Throwable =>
              fails += name -> Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
          }
          name -> (System.nanoTime() - t0) / 1e9
        }
        // q35's posting-list census in the artifact (adversarial corpora
        // surface as numbers, not just wall time): one dedicated
        // aggregate, because the in-query `observe` metric's subtree is
        // self-joined and unexecuted plan clones read zero through
        // queryExecution.observedMetrics (see Trajectory.q35PostingCensus)
        val obs = try {
          val (maxDf, rows) = graft.queries.Trajectory.q35PostingCensus(spark, sfDir)
          Map("q35_posting_census" ->
            s"""{"max_surviving_df":$maxDf,"exploded_rows":$rows}""")
        } catch { case _: Throwable => Map.empty[String, String] }
        spark.stop()
        (r -- fails.keys, fails, obs)
      }
    // ANN quality alongside speed: the full recall-vs-probes curve of the
    // IVF index against the brute-force top-3 truth (ONE trained index
    // reused across depths), plus the recall at the shipped default
    // `Corpus.IvfProbes` — the recall dial stays measured in the
    // artifact, a fast-but-wrong index cannot hide
    val ivfRecall = if (skipQueries) "" else {
      val spark = session(cpus)
      try {
        val depths = (1 to graft.queries.Corpus.IvfK).filter(p =>
          p <= graft.queries.Corpus.IvfProbes + 1 || p == graft.queries.Corpus.IvfK)
        val curve = graft.queries.Corpus.ivfRecallCurve(spark, sfDir, depths)
        val atDefault = curve.toMap.getOrElse(graft.queries.Corpus.IvfProbes,
          curve.last._2)
        f""","ivf_recall_at_3":$atDefault%.4f,"ivf_probes_default":${graft.queries.Corpus.IvfProbes},""" +
          s""""ivf_recall_curve":{${curve.map { case (p, r) => f""""$p":$r%.4f""" }.mkString(",")}}"""
      } finally spark.stop()
    }
    def jstr(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replaceAll("[\\n\\r\\t]", " ") + "\""
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val fs = failures.map { case (k, v) => "\"" + k + "\":" + jstr(v) }.mkString("{", ",", "}")
    val os = observed.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0

    // 2) ER scaling: identical corpus (seeded, partition-count-independent
    //    generation) at local[N] then local[4N]; min wall of REPS runs per
    //    leg, legs interleaved, full census emitted
    val scaling = if (skipScaling) "" else {
      val dpe = sys.env.getOrElse("SPARK_GRAFT_BENCH_DPE", "3").toInt
      val cfg = GenConfig(numEntities = entities, docsPerEntity = dpe, seed = 42L)
      // write the deterministic corpus ONCE (generation is
      // partition-count-independent, so every leg sees identical input
      // whether generated or read; reading is what a real deployment does
      // and keeps fixture-generation CPU out of the measured legs)
      val corpusDir = s"$localDir-corpus"
      locally {
        val s = session(cpus)
        try DocGen.docs(s, cfg).toDF()
          .write.mode("overwrite").parquet(corpusDir)
        finally s.stop()
      }
      val nSmall = sys.env.getOrElse("SPARK_GRAFT_SCALE_N", "1").toInt
      // 3 N + 5 4N legs ≈ 21 min of legs — with queries + curve the whole
      // bench stays safely inside a 30-min budget (the round-2 driver run
      // took 1,293 s; the veto/median estimator, not raw rep count, is
      // the load defense)
      val reps = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "5").toInt
      val repsN = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS_N", "3").toInt
      val vetoF = sys.env.getOrElse("SPARK_GRAFT_SCALE_CPU_VETO", "1.25").toDouble
      // interleave the legs so a slow ambient window hits at most one run
      // of each side, then take the best run per leg; the tmpfs corpus is
      // shared RAM — delete it even when a leg throws
      val legs = scala.collection.mutable.ArrayBuffer.empty[Leg]
      try {
        (0 until math.max(reps, repsN)).foreach { i =>
          if (i < repsN) legs += erRun(nSmall, i, corpusDir)
          if (i < reps) legs += erRun(nSmall * 4, i, corpusDir)
        }
      } finally new scala.reflect.io.Directory(new java.io.File(corpusDir)).deleteRecursively()
      val est = officialEstimate(legs.toSeq, nSmall, vetoF)
      require(est.bestN.docs == est.best4.docs,
        s"non-deterministic corpus: ${est.bestN.docs} != ${est.best4.docs}")
      val tpN = est.bestN.docs / est.bestN.wall
      val tp4 = est.best4.docs / est.best4.wall
      s""","er_scaling":{"docs":${est.bestN.docs},"scale_n":$nSmall,"reps":$reps,"reps_n":$repsN,""" +
        s""""cpu_veto_factor":$vetoF,""" +
        s""""tN_sec":${est.bestN.wall},"t4N_sec":${est.best4.wall},""" +
        s""""docs_per_sec_N":$tpN,"docs_per_sec_4N":$tp4,"scaling_efficiency":${est.efficiency},""" +
        f""""pair_efficiencies":[${est.pairEffs.map(e => f"$e%.4f").mkString(",")}],""" +
        f""""pair_efficiency_median":${est.pairMedian}%.4f,""" +
        f""""pair_efficiencies_vetted":[${est.pairEffsVetted.map(e => f"$e%.4f").mkString(",")}],""" +
        f""""pair_efficiency_median_vetted":${est.pairMedianVetted}%.4f,""" +
        s""""er_legs":[${legs.map(l => l.json(est.vetoed((l.threads, l.rep)))).mkString(",")}]}"""
    }

    // 3) incremental ER: extend a COMMITTED base run with +10% new docs
    //    via addDocuments and compare against the full batch re-run over
    //    the union — the operation a standing deployment performs per
    //    arrival batch (the speedup is what makes increments worth their
    //    snapshot storage). Corpora are pre-written parquet (fixture
    //    generation untimed, same rule as the scaling legs); the batch
    //    base runs FIRST in the shared session, so codegen/JIT warm-up
    //    biases AGAINST the increment, never for it.
    val incr = if (sys.env.getOrElse("SPARK_GRAFT_SKIP_INCR", "0") == "1") ""
    else {
      val dpe = sys.env.getOrElse("SPARK_GRAFT_BENCH_DPE", "3").toInt
      val baseCfg = GenConfig(numEntities = entities, docsPerEntity = dpe, seed = 42L)
      val addCfg = baseCfg.copy(numEntities = math.max(entities / 10, 1), seed = 1042L)
      val baseDir = s"$localDir-incr-base"
      val addDir = s"$localDir-incr-add"
      val runDirI = s"$localDir-incr-run"
      val spark = session(cpus)
      spark.conf.set("spark.sql.files.maxPartitionBytes", (16L * 1024 * 1024).toString)
      try {
        import spark.implicits._
        DocGen.docs(spark, baseCfg).toDF().write.mode("overwrite").parquet(baseDir)
        DocGen.docs(spark, addCfg).map(d => d.copy(doc_id = "n" + d.doc_id)).toDF()
          .write.mode("overwrite").parquet(addDir)
        val t0 = System.nanoTime()
        val base = EntityResolution.run(spark, spark.read.parquet(baseDir),
          runDir = Some(runDirI), runId = "bench-base")
        val nBase = base.assignments.count()
        base.release()
        val tBase = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val inc = EntityResolution.addDocuments(spark, spark.read.parquet(addDir), runDirI,
          runId = "bench-incr")
        val nTotal = inc.assignments.count()
        val tIncr = (System.nanoTime() - t1) / 1e9
        val t2 = System.nanoTime()
        // the union re-run ALSO commits to a run dir: the alternative a
        // standing deployment actually has is "re-run batch AND commit the
        // outputs it serves", so both sides pay the same snapshot writes
        val union = EntityResolution.run(spark,
          spark.read.parquet(baseDir).unionByName(spark.read.parquet(addDir)),
          runDir = Some(s"$localDir-incr-union"), runId = "bench-union")
        val nUnion = union.assignments.count()
        union.release()
        val tUnion = (System.nanoTime() - t2) / 1e9
        // correctness guard rides in the artifact (untimed): pairwise F1 of
        // the INCREMENTED assignments against the combined gold
        val gold = DocGen.gold(spark, baseCfg).toDF().unionByName(
          DocGen.gold(spark, addCfg)
            .map(g => g.copy(doc_id = "n" + g.doc_id, entity_id = "n" + g.entity_id)).toDF())
        val m = graft.eval.Eval.pairwiseF1(inc.assignments,
          EntityResolution.labeledPairs(inc.blocking, gold))
        val nAdd = nTotal - nBase
        // RETRACTION leg: remove the just-added 60k from the incremented
        // run. The surviving corpus IS the base corpus, so (a) the honest
        // batch-re-run comparator is tBase itself, and (b) the add→remove
        // ROUND TRIP must land back on the base clustering exactly — the
        // strongest end-to-end check a removal can offer, measured per
        // round in the artifact
        val t3 = System.nanoTime()
        val rm = EntityResolution.removeDocuments(spark,
          spark.read.parquet(addDir).select("doc_id"), runDirI, runId = "bench-rm")
        val nAfterRm = rm.assignments.count()
        val tRm = (System.nanoTime() - t3) / 1e9
        val baseAsg = graft.ckpt.Snapshots.loadSnapshot(
          spark, runDirI, "cluster_assignments", 0L).select("doc_id", "cluster_id")
        val rtAsg = rm.assignments.select("doc_id", "cluster_id")
        val rtDiff = rtAsg.exceptAll(baseAsg).count() + baseAsg.exceptAll(rtAsg).count()
        // AUDIT leg: price the post-clustering cohesion census + weak-cut
        // repair (Main --audit-repair) against the committed run the removal
        // just left behind — the standing-deployment maintenance verb. The
        // uniform corpus carries a tiny merge tail of its own at this scale
        // (f1_incremental above is not exactly 1), so a small nonzero cut
        // count is the audit WORKING; the before/after F1 against the base
        // gold (computed untimed) proves per round that the cuts buy
        // precision without costing recall.
        val t4 = System.nanoTime()
        val aud = EntityResolution.auditRepair(spark, runDirI, runId = "bench-audit")
        val nAud = aud.assignments.count()
        val tAud = (System.nanoTime() - t4) / 1e9
        // the IDLE-cadence price: the audit above stamped the watermark, so
        // an incremental re-audit scopes to zero clusters — the recurring
        // cost a healthy stream pays at every --audit-every point (log scan
        // + one empty cogroup), vs tAud's full O(corpus-edges) pass
        val t5 = System.nanoTime()
        val audIncr = EntityResolution.auditRepair(spark, runDirI,
          runId = "bench-audit-incr", incremental = true)
        val tAudIncr = (System.nanoTime() - t5) / 1e9
        val scopeIncr = audIncr.counters.getOrElse("audit_scope_clusters", -1L)
        val baseGold = DocGen.gold(spark, baseCfg).toDF()
        val labeledBase = EntityResolution.labeledPairs(rm.blocking, baseGold).cache()
        val audBefore = graft.eval.Eval.pairwiseF1(rm.assignments, labeledBase)
        val audAfter = graft.eval.Eval.pairwiseF1(aud.assignments, labeledBase)
        aud.release()
        // MERGE-AUDIT leg: price the recall-side twin (Main --merge-repair)
        // against the run the cut audit just committed — the deployment
        // order a standing service runs (cut first, then merge; the fresh
        // tombstones veto any re-merge of just-cut boundaries, and the
        // vetoed_tombstone counter shows that guard firing in the artifact).
        // On a healthy uniform corpus qualified≈0 is the expected result —
        // the leg then prices the pure census scan, the recurring cost of
        // ASKING whether anything split. F1 before == the audit's after
        // (same committed assignments); after is computed untimed.
        val t6 = System.nanoTime()
        val mrg = EntityResolution.mergeRepair(spark, runDirI, runId = "bench-merge")
        val nMrg = mrg.assignments.count()
        val tMrg = (System.nanoTime() - t6) / 1e9
        val mrgAfter = graft.eval.Eval.pairwiseF1(mrg.assignments, labeledBase)
        labeledBase.unpersist()
        mrg.release()
        f""","er_increment":{"docs_base":$nBase,"docs_added":$nAdd,"docs_union":$nUnion,""" +
          f""""batch_base_sec":$tBase%.3f,"incr_sec":$tIncr%.3f,"batch_union_sec":$tUnion%.3f,""" +
          f""""incr_speedup_vs_rerun":${tUnion / tIncr}%.3f,""" +
          f""""added_docs_per_sec":${nAdd / tIncr}%.1f,"f1_incremental":${m.f1}%.6f,""" +
          f""""pairs_fresh":${inc.counters.getOrElse("pairs_fresh", -1L)}},""" +
          f""""er_removal":{"docs_removed":$nAdd,"docs_after":$nAfterRm,""" +
          f""""remove_sec":$tRm%.3f,"removed_docs_per_sec":${nAdd / tRm}%.1f,""" +
          f""""remove_speedup_vs_rerun":${tBase / tRm}%.3f,""" +
          f""""pairs_removed":${rm.counters.getOrElse("pairs_removed", -1L)},""" +
          f""""heal_pairs_scored":${rm.counters.getOrElse("heal_pairs_scored", -1L)},""" +
          f""""roundtrip_assignment_diff":$rtDiff},""" +
          f""""er_audit":{"docs":$nAud,"audit_repair_sec":$tAud%.3f,""" +
          f""""docs_per_sec":${nAud / tAud}%.1f,""" +
          f""""audit_incremental_idle_sec":$tAudIncr%.3f,""" +
          f""""audit_incremental_scope_clusters":$scopeIncr,""" +
          f""""edges_cut":${aud.counters.getOrElse("audit_bridges_cut", -1L)},""" +
          f""""clusters_cut":${aud.counters.getOrElse("audit_clusters_cut", -1L)},""" +
          f""""clusters_over_cap":${aud.counters.getOrElse("audit_clusters_over_cap", -1L)},""" +
          f""""f1_before":${audBefore.f1}%.6f,"f1_after":${audAfter.f1}%.6f,""" +
          f""""precision_before":${audBefore.precision}%.6f,""" +
          f""""precision_after":${audAfter.precision}%.6f,""" +
          f""""recall_before":${audBefore.recall}%.6f,""" +
          f""""recall_after":${audAfter.recall}%.6f},""" +
          f""""er_merge":{"docs":$nMrg,"merge_repair_sec":$tMrg%.3f,""" +
          f""""docs_per_sec":${nMrg / tMrg}%.1f,""" +
          f""""cluster_pairs_seen":${mrg.counters.getOrElse("merge_cluster_pairs_seen", -1L)},""" +
          f""""cluster_pairs_qualified":${mrg.counters.getOrElse("merge_cluster_pairs_qualified", -1L)},""" +
          f""""vetoed_tombstone":${mrg.counters.getOrElse("merge_vetoed_tombstone", -1L)},""" +
          f""""vetoed_conflict":${mrg.counters.getOrElse("merge_vetoed_conflict", -1L)},""" +
          f""""below_evidence":${mrg.counters.getOrElse("merge_pairs_below_evidence", -1L)},""" +
          f""""below_coverage":${mrg.counters.getOrElse("merge_pairs_below_coverage", -1L)},""" +
          f""""clusters_merged":${mrg.counters.getOrElse("merge_clusters_merged", -1L)},""" +
          f""""docs_relabeled":${mrg.counters.getOrElse("merge_docs_relabeled", -1L)},""" +
          f""""pairs_promoted":${mrg.counters.getOrElse("merge_pairs_promoted", -1L)},""" +
          f""""committed":${mrg.counters.getOrElse("merge_committed", -1L)},""" +
          f""""f1_before":${audAfter.f1}%.6f,"f1_after":${mrgAfter.f1}%.6f,""" +
          f""""precision_before":${audAfter.precision}%.6f,""" +
          f""""precision_after":${mrgAfter.precision}%.6f,""" +
          f""""recall_before":${audAfter.recall}%.6f,""" +
          f""""recall_after":${mrgAfter.recall}%.6f}"""
      } finally {
        spark.stop()
        import scala.reflect.io.Directory
        Seq(baseDir, addDir, runDirI, s"$localDir-incr-union").foreach(d =>
          new Directory(new java.io.File(d)).deleteRecursively())
      }
    }

    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$fs,"observed":$os,"sf":"$sfDir"$ivfRecall$scaling$incr}""")
    // tmpfs shuffle dir is shared RAM — never leave OUR dir populated
    // (other processes' dirs are theirs to clean)
    import scala.reflect.io.Directory
    new Directory(new java.io.File(localDir)).deleteRecursively()
  }
}
