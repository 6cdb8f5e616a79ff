package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Transitive clustering: iterative DataFrame connected components via
  * alternating large-star / small-star (Kiveris et al., "Connected
  * Components in MapReduce and Beyond", SoCC'14) — the north-rule
  * generalization of the reference's top-1-per-AP assignment
  * (Model.scala:536-539; top-1 is the degenerate star case).
  *
  * Works over STRING node ids with lexicographic order (cluster_id =
  * min doc_id, FIXTURES.md §3) — no fragile 64-bit-hash node mapping, so
  * no collision risk at 10^12 nodes.
  *
  * Each iteration persists + materializes the new edge set and truncates
  * lineage via localCheckpoint, so the plan does not grow unboundedly.
  */
object ConnectedComponents {

  /** One large-star step: connect every neighbor larger than u to the min
    * of u's closed neighborhood. Input/output: canonical edges (src, dst).
    *
    * SORT-BASED one-pass min (round-4): a window min over the
    * neighborhood replaces the round-3 collect_set + explode — the stage
    * census showed the per-key hash-set build + array explode as CC's
    * ~1.8–2.5× task-CPU inflation at 4 threads (allocation churn is
    * memory bandwidth). The window's Tungsten sort touches no per-key
    * heap objects and SPILLS on hub nodes where a collected set would
    * OOM; row count in = row count out (loop-state edges are distinct, so
    * no duplicate blow-up), and the downstream smallStar distinct dedups
    * exactly as before.
    */
  private[graft] def largeStar(edges: DataFrame): DataFrame = {
    val bidir = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("src"))
    bidir
      .select(col("src"), col("dst"), least(min(col("dst")).over(w), col("src")).as("m"))
      .where(col("dst") > col("src"))
      .select(col("dst").as("src"), col("m").as("dst"))
      .where(col("src") =!= col("dst"))
  }

  /** One small-star step: among edges oriented high→low, connect all of
    * u's smaller neighbors (and u) to the minimum. Sort-based like
    * largeStar; the u→m edge of the closed neighborhood is emitted once
    * per input row (u > v ≥ m, so u ≠ m always) and the trailing distinct
    * — which the algorithm needs anyway — dedups.
    */
  private[graft] def smallStar(edges: DataFrame): DataFrame = {
    val oriented = edges.select(
      greatest(col("src"), col("dst")).as("u"),
      least(col("src"), col("dst")).as("v"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("u"))
    val withM = oriented.select(col("u"), col("v"), min(col("v")).over(w).as("m"))
    withM.where(col("v") =!= col("m"))
      .select(col("v").as("src"), col("m").as("dst"))
      .union(withM.select(col("u").as("src"), col("m").as("dst")))
      .distinct()
  }

  /** Run to convergence; returns (node -> component-min) assignments for
    * every node appearing in `edges`, plus the iteration count.
    */
  private def canonical(e: DataFrame): DataFrame =
    e.select(least(col("src"), col("dst")).as("src"),
             greatest(col("src"), col("dst")).as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()

  /** Order-insensitive edge-set signature: (count, xor of row hashes) —
    * xor never overflows and the edge set is distinct, so duplicates can't
    * cancel. One aggregate job replaces the count + exceptAll convergence
    * test per iteration; when signatures FIRST match, one exact exceptAll
    * confirmation pass runs (a single extra job total), so convergence is
    * never declared on a hash collision — the engine's bit-exactness
    * guarantee holds unconditionally.
    */
  private def signature(e: DataFrame): (Long, Long) = {
    // hash the ORIENTATION-NORMALIZED pair per row: smallStar output is
    // already distinct (its trailing .distinct()), so no extra distinct
    // shuffle is needed before hashing — the signature aggregate is a
    // map-only pass over the checkpointed edges
    val r = e.select(
      count(lit(1)).as("n"),
      coalesce(bit_xor(xxhash64(
        least(col("src"), col("dst")), greatest(col("src"), col("dst")))), lit(0L)).as("h"))
      .collect()(0)
    (r.getLong(0), r.getLong(1))
  }

  /** CC output with the loop's surviving localCheckpoint handle: the final
    * edge set's checkpoint RDD backs `assignments`, so it can only be
    * freed once the caller is DONE with them (a localCheckpointed RDD has
    * truncated lineage — unpersisting it makes the data unrecoverable,
    * not recomputable). Intermediate iterations' checkpoints are freed
    * inside the loop as they are superseded.
    */
  final case class CcResult(assignments: DataFrame, iterations: Int,
                            checkpointIds: Set[Int]) {
    def releaseCheckpoints(spark: SparkSession): Unit =
      checkpointIds.foreach(id =>
        spark.sparkContext.getPersistentRDDs.get(id).foreach(_.unpersist(false)))
  }

  /** localCheckpoint + capture of the persistent-RDD ids it registered
    * (RDD.localCheckpoint persists immediately, even with eager=false), so
    * the loop can free superseded checkpoints instead of leaking one per
    * iteration per run.
    */
  private def localCkpt(df: DataFrame): (DataFrame, Set[Int]) = {
    val sc = df.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val ck = df.localCheckpoint(false)
    (ck, sc.getPersistentRDDs.keySet.diff(before).toSet)
  }

  private def free(spark: SparkSession, ids: Set[Int]): Unit =
    ids.foreach(id => spark.sparkContext.getPersistentRDDs.get(id).foreach(_.unpersist(false)))

  def run(spark: SparkSession, edges0: DataFrame, maxIter: Int = 50): (DataFrame, Int) = {
    val r = runTracked(spark, edges0, maxIter)
    (r.assignments, r.iterations)
  }

  def runTracked(spark: SparkSession, edges0: DataFrame, maxIter: Int = 50): CcResult = {
    // AQE off for the loop only: each iteration is a small fixed-shape
    // two-shuffle plan, and AQE's per-query-stage re-planning adds driver
    // round-trips per iteration that dominate at high parallelism (the
    // loop is driver-latency-bound, BENCH/BASELINE.md); the big skewed
    // stages that need AQE live upstream in blocking/scoring
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      runLoop(spark, edges0, maxIter)
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
  }

  private def runLoop(spark: SparkSession, edges0: DataFrame, maxIter: Int): CcResult = {
    // loop state keeps smallStar's (node → smaller) orientation; the
    // canonical (lo,hi) form is used only for the convergence signature
    var (edges, edgeIds) = localCkpt(canonical(edges0))
    var prevSig = signature(edges)
    // Size the loop's fixed-shape shuffles to the EDGE COUNT (known from
    // the first signature), not the session's 4×-cores default: the loop
    // runs ~6 tiny stages per iteration, and at the default decomposition
    // the per-task fixed cost (codegen init, scheduling) — not data —
    // dominated CC's 4-thread task-CPU census. ~250k edge rows per
    // partition, clamped to [cores, 4·cores] so a huge edge set still
    // over-decomposes for skew and a small one still uses every core.
    val cores = spark.sparkContext.defaultParallelism
    val loopParts = math.max(cores,
      math.min(4L * cores, prevSig._1 / 250000L + 1L).toInt)
    val partsBefore = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", loopParts)
    var iter = 0
    var converged = false
    try {
      while (!converged && iter < maxIter) {
        val (ss, ssIds) = localCkpt(smallStar(largeStar(edges)))
        val nextSig = signature(ss)
        // exact confirmation on signature match: counts are equal (part of
        // the signature), so a one-direction empty exceptAll proves set
        // equality — both inputs recompute from checkpointed parents
        converged = nextSig == prevSig &&
          canonical(ss).exceptAll(canonical(edges)).isEmpty
        // the superseded checkpoint is dead: the convergence check above
        // was its last consumer this iteration
        free(spark, edgeIds)
        edges = ss
        edgeIds = ssIds
        iter += 1
        prevSig = nextSig
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", partsBefore)
    // at fixpoint every edge is (node, componentMin) with node > min;
    // component mins themselves map to themselves
    val assign = edges.select(col("src").as("doc_id"), col("dst").as("cluster_id"))
      .union(edges.select(col("dst").as("doc_id"), col("dst").as("cluster_id")))
      .groupBy("doc_id").agg(min("cluster_id").as("cluster_id"))
    CcResult(assign, iter, edgeIds)
  }

  /** Full assignment for all docs: nodes with no surviving edge form
    * singleton clusters (cluster_id = own doc_id).
    */
  def assignAll(spark: SparkSession, allDocIds: DataFrame, edges: DataFrame,
                maxIter: Int = 50): (DataFrame, Int) = {
    val r = assignAllTracked(spark, allDocIds, edges, maxIter)
    (r.assignments, r.iterations)
  }

  /** assignAll with the final-checkpoint handle (see CcResult): callers
    * that materialize the assignments durably (or are done with them)
    * release the last checkpoint via releaseCheckpoints.
    */
  def assignAllTracked(spark: SparkSession, allDocIds: DataFrame, edges: DataFrame,
                       maxIter: Int = 50): CcResult = {
    val r = runTracked(spark, edges, maxIter)
    val out = allDocIds.select(col("doc_id"))
      .join(r.assignments, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
    CcResult(out, r.iterations, r.checkpointIds)
  }
}
