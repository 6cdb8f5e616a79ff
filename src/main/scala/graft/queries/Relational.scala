package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator battery over the driver's testdata tables — one
  * query per operator family of SURVEY.md §2, each with a DuckDB oracle in
  * SparkEntry.oracleSql.
  *
  * Output-schema discipline (oracle hash safety): BIGINT / STRING / doubles
  * that are bit-stable across engines (ratios of exact integers, decimal→
  * double casts); no raw double SUMs (summation order differs), no
  * timestamps/decimals in output.
  */
object Relational {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** A2/A3: pricing summary — hash agg with partial aggregation (map-side
    * combine; reference: reduceByKey, CountPassengerFlow.scala:16-20).
    */
  def q01_pricing_summary(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity").cast("bigint")).as("sum_qty"),
        (sum(col("l_extendedprice").cast("decimal(18,2)")) * 100).cast("bigint").as("sum_price_cents"),
        count(lit(1)).as("n"))
      .withColumn("avg_qty", col("sum_qty").cast("double") / col("n"))

  /** S3/P2/P4: scan + projection + predicate pushdown (reference:
    * MacCompression.scala:20-25 parquet select/filter).
    */
  def q02_filter_project(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .where(col("l_shipdate") >= lit("1995-01-01") && col("l_shipdate") < lit("1995-03-01")
        && col("l_quantity") > 45)
      .select(col("l_orderkey"), col("l_linenumber").cast("bigint").as("l_linenumber"),
        col("l_quantity").cast("bigint").as("qty"))

  /** J1: dimension enrichment via broadcast-hash join (reference: broadcast
    * map lookup, Model.scala:36-39) — revenue per nation.
    */
  def q03_join_agg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .join(broadcast(t(spark, dir, "customer")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(spark, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        (sum(col("o_totalprice").cast("decimal(18,2)")) * 100).cast("bigint").as("revenue_cents"),
        count(lit(1)).as("n_orders"))

  /** P5 (semi): customers having an order in a window — left_semi join
    * (reference: broadcast-set membership, FilterGroundTruth.scala:37).
    */
  def q04_semi_join(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
      .where(col("o_orderdate") >= lit("1995-01-01") && col("o_orderdate") < lit("1996-01-01"))
    t(spark, dir, "customer")
      .join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_mktsegment"))
  }

  /** P5 (anti): customers with no orders in H1 1995 — left_anti join
    * (reference: AFCDataForMatch.scala:28-34). Date-restricted so the
    * result is non-empty at every SF (every customer has SOME order).
    */
  def q05_anti_join(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
      .where(col("o_orderdate") >= lit("1995-01-01") && col("o_orderdate") < lit("1995-04-01"))
    t(spark, dir, "customer")
      .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_nationkey").cast("bigint").as("c_nationkey"))
  }

  /** A5: top-k per group via ranking window (reference: groupByKey +
    * sortBy.takeRight(k), Model.scala:536-539).
    */
  def q06_topk_per_group(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    t(spark, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("rn").cast("bigint").as("rn"))
  }

  /** A6: global top-N (reference: sortBy.take(100), MultiUserMatch.scala:64). */
  def q07_global_topn(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(100)
      .select(col("o_orderkey"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint").as("price_cents"))

  /** A7: fixed-bucket histogram (reference: 2-hour flow buckets,
    * SegmentsFlowDistribution.scala:147-153).
    */
  def q08_histogram(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(hour(col("ts")).cast("bigint").as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))

  /** A9: distinct (reference: ReadParquet.scala:27). */
  def q09_distinct(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events").select("user_id", "event_type").distinct()

  /** J5: union-merge with precedence — measured counts (tag 1) override
    * static defaults (tag 0) per key (reference: ODTimeInterval.scala:80-95).
    */
  def q10_union_precedence(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val measured = t(spark, dir, "events")
      .groupBy("event_type").agg(count(lit(1)).as("cnt"))
      .withColumn("tag", lit(1L))
    val static = Seq(("click", 0L, 0L), ("view", 0L, 0L), ("install", 0L, 0L))
      .toDF("event_type", "cnt", "tag")
    measured.unionByName(static)
      .groupBy("event_type")
      .agg(max_by(col("cnt"), col("tag")).as("cnt"), max(col("tag")).as("tag"))
  }

  /** W1: lead/lag pairing — consecutive events within 30 min per user
    * (reference: tap pairing, FormatSmartCardData.scala:35-48).
    */
  def q11_window_lead(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    t(spark, dir, "events")
      .withColumn("next_id", lead(col("event_id"), 1).over(w))
      .withColumn("gap_ms", lead(unix_millis(col("ts").cast("timestamp")), 1).over(w) - unix_millis(col("ts").cast("timestamp")))
      .where(col("next_id").isNotNull && col("gap_ms") <= 1800000L)
      .select(col("user_id"), col("event_id"), col("next_id"), col("gap_ms"))
  }

  /** W2/W3: sessionize — gap > 30 min starts a new session; session stats
    * (reference: trip segmentation, SplitAPData.scala:62-108).
    */
  def q12_sessionize(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    t(spark, dir, "events")
      .withColumn("prev_ms", lag(unix_millis(col("ts").cast("timestamp")), 1).over(w))
      .withColumn("new_s",
        when(col("prev_ms").isNull || unix_millis(col("ts").cast("timestamp")) - col("prev_ms") > 1800000L, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_s")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"), min(col("event_id")).as("first_event"))
  }

  /** A11: argmax per group via max_by (reference: maxBy, MostViewPath
    * .scala:137-143) — event with the highest value per user.
    */
  def q13_argmax(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy("user_id")
      .agg(max_by(col("event_id"), struct(col("value"), col("event_id"))).as("best_event"))

  /** A12: trimmed mean — (sum-min-max)/(n-2), exact decimal internals
    * (reference: BuildMacPath.scala:97-104).
    */
  def q14_trimmed_mean(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy("event_type")
      .agg(
        sum(col("value").cast("decimal(18,2)")).as("s"),
        min(col("value").cast("decimal(18,2)")).as("mn"),
        max(col("value").cast("decimal(18,2)")).as("mx"),
        count(lit(1)).as("n"))
      .select(col("event_type"),
        ((col("s") - col("mn") - col("mx")).cast("double") / (col("n") - 2)).as("trimmed_mean"),
        col("n"))

  /** A11 (mode): most frequent event_type per user, ties broken
    * lexicographically (window formulation for cross-engine determinism).
    */
  def q15_mode_per_group(spark: SparkSession, dir: String): DataFrame = {
    val counts = t(spark, dir, "events").groupBy("user_id", "event_type").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("user_id").orderBy(col("cnt").desc, col("event_type").asc)
    counts.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("mode_type"), col("cnt"))
  }

  /** J3 re-expressed: day-overlap pairs via exploded equi-join on the day
    * key (the distributed replacement for the reference's broadcast
    * crossJoin + intersect, MatchPerMonth.scala:96-111).
    *
    * The day key is STRUCTURALLY hot — every active user lands in every
    * day's block — so the join is SALTED (north rule: "salted
    * repartitioning for hot blocking keys"): side A carries a
    * deterministic salt hash(ua) % S, side B is replicated across all S
    * salt values, and the join key becomes (day, salt). Every (ua, ub,
    * day) row still joins exactly once (at A's salt), so results are
    * bit-identical, but each hot day block now splits into S parallel
    * tasks of 1/S the size — the single join no longer serializes on the
    * largest day at scale.
    */
  def q16_day_overlap_pairs(spark: SparkSession, dir: String): DataFrame = {
    val salts = 4 // replication factor: parallelism × 4 per day at 4× B-side shuffle volume
    val days = t(spark, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    // EXPLICIT partition count on the join inputs: the (user, day) relation
    // is tiny relative to the pairs the join emits, so AQE's size-based
    // coalescing would shrink the join to a couple of tasks and serialize
    // the quadratic pair generation; an explicit repartition is preserved
    val p = spark.sparkContext.defaultParallelism
    val a = days.select(col("user_id").as("ua"), col("day"))
      .withColumn("salt", pmod(xxhash64(col("ua")), lit(salts)))
      .repartition(p, col("day"), col("salt"))
    val b = days.select(col("user_id").as("ub"), col("day"))
      .withColumn("salt", explode(sequence(lit(0L), lit(salts - 1L))))
      .repartition(p, col("day"), col("salt"))
    a.join(b, Seq("day", "salt")).where(col("ua") < col("ub"))
      .groupBy("ua", "ub").agg(count(lit(1)).as("shared_days"))
      .where(col("shared_days") >= 25)
  }

  /** A8: element-wise vector aggregation — dense 24-bucket histogram per
    * event_type rendered as a string (reference: zipped array sum,
    * SegmentsFlowDistribution.scala:174-177). Dense via sequence+transform
    * over a per-type count map: explode→agg→re-collect, all columnar.
    */
  def q17_hourly_vector(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(col("event_type"), hour(col("ts")).as("h"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy("event_type")
      .agg(map_from_entries(collect_list(struct(col("h"), col("cnt")))).as("m"))
      .select(col("event_type"),
        concat_ws(",", transform(sequence(lit(0), lit(23)),
          h => coalesce(element_at(col("m"), h), lit(0L)).cast("string"))).as("hist"))

  /** J2: blocked candidate join — customer pairs in the same nation with
    * close account balances (reference blocking join: AMPI.scala:212-220;
    * the block key makes it an equi-join, the balance bound the slack).
    */
  def q18_blocked_pairs(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer").select("c_custkey", "c_nationkey", "c_acctbal")
    val a = c.select(col("c_custkey").as("ka"), col("c_nationkey").as("nk"), col("c_acctbal").as("ba"))
    val b = c.select(col("c_custkey").as("kb"), col("c_nationkey").as("nk"), col("c_acctbal").as("bb"))
    a.join(b, "nk").where(col("ka") < col("kb") && abs(col("ba") - col("bb")) < 1.0)
      .groupBy(col("nk").cast("bigint").as("nationkey"))
      .agg(count(lit(1)).as("n_pairs"))
  }
}
