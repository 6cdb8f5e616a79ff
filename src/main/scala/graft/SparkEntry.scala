package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.Relational

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every operator claimed in SURVEY.md §2 has a `queries` entry; those with
  * ANSI-SQL-expressible semantics also have a DuckDB oracle in `oracleSql`.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q01_pricing_summary(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> Relational.q01_pricing_summary _,
    "q02_filter_project" -> Relational.q02_filter_project _,
    "q03_join_agg" -> Relational.q03_join_agg _,
    "q04_semi_join" -> Relational.q04_semi_join _,
    "q05_anti_join" -> Relational.q05_anti_join _,
    "q06_topk_per_group" -> Relational.q06_topk_per_group _,
    "q07_global_topn" -> Relational.q07_global_topn _,
    "q08_histogram" -> Relational.q08_histogram _,
    "q09_distinct" -> Relational.q09_distinct _,
    "q10_union_precedence" -> Relational.q10_union_precedence _,
    "q11_window_lead" -> Relational.q11_window_lead _,
    "q12_sessionize" -> Relational.q12_sessionize _,
    "q13_argmax" -> Relational.q13_argmax _,
    "q14_trimmed_mean" -> Relational.q14_trimmed_mean _,
    "q15_mode_per_group" -> Relational.q15_mode_per_group _,
    "q16_day_overlap_pairs" -> Relational.q16_day_overlap_pairs _,
    "q17_hourly_vector" -> Relational.q17_hourly_vector _,
    "q18_blocked_pairs" -> Relational.q18_blocked_pairs _,
  )

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_price_cents,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_qty
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_project" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  CAST(l_quantity AS BIGINT) AS qty
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1995-03-01'
        |  AND l_quantity > 45""".stripMargin,
    "q03_join_agg" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS revenue_cents,
        |  COUNT(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,
    "q04_semi_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |  AND o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01')""".stripMargin,
    "q05_anti_join" ->
      """SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS c_nationkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "q06_topk_per_group" ->
      """SELECT o_custkey, o_orderkey, CAST(rn AS BIGINT) AS rn FROM (
        |  SELECT o_custkey, o_orderkey,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) WHERE rn <= 3""".stripMargin,
    "q07_global_topn" ->
      """SELECT o_orderkey,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_cents
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin,
    "q08_histogram" ->
      """SELECT CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour, event_type, COUNT(*) AS n
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q09_distinct" ->
      "SELECT DISTINCT user_id, event_type FROM events",
    "q10_union_precedence" ->
      """WITH u AS (
        |  SELECT event_type, COUNT(*) AS cnt, CAST(1 AS BIGINT) AS tag FROM events GROUP BY 1
        |  UNION ALL
        |  SELECT * FROM (VALUES ('click', CAST(0 AS BIGINT), CAST(0 AS BIGINT)),
        |    ('view', 0, 0), ('install', 0, 0)) v(event_type, cnt, tag))
        |SELECT event_type, arg_max(cnt, tag) AS cnt, MAX(tag) AS tag FROM u GROUP BY 1""".stripMargin,
    "q11_window_lead" ->
      """SELECT user_id, event_id, next_id, gap_ms FROM (
        |  SELECT user_id, event_id,
        |    LEAD(event_id) OVER w AS next_id,
        |    LEAD(epoch_ms(ts)) OVER w - epoch_ms(ts) AS gap_ms
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC))
        |WHERE next_id IS NOT NULL AND gap_ms <= 1800000""".stripMargin,
    "q12_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
        |           OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 1800000
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
        |s AS (
        |  SELECT user_id, event_id,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM g)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  COUNT(*) AS n_events, MIN(event_id) AS first_event
        |FROM s GROUP BY user_id, session_id""".stripMargin,
    "q13_argmax" ->
      """SELECT user_id, event_id AS best_event FROM (
        |  SELECT user_id, event_id,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1""".stripMargin,
    "q14_trimmed_mean" ->
      """SELECT event_type,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) - MIN(CAST(value AS DECIMAL(18,2)))
        |       - MAX(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / (COUNT(*) - 2) AS trimmed_mean,
        |  COUNT(*) AS n
        |FROM events GROUP BY event_type""".stripMargin,
    "q15_mode_per_group" ->
      """SELECT user_id, event_type AS mode_type, cnt FROM (
        |  SELECT user_id, event_type, COUNT(*) AS cnt,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY COUNT(*) DESC, event_type ASC) AS rn
        |  FROM events GROUP BY user_id, event_type) WHERE rn = 1""".stripMargin,
    "q16_day_overlap_pairs" ->
      """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
        |SELECT a.user_id AS ua, b.user_id AS ub, COUNT(*) AS shared_days
        |FROM days a JOIN days b ON a.day = b.day AND a.user_id < b.user_id
        |GROUP BY 1, 2 HAVING COUNT(*) >= 25""".stripMargin,
    "q17_hourly_vector" ->
      """WITH c AS (
        |  SELECT event_type, CAST(EXTRACT(hour FROM ts) AS BIGINT) AS h, COUNT(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |grid AS (
        |  SELECT DISTINCT event_type, h2.h FROM c, (SELECT UNNEST(generate_series(0, 23)) AS h) h2)
        |SELECT g.event_type,
        |  string_agg(CAST(COALESCE(c.cnt, 0) AS VARCHAR), ',' ORDER BY g.h) AS hist
        |FROM grid g LEFT JOIN c ON g.event_type = c.event_type AND g.h = c.h
        |GROUP BY g.event_type""".stripMargin,
    "q18_blocked_pairs" ->
      """SELECT CAST(a.c_nationkey AS BIGINT) AS nationkey, COUNT(*) AS n_pairs
        |FROM customer a JOIN customer b
        |  ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
        |  AND ABS(a.c_acctbal - b.c_acctbal) < 1.0
        |GROUP BY 1""".stripMargin,
  )
}
