package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.{Corpus, Relational, Sources, Trajectory}

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
    "q19_dedup_exact" -> Corpus.q19_dedup_exact _,
    "q20_dedup_minhash_lsh" -> Corpus.q20_dedup_minhash_lsh _,
    "q21_dedup_ngram_jaccard" -> Corpus.q21_dedup_ngram_jaccard _,
    "q22_dedup_simhash" -> Corpus.q22_dedup_simhash _,
    "q23_embed_cosine_topk" -> Corpus.q23_embed_cosine_topk _,
    "q24_embed_neardup" -> Corpus.q24_embed_neardup _,
    "q25_embed_ivf_topk" -> Corpus.q25_embed_ivf_topk _,
    "q26_langid" -> Corpus.q26_langid _,
    "q27_quality_score" -> Corpus.q27_quality_score _,
    "q28_token_count" -> Corpus.q28_token_count _,
    "q29_fingerprint" -> Corpus.q29_fingerprint _,
    "q30_media_features" -> Corpus.q30_media_features _,
    "q31_sessionize_dyngap" -> Trajectory.q31_sessionize_dyngap _,
    "q32_subsequence_match" -> Trajectory.q32_subsequence_match _,
    "q33_kde_patterns" -> Trajectory.q33_kde_patterns _,
    "q34_haversine" -> Trajectory.q34_haversine _,
    "q35_weighted_jaccard" -> Trajectory.q35_weighted_jaccard _,
    "q36_er_cluster" -> Trajectory.q36_er_cluster _,
    "q37_collision_scan" -> Trajectory.q37_collision_scan _,
    "q38_hash_sample" -> Trajectory.q38_hash_sample _,
    "q39_lev_similarity" -> Trajectory.q39_lev_similarity _,
    "q40_conflict_pairs" -> Trajectory.q40_conflict_pairs _,
    "q41_lcs_positional" -> Trajectory.q41_lcs_positional _,
    "q42_sov_ratio" -> Trajectory.q42_sov_ratio _,
    "q43_trip_completion" -> Trajectory.q43_trip_completion _,
    "q44_partitioned_scan" -> Sources.q44_partitioned_scan _,
    "q47_pattern_completion" -> Trajectory.q47_pattern_completion _,
    "q48_weekly_monthly" -> Trajectory.q48_weekly_monthly _,
    "q45_sql_view" -> Sources.q45_sql_view _,
    "q46_csv_scan" -> Sources.q46_csv_scan _,
  )

  /** q25's oracle replays the EXACT k-means-IVF computation: the same
    * seeded init over `Corpus.IvfK` cells, the same `Corpus.IvfKmeansIters`
    * Lloyd rounds unrolled as CTEs (floored-integer centroid means keep
    * every cosine an exact integer-dot ratio), the same
    * `Corpus.IvfProbes`-deep multi-probe. Generated so neither the round
    * count nor the recall dial can ever drift between engine and oracle.
    */
  private def q25OracleSql: String = {
    val k = Corpus.IvfK; val probes = Corpus.IvfProbes; val iters = Corpus.IvfKmeansIters
    def cos(qa: String, qb: String, n2a: String, n2b: String) =
      s"CAST(list_sum([$qa[i] * $qb[i] for i in generate_series(1, len($qa))]) AS DOUBLE)" +
        s" / (sqrt(CAST($n2a AS DOUBLE)) * sqrt(CAST($n2b AS DOUBLE)))"
    val rounds = (1 to iters).map { r =>
      val prev = s"c${r - 1}"
      s"""a$r AS (SELECT vec_id, cell FROM (
         |  SELECT n.vec_id, c.cent_id AS cell,
         |    ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY ${cos("n.q", "c.cq", "n.n2", "c.cn2")} DESC, c.cent_id ASC) AS rn
         |  FROM n CROSS JOIN $prev c) WHERE rn = 1),
         |m$r AS (SELECT cell, i.i AS i, CAST(floor(CAST(SUM(n.q[i.i]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS m
         |  FROM a$r a JOIN n USING (vec_id)
         |  CROSS JOIN (SELECT unnest(generate_series(1, (SELECT len(q) FROM n LIMIT 1))) AS i) i
         |  GROUP BY 1, 2),
         |cc$r AS (SELECT cell AS cent_id, list(m ORDER BY i) AS cq FROM m$r GROUP BY 1),
         |c$r AS (SELECT p.cent_id, COALESCE(cc.cq, p.cq) AS cq,
         |    CAST(list_sum([x * x for x in COALESCE(cc.cq, p.cq)]) AS BIGINT) AS cn2
         |  FROM $prev p LEFT JOIN cc$r cc ON cc.cent_id = p.cent_id)""".stripMargin
    }.mkString(",\n")
    s"""WITH n AS (SELECT vec_id, q, CAST(list_sum([y*y for y in q]) AS BIGINT) AS n2 FROM (
       |    SELECT vec_id, [CAST(round(CAST(x AS DOUBLE)*1000000) AS BIGINT) for x in embedding] AS q FROM embeddings)),
       |c0 AS (SELECT vec_id AS cent_id, q AS cq, n2 AS cn2 FROM n WHERE vec_id < $k),
       |$rounds,
       |af AS (SELECT vec_id, cell FROM (
       |  SELECT n.vec_id, c.cent_id AS cell,
       |    ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY ${cos("n.q", "c.cq", "n.n2", "c.cn2")} DESC, c.cent_id ASC) AS rn
       |  FROM n CROSS JOIN c$iters c) WHERE rn = 1),
       |qs AS (SELECT vec_id AS query_id, q AS qq, n2 AS qn2 FROM n WHERE vec_id < 20),
       |probes AS (SELECT query_id, cell FROM (
       |  SELECT q0.query_id, c.cent_id AS cell,
       |    ROW_NUMBER() OVER (PARTITION BY q0.query_id ORDER BY ${cos("q0.qq", "c.cq", "q0.qn2", "c.cn2")} DESC, c.cent_id ASC) AS pr
       |  FROM qs q0 CROSS JOIN c$iters c) WHERE pr <= $probes),
       |cand AS (SELECT p.query_id, af.vec_id FROM probes p JOIN af ON af.cell = p.cell),
       |sc AS (SELECT cd.query_id, cd.vec_id AS neighbor_id,
       |    ${cos("nv.q", "q0.qq", "nv.n2", "q0.qn2")} AS cos
       |  FROM cand cd JOIN n nv ON nv.vec_id = cd.vec_id JOIN qs q0 ON q0.query_id = cd.query_id
       |  WHERE cd.vec_id <> cd.query_id)
       |SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank FROM (
       |  SELECT query_id, neighbor_id,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank FROM sc)
       |WHERE rank <= 3""".stripMargin
  }

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
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |  AND o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1995-04-01')""".stripMargin,
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
    "q19_dedup_exact" ->
      """SELECT md5(text) AS content_key, MIN(doc_id) AS keeper, COUNT(*) AS n_docs
        |FROM documents GROUP BY 1""".stripMargin,
    "q20_dedup_minhash_lsh" ->
      """WITH d AS (SELECT doc_id, list_filter(string_split(text,' '), x -> len(x)>0) AS t FROM documents),
        |s AS (SELECT doc_id,
        |  list_distinct(CASE WHEN len(t) <= 2 THEN [array_to_string(t, ' ')]
        |    ELSE [array_to_string(t[i:i+1], ' ') for i in generate_series(1, len(t)-1)] END) AS sh
        |  FROM d)
        |SELECT doc_a, doc_b, jacc_milli FROM (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    CAST(floor(1000.0 * len(list_intersect(a.sh, b.sh)) / len(list_distinct(a.sh || b.sh))) AS BIGINT) AS jacc_milli
        |  FROM s a JOIN s b ON a.doc_id < b.doc_id)
        |WHERE jacc_milli >= 500""".stripMargin,
    "q21_dedup_ngram_jaccard" ->
      """WITH d AS (SELECT doc_id, lang, source,
        |  list_distinct(list_filter(string_split(text,' '), x -> len(x)>0)) AS toks FROM documents)
        |SELECT lang, doc_a, doc_b, jacc_milli FROM (
        |  SELECT a.lang, a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    CAST(floor(1000.0 * len(list_intersect(a.toks, b.toks)) / len(list_distinct(a.toks || b.toks))) AS BIGINT) AS jacc_milli
        |  FROM d a JOIN d b ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id)
        |WHERE jacc_milli >= 800""".stripMargin,
    "q22_dedup_simhash" ->
      """WITH tok AS (SELECT doc_id, unnest(list_filter(string_split(text,' '), x -> len(x)>0)) AS tok FROM documents),
        |h AS (SELECT doc_id, ('0x' || substr(md5(tok),1,15))::BIGINT AS h FROM tok),
        |bits AS (
        |  SELECT doc_id, i.i AS i,
        |    CAST(SUM(CASE WHEN (h >> i.i) & 1 = 1 THEN 1 ELSE -1 END) AS BIGINT) AS v
        |  FROM h CROSS JOIN (SELECT unnest(generate_series(0,15)) AS i) i
        |  GROUP BY 1, 2),
        |sh AS (SELECT doc_id, CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS BIGINT) AS simhash
        |  FROM bits GROUP BY 1)
        |SELECT sh.doc_id, sh.simhash, b.bucket_size
        |FROM sh JOIN (SELECT simhash, COUNT(*) AS bucket_size FROM sh GROUP BY 1) b USING (simhash)""".stripMargin,
    "q23_embed_cosine_topk" ->
      """WITH n AS (SELECT vec_id, q, CAST(list_sum([y*y for y in q]) AS BIGINT) AS n2 FROM (
        |    SELECT vec_id, [CAST(round(CAST(x AS DOUBLE)*1000000) AS BIGINT) for x in embedding] AS q FROM embeddings)),
        |qs AS (SELECT vec_id AS query_id, q AS qq, n2 AS qn2 FROM n WHERE vec_id < 20),
        |c AS (SELECT query_id, vec_id AS neighbor_id,
        |    CAST(list_sum([n.q[i]*qq[i] for i in generate_series(1, len(n.q))]) AS DOUBLE)
        |      / (sqrt(CAST(n2 AS DOUBLE)) * sqrt(CAST(qn2 AS DOUBLE))) AS cos
        |  FROM n CROSS JOIN qs WHERE vec_id <> query_id)
        |SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank FROM (
        |  SELECT query_id, neighbor_id,
        |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank FROM c)
        |WHERE rank <= 5""".stripMargin,
    "q24_embed_neardup" ->
      """WITH n AS (SELECT vec_id, q, CAST(list_sum([y*y for y in q]) AS BIGINT) AS n2 FROM (
        |    SELECT vec_id, [CAST(round(CAST(x AS DOUBLE)*1000000) AS BIGINT) for x in embedding] AS q FROM embeddings))
        |SELECT vec_a, vec_b, CAST(floor(cos * 1000) AS BIGINT) AS cos_milli FROM (
        |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |    CAST(list_sum([a.q[i]*b.q[i] for i in generate_series(1, len(a.q))]) AS DOUBLE)
        |      / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))) AS cos
        |  FROM n a JOIN n b ON a.vec_id < b.vec_id)
        |WHERE cos >= 0.35""".stripMargin,
    "q25_embed_ivf_topk" -> q25OracleSql,
    "q26_langid" ->
      """WITH toks AS (SELECT doc_id, list_filter(string_split(text,' '), x -> len(x)>0) AS t FROM documents),
        |p(lang, words) AS (VALUES
        |  ('en', ['the','a','of','and','to','in','is']),
        |  ('de', ['der','die','das','und','ist','ein']),
        |  ('es', ['el','la','de','que','y','es']),
        |  ('fr', ['le','la','de','et','un','est'])),
        |sc AS (SELECT doc_id, lang,
        |    CAST(len(list_filter(t, x -> list_contains(words, x))) AS BIGINT) AS score
        |  FROM toks CROSS JOIN p),
        |r AS (SELECT doc_id, lang, score,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, lang DESC) AS rn FROM sc)
        |SELECT doc_id, CASE WHEN score > 0 THEN lang ELSE 'und' END AS pred_lang, score
        |FROM r WHERE rn = 1""".stripMargin,
    "q27_quality_score" ->
      """WITH d AS (SELECT doc_id, list_filter(string_split(text,' '), x -> len(x)>0) AS t FROM documents),
        |s AS (SELECT doc_id,
        |    CAST(len(t) AS BIGINT) AS n_tokens,
        |    CAST(len(list_distinct(t)) AS BIGINT) AS n_types,
        |    CAST(list_sum([len(x) for x in t]) AS BIGINT) AS sum_len,
        |    CAST(len(list_filter(t, x -> list_contains(['the','a','of','and','to','in','is'], x))) AS BIGINT) AS n_stop
        |  FROM d)
        |SELECT doc_id, n_tokens, n_types, n_stop,
        |  CAST(floor(1000.0 * n_types / n_tokens) AS BIGINT) AS ttr_milli,
        |  CAST(floor(1000.0 * sum_len / n_tokens) AS BIGINT) AS mean_len_milli,
        |  CAST(floor(1000.0 * n_stop / n_tokens) AS BIGINT) AS stop_milli,
        |  CASE WHEN n_tokens >= 50 AND floor(1000.0 * n_types / n_tokens) >= 300 THEN 'good'
        |       WHEN n_tokens >= 20 THEN 'fair' ELSE 'poor' END AS quality
        |FROM s WHERE n_tokens > 0""".stripMargin,
    "q28_token_count" ->
      """SELECT doc_id,
        |  CAST(len(list_filter(string_split(text,' '), x -> len(x)>0)) AS BIGINT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS bpe_tokens
        |FROM documents""".stripMargin,
    "q29_fingerprint" ->
      """WITH d AS (SELECT doc_id, list_filter(string_split(text,' '), x -> len(x)>0) AS t FROM documents)
        |SELECT doc_id,
        |  CAST(list_reduce(
        |    list_prepend(CAST(0 AS BIGINT), [('0x' || substr(md5(x),1,15))::BIGINT for x in t]),
        |    (h, x) -> (h * 1000003 + x) % 1000000007) AS BIGINT) AS fp
        |FROM d""".stripMargin,
    "q30_media_features" ->
      """WITH m AS (SELECT doc_id,
        |    1 + (('0x' || substr(md5(text),1,2))::BIGINT % 64) AS w,
        |    1 + (('0x' || substr(md5(text),3,2))::BIGINT % 64) AS h,
        |    1 + (('0x' || substr(md5(text),5,2))::BIGINT % 3) AS c
        |  FROM documents)
        |SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |  CAST(c AS BIGINT) AS channels, CAST((w+1)//2 AS BIGINT) AS resized_w,
        |  CAST((h+1)//2 AS BIGINT) AS resized_h, CAST(16 AS BIGINT) AS n_bytes
        |FROM m""".stripMargin,
    "q31_sessionize_dyngap" ->
      """WITH dim AS (SELECT event_type, CAST(600000 + 300000 * (length(event_type) % 4) AS BIGINT) AS thr_ms
        |  FROM (SELECT DISTINCT event_type FROM events)),
        |g AS (SELECT user_id, event_id, ts,
        |    CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
        |           OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > thr_ms THEN 1 ELSE 0 END AS new_s
        |  FROM events JOIN dim USING (event_type)
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
        |s AS (SELECT user_id, event_id,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM g)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  COUNT(*) AS n_events, MIN(event_id) AS first_event
        |FROM s GROUP BY 1, 2""".stripMargin,
    "q32_subsequence_match" ->
      """WITH s AS (SELECT user_id, list(event_type ORDER BY ts ASC, event_id ASC) AS seq
        |  FROM events GROUP BY 1)
        |SELECT user_id, CAST(len(seq) AS BIGINT) AS n_events,
        |  list_reduce(list_prepend(0,
        |      [CASE WHEN x='view' THEN 1 WHEN x='click' THEN 2 WHEN x='purchase' THEN 3 ELSE 0 END for x in seq]),
        |    (i, c) -> CASE WHEN c = i + 1 THEN i + 1 ELSE i END) = 3 AS matched
        |FROM s""".stripMargin,
    "q33_kde_patterns" ->
      """WITH e AS (SELECT user_id,
        |    CAST(EXTRACT(hour FROM ts) * 3600 + EXTRACT(minute FROM ts) * 60
        |         + EXTRACT(second FROM ts) AS BIGINT) AS sod FROM events),
        |u AS (SELECT user_id, list(sod ORDER BY sod) AS t FROM e GROUP BY 1),
        |d AS (SELECT user_id, t,
        |    [CAST(list_sum([CASE WHEN (tj - ti) * (tj - ti) < 3240000
        |       THEN 3240000 - (tj - ti) * (tj - ti) ELSE 0 END for tj in t]) AS BIGINT) for ti in t] AS dens
        |  FROM u),
        |dr AS (SELECT user_id, t, dens,
        |    [list_min([CASE WHEN dens[j] > dens[i] THEN abs(t[j] - t[i]) ELSE NULL END
        |       for j in generate_series(1, len(t))]) for i in generate_series(1, len(t))] AS dr0
        |  FROM d),
        |di AS (SELECT user_id, t, dens,
        |    [CAST(coalesce(x, 2 * greatest(coalesce(list_max(list_filter(dr0, y -> y IS NOT NULL)), 1), 1)) AS BIGINT)
        |       for x in dr0] AS dist
        |  FROM dr),
        |st AS (SELECT user_id, t, dens, dist,
        |    CAST(len(t) AS BIGINT) AS n,
        |    CAST(list_sum(dist) AS BIGINT) AS s,
        |    CAST(list_sum([x * x for x in dist]) AS BIGINT) AS q
        |  FROM di),
        |ct AS (SELECT user_id, t,
        |    CASE WHEN n * q - s * s = 0 THEN [t[list_position(dens, list_max(dens))]]
        |         WHEN len([t[i] for i in generate_series(1, len(t))
        |                   if n * dist[i] - s >= 0
        |                   AND (n * dist[i] - s) * (n * dist[i] - s) >= 4 * (n * q - s * s)]) = 0
        |           THEN [t[list_position(dens, list_max(dens))]]
        |         ELSE list_distinct([t[i] for i in generate_series(1, len(t))
        |                   if n * dist[i] - s >= 0
        |                   AND (n * dist[i] - s) * (n * dist[i] - s) >= 4 * (n * q - s * s)])
        |    END AS centers
        |  FROM st)
        |SELECT user_id,
        |  CAST(len(centers) AS BIGINT) AS n_centers,
        |  CAST(len(list_filter(t, x -> len(list_filter(centers, c -> abs(x - c) <= 5400)) > 0)) AS BIGINT) AS n_assigned,
        |  CAST(len(t) AS BIGINT) AS n_events
        |FROM ct""".stripMargin,
    "q34_haversine" ->
      """WITH n AS (SELECT n_nationkey, (n_nationkey % 25) * 2.5 - 30.0 AS lat,
        |    n_nationkey * 5.0 - 60.0 AS lon FROM nation)
        |SELECT CAST(a.n_nationkey AS BIGINT) AS na, CAST(b.n_nationkey AS BIGINT) AS nb,
        |  CAST(round(asin(sqrt(
        |    pow(sin(radians(b.lat - a.lat) / 2), 2) +
        |    cos(radians(a.lat)) * cos(radians(b.lat)) * pow(sin(radians(b.lon - a.lon) / 2), 2)
        |  )) * 2 * 6371.0 * 10) AS BIGINT) AS dist_dm
        |FROM n a JOIN n b ON a.n_nationkey < b.n_nationkey""".stripMargin,
    "q35_weighted_jaccard" ->
      """WITH tok AS (SELECT doc_id, source,
        |    unnest(list_distinct(list_filter(string_split(text,' '), x -> len(x)>0))) AS token
        |  FROM documents),
        |w AS (SELECT token, CAST(floor(1000000.0 / COUNT(DISTINCT doc_id)) AS BIGINT) AS w
        |  FROM tok GROUP BY 1),
        |tw AS (SELECT doc_id, source, tok.token, w.w FROM tok JOIN w ON tok.token = w.token),
        |sums AS (SELECT doc_id, CAST(SUM(w) AS BIGINT) AS wsum FROM tw GROUP BY 1),
        |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(SUM(a.w) AS BIGINT) AS inter
        |  FROM tw a JOIN tw b ON a.source = b.source AND a.token = b.token AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b, wj_milli FROM (
        |  SELECT doc_a, doc_b,
        |    CAST(floor(1000.0 * inter / (sa.wsum + sb.wsum - inter)) AS BIGINT) AS wj_milli
        |  FROM inter JOIN sums sa ON sa.doc_id = doc_a JOIN sums sb ON sb.doc_id = doc_b)
        |WHERE wj_milli >= 500""".stripMargin,
    // q36: the oracle recomputes the ER clustering relationally — exact
    // shingle-Jaccard >= 0.5 edges (the corpus' near-dup definition; the
    // pipeline's LSH recall at this margin is ~1 and its blended score
    // threshold separates the same pairs — verified equal at sf0.001/0.01)
    // + a recursive-CTE transitive closure with cluster_id = min doc_id,
    // exactly ConnectedComponents' canonical labeling. The 4-channel
    // scorer itself is gated by the F1/cluster-equality suite, not SQL.
    "q36_er_cluster" ->
      """WITH RECURSIVE
        |d AS (SELECT format('d{:09d}', doc_id) AS id, text FROM documents),
        |tk AS (SELECT id, list_filter(string_split(text,' '), x -> len(x)>0) AS t FROM d),
        |s AS (SELECT id, list_distinct(CASE WHEN len(t) <= 2 THEN [array_to_string(t,' ')]
        |      ELSE [array_to_string(t[i:i+1], ' ') for i in generate_series(1, len(t)-1)] END) AS sh FROM tk),
        |e AS (SELECT a.id AS x, b.id AS y FROM s a JOIN s b ON a.id < b.id
        |      WHERE floor(1000.0 * len(list_intersect(a.sh, b.sh)) / len(list_distinct(a.sh || b.sh))) >= 500),
        |sym AS (SELECT x, y FROM e UNION SELECT y AS x, x AS y FROM e),
        |reach(src, dst) AS (
        |  SELECT id, id FROM d
        |  UNION
        |  SELECT r.src, s2.y FROM reach r JOIN sym s2 ON r.dst = s2.x)
        |SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY 1""".stripMargin,
    "q37_collision_scan" ->
      """SELECT a.user_id AS ua, b.user_id AS ub, COUNT(*) AS n_collisions
        |FROM events a JOIN events b
        |  ON a.event_type = b.event_type AND a.user_id < b.user_id
        |  AND abs(epoch_ms(a.ts) - epoch_ms(b.ts)) <= 300000
        |GROUP BY 1, 2 HAVING COUNT(*) >= 3""".stripMargin,
    "q38_hash_sample" ->
      """SELECT o_orderkey, o_custkey FROM orders
        |WHERE ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)),1,15))::BIGINT % 10 = 0""".stripMargin,
    "q39_lev_similarity" ->
      """WITH d AS (SELECT doc_id, lang, source, substr(text, 1, 64) AS head FROM documents)
        |SELECT doc_a, doc_b, lev_milli FROM (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    CAST(floor(1000.0 * (1.0 - CAST(levenshtein(a.head, b.head) AS DOUBLE)
        |      / greatest(len(a.head), len(b.head)))) AS BIGINT) AS lev_milli
        |  FROM d a JOIN d b ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
        |  WHERE len(a.head) > 0 AND len(b.head) > 0)
        |WHERE lev_milli >= 900""".stripMargin,
    "q40_conflict_pairs" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events),
        |coll AS (SELECT a.user_id AS ua, b.user_id AS ub, COUNT(*) AS n_collisions
        |  FROM e a JOIN e b ON a.event_type = b.event_type AND a.user_id < b.user_id
        |    AND abs(a.ms - b.ms) <= 300000
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 3),
        |conf AS (SELECT c.ua, c.ub, COUNT(*) AS n_conflicts
        |  FROM coll c JOIN e a ON a.user_id = c.ua JOIN e b ON b.user_id = c.ub
        |  WHERE a.event_type <> b.event_type AND abs(a.ms - b.ms) <= 60000
        |  GROUP BY 1, 2)
        |SELECT ua, ub, n_collisions, CAST(COALESCE(n_conflicts, 0) AS BIGINT) AS n_conflicts
        |FROM coll LEFT JOIN conf USING (ua, ub)
        |WHERE COALESCE(n_conflicts, 0) * 10 <= n_collisions""".stripMargin,
    "q41_lcs_positional" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events),
        |n AS (SELECT user_id, COUNT(*) AS n FROM e GROUP BY 1),
        |al AS (SELECT a.user_id AS ua, b.user_id AS ub, COUNT(*) AS n_aligned
        |  FROM e a JOIN e b ON a.event_type = b.event_type AND a.user_id < b.user_id
        |    AND abs(a.ms - b.ms) <= 600000
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 3)
        |SELECT ua, ub, n_aligned,
        |  CAST(floor(1000.0 * n_aligned / least(na.n, nb.n)) AS BIGINT) AS lcs_milli
        |FROM al JOIN n na ON na.user_id = ua JOIN n nb ON nb.user_id = ub""".stripMargin,
    "q42_sov_ratio" ->
      """WITH g AS (SELECT user_id, event_id, epoch_ms(ts) AS ms,
        |    CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
        |           OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 1800000 THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts) ASC, event_id ASC)),
        |s AS (SELECT user_id, ms,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ms ASC, event_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM g),
        |sess AS (SELECT user_id, sid, MIN(ms) AS st, MAX(ms) AS en FROM s GROUP BY 1, 2
        |  HAVING MAX(ms) > MIN(ms)),
        |tot AS (SELECT user_id, CAST(SUM(en - st) AS BIGINT) AS total_ms FROM sess GROUP BY 1),
        |ov AS (SELECT a.user_id AS ua, b.user_id AS ub,
        |    CAST(SUM(LEAST(a.en, b.en) - GREATEST(a.st, b.st)) AS BIGINT) AS ov_ms
        |  FROM sess a JOIN sess b ON a.user_id < b.user_id AND a.st <= b.en AND b.st <= a.en
        |  GROUP BY 1, 2)
        |SELECT ua, ub, ov_ms, CAST(floor(1000.0 * ov_ms / t.total_ms) AS BIGINT) AS sov_milli
        |FROM ov JOIN tot t ON t.user_id = ua""".stripMargin,
    "q43_trip_completion" ->
      """WITH g AS (SELECT user_id, event_id, event_type, epoch_ms(ts) AS ms,
        |    CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
        |           OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 1800000 THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts) ASC, event_id ASC)),
        |s AS (SELECT user_id, event_id, event_type, ms,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ms ASC, event_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM g),
        |sess AS (SELECT user_id, sid, MIN(ms) AS st, MAX(ms) AS en FROM s GROUP BY 1, 2),
        |firsts AS (SELECT user_id, sid, event_type AS f FROM (
        |  SELECT user_id, sid, event_type,
        |    ROW_NUMBER() OVER (PARTITION BY user_id, sid ORDER BY ms ASC, event_id ASC) AS rn FROM s)
        |  WHERE rn = 1),
        |lasts AS (SELECT user_id, sid, event_type AS l FROM (
        |  SELECT user_id, sid, event_type,
        |    ROW_NUMBER() OVER (PARTITION BY user_id, sid ORDER BY ms DESC, event_id DESC) AS rn FROM s)
        |  WHERE rn = 1),
        |od AS (SELECT sess.user_id, sess.sid, f, l, st, en
        |  FROM sess JOIN firsts USING (user_id, sid) JOIN lasts USING (user_id, sid)),
        |modal AS (SELECT user_id, f AS mf, l AS ml FROM (
        |  SELECT user_id, f, l,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY COUNT(*) DESC, f ASC, l ASC) AS rn
        |  FROM od GROUP BY user_id, f, l) WHERE rn = 1)
        |SELECT od.user_id, CAST(sid AS BIGINT) AS session_id, f AS first_type, l AS last_type,
        |  CAST(st - CASE WHEN f <> mf THEN 300000 + 100000 * ((length(mf) * 7 + length(f)) % 5)
        |    ELSE 0 END AS BIGINT) AS comp_start_ms,
        |  CAST(en + CASE WHEN l <> ml THEN 300000 + 100000 * ((length(l) * 7 + length(ml)) % 5)
        |    ELSE 0 END AS BIGINT) AS comp_end_ms,
        |  (f <> mf OR l <> ml) AS completed
        |FROM od JOIN modal USING (user_id)""".stripMargin,
    "q47_pattern_completion" ->
      """WITH g AS (SELECT user_id, event_id, event_type, epoch_ms(ts) AS ms,
        |    CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
        |           OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 1800000 THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts) ASC, event_id ASC)),
        |s AS (SELECT user_id, event_id, event_type, ms,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ms ASC, event_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM g),
        |sess AS (SELECT user_id, sid, MIN(ms) AS st, MAX(ms) AS en FROM s GROUP BY 1, 2),
        |firsts AS (SELECT user_id, sid, event_type AS f FROM (
        |  SELECT user_id, sid, event_type,
        |    ROW_NUMBER() OVER (PARTITION BY user_id, sid ORDER BY ms ASC, event_id ASC) AS rn FROM s)
        |  WHERE rn = 1),
        |lasts AS (SELECT user_id, sid, event_type AS l FROM (
        |  SELECT user_id, sid, event_type,
        |    ROW_NUMBER() OVER (PARTITION BY user_id, sid ORDER BY ms DESC, event_id DESC) AS rn FROM s)
        |  WHERE rn = 1),
        |od AS (SELECT sess.user_id, sess.sid, f, l, st, en, (st // 1000) % 86400 AS sod
        |  FROM sess JOIN firsts USING (user_id, sid) JOIN lasts USING (user_id, sid)),
        |ku AS (SELECT user_id, list(sod ORDER BY sod) AS t FROM od GROUP BY 1),
        |kd AS (SELECT user_id, t,
        |    [CAST(list_sum([CASE WHEN (tj - ti) * (tj - ti) < 3240000
        |       THEN 3240000 - (tj - ti) * (tj - ti) ELSE 0 END for tj in t]) AS BIGINT) for ti in t] AS dens
        |  FROM ku),
        |kr AS (SELECT user_id, t, dens,
        |    [list_min([CASE WHEN dens[j] > dens[i] THEN abs(t[j] - t[i]) ELSE NULL END
        |       for j in generate_series(1, len(t))]) for i in generate_series(1, len(t))] AS dr0
        |  FROM kd),
        |ki AS (SELECT user_id, t, dens,
        |    [CAST(coalesce(x, 2 * greatest(coalesce(list_max(list_filter(dr0, y -> y IS NOT NULL)), 1), 1)) AS BIGINT)
        |       for x in dr0] AS dist
        |  FROM kr),
        |ks AS (SELECT user_id, t, dens, dist,
        |    CAST(len(t) AS BIGINT) AS kn,
        |    CAST(list_sum(dist) AS BIGINT) AS ksum,
        |    CAST(list_sum([x * x for x in dist]) AS BIGINT) AS ksq
        |  FROM ki),
        |ct AS (SELECT user_id,
        |    CASE WHEN kn * ksq - ksum * ksum = 0 THEN [t[list_position(dens, list_max(dens))]]
        |         WHEN len([t[i] for i in generate_series(1, len(t))
        |                   if kn * dist[i] - ksum >= 0
        |                   AND (kn * dist[i] - ksum) * (kn * dist[i] - ksum) >= 4 * (kn * ksq - ksum * ksum)]) = 0
        |           THEN [t[list_position(dens, list_max(dens))]]
        |         ELSE list_distinct([t[i] for i in generate_series(1, len(t))
        |                   if kn * dist[i] - ksum >= 0
        |                   AND (kn * dist[i] - ksum) * (kn * dist[i] - ksum) >= 4 * (kn * ksq - ksum * ksum)])
        |    END AS centers
        |  FROM ks),
        |cexp AS (SELECT user_id, unnest(centers) AS c FROM ct),
        |cand AS (SELECT od.user_id, od.sid, c.c,
        |    ROW_NUMBER() OVER (PARTITION BY od.user_id, od.sid
        |      ORDER BY abs(od.sod - c.c) ASC, c.c DESC) AS rn
        |  FROM od JOIN cexp c USING (user_id) WHERE abs(od.sod - c.c) <= 5400),
        |asn AS (SELECT user_id, sid, c AS cluster_sod FROM cand WHERE rn = 1),
        |od2 AS (SELECT od.*, COALESCE(asn.cluster_sod, -1) AS cluster_sod
        |  FROM od LEFT JOIN asn USING (user_id, sid)),
        |cmodal AS (SELECT user_id, cluster_sod, f AS pf, l AS pl FROM (
        |  SELECT user_id, cluster_sod, f, l,
        |    ROW_NUMBER() OVER (PARTITION BY user_id, cluster_sod ORDER BY COUNT(*) DESC, f ASC, l ASC) AS rn
        |  FROM od2 WHERE cluster_sod >= 0 GROUP BY user_id, cluster_sod, f, l) WHERE rn = 1),
        |gmodal AS (SELECT user_id, f AS gf, l AS gl FROM (
        |  SELECT user_id, f, l,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY COUNT(*) DESC, f ASC, l ASC) AS rn
        |  FROM od2 GROUP BY user_id, f, l) WHERE rn = 1),
        |fin AS (SELECT od2.user_id, od2.sid, od2.cluster_sod, od2.f, od2.l, od2.st, od2.en,
        |    COALESCE(cm.pf, gm.gf) AS mf, COALESCE(cm.pl, gm.gl) AS ml
        |  FROM od2 LEFT JOIN cmodal cm ON cm.user_id = od2.user_id AND cm.cluster_sod = od2.cluster_sod
        |  JOIN gmodal gm ON gm.user_id = od2.user_id)
        |SELECT user_id, CAST(sid AS BIGINT) AS session_id, CAST(cluster_sod AS BIGINT) AS cluster_sod,
        |  f AS first_type, l AS last_type,
        |  CAST(st - CASE WHEN f <> mf THEN 300000 + 100000 * ((length(mf) * 7 + length(f)) % 5)
        |    ELSE 0 END AS BIGINT) AS comp_start_ms,
        |  CAST(en + CASE WHEN l <> ml THEN 300000 + 100000 * ((length(l) * 7 + length(ml)) % 5)
        |    ELSE 0 END AS BIGINT) AS comp_end_ms,
        |  (f <> mf OR l <> ml) AS completed
        |FROM fin""".stripMargin,
    "q48_weekly_monthly" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ms,
        |    strftime(ts, '%Y-%m') AS month,
        |    CAST((EXTRACT(day FROM ts) - 1) // 7 AS BIGINT) AS wom FROM events),
        |coll AS (SELECT a.user_id AS ua, b.user_id AS ub, a.month, a.wom, COUNT(*) AS n_collisions
        |  FROM e a JOIN e b ON a.event_type = b.event_type AND a.user_id < b.user_id
        |    AND abs(a.ms - b.ms) <= 300000
        |  GROUP BY 1, 2, 3, 4)
        |SELECT ua, ub, month, COUNT(*) AS n_weeks,
        |  CAST(SUM(n_collisions) AS BIGINT) AS total_collisions
        |FROM coll GROUP BY 1, 2, 3 HAVING COUNT(*) >= 2""".stripMargin,
    "q44_partitioned_scan" ->
      """SELECT event_type, CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS value_cents
        |FROM events WHERE event_type IN ('click', 'view')
        |GROUP BY 1, 2""".stripMargin,
    "q45_sql_view" ->
      """WITH top3 AS (SELECT event_type FROM events
        |  GROUP BY event_type ORDER BY COUNT(*) DESC, event_type ASC LIMIT 3)
        |SELECT user_id, event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS value_cents
        |FROM events WHERE event_type IN (SELECT event_type FROM top3)
        |GROUP BY user_id, event_type""".stripMargin,
    "q46_csv_scan" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
        |  CAST(n_regionkey AS BIGINT) AS n_regionkey FROM nation""".stripMargin,
  )
}
