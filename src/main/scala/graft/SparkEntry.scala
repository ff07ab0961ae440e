package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry is one operator from SURVEY.md §2 (or a
  * north-star extension); each has a DuckDB-equivalent `oracleSql`
  * unless the op is not SQL-expressible (sketch/LSH ops → driver does a
  * rows-only check). Column names are aligned between the Spark output
  * and the oracle SQL, and every query output is deterministically
  * ordered.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.starJoinRevenue(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // SURVEY §2.2 filters / projections
    "p1_point_filter"   -> ((s, d) => Relational.pointFilter(s, d)),
    "p2_like_substring" -> ((s, d) => Relational.likeSubstring(s, d)),
    "p3_time_prefix"    -> ((s, d) => Relational.timePrefixLike(s, d)),
    "p7_json_projection"-> ((s, d) => Relational.jsonProjection(s, d)),
    "p8_find_substring" -> ((s, d) => Relational.findSubstring(s, d)),
    // §2.5 sort / limit / pagination / top-k
    "o1_paginate_asc"   -> ((s, d) => Relational.paginateAsc(s, d)),
    "o2_paginate_desc"  -> ((s, d) => Relational.paginateDesc(s, d)),
    "o3_topk_score"     -> ((s, d) => Relational.topKByScore(s, d)),
    "o5_sort_any_col"   -> ((s, d) => Relational.sortByAnyColumn(s, d)),
    "o6_keyset_page"    -> ((s, d) => Relational.keysetPage(s, d)),
    // §2.3 joins
    "j1_join_nested"    -> ((s, d) => Relational.joinNested(s, d)),
    "j2_semi_join"      -> ((s, d) => Relational.semiJoin(s, d)),
    "j3_anti_join"      -> ((s, d) => Relational.antiJoin(s, d)),
    "j4_star_join"      -> ((s, d) => Relational.starJoinRevenue(s, d)),
    "j5_range_join"     -> ((s, d) => Relational.rangeJoin(s, d)),
    "j6_asof_join"      -> ((s, d) => Relational.asofJoin(s, d)),
    // §2.4 aggregations
    "a1_max_id"         -> ((s, d) => Analytics.maxOrderId(s, d)),
    "a2_monthly_sales"  -> ((s, d) => Analytics.monthlySales(s, d)),
    "a3_rollup_sales"   -> ((s, d) => Analytics.rollupSales(s, d)),
    "a4_count"          -> ((s, d) => Analytics.countAll(s, d)),
    "a6_supplier_stats" -> ((s, d) => Analytics.supplierStats(s, d)),
    "a7_distinct_counts"-> ((s, d) => Analytics.distinctCounts(s, d)),
    "a8_approx_distinct"-> ((s, d) => Analytics.approxDistinct(s, d)),
    "q1_pricing_summary"-> ((s, d) => Analytics.q1PricingSummary(s, d)),
    "q3_ship_priority"  -> ((s, d) => Benchmark.q3ShippingPriority(s, d)),
    "q6_forecast_rev"   -> ((s, d) => Benchmark.q6ForecastRevenue(s, d)),
    "q7_above_avg"      -> ((s, d) => Benchmark.aboveAvgBalance(s, d)),
    "q8_above_cust_avg" -> ((s, d) => Benchmark.aboveCustomerAvg(s, d)),
    "a9_cube_sales"     -> ((s, d) => Benchmark.cubeSales(s, d)),
    "a10_pivot_status"  -> ((s, d) => Benchmark.pivotStatus(s, d)),
    "a11_percentiles"   -> ((s, d) => Analytics.percentiles(s, d)),
    "a12_approx_pct"    -> ((s, d) => Analytics.approxPercentiles(s, d)),
    "f_null_handling"   -> ((s, d) => Analytics.nullHandling(s, d)),
    "tx8_fuzzy_match"   -> ((s, d) => TextAnalysis.fuzzyMatch(s, d)),
    // §2.4 DISTINCT / §2.7 set ops
    "d1_distinct"       -> ((s, d) => Relational.distinctValues(s, d)),
    "s1_union"          -> ((s, d) => Relational.setUnion(s, d)),
    "s2_intersect"      -> ((s, d) => Relational.setIntersect(s, d)),
    "s3_except"         -> ((s, d) => Relational.setExcept(s, d)),
    // §2.6 windows
    "w1_topn_per_group" -> ((s, d) => Relational.topNPerGroup(s, d)),
    "w3_running_total"  -> ((s, d) => Relational.runningRevenue(s, d)),
    // §2.8 scalar functions
    "f_scalar_suite"    -> ((s, d) => Relational.scalarSuite(s, d)),
    "f_array_suite"     -> ((s, d) => Relational.arraySuite(s, d)),
    // sampling (training-pipeline surface)
    "sp1_hash_sample"   -> ((s, d) => Sampling.hashSample(s, d)),
    "sp2_reservoir"     -> ((s, d) => Sampling.reservoirPerGroup(s, d)),
    "sp3_stratified"    -> ((s, d) => Sampling.stratifiedSample(s, d)),
    // §2.10 batch twins of the streaming surface
    "st1_hourly_events" -> ((s, d) => Analytics.hourlyEvents(s, d)),
    "st2_sessionize"    -> ((s, d) => Analytics.sessionize(s, d)),
    "st3_sliding"       -> ((s, d) => Analytics.slidingEvents(s, d)),
    // north-star M6: deduplication
    "dd1_exact_dedup"   -> ((s, d) => Dedup.exactDedup(s, d)),
    "dd2_ngram_jaccard" -> ((s, d) => Dedup.ngramJaccardPairs(s, d)),
    "dd3_minhash_lsh"   -> ((s, d) => Dedup.minhashLshPairs(s, d)),
    "dd4_simhash"       -> ((s, d) => Dedup.simhashPairs(s, d)),
    "dd5_dedup_keep"    -> ((s, d) => Dedup.dedupKeepSet(s, d)),
    "dd6_embedding_neardup" -> ((s, d) => Similarity.embeddingNearDupPairs(s, d)),
    // north-star M6: text analysis
    "tx1_text_stats"    -> ((s, d) => TextAnalysis.textStats(s, d)),
    "tx2_token_freq"    -> ((s, d) => TextAnalysis.tokenFrequency(s, d)),
    "tx3_fingerprints"  -> ((s, d) => TextAnalysis.fingerprints(s, d)),
    "tx4_quality_score" -> ((s, d) => TextAnalysis.qualityScore(s, d)),
    "tx5_lang_id"       -> ((s, d) => TextAnalysis.langId(s, d)),
    "tx6_token_counts"  -> ((s, d) => TextAnalysis.tokenCounts(s, d)),
    "tx7_winnowing"     -> ((s, d) => TextAnalysis.winnowingFingerprints(s, d)),
    // north-star M6: similarity search
    "sim1_cosine_topk"  -> ((s, d) => Similarity.cosineTopK(s, d)),
    "sim2_top_pairs"    -> ((s, d) => Similarity.topSimilarPairs(s, d)),
    "sim3_lsh_ann"      -> ((s, d) => Similarity.lshAnn(s, d)),
    "sim4_ivf_ann"      -> ((s, d) => Similarity.ivfAnn(s, d)),
    // north-star M6: multimodal plumbing
    "mm1_media_meta"    -> ((s, d) => Multimodal.mediaMeta(s, d)),
    "mm2_media_features"-> ((s, d) => Multimodal.mediaFeatures(s, d)),
  )

  def oracleSql: Map[String, String] = Map(
    "p1_point_filter" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM orders WHERE o_orderkey = 42""".stripMargin,
    "p2_like_substring" ->
      """SELECT p_partkey, p_name, p_brand FROM part
        |WHERE p_name LIKE '%wid%' ORDER BY p_partkey""".stripMargin,
    "p3_time_prefix" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS order_time
        |FROM orders
        |WHERE strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') LIKE '1996-0%-1%'
        |ORDER BY o_orderkey""".stripMargin,
    "p7_json_projection" ->
      """SELECT event_id, CAST(props->>'$.k' AS INTEGER) AS k
        |FROM events WHERE CAST(props->>'$.k' AS INTEGER) > 50
        |ORDER BY event_id""".stripMargin,
    "p8_find_substring" ->
      """SELECT doc_id, source FROM documents
        |WHERE source LIKE '%1%' ORDER BY doc_id""".stripMargin,
    "o1_paginate_asc" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_orderkey ASC LIMIT 100 OFFSET 50""".stripMargin,
    "o2_paginate_desc" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS order_time,
        |       o_totalprice
        |FROM orders ORDER BY o_orderdate DESC, o_orderkey DESC
        |LIMIT 50 OFFSET 20""".stripMargin,
    "o3_topk_score" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE c_acctbal IS NOT NULL
        |ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 15""".stripMargin,
    "o5_sort_any_col" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC
        |LIMIT 100""".stripMargin,
    "o6_keyset_page" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS order_time,
        |       o_totalprice
        |FROM orders
        |WHERE o_orderdate < TIMESTAMP '1997-06-01 00:00:00'
        |   OR (o_orderdate = TIMESTAMP '1997-06-01 00:00:00' AND o_orderkey < 999999)
        |ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 50""".stripMargin,
    "j1_join_nested" ->
      """SELECT o.o_orderkey, o.o_totalprice,
        |  count(l.l_linenumber) AS n_lines,
        |  coalesce(round(sum(l.l_extendedprice * (1 - l.l_discount)), 2), 0.0) AS revenue,
        |  coalesce(string_agg(CAST(l.l_linenumber AS VARCHAR), ',' ORDER BY l.l_linenumber), '')
        |    AS line_numbers
        |FROM orders o LEFT OUTER JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |WHERE o.o_orderkey < 200
        |GROUP BY o.o_orderkey, o.o_totalprice
        |ORDER BY o.o_orderkey""".stripMargin,
    "j2_semi_join" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "j3_anti_join" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "j4_star_join" ->
      """SELECT r_name, n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "j5_range_join" ->
      """SELECT s_suppkey, s_name, count(*) AS n_matched,
        |  round(sum(c_acctbal), 2) AS sum_cust_bal
        |FROM customer JOIN supplier
        |  ON c_acctbal BETWEEN s_acctbal - 50.0 AND s_acctbal + 50.0
        |GROUP BY s_suppkey, s_name ORDER BY s_suppkey""".stripMargin,
    "j6_asof_join" ->
      """WITH combined AS (
        |  SELECT o_custkey AS uid, o_orderdate AS t, o_orderkey AS okey,
        |         CAST(NULL AS BIGINT) AS event_id
        |  FROM orders
        |  UNION ALL
        |  SELECT user_id, ts, CAST(NULL AS BIGINT), event_id FROM events),
        |marked AS (
        |  SELECT uid, event_id,
        |    last_value(okey IGNORE NULLS) OVER (
        |      PARTITION BY uid
        |      ORDER BY t ASC, okey ASC NULLS LAST, event_id ASC NULLS LAST
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_okey
        |  FROM combined)
        |SELECT event_id, uid AS user_id, asof_okey AS last_order_key
        |FROM marked WHERE event_id IS NOT NULL ORDER BY event_id""".stripMargin,
    "st3_sliding" ->
      """WITH expanded AS (
        |  SELECT value,
        |    (TIMESTAMP '1970-01-01 00:00:00'
        |      + CAST(floor(epoch(ts) / 900) * 900 AS BIGINT) * INTERVAL 1 SECOND)
        |      - i * INTERVAL 15 MINUTE AS ws,
        |    ts
        |  FROM events, (SELECT unnest(generate_series(0, 3)) AS i) probes)
        |SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
        |  count(*) AS n, round(sum(value), 2) AS total_value
        |FROM expanded
        |WHERE ts >= ws AND ts < ws + INTERVAL 1 HOUR
        |GROUP BY ws ORDER BY window_start""".stripMargin,
    "dd6_embedding_neardup" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                               CAST(b.embedding AS DOUBLE[])), 4) AS cos_sim
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE a.vec_id % 5 = 0 AND b.vec_id % 5 = 0
        |  AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                             CAST(b.embedding AS DOUBLE[])) >= 0.3
        |ORDER BY id_a, id_b""".stripMargin,
    "a1_max_id" -> "SELECT max(o_orderkey) AS max_id FROM orders",
    "a2_monthly_sales" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS y,
        |       CAST(month(o_orderdate) AS INTEGER) AS m,
        |       round(sum(o_totalprice), 2) AS sales, count(*) AS n_orders
        |FROM orders
        |GROUP BY CAST(year(o_orderdate) AS INTEGER), CAST(month(o_orderdate) AS INTEGER)
        |ORDER BY y, m""".stripMargin,
    "a3_rollup_sales" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS y,
        |       CAST(month(o_orderdate) AS INTEGER) AS m,
        |       round(sum(o_totalprice), 2) AS sales
        |FROM orders
        |GROUP BY ROLLUP (CAST(year(o_orderdate) AS INTEGER),
        |                 CAST(month(o_orderdate) AS INTEGER))
        |ORDER BY y ASC NULLS FIRST, m ASC NULLS FIRST""".stripMargin,
    "a4_count" -> "SELECT count(*) AS n FROM orders",
    "a6_supplier_stats" ->
      """SELECT l_suppkey, count(*) AS n_items,
        |  round(sum(l_quantity), 2) AS total_qty,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  round(min(l_extendedprice), 2) AS min_price,
        |  round(max(l_extendedprice), 2) AS max_price
        |FROM lineitem GROUP BY l_suppkey
        |HAVING count(*) > 10 ORDER BY l_suppkey""".stripMargin,
    "a7_distinct_counts" ->
      """SELECT count(DISTINCT l_partkey) AS n_parts,
        |       count(DISTINCT l_suppkey) AS n_supps,
        |       count(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem""".stripMargin,
    // a8_approx_distinct: HLL sketch — intentionally no oracle (rows-only).
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_extendedprice), 4) AS avg_price,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_ship_priority" ->
      """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
        |  o_orderpriority,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
        |  AND l_shipdate  > TIMESTAMP '1997-03-15 00:00:00'
        |GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d'), o_orderpriority
        |ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin,
    "q6_forecast_rev" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q7_above_avg" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
        |ORDER BY c_custkey""".stripMargin,
    "q8_above_cust_avg" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
        |WHERE o_totalprice > 1.5 * (SELECT avg(i.o_totalprice) FROM orders i
        |                            WHERE i.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin,
    "a9_cube_sales" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS y, o_orderpriority,
        |  round(sum(o_totalprice), 2) AS sales
        |FROM orders
        |GROUP BY CUBE (CAST(year(o_orderdate) AS INTEGER), o_orderpriority)
        |ORDER BY y ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "a10_pivot_status" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS y,
        |  round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) AS "O",
        |  round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS "F",
        |  round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2) AS "P"
        |FROM orders GROUP BY CAST(year(o_orderdate) AS INTEGER)
        |ORDER BY y""".stripMargin,
    "a11_percentiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        |  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
        |  round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // a12_approx_pct: sketch-based — rows-only by design.
    "f_null_handling" ->
      """SELECT c_custkey,
        |  nullif(c_mktsegment, 'BUILDING') AS seg_or_null,
        |  coalesce(nullif(c_mktsegment, 'BUILDING'), '(redacted)') AS seg_coalesced,
        |  CASE WHEN nullif(c_mktsegment, 'BUILDING') IS NULL THEN 1 ELSE 0 END
        |    AS is_building,
        |  (nullif(c_mktsegment, 'BUILDING') IS NOT DISTINCT FROM NULL) AS nullsafe_eq
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "tx8_fuzzy_match" ->
      """SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
        |  a.p_name AS name_a, b.p_name AS name_b,
        |  CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist
        |FROM part a JOIN part b ON a.p_partkey < b.p_partkey
        |WHERE a.p_partkey % 20 = 0 AND b.p_partkey % 20 = 0
        |  AND levenshtein(a.p_name, b.p_name) <= 5 AND a.p_name <> b.p_name
        |ORDER BY key_a, key_b""".stripMargin,
    "d1_distinct" ->
      "SELECT DISTINCT o_orderpriority FROM orders ORDER BY o_orderpriority",
    "s1_union" ->
      """SELECT DISTINCT o_custkey FROM (
        |  SELECT o_custkey FROM orders
        |  WHERE year(o_orderdate) = 1996 AND month(o_orderdate) = 1
        |  UNION ALL
        |  SELECT o_custkey FROM orders
        |  WHERE year(o_orderdate) = 1996 AND month(o_orderdate) = 2)
        |ORDER BY o_custkey""".stripMargin,
    "s2_intersect" ->
      """SELECT o_custkey FROM orders
        |WHERE year(o_orderdate) = 1996 AND month(o_orderdate) = 1
        |INTERSECT
        |SELECT o_custkey FROM orders
        |WHERE year(o_orderdate) = 1996 AND month(o_orderdate) = 2
        |ORDER BY o_custkey""".stripMargin,
    "s3_except" ->
      """SELECT o_custkey FROM orders
        |WHERE year(o_orderdate) = 1996 AND month(o_orderdate) = 1
        |EXCEPT
        |SELECT o_custkey FROM orders
        |WHERE year(o_orderdate) = 1996 AND month(o_orderdate) = 2
        |ORDER BY o_custkey""".stripMargin,
    "w1_topn_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INTEGER) AS rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "w3_running_total" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  strftime(l_shipdate, '%Y-%m-%d') AS ship_date,
        |  sum(l_quantity) OVER (PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_qty
        |FROM lineitem WHERE l_suppkey < 3
        |ORDER BY l_suppkey, ship_date, l_orderkey, l_linenumber""".stripMargin,
    "f_scalar_suite" ->
      """SELECT p_partkey,
        |  p_brand || '#' || p_type AS brand_type,
        |  upper(p_name) AS name_upper,
        |  lower(p_type) AS type_lower,
        |  substring(p_name, 1, 5) AS name_pfx,
        |  CAST(length(p_name) AS INTEGER) AS name_len,
        |  regexp_replace(p_name, ' ', '_', 'g') AS name_snake,
        |  round(p_retailprice * 1.1, 2) AS price_up,
        |  abs(p_size - 25) AS size_dist,
        |  CAST(p_size AS DOUBLE) AS size_d,
        |  CAST(floor(p_retailprice) AS BIGINT) AS price_floor_l
        |FROM part ORDER BY p_partkey""".stripMargin,
    "f_array_suite" ->
      """SELECT p_partkey,
        |  list_contains(string_split(p_name, ' '), 'widget') AS has_widget,
        |  CAST(len(string_split(p_name, ' ')) AS INTEGER) AS n_words,
        |  array_to_string(list_sort(string_split(p_name, ' ')), '|') AS sorted_words,
        |  string_split(p_name, ' ')[1] AS first_word
        |FROM part ORDER BY p_partkey""".stripMargin,
    "sp1_hash_sample" ->
      """SELECT doc_id, source FROM documents
        |WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '1a'
        |ORDER BY doc_id""".stripMargin,
    "sp2_reservoir" ->
      """SELECT source, doc_id, CAST(rk AS INTEGER) AS rk FROM (
        |  SELECT source, doc_id,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS rk
        |  FROM documents) t
        |WHERE rk <= 5 ORDER BY source, rk""".stripMargin,
    "sp3_stratified" ->
      """SELECT doc_id, lang FROM documents
        |WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
        |  CASE lang WHEN 'en' THEN '80' WHEN 'de' THEN '40' WHEN 'fr' THEN '40'
        |            WHEN 'es' THEN '20' WHEN 'zh' THEN '20' ELSE '00' END
        |ORDER BY doc_id""".stripMargin,
    "st1_hourly_events" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        |  event_type, count(*) AS n, round(sum(value), 2) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    "st2_sessionize" ->
      """WITH seq AS (
        |  SELECT user_id, value, event_id, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |flags AS (
        |  SELECT user_id, value, event_id, ts,
        |    CASE WHEN prev_ts IS NULL
        |           OR (CAST(floor(epoch(ts)) AS BIGINT)
        |               - CAST(floor(epoch(prev_ts)) AS BIGINT)) > 1800
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM seq),
        |sess AS (
        |  SELECT user_id, value,
        |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM flags)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  round(sum(value), 2) AS session_value
        |FROM sess GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,
    "dd1_exact_dedup" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin,
    "dd2_ngram_jaccard" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |grams AS (
        |  SELECT DISTINCT doc_id,
        |    unnest(list_transform(generate_series(1, greatest(len(ws) - 2, 0)),
        |           i -> array_to_string(ws[i:i+2], ' '))) AS g
        |  FROM w),
        |cnt AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
        |shared AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS s
        |  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |j AS (
        |  SELECT doc_a, doc_b, CAST(s AS DOUBLE) / (ca.n + cb.n - s) AS jac
        |  FROM shared
        |  JOIN cnt ca ON ca.doc_id = doc_a
        |  JOIN cnt cb ON cb.doc_id = doc_b)
        |SELECT doc_a, doc_b, round(jac, 4) AS jaccard FROM j
        |WHERE jac >= 0.5 ORDER BY doc_a, doc_b""".stripMargin,
    // dd3_minhash_lsh, dd4_simhash: sketch/LSH ops — rows-only by design.
    "dd5_dedup_keep" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |grams AS (
        |  SELECT DISTINCT doc_id,
        |    unnest(list_transform(generate_series(1, greatest(len(ws) - 2, 0)),
        |           i -> array_to_string(ws[i:i+2], ' '))) AS g
        |  FROM w),
        |cnt AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
        |shared AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS s
        |  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |drops AS (
        |  SELECT DISTINCT doc_b FROM shared
        |  JOIN cnt ca ON ca.doc_id = doc_a
        |  JOIN cnt cb ON cb.doc_id = doc_b
        |  WHERE CAST(s AS DOUBLE) / (ca.n + cb.n - s) >= 0.5)
        |SELECT doc_id, source FROM documents
        |WHERE doc_id NOT IN (SELECT doc_b FROM drops)
        |ORDER BY doc_id""".stripMargin,
    "tx1_text_stats" ->
      """SELECT doc_id, CAST(length(text) AS INTEGER) AS n_chars,
        |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_distinct,
        |  round(CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
        |        / len(string_split(text, ' ')), 4) AS avg_token_len,
        |  round(CAST(len(list_filter(string_split(text, ' '), t -> t = 'the')) AS DOUBLE)
        |        / len(string_split(text, ' ')), 4) AS stopword_ratio
        |FROM documents ORDER BY doc_id""".stripMargin,
    "tx2_token_freq" ->
      """SELECT token, count(*) AS cnt FROM (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |GROUP BY token ORDER BY cnt DESC, token ASC LIMIT 20""".stripMargin,
    "tx3_fingerprints" ->
      "SELECT doc_id, md5(text) AS fp FROM documents ORDER BY doc_id",
    "tx4_quality_score" ->
      """SELECT doc_id, round(
        |  (CASE WHEN len(ws) BETWEEN 20 AND 2000 THEN 1.0 ELSE 0.4 END) * 0.4
        |  + (CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws)) * 0.4
        |  + (1.0 - least(CAST(len(list_filter(ws, t -> t IN ('the', 'a'))) AS DOUBLE)
        |                 / len(ws) * 2.0, 1.0)) * 0.2, 4) AS quality
        |FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
        |ORDER BY doc_id""".stripMargin,
    // tx5_lang_id: heuristic classifier — rows-only by design.
    "tx6_token_counts" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS INTEGER) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS INTEGER) AS bpeish_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    // tx7_winnowing: fingerprints are xxhash64-valued (no DuckDB
    // equivalent hash) — rows-only by design.
    "sim1_cosine_topk" ->
      """SELECT b.vec_id, b.label,
        |  round(list_cosine_similarity(CAST(b.embedding AS DOUBLE[]),
        |                               CAST(a.embedding AS DOUBLE[])), 4) AS cos_sim
        |FROM embeddings a, embeddings b
        |WHERE a.vec_id = 0 AND b.vec_id <> 0
        |ORDER BY cos_sim DESC, b.vec_id ASC LIMIT 10""".stripMargin,
    "sim2_top_pairs" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                               CAST(b.embedding AS DOUBLE[])), 4) AS cos_sim
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE a.vec_id % 5 = 0 AND b.vec_id % 5 = 0
        |ORDER BY cos_sim DESC, id_a, id_b LIMIT 20""".stripMargin,
    // sim3_lsh_ann: approximate ANN — rows-only by design.
    "mm1_media_meta" ->
      """SELECT doc_id, CAST(strlen(text) AS INTEGER) AS n_bytes,
        |  md5(text) AS content_md5
        |FROM documents ORDER BY doc_id""".stripMargin,
    // mm2_media_features: stubbed decoder output — rows-only by design.
  )
}
