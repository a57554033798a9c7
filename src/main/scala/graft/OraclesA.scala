package graft

import graft.functions.TextFunctions
import graft.operators._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DuckDB oracle twins, first half (split out of SparkEntry; composed back in `SparkEntry.oracleSql`). */
private[graft] object OraclesA extends QueryShared {
  private[graft] val m: Map[String, String] = Map(
    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),2) AS sum_qty,
        | round(sum(CAST(round(l_extendedprice*100) AS BIGINT))/100.0, 2) AS sum_base_price,
        | round(sum(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT)))/10000.0, 2) AS sum_disc_price,
        | round(sum(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT)) * (100 + CAST(round(l_tax*100) AS BIGINT)))/1000000.0, 2) AS sum_charge,
        | round(sum(CAST(round(l_quantity*100) AS BIGINT))/100.0/count(*), 4) AS avg_qty,
        | round(sum(CAST(round(l_extendedprice*100) AS BIGINT))/100.0/count(*), 4) AS avg_price,
        | round(sum(CAST(round(l_discount*100) AS BIGINT))/100.0/count(*), 6) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_filter_events" ->
      """SELECT event_id, user_id, value FROM events
        |WHERE event_type = 'click' AND value > 10 ORDER BY event_id""".stripMargin,

    "q_project_revenue" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        | (CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) / 10000.0 AS revenue
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, revenue""".stripMargin,

    "q_wordcount" ->
      s"""SELECT word, count(*) AS n FROM (
         |  SELECT unnest($sqlTokens) AS word FROM documents
         |) GROUP BY word ORDER BY word""".stripMargin,

    "q_case_when" ->
      """SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
        |            WHEN c_acctbal < 5000 THEN 'mid'
        |            ELSE 'high' END AS bal_bucket,
        | count(*) AS n, round(sum(CAST(round(c_acctbal*100) AS BIGINT))/100.0, 2) AS total_bal
        |FROM customer GROUP BY 1 ORDER BY bal_bucket""".stripMargin,

    "q_date_format" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
        | count(*) AS n, round(sum(CAST(round(o_totalprice*100) AS BIGINT))/100.0, 2) AS total_price
        |FROM orders GROUP BY 1 ORDER BY order_month""".stripMargin,

    "q_union_merge" ->
      """SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, count(*) AS n FROM (
        |  SELECT * FROM events WHERE event_type = 'click'
        |  UNION ALL
        |  SELECT * FROM events WHERE event_type = 'purchase'
        |) GROUP BY event_type, day ORDER BY event_type, day""".stripMargin,

    "q_json_extract" ->
      """SELECT event_type,
        | round(avg(CAST(json_extract_string(props, '$.k') AS INT)),4) AS avg_k,
        | count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_regex_extract" ->
      """SELECT regexp_extract(text, '^([a-z]+)', 1) AS first_word, count(*) AS n
        |FROM documents GROUP BY 1 ORDER BY first_word""".stripMargin,

    "q_enrich_join" ->
      """SELECT c_mktsegment, count(*) AS n, round(sum(CAST(round(value*100) AS BIGINT))/100.0, 2) AS total_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_interval_join" ->
      """SELECT c.user_id AS user_id, count(*) AS n_pairs
        |FROM (SELECT user_id, ts FROM events WHERE event_type='click') c
        |JOIN (SELECT user_id, ts FROM events WHERE event_type='purchase') p
        |  ON c.user_id = p.user_id
        | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL '1 hour'
        |GROUP BY 1 ORDER BY user_id""".stripMargin,

    "q_interval_join_left" ->
      """SELECT c.user_id AS user_id, count(*) AS n_rows, count(p.ts) AS n_matched
        |FROM (SELECT user_id, ts FROM events WHERE event_type='click') c
        |LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type='purchase') p
        |  ON c.user_id = p.user_id
        | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL '1 hour'
        |GROUP BY 1 ORDER BY user_id""".stripMargin,

    "q_upsert_table" ->
      """SELECT user_id, event_type, event_id FROM (
        |  SELECT user_id, event_type, event_id,
        |    row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |  FROM events) WHERE rn = 1
        |ORDER BY user_id""".stripMargin,

    "q_asof_join" ->
      """SELECT c.event_id AS event_id, c.user_id AS user_id, p.p_cents AS last_purchase_cents
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type='click') c
        |ASOF LEFT JOIN (
        |  SELECT user_id, ts, max(CAST(round(value*100) AS BIGINT)) AS p_cents
        |  FROM events WHERE event_type='purchase' GROUP BY 1, 2) p
        |  ON c.user_id = p.user_id AND p.ts <= c.ts
        |ORDER BY event_id""".stripMargin,

    // SCD2 compression (lag-change filter) then DuckDB's native ASOF —
    // identical inclusive p.ts <= v.ts contract as q_asof_join.
    "q_pit_join" ->
      """WITH p AS (SELECT user_id, ts,
        |    max(CAST(round(value*100, 0) AS BIGINT)) // 2000 AS tier
        |  FROM events WHERE event_type='purchase' GROUP BY 1, 2),
        |ch AS (SELECT user_id, ts, tier FROM (
        |  SELECT user_id, ts, tier,
        |    lag(tier) OVER (PARTITION BY user_id ORDER BY ts) AS pt FROM p)
        |  WHERE pt IS NULL OR pt <> tier),
        |v AS (SELECT event_id, user_id, ts FROM events
        |  WHERE event_type='view')
        |SELECT v.event_id, v.user_id, ch.tier
        |FROM v ASOF LEFT JOIN ch
        |  ON v.user_id = ch.user_id AND ch.ts <= v.ts
        |ORDER BY event_id""".stripMargin,

    "q_tumbling_window" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
        | count(*) AS n, round(sum(CAST(round(value*100) AS BIGINT))/100.0, 2) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,

    "q_session_window" ->
      """WITH g AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w >= INTERVAL '4 hours'
        |         THEN 1 ELSE 0 END AS ns
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |)
        |SELECT user_id, CAST(sum(ns) AS BIGINT) AS n_sessions, count(*) AS n_events
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_distinct" ->
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""".stripMargin,

    "q_set_ops" ->
      """SELECT user_id, 'click_only' AS relation FROM (
        |  SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
        |  EXCEPT
        |  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
        |UNION ALL
        |SELECT user_id, 'both' AS relation FROM (
        |  SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
        |  INTERSECT
        |  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
        |ORDER BY relation, user_id""".stripMargin,

    "q_pivot" ->
      """SELECT user_id,
        | count(*) FILTER (event_type = 'click') AS click,
        | count(*) FILTER (event_type = 'view') AS view,
        | count(*) FILTER (event_type = 'purchase') AS purchase,
        | count(*) FILTER (event_type = 'signup') AS signup,
        | count(*) FILTER (event_type = 'error') AS error
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_string_funcs" ->
      """SELECT c_custkey,
        | upper(substr(c_name, 1, 8)) AS u8,
        | lpad(CAST(c_custkey AS VARCHAR), 9, '0') AS padded,
        | reverse(c_mktsegment) AS rev_seg,
        | levenshtein(c_mktsegment, 'BUILDING') AS lev
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_percentiles" ->
      """SELECT event_type,
        | round(quantile_cont(value, 0.5), 4) + 0.0 AS p50,
        | round(quantile_cont(value, 0.95), 4) + 0.0 AS p95
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_stats_moments" ->
      s"""SELECT event_type, n,
         | round(s1 / 100.0 / n, 4) AS mean_value,
         | round($momentsVarSql, 4) AS var_value
         |FROM ($momentsStSql)
         |ORDER BY event_type""".stripMargin,

    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate < TIMESTAMP '1996-01-01')
        |ORDER BY c_custkey""".stripMargin,

    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey
        |                AND o_orderdate < TIMESTAMP '1996-01-01')
        |ORDER BY c_custkey""".stripMargin,

    "q_full_outer" ->
      """WITH c AS (SELECT c_nationkey AS nationkey, count(*) AS n_cust
        |           FROM customer WHERE c_acctbal > 9900 GROUP BY 1),
        |s AS (SELECT s_nationkey AS nationkey, count(*) AS n_supp
        |      FROM supplier WHERE s_acctbal > 8500 GROUP BY 1)
        |SELECT CAST(coalesce(c.nationkey, s.nationkey) AS BIGINT) AS nationkey,
        |  coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
        |FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
        |ORDER BY nationkey""".stripMargin,

    "q_moving_avg" ->
      """SELECT event_id, user_id,
        | round(sum(CAST(round(value*100) AS BIGINT)) OVER w / 100.0
        |   / count(*) OVER w, 4) AS moving_avg
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "q_rollup" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        | coalesce(o_orderpriority, 'ALL') AS priority,
        | count(*) AS n,
        | round(sum(CAST(round(o_totalprice*100) AS BIGINT))/100.0, 2) AS total_price
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,

    "q_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        | coalesce(o_orderpriority, 'ALL') AS priority,
        | count(*) AS n,
        | round(sum(CAST(round(o_totalprice*100) AS BIGINT))/100.0, 2) AS total_price
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,

    "q_gap_fill" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket, count(*) AS n_events,
        |    sum(CAST(round(value*100) AS BIGINT)) AS cents
        |  FROM events GROUP BY 1, 2),
        |span AS (SELECT event_type, min(bucket) AS lo, max(bucket) AS hi
        |         FROM hourly GROUP BY 1),
        |grid AS (SELECT event_type,
        |           unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
        |         FROM span),
        |j AS (SELECT g.event_type, g.bucket, h.n_events, h.cents
        |      FROM grid g LEFT JOIN hourly h
        |        ON g.event_type = h.event_type AND g.bucket = h.bucket)
        |SELECT event_type, bucket,
        |  coalesce(n_events, 0) AS n_events,
        |  round(last_value(cents IGNORE NULLS) OVER (
        |    PARTITION BY event_type ORDER BY bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0, 2) AS filled_value,
        |  n_events IS NULL AS is_gap
        |FROM j ORDER BY event_type, bucket""".stripMargin,

    "q_hopping_window" ->
      """SELECT window_start, event_type, count(*) AS n FROM (
        |  SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type FROM events
        |  UNION ALL
        |  SELECT time_bucket(INTERVAL '1 hour', ts) - INTERVAL '1 hour' AS window_start, event_type FROM events
        |) GROUP BY window_start, event_type ORDER BY window_start, event_type""".stripMargin,

    "q_lag_analytics" ->
      """SELECT event_id, user_id,
        | epoch_us(ts) - lag(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        |FROM events ORDER BY event_id""".stripMargin,

    "q_topk_users" ->
      """SELECT user_id, count(*) AS n FROM events
        |GROUP BY user_id ORDER BY n DESC, user_id LIMIT 10""".stripMargin,

    // the window formulation the bounded aggregate replaces — values come
    // straight from storage, so both engines rank identical doubles
    "q_group_topk" ->
      """SELECT event_type, CAST(rn AS BIGINT) AS rank, event_id,
        |  value + 0.0 AS score
        |FROM (SELECT event_type, event_id, value,
        |        row_number() OVER (PARTITION BY event_type
        |          ORDER BY value DESC, event_id) AS rn
        |      FROM events) t
        |WHERE rn <= 3 ORDER BY event_type, rank""".stripMargin,

    "q_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id AS u, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (
        |  SELECT e.user_id AS u, min(e.ts) AS tp, max(s1.t1) AS t1
        |  FROM events e JOIN s1 ON e.user_id = s1.u
        |  WHERE e.event_type = 'click' AND e.ts > s1.t1
        |    AND e.ts <= s1.t1 + INTERVAL 7 DAY GROUP BY 1),
        |s3 AS (
        |  SELECT e.user_id AS u, min(e.ts) AS tp, max(s2.t1) AS t1
        |  FROM events e JOIN s2 ON e.user_id = s2.u
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.tp
        |    AND e.ts <= s2.t1 + INTERVAL 7 DAY GROUP BY 1),
        |n AS (
        |  SELECT 1 AS step, 'view' AS event_type, count(*) AS n_users FROM s1
        |  UNION ALL SELECT 2, 'click', count(*) FROM s2
        |  UNION ALL SELECT 3, 'purchase', count(*) FROM s3),
        |b AS (SELECT n_users AS n1 FROM n WHERE step = 1)
        |SELECT CAST(n.step AS BIGINT) AS step, n.event_type,
        |  CAST(n.n_users AS BIGINT) AS n_users,
        |  ((10000 * n.n_users) // nullif(b.n1, 0)) / 10000.0 + 0.0 AS conv
        |FROM n CROSS JOIN b ORDER BY step""".stripMargin,

    "q_scd2" ->
      """WITH s AS (
        |  SELECT user_id, event_type, ts, event_id,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev
        |  FROM events),
        |c AS (
        |  SELECT user_id, event_type, ts, event_id FROM s
        |  WHERE prev IS NULL OR prev IS DISTINCT FROM event_type)
        |SELECT user_id, event_type, ts AS valid_from,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
        |FROM c ORDER BY user_id, valid_from""".stripMargin,

    "q_join_profile" ->
      """WITH l AS (
        |  SELECT o_orderkey AS k FROM orders UNION ALL SELECT NULL),
        |r AS (
        |  SELECT l_orderkey AS k FROM lineitem
        |  UNION ALL SELECT NULL UNION ALL SELECT NULL),
        |lc AS (SELECT k, count(*) AS c_l FROM l WHERE k IS NOT NULL GROUP BY k),
        |rc AS (SELECT k, count(*) AS c_r FROM r WHERE k IS NOT NULL GROUP BY k),
        |ls AS (SELECT CAST(coalesce(sum(c_l), 0) AS BIGINT) AS n_left,
        |              count(*) AS n_left_keys FROM lc),
        |ln AS (SELECT count(*) AS n_left_null FROM l WHERE k IS NULL),
        |rs AS (SELECT CAST(coalesce(sum(c_r), 0) AS BIGINT) AS n_right,
        |              count(*) AS n_right_keys FROM rc),
        |rn AS (SELECT count(*) AS n_right_null FROM r WHERE k IS NULL),
        |cm AS (SELECT count(*) AS n_common_keys,
        |         CAST(coalesce(sum(c_l * c_r), 0) AS BIGINT) AS est_out_rows
        |       FROM lc JOIN rc USING (k))
        |SELECT n_left, n_left_keys, n_left_null, n_right, n_right_keys,
        |  n_right_null, n_common_keys, est_out_rows
        |FROM ls, ln, rs, rn, cm""".stripMargin,

    "q_retention" ->
      """WITH act AS (
        |  SELECT DISTINCT user_id AS u,
        |    date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7 AS wk
        |  FROM events),
        |c AS (SELECT u, min(wk) AS cohort_wk FROM act GROUP BY 1)
        |SELECT CAST(c.cohort_wk AS BIGINT) AS cohort_wk,
        |  CAST(act.wk - c.cohort_wk AS BIGINT) AS week_offset,
        |  count(*) AS n_users
        |FROM act JOIN c USING (u)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_value_hist" ->
      """WITH b AS (
        |  SELECT CASE WHEN value < 100.0 THEN -1
        |              WHEN value >= 400.0 THEN 20
        |              ELSE CAST(floor((value - 100.0) / 15.0) AS BIGINT) END AS bin
        |  FROM events WHERE value IS NOT NULL)
        |SELECT bin, count(*) AS n,
        |  CAST(CASE WHEN bin >= 0 AND bin < 20
        |    THEN 100.0 + bin * 15.0 END AS DOUBLE) AS bin_lo,
        |  CAST(CASE WHEN bin >= 0 AND bin < 20
        |    THEN 100.0 + (bin + 1) * 15.0 END AS DOUBLE) AS bin_hi
        |FROM b GROUP BY bin ORDER BY bin""".stripMargin,

    "q_skew_report" ->
      """WITH counts AS (
        |  SELECT CAST(user_id AS VARCHAR) AS key, count(*) AS n_rows
        |  FROM events GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_rows) AS BIGINT) AS n_total,
        |               CAST(count(*) AS BIGINT) AS n_keys FROM counts)
        |SELECT key, CAST(n_rows AS BIGINT) AS n_rows,
        |  ((10000 * n_rows) // tot.n_total) / 10000.0 + 0.0 AS share,
        |  CAST((CAST(100 AS HUGEINT) * n_rows * tot.n_keys) // tot.n_total
        |    AS BIGINT) / 100.0 + 0.0 AS skew
        |FROM counts CROSS JOIN tot
        |ORDER BY n_rows DESC, key IS NULL, key LIMIT 10""".stripMargin,

    // the oracle REBUILDS the sketch: k smallest distinct 32-bit md5-lane
    // hashes per source (row_number over the distinct hash set), then the
    // same integer estimator — the estimate is a pure function of the
    // sketch, so engine parity IS sketch parity
    "q_kmv_distinct" ->
      s"""WITH tk AS (
         |  SELECT source, unnest($sqlTokens) AS tok FROM documents),
         |hs AS (SELECT DISTINCT source, ${Sketches.kmvHash32Sql("tok")} AS h FROM tk),
         |rk AS (SELECT source, h,
         |         row_number() OVER (PARTITION BY source ORDER BY h) AS rn,
         |         count(*) OVER (PARTITION BY source) AS nd
         |       FROM hs),
         |ag AS (SELECT source, max(nd) AS nd, max(CASE WHEN rn = 64 THEN h END) AS kth
         |       FROM rk GROUP BY source)
         |SELECT source,
         |  CAST(CASE WHEN nd < 64 THEN nd
         |       ELSE CAST(63 AS BIGINT) * 4294967296 // kth END AS BIGINT) AS est_distinct
         |FROM ag ORDER BY source""".stripMargin,

    // Same Knuth-hash bottom-k sample, type-1 rank pick — the
    // q_fixed_sample hash lane carrying the value column.
    "q_quantile_sketch" -> quantileSketchSql,
    // identical SQL by design: the stored sample table holds exactly the
    // rows the one-shot sketch samples (merge law) and its totals add —
    // same rows, same hash
    "q_quantile_stored" -> quantileSketchSql,

    // Cell-for-cell count-min twin: arms generated from the same
    // (depth, width, salt) literals as the engine's sketch.
    "q_heavy_hitters" -> cmsHeavyHittersSql(depth = 3, width = 64,
      minCount = 500L),

    // The recursive-CTE cluster closure + the shared split hash; leaking
    // = members in >1 split.
    "q_split_leakage" -> splitLeakageSql,
    // identical SQL by design: the stored cluster table holds exactly the
    // labels the inline kernel derives (the q_dedup_indexed convention)
    "q_leakage_indexed" -> splitLeakageSql,

    // Both centroids ride the r4-then-FLOAT narrowing (the silhouette
    // convention) so the engines compare bit-identical vectors; a
    // one-sided label keeps its row with NULL cosine.
    "q_embed_drift" ->
      """WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vv
        |  FROM embeddings),
        |dims AS (SELECT unnest(generate_series(1, (SELECT max(len(vv)) FROM v))) AS i),
        |r AS (SELECT label, vv FROM v WHERE vec_id % 2 = 0),
        |c AS (SELECT label,
        |    CASE WHEN label = 3 THEN list_transform(vv, x -> -x) ELSE vv END AS vv
        |  FROM v WHERE vec_id % 2 = 1 AND label <> 7),
        |cr AS (SELECT label, d.i - 1 AS pos,
        |    CAST(CAST(round(avg(vv[d.i]), 4) + 0.0 AS FLOAT) AS DOUBLE) AS m
        |  FROM r CROSS JOIN dims d WHERE d.i <= len(vv) GROUP BY label, pos),
        |crv AS (SELECT label, list(m ORDER BY pos) AS cv FROM cr GROUP BY label),
        |nr AS (SELECT label, count(*) AS n_ref FROM r GROUP BY label),
        |cc AS (SELECT label, d.i - 1 AS pos,
        |    CAST(CAST(round(avg(vv[d.i]), 4) + 0.0 AS FLOAT) AS DOUBLE) AS m
        |  FROM c CROSS JOIN dims d WHERE d.i <= len(vv) GROUP BY label, pos),
        |ccv AS (SELECT label, list(m ORDER BY pos) AS cv FROM cc GROUP BY label),
        |nc AS (SELECT label, count(*) AS n_cur FROM c GROUP BY label),
        |a AS (SELECT crv.label, crv.cv, nr.n_ref FROM crv JOIN nr ON crv.label = nr.label),
        |b AS (SELECT ccv.label, ccv.cv, nc.n_cur FROM ccv JOIN nc ON ccv.label = nc.label)
        |SELECT CAST(COALESCE(a.label, b.label) AS BIGINT) AS label,
        |  COALESCE(a.n_ref, 0) AS n_ref, COALESCE(b.n_cur, 0) AS n_cur,
        |  round(list_dot_product(a.cv, b.cv)
        |    / (sqrt(list_dot_product(a.cv, a.cv))
        |       * sqrt(list_dot_product(b.cv, b.cv))), 4) + 0.0 AS centroid_cos
        |FROM a FULL OUTER JOIN b ON a.label = b.label
        |ORDER BY label""".stripMargin,

    // bottom-k of the merged sketches IS the union's sketch; membership
    // flags against both input sketches estimate the intersection — all
    // divisions integer, mirrored exactly.
    "q_kmv_overlap" ->
      s"""WITH tk AS (
         |  SELECT source, unnest($sqlTokens) AS tok FROM documents),
         |hs AS (SELECT DISTINCT source AS g, ${Sketches.kmvHash32Sql("tok")} AS h FROM tk),
         |sk AS (SELECT g, h FROM (
         |    SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn
         |    FROM hs) WHERE rn <= 64),
         |gs AS (SELECT DISTINCT g FROM sk),
         |pairs AS (SELECT a.g AS ga, b.g AS gb FROM gs a JOIN gs b ON a.g < b.g),
         |uh AS (SELECT DISTINCT ga, gb, h FROM (
         |    SELECT p.ga, p.gb, s.h FROM pairs p JOIN sk s ON s.g = p.ga
         |    UNION ALL
         |    SELECT p.ga, p.gb, s.h FROM pairs p JOIN sk s ON s.g = p.gb)),
         |m AS (SELECT ga, gb, h, rn FROM (
         |    SELECT ga, gb, h,
         |      row_number() OVER (PARTITION BY ga, gb ORDER BY h) AS rn
         |    FROM uh) WHERE rn <= 64),
         |fl AS (SELECT m.ga, m.gb, m.rn, m.h,
         |    CASE WHEN sa.h IS NOT NULL THEN 1 ELSE 0 END AS ina,
         |    CASE WHEN sb.h IS NOT NULL THEN 1 ELSE 0 END AS inb
         |  FROM m LEFT JOIN sk sa ON sa.g = m.ga AND sa.h = m.h
         |         LEFT JOIN sk sb ON sb.g = m.gb AND sb.h = m.h),
         |ag AS (SELECT ga, gb, count(*) AS ku,
         |    max(CASE WHEN rn = 64 THEN h END) AS kth,
         |    CAST(sum(ina * inb) AS BIGINT) AS n_both
         |  FROM fl GROUP BY ga, gb)
         |SELECT ga, gb,
         |  CAST(CASE WHEN ku < 64 THEN ku
         |       ELSE ${63L * 4294967296L} // kth END AS BIGINT) AS est_union,
         |  n_both,
         |  CAST((n_both * (CASE WHEN ku < 64 THEN ku
         |       ELSE ${63L * 4294967296L} // kth END)) // ku AS BIGINT)
         |    AS est_intersection
         |FROM ag ORDER BY ga, gb""".stripMargin,

    // u and the weight are integers, so u/w is ONE correctly-rounded IEEE
    // division — bit-identical across engines, no rounding needed on the key
    "q_weighted_sample" ->
      s"""WITH tc AS (
         |  SELECT doc_id, CAST(len($sqlTokens) AS BIGINT) AS n_tokens FROM documents),
         |k AS (
         |  SELECT doc_id, n_tokens,
         |    CAST(((doc_id % 1000003) * 2654435761) % 1000000007 + 1 AS DOUBLE)
         |      / n_tokens AS sel_key
         |  FROM tc WHERE n_tokens > 0),
         |s AS (SELECT * FROM k ORDER BY sel_key, doc_id LIMIT 200)
         |SELECT doc_id, n_tokens, sel_key FROM s ORDER BY doc_id""".stripMargin,

    // medians interpolate INTEGER cents — exact doubles on both engines
    // regardless of interpolation association; MAD=0 groups yield NULLs
    // Integer end to end like the engine: med2/mad4 restore exact BIGINTs
    // from the interpolated medians, rz = floored basis points (// ≡ div,
    // both toward zero) — the double-rounding tie class (1.23975 etc.)
    // that diverged at sf0.1 cannot occur.
    "q_mad_outliers" ->
      """WITH c AS (
        |  SELECT event_id, event_type, value,
        |    CAST(round(value*100) AS BIGINT) AS vc
        |  FROM events),
        |m AS (SELECT event_type,
        |    CAST(quantile_cont(vc, 0.5) * 2 AS BIGINT) AS med2
        |      FROM c GROUP BY event_type),
        |d AS (SELECT c.*, m.med2, abs(c.vc * 2 - m.med2) AS dev2
        |      FROM c JOIN m USING (event_type)),
        |md AS (SELECT event_type,
        |    CAST(quantile_cont(dev2, 0.5) * 2 AS BIGINT) AS mad4
        |       FROM d GROUP BY event_type)
        |SELECT d.event_id, d.event_type, d.value,
        |  CAST(d.med2 AS DOUBLE) / 200.0 AS med,
        |  CAST(md.mad4 AS DOUBLE) / 400.0 AS mad,
        |  CASE WHEN md.mad4 <> 0
        |       THEN CAST((13490 * (d.vc * 2 - d.med2)) // md.mad4 AS DOUBLE)
        |            / 10000.0 + 0.0 END AS rz,
        |  CASE WHEN md.mad4 <> 0
        |       THEN abs((13490 * (d.vc * 2 - d.med2)) // md.mad4) > 35000 END AS is_outlier
        |FROM d JOIN md USING (event_type)
        |ORDER BY event_id""".stripMargin,

    // cells from the shared assignment CTEs, then the q_temp_sample
    // pattern keyed on the cell id (alpha 0.5, target 150)
    "q_cluster_sample" ->
      s"""WITH $ivfAssignCtes,
         |cnt AS (SELECT cid, CAST(count(*) AS DOUBLE) AS n FROM assign GROUP BY cid),
         |w AS (SELECT cid, n, CAST(round(pow(n, 0.5) * 1000000) AS BIGINT) AS w FROM cnt),
         |z AS (SELECT CAST(sum(w) AS BIGINT) AS z FROM w),
         |p AS (SELECT cid, least(CAST(100 AS BIGINT),
         |        CAST(round(100.0 * 150 * (w / z.z) / n) AS BIGINT)) AS keep_pct
         |      FROM w, z)
         |SELECT a.cid AS centroid_id, count(*) AS n_kept,
         |  CAST(max(p.keep_pct) AS BIGINT) AS keep_pct
         |FROM assign a JOIN p USING (cid)
         |WHERE ((a.vec_id % 1000003) * 2654435761) % 100 < p.keep_pct
         |GROUP BY a.cid ORDER BY centroid_id""".stripMargin,

    // both unigram models in ONE vocab pass (target ⊆ corpus shares V);
    // per-token log-ratios in integer micro-units — order-invariant
    "q_dsir" ->
      s"""WITH w AS (
         |  SELECT doc_id AS doc, source = 'src0' AS t, unnest($sqlTokens) AS word
         |  FROM documents),
         |v AS (SELECT word, count(*) AS cr,
         |        CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS ct
         |      FROM w GROUP BY word),
         |st AS (SELECT CAST(sum(cr) AS DOUBLE) AS nr, CAST(sum(ct) AS DOUBLE) AS nt,
         |              CAST(count(*) AS DOUBLE) AS v FROM v),
         |sc AS (
         |  SELECT doc, CAST(count(*) AS BIGINT) AS n_tokens,
         |    round(sum(CAST(round((ln((ct + 1) / (nt + v)) - ln((cr + 1) / (nr + v))) * 1e6, 0) AS BIGINT))
         |      / 1e6 / count(*), 4) + 0.0 AS avg_logratio
         |  FROM w JOIN v USING (word) CROSS JOIN st
         |  GROUP BY doc),
         |top AS (SELECT * FROM sc ORDER BY avg_logratio DESC, doc LIMIT 200)
         |SELECT doc, n_tokens, avg_logratio FROM top ORDER BY doc""".stripMargin,

    "q_running_total" ->
      """SELECT event_id, user_id,
        | round(sum(CAST(round(value*100) AS BIGINT)) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)/100.0, 2) AS running_value
        |FROM events ORDER BY event_id""".stripMargin,

    "q3_shipping" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        | round(sum(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT)))/10000.0, 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-07-01'
        |  AND l_shipdate > TIMESTAMP '1998-07-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10""".stripMargin,

    "q5_region_revenue" ->
      """SELECT n_name, round(sum(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT)))/10000.0, 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q_tokens" ->
      s"""SELECT doc_id, len($sqlTokens) AS n_ws_tokens,
         | len(regexp_extract_all(lower(text), '$BpePatternSql')) AS n_bpe_tokens
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q_langid" -> langIdSql,

    "q_dict_tag" ->
      s"""WITH tok AS (
         |  SELECT doc_id AS doc, unnest($sqlTokens) AS token,
         |    generate_subscripts($sqlTokens, 1) - 1 AS pos
         |  FROM documents),
         |dict(term, tag) AS (VALUES ('JOIN', 'sql_kw'), ('hash', 'sql_kw'),
         |  ('spark', 'engine'), ('quantum', 'absent'))
         |SELECT doc, CAST(pos AS BIGINT) AS pos, lower(tok.token) AS term,
         |  d.tag
         |FROM tok JOIN dict d ON lower(tok.token) = lower(d.term)
         |ORDER BY doc, pos, term""".stripMargin,

    // regexp classes shared codepoint-for-codepoint with the engine's
    // BMP ranges; len(regexp_extract_all) is DuckDB's regexp_count.
    "q_script_mix" ->
      s"""WITH c AS ($scriptCorpusSql),
         |m AS (SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) AS n_latin,
         |  CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digit,
         |  CAST(len(regexp_extract_all(text, '[\\x{0400}-\\x{04FF}]')) AS BIGINT) AS n_cyrillic,
         |  CAST(len(regexp_extract_all(text, '[\\x{4E00}-\\x{9FFF}]')) AS BIGINT) AS n_cjk,
         |  CAST(len(regexp_extract_all(text, '[\\x{0600}-\\x{06FF}]')) AS BIGINT) AS n_arabic,
         |  CAST(length(regexp_replace(text, '\\s', '', 'g')) AS BIGINT) AS n_nonspace
         | FROM c)
         |SELECT doc_id, n_latin, n_digit, n_cyrillic, n_cjk, n_arabic,
         |  n_nonspace,
         |  n_nonspace - (n_latin + n_digit + n_cyrillic + n_cjk + n_arabic)
         |    AS n_other,
         |  CASE WHEN n_nonspace > 0
         |    THEN CAST((10000 * n_latin) // n_nonspace AS BIGINT) END AS latin_bp
         |FROM m ORDER BY doc_id""".stripMargin,

    "q_quality" -> qualitySql,

    "q_quality_cut" -> qualityCutSql,

    "q_quality_deciles" -> qualityDecilesSql,

    "q_bpe_pairs" ->
      s"""WITH w AS (SELECT unnest($sqlTokens) AS word FROM documents),
         |wf AS (SELECT word, count(*) AS n FROM w GROUP BY word),
         |p AS (
         |  SELECT substr(word, ii, 1) AS left_sym,
         |    substr(word, ii + 1, 1) AS right_sym, n
         |  FROM (SELECT word, n, unnest(generate_series(1, len(word) - 1)) AS ii
         |        FROM wf WHERE len(word) >= 2))
         |SELECT left_sym, right_sym, CAST(sum(n) AS BIGINT) AS pair_count
         |FROM p GROUP BY 1, 2 HAVING sum(n) >= 50
         |ORDER BY left_sym, right_sym""".stripMargin,

    "q_bpe_train" -> bpeTrainSql(3),

    "q_bpe_segments" -> bpeSegmentsSql(3),

    "q_feature_hash" -> featureHashSql,

    "q_linear_score" ->
      s"""WITH $featureHashCtes,
         |w AS (SELECT idx, ((idx * 2654435761) % 1000003) % 2001 - 1000 AS w_micro
         |      FROM (SELECT unnest(generate_series(0, 255)) AS idx))
         |SELECT doc, CAST(sum(f_sum * coalesce(w_micro, 0)) + 50000 AS BIGINT)
         |    AS logit_micro,
         |  (sum(f_sum * coalesce(w_micro, 0)) + 50000) > 0 AS predicted
         |FROM fs LEFT JOIN w ON fs.feature_idx = w.idx
         |GROUP BY doc ORDER BY doc""".stripMargin,

    "q_upsample" ->
      """WITH r AS (SELECT DISTINCT source,
        |        CAST((CAST(substring(source, 4) AS INT) % 4) * 7500 AS BIGINT)
        |          AS rate_bp
        |      FROM documents),
        |c AS (SELECT d.doc_id, d.source,
        |        rate_bp // 10000
        |          + CASE WHEN ((d.doc_id % 1000003) * 2654435761) % 10000
        |                      < rate_bp % 10000 THEN 1 ELSE 0 END AS copies
        |      FROM documents d JOIN r USING (source))
        |SELECT doc_id, source,
        |  CAST(unnest(generate_series(1, copies)) AS BIGINT) AS copy_idx
        |FROM c WHERE copies >= 1 ORDER BY doc_id, copy_idx""".stripMargin,

    "q_normalize" ->
      """WITH base AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT 100001, 'cafe' || chr(769) || ' du monde'
        |  UNION ALL SELECT 100002,
        |    'u' || chr(776) || 'ber angstro' || chr(776) || 'm units'
        |  UNION ALL SELECT 100003, 'already composed caf' || chr(233))
        |SELECT doc_id, nfc_normalize(text) <> text AS changed,
        |  CAST(length(text) AS BIGINT) AS len_before,
        |  CAST(length(nfc_normalize(text)) AS BIGINT) AS len_after,
        |  md5(nfc_normalize(text)) AS norm_md5
        |FROM base ORDER BY doc_id""".stripMargin,

    "q_repeated_spans" ->
      s"""WITH t AS (SELECT doc_id, $sqlTokens AS tk FROM documents),
         |w AS (SELECT doc_id, unnest(generate_series(0, len(tk) - 8)) AS pos, tk
         |      FROM t WHERE len(tk) >= 8),
         |s AS (SELECT doc_id, array_to_string(tk[pos+1 : pos+8], ' ') AS span
         |      FROM w)
         |SELECT span, count(DISTINCT doc_id) AS n_docs, count(*) AS n_occ,
         |  min(doc_id) AS first_doc
         |FROM s GROUP BY span HAVING count(DISTINCT doc_id) >= 2
         |ORDER BY span""".stripMargin,

    // gaps-and-islands twin of Dedup.duplicateSpans: lag + running sum per
    // doc; NULL lag falls to the ELSE 1 arm exactly like Spark's otherwise
    "q_span_dedup" ->
      s"""WITH t AS (SELECT doc_id, $sqlTokens AS tk FROM documents),
         |w AS (SELECT doc_id, unnest(generate_series(1, len(tk) - 7)) AS start, tk
         |      FROM t WHERE len(tk) >= 8),
         |s AS (SELECT doc_id, start, array_to_string(tk[start : start+7], ' ') AS win
         |      FROM w),
         |dup AS (SELECT win FROM s GROUP BY win HAVING count(DISTINCT doc_id) >= 2),
         |c AS (SELECT doc_id, start FROM s WHERE win IN (SELECT win FROM dup)),
         |m AS (SELECT doc_id, start,
         |        CASE WHEN start - lag(start) OVER (PARTITION BY doc_id ORDER BY start) <= 8
         |             THEN 0 ELSE 1 END AS newisl
         |      FROM c),
         |i AS (SELECT doc_id, start,
         |        sum(newisl) OVER (PARTITION BY doc_id ORDER BY start) AS isl
         |      FROM m)
         |SELECT doc_id AS doc, CAST(min(start) AS BIGINT) AS span_start,
         |  CAST(max(start) + 7 AS BIGINT) AS span_end,
         |  count(*) AS n_windows,
         |  CAST(max(start) + 7 - min(start) + 1 AS BIGINT) AS span_len
         |FROM i GROUP BY doc_id, isl ORDER BY doc, span_start""".stripMargin,

    // winnowing twin: same packed (hash, rightmost-pos) key, the same
    // w-row MIN frame, // 2^20 decode (pk positive, ≡ Spark shiftright)
    "q_winnow" ->
      s"""WITH t AS (SELECT doc_id, $sqlTokens AS tk FROM documents),
         |g AS (SELECT doc_id, unnest(generate_series(1, len(tk) - 2)) AS start, tk
         |      FROM t WHERE len(tk) >= 3),
         |h AS (SELECT doc_id, start,
         |        (${Sketches.kmvHash32Sql("array_to_string(tk[start : start+2], ' ')")})
         |          * 1048576 + (1048575 - start) AS pk
         |      FROM g),
         |w AS (SELECT doc_id, start, pk,
         |        min(pk) OVER (PARTITION BY doc_id ORDER BY start
         |                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS win_min,
         |        row_number() OVER (PARTITION BY doc_id ORDER BY start) AS rn,
         |        count(*) OVER (PARTITION BY doc_id) AS n
         |      FROM h),
         |p AS (SELECT DISTINCT doc_id, n, win_min FROM w WHERE rn <= n - 3),
         |f AS (SELECT doc_id, n, win_min // 1048576 AS fp_hash FROM p),
         |sh AS (SELECT fp_hash FROM f GROUP BY fp_hash
         |       HAVING count(DISTINCT doc_id) >= 2)
         |SELECT doc_id AS doc, CAST(max(n) AS BIGINT) AS n_kgrams,
         |  count(*) AS n_fps,
         |  CAST(sum(CASE WHEN fp_hash IN (SELECT fp_hash FROM sh)
         |               THEN 1 ELSE 0 END) AS BIGINT) AS n_shared
         |FROM f GROUP BY doc_id ORDER BY doc""".stripMargin,

    "q_winsorize" ->
      """WITH b AS (
        |  SELECT event_type, round(quantile_cont(value, 0.05), 4) + 0.0 AS lo,
        |    round(quantile_cont(value, 0.95), 4) + 0.0 AS hi
        |  FROM events GROUP BY 1)
        |SELECT event_id, e.event_type, value,
        |  least(greatest(value, lo), hi) AS clamped,
        |  least(greatest(value, lo), hi) <> value AS was_clamped
        |-- null-safe join mirrors the engine's <=>: a null event_type group
        |-- keeps its rows (the operator's keep-the-row contract, TextOpsSpec)
        |FROM events e JOIN b ON e.event_type IS NOT DISTINCT FROM b.event_type
        |ORDER BY event_id""".stripMargin,

    "q_corpus_stats" -> corpusStatsSql,

    "q_vocab_richness" ->
      s"""WITH w AS (
         |  SELECT source AS grp, tok, count(*) AS c FROM (
         |    SELECT source, unnest($sqlTokens) AS tok FROM documents)
         |  WHERE tok <> '' GROUP BY 1, 2),
         |a AS (SELECT grp,
         |    CAST(sum(c) AS BIGINT) AS n_tokens,
         |    CAST(count(*) AS BIGINT) AS vocab,
         |    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
         |    CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
         |  FROM w GROUP BY 1)
         |SELECT grp AS source, n_tokens, vocab, f1, f2,
         |  vocab + CASE WHEN f2 > 0 THEN (f1 * f1) // (2 * f2)
         |               ELSE (f1 * (f1 - 1)) // 2 END AS chao1,
         |  (10000 * f1) // n_tokens AS unseen_bp
         |FROM a ORDER BY source""".stripMargin,

    "q_temp_sample" ->
      """WITH cnt AS (
        |  SELECT lang, CAST(count(*) AS DOUBLE) AS n FROM documents
        |  WHERE lang IS NOT NULL GROUP BY lang),
        |w AS (
        |  SELECT lang, n, CAST(round(pow(n, 0.5) * 1000000) AS BIGINT) AS w
        |  FROM cnt),
        |z AS (SELECT CAST(sum(w) AS BIGINT) AS z FROM w),
        |p AS (
        |  SELECT lang, least(CAST(100 AS BIGINT),
        |    CAST(round(100.0 * 200 * (w / z.z) / n) AS BIGINT)) AS keep_pct
        |  FROM w, z)
        |SELECT d.lang, count(*) AS n_kept, CAST(max(p.keep_pct) AS BIGINT) AS keep_pct
        |FROM documents d JOIN p USING (lang)
        |WHERE ((d.doc_id % 1000003) * 2654435761) % 100 < p.keep_pct
        |GROUP BY d.lang ORDER BY d.lang""".stripMargin,

    "q_token_hist" ->
      s"""SELECT (CAST(len($sqlTokens) AS BIGINT) // 50) * 50 AS bin_lo,
         |  count(*) AS n_docs
         |FROM documents GROUP BY 1 ORDER BY bin_lo""".stripMargin,

    "q_chunking" ->
      s"""WITH t AS (SELECT doc_id, $sqlTokens AS tk FROM documents),
         |k AS (
         |  SELECT doc_id, tk, (greatest(len(tk) - 64, 0) + 48 - 1) // 48 AS kk
         |  FROM t),
         |c AS (
         |  SELECT doc_id, tk, unnest(generate_series(0, kk)) AS chunk_id FROM k)
         |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
         |  CAST(chunk_id * 48 AS BIGINT) AS start_tok,
         |  CAST(len(tk[chunk_id*48+1 : chunk_id*48+64]) AS BIGINT) AS n_tok,
         |  array_to_string(tk[chunk_id*48+1 : chunk_id*48+64], ' ') AS chunk_text
         |FROM c ORDER BY doc_id, chunk_id""".stripMargin,

    // CDC twin: identical md5-lane token hashes, identical 31^j rolling
    // combo in exact BIGINT, windowed sums cast back from HUGEINT.
    "q_cdc_chunks" ->
      s"""WITH tok AS (
         |  SELECT doc_id AS doc,
         |    unnest($sqlTokens) AS t,
         |    generate_subscripts($sqlTokens, 1) - 1 AS pos
         |  FROM documents),
         |h AS (SELECT doc, pos, ${Sketches.kmvHash32Sql("t")} AS th FROM tok),
         |r AS (SELECT doc, pos, th,
         |    th + coalesce(lag(th, 1) OVER w, 0) * 31
         |       + coalesce(lag(th, 2) OVER w, 0) * 961
         |       + coalesce(lag(th, 3) OVER w, 0) * 29791 AS combo
         |  FROM h WINDOW w AS (PARTITION BY doc ORDER BY pos)),
         |c AS (SELECT doc, pos, th,
         |    sum(CASE WHEN pos > 0 AND combo % 32 = 0 THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY doc ORDER BY pos) AS chunk_id
         |  FROM r)
         |SELECT doc, CAST(chunk_id AS BIGINT) AS chunk_id,
         |  CAST(min(pos) AS BIGINT) AS start_pos,
         |  count(*) AS n_tokens,
         |  CAST(sum(th) AS BIGINT) AS tok_hash_sum
         |FROM c GROUP BY doc, chunk_id ORDER BY doc, chunk_id""".stripMargin,

    "q_fixed_sample" ->
      """WITH r AS (
        |  SELECT lang AS grp, doc_id,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY ((doc_id % 1000003) * 2654435761) % 1000000007, doc_id) AS rn
        |  FROM documents)
        |SELECT grp, doc_id FROM r WHERE rn <= 40
        |ORDER BY grp, doc_id""".stripMargin,

    "q_sim_topk_batch" -> simTopkBatchSql,

    "q_hamming_topk" -> hammingTopkSql,

    "q_matryoshka" -> matryoshkaSql,

    "q_hard_negatives" -> hardNegativesSql,

    "q_knn_classify" -> knnClassifySql,

    "q_knn_confusion" ->
      s"""WITH base AS ($knnClassifySql)
         |SELECT true_label, pred_label, count(*) AS n FROM base
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_embed_card" ->
      """WITH e AS (
        |  SELECT CAST(embedding AS DOUBLE[]) AS vv, label FROM embeddings
        |  UNION ALL SELECT [0.0, 0.0, 0.0], 101
        |  UNION ALL SELECT [1.0, CAST('nan' AS DOUBLE), 0.5], 102
        |  UNION ALL SELECT [CAST('inf' AS DOUBLE), 1.0], 103),
        |f AS (SELECT CAST(label AS BIGINT) AS label,
        |    len(list_filter(vv, x -> NOT isfinite(x))) > 0 AS bad,
        |    list_dot_product(vv, vv) AS sq, len(vv) AS d FROM e)
        |SELECT label, count(*) AS n_vectors,
        |  CAST(sum(CASE WHEN bad THEN 1 ELSE 0 END) AS BIGINT) AS n_nonfinite,
        |  CAST(sum(CASE WHEN NOT bad AND sq = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
        |  CAST(min(d) AS BIGINT) AS dim_min, CAST(max(d) AS BIGINT) AS dim_max,
        |  CAST(sum(CASE WHEN NOT bad
        |    THEN CAST(round(sqrt(sq) * 1000000) AS BIGINT) ELSE 0 END) AS BIGINT)
        |    AS norm_micro_sum
        |FROM f GROUP BY label ORDER BY label""".stripMargin,

    "q_repetition" -> {
      val sh = sqlShingles(sqlTokens, 3)
      s"""SELECT doc_id,
         | CAST(len(sh) AS BIGINT) AS n_shingles,
         | CAST(len(list_distinct(sh)) AS BIGINT) AS n_distinct,
         | round(1.0 - CAST(len(list_distinct(sh)) AS DOUBLE) / len(sh), 6) AS rep_ratio
         |FROM (SELECT doc_id, $sh AS sh FROM documents)
         |ORDER BY doc_id""".stripMargin
    },

    "q_pii_counts" ->
      s"""SELECT doc_id,
        | CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        | CAST(len(regexp_extract_all(text, 'https?://[^\\s]+')) AS BIGINT) AS n_urls,
        | CAST(len(regexp_extract_all(text, '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b')) AS BIGINT) AS n_ipv4
        |FROM ($piiCorpusSql) ORDER BY doc_id""".stripMargin,

    "q_pii_redact" ->
      s"""SELECT doc_id,
        | regexp_replace(regexp_replace(regexp_replace(text,
        |   'https?://[^\\s]+', '<URL>', 'g'),
        |   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |   '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b', '<IP>', 'g') AS clean_text
        |FROM ($piiCorpusSql) ORDER BY doc_id""".stripMargin,

    "q_boilerplate" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk FROM documents),
        |c AS (
        |  SELECT doc_id, unnest(generate_series(0, (len(tk) + 1) // 2 - 1)) AS cidx, tk FROM t),
        |chunks AS (
        |  SELECT doc_id, cidx, array_to_string(tk[cidx*2+1 : cidx*2+2], ' ') AS chunk FROM c),
        |df AS (SELECT chunk, count(*) AS cnt FROM chunks GROUP BY chunk),
        |kept AS (SELECT doc_id, cidx, chunk FROM chunks JOIN df USING (chunk) WHERE cnt <= 20),
        |agg AS (
        |  SELECT doc_id, string_agg(chunk, ' ' ORDER BY cidx) AS clean_text, count(*) AS n_kept
        |  FROM kept GROUP BY doc_id)
        |SELECT t.doc_id, coalesce(agg.clean_text, '') AS clean_text,
        | CAST(coalesce(agg.n_kept, 0) AS BIGINT) AS n_kept,
        | CAST((len(t.tk) + 1) // 2 - coalesce(agg.n_kept, 0) AS BIGINT) AS n_dropped
        |FROM t LEFT JOIN agg USING (doc_id) ORDER BY doc_id""".stripMargin,

    "q_unigram_lp" ->
      """WITH w AS (
        |  SELECT doc_id AS doc, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word
        |  FROM documents),
        |v AS (SELECT word, count(*) AS cnt FROM w GROUP BY word),
        |tot AS (SELECT CAST(count(*) AS DOUBLE) AS n_total FROM w)
        |SELECT doc, CAST(count(*) AS BIGINT) AS n_tokens,
        | round(sum(CAST(round(ln(cnt / n_total) * 1e6, 0) AS BIGINT)) / 1e6 / count(*), 4) AS avg_logprob
        |FROM w JOIN v USING (word) CROSS JOIN tot
        |GROUP BY doc ORDER BY doc""".stripMargin,

    "q_fingerprint" ->
      s"""SELECT doc_id, $sqlFingerprint AS fp FROM documents ORDER BY doc_id""",

    "q_dedup_exact" ->
      s"""SELECT $sqlFingerprint AS fp, min(doc_id) AS keep_id, count(*) AS n_copies
         |FROM documents GROUP BY 1 ORDER BY fp""".stripMargin,

    "q_dedup_minhash" -> minhashSql,

    "q_dup_weights" ->
      s"""WITH sz AS (SELECT $sqlFingerprint AS fp, count(*) AS n_copies
         |  FROM documents GROUP BY 1),
         |dd AS (SELECT doc_id AS doc, $sqlFingerprint AS fp FROM documents)
         |SELECT doc, n_copies,
         |  CAST(1000000 // n_copies AS BIGINT) AS weight_micro
         |FROM dd JOIN sz USING (fp) ORDER BY doc""".stripMargin,

    "q_cv_stump" -> cvStumpSql,

    "q_power" -> {
      val zz2 = 2L * RelationalOps.PowerZSumSqMicro
      val den = 25000L * 25000L * 1000000L
      s"""WITH a AS (SELECT CAST(round(o_totalprice*100) AS BIGINT) AS x
         |  FROM orders WHERE o_totalprice IS NOT NULL),
         |g AS (SELECT count(*) AS n, sum(CAST(x AS HUGEINT)) AS s1,
         |    sum(CAST(x AS HUGEINT) * x) AS s2 FROM a),
         |v AS (SELECT n, CAST(s1 // n AS BIGINT) AS mean_cents,
         |    CAST((n * s2 - s1 * s1) // (n * (n - 1)) AS BIGINT)
         |      AS var_cents2
         |  FROM g)
         |SELECT n AS n_units, mean_cents, var_cents2,
         |  CAST(25000 AS BIGINT) AS mde_cents,
         |  CAST(($zz2 * CAST(var_cents2 AS HUGEINT) + $den - 1) // $den
         |    AS BIGINT) AS n_per_arm
         |FROM v""".stripMargin
    },

    "q_post_strat" ->
      """WITH cur AS (SELECT source AS st, CAST(n_chars AS BIGINT) AS x
        |  FROM documents WHERE source IS NOT NULL AND n_chars IS NOT NULL),
        |ca AS (SELECT st, count(*) AS n, sum(CAST(x AS HUGEINT)) AS s
        |  FROM cur GROUP BY 1),
        |rf AS (SELECT source AS st, count(*) AS rn FROM documents
        |  WHERE lang = 'en' AND source IS NOT NULL GROUP BY 1),
        |rt AS (SELECT CAST(sum(rn) AS BIGINT) AS t FROM rf),
        |j AS (SELECT (10000 * rn) // t AS w_bp, (100 * s) // n AS mean_cc,
        |    n, s
        |  FROM ca JOIN rf USING (st), rt)
        |SELECT CAST(sum(n) AS BIGINT) AS n_units,
        |  CAST((100 * sum(s)) // sum(n) AS BIGINT) AS naive_mean_ccents,
        |  CAST(sum(w_bp * mean_cc) // 10000 AS BIGINT) AS ps_mean_ccents
        |FROM j""".stripMargin,

    "q_sessionize" ->
      """WITH e AS (SELECT user_id, ts, event_id, epoch_ms(ts) AS ms
        |  FROM events WHERE ts IS NOT NULL),
        |b AS (SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ms) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id) IS NULL
        |         OR ms - lag(ms) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id) > 1800000
        |      THEN 1 ELSE 0 END AS nb
        |  FROM e),
        |sx AS (SELECT user_id, ts,
        |    sum(nb) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS session_idx
        |  FROM b)
        |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
        |  count(*) AS n_events, min(ts) AS start_ts, max(ts) AS end_ts,
        |  epoch_ms(max(ts)) - epoch_ms(min(ts)) AS duration_ms
        |FROM sx GROUP BY 1, 2 ORDER BY user_id, session_idx""".stripMargin,

    "q_kaplan_meier" ->
      """WITH e0 AS (SELECT user_id, ts, event_id, epoch_ms(ts) AS ms
        |  FROM events WHERE ts IS NOT NULL),
        |b0 AS (SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ms) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id) IS NULL
        |         OR ms - lag(ms) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id) > 1800000
        |      THEN 1 ELSE 0 END AS nb
        |  FROM e0),
        |sx0 AS (SELECT user_id, ts,
        |    sum(nb) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS si
        |  FROM b0),
        |sess AS MATERIALIZED (SELECT user_id, si, max(ts) AS en,
        |    epoch_ms(max(ts)) - epoch_ms(min(ts)) AS dur
        |  FROM sx0 GROUP BY 1, 2),
        |mx AS (SELECT max(en) AS m FROM sess),
        |subj AS (SELECT dur // 60000 AS t,
        |    en < (SELECT m FROM mx) - INTERVAL 30 MINUTE AS e FROM sess),
        |g AS (SELECT t, sum(CASE WHEN e THEN 1 ELSE 0 END) AS d,
        |    sum(CASE WHEN e THEN 0 ELSE 1 END) AS c FROM subj GROUP BY 1),
        |tot AS (SELECT CAST(sum(d + c) AS BIGINT) AS nn FROM g),
        |r AS (SELECT t, d,
        |    nn - coalesce(sum(d + c) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS n_at_risk
        |  FROM g, tot),
        |tm AS (SELECT t, d, n_at_risk,
        |    CASE WHEN d < n_at_risk THEN CAST(round(
        |        ln(CAST(n_at_risk - d AS DOUBLE) / n_at_risk) * 1e6, 0)
        |      AS BIGINT) END AS term
        |  FROM r),
        |ls AS (SELECT t, d, n_at_risk,
        |    sum(term) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lsum
        |  FROM tm)
        |SELECT CAST(t AS BIGINT) AS t,
        |  CAST(n_at_risk AS BIGINT) AS n_at_risk, CAST(d AS BIGINT) AS d,
        |  CASE WHEN d < n_at_risk THEN CAST(lsum AS BIGINT) END
        |    AS logs_micro,
        |  CASE WHEN d >= n_at_risk THEN 0
        |       ELSE CAST(round(exp(CAST(lsum AS DOUBLE) / 1e6) * 10000, 0)
        |         AS BIGINT) END AS s_bp
        |FROM ls WHERE d > 0 ORDER BY t""".stripMargin,

    "q_ece" -> {
      val stop = TextFunctions.Stopwords.map(s => s"'$s'").mkString(", ")
      s"""WITH sc AS (SELECT
         |    (10000 * CAST(len(list_filter(list_filter(
         |        string_split(lower(text), ' '), x -> x <> ''),
         |        x -> list_contains([$stop], x))) AS BIGINT))
         |      // greatest(CAST(len($sqlTokens) AS BIGINT), 1) AS s,
         |    lang = 'en' AS y
         |  FROM documents),
         |f AS (SELECT s, y FROM sc WHERE s IS NOT NULL AND y IS NOT NULL),
         |b AS (SELECT least(s // 1000, 9) AS bin, s, y FROM f)
         |SELECT CAST(bin AS BIGINT) AS bin, count(*) AS n,
         |  CAST(sum(s) // count(*) AS BIGINT) AS mean_score_bp,
         |  CAST((10000 * sum(CASE WHEN y THEN 1 ELSE 0 END)) // count(*)
         |    AS BIGINT) AS obs_rate_bp,
         |  CAST(abs(sum(s) // count(*)
         |      - (10000 * sum(CASE WHEN y THEN 1 ELSE 0 END)) // count(*))
         |    * count(*) AS BIGINT) AS ece_contrib
         |FROM b GROUP BY 1 ORDER BY bin""".stripMargin
    },

    // same sc CTE as q_ece; per-bin means truncate to micro on both
    // engines, the squared-error sum is exact integer bp²
    "q_brier" -> {
      val stop = TextFunctions.Stopwords.map(s => s"'$s'").mkString(", ")
      s"""WITH sc AS (SELECT
         |    (10000 * CAST(len(list_filter(list_filter(
         |        string_split(lower(text), ' '), x -> x <> ''),
         |        x -> list_contains([$stop], x))) AS BIGINT))
         |      // greatest(CAST(len($sqlTokens) AS BIGINT), 1) AS p,
         |    lang = 'en' AS y
         |  FROM documents),
         |f AS (SELECT p, CASE WHEN y THEN 1 ELSE 0 END AS o FROM sc
         |  WHERE p BETWEEN 0 AND 10000 AND y IS NOT NULL),
         |b AS (SELECT least((p * 10) // 10000, 9) AS bin, p, o FROM f),
         |pb AS (SELECT bin, count(*) AS nb, sum(p) AS sp, sum(o) AS pos,
         |    sum((p - 10000*o) * (p - 10000*o)) AS sq FROM b GROUP BY bin),
         |tot AS (SELECT sum(nb) AS n, sum(pos) AS posall FROM pb),
         |m AS (SELECT nb, sq, (100 * sp) // nb AS pbm,
         |    (1000000 * pos) // nb AS obm,
         |    (1000000 * posall) // n AS obmall, n, posall
         |  FROM pb CROSS JOIN tot),
         |agg AS (SELECT max(n) AS n, max(posall) AS posall,
         |    sum(sq) AS sqall,
         |    sum(nb * (pbm - obm) * (pbm - obm)) AS rel,
         |    sum(nb * (obm - obmall) * (obm - obmall)) AS res FROM m)
         |SELECT CAST(n AS BIGINT) AS n,
         |  round(CAST(sqall AS DOUBLE) / (1e8 * CAST(n AS DOUBLE)), 6)
         |    AS brier,
         |  round(CAST(rel AS DOUBLE) / (1e12 * CAST(n AS DOUBLE)), 6)
         |    AS reliability,
         |  round(CAST(res AS DOUBLE) / (1e12 * CAST(n AS DOUBLE)), 6)
         |    AS resolution,
         |  round(CAST(posall AS DOUBLE) *
         |      (CAST(n AS DOUBLE) - CAST(posall AS DOUBLE)) /
         |      (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS uncertainty
         |FROM agg""".stripMargin
    },

    // q_kaplan_meier's sessionized subjects + the Mantel–Cox kernel: the
    // hypergeometric mean/variance per event time truncate to micro
    "q_logrank" ->
      """WITH e0 AS (SELECT user_id, ts, event_id, epoch_ms(ts) AS ms
        |  FROM events WHERE ts IS NOT NULL),
        |b0 AS (SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ms) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id) IS NULL
        |         OR ms - lag(ms) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id) > 1800000
        |      THEN 1 ELSE 0 END AS nb
        |  FROM e0),
        |sx0 AS (SELECT user_id, ts,
        |    sum(nb) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS si
        |  FROM b0),
        |sess AS MATERIALIZED (SELECT user_id, si, max(ts) AS en,
        |    epoch_ms(max(ts)) - epoch_ms(min(ts)) AS dur
        |  FROM sx0 GROUP BY 1, 2),
        |mx AS (SELECT max(en) AS m FROM sess),
        |subj AS (SELECT dur // 60000 AS t,
        |    en < (SELECT m FROM mx) - INTERVAL 30 MINUTE AS e,
        |    user_id % 2 = 0 AS g FROM sess),
        |grain AS (SELECT t, count(*) AS a,
        |    sum(CASE WHEN g THEN 1 ELSE 0 END) AS a1,
        |    sum(CASE WHEN e THEN 1 ELSE 0 END) AS d,
        |    sum(CASE WHEN e AND g THEN 1 ELSE 0 END) AS d1
        |  FROM subj GROUP BY t),
        |tot AS (SELECT sum(a) AS n, sum(a1) AS n1t FROM grain),
        |r AS (SELECT t, d, d1,
        |    n - coalesce(sum(a) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS ni,
        |    n1t - coalesce(sum(a1) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n1i
        |  FROM grain, tot),
        |f AS (SELECT * FROM r WHERE d > 0),
        |agg AS (SELECT sum(d1) AS o1,
        |    sum((1000000 * d * n1i) // ni) AS e1m,
        |    sum(CASE WHEN ni > 1
        |      THEN (1000000 * d * n1i * (ni - n1i) * (ni - d))
        |        // (ni * ni * (ni - 1)) ELSE 0 END) AS vm
        |  FROM f)
        |SELECT CAST(o1 AS BIGINT) AS observed_1,
        |  round(CAST(e1m AS DOUBLE) / 1e6, 4) AS expected_1,
        |  round(CAST(vm AS DOUBLE) / 1e6, 4) AS variance,
        |  CASE WHEN vm <= 0 THEN NULL
        |    ELSE round((CAST(o1 AS DOUBLE) - CAST(e1m AS DOUBLE) / 1e6) /
        |      sqrt(CAST(vm AS DOUBLE) / 1e6), 4) + 0.0 END AS z
        |FROM agg""".stripMargin,

    // candidate-quality eval: truth = the exact df-cut Jaccard lane at the
    // shipping threshold, pred = the raw band buckets; nested WITH scopes
    // keep the two chains' shared CTE names (sh, sz) from colliding
    "q_dedup_recall" ->
      s"""WITH truth AS (
         |  WITH $ngramInterCtes
         |  SELECT id_a, id_b
         |  FROM inter JOIN sz x ON id_a = x.doc JOIN sz y ON id_b = y.doc
         |  WHERE round(CAST(n_inter AS DOUBLE) / (x.n_sh + y.n_sh - n_inter),4)
         |        >= 0.5),
         |pred AS (
         |  WITH $minhashCandCtes
         |  SELECT id_a, id_b FROM cand),
         |hit AS (SELECT t.id_a FROM truth t
         |        JOIN pred p ON t.id_a = p.id_a AND t.id_b = p.id_b),
         |m AS (SELECT (SELECT count(*) FROM truth) AS n_true,
         |             (SELECT count(*) FROM pred) AS n_cand,
         |             (SELECT count(*) FROM hit) AS n_hit)
         |SELECT CAST(n_true AS BIGINT) AS n_true,
         |  CAST(n_cand AS BIGINT) AS n_cand, CAST(n_hit AS BIGINT) AS n_hit,
         |  CAST(CASE WHEN n_true > 0 THEN (10000 * n_hit) // n_true
         |       ELSE 0 END AS BIGINT) AS recall_bp,
         |  CAST(CASE WHEN n_cand > 0 THEN (10000 * n_hit) // n_cand
         |       ELSE 0 END AS BIGINT) AS precision_bp
         |FROM m""".stripMargin,
    // identical SQL by design: the stored band/shingle relations hold
    // exactly what the inline kernel derives — same rows, same hash
    "q_dedup_indexed" -> minhashSql,
    "q_edit_pairs" -> editPairsSql,

    "q_dedup_clusters" -> dedupClustersSql,

    "q_cluster_best" -> clusterBestSql,

    "q_curation" -> curationSql,
    // identical SQL by design: the stored cluster table holds exactly the
    // labels the inline kernel derives — same rows, same hash
    "q_curation_indexed" -> curationSql,

    "q_feature_norm" ->
      s"""WITH st AS ($momentsStSql),
         |m AS (
         |  SELECT event_type, s1 / 100.0 / n AS mu, sqrt($momentsVarSql) AS sd
         |  FROM st)
         |SELECT e.event_id, e.event_type, round((e.value - m.mu) / m.sd, 4) AS z
         |FROM events e JOIN m USING (event_type)
         |ORDER BY e.event_id""".stripMargin,

    "q_decontaminate" -> decontaminateSql,
    // identical SQL by design: the Bloom stage is a pre-filter whose false
    // positives the exact join removes — same rows, same hash
    "q_decontam_bloom" -> decontaminateSql,

    "q_seq_pack" ->
      s"""WITH tc AS (
         |  SELECT doc_id, source AS shard, CAST(len($sqlTokens) AS BIGINT) AS n_tokens
         |  FROM documents),
         |off AS (
         |  SELECT doc_id, shard, n_tokens,
         |    coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_off
         |  FROM tc)
         |SELECT doc_id, shard, n_tokens,
         |  CAST(start_off // 512 AS BIGINT) AS pack_id,
         |  CAST(start_off % 512 AS BIGINT) AS offset_in_pack
         |FROM off ORDER BY doc_id""".stripMargin,

    "q_eval_split" ->
      """WITH a AS (
        |  SELECT doc_id,
        |    CASE WHEN ((doc_id % 1000003) * 2654435761) % 100 < 90 THEN 'train'
        |         WHEN ((doc_id % 1000003) * 2654435761) % 100 < 95 THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents)
        |SELECT split, count(*) AS n,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM a GROUP BY split ORDER BY split""".stripMargin,

    "q_bigram_lp" ->
      s"""WITH toks AS (SELECT $sqlTokens AS tk FROM documents),
         |bi AS (
         |  SELECT unnest(list_transform(generate_series(1, len(tk) - 1),
         |    i -> struct_pack(w1 := tk[i], w2 := tk[i+1]))) AS b
         |  FROM toks WHERE len(tk) >= 2),
         |c AS (SELECT b.w1 AS w1, b.w2 AS w2, count(*) AS cnt FROM bi GROUP BY 1, 2),
         |l AS (SELECT w1, CAST(sum(cnt) AS BIGINT) AS c1 FROM c GROUP BY w1)
         |SELECT c.w1, c.w2, CAST(cnt AS BIGINT) AS cnt,
         |  round(ln(CAST(cnt AS DOUBLE) / c1), 4) + 0.0 AS cond_lp
         |FROM c JOIN l USING (w1) WHERE cnt >= 25
         |ORDER BY w1, w2""".stripMargin,

    // the model CTEs repeat q_bigram_lp (same tokenizer, same minCount);
    // the backoff term is stupid-backoff 0.4·p_unigram(w2), per-pair
    // log-probs go to integer 1e4-units BEFORE the doc sum
    "q_bigram_score" ->
      s"""WITH t0 AS (SELECT doc_id AS doc, $sqlTokens AS tk FROM documents),
         |toks AS (SELECT doc, tk FROM t0 WHERE len(tk) >= 2),
         |p AS (SELECT doc, b.w1 AS w1, b.w2 AS w2 FROM (
         |  SELECT doc, unnest(list_transform(generate_series(1, len(tk) - 1),
         |    i -> struct_pack(w1 := tk[i], w2 := tk[i+1]))) AS b FROM toks)),
         |c AS (SELECT w1, w2, count(*) AS cnt FROM p GROUP BY 1, 2),
         |l AS (SELECT w1, CAST(sum(cnt) AS BIGINT) AS c1 FROM c GROUP BY w1),
         |m AS (SELECT c.w1, c.w2, round(ln(CAST(cnt AS DOUBLE) / c1), 4) + 0.0 AS cond_lp
         |      FROM c JOIN l USING (w1) WHERE cnt >= 25),
         |v AS (SELECT w2, count(*) AS ucnt
         |      FROM (SELECT unnest(tk) AS w2 FROM toks) GROUP BY w2),
         |tot AS (SELECT CAST(sum(ucnt) AS DOUBLE) AS n_total FROM v),
         |sc AS (SELECT p.doc,
         |        CAST(round(coalesce(m.cond_lp,
         |          round(ln(0.4 * v.ucnt / tot.n_total), 4) + 0.0) * 10000, 0)
         |          AS BIGINT) AS lpm
         |      FROM p LEFT JOIN m ON p.w1 = m.w1 AND p.w2 = m.w2
         |        JOIN v ON p.w2 = v.w2 CROSS JOIN tot)
         |SELECT doc, CAST(count(*) AS BIGINT) AS n_pairs,
         |  round(sum(lpm) / 10000.0, 4) + 0.0 AS bigram_lp
         |FROM sc GROUP BY doc ORDER BY doc""".stripMargin,

    // text coalesced before the fingerprint (mirrors the engine: a null
    // text is the empty document, not a count(DISTINCT)-invisible NULL);
    // NULLS FIRST matches Spark's null-first ascending sort should the
    // source column ever go null
    "q_dedup_report" ->
      s"""WITH f AS (SELECT source,
         |    md5(lower(trim(regexp_replace(coalesce(text, ''), '\\s+', ' ', 'g')))) AS fp
         |  FROM documents)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(count(DISTINCT fp) AS BIGINT) AS n_unique,
         |  CAST(count(*) - count(DISTINCT fp) AS BIGINT) AS n_dup_rows,
         |  round(CAST(count(*) - count(DISTINCT fp) AS DOUBLE)
         |    / count(*), 4) + 0.0 AS dup_ratio
         |FROM f GROUP BY source ORDER BY source NULLS FIRST""".stripMargin,

    // DISTINCT (source, shingle) relation self-joined on shingle —
    // mirrors TextAnalysis.sourceOverlap (same 3-gram CASE as shinglesCte)
    "q_source_overlap" ->
      s"""WITH t0 AS (SELECT source, $sqlTokens AS tk FROM documents),
         |sh0 AS (SELECT source, unnest(
         |  CASE WHEN len(tk) <= 3 THEN [array_to_string(tk, ' ')]
         |       ELSE list_transform(generate_series(1, len(tk) - 2),
         |              i -> array_to_string(tk[i:i+2], ' ')) END) AS shingle FROM t0),
         |sh AS (SELECT DISTINCT source, shingle FROM sh0 WHERE shingle <> ''),
         |sz AS (SELECT source, count(*) AS n_sh FROM sh GROUP BY source),
         |inter AS (SELECT a.source AS source_a, b.source AS source_b,
         |            count(*) AS n_common
         |          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.source < b.source
         |          GROUP BY 1, 2)
         |SELECT source_a, source_b,
         |  CAST(x.n_sh AS BIGINT) AS n_a, CAST(y.n_sh AS BIGINT) AS n_b,
         |  CAST(n_common AS BIGINT) AS n_common,
         |  round(CAST(n_common AS DOUBLE) / (x.n_sh + y.n_sh - n_common), 4) + 0.0
         |    AS jaccard,
         |  round(CAST(n_common AS DOUBLE) / least(x.n_sh, y.n_sh), 4) + 0.0
         |    AS containment
         |FROM inter JOIN sz x ON source_a = x.source JOIN sz y ON source_b = y.source
         |ORDER BY source_a, source_b""".stripMargin,

    // per-rule Gopher gates over the lowercased token list; ratio columns
    // null (not NaN) for the empty document, rules then coalesce to false
    "q_gopher_flags" -> gopherFlagsSql,

    // the scramble reduces mod the big prime BEFORE the shard mod: the
    // Knuth multiplier is ≡ 1 mod 8, so a direct mod-8 would be id % 8
    "q_train_shards" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    (((doc_id % 1000003) * 2654435761) % 1000000007) % 8 AS shard_id,
        |    ((doc_id % 1000003) * 2654435761) % 1000000007 AS ord
        |  FROM documents)
        |SELECT doc_id, CAST(shard_id AS BIGINT) AS shard_id,
        |  CAST(row_number() OVER (
        |    PARTITION BY shard_id ORDER BY ord, doc_id) AS BIGINT) - 1
        |    AS pos_in_shard
        |FROM h ORDER BY doc_id""".stripMargin,

    "q_domain_mix" ->
      """WITH rates(lang, pct) AS (
        |  VALUES ('en', 80), ('de', 50), ('es', 50), ('fr', 30), ('zh', 20))
        |SELECT d.lang, count(*) AS n_kept,
        |  CAST(max(coalesce(r.pct, 10)) AS BIGINT) AS target_pct
        |FROM documents d LEFT JOIN rates r ON d.lang = r.lang
        |WHERE ((d.doc_id % 1000003) * 2654435761) % 100 < coalesce(r.pct, 10)
        |GROUP BY d.lang ORDER BY d.lang""".stripMargin,

    "q_dedup_simhash" -> simhashSql,

    "q_simhash_packed" -> simhashPackedSql,

    "q_simhash_pairs" -> simhashPairsSql,

    "q_sampling" ->
      """SELECT lang, count(*) AS n_total,
        | CAST(sum(CASE WHEN ((doc_id % 1000003) * 2654435761) % 100 < 30 THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q_quantize_int8" ->
      """WITH v AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings),
        |dims AS (SELECT unnest(generate_series(1,
        |  (SELECT max(len(vv)) FROM v))) AS i),
        |e AS (
        |  SELECT vec_id, d.i - 1 AS pos, vv[d.i] AS x
        |  FROM v CROSS JOIN dims d WHERE d.i <= len(vv) AND isfinite(vv[d.i])),
        |s AS (SELECT pos, min(x) AS lo, max(x) AS hi FROM e GROUP BY pos)
        |SELECT e.vec_id, CAST(e.pos AS BIGINT) AS pos,
        |  CAST(CASE WHEN s.hi = s.lo THEN 0
        |            ELSE round((e.x - s.lo) / (s.hi - s.lo) * 254.0) END AS BIGINT) AS code
        |FROM e JOIN s USING (pos)
        |ORDER BY vec_id, pos""".stripMargin,

    "q_ngram_jaccard" -> ngramJaccardSql,

    "q_ngram_contain" -> ngramContainmentSql,

    "q_sim_topk" ->
      """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id = 0)
        |SELECT vec_id,
        | round(list_dot_product(CAST(embedding AS DOUBLE[]), q.v)
        |   / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))
        |      * sqrt(list_dot_product(q.v, q.v))),4) + 0.0 AS cos_sim
        |FROM embeddings, q WHERE vec_id <> 0
        |ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin,

    "q_neardup_cosine" ->
      """WITH n AS (
        |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
        |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
        |  FROM embeddings)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        | round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm),4) AS cos_sim
        |FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm),4) >= 0.35
        |ORDER BY id_a, id_b""".stripMargin,

    "q_tfidf" ->
      s"""WITH words AS (
         |  SELECT doc_id AS doc, unnest($sqlTokens) AS word FROM documents),
         |tf AS (SELECT doc, word, count(*) AS tf FROM words GROUP BY doc, word),
         |dfreq AS (SELECT word, count(*) AS df FROM tf GROUP BY word),
         |nn AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
         |scored AS (
         |  SELECT doc, tf.word AS word, round(tf * ln(nn.n / df), 4) AS tfidf
         |  FROM tf JOIN dfreq ON tf.word = dfreq.word, nn),
         |ranked AS (
         |  SELECT doc, word, tfidf,
         |    row_number() OVER (PARTITION BY doc ORDER BY tfidf DESC, word) AS rank
         |  FROM scored)
         |SELECT doc, word, tfidf, rank FROM ranked WHERE rank <= 3
         |ORDER BY doc, rank""".stripMargin,

    "q_bm25_topk" ->
      s"""WITH $bm25Ctes
         |SELECT query_id, rank, doc AS doc_id, score_micro
         |FROM branked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "q_bm25_stored" ->
      s"""WITH $bm25Ctes
         |SELECT query_id, doc AS doc_id, score_micro
         |FROM bagg ORDER BY query_id, doc_id""".stripMargin,

    "q_ql_topk" ->
      s"""WITH qt(query_id, term) AS (VALUES $retrievalPanelValues),
         |$qlCtes
         |SELECT query_id, rank, doc AS doc_id, score_micro
         |FROM qranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "q_rank_metrics" ->
      s"""WITH $bm25Ctes,
         |$qlCtes,
         |sysr AS (SELECT query_id, doc, rank FROM qranked WHERE rank <= 5),
         |goldr AS (SELECT query_id, doc FROM branked WHERE rank <= 5),
         |ng AS (SELECT query_id, count(*) AS n_gold FROM goldr GROUP BY query_id),
         |hits AS (SELECT s.query_id,
         |    1000000 // s.rank AS rr_micro,
         |    CAST(round(1000000 / log2(s.rank + 1)) AS BIGINT) AS dcg_term
         |  FROM sysr s JOIN goldr g ON s.query_id = g.query_id AND s.doc = g.doc),
         |ha AS (SELECT query_id, count(*) AS hits, CAST(max(rr_micro) AS BIGINT) AS rr,
         |    CAST(sum(dcg_term) AS BIGINT) AS dcg FROM hits GROUP BY query_id),
         |m AS (SELECT ng.query_id, n_gold,
         |    coalesce(hits, 0) AS n_hits, coalesce(rr, 0) AS mrr_micro,
         |    coalesce(dcg, 0) AS dcg,
         |    CAST(list_sum(list_transform(generate_series(1, least(n_gold, 5)),
         |      i -> CAST(round(1000000 / log2(i + 1)) AS BIGINT))) AS BIGINT) AS idcg
         |  FROM ng LEFT JOIN ha ON ng.query_id = ha.query_id)
         |SELECT query_id, n_gold, n_hits,
         |  (10000 * n_hits) // n_gold AS recall_bp,
         |  mrr_micro,
         |  (10000 * dcg) // idcg AS ndcg_bp
         |FROM m ORDER BY query_id""".stripMargin,

    "q_rrf_fusion" ->
      s"""WITH $bm25Ctes,
         |lex AS (SELECT doc AS doc_id, rank FROM branked WHERE query_id = 0 AND rank <= 20),
         |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |p AS (SELECT v AS qv FROM e WHERE vec_id = 0),
         |c AS (SELECT vec_id,
         |  round(list_dot_product(v, qv)
         |    / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))),4) + 0.0 AS cos_sim
         |  FROM e, p WHERE vec_id <> 0),
         |ctop AS (SELECT vec_id, cos_sim FROM c ORDER BY cos_sim DESC, vec_id LIMIT 20),
         |sem AS (SELECT vec_id AS doc_id,
         |    row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS rank FROM ctop),
         |fused AS (SELECT coalesce(lex.doc_id, sem.doc_id) AS doc_id,
         |    coalesce(1000000000 // (60 + lex.rank), 0)
         |      + coalesce(1000000000 // (60 + sem.rank), 0) AS rrf_ppb
         |  FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id)
         |SELECT CAST(0 AS BIGINT) AS query_id,
         |  row_number() OVER (ORDER BY rrf_ppb DESC, doc_id) AS rank, doc_id, rrf_ppb
         |FROM fused ORDER BY rank LIMIT 10""".stripMargin,

    "q_char_entropy" -> charEntropySql,

    // Order-0 entropy-coded size: the ln(2) divisor is the SAME Scala
    // literal the engine embeds (shared-literal convention); micro-bit
    // rounding per (doc, char) BEFORE the sum, so both engines floor the
    // identical integers.
    "q_compress_ratio" ->
      s"""WITH base AS (SELECT doc_id AS doc, coalesce(text, '') AS t
         |  FROM documents),
         |cc AS (SELECT doc, n, c, count(*) AS nc FROM (
         |    SELECT doc, length(t) AS n, unnest(string_split(t, '')) AS c
         |    FROM base)
         |  WHERE c <> '' GROUP BY 1, 2, 3),
         |bits AS (SELECT doc, sum(nc * CAST(round((ln(n) - ln(nc))
         |    / ${graft.operators.TextAnalysis.Ln2} * 1e6) AS BIGINT)) AS bm
         |  FROM cc GROUP BY doc)
         |SELECT b.doc AS doc_id,
         |  CAST(octet_length(encode(b.t)) AS BIGINT) AS n_bytes,
         |  CAST(coalesce((bm + 7999999) // 8000000, 0) AS BIGINT)
         |    AS est_bytes,
         |  CAST(CASE WHEN octet_length(encode(b.t)) > 0 THEN
         |    (10000 * coalesce((bm + 7999999) // 8000000, 0))
         |      // octet_length(encode(b.t)) END AS BIGINT) AS ratio_bp
         |FROM base b LEFT JOIN bits ON b.doc = bits.doc
         |ORDER BY doc_id""".stripMargin,

    "q_mmr_rerank" -> mmrSql(k0 = 20, k = 5, lambdaNum = 7),

    "q_media_phash" ->
      s"""WITH $mediaPhashCtes
         |SELECT doc_id, ph_hi, ph_lo FROM ph ORDER BY doc_id""".stripMargin,

    "q_media_dups" ->
      s"""WITH ${mediaPhashCtes.replace(
             "mt AS (SELECT doc_id, text AS t FROM documents),",
             """mt AS (SELECT doc_id, text AS t FROM documents
               |  UNION ALL
               |  SELECT doc_id + 1000000, ' ' || substr(text, 2)
               |  FROM documents WHERE doc_id % 25 = 0),""".stripMargin)}
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(bit_count(xor(a.ph_hi, b.ph_hi))
         |    + bit_count(xor(a.ph_lo, b.ph_lo)) AS BIGINT) AS hamming
         |FROM ph a JOIN ph b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.ph_hi, b.ph_hi))
         |    + bit_count(xor(a.ph_lo, b.ph_lo)) <= 3
         |ORDER BY id_a, id_b""".stripMargin,

    "q_uncertainty" ->
      """WITH p AS (
        |  SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS q
        |  FROM embeddings WHERE vec_id % 10 = 0 AND vec_id < 500),
        |s AS (
        |  SELECT p.probe_id, e.vec_id,
        |    round(list_dot_product(CAST(e.embedding AS DOUBLE[]), p.q)
        |      / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
        |         * sqrt(list_dot_product(p.q, p.q))), 4) + 0.0 AS cos_sim
        |  FROM embeddings e, p WHERE e.vec_id <> p.probe_id),
        |r AS (
        |  SELECT probe_id, vec_id,
        |    row_number() OVER (PARTITION BY probe_id ORDER BY cos_sim DESC, vec_id) AS rnk
        |  FROM s),
        |h AS (SELECT r.probe_id, e.label FROM r JOIN embeddings e USING (vec_id)
        |      WHERE rnk <= 5),
        |v AS (SELECT probe_id, label, count(*) AS n_votes FROM h GROUP BY 1, 2),
        |w AS (SELECT probe_id, CAST(label AS BIGINT) AS label,
        |        CAST(n_votes AS BIGINT) AS n_votes,
        |        row_number() OVER (PARTITION BY probe_id
        |          ORDER BY n_votes DESC, label) AS vr
        |      FROM v),
        |m AS (SELECT w1.probe_id, w1.label AS pred_label,
        |    w1.n_votes - coalesce(w2.n_votes, 0) AS margin
        |  FROM w w1 LEFT JOIN w w2 ON w1.probe_id = w2.probe_id AND w2.vr = 2
        |  WHERE w1.vr = 1)
        |SELECT CAST(row_number() OVER (ORDER BY margin, probe_id) AS BIGINT) AS rank,
        |  probe_id, pred_label, margin
        |FROM m ORDER BY rank LIMIT 20""".stripMargin,

    "q_embed_cov" ->
      """WITH x AS (SELECT vec_id, i,
        |    CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS xu
        |  FROM embeddings CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) g
        |  WHERE embedding IS NOT NULL),
        |marg AS (SELECT i, count(*) AS n, CAST(sum(xu) AS BIGINT) AS s FROM x GROUP BY i),
        |pair AS (SELECT a.i AS i, b.i AS j, sum(CAST(a.xu AS HUGEINT) * b.xu) AS sxy
        |  FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.i <= b.i GROUP BY a.i, b.i)
        |SELECT p.i, p.j,
        |  round(CAST(mi.n * p.sxy - CAST(mi.s AS HUGEINT) * mj.s AS DOUBLE)
        |    / CAST(mi.n AS DOUBLE) / CAST(mi.n AS DOUBLE) / 1000000000000.0, 6) + 0.0 AS cov
        |FROM pair p JOIN marg mi ON p.i = mi.i JOIN marg mj ON p.j = mj.i
        |ORDER BY p.i, p.j""".stripMargin,

    "q_snippets" -> {
      val termValues = retrievalPanel.flatMap(_._2).distinct
        .map(t => s"('$t')").mkString(", ")
      s"""WITH terms(term) AS (VALUES $termValues),
         |s AS (SELECT doc_id, text AS t, term, instr(text, term) AS pos
         |  FROM documents CROSS JOIN terms)
         |SELECT doc_id, term, pos,
         |  substr(t, greatest(pos - 30, 1),
         |    pos - greatest(pos - 30, 1) + length(term) + 30) AS snippet
         |FROM s WHERE pos > 0 ORDER BY doc_id, term""".stripMargin
    },

    "q_multimodal_frames" ->
      """SELECT doc_id,
        | unnest(generate_series(0, octet_length(encode(text)) % 4)) AS frame_idx,
        | unnest(generate_series(0, octet_length(encode(text)) % 4))
        |   * (octet_length(encode(text)) // (1 + octet_length(encode(text)) % 4)) AS frame_off
        |FROM documents ORDER BY doc_id, frame_idx""".stripMargin,

    "q_ivf_assign" -> ivfAssignSql,

    "q_ivf_cells" ->
      s"""WITH $ivfAssignCtes,
         |cells AS (SELECT cid, count(*) AS n FROM assign GROUP BY cid),
         |tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM cells)
         |SELECT cid AS centroid_id, CAST(n AS BIGINT) AS n_vectors,
         |  ((10000 * n) // tot.n_total) / 10000.0 + 0.0 AS share
         |FROM cells CROSS JOIN tot ORDER BY centroid_id""".stripMargin,

    "q_ivf_refit" -> ivfRefitSql,
    "q_ivf_batch" -> ivfBatchSql,
    "q_ivf_assign2" -> ivfAssign2Sql,
    "q_ivf_topk2" -> ivfTopK2Sql,
    "q_ann_recall" -> annRecallSql,

    "q_ivf_pairs" -> ivfPairsSql,
    "q_ivf_pairs_scaled" -> ivfPairsSqlK(scaledCellsExpr),
    "q_ivf_pairs_multi" -> ivfPairsMultiSql,
    "q_semdedup" -> semDedupSql,
    "q_semdedup_indexed" -> semDedupIndexedSql,
    "q_semdedup_indexed_scaled" -> semDedupIndexedSqlK(masterCellsExpr),
    "q_semdedup_scaled" -> semDedupSqlK(scaledCellsExpr),
    "q_semdedup_tree" -> semDedupTreeSql,
    "q_semdedup_tree_multi" -> semDedupTreeMultiSql,
    "q_semdedup_multi" -> semDedupMultiSql,
    "q_hybrid_search" ->
      s"""WITH q AS ($qualitySql),
         |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |p AS (SELECT v AS qv FROM e WHERE vec_id = 0),
         |c AS (SELECT vec_id,
         |  round(list_dot_product(v, qv)
         |    / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))),4) + 0.0 AS cos_sim
         |  FROM e, p WHERE vec_id <> 0)
         |SELECT c.vec_id AS vec_id, cos_sim, q.quality AS quality,
         |  round(cos_sim * 0.7 + q.quality * 0.3, 4) + 0.0 AS score
         |FROM c JOIN q ON c.vec_id = q.doc_id
         |ORDER BY score DESC, c.vec_id LIMIT 10""".stripMargin,

    "q_ivf_topk" -> ivfTopKSql,

    "q_sim_lsh" -> simLshSql,

    "q_sql_filter" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE lower(trim(c_mktsegment)) = 'building' ORDER BY c_custkey""".stripMargin,

    "q_sql_casewhen" ->
      """SELECT event_id,
        | CAST(CASE WHEN CAST(json_extract_string(props, '$.k') AS INT) > 50
        |   THEN 1 ELSE 0 END AS BIGINT) AS quality
        |FROM events ORDER BY event_id""".stripMargin,

    "q_sql_groupby" ->
      """SELECT event_type AS page_key, count(*) AS views
        |FROM events GROUP BY event_type ORDER BY page_key""".stripMargin,

    "q_multimodal_meta" ->
      """SELECT doc_id, octet_length(encode(text)) AS byte_len,
        | 1 + octet_length(encode(text)) % 640 AS width,
        | 1 + (octet_length(encode(text)) * 7) % 480 AS height
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Plain BETWEEN-style range join — the semantics the bucketed rewrite
    // must reproduce exactly. Bands VALUES are generated from the same
    // `rangeBands` the engine side uses.
    "q_range_join" ->
      s"""WITH bands(band, lo, hi) AS (VALUES $rangeBandsSql)
         |SELECT band, count(*) AS n,
         |  round(sum(CAST(round(value*100) AS BIGINT))/100.0, 2) AS sum_value
         |FROM events JOIN bands ON value >= lo AND value < hi
         |GROUP BY band ORDER BY band""".stripMargin,

    "q_window_funcs" ->
      """SELECT event_id, user_id,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  round(percent_rank() OVER w, 6) + 0.0 AS pct_rank,
        |  round(cume_dist() OVER w, 6) + 0.0 AS cume,
        |  first_value(event_type) OVER w AS first_type
        |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin,

    // grouping_id via GROUPING(a)*2 + GROUPING(b) — the standard bitmask
    // Spark's grouping_id(a, b) produces, spelled portably.
    "q_grouping_sets" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  CAST(GROUPING(o_orderstatus)*2 + GROUPING(o_orderpriority) AS BIGINT) AS gid,
        |  count(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
        |  (o_orderstatus, o_orderpriority))
        |ORDER BY gid, status, priority""".stripMargin,

    "q_markov_chain" ->
      """WITH p AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        |  FROM events),
        |c AS (SELECT from_type, to_type, count(*) AS n FROM p
        |      WHERE to_type IS NOT NULL GROUP BY from_type, to_type),
        |f AS (SELECT from_type, sum(n) AS nf FROM c GROUP BY from_type)
        |SELECT c.from_type, c.to_type, c.n,
        |  ((10000 * c.n) // f.nf) / 10000.0 + 0.0 AS prob
        |FROM c JOIN f USING (from_type)
        |ORDER BY from_type, to_type""".stripMargin,

    "q_top_paths" ->
      """WITH p AS (
        |  SELECT concat_ws(' > ', event_type,
        |      lead(event_type, 1) OVER w, lead(event_type, 2) OVER w) AS path,
        |    lead(event_type, 2) OVER w IS NOT NULL AS complete
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT path, count(*) AS n FROM p WHERE complete
        |GROUP BY path ORDER BY n DESC, path LIMIT 15""".stripMargin,

    "q_oov_rate" ->
      s"""WITH words AS (SELECT doc_id AS doc, unnest($sqlTokens) AS word FROM documents),
         |vocab AS (SELECT word FROM (
         |  SELECT word, count(*) AS n FROM words GROUP BY word
         |  ORDER BY n DESC, word LIMIT 20)),
         |agg AS (SELECT doc, count(*) AS n_tokens,
         |    sum(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS n_oov
         |  FROM words w LEFT JOIN vocab v ON w.word = v.word GROUP BY doc)
         |SELECT doc, n_tokens, CAST(n_oov AS BIGINT) AS n_oov,
         |  ((10000 * n_oov) // n_tokens) / 10000.0 + 0.0 AS oov_rate
         |FROM agg ORDER BY doc""".stripMargin,

    "q_zipf_panel" ->
      s"""WITH w AS (SELECT unnest($sqlTokens) AS word FROM documents),
         |f AS (SELECT word, count(*) AS n FROM w GROUP BY word),
         |r AS (SELECT n, row_number() OVER (ORDER BY n DESC, word) AS rank FROM f),
         |k AS (SELECT rank, n FROM r WHERE rank IN (1, 2, 4, 8, 16)),
         |pairs(rank_lo, rank_hi) AS (VALUES (1, 2), (2, 4), (4, 8), (8, 16))
         |SELECT CAST(rank_lo AS BIGINT) AS rank_lo, CAST(rank_hi AS BIGINT) AS rank_hi,
         |  lo.n AS freq_lo, hi.n AS freq_hi,
         |  round(ln(CAST(lo.n AS DOUBLE) / hi.n)
         |    / ln(CAST(rank_hi AS DOUBLE) / rank_lo), 4) + 0.0 AS slope
         |FROM pairs JOIN k lo ON lo.rank = rank_lo JOIN k hi ON hi.rank = rank_hi
         |ORDER BY rank_lo""".stripMargin,

    // Label centroids pass through FLOAT exactly as labelCentroids narrows
    // them (the ivfRefined2Ctes convention), so both engines compute the
    // cosine panel on bit-identical centroid vectors.
    "q_silhouette" ->
      """WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings),
        |dims AS (SELECT unnest(generate_series(1, (SELECT max(len(vv)) FROM v))) AS i),
        |cent AS (SELECT label AS clabel, d.i - 1 AS pos,
        |    CAST(round(avg(vv[d.i]), 4) + 0.0 AS FLOAT) AS m
        |  FROM v CROSS JOIN dims d WHERE d.i <= len(vv) GROUP BY clabel, pos),
        |cv AS (SELECT clabel, CAST(list(m ORDER BY pos) AS DOUBLE[]) AS cvec
        |  FROM cent GROUP BY clabel),
        |sims AS (SELECT v.vec_id, v.label, c.clabel,
        |    round(list_dot_product(v.vv, c.cvec)
        |      / (sqrt(list_dot_product(v.vv, v.vv)) * sqrt(list_dot_product(c.cvec, c.cvec))), 4)
        |      + 0.0 AS cs
        |  FROM v CROSS JOIN cv c),
        |ab AS (SELECT vec_id, label,
        |    max(CASE WHEN clabel = label THEN cs END) AS own_cs,
        |    max(CASE WHEN clabel <> label THEN cs END) AS other_cs
        |  FROM sims GROUP BY vec_id, label),
        |s AS (SELECT label,
        |    CASE WHEN greatest(1 - own_cs, 1 - other_cs) = 0 THEN 0.0
        |         ELSE round(((1 - other_cs) - (1 - own_cs))
        |                / greatest(1 - own_cs, 1 - other_cs), 4) END AS sil
        |  FROM ab)
        |SELECT CAST(label AS BIGINT) AS label, count(*) AS n_vecs,
        |  round(sum(CAST(round(sil * 10000) AS BIGINT)) / (10000.0 * count(*)), 4) + 0.0 AS mean_sil
        |FROM s GROUP BY label ORDER BY label""".stripMargin,

    "q_pagerank" -> pageRankSql,

    "q_sem_decontam" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings),
        |b AS (SELECT vv AS bv FROM v WHERE vec_id % 20 = 0),
        |tr AS (SELECT vec_id, vv FROM v WHERE vec_id % 20 <> 0),
        |hit AS (SELECT DISTINCT t.vec_id FROM tr t CROSS JOIN b
        |  WHERE round(list_dot_product(t.vv, b.bv)
        |    / (sqrt(list_dot_product(t.vv, t.vv)) * sqrt(list_dot_product(b.bv, b.bv))), 4) >= 0.35)
        |SELECT t.vec_id FROM tr t LEFT JOIN hit h ON t.vec_id = h.vec_id
        |WHERE h.vec_id IS NULL ORDER BY t.vec_id""".stripMargin,

    "q_sem_decontam_fixed" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings),
        |b AS (SELECT vv AS bv FROM v WHERE vec_id < 100),
        |tr AS (SELECT vec_id, vv FROM v WHERE vec_id >= 100),
        |hit AS (SELECT DISTINCT t.vec_id FROM tr t CROSS JOIN b
        |  WHERE round(list_dot_product(t.vv, b.bv)
        |    / (sqrt(list_dot_product(t.vv, t.vv)) * sqrt(list_dot_product(b.bv, b.bv))), 4) >= 0.35)
        |SELECT t.vec_id FROM tr t LEFT JOIN hit h ON t.vec_id = h.vec_id
        |WHERE h.vec_id IS NULL ORDER BY t.vec_id""".stripMargin,

    "q_dim_variance" ->
      """WITH v AS (SELECT CAST(embedding AS DOUBLE[]) AS vv FROM embeddings),
        |dims AS (SELECT unnest(generate_series(1, (SELECT max(len(vv)) FROM v))) AS i),
        |ex AS (SELECT d.i - 1 AS pos, CAST(round(vv[d.i] * 10000) AS BIGINT) AS q
        |  FROM v CROSS JOIN dims d WHERE d.i <= len(vv) AND isfinite(vv[d.i])),
        |m AS (SELECT pos, count(*) AS n, CAST(sum(q) AS BIGINT) AS s1,
        |    sum(q * q) AS s2
        |  FROM ex GROUP BY pos)
        |SELECT pos, n,
        |  round(s1 / (10000.0 * n), 4) + 0.0 AS mean_val,
        |  round(CAST(n * s2 - CAST(s1 AS HUGEINT) * s1 AS DOUBLE)
        |    / (CAST(n AS DOUBLE) * n) / 1e8, 6) + 0.0 AS var_val
        |FROM m ORDER BY pos""".stripMargin,

    // Same degree-ordered orientation as Graphs.triangleStats: row-value
    // (deg, node) comparisons are the tuple twin of Spark's struct
    // ordering; `//` on BIGINT matches `div` (both truncate — all values
    // here are non-negative anyway).
    "q_triangles" ->
      s"""WITH $nationTradeEdgesCtes,
        |deg AS (SELECT node, count(*) AS deg FROM (
        |    SELECT u AS node FROM kept UNION ALL SELECT v FROM kept)
        |  GROUP BY node),
        |o AS (SELECT
        |    CASE WHEN (du.deg, k.u) < (dv.deg, k.v) THEN k.u ELSE k.v END AS a,
        |    CASE WHEN (du.deg, k.u) < (dv.deg, k.v) THEN k.v ELSE k.u END AS b,
        |    CASE WHEN (du.deg, k.u) < (dv.deg, k.v) THEN dv.deg ELSE du.deg END AS bd
        |  FROM kept k
        |  JOIN deg du ON du.node = k.u JOIN deg dv ON dv.node = k.v),
        |wg AS (SELECT e1.a, e1.b AS wb, e2.b AS wc FROM o e1 JOIN o e2
        |  ON e1.a = e2.a AND (e1.bd, e1.b) < (e2.bd, e2.b)),
        |tri AS (SELECT wg.a, wg.wb, wg.wc FROM wg
        |  JOIN o ON o.a = wg.wb AND o.b = wg.wc),
        |pn AS (SELECT node, count(*) AS n_tri FROM (
        |    SELECT a AS node FROM tri UNION ALL SELECT wb FROM tri
        |    UNION ALL SELECT wc FROM tri)
        |  GROUP BY node)
        |SELECT d.node, d.deg AS degree, COALESCE(p.n_tri, 0) AS n_tri,
        |  CASE WHEN d.deg >= 2
        |    THEN (10000 * 2 * COALESCE(p.n_tri, 0)) // (d.deg * (d.deg - 1))
        |    ELSE 0 END / 10000.0 + 0.0 AS clustering
        |FROM deg d LEFT JOIN pn p ON p.node = d.node
        |ORDER BY d.node""".stripMargin,

    "q_ewma" -> ewmaSql,

    // The decimal-sum normal equations in HUGEINT; `//` ≡ Spark `div`
    // (both truncate toward zero — verified for negative numerators).
    "q_regression" ->
      """WITH e AS (SELECT event_type,
        |    epoch_us(ts) // 3600000000 AS x,
        |    CAST(round(value * 100, 0) AS BIGINT) AS y FROM events),
        |a AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
        |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
        |    CAST(sum(x * x) AS HUGEINT) AS sxx,
        |    CAST(sum(x * y) AS HUGEINT) AS sxy
        |  FROM e GROUP BY event_type),
        |b AS (SELECT event_type, n, sx, sy,
        |    CASE WHEN n >= 2 AND n * sxx - sx * sx <> 0
        |      THEN (1000000 * (n * sxy - sx * sy)) // (n * sxx - sx * sx)
        |    END AS sm
        |  FROM a)
        |SELECT event_type, CAST(n AS BIGINT) AS n,
        |  CAST(sm AS BIGINT) / 1e6 AS slope,
        |  CAST(CASE WHEN sm IS NOT NULL
        |    THEN (1000000 * sy - sm * sx) // n END AS BIGINT) / 1e6 AS intercept
        |FROM b ORDER BY event_type""".stripMargin,

  )
}
