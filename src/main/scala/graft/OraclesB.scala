package graft

import graft.functions.TextFunctions
import graft.operators._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DuckDB oracle twins, second half (split out of SparkEntry; composed back in `SparkEntry.oracleSql`). */
private[graft] object OraclesB extends QueryShared {
  private[graft] val m: Map[String, String] = Map(
    "q_corpus_diff" ->
      """WITH oldm AS (SELECT doc_id, md5(concat_ws(chr(1), text)) AS fp
        |  FROM documents WHERE doc_id % 7 <> 3),
        |newm AS (SELECT doc_id, md5(concat_ws(chr(1),
        |    CASE WHEN doc_id % 5 = 0 THEN text || ' [rev2]' ELSE text END)) AS fp
        |  FROM documents WHERE doc_id % 11 <> 5),
        |diff AS (SELECT COALESCE(o.doc_id, nn.doc_id) AS doc_id,
        |    CASE WHEN o.doc_id IS NULL THEN 'added'
        |         WHEN nn.doc_id IS NULL THEN 'removed'
        |         WHEN o.fp <> nn.fp THEN 'changed'
        |         ELSE 'unchanged' END AS status
        |  FROM oldm o FULL OUTER JOIN newm nn ON o.doc_id = nn.doc_id)
        |SELECT d.source, f.status, count(*) AS n
        |FROM diff f JOIN documents d ON d.doc_id = f.doc_id
        |GROUP BY d.source, f.status
        |ORDER BY d.source, f.status""".stripMargin,

    // Numeric sort before the string join — the engine's
    // array_sort(collect_set(bigint)) twin; list_distinct dedups within a
    // doc exactly as wordShinglesDistinct's in-kernel set does.
    "q_posting_lists" -> {
      val sh = sqlShingles(sqlTokens, 2)
      s"""WITH r AS (SELECT DISTINCT doc_id AS doc, unnest($sh) AS term
         |  FROM documents),
         |f AS (SELECT term, count(*) AS df,
         |    string_agg(CAST(doc AS VARCHAR), ',' ORDER BY doc) AS postings
         |  FROM r WHERE term <> '' GROUP BY term)
         |SELECT term, df, postings FROM f
         |WHERE df BETWEEN 5 AND 200 ORDER BY term""".stripMargin
    },

    "q_novelty" -> {
      val sh = sqlShingles(sqlTokens, 3)
      s"""WITH r AS (SELECT DISTINCT doc_id AS doc, unnest($sh) AS shingle
         |  FROM documents),
         |fs AS (SELECT shingle, min(doc) AS first_doc FROM r GROUP BY shingle),
         |a AS (SELECT r.doc, count(*) AS n_shingles,
         |    sum(CASE WHEN r.doc = fs.first_doc THEN 1 ELSE 0 END) AS n_novel
         |  FROM r JOIN fs ON r.shingle = fs.shingle GROUP BY r.doc)
         |SELECT doc, n_shingles, CAST(n_novel AS BIGINT) AS n_novel,
         |  ((10000 * n_novel) // n_shingles) / 10000.0 + 0.0 AS novelty_rate
         |FROM a ORDER BY doc""".stripMargin
    },

    // One UNION ALL arm per profiled column — DuckDB has no single-pass
    // multi-column unpivot-with-aggs; the ENGINE side is the one-pass
    // plan, the oracle only needs to agree on values.
    "q_table_profile" -> {
      def arm(name: String, ex: String): String =
        s"""SELECT '$name' AS "column", count(*) AS n_rows,
           |  CAST(sum(CASE WHEN $ex IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           |  count(DISTINCT $ex) AS n_distinct,
           |  CAST(min($ex) AS VARCHAR) AS min_val,
           |  CAST(max($ex) AS VARCHAR) AS max_val
           |FROM events""".stripMargin
      Seq(
        arm("event_id", "event_id"),
        arm("event_type", "event_type"),
        arm("user_id", "user_id"),
        arm("big_cents",
          "CASE WHEN value > 400 THEN CAST(round(value * 100, 0) AS BIGINT) END"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY \"column\"")
    },

    // Window row_number is the oracle's ranking twin of the engine's
    // bounded TopKHits agg: (cs DESC, dst ASC) == (score DESC, id ASC).
    "q_knn_graph" -> knnGraphSql("8"),

    // Same graph under the PRODUCTION cell count k = ⌊√n⌋
    // (Similarity.defaultCells) — the scale-correct default the fixed-k=8
    // variant above deliberately does not use.
    "q_knn_graph_scaled" -> knnGraphSql(scaledCellsExpr),

    "q_knn_graph_multi" -> knnGraphMultiSql(scaledCellsExpr, 2),

    "q_knn_graph_tree" -> knnGraphTreeSql,

    "q_knn_graph_tree_multi" -> knnGraphTreeMultiSql,

    "q_hits" -> hitsSql,

    "q_kcore" -> kCoreSql,

    "q_label_prop" -> labelPropSql,

    // Region labels over the kept trade edges, then the exact-integer
    // Newman panel: contribution = (10000·(4m·w_in − deg_sum²)) div (4m²).
    "q_modularity" ->
      s"""WITH $tradeKeptwCtes,
         |lab AS (SELECT CAST(n_nationkey AS VARCHAR) AS node,
         |    CAST(n_regionkey AS VARCHAR) AS community FROM nation),
         |le AS (SELECT k.u, k.v, k.w, lu.community AS cu, lv.community AS cv
         |  FROM keptw k JOIN lab lu ON k.u = lu.node
         |  JOIN lab lv ON k.v = lv.node),
         |mt AS (SELECT CAST(sum(w) AS HUGEINT) AS m FROM le),
         |wi AS (SELECT cu AS community, CAST(sum(w) AS HUGEINT) AS w_in
         |  FROM le WHERE cu = cv GROUP BY cu),
         |dg AS (SELECT community, CAST(sum(w) AS HUGEINT) AS deg_sum FROM (
         |  SELECT cu AS community, w FROM le
         |  UNION ALL SELECT cv AS community, w FROM le) GROUP BY community),
         |mm AS (SELECT community, count(*) AS n_members
         |  FROM lab GROUP BY community)
         |SELECT mm.community, CAST(mm.n_members AS BIGINT) AS n_members,
         |  CAST(coalesce(wi.w_in, 0) AS BIGINT) AS w_in,
         |  CAST(coalesce(dg.deg_sum, 0) AS BIGINT) AS deg_sum,
         |  CAST((10000 * (4 * mt.m * coalesce(wi.w_in, 0)
         |    - coalesce(dg.deg_sum, 0) * coalesce(dg.deg_sum, 0)))
         |    // (4 * mt.m * mt.m) AS BIGINT) AS contrib_bp
         |FROM mm LEFT JOIN dg USING (community)
         |LEFT JOIN wi USING (community), mt
         |ORDER BY community""".stripMargin,

    "q_covisit" ->
      """WITH bi AS (
        |  SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem),
        |sized AS (SELECT bk FROM (
        |  SELECT bk, count(*) AS sz FROM bi GROUP BY bk) WHERE sz <= 10),
        |kept AS (SELECT bi.bk, bi.it FROM bi JOIN sized USING (bk)),
        |nb AS (SELECT count(DISTINCT bk) AS n FROM kept),
        |sup AS (SELECT it, count(*) AS s FROM kept GROUP BY it),
        |p AS (
        |  SELECT a.it AS item_a, b.it AS item_b, count(*) AS n_both
        |  FROM kept a JOIN kept b USING (bk) WHERE a.it < b.it
        |  GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT item_a, item_b, CAST(n_both AS BIGINT) AS n_both,
        |  CAST((10000 * n_both * nb.n) // (sa.s * sb.s) AS BIGINT) AS lift_bp
        |FROM p
        |JOIN sup sa ON p.item_a = sa.it
        |JOIN sup sb ON p.item_b = sb.it
        |CROSS JOIN nb
        |ORDER BY item_a, item_b""".stripMargin,

    "q_bfs_hops" -> bfsHopsSql,

    // Brute-force triple enumeration per basket (≤ C(10,3)=120 rows per
    // kept basket) + HAVING — a DIFFERENT algorithm from the engine's
    // candidate-pruned apriori; equal output by the apriori property.
    "q_itemsets3" ->
      """WITH bi AS (
        |  SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem),
        |sized AS (SELECT bk FROM (
        |  SELECT bk, count(*) AS sz FROM bi GROUP BY bk) WHERE sz <= 10),
        |kept AS MATERIALIZED (SELECT bi.bk, bi.it FROM bi JOIN sized USING (bk))
        |SELECT a.it AS item_a, b.it AS item_b, c.it AS item_c,
        |  count(*) AS n_all
        |FROM kept a JOIN kept b USING (bk) JOIN kept c USING (bk)
        |WHERE a.it < b.it AND b.it < c.it
        |GROUP BY 1, 2, 3 HAVING count(*) >= 2
        |ORDER BY item_a, item_b, item_c""".stripMargin,

    "q_pq_codes" ->
      s"""WITH $pqCodesCtes
         |SELECT vec_id, CAST(sub AS BIGINT) AS sub, CAST(code AS BIGINT) AS code,
         |  d2 + 0.0 AS dist2
         |FROM codes ORDER BY vec_id, sub""".stripMargin,

    // LUT entries quantized to integer ten-thousandths BEFORE the
    // per-vector sum — bigint addition is order-invariant, matching the
    // engine's partial-agg-safe convention.
    "q_pq_adc" ->
      s"""WITH $pqCodesCtes,
         |q AS (SELECT s.sub, vv[s.sub*16+1 : s.sub*16+16] AS qs
         |      FROM v, subs s WHERE vec_id = 0),
         |lut AS (SELECT cb.sub, cb.code,
         |    CAST(round((list_dot_product(cs,cs) - 2*list_dot_product(cs,qs)
         |      + list_dot_product(qs,qs)) * 10000, 0) AS BIGINT) AS d2_q4
         |  FROM cb JOIN q ON cb.sub = q.sub),
         |adc AS (SELECT c.vec_id, sum(l.d2_q4) AS adc_q4
         |  FROM codes c JOIN lut l ON c.sub = l.sub AND c.code = l.code
         |  WHERE c.vec_id <> 0 GROUP BY c.vec_id)
         |SELECT vec_id, CAST(adc_q4 AS BIGINT) / 10000.0 AS adc_dist2
         |FROM adc ORDER BY adc_q4, vec_id LIMIT 10""".stripMargin,

    // IVF-PQ: the shared PQ code CTEs + an 8-cell assignment over the
    // same `v`, cells ranked for the query and the ADC sum restricted to
    // the probed cells' members — the oracle of the pruned-directory scan.
    "q_ivfpq_topk" ->
      s"""WITH $pqCodesCtes,
         |c8 AS (SELECT vec_id AS cid, vv AS cv FROM v WHERE vec_id < 8),
         |scored8 AS (SELECT v.vec_id, cid,
         |    round(list_dot_product(vv, cv)
         |      / (sqrt(list_dot_product(vv, vv))
         |         * sqrt(list_dot_product(cv, cv))), 4) AS csim
         |  FROM v, c8),
         |assign8 AS (SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid,
         |      row_number() OVER (PARTITION BY vec_id
         |                         ORDER BY csim DESC, cid) AS rn
         |    FROM scored8) WHERE rn = 1),
         |qv AS (SELECT vv AS qvv FROM v WHERE vec_id = 0),
         |pc AS (SELECT cid FROM (
         |    SELECT c8.cid,
         |      round(list_dot_product(c8.cv, qvv)
         |        / (sqrt(list_dot_product(c8.cv, c8.cv))
         |           * sqrt(list_dot_product(qvv, qvv))), 4) AS csim
         |    FROM c8, qv) WHERE NOT isnan(csim)
         |  ORDER BY csim DESC, cid LIMIT 2),
         |q AS (SELECT s.sub, qvv[s.sub*16+1 : s.sub*16+16] AS qs
         |  FROM qv, subs s),
         |lut AS (SELECT cb.sub, cb.code,
         |    CAST(round((list_dot_product(cs,cs) - 2*list_dot_product(cs,qs)
         |      + list_dot_product(qs,qs)) * 10000, 0) AS BIGINT) AS d2_q4
         |  FROM cb JOIN q ON cb.sub = q.sub),
         |adc AS (SELECT c.vec_id, sum(l.d2_q4) AS adc_q4
         |  FROM codes c
         |  JOIN lut l ON c.sub = l.sub AND c.code = l.code
         |  JOIN assign8 a ON a.vec_id = c.vec_id
         |  JOIN pc ON a.cid = pc.cid
         |  WHERE c.vec_id <> 0 GROUP BY c.vec_id)
         |SELECT vec_id, CAST(adc_q4 AS BIGINT) / 10000.0 AS adc_dist2
         |FROM adc ORDER BY adc_q4, vec_id LIMIT 10""".stripMargin,

    // Stage 1 = the ADC CTE chain cut at the shortlist, stage 2 = exact
    // r4 cosines over ONLY those ids, final (cos DESC, id) cut.
    "q_pq_rerank" ->
      s"""WITH $pqCodesCtes,
         |q AS (SELECT s.sub, vv[s.sub*16+1 : s.sub*16+16] AS qs
         |      FROM v, subs s WHERE vec_id = 0),
         |lut AS (SELECT cb.sub, cb.code,
         |    CAST(round((list_dot_product(cs,cs) - 2*list_dot_product(cs,qs)
         |      + list_dot_product(qs,qs)) * 10000, 0) AS BIGINT) AS d2_q4
         |  FROM cb JOIN q ON cb.sub = q.sub),
         |shortl AS (SELECT c.vec_id FROM codes c
         |  JOIN lut l ON c.sub = l.sub AND c.code = l.code
         |  WHERE c.vec_id <> 0 GROUP BY c.vec_id
         |  ORDER BY sum(l.d2_q4), c.vec_id LIMIT 40),
         |qv AS (SELECT vv AS qvv FROM v WHERE vec_id = 0),
         |rer AS (SELECT s.vec_id,
         |    round(list_dot_product(v.vv, qvv)
         |      / (sqrt(list_dot_product(v.vv, v.vv))
         |         * sqrt(list_dot_product(qvv, qvv))), 4) + 0.0 AS cos_sim
         |  FROM shortl s JOIN v ON v.vec_id = s.vec_id, qv)
         |SELECT vec_id, cos_sim FROM rer
         |ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin,

    // z² = (n·x − s1)²/(n·s2 − s1²): the k-sigma test is the exact integer
    // cross-multiplication; z2_floor NULL on zero-variance frames/warm-up.
    "q_anomaly_z" ->
      """WITH e AS (SELECT event_id, user_id, ts,
        |    CAST(round(value*100, 0) AS BIGINT) AS c FROM events),
        |w AS (SELECT event_id, user_id, c,
        |    count(c) OVER win AS n,
        |    COALESCE(sum(CAST(c AS HUGEINT)) OVER win, 0) AS s1,
        |    COALESCE(sum(CAST(c AS HUGEINT)*c) OVER win, 0) AS s2
        |  FROM e WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 8 PRECEDING AND 1 PRECEDING))
        |SELECT event_id, user_id, CAST(n AS BIGINT) AS n_prior,
        |  CASE WHEN n >= 4
        |    THEN (n*c - s1)*(n*c - s1) > 9*(n*s2 - s1*s1)
        |    ELSE false END AS is_anomaly,
        |  CASE WHEN n >= 4 AND (n*s2 - s1*s1) > 0
        |    THEN CAST(((n*c - s1)*(n*c - s1)) // (n*s2 - s1*s1) AS BIGINT)
        |    END AS z2_floor
        |FROM w ORDER BY event_id""".stripMargin,

    // S_i = P_i − min(0, P_1..P_i): the max(0, ·) recursion in closed
    // prefix form — same two running aggregates as the engine.
    "q_cusum" ->
      """WITH e AS (SELECT event_id, user_id, ts,
        |    CAST(round(value*100, 0) AS BIGINT) AS c FROM events),
        |m AS (SELECT user_id,
        |    (1000000 * CAST(sum(c) AS HUGEINT)) // count(*) AS mu
        |  FROM e GROUP BY user_id),
        |p AS (SELECT e.event_id, e.user_id, e.ts,
        |    sum(CAST(1000000 AS HUGEINT)*c - mu
        |      - CAST(1000000 AS HUGEINT)*1000) OVER win AS pp
        |  FROM e JOIN m USING (user_id)
        |  WINDOW win AS (PARTITION BY e.user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING)),
        |s AS (SELECT event_id, user_id,
        |    pp - least(min(pp) OVER win2, 0) AS ss
        |  FROM p WINDOW win2 AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING))
        |SELECT event_id, user_id,
        |  CAST(ss AS BIGINT) / 1000000.0 AS cusum,
        |  ss > CAST(50000 AS HUGEINT)*1000000 AS alarm
        |FROM s ORDER BY event_id""".stripMargin,

    // Arms generated from the same gate list the engine folds; first-
    // failure attribution in declared order.
    "q_gate_attrition" -> gateAttritionSql(
      Seq("r_words", "r_mean_len", "r_alpha", "r_stop")),

    "q_id_gaps" ->
      """WITH ids AS (SELECT DISTINCT doc_id AS id FROM documents
        |  WHERE doc_id % 97 <> 13),
        |l AS (SELECT id, lead(id) OVER (ORDER BY id) AS nxt FROM ids)
        |SELECT id + 1 AS gap_start, nxt - 1 AS gap_end,
        |  nxt - id - 1 AS gap_len
        |FROM l WHERE nxt > id + 1 ORDER BY gap_start""".stripMargin,

    "q_benford" -> benfordSql,

    "q_decade_hist" ->
      """WITH v AS (SELECT event_type,
        |    CAST(round(value*100, 0) AS BIGINT) AS v FROM events
        |  WHERE value IS NOT NULL AND CAST(round(value*100, 0) AS BIGINT) > 0)
        |SELECT event_type,
        |  CAST(length(CAST(v AS VARCHAR)) - 1 AS BIGINT) AS decade,
        |  count(*) AS n, CAST(min(v) AS BIGINT) AS min_val,
        |  CAST(max(v) AS BIGINT) AS max_val
        |FROM v GROUP BY event_type, decade
        |ORDER BY event_type, decade""".stripMargin,

    "q_weighted_median" ->
      """WITH e AS (SELECT event_type,
        |    CAST(round(value*100, 0) AS BIGINT) AS v,
        |    user_id % 5 + 1 AS w FROM events),
        |c AS (SELECT event_type, v,
        |    sum(w) OVER (PARTITION BY event_type ORDER BY v
        |                 ROWS UNBOUNDED PRECEDING) AS cum,
        |    sum(w) OVER (PARTITION BY event_type) AS tot
        |  FROM e WHERE w > 0)
        |SELECT event_type, CAST(min(v) AS BIGINT) AS weighted_median,
        |  CAST(max(tot) AS BIGINT) AS total_weight
        |FROM c WHERE cum * 2 >= tot
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_kanon" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, c_mktsegment,
        |  count(*) AS n, count(*) < 8 AS violates
        |FROM customer GROUP BY c_nationkey, c_mktsegment
        |ORDER BY c_nationkey, c_mktsegment""".stripMargin,

    // Seeded Laplace: the same (salt || key) md5-lane uniform, inverse
    // CDF, and integer-grain round as the engine — b literals computed
    // from the SAME εµ arithmetic (shared-literal convention)
    "q_dp_counts" -> dpSql(
      cte = "SELECT event_type AS g, count(*) AS stat FROM events GROUP BY 1",
      groupAlias = "event_type", statAlias = "n_noisy",
      nonce = "graft-r10-evcounts",
      epsilonMicro = 500000L, sensitivity = 1L, extra = ""),

    "q_dp_sum" -> dpSql(
      cte = """SELECT o_orderstatus AS g,
        |    CAST(sum(least(greatest(CAST(round(o_totalprice*100) AS BIGINT),
        |      0), 10000000)) AS BIGINT) AS stat
        |  FROM orders GROUP BY 1""".stripMargin,
      groupAlias = "o_orderstatus", statAlias = "sum_noisy",
      nonce = "graft-r10-ordsum", epsilonMicro = 1000000L,
      sensitivity = 10000000L,
      extra = ", CAST(10000000 AS BIGINT) AS clamp_cents"),

    // Fixed support: the nation domain LEFT JOINs the per-nation counts,
    // absent nations contribute stat = 0 and still draw noise
    "q_dp_domain" -> dpSql(
      cte = """SELECT n.n_name AS g, CAST(count(c.c_custkey) AS BIGINT) AS stat
        |  FROM nation n LEFT JOIN (
        |    SELECT cu.c_custkey, cu.c_nationkey FROM customer cu
        |      JOIN nation n2 ON cu.c_nationkey = n2.n_nationkey
        |      WHERE n2.n_regionkey = 1
        |  ) c ON c.c_nationkey = n.n_nationkey
        |  GROUP BY 1""".stripMargin,
      groupAlias = "n_name", statAlias = "n_noisy",
      nonce = "graft-r10-natdomain",
      epsilonMicro = 500000L, sensitivity = 1L, extra = ""),

    // user-grain clamp first, then the group sum — sensitivity = cap
    "q_dp_user" -> dpSql(
      cte = """SELECT g, CAST(sum(c) AS BIGINT) AS stat FROM (
        |    SELECT event_type AS g, user_id,
        |      least(count(*), 20) AS c
        |    FROM events GROUP BY 1, 2
        |  ) GROUP BY 1""".stripMargin,
      groupAlias = "event_type", statAlias = "n_noisy",
      nonce = "graft-r10-usercounts",
      epsilonMicro = 500000L, sensitivity = 20L,
      extra = ", CAST(20 AS BIGINT) AS cap_per_user"),

    "q_dp_vocab" -> dpSql(
      cte = s"""SELECT word AS g, count(*) AS stat FROM (
        |    SELECT unnest($sqlTokens) AS word FROM documents
        |  ) WHERE word <> '' GROUP BY 1""".stripMargin,
      groupAlias = "word", statAlias = "n_noisy",
      nonce = "graft-r10-vocab",
      epsilonMicro = 500000L, sensitivity = 1L, extra = "",
      tau = Some(25L)),

    // Row-side k-RR perturbation replayed from the same two md5 lanes,
    // then the same debias arithmetic (p = 0.75, q = 0.0625 — both exact
    // binary doubles, so the only rounding is the shipped 3dp)
    "q_ldp_freq" ->
      s"""WITH dom AS (
         |  SELECT cat, CAST(row_number() OVER (ORDER BY cat) AS BIGINT) - 1 AS idx
         |  FROM (SELECT unnest(['click','error','purchase','signup','view']) AS cat)),
         |r AS (
         |  SELECT CAST(e.event_id AS VARCHAR) AS rid, d.idx
         |  FROM events e JOIN dom d ON e.event_type = d.cat),
         |h AS (
         |  SELECT idx,
         |    ${Sketches.kmvHash32Sql("'graft-r10-ldp|k|' || rid")} AS hk,
         |    ${Sketches.kmvHash32Sql("'graft-r10-ldp|p|' || rid")} AS hp
         |  FROM r),
         |rep AS (
         |  SELECT CASE WHEN hk * 1000000 < 750000 * 4294967296 THEN idx
         |              WHEN (hp % 4) >= idx THEN (hp % 4) + 1
         |              ELSE (hp % 4) END AS ridx
         |  FROM h),
         |obs AS (SELECT ridx AS idx, count(*) AS n_reported FROM rep GROUP BY 1),
         |nn AS (SELECT count(*) AS n FROM rep)
         |SELECT d.cat AS event_type,
         |  coalesce(o.n_reported, 0) AS n_reported,
         |  round((coalesce(o.n_reported, 0) - nn.n * ((1 - 0.75) / 4.0)) /
         |        (0.75 - (1 - 0.75) / 4.0), 3) AS n_est,
         |  CAST(round(ln(0.75 * 4.0 / 0.25) * 1e6, 0) AS BIGINT) AS epsilon_micro
         |FROM dom d LEFT JOIN obs o USING (idx) CROSS JOIN nn
         |ORDER BY event_type""".stripMargin,

    // Per-pair arms recompute independently (no stack twin needed —
    // UNION ALL of four self-contained profiles is the simpler oracle)
    "q_func_deps" -> {
      val arms = Seq(
        ("o_orderkey", "o_custkey"),
        ("o_custkey", "o_orderstatus"),
        ("o_orderstatus", "o_orderpriority"),
        ("o_orderdate", "o_orderpriority")).map { case (l, r) =>
        s"""SELECT '$l->$r' AS fd, n_rows, n_groups, n_violating,
           |  (10000 * (n_rows - keep)) // n_rows AS g3_bp,
           |  n_violating = 0 AS holds
           |FROM (
           |  SELECT CAST(sum(n) AS BIGINT) AS n_rows,
           |    CAST(count(*) AS BIGINT) AS n_groups,
           |    CAST(sum(CASE WHEN nrhs > 1 THEN 1 ELSE 0 END) AS BIGINT)
           |      AS n_violating,
           |    CAST(sum(mx) AS BIGINT) AS keep
           |  FROM (
           |    SELECT lhs, sum(c) AS n, max(c) AS mx, count(*) AS nrhs
           |    FROM (
           |      SELECT CAST($l AS VARCHAR) AS lhs, CAST($r AS VARCHAR) AS rhs,
           |        count(*) AS c
           |      FROM orders GROUP BY 1, 2)
           |    GROUP BY lhs))""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"SELECT * FROM (\n$arms\n) ORDER BY fd"
    },

    // Identical exact-integer rank arithmetic, one double z at the end
    "q_mannwhitney" ->
      """WITH b AS (
        |  SELECT CAST(round(value*100) AS BIGINT) AS v,
        |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS a
        |  FROM events WHERE event_type IN ('click', 'view')),
        |bv AS (SELECT v, count(*) AS t, CAST(sum(a) AS BIGINT) AS ta
        |  FROM b GROUP BY v),
        |rk AS (SELECT v, t, ta,
        |    coalesce(sum(t) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
        |  FROM bv),
        |agg AS (SELECT
        |    CAST(sum(ta) AS BIGINT) AS na,
        |    CAST(sum(t - ta) AS BIGINT) AS nb,
        |    CAST(sum(ta * (2*cum + t + 1)) AS BIGINT) AS ra2,
        |    CAST(sum(t*t*t - t) AS BIGINT) AS ties
        |  FROM rk)
        |SELECT na AS n_a, nb AS n_b,
        |  (ra2 - na*(na+1)) / 2.0 AS u_a,
        |  round(((ra2 - na*(na+1)) / 2.0 - CAST(na AS DOUBLE) * nb / 2.0) /
        |    sqrt(CAST(na AS DOUBLE) * nb / 12.0 *
        |      ((na + nb + 1) - CAST(ties AS DOUBLE) /
        |        (CAST(na + nb AS DOUBLE) * (na + nb - 1)))), 4) AS z
        |FROM agg""".stripMargin,

    // identical midrank-on-the-value-domain kernel; the one truncation
    // (group mean rank in ppm) is `div` ≡ `//` on both engines
    "q_kruskal" ->
      """WITH b AS (SELECT event_type AS g,
        |    CAST(round(value*100) AS BIGINT) AS v FROM events
        |  WHERE event_type IS NOT NULL AND value IS NOT NULL),
        |byv AS (SELECT v, count(*) AS t FROM b GROUP BY v),
        |mid AS (SELECT v, t,
        |    2*coalesce(sum(t) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      + t + 1 AS mid2
        |  FROM byv),
        |tot AS (SELECT sum(t) AS n, sum(t * mid2 * mid2) AS s2 FROM mid),
        |gv AS (SELECT g, v, count(*) AS tg FROM b GROUP BY 1, 2),
        |pg AS (SELECT g, sum(tg) AS ng, sum(tg * mid2) AS rg2
        |  FROM gv JOIN mid USING (v) GROUP BY g),
        |dev AS (SELECT ng,
        |    (1000000 * rg2) // ng - 1000000 * (n + 1) AS dv, n, s2
        |  FROM pg CROSS JOIN tot),
        |agg AS (SELECT max(n) AS n, count(*) AS k,
        |    sum(ng * dv * dv) AS num,
        |    max(s2 - n * (n + 1) * (n + 1)) AS den4
        |  FROM dev)
        |SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
        |  CASE WHEN den4 = 0 THEN NULL
        |    ELSE round(CAST(n - 1 AS DOUBLE) * (CAST(num AS DOUBLE) / 1e12)
        |      / CAST(den4 AS DOUBLE), 4) + 0.0 END AS h
        |FROM agg""".stripMargin,

    // group/grand means truncated to micro units on both engines; the sums
    // of squares accumulate exactly around those truncated means
    "q_anova" ->
      """WITH b AS (SELECT event_type AS g,
        |    CAST(round(value*100) AS BIGINT) AS v FROM events
        |  WHERE event_type IS NOT NULL AND value IS NOT NULL),
        |pg AS (SELECT g, count(*) AS ng, sum(v) AS sg, sum(v*v) AS ssg
        |  FROM b GROUP BY g),
        |tot AS (SELECT sum(ng) AS n, sum(sg) AS s FROM pg),
        |m AS (SELECT ng, sg, ssg, n,
        |    (1000000 * sg) // ng AS mg, (1000000 * s) // n AS gm
        |  FROM pg CROSS JOIN tot),
        |agg AS (SELECT max(n) AS n, count(*) AS k,
        |    sum(ng * (mg - gm) * (mg - gm)) AS ssb,
        |    sum(1000000000000 * ssg - 2 * mg * 1000000 * sg + ng * mg * mg)
        |      AS ssw
        |  FROM m)
        |SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
        |  CASE WHEN ssw = 0 OR k <= 1 OR n <= k THEN NULL
        |    ELSE round((CAST(ssb AS DOUBLE) / CAST(k - 1 AS DOUBLE)) /
        |      (CAST(ssw AS DOUBLE) / CAST(n - k AS DOUBLE)), 4) + 0.0
        |    END AS f_stat,
        |  CASE WHEN ssb + ssw = 0 THEN NULL
        |    ELSE round(CAST(ssb AS DOUBLE) /
        |      (CAST(ssb AS DOUBLE) + CAST(ssw AS DOUBLE)), 6) + 0.0
        |    END AS eta_sq
        |FROM agg""".stripMargin,

    // Pearson over 2x midranks per flag — five exact cross-sums, one
    // double expression; the same per-group window kernel as the engine
    "q_spearman" ->
      """WITH b AS (SELECT l_returnflag AS g,
        |    CAST(round(l_quantity*100) AS BIGINT) AS x,
        |    CAST(round(l_extendedprice*100) AS BIGINT) AS y FROM lineitem
        |  WHERE l_returnflag IS NOT NULL AND l_quantity IS NOT NULL
        |    AND l_extendedprice IS NOT NULL),
        |bx AS (SELECT g, x, count(*) AS t FROM b GROUP BY 1, 2),
        |rx AS (SELECT g, x,
        |    2*coalesce(sum(t) OVER (PARTITION BY g ORDER BY x
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      + t + 1 AS rx2 FROM bx),
        |by_ AS (SELECT g, y, count(*) AS t FROM b GROUP BY 1, 2),
        |ry AS (SELECT g, y,
        |    2*coalesce(sum(t) OVER (PARTITION BY g ORDER BY y
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      + t + 1 AS ry2 FROM by_),
        |j AS (SELECT b.g, rx2, ry2 FROM b
        |  JOIN rx ON b.g = rx.g AND b.x = rx.x
        |  JOIN ry ON b.g = ry.g AND b.y = ry.y),
        |a AS (SELECT g, count(*) AS n, sum(rx2) AS sx, sum(ry2) AS sy,
        |    sum(rx2*rx2) AS sxx, sum(ry2*ry2) AS syy, sum(rx2*ry2) AS sxy
        |  FROM j GROUP BY g)
        |SELECT g AS l_returnflag, CAST(n AS BIGINT) AS n,
        |  CASE WHEN (n*sxx - sx*sx) = 0 OR (n*syy - sy*sy) = 0 THEN NULL
        |    ELSE round(CAST(n*sxy - sx*sy AS DOUBLE) /
        |      sqrt(CAST(n*sxx - sx*sx AS DOUBLE) *
        |           CAST(n*syy - sy*sy AS DOUBLE)), 4) + 0.0 END AS rho
        |FROM a ORDER BY l_returnflag""".stripMargin,

    // the sketch lane: Bernoulli-by-hash id sample (the q_fixed_sample
    // Knuth hash against a per-group k·M div n threshold — duplicate
    // synthetic ids cluster-sample identically on both engines), ranks
    // via list-count expressions against the sorted sample arrays, then
    // the identical exact Pearson tail
    "q_spearman_sketch" ->
      """WITH b AS (SELECT l_returnflag AS g,
        |    l_orderkey*10 + l_linenumber AS id,
        |    CAST(round(l_quantity*100) AS BIGINT) AS x,
        |    CAST(round(l_extendedprice*100) AS BIGINT) AS y FROM lineitem
        |  WHERE l_returnflag IS NOT NULL AND l_quantity IS NOT NULL
        |    AND l_extendedprice IS NOT NULL
        |    AND l_orderkey IS NOT NULL AND l_linenumber IS NOT NULL),
        |thr AS (SELECT g, (CAST(512 AS BIGINT) * 1000000007) // count(*)
        |    AS t FROM b GROUP BY g),
        |s AS (SELECT b.g, list(b.x ORDER BY b.x) AS xs,
        |    list(b.y ORDER BY b.y) AS ys
        |  FROM b JOIN thr ON b.g = thr.g
        |  WHERE ((b.id % 1000003) * 2654435761) % 1000000007 < thr.t
        |  GROUP BY b.g),
        |rk AS (SELECT b.g,
        |    2*len(list_filter(s.xs, e -> e < b.x))
        |      + len(list_filter(s.xs, e -> e = b.x)) + 1 AS rx2,
        |    2*len(list_filter(s.ys, e -> e < b.y))
        |      + len(list_filter(s.ys, e -> e = b.y)) + 1 AS ry2
        |  FROM b JOIN s ON b.g = s.g),
        |a AS (SELECT g, count(*) AS n,
        |    sum(CAST(rx2 AS HUGEINT)) AS sx, sum(CAST(ry2 AS HUGEINT)) AS sy,
        |    sum(CAST(rx2 AS HUGEINT)*rx2) AS sxx,
        |    sum(CAST(ry2 AS HUGEINT)*ry2) AS syy,
        |    sum(CAST(rx2 AS HUGEINT)*ry2) AS sxy FROM rk GROUP BY g)
        |SELECT g AS l_returnflag, CAST(n AS BIGINT) AS n,
        |  CASE WHEN (n*sxx - sx*sx) = 0 OR (n*syy - sy*sy) = 0 THEN NULL
        |    ELSE round(CAST(n*sxy - sx*sy AS DOUBLE) /
        |      sqrt(CAST(n*sxx - sx*sx AS DOUBLE) *
        |           CAST(n*syy - sy*sy AS DOUBLE)), 4) + 0.0 END AS rho
        |FROM a ORDER BY l_returnflag""".stripMargin,

    // exact pair classification on the 25-row nation panel
    "q_kendall" ->
      """WITH nat AS (SELECT CAST(c_nationkey AS BIGINT) AS nk,
        |    sum(CAST(round(c_acctbal*100) AS BIGINT)) AS bal,
        |    count(*) AS cnt
        |  FROM customer GROUP BY 1),
        |p AS (SELECT a.bal AS x, a.cnt AS y, b.bal AS x2, b.cnt AS y2
        |  FROM nat a JOIN nat b ON a.nk < b.nk),
        |agg AS (SELECT count(*) AS np,
        |    sum(CASE WHEN x <> x2 AND y <> y2 AND ((x < x2) = (y < y2))
        |      THEN 1 ELSE 0 END) AS c,
        |    sum(CASE WHEN x <> x2 AND y <> y2 AND ((x < x2) <> (y < y2))
        |      THEN 1 ELSE 0 END) AS d,
        |    sum(CASE WHEN x = x2 THEN 1 ELSE 0 END) AS tx,
        |    sum(CASE WHEN y = y2 THEN 1 ELSE 0 END) AS ty
        |  FROM p)
        |SELECT CAST(np AS BIGINT) AS n_pairs, CAST(c AS BIGINT) AS concordant,
        |  CAST(d AS BIGINT) AS discordant,
        |  CASE WHEN np = tx OR np = ty THEN NULL
        |    ELSE round(CAST(c - d AS DOUBLE) /
        |      sqrt(CAST(np - tx AS DOUBLE) * CAST(np - ty AS DOUBLE)), 4)
        |      + 0.0 END AS tau_b
        |FROM agg""".stripMargin,

    // the SAME md5-derived row/bucket lane as the engine (shared
    // cmsBucketSql twin); per-row dot products, min across rows
    "q_cms_join_size" -> {
      val arms = (0 until 3).map { j =>
        s"  SELECT $j AS row, " +
          s"${graft.operators.Sketches.cmsBucketSql(j, 3, 1024, "uid")}" +
          " AS bucket FROM ev"
      }.mkString("\nUNION ALL\n")
      s"""WITH ev AS (SELECT CAST(user_id AS VARCHAR) AS uid FROM events
         |  WHERE user_id IS NOT NULL),
         |cells AS (SELECT row, bucket, count(*) AS cnt FROM (
         |$arms
         |) GROUP BY 1, 2),
         |p AS (SELECT row, sum(CAST(cnt AS HUGEINT) * cnt) AS pr
         |  FROM cells GROUP BY row),
         |est AS (SELECT min(pr) AS e FROM p),
         |ex AS (SELECT sum(CAST(f AS HUGEINT) * f) AS x FROM (
         |  SELECT count(*) AS f FROM events WHERE user_id IS NOT NULL
         |  GROUP BY user_id))
         |SELECT CAST(x AS BIGINT) AS exact_join_size,
         |  CAST(e AS BIGINT) AS est_join_size,
         |  CAST((10000 * e) // x AS BIGINT) AS est_bp
         |FROM ex, est""".stripMargin
    },

    // identical micro-truncated per-variant terms on the common
    // denominator n·r·R; unobserved expected variants still contribute
    "q_srm" ->
      """WITH b AS (SELECT 'v' || CAST(user_id % 2 AS VARCHAR) AS v
        |  FROM events WHERE user_id IS NOT NULL),
        |obs AS (SELECT v, count(*) AS o FROM b GROUP BY v),
        |r AS (SELECT * FROM (VALUES ('v0', 1), ('v1', 1)) AS t(v, rr)),
        |j AS (SELECT coalesce(o, 0) AS o, rr
        |  FROM obs FULL OUTER JOIN r USING (v)),
        |tot AS (SELECT sum(CASE WHEN rr IS NOT NULL THEN o ELSE 0 END) AS n
        |  FROM j),
        |agg AS (SELECT max(n) AS n,
        |    sum(CASE WHEN rr IS NOT NULL THEN 1 ELSE 0 END) AS k,
        |    sum(CASE WHEN rr IS NULL THEN o ELSE 0 END) AS n_unexpected,
        |    sum(CASE WHEN rr IS NOT NULL THEN
        |      (1000000 * (CAST(o AS HUGEINT) * 2 - CAST(n AS HUGEINT) * rr)
        |        * (CAST(o AS HUGEINT) * 2 - CAST(n AS HUGEINT) * rr))
        |      // (CAST(n AS HUGEINT) * rr * 2) ELSE 0 END) AS chi
        |  FROM j, tot)
        |SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
        |  CAST(n_unexpected AS BIGINT) AS n_unexpected,
        |  round(CAST(chi AS DOUBLE) / 1e6, 4) + 0.0 AS chi2,
        |  chi > 3841500 AS srm
        |FROM agg""".stripMargin,

    // exact integer TV on the common denominator 2·n_a·n_b
    "q_overlap_tv" ->
      """WITH b AS (SELECT CAST(round(value*100) AS BIGINT) // 2500 AS bin,
        |    user_id % 2 = 0 AS g
        |  FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL),
        |bins AS (SELECT bin, sum(CASE WHEN g THEN 1 ELSE 0 END) AS ca,
        |    sum(CASE WHEN g THEN 0 ELSE 1 END) AS cb FROM b GROUP BY bin),
        |tot AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM bins),
        |agg AS (SELECT max(na) AS na, max(nb) AS nb, count(*) AS n_bins,
        |    sum(abs(CAST(ca AS HUGEINT) * nb - CAST(cb AS HUGEINT) * na))
        |      AS s
        |  FROM bins, tot)
        |SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
        |  CAST(n_bins AS BIGINT) AS n_bins,
        |  round(CAST(s AS DOUBLE) /
        |    (2.0 * CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)), 6) + 0.0 AS tv,
        |  round(1.0 - CAST(s AS DOUBLE) /
        |    (2.0 * CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)), 6) + 0.0
        |    AS overlap
        |FROM agg""".stripMargin,

    // the sorted-scan 2-D skyline identity: per-x best y, then a running
    // max over the x domain
    "q_skyline" ->
      """WITH b AS (SELECT CAST(round(p_retailprice*100) AS BIGINT) AS x,
        |    CAST(p_size AS BIGINT) AS y FROM part
        |  WHERE p_retailprice IS NOT NULL AND p_size IS NOT NULL),
        |xy AS (SELECT x, y, count(*) AS n_rows FROM b GROUP BY 1, 2),
        |cand AS (SELECT x, y, n_rows FROM (
        |  SELECT x, y, n_rows, max(y) OVER (PARTITION BY x) AS mx FROM xy)
        |  WHERE y = mx),
        |sk AS (SELECT x, y, n_rows, max(y) OVER (ORDER BY x
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev
        |  FROM cand)
        |SELECT x AS min_value, y AS max_value, CAST(n_rows AS BIGINT)
        |  AS n_rows
        |FROM sk WHERE prev IS NULL OR y > prev
        |ORDER BY min_value""".stripMargin,

    // q_chi2's grid + the V effect size; identical micro-truncated chi
    "q_cramers_v" ->
      """WITH cells AS (SELECT event_type AS x, isodow(ts) AS y, count(*) AS o
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        |ra AS (SELECT x, sum(o) AS r FROM cells GROUP BY 1),
        |cb AS (SELECT y, sum(o) AS c FROM cells GROUP BY 1),
        |tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
        |grid AS (SELECT ra.r, cb.c, coalesce(cells.o, 0) AS o
        |  FROM ra CROSS JOIN cb
        |  LEFT JOIN cells ON cells.x = ra.x AND cells.y = cb.y),
        |s AS (SELECT sum(
        |    (CAST(o AS HUGEINT) * n - CAST(r AS HUGEINT) * c)
        |    * (CAST(o AS HUGEINT) * n - CAST(r AS HUGEINT) * c)
        |    * 1000000 // (CAST(r AS HUGEINT) * c * n)) AS chi
        |  FROM grid, tot),
        |k AS (SELECT (SELECT count(*) FROM ra) AS ka,
        |    (SELECT count(*) FROM cb) AS kb)
        |SELECT (SELECT n FROM tot) AS n,
        |  CAST((ka - 1) * (kb - 1) AS BIGINT) AS dof,
        |  round(CAST(coalesce(chi, 0) AS DOUBLE) / 1e6, 4) + 0.0 AS chi2,
        |  CASE WHEN (SELECT n FROM tot) = 0 OR least(ka, kb) <= 1 THEN NULL
        |    ELSE round(sqrt(CAST(coalesce(chi, 0) AS DOUBLE) / 1e6 /
        |      (CAST((SELECT n FROM tot) AS DOUBLE) *
        |       CAST(least(ka, kb) - 1 AS DOUBLE))), 4) + 0.0
        |    END AS cramers_v
        |FROM s, k""".stripMargin,

    // the argmax compares the exact rationals D²/(t(n−t)) via the
    // two-key (quotient, n⁴-scaled remainder quotient) form — unequal
    // gains always differ in one key; ties break to the earliest split
    "q_changepoint" ->
      """WITH d AS (SELECT
        |    date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
        |      AS t,
        |    sum(CAST(round(o_totalprice*100) AS BIGINT)) AS y
        |  FROM orders GROUP BY 1),
        |o AS (SELECT t, row_number() OVER (ORDER BY t) AS i,
        |    sum(CAST(y AS HUGEINT)) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS st
        |  FROM d),
        |tot AS (SELECT count(*) AS n, sum(CAST(y AS HUGEINT)) AS s FROM d),
        |g AS (SELECT t, i, st, n, s,
        |    CAST(n AS HUGEINT) * (n - i) * st * st
        |      + CAST(n AS HUGEINT) * i * (s - st) * (s - st)
        |      - CAST(i AS HUGEINT) * (n - i) * s * s AS gain,
        |    CAST(i AS HUGEINT) * (n - i) AS bb
        |  FROM o, tot WHERE i < n),
        |k AS (SELECT *, gain // bb AS k1,
        |    ((gain % bb) * CAST(n AS HUGEINT) * n * n * n) // bb AS k2
        |  FROM g),
        |b AS (SELECT * FROM k ORDER BY k1 DESC, k2 DESC, t ASC LIMIT 1)
        |SELECT CAST(t AS BIGINT) AS split_at, CAST(i AS BIGINT) AS n_left,
        |  CAST(n - i AS BIGINT) AS n_right,
        |  CAST((1000000 * st) // i AS DOUBLE) / 1e6 AS mean_left,
        |  CAST((1000000 * (s - st)) // (n - i) AS DOUBLE) / 1e6
        |    AS mean_right,
        |  round(CAST(gain AS DOUBLE) / (CAST(n AS DOUBLE) *
        |    CAST(i AS DOUBLE) * CAST(n - i AS DOUBLE)), 4) + 0.0 AS gain
        |FROM b""".stripMargin,

    // rest-side moments are exact differences from the totals; identical
    // double formula text over exact hugeint components
    "q_effect_size" ->
      """WITH b AS (SELECT event_type AS g,
        |    CAST(round(value*100) AS BIGINT) AS v FROM events
        |  WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |pg AS (SELECT g, count(*) AS n1, sum(CAST(v AS HUGEINT)) AS s1,
        |    sum(CAST(v AS HUGEINT) * v) AS ss1 FROM b GROUP BY g),
        |tot AS (SELECT sum(n1) AS n, sum(s1) AS s, sum(ss1) AS ss FROM pg),
        |m AS (SELECT g, n1, s1, ss1, n - n1 AS n2, s - s1 AS s2,
        |    ss - ss1 AS ss2 FROM pg, tot),
        |e AS (SELECT g, n1,
        |    CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1,
        |    CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS m2,
        |    CAST(n1*ss1 - s1*s1 AS DOUBLE) / CAST(n1*(n1 - 1) AS DOUBLE)
        |      AS v1,
        |    CAST(n2*ss2 - s2*s2 AS DOUBLE) / CAST(n2*(n2 - 1) AS DOUBLE)
        |      AS v2,
        |    n1 AS nn1, n2 AS nn2 FROM m),
        |f AS (SELECT g, n1, m1, m2, nn1, nn2,
        |    (CAST(nn1 - 1 AS DOUBLE) * v1 + CAST(nn2 - 1 AS DOUBLE) * v2)
        |      / CAST(nn1 + nn2 - 2 AS DOUBLE) AS sp2 FROM e)
        |SELECT g AS event_type, CAST(n1 AS BIGINT) AS n_in,
        |  round(m1, 4) + 0.0 AS mean_in, round(m2, 4) + 0.0 AS mean_rest,
        |  CASE WHEN nn1 < 2 OR nn2 < 2 OR sp2 <= 0 THEN NULL
        |    ELSE round((m1 - m2) / sqrt(sp2), 4) + 0.0 END AS cohens_d,
        |  CASE WHEN nn1 < 2 OR nn2 < 2 OR sp2 <= 0 THEN NULL
        |    ELSE round((m1 - m2) / sqrt(sp2) *
        |      (1.0 - 3.0 / CAST(4*(nn1 + nn2) - 9 AS DOUBLE)), 4) + 0.0
        |    END AS hedges_g
        |FROM f ORDER BY event_type""".stripMargin,

    // signs around the explicit two-middle median (×2 so both parities
    // stay integral); exact run/sign counts, one double z
    "q_runs_test" ->
      """WITH d AS (SELECT
        |    date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
        |      AS t,
        |    sum(CAST(round(o_totalprice*100) AS BIGINT)) AS y
        |  FROM orders GROUP BY 1),
        |c AS (SELECT count(*) AS m FROM d),
        |mid AS (SELECT sum(y) AS half, count(*) AS k FROM (
        |    SELECT y, row_number() OVER (ORDER BY y) AS rn FROM d), c
        |  WHERE rn = (m + 1) // 2 OR rn = m // 2 + 1),
        |m2 AS (SELECT half * (3 - k) AS med2 FROM mid),
        |sg AS (SELECT t, CASE WHEN y*2 > med2 THEN 1
        |    WHEN y*2 < med2 THEN 0 END AS sgn FROM d, m2),
        |f AS (SELECT t, sgn FROM sg WHERE sgn IS NOT NULL),
        |r AS (SELECT sgn, CASE WHEN lag(sgn) OVER (ORDER BY t) IS NULL
        |    OR lag(sgn) OVER (ORDER BY t) <> sgn THEN 1 ELSE 0 END AS chg
        |  FROM f),
        |agg AS (SELECT sum(sgn) AS n1, sum(1 - sgn) AS n2,
        |    sum(chg) AS runs FROM r)
        |SELECT CAST(n1 AS BIGINT) AS n_pos, CAST(n2 AS BIGINT) AS n_neg,
        |  CAST(runs AS BIGINT) AS runs,
        |  CASE WHEN n1 = 0 OR n2 = 0 OR 2*n1*n2 <= n1 + n2 THEN NULL
        |    ELSE round((CAST(runs AS DOUBLE) -
        |        (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) /
        |          CAST(n1 + n2 AS DOUBLE) + 1.0)) /
        |      sqrt(2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) *
        |        (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) -
        |          CAST(n1 + n2 AS DOUBLE)) /
        |        (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 AS DOUBLE) *
        |          (CAST(n1 + n2 AS DOUBLE) - 1.0))), 4) + 0.0
        |    END AS z
        |FROM agg""".stripMargin,

    // one double z over four exact counts, identical formula text
    "q_two_proportions" ->
      """WITH b AS (SELECT event_type = 'purchase' AS s,
        |    user_id % 2 = 0 AS g FROM events
        |  WHERE event_type IS NOT NULL AND user_id IS NOT NULL),
        |a AS (SELECT
        |    sum(CASE WHEN g THEN 1 ELSE 0 END) AS n1,
        |    sum(CASE WHEN g AND s THEN 1 ELSE 0 END) AS x1,
        |    sum(CASE WHEN NOT g THEN 1 ELSE 0 END) AS n2,
        |    sum(CASE WHEN NOT g AND s THEN 1 ELSE 0 END) AS x2
        |  FROM b)
        |SELECT CAST(n1 AS BIGINT) AS n_1, CAST(x1 AS BIGINT) AS x_1,
        |  CAST(n2 AS BIGINT) AS n_2, CAST(x2 AS BIGINT) AS x_2,
        |  round(CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE), 6) + 0.0 AS rate_1,
        |  round(CAST(x2 AS DOUBLE) / CAST(n2 AS DOUBLE), 6) + 0.0 AS rate_2,
        |  CASE WHEN n1 = 0 OR n2 = 0 OR x1 + x2 = 0
        |      OR x1 + x2 = n1 + n2 THEN NULL
        |    ELSE round((CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE)
        |        - CAST(x2 AS DOUBLE) / CAST(n2 AS DOUBLE)) /
        |      sqrt(CAST(x1 + x2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE) *
        |        (1.0 - CAST(x1 + x2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE)) *
        |        (1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n2 AS DOUBLE))), 4)
        |      + 0.0 END AS z
        |FROM a""".stripMargin,

    // explicit middle-of-the-sorted-run medians on both engines — no
    // engine quantile interpolation in the contract
    "q_theil_sen" ->
      """WITH d AS (SELECT
        |    date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
        |      AS x,
        |    sum(CAST(round(o_totalprice*100) AS BIGINT)) AS y
        |  FROM orders GROUP BY 1),
        |p AS (SELECT CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE)
        |    AS s
        |  FROM d a JOIN d b ON a.x < b.x),
        |ms AS (SELECT s, row_number() OVER (ORDER BY s) AS rn FROM p),
        |cs AS (SELECT count(*) AS m FROM p),
        |sl AS (SELECT avg(s) AS sl, max(m) AS n_slopes FROM ms, cs
        |  WHERE rn = (m + 1) // 2 OR rn = m // 2 + 1),
        |xs AS (SELECT CAST(x AS DOUBLE) AS xd,
        |    row_number() OVER (ORDER BY x) AS rn FROM d),
        |cx AS (SELECT count(*) AS m FROM d),
        |mx AS (SELECT avg(xd) AS mx FROM xs, cx
        |  WHERE rn = (m + 1) // 2 OR rn = m // 2 + 1),
        |ys AS (SELECT CAST(y AS DOUBLE) AS yd,
        |    row_number() OVER (ORDER BY y) AS rn FROM d),
        |my AS (SELECT avg(yd) AS my FROM ys, cx
        |  WHERE rn = (m + 1) // 2 OR rn = m // 2 + 1)
        |SELECT (SELECT CAST(count(*) AS BIGINT) FROM d) AS n,
        |  CAST(n_slopes AS BIGINT) AS n_slopes,
        |  round(sl, 6) + 0.0 AS slope,
        |  round(my - sl * mx, 4) + 0.0 AS intercept
        |FROM sl, mx, my""".stripMargin,

    // three exact sums over the doubled edge list; Pearson's shift
    // invariance makes plain degrees equal Newman's remaining degrees
    "q_assortativity" -> {
      s"""WITH $nationTradeEdgesCtes,
         |deg AS (SELECT node, count(*) AS deg FROM (
         |    SELECT u AS node FROM kept UNION ALL SELECT v FROM kept)
         |  GROUP BY node),
         |dir AS (SELECT u, v FROM kept
         |  UNION ALL SELECT v AS u, u AS v FROM kept),
         |j AS (SELECT du.deg AS jj, dv.deg AS kk FROM dir
         |  JOIN deg du ON dir.u = du.node JOIN deg dv ON dir.v = dv.node),
         |agg AS (SELECT count(*) AS m,
         |    sum(CAST(jj AS HUGEINT) * kk) AS s1,
         |    sum(CAST(jj AS HUGEINT)) AS se,
         |    sum(CAST(jj AS HUGEINT) * jj) AS ss FROM j)
         |SELECT CAST(m // 2 AS BIGINT) AS n_edges,
         |  CASE WHEN m * ss - se * se = 0 THEN NULL
         |    ELSE round(CAST(m * s1 - se * se AS DOUBLE) /
         |      CAST(m * ss - se * se AS DOUBLE), 4) + 0.0
         |    END AS assortativity
         |FROM agg""".stripMargin
    },

    // one arm per candidate: distinct lhs values left-joined to distinct
    // rhs values, string-compared on both engines
    "q_inclusion_deps" -> {
      val cands = Seq(
        ("customer.c_nationkey<nation.n_nationkey",
          "customer", "c_nationkey", "nation", "n_nationkey"),
        ("lineitem.l_orderkey<orders.o_orderkey",
          "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem.l_partkey<part.p_partkey",
          "lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem.l_partkey<supplier.s_suppkey",
          "lineitem", "l_partkey", "supplier", "s_suppkey"),
        ("orders.o_custkey<customer.c_custkey",
          "orders", "o_custkey", "customer", "c_custkey"),
        ("orders.o_orderkey<lineitem.l_orderkey",
          "orders", "o_orderkey", "lineitem", "l_orderkey"))
      val arms = cands.map { case (name, lt, lc, rt, rc) =>
        s"""  SELECT '$name' AS ind, count(*) AS n_lhs,
           |    sum(CASE WHEN hit IS NULL THEN 0 ELSE 1 END) AS n_contained
           |  FROM (SELECT DISTINCT CAST($lc AS VARCHAR) AS v FROM $lt
           |        WHERE $lc IS NOT NULL) l
           |  LEFT JOIN (SELECT DISTINCT CAST($rc AS VARCHAR) AS v, 1 AS hit
           |        FROM $rt WHERE $rc IS NOT NULL) r USING (v)""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""SELECT ind, CAST(n_lhs AS BIGINT) AS n_lhs,
         |  CAST(n_contained AS BIGINT) AS n_contained,
         |  CAST((1000000 * n_contained) // n_lhs AS BIGINT)
         |    AS containment_ppm,
         |  n_contained = n_lhs AS ind_ok
         |FROM (
         |$arms
         |) ORDER BY ind""".stripMargin
    },

    // per-cell nano floor of an identical double keeps the cross-cell MI
    // sum an exact integer on both engines
    "q_mutual_info" ->
      """WITH b AS (SELECT event_type AS a,
        |    CAST(date_part('hour', ts) AS VARCHAR) AS h FROM events
        |  WHERE event_type IS NOT NULL AND ts IS NOT NULL),
        |c AS (SELECT a, h, count(*) AS cab FROM b GROUP BY 1, 2),
        |ma AS (SELECT a, sum(cab) AS ca FROM c GROUP BY a),
        |mb AS (SELECT h, sum(cab) AS cb FROM c GROUP BY h),
        |tt AS (SELECT CAST(sum(cab) AS BIGINT) AS n FROM c),
        |mi AS (SELECT max(n) AS n, count(*) AS n_cells,
        |    sum(CAST(floor(CAST(cab AS DOUBLE) *
        |      ln(CAST(n AS DOUBLE) * CAST(cab AS DOUBLE) /
        |        (CAST(ca AS DOUBLE) * CAST(cb AS DOUBLE))) * 1e9)
        |      AS BIGINT)) AS minano
        |  FROM c JOIN ma USING (a) JOIN mb ON c.h = mb.h CROSS JOIN tt),
        |ha AS (SELECT sum(CAST(floor(CAST(ca AS DOUBLE) *
        |      ln(CAST(n AS DOUBLE) / CAST(ca AS DOUBLE)) * 1e9)
        |      AS BIGINT)) AS hav FROM ma CROSS JOIN tt),
        |hb AS (SELECT sum(CAST(floor(CAST(cb AS DOUBLE) *
        |      ln(CAST(n AS DOUBLE) / CAST(cb AS DOUBLE)) * 1e9)
        |      AS BIGINT)) AS hbv FROM mb CROSS JOIN tt)
        |SELECT CAST(n AS BIGINT) AS n, CAST(n_cells AS BIGINT) AS n_cells,
        |  round(CAST(minano AS DOUBLE) / (1e9 * CAST(n AS DOUBLE)), 6)
        |    + 0.0 AS mi_nats,
        |  CASE WHEN hav <= 0 OR hbv <= 0 THEN NULL
        |    ELSE round(CAST(minano AS DOUBLE) /
        |      sqrt(CAST(hav AS DOUBLE) * CAST(hbv AS DOUBLE)), 6) + 0.0
        |    END AS nmi
        |FROM mi CROSS JOIN ha CROSS JOIN hb""".stripMargin,

    // the four cell means truncate to micro identically; the DiD contrast
    // is exact integer arithmetic over them
    "q_did" ->
      """WITH b AS (SELECT CAST(round(value*100) AS BIGINT) AS y,
        |    user_id % 2 = 0 AS t, ts >= TIMESTAMP '2024-01-16' AS p
        |  FROM events
        |  WHERE value IS NOT NULL AND user_id IS NOT NULL AND ts IS NOT NULL),
        |c AS (SELECT t, p, count(*) AS n, sum(y) AS s FROM b GROUP BY 1, 2),
        |m AS (SELECT t, p, n, (1000000 * s) // n AS mm FROM c),
        |agg AS (SELECT sum(n) AS n,
        |    max(CASE WHEN t AND NOT p THEN mm END) AS m10,
        |    max(CASE WHEN t AND p THEN mm END) AS m11,
        |    max(CASE WHEN NOT t AND NOT p THEN mm END) AS m00,
        |    max(CASE WHEN NOT t AND p THEN mm END) AS m01
        |  FROM m)
        |SELECT CAST(n AS BIGINT) AS n,
        |  CAST(m10 AS DOUBLE) / 1e6 AS mean_treat_pre,
        |  CAST(m11 AS DOUBLE) / 1e6 AS mean_treat_post,
        |  CAST(m00 AS DOUBLE) / 1e6 AS mean_ctrl_pre,
        |  CAST(m01 AS DOUBLE) / 1e6 AS mean_ctrl_post,
        |  CAST((m11 - m10) - (m01 - m00) AS DOUBLE) / 1e6 AS did
        |FROM agg""".stripMargin,

    // rank on the truncated integer cos² (ppt), ties by neighbor id; the
    // reported cosine is one sqrt at the end
    "q_item_cf" ->
      """WITH bi AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it
        |  FROM lineitem),
        |szs AS (SELECT bk, count(*) AS sz FROM bi GROUP BY bk),
        |kept AS (SELECT bi.bk, bi.it FROM bi JOIN szs USING (bk)
        |  WHERE sz <= 10),
        |sup AS (SELECT it, count(*) AS sup FROM kept GROUP BY it),
        |p0 AS (SELECT a.it AS ia, b.it AS ib, count(*) AS n_co
        |  FROM kept a JOIN kept b ON a.bk = b.bk AND a.it < b.it
        |  GROUP BY 1, 2),
        |p1 AS (SELECT ia, ib, n_co FROM p0 WHERE n_co >= 2
        |  UNION ALL SELECT ib, ia, n_co FROM p0 WHERE n_co >= 2),
        |sc AS (SELECT ia, ib, n_co,
        |    (1000000000000 * CAST(n_co AS HUGEINT) * n_co)
        |      // (CAST(sa.sup AS HUGEINT) * sb.sup) AS cos2
        |  FROM p1 JOIN sup sa ON p1.ia = sa.it JOIN sup sb ON p1.ib = sb.it),
        |r AS (SELECT ia, ib, n_co, cos2,
        |    row_number() OVER (PARTITION BY ia
        |      ORDER BY cos2 DESC, ib ASC) AS rnk
        |  FROM sc)
        |SELECT CAST(ia AS BIGINT) AS item, CAST(rnk AS BIGINT) AS rank,
        |  CAST(ib AS BIGINT) AS neighbor, CAST(n_co AS BIGINT) AS n_co,
        |  round(sqrt(CAST(cos2 AS DOUBLE) / 1e12), 4) AS cosine
        |FROM r WHERE rnk <= 5 ORDER BY item, rank""".stripMargin,

    // identical per-word nano floor; the absent-word mass is the closed
    // form (B − Σ present b)·ln2/2B on both engines
    "q_js_sources" ->
      s"""WITH w AS (SELECT source AS src, unnest($sqlTokens) AS word
         |  FROM documents),
         |w2 AS (SELECT src, word FROM w WHERE word <> ''),
         |sw AS (SELECT src, word, count(*) AS a FROM w2 GROUP BY 1, 2),
         |ct AS (SELECT word, sum(a) AS c FROM sw GROUP BY word),
         |ps AS (SELECT src, CAST(sum(a) AS BIGINT) AS sa FROM sw
         |  GROUP BY src),
         |nn AS (SELECT CAST(sum(sa) AS BIGINT) AS n FROM ps),
         |t AS (SELECT sw.src, sw.a, ct.c - sw.a AS b, ps.sa,
         |    nn.n - ps.sa AS bb
         |  FROM sw JOIN ct USING (word) JOIN ps ON sw.src = ps.src
         |  CROSS JOIN nn),
         |tn AS (SELECT src, sa, bb, count(*) AS n_types,
         |    sum(CAST(floor(1e9 * (
         |      CAST(a AS DOUBLE) / (2 * CAST(sa AS DOUBLE)) *
         |        ln(2 * CAST(a AS DOUBLE) * CAST(bb AS DOUBLE) /
         |           (CAST(a AS DOUBLE) * CAST(bb AS DOUBLE)
         |            + CAST(b AS DOUBLE) * CAST(sa AS DOUBLE)))
         |      + CASE WHEN b > 0
         |          THEN CAST(b AS DOUBLE) / (2 * CAST(bb AS DOUBLE)) *
         |            ln(2 * CAST(b AS DOUBLE) * CAST(sa AS DOUBLE) /
         |               (CAST(a AS DOUBLE) * CAST(bb AS DOUBLE)
         |                + CAST(b AS DOUBLE) * CAST(sa AS DOUBLE)))
         |          ELSE 0 END)) AS BIGINT)) AS tsum,
         |    sum(b) AS sb
         |  FROM t GROUP BY 1, 2, 3)
         |SELECT src AS source, sa AS n_words,
         |  CAST(n_types AS BIGINT) AS n_types,
         |  round(CAST(tsum AS DOUBLE) / 1e9 +
         |    CAST(bb - sb AS DOUBLE) * ln(2.0) /
         |      (2.0 * CAST(bb AS DOUBLE)), 6) + 0.0 AS jsd
         |FROM tn ORDER BY source""".stripMargin,

    // same pair stream as q_bigram_score; the KN estimate is one exact
    // rational (D=3/4 cleared through the 4x denominator)
    "q_kneser_ney" ->
      s"""WITH t0 AS (SELECT doc_id AS doc, $sqlTokens AS tk FROM documents),
         |toks AS (SELECT doc, tk FROM t0 WHERE len(tk) >= 2),
         |p AS (SELECT doc, b.w1 AS w1, b.w2 AS w2 FROM (
         |  SELECT doc, unnest(list_transform(generate_series(1, len(tk) - 1),
         |    i -> struct_pack(w1 := tk[i], w2 := tk[i+1]))) AS b FROM toks)),
         |c AS (SELECT w1, w2, count(*) AS c12 FROM p GROUP BY 1, 2),
         |l AS (SELECT w1, sum(c12) AS c1, count(*) AS nf FROM c GROUP BY w1),
         |r AS (SELECT w2 AS w2r, count(*) AS nc FROM c GROUP BY w2),
         |ty AS (SELECT count(*) AS nt FROM c)
         |SELECT c.w1, c.w2, CAST(c12 AS BIGINT) AS c12,
         |  round(CAST(greatest(4*c12 - 3, 0) * nt + 3 * nf * nc AS DOUBLE) /
         |    CAST(4 * c1 * nt AS DOUBLE), 6) + 0.0 AS p_kn
         |FROM c JOIN l USING (w1) JOIN r ON c.w2 = r.w2r CROSS JOIN ty
         |WHERE c12 >= 25
         |ORDER BY w1, w2""".stripMargin,

    // count(DISTINCT) ignores NULLs on both engines; the max(IS NULL) term
    // restores "unknown is a value of its own" identically
    "q_ldiversity" ->
      """WITH b AS (SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
        |        c_mktsegment,
        |        CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band
        |      FROM customer)
        |SELECT c_nationkey, c_mktsegment, count(*) AS n,
        |  CAST(count(DISTINCT bal_band)
        |    + max(CASE WHEN bal_band IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_distinct,
        |  (count(DISTINCT bal_band)
        |    + max(CASE WHEN bal_band IS NULL THEN 1 ELSE 0 END)) >= 3 AS l_ok
        |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // EMD = mean absolute CDF gap over the ordered band domain; integer
    // numerators on the n_g·n common denominator, floored ppm
    "q_tcloseness" ->
      """WITH b AS (SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
        |        c_mktsegment,
        |        CAST(floor(c_acctbal / 1000) AS BIGINT) AS v FROM customer),
        |dom AS (SELECT v, count(*) AS q FROM b GROUP BY 1),
        |gcum AS (SELECT v, sum(q) OVER (ORDER BY v) AS cq,
        |           count(*) OVER () AS m, sum(q) OVER () AS tot FROM dom),
        |gv AS (SELECT c_nationkey, c_mktsegment, v, count(*) AS p
        |       FROM b GROUP BY 1, 2, 3),
        |grp AS (SELECT c_nationkey, c_mktsegment, sum(p) AS ng
        |        FROM gv GROUP BY 1, 2),
        |grid AS (SELECT g.c_nationkey, g.c_mktsegment, g.ng,
        |           gl.v, gl.cq, gl.m, gl.tot,
        |           coalesce(sum(gv.p) OVER (
        |             PARTITION BY g.c_nationkey, g.c_mktsegment
        |             ORDER BY gl.v), 0) AS cp
        |         FROM grp g CROSS JOIN gcum gl
        |         LEFT JOIN gv ON gv.c_nationkey = g.c_nationkey
        |           AND gv.c_mktsegment = g.c_mktsegment AND gv.v = gl.v)
        |SELECT c_nationkey, c_mktsegment, CAST(max(ng) AS BIGINT) AS n,
        |  CAST(CASE WHEN max(m) > 1
        |    THEN (1000000 * sum(abs(cp * tot - cq * ng)))
        |         // ((max(m) - 1) * max(ng) * max(tot))
        |    ELSE 0 END AS BIGINT) AS t_ppm,
        |  CAST(CASE WHEN max(m) > 1
        |    THEN (1000000 * sum(abs(cp * tot - cq * ng)))
        |         // ((max(m) - 1) * max(ng) * max(tot))
        |    ELSE 0 END AS BIGINT) <= 200000 AS t_ok
        |FROM grid GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Tie-aware rank() (equal qualities calibrate equal) — the engine's
    // contract; single-member groups pin to 0.
    // rank-sum AUC twin on score groups; HUGEINT sums cast to BIGINT at
    // the edge (the q_expectations lesson), // ≡ Spark div
    "q_auc" ->
      """WITH b AS (SELECT n_chars AS s,
        |        sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS p,
        |        sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS g
        |      FROM documents GROUP BY 1),
        |c AS (SELECT s, p, g,
        |        coalesce(sum(g) OVER (ORDER BY s
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS nb
        |      FROM b)
        |SELECT CAST(sum(p) AS BIGINT) AS n_pos, CAST(sum(g) AS BIGINT) AS n_neg,
        |  CAST(CASE WHEN sum(p) > 0 AND sum(g) > 0
        |    THEN (500000 * sum(p * (2 * nb + g))) // (sum(p) * sum(g))
        |    ELSE 0 END AS BIGINT) AS auc_ppm
        |FROM c""".stripMargin,

    // kappa twin: confusion cells → marginal product chance term; the
    // langid CTE IS langIdCoreSql, shared with q_langid
    "q_kappa" ->
      s"""WITH pred AS ($langIdCoreSql),
         |pair AS (SELECT d.lang AS a, p.lang_pred AS b
         |         FROM documents d JOIN pred p USING (doc_id)),
         |cells AS (SELECT a, b, count(*) AS c FROM pair GROUP BY a, b),
         |ma AS (SELECT a, sum(c) AS ca FROM cells GROUP BY a),
         |mb AS (SELECT b, sum(c) AS cb FROM cells GROUP BY b),
         |pe AS (SELECT coalesce(sum(ca * cb), 0) AS pe
         |       FROM ma JOIN mb ON ma.a = mb.b),
         |agg AS (SELECT sum(c) AS n,
         |          sum(CASE WHEN a = b THEN c ELSE 0 END) AS n_agree
         |        FROM cells)
         |SELECT CAST(n AS BIGINT) AS n, CAST(n_agree AS BIGINT) AS n_agree,
         |  CAST(CASE WHEN n * n <> pe
         |    THEN (1000000 * (n * n_agree - pe)) // (n * n - pe)
         |    ELSE 0 END AS BIGINT) AS kappa_ppm
         |FROM agg, pe""".stripMargin,

    "q_calibrate" ->
      s"""WITH q AS (SELECT doc_id, quality FROM ($qualitySql)),
         |j AS (SELECT d.doc_id, d.source, q.quality
         |  FROM documents d JOIN q USING (doc_id)),
         |r AS (SELECT doc_id, source,
         |    rank() OVER (PARTITION BY source ORDER BY quality) AS rk,
         |    count(*) OVER (PARTITION BY source) AS n
         |  FROM j)
         |SELECT doc_id, source,
         |  CAST(CASE WHEN n > 1 THEN (10000 * (rk - 1)) // (n - 1)
         |       ELSE 0 END AS BIGINT) AS calib_bp
         |FROM r ORDER BY doc_id""".stripMargin,

    "q_token_budget" -> tokenBudgetSql(budget = 21732L, rounds = 3),

    // The tokenBudget twin as a subquery, then the SAME Knuth hash keep
    // rule at bp grain — plan and execution both replayed in SQL.
    "q_mix_execute" ->
      s"""WITH plan AS (${tokenBudgetSql(budget = 21732L, rounds = 3)})
         |SELECT d.doc_id, d.source
         |FROM documents d JOIN plan p ON d.source = p.source
         |WHERE ((d.doc_id % 1000003) * 2654435761) % 10000 < p.rate_bp
         |ORDER BY d.doc_id""".stripMargin,

    "q_rand_proj" -> randProjSql(outDims = 8, dim = 64),

    // Brute-force all-pairs DBSCAN classification — the engine's grid
    // blocking is lossless (cell width = eps), so the relations match.
    "q_dbscan" ->
      s"""WITH $jlCoords2dCtes,
         |n AS MATERIALIZED (
         |  SELECT a.vec_id, count(*) AS n_nbrs
         |  FROM pts a JOIN pts b
         |    ON (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= 1000000
         |  GROUP BY 1),
         |core AS MATERIALIZED (SELECT vec_id FROM n WHERE n_nbrs >= 6),
         |border AS MATERIALIZED (
         |  SELECT DISTINCT a.vec_id
         |  FROM pts a JOIN pts c
         |    ON a.vec_id <> c.vec_id
         |   AND (a.x-c.x)*(a.x-c.x) + (a.y-c.y)*(a.y-c.y) <= 1000000
         |  JOIN core ON c.vec_id = core.vec_id
         |  WHERE a.vec_id NOT IN (SELECT vec_id FROM core))
         |SELECT n.vec_id, n.n_nbrs,
         |  CASE WHEN n.vec_id IN (SELECT vec_id FROM core) THEN 'core'
         |       WHEN n.vec_id IN (SELECT vec_id FROM border) THEN 'border'
         |       ELSE 'noise' END AS role
         |FROM n ORDER BY vec_id""".stripMargin,

    "q_dbscan_clusters" ->
      s"""WITH RECURSIVE $jlCoords2dCtes,
         |n AS MATERIALIZED (
         |  SELECT a.vec_id, count(*) AS n_nbrs
         |  FROM pts a JOIN pts b
         |    ON (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= 1000000
         |  GROUP BY 1),
         |core AS MATERIALIZED (SELECT vec_id FROM n WHERE n_nbrs >= 6),
         |ce AS MATERIALIZED (
         |  SELECT a.vec_id AS ia, b.vec_id AS ib
         |  FROM pts a JOIN pts b
         |    ON (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= 1000000
         |  WHERE a.vec_id IN (SELECT vec_id FROM core)
         |    AND b.vec_id IN (SELECT vec_id FROM core)),
         |reach(src, dst) AS (
         |  SELECT ia, ib FROM ce
         |  UNION
         |  SELECT r.src, e.ib FROM reach r JOIN ce e ON r.dst = e.ia),
         |lab AS MATERIALIZED (
         |  SELECT src AS id, min(dst) AS cluster_id FROM reach GROUP BY 1),
         |bl AS (
         |  SELECT a.vec_id AS id, min(l.cluster_id) AS cluster_id
         |  FROM pts a JOIN pts c
         |    ON a.vec_id <> c.vec_id
         |   AND (a.x-c.x)*(a.x-c.x) + (a.y-c.y)*(a.y-c.y) <= 1000000
         |  JOIN core ON c.vec_id = core.vec_id
         |  JOIN lab l ON l.id = c.vec_id
         |  WHERE a.vec_id NOT IN (SELECT vec_id FROM core)
         |  GROUP BY 1)
         |SELECT id AS vec_id, role, cluster_id FROM (
         |  SELECT id, 'core' AS role, cluster_id FROM lab
         |  UNION ALL
         |  SELECT id, 'border' AS role, cluster_id FROM bl)
         |ORDER BY vec_id""".stripMargin,

    // Ratio-margin bitext mining: same assign CTEs as the IVF family,
    // integer-quantized cosines, the identical floored cross-multiplied
    // margin, and the same (margin DESC, id) forward-mining cut.
    "q_margin_mine" -> marginMineSqlK("8"),

    // The production-default twin: shared cells from k = ⌊√n⌋ of the
    // UNION corpus (both language sides), matching AutoCells resolution.
    "q_margin_mine_scaled" -> marginMineSqlK(scaledCellsExpr),
    "q_zorder" -> zorderSql(bits = 16),

    "q_trending" ->
      """WITH c AS (
        |  SELECT date_trunc('day', ts) AS window_start, event_type AS item,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT window_start, item, n,
        |    row_number() OVER (PARTITION BY window_start
        |                       ORDER BY n DESC, item) AS rnk
        |  FROM c)
        |SELECT window_start, CAST(rnk AS BIGINT) AS rnk, item,
        |  CAST(n AS BIGINT) AS n
        |FROM r WHERE rnk <= 3
        |ORDER BY window_start, rnk""".stripMargin,

    // Per-lag arms generated from the same literals as the engine's stack
    // (never hand-copied); HUGEINT sums = the decimal(38,0) twin.
    "q_autocorr" -> autocorrSql(4),

    "q_seasonal" ->
      """WITH e AS (SELECT event_type, hour(ts) AS bucket,
        |    CAST(round(value*100, 0) AS BIGINT) AS x FROM events),
        |b AS (SELECT event_type, bucket, CAST(count(*) AS HUGEINT) AS nb,
        |    CAST(sum(x) AS HUGEINT) AS sb FROM e GROUP BY event_type, bucket),
        |t AS (SELECT event_type, sum(nb) AS n, sum(sb) AS s
        |  FROM b GROUP BY event_type)
        |SELECT b.event_type, CAST(b.bucket AS BIGINT) AS bucket,
        |  CAST(nb AS BIGINT) AS n,
        |  CASE WHEN nb * s <> 0
        |    THEN CAST((10000 * sb * n) // (nb * s) AS BIGINT) END AS index_bp
        |FROM b JOIN t USING (event_type)
        |ORDER BY event_type, bucket""".stripMargin,

    // The oracle CAN afford the global sort the engine refuses: one
    // window over the whole (tiny at sf0.01) corpus, ordered by the
    // shared sampler hash with id tie-break — bucket-major == global
    // order because the engine's bucket id is monotone in the hash.
    "q_global_shuffle" ->
      """SELECT doc_id,
        |  CAST(row_number() OVER (ORDER BY
        |    ((doc_id % 1000003) * 2654435761) % 1000000007, doc_id) - 1
        |    AS BIGINT) AS pos
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Doc-grain counts are exact integers; the single ln runs on the
    // identical double ratio in both engines (zipfPanel's convention).
    "q_pmi" ->
      s"""WITH w AS (SELECT DISTINCT doc_id AS doc, unnest($sqlTokens) AS word
         |  FROM documents),
         |u AS (SELECT word, count(*) AS c FROM w GROUP BY word),
         |p AS (SELECT a.word AS x, b.word AS y, count(*) AS c_xy
         |  FROM w a JOIN w b ON a.doc = b.doc AND a.word < b.word
         |  GROUP BY x, y HAVING count(*) >= 5),
         |n AS (SELECT count(*) AS nd FROM documents)
         |SELECT x, y, c_xy,
         |  round(ln((CAST(nd AS DOUBLE) * c_xy)
         |    / (CAST(ux.c AS DOUBLE) * uy.c)), 4) + 0.0 AS pmi
         |FROM p JOIN u ux ON ux.word = p.x JOIN u uy ON uy.word = p.y
         |CROSS JOIN n ORDER BY x, y""".stripMargin,

    // positive = next cellmate (lead), negative = same rank in the next
    // cell, rank wrapped modulo the target cell's size.
    "q_triplets" ->
      s"""WITH $ivfAssignCtes,
         |rk AS (SELECT vec_id, cid,
         |    row_number() OVER (PARTITION BY cid ORDER BY vec_id) AS r,
         |    lead(vec_id) OVER (PARTITION BY cid ORDER BY vec_id) AS pos_id
         |  FROM assign),
         |sz AS (SELECT cid, count(*) AS s FROM assign GROUP BY cid)
         |SELECT rk.vec_id AS anchor_id, rk.pos_id, n.vec_id AS neg_id
         |FROM rk
         |JOIN sz ON sz.cid = (rk.cid + 1) % 8
         |JOIN rk n ON n.cid = (rk.cid + 1) % 8 AND n.r = (rk.r - 1) % sz.s + 1
         |WHERE rk.pos_id IS NOT NULL
         |ORDER BY anchor_id""".stripMargin,

    // One scan arm per rule in the oracle (the engine does ONE pass);
    // verdicts via exact integer cross-multiplication, no rate division.
    "q_expectations" -> {
      def arm(name: String, viol: String, maxBp: Int): String =
        s"""SELECT '$name' AS rule, count(*) AS n_rows,
           |  CAST(sum(CASE WHEN $viol THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
           |  CAST((10000 * sum(CASE WHEN $viol THEN 1 ELSE 0 END))
           |    // greatest(count(*), 1) AS BIGINT) AS viol_bp,
           |  10000 * sum(CASE WHEN $viol THEN 1 ELSE 0 END)
           |    <= $maxBp * count(*) AS passed
           |FROM events""".stripMargin
      Seq(
        arm("event_id_not_null", "event_id IS NULL", 0),
        arm("value_in_range", "value < 0 OR value > 1000", 0),
        arm("type_known",
          "event_type NOT IN ('click', 'view', 'purchase', 'signup', 'error')", 0),
        arm("value_mass_below_100", "value >= 100", 1000))
        .mkString("", "\nUNION ALL\n", "\nORDER BY rule")
    },

    // Add-one-smoothed PSI terms in integer micro-units; counts are
    // exact, the single ln runs on the identical double ratio.
    "q_psi" ->
      """WITH e AS (SELECT event_id,
        |    CAST(round(value*100, 0) AS BIGINT) AS c FROM events),
        |r AS (SELECT least(greatest(c - 0, 0) // 2500, 9) AS bucket,
        |    count(*) AS n FROM e WHERE event_id % 2 = 0 GROUP BY 1),
        |u AS (SELECT least(greatest(c - 0, 0) // 2500, 9) AS bucket,
        |    count(*) AS n FROM e WHERE event_id % 2 = 1 GROUP BY 1),
        |g AS (SELECT unnest(generate_series(0, 9)) AS bucket),
        |t AS (SELECT (SELECT sum(n) FROM r) AS tr, (SELECT sum(n) FROM u) AS tc)
        |SELECT CAST(g.bucket AS BIGINT) AS bucket,
        |  COALESCE(r.n, 0) AS n_ref, COALESCE(u.n, 0) AS n_cur,
        |  CAST(round(((COALESCE(r.n, 0) + 1) / CAST(tr + 10 AS DOUBLE)
        |      - (COALESCE(u.n, 0) + 1) / CAST(tc + 10 AS DOUBLE))
        |    * ln(((COALESCE(r.n, 0) + 1) * CAST(tc + 10 AS DOUBLE))
        |      / ((COALESCE(u.n, 0) + 1) * CAST(tr + 10 AS DOUBLE)))
        |    * 1000000, 0) AS BIGINT) AS term_micro
        |FROM g LEFT JOIN r ON r.bucket = g.bucket
        |LEFT JOIN u ON u.bucket = g.bucket, t
        |ORDER BY g.bucket""".stripMargin,

    "q_link_tables" -> linkTablesSql,

    // identical output by construction: the stored index holds the SAME
    // hash-family bands the inline kernel derives
    "q_link_indexed" -> linkTablesSql,



    // rank computed in the window CTE orders string_agg — the oracle twin
    // of the engine's rank-keyed struct sort inside collect_list.
    "q_user_sequences" ->
      """WITH r AS (SELECT user_id, event_type,
        |    row_number() OVER w AS r,
        |    count(*) OVER (PARTITION BY user_id) AS n
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, CAST(max(n) AS BIGINT) AS n_events,
        |  string_agg(event_type, ' > ' ORDER BY r) AS seq
        |FROM r WHERE r <= 20 GROUP BY user_id ORDER BY user_id""".stripMargin,

    // θ and every mean are floored micro-unit divisions of exact sums;
    // `//` ≡ Spark `div` (truncation verified incl. negatives).
    "q_cuped" ->
      """WITH per AS (SELECT user_id,
        |    CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16'
        |      THEN CAST(round(value*100, 0) AS BIGINT) ELSE 0 END) AS HUGEINT) AS x,
        |    CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16'
        |      THEN CAST(round(value*100, 0) AS BIGINT) ELSE 0 END) AS HUGEINT) AS y,
        |    'v' || CAST(user_id % 2 AS VARCHAR) AS variant
        |  FROM events GROUP BY user_id),
        |g AS (SELECT CAST(count(*) AS HUGEINT) AS gn, sum(x) AS gsx,
        |    sum(y) AS gsy, sum(x*x) AS gsxx, sum(x*y) AS gsxy FROM per),
        |gg AS (SELECT CASE WHEN gn*gsxx - gsx*gsx <> 0
        |    THEN (1000000 * (gn*gsxy - gsx*gsy)) // (gn*gsxx - gsx*gsx)
        |    ELSE 0 END AS theta_micro,
        |    (1000000 * gsx) // gn AS gmx_micro FROM g),
        |v AS (SELECT variant, CAST(count(*) AS HUGEINT) AS n,
        |    sum(y) AS sy, sum(x) AS sx FROM per GROUP BY variant)
        |SELECT variant, CAST(n AS BIGINT) AS n,
        |  CAST((1000000 * sy) // n AS BIGINT) / 1000000.0 AS mean_metric,
        |  CAST((1000000 * sy) // n
        |    - (theta_micro * ((1000000 * sx) // n - gmx_micro)) // 1000000
        |    AS BIGINT) / 1000000.0 AS mean_adjusted
        |FROM v, gg ORDER BY variant""".stripMargin,

    "q_zone_map" ->
      """SELECT l_orderkey // 4096 AS bucket, count(*) AS n_rows,
        | min(l_shipdate) AS min_l_shipdate, max(l_shipdate) AS max_l_shipdate,
        | CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |   AS nnull_l_shipdate,
        | min(l_extendedprice) AS min_l_extendedprice,
        | max(l_extendedprice) AS max_l_extendedprice,
        | CAST(sum(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |   AS nnull_l_extendedprice,
        | coalesce(max(l_shipdate) < TIMESTAMP '1995-01-01', false)
        |   OR coalesce(min(l_shipdate) > TIMESTAMP '1995-12-31', false)
        |   OR min(l_shipdate) IS NULL AS can_skip
        |FROM lineitem GROUP BY 1 ORDER BY bucket""".stripMargin,

    // The oracle recomputes from scratch — equality IS the incremental-
    // maintenance correctness claim (merged base+delta state == full agg).
    "q_agg_delta" ->
      """SELECT event_type, date_trunc('day', ts) AS day, count(*) AS n,
        | round(sum(CAST(round(value*100) AS BIGINT))/100.0, 2) AS sum_value,
        | round(min(CAST(round(value*100) AS BIGINT))/100.0, 2) AS min_value,
        | round(max(CAST(round(value*100) AS BIGINT))/100.0, 2) AS max_value,
        | (100 * sum(CAST(round(value*100) AS BIGINT))) // count(*) / 10000.0
        |   AS avg_value
        |FROM events GROUP BY 1, 2 ORDER BY event_type, day""".stripMargin,

    // Full recompute minus the old view (bag difference) — the DEFINITION
    // of the view delta; the engine's delta rule must reproduce it.
    "q_join_delta" ->
      """SELECT * FROM (
        |  SELECT o_orderkey, o_custkey AS custkey, c_mktsegment
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  EXCEPT ALL
        |  SELECT o_orderkey, o_custkey AS custkey, c_mktsegment
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  WHERE o_orderkey % 17 <> 0 AND c_custkey % 13 <> 0)
        |ORDER BY o_orderkey""".stripMargin,

    "q_pairwise_wins" ->
      s"""WITH $winsCtes
         |SELECT winner, loser, n AS n_wins FROM wins
         |ORDER BY winner, loser""".stripMargin,

    "q_bradley_terry" -> bradleyTerrySql(3),

    "q_templates" ->
      s"""WITH corpus AS ($templateCorpusSql),
         |t AS (SELECT doc_id,
         |        trim(regexp_replace(regexp_replace(text, '[0-9]+', '#', 'g'),
         |          '[ \\t]+', ' ', 'g')) AS template
         |      FROM corpus)
         |SELECT template, count(*) AS n_docs, min(doc_id) AS first_doc
         |FROM t GROUP BY 1 HAVING count(*) >= 2 ORDER BY template""".stripMargin,

    "q_attribution" ->
      """WITH a AS (SELECT event_type, value,
        |  last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
        |      IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
        | FROM events)
        |SELECT coalesce(touch, '(direct)') AS channel,
        | count(*) AS n_conversions,
        | round(sum(CAST(round(value*100) AS BIGINT))/100.0, 2) AS sum_value
        |FROM a WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY channel""".stripMargin,

    // Scan form == join form per token-sum distributivity; the SQL twin
    // keeps the join shape but LEFT JOINs from documents so tokenless docs
    // score the bare bias and NULL text scores NULL (the spec-pinned edge
    // contract of linearScoreScan).
    "q_linear_scan" ->
      s"""WITH $featureHashCtes,
         |w AS (SELECT idx, ((idx * 2654435761) % 1000003) % 2001 - 1000 AS w_micro
         |      FROM (SELECT unnest(generate_series(0, 255)) AS idx)),
         |contrib AS (SELECT doc, sum(f_sum * w_micro) AS sc
         |            FROM fs JOIN w ON fs.feature_idx = w.idx GROUP BY doc)
         |SELECT d.doc_id AS doc,
         |  CASE WHEN d.text IS NULL THEN NULL
         |       ELSE CAST(50000 + coalesce(sc, 0) AS BIGINT) END AS logit_micro,
         |  CASE WHEN d.text IS NULL THEN NULL
         |       ELSE (50000 + coalesce(sc, 0)) > 0 END AS predicted
         |FROM documents d LEFT JOIN contrib ON contrib.doc = d.doc_id
         |ORDER BY doc""".stripMargin,

    "q_er_matches" ->
      s"""WITH $erCtes
         |SELECT id_a, id_b, score FROM m ORDER BY id_a, id_b""".stripMargin,

    "q_fs_em" ->
      s"""WITH ${fsEmSql(5)}
         |SELECT concat(CASE WHEN a0 THEN '1' ELSE '0' END,
         |    CASE WHEN a1 THEN '1' ELSE '0' END,
         |    CASE WHEN a2 THEN '1' ELSE '0' END) AS pattern,
         |  CAST(n AS BIGINT) AS n, w AS posterior_nano,
         |  w >= 500000000 AS is_match
         |FROM wFin ORDER BY pattern""".stripMargin,

    "q_fs_params" ->
      s"""WITH ${fsEmSql(5)}
         |SELECT param, CAST(v AS BIGINT) AS value_nano FROM (
         |  SELECT 'p' AS param, p AS v FROM em5
         |  UNION ALL SELECT 'm_0', m0 FROM em5
         |  UNION ALL SELECT 'm_1', m1 FROM em5
         |  UNION ALL SELECT 'm_2', m2 FROM em5
         |  UNION ALL SELECT 'u_0', u0 FROM em5
         |  UNION ALL SELECT 'u_1', u1 FROM em5
         |  UNION ALL SELECT 'u_2', u2 FROM em5)
         |ORDER BY param""".stripMargin,

    "q_fs_matches" ->
      s"""WITH ${fsEmSql(5)}
         |SELECT a.rec_id AS id_a, b.rec_id AS id_b, f.w AS posterior_nano
         |FROM sa a JOIN sb b ON a.nat = b.nat AND a.postcode = b.postcode
         |JOIN wFin f
         |  ON f.a0 = (a.name IS NOT DISTINCT FROM b.name)
         | AND f.a1 = (a.seg IS NOT DISTINCT FROM b.seg)
         | AND f.a2 = (a.band IS NOT DISTINCT FROM b.band)
         |WHERE f.w >= 500000000
         |ORDER BY id_a, id_b""".stripMargin,

    // same EM + classification as q_fs_matches, every pair drawn from the
    // block-capped sides (fit and classify share the capped universe)
    "q_fs_matches_scaled" ->
      s"""WITH ${fsEmSql(5, erSidesCappedCtes, "ca", "cb")}
         |SELECT a.rec_id AS id_a, b.rec_id AS id_b, f.w AS posterior_nano
         |FROM ca a JOIN cb b ON a.nat = b.nat AND a.postcode = b.postcode
         |JOIN wFin f
         |  ON f.a0 = (a.name IS NOT DISTINCT FROM b.name)
         | AND f.a1 = (a.seg IS NOT DISTINCT FROM b.seg)
         | AND f.a2 = (a.band IS NOT DISTINCT FROM b.band)
         |WHERE f.w >= 500000000
         |ORDER BY id_a, id_b""".stripMargin,

    "q_er_eval" ->
      s"""WITH $erCtes,
         |t AS (SELECT c_custkey AS id_a, c_custkey AS id_b FROM customer),
         |h AS (SELECT count(*) AS n_hit FROM t
         |      WHERE EXISTS (SELECT 1 FROM m
         |                    WHERE m.id_a = t.id_a AND m.id_b = t.id_b))
         |SELECT (SELECT count(*) FROM t) AS n_true,
         |  (SELECT count(*) FROM m) AS n_pred, n_hit,
         |  CASE WHEN (SELECT count(*) FROM t) > 0
         |    THEN (10000 * n_hit) // (SELECT count(*) FROM t) ELSE 0 END
         |    AS recall_bp,
         |  CASE WHEN (SELECT count(*) FROM m) > 0
         |    THEN (10000 * n_hit) // (SELECT count(*) FROM m) ELSE 0 END
         |    AS precision_bp
         |FROM h""".stripMargin,

    "q_link_predict" ->
      s"""WITH $nationTradeEdgesCtes,
         |adj AS (SELECT u AS z, n FROM (
         |    SELECT u, v AS n FROM kept UNION ALL SELECT v AS u, u AS n FROM kept)),
         |deg AS (SELECT z, count(*) AS degz FROM adj GROUP BY 1),
         |adjd AS MATERIALIZED (SELECT a.z, a.n, d.degz
         |  FROM adj a JOIN deg d USING (z)),
         |cand AS (SELECT x.n AS u, y.n AS v, count(*) AS n_common,
         |    CAST(sum(1000000 // x.degz) AS BIGINT) AS ra_micro
         |  FROM adjd x JOIN adjd y ON x.z = y.z AND x.n < y.n
         |  GROUP BY 1, 2)
         |SELECT u, v, CAST(n_common AS BIGINT) AS n_common, ra_micro
         |FROM cand
         |WHERE NOT EXISTS (SELECT 1 FROM kept k
         |  WHERE (k.u = cand.u AND k.v = cand.v)
         |     OR (k.u = cand.v AND k.v = cand.u))
         |ORDER BY u, v""".stripMargin,

    "q_join_card" ->
      """WITH ca AS (SELECT l_partkey AS k, count(*) AS na FROM lineitem GROUP BY 1),
        |cb AS (SELECT l_partkey AS k, count(*) AS nb FROM lineitem GROUP BY 1),
        |e AS (SELECT sum(CAST(na AS HUGEINT) * nb) AS s FROM ca JOIN cb USING (k)
        |      WHERE ((k % 1000003) * 2654435761) % 100 < 10),
        |a AS (SELECT sum(CAST(na AS HUGEINT) * nb) AS t FROM ca JOIN cb USING (k))
        |SELECT CAST(coalesce(s * 100 // 10, 0) AS BIGINT) AS est_rows,
        |  CAST(coalesce(t, 0) AS BIGINT) AS actual_rows,
        |  CAST(CASE WHEN coalesce(t, 0) > 0
        |    THEN abs(coalesce(s * 100 // 10, 0) - t) * 10000 // t
        |    ELSE 0 END AS BIGINT) AS err_bp
        |FROM e, a""".stripMargin,

    "q_compaction" ->
      """WITH z AS (SELECT l_orderkey // 512 AS bucket, count(*) AS n_rows
        |  FROM lineitem GROUP BY 1),
        |c AS (SELECT bucket, n_rows,
        |    sum(n_rows) OVER (ORDER BY bucket) AS cum FROM z),
        |g AS (SELECT (cum - n_rows) // 4000 AS merge_group, n_rows FROM c)
        |SELECT CAST(merge_group AS BIGINT) AS merge_group,
        |  count(*) AS n_files, CAST(sum(n_rows) AS BIGINT) AS total_rows
        |FROM g GROUP BY 1 ORDER BY merge_group""".stripMargin,

    "q_histogram" ->
      """WITH f AS (SELECT value AS v, event_id AS rid FROM events),
        |s AS (SELECT v, rid FROM f
        |      WHERE ((rid % 1000003) * 2654435761) % 100 < 10),
        |nb AS (SELECT v, ntile(16) OVER (ORDER BY v, rid) AS b FROM s),
        |bounds AS (SELECT b, max(v) AS hi FROM nb GROUP BY 1),
        |asn AS (SELECT f.rid, coalesce(min(bo.b), 16) AS bucket
        |        FROM f LEFT JOIN bounds bo ON f.v <= bo.hi GROUP BY f.rid)
        |SELECT CAST(bucket AS BIGINT) AS bucket, count(*) AS n_rows
        |FROM asn GROUP BY 1 ORDER BY bucket""".stripMargin,

    "q_nb_classify" ->
      s"""WITH s AS (SELECT doc_id, text, lang = 'en' AS pos,
         |    ((doc_id % 1000003) * 2654435761) % 100 < 80 AS tr
         |  FROM documents),
         |trw AS (SELECT pos, unnest($sqlTokens) AS word FROM s WHERE tr),
         |cnt AS (SELECT word,
         |    sum(CASE WHEN pos THEN 1 ELSE 0 END) AS ne,
         |    sum(CASE WHEN pos THEN 0 ELSE 1 END) AS nn
         |  FROM trw GROUP BY 1),
         |tot AS (SELECT CAST(sum(ne) AS DOUBLE) AS te,
         |    CAST(sum(nn) AS DOUBLE) AS tn, CAST(count(*) AS DOUBLE) AS v
         |  FROM cnt),
         |wts AS (SELECT word,
         |    CAST(round(ln((CAST(ne + 1 AS DOUBLE) * (tn + v))
         |      / (CAST(nn + 1 AS DOUBLE) * (te + v))) * 1e6, 0) AS BIGINT) AS w
         |  FROM cnt, tot),
         |wz AS (SELECT CAST(round(ln((tn + v) / (te + v)) * 1e6, 0) AS BIGINT)
         |    AS w0 FROM tot),
         |pri AS (SELECT CAST(round(ln(
         |    CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS DOUBLE)
         |    / sum(CASE WHEN pos THEN 0 ELSE 1 END)) * 1e6, 0) AS BIGINT)
         |    AS prior FROM s WHERE tr),
         |tew AS (SELECT doc_id, unnest($sqlTokens) AS word FROM s WHERE NOT tr),
         |sc AS (SELECT t.doc_id, sum(coalesce(wts.w, wz.w0)) AS sw
         |  FROM tew t LEFT JOIN wts USING (word) CROSS JOIN wz
         |  GROUP BY t.doc_id),
         |fin AS (SELECT a.pos,
         |    (coalesce(sc.sw, 0) + pri.prior) > 0 AS pred
         |  FROM (SELECT doc_id, pos FROM s WHERE NOT tr) a
         |  LEFT JOIN sc USING (doc_id) CROSS JOIN pri)
         |SELECT count(*) AS n_test,
         |  CAST(sum(CASE WHEN pred = pos THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_correct,
         |  CAST((10000 * sum(CASE WHEN pred = pos THEN 1 ELSE 0 END))
         |    // count(*) AS BIGINT) AS acc_bp
         |FROM fin""".stripMargin,

    "q17_smallqty" ->
      """SELECT p_brand, count(*) AS n_small,
        |  CAST(round(sum(CAST(round(l_extendedprice*100) AS BIGINT))/100.0, 2)
        |    AS DOUBLE) AS sum_price
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE CAST(round(l_quantity*100) AS BIGINT) <
        |  (SELECT (2 * sum(CAST(round(l2.l_quantity*100) AS BIGINT)))
        |     // (10 * count(*))
        |   FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey)
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q_stump" ->
      s"""WITH f AS (
         |  SELECT 'n_chars' AS feature, n_chars AS value, lang = 'en' AS pos
         |  FROM documents
         |  UNION ALL
         |  SELECT 'n_words', CAST(len($sqlTokens) AS BIGINT), lang = 'en'
         |  FROM documents),
         |g AS (SELECT feature, value,
         |    sum(CASE WHEN pos THEN 1 ELSE 0 END) AS np,
         |    sum(CASE WHEN pos THEN 0 ELSE 1 END) AS nn
         |  FROM f GROUP BY 1, 2),
         |t AS (SELECT feature, sum(np) AS tp, sum(nn) AS tn FROM g GROUP BY 1),
         |c AS (SELECT g.feature, value,
         |    sum(np) OVER (PARTITION BY g.feature ORDER BY value) AS cnp,
         |    sum(nn) OVER (PARTITION BY g.feature ORDER BY value) AS cnn,
         |    t.tp, t.tn
         |  FROM g JOIN t ON t.feature = g.feature),
         |s AS (SELECT feature, value AS threshold,
         |    CASE WHEN cnp + tn - cnn >= cnn + tp - cnp
         |         THEN 'le_pos' ELSE 'le_neg' END AS polarity,
         |    greatest(cnp + tn - cnn, cnn + tp - cnp) * 10000 // (tp + tn)
         |      AS acc_bp
         |  FROM c)
         |SELECT feature, CAST(threshold AS BIGINT) AS threshold, polarity,
         |  CAST(acc_bp AS BIGINT) AS acc_bp
         |FROM s ORDER BY acc_bp DESC, feature, threshold, polarity
         |LIMIT 1""".stripMargin,

    "q_group_split" -> {
      val h = s"(((${graft.operators.Sketches.kmvHash32Sql("source")})" +
        " % 1000003) * 2654435761) % 100"
      s"""WITH a AS (SELECT source,
         |    CASE WHEN $h < 90 THEN 'train'
         |         WHEN $h < 95 THEN 'val' ELSE 'test' END AS split
         |  FROM documents)
         |SELECT split, source, count(*) AS n_docs FROM a
         |GROUP BY 1, 2 ORDER BY split, source""".stripMargin
    },

    "q_time_split" ->
      """WITH a AS (SELECT ts,
        |    CASE WHEN ts < TIMESTAMP '2024-01-20 00:00:00' THEN 'train'
        |         WHEN ts < TIMESTAMP '2024-01-20 00:00:00' + INTERVAL 3 DAY
        |           THEN 'embargo'
        |         ELSE 'test' END AS split
        |  FROM events)
        |SELECT split, count(*) AS n, min(ts) AS first_ts, max(ts) AS last_ts
        |FROM a GROUP BY 1 ORDER BY split""".stripMargin,

    "q_ks_test" ->
      """WITH c AS (SELECT CAST(round(value*100) AS BIGINT) AS v,
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS ca,
        |    sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS cb
        |  FROM events WHERE event_type IN ('click', 'error')
        |    AND value IS NOT NULL GROUP BY 1),
        |cum AS (SELECT sum(ca) OVER (ORDER BY v) AS cuma,
        |    sum(cb) OVER (ORDER BY v) AS cumb FROM c),
        |t AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
        |    CAST(sum(cb) AS BIGINT) AS nb FROM c),
        |d AS (SELECT max(abs(CAST(cuma AS HUGEINT) * nb
        |    - CAST(cumb AS HUGEINT) * na)) AS dmax FROM cum, t)
        |SELECT coalesce(na, 0) AS n_a, coalesce(nb, 0) AS n_b,
        |  CAST(CASE WHEN coalesce(na, 0) > 0 AND coalesce(nb, 0) > 0 THEN
        |    dmax * 10000 // (CAST(na AS HUGEINT) * nb)
        |  ELSE 0 END AS BIGINT) AS ks_bp
        |FROM t, d""".stripMargin,

    "q_gini" ->
      """WITH c AS (SELECT CAST(round(o_totalprice*100) AS BIGINT) AS v,
        |    count(*) AS n
        |  FROM orders WHERE o_totalprice IS NOT NULL GROUP BY 1),
        |cum AS (SELECT v, n, sum(n) OVER (ORDER BY v) AS cc FROM c),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
        |    sum(CAST(v AS HUGEINT) * n) AS s FROM c),
        |t2 AS (SELECT sum(CAST(v AS HUGEINT)
        |    * (2 * CAST(n AS HUGEINT) * (cc - n)
        |       + CAST(n AS HUGEINT) * (n + 1))) AS two_rankx FROM cum)
        |SELECT nn AS n, CAST(s AS BIGINT) AS sum_cents,
        |  CAST(CASE WHEN nn > 0 AND s > 0 THEN
        |    (two_rankx - (CAST(nn AS HUGEINT) + 1) * s) * 1000000
        |      // (CAST(nn AS HUGEINT) * s)
        |  ELSE 0 END AS BIGINT) AS gini_ppm
        |FROM t, t2""".stripMargin,

    "q_chi2" ->
      """WITH cells AS (SELECT event_type AS x, isodow(ts) AS y, count(*) AS o
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        |ra AS (SELECT x, sum(o) AS r FROM cells GROUP BY 1),
        |cb AS (SELECT y, sum(o) AS c FROM cells GROUP BY 1),
        |tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
        |grid AS (SELECT ra.r, cb.c, coalesce(cells.o, 0) AS o
        |  FROM ra CROSS JOIN cb
        |  LEFT JOIN cells ON cells.x = ra.x AND cells.y = cb.y),
        |s AS (SELECT sum(
        |    (CAST(o AS HUGEINT) * n - CAST(r AS HUGEINT) * c)
        |    * (CAST(o AS HUGEINT) * n - CAST(r AS HUGEINT) * c)
        |    * 1000000 // (CAST(r AS HUGEINT) * c * n)) AS chi
        |  FROM grid, tot),
        |k AS (SELECT (SELECT count(*) FROM ra) AS ka,
        |    (SELECT count(*) FROM cb) AS kb)
        |SELECT (SELECT n FROM tot) AS n,
        |  CAST((ka - 1) * (kb - 1) AS BIGINT) AS dof,
        |  CAST(coalesce(chi, 0) AS BIGINT) AS chi2_micro
        |FROM s, k""".stripMargin,

    "q_readability" ->
      s"""SELECT doc_id AS doc,
         |  CAST(len($sqlTokens) AS BIGINT) AS n_words,
         |  CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT)
         |    AS n_sentences,
         |  CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
         |    AS n_syllables,
         |  CASE WHEN len($sqlTokens) > 0 THEN CAST(206835
         |    - (1015 * len($sqlTokens))
         |      // greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
         |    - (84600 * len(regexp_extract_all(lower(text), '[aeiouy]+')))
         |      // len($sqlTokens) AS BIGINT) END AS flesch_milli
         |FROM documents ORDER BY doc""".stripMargin,

    "q_curriculum" ->
      """WITH r AS (SELECT doc_id, source, n_chars,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id) AS rank
        |  FROM documents),
        |a AS (SELECT (rank - 1) % 8 AS shard, n_chars FROM r)
        |SELECT CAST(shard AS BIGINT) AS shard, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  round(sum(n_chars)/count(*), 4) + 0.0 AS avg_chars
        |FROM a GROUP BY 1 ORDER BY shard""".stripMargin,

    "q_jaro_pairs" ->
      """SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
        |  CAST(round(jaro_winkler_similarity(a.p_name, b.p_name) * 10000, 0)
        |    AS BIGINT) AS jw_bp
        |FROM part a JOIN part b
        |  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
        |WHERE CAST(round(jaro_winkler_similarity(a.p_name, b.p_name) * 10000,
        |    0) AS BIGINT) >= 9000
        |ORDER BY id_a, id_b""".stripMargin,

    "q_jaro_scaled" -> {
      val h = graft.operators.Sketches.kmvHash32Sql(
        "CAST(p_partkey AS VARCHAR)")
      s"""WITH rk AS (SELECT p_partkey, p_brand, p_name,
         |    row_number() OVER (PARTITION BY p_brand
         |      ORDER BY ($h), p_partkey) AS rk
         |  FROM part),
         |cp AS (SELECT p_partkey, p_brand, p_name FROM rk WHERE rk <= 400)
         |SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
         |  CAST(round(jaro_winkler_similarity(a.p_name, b.p_name) * 10000,
         |    0) AS BIGINT) AS jw_bp
         |FROM cp a JOIN cp b
         |  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
         |WHERE CAST(round(jaro_winkler_similarity(a.p_name, b.p_name)
         |    * 10000, 0) AS BIGINT) >= 9000
         |ORDER BY id_a, id_b""".stripMargin
    },

    // b comes from a VALUES list (INT32 in DuckDB) and sum_cents from the
    // HUGEINT-safe CTE — both must surface as BIGINT for the typed-value
    // hash (the repo's cast-to-BIGINT convention; max sum ≈ 8·x̄·n stays
    // far inside BIGINT at any realistic SF)
    "q_bootstrap" ->
      s"""WITH $bootstrapCtes
         |SELECT CAST(b AS BIGINT) AS b, n_eff,
         |  CAST(sum_cents AS BIGINT) AS sum_cents, mean_ccents FROM boot
         |ORDER BY b""".stripMargin,

    "q_bootstrap_ci" -> {
      val b = 40
      val loR = math.max(1, math.ceil(0.025 * b).toInt)
      val hiR = math.min(b, math.ceil(0.975 * b).toInt)
      val medR = (b + 1) / 2
      s"""WITH $bootstrapCtes,
         |r AS (SELECT mean_ccents,
         |    row_number() OVER (ORDER BY mean_ccents, b) AS rn FROM boot)
         |SELECT count(*) AS n_resamples,
         |  max(CASE WHEN rn = $loR THEN mean_ccents END) AS lo_ccents,
         |  max(CASE WHEN rn = $medR THEN mean_ccents END) AS median_ccents,
         |  max(CASE WHEN rn = $hiR THEN mean_ccents END) AS hi_ccents
         |FROM r""".stripMargin
    },

    "q_perceptron" -> perceptronSql,

    "q_woe" ->
      """WITH a AS (SELECT n_chars // 100 AS bin, lang = 'en' AS pos
        |  FROM documents WHERE n_chars IS NOT NULL),
        |g AS (SELECT bin, sum(CASE WHEN pos THEN 1 ELSE 0 END) AS np,
        |    sum(CASE WHEN pos THEN 0 ELSE 1 END) AS nn FROM a GROUP BY 1),
        |t AS (SELECT CAST(sum(np) AS BIGINT) AS tp,
        |    CAST(sum(nn) AS BIGINT) AS tn, count(*) AS b FROM g)
        |SELECT CAST(bin AS BIGINT) AS bin, CAST(np AS BIGINT) AS n_pos,
        |  CAST(nn AS BIGINT) AS n_neg,
        |  CAST(round(ln((CAST(np + 1 AS DOUBLE) * (tn + b))
        |    / (CAST(nn + 1 AS DOUBLE) * (tp + b))) * 1e6, 0) AS BIGINT)
        |    AS woe_micro,
        |  CAST(round((CAST(np + 1 AS DOUBLE) / (tp + b)
        |      - CAST(nn + 1 AS DOUBLE) / (tn + b))
        |    * ln((CAST(np + 1 AS DOUBLE) * (tn + b))
        |      / (CAST(nn + 1 AS DOUBLE) * (tp + b))) * 1e6, 0) AS BIGINT)
        |    AS iv_micro
        |FROM g, t ORDER BY bin""".stripMargin,

    "q_hll_registers" ->
      s"""WITH $hllSketchCtes
         |SELECT grp, CAST(bucket AS BIGINT) AS bucket,
         |  CAST(max_rank AS BIGINT) AS max_rank
         |FROM sk ORDER BY grp, bucket""".stripMargin,

    "q_markov_attrib" -> markovAttribSql,

    // the single-pass whole-corpus estimate IS the contract the merged
    // shard sketches must reproduce (per-bucket MAX is associative)
    "q_hll_merged" -> {
      import graft.operators.Sketches.{HllM, HllSuffixBits, HllAlphaMicro}
      val full = 1L << (HllSuffixBits + 1)
      val num = HllAlphaMicro * HllM * HllM * full
      val lcBound = (2.5 * HllM * 1e6).toLong
      s"""WITH $hllSketchCtes,
         |agg AS (SELECT grp, count(*) AS nseen,
         |    sum(CAST(1 AS BIGINT) << (${HllSuffixBits + 1} - max_rank))
         |      AS sseen
         |  FROM sk GROUP BY 1),
         |e AS (SELECT grp, nseen,
         |    sseen + ($HllM - nseen) * $full AS s, $HllM - nseen AS zeros
         |  FROM agg)
         |SELECT grp, CAST(nseen AS BIGINT) AS n_buckets_seen,
         |  CASE WHEN zeros > 0 AND ($num // s) <= $lcBound
         |    THEN CAST(round($HllM.0 * ln($HllM.0 / zeros), 0) AS BIGINT)
         |    ELSE CAST(($num // s) // 1000000 AS BIGINT) END AS est_distinct
         |FROM e ORDER BY grp""".stripMargin
    },

    "q_conformal" ->
      """WITH m AS (SELECT CAST(round(o_totalprice*100) AS BIGINT) AS v,
        |    ((o_orderkey % 1000003) * 2654435761) % 100 < 50 AS cal
        |  FROM orders WHERE o_totalprice IS NOT NULL),
        |c AS (SELECT v, count(*) AS n FROM m WHERE cal GROUP BY 1),
        |cum AS (SELECT v, sum(n) OVER (ORDER BY v) AS cc FROM c),
        |kk AS (SELECT CAST(sum(n) AS BIGINT) AS n_cal,
        |    CAST(((sum(n) + 1) * 9000 + 9999) // 10000 AS BIGINT) AS k_rank
        |  FROM c),
        |thr AS (SELECT min(v) AS threshold_cents FROM cum, kk
        |  WHERE cc >= k_rank),
        |ev AS (SELECT count(*) AS n_eval,
        |    coalesce(sum(CASE WHEN v <= (SELECT threshold_cents FROM thr)
        |      THEN 1 ELSE 0 END), 0) AS ncov
        |  FROM m WHERE NOT cal)
        |SELECT n_cal, k_rank,
        |  (SELECT threshold_cents FROM thr) AS threshold_cents,
        |  CAST(n_eval AS BIGINT) AS n_eval,
        |  CAST(CASE WHEN n_eval > 0 THEN (10000 * ncov) // n_eval
        |    ELSE 0 END AS BIGINT) AS coverage_bp
        |FROM kk, ev""".stripMargin,

    "q_target_encode" ->
      """WITH b AS (SELECT doc_id AS id, source AS cat,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y FROM documents),
        |g AS (SELECT cat, sum(y) AS s, count(*) AS n FROM b GROUP BY 1),
        |t AS (SELECT (1000000 * sum(y)) // count(*) AS gr FROM b)
        |SELECT id, cat,
        |  CAST(((g.s - y) * 1000000 + 10 * t.gr) // (g.n - 1 + 10)
        |    AS BIGINT) AS te_micro
        |FROM b JOIN g USING (cat), t ORDER BY id""".stripMargin,

    "q_hll_estimate" -> {
      import graft.operators.Sketches.{HllM, HllSuffixBits, HllAlphaMicro}
      val full = 1L << (HllSuffixBits + 1)
      val num = HllAlphaMicro * HllM * HllM * full
      val lcBound = (2.5 * HllM * 1e6).toLong
      s"""WITH $hllSketchCtes,
         |agg AS (SELECT grp, count(*) AS nseen,
         |    sum(CAST(1 AS BIGINT) << (${HllSuffixBits + 1} - max_rank))
         |      AS sseen
         |  FROM sk GROUP BY 1),
         |e AS (SELECT grp, nseen,
         |    sseen + ($HllM - nseen) * $full AS s, $HllM - nseen AS zeros
         |  FROM agg),
         |est AS (SELECT grp, CAST(nseen AS BIGINT) AS n_buckets_seen,
         |    CASE WHEN zeros > 0 AND ($num // s) <= $lcBound
         |      THEN CAST(round($HllM.0 * ln($HllM.0 / zeros), 0) AS BIGINT)
         |      ELSE CAST(($num // s) // 1000000 AS BIGINT) END AS est_distinct
         |  FROM e),
         |x AS (SELECT o_orderpriority AS grp,
         |    count(DISTINCT o_custkey) AS exact_distinct
         |  FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1)
         |SELECT est.grp, n_buckets_seen, est_distinct,
         |  CAST(exact_distinct AS BIGINT) AS exact_distinct,
         |  CAST(abs(est_distinct - exact_distinct) * 10000 // exact_distinct
         |    AS BIGINT) AS err_bp
         |FROM est JOIN x ON est.grp = x.grp
         |ORDER BY est.grp""".stripMargin
    }
  )
}
