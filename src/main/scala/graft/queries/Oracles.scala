package graft.queries

/** DuckDB oracle SQL, one per Queries entry, computing the identical
  * result (same column names, same rounding) over the same parquet
  * tables. The driver sorts columns by name and hash-compares values, so
  * names and value-level determinism are the contract.
  */
object Oracles {

  val sql: Map[String, String] = Map(
    "s1_scan_prune" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1996-01-01' AND l_quantity < 10""".stripMargin,

    "s9_gen_dimtable" ->
      """SELECT q.range AS quality, m.range AS mapq,
        |  round((1 - pow(10, -q.range/10.0)) * (1 - pow(10, -m.range/10.0)), 6) AS p_correct
        |FROM range(0, 46) q, range(1, 61) m""".stripMargin,

    "p1_filter_conj" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity, l_discount
        |FROM lineitem
        |WHERE l_returnflag = 'R' AND l_discount > 0.05 AND l_quantity >= 30 AND l_tax < 0.07""".stripMargin,

    "p2_regex_pred" ->
      """SELECT doc_id, lang FROM documents WHERE regexp_matches(text, 'spark (hash|join)')""".stripMargin,

    "p3_cond_rewrite" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice > 300000 THEN 'BIG'
        |       WHEN o_orderstatus = 'F' THEN 'DONE'
        |       ELSE o_orderpriority END AS pri
        |FROM orders""".stripMargin,

    "p6_hard_filter_annotate" ->
      """SELECT l_orderkey, l_linenumber,
        |  concat_ws(';',
        |    CASE WHEN l_quantity < 3 THEN 'LOWQTY' END,
        |    CASE WHEN l_discount > 0.08 THEN 'HIDISC' END,
        |    CASE WHEN l_shipdate < TIMESTAMP '1995-06-01' THEN 'OLDSHIP' END) AS filters_failed,
        |  (concat_ws(';',
        |    CASE WHEN l_quantity < 3 THEN 'LOWQTY' END,
        |    CASE WHEN l_discount > 0.08 THEN 'HIDISC' END,
        |    CASE WHEN l_shipdate < TIMESTAMP '1995-06-01' THEN 'OLDSHIP' END) = '') AS filters_passed
        |FROM lineitem""".stripMargin,

    // the reference's full 9-per-class hard-filter matrix in closed form:
    // het/hom zygosity splits (hom = state 2 of copyNumber 2), strict-<
    // and <=/> boundaries exactly as the engine's Column predicates,
    // SNP/INDEL dispatch on ref/alt length, INDEL MQ disabled (negative
    // default), FS enabled at 60 on both classes
    "p6b_filter_matrix" ->
      """WITH g AS (
        |  SELECT l_orderkey, l_linenumber,
        |    (l_partkey % 4 = 0) AS isindel,
        |    (l_suppkey % 3 = 2) AS hom,
        |    (l_quantity * 2)::DOUBLE AS gq,
        |    (l_orderkey % 250 + l_linenumber)::INT AS dp,
        |    (l_orderkey % 40)::INT AS adp,
        |    (l_partkey % 70)::DOUBLE AS mq,
        |    (l_orderkey % 90)::DOUBLE AS fs
        |  FROM lineitem),
        |f AS (
        |  SELECT *, gq/dp AS qd, adp::DOUBLE/dp AS af,
        |    CASE WHEN isindel THEN 'INDEL' ELSE 'SNP' END AS c
        |  FROM g),
        |x AS (
        |  SELECT l_orderkey, l_linenumber,
        |    concat_ws(';',
        |      CASE WHEN NOT hom AND qd < 2.0 THEN 'HET' || c || 'QD' END,
        |      CASE WHEN hom AND qd < 1.0 THEN 'HOM' || c || 'QD' END,
        |      CASE WHEN fs > 60.0 THEN c || 'FS' END,
        |      CASE WHEN NOT isindel AND mq < 30.0 THEN 'SNPMQ' END,
        |      CASE WHEN dp < 10 THEN c || 'MINDP' END,
        |      CASE WHEN dp > 200 THEN c || 'MAXDP' END,
        |      CASE WHEN NOT hom AND af <= 0.333 THEN 'HET' || c || 'MINAF' END,
        |      CASE WHEN NOT hom AND af > 0.666 THEN 'HET' || c || 'MAXAF' END,
        |      CASE WHEN hom AND af <= 0.666 THEN 'HOM' || c || 'MINAF' END
        |    ) AS filters_failed
        |  FROM f)
        |SELECT l_orderkey, l_linenumber, filters_failed,
        |  (filters_failed = '') AS filters_passed
        |FROM x""".stripMargin,

    "p8_clamp" ->
      """SELECT l_orderkey, l_linenumber,
        |  least(l_quantity, 25.0) AS qty_clamped,
        |  greatest(l_discount, 0.02) AS disc_floor
        |FROM lineitem""".stripMargin,

    "j1_interval_point_bcast" ->
      """SELECT s_suppkey, count(*) AS n_cust, round(sum(c_acctbal), 2) AS sum_bal
        |FROM supplier JOIN customer
        |  ON c_acctbal >= s_acctbal AND c_acctbal < s_acctbal + 500
        |GROUP BY s_suppkey""".stripMargin,

    "j2_interval_overlap_shuffle" ->
      """SELECT s_suppkey, count(*) AS n_overlap
        |FROM supplier JOIN customer
        |  ON s_acctbal < c_acctbal + 500 AND c_acctbal < s_acctbal + 500
        |GROUP BY s_suppkey""".stripMargin,

    "j3_bcast_equijoin" ->
      """SELECT p_brand, count(*) AS n_lines,
        |  round(sum(round(l_extendedprice * 100)::BIGINT
        |            * (100 - round(l_discount * 100)::BIGINT))::BIGINT
        |        / 10000.0, 2) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand""".stripMargin,

    "j4_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 400000)""".stripMargin,

    "j5_anti_join" ->
      """SELECT c_custkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')""".stripMargin,

    "j6_pivot" ->
      """SELECT user_id,
        |  count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
        |  count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
        |  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
        |  count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
        |  count(CASE WHEN event_type = 'view' THEN 1 END) AS view
        |FROM events GROUP BY user_id""".stripMargin,

    "a1_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem""".stripMargin,

    "a2_group_having" ->
      """SELECT l_partkey, count(*) AS n_obs FROM lineitem
        |GROUP BY l_partkey HAVING count(*) >= 40""".stripMargin,

    "a3_wide_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice::DECIMAL(12,2)), 2)::DOUBLE AS sum_base,
        |  round(sum(l_extendedprice::DECIMAL(12,2)
        |            * (1 - l_discount::DECIMAL(3,2))), 2)::DOUBLE AS sum_disc_price,
        |  round(sum(l_extendedprice::DECIMAL(12,2)
        |            * (1 - l_discount::DECIMAL(3,2))
        |            * (1 + l_tax::DECIMAL(3,2))), 2)::DOUBLE AS sum_charge,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(sum(l_extendedprice::DECIMAL(12,2))::DOUBLE / count(*), 4) AS avg_price,
        |  round(sum(l_discount::DECIMAL(3,2))::DOUBLE / count(*), 6) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "a4_dedup_keys" ->
      """SELECT l_partkey, l_suppkey, min(l_orderkey) AS first_order
        |FROM lineitem GROUP BY l_partkey, l_suppkey""".stripMargin,

    "a5_typed_agg" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS sum_total,
        |  round(min(o_totalprice), 2) AS min_total,
        |  round(max(o_totalprice), 2) AS max_total
        |FROM orders GROUP BY o_orderpriority""".stripMargin,

    "a6_ratio_agg" ->
      """SELECT l_returnflag,
        |  round(count(CASE WHEN l_discount > 0 THEN 1 END)::DOUBLE / count(*), 6) AS disc_ratio
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "a7_array_agg" ->
      """SELECT label,
        |  round(sum(embedding[1]::DOUBLE), 3) AS sum_e0,
        |  round(sum(embedding[64]::DOUBLE), 3) AS sum_e63
        |FROM embeddings GROUP BY label""".stripMargin,

    "a8_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,

    // full grouping-sets lattice with grouping() flags (data NULL vs
    // rolled-up NULL disambiguation) — both engines follow the standard
    "a9_cube" ->
      """SELECT lang, source,
        |  grouping(lang)::BIGINT AS g_lang, grouping(source)::BIGINT AS g_src,
        |  count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS sum_chars
        |FROM documents GROUP BY CUBE (lang, source)""".stripMargin,

    "t5_json_extract" ->
      """SELECT event_id, (props->>'k')::INT AS k FROM events""".stripMargin,

    "w1_sort_limit" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    // the greedy coverage cap IS expressible: the admitted set's state
    // (active interval ends) threads through a recursive CTE — one step
    // per (key, rank) row, pruning ends <= current start, admitting
    // while < 8 remain open. trunc() mirrors Spark's cast("long")
    // truncation-toward-zero on the DOUBLE acctbal.
    "w3_coverage_cap" ->
      """WITH RECURSIVE c AS (
        |  SELECT c_mktsegment AS k,
        |    trunc(c_acctbal * 100)::BIGINT AS lo,
        |    trunc(c_acctbal * 100)::BIGINT + 5000 AS hi,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY trunc(c_acctbal * 100)::BIGINT, c_custkey) AS i
        |  FROM customer),
        |rec AS (
        |  SELECT k, 0::BIGINT AS i, []::BIGINT[] AS active, 0::BIGINT AS n_admitted
        |  FROM (SELECT DISTINCT k FROM c)
        |  UNION ALL
        |  SELECT c.k, c.i,
        |    CASE WHEN len(list_filter(r.active, e -> e > c.lo)) < 8
        |         THEN list_append(list_filter(r.active, e -> e > c.lo), c.hi)
        |         ELSE list_filter(r.active, e -> e > c.lo) END,
        |    r.n_admitted + CASE WHEN len(list_filter(r.active, e -> e > c.lo)) < 8
        |                        THEN 1 ELSE 0 END
        |  FROM rec r JOIN c ON c.k = r.k AND c.i = r.i + 1)
        |SELECT k AS c_mktsegment, max(n_admitted) AS n_admitted
        |FROM rec GROUP BY 1""".stripMargin,

    "w2_running_sum" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  sum(l_quantity) OVER (PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_qty
        |FROM lineitem""".stripMargin,

    "w4_top2_margin" ->
      """WITH r AS (
        |  SELECT l_partkey, l_extendedprice,
        |    row_number() OVER (PARTITION BY l_partkey
        |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        |  FROM lineitem)
        |SELECT l_partkey,
        |  max(CASE WHEN rn = 1 THEN l_extendedprice END) AS best,
        |  max(CASE WHEN rn = 2 THEN l_extendedprice END) AS second,
        |  round(max(CASE WHEN rn = 1 THEN l_extendedprice END)
        |    - coalesce(max(CASE WHEN rn = 2 THEN l_extendedprice END),
        |               max(CASE WHEN rn = 1 THEN l_extendedprice END)), 2) AS margin
        |FROM r GROUP BY l_partkey""".stripMargin,

    "u1_union" ->
      """SELECT o_orderpriority AS pri, count(*) AS n
        |FROM (SELECT DISTINCT * FROM (
        |  SELECT o_orderkey, o_orderpriority FROM orders WHERE o_totalprice > 400000
        |  UNION ALL
        |  SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderstatus = 'F') u)
        |GROUP BY o_orderpriority""".stripMargin,

    "u3_token_intersect" ->
      """SELECT doc_id,
        |  len(list_distinct(list_intersect(string_split(text, ' '),
        |    ['spark','hash','join','merge','scan']))) AS n_shared
        |FROM documents""".stripMargin,

    "t1_token_count" ->
      """SELECT doc_id, len(regexp_extract_all(text, '\S+')) AS n_tokens FROM documents""".stripMargin,

    "t2_quality_score" ->
      """SELECT doc_id,
        |  len(regexp_extract_all(text, '\S+')) AS n_tokens,
        |  round(length(regexp_replace(text, '\s+', '', 'g'))::DOUBLE
        |    / len(regexp_extract_all(text, '\S+')), 4) AS avg_tok_len,
        |  round(len(list_filter(string_split(text, ' '), t -> t IN ('the','a','of')))::DOUBLE
        |    / len(regexp_extract_all(text, '\S+')), 4) AS stop_ratio,
        |  (len(regexp_extract_all(text, '\S+')) >= 10
        |    AND round(length(regexp_replace(text, '\s+', '', 'g'))::DOUBLE
        |      / len(regexp_extract_all(text, '\S+')), 4) >= 2.0
        |    AND round(length(regexp_replace(text, '\s+', '', 'g'))::DOUBLE
        |      / len(regexp_extract_all(text, '\S+')), 4) <= 8.0) AS quality_ok
        |FROM documents""".stripMargin,

    "t3_lang_id" ->
      """WITH c AS (
        |  SELECT doc_id, lang,
        |    len(list_filter(string_split(text, ' '), t -> t = 'the')) AS c_en,
        |    len(list_filter(string_split(text, ' '), t -> t = 'der')) AS c_de,
        |    len(list_filter(string_split(text, ' '), t -> t = 'el')) AS c_es,
        |    len(list_filter(string_split(text, ' '), t -> t = 'le')) AS c_fr,
        |    len(list_filter(string_split(text, ' '), t -> t = '的')) AS c_zh
        |  FROM documents)
        |SELECT doc_id, lang,
        |  CASE WHEN c_en >= c_de AND c_en >= c_es AND c_en >= c_fr AND c_en >= c_zh THEN 'en'
        |       WHEN c_de >= c_es AND c_de >= c_fr AND c_de >= c_zh THEN 'de'
        |       WHEN c_es >= c_fr AND c_es >= c_zh THEN 'es'
        |       WHEN c_fr >= c_zh THEN 'fr'
        |       ELSE 'zh' END AS pred_lang,
        |  (lang = CASE WHEN c_en >= c_de AND c_en >= c_es AND c_en >= c_fr AND c_en >= c_zh THEN 'en'
        |       WHEN c_de >= c_es AND c_de >= c_fr AND c_de >= c_zh THEN 'de'
        |       WHEN c_es >= c_fr AND c_es >= c_zh THEN 'es'
        |       WHEN c_fr >= c_zh THEN 'fr'
        |       ELSE 'zh' END) AS is_match
        |FROM c""".stripMargin,

    "t4_fingerprint" ->
      """SELECT doc_id, md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp
        |FROM documents""".stripMargin,

    // rank on the ROUNDED score + term tie-break, mirroring the Spark
    // window exactly, so last-ulp ln() differences cannot flip ranks
    "t6_tfidf_topterms" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM toks
        |  WHERE term <> '' GROUP BY 1, 2),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tf),
        |s AS (
        |  SELECT tf.doc_id, tf.term,
        |    round(tf.tf * ln(n_docs::DOUBLE / df), 4) AS tfidf
        |  FROM tf JOIN dfreq USING (term), nd),
        |r AS (
        |  SELECT doc_id, term, tfidf,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rk
        |  FROM s)
        |SELECT doc_id, term, tfidf, rk FROM r WHERE rk <= 5""".stripMargin,

    // bigram list i ranges over [1, len) 1-based, so ts[i+1] tops out at
    // ts[len]; docs with no bigram emit null bigram ratios on both sides
    "t7_repetition" ->
      """WITH tok AS (
        |  SELECT doc_id, [t FOR t IN string_split(text, ' ') IF t <> ''] AS ts
        |  FROM documents),
        |fl AS (SELECT doc_id, unnest(ts) AS g FROM tok WHERE len(ts) >= 1),
        |tc AS (SELECT doc_id, g, count(*) AS c FROM fl GROUP BY 1, 2),
        |ta AS (SELECT doc_id, sum(c) AS total, count(*) AS dst, max(c) AS top
        |       FROM tc GROUP BY 1),
        |bg AS (SELECT doc_id, [ts[i] || ' ' || ts[i+1] FOR i IN range(1, len(ts))] AS bs
        |       FROM tok),
        |bfl AS (SELECT doc_id, unnest(bs) AS g FROM bg WHERE len(bs) >= 1),
        |bc AS (SELECT doc_id, g, count(*) AS c FROM bfl GROUP BY 1, 2),
        |ba AS (SELECT doc_id, sum(c) AS total, count(*) AS dst, max(c) AS top
        |       FROM bc GROUP BY 1)
        |SELECT ta.doc_id,
        |  round(1 - ta.dst / ta.total::DOUBLE, 4) AS dup_token_ratio,
        |  round(ta.top / ta.total::DOUBLE, 4) AS top_token_ratio,
        |  round(1 - ba.dst / ba.total::DOUBLE, 4) AS dup_bigram_ratio,
        |  round(ba.top / ba.total::DOUBLE, 4) AS top_bigram_ratio
        |FROM ta LEFT JOIN ba ON ta.doc_id = ba.doc_id""".stripMargin,

    "d1_dedup_exact" ->
      """SELECT md5(text) AS fp, count(*) AS n_copies, min(doc_id) AS keep_id
        |FROM documents GROUP BY md5(text)""".stripMargin,

    "d2_ngram_jaccard_pairs" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT doc_id,
        |  list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2] FOR i IN range(1, len(t) - 1)]) AS s
        |  FROM tok WHERE len(t) >= 3),
        |ex AS (SELECT doc_id, len(s) AS n, unnest(s) AS g FROM sh)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  round(count(*)::DOUBLE / (any_value(a.n) + any_value(b.n) - count(*)), 4) AS jaccard
        |FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
        |GROUP BY a.doc_id, b.doc_id
        |HAVING count(*)::DOUBLE / (any_value(a.n) + any_value(b.n) - count(*)) >= 0.5""".stripMargin,

    // asymmetric n-gram containment: directed pairs, C(A,B) = |A∩B|/|A|
    "d15_containment_pairs" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT doc_id,
        |  list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2] FOR i IN range(1, len(t) - 1)]) AS s
        |  FROM tok WHERE len(t) >= 3),
        |ex AS (SELECT doc_id, len(s) AS n, unnest(s) AS g FROM sh)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  round(count(*)::DOUBLE / any_value(a.n), 4) AS containment
        |FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id <> b.doc_id
        |GROUP BY a.doc_id, b.doc_id
        |HAVING count(*)::DOUBLE / any_value(a.n) >= 0.8""".stripMargin,

    "e1_cosine_score" ->
      """WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
        |SELECT e.vec_id,
        |  round(list_dot_product(e.embedding::DOUBLE[], q.qv)
        |    / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
        |       * sqrt(list_dot_product(q.qv, q.qv))), 4) + 0.0 AS cos_sim
        |FROM embeddings e, q""".stripMargin,

    "ev1_time_window_agg" ->
      """SELECT floor(epoch_ms(ts) / 300000.0)::BIGINT AS bucket, event_type,
        |  count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    // mirrors the Spark union-scan as-of exactly: right rows (tag 0) sort
    // before a left row at equal ts (inclusive as-of), largest orderkey
    // wins equal-ts ties, and the payload rides one struct so both output
    // columns come from the same matched row
    "ev7_asof_enrich" ->
      """WITH l AS (
        |  SELECT event_id, user_id AS k, epoch_ms(ts) AS ts, 1 AS tag,
        |         NULL::BIGINT AS ok, NULL::DOUBLE AS tp
        |  FROM events),
        |r AS (
        |  SELECT NULL::BIGINT AS event_id, o_custkey AS k,
        |         epoch_ms(o_orderdate) AS ts, 0 AS tag,
        |         o_orderkey AS ok, o_totalprice AS tp
        |  FROM orders),
        |u AS (SELECT * FROM l UNION ALL SELECT * FROM r),
        |m AS (
        |  SELECT event_id, k, tag,
        |    last_value(CASE WHEN tag = 0 THEN struct_pack(ok := ok, tp := tp) END
        |               IGNORE NULLS)
        |      OVER (PARTITION BY k ORDER BY ts, tag, ok
        |            ROWS UNBOUNDED PRECEDING) AS p
        |  FROM u)
        |SELECT event_id, k AS user_id, p.ok AS last_orderkey,
        |  round(p.tp, 2) AS last_total
        |FROM m WHERE tag = 1""".stripMargin,

    // streaming flavor: per-event as-of against a STATIC right side is
    // invariant to micro-batch boundaries, so the batch oracle carries
    "ev8_stream_asof_enrich" ->
      """WITH l AS (
        |  SELECT event_id, user_id AS k, epoch_ms(ts) AS ts, 1 AS tag,
        |         NULL::BIGINT AS ok, NULL::DOUBLE AS tp
        |  FROM events),
        |r AS (
        |  SELECT NULL::BIGINT AS event_id, o_custkey AS k,
        |         epoch_ms(o_orderdate) AS ts, 0 AS tag,
        |         o_orderkey AS ok, o_totalprice AS tp
        |  FROM orders),
        |u AS (SELECT * FROM l UNION ALL SELECT * FROM r),
        |m AS (
        |  SELECT event_id, k, tag,
        |    last_value(CASE WHEN tag = 0 THEN struct_pack(ok := ok, tp := tp) END
        |               IGNORE NULLS)
        |      OVER (PARTITION BY k ORDER BY ts, tag, ok
        |            ROWS UNBOUNDED PRECEDING) AS p
        |  FROM u)
        |SELECT event_id, k AS user_id, p.ok AS last_orderkey,
        |  round(p.tp, 2) AS last_total
        |FROM m WHERE tag = 1""".stripMargin,

    // batch twin of the watermarked stream-stream interval join: same
    // equi-key + 30-minute range predicate. Spark reads the parquet
    // TIMESTAMP(NANOS) column floored to micros, so the range predicate
    // must also compare at micro precision (epoch_us), not raw
    // nanosecond ts — a sub-microsecond timestamp exactly at the
    // 30-minute boundary would otherwise diverge between engines.
    "ev9_stream_stream_join" ->
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id,
        |  p.user_id AS user_id,
        |  epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
        |FROM events p JOIN events c
        |ON p.user_id = c.user_id
        |  AND p.event_type = 'purchase' AND c.event_type = 'click'
        |  AND epoch_us(c.ts) <= epoch_us(p.ts)
        |  AND epoch_us(c.ts) >= epoch_us(p.ts) - 1800000000""".stripMargin,

    // ev9's join aggregated per (user, tumbling 30-minute purchase
    // window): Spark's tumbling windows align to the epoch, so the
    // window start is plain floor division of the purchase micros
    "ev29_stream_join_agg" ->
      """SELECT (epoch_us(p.ts) // 1800000000) * 1800000000 AS win_us,
        |  p.user_id AS user_id, count(*) AS n_pairs,
        |  sum(epoch_us(p.ts) - epoch_us(c.ts))::BIGINT AS sum_gap_us
        |FROM events p JOIN events c
        |ON p.user_id = c.user_id
        |  AND p.event_type = 'purchase' AND c.event_type = 'click'
        |  AND epoch_us(c.ts) <= epoch_us(p.ts)
        |  AND epoch_us(c.ts) >= epoch_us(p.ts) - 1800000000
        |GROUP BY 1, 2""".stripMargin,

    "g1_discover_variants" ->
      """SELECT concat('chr', l_returnflag) AS contigName,
        |  (l_partkey % 1000) * 20 + (l_suppkey % 10) AS start,
        |  'A' AS referenceAllele,
        |  CASE WHEN l_orderkey % 3 = 0 THEN 'C'
        |       WHEN l_orderkey % 3 = 1 THEN 'G'
        |       ELSE 'T' END AS alternateAllele,
        |  count(*) AS n_obs
        |FROM lineitem
        |GROUP BY 1, 2, 3, 4
        |HAVING count(*) >= 2""".stripMargin,

    // closed form of the full genotyping pipeline over the synthesized
    // reads: same Li-model likelihoods, same argmax/tie-break, same
    // top-2 genotype quality.
    "g2_genotype_calls" ->
      """WITH v AS (
        |  SELECT concat('chr', l_returnflag) AS contig, (l_partkey % 1000) AS blk,
        |         (l_partkey % 1000) * 20 + (l_suppkey % 10) AS vstart,
        |         CASE WHEN l_orderkey % 3 = 0 THEN 'C'
        |              WHEN l_orderkey % 3 = 1 THEN 'G' ELSE 'T' END AS valt
        |  FROM lineitem GROUP BY 1, 2, 3, 4 HAVING count(*) >= 2),
        |r AS (
        |  SELECT concat('chr', l_returnflag) AS contig, (l_partkey % 1000) AS blk,
        |         (l_partkey % 1000) * 20 + (l_suppkey % 10) AS rpos,
        |         CASE WHEN l_orderkey % 3 = 0 THEN 'C'
        |              WHEN l_orderkey % 3 = 1 THEN 'G' ELSE 'T' END AS ralt,
        |         1 - (1 - pow(10, -(30 + l_linenumber % 10)/10.0)) * (1 - pow(10, -6.0)) AS eps
        |  FROM lineitem),
        |p AS (
        |  SELECT v.contig, v.vstart, v.valt,
        |         CASE WHEN r.rpos = v.vstart AND r.ralt = v.valt THEN 2
        |              WHEN r.rpos = v.vstart THEN 0 ELSE 1 END AS support,
        |         r.eps
        |  FROM v JOIN r ON v.contig = r.contig AND v.blk = r.blk),
        |g AS (
        |  SELECT contig AS contigName, vstart, valt,
        |    sum(CASE WHEN support = 2 THEN ln(2*eps) - ln(2)
        |             ELSE ln(2*(1-eps)) - ln(2) END) AS gl0,
        |    sum(ln(eps + (1-eps)) - ln(2)) AS gl1,
        |    sum(CASE WHEN support = 2 THEN ln(2*(1-eps)) - ln(2)
        |             ELSE ln(2*eps) - ln(2) END) AS gl2,
        |    count(*)::INT AS readDepth,
        |    sum(CASE WHEN support = 1 THEN 1 ELSE 0 END)::INT AS referenceReadDepth,
        |    sum(CASE WHEN support = 2 THEN 1 ELSE 0 END)::INT AS alternateReadDepth,
        |    sum(CASE WHEN support = 0 THEN 1 ELSE 0 END)::INT AS otherReadDepth
        |  FROM p GROUP BY 1, 2, 3)
        |SELECT contigName, vstart AS start, 'A' AS referenceAllele,
        |  valt AS alternateAllele, 's1' AS sampleId,
        |  CASE WHEN gl0 >= gl1 AND gl0 >= gl2 THEN 0
        |       WHEN gl1 >= gl2 THEN 1 ELSE 2 END AS genotypeState,
        |  round(10/ln(10) * (greatest(gl0, gl1, gl2)
        |    - greatest(least(gl0, gl1), least(gl1, gl2), least(gl0, gl2))), 3) AS genotypeQuality,
        |  round(gl0, 3) AS gl_0, round(gl1, 3) AS gl_1, round(gl2, 3) AS gl_2,
        |  readDepth, referenceReadDepth, alternateReadDepth, otherReadDepth
        |FROM g""".stripMargin,

    // closed form of the realignment kernel on the anchorable subset:
    // the g3 corpus is md5-derived, so DuckDB reconstructs each read's
    // ref window, applies the same anchorability predicate as the query
    // (all 25 6-mers distinct, deletion edge and window tail
    // unambiguous), and derives the exact realigned CIGAR/MD —
    // span-preserving realignment of a 2-base deletion inside a fixed
    // 28-base window is 12M2D14M2I with MD 12^<deleted bases>14.
    "g3_realign" ->
      """WITH base AS (
        |  SELECT l_orderkey::VARCHAR || '-' || l_linenumber::VARCHAR AS readName,
        |         'chr' || l_returnflag AS contigName,
        |         (l_partkey % 1000) * 40 AS start,
        |         translate(substring(md5(l_orderkey::VARCHAR || '_' || l_linenumber::VARCHAR), 1, 30),
        |                   '0123456789abcdef', 'ACGTACGTACGTACGT') AS ref
        |  FROM lineitem)
        |SELECT readName, contigName, start,
        |       '12M2D14M2I' AS cigar,
        |       '12^' || substring(ref, 13, 2) || '14' AS mdTag
        |FROM base
        |WHERE substring(ref, 13, 1) <> substring(ref, 15, 1)
        |  AND substring(ref, 28, 1) <> substring(ref, 30, 1)
        |  AND len(list_distinct([substring(ref, i, 6) FOR i IN range(1, 26)])) = 25""".stripMargin,

    // closed form of genotyping per sample + cohort MAF + binomial-prior
    // recall (posterior_g = logC(2,g) + g ln maf + (2-g) ln(1-maf) + GL_g)
    "g4_joint_recall" ->
      """WITH v AS (
        |  SELECT concat('chr', l_returnflag) AS contig, (l_partkey % 1000) AS blk,
        |         (l_partkey % 1000) * 20 + (l_suppkey % 10) AS vstart,
        |         CASE WHEN l_orderkey % 3 = 0 THEN 'C'
        |              WHEN l_orderkey % 3 = 1 THEN 'G' ELSE 'T' END AS valt
        |  FROM lineitem GROUP BY 1, 2, 3, 4 HAVING count(*) >= 2),
        |r AS (
        |  SELECT concat('chr', l_returnflag) AS contig, (l_partkey % 1000) AS blk,
        |         (l_partkey % 1000) * 20 + (l_suppkey % 10) AS rpos,
        |         CASE WHEN l_orderkey % 3 = 0 THEN 'C'
        |              WHEN l_orderkey % 3 = 1 THEN 'G' ELSE 'T' END AS ralt,
        |         's' || l_linestatus AS sample,
        |         1 - (1 - pow(10, -(30 + l_linenumber % 10)/10.0)) * (1 - pow(10, -6.0)) AS eps
        |  FROM lineitem),
        |p AS (
        |  SELECT v.contig, v.vstart, v.valt, r.sample,
        |         CASE WHEN r.rpos = v.vstart AND r.ralt = v.valt THEN 2
        |              WHEN r.rpos = v.vstart THEN 0 ELSE 1 END AS support,
        |         r.eps
        |  FROM v JOIN r ON v.contig = r.contig AND v.blk = r.blk),
        |g AS (
        |  SELECT contig AS contigName, vstart, valt, sample,
        |    sum(CASE WHEN support = 2 THEN ln(2*eps) - ln(2)
        |             ELSE ln(2*(1-eps)) - ln(2) END) AS gl0,
        |    sum(ln(eps + (1-eps)) - ln(2)) AS gl1,
        |    sum(CASE WHEN support = 2 THEN ln(2*(1-eps)) - ln(2)
        |             ELSE ln(2*eps) - ln(2) END) AS gl2,
        |    count(*)::INT AS depth
        |  FROM p GROUP BY 1, 2, 3, 4),
        |st AS (
        |  SELECT *, CASE WHEN gl0 >= gl1 AND gl0 >= gl2 THEN 0
        |                 WHEN gl1 >= gl2 THEN 1 ELSE 2 END AS state
        |  FROM g),
        |j AS (
        |  SELECT *,
        |    sum(state) OVER w ::DOUBLE / (2 * count(*) OVER w) AS maf,
        |    (sum(depth) OVER w)::BIGINT AS siteDepth,
        |    count(*) OVER w AS siteSamples
        |  FROM st WINDOW w AS (PARTITION BY contigName, vstart, valt)),
        |q AS (
        |  SELECT *,
        |    CASE WHEN maf < 1 THEN 2*ln(1-maf) ELSE 0 END + gl0 AS p0,
        |    CASE WHEN maf < 1 THEN ln(2) + ln(maf) + ln(1-maf) ELSE 0 END + gl1 AS p1,
        |    CASE WHEN maf < 1 THEN 2*ln(maf) ELSE 0 END + gl2 AS p2
        |  FROM j WHERE maf > 0)
        |SELECT contigName, vstart AS start, 'A' AS referenceAllele,
        |  valt AS alternateAllele, sample AS sampleId,
        |  round(maf, 6) AS maf, state AS genotypeState,
        |  CASE WHEN p0 >= p1 AND p0 >= p2 THEN 0
        |       WHEN p1 >= p2 THEN 1 ELSE 2 END AS recalledState,
        |  round(10/ln(10) * (greatest(p0, p1, p2)
        |    - greatest(least(p0, p1), least(p1, p2), least(p0, p2))), 3) AS recalledQuality,
        |  siteDepth, siteSamples
        |FROM q""".stripMargin,

    // gVCF square-off + joint recall in closed form. Model notes:
    //  - every read in a (contig, blk) covers all 10 site offsets of the
    //    block, so coverage at a site == the sample's reads in the block;
    //  - per-sample discovery: (site, alt) with >= 2 observations IN THAT
    //    SAMPLE gets an exact call (support classified vs that alt);
    //  - fallback when the sample lacks the exact variant: if the sample
    //    called a DIFFERENT alt at the same position, square-off selects
    //    that row (min (ref, alt) on ties — deterministic rank); else the
    //    symbolic non-ref block row at the position (support = shows ref
    //    vs shows anything else); squared genotypeState is 0 either way;
    //  - joint recall = g4's binomial-MAF model over the squared matrix.
    "g6_gvcf_squareoff" ->
      """WITH r AS (
        |  SELECT concat('chr', l_returnflag) AS contig, (l_partkey % 1000) AS blk,
        |         (l_partkey % 1000) * 20 + (l_suppkey % 10) AS rpos,
        |         CASE WHEN l_orderkey % 3 = 0 THEN 'C'
        |              WHEN l_orderkey % 3 = 1 THEN 'G' ELSE 'T' END AS ralt,
        |         's' || l_linestatus AS sample,
        |         1 - (1 - pow(10, -(30 + l_linenumber % 10)/10.0)) * (1 - pow(10, -6.0)) AS eps
        |  FROM lineitem),
        |vs AS (
        |  SELECT contig, blk, rpos AS vstart, ralt AS valt, sample
        |  FROM r GROUP BY 1, 2, 3, 4, 5 HAVING count(*) >= 2),
        |v AS (SELECT DISTINCT contig, blk, vstart, valt FROM vs),
        |cov AS (SELECT DISTINCT contig, blk, sample FROM r),
        |pairs AS (
        |  SELECT v.contig, v.blk, v.vstart, v.valt, c.sample,
        |    EXISTS(SELECT 1 FROM vs WHERE vs.contig = v.contig AND vs.blk = v.blk
        |           AND vs.vstart = v.vstart AND vs.valt = v.valt
        |           AND vs.sample = c.sample) AS exact,
        |    (SELECT min(valt) FROM vs WHERE vs.contig = v.contig AND vs.blk = v.blk
        |           AND vs.vstart = v.vstart AND vs.sample = c.sample) AS own_alt
        |  FROM v JOIN cov c ON v.contig = c.contig AND v.blk = c.blk),
        |p AS (
        |  SELECT pr.contig, pr.vstart, pr.valt, pr.sample, pr.exact,
        |    CASE
        |      WHEN pr.exact AND r.rpos = pr.vstart AND r.ralt = pr.valt THEN 2
        |      WHEN NOT pr.exact AND pr.own_alt IS NOT NULL
        |           AND r.rpos = pr.vstart AND r.ralt = pr.own_alt THEN 2
        |      WHEN NOT pr.exact AND pr.own_alt IS NULL
        |           AND r.rpos = pr.vstart THEN 2
        |      WHEN r.rpos = pr.vstart THEN 0 ELSE 1 END AS support,
        |    r.eps
        |  FROM pairs pr JOIN r ON pr.contig = r.contig AND pr.blk = r.blk
        |    AND pr.sample = r.sample),
        |g AS (
        |  SELECT contig AS contigName, vstart, valt, sample, any_value(exact) AS exact,
        |    sum(CASE WHEN support = 2 THEN ln(2*eps) - ln(2)
        |             ELSE ln(2*(1-eps)) - ln(2) END) AS gl0,
        |    sum(ln(eps + (1-eps)) - ln(2)) AS gl1,
        |    sum(CASE WHEN support = 2 THEN ln(2*(1-eps)) - ln(2)
        |             ELSE ln(2*eps) - ln(2) END) AS gl2,
        |    count(*)::INT AS depth
        |  FROM p GROUP BY 1, 2, 3, 4),
        |st AS (
        |  SELECT *, CASE WHEN NOT exact THEN 0
        |                 WHEN gl0 >= gl1 AND gl0 >= gl2 THEN 0
        |                 WHEN gl1 >= gl2 THEN 1 ELSE 2 END AS state
        |  FROM g),
        |j AS (
        |  SELECT *,
        |    sum(state) OVER w ::DOUBLE / (2 * count(*) OVER w) AS maf,
        |    (sum(depth) OVER w)::BIGINT AS siteDepth,
        |    count(*) OVER w AS siteSamples
        |  FROM st WINDOW w AS (PARTITION BY contigName, vstart, valt)),
        |q AS (
        |  SELECT *,
        |    CASE WHEN maf < 1 THEN 2*ln(1-maf) ELSE 0 END + gl0 AS p0,
        |    CASE WHEN maf < 1 THEN ln(2) + ln(maf) + ln(1-maf) ELSE 0 END + gl1 AS p1,
        |    CASE WHEN maf < 1 THEN 2*ln(maf) ELSE 0 END + gl2 AS p2
        |  FROM j WHERE maf > 0)
        |SELECT contigName, vstart AS start, 'A' AS referenceAllele,
        |  valt AS alternateAllele, sample AS sampleId,
        |  round(maf, 6) AS maf, state AS genotypeState, exact AS exactCall,
        |  CASE WHEN p0 >= p1 AND p0 >= p2 THEN 0
        |       WHEN p1 >= p2 THEN 1 ELSE 2 END AS recalledState,
        |  round(10/ln(10) * (greatest(p0, p1, p2)
        |    - greatest(least(p0, p1), least(p1, p2), least(p0, p2))), 3) AS recalledQuality,
        |  siteDepth, siteSamples
        |FROM q""".stripMargin,

    "e3_embedding_dedup" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_dot_product(a.v, b.v)
        |    / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 4) AS cos_sim
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE list_dot_product(a.v, b.v)
        |    / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.35""".stripMargin,

    // IVF ANN: cells from nearest-of-8-centroids (vec_ids 1..8, ties to
    // lowest cid), probe the query's 2 nearest cells, exact cosine top-20
    "e4_ivf_topk" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id BETWEEN 1 AND 8),
        |s AS (SELECT e.vec_id, c.cid,
        |  row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |    list_dot_product(e.v, c.cv)
        |      / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))) DESC,
        |    c.cid) AS rn
        |  FROM e CROSS JOIN c),
        |cell AS (SELECT vec_id, cid AS cell FROM s WHERE rn = 1),
        |probe AS (SELECT cid FROM s WHERE vec_id = 0 AND rn <= 2),
        |q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
        |SELECT e.vec_id,
        |  round(list_dot_product(e.v, q.qv)
        |    / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))), 4) AS cos_sim
        |FROM e JOIN cell ON e.vec_id = cell.vec_id CROSS JOIN q
        |WHERE cell.cell IN (SELECT cid FROM probe)
        |ORDER BY list_dot_product(e.v, q.qv)
        |    / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))) DESC,
        |  e.vec_id
        |LIMIT 20""".stripMargin,

    // frame sampling: every 4th frame index, frame = its byte slice
    "m2_frame_sample" ->
      """WITH b AS (SELECT doc_id, text, length(text) AS n_bytes,
        |             length(text) % 16 AS n_frames FROM documents),
        |f AS (SELECT doc_id, text, n_bytes, n_frames,
        |        unnest(range(0, greatest(n_frames - 1, 0) + 1, 4)) AS frame_idx,
        |        greatest(n_bytes // greatest(n_frames, 1), 1) AS frame_size
        |      FROM b)
        |SELECT doc_id, frame_idx,
        |  md5(substring(text, (frame_idx * frame_size + 1)::INTEGER, frame_size::INTEGER)) AS frame_fp
        |FROM f""".stripMargin,

    // real MP4 frame table: the oracle carries the fixture writer's
    // closed-form TRUTH — n = 3 + id%5 frames, sizes 16 + (7id+3i)%17,
    // chunk base 212 + 4n (ftyp 16 + moov 188+4n + mdat header 8),
    // frame bytes 'a' + (31id+7i+p)%26 — so a green hash proves the
    // engine's stsz/stco parse read the container's own sample table
    "m7_mp4_frames" ->
      """WITH f AS (
        |  SELECT doc_id, 3 + doc_id % 5 AS n FROM documents),
        |fr AS (
        |  SELECT doc_id, n, unnest(range(0, n)) AS i FROM f),
        |sz AS (
        |  SELECT doc_id, n, i,
        |    16 + (doc_id * 7 + i * 3) % 17 AS frame_size,
        |    212 + 4 * n
        |      + coalesce(list_sum([16 + (doc_id * 7 + j * 3) % 17
        |                           FOR j IN range(0, i)]), 0) AS frame_off
        |  FROM fr)
        |SELECT doc_id,
        |  i::BIGINT AS frame_idx,
        |  frame_off::BIGINT AS frame_off,
        |  frame_size::BIGINT AS frame_size,
        |  md5(list_aggregate(
        |    [chr((97 + (doc_id * 31 + i * 7 + p) % 26)::INT)
        |     FOR p IN range(0, frame_size)], 'string_agg', '')) AS frame_fp
        |FROM sz""".stripMargin,

    // deterministic stratified sampling: the keep ticket is the md5-60bit
    // of the doc id mod 10000 (same SQL-reproducible trick as the LSH
    // family); class fractions 10%/50%/90% by length tercile
    "c2_sample_mix" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CASE WHEN len(regexp_extract_all(text, '\S+')) < 40 THEN 'short'
        |         WHEN len(regexp_extract_all(text, '\S+')) < 70 THEN 'medium'
        |         ELSE 'long' END AS cls,
        |    ('0x' || substring(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 10000 AS tk
        |  FROM documents)
        |SELECT doc_id, cls FROM d
        |WHERE tk < CASE cls WHEN 'short' THEN 1000
        |                    WHEN 'medium' THEN 5000 ELSE 9000 END""".stripMargin,

    // temperature mix: integer-scaled sqrt weights (floor(sqrt(n)*2^20))
    // keep every op IEEE correctly-rounded, so acceptance cutoffs are
    // bit-identical to the Spark plan regardless of summation order
    "c4_temperature_mix" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 16 < 9 THEN 's0' WHEN doc_id % 16 < 13 THEN 's1'
        |         WHEN doc_id % 16 < 15 THEN 's2' ELSE 's3' END AS src,
        |    ('0x' || substring(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 10000 AS tk
        |  FROM documents),
        |s AS (SELECT src, count(*) AS n,
        |             floor(sqrt(count(*)) * 1048576)::BIGINT AS w
        |      FROM d GROUP BY 1),
        |t AS (SELECT sum(n) AS nn, sum(w) AS z FROM s),
        |a AS (SELECT src,
        |        least(1.0, (floor(0.5 * nn)::BIGINT * w)::DOUBLE / (z * n)::DOUBLE) AS acc
        |      FROM s, t)
        |SELECT d.doc_id, d.src FROM d JOIN a USING (src)
        |WHERE d.tk < a.acc * 10000""".stripMargin,

    "t8_pii_redact" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    text || ' contact user' || doc_id::VARCHAR || '@example.com from 10.0.0.' ||
        |      (doc_id % 256)::VARCHAR || ' call ' || (doc_id + 5550000000)::VARCHAR AS pt
        |  FROM documents)
        |SELECT doc_id,
        |  len(regexp_extract_all(pt, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
        |  len(regexp_extract_all(pt, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ipv4,
        |  len(regexp_extract_all(pt, '\b\d{7,15}\b')) AS n_digit_runs,
        |  regexp_replace(regexp_replace(regexp_replace(pt,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |    '\b\d{7,15}\b', '<NUM>', 'g') AS redacted
        |FROM p""".stripMargin,

    "c5_domain_cap" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    regexp_extract(
        |      CASE WHEN doc_id % 3 = 0 THEN 'www.' WHEN doc_id % 3 = 1 THEN 'cdn.' ELSE '' END ||
        |      'site' || (doc_id % 50)::VARCHAR || '.' ||
        |      CASE WHEN doc_id % 4 = 0 THEN 'com' WHEN doc_id % 4 = 1 THEN 'org'
        |           WHEN doc_id % 4 = 2 THEN 'net' ELSE 'io' END,
        |      '([^.]+\.[^.]+)$', 1) AS domain,
        |    ('0x' || substring(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 10000 AS tk
        |  FROM documents)
        |SELECT doc_id, domain FROM d
        |QUALIFY row_number() OVER (PARTITION BY domain ORDER BY tk, doc_id) <= 3""".stripMargin,

    "t9_url_stats" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    'https://' ||
        |    CASE WHEN doc_id % 7 = 0 THEN 'crawler:pw@' ELSE '' END ||
        |    CASE WHEN doc_id % 3 = 0 THEN 'www.' WHEN doc_id % 3 = 1 THEN 'cdn.' ELSE '' END ||
        |    'site' || (doc_id % 50)::VARCHAR || '.' ||
        |    CASE WHEN doc_id % 4 = 0 THEN 'com' WHEN doc_id % 4 = 1 THEN 'org'
        |         WHEN doc_id % 4 = 2 THEN 'net' ELSE 'io' END ||
        |    CASE WHEN doc_id % 5 = 0 THEN ':8080' ELSE '' END ||
        |    '/p/' || doc_id::VARCHAR || '?q=x' AS url
        |  FROM documents),
        |d AS (
        |  SELECT doc_id,
        |    regexp_extract(url, '^[a-z][a-z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)', 1) AS host,
        |    regexp_extract(regexp_extract(url, '^[a-z][a-z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)', 1),
        |      '([^.]+\.[^.]+)$', 1) AS domain
        |  FROM u)
        |SELECT doc_id, host, domain, count(*) OVER (PARTITION BY domain) AS n_domain_docs
        |FROM d""".stripMargin,

    // exact percentiles: both engines interpolate lower + frac·(upper−lower)
    "t10_length_quantiles" ->
      """SELECT source, count(*)::BIGINT AS n_docs,
        |  round(quantile_cont(n_chars, 0.25), 4) AS p25,
        |  round(quantile_cont(n_chars, 0.5), 4) AS p50,
        |  round(quantile_cont(n_chars, 0.75), 4) AS p75,
        |  round(quantile_cont(n_chars, 0.9), 4) AS p90
        |FROM documents GROUP BY source""".stripMargin,

    // span-cut substring dedup: positional 13-grams (occurrence count
    // > 1 anywhere in the corpus), merged per doc via gaps-and-islands
    // (adjacent-or-overlapping spans fuse into one cut)
    "d8_dup_spans" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |occ AS (
        |  SELECT doc_id,
        |    unnest([{'s': i - 1, 'g': array_to_string(t[i:i+12], ' ')}
        |            FOR i IN range(1, len(t) - 11)], recursive := true)
        |  FROM tok WHERE len(t) >= 13),
        |dup AS (SELECT g FROM occ GROUP BY g HAVING count(*) > 1),
        |sp AS (SELECT o.doc_id, o.s AS st, o.s + 12 AS en FROM occ o JOIN dup USING (g)),
        |w AS (SELECT doc_id, st, en,
        |        max(en) OVER (PARTITION BY doc_id ORDER BY st
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
        |      FROM sp),
        |isl AS (SELECT doc_id, st, en,
        |        sum(CASE WHEN pm IS NULL OR st > pm + 1 THEN 1 ELSE 0 END)
        |          OVER (PARTITION BY doc_id ORDER BY st ROWS UNBOUNDED PRECEDING) AS island
        |        FROM w),
        |m AS (SELECT doc_id, island, min(st) AS s0, max(en) AS e1 FROM isl GROUP BY 1, 2),
        |pd AS (SELECT doc_id, count(*)::BIGINT AS n_spans,
        |         sum(e1 - s0 + 1)::BIGINT AS tokens_removed FROM m GROUP BY 1)
        |SELECT d.doc_id, len(string_split(d.text, ' '))::BIGINT AS n_tokens,
        |  coalesce(pd.n_spans, 0)::BIGINT AS n_spans,
        |  coalesce(pd.tokens_removed, 0)::BIGINT AS tokens_removed,
        |  (len(string_split(d.text, ' ')) - coalesce(pd.tokens_removed, 0))::BIGINT AS tokens_kept
        |FROM documents d LEFT JOIN pd USING (doc_id)""".stripMargin,

    // sequence packing: shard by md5(id) % 8, running token cumsum per
    // shard in id order, bin = start-offset // budget
    "c3_pack_sequences" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    ('0x' || substring(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 8 AS shard,
        |    len(regexp_extract_all(text, '\S+')) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, shard, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) AS cum
        |  FROM d)
        |SELECT doc_id, shard, n_tokens, ((cum - n_tokens) // 2048)::BIGINT AS bin
        |FROM c""".stripMargin,

    // composed cleaning pipeline: exact-dedup keepers -> contamination
    // cut (13-gram) -> quality gate -> language gate
    "c1_clean_corpus" ->
      """WITH keepx AS (
        |  SELECT doc_id, text FROM (
        |    SELECT doc_id, text, min(doc_id) OVER (PARTITION BY md5(text)) AS keep_id
        |    FROM documents) WHERE doc_id = keep_id),
        |tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT doc_id,
        |  unnest(list_distinct([array_to_string(t[i:i+12], ' ') FOR i IN range(1, len(t) - 11)])) AS g
        |  FROM tok WHERE len(t) >= 13),
        |vict AS (
        |  SELECT DISTINCT doc_id FROM (
        |    SELECT doc_id, min(doc_id) OVER (PARTITION BY g) AS kp,
        |           count(*) OVER (PARTITION BY g) AS df
        |    FROM sh) WHERE df > 1 AND doc_id != kp),
        |q AS (
        |  SELECT k.doc_id,
        |    len(regexp_extract_all(k.text, '\S+')) AS n_tokens,
        |    round(length(regexp_replace(k.text, '\s+', '', 'g'))::DOUBLE
        |      / len(regexp_extract_all(k.text, '\S+')), 4) AS avg_tok_len,
        |    round(len(list_filter(string_split(k.text, ' '), t -> t IN ('the','a','of')))::DOUBLE
        |      / len(regexp_extract_all(k.text, '\S+')), 4) AS stop_ratio,
        |    len(list_filter(string_split(k.text, ' '), t -> t = 'the')) AS c_en,
        |    len(list_filter(string_split(k.text, ' '), t -> t = 'der')) AS c_de,
        |    len(list_filter(string_split(k.text, ' '), t -> t = 'el')) AS c_es,
        |    len(list_filter(string_split(k.text, ' '), t -> t = 'le')) AS c_fr,
        |    len(list_filter(string_split(k.text, ' '), t -> t = '的')) AS c_zh
        |  FROM keepx k ANTI JOIN vict v ON k.doc_id = v.doc_id)
        |SELECT doc_id, n_tokens,
        |  CASE WHEN c_en >= c_de AND c_en >= c_es AND c_en >= c_fr AND c_en >= c_zh THEN 'en'
        |       WHEN c_de >= c_es AND c_de >= c_fr AND c_de >= c_zh THEN 'de'
        |       WHEN c_es >= c_fr AND c_es >= c_zh THEN 'es'
        |       WHEN c_fr >= c_zh THEN 'fr'
        |       ELSE 'zh' END AS pred_lang
        |FROM q
        |WHERE n_tokens >= 10 AND avg_tok_len >= 2.0 AND stop_ratio <= 0.15
        |  AND (CASE WHEN c_en >= c_de AND c_en >= c_es AND c_en >= c_fr AND c_en >= c_zh THEN 'en'
        |       WHEN c_de >= c_es AND c_de >= c_fr AND c_de >= c_zh THEN 'de'
        |       WHEN c_es >= c_fr AND c_es >= c_zh THEN 'es'
        |       WHEN c_fr >= c_zh THEN 'fr'
        |       ELSE 'zh' END) = 'en'""".stripMargin,

    // one Lloyd step: nearest-of-8-centroids assignment (as e4), then
    // the per-(cell, dimension) mean; parallel unnests zip positionally
    "e5_kmeans_step" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id BETWEEN 1 AND 8),
        |s AS (SELECT e.vec_id, c.cid,
        |  row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |    list_dot_product(e.v, c.cv)
        |      / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))) DESC,
        |    c.cid) AS rn
        |  FROM e CROSS JOIN c),
        |cell AS (SELECT vec_id, cid AS cell FROM s WHERE rn = 1),
        |x AS (SELECT cl.cell,
        |        unnest(range(1, len(e.v) + 1)) AS dim, unnest(e.v) AS x
        |      FROM e JOIN cell cl ON e.vec_id = cl.vec_id)
        |SELECT cell, dim, round(avg(x), 6) AS mean
        |FROM x GROUP BY cell, dim""".stripMargin,

    // duplicated 13-gram contamination report (grams distinct per doc)
    "d5_dup_ngrams" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT doc_id,
        |  unnest(list_distinct([array_to_string(t[i:i+12], ' ') FOR i IN range(1, len(t) - 11)])) AS g
        |  FROM tok WHERE len(t) >= 13)
        |SELECT md5(g) AS fp, count(*) AS df, min(doc_id) AS keep_id
        |FROM sh GROUP BY g HAVING count(*) > 1""".stripMargin,

    // benchmark decontamination: eval set = doc_id % 10 = 0; a corpus
    // doc survives iff it shares no 13-gram with any eval doc
    "d6_decontaminate" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT doc_id,
        |  unnest(list_distinct([array_to_string(t[i:i+12], ' ') FOR i IN range(1, len(t) - 11)])) AS g
        |  FROM tok WHERE len(t) >= 13),
        |bg AS (SELECT DISTINCT g FROM sh WHERE doc_id % 10 = 0),
        |bad AS (
        |  SELECT DISTINCT doc_id FROM sh
        |  WHERE doc_id % 10 <> 0 AND g IN (SELECT g FROM bg))
        |SELECT doc_id FROM documents
        |WHERE doc_id % 10 <> 0
        |  AND doc_id NOT IN (SELECT doc_id FROM bad)""".stripMargin,

    // d9 is d6 through the Bloom-probe plan: the exact-verify join makes
    // the output byte-identical, so the oracle is the same closed form.
    "d9_bloom_decontaminate" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT doc_id,
        |  unnest(list_distinct([array_to_string(t[i:i+12], ' ') FOR i IN range(1, len(t) - 11)])) AS g
        |  FROM tok WHERE len(t) >= 13),
        |bg AS (SELECT DISTINCT g FROM sh WHERE doc_id % 10 = 0),
        |bad AS (
        |  SELECT DISTINCT doc_id FROM sh
        |  WHERE doc_id % 10 <> 0 AND g IN (SELECT g FROM bg))
        |SELECT doc_id FROM documents
        |WHERE doc_id % 10 <> 0
        |  AND doc_id NOT IN (SELECT doc_id FROM bad)""".stripMargin,

    // composite quality gate: integer-arithmetic rules (no float mean at
    // a rule boundary), bit i of fail_mask = rule i failed
    "t11_quality_filter" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    coalesce(len(string_split(text, ' ')), 0)::BIGINT AS n,
        |    (coalesce(length(text), 0)
        |      - (coalesce(len(string_split(text, ' ')), 0) - 1))::BIGINT AS sum_len,
        |    coalesce(len(list_filter(string_split(text, ' '),
        |        t -> t IN ('the','a','of','and','to','in'))), 0)::BIGINT AS stop_n,
        |    coalesce(len(list_distinct(string_split(text, ' '))), 0)::BIGINT AS uniq_n,
        |    len(list_filter(string_split(text, ' '), t -> length(t) > 25)) > 0 AS mega
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, n,
        |    (n < 50) AS r_too_short,
        |    (n > 50000) AS r_too_long,
        |    (sum_len * 10 < n * 25 OR sum_len > n * 10) AS r_word_len,
        |    (stop_n * 100 < n * 2) AS r_low_stopword,
        |    (uniq_n * 100 < n * 30) AS r_repetitive,
        |    mega AS r_mega_word
        |  FROM s)
        |SELECT doc_id, n AS n_tokens,
        |  r_too_short, r_too_long, r_word_len, r_low_stopword, r_repetitive,
        |  r_mega_word,
        |  (CASE WHEN r_too_short THEN 1 ELSE 0 END
        |   + CASE WHEN r_too_long THEN 2 ELSE 0 END
        |   + CASE WHEN r_word_len THEN 4 ELSE 0 END
        |   + CASE WHEN r_low_stopword THEN 8 ELSE 0 END
        |   + CASE WHEN r_repetitive THEN 16 ELSE 0 END
        |   + CASE WHEN r_mega_word THEN 32 ELSE 0 END)::BIGINT AS fail_mask,
        |  NOT (r_too_short OR r_too_long OR r_word_len OR r_low_stopword
        |       OR r_repetitive OR r_mega_word) AS keep
        |FROM r""".stripMargin,

    // composed export: quality keep AND bits_per_token <= 4.95, then
    // the c6 manifest over the survivors (fragments shared with
    // t11/t12/c6's closed forms)
    "c9_prepare_shards" ->
      """WITH s AS (
        |  SELECT doc_id, text,
        |    coalesce(len(string_split(text, ' ')), 0)::BIGINT AS n,
        |    (coalesce(length(text), 0)
        |      - (coalesce(len(string_split(text, ' ')), 0) - 1))::BIGINT AS sum_len,
        |    coalesce(len(list_filter(string_split(text, ' '),
        |        t -> t IN ('the','a','of','and','to','in'))), 0)::BIGINT AS stop_n,
        |    coalesce(len(list_distinct(string_split(text, ' '))), 0)::BIGINT AS uniq_n,
        |    coalesce(len(list_filter(string_split(text, ' '),
        |        t -> length(t) > 25)) > 0, FALSE) AS mega
        |  FROM documents),
        |keep AS (
        |  SELECT doc_id, text FROM s
        |  WHERE NOT (n < 50 OR n > 50000
        |    OR (sum_len * 10 < n * 25 OR sum_len > n * 10)
        |    OR stop_n * 100 < n * 2 OR uniq_n * 100 < n * 30 OR mega)),
        |tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |cnt AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
        |tot AS (SELECT sum(c)::DOUBLE AS t FROM cnt),
        |ppl AS (
        |  SELECT doc_id,
        |    round(sum((ln(t) - ln(c::DOUBLE)) / ln(2.0)) / count(*), 4) AS bpt
        |  FROM tok JOIN cnt USING (w), tot GROUP BY doc_id),
        |surv AS (
        |  SELECT k.doc_id, k.text FROM keep k
        |  JOIN ppl USING (doc_id) WHERE ppl.bpt <= 4.95)
        |SELECT
        |  ('0x' || substring(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 16 AS shard,
        |  count(*)::BIGINT AS n_docs,
        |  sum(len(string_split(text, ' ')))::BIGINT AS n_tokens,
        |  sum(length(text))::BIGINT AS n_chars,
        |  bit_xor(('0x' || substring(md5(text), 1, 15))::BIGINT) AS content_fp
        |FROM surv GROUP BY 1""".stripMargin,

    // sliding-window chunking: starts 0,20,40,... while < n_tokens;
    // DuckDB slices are 1-based inclusive
    "c10_chunk_documents" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |st AS (SELECT doc_id, t, unnest(range(0, len(t), 20)) AS s FROM tok)
        |SELECT doc_id, (s / 20)::BIGINT AS chunk_idx,
        |  len(t[s + 1 : s + 40])::BIGINT AS n_tokens,
        |  array_to_string(t[s + 1 : s + 40], ' ') AS chunk_text
        |FROM st""".stripMargin,

    "t13_token_estimate" ->
      """SELECT doc_id,
        |  len(string_split(text, ' '))::BIGINT AS n_ws_tokens,
        |  len(regexp_extract_all(text, '\w+|[^\w\s]'))::BIGINT AS n_pieces,
        |  ((length(regexp_replace(text, '\s', '', 'g')) + 3) // 4)::BIGINT
        |    AS est_bpe_tokens
        |FROM documents""".stripMargin,

    // deterministic train/val/test split: md5 percent ticket, contiguous
    // ranges 0-89 / 90-94 / 95-99
    "c11_split_assign" ->
      """SELECT doc_id,
        |  CASE WHEN ('0x' || substring(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 100 < 90
        |         THEN 'train'
        |       WHEN ('0x' || substring(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 100 < 95
        |         THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents""".stripMargin,

    // fractional-epoch upsampling: floor(centi/100) copies + 1 iff the
    // SALTED ticket (md5 of "id:epoch") lands under the fractional part
    "c12_epoch_upsample" ->
      """WITH e AS (
        |  SELECT doc_id, lang,
        |    CASE lang WHEN 'en' THEN 230 WHEN 'zh' THEN 50 ELSE 100 END AS ec,
        |    ('0x' || substring(md5(doc_id::VARCHAR || ':epoch'), 1, 15))::BIGINT
        |      % 100 AS tk
        |  FROM documents),
        |n AS (
        |  SELECT doc_id, lang,
        |    ec // 100 + CASE WHEN tk < ec % 100 THEN 1 ELSE 0 END AS n FROM e)
        |SELECT doc_id, lang, unnest(generate_series(1, n))::BIGINT AS copy_idx
        |FROM n WHERE n >= 1""".stripMargin,

    // CDC upsert merge: the derived change batch (U on even ids v1, D on
    // %6 ids v2, I on %4==3 ids v1, re-U on %12==7 ids v2) collapsed to
    // latest-(version, op) winners, applied SCD-1 onto the %4!=3 base.
    // ev13 resolves the SAME snapshot through the streaming delta log.
    "c13_cdc_upsert" -> cdcUpsertSql,
    "ev13_stream_cdc_upsert" -> cdcUpsertSql,

    // time travel: the corpus AS OF version 1 = fold only the log
    // prefix version <= 1 over the base
    "c21_time_travel" -> cdcUpsertSqlUpTo(1),

    // log vacuum: an entry is removable iff it wins at NO retained
    // checkpoint (winner = max version <= chk per key); entries newer
    // than the newest retained checkpoint are always kept
    "c23_log_vacuum" -> vacuumSql,

    // z-order key: Morton interleave replayed per bit — the engine's
    // five-round mask-shift spread must equal the naive bit sum exactly
    "c22_zorder_layout" ->
      """SELECT event_id,
        |  list_sum([(((user_id % 1048576) >> i) & 1)::BIGINT << (2 * i)
        |            FOR i IN range(0, 31)])::BIGINT
        |  + list_sum([((floor(epoch_ms(ts) / 86400000.0)::BIGINT >> i) & 1)::BIGINT
        |              << (2 * i + 1) FOR i IN range(0, 31)])::BIGINT AS zval
        |FROM events""".stripMargin,

    // 3-D z-order key: the variadic interleave replayed per bit —
    // 21 bits per dimension, bit i of dim j lands at 3i + j
    "c24_zorder3_layout" ->
      """SELECT event_id,
        |  list_sum([(((user_id % 1048576) >> i) & 1)::BIGINT << (3 * i)
        |            FOR i IN range(0, 21)])::BIGINT
        |  + list_sum([((floor(epoch_ms(ts) / 86400000.0)::BIGINT >> i) & 1)::BIGINT
        |              << (3 * i + 1) FOR i IN range(0, 21)])::BIGINT
        |  + list_sum([((ascii(event_type)::BIGINT >> i) & 1)::BIGINT
        |              << (3 * i + 2) FOR i IN range(0, 21)])::BIGINT AS zval
        |FROM events""".stripMargin,

    // corpus timeline: snapshot stats per checkpoint version replayed
    // naively (full winner set + snapshot per version — the oracle may
    // be quadratic; the engine is log-sized + one base pass). fp is a
    // 40-bit md5 prefix so the sum stays far inside BIGINT.
    "c16_corpus_timeline" ->
      """WITH chks(chk) AS (VALUES (0), (1), (2)),
        |changes AS (
        |  SELECT doc_id, upper(text) AS text, n_chars, 'U' AS op, 1 AS version
        |  FROM documents WHERE doc_id % 2 = 0
        |  UNION ALL
        |  SELECT doc_id, text, n_chars, 'D', 2 FROM documents WHERE doc_id % 6 = 0
        |  UNION ALL
        |  SELECT doc_id, text, n_chars, 'I', 1 FROM documents WHERE doc_id % 4 = 3
        |  UNION ALL
        |  SELECT doc_id, text || ' v2', n_chars + 3, 'U', 2
        |  FROM documents WHERE doc_id % 12 = 7),
        |win AS (
        |  SELECT c.chk, ch.doc_id, ch.text, ch.n_chars, ch.op
        |  FROM chks c JOIN changes ch ON ch.version <= c.chk
        |  QUALIFY row_number() OVER (
        |    PARTITION BY c.chk, ch.doc_id ORDER BY ch.version DESC, ch.op DESC) = 1),
        |base AS (
        |  SELECT doc_id, n_chars,
        |    ('0x' || substring(md5(text), 1, 10))::BIGINT AS fp
        |  FROM documents WHERE doc_id % 4 <> 3),
        |snap AS (
        |  SELECT c.chk, b.n_chars::BIGINT AS n_chars, b.fp
        |  FROM chks c, base b
        |  WHERE NOT EXISTS (
        |    SELECT 1 FROM win w WHERE w.chk = c.chk AND w.doc_id = b.doc_id)
        |  UNION ALL
        |  SELECT chk, n_chars::BIGINT,
        |    ('0x' || substring(md5(text), 1, 10))::BIGINT
        |  FROM win WHERE op <> 'D')
        |SELECT chk::BIGINT AS version, count(*)::BIGINT AS n_docs,
        |  sum(n_chars)::BIGINT AS total_chars, sum(fp)::BIGINT AS fp_sum
        |FROM snap GROUP BY 1""".stripMargin,

    // streaming token-budget admission: arrival order == doc_id order
    // for the staged single-file stream, so the oracle is the id-order
    // cumsum per source with the crossing doc admitted
    "ev23_stream_budget_fill" ->
      """WITH d AS (
        |  SELECT source, doc_id,
        |    len(regexp_extract_all(text, '\S+'))::BIGINT AS n_tokens
        |  FROM documents),
        |o AS (
        |  SELECT source, doc_id, n_tokens,
        |    (sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id)
        |      - n_tokens)::BIGINT AS start_offset
        |  FROM d)
        |SELECT source, doc_id, n_tokens, start_offset
        |FROM o WHERE start_offset < 800""".stripMargin,

    // t-digest rank-error contract: the oracle carries the exact
    // interpolated quantile (t10 semantics) and asserts the digest's
    // achieved-rank interval lands within ±100 bp of q — the engine
    // computes the actual boolean; a >1% rank error hash-fails
    "t27_tdigest_quantiles" -> tdigestReportSql,

    // the streaming digest log resolves to the identical t27 report —
    // centroid bits are merge-order-dependent but the rank contract
    // (and the exact side) are not
    "ev28_stream_tdigest" -> tdigestReportSql,

    // PSI drift: replay the all-integer histBins on value cents per day
    // window, pool the reference, score (p-q)ln(p/q) with +1 smoothing
    // in exact 1e-8 units per term (the t21 associativity trick)
    "ev24_psi_drift" ->
      """WITH b AS (SELECT floor(epoch_ms(ts) / 86400000.0)::BIGINT AS scope,
        |    floor(value * 100)::BIGINT + 1 AS v FROM events),
        |e AS (SELECT scope, v, length(bin(v)) - 1 AS e FROM b),
        |s AS (SELECT scope, e, greatest(e - 3, 0) AS sh, v FROM e),
        |m AS (SELECT scope, e, sh, v >> sh AS m FROM s),
        |h AS (SELECT scope, e * 8 + (m % 8) AS bin, count(*)::BIGINT AS cnt
        |  FROM m GROUP BY 1, 2),
        |r AS (SELECT bin, sum(cnt)::BIGINT AS ref_cnt FROM h GROUP BY bin),
        |rt AS (SELECT sum(ref_cnt)::BIGINT AS n_ref, count(*)::BIGINT AS n_bins
        |  FROM r),
        |wt AS (SELECT scope, sum(cnt)::BIGINT AS n_win FROM h GROUP BY scope),
        |grid AS (SELECT wt.scope, wt.n_win, r.bin, r.ref_cnt, rt.n_ref,
        |    rt.n_bins, coalesce(h.cnt, 0)::BIGINT AS w_cnt
        |  FROM wt CROSS JOIN r CROSS JOIN rt
        |  LEFT JOIN h ON h.scope = wt.scope AND h.bin = r.bin),
        |t AS (SELECT scope, n_win,
        |    floor(((w_cnt + 1)::DOUBLE / (n_win + n_bins)::DOUBLE
        |         - (ref_cnt + 1)::DOUBLE / (n_ref + n_bins)::DOUBLE)
        |      * ln(((w_cnt + 1)::DOUBLE / (n_win + n_bins)::DOUBLE)
        |          / ((ref_cnt + 1)::DOUBLE / (n_ref + n_bins)::DOUBLE))
        |      * 1e8)::BIGINT AS t8
        |  FROM grid)
        |SELECT scope, n_win AS n_events,
        |  sum(t8)::BIGINT::DOUBLE / 1e8 AS psi
        |FROM t GROUP BY scope, n_win""".stripMargin,

    // band join: the oracle is the naive inequality cross join the
    // bucket rewrite must reproduce exactly
    "j11_band_join" ->
      """SELECT c_custkey, s_suppkey,
        |  floor(c_acctbal * 100)::BIGINT - floor(s_acctbal * 100)::BIGINT
        |    AS diff_cents
        |FROM customer CROSS JOIN supplier
        |WHERE abs(floor(c_acctbal * 100)::BIGINT
        |        - floor(s_acctbal * 100)::BIGINT) <= 1000""".stripMargin,

    // SCD-2: base rows open at version 0, each change closes its key's
    // previous interval; tombstones contribute only the closing edge
    "c19_scd2_history" ->
      """WITH ev AS (
        |  SELECT doc_id, text, lang, source, n_chars, 'I' AS op, 0 AS version
        |  FROM documents WHERE doc_id % 4 <> 3
        |  UNION ALL
        |  SELECT doc_id, upper(text), lang, source, n_chars, 'U', 1
        |  FROM documents WHERE doc_id % 2 = 0
        |  UNION ALL
        |  SELECT doc_id, text, lang, source, n_chars, 'D', 2
        |  FROM documents WHERE doc_id % 6 = 0
        |  UNION ALL
        |  SELECT doc_id, text, lang, source, n_chars, 'I', 1
        |  FROM documents WHERE doc_id % 4 = 3
        |  UNION ALL
        |  SELECT doc_id, text || ' v2', lang, source, n_chars + 3, 'U', 2
        |  FROM documents WHERE doc_id % 12 = 7),
        |iv AS (
        |  SELECT *, version::BIGINT AS valid_from,
        |    (lead(version) OVER (PARTITION BY doc_id ORDER BY version))::BIGINT
        |      AS valid_to
        |  FROM ev)
        |SELECT doc_id, text, lang, source, n_chars, valid_from, valid_to,
        |  (valid_to IS NULL) AS is_current
        |FROM iv WHERE op <> 'D'""".stripMargin,

    // the streaming bin log must resolve to the identical ev24 report
    // (bin counts add; PSI terms are exact 1e-8 integers)
    "ev25_stream_psi_drift" ->
      """WITH b AS (SELECT floor(epoch_ms(ts) / 86400000.0)::BIGINT AS scope,
        |    floor(value * 100)::BIGINT + 1 AS v FROM events),
        |e AS (SELECT scope, v, length(bin(v)) - 1 AS e FROM b),
        |s AS (SELECT scope, e, greatest(e - 3, 0) AS sh, v FROM e),
        |m AS (SELECT scope, e, sh, v >> sh AS m FROM s),
        |h AS (SELECT scope, e * 8 + (m % 8) AS bin, count(*)::BIGINT AS cnt
        |  FROM m GROUP BY 1, 2),
        |r AS (SELECT bin, sum(cnt)::BIGINT AS ref_cnt FROM h GROUP BY bin),
        |rt AS (SELECT sum(ref_cnt)::BIGINT AS n_ref, count(*)::BIGINT AS n_bins
        |  FROM r),
        |wt AS (SELECT scope, sum(cnt)::BIGINT AS n_win FROM h GROUP BY scope),
        |grid AS (SELECT wt.scope, wt.n_win, r.bin, r.ref_cnt, rt.n_ref,
        |    rt.n_bins, coalesce(h.cnt, 0)::BIGINT AS w_cnt
        |  FROM wt CROSS JOIN r CROSS JOIN rt
        |  LEFT JOIN h ON h.scope = wt.scope AND h.bin = r.bin),
        |t AS (SELECT scope, n_win,
        |    floor(((w_cnt + 1)::DOUBLE / (n_win + n_bins)::DOUBLE
        |         - (ref_cnt + 1)::DOUBLE / (n_ref + n_bins)::DOUBLE)
        |      * ln(((w_cnt + 1)::DOUBLE / (n_win + n_bins)::DOUBLE)
        |          / ((ref_cnt + 1)::DOUBLE / (n_ref + n_bins)::DOUBLE))
        |      * 1e8)::BIGINT AS t8
        |  FROM grid)
        |SELECT scope, n_win AS n_events,
        |  sum(t8)::BIGINT::DOUBLE / 1e8 AS psi
        |FROM t GROUP BY scope, n_win""".stripMargin,

    // energy-run audio segmentation: rebuild the closed-form PCM, frame
    // into full 16-sample windows, threshold at the file mean (exact
    // long arithmetic), gaps-and-islands into segments
    "m12_audio_segments" ->
      """WITH a AS (SELECT doc_id, 64 + doc_id % 33 AS n FROM documents),
        |s AS (SELECT doc_id, t.range AS t,
        |    (doc_id * 31 + t.range * 7) % 65536 - 32768 AS v
        |  FROM a CROSS JOIN range(0, 96) t WHERE t.range < (n // 16) * 16),
        |e AS (SELECT doc_id, t // 16 AS w, sum(v * v)::BIGINT AS energy
        |  FROM s GROUP BY 1, 2),
        |f AS (SELECT doc_id, w, energy,
        |    count(*) OVER (PARTITION BY doc_id) AS nw,
        |    sum(energy) OVER (PARTITION BY doc_id) AS tot
        |  FROM e),
        |act AS (SELECT doc_id, w, energy FROM f WHERE energy * nw > tot),
        |g AS (SELECT doc_id, w, energy,
        |    w - (row_number() OVER (PARTITION BY doc_id ORDER BY w) - 1) AS grp
        |  FROM act)
        |SELECT doc_id, min(w)::BIGINT AS seg_start, max(w)::BIGINT AS seg_end,
        |  count(*)::BIGINT AS n_windows, sum(energy)::BIGINT AS seg_energy
        |FROM g GROUP BY doc_id, grp""".stripMargin,

    // token-budget head-fill: the oracle is the naive full per-source
    // sort (priority desc, doc_id asc, keep start_offset < budget —
    // crossing doc kept); the engine's histogram-cutoff plan must pick
    // the identical set
    "c17_token_budget_fill" ->
      """WITH d AS (
        |  SELECT source AS stratum, doc_id, n_chars::BIGINT AS prio,
        |    len(regexp_extract_all(text, '\S+'))::BIGINT AS n_tokens
        |  FROM documents),
        |o AS (
        |  SELECT stratum, doc_id, prio, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY stratum
        |      ORDER BY prio DESC, doc_id) - n_tokens AS start
        |  FROM d)
        |SELECT stratum, doc_id, prio, n_tokens FROM o WHERE start < 800""".stripMargin,

    // DSIR importance resampling: hashed-unigram bucket multinomials
    // (target slice vs raw corpus, Laplace +1), per-bucket log-ratio
    // quantized ONCE to integer micro-nats (256 float ops total), then
    // exact integer per-doc sums and a tie-broken top-k
    "c18_dsir_resample" ->
      """WITH g AS (
        |  SELECT doc_id, source IN ('src0', 'src1', 'src2') AS is_tgt,
        |    ('0x' || substring(md5(gm), 1, 15))::BIGINT % 256 AS b
        |  FROM (SELECT doc_id, source,
        |          unnest(list_filter(string_split_regex(
        |            regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +'),
        |            t -> t <> '')) AS gm
        |        FROM documents)),
        |stats AS (
        |  SELECT b, count(*)::BIGINT AS raw_n,
        |    sum(CASE WHEN is_tgt THEN 1 ELSE 0 END)::BIGINT AS tgt_n
        |  FROM g GROUP BY 1),
        |tot AS (SELECT sum(raw_n)::BIGINT AS rtot, sum(tgt_n)::BIGINT AS ttot
        |        FROM stats),
        |lr AS (
        |  SELECT b, floor((ln(tgt_n + 1) - ln(ttot + 256) - ln(raw_n + 1)
        |    + ln(rtot + 256)) * 1e6 + 0.5)::BIGINT AS lr
        |  FROM stats, tot)
        |SELECT doc_id, sum(lr)::BIGINT AS dsir_score
        |FROM g JOIN lr USING (b)
        |GROUP BY 1 ORDER BY dsir_score DESC, doc_id LIMIT 200""".stripMargin,

    // BPE merge training: 3 chained stages, each = adjacent-pair count
    // over parenthesized token seqs, argmax (n DESC, pair ASC), replace.
    "t25_bpe_train" -> bpeTrainSql,

    // BPE tokenization with the t25-trained merges: per-doc word and
    // token totals via the distinct-word token-count lookup.
    "t26_bpe_tokenize" -> bpeTokenizeSql,

    // streaming ingest quality gate: c1's per-document gates + lang tag,
    // stateless -> plain batch SQL (no dedup/contamination legs)
    "ev14_stream_quality_gate" ->
      """WITH q AS (
        |  SELECT doc_id,
        |    len(regexp_extract_all(text, '\S+')) AS n_tokens,
        |    round(length(regexp_replace(text, '\s+', '', 'g'))::DOUBLE
        |      / len(regexp_extract_all(text, '\S+')), 4) AS avg_tok_len,
        |    round(len(list_filter(string_split(text, ' '), t -> t IN ('the','a','of')))::DOUBLE
        |      / len(regexp_extract_all(text, '\S+')), 4) AS stop_ratio,
        |    len(list_filter(string_split(text, ' '), t -> t = 'the')) AS c_en,
        |    len(list_filter(string_split(text, ' '), t -> t = 'der')) AS c_de,
        |    len(list_filter(string_split(text, ' '), t -> t = 'el')) AS c_es,
        |    len(list_filter(string_split(text, ' '), t -> t = 'le')) AS c_fr,
        |    len(list_filter(string_split(text, ' '), t -> t = '的')) AS c_zh
        |  FROM documents)
        |SELECT doc_id, n_tokens,
        |  CASE WHEN c_en >= c_de AND c_en >= c_es AND c_en >= c_fr AND c_en >= c_zh THEN 'en'
        |       WHEN c_de >= c_es AND c_de >= c_fr AND c_de >= c_zh THEN 'de'
        |       WHEN c_es >= c_fr AND c_es >= c_zh THEN 'es'
        |       WHEN c_fr >= c_zh THEN 'fr'
        |       ELSE 'zh' END AS pred_lang
        |FROM q
        |WHERE n_tokens >= 10 AND avg_tok_len >= 2.0 AND stop_ratio <= 0.15""".stripMargin,

    // subword MaxMatch tokenization: corpus-derived top-200 piece vocab
    // (length 2..4, occurrence-weighted, total order n desc/piece asc),
    // greedy longest-match walked per distinct word via a recursive CTE
    // over the per-position jump table, then doc totals from (doc, word)
    // counts. Mirrors TextAnalysis.subwordTokenize exactly.
    "t16_subword_tokenize" ->
      """WITH RECURSIVE dw AS (
        |  SELECT doc_id, w, count(*) AS cnt FROM (
        |    SELECT doc_id,
        |      unnest(string_split_regex(
        |        regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +')) AS w
        |    FROM documents) t
        |  WHERE w <> '' GROUP BY doc_id, w),
        |wc AS (SELECT w, sum(cnt)::BIGINT AS wc FROM dw GROUP BY w),
        |pos AS (
        |  SELECT w, wc, unnest(generate_series(1, length(w) - l + 1)) AS i, l
        |  FROM wc, (VALUES (2), (3), (4)) AS ls(l)
        |  WHERE length(w) >= l),
        |vocab AS (
        |  SELECT substr(w, i, l) AS piece, sum(wc) AS n
        |  FROM pos GROUP BY 1 ORDER BY n DESC, piece LIMIT 200),
        |apos AS (
        |  SELECT w, unnest(generate_series(1, length(w))) AS i FROM wc),
        |jumps AS (
        |  SELECT a.w, a.i, coalesce(max(length(v.piece)), 1) AS l
        |  FROM apos a LEFT JOIN vocab v
        |    ON v.piece IN (substr(a.w, a.i, 2), substr(a.w, a.i, 3),
        |                   substr(a.w, a.i, 4))
        |  GROUP BY a.w, a.i),
        |steps AS (
        |  SELECT w, 1 AS p, 0 AS n FROM wc
        |  UNION ALL
        |  SELECT s.w, s.p + j.l, s.n + 1
        |  FROM steps s JOIN jumps j ON j.w = s.w AND j.i = s.p
        |  WHERE s.p <= length(s.w)),
        |ntok AS (SELECT w, max(n) AS nt FROM steps WHERE p > length(w) GROUP BY w)
        |SELECT dw.doc_id, sum(dw.cnt)::BIGINT AS n_words,
        |  sum(dw.cnt * ntok.nt)::BIGINT AS n_subwords
        |FROM dw JOIN ntok USING (w) GROUP BY dw.doc_id""".stripMargin,

    // corpus snapshot diff: base vs the c13-merged snapshot recovers the
    // applied changes (added/removed/modified by md5 fingerprint)
    "c14_snapshot_diff" -> (
      """WITH o AS (SELECT doc_id, md5(text) AS old_fp
        |           FROM documents WHERE doc_id % 4 <> 3),
        |n AS (SELECT doc_id, md5(text) AS new_fp FROM (
        |""".stripMargin + cdcUpsertSql + """
        |) s)
        |SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
        |  CASE WHEN o.doc_id IS NULL THEN 'added'
        |       WHEN n.doc_id IS NULL THEN 'removed'
        |       WHEN old_fp <> new_fp THEN 'modified' END AS status,
        |  old_fp, new_fp
        |FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
        |WHERE o.doc_id IS NULL OR n.doc_id IS NULL OR old_fp <> new_fp""".stripMargin),

    // first BPE merge statistics: word-frequency-weighted adjacent char
    // pairs over the distinct vocabulary, top 30 (total order: n desc, pair)
    "t14_bpe_pairs" ->
      """WITH words AS (
        |  SELECT w, count(*)::BIGINT AS wc FROM (
        |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE length(w) >= 2 GROUP BY 1),
        |pairs AS (
        |  SELECT substring(w, i, 2) AS pair, wc
        |  FROM (SELECT w, wc, unnest(generate_series(1, length(w) - 1)) AS i
        |        FROM words))
        |SELECT pair, sum(wc)::BIGINT AS n FROM pairs GROUP BY 1
        |ORDER BY n DESC, pair LIMIT 30""".stripMargin,

    // quality-classifier inference: integer-exact hashed-ngram feature
    // sum (md5-60bit bucket -> closed-form weight), so the sigmoid's
    // operand is bit-identical across engines
    "t15_quality_classifier" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(
        |      regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +'),
        |      t -> t <> '') AS ts
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id, ts || CASE WHEN len(ts) >= 2
        |      THEN list_transform(range(1, len(ts)), i -> ts[i] || '_' || ts[i+1])
        |      ELSE []::VARCHAR[] END AS gs
        |  FROM toks),
        |scored AS (
        |  SELECT doc_id, len(gs)::BIGINT AS n_features,
        |    coalesce(list_sum(list_transform(gs, g ->
        |      ((('0x' || substring(md5(g), 1, 15))::BIGINT % 1024)
        |        * 2654435761) % 2001 - 1000)), 0)::BIGINT AS z
        |  FROM grams)
        |SELECT doc_id, n_features,
        |  round(1/(1 + exp(-(z/4000.0 + (-0.1)))), 6) AS score,
        |  (z >= 400) AS keep
        |FROM scored""".stripMargin,

    // salted join == plain join: the salt is an internal spreading
    // device, so the closed form is the unsalted aggregation
    // the bucketed layout is invisible to the contract: plain join
    "j9_bucketed_join" ->
      """SELECT o_orderpriority, count(*) AS n_lines,
        |  round(sum(round(l_extendedprice * 100)::BIGINT
        |            * (100 - round(l_discount * 100)::BIGINT))::BIGINT
        |        / 10000.0, 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1""".stripMargin,

    // the naive quadratic contract the filter-verify plan reproduces
    "j10_fuzzy_join" ->
      """SELECT a.s_suppkey AS a_key, b.s_suppkey AS b_key,
        |  levenshtein(a.s_name, b.s_name)::INT AS dist
        |FROM supplier a JOIN supplier b ON a.s_suppkey < b.s_suppkey
        |WHERE abs(length(a.s_name) - length(b.s_name)) <= 1
        |  AND levenshtein(a.s_name, b.s_name) <= 1""".stripMargin,

    "j7_salted_join" ->
      """SELECT c.c_mktsegment,
        |  count(*) AS n, round(sum(e.value), 2) AS sum_value
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY 1""".stripMargin,

    // deterministic md5-ticket sharding + order-independent xor manifest
    "c6_shard_manifest" ->
      """SELECT
        |  ('0x' || substring(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 16 AS shard,
        |  count(*)::BIGINT AS n_docs,
        |  sum(len(string_split(text, ' ')))::BIGINT AS n_tokens,
        |  sum(length(text))::BIGINT AS n_chars,
        |  bit_xor(('0x' || substring(md5(text), 1, 15))::BIGINT) AS content_fp
        |FROM documents GROUP BY 1""".stripMargin,

    // streaming ingest dedup: surviving fingerprints = batch-distinct
    // minus the history set (keeper identity is arrival order in the
    // stream, so the oracle compares the deterministic fp set)
    "ev10_stream_incremental_dedup" ->
      """SELECT DISTINCT md5(text) AS fp FROM documents
        |WHERE doc_id % 3 <> 0
        |  AND md5(text) NOT IN (
        |    SELECT md5(text) FROM documents WHERE doc_id % 3 = 0)""".stripMargin,

    // incremental dedup: batch keeper (min id per md5) anti-joined
    // against the history fingerprint set
    "d10_incremental_dedup" ->
      """WITH hist AS (
        |  SELECT DISTINCT md5(text) AS fp FROM documents WHERE doc_id % 3 = 0),
        |batch AS (
        |  SELECT doc_id, md5(text) AS fp FROM documents WHERE doc_id % 3 <> 0),
        |keepers AS (SELECT fp, min(doc_id) AS doc_id FROM batch GROUP BY fp)
        |SELECT doc_id FROM keepers
        |WHERE fp NOT IN (SELECT fp FROM hist)""".stripMargin,

    "d11_incremental_minhash" -> d11Sql,
    // streaming near-dup ingest: index-absorbs-all-seen makes the
    // survivor set batch-boundary invariant == d11's rule exactly
    "ev11_stream_neardup" -> d11Sql,
    "d12_cluster_keepers" -> d12Sql,

    // SemDeDup dominance prune: cell = nearest of centroids 1..8 (max
    // cosine, ties to lowest cid — identical float fold order both
    // engines), pruned iff an ε-neighbor in the same cell has lower
    // cosine-to-centroid (ties to lower id)
    "d13_semantic_prune" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id BETWEEN 1 AND 8),
        |s AS (SELECT e.vec_id,
        |  c.cid,
        |  list_dot_product(e.v, c.cv)
        |    / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))) AS cos,
        |  row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |    list_dot_product(e.v, c.cv)
        |      / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))) DESC,
        |    c.cid) AS rn
        |  FROM e CROSS JOIN c),
        |cell AS (SELECT vec_id, cid AS cell, cos AS c2c FROM s WHERE rn = 1),
        |pr AS (SELECT DISTINCT a.vec_id
        |  FROM cell a JOIN cell b ON a.cell = b.cell
        |  JOIN e ea ON ea.vec_id = a.vec_id
        |  JOIN e eb ON eb.vec_id = b.vec_id
        |  WHERE (b.c2c < a.c2c OR (b.c2c = a.c2c AND b.vec_id < a.vec_id))
        |    AND list_dot_product(ea.v, eb.v)
        |      / (sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(eb.v, eb.v)))
        |      >= 0.35)
        |SELECT cell.vec_id, cell.cell, round(c2c, 4) AS c2c,
        |  (CASE WHEN cell.vec_id IN (SELECT vec_id FROM pr) THEN 0 ELSE 1 END)::BIGINT AS kept
        |FROM cell""".stripMargin,

    // per-doc benchmark-gram hit fraction, basis points by integer floor
    "d14_contamination_score" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT doc_id,
        |  unnest(list_distinct([array_to_string(t[i:i+12], ' ') FOR i IN range(1, len(t) - 11)])) AS g
        |  FROM tok WHERE len(t) >= 13),
        |bg AS (SELECT DISTINCT g FROM sh WHERE doc_id % 10 = 0)
        |SELECT s.doc_id, count(*)::BIGINT AS n_grams,
        |  count(bg.g)::BIGINT AS n_hit,
        |  ((count(bg.g) * 10000) // count(*))::BIGINT AS frac_bp
        |FROM sh s LEFT JOIN bg ON s.g = bg.g
        |WHERE s.doc_id % 10 <> 0
        |GROUP BY s.doc_id""".stripMargin,

    // corpus unigram LM cross-entropy; log-sum order differs between
    // engines by ~1e-13, absorbed by round(4)
    "t12_lm_perplexity" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |cnt AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
        |tot AS (SELECT sum(c)::DOUBLE AS t FROM cnt)
        |SELECT doc_id, count(*)::BIGINT AS n_tokens,
        |  round(sum((ln(t) - ln(c::DOUBLE)) / ln(2.0)) / count(*), 4)
        |    AS bits_per_token
        |FROM tok JOIN cnt USING (w), tot
        |GROUP BY doc_id""".stripMargin,

    // bloom-pruned join: the sketch only prunes the probe-side
    // exchange; false positives die in the join, so the oracle is the
    // plain join (sum over integer-valued doubles is exact, cast BIGINT)
    "j8_bloom_pruned_join" ->
      """SELECT o_orderkey, count(*)::BIGINT AS n_lines,
        |  sum(l_quantity)::BIGINT AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY o_orderkey""".stripMargin,

    // streaming windowed CMS: counter addition is associative, so the
    // resolved log == the batch matrix per window; replay the whole
    // pipeline per hour window, top-5 users on (est desc, user) order
    "ev20_stream_heavy_hitters" ->
      s"""WITH e AS (SELECT (epoch_ns(ts) // 3600000000000) * 3600 AS w, user_id FROM events),
        |ex AS (SELECT w, user_id, count(*) AS exact_cnt FROM e GROUP BY w, user_id),
        |fan AS (SELECT w, user_id, exact_cnt, r,
        |    ('0x' || substring(md5(r::VARCHAR || ' ' || user_id), 1, 15))::BIGINT % 512 AS idx
        |  FROM ex, range(4) t(r)),
        |cnt AS (SELECT w, r, idx, sum(exact_cnt)::BIGINT AS c FROM fan GROUP BY w, r, idx),
        |est AS (SELECT f.w, f.user_id, f.exact_cnt, min(c.c) AS est
        |  FROM fan f JOIN cnt c ON f.w = c.w AND f.r = c.r AND f.idx = c.idx
        |  GROUP BY f.w, f.user_id, f.exact_cnt),
        |rk AS (SELECT *, row_number() OVER (PARTITION BY w ORDER BY est DESC, user_id) AS rn
        |  FROM est)
        |SELECT w::BIGINT AS window_start, user_id, est::BIGINT AS est_cnt,
        |  exact_cnt::BIGINT AS exact_cnt,
        |  ((est - exact_cnt) * 10000 // exact_cnt)::BIGINT AS err_bp
        |FROM rk WHERE rn <= 5""".stripMargin,

    // cross-source shingle-overlap matrix: distinct (source, 3-gram)
    // index, pair join on the gram key, exact Jaccard in integer bp;
    // every choose-2 source pair reports, disjoint pairs as 0. Grams
    // are counted as their 60-bit md5 hashes — the Spark plan's
    // distinct and self-join exchanges carry (src, 8-byte long), and
    // this SQL hashes identically, so the report is bit-identical
    // (the t23 distinct-hash convention; collisions n²/2⁶¹ ≪ 1).
    "d18_source_overlap" ->
      s"""WITH tok AS (SELECT source, string_split(text, ' ') AS t FROM documents),
        |sh0 AS (SELECT source AS src, unnest(list_distinct(
        |    [t[i] || ' ' || t[i+1] || ' ' || t[i+2] FOR i IN range(1, len(t) - 1)])) AS gs
        |  FROM tok WHERE len(t) >= 3),
        |sh AS (SELECT DISTINCT src, ${h60("gs")} AS g FROM sh0),
        |sz AS (SELECT src, count(*) AS n FROM sh GROUP BY src),
        |pr AS (SELECT a.src AS src_a, b.src AS src_b, count(*) AS common
        |  FROM sh a JOIN sh b ON a.g = b.g AND a.src < b.src
        |  GROUP BY a.src, b.src),
        |ap AS (SELECT sa.src AS src_a, sb.src AS src_b, sa.n AS na, sb.n AS nb
        |  FROM sz sa JOIN sz sb ON sa.src < sb.src)
        |SELECT ap.src_a, ap.src_b, coalesce(pr.common, 0)::BIGINT AS common,
        |  (coalesce(pr.common, 0) * 10000 // (na + nb - coalesce(pr.common, 0)))::BIGINT
        |    AS jaccard_bp
        |FROM ap LEFT JOIN pr ON ap.src_a = pr.src_a AND ap.src_b = pr.src_b""".stripMargin,

    // the streaming bin log must resolve to the identical t22 report
    "ev22_stream_hist_quantiles" ->
      """WITH b AS (SELECT source AS scope, n_chars + 1 AS v FROM documents),
        |e AS (SELECT scope, v, length(bin(v)) - 1 AS e FROM b),
        |s AS (SELECT scope, e, greatest(e - 3, 0) AS sh, v FROM e),
        |m AS (SELECT scope, e, sh, v >> sh AS m FROM s),
        |h0 AS (SELECT scope, e * 8 + (m % 8) AS bin, ((m + 1) << sh) - 2 AS edge,
        |    count(*) AS cnt
        |  FROM m GROUP BY 1, 2, 3),
        |hall AS (SELECT '__all' AS scope, bin, edge, sum(cnt) AS cnt
        |  FROM h0 GROUP BY bin, edge),
        |h AS (SELECT * FROM h0 UNION ALL SELECT * FROM hall),
        |c AS (SELECT scope, bin, edge, cnt,
        |    sum(cnt) OVER (PARTITION BY scope ORDER BY bin) AS cum,
        |    sum(cnt) OVER (PARTITION BY scope) AS n
        |  FROM h),
        |q AS (SELECT unnest([10, 50, 90, 99]) AS q_pct),
        |hit AS (SELECT scope, q_pct, min(bin) AS bin FROM c, q
        |  WHERE cum * 100 >= q_pct * n GROUP BY scope, q_pct)
        |SELECT hit.scope, hit.q_pct::BIGINT AS q_pct, c.edge::BIGINT AS est_value,
        |  (c.cum * 10000 // c.n)::BIGINT AS rank_bp,
        |  (c.cum * 10000 // c.n - hit.q_pct * 100)::BIGINT AS err_bp
        |FROM hit JOIN c ON hit.scope = c.scope AND hit.bin = c.bin""".stripMargin,

    // log-histogram quantile sketch: all-integer octave/mantissa bins
    // (binary-string length = the HLL-rho trick, so no libm
    // discretization can disagree across engines), '__all' = bin-count
    // merge, estimates as inclusive bin upper edges with achieved rank
    "t22_hist_quantiles" ->
      """WITH b AS (SELECT source AS scope, n_chars + 1 AS v FROM documents),
        |e AS (SELECT scope, v, length(bin(v)) - 1 AS e FROM b),
        |s AS (SELECT scope, e, greatest(e - 3, 0) AS sh, v FROM e),
        |m AS (SELECT scope, e, sh, v >> sh AS m FROM s),
        |h0 AS (SELECT scope, e * 8 + (m % 8) AS bin, ((m + 1) << sh) - 2 AS edge,
        |    count(*) AS cnt
        |  FROM m GROUP BY 1, 2, 3),
        |hall AS (SELECT '__all' AS scope, bin, edge, sum(cnt) AS cnt
        |  FROM h0 GROUP BY bin, edge),
        |h AS (SELECT * FROM h0 UNION ALL SELECT * FROM hall),
        |c AS (SELECT scope, bin, edge, cnt,
        |    sum(cnt) OVER (PARTITION BY scope ORDER BY bin) AS cum,
        |    sum(cnt) OVER (PARTITION BY scope) AS n
        |  FROM h),
        |q AS (SELECT unnest([10, 50, 90, 99]) AS q_pct),
        |hit AS (SELECT scope, q_pct, min(bin) AS bin FROM c, q
        |  WHERE cum * 100 >= q_pct * n GROUP BY scope, q_pct)
        |SELECT hit.scope, hit.q_pct::BIGINT AS q_pct, c.edge::BIGINT AS est_value,
        |  (c.cum * 10000 // c.n)::BIGINT AS rank_bp,
        |  (c.cum * 10000 // c.n - hit.q_pct * 100)::BIGINT AS err_bp
        |FROM hit JOIN c ON hit.scope = c.scope AND hit.bin = c.bin""".stripMargin,

    // Efraimidis-Spirakis weighted sample: u = (h60+1)/2^60 in (0,1],
    // key = ln(u)/w, top-50 per stratum on (key desc, doc_id) — the
    // oracle ranks with a window; the engine uses a bounded typed agg
    "c15_weighted_sample" ->
      """WITH k AS (SELECT source AS stratum, doc_id,
        |    ln((('0x' || substring(md5(doc_id::VARCHAR), 1, 15))::BIGINT + 1)::DOUBLE
        |        / 1152921504606846976.0) / n_chars::DOUBLE AS es
        |  FROM documents),
        |r AS (SELECT stratum, doc_id, es,
        |    row_number() OVER (PARTITION BY stratum ORDER BY es DESC, doc_id) AS rn
        |  FROM k)
        |SELECT stratum, doc_id, round(es, 6) AS es_key FROM r WHERE rn <= 50""".stripMargin,

    // BM25: per-term contributions in explicitly-ordered double math
    // (every int operand cast before the float op, token-for-token with
    // the Spark expression), fixed to integer 1e-4 units per term so
    // the per-doc sum is associative
    "t21_bm25_topk" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tk AS (SELECT doc_id, term FROM toks WHERE term <> ''),
        |dl AS (SELECT doc_id, count(*) AS dl FROM tk GROUP BY doc_id),
        |stats AS (SELECT count(*) AS nd, sum(dl)::BIGINT AS sl FROM dl),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tk
        |  WHERE term IN ('spark', 'dup', 'window') GROUP BY doc_id, term),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |c AS (SELECT tf.doc_id,
        |    ln(((nd - df)::DOUBLE + 0.5) / (df::DOUBLE + 0.5) + 1.0) AS idf,
        |    (tf::DOUBLE * 2.2) / (tf::DOUBLE + 1.2 *
        |      (0.25 + 0.75 * (dl::DOUBLE / (sl::DOUBLE / nd::DOUBLE)))) AS tfp
        |  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id), stats),
        |s AS (SELECT doc_id, round(idf * tfp * 10000, 0)::BIGINT AS c10k FROM c)
        |SELECT doc_id, sum(c10k)::BIGINT AS score_x10k, count(*)::BIGINT AS n_hit
        |FROM s GROUP BY doc_id
        |ORDER BY score_x10k DESC, doc_id LIMIT 20""".stripMargin,

    // cohort retention: epoch_ns floor-div week buckets (ts is always
    // positive, so // matches Spark's div), offset-0 rows are the
    // cohort denominators
    "ev17_retention_cohorts" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) // 604800000000000 AS wk FROM events),
        |coh AS (SELECT user_id, min(wk) AS cohort_week FROM e GROUP BY user_id),
        |act AS (SELECT DISTINCT user_id, wk FROM e),
        |tri AS (SELECT cohort_week, wk - cohort_week AS week_offset,
        |    count(*) AS n FROM act JOIN coh USING (user_id)
        |  GROUP BY cohort_week, wk - cohort_week),
        |base AS (SELECT cohort_week, n AS b FROM tri WHERE week_offset = 0)
        |SELECT t.cohort_week::BIGINT AS cohort_week,
        |  t.week_offset::BIGINT AS week_offset, t.n::BIGINT AS n_users,
        |  (t.n * 10000 // b.b)::BIGINT AS retention_bp
        |FROM tri t JOIN base b USING (cohort_week)""".stripMargin,

    // the streaming activity log must resolve to the identical triangle
    "ev21_stream_retention" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) // 604800000000000 AS wk FROM events),
        |coh AS (SELECT user_id, min(wk) AS cohort_week FROM e GROUP BY user_id),
        |act AS (SELECT DISTINCT user_id, wk FROM e),
        |tri AS (SELECT cohort_week, wk - cohort_week AS week_offset,
        |    count(*) AS n FROM act JOIN coh USING (user_id)
        |  GROUP BY cohort_week, wk - cohort_week),
        |base AS (SELECT cohort_week, n AS b FROM tri WHERE week_offset = 0)
        |SELECT t.cohort_week::BIGINT AS cohort_week,
        |  t.week_offset::BIGINT AS week_offset, t.n::BIGINT AS n_users,
        |  (t.n * 10000 // b.b)::BIGINT AS retention_bp
        |FROM tri t JOIN base b USING (cohort_week)""".stripMargin,

    // strict-subsequence funnel: per step, the earliest (ts, event_id)
    // strictly after the matched previous step (tuple comparison); a
    // step nobody reaches emits no row (matching the Spark side's
    // empty groupBy)
    "ev16_user_funnel" -> funnelSql,
    // the streaming matcher must land on the identical report
    "ev18_stream_funnel" -> funnelSql,
    // 7-day conversion window between consecutive matched steps
    "ev19_windowed_funnel" -> funnelSqlWithGap(Some(604800000000000L)),

    // interpolated bigram LM: parallel unnests zip positionally, so the
    // (prev, w) pair stream is the same the Spark UDF kernel emits;
    // every observed bigram self-scores, so the bigram legs left-join
    // but only doc-initial rows fall to the unigram branch. Per-token
    // -log2(p) fixed to integer 1e-4 bit units before the per-doc sum
    // (long sums are associative; double sums are not)
    "t19_bigram_ppl" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |pr AS (SELECT doc_id,
        |    unnest([CASE WHEN i > 1 THEN ts[i-1] END FOR i IN range(1, len(ts) + 1)]) AS prev,
        |    unnest([ts[i] FOR i IN range(1, len(ts) + 1)]) AS w
        |  FROM tok),
        |uni AS (SELECT w, count(*) AS c FROM pr GROUP BY w),
        |tot AS (SELECT sum(c)::DOUBLE AS t FROM uni),
        |bi AS (SELECT prev, w, count(*) AS cb FROM pr
        |  WHERE prev IS NOT NULL GROUP BY prev, w),
        |ctx AS (SELECT prev, sum(cb) AS cc FROM bi GROUP BY prev)
        |SELECT doc_id, count(*)::BIGINT AS n_tokens,
        |  ((2 * sum(floor(-ln(CASE WHEN pr.prev IS NULL THEN uni.c::DOUBLE / t
        |      ELSE 0.75 * (bi.cb::DOUBLE / ctx.cc::DOUBLE)
        |        + 0.25 * (uni.c::DOUBLE / t) END) / ln(2.0) * 10000 + 0.5)::BIGINT
        |    ) + count(*)) // (2 * count(*)))::DOUBLE / 10000.0
        |    AS bits_per_token
        |FROM pr JOIN uni USING (w)
        |LEFT JOIN bi ON pr.prev = bi.prev AND pr.w = bi.w
        |LEFT JOIN ctx ON pr.prev = ctx.prev, tot
        |GROUP BY doc_id""".stripMargin,

    // the closed form IS the single-window query the operator avoids:
    // total order (md5 ticket, doc_id), 0-based
    "c7_training_order" ->
      """SELECT doc_id,
        |  (row_number() OVER (
        |     ORDER BY ('0x' || substring(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 10000,
        |              doc_id) - 1)::BIGINT AS position
        |FROM documents""".stripMargin,

    // genotyping per trio sample + pivot + Mendelian phase cascade
    "g5_trio_phase" ->
      """WITH v AS (
        |  SELECT concat('chr', l_linestatus) AS contig, (l_partkey % 1000) AS blk,
        |         (l_partkey % 1000) * 20 + (l_suppkey % 10) AS vstart,
        |         CASE WHEN l_orderkey % 3 = 0 THEN 'C'
        |              WHEN l_orderkey % 3 = 1 THEN 'G' ELSE 'T' END AS valt
        |  FROM lineitem GROUP BY 1, 2, 3, 4 HAVING count(*) >= 2),
        |r AS (
        |  SELECT concat('chr', l_linestatus) AS contig, (l_partkey % 1000) AS blk,
        |         (l_partkey % 1000) * 20 + (l_suppkey % 10) AS rpos,
        |         CASE WHEN l_orderkey % 3 = 0 THEN 'C'
        |              WHEN l_orderkey % 3 = 1 THEN 'G' ELSE 'T' END AS ralt,
        |         's' || l_returnflag AS sample,
        |         1 - (1 - pow(10, -(30 + l_linenumber % 10)/10.0)) * (1 - pow(10, -6.0)) AS eps
        |  FROM lineitem),
        |p AS (
        |  SELECT v.contig, v.vstart, v.valt, r.sample,
        |         CASE WHEN r.rpos = v.vstart AND r.ralt = v.valt THEN 2
        |              WHEN r.rpos = v.vstart THEN 0 ELSE 1 END AS support,
        |         r.eps
        |  FROM v JOIN r ON v.contig = r.contig AND v.blk = r.blk),
        |g AS (
        |  SELECT contig, vstart, valt, sample,
        |    sum(CASE WHEN support = 2 THEN ln(2*eps) - ln(2)
        |             ELSE ln(2*(1-eps)) - ln(2) END) AS gl0,
        |    sum(ln(eps + (1-eps)) - ln(2)) AS gl1,
        |    sum(CASE WHEN support = 2 THEN ln(2*(1-eps)) - ln(2)
        |             ELSE ln(2*eps) - ln(2) END) AS gl2
        |  FROM p GROUP BY 1, 2, 3, 4),
        |st AS (
        |  SELECT contig, vstart, valt,
        |         sample,
        |         CASE WHEN gl0 >= gl1 AND gl0 >= gl2 THEN 0
        |              WHEN gl1 >= gl2 THEN 1 ELSE 2 END AS state
        |  FROM g),
        |piv AS (
        |  SELECT contig AS contigName, vstart, valt,
        |    max(CASE WHEN sample = 'sN' THEN state END) AS motherState,
        |    max(CASE WHEN sample = 'sA' THEN state END) AS fatherState,
        |    max(CASE WHEN sample = 'sR' THEN state END) AS childState
        |  FROM st GROUP BY 1, 2, 3),
        |ph AS (
        |  SELECT *,
        |    coalesce(motherState, 0) AS m, coalesce(fatherState, 0) AS f, childState AS c,
        |    ((childState = 2 AND NOT (coalesce(motherState,0) > 0 AND coalesce(fatherState,0) > 0)) OR
        |     (childState = 0 AND NOT (coalesce(motherState,0) < 2 AND coalesce(fatherState,0) < 2)) OR
        |     (childState = 1 AND NOT ((coalesce(motherState,0) > 0 AND coalesce(fatherState,0) < 2) OR
        |                              (coalesce(motherState,0) < 2 AND coalesce(fatherState,0) > 0)))) AS violation
        |  FROM piv WHERE childState IS NOT NULL)
        |SELECT contigName, vstart AS start, 'A' AS referenceAllele, valt AS alternateAllele,
        |  coalesce(motherState, -1) AS motherState,
        |  coalesce(fatherState, -1) AS fatherState,
        |  childState, violation AS mendelError,
        |  (NOT violation AND (c <> 1
        |     OR (NOT (m > 0 AND f > 0) AND m > 0)
        |     OR (NOT (m > 0 AND f > 0) AND f > 0))) AS phased,
        |  CASE WHEN violation THEN 'NO_CALL|NO_CALL'
        |       WHEN c = 0 THEN 'REF|REF'
        |       WHEN c = 2 THEN 'ALT|ALT'
        |       WHEN (NOT (m > 0 AND f > 0) AND m > 0) THEN 'ALT|REF'
        |       WHEN (NOT (m > 0 AND f > 0) AND f > 0) THEN 'REF|ALT'
        |       ELSE 'REF|ALT' END AS child_alleles
        |FROM ph""".stripMargin,

    // real header parse: Spark synthesizes a PNG (javax.imageio), a WAV
    // (javax.sound), a minimal MP4 (hand-built ftyp+moov/mvhd), or raw
    // text bytes per doc and reads container metadata back OUT OF THE
    // HEADER BYTES; the oracle states the closed-form truth of what each
    // writer must have emitted — equality proves the IHDR/fmt/mvhd
    // fields were actually parsed
    "m1_multimodal_meta" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 4 = 0 THEN 'png'
        |       WHEN doc_id % 4 = 1 THEN 'wav'
        |       WHEN doc_id % 4 = 2 THEN 'mp4' END AS container,
        |  (CASE WHEN doc_id % 4 = 0 THEN 8 + doc_id % 9 END)::BIGINT AS width,
        |  (CASE WHEN doc_id % 4 = 0 THEN 8 + doc_id % 7 END)::BIGINT AS height,
        |  (CASE WHEN doc_id % 4 = 1 THEN 1 END)::BIGINT AS channels,
        |  (CASE WHEN doc_id % 4 = 1 THEN 8000 END)::BIGINT AS sample_rate,
        |  (CASE WHEN doc_id % 4 = 0 THEN 1
        |        WHEN doc_id % 4 = 1 THEN 64 + doc_id % 33 END)::BIGINT AS n_frames,
        |  (CASE WHEN doc_id % 4 = 2 THEN 600 END)::BIGINT AS timescale,
        |  (CASE WHEN doc_id % 4 = 2 THEN 600 + doc_id % 2401 END)::BIGINT AS duration_ts
        |FROM documents""".stripMargin,

    // modality costs in closed form (the m1 metadata formulas), then
    // the c3 pack rule; every division is integer ceil — no rounding
    "m11_multimodal_pack" ->
      """WITH cost AS (
        |  SELECT doc_id,
        |    CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'wav'
        |      WHEN 2 THEN 'mp4' ELSE 'text' END AS modality,
        |    (CASE doc_id % 4
        |      WHEN 0 THEN ((8 + doc_id % 9 + 3) // 4) * ((8 + doc_id % 7 + 3) // 4) + 16
        |      WHEN 1 THEN (64 + doc_id % 33 + 7) // 8
        |      WHEN 2 THEN ((600 + doc_id % 2401 + 599) // 600) * 64
        |      ELSE len(regexp_extract_all(text, '\S+')) END)::BIGINT AS tokens,
        |    ('0x' || substring(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 8 AS shard
        |  FROM documents)
        |SELECT doc_id, modality, tokens, shard,
        |  ((sum(tokens) OVER (PARTITION BY shard ORDER BY doc_id) - tokens)
        |    // 256)::BIGINT AS bin
        |FROM cost""".stripMargin,

    // real image decode: Spark synthesizes a PNG whose every sample is
    // (doc_id*31 + x*7 + y*13 + c*101) % 256 over an (8+id%9)x(8+id%7)x3
    // raster, decodes it with javax.imageio, and reports pixel stats of
    // the DECODED raster; the oracle recomputes those stats in closed
    // form — equality proves the encode->decode round trip is faithful
    "m3_image_decode" ->
      """WITH dims AS (
        |  SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h FROM documents
        |), px AS (
        |  SELECT d.doc_id, d.w, d.h,
        |    (d.doc_id * 31 + x.range * 7 + y.range * 13 + c.range * 101) % 256 AS v
        |  FROM dims d
        |  CROSS JOIN range(0, 16) x
        |  CROSS JOIN range(0, 14) y
        |  CROSS JOIN range(0, 3) c
        |  WHERE x.range < d.w AND y.range < d.h
        |)
        |SELECT doc_id, w AS width, h AS height, 3 AS channels,
        |  sum(v)::BIGINT AS px_sum, max(v)::BIGINT AS px_max
        |FROM px GROUP BY doc_id, w, h""".stripMargin,

    // perceptual dHash near-dup: docs sharing doc_id % 97 carry identical
    // synthetic PNGs; the oracle recomputes the 9x8 grid dHash of the
    // closed-form raster in pure integer math (gray = band-sum // 3,
    // nearest-neighbor sample at (i*w//9, j*h//8), bit set iff right
    // neighbor strictly brighter), split in 32-bit halves to dodge BIGINT
    // sign at bit 63
    "m4_image_dhash" ->
      """WITH img AS (
        |  SELECT doc_id, doc_id % 97 AS im,
        |         8 + (doc_id % 97) % 9 AS w, 8 + (doc_id % 97) % 7 AS h
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, j.range AS j, i.range AS i,
        |    ((im*31 + (i.range*w//9)*7 + (j.range*h//8)*13) % 256
        |     + (im*31 + (i.range*w//9)*7 + (j.range*h//8)*13 + 101) % 256
        |     + (im*31 + (i.range*w//9)*7 + (j.range*h//8)*13 + 202) % 256) // 3 AS gray
        |  FROM img CROSS JOIN range(0, 8) j CROSS JOIN range(0, 9) i),
        |b AS (
        |  SELECT doc_id, j, i,
        |    CASE WHEN lead(gray) OVER (PARTITION BY doc_id, j ORDER BY i) > gray
        |         THEN 1 ELSE 0 END AS bit
        |  FROM g),
        |hsh AS (
        |  SELECT doc_id,
        |    sum(CASE WHEN j >= 4 THEN bit * (1::BIGINT << ((j - 4) * 8 + i))
        |             ELSE 0 END)::BIGINT AS dhash_hi,
        |    sum(CASE WHEN j < 4 THEN bit * (1::BIGINT << (j * 8 + i))
        |             ELSE 0 END)::BIGINT AS dhash_lo
        |  FROM b WHERE i < 8 GROUP BY doc_id)
        |SELECT doc_id, dhash_hi, dhash_lo,
        |  min(doc_id) OVER (PARTITION BY dhash_hi, dhash_lo) AS dup_group
        |FROM hsh""".stripMargin,

    // image near-dup pairs: m4's closed-form dHash, 4x16-bit pigeonhole
    // chunk buckets, exact Hamming verify <= 3 after candidate distinct
    "m6_image_neardup" ->
      """WITH img AS (
        |  SELECT doc_id, doc_id % 97 AS im,
        |         8 + (doc_id % 97) % 9 AS w, 8 + (doc_id % 97) % 7 AS h
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, j.range AS j, i.range AS i,
        |    ((im*31 + (i.range*w//9)*7 + (j.range*h//8)*13) % 256
        |     + (im*31 + (i.range*w//9)*7 + (j.range*h//8)*13 + 101) % 256
        |     + (im*31 + (i.range*w//9)*7 + (j.range*h//8)*13 + 202) % 256) // 3 AS gray
        |  FROM img CROSS JOIN range(0, 8) j CROSS JOIN range(0, 9) i),
        |b AS (
        |  SELECT doc_id, j, i,
        |    CASE WHEN lead(gray) OVER (PARTITION BY doc_id, j ORDER BY i) > gray
        |         THEN 1 ELSE 0 END AS bit
        |  FROM g),
        |hsh AS (
        |  SELECT doc_id,
        |    sum(CASE WHEN j >= 4 THEN bit * (1::BIGINT << ((j - 4) * 8 + i))
        |             ELSE 0 END)::BIGINT AS dhash_hi,
        |    sum(CASE WHEN j < 4 THEN bit * (1::BIGINT << (j * 8 + i))
        |             ELSE 0 END)::BIGINT AS dhash_lo
        |  FROM b WHERE i < 8 GROUP BY doc_id),
        |ch AS (
        |  SELECT doc_id, dhash_hi, dhash_lo, c.range AS chunk,
        |    CASE WHEN c.range < 2 THEN (dhash_lo >> (c.range::INT * 16)) & 65535
        |         ELSE (dhash_hi >> ((c.range::INT - 2) * 16)) & 65535 END AS cv
        |  FROM hsh CROSS JOIN range(0, 4) c),
        |cand AS (
        |  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b,
        |    l.dhash_hi AS ha_hi, l.dhash_lo AS ha_lo,
        |    r.dhash_hi AS hb_hi, r.dhash_lo AS hb_lo
        |  FROM ch l JOIN ch r
        |    ON l.chunk = r.chunk AND l.cv = r.cv AND l.doc_id < r.doc_id)
        |SELECT doc_a, doc_b,
        |  (bit_count(xor(ha_hi, hb_hi)) + bit_count(xor(ha_lo, hb_lo)))::BIGINT
        |    AS hamming
        |FROM cand
        |WHERE bit_count(xor(ha_hi, hb_hi)) + bit_count(xor(ha_lo, hb_lo)) <= 3""".stripMargin,

    // audio near-dup (m9): closed-form rebuild of the decoded samples
    // (key mod 97 content, variant v perturbing window 10v), per-window
    // energies, energy-delta fingerprint, then the collapsed weighted
    // contract brute-forced over distinct fingerprints
    "m9_audio_neardup" ->
      """WITH p AS (
        |  SELECT doc_id, doc_id % 97 AS key, (doc_id // 97) % 4 AS v
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, t.range // 16 AS w,
        |    (key * 2654435761 + t.range * 40503 + key * t.range * 69069)
        |      % 60000 - 30000
        |    + CASE WHEN v > 0 AND t.range // 16 = 10 * v THEN 1000 ELSE 0 END
        |      AS smp
        |  FROM p CROSS JOIN range(0, 640) t),
        |e AS (SELECT doc_id, w, sum(smp * smp) AS en FROM s GROUP BY 1, 2),
        |b AS (SELECT doc_id, w,
        |    CASE WHEN en > lag(en) OVER (PARTITION BY doc_id ORDER BY w)
        |         THEN 1 ELSE 0 END AS bit
        |  FROM e),
        |f AS (SELECT doc_id,
        |    sum(CASE WHEN w >= 1 AND bit = 1 THEN 1::BIGINT << (w - 1)
        |             ELSE 0 END)::BIGINT AS fp
        |  FROM b GROUP BY doc_id),
        |g AS (SELECT fp, min(doc_id) AS rep, count(*) AS n FROM f GROUP BY fp)
        |SELECT rep AS rep_a, rep AS rep_b, 0::BIGINT AS hamming,
        |  ((n * (n - 1)) // 2)::BIGINT AS weight
        |FROM g WHERE n >= 2
        |UNION ALL
        |SELECT a.rep, b.rep, bit_count(xor(a.fp, b.fp))::BIGINT,
        |  (a.n * b.n)::BIGINT
        |FROM g a JOIN g b ON a.rep < b.rep
        |WHERE bit_count(xor(a.fp, b.fp)) <= 4""".stripMargin,

    // collapsed image near-dup (m6's scale path): exact-dup clusters
    // shrink to (rep, n) before the pigeonhole pair join, weights carry
    // the underlying pair mass
    "m8_image_neardup_scaled" ->
      """WITH img AS (
        |  SELECT doc_id, doc_id % 97 AS im,
        |         8 + (doc_id % 97) % 9 AS w, 8 + (doc_id % 97) % 7 AS h
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, j.range AS j, i.range AS i,
        |    ((im*31 + (i.range*w//9)*7 + (j.range*h//8)*13) % 256
        |     + (im*31 + (i.range*w//9)*7 + (j.range*h//8)*13 + 101) % 256
        |     + (im*31 + (i.range*w//9)*7 + (j.range*h//8)*13 + 202) % 256) // 3 AS gray
        |  FROM img CROSS JOIN range(0, 8) j CROSS JOIN range(0, 9) i),
        |b AS (
        |  SELECT doc_id, j, i,
        |    CASE WHEN lead(gray) OVER (PARTITION BY doc_id, j ORDER BY i) > gray
        |         THEN 1 ELSE 0 END AS bit
        |  FROM g),
        |hsh AS (
        |  SELECT doc_id,
        |    sum(CASE WHEN j >= 4 THEN bit * (1::BIGINT << ((j - 4) * 8 + i))
        |             ELSE 0 END)::BIGINT AS dhash_hi,
        |    sum(CASE WHEN j < 4 THEN bit * (1::BIGINT << (j * 8 + i))
        |             ELSE 0 END)::BIGINT AS dhash_lo
        |  FROM b WHERE i < 8 GROUP BY doc_id),
        |grp AS (
        |  SELECT dhash_hi, dhash_lo, min(doc_id) AS rep, count(*) AS n
        |  FROM hsh GROUP BY dhash_hi, dhash_lo),
        |exact AS (
        |  SELECT rep AS rep_a, rep AS rep_b, 0::BIGINT AS hamming,
        |         ((n * (n - 1)) // 2)::BIGINT AS weight
        |  FROM grp WHERE n >= 2),
        |ch AS (
        |  SELECT rep, n, dhash_hi, dhash_lo, c.range AS chunk,
        |    CASE WHEN c.range < 2 THEN (dhash_lo >> (c.range::INT * 16)) & 65535
        |         ELSE (dhash_hi >> ((c.range::INT - 2) * 16)) & 65535 END AS cv
        |  FROM grp CROSS JOIN range(0, 4) c),
        |cand AS (
        |  SELECT DISTINCT l.rep AS rep_a, r.rep AS rep_b, l.n AS na, r.n AS nb,
        |    l.dhash_hi AS ha_hi, l.dhash_lo AS ha_lo,
        |    r.dhash_hi AS hb_hi, r.dhash_lo AS hb_lo
        |  FROM ch l JOIN ch r
        |    ON l.chunk = r.chunk AND l.cv = r.cv AND l.rep < r.rep)
        |SELECT rep_a, rep_b, hamming, weight FROM exact
        |UNION ALL
        |SELECT rep_a, rep_b,
        |  (bit_count(xor(ha_hi, hb_hi)) + bit_count(xor(ha_lo, hb_lo)))::BIGINT
        |    AS hamming,
        |  (na * nb)::BIGINT AS weight
        |FROM cand
        |WHERE bit_count(xor(ha_hi, hb_hi)) + bit_count(xor(ha_lo, hb_lo)) <= 3""".stripMargin,

    // real audio decode: Spark writes a WAV whose sample t is
    // (doc_id*31 + t*7) % 65536 - 32768 over 64 + doc_id%33 mono 16-bit
    // frames at 8 kHz, decodes it with javax.sound.sampled, and reports
    // stats of the DECODED samples; closed-form recomputation here
    "m5_audio_decode" ->
      """WITH a AS (SELECT doc_id, 64 + doc_id % 33 AS n FROM documents),
        |s AS (
        |  SELECT doc_id, n, (doc_id * 31 + t.range * 7) % 65536 - 32768 AS v
        |  FROM a CROSS JOIN range(0, 97) t WHERE t.range < n)
        |SELECT doc_id, n AS n_frames, 8000::BIGINT AS sample_rate,
        |  1::BIGINT AS channels,
        |  sum(v)::BIGINT AS amp_sum, max(v)::BIGINT AS amp_max
        |FROM s GROUP BY doc_id, n""".stripMargin,

    "ev3_stream_window" ->
      """SELECT floor(epoch_ms(ts) / 300000.0)::BIGINT AS bucket, event_type,
        |  count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    // streaming sessionization: sessions closed by a successor event
    // (sid < max_sid) or by event-time timeout before the final
    // watermark (watermark ms = ns -> us -> ms truncation, delay 0)
    "ev4_stream_sessions" ->
      """WITH s AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_ns(ts) - epoch_ns(lag(ts) OVER w) > 1800000000000
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |t2 AS (
        |  SELECT user_id, ts,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM s),
        |g AS (SELECT user_id, sid, min(epoch_ns(ts)) AS session_start,
        |        max(epoch_ns(ts)) AS session_end, count(*) AS n_events
        |      FROM t2 GROUP BY 1, 2),
        |g2 AS (SELECT *, max(sid) OVER (PARTITION BY user_id) AS max_sid FROM g),
        |m AS (SELECT (epoch_ns(max(ts)) // 1000) // 1000 AS wm_ms FROM events)
        |SELECT user_id, session_start // 1000 AS session_start_us,
        |  session_end // 1000 AS session_end_us, n_events
        |FROM g2, m
        |WHERE sid < max_sid OR (session_end // 1000000) + 1800000 < wm_ms""".stripMargin,

    "ev5_stream_enrich" ->
      """SELECT c_mktsegment, event_type, count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY 1, 2""".stripMargin,

    // streaming stateful dedup projected to its key columns: the emitted
    // set is exactly the distinct key set, independent of which physical
    // row survived the state store
    "ev6_stream_dedup" ->
      "SELECT DISTINCT user_id, event_type FROM events",

    "ev2_sessionize" ->
      """WITH s AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_ns(ts) - epoch_ns(lag(ts) OVER w) > 1800000000000
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |t2 AS (
        |  SELECT user_id,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM s),
        |c AS (SELECT user_id, session_id, count(*) AS n_events FROM t2 GROUP BY 1, 2)
        |SELECT user_id, count(*) AS n_sessions, max(n_events) AS max_session_events
        |FROM c GROUP BY user_id""".stripMargin,

    // trailing-window z-score anomaly: the |z|>2 flag cross-multiplied
    // into exact long arithmetic — (n·x−s)²(n−1) > 4n(n·ss−s²) — so no
    // division/sqrt/float touches the boolean in either engine
    "ev26_zscore_anomaly" -> zscoreSql,

    // the streaming daily-count log must resolve to the identical ev26
    // report (counts add across batches)
    "ev27_stream_zscore" -> zscoreSql,

    // NFC normalization: decompose deterministically (every 'e' gains a
    // combining acute), recompose with the engine's normalizer, md5 the
    // result — UAX #15 makes Java and utf8proc byte-identical
    "t28_nfc_normalize" ->
      """WITH d AS (SELECT doc_id,
        |    replace(text, 'e', 'e' || chr(769)) AS deco FROM documents),
        |n AS (SELECT doc_id, deco, nfc_normalize(deco) AS nfc FROM d)
        |SELECT doc_id, length(deco)::BIGINT AS len_decomposed,
        |  length(nfc)::BIGINT AS len_nfc, md5(nfc) AS fp,
        |  (length(deco) - length(nfc))::BIGINT AS n_composed
        |FROM n""".stripMargin,

    // video scene cuts: replay the fixture writer's closed-form frame
    // bytes (m7's truth), per-frame brightness sums, cut where mean
    // levels differ by > 3/2 (cross-multiplied longs), gaps-and-islands
    "m13_scene_cuts" ->
      """WITH f AS (SELECT doc_id, 3 + doc_id % 5 AS n FROM documents),
        |fr AS (SELECT doc_id, n, unnest(range(0, n)) AS i FROM f),
        |sz AS (SELECT doc_id, i,
        |    16 + (doc_id * 7 + i * 3) % 17 AS s FROM fr),
        |it AS (SELECT doc_id, i, s,
        |    list_sum([97 + (doc_id * 31 + i * 7 + p) % 26
        |              FOR p IN range(0, s)])::BIGINT AS ii
        |  FROM sz),
        |c AS (SELECT doc_id, i, s, ii,
        |    lag(ii) OVER w AS pi, lag(s) OVER w AS ps
        |  FROM it WINDOW w AS (PARTITION BY doc_id ORDER BY i)),
        |k AS (SELECT doc_id, i, s,
        |    CASE WHEN pi IS NULL THEN 0
        |         WHEN abs(ii * ps - pi * s) * 2 > 3 * s * ps THEN 1
        |         ELSE 0 END AS cut
        |  FROM c),
        |g AS (SELECT doc_id, i, s,
        |    sum(cut) OVER (PARTITION BY doc_id ORDER BY i) AS seg_idx
        |  FROM k)
        |SELECT doc_id, seg_idx::BIGINT AS seg_idx,
        |  min(i)::BIGINT AS start_frame, max(i)::BIGINT AS end_frame,
        |  count(*)::BIGINT AS n_frames, sum(s)::BIGINT AS seg_bytes
        |FROM g GROUP BY doc_id, seg_idx""".stripMargin
  ) ++ Map(
    "d3_minhash_lsh_pairs" -> d3Sql,
    "d17_minhash_accuracy" -> d17Sql,
    "e16_bm25_batch" -> e16Sql,
    "d4_simhash_pairs" -> d4Sql,
    "d19_simhash_scaled" -> d19Sql,
    "d20_simhash_collapsed" -> d20Sql,
    "d7_dup_clusters" -> d7Sql,
    "d16_dupgraph_rank" -> d16Sql,
    "t17_hll_distinct" -> t17Sql,
    "t18_hll_merge" -> t18Sql,
    "t23_hll_accuracy" -> t23Sql,
    "t24_hll_merge_accuracy" -> t24Sql,
    "t20_cms_heavy_hitters" -> t20Sql,
    "ev15_stream_hll_users" -> ev15Sql,
    "m10_video_neardup" -> m10Sql,
    "e2_ann_topk" -> e2Sql,
    "e12_lsh_neardup" -> e12Sql,
    "e6_ann_recall" -> e6Sql,
    "e9_batch_ann" -> e9Sql,
    "e18_filtered_ann" -> e18Sql,
    "e19_filtered_recall" -> e19Sql,
    "ev12_stream_ann" -> ev12Sql,
    "e10_kmeans_train" -> e10Sql,
    "e11_pq_topk" -> e11Sql,
    "e13_ivfpq_topk" -> e13Sql,
    "e14_pq_recall" -> recallVsExactSql(e11Sql),
    "e15_ivfpq_recall" -> recallVsExactSql(e13Sql),

    // Matryoshka rerank: coarse prefix-dim cosine shortlist, exact
    // full-dim rerank; ties by vec_id at both cuts
    "e17_mrl_rerank" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
        |c AS (
        |  SELECT e.vec_id, e.v,
        |    list_dot_product(e.v[1:16], q.qv[1:16])
        |      / (sqrt(list_dot_product(e.v[1:16], e.v[1:16]))
        |         * sqrt(list_dot_product(q.qv[1:16], q.qv[1:16]))) AS coarse_sim
        |  FROM e, q
        |  ORDER BY coarse_sim DESC, e.vec_id LIMIT 50)
        |SELECT c.vec_id, c.coarse_sim,
        |  list_dot_product(c.v, q.qv)
        |    / (sqrt(list_dot_product(c.v, c.v))
        |       * sqrt(list_dot_product(q.qv, q.qv))) AS cos_sim
        |FROM c, q
        |ORDER BY cos_sim DESC, c.vec_id LIMIT 10""".stripMargin,

    // sign-sketch Hamming top-k: the oracle counts sign mismatches
    // directly (no bit packing needed in SQL — the count is what the
    // packed XOR+popcount computes); integer-exact, ties by vec_id
    "e8_hamming_topk" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
        |SELECT e.vec_id,
        |  len([i FOR i IN range(1, len(e.v) + 1)
        |       IF (e.v[i] > 0) <> (q.qv[i] > 0)])::INT AS hamming
        |FROM e, q
        |ORDER BY hamming, e.vec_id
        |LIMIT 20""".stripMargin,

    // int8-quantized cosine top-k: scale cancels in cosine, so the
    // ranking runs on exact integer dot products — bit-reproducible
    "e7_quantized_topk" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |m AS (SELECT vec_id, v, list_max([abs(x) FOR x IN v]) AS ma FROM e),
        |qn AS (
        |  SELECT vec_id,
        |    CASE WHEN ma > 0 THEN [round(x / (ma / 127.0)) FOR x IN v]
        |         ELSE [0.0 FOR x IN v] END AS q
        |  FROM m),
        |qv AS (SELECT q AS qq FROM qn WHERE vec_id = 0)
        |SELECT qn.vec_id,
        |  list_dot_product(qn.q, qv.qq)
        |    / (sqrt(list_dot_product(qn.q, qn.q)) * sqrt(list_dot_product(qv.qq, qv.qq))) AS qcos_sim
        |FROM qn, qv
        |ORDER BY qcos_sim DESC, qn.vec_id
        |LIMIT 20""".stripMargin)

  /** The 60-bit md5 hash both engines share: Dedup.md5Hash60 in Spark,
    * this expression in DuckDB.
    */
  private def h60(expr: String): String =
    s"('0x' || substring(md5($expr), 1, 15))::BIGINT"

  /** Shared oracle for ev16 (batch funnel), ev18 (streaming funnel) and
    * ev19 (windowed, gapNs set): strict-subsequence matching — per step,
    * the earliest (ts, event_id) strictly after the matched previous
    * step (tuple comparison), optionally within the gap of it; a step
    * nobody reaches emits no row (matching the Spark side's empty
    * groupBy).
    */
  private def funnelSql: String = funnelSqlWithGap(None)

  private def funnelSqlWithGap(gapNs: Option[Long]): String = {
    val gap = gapNs.fold("")(g =>
      s" AND epoch_ns(e.ts) - epoch_ns(p.ts) <= $g")
    s"""WITH e AS (SELECT user_id, event_type, ts, event_id FROM events),
      |s1 AS (SELECT user_id, ts, event_id FROM (
      |    SELECT user_id, ts, event_id,
      |      row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |    FROM e WHERE event_type = 'view') WHERE rn = 1),
      |s2 AS (SELECT user_id, ts, event_id FROM (
      |    SELECT e.user_id, e.ts, e.event_id,
      |      row_number() OVER (PARTITION BY e.user_id ORDER BY e.ts, e.event_id) AS rn
      |    FROM e JOIN s1 p ON e.user_id = p.user_id
      |    WHERE e.event_type = 'click' AND (e.ts, e.event_id) > (p.ts, p.event_id)$gap)
      |  WHERE rn = 1),
      |s3 AS (SELECT user_id, ts, event_id FROM (
      |    SELECT e.user_id, e.ts, e.event_id,
      |      row_number() OVER (PARTITION BY e.user_id ORDER BY e.ts, e.event_id) AS rn
      |    FROM e JOIN s2 p ON e.user_id = p.user_id
      |    WHERE e.event_type = 'purchase' AND (e.ts, e.event_id) > (p.ts, p.event_id)$gap)
      |  WHERE rn = 1),
      |counts AS (SELECT 1 AS step, 'view' AS step_name, count(*) AS n FROM s1
      |  UNION ALL SELECT 2, 'click', count(*) FROM s2
      |  UNION ALL SELECT 3, 'purchase', count(*) FROM s3),
      |base AS (SELECT count(DISTINCT user_id) AS b FROM e),
      |prev AS (SELECT step + 1 AS step, n AS p FROM counts)
      |SELECT c.step::BIGINT AS step, c.step_name, c.n::BIGINT AS n_users,
      |  ((c.n * 10000) // coalesce(p.p, b))::BIGINT AS conv_bp
      |FROM counts c LEFT JOIN prev p ON c.step = p.step, base
      |WHERE c.n > 0""".stripMargin
  }

  /** Oracle for t20: the Count-Min pipeline replayed in SQL — exact
    * token counts fan out to the same d=4 row hashes (md5-60 of
    * "r token" mod 512), counters collide by integer sum, estimates
    * take the row-min, top-20 by the total (est desc, token) order.
    * All-integer arithmetic, so both engines agree bit-for-bit.
    */
  // t27/ev28 share this: the digest itself is not cross-engine
  // replayable (merge-order-dependent centroids); the gate row carries
  // the invariants — exact interpolated quantiles and the ±100 bp
  // rank-error contract booleans
  private def tdigestReportSql: String =
    """WITH e AS (SELECT source, count(*)::BIGINT AS n_docs,
      |    quantile_cont(n_chars, [0.25, 0.5, 0.75, 0.95, 0.99]) AS qv
      |  FROM documents GROUP BY source),
      |q AS (SELECT unnest([25, 50, 75, 95, 99]) AS q_pct,
      |             unnest([1, 2, 3, 4, 5]) AS i)
      |SELECT e.source, q.q_pct::INTEGER AS q_pct, e.n_docs,
      |  round(qv[q.i], 4) AS exact_value, true AS within_100bp
      |FROM e CROSS JOIN q""".stripMargin

  // ev26/ev27 share this: trailing 7-day window stats per event type,
  // |z|>2 as the cross-multiplied long inequality (no float in the flag)
  private def zscoreSql: String =
    """WITH d AS (SELECT event_type,
      |    floor(epoch_ms(ts) / 86400000.0)::BIGINT AS day,
      |    count(*)::BIGINT AS cnt FROM events GROUP BY 1, 2),
      |w AS (SELECT event_type, day, cnt,
      |    count(cnt) OVER tw AS n_ref,
      |    sum(cnt) OVER tw AS s,
      |    sum(cnt * cnt) OVER tw AS ss
      |  FROM d WINDOW tw AS (PARTITION BY event_type ORDER BY day
      |    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
      |SELECT event_type, day, cnt, n_ref,
      |  coalesce(n_ref >= 3 AND
      |    (n_ref * cnt - s) * (n_ref * cnt - s) * (n_ref - 1)
      |      > 4 * n_ref * (n_ref * ss - s * s), false) AS is_anomaly
      |FROM w""".stripMargin

  private def t20Sql: String = {
    val (d, w) = (graft.operators.Sketch.CmsD, graft.operators.Sketch.CmsW)
    s"""WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
       |ex AS (SELECT token, count(*)::BIGINT AS exact_cnt FROM tok GROUP BY token),
       |fan AS (SELECT token, exact_cnt, r, ${h60("r::VARCHAR || ' ' || token")} % $w AS idx
       |  FROM ex, range($d) t(r)),
       |cnt AS (SELECT r, idx, sum(exact_cnt)::BIGINT AS c FROM fan GROUP BY r, idx),
       |est AS (SELECT f.token, f.exact_cnt, min(c.c) AS est_cnt
       |  FROM fan f JOIN cnt c ON f.r = c.r AND f.idx = c.idx
       |  GROUP BY f.token, f.exact_cnt)
       |SELECT token, est_cnt, exact_cnt,
       |  ((est_cnt - exact_cnt) * 10000 // exact_cnt)::BIGINT AS err_bp
       |FROM est ORDER BY est_cnt DESC, token LIMIT 20""".stripMargin
  }

  /** Generated oracle for d3 (k=64, bands=32, rows/band=2, minAgree 0.5,
    * n=3): the minhash coefficient family comes from the SAME seeded
    * stream as the Spark kernel, interpolated as literals, so signatures,
    * band buckets, candidates, and agreement are all value-identical.
    */
  private def d3Sql: String = {
    val p = 2147483647L
    val coeffs = graft.operators.Dedup.minHashCoeffs(64)
    val sigTerms = coeffs.map { case (a, b) =>
      s"list_min([($a * x + $b) % $p FOR x IN xs])"
    }.mkString("[\n  ", ",\n  ", "\n]")
    val bandKeys = (0 until 32).map { bnd =>
      h60(s"'${bnd}_' || sg[${bnd * 2 + 1}] || '_' || sg[${bnd * 2 + 2}]")
    }.mkString("[\n  ", ",\n  ", "\n]")
    s"""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |sh AS (SELECT doc_id,
       |  list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2] FOR i IN range(1, len(t) - 1)]) AS s
       |  FROM tok WHERE len(t) >= 3),
       |hx AS (SELECT doc_id, [${h60("g")} % $p FOR g IN s] AS xs FROM sh),
       |sig AS (SELECT doc_id, $sigTerms AS sg FROM hx),
       |bnd AS (SELECT doc_id, sg, unnest($bandKeys) AS bh FROM sig),
       |pr AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |       FROM bnd a JOIN bnd b ON a.bh = b.bh AND a.doc_id < b.doc_id),
       |ag AS (SELECT pr.doc_a, pr.doc_b,
       |         len([i FOR i IN range(1, 65) IF sa.sg[i] = sb.sg[i]]) / 64.0 AS agree
       |       FROM pr
       |       JOIN sig sa ON pr.doc_a = sa.doc_id
       |       JOIN sig sb ON pr.doc_b = sb.doc_id)
       |SELECT doc_a, doc_b, round(agree, 4) AS sig_agreement
       |FROM ag WHERE agree >= 0.5""".stripMargin
  }

  /** Oracle for e16: the t21 BM25 pipeline over the UNION of the
    * batch's terms (per-term df unchanged), scores per (qid, doc),
    * per-query top-10 on the (score desc, doc_id) order. The query
    * batch is interpolated from the Spark-side constant.
    */
  private def e16Sql: String = {
    val vals = graft.queries.Queries.bm25BatchQueries
      .flatMap { case (qid, ts) => ts.map(t => s"($qid, '$t')") }
      .mkString(", ")
    s"""WITH q AS (SELECT * FROM (VALUES $vals) v(qid, term)),
       |toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
       |tk AS (SELECT doc_id, term FROM toks WHERE term <> ''),
       |dl AS (SELECT doc_id, count(*) AS dl FROM tk GROUP BY doc_id),
       |stats AS (SELECT count(*) AS nd, sum(dl)::BIGINT AS sl FROM dl),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM tk
       |  WHERE term IN (SELECT term FROM q) GROUP BY doc_id, term),
       |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
       |c AS (SELECT tf.doc_id, tf.term,
       |    round(ln(((nd - df)::DOUBLE + 0.5) / (df::DOUBLE + 0.5) + 1.0) *
       |      ((tf::DOUBLE * 2.2) / (tf::DOUBLE + 1.2 *
       |        (0.25 + 0.75 * (dl::DOUBLE / (sl::DOUBLE / nd::DOUBLE))))) * 10000,
       |      0)::BIGINT AS c10k
       |  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id), stats),
       |s AS (SELECT q.qid, c.doc_id, sum(c10k)::BIGINT AS score_x10k,
       |    count(*) AS n_hit
       |  FROM c JOIN q USING (term) GROUP BY q.qid, c.doc_id),
       |rk AS (SELECT *, row_number() OVER (PARTITION BY qid
       |    ORDER BY score_x10k DESC, doc_id) AS rn FROM s)
       |SELECT qid::BIGINT AS qid, doc_id, score_x10k,
       |  n_hit::BIGINT AS n_hit
       |FROM rk WHERE rn <= 10""".stripMargin
  }

  /** Oracle for d17: the d3 signature/band machinery, integer agreement
    * count, then exact shingle Jaccard per verified pair — all-integer
    * report arithmetic, value-identical to the Spark kernel.
    */
  private def d17Sql: String = {
    val p = 2147483647L
    val coeffs = graft.operators.Dedup.minHashCoeffs(64)
    val sigTerms = coeffs.map { case (a, b) =>
      s"list_min([($a * x + $b) % $p FOR x IN xs])"
    }.mkString("[\n  ", ",\n  ", "\n]")
    val bandKeys = (0 until 32).map { bnd =>
      h60(s"'${bnd}_' || sg[${bnd * 2 + 1}] || '_' || sg[${bnd * 2 + 2}]")
    }.mkString("[\n  ", ",\n  ", "\n]")
    s"""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |sh AS (SELECT doc_id,
       |  list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2] FOR i IN range(1, len(t) - 1)]) AS s
       |  FROM tok WHERE len(t) >= 3),
       |hx AS (SELECT doc_id, [${h60("g")} % $p FOR g IN s] AS xs FROM sh),
       |sig AS (SELECT doc_id, $sigTerms AS sg FROM hx),
       |bnd AS (SELECT doc_id, sg, unnest($bandKeys) AS bh FROM sig),
       |pr AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |       FROM bnd a JOIN bnd b ON a.bh = b.bh AND a.doc_id < b.doc_id),
       |ag AS (SELECT pr.doc_a, pr.doc_b,
       |         len([i FOR i IN range(1, 65) IF sa.sg[i] = sb.sg[i]]) AS m
       |       FROM pr
       |       JOIN sig sa ON pr.doc_a = sa.doc_id
       |       JOIN sig sb ON pr.doc_b = sb.doc_id),
       |f AS (SELECT * FROM ag WHERE m >= 32),
       |ex AS (SELECT f.doc_a, f.doc_b, f.m,
       |         len(list_intersect(sha.s, shb.s)) AS inter,
       |         len(sha.s) + len(shb.s) - len(list_intersect(sha.s, shb.s)) AS un
       |       FROM f
       |       JOIN sh sha ON f.doc_a = sha.doc_id
       |       JOIN sh shb ON f.doc_b = shb.doc_id)
       |SELECT doc_a, doc_b, m::BIGINT AS sig_agree,
       |  (m * 10000 // 64)::BIGINT AS est_j_bp,
       |  (inter * 10000 // un)::BIGINT AS exact_j_bp,
       |  abs(m * 10000 // 64 - inter * 10000 // un)::BIGINT AS err_bp
       |FROM ex""".stripMargin
  }

  /** Oracle for d11: the d3 signature/band/agreement machinery over the
    * FULL corpus, then the incremental rules — a batch doc (id % 3 != 0)
    * survives unless a verified pair links it to a history doc (either
    * orientation) or to a SMALLER batch doc (pairs have doc_a < doc_b,
    * so that is doc_b = d). Band keys are per-document, so the
    * full-corpus pair set restricted to (batch x history) u (batch x
    * batch) is exactly what the Spark side's two probes generate.
    */
  private def d11Sql: String =
    s"""SELECT d.doc_id FROM (${d3Sql.replace("\n", "\n  ")}) ag
       |RIGHT JOIN (SELECT doc_id FROM documents WHERE doc_id % 3 != 0) d
       |  ON (ag.doc_a = d.doc_id AND ag.doc_b % 3 = 0)
       |  OR ag.doc_b = d.doc_id
       |GROUP BY d.doc_id
       |HAVING count(ag.doc_a) = 0""".stripMargin

  /** Oracle for d12: d7's clusters (left-joined so unpaired docs are
    * singleton clusters of themselves), then per cluster the member
    * count and the keeper = (max token count, min doc id among those).
    */
  private def d12Sql: String =
    s"""WITH cl AS (${d7Sql.replace("\n", "\n  ")}),
       |mem AS (
       |  SELECT d.doc_id, coalesce(cl.cluster_id, d.doc_id) AS cluster_id,
       |    coalesce(len(string_split(d.text, ' ')), 0) AS nt
       |  FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id),
       |g AS (SELECT cluster_id, count(*) AS n_members, max(nt) AS kt
       |      FROM mem GROUP BY cluster_id)
       |SELECT g.cluster_id, g.n_members::BIGINT AS n_members,
       |  min(m.doc_id)::BIGINT AS keeper_id, g.kt::BIGINT AS keeper_tokens
       |FROM g JOIN mem m ON m.cluster_id = g.cluster_id AND m.nt = g.kt
       |GROUP BY g.cluster_id, g.n_members, g.kt""".stripMargin

  /** Oracle for d16: the d3 pair graph symmetrized, then 3 unrolled
    * PageRank rounds in integer parts-per-million — every op is BIGINT
    * arithmetic (`//` here, `div` in Spark), so there is no float
    * accumulation to disagree about. The sum is cast back from DuckDB's
    * HUGEINT widening before the damping division.
    */
  private def d16Sql: String = {
    val rounds = (1 to 3).map { i =>
      s"""r$i AS (SELECT e.dst AS node,
         |  (SELECT (3 * 1000000) // (20 * c) FROM n)
         |    + (17 * (sum(r${i - 1}.r // d.deg)::BIGINT)) // 20 AS r
         |  FROM edges e JOIN r${i - 1} ON e.src = r${i - 1}.node
         |  JOIN deg d ON d.src = e.src
         |  GROUP BY e.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS (SELECT doc_a, doc_b FROM (${d3Sql.replace("\n", "\n  ")}) dp),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |          UNION ALL SELECT doc_b, doc_a FROM pairs),
       |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
       |n AS (SELECT count(*) AS c FROM deg),
       |r0 AS (SELECT src AS node, (1000000 // c)::BIGINT AS r FROM deg, n),
       |$rounds
       |SELECT node AS doc_id, r::BIGINT AS rank_ppm FROM r3""".stripMargin
  }

  /** Oracle for t17 (sketch-only): the HLL register pipeline replayed
    * in SQL — same 60-bit hash, register index by modulus, rho from the
    * binary-string length (`bin` renders without leading zeros in both
    * engines), exact long register terms via `<<`. The alpha numerator
    * literal is interpolated from the Spark constant so both engines
    * divide the identical double. The exact-count accuracy artifact is
    * t23's oracle.
    */
  private def t17Sql: String =
    s"""$hllLangRegSql
       |SELECT lang, occupied::BIGINT AS occupied, $hllEstCase AS est_distinct
       |FROM gr""".stripMargin

  /** Shared t17/t23 register chain: per-lang distinct shingles → 60-bit
    * hash → 256-register max-rho table → per-lang (occupied, s).
    */
  private def hllLangRegSql: String =
    s"""WITH tok AS (SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents),
       |sh AS (SELECT lang, unnest(list_distinct(
       |    [t[i] || ' ' || t[i+1] || ' ' || t[i+2] FOR i IN range(1, len(t) - 1)])) AS sh
       |  FROM tok WHERE len(t) >= 3),
       |h AS (SELECT lang, sh, ${h60("sh")} AS h FROM sh),
       |reg AS (SELECT lang, h % 256 AS idx,
       |    CASE WHEN h // 256 = 0 THEN 53 ELSE 53 - length(bin(h // 256)) END AS rho
       |  FROM h),
       |mj AS (SELECT lang, idx, max(rho) AS m_j FROM reg GROUP BY lang, idx),
       |gr AS (SELECT lang, count(*) AS occupied,
       |    sum((1::BIGINT << (53 - m_j)))::BIGINT AS s
       |  FROM mj GROUP BY lang)""".stripMargin

  /** Oracle for t23: t17's pipeline plus the exact distinct count and
    * err_bp — the accuracy artifact row. Exact side counts distinct
    * 60-bit HASHES, matching the Spark plan's r14 floor shape (the
    * distinct shuffle carries longs, not shingle strings); both engines
    * hash identically so the count is bit-identical, and expected
    * collisions are n²/2⁶¹ ≪ 1 at any tested scale.
    */
  private def t23Sql: String =
    s"""$hllLangRegSql,
       |ex AS (SELECT lang, count(DISTINCT h) AS exact_distinct FROM h GROUP BY lang),
       |est AS (SELECT lang, occupied, $hllEstCase AS est_distinct FROM gr)
       |SELECT est.lang, occupied::BIGINT AS occupied, est_distinct,
       |  exact_distinct::BIGINT AS exact_distinct,
       |  floor(abs(est_distinct - exact_distinct) / exact_distinct * 10000)::BIGINT AS err_bp
       |FROM est JOIN ex ON est.lang = ex.lang""".stripMargin

  /** The HLL estimate arithmetic shared by t17/t18/ev15 oracles: raw
    * bias-corrected estimate with the linear-counting small-range
    * branch, numerator interpolated from the Spark-side constant.
    */
  private def hllEstCase: String = {
    val aN = graft.operators.Sketch.hllAlphaNum.toString
    val denom = "((s + (256 - occupied) * 9007199254740992)::DOUBLE)"
    s"""round(CASE WHEN $aN / $denom <= 640.0 AND occupied < 256
       |      THEN 256.0 * ln(256.0 / ((256 - occupied)::DOUBLE))
       |      ELSE $aN / $denom END, 4)""".stripMargin
  }

  /** Shared t18/t24 register chain: per-source registers plus their
    * '__union' max-merge (identical to the union's own registers by max
    * associativity) → per-scope (occupied, s).
    */
  private def hllSourceRegSql: String =
    s"""WITH tok AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
       |sh AS (SELECT source, unnest(list_distinct(
       |    [t[i] || ' ' || t[i+1] || ' ' || t[i+2] FOR i IN range(1, len(t) - 1)])) AS sh
       |  FROM tok WHERE len(t) >= 3),
       |h AS (SELECT source, sh, ${h60("sh")} AS h FROM sh),
       |reg AS (SELECT source, h % 256 AS idx,
       |    CASE WHEN h // 256 = 0 THEN 53 ELSE 53 - length(bin(h // 256)) END AS rho
       |  FROM h),
       |mj AS (SELECT source, idx, max(rho) AS m_j FROM reg GROUP BY source, idx),
       |mju AS (SELECT '__union' AS source, idx, max(m_j) AS m_j FROM mj GROUP BY idx),
       |m2 AS (SELECT * FROM mj UNION ALL SELECT * FROM mju),
       |gr AS (SELECT source, count(*) AS occupied,
       |    sum((1::BIGINT << (53 - m_j)))::BIGINT AS s
       |  FROM m2 GROUP BY source)""".stripMargin

  /** Oracle for t18 (sketch-only): per-source + '__union' estimates. */
  private def t18Sql: String =
    s"""$hllSourceRegSql
       |SELECT source, occupied::BIGINT AS occupied, $hllEstCase AS est_distinct
       |FROM gr""".stripMargin

  /** Oracle for t24: t18's pipeline plus exact counts per scope —
    * distinct-HASH counts, the t23 convention.
    */
  private def t24Sql: String =
    s"""$hllSourceRegSql,
       |exs AS (SELECT source, count(DISTINCT h) AS exact_distinct FROM h GROUP BY source
       |  UNION ALL SELECT '__union', count(DISTINCT h) FROM h),
       |est AS (SELECT source, occupied, $hllEstCase AS est_distinct FROM gr)
       |SELECT est.source, occupied::BIGINT AS occupied, est_distinct,
       |  exact_distinct::BIGINT AS exact_distinct,
       |  floor(abs(est_distinct - exact_distinct) / exact_distinct * 10000)::BIGINT AS err_bp
       |FROM est JOIN exs ON est.source = exs.source""".stripMargin

  /** Oracle for ev15: the register pipeline per hour window over the
    * batch table — valid for the stream because register max is
    * associative (merge-on-read resolve == batch sketch).
    */
  private def ev15Sql: String =
    s"""WITH ev AS (SELECT (epoch_ms(ts) // 3600000) * 3600 AS w,
       |    user_id::VARCHAR AS u FROM events),
       |h AS (SELECT w, u, ${h60("u")} AS h FROM ev),
       |reg AS (SELECT w, h % 256 AS idx,
       |    CASE WHEN h // 256 = 0 THEN 53 ELSE 53 - length(bin(h // 256)) END AS rho
       |  FROM h),
       |mj AS (SELECT w, idx, max(rho) AS m_j FROM reg GROUP BY w, idx),
       |gr AS (SELECT w, count(*) AS occupied,
       |    sum((1::BIGINT << (53 - m_j)))::BIGINT AS s
       |  FROM mj GROUP BY w),
       |ex AS (SELECT w, count(DISTINCT u) AS exact_users FROM ev GROUP BY w),
       |est AS (SELECT w, occupied, $hllEstCase AS est_users FROM gr)
       |SELECT est.w AS window_start, occupied::BIGINT AS occupied, est_users,
       |  exact_users::BIGINT AS exact_users,
       |  floor(abs(est_users - exact_users) / exact_users * 10000)::BIGINT AS err_bp
       |FROM est JOIN ex ON est.w = ex.w""".stripMargin

  /** Oracle for m10: rebuild the frame fingerprints closed-form from
    * the synthetic generator (m7's oracle with the planted `% 97`
    * content key), then the collapsed video-near-dup contract: exact
    * classes by canonical fp-list key, frame-fp inverted-index join
    * over distinct videos, distinct-shared-frame count per pair.
    */
  private def m10Sql: String =
    """WITH f AS (SELECT doc_id, doc_id % 97 AS k,
      |    3 + (doc_id % 97) % 5 AS n FROM documents),
      |fr AS (SELECT doc_id, k, n, unnest(range(0, n)) AS i FROM f),
      |fp AS (SELECT doc_id,
      |    md5(list_aggregate([chr((97 + (k * 31 + i * 7 + p) % 26)::INT)
      |      FOR p IN range(0, 16 + (k * 7 + i * 3) % 17)], 'string_agg', '')) AS fp
      |  FROM fr),
      |vids AS (SELECT doc_id, list_sort(list_distinct(list(fp))) AS fps
      |  FROM fp GROUP BY doc_id),
      |v2 AS (SELECT doc_id, fps, len(fps) AS nf,
      |    md5(array_to_string(fps, ',')) AS vkey FROM vids),
      |grp AS (SELECT vkey, min(doc_id) AS rep, count(*) AS n,
      |    any_value(nf) AS nf, any_value(fps) AS fps
      |  FROM v2 GROUP BY vkey),
      |ex AS (SELECT rep AS rep_a, rep AS rep_b, nf::BIGINT AS shared,
      |    ((n * (n - 1)) // 2)::BIGINT AS weight FROM grp WHERE n >= 2),
      |inv AS (SELECT rep, n, unnest(fps) AS fp FROM grp),
      |cr AS (SELECT a.rep AS rep_a, b.rep AS rep_b, count(*)::BIGINT AS shared,
      |    any_value(a.n * b.n)::BIGINT AS weight
      |  FROM inv a JOIN inv b ON a.fp = b.fp AND a.rep < b.rep
      |  GROUP BY a.rep, b.rep
      |  HAVING count(*) >= 2)
      |SELECT * FROM ex UNION ALL SELECT * FROM cr""".stripMargin

  /** Oracle for d7: the d3 pair graph (nested as a subquery — DuckDB
    * allows WITH inside a derived table) closed transitively with a
    * recursive CTE; cluster id = min reachable node. Tractable because
    * the walk is bounded by Σ component_size² over small LSH clusters.
    */
  private def d7Sql: String =
    s"""WITH RECURSIVE
       |pairs AS (SELECT doc_a, doc_b FROM (${d3Sql.replace("\n", "\n  ")}) dp),
       |nodes AS (SELECT doc_a AS node FROM pairs UNION SELECT doc_b FROM pairs),
       |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
       |          UNION SELECT doc_b, doc_a FROM pairs),
       |walk(node, lbl) AS (
       |  SELECT node, node FROM nodes
       |  UNION
       |  SELECT e.a, w.lbl FROM edges e JOIN walk w ON w.node = e.b)
       |SELECT node AS doc_id, min(lbl) AS cluster_id
       |FROM walk GROUP BY node""".stripMargin

  /** Generated oracle for d4: 60-bit simhash (bit j = sign of the vote
    * sum over distinct tokens), 4x15-bit pigeonhole chunks, Hamming <= 3.
    */
  private def d4Sql: String = {
    val votes = (0 until 60).map(j =>
      s"sum(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS v$j").mkString(",\n  ")
    val bits = (0 until 60).map(j =>
      s"(CASE WHEN v$j > 0 THEN ${1L << j} ELSE 0 END)").mkString(" +\n  ")
    val chunkIds = (0 until 4).mkString("[", ", ", "]")
    val chunkVals = (0 until 4).map(c =>
      s"(simhash >> ${c * 15}) & 32767").mkString("[", ", ", "]")
    s"""WITH tk AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS t
       |            FROM documents),
       |th AS (SELECT doc_id, ${h60("t")} AS h FROM tk),
       |v AS (SELECT doc_id,
       |  $votes
       |  FROM th GROUP BY doc_id),
       |sh AS (SELECT doc_id,
       |  $bits AS simhash
       |  FROM v),
       |ch AS (SELECT doc_id, simhash,
       |         unnest($chunkIds) AS chunk, unnest($chunkVals) AS cv
       |       FROM sh),
       |pr AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |         a.simhash AS ha, b.simhash AS hb
       |       FROM ch a JOIN ch b
       |         ON a.chunk = b.chunk AND a.cv = b.cv AND a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b, bit_count(xor(ha, hb))::INTEGER AS hamming
       |FROM pr WHERE bit_count(xor(ha, hb)) <= 3""".stripMargin
  }

  /** Generated oracle for d19: 120-bit simhash from the (lo, hi) md5
    * hash pair (hex chars 1-15 and 16-30), 4 disjoint chunk keys whose
    * width replays [[graft.operators.SimilaritySearch.autoBits]] from
    * count(*) (targetOccupancy 8, 30-bit region cap), Hamming <= 3 over
    * the full 120 bits. `length(bin(x))` = 64 - nlz(x) for x >= 1 —
    * the same integer-log trick the HLL oracle uses.
    */
  /** Shared d19/d20 CTE chain: 120-bit simhash per doc (`sh`) and the
    * adaptive chunk mask (`mk`).
    */
  private def simhash120Ctes: String = {
    val votesLo = (0 until 60).map(j =>
      s"sum(CASE WHEN (hlo >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS v$j").mkString(",\n  ")
    val votesHi = (0 until 60).map(j =>
      s"sum(CASE WHEN (hhi >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS w$j").mkString(",\n  ")
    val bitsLo = (0 until 60).map(j =>
      s"(CASE WHEN v$j > 0 THEN ${1L << j} ELSE 0 END)").mkString(" +\n  ")
    val bitsHi = (0 until 60).map(j =>
      s"(CASE WHEN w$j > 0 THEN ${1L << j} ELSE 0 END)").mkString(" +\n  ")
    s"""WITH tk AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS t
       |            FROM documents),
       |th AS (SELECT doc_id, ${h60("t")} AS hlo,
       |         ('0x' || substring(md5(t), 16, 15))::BIGINT AS hhi FROM tk),
       |v AS (SELECT doc_id,
       |  $votesLo,
       |  $votesHi
       |  FROM th GROUP BY doc_id),
       |sh AS (SELECT doc_id,
       |  $bitsLo AS sh_lo,
       |  $bitsHi AS sh_hi
       |  FROM v),
       |wb AS (SELECT CASE WHEN count(*) <= 8 THEN 1
       |         ELSE LEAST(30, length(bin((count(*) + 7) // 8 - 1))) END AS w
       |       FROM documents),
       |mk AS (SELECT ((1::BIGINT << w) - 1) AS msk FROM wb)""".stripMargin
  }

  // defs, not vals: the `sql` map is built during object init and these
  // are declared after it — a val would still be null when d19Sql/d20Sql
  // interpolate them (observed: `unnest(null)` in the emitted oracle)
  private def simhashChunkIds: String = (0 until 4).mkString("[", ", ", "]")
  private def simhashChunkVals: String = Seq(
    "sh_lo & msk", "(sh_lo >> 30) & msk", "sh_hi & msk", "(sh_hi >> 30) & msk")
    .mkString("[", ", ", "]")

  private def d19Sql: String =
    s"""$simhash120Ctes,
       |ch AS (SELECT doc_id, sh_lo, sh_hi,
       |         unnest($simhashChunkIds) AS chunk, unnest($simhashChunkVals) AS cv
       |       FROM sh, mk),
       |pr AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |         a.sh_lo AS ala, a.sh_hi AS aha, b.sh_lo AS bla, b.sh_hi AS bha
       |       FROM ch a JOIN ch b
       |         ON a.chunk = b.chunk AND a.cv = b.cv AND a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b,
       |  (bit_count(xor(ala, bla)) + bit_count(xor(aha, bha)))::INTEGER AS hamming
       |FROM pr WHERE bit_count(xor(ala, bla)) + bit_count(xor(aha, bha)) <= 3""".stripMargin

  /** Oracle for d20: d19's sketch collapsed to (sketch class, rep = min
    * id, multiplicity); within-class choose-2 weight rows plus distinct-
    * class pairs within Hamming <= 3 weighted na·nb.
    */
  private def d20Sql: String =
    s"""$simhash120Ctes,
       |cls AS (SELECT sh_lo, sh_hi, min(doc_id) AS rep, count(*) AS n
       |        FROM sh GROUP BY sh_lo, sh_hi),
       |ch AS (SELECT rep, n, sh_lo, sh_hi,
       |         unnest($simhashChunkIds) AS chunk, unnest($simhashChunkVals) AS cv
       |       FROM cls, mk),
       |pr AS (SELECT DISTINCT a.rep AS rep_a, b.rep AS rep_b, a.n AS na, b.n AS nb,
       |         a.sh_lo AS ala, a.sh_hi AS aha, b.sh_lo AS bla, b.sh_hi AS bha
       |       FROM ch a JOIN ch b
       |         ON a.chunk = b.chunk AND a.cv = b.cv AND a.rep < b.rep),
       |cr AS (SELECT rep_a, rep_b,
       |         (bit_count(xor(ala, bla)) + bit_count(xor(aha, bha)))::INTEGER AS hamming,
       |         (na * nb)::BIGINT AS weight
       |       FROM pr
       |       WHERE bit_count(xor(ala, bla)) + bit_count(xor(aha, bha)) <= 3),
       |ex AS (SELECT rep AS rep_a, rep AS rep_b, 0::INTEGER AS hamming,
       |         (n * (n - 1) // 2)::BIGINT AS weight
       |       FROM cls WHERE n >= 2)
       |SELECT * FROM ex UNION ALL SELECT * FROM cr""".stripMargin

  /** Generated oracle for e2 (nBits=4, seed 42, dim 64): the random
    * hyperplanes are drawn from the SAME seeded stream as the Spark
    * operator and interpolated as double literals (shortest round-trip
    * decimal form parses back to the identical double in DuckDB).
    */
  private def lshBucketExpr: String = {
    val planes = graft.operators.SimilaritySearch.hyperplanes(64, 4, 42)
    planes.zipWithIndex.map { case (pl, i) =>
      val lits = pl.map(_.toString).mkString("[", ", ", "]")
      s"(CASE WHEN list_dot_product(v, $lits) >= 0 THEN ${1 << i} ELSE 0 END)"
    }.mkString(" +\n  ")
  }

  /** e12 = e3's pair semantics restricted to bucket-mates under e2's
    * planes (nBits=4, seed 42): the LSH candidate+verify near-dup path,
    * deterministic because the buckets are.
    */
  private def e12Sql: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |b AS (SELECT vec_id, v,
       |  $lshBucketExpr AS bucket
       |  FROM e)
       |SELECT a.vec_id AS id_a, b2.vec_id AS id_b,
       |  round(list_dot_product(a.v, b2.v)
       |    / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b2.v, b2.v))), 4) AS cos_sim
       |FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
       |WHERE list_dot_product(a.v, b2.v)
       |    / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b2.v, b2.v))) >= 0.35""".stripMargin

  private def e2Sql: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |b AS (SELECT vec_id, v,
       |  $lshBucketExpr AS bucket
       |  FROM e),
       |q AS (SELECT v AS qv, bucket AS qb FROM b WHERE vec_id = 0)
       |SELECT b.vec_id,
       |  list_dot_product(b.v, q.qv)
       |    / (sqrt(list_dot_product(b.v, b.v)) * sqrt(list_dot_product(q.qv, q.qv))) AS cos_sim
       |FROM b, q WHERE b.bucket = q.qb
       |ORDER BY cos_sim DESC, b.vec_id
       |LIMIT 20""".stripMargin

  /** Batched multi-query ANN: three query vectors (vec_id 0,1,2), each
    * expanding to its 4 multi-probe buckets (ranked flip masks, as e6),
    * candidates bucket-joined, top-10 per query by (cos desc, vec_id).
    * Fully dynamic SQL — per-query margins and probe sets computed in
    * windows, no per-query duplication.
    */
  private def e9Sql: String = batchAnnSql("vec_id IN (0, 1, 2)")

  /** ev12 = e9's batch rule over the streamed query set (per-query
    * results are independent, so streaming output is batch-boundary
    * invariant; multi-batch evidence in StreamingAnnSpec).
    */
  private def ev12Sql: String = batchAnnSql("vec_id % 100 = 7")

  /** e18 = e9's probe with a corpus-side metadata predicate: the filter
    * applies BEFORE any distance (pre-filtering); queries stay
    * unfiltered.
    */
  private def e18Sql: String =
    batchAnnSql("vec_id IN (0, 1, 2)", corpusPred = "b.label % 3 = 1")

  /** c13/ev13 CDC upsert: derived change batch → latest-(version, op)
    * winner per key → SCD-1 merge onto the doc_id%4!=3 base. One SQL
    * for both because the streaming path's log-wide resolve is
    * batch-boundary invariant (argmax over appended winners).
    */
  // t25: K=3 BPE training stages as chained CTEs — wN applies stage N's
  // winning merge to the word table; DuckDB replace() is left-to-right
  // non-overlapping on the boundary-free '(a)(b)' encoding, exactly the
  // Spark side's rule.
  // shared by t25/t26: the word table + 3 BPE training stages; wN keeps
  // the word key so t26 can map final token counts back to documents
  private def bpeStagesSql: String = {
    def stage(i: Int, src: String): String =
      s"""p$i AS (
         |  SELECT l[i] AS lft, l[i + 1] AS rgt, sum(wc)::BIGINT AS n
         |  FROM (SELECT l, wc, unnest(generate_series(1, len(l) - 1)) AS i
         |        FROM (SELECT regexp_extract_all(seq, '\\(([^()]*)\\)', 1) AS l,
         |                     wc FROM $src))
         |  GROUP BY 1, 2),
         |m$i AS (SELECT lft, rgt, n FROM p$i ORDER BY n DESC, lft, rgt LIMIT 1),
         |w$i AS (SELECT w, replace(seq,
         |    '(' || (SELECT lft FROM m$i) || ')(' || (SELECT rgt FROM m$i) || ')',
         |    '(' || (SELECT lft FROM m$i) || (SELECT rgt FROM m$i) || ')') AS seq,
         |    wc FROM $src)""".stripMargin
    s"""words AS (
       |  SELECT w, regexp_replace(w, '(.)', '(\\1)', 'g') AS seq,
       |         count(*)::BIGINT AS wc
       |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE length(w) >= 2 AND regexp_matches(w, '^[a-z]+$$')
       |  GROUP BY 1),
       |${stage(1, "words")},
       |${stage(2, "w1")},
       |${stage(3, "w2")}""".stripMargin
  }

  private def bpeTrainSql: String =
    s"""WITH $bpeStagesSql
       |SELECT 1 AS merge_rank, lft AS "left", rgt AS "right", n FROM m1
       |UNION ALL SELECT 2, lft, rgt, n FROM m2
       |UNION ALL SELECT 3, lft, rgt, n FROM m3""".stripMargin

  private def bpeTokenizeSql: String =
    s"""WITH $bpeStagesSql,
       |dw AS (
       |  SELECT doc_id, w, count(*)::BIGINT AS cnt
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
       |        FROM documents)
       |  WHERE length(w) >= 2 AND regexp_matches(w, '^[a-z]+$$')
       |  GROUP BY 1, 2),
       |tok AS (
       |  SELECT w, len(regexp_extract_all(seq, '\\(([^()]*)\\)', 1))::BIGINT
       |           AS n_toks
       |  FROM w3)
       |SELECT doc_id, sum(cnt)::BIGINT AS n_words,
       |  sum(cnt * n_toks)::BIGINT AS n_bpe_tokens
       |FROM dw JOIN tok USING (w) GROUP BY 1""".stripMargin

  private def cdcUpsertSql: String = cdcUpsertSqlUpTo(2)

  /** Time-travel flavor: only the log prefix version <= maxV applies
    * (c21 reads the corpus AS OF version 1; c13/ev13 = full log).
    */
  /** The c13/ev13/c16/c21/c23 CDC fixture as a SQL CTE body. */
  private def docChangesCte: String =
    """changes0 AS (
      |  SELECT doc_id, upper(text) AS text, lang, source, n_chars,
      |         'U' AS op, 1 AS version
      |  FROM documents WHERE doc_id % 2 = 0
      |  UNION ALL
      |  SELECT doc_id, text, lang, source, n_chars, 'D', 2
      |  FROM documents WHERE doc_id % 6 = 0
      |  UNION ALL
      |  SELECT doc_id, text, lang, source, n_chars, 'I', 1
      |  FROM documents WHERE doc_id % 4 = 3
      |  UNION ALL
      |  SELECT doc_id, text || ' v2', lang, source, n_chars + 3, 'U', 2
      |  FROM documents WHERE doc_id % 12 = 7)""".stripMargin

  private def vacuumSql: String =
    s"""WITH $docChangesCte,
      |chks(chk) AS (VALUES (2)),
      |win AS (
      |  SELECT c.chk, ch.doc_id, max(ch.version) AS version
      |  FROM chks c JOIN changes0 ch ON ch.version <= c.chk
      |  GROUP BY 1, 2)
      |SELECT ch.doc_id, ch.op, ch.version::BIGINT AS version
      |FROM changes0 ch
      |WHERE ch.version <= 2 AND NOT EXISTS (
      |  SELECT 1 FROM win w
      |  WHERE w.doc_id = ch.doc_id AND w.version = ch.version)""".stripMargin

  private def cdcUpsertSqlUpTo(maxV: Int): String =
    s"""WITH $docChangesCte,
      |changes AS (SELECT * FROM changes0 WHERE version <= $maxV),
      |winners AS (
      |  SELECT * FROM changes
      |  QUALIFY row_number() OVER (
      |    PARTITION BY doc_id ORDER BY version DESC, op DESC) = 1)
      |SELECT doc_id, text, lang, source, n_chars
      |FROM documents
      |WHERE doc_id % 4 <> 3
      |  AND doc_id NOT IN (SELECT doc_id FROM winners)
      |UNION ALL
      |SELECT doc_id, text, lang, source, n_chars FROM winners
      |WHERE op <> 'D'""".stripMargin

  private def batchAnnSql(queryPred: String,
      corpusPred: String = "true"): String = {
    val planes = graft.operators.SimilaritySearch.hyperplanes(64, 4, 42)
    val planeLits = planes.map(_.map(_.toString).mkString("[", ", ", "]"))
    val margins = planeLits.zipWithIndex
      .map { case (l, i) => s"list_dot_product(v, $l) AS m$i" }.mkString(",\n  ")
    val flipCost = (0 until 4)
      .map(i => s"(CASE WHEN (mask.range & ${1 << i}) > 0 THEN abs(q.m$i) ELSE 0 END)")
      .mkString(" + ")
    s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
       |b AS (SELECT vec_id, label, v,
       |  $lshBucketExpr AS bucket
       |  FROM e),
       |q AS (SELECT vec_id AS qid, v AS qv, bucket AS qb,
       |  $margins
       |  FROM b WHERE $queryPred),
       |sel AS (SELECT least(16, (4 * count(*) + sum(CASE WHEN $corpusPred
       |    THEN 1 ELSE 0 END) - 1) // sum(CASE WHEN $corpusPred THEN 1
       |    ELSE 0 END)) AS np FROM b),
       |pm AS (
       |  SELECT q.qid, q.qv, xor(mask.range, q.qb) AS pb,
       |    row_number() OVER (PARTITION BY q.qid ORDER BY ($flipCost), mask.range) AS prk
       |  FROM q, range(0, 16) mask),
       |p AS (SELECT qid, qv, pb FROM pm WHERE prk <= (SELECT np FROM sel)),
       |cand AS (
       |  SELECT p.qid, b.vec_id,
       |    list_dot_product(b.v, p.qv)
       |      / (sqrt(list_dot_product(b.v, b.v)) * sqrt(list_dot_product(p.qv, p.qv))) AS cos
       |  FROM b JOIN p ON b.bucket = p.pb WHERE $corpusPred),
       |ranked AS (
       |  SELECT qid, vec_id, cos,
       |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rk
       |  FROM cand)
       |SELECT qid, vec_id, round(cos, 4) AS cos_sim
       |FROM ranked WHERE rk <= 10""".stripMargin
  }

  /** Recall@20 of the multi-probe LSH probe (nProbes=4) against the
    * exact top-20. The probe set mirrors SimilaritySearch.probeBuckets:
    * all 2^4 flip masks ranked by the total |margin| of flipped planes
    * (ties by mask), top 4, XOR'd onto the query bucket.
    */
  /** e11: PQ encode + ADC, fully relational — subvector slices for
    * corpus and codebook (codebook j = vec_id j+1's subvectors),
    * per-(vector, subspace) argmin by squared L2 (ties to the lowest
    * code — pqEncode's strict-< rule), query-to-centroid distance
    * table, approximate distance = the m lookups summed per vector.
    * Both engines rank on the ROUNDED distance (then vec_id) so the
    * top-k cut is float-order independent.
    */
  private def e11Sql: String = {
    val sq = "(s.sv[i] - c.sv[i]) * (s.sv[i] - c.sv[i])"
    val qsq = "(q.sv[i] - c.sv[i]) * (q.sv[i] - c.sv[i])"
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |sub AS (SELECT vec_id, mi.range AS mi,
       |  v[mi.range * 8 + 1 : mi.range * 8 + 8] AS sv
       |  FROM e, range(0, 8) mi),
       |cb AS (SELECT vec_id - 1 AS code, mi, sv FROM sub
       |  WHERE vec_id BETWEEN 1 AND 16),
       |assign AS (
       |  SELECT s.vec_id, s.mi, c.code,
       |    row_number() OVER (PARTITION BY s.vec_id, s.mi ORDER BY
       |      list_sum([$sq FOR i IN range(1, 9)]), c.code) AS rn
       |  FROM sub s JOIN cb c ON s.mi = c.mi),
       |dtab AS (
       |  SELECT c.mi, c.code,
       |    list_sum([$qsq FOR i IN range(1, 9)]) AS d
       |  FROM cb c JOIN sub q ON q.vec_id = 0 AND q.mi = c.mi),
       |adist AS (
       |  SELECT a.vec_id, round(sum(d.d), 6) AS adist
       |  FROM assign a JOIN dtab d ON a.mi = d.mi AND a.code = d.code
       |  WHERE a.rn = 1
       |  GROUP BY a.vec_id)
       |SELECT vec_id, adist FROM adist
       |ORDER BY adist, vec_id
       |LIMIT 20""".stripMargin
  }

  /** e13 = e4's coarse-cell rule composed with e11's PQ rule on the
    * RESIDUAL (v − cell centroid): cells and probed cells from
    * nearest-of-8 centroids by cosine (ties to lowest cid), residual
    * codes from argmin squared L2 to the 16 seed-derived codebook
    * entries per 8-dim subspace (ties to lowest code), adist = per-cell
    * query-residual distance table summed over the row's codes, rounded
    * to 6 before ranking (e11's cross-engine sum-order rule).
    */
  private def e13Sql: String = {
    val sq = "(s.sv[i] - c.sv[i]) * (s.sv[i] - c.sv[i])"
    val qsq = "(qr.sv[i] - cb.sv[i]) * (qr.sv[i] - cb.sv[i])"
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id BETWEEN 1 AND 8),
       |s0 AS (SELECT e.vec_id, c.cid,
       |  row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |    list_dot_product(e.v, c.cv)
       |      / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))) DESC,
       |    c.cid) AS rn
       |  FROM e CROSS JOIN c),
       |cell AS (SELECT vec_id, cid AS cell FROM s0 WHERE rn = 1),
       |probed AS (SELECT cid FROM (
       |  SELECT c.cid,
       |    row_number() OVER (ORDER BY
       |      list_dot_product(q.v, c.cv)
       |        / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.cv, c.cv))) DESC,
       |      c.cid) AS rn
       |  FROM e q CROSS JOIN c WHERE q.vec_id = 0) WHERE rn <= 2),
       |r AS (SELECT e.vec_id, cell.cell,
       |  [e.v[i] - c.cv[i] FOR i IN range(1, 65)] AS rv
       |  FROM e JOIN cell ON e.vec_id = cell.vec_id JOIN c ON c.cid = cell.cell
       |  WHERE cell.cell IN (SELECT cid FROM probed)),
       |rsub AS (SELECT vec_id, cell, mi.range AS mi,
       |  rv[mi.range * 8 + 1 : mi.range * 8 + 8] AS sv
       |  FROM r, range(0, 8) mi),
       |cb AS (SELECT vec_id - 1 AS code, mi.range AS mi,
       |  v[mi.range * 8 + 1 : mi.range * 8 + 8] AS sv
       |  FROM e, range(0, 8) mi WHERE vec_id BETWEEN 1 AND 16),
       |assign AS (
       |  SELECT s.vec_id, s.cell, s.mi, c.code,
       |    row_number() OVER (PARTITION BY s.vec_id, s.mi ORDER BY
       |      list_sum([$sq FOR i IN range(1, 9)]), c.code) AS rn
       |  FROM rsub s JOIN cb c ON s.mi = c.mi),
       |qres AS (SELECT p.cid AS cell,
       |  [q.v[i] - c.cv[i] FOR i IN range(1, 65)] AS rv
       |  FROM e q, probed p, c WHERE q.vec_id = 0 AND c.cid = p.cid),
       |qrsub AS (SELECT cell, mi.range AS mi,
       |  rv[mi.range * 8 + 1 : mi.range * 8 + 8] AS sv
       |  FROM qres, range(0, 8) mi),
       |dtab AS (SELECT qr.cell, qr.mi, cb.code,
       |  list_sum([$qsq FOR i IN range(1, 9)]) AS d
       |  FROM qrsub qr JOIN cb ON qr.mi = cb.mi),
       |adist AS (
       |  SELECT a.vec_id, round(sum(d.d), 6) AS adist
       |  FROM assign a JOIN dtab d ON a.cell = d.cell AND a.mi = d.mi AND a.code = d.code
       |  WHERE a.rn = 1
       |  GROUP BY a.vec_id)
       |SELECT vec_id, adist FROM adist
       |ORDER BY adist, vec_id
       |LIMIT 20""".stripMargin
  }

  /** e10: the 3-round Lloyd loop unrolled — per-round rounding to 6
    * decimals pins each round's centroid table cross-engine, so round
    * i+1's assignment sees bit-identical centroids in both engines
    * (the same contract that keeps e5 green, iterated). Assignment =
    * nearest-of-K by cosine, ties to the lowest centroid id, exactly
    * kmeansStep's rule.
    */
  private def e10Sql: String = {
    val assign = (src: String, cents: String) =>
      s"""(SELECT e.vec_id, c.cid,
         |  row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |    list_dot_product(e.v, c.cv)
         |      / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))) DESC,
         |    c.cid) AS rn
         |  FROM e CROSS JOIN $cents c)""".stripMargin
    val iter = (i: Int) =>
      s"""s$i AS ${assign("e", s"c${i - 1}")},
         |m$i AS (SELECT s.cid AS cell, x.dim, round(avg(x.x), 6) AS mean
         |  FROM s$i s JOIN xv x ON s.vec_id = x.vec_id
         |  WHERE s.rn = 1 GROUP BY s.cid, x.dim),
         |c$i AS (SELECT cell AS cid, list(mean ORDER BY dim) AS cv FROM m$i GROUP BY cell)""".stripMargin
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |xv AS (SELECT vec_id, unnest(range(1, len(v) + 1)) AS dim, unnest(v) AS x FROM e),
       |c0 AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id BETWEEN 1 AND 8),
       |${iter(1)},
       |${iter(2)},
       |${iter(3)}
       |SELECT cell, dim, mean FROM m3""".stripMargin
  }

  /** Recall@20 of a compressed ranker against the exact cosine top-20
    * (the e6 pattern applied to e11/e13): the ranker's own statement is
    * nested as a derived CTE — its inner `e` shadows the outer one —
    * and recall = |approx ∩ exact| / 20.
    */
  private def recallVsExactSql(approxSql: String): String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
       |exact AS (
       |  SELECT e.vec_id FROM e, q
       |  ORDER BY list_dot_product(e.v, q.qv)
       |      / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))) DESC,
       |    e.vec_id
       |  LIMIT 20),
       |approx AS ($approxSql)
       |SELECT round(count(*) / 20.0, 4) AS recall
       |FROM exact JOIN approx USING (vec_id)""".stripMargin

  private def e6Sql: String = e6SqlWithPred("true")

  /** e19 = e6's recall artifact with the e18 corpus predicate on BOTH
    * sides (exact truth and probe restricted to the same survivor set),
    * recording that pre-filtering does not cost the probe recall.
    */
  private def e19Sql: String = e6SqlWithPred("label % 3 = 1")

  private def e6SqlWithPred(corpusPred: String): String = {
    val planes = graft.operators.SimilaritySearch.hyperplanes(64, 4, 42)
    val planeLits = planes.map(_.map(_.toString).mkString("[", ", ", "]"))
    val margins = planeLits.zipWithIndex
      .map { case (l, i) => s"list_dot_product(v, $l) AS m$i" }.mkString(",\n  ")
    val flipCost = (0 until 4)
      .map(i => s"(CASE WHEN (mask.range & ${1 << i}) > 0 THEN abs(q.m$i) ELSE 0 END)")
      .mkString(" + ")
    s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
       |b AS (SELECT vec_id, label, v,
       |  $lshBucketExpr AS bucket
       |  FROM e),
       |q AS (SELECT v AS qv, bucket AS qb,
       |  $margins
       |  FROM b WHERE vec_id = 0),
       |sel AS (SELECT least(16, (4 * count(*) + sum(CASE WHEN $corpusPred
       |    THEN 1 ELSE 0 END) - 1) // sum(CASE WHEN $corpusPred THEN 1
       |    ELSE 0 END)) AS np FROM b),
       |pm AS (
       |  SELECT xor(mask.range, q.qb) AS pb,
       |    row_number() OVER (ORDER BY ($flipCost), mask.range) AS prk
       |  FROM range(0, 16) mask, q),
       |p AS (SELECT pb FROM pm WHERE prk <= (SELECT np FROM sel)),
       |exact AS (
       |  SELECT e.vec_id FROM e, q WHERE $corpusPred
       |  ORDER BY list_dot_product(e.v, q.qv)
       |      / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))) DESC,
       |    e.vec_id
       |  LIMIT 20),
       |ann AS (
       |  SELECT b.vec_id FROM b, q WHERE b.bucket IN (SELECT pb FROM p)
       |    AND $corpusPred
       |  ORDER BY list_dot_product(b.v, q.qv)
       |      / (sqrt(list_dot_product(b.v, b.v)) * sqrt(list_dot_product(q.qv, q.qv))) DESC,
       |    b.vec_id
       |  LIMIT 20)
       |SELECT round(count(*) / 20.0, 4) AS recall
       |FROM exact JOIN ann USING (vec_id)""".stripMargin
  }
}
