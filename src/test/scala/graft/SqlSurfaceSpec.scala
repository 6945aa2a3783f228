package graft

/** The spark.sql surface over registered views + native functions. */
class SqlSurfaceSpec extends SparkSpec {

  test("registered views answer plain SQL with pushdown intact") {
    Tables.createViews(spark, sfDir)
    val df = spark.sql(
      """SELECT c_name, count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderstatus = 'F'
        |GROUP BY c_name ORDER BY total DESC LIMIT 5""".stripMargin)
    assert(df.count() == 5)
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("o_orderstatus"))
  }

  test("vec_dot is callable from SQL over the embeddings view") {
    Tables.createViews(spark, sfDir)
    val row = spark.sql(
      """SELECT round(sum(vec_dot(CAST(embedding AS ARRAY<DOUBLE>),
        |                        CAST(embedding AS ARRAY<DOUBLE>))), 1) AS s
        |FROM embeddings""".stripMargin).collect().head
    // embeddings are unit vectors: sum of self-dots == row count
    assert(row.getDouble(0) == Tables.embeddings(spark, sfDir).count().toDouble)
  }

  test("events view exposes microsecond timestamps through SQL") {
    Tables.createViews(spark, sfDir)
    val n = spark.sql(
      "SELECT count(*) FROM events WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'")
      .collect().head.getLong(0)
    assert(n == Tables.events(spark, sfDir).count())
  }

  test("zorder16 and word_shingles are callable from SQL") {
    Tables.createViews(spark, sfDir)
    // Morton key: interleave(3, 5) = bits 11 and 101 interleaved
    // -> 100111 = 39 (b in odd positions, a in even)
    val z = spark.sql("SELECT zorder16(3L, 5L) AS z").collect().head.getLong(0)
    assert(z == 39L, s"zorder16(3,5) = $z")
    val sh = spark.sql(
      "SELECT word_shingles('a b c d', 3) AS s").collect().head.getSeq[String](0)
    assert(sh == Seq("a b c", "b c d"))
  }

  /** The two front doors pinned together: for each sampled declared
    * query, the equivalent ANSI SQL typed by a user against
    * `Tables.createViews` must return EXACTLY the DataFrame API's
    * rows — same Catalyst underneath, so any divergence means a view
    * definition, a registered function, or an operator's SQL story
    * broke. The SQL texts mirror each operator's documented semantics
    * (decimal-staged sums, (ts, key) tiebreaks, floor division). */
  private val sqlMirrors: Map[String, String] = Map(
    "q_group_agg" ->
      """SELECT user_id, event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_value,
        |  min(value) AS min_value, max(value) AS max_value
        |FROM events GROUP BY user_id, event_type
        |ORDER BY user_id, event_type""".stripMargin,
    "q_distinct" ->
      "SELECT DISTINCT l_orderkey FROM lineitem ORDER BY l_orderkey",
    "q_rollup" ->
      """SELECT CAST(grouping_id(o_year, o_month) AS BIGINT) AS gid,
        |  o_year, o_month, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
        |FROM (SELECT year(o_orderdate) AS o_year, month(o_orderdate) AS o_month,
        |        o_totalprice FROM orders)
        |GROUP BY ROLLUP(o_year, o_month)
        |ORDER BY gid, o_year NULLS FIRST, o_month NULLS FIRST""".stripMargin,
    "q_cube" ->
      """SELECT CAST(grouping_id(o_year, o_month) AS BIGINT) AS gid,
        |  o_year, o_month, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
        |FROM (SELECT year(o_orderdate) AS o_year, month(o_orderdate) AS o_month,
        |        o_totalprice FROM orders)
        |GROUP BY CUBE(o_year, o_month)
        |ORDER BY gid, o_year NULLS FIRST, o_month NULLS FIRST""".stripMargin,
    "q_topk_per_group" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  l_extendedprice, rn FROM (
        |  SELECT l_orderkey, l_linenumber, l_extendedprice,
        |    row_number() OVER (PARTITION BY l_orderkey
        |      ORDER BY l_extendedprice DESC, l_linenumber) AS rn
        |  FROM lineitem)
        |WHERE rn <= 3 ORDER BY l_orderkey, rn""".stripMargin,
    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  row_number() OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey) AS rn
        |FROM orders ORDER BY o_custkey, rn""".stripMargin,
    "q_union_except" ->
      """(SELECT o_orderkey, 'live' AS status FROM orders WHERE o_orderstatus <> 'F'
        | UNION ALL
        | SELECT o_orderkey, 'dead' AS status FROM orders WHERE o_orderstatus = 'F')
        |EXCEPT
        |SELECT o_orderkey, 'live' AS status FROM orders WHERE o_totalprice > 200000.0
        |ORDER BY o_orderkey, status""".stripMargin,
    "q_intersect" ->
      """SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderstatus <> 'F'
        |INTERSECT
        |SELECT o_orderkey, o_orderpriority FROM orders WHERE o_totalprice > 150000.0
        |ORDER BY o_orderkey, o_orderpriority""".stripMargin,
    "q_brand_sales" ->
      """SELECT p_brand, count(*) AS n_items,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))
        |       * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q_star_join" ->
      """SELECT r_name, n_name, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "q_tpch_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))
        |       * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS n_rows,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_qty
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_tpch_custdist" ->
      """WITH co AS (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey)
        |SELECT c_count, count(*) AS custdist
        |FROM co GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q_merge_stats" ->
      """WITH s AS (
        |  SELECT ascii(substr(md5(concat('stats:', doc_id)), 1, 1)) % 8 AS shard,
        |    count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS sx,
        |    CAST(sum(n_chars * n_chars) AS BIGINT) AS sxx
        |  FROM documents GROUP BY shard),
        |u AS (
        |  SELECT concat('shard_', shard) AS scope, n, sx, sxx FROM s
        |  UNION ALL
        |  SELECT 'merged', CAST(sum(n) AS BIGINT), CAST(sum(sx) AS BIGINT),
        |    CAST(sum(sxx) AS BIGINT) FROM s)
        |SELECT scope, n, sx, sxx, sx div n AS mean_int,
        |  (n * sxx - sx * sx) div (n * n) AS var_int
        |FROM u ORDER BY scope""".stripMargin,
    "q_ks_test" ->
      """WITH c AS (
        |  SELECT source, n_chars, count(*) AS c FROM documents
        |  GROUP BY source, n_chars),
        |filled AS (
        |  SELECT s.source, g.n_chars, COALESCE(c.c, 0) AS c
        |  FROM (SELECT DISTINCT source FROM documents) s
        |  CROSS JOIN (SELECT DISTINCT n_chars FROM documents) g
        |  LEFT JOIN c ON c.source = s.source AND c.n_chars = g.n_chars),
        |cdf AS (
        |  SELECT f.source, f.n_chars,
        |    sum(f.c) OVER (PARTITION BY f.source ORDER BY f.n_chars) AS cum,
        |    t.n_total
        |  FROM filled f
        |  JOIN (SELECT source, count(*) AS n_total FROM documents
        |        GROUP BY source) t ON f.source = t.source)
        |SELECT x.source AS source_a, y.source AS source_b,
        |  (max(abs(x.cum * y.n_total - y.cum * x.n_total)) * 1000000)
        |    div (max(x.n_total) * max(y.n_total)) AS ks_ppm
        |FROM cdf x JOIN cdf y
        |  ON x.n_chars = y.n_chars AND x.source < y.source
        |GROUP BY x.source, y.source
        |ORDER BY source_a, source_b""".stripMargin,
    "q_spearman" ->
      """WITH b AS (
        |  SELECT event_type, value, CAST(length(props) AS BIGINT) AS plen
        |  FROM events),
        |r AS (
        |  SELECT event_type,
        |    2 * rank() OVER (PARTITION BY event_type ORDER BY value)
        |      + count(*) OVER (PARTITION BY event_type, value) - 1
        |      - (count(*) OVER (PARTITION BY event_type) + 1) AS cx,
        |    2 * rank() OVER (PARTITION BY event_type ORDER BY plen)
        |      + count(*) OVER (PARTITION BY event_type, plen) - 1
        |      - (count(*) OVER (PARTITION BY event_type) + 1) AS cy
        |  FROM b),
        |a AS (
        |  SELECT event_type, count(*) AS n, sum(cx * cy) AS sxy,
        |    sum(cx * cx) AS sxx, sum(cy * cy) AS syy
        |  FROM r GROUP BY event_type)
        |SELECT event_type, n,
        |  round(CASE WHEN sxx = 0 OR syy = 0 THEN NULL
        |    ELSE CAST(sxy AS DOUBLE)
        |      / (sqrt(CAST(sxx AS DOUBLE)) * sqrt(CAST(syy AS DOUBLE)))
        |  END, 6) AS spearman
        |FROM a ORDER BY event_type""".stripMargin,
    // --- round-7 batch: custom-expression families first (vec_dot,
    // zorder16, the interval aggregator's window form), then the
    // join/window/dedup staples a SQL user would type daily. ---
    "q_cosine_topk" ->
      """SELECT probe_id, vec_id, round(cos, 4) AS cos_sim, rn FROM (
        |  SELECT probe_id, vec_id, cos,
        |    row_number() OVER (PARTITION BY probe_id
        |      ORDER BY cos DESC, vec_id) AS rn
        |  FROM (
        |    SELECT p.vec_id AS probe_id, c.vec_id AS vec_id,
        |      vec_dot(CAST(p.embedding AS ARRAY<DOUBLE>),
        |              CAST(c.embedding AS ARRAY<DOUBLE>))
        |        / (sqrt(vec_dot(CAST(p.embedding AS ARRAY<DOUBLE>),
        |                        CAST(p.embedding AS ARRAY<DOUBLE>)))
        |           * sqrt(vec_dot(CAST(c.embedding AS ARRAY<DOUBLE>),
        |                          CAST(c.embedding AS ARRAY<DOUBLE>)))) AS cos
        |    FROM embeddings p JOIN embeddings c
        |      ON p.vec_id < 5 AND c.vec_id <> p.vec_id))
        |WHERE rn <= 5 ORDER BY probe_id, rn""".stripMargin,
    "q_zorder_layout" ->
      """SELECT file_id, count(*) AS n_rows,
        |  min(pk) AS min_pk, max(pk) AS max_pk,
        |  min(day) AS min_day, max(day) AS max_day
        |FROM (
        |  SELECT pk, day, shiftright(zorder16(pk, day), 22) AS file_id FROM (
        |    SELECT CAST(l_partkey AS BIGINT) AS pk,
        |      CAST(datediff(CAST(l_shipdate AS DATE), DATE '1992-01-01')
        |        AS BIGINT) AS day
        |    FROM lineitem))
        |GROUP BY file_id ORDER BY file_id""".stripMargin,
    "q_interval_merge" ->
      """SELECT user_id, merged_start, merged_end, n_chunks FROM (
        |  SELECT user_id, island, min(ts) AS merged_start,
        |    max(iv_end) AS merged_end, count(*) AS n_chunks
        |  FROM (
        |    SELECT user_id, event_id, ts, iv_end,
        |      sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |    FROM (
        |      SELECT user_id, event_id, ts,
        |        ts + INTERVAL 300 SECONDS AS iv_end,
        |        CASE WHEN max(ts + INTERVAL 300 SECONDS)
        |            OVER (PARTITION BY user_id ORDER BY ts, event_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
        |          OR ts > max(ts + INTERVAL 300 SECONDS)
        |            OVER (PARTITION BY user_id ORDER BY ts, event_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |          THEN 1 ELSE 0 END AS is_new
        |      FROM events))
        |  GROUP BY user_id, island)
        |ORDER BY user_id, merged_start""".stripMargin,
    "q_exact_dedup" ->
      """SELECT user_id, event_type, value, min(event_id) AS keep_event_id,
        |  count(*) AS n_dups
        |FROM events GROUP BY user_id, event_type, value
        |ORDER BY user_id, event_type, value""".stripMargin,
    "q_text_stats" ->
      """SELECT lang, source, count(*) AS n_docs, sum(n_chars) AS sum_chars,
        |  round(avg(n_chars), 4) AS avg_chars,
        |  min(n_chars) AS min_chars, max(n_chars) AS max_chars
        |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin,
    "q_tumbling_daily" ->
      """SELECT window.start AS w_start, window.end AS w_end, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY window(ts, '1 day') ORDER BY w_start""".stripMargin,
    "q_sliding_window" ->
      """SELECT window.start AS w_start, window.end AS w_end, count(*) AS n
        |FROM events GROUP BY window(ts, '1 hour', '30 minutes')
        |ORDER BY w_start""".stripMargin,
    "q_session_window" ->
      """SELECT user_id, session_window.start AS s_start,
        |  session_window.end AS s_end, count(*) AS n
        |FROM events GROUP BY session_window(ts, '5 minutes'), user_id
        |ORDER BY user_id, s_start""".stripMargin,
    "q_lookup_join" ->
      """SELECT o_orderkey, c_name, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,
    "q_lookup_misses" ->
      """SELECT o_orderkey, o_custkey FROM orders o
        |WHERE NOT EXISTS (SELECT 1 FROM customer c
        |  WHERE c.c_nationkey < 10 AND c.c_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin,
    "q_anti_dedup" ->
      """SELECT o_orderkey FROM orders o
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem l
        |  WHERE l.l_orderkey = o.o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,
    "q_semi_present" ->
      """SELECT o_orderkey, o_totalprice FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |  WHERE l.l_orderkey = o.o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,
    "q_gap_detect" ->
      """SELECT user_id, event_id, prev_ts, ts, gap_us FROM (
        |  SELECT user_id, event_id,
        |    lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev_ts,
        |    ts,
        |    unix_micros(ts) - unix_micros(lag(ts, 1)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
        |  FROM events)
        |WHERE gap_us > 300000000 ORDER BY user_id, event_id""".stripMargin,
    "q_minmax_norm" ->
      """SELECT event_id, e.event_type,
        |  CASE WHEN st.v_max = st.v_min THEN CAST(0.0 AS DOUBLE)
        |    ELSE (e.value - st.v_min) / (st.v_max - st.v_min)
        |  END AS norm_value
        |FROM events e JOIN (
        |  SELECT event_type, min(value) AS v_min, max(value) AS v_max
        |  FROM events GROUP BY event_type) st
        |  ON e.event_type = st.event_type
        |ORDER BY event_id""".stripMargin,
    "q_zscore_outliers" ->
      """SELECT event_type, event_id, value, round(mean, 4) AS mean,
        |  round(std, 4) AS std, round(z, 4) AS z
        |FROM (
        |  SELECT e.event_type, e.event_id, e.value, st.mean, st.std,
        |    (e.value - st.mean) / st.std AS z
        |  FROM events e JOIN (
        |    SELECT event_type,
        |      CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*)
        |        AS mean,
        |      sqrt((CAST(sum(CAST(value * value AS DECIMAL(18,6))) AS DOUBLE)
        |        - CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
        |          * CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
        |          / count(*))
        |        / (count(*) - 1)) AS std
        |    FROM events GROUP BY event_type) st
        |    ON e.event_type = st.event_type)
        |WHERE abs(z) > 2.5 ORDER BY event_type, event_id""".stripMargin,
    "q_value_histogram" ->
      """SELECT event_type, bin, bin * 25.0 AS bin_lo, (bin + 1) * 25.0 AS bin_hi, n
        |FROM (
        |  SELECT event_type,
        |    CAST(least(floor(value / 25.0), 19) AS BIGINT) AS bin,
        |    count(*) AS n
        |  FROM events
        |  GROUP BY event_type, CAST(least(floor(value / 25.0), 19) AS BIGINT))
        |ORDER BY event_type, bin""".stripMargin,
    // the four round-10 mirrors: oracles one semantic step past the
    // mechanical chain — percentile_disc needs an explicit BIGINT cast
    // (Spark types it DOUBLE, DuckDB keeps the element type), and the
    // large-orders timestamp must stay NTZ (Spark's bare TIMESTAMP
    // cast is LTZ)
    "q_funnel_time" ->
      """WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |v AS (SELECT user_id, min(ts) AS first_view FROM e
        |      WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.ts) AS first_click
        |      FROM e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts > v.first_view GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.ts) AS first_purchase
        |      FROM e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts > c.first_click GROUP BY e.user_id),
        |deltas AS (
        |  SELECT 'view_to_click' AS transition,
        |    unix_micros(c.first_click) - unix_micros(v.first_view) AS delta_us
        |  FROM v JOIN c ON v.user_id = c.user_id
        |  UNION ALL
        |  SELECT 'click_to_purchase' AS transition,
        |    unix_micros(p.first_purchase) - unix_micros(c.first_click) AS delta_us
        |  FROM c JOIN p ON c.user_id = p.user_id)
        |SELECT transition, count(*) AS n_converted,
        |  min(delta_us) AS min_us,
        |  CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY delta_us) AS BIGINT)
        |    AS median_us,
        |  max(delta_us) AS max_us
        |FROM deltas GROUP BY transition ORDER BY transition""".stripMargin,
    "q_order_latency" ->
      """SELECT o_orderpriority, count(*) AS n_lines,
        |  min(lat_days) AS min_days,
        |  CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY lat_days) AS BIGINT)
        |    AS median_days,
        |  CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY lat_days) AS BIGINT)
        |    AS p90_days,
        |  max(lat_days) AS max_days
        |FROM (
        |  SELECT o_orderpriority,
        |    datediff(DAY, CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))
        |      AS lat_days
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_session_stats" ->
      """WITH e AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
        |    unix_micros(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |g AS (
        |  SELECT user_id, event_id, ts, us,
        |    CASE WHEN lag(us) OVER w IS NULL
        |           OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_sess
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, us, ts, event_id,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM g),
        |sess AS (
        |  SELECT user_id, session_id, count(*) AS n_events,
        |    max(us) - min(us) AS duration_us
        |  FROM s GROUP BY user_id, session_id)
        |SELECT count(*) AS n_sessions,
        |  count(DISTINCT user_id) AS n_users,
        |  count(*) FILTER (WHERE n_events = 1) AS n_single_event,
        |  CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY n_events) AS BIGINT)
        |    AS median_events,
        |  CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY duration_us) AS BIGINT)
        |    AS median_duration_us,
        |  max(duration_us) AS max_duration_us
        |FROM sess""".stripMargin,
    "q_tpch_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey,
        |    CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS STRING) AS DOUBLE)
        |      AS total_qty
        |  FROM lineitem GROUP BY 1
        |  HAVING CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS STRING) AS DOUBLE)
        |    > 260.0)
        |SELECT c_custkey, c_name, o_orderkey,
        |  CAST(o_orderdate AS TIMESTAMP_NTZ) AS o_orderdate, total_qty
        |FROM big
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY total_qty DESC, o_orderkey LIMIT 20""".stripMargin)

  test(s"SQL-surface parity: ${sqlMirrors.size} declared queries return identical rows through plain SQL") {
    Tables.createViews(spark, sfDir)
    graft.functions.GraftFunctions.register(spark)
    sqlMirrors.foreach { case (name, sqlText) =>
      val viaApi = SparkEntry.queries(name)(spark, sfDir)
      val viaSql = spark.sql(sqlText)
      assert(viaApi.columns.toSeq == viaSql.columns.toSeq,
        s"$name: column names diverge (${viaApi.columns.mkString(",")} vs ${viaSql.columns.mkString(",")})")
      val a = viaApi.collect().map(_.toString).sorted
      val b = viaSql.collect().map(_.toString).sorted
      assert(a.length == b.length, s"$name: ${a.length} vs ${b.length} rows")
      assert(a.sameElements(b), s"$name: SQL surface diverged from the DataFrame result")
      spark.catalog.clearCache()
    }
  }

  /** The second front-door sweep: these declared queries' ORACLE texts
    * are pure ANSI — no DuckDB-ism (list comprehensions, `//`,
    * strftime, string_split_regex) — so the exact SQL the DuckDB gate
    * runs ALSO runs verbatim through `spark.sql` over the registered
    * views. Pinning them row-identical to the DataFrame API means one
    * SQL text is simultaneously: the cross-engine oracle, the Spark
    * SQL user's query, and the operator's documented semantics. A
    * DuckDB-only construct creeping into one of these oracles fails
    * here loudly (portability is part of the contract). Names were
    * triaged mechanically (Scratch sqlscan) and pinned explicitly so
    * additions are intentional. */
  private val portableOracles: Seq[String] = Seq(
    "q_anti_dedup", "q_asof_dim_enrich", "q_asof_forward", "q_asof_latest",
    "q_asof_merge", "q_asof_native", "q_asof_window", "q_bloom_dedup",
    "q_buffered_bounds", "q_cdc_apply", "q_changepoint", "q_chi2_test",
    "q_chunk_explode", "q_class_weights", "q_completeness", "q_cross_dims",
    "q_csv_config", "q_curriculum", "q_daily_anomaly", "q_data_split",
    "q_dataset_card", "q_distinct", "q_distinct_approx", "q_dq_audit",
    "q_dup_rate_by_source", "q_epoch_shuffle", "q_event_transitions",
    "q_ewma", "q_exact_dedup", "q_fd_discovery", "q_full_outer", "q_funnel",
    "q_group_agg", "q_group_agg_salted", "q_group_sample", "q_grouping_sets",
    "q_heavy_hitters", "q_intersect", "q_interval_merge", "q_ivm_merge",
    "q_json_config", "q_key_width", "q_label_prop", "q_lookup_join",
    "q_lookup_misses", "q_merge_upsert", "q_minmax_norm", "q_mix_weights",
    "q_mutual_info", "q_ntile_cume", "q_null_semantics", "q_onehot",
    "q_orc_roundtrip", "q_partition_prune", "q_pit_features", "q_pivot",
    "q_psi_drift", "q_range_join", "q_recommend", "q_rolling_stats",
    "q_scd2", "q_schema_profile", "q_semi_present", "q_session_window",
    "q_shard_assign", "q_skew_join_salted", "q_skew_profile", "q_skyline",
    "q_small_cells", "q_snapshot_diff", "q_spearman", "q_star_join",
    "q_stratified_sample", "q_supplier_diversity", "q_surrogate_key",
    "q_text_lines", "q_text_stats", "q_theta_overlap", "q_topk_agg",
    "q_topk_per_group", "q_tpch_custdist", "q_tpch_dormant",
    "q_tpch_priority", "q_tpch_sole_fault", "q_triangles",
    "q_tumbling_daily", "q_union_except", "q_unpivot", "q_upsert_compact",
    "q_value_histogram", "q_window_rank", "q_xml_config", "q_zscore_outliers")

  test(s"SQL-surface parity: ${portableOracles.size} oracle texts are ANSI-portable and row-identical through spark.sql") {
    Tables.createViews(spark, sfDir)
    graft.functions.GraftFunctions.register(spark)
    portableOracles.foreach { name =>
      val viaApi = SparkEntry.queries(name)(spark, sfDir)
      val viaSql = spark.sql(SparkEntry.oracleSql(name))
      assert(viaApi.columns.toSeq == viaSql.columns.toSeq,
        s"$name: column names diverge (${viaApi.columns.mkString(",")} vs ${viaSql.columns.mkString(",")})")
      val a = viaApi.collect().map(_.toString).sorted
      val b = viaSql.collect().map(_.toString).sorted
      assert(a.length == b.length, s"$name: ${a.length} vs ${b.length} rows")
      assert(a.sameElements(b), s"$name: oracle text through spark.sql diverged from the DataFrame result")
      spark.catalog.clearCache()
    }
  }

  /** One dialect token away from portable: these oracles' ONLY
    * DuckDB-ism is floor division `//`, which is Spark's `div` —
    * identical on the non-negative operands every one of these uses
    * (q_seasonal_profile, whose dividend can be negative and floor ≠
    * trunc, is deliberately absent). Covers the graph family the
    * hand-written mirrors never reached: q_pagerank (10 unrolled
    * power-iteration CTEs), q_graph_insights (3-round LPA + community
    * rollup), q_assortativity, q_degree_dist. */
  private val divPortableOracles: Seq[String] = Seq(
    "q_ab_test", "q_assortativity", "q_degree_dist", "q_drift_bins",
    "q_gini_concentration", "q_graph_insights", "q_hhi_concentration",
    "q_join_card_est", "q_ks_test", "q_mannwhitney", "q_market_basket",
    "q_merge_stats", "q_pagerank", "q_path_trigrams", "q_temporal_split",
    "q_user_entropy")

  test(s"SQL-surface parity: ${divPortableOracles.size} more oracle texts are portable modulo '//' = div") {
    Tables.createViews(spark, sfDir)
    graft.functions.GraftFunctions.register(spark)
    divPortableOracles.foreach { name =>
      val viaApi = SparkEntry.queries(name)(spark, sfDir)
      val viaSql = spark.sql(SparkEntry.oracleSql(name).replace("//", " div "))
      assert(viaApi.columns.toSeq == viaSql.columns.toSeq,
        s"$name: column names diverge (${viaApi.columns.mkString(",")} vs ${viaSql.columns.mkString(",")})")
      val a = viaApi.collect().map(_.toString).sorted
      val b = viaSql.collect().map(_.toString).sorted
      assert(a.length == b.length, s"$name: ${a.length} vs ${b.length} rows")
      assert(a.sameElements(b), s"$name: translated oracle through spark.sql diverged")
      spark.catalog.clearCache()
    }
  }

  /** The fourth sweep: oracles whose only dialect-isms are FUNCTION
    * NAMES with a Spark builtin of identical semantics on these
    * inputs — `string_split_regex`→`split` (both regex-split keeping
    * empties), `epoch_us`→`unix_micros` (µs since epoch as BIGINT),
    * `quantile_cont`→`percentile` (both linear-interpolated exact
    * quantiles), `strftime`→`date_format` with the two format
    * literals the corpus uses mapped per-pattern, plus `//`→`div`.
    * Triaged mechanically (Scratch sqlscan chance-3); every name here
    * was verified row-identical, so the rename table itself is pinned:
    * a Spark release changing any of these builtins' semantics fails
    * here before it fails at a user. */
  private def renameTranslate(s: String): String = s
    .replace("//", " div ")
    .replace("string_split_regex(", "split(")
    .replace("epoch_us(", "unix_micros(")
    .replace("quantile_cont(", "percentile(")
    .replace("strftime(", "date_format(")
    .replace("'%Y-%m-%d'", "'yyyy-MM-dd'")
    .replace("'%Y%m%dT%H%M%S'", "'yyyyMMdd''T''HHmmss'")

  private val renamePortableOracles: Seq[String] = Seq(
    "q_asof_nearest", "q_autocorr", "q_compaction_nfd", "q_compaction_plan",
    "q_cross_corr", "q_cumulative_users", "q_filename_inventory",
    "q_freshness", "q_gap_detect", "q_interval_audit", "q_mad_outliers",
    "q_percentiles", "q_percentiles_approx", "q_pit_rolling",
    "q_rolling_time", "q_sessionize", "q_window_suite", "q_winsorize")

  test(s"SQL-surface parity: ${renamePortableOracles.size} more oracle texts are portable modulo mechanical function renames") {
    Tables.createViews(spark, sfDir)
    graft.functions.GraftFunctions.register(spark)
    renamePortableOracles.foreach { name =>
      val viaApi = SparkEntry.queries(name)(spark, sfDir)
      val viaSql = spark.sql(renameTranslate(SparkEntry.oracleSql(name)))
      assert(viaApi.columns.toSeq == viaSql.columns.toSeq,
        s"$name: column names diverge (${viaApi.columns.mkString(",")} vs ${viaSql.columns.mkString(",")})")
      val a = viaApi.collect().map(_.toString).sorted
      val b = viaSql.collect().map(_.toString).sorted
      assert(a.length == b.length, s"$name: ${a.length} vs ${b.length} rows")
      assert(a.sameElements(b), s"$name: renamed oracle through spark.sql diverged")
      spark.catalog.clearCache()
    }
  }

  /** The fifth sweep (round 10): oracles portable through the FULL
    * SqlTranslate chain — the shared mechanical DuckDB→Spark rename
    * table grown this round with unnest→explode, list_filter→filter,
    * literal-backslash escaping (DuckDB raw strings vs Spark escape
    * processing), 1-based [i]/[a:b] indexing → element_at/slice,
    * FILTER(cond)→FILTER(WHERE), string_agg(… ORDER BY)→WITHIN GROUP,
    * quantile_disc→percentile_disc, dow −1 shift, scalar range→
    * sequence(b−1), numeric list literals → array(…), and more (see
    * SqlTranslate.scala). Every name here was verified row-identical
    * by the Scratch sqlscan triage before being pinned; the sweep
    * re-verifies per run, so a Spark builtin changing semantics under
    * any mapped name fails here first. */
  private val translatedOracles: Seq[String] = Seq(
    "q_acquisition_plan", "q_activity_bitmap", "q_anchor_dedup", "q_attribution",
    "q_backfill_chunks", "q_batch_buckets", "q_binary_ingest", "q_bm25",
    "q_burstiness", "q_chunk_overlap", "q_cohort_ltv", "q_corr_group",
    "q_daily_close", "q_degree_histogram", "q_feature_hash", "q_frame_dedup",
    "q_frame_sample", "q_from_json", "q_fuzzy_join", "q_gap_fill",
    "q_grid_neighbor_stats", "q_grid_neighbors", "q_image_resize", "q_impute",
    "q_interleave", "q_js_divergence", "q_json_extract", "q_key_projection",
    "q_kl_drift", "q_lang_confusion", "q_lang_id", "q_length_buckets",
    "q_lsh_planner", "q_map_explode", "q_movers", "q_multimodal_meta",
    "q_pack_greedy", "q_pad_waste", "q_pareto", "q_perplexity_proxy",
    "q_rag_chunks", "q_rbo_overlap", "q_readability", "q_redact",
    "q_region_top_brands", "q_retention", "q_return_hazard", "q_rfm",
    "q_seasonal_profile", "q_source_jaccard", "q_sql_report", "q_target_encode",
    "q_tfidf", "q_throttle_events", "q_tok_efficiency", "q_token_count",
    "q_tpch_discount", "q_tpch_disjunct", "q_tpch_mktshare", "q_tpch_nation_trade",
    "q_tpch_profit", "q_tpch_promo", "q_tpch_returned", "q_tpch_shipping",
    "q_tpch_small_qty", "q_tpch_top_supplier", "q_tpch_volume", "q_twap",
    "q_user_journey", "q_vocab_coverage", "q_vocab_drift", "q_vocab_growth",
    "q_wau_stickiness", "q_woe_encode", "q_zipf_slope", "q_zorder_skipping")

  test(s"SQL-surface parity: ${translatedOracles.size} more oracle texts are portable through the full SqlTranslate chain") {
    Tables.createViews(spark, sfDir)
    graft.functions.GraftFunctions.register(spark)
    translatedOracles.foreach { name =>
      val viaApi = SparkEntry.queries(name)(spark, sfDir)
      val viaSql = spark.sql(SqlTranslate(SparkEntry.oracleSql(name)))
      assert(viaApi.columns.toSeq == viaSql.columns.toSeq,
        s"$name: column names diverge (${viaApi.columns.mkString(",")} vs ${viaSql.columns.mkString(",")})")
      val a = viaApi.collect().map(_.toString).sorted
      val b = viaSql.collect().map(_.toString).sorted
      assert(a.length == b.length, s"$name: ${a.length} vs ${b.length} rows")
      assert(a.sameElements(b), s"$name: translated oracle through spark.sql diverged")
      spark.catalog.clearCache()
    }
  }

  /** Same chain with len() read as LENGTH (string) instead of SIZE
    * (array) — DuckDB's len() covers both; these six texts use it on
    * strings (the array-context occurrences are disambiguated inside
    * the chain: len(split(/len(filter(/… stay size()). */
  private val translatedLenOracles: Seq[String] = Seq(
    "q_doc_fingerprint", "q_hybrid_rank", "q_normalize_text", "q_quality_gate",
    "q_quality_score", "q_quality_sweep", "q_top_p_select")

  /** The sixth sweep (round 11): the 66 oracles whose only remaining
    * DuckDB-isms were Python-style LIST COMPREHENSIONS and their
    * satellite constructs — all mechanical ANSI now that the chain
    * rewrites `[E for v in L if C]` → `transform(filter(L, v -> C),
    * v -> E)`, struct literals `{'k': v}` → named_struct, general
    * list literals → array(…), expression-index/slice `X[i]`/`X[a:b]`
    * → element_at/slice (1-based on both engines; element_at gets an
    * INT cast because sequence() counters are BIGINT), list_sum → the
    * identical left-fold `aggregate(…, CAST(0 AS DOUBLE), (acc, x) ->
    * acc + x)`, list_min/list_max/list_intersect/strpos renames,
    * `list(X ORDER BY K)` → sort-after-collect, recursive unnest →
    * inline(), and the FROM-clause `,unnest(X) u(col)` → LATERAL VIEW.
    * This closed the bulk of the r10 exclusion table: the similarity,
    * dedup, ANN, BPE, and text-metrics families a SQL user previously
    * could not run as SQL at all. Triaged by Scratch sqlscan; the
    * sweep re-verifies row-identity per run. */
  private val comprehensionOracles: Seq[String] = Seq(
    "q_ann_ivf", "q_ann_ivfpq", "q_ann_lsh", "q_ann_recall",
    "q_audio_energy", "q_band_load", "q_benford", "q_bigram_lm",
    "q_boilerplate", "q_bootstrap_ci", "q_bpe_merge", "q_bpe_pairs",
    "q_bpe_encode", "q_bpe_train3", "q_cdc_chunks", "q_cdc_savings",
    "q_containment",
    "q_contamination", "q_cross_source_leak", "q_dedup_recall",
    "q_detector_agreement", "q_dsir_weight", "q_dup_spans",
    "q_embed_neardup", "q_embed_outliers", "q_embedding_stats",
    "q_entropy", "q_eval_overlap", "q_fim_split", "q_gnn_aggregate",
    "q_hard_negatives", "q_incremental_dedup", "q_ivf_balance",
    "q_ivf_margin", "q_ivf_probe_sweep", "q_kfold", "q_kmeans_step",
    "q_kmeans_train", "q_knn_classify", "q_label_audit",
    "q_label_separability", "q_lateness_audit", "q_line_dedup",
    "q_minhash_est_err", "q_minhash_neardup", "q_mmr_rerank",
    "q_multimodal_features", "q_ndcg_eval", "q_neardup_sweep",
    "q_ngram_counts", "q_ngram_jaccard", "q_ngram_novelty",
    "q_passage_dedup", "q_perceptron_eval", "q_perceptron_score",
    "q_perceptron_train", "q_pmi_bigrams", "q_pq_codes", "q_pq_search",
    "q_rand_project", "q_repetition", "q_scalar_quant",
    "q_semdedup_sweep", "q_shard_manifest", "q_simhash",
    "q_simhash_neardup", "q_span_corrupt", "q_upsample_plan",
    "q_weighted_sample", "q_winnowing")

  test(s"SQL-surface parity: ${comprehensionOracles.size} list-comprehension oracle texts are portable through the r11 chain") {
    Tables.createViews(spark, sfDir)
    graft.functions.GraftFunctions.register(spark)
    comprehensionOracles.foreach { name =>
      val viaApi = SparkEntry.queries(name)(spark, sfDir)
      val viaSql = spark.sql(SqlTranslate(SparkEntry.oracleSql(name)))
      assert(viaApi.columns.toSeq == viaSql.columns.toSeq,
        s"$name: column names diverge (${viaApi.columns.mkString(",")} vs ${viaSql.columns.mkString(",")})")
      val a = viaApi.collect().map(_.toString).sorted
      val b = viaSql.collect().map(_.toString).sorted
      assert(a.length == b.length, s"$name: ${a.length} vs ${b.length} rows")
      assert(a.sameElements(b), s"$name: translated oracle through spark.sql diverged")
      spark.catalog.clearCache()
    }
  }

  test(s"SQL-surface parity: ${translatedLenOracles.size} more via the chain's len-as-length reading") {
    Tables.createViews(spark, sfDir)
    graft.functions.GraftFunctions.register(spark)
    translatedLenOracles.foreach { name =>
      val viaApi = SparkEntry.queries(name)(spark, sfDir)
      val viaSql = spark.sql(SqlTranslate(SparkEntry.oracleSql(name), lenIsLength = true))
      assert(viaApi.columns.toSeq == viaSql.columns.toSeq, s"$name: column names diverge")
      val a = viaApi.collect().map(_.toString).sorted
      val b = viaSql.collect().map(_.toString).sorted
      assert(a.length == b.length && a.sameElements(b), s"$name: diverged through spark.sql")
      spark.catalog.clearCache()
    }
  }

  test("SQL-surface parity: the recursive-CTE oracle (q_khop_reach) runs VERBATIM through spark.sql") {
    // Spark 4 executes WITH RECURSIVE natively; the only knob is the
    // runaway-protection row limit, a resource bound not a dialect gap
    Tables.createViews(spark, sfDir)
    val prev = spark.conf.getOption("spark.sql.cteRecursionRowLimit")
    spark.conf.set("spark.sql.cteRecursionRowLimit", 100000000L)
    try {
      val viaApi = SparkEntry.queries("q_khop_reach")(spark, sfDir)
      val viaSql = spark.sql(SparkEntry.oracleSql("q_khop_reach"))
      assert(viaApi.columns.toSeq == viaSql.columns.toSeq)
      val a = viaApi.collect().map(_.toString).sorted
      val b = viaSql.collect().map(_.toString).sorted
      assert(a.length == b.length && a.sameElements(b), "q_khop_reach diverged")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.cteRecursionRowLimit", v)
        case None => spark.conf.unset("spark.sql.cteRecursionRowLimit")
      }
      spark.catalog.clearCache()
    }
  }

  /** The documented-exclusion table: every declared query NOT covered
    * by a sweep above or a hand mirror, with the reason its oracle
    * text is genuinely dialect-bound. The completeness test below
    * keeps this table honest in both directions — a new query must
    * land in a sweep or here, and a query that becomes mechanically
    * portable must leave. */
  private val sqlExclusions: Map[String, String] = {
    val recursiveUnion = Seq(
      "q_cluster_stats", "q_curation_funnel", "q_dedup_clusters",
      "q_dedup_keep_best", "q_dedup_weight", "q_embed_clusters",
      "q_training_pipeline")
      .map(_ -> ("oracle's connected-components fixed point uses UNION " +
        "(dedup) inside WITH RECURSIVE for termination; Spark 4 supports " +
        "only UNION ALL in recursive CTEs (UNION_NOT_SUPPORTED_IN_" +
        "RECURSIVE_CTE), and rewriting the fixed point to UNION ALL " +
        "diverges. The Spark-SQL story for cluster derivation is the " +
        "operator (min-label propagation + pointer jumping); the landed " +
        "pair artifacts it reads ARE SQL-queryable views, and since r12 " +
        "the cluster TABLE itself is too — DedupClusters.ensureClustersView " +
        "lands it as dedup_clusters_v1 (q_cluster_view reads it back in " +
        "plain SQL, oracle-gated)"))
    recursiveUnion.toMap ++ Map(
      "q_cluster_view" ->
        ("the SQL front door itself: its Spark side IS plain SQL over the " +
          "registered dedup_clusters_v1 view, and its oracle is " +
          "q_dedup_clusters's recursive-UNION CTE (non-portable for the " +
          "same UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE reason); the " +
          "view ≡ operator equivalence is pinned by DedupClustersSpec"),
      "q_asof_stream_twin" ->
        ("oracle uses DuckDB struct_pack(k := v) literals and NULL::STRUCT(…) " +
          "type casts — Spark spells these named_struct/CAST with a different " +
          "type grammar; the as-of SQL story is covered by the seven other " +
          "as-of oracles, all portable"),
      "q_decayed_trend" ->
        ("oracle sums raw doubles whose result is evaluation-order-sensitive; " +
          "single-threaded DuckDB's order happens to match the engine's " +
          "decimal-staged plan, Spark partial aggregation's does not — the " +
          "engine plan, not the oracle text, is the Spark-side semantics"))
  }

  test("SQL-surface completeness: every declared query is in exactly one sweep, a hand mirror, or the exclusion table") {
    val covered =
      sqlMirrors.keySet ++ portableOracles ++ divPortableOracles ++
        renamePortableOracles ++ translatedOracles ++ translatedLenOracles ++
        comprehensionOracles ++ Set("q_khop_reach") ++ sqlExclusions.keySet
    val declared = SparkEntry.queries.keySet
    val missing = declared -- covered
    val phantom = covered -- declared
    assert(missing.isEmpty, s"queries with no SQL-parity story: ${missing.toSeq.sorted}")
    assert(phantom.isEmpty, s"SQL-parity entries for undeclared queries: ${phantom.toSeq.sorted}")
    // exclusions must not shadow a sweep (a query that became portable
    // must leave the table)
    val shadowed = sqlExclusions.keySet.intersect(
      sqlMirrors.keySet ++ portableOracles ++ divPortableOracles ++
        renamePortableOracles ++ translatedOracles ++ translatedLenOracles ++
        comprehensionOracles)
    assert(shadowed.isEmpty, s"excluded but also swept: ${shadowed.toSeq.sorted}")
  }

  test("the SQL user can express an ad-hoc skyline against the views and match the operator") {
    Tables.createViews(spark, sfDir)
    val viaSql = spark.sql(
      """SELECT p_brand, p_partkey FROM part p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM part q WHERE q.p_brand = p.p_brand
        |    AND q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
        |    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val viaOp = graft.ops.Analytics.qSkyline(spark, sfDir)
      .select("p_brand", "p_partkey")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(viaSql == viaOp)
    assert(viaOp.nonEmpty)
  }
}
