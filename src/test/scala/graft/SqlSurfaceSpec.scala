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
        |FROM a ORDER BY event_type""".stripMargin)

  test("SQL-surface parity: 15 declared queries return identical rows through plain SQL") {
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
