package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §2.3 for the operator
  * inventory each entry descends from, and §7 for the build plan.
  *
  * Every query is a pure `(SparkSession, sfDir) => DataFrame` ending in
  * a total ORDER BY; every oracle is the equivalent ANSI SQL for DuckDB
  * over the same parquet tables, with column names aliased identically
  * on both sides (the driver sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship: the end-to-end acquisition plan (SURVEY.md §7.2) —
    * dims × window → chunks → buffered bounds → broadcast IP lookup →
    * request keys, on sf0.001. Driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    Acquisition.acquisitionPlan(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Acquisition plan ops (E1-E8)
    "q_cross_dims" -> (Acquisition.qCrossDims _),
    "q_chunk_explode" -> (Acquisition.qChunkExplode _),
    "q_buffered_bounds" -> (Acquisition.qBufferedBounds _),
    "q_key_projection" -> (Acquisition.qKeyProjection _),
    "q_lookup_join" -> (Acquisition.qLookupJoin _),
    "q_lookup_misses" -> (Acquisition.qLookupMisses _),
    "q_anti_dedup" -> (Acquisition.qAntiDedup _),
    "q_semi_present" -> (Acquisition.qSemiPresent _),
    "q_asof_latest" -> (Acquisition.qAsofLatest _),
    "q_acquisition_plan" -> (Acquisition.acquisitionPlan _),
    // Inventory / completeness analytics (E9-E15, E20)
    "q_group_agg" -> (Inventory.qGroupAgg _),
    "q_distinct" -> (Inventory.qDistinct _),
    "q_rollup" -> (Inventory.qRollup _),
    "q_window_rank" -> (Inventory.qWindowRank _),
    "q_gap_detect" -> (Inventory.qGapDetect _),
    "q_interval_merge" -> (Inventory.qIntervalMerge _),
    "q_topk_per_group" -> (Inventory.qTopkPerGroup _),
    "q_union_except" -> (Inventory.qUnionExcept _),
    "q_filename_inventory" -> (Inventory.qFilenameInventory _),
    // Time windows (E16-E18)
    "q_tumbling_daily" -> (TimeWindows.qTumblingDaily _),
    "q_sliding_window" -> (TimeWindows.qSlidingWindow _),
    "q_session_window" -> (TimeWindows.qSessionWindow _),
  )

  /** DuckDB-equivalent SQL per query (driver correctness gate).
    * Conventions: CAST(ts AS TIMESTAMP) truncates the nanosecond
    * events timestamps to microseconds exactly as our reader does;
    * double aggregates go through DECIMAL(18,6) sums on both sides;
    * every query ends in a total ORDER BY. */
  def oracleSql: Map[String, String] = Map(
    "q_cross_dims" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin,

    "q_chunk_explode" ->
      """SELECT day + hh * INTERVAL 1 HOUR AS chunk_start
        |FROM (SELECT DISTINCT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day FROM events)
        |CROSS JOIN range(24) t(hh)
        |ORDER BY chunk_start""".stripMargin,

    "q_buffered_bounds" ->
      """SELECT event_id,
        |  date_trunc('hour', CAST(ts AS TIMESTAMP)) AS chunk_start,
        |  GREATEST(date_trunc('day', CAST(ts AS TIMESTAMP)),
        |           date_trunc('hour', CAST(ts AS TIMESTAMP)) - INTERVAL 120 SECOND) AS query_start,
        |  LEAST(date_trunc('day', CAST(ts AS TIMESTAMP)) + INTERVAL 1 DAY,
        |        date_trunc('hour', CAST(ts AS TIMESTAMP)) + INTERVAL 62 MINUTE) AS query_end
        |FROM events ORDER BY event_id""".stripMargin,

    "q_key_projection" ->
      """WITH f AS (
        |  SELECT event_id,
        |    'OX.STA' || user_id || '.' || event_id || '.' || event_type || '.'
        |      || strftime(CAST(ts AS TIMESTAMP), '%Y%m%dT%H%M%S') || '.mseed' AS filename
        |  FROM events)
        |SELECT event_id, filename,
        |  string_split(filename, '.')[2] AS station_parsed,
        |  string_split(filename, '.')[4] AS channel_parsed,
        |  substr(string_split(filename, '.')[5], 1, 8) AS date_part,
        |  substr(string_split(filename, '.')[5], 1, 8) || '/' || filename AS s3_key
        |FROM f ORDER BY event_id""".stripMargin,

    "q_lookup_join" ->
      """SELECT o_orderkey, c_name, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,

    "q_lookup_misses" ->
      """SELECT o_orderkey, o_custkey FROM orders
        |WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
        |ORDER BY o_orderkey""".stripMargin,

    "q_anti_dedup" ->
      """SELECT o_orderkey FROM orders
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,

    "q_semi_present" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,

    "q_asof_latest" ->
      """SELECT o_orderkey, o_orderdate, asof_event, asof_ts FROM (
        |  SELECT o.o_orderkey, o.o_orderdate, e.event_id AS asof_event,
        |    CAST(e.ts AS TIMESTAMP) AS asof_ts,
        |    row_number() OVER (PARTITION BY o.o_orderkey
        |      ORDER BY CAST(e.ts AS TIMESTAMP) DESC, e.event_id DESC) AS rn
        |  FROM orders o JOIN events e
        |    ON e.user_id = o.o_custkey AND CAST(e.ts AS TIMESTAMP) <= o.o_orderdate)
        |WHERE rn = 1 ORDER BY o_orderkey""".stripMargin,

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
      """SELECT GROUPING(o_year, o_month) AS gid, o_year, o_month, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
        |FROM (SELECT year(o_orderdate) AS o_year, month(o_orderdate) AS o_month,
        |        o_totalprice FROM orders)
        |GROUP BY ROLLUP(o_year, o_month)
        |ORDER BY gid, o_year NULLS FIRST, o_month NULLS FIRST""".stripMargin,

    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
        |FROM orders ORDER BY o_custkey, rn""".stripMargin,

    "q_gap_detect" ->
      """SELECT user_id, event_id, prev_ts, ts, gap_us FROM (
        |  SELECT user_id, event_id,
        |    lag(CAST(ts AS TIMESTAMP)) OVER w AS prev_ts,
        |    CAST(ts AS TIMESTAMP) AS ts,
        |    epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(lag(CAST(ts AS TIMESTAMP)) OVER w) AS gap_us
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id))
        |WHERE gap_us > 300000000 ORDER BY user_id, event_id""".stripMargin,

    "q_interval_merge" ->
      """WITH iv AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
        |    CAST(ts AS TIMESTAMP) + INTERVAL 5 MINUTE AS iv_end
        |  FROM events),
        |flags AS (
        |  SELECT user_id, ts, iv_end,
        |    CASE WHEN max(iv_end) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
        |         OR ts > max(iv_end) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |    THEN 1 ELSE 0 END AS is_new,
        |    event_id
        |  FROM iv),
        |islands AS (
        |  SELECT user_id, ts, iv_end,
        |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM flags)
        |SELECT user_id, min(ts) AS merged_start, max(iv_end) AS merged_end,
        |  count(*) AS n_chunks
        |FROM islands GROUP BY user_id, island
        |ORDER BY user_id, merged_start""".stripMargin,

    "q_topk_per_group" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, rn FROM (
        |  SELECT l_orderkey, l_linenumber, l_extendedprice,
        |    row_number() OVER (PARTITION BY l_orderkey
        |      ORDER BY l_extendedprice DESC, l_linenumber) AS rn
        |  FROM lineitem)
        |WHERE rn <= 3 ORDER BY l_orderkey, rn""".stripMargin,

    "q_union_except" ->
      """(SELECT o_orderkey, 'live' AS status FROM orders WHERE o_orderstatus <> 'F'
        | UNION ALL
        | SELECT o_orderkey, 'dead' AS status FROM orders WHERE o_orderstatus = 'F')
        |EXCEPT
        |SELECT o_orderkey, 'live' AS status FROM orders WHERE o_totalprice > 200000.0
        |ORDER BY o_orderkey, status""".stripMargin,

    "q_filename_inventory" ->
      """WITH f AS (
        |  SELECT event_id,
        |    'OX.STA' || user_id || '.' || event_id || '.' || event_type || '.'
        |      || strftime(CAST(ts AS TIMESTAMP), '%Y%m%dT%H%M%S') || '.mseed' AS filename
        |  FROM events)
        |SELECT event_id,
        |  regexp_extract(filename, '^([^.]+)\.([^.]+)\.([^.]+)\.([^.]+)\.([^.]+)\.mseed$', 1) AS network,
        |  regexp_extract(filename, '^([^.]+)\.([^.]+)\.([^.]+)\.([^.]+)\.([^.]+)\.mseed$', 2) AS station,
        |  regexp_extract(filename, '^([^.]+)\.([^.]+)\.([^.]+)\.([^.]+)\.([^.]+)\.mseed$', 4) AS channel,
        |  substr(regexp_extract(filename, '^([^.]+)\.([^.]+)\.([^.]+)\.([^.]+)\.([^.]+)\.mseed$', 5), 1, 8) AS date_part,
        |  substr(regexp_extract(filename, '^([^.]+)\.([^.]+)\.([^.]+)\.([^.]+)\.([^.]+)\.mseed$', 5), 1, 8) || '/' || filename AS s3_key
        |FROM f ORDER BY event_id""".stripMargin,

    "q_tumbling_daily" ->
      """SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS w_start,
        |  date_trunc('day', CAST(ts AS TIMESTAMP)) + INTERVAL 1 DAY AS w_end,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY w_start""".stripMargin,

    "q_sliding_window" ->
      """WITH g AS (
        |  SELECT TIMESTAMP '1970-01-01'
        |    + CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 1800) AS BIGINT) * 1800 * INTERVAL 1 SECOND
        |    - k * INTERVAL 30 MINUTE AS w_start
        |  FROM events CROSS JOIN range(2) t(k))
        |SELECT w_start, w_start + INTERVAL 1 HOUR AS w_end, count(*) AS n
        |FROM g GROUP BY w_start ORDER BY w_start""".stripMargin,

    "q_session_window" ->
      """WITH x AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |flags AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR ts - lag(ts) OVER w > INTERVAL 5 MINUTE THEN 1 ELSE 0 END AS brk
        |  FROM x WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |islands AS (
        |  SELECT user_id, ts,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM flags)
        |SELECT user_id, min(ts) AS s_start, max(ts) + INTERVAL 5 MINUTE AS s_end,
        |  count(*) AS n
        |FROM islands GROUP BY user_id, island
        |ORDER BY user_id, s_start""".stripMargin,
  )
}
