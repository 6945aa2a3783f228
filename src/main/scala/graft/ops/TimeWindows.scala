package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Time-window aggregations (SURVEY.md §2.3 E16-E18).
  *
  * The reference's whole schedule is windowing: a daily tumbling
  * window per run (app.py:559-566), overlapping 1-hour chunks — a
  * sliding window (app.py:373-380) — and the 10 s connectivity poll
  * whose bursts are sessions (app.py:40-172). Batch-mode `window()` /
  * `session_window()` express all three; the streaming forms (with
  * watermarks) live in graft.streaming and are ScalaTest-verified.
  *
  * All windows are epoch-aligned in UTC, which is what makes the
  * DuckDB date_trunc/grid emulation match exactly.
  */
object TimeWindows {

  private def decSum(c: Column): Column =
    sum(c.cast("decimal(18,6)")).cast("double")

  /** E16: daily tumbling window — the reference's one-run-per-UTC-day
    * cadence (app.py:559-566, 678). */
  def qTumblingDaily(spark: SparkSession, d: String): DataFrame =
    Tables.events(spark, d)
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(count(lit(1)).as("n"), decSum(col("value")).as("sum_value"))
      .select(col("w.start").as("w_start"), col("w.end").as("w_end"),
        col("n"), col("sum_value"))
      .orderBy("w_start")

  /** E17: sliding window (1 h size, 30 min slide) — the reference's
    * overlapping buffered chunks (app.py:373-380) generalized. Each
    * event lands in size/slide = 2 windows. */
  def qSlidingWindow(spark: SparkSession, d: String): DataFrame =
    Tables.events(spark, d)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("w_start"), col("w.end").as("w_end"), col("n"))
      .orderBy("w_start")

  /** E18: session windows with a 5-minute gap, per user — the
    * reference's poll-burst shape (app.py:40-172). Batch
    * `session_window` keeps state bounded by the group key. */
  def qSessionWindow(spark: SparkSession, d: String): DataFrame =
    Tables.events(spark, d)
      .groupBy(session_window(col("ts"), "5 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("w.start").as("s_start"),
        col("w.end").as("s_end"), col("n"))
      .orderBy("user_id", "s_start")

  /** Greedy per-key admission throttle: keep an event only if ≥ 1 h
    * has passed since the LAST KEPT event of the same user (first
    * event always kept; ties ordered by event_id) — the reference's
    * rate-limit semantics (app.py:399-431) applied to an event log.
    * This is genuinely not window-expressible: whether a row is kept
    * depends on which earlier rows were kept, a data-dependent
    * recurrence (the oracle needs a recursive CTE). The Spark form is
    * the secondary-sort pattern — hash-repartition by user, external
    * sort within partitions on (user, time, id), then a single
    * `mapPartitions` scan holding O(1) state (current user + last
    * kept time). No group is ever materialized in memory (unlike
    * groupByKey+flatMapGroups), so a 100 TB user's stream spills in
    * the sort and streams through the scan. Time compares are µs
    * integers on both engines — no timestamp-arithmetic parity edge. */
  def qThrottleEvents(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val gapUs = 3600L * 1000000L
    val ev = Tables.events(spark, d)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .as[(Long, Long, Long)]
    val kept = ev.repartition(col("user_id"))
      .sortWithinPartitions("user_id", "us", "event_id")
      .mapPartitions { it =>
        var curUser = Long.MinValue
        var lastKept = Long.MinValue
        var any = false
        it.flatMap { case (u, id, us) =>
          if (!any || u != curUser) {
            curUser = u; lastKept = us; any = true
            Some((u, id, us))
          } else if (us >= lastKept + gapUs) {
            lastKept = us
            Some((u, id, us))
          } else None
        }
      }
    kept.toDF("user_id", "event_id", "us")
      .select(col("user_id"), col("event_id"),
        timestamp_micros(col("us")).as("ts"))
      .orderBy("user_id", "ts", "event_id")
  }
}
