package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  /** Time-series gap filling by linear interpolation: the daily
    * per-type volume series decimated to every-3rd-day observations
    * (a deterministic stand-in for a sensor that reports on a slow
    * cadence — the reference's dashboard gap question, app.py:467-480,
    * asked as "reconstruct the missing days"), then re-gridded onto
    * the full calendar with missing cells filled linearly between the
    * bracketing observations and edge cells carried from the nearest
    * one. The resample/interpolate pass every time-series feature
    * pipeline runs before a model sees the series.
    *
    * Exactness contract: interpolation runs on DAY INDICES (small
    * ints) and integer counts — `(pn·(ndi−di) + nn·(di−pdi)) div
    * (ndi−pdi)` — all-BIGINT, no epoch-micros products (those would
    * overflow int64), no doubles anywhere in the checked surface.
    *
    * Scale shape: the raw table collapses to day grain FIRST (the
    * qDailyAnomaly discipline), so everything after is bounded by
    * |types| × |calendar days|, not event volume; the calendar grid
    * explodes from a broadcast 1-row bounds aggregate; the four
    * carry/lookahead windows partition by type over calendar-bounded
    * partitions. */
  def qGapFill(spark: SparkSession, d: String): DataFrame = {
    val dayUs = 86400000000L
    val daily = Tables.events(spark, d)
      .select(col("event_type"),
        unix_micros(date_trunc("DAY", col("ts"))).as("day_us"))
      .groupBy("event_type", "day_us").agg(count(lit(1)).as("n"))
    val bounds = daily.agg(min("day_us").as("d0"), max("day_us").as("d1"))
    val obs = daily.crossJoin(broadcast(bounds))
      .filter(expr(s"((day_us - d0) div $dayUs) % 3 = 0"))
      .select(col("event_type"), col("day_us"), col("n"))
    val grid = daily.select("event_type").distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"),
        explode(expr(s"sequence(d0, d1, $dayUs)")).as("day_us"),
        col("d0"))
    val wPrev = Window.partitionBy("event_type").orderBy("day_us")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wNext = Window.partitionBy("event_type").orderBy("day_us")
      .rowsBetween(0, Window.unboundedFollowing)
    grid.join(obs, Seq("event_type", "day_us"), "left")
      .withColumn("di", expr(s"(day_us - d0) div $dayUs"))
      .withColumn("oi", when(col("n").isNotNull, col("di")))
      .withColumn("pn", last(col("n"), ignoreNulls = true).over(wPrev))
      .withColumn("pdi", last(col("oi"), ignoreNulls = true).over(wPrev))
      .withColumn("nn", first(col("n"), ignoreNulls = true).over(wNext))
      .withColumn("ndi", first(col("oi"), ignoreNulls = true).over(wNext))
      .withColumn("n_filled", expr(
        """CASE WHEN n IS NOT NULL THEN n
          |     WHEN pn IS NULL THEN nn
          |     WHEN nn IS NULL THEN pn
          |     ELSE (pn * (ndi - di) + nn * (di - pdi)) div (ndi - pdi)
          |END""".stripMargin))
      .withColumn("src", expr(
        """CASE WHEN n IS NOT NULL THEN 'obs'
          |     WHEN pn IS NULL OR nn IS NULL THEN 'edge'
          |     ELSE 'interp'
          |END""".stripMargin))
      .select(col("event_type"), col("day_us"), col("n_filled"), col("src"))
      .orderBy("event_type", "day_us")
  }

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
  /** Watermark-budget audit — the design query behind every
    * `withWatermark` number: for each candidate lateness budget,
    * REPLAY ingestion and count the events a watermark would drop.
    * Arrival time is simulated as event time + a deterministic
    * content-hashed ingest jitter (0–600 s — md5, reproducible across
    * engines; a random jitter would be neither). Within each DAY,
    * events are replayed in arrival order and an event is late iff
    * its event time trails the running event-time high-water by more
    * than the budget — the exact append-mode drop rule. The
    * simulation partitions by day (watermark replay resets daily), so
    * the running-max window is per-day, never a global single-task
    * sort; at 100 TB each day replays independently, which is also
    * how an ops team audits lateness in practice. Output: per budget,
    * events/late/late_ppm — the table you pick the production
    * `withWatermark` value from. */
  def qLatenessAudit(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, d)
      .select(col("event_id"), unix_micros(col("ts")).as("us"),
        expr("unix_micros(date_trunc('day', ts))").as("day_us"))
      .withColumn("delay_us",
        (conv(substring(md5(concat(lit("lat:"), col("event_id"))), 1, 4), 16, 10)
          .cast("long") % 600) * 1000000L)
      .withColumn("arrival_us", col("us") + col("delay_us"))
    val w = Window.partitionBy("day_us").orderBy("arrival_us", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val marked = ev.withColumn("hw_us", max("us").over(w))
      .withColumn("budget_s", explode(array(lit(60L), lit(300L), lit(600L))))
      .withColumn("late",
        col("hw_us").isNotNull && col("us") < col("hw_us") - col("budget_s") * 1000000L)
    marked.groupBy("budget_s")
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("late"), 1L).otherwise(0L)).as("n_late"))
      .withColumn("late_ppm", expr("(n_late * 1000000) div n_events"))
      .orderBy("budget_s")
  }

  /** The distributed throttle plan on an arbitrary (user, id, us)
    * dataset — extracted so ThrottleProps can drive it across
    * partition counts: hash-repartition by user (every user's rows
    * land in ONE partition at ANY partition count — the invariant the
    * property suite machine-checks), external sort within partitions,
    * one O(1)-state greedy scan. The same greedy recurrence runs
    * per-key in streaming form in [[graft.streaming.Streams
    * .throttleRunning]]; ThrottleProps asserts all three forms (this
    * plan at several partition counts, and a driver-side reference
    * fold) produce the identical kept set. */
  private[graft] def throttleKept(
      ev: org.apache.spark.sql.Dataset[(Long, Long, Long)],
      gapUs: Long): org.apache.spark.sql.Dataset[(Long, Long, Long)] = {
    val enc = org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.scalaLong,
      org.apache.spark.sql.Encoders.scalaLong,
      org.apache.spark.sql.Encoders.scalaLong)
    ev.repartition(col("user_id"))
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
      }(enc)
  }

  def qThrottleEvents(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val gapUs = 3600L * 1000000L
    val ev = Tables.events(spark, d)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .as[(Long, Long, Long)]
    throttleKept(ev, gapUs)
      .toDF("user_id", "event_id", "us")
      .select(col("user_id"), col("event_id"),
        timestamp_micros(col("us")).as("ts"))
      .orderBy("user_id", "ts", "event_id")
  }
}
