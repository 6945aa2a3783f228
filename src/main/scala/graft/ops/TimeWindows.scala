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
}
