package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Relational analytics over the landed dataset — the dashboard/report
  * layer a completeness store feeds (reference: the S3-tag inventory,
  * app.py:467-480, is exactly the fact table these queries consume).
  *
  * Everything here is a single declarative plan: star joins broadcast
  * their dims, windows shuffle once on their partition key, and the
  * percentile thresholds in `qWinsorize` are a tiny broadcast side.
  * Float aggregates route through exact DECIMAL sums (see Inventory)
  * so results are partial-aggregation-order independent.
  */
object Analytics {

  private def decSum(c: Column): Column =
    sum(c.cast("decimal(18,6)")).cast("double")

  /** Star-schema join: fact (orders) against the dim chain
    * customer→nation→region, revenue rolled up per (region, nation).
    * nation/region are explicitly broadcast (config-sized dims — at
    * 100 TB they are still config-sized); customer is left to
    * Catalyst/AQE, which broadcasts it at test SF and shuffle-joins it
    * when it outgrows the threshold on a real cluster. One shuffle
    * total (the final group-by). */
  def qStarJoin(spark: SparkSession, d: String): DataFrame =
    Tables.orders(spark, d)
      .join(Tables.customer(spark, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(count(lit(1)).as("n_orders"),
        decSum(col("o_totalprice")).as("sum_price"))
      .orderBy("r_name", "n_name")

  /** Rolling per-key stats: count/sum/avg/min/max over the trailing 7
    * rows (6 preceding + current) per user ordered by time — the
    * moving-average view of a sensor's recent throughput. ROWS frames
    * are streaming-friendly: one shuffle on user_id, one ordered pass
    * per partition, O(frame) state. */
  def qRollingStats(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(-6, Window.currentRow)
    Tables.events(spark, d)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("roll_n", count(lit(1)).over(w))
      .withColumn("roll_sum", sum(col("value").cast("decimal(18,6)")).over(w).cast("double"))
      .withColumn("roll_avg", col("roll_sum") / col("roll_n"))
      .withColumn("roll_min", min(col("value")).over(w))
      .withColumn("roll_max", max(col("value")).over(w))
      .select("user_id", "event_id", "ts", "value",
        "roll_n", "roll_sum", "roll_avg", "roll_min", "roll_max")
      .orderBy("user_id", "event_id")
  }

  /** Distribution ranks per group: quartile (ntile), percent_rank and
    * cume_dist over value within each event_type. The window orders by
    * (value, event_id) — the unique tiebreaker makes rank ≡ row_number
    * on both engines, so the rank functions are deterministic and
    * oracle-exact. */
  def qNtileCume(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy(col("value"), col("event_id"))
    Tables.events(spark, d)
      .select(col("event_type"), col("event_id"), col("value"))
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("pr", round(percent_rank().over(w), 4))
      .withColumn("cd", round(cume_dist().over(w), 4))
      .orderBy("event_type", "event_id")
  }

  /** Conversion funnel: per user, the first 'view', the first 'click'
    * strictly after it, the first 'purchase' strictly after that, and
    * the furthest stage reached. Each stage is a key-only aggregate
    * joined back on user_id — three narrow hash aggregates over an
    * ever-shrinking key set, no window over the raw events. */
  def qFunnel(spark: SparkSession, d: String): DataFrame =
    funnelStages(spark, d).orderBy("user_id")

  /** Unordered funnel body — qFunnelTime composes this so the declared
    * query's output sort is never inherited by a consumer that
    * immediately collapses the frame (a global sort feeding a 2-row
    * aggregate is pure wasted shuffle). */
  private def funnelStages(spark: SparkSession, d: String): DataFrame = {
    val e = Tables.events(spark, d).select("user_id", "event_type", "ts")
    val v = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("first_view"))
    val c = e.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("ts") > col("first_view"))
      .groupBy("user_id").agg(min("ts").as("first_click"))
    val p = e.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(col("ts") > col("first_click"))
      .groupBy("user_id").agg(min("ts").as("first_purchase"))
    v.join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .select(col("user_id"), col("first_view"), col("first_click"), col("first_purchase"),
        when(col("first_purchase").isNotNull, "purchase")
          .when(col("first_click").isNotNull, "click")
          .otherwise("view").as("stage"))
  }

  /** Stage-to-stage conversion timing: the latency distribution
    * between funnel stages (time-to-click after first view, time-to-
    * purchase after first click) — the companion every funnel report
    * ships with ("users convert, but how fast?"). Composes qFunnel's
    * per-user stage timestamps; deltas are exact integer MICROSECONDS
    * (`unix_micros`, the engine's pinned time unit) and the median is
    * percentile_disc — a selected member value, so every output cell
    * is an exact integer and the surface is hash-stable by
    * construction. Unpivoted with `stack` so both transitions
    * aggregate in one pass over the (tiny) converted-user frame. */
  def qFunnelTime(spark: SparkSession, d: String): DataFrame =
    funnelStages(spark, d)
      .select(
        when(col("first_click").isNotNull,
          unix_micros(col("first_click")) - unix_micros(col("first_view"))).as("vc"),
        when(col("first_purchase").isNotNull,
          unix_micros(col("first_purchase")) - unix_micros(col("first_click"))).as("cp"))
      .select(expr(
        "stack(2, 'view_to_click', vc, 'click_to_purchase', cp) AS (transition, delta_us)"))
      .filter(col("delta_us").isNotNull)
      .groupBy("transition")
      .agg(count(lit(1)).as("n_converted"),
        min("delta_us").as("min_us"),
        // percentile_disc returns DOUBLE even for integral input; the
        // selected value is an exact µs long (< 2^53), so the cast is
        // lossless and matches the oracle's BIGINT quantile_disc
        expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY delta_us) AS BIGINT)")
          .as("median_us"),
        max("delta_us").as("max_us"))
      .orderBy("transition")

  /** Fixed-bin histogram of value per event_type: 20 bins of width 25
    * over [0, 500). Bin edges are data-independent constants, so the
    * histogram is a single map-side-combining aggregate — the profile
    * view that runs as one pass at any scale (vs data-dependent edges,
    * which would need a min/max pre-pass). */
  def qValueHistogram(spark: SparkSession, d: String): DataFrame =
    Tables.events(spark, d)
      .select(col("event_type"),
        least(floor(col("value") / 25.0), lit(19)).cast("long").as("bin"))
      .groupBy("event_type", "bin")
      .agg(count(lit(1)).as("n"))
      .withColumn("bin_lo", col("bin") * 25.0)
      .withColumn("bin_hi", (col("bin") + 1) * 25.0)
      .select("event_type", "bin", "bin_lo", "bin_hi", "n")
      .orderBy("event_type", "bin")

  /** Winsorization: clip value to the per-group [p05, p95] band. The
    * thresholds are one tiny exact-percentile aggregate (5 groups),
    * broadcast back onto the stream — the raw table never shuffles.
    * Thresholds are rounded to 4 decimals BEFORE clipping on both
    * engines, so interpolated-quantile last-ulp differences cannot
    * leak into the comparison of values near the edges. */
  def qWinsorize(spark: SparkSession, d: String): DataFrame = {
    val pct = Tables.events(spark, d)
      .groupBy("event_type")
      .agg(round(expr("percentile(value, 0.05)"), 4).as("p05"),
        round(expr("percentile(value, 0.95)"), 4).as("p95"))
    Tables.events(spark, d)
      .join(broadcast(pct), "event_type")
      .select(col("event_type"), col("event_id"), col("value"),
        col("p05"), col("p95"),
        greatest(least(col("value"), col("p95")), col("p05")).as("winsorized"))
      .orderBy("event_type", "event_id")
  }

  /** Time-RANGE rolling window: per-user event count and exact sum
    * over the trailing 24 hours — the windowed form of
    * Acquisition.qRangeJoin's semantics, and the plan you actually
    * want at scale: ONE shuffle on user_id and one ordered pass per
    * partition, vs the join form's bucket-replicated equi-join.
    * (Both ship so the trade is machine-checked: the join form
    * generalizes to joining two DIFFERENT tables; the window form
    * wins when the "prior rows" come from the same stream.) The
    * order key is integer epoch microseconds — RANGE bounds must be
    * numeric in Spark, and integer micros are exact on both engines. */
  def qRollingTime(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("us"))
      .rangeBetween(-86400000000L, Window.currentRow)
    Tables.events(spark, d)
      .select(col("user_id"), col("event_id"), col("ts"),
        unix_micros(col("ts")).as("us"), col("value"))
      .withColumn("n_24h", count(lit(1)).over(w))
      .withColumn("sum_24h",
        sum(col("value").cast("decimal(18,6)")).over(w).cast("double"))
      .select("user_id", "event_id", "ts", "n_24h", "sum_24h")
      .orderBy("user_id", "event_id")
  }

  /** Full outer join: per-key activity from two facts (orders vs
    * events), keys present on either side — the reconciliation view
    * (which customers order but never browse, and vice versa). Both
    * sides pre-aggregate to key-level BEFORE the join, so the outer
    * join sees |keys| rows, not |facts|. */
  def qFullOuter(spark: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(spark, d)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
    val e = Tables.events(spark, d)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
    o.join(e, col("o_custkey") === col("user_id"), "full_outer")
      .select(coalesce(col("o_custkey"), col("user_id")).as("join_key"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
      .orderBy("join_key")
  }

  /** Z-score outliers: events whose value sits more than 2.5 sample
    * standard deviations from its group mean. Mean and variance derive
    * from exact DECIMAL sums of value and value² (one map-side-combining
    * aggregate over 5 groups, broadcast back), so the flag set is
    * partial-aggregation-order independent; the final double arithmetic
    * is written with identical association on both engines. */
  def qZscoreOutliers(spark: SparkSession, d: String): DataFrame = {
    val stats = Tables.events(spark, d)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        decSum(col("value")).as("s"),
        decSum(col("value") * col("value")).as("s2"))
      .select(col("event_type"), col("n"),
        (col("s") / col("n")).as("mean"),
        sqrt((col("s2") - col("s") * col("s") / col("n")) / (col("n") - 1)).as("std"))
    Tables.events(spark, d)
      .join(broadcast(stats), "event_type")
      .withColumn("z", (col("value") - col("mean")) / col("std"))
      .filter(abs(col("z")) > 2.5)
      .select(col("event_type"), col("event_id"), col("value"),
        round(col("mean"), 4).as("mean"), round(col("std"), 4).as("std"),
        round(col("z"), 4).as("z"))
      .orderBy("event_type", "event_id")
  }

  /** SCD2 versioning: each event is a state change for its user; the
    * version's validity runs to the next change (open-ended for the
    * latest). lead() over one shuffle on the natural key — the shape
    * that builds a slowly-changing dimension from a change stream. */
  def qScd2(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(spark, d)
      .select(col("user_id"), col("event_id"), col("ts"))
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .withColumn("version", row_number().over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .withColumnRenamed("ts", "valid_from")
      .select("user_id", "event_id", "valid_from", "valid_to", "version", "is_current")
      .orderBy("user_id", "version")
  }

  /** Per-group Pearson correlation + sample covariance between
    * quantity and price. Built from the five exact DECIMAL moment sums
    * (n, Σx, Σy, Σxy, Σx², Σy²) in ONE map-side-combining aggregate —
    * the same single-pass moment pattern as qZscoreOutliers, and the
    * reason this scales: a builtin `corr()` is also one pass, but its
    * double partial-merge order varies with AQE, while decimal moments
    * are order-independent and hash-match the oracle. Final double
    * arithmetic is association-pinned; round(6) absorbs the ulp
    * boundary of sqrt/division chains. */
  def qCorrGroup(spark: SparkSession, d: String): DataFrame =
    Tables.spread(spark, Tables.lineitem(spark, d), "l_orderkey")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        decSum(col("l_quantity")).as("sx"),
        decSum(col("l_extendedprice")).as("sy"),
        decSum(col("l_quantity") * col("l_extendedprice")).as("sxy"),
        decSum(col("l_quantity") * col("l_quantity")).as("sxx"),
        decSum(col("l_extendedprice") * col("l_extendedprice")).as("syy"))
      .select(col("l_returnflag"), col("n"),
        round((col("sxy") - col("sx") * col("sy") / col("n")) / (col("n") - 1), 6)
          .as("covar_samp"),
        round((col("sxy") - col("sx") * col("sy") / col("n")) /
          (sqrt(col("sxx") - col("sx") * col("sx") / col("n")) *
            sqrt(col("syy") - col("sy") * col("sy") / col("n"))), 6)
          .as("corr"))
      .orderBy("l_returnflag")

  /** Per-user event journey: the time-ordered sequence of event types
    * as one string — the sessionization/path-analysis companion to
    * qFunnel (which only checks stage presence, not order). One
    * shuffle on user_id; the in-group ordering rides the aggregation
    * buffer via array_sort over (ts, event_id)-keyed structs, NOT a
    * window sort over the raw stream. The post-aggregation transform
    * lambda runs once per USER on a small array (interpreted HOFs are
    * only a trap on per-token hot paths). */
  def qUserJourney(spark: SparkSession, d: String): DataFrame =
    Tables.events(spark, d)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("ts"), col("event_id"), col("event_type")))),
            x => x.getField("event_type")),
          ">").as("journey"))
      .orderBy("user_id")

  /** Median-absolute-deviation outliers: the robust alternative to
    * qZscoreOutliers (a z-score's mean/std are themselves dragged by
    * the outliers they hunt; the median/MAD pair is not). Two exact
    * percentile aggregates over 5 groups — each output is tiny and
    * broadcast back, so the events table never shuffles. At 100 TB
    * swap `percentile` for `percentile_approx` exactly as
    * qPercentiles/qPercentilesApprox document. */
  def qMadOutliers(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(spark, d)
      .select(col("event_type"), col("event_id"), col("value"))
    val med = ev.groupBy("event_type")
      .agg(expr("percentile(value, 0.5)").as("med"))
    val withMed = ev.join(broadcast(med), "event_type")
    val mad = withMed.groupBy("event_type")
      .agg(expr("percentile(abs(value - med), 0.5)").as("mad"))
    withMed.join(broadcast(mad), "event_type")
      .filter(abs(col("value") - col("med")) > lit(3) * col("mad"))
      .select(col("event_type"), col("event_id"), col("value"),
        round(col("med"), 4).as("med"), round(col("mad"), 4).as("mad"))
      .orderBy("event_type", "event_id")
  }

  /** Event-sequence transition counts: for each user-ordered pair of
    * consecutive events, how often does type A lead to type B — the
    * first-order Markov table behavior models, next-action predictors
    * and anomalous-flow detectors start from. One shuffle for the
    * per-user lead() window; the (from, to) rollup is a 25-cell hash
    * aggregate that collapses map-side. Probabilities are left to the
    * consumer (a count table is exact; a probability table would put
    * a division on the checked surface for no information gain). */
  def qEventTransitions(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(spark, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
      .orderBy("from_type", "to_type")
  }

  /** Cohort retention matrix: users grouped by first-activity day,
    * counted again on each subsequent day they return — the
    * engagement table every product dashboard leads with, and for a
    * data pipeline the per-cohort survival curve of any keyed entity.
    * Day arithmetic is integer datediff; the (cohort, day-offset)
    * rollup is a count-distinct hash aggregate. Two shuffles: the
    * per-user min-day, and the final matrix — the (user, day)
    * activity set collapses before both. */
  def qRetention(spark: SparkSession, d: String): DataFrame = {
    val activity = Tables.events(spark, d)
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .distinct()
    val cohorts = activity.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
    activity.join(cohorts, Seq("user_id"))
      .withColumn("day_k", datediff(col("day"), col("cohort_day")))
      .filter(col("day_k") <= 7)
      .groupBy("cohort_day", "day_k")
      .agg(countDistinct(col("user_id")).as("n_active"))
      .orderBy("cohort_day", "day_k")
  }

  /** Daily volume anomaly detection: days whose event count sits more
    * than 2 standard deviations from the mean daily volume — the ops
    * alarm a scheduled acquisition run feeds (a missing day or a
    * double-ingest shows up here first). Two stages over day-grain
    * aggregates (≤ a few thousand rows at any corpus size — the raw
    * table collapses before anything else happens), so the stats side
    * is a 1-row broadcast. Same exact-decimal Σ/Σ² + pinned-final-
    * double discipline as qZscoreOutliers. */
  def qDailyAnomaly(spark: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(spark, d)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"))
    val stats = daily.agg(
      count(lit(1)).as("n_days"),
      sum(col("n_events").cast("decimal(18,6)")).as("s1"),
      sum((col("n_events") * col("n_events")).cast("decimal(28,6)")).as("s2"))
    daily.crossJoin(broadcast(stats))
      .withColumn("mean", expr("CAST(s1 AS DOUBLE) / CAST(n_days AS DOUBLE)"))
      .withColumn("variance", expr(
        "CAST(s2 AS DOUBLE) / CAST(n_days AS DOUBLE) - mean * mean"))
      .filter(expr(
        "(CAST(n_events AS DOUBLE) - mean) * (CAST(n_events AS DOUBLE) - mean)" +
          " > 4.0e0 * variance"))
      .select(col("day"), col("n_events"),
        round(col("mean"), 4).as("mean_daily"),
        round(col("variance"), 4).as("var_daily"))
      .orderBy("day")
  }

  /** Batch sessionization: assign each user's events to ordinal
    * sessions split at >30 min inactivity gaps, then roll each session
    * up (count, bounds, duration). The batch analog of
    * TimeWindows.qSessionWindow — but where session_window emits the
    * window struct, this emits the classic per-user ordinal session id
    * the journey/funnel layer keys on.
    *
    * One shuffle total: the lag/running-sum windows partition by
    * user_id, and the follow-on groupBy(user_id, session_id) is
    * satisfied by that same hash partitioning (ClusteredDistribution
    * on a superset key), so Catalyst inserts no second exchange.
    * Gap arithmetic is integer microseconds (unix_micros ≡ the
    * oracle's epoch_us) — no timestamp-to-double drift. */
  def qSessionize(spark: SparkSession, d: String): DataFrame =
    sessionFrames(spark, d).orderBy("user_id", "session_id")

  /** Unordered sessionizer body — qSessionStats composes this without
    * inheriting the declared query's output sort (funnelStages'
    * precedent). */
  private def sessionFrames(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(spark, d)
      .select(col("user_id"), col("event_id"), col("ts"),
        unix_micros(col("ts")).as("us"))
      .withColumn("new_sess",
        when(col("us") - lag(col("us"), 1).over(w) > 1800000000L, 1)
          .otherwise(when(lag(col("us"), 1).over(w).isNull, 1).otherwise(0)))
      .withColumn("session_id",
        sum(col("new_sess")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("start_ts"), max(col("ts")).as("end_ts"),
        (max(col("us")) - min(col("us"))).as("duration_us"))
  }

  /** Corpus-level session distribution: the one-row engagement report
    * over the sessionizer's output (bounce share = single-event
    * sessions; typical depth and dwell as DISCRETE medians — member
    * values, every cell an exact integer, hash-stable). The global
    * exact percentile buffers the session frame in one task — fine at
    * |sessions| ≪ |events|; approx_percentile is the documented swap
    * when it isn't. */
  def qSessionStats(spark: SparkSession, d: String): DataFrame =
    sessionFrames(spark, d)
      .agg(count(lit(1)).as("n_sessions"),
        countDistinct(col("user_id")).as("n_users"),
        count(when(col("n_events") === 1, lit(1))).as("n_single_event"),
        expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY n_events) AS BIGINT)")
          .as("median_events"),
        expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY duration_us) AS BIGINT)")
          .as("median_duration_us"),
        max(col("duration_us")).as("max_duration_us"))

  /** Data freshness per feed: last-seen event time and staleness
    * against the corpus watermark — the first number an ingestion
    * dashboard shows per upstream ("is vendor X still sending?").
    * One aggregate + a broadcast 1-row corpus max; staleness is exact
    * integer µs (the engine's pinned time unit). The reference's
    * daily-completeness question (app.py:467-480) at feed grain. */
  def qFreshness(spark: SparkSession, d: String): DataFrame = {
    // watermark = max over the tiny grouped frame, NOT a second scan
    // of the raw table (the qVocabDrift second-aggregate discipline)
    val byFeed = Tables.events(spark, d).select(col("event_type"), col("ts"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"), max("ts").as("last_seen"))
      .persist() // feeds both the watermark and the report
    val wm = byFeed.agg(max("last_seen").as("watermark"))
    byFeed
      .crossJoin(broadcast(wm))
      .select(col("event_type"), col("n_events"), col("last_seen"),
        (unix_micros(col("watermark")) - unix_micros(col("last_seen")))
          .as("staleness_us"))
      .orderBy("event_type")
  }

  /** Join-key skew profile: the top-10 hottest values of a join key
    * with their share of the table — the diagnostic that decides
    * whether a join needs salting or AQE skew handling BEFORE it runs
    * (companion to q_skew_join_salted, which is the cure). One hash
    * aggregate, TakeOrderedAndProject top-k (no full-key sort), and a
    * broadcast 1-row total; share division pinned double. */
  def qSkewProfile(spark: SparkSession, d: String): DataFrame = {
    val counts = Tables.events(spark, d)
      .groupBy(col("user_id").as("key"))
      .agg(count(lit(1)).as("n"))
      .persist() // top-k + total share it
    val tot = counts.agg(sum("n").as("n_total"))
    counts.orderBy(col("n").desc, col("key")).limit(10)
      .crossJoin(broadcast(tot))
      .select(col("key"), col("n"),
        expr("round(n / CAST(n_total AS DOUBLE), 6)").as("share"))
      .orderBy(col("n").desc, col("key"))
  }

  /** RFM customer segmentation (recency / frequency / monetary
    * quartiles) — the classic warehouse segmentation report.
    *
    * The scale-critical choice: buckets come from `percentile_disc`
    * QUARTILE THRESHOLDS (a 1-row broadcast) applied as per-row
    * comparisons — NOT from `ntile(4)` windows, whose unpartitioned
    * ORDER BY would funnel every customer through one sorting task.
    * Thresholds are SELECTED member values (no interpolation
    * arithmetic), so both engines pick the identical element of the
    * identical multiset and every comparison is exact; monetary stays
    * an exact DECIMAL sum until the final per-segment cast. */
  def qRfm(spark: SparkSession, d: String): DataFrame = {
    val cust = Tables.orders(spark, d)
      .groupBy("o_custkey")
      .agg(max(col("o_orderdate").cast("date")).as("last_order"),
        count(lit(1)).as("frequency"),
        sum(col("o_totalprice").cast("decimal(18,6)")).as("monetary_dec"))
      .persist() // ref-date agg + scoring pass share it
    val ref = cust.agg(max("last_order").as("ref_date"))
    val rec = cust.crossJoin(broadcast(ref))
      .withColumn("recency_days", datediff(col("ref_date"), col("last_order")).cast("long"))
      .withColumn("m", col("monetary_dec").cast("double"))
      .persist() // threshold agg + scoring pass share it
    val th = rec.agg(
      expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY recency_days)").as("r1"),
      expr("percentile_disc(0.50) WITHIN GROUP (ORDER BY recency_days)").as("r2"),
      expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY recency_days)").as("r3"),
      expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY frequency)").as("f1"),
      expr("percentile_disc(0.50) WITHIN GROUP (ORDER BY frequency)").as("f2"),
      expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY frequency)").as("f3"),
      expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY m)").as("m1"),
      expr("percentile_disc(0.50) WITHIN GROUP (ORDER BY m)").as("m2"),
      expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY m)").as("m3"))
    def bucket(x: String, q: Seq[String]): Column =
      q.map(t => when(col(x) > col(t), 1).otherwise(0)).reduce(_ + _) + lit(1)
    rec.crossJoin(broadcast(th))
      .withColumn("r_bucket", bucket("recency_days", Seq("r1", "r2", "r3")))
      .withColumn("f_bucket", bucket("frequency", Seq("f1", "f2", "f3")))
      .withColumn("m_bucket", bucket("m", Seq("m1", "m2", "m3")))
      .withColumn("segment", concat(lit("R"), col("r_bucket"),
        lit("F"), col("f_bucket"), lit("M"), col("m_bucket")))
      .groupBy("segment")
      .agg(count(lit(1)).as("n_customers"),
        sum(col("monetary_dec")).cast("double").as("sum_monetary"))
      .orderBy("segment")
  }

  /** Pareto / revenue-concentration report: customers bucketed into
    * revenue DECILES by percentile_disc thresholds (same
    * selection-not-window pattern as qRfm — no global ntile sort),
    * each decile's share of total revenue in integer ppm.
    *
    * The share needs care twice over: revenue micros are EXACT longs
    * (DECIMAL(·,6) × 1e6 is integral by construction), and the ppm is
    * `bucket_micros div (total_micros div 1e6)` — divide-THEN-scale,
    * because scaling first would overflow BIGINT on both engines at
    * warehouse totals. Identical floor arithmetic both sides. */
  def qPareto(spark: SparkSession, d: String): DataFrame = {
    val cust = Tables.orders(spark, d)
      .groupBy("o_custkey")
      .agg(sum(col("o_totalprice").cast("decimal(18,6)")).as("rev_dec"))
      .withColumn("rev", col("rev_dec").cast("double"))
      .withColumn("rev_micros", expr("CAST(rev_dec * 1000000 AS BIGINT)"))
      .persist() // thresholds + totals + bucketing share it
    val thCols = (1 to 9).map(i =>
      expr(s"percentile_disc(0.$i) WITHIN GROUP (ORDER BY rev)").as(s"t$i")) :+
      sum(col("rev_micros")).as("total_micros")
    val th = cust.agg(thCols.head, thCols.tail: _*)
    cust.crossJoin(broadcast(th))
      .withColumn("decile",
        (1 to 9).map(i => when(col("rev") > col(s"t$i"), 1).otherwise(0))
          .reduce(_ + _) + lit(1))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_customers"),
        sum(col("rev_dec")).cast("double").as("revenue"),
        expr("sum(rev_micros) div (max(total_micros) div 1000000)").as("share_ppm"))
      .orderBy("decile")
  }

  /** Per-user activity bitmap over the trailing 64 days: one BIGINT
    * whose bit i says "active i days before the corpus watermark" —
    * the compact presence encoding retention/engagement systems keep
    * per entity (a 64-day window in 8 bytes instead of 64 rows).
    * Built with `bit_or` of `1 << day_index`: a map-side-combining
    * aggregate of longs, exact on both engines, and `bit_count` reads
    * active-day totals back out without unpacking. */
  def qActivityBitmap(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(spark, d).select(col("user_id"), to_date(col("ts")).as("day"))
    val ref = ev.agg(max("day").as("ref_day"))
    ev.crossJoin(broadcast(ref))
      .withColumn("idx", datediff(col("ref_day"), col("day")).cast("long"))
      .filter(col("idx") < 64)
      .groupBy("user_id")
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(idx AS INT)))").as("bitmap"))
      .withColumn("n_active_days", expr("CAST(bit_count(bitmap) AS BIGINT)"))
      .withColumn("active_today", expr("CAST(bitmap & 1 AS BIGINT)"))
      .select("user_id", "bitmap", "n_active_days", "active_today")
      .orderBy("user_id")
  }

  /** Last-touch marketing attribution: every purchase credits the
    * user's most recent PRECEDING non-purchase event (its type = the
    * "channel"), falling back to 'direct' for cold-start purchases.
    * One shuffle on the user key; the credited channel comes from
    * `last(..., ignoreNulls)` over ROWS UNBOUNDED PRECEDING→1
    * PRECEDING — the running carry-forward, no self-join against the
    * event history (the naive formulation joins every purchase to
    * every earlier event: quadratic per hot user). Revenue sums stay
    * exact DECIMAL until the final cast. */
  def qAttribution(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(spark, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"), col("value"))
      .withColumn("touch", last(
        when(col("event_type") =!= "purchase", col("event_type")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .withColumn("channel", coalesce(col("touch"), lit("direct")))
      .groupBy("channel")
      .agg(count(lit(1)).as("n_purchases"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("revenue"))
      .orderBy("channel")
  }

  /** Hour-of-day × day-of-week seasonal profile per event type, with
    * each cell's share of the type's total in integer ppm — the
    * calendar heatmap behind load forecasting and anomaly baselines.
    * Two map-side-combining aggregates (cells, then per-type totals
    * re-aggregated FROM the cells — never a second scan) and an
    * equi-join back on the type; weekday numbering is pinned to
    * DuckDB's dow convention (0 = Sunday) explicitly. */
  def qSeasonalProfile(spark: SparkSession, d: String): DataFrame = {
    val cells = Tables.events(spark, d)
      .groupBy(col("event_type"),
        (dayofweek(col("ts")) - 1).cast("long").as("dow"),
        hour(col("ts")).cast("long").as("hod"))
      .agg(count(lit(1)).as("n"))
      .persist() // totals re-aggregate the cells, not the corpus
    val totals = cells.groupBy("event_type").agg(sum("n").as("type_total"))
    cells.join(broadcast(totals), "event_type")
      .withColumn("share_ppm", expr("(n * 1000000) div type_total"))
      .select("event_type", "dow", "hod", "n", "share_ppm")
      .orderBy("event_type", "dow", "hod")
  }

  /** CUSUM changepoint detection over each event type's daily volume:
    * the day where the cumulative deviation from the series mean peaks
    * — where the level shift happened, not merely that one day spiked
    * (qDailyAnomaly's job).
    *
    * Parity trick: deviations are SCALED BY THE DAY COUNT
    * (dev = n·D − T instead of n − T/D), so the cumulative statistic
    * is exact integer arithmetic end to end — no mean division, no
    * float drift, hash-stable by construction. Window work is bounded
    * by the calendar (days per type), not the event volume: the heavy
    * reduction is the daily map-side-combining count. */
  def qChangepoint(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(spark, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .persist() // totals + the cusum join share it
    val totals = daily.groupBy("event_type")
      .agg(sum("n").as("total"), count(lit(1)).as("n_days"))
    daily.join(broadcast(totals), "event_type")
      .withColumn("dev_scaled", col("n") * col("n_days") - col("total"))
      .withColumn("cusum", sum("dev_scaled").over(
        Window.partitionBy("event_type").orderBy("day")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("event_type").orderBy(abs(col("cusum")).desc, col("day"))))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("day").as("cp_day"),
        abs(col("cusum")).as("cusum_abs"), col("n_days"), col("total"))
      .orderBy("event_type")
  }

  /** Lag-k autocorrelation moments of daily volume per event type
    * (k = 1 and 7: day-over-day persistence and weekly seasonality —
    * the two structures qSeasonalProfile displays, here quantified).
    * The daily series is aligned to itself at a CALENDAR lag (exact
    * integer µs-epoch day keys, so a missing day yields no pair rather
    * than silently pairing non-adjacent days).
    *
    * Parity/scale: the checked surface is the exact integer moment
    * sums (n, Σx, Σy, Σx², Σy², Σxy) from which r is one closed-form
    * step for the consumer — no division or sqrt crosses the hash.
    * Work collapses to day grain first (≤ types × days rows at ANY
    * corpus size), so the self-alignment is a broadcast join and the
    * only data-sized shuffle is the daily count's map-side-combined
    * aggregation. */
  def qAutocorr(spark: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(spark, d)
      .groupBy(col("event_type"),
        expr("unix_micros(date_trunc('day', ts))").as("day_us"))
      .agg(count(lit(1)).as("n"))
    val x = daily.select(col("event_type"), col("day_us"), col("n").as("x"))
      .withColumn("lag_days", explode(array(lit(1L), lit(7L))))
    val y = daily.select(col("event_type").as("y_et"),
      col("day_us").as("y_day"), col("n").as("y"))
    x.join(broadcast(y),
        col("y_et") === col("event_type") &&
          col("y_day") === col("day_us") + col("lag_days") * lit(86400000000L))
      .groupBy("event_type", "lag_days")
      .agg(count(lit(1)).as("n_pairs"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(expr("x * x")).as("sxx"), sum(expr("y * y")).as("syy"),
        sum(expr("x * y")).as("sxy"))
      .orderBy("event_type", "lag_days")
  }

  /** Skyline (Pareto-optimal set) per brand: parts not dominated on
    * (price low, size high) — the multi-objective shortlist query
    * ("no other same-brand part is both cheaper and at-least-as-big,
    * or as-cheap and strictly bigger"). The naive form is an O(n²)
    * dominance anti-join; for two criteria the skyline is a 1-D
    * frontier, so this plan collapses the facts to one row per
    * (brand, price) with the max size — bounded by |distinct prices|,
    * NOT row count — walks that tiny frontier with a cumulative-max
    * window, and joins the surviving (brand, price, size) triples
    * back to the fact scan (broadcastable: the frontier only
    * shrinks). Every step is a hash aggregate or a broadcast join;
    * nothing quadratic, nothing driver-side — the 100 TB shape. The
    * NOT EXISTS oracle is the semantic spec. */
  def qSkyline(spark: SparkSession, d: String): DataFrame =
    skylineOf(Tables.part(spark, d)
      .select(col("p_brand"), col("p_partkey"), col("p_size"), col("p_retailprice")))

  /** Generic frontier walk over (p_brand, p_partkey, p_size,
    * p_retailprice)-shaped input — minimize price, maximize size,
    * per brand. Factored out so the spec can fuzz it against
    * brute-force dominance on random points. */
  private[graft] def skylineOf(p: DataFrame): DataFrame = {
    val priceMax = p.groupBy("p_brand", "p_retailprice")
      .agg(max("p_size").as("smax"))
    // One row per (brand, price): a price survives iff its max size
    // strictly exceeds every cheaper price's max size (equal-price
    // smaller sizes are dominated inside the group; equal (price,
    // size) duplicates do not dominate each other and all survive).
    val w = Window.partitionBy("p_brand").orderBy("p_retailprice")
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = priceMax
      .withColumn("runmax", max("smax").over(w))
      .filter(col("runmax").isNull || col("smax") > col("runmax"))
      .select(col("p_brand"), col("p_retailprice"), col("smax"))
    p.join(broadcast(frontier), Seq("p_brand", "p_retailprice"))
      .filter(col("p_size") === col("smax"))
      .select(col("p_brand"), col("p_partkey"), col("p_size"), col("p_retailprice"))
      .orderBy("p_brand", "p_partkey")
  }

  /** A/B experiment readout: users split into two arms by a stable
    * key hash (user_id parity — the deterministic assignment an
    * experimentation system derives from the user key, never from
    * traffic order), conversion = at least one purchase event. One
    * row with the EXACT integer moments of the two-proportion test —
    * arm sizes, converter counts, floored ppm rates, and the rate
    * difference — the q_autocorr discipline: the checked surface is
    * the moments, the z statistic is one consumer step (its
    * numerator/denominator would overflow BIGINT at corpus scale and
    * carries no extra information).
    *
    * Shape at scale: the raw event stream collapses to one row per
    * USER in the first aggregate (map-side combined), and the second
    * aggregate folds users into 1 row — no join, no window, two
    * shuffles of strictly shrinking width. */
  def qAbTest(spark: SparkSession, d: String): DataFrame =
    Tables.events(spark, d)
      .select(col("user_id"), col("event_type"))
      .groupBy("user_id")
      .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("converted"))
      .withColumn("arm", pmod(col("user_id"), lit(2)))
      .groupBy() // 1-row readout
      .agg(
        count(when(col("arm") === 0, lit(1))).as("n_a"),
        sum(when(col("arm") === 0, col("converted")).otherwise(0L)).as("conv_a"),
        count(when(col("arm") === 1, lit(1))).as("n_b"),
        sum(when(col("arm") === 1, col("converted")).otherwise(0L)).as("conv_b"))
      .withColumn("rate_a_ppm", expr("(conv_a * 1000000) div n_a"))
      .withColumn("rate_b_ppm", expr("(conv_b * 1000000) div n_b"))
      .withColumn("diff_ppm", col("rate_a_ppm") - col("rate_b_ppm"))

  /** Period-over-period movers: each brand's revenue in 2000 vs 2001
    * and the top-10 absolute swings — the "what changed since last
    * period" report every BI deployment runs. ONE scan computes both
    * periods as conditional exact-decimal sums (never two filtered
    * scans self-joined on brand); the delta stays decimal until the
    * final projection, and the top-10 is a TakeOrderedAndProject on
    * (|delta| DESC, brand) — tie-broken total order, distributed
    * merge, no global sort. */
  def qMovers(spark: SparkSession, d: String): DataFrame = {
    val dec6 = (c: Column) => c.cast("decimal(18,6)")
    val rev = dec6(col("l_extendedprice")) *
      (lit(1).cast("decimal(18,6)") - dec6(col("l_discount")))
    val inYear = (y: Int) =>
      sum(when(year(col("l_shipdate")) === y, rev).otherwise(lit(0).cast("decimal(18,6)")))
    Tables.lineitem(spark, d)
      .filter(col("l_shipdate") >= lit("2000-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("2002-01-01").cast("timestamp"))
      .select("l_partkey", "l_shipdate", "l_extendedprice", "l_discount")
      .join(Tables.part(spark, d).select("p_partkey", "p_brand"),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(inYear(2000).as("rev_a"), inYear(2001).as("rev_b"))
      .select(col("p_brand"), col("rev_a").cast("double").as("rev_2000"),
        col("rev_b").cast("double").as("rev_2001"),
        (col("rev_b") - col("rev_a")).cast("double").as("delta"),
        abs(col("rev_b") - col("rev_a")).as("abs_delta"))
      .orderBy(col("abs_delta").desc, col("p_brand"))
      .limit(10)
      .drop("abs_delta")
  }

  /** Cumulative distinct users by day — the growth curve. COUNT
    * (DISTINCT) over a running window is unsupported (and would buffer
    * every key per frame anyway); the scalable identity is
    * first-occurrence attribution: each user contributes to exactly
    * the day they FIRST appeared (one row per user after the min-day
    * aggregate), daily new-user counts roll up from that, and the
    * running total is a window over ≤ |days| rows. 100 TB shape: one
    * per-user aggregate (map-side combined), then day-grain
    * everything. */
  def qCumulativeUsers(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val firstDay = Tables.events(spark, d)
      .groupBy("user_id")
      .agg(min(expr("unix_micros(date_trunc('day', ts))")).as("day_us"))
    firstDay.groupBy("day_us")
      .agg(count(lit(1)).as("n_new"))
      .withColumn("n_cumulative",
        sum("n_new").over(Window.orderBy("day_us")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy("day_us")
  }

  /** Time-weighted value aggregation (TWAP shape): per user-day, each
    * observation holds until the next one (last-observation-carried-
    * forward) and is weighted by how long it held, closing at day end
    * — the correct average for irregularly-sampled state (a sensor
    * reading, a price, a queue depth), where the arithmetic mean
    * over-weights bursts. Durations are integer SECONDS (µs div 1e6 —
    * truncation identical cross-engine) so value×duration stays an
    * exact DECIMAL(28,6); the weighted sum ships as a decimal string
    * plus the total held duration, consumer divides. One window (lead
    * within user-day — corpus-many partitions) and one aggregate. */
  def qTwap(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, d)
      .select(col("user_id"), col("event_id"), col("value"),
        unix_micros(col("ts")).as("us"),
        expr("unix_micros(date_trunc('day', ts))").as("day_us"))
    val w = Window.partitionBy("user_id", "day_us").orderBy("us", "event_id")
    ev.withColumn("next_us",
        coalesce(lead("us", 1).over(w), col("day_us") + lit(86400000000L)))
      .withColumn("dur_s", expr("(next_us - us) div 1000000"))
      .groupBy("user_id", "day_us")
      .agg(count(lit(1)).as("n_events"),
        sum("dur_s").as("held_s"),
        sum(col("value").cast("decimal(18,6)") * col("dur_s")).cast("string")
          .as("weighted_sum"))
      .orderBy("user_id", "day_us")
  }

  /** Distribution-drift bins (PSI shape) — the monitoring table that
    * catches a feature's distribution moving between two periods: the
    * event value binned into ten fixed-width buckets, with counts and
    * floored-ppm shares for the baseline (first half of the calendar)
    * and the comparison window (second half) side by side. The PSI
    * Σ(share_b − share_a)·ln(share_b/share_a) is one consumer
    * expression over the shipped integers — no ln in the checked
    * surface. ONE scan: the period flag and the bin are projections,
    * the table collapses to ≤ 10 rows map-side, and the two period
    * totals re-aggregate the bin frame (never a second corpus scan).
    * Fixed-width bins (not quantiles) keep the bin EDGES
    * data-independent, so two clusters computing the audit on
    * different shards can merge their counts. */
  def qDriftBins(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(spark, d)
      .select(col("value"),
        (col("ts") >= lit("2024-01-16").cast("timestamp")).as("is_b"))
      // value ∈ [0, ~500) in the fixtures; clamp into the fixed grid
      .withColumn("bin", least(greatest(floor(col("value") / 50.0), lit(0L)), lit(9L)))
    val bins = ev.groupBy("bin")
      .agg(sum(when(!col("is_b"), 1L).otherwise(0L)).as("n_a"),
        sum(when(col("is_b"), 1L).otherwise(0L)).as("n_b"))
    val totals = bins.agg(sum("n_a").as("ta"), sum("n_b").as("tb"))
    bins.crossJoin(broadcast(totals))
      .select(col("bin"), col("n_a"), col("n_b"),
        expr("(n_a * 1000000) div ta").as("share_a_ppm"),
        expr("(n_b * 1000000) div tb").as("share_b_ppm"))
      .orderBy("bin")
  }

  /** Population-stability index per event type: the scalar that pages
    * someone when [[qDriftBins]]' histogram moves — PSI =
    * Σ(p_b−p_a)·ln(p_b/p_a) over the same fixed 10-bin value grid,
    * add-1 smoothed so empty bins stay finite (industry rule of
    * thumb: >0.2 means the feature shifted enough to retrain).
    * Smoothed shares are ratios of exact integers; each bin term is
    * one double expression over identical operands, pinned to
    * DECIMAL(18,12) before the exact sum. ONE scan collapses to
    * ≤|types|×10 rows map-side; per-type totals re-aggregate the bin
    * frame. */
  def qPsiDrift(spark: SparkSession, d: String): DataFrame = {
    val bins = Tables.events(spark, d)
      .select(col("event_type"), col("value"),
        (col("ts") >= lit("2024-01-16").cast("timestamp")).as("is_b"))
      .withColumn("bin", least(greatest(floor(col("value") / 50.0), lit(0L)), lit(9L)))
      .groupBy("event_type", "bin")
      .agg(sum(when(!col("is_b"), 1L).otherwise(0L)).as("n_a"),
        sum(when(col("is_b"), 1L).otherwise(0L)).as("n_b"))
      .persist() // per-type totals re-aggregate the bin frame
    val totals = bins.groupBy("event_type")
      .agg(sum("n_a").as("ta"), sum("n_b").as("tb"))
    bins.join(broadcast(totals), "event_type")
      .withColumn("term", expr(
        """(CAST(n_b + 1 AS DOUBLE) / (tb + 10) - CAST(n_a + 1 AS DOUBLE) / (ta + 10))
          | * ln(CAST((n_b + 1) * (ta + 10) AS DOUBLE) / ((tb + 10) * (n_a + 1)))"""
          .stripMargin))
      .groupBy("event_type")
      .agg(max("ta").as("n_a_total"), max("tb").as("n_b_total"),
        sum(col("term").cast("decimal(18,12)")).cast("double").as("psi_nats"))
      .orderBy("event_type")
  }

  /** Daily close with carry-forward: each user's LAST event value per
    * calendar day, forward-filled across silent days on the observed
    * day grid — the end-of-day balance table every financial/metrics
    * mart materializes (reads join on (user, day) instead of running
    * an as-of scan per query). Last-of-day is max_by on (ts,
    * event_id) — deterministic under timestamp ties; the fill is
    * last(ignoreNulls) over the per-user day-ordered frame of the
    * |users|×|days| grid, never over the event stream; values
    * floor-pinned to milli. is_carried marks filled rows. Grid rows
    * before a user's first event stay null-valued and are dropped
    * (the account does not exist yet). */
  def qDailyClose(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(spark, d)
    val perDay = ev
      .select(col("user_id"), to_date(col("ts")).as("day"), col("ts"),
        col("event_id"), col("value"))
      .groupBy("user_id", "day")
      .agg(max_by(col("value"), struct(col("ts"), col("event_id"))).as("close"))
    val grid = ev.select(col("user_id")).distinct()
      .crossJoin(broadcast(ev.select(to_date(col("ts")).as("day")).distinct()))
    val wFill = Window.partitionBy("user_id").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(perDay, Seq("user_id", "day"), "left")
      .withColumn("filled", last("close", ignoreNulls = true).over(wFill))
      .filter(col("filled").isNotNull)
      .select(col("user_id"), col("day"),
        expr("CAST(floor(filled * 1000) AS BIGINT)").as("close_milli"),
        col("close").isNull.as("is_carried"))
      .orderBy("user_id", "day")
  }

  /** Per-user behavioral entropy over event types — the bot/script
    * detector next to volume-based profiling: a human mixes
    * browse/click/purchase (entropy near ln k); a scraper fires one
    * type (entropy near 0 with high volume — exactly the flagged
    * quadrant). Shannon entropy from exact per-user type counts via
    * the qEntropy decimal-pin recipe; top-type share in integer ppm.
    * One |users|×|types| aggregate, then a per-user rollup. */
  def qUserEntropy(spark: SparkSession, d: String): DataFrame = {
    val cells = Tables.events(spark, d)
      .groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("c"))
      .persist() // per-user totals re-aggregate the cell frame
    val totals = cells.groupBy("user_id").agg(sum("c").cast("long").as("n"))
    cells.join(totals, "user_id")
      .groupBy("user_id")
      .agg(max("n").as("n_events"),
        count(lit(1)).as("n_types"),
        max("c").cast("long").as("top_c"),
        (-sum(((col("c") / col("n")) * log(col("c") / col("n")))
          .cast("decimal(18,12)")).cast("double")).as("entropy"))
      .withColumn("top_share_ppm", expr("(top_c * 1000000) div n_events"))
      .select("user_id", "n_events", "n_types", "entropy", "top_share_ppm")
      .orderBy("user_id")
  }

  /** First-digit (Benford) audit of order totals — the forensic
    * profile that flags fabricated or re-scaled monetary data: natural
    * multi-scale amounts lead with 1 ~30% of the time (log10(1+1/d));
    * synthetic uniform data flattens to ~11% per digit. Declared
    * output is the observed digit histogram with ppm shares plus the
    * Benford expectation in ppm — the consumer (or the spec) judges
    * the distance; both columns are exact integers. The digit
    * extraction is string-of-integer-part (identical cross-engine,
    * no log10/pow in the row path); one map-side-combined 9-row
    * aggregate of the fact. */
  def qBenford(spark: SparkSession, d: String): DataFrame = {
    // log10(1 + 1/d) in ppm, d = 1..9 — fixed constants of the law
    val expected = Seq(301030L, 176091L, 124939L, 96910L, 79181L,
      66947L, 57992L, 51153L, 45757L)
    val expCol = element_at(array(expected.map(lit): _*), col("digit").cast("int"))
    val digits = Tables.orders(spark, d)
      .select(substring(floor(col("o_totalprice")).cast("long").cast("string"), 1, 1)
        .cast("long").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    digits
      .crossJoin(broadcast(digits.agg(sum("n").as("total"))))
      .select(col("digit"), col("n"),
        expr("(n * 1000000) div total").as("share_ppm"),
        expCol.as("benford_ppm"))
      .orderBy("digit")
  }

  /** Lagged cross-correlation between the click and purchase daily
    * series: for each lag in −3..3 days, the co-moment sums over days
    * where both series exist (click on day d, purchase on day d+lag)
    * — does engagement LEAD conversion, and by how many days? The
    * fact collapses to |days|×2 rows in one filtered aggregate before
    * anything joins (the 100 TB scan happens exactly once); the lag
    * expansion (×7) and self-join run on the tiny daily frame,
    * broadcast. Declared output is exact integer moment sums — the
    * Pearson normalization is one double expression the consumer (or
    * the spec) applies; shipping sums keeps the surface hash-stable
    * and mergeable across re-runs (same contract as qAutocorr). */
  def qCrossCorr(spark: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(spark, d)
      .filter(col("event_type").isin("click", "purchase"))
      .groupBy(col("event_type"),
        expr("unix_micros(date_trunc('day', ts))").as("day_us"))
      .agg(count(lit(1)).as("n"))
      // No unpersist on purpose (repo-wide pattern): declared queries
      // are lazy plans, so the cache cannot be dropped before the
      // caller's action, and both mains clearCache() right after it
      // (Verify.scala:41, Bench.scala:60) — nothing accumulates
      // across the 225-query session.
      .persist()
    val x = daily.filter(col("event_type") === "click")
      .select(col("day_us"), col("n").as("x"))
      .withColumn("lag_days", explode(array((-3L to 3L).map(lit): _*)))
    val y = daily.filter(col("event_type") === "purchase")
      .select(col("day_us").as("y_day"), col("n").as("y"))
    x.join(broadcast(y),
        col("y_day") === col("day_us") + col("lag_days") * lit(86400000000L))
      .groupBy("lag_days")
      .agg(count(lit(1)).as("n_days"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(expr("x * x")).as("sxx"), sum(expr("y * y")).as("syy"),
        sum(expr("x * y")).as("sxy"))
      .orderBy("lag_days")
  }

  /** Half-life-decayed trending score per event type: each event
    * contributes value·2^(−age_days/7) anchored at the corpus
    * watermark day — the "what is hot NOW" ranking that a plain sum
    * can't give (a type whose volume all landed three weeks ago decays
    * 8×; yesterday's spike dominates). The checked surface is
    * all-integer: v_milli = ⌊value·1000⌋ and w_ppm = ⌊2^(−k/7)·10⁶⌋
    * (exact powers of two at k≡0 mod 7; elsewhere ≥8e-3 ppm from a
    * flip boundary while cross-libm pow noise is ~1e-8 ppm), so the
    * decayed mass is a 64-bit integer sum in nano-value units. One
    * scan + 1-row watermark broadcast + map-side-combining aggregate. */
  def qDecayedTrend(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(spark, d)
    val wm = ev.agg(max(to_date(col("ts"))).as("wm_day"))
    ev.select(col("event_type"), col("value"), to_date(col("ts")).as("day"))
      .crossJoin(broadcast(wm)) // 1-row watermark (PlanQualitySpec-allowlisted)
      .withColumn("age_days", datediff(col("wm_day"), col("day")).cast("long"))
      // NB: the exponent divides by CAST(7 AS DOUBLE), not the literal
      // 7.0 — Spark parses 7.0 as DECIMAL(2,1) and long/decimal
      // division rounds the exponent to scale 6 (−0.571429), which
      // moved pow() by 2e-7 and flipped two floor-pinned weights vs
      // the oracle's double-literal semantics.
      .withColumn("w_ppm",
        expr("CAST(floor(pow(2.0, -age_days / CAST(7 AS DOUBLE)) * 1000000) AS BIGINT)"))
      .withColumn("v_milli", expr("CAST(floor(value * 1000) AS BIGINT)"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum("v_milli").as("raw_milli"),
        sum(expr("v_milli * w_ppm")).as("decayed_nano"))
      .withColumn("retained_ppm", expr("decayed_nano div greatest(raw_milli, 1L)"))
      .orderBy(col("decayed_nano").desc, col("event_type"))
  }

  /** Return-hazard table from per-user inter-event gaps: for each gap
    * length d (days, capped at 14+), the number of gaps that ENDED at
    * exactly d, the survivors (gaps ≥ d), and the discrete hazard
    * n_d·10⁶ div survivors_d — P(user returns on day d | silent d so
    * far), the curve a re-engagement campaign reads to time its nudge
    * (hazard collapsing after day k ⇒ day k is the intervention
    * point). Consecutive-event gaps via one lead() over the per-user
    * sort; the survival cumulative runs over the ≤15-row bucket frame,
    * not the event stream. All-integer. */
  def qReturnHazard(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts")
    val wCum = Window.orderBy("gap_days")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    Tables.events(spark, d)
      .select(col("user_id"), col("ts"))
      .withColumn("next_ts", lead("ts", 1).over(w))
      .filter(col("next_ts").isNotNull)
      .select(least(datediff(to_date(col("next_ts")), to_date(col("ts"))).cast("long"),
        lit(14L)).as("gap_days"))
      .groupBy("gap_days").agg(count(lit(1)).as("n_returns"))
      .withColumn("survivors", sum("n_returns").over(wCum))
      .withColumn("hazard_ppm", expr("(n_returns * 1000000) div survivors"))
      .orderBy("gap_days")
  }

  /** Cohort LTV matrix: users grouped by first-activity day, their
    * event value accumulated over weeks-since-acquisition — the
    * revenue companion to [[qRetention]]'s presence counts (retention
    * says a cohort still shows up; LTV says whether it PAYS, and the
    * flattening week is when acquisition spend stops paying back).
    * Week offsets come from integer day arithmetic; revenue sums are
    * exact DECIMAL(18,6); the cumulative runs over the ≤5-row
    * per-cohort week frame, not the event stream; per-user LTV milli
    * divides the floor-pinned cumulative by the FIXED cohort size
    * (day-0 users), not the still-active count. */
  def qCohortLtv(spark: SparkSession, d: String): DataFrame = {
    val firstDay = Tables.events(spark, d)
      .groupBy("user_id").agg(min(to_date(col("ts"))).as("cohort_day"))
    val cohortSize = firstDay.groupBy("cohort_day")
      .agg(count(lit(1)).as("cohort_users"))
    val wCum = Window.partitionBy("cohort_day").orderBy("wk")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, d)
      .select(col("user_id"), to_date(col("ts")).as("day"), col("value"))
      .join(firstDay, "user_id")
      .withColumn("wk", expr("CAST(datediff(day, cohort_day) AS BIGINT) div 7"))
      .groupBy("cohort_day", "wk")
      .agg(countDistinct("user_id").as("active_users"),
        sum(col("value").cast("decimal(18,6)")).as("rev_dec"))
      .withColumn("cum_rev_milli",
        floor(sum("rev_dec").over(wCum) * lit(1000)).cast("long"))
      .join(broadcast(cohortSize), "cohort_day")
      .withColumn("ltv_milli", expr("cum_rev_milli div cohort_users"))
      .select(col("cohort_day"), col("wk"), col("cohort_users"),
        col("active_users"), col("rev_dec").cast("double").as("week_revenue"),
        col("cum_rev_milli"), col("ltv_milli"))
      .orderBy("cohort_day", "wk")
  }

  /** Top event-path trigrams: the most common 3-step event sequences
    * across user journeys — the sequence-mining pass behind "what do
    * users actually do" (and the n-gram generalization of
    * [[qEventTransitions]]' bigram matrix; a trigram whose tail
    * diverges from the bigram's prediction is a branching point worth
    * instrumenting). Two leads over one per-user sort (ties broken by
    * event_id so the path multiset is deterministic), then a hash
    * aggregate over path strings; the top-20 cut and share ppm price
    * against the 1-row trigram total. */
  def qPathTrigrams(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val tri = Tables.events(spark, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("e2", lead("event_type", 1).over(w))
      .withColumn("e3", lead("event_type", 2).over(w))
      .filter(col("e3").isNotNull)
      .select(concat_ws(">", col("event_type"), col("e2"), col("e3")).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .persist() // total + top-20 read it
    val total = tri.agg(sum("n").cast("long").as("n_total"))
    tri.crossJoin(broadcast(total)) // 1-row trigram total (allowlisted)
      .withColumn("share_ppm", expr("(n * 1000000) div n_total"))
      .select("path", "n", "share_ppm")
      .orderBy(col("n").desc, col("path"))
      .limit(20)
  }

  /** Rolling-activity stickiness: per day, distinct active users that
    * day (DAU), over the trailing 7 days (WAU), and the trailing 28
    * days (MAU), with DAU/WAU and WAU/MAU ratios in ppm — the
    * engagement dashboard's headline series. The event stream first
    * collapses to distinct (user, day) pairs (map-side, ∝ active
    * pairs not events); each pair then lands on ≤28 grid days via a
    * banded range join against the day dimension — the bounded-
    * expansion sliding-distinct shape (never a per-day rescan of the
    * stream). Days with no trailing history still price correctly
    * because the grid comes from the observed day span. */
  def qWauStickiness(spark: SparkSession, d: String): DataFrame = {
    val userDays = Tables.events(spark, d)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .persist() // day grid + banded join both read it
    val days = userDays.select("day").distinct()
    userDays.join(days.withColumnRenamed("day", "grid_day"),
        datediff(col("grid_day"), col("day")).between(0, 27))
      .groupBy("grid_day")
      .agg(countDistinct(when(col("day") === col("grid_day"), col("user_id")))
          .as("dau"),
        countDistinct(when(datediff(col("grid_day"), col("day")) <= 6, col("user_id")))
          .as("wau"),
        countDistinct("user_id").as("mau"))
      .withColumn("dau_wau_ppm", expr("(dau * 1000000) div wau"))
      .withColumn("wau_mau_ppm", expr("(wau * 1000000) div mau"))
      .select(col("grid_day").as("day"), col("dau"), col("wau"), col("mau"),
        col("dau_wau_ppm"), col("wau_mau_ppm"))
      .orderBy("day")
  }

  /** Spearman rank correlation per event type between the event value
    * and its payload size — the MONOTONE-association companion to
    * [[qCorrGroup]]'s Pearson: rank-based, so invariant to any
    * monotone rescaling of either axis and robust to the heavy tails
    * both axes have. Ties get average ranks, kept exact by DOUBLING
    * (a tie-averaged rank is always a multiple of ½): 2·avgrank =
    * 2·rank() + tiecount − 1 via two windows per axis, then Spearman
    * is Pearson over the doubled ranks with EXACT int64 moment sums —
    * only the final ratio is floating (rounded to 6dp, the qCorrGroup
    * pin). Magnitude ceiling: the doubled ranks are CENTERED by their
    * exact group mean (see inline comment), so every moment sum is
    * ≤ n³/3 — int64-safe to n ≈ 3e6 rows per group (~20× the K=10
    * probe's largest type); past that, stage per-group scaling of the
    * centered ranks before the moment aggregate.
    *
    * Plan shape for 100 TB: two rank windows + one aggregate, all
    * partitioned by event_type — no global sort, no driver loop; for
    * a skewed type the rank window is the classic sort-within-group
    * and would salt the same way qGroupAggSalted does. */
  def qSpearman(spark: SparkSession, d: String): DataFrame = {
    val base = Tables.events(spark, d)
      .select(col("event_type"), col("value"),
        length(col("props")).cast("long").as("plen"))
    // doubled tie-averaged rank, CENTERED by its exact group mean n+1
    // (Σ avgrank = n(n+1)/2, so Σ2r = n(n+1)): zero-mean integers keep
    // every moment sum ≤ n³/3 — int64-safe to n ≈ 3e6 rows per group
    // instead of the raw formula's 4n⁴ blowup
    def rank2c(v: String) =
      lit(2L) * rank().over(Window.partitionBy("event_type").orderBy(col(v))) +
        count(lit(1)).over(Window.partitionBy("event_type", v)) - 1L -
        (count(lit(1)).over(Window.partitionBy("event_type")) + 1L)
    base
      .withColumn("cx", rank2c("value"))
      .withColumn("cy", rank2c("plen"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("cx") * col("cy")).as("sxy"),
        sum(col("cx") * col("cx")).as("sxx"),
        sum(col("cy") * col("cy")).as("syy"))
      .select(col("event_type"), col("n"),
        // degenerate-axis guard (all-tied values): NULL, not NaN/Inf
        round(when(col("sxx") === 0L || col("syy") === 0L, lit(null))
          .otherwise(col("sxy").cast("double") /
            (sqrt(col("sxx").cast("double")) * sqrt(col("syy").cast("double")))), 6)
          .as("spearman"))
      .orderBy("event_type")
  }
}
