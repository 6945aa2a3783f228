package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Feature preparation for model training — the projection/encoding
  * layer that turns landed corpus tables into training matrices. The
  * reference stops at landing bytes (app.py:449-463); a training
  * pipeline continues into exactly these shapes: hashed sparse
  * features, categorical encodings, normalized numerics, fold
  * assignments, and class weights.
  *
  * Scale rules this module holds to:
  *  - Encodings are PROJECTIONS (no shuffle) wherever the vocabulary
  *    is fixed (one-hot over a known dim) — codegen'd `when` chains,
  *    not a pivot over a shuffled group-by.
  *  - Anything keyed by content (hashing trick, fold id) derives from
  *    md5 — deterministic, uniformly spread, reproducible across
  *    engines and retries, and never dependent on row order or
  *    partitioning (the same contract as Packing.qShardAssign).
  *  - Statistics that feed a normalization (min/max, target means)
  *    reduce to dim-sized aggregates and broadcast back — the fact
  *    table streams through one scan + one map-side-combined agg.
  */
object FeaturePrep {

  private def dec(c: Column): Column = c.cast("decimal(18,6)")

  /** Hashing-trick sparse features: each document's term counts bucketed
    * into a fixed 256-slot space keyed by the first byte of
    * md5("fh:" + term). The classic collision-tolerant encoder for
    * unbounded vocabularies — the feature dimensionality is constant no
    * matter how the corpus grows, so the 100 TB shuffle is bounded by
    * docs × 256, never by vocabulary. Map-side combine collapses each
    * doc's repeated terms before the (doc_id, bucket) exchange. */
  def qFeatureHash(spark: SparkSession, d: String): DataFrame =
    Tables.documentsSpread(spark, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .select(col("doc_id"), substring(md5(concat(lit("fh:"), col("w"))), 1, 2).as("bucket"))
      .groupBy("doc_id", "bucket")
      .agg(count(lit(1)).as("tf"))
      .orderBy("doc_id", "bucket")

  /** One-hot encoding of a fixed categorical dim (market segment).
    * Pure projection: a codegen'd `when` chain per known level, NO
    * shuffle, no pivot — the vocabulary is part of the schema contract,
    * so at 100 TB this is a single pass that fuses into whatever scan
    * feeds it. (A groupBy().pivot() would shuffle the fact AND make
    * the output schema data-dependent — wrong on both axes.) */
  def qOnehot(spark: SparkSession, d: String): DataFrame = {
    val levels = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
    val indicators = levels.map(l =>
      when(col("c_mktsegment") === l, lit(1L)).otherwise(lit(0L))
        .as("seg_" + l.toLowerCase))
    Tables.customer(spark, d)
      .select(col("c_custkey") +: indicators: _*)
      .orderBy("c_custkey")
  }

  /** Per-type min-max normalization of the event value: the per-key
    * extrema reduce to |event_type| rows (map-side combined), broadcast
    * back, and the fact is rescaled in one projection. The normalized
    * value is (v−min)/(max−min) computed in DOUBLE — a single IEEE
    * subtraction/division on exact inputs, bit-identical in any engine
    * (the cross-engine hazards are decimal→double casts and round(),
    * not arithmetic). Degenerate keys (max = min) normalize to 0. */
  def qMinmaxNorm(spark: SparkSession, d: String): DataFrame = {
    val extrema = Tables.events(spark, d)
      .groupBy("event_type")
      .agg(min("value").as("v_min"), max("value").as("v_max"))
    Tables.events(spark, d)
      .select("event_id", "event_type", "value")
      .join(broadcast(extrema), Seq("event_type"))
      .select(col("event_id"), col("event_type"),
        when(col("v_max") === col("v_min"), lit(0.0))
          .otherwise((col("value") - col("v_min")) / (col("v_max") - col("v_min")))
          .as("norm_value"))
      .orderBy("event_id")
  }

  /** Smoothed target encoding of market segment by order value:
    * enc(seg) = (Σ_seg target + m·prior) / (n_seg + m) with m = 10 and
    * prior = the global mean — the standard leak-resistant categorical
    * encoder for high-cardinality keys. Sums are exact DECIMAL (order-
    * independent); the encoding itself is a fixed sequence of double
    * ops on those exact sums, so it is deterministic without any
    * decimal division (whose result scale differs between engines).
    * The fact joins the customer dim on custkey (co-partitionable),
    * collapses to |segments| rows, and the 1-row global prior derives
    * from the per-segment frame — the fact is scanned ONCE. */
  def qTargetEncode(spark: SparkSession, d: String): DataFrame = {
    val perSeg = Tables.orders(spark, d).select("o_custkey", "o_totalprice")
      .join(Tables.customer(spark, d).select("c_custkey", "c_mktsegment"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"), sum(dec(col("o_totalprice"))).as("s"))
    val global = perSeg.agg(sum("s").as("gs"), sum("n_orders").as("gn"))
    perSeg.crossJoin(broadcast(global))
      .select(col("c_mktsegment"), col("n_orders"),
        col("s").cast("double").as("sum_total"),
        ((col("s").cast("double") + lit(10.0) * (col("gs").cast("double") / col("gn"))) /
          (col("n_orders") + lit(10.0))).as("enc"))
      .orderBy("c_mktsegment")
  }

  /** Deterministic k-fold assignment (k = 5) keyed by content hash:
    * fold = md5("fold:" + doc_id)[0..4] mod 5 — reproducible across
    * runs, engines, and repartitions (the Sampling module's hash-
    * threshold contract, applied to cross-validation). The declared
    * output is the fold × language occupancy grid, which is exactly
    * what a practitioner audits before trusting a split: roughly equal
    * fold sizes, every language present in every fold. */
  def qKfold(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .select(
        (conv(substring(md5(concat(lit("fold:"), col("doc_id"))), 1, 4), 16, 10)
          .cast("long") % 5).as("fold"),
        col("lang"), col("n_chars"))
      .groupBy("fold", "lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").cast("long").as("sum_chars"))
      .orderBy("fold", "lang")

  /** Inverse-frequency class weights over the embedding labels:
    * w(c) = N / (k · n_c), the standard balanced-training reweighting.
    * One map-side-combined count per class; the 1-row total re-derives
    * from the per-class frame (no second scan) and the weight is a
    * single double division of exact longs. */
  def qClassWeights(spark: SparkSession, d: String): DataFrame = {
    val perClass = Tables.embeddings(spark, d)
      .groupBy("label").agg(count(lit(1)).as("n"))
    val totals = perClass.agg(sum("n").as("total"), count(lit(1)).as("k"))
    perClass.crossJoin(broadcast(totals))
      .select(col("label"), col("n"),
        (col("total").cast("double") / (col("k") * col("n"))).as("weight"))
      .orderBy("label")
  }

  /** Weight-of-evidence encoding of day-of-week against the purchase
    * label — the scorecard-standard categorical encode (qTargetEncode
    * gives the mean; WoE gives the LOG-ODDS shift, which is what
    * linear/scorecard models consume, with ±0.5 Laplace smoothing so
    * empty cells stay finite). woe = ln(((2g+1)·B)/((2b+1)·G)): the
    * half-counts are cleared to exact integers by doubling, so the
    * single ln() per row sees identical operands on both engines and
    * no sum of doubles exists anywhere. Weekday numbering pinned to
    * DuckDB's dow (0=Sunday), the qSeasonalProfile convention. */
  def qWoeEncode(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(spark, d)
      .select((dayofweek(col("ts")) - 1).cast("long").as("dow"),
        (col("event_type") === "purchase").as("is_good"))
    val tot = ev.agg(sum(when(col("is_good"), 1L).otherwise(0L)).as("g_tot"),
      sum(when(!col("is_good"), 1L).otherwise(0L)).as("b_tot"))
    ev.groupBy("dow")
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("is_good"), 1L).otherwise(0L)).as("n_good"),
        sum(when(!col("is_good"), 1L).otherwise(0L)).as("n_bad"))
      .crossJoin(broadcast(tot)) // 1-row label totals (PlanQualitySpec-allowlisted)
      .withColumn("woe_nats", expr(
        "ln(CAST((2 * n_good + 1) * b_tot AS DOUBLE) / ((2 * n_bad + 1) * g_tot))"))
      .select("dow", "n_events", "n_good", "n_bad", "woe_nats")
      .orderBy("dow")
  }

  /** Leakage-safe rolling features: for EVERY event, the same user's
    * activity in the strictly-prior 7-day window [ts−7d, ts) — the
    * point-in-time feature join done as a RANGE frame on epoch
    * micros, the only frame that is correct under timestamp ties
    * (ROWS frames split ties arbitrarily; this excludes the current
    * instant entirely, so no event ever sees itself or a same-instant
    * sibling — the training-serving-skew guarantee). Counts are
    * integers; the value sum is an exact DECIMAL window floor-pinned
    * to milli, so the checked surface has no float accumulation. One
    * hash exchange on user + in-partition sort. */
  def qPitRolling(spark: SparkSession, d: String): DataFrame = {
    val week = 7L * 24 * 3600 * 1000000
    val w = Window.partitionBy("user_id").orderBy("us")
      .rangeBetween(-week, -1L)
    Tables.events(spark, d)
      .select(col("event_id"), col("user_id"), col("ts"),
        unix_micros(col("ts")).as("us"),
        col("value").cast("decimal(18,6)").as("v"))
      .withColumn("prior_n_7d", count(lit(1)).over(w))
      .withColumn("prior_sum_milli",
        floor(coalesce(sum("v").over(w), lit(0).cast("decimal(18,6)")) * lit(1000))
          .cast("long"))
      .select("event_id", "user_id", "ts", "prior_n_7d", "prior_sum_milli")
      .orderBy("event_id")
  }
}
