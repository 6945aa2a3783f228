package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Deterministic sampling for training-data curation.
  *
  * `sample()`/`rand()` are banned on this path: a training corpus
  * sample must be REPRODUCIBLE across re-runs, cluster sizes, and
  * engines (the oracle re-derives it bit-for-bit in DuckDB). The
  * sampling key is a cryptographic hash of a salted record key —
  * uniform over [0, 16^4), uncorrelated with any data column — and a
  * record is in the sample iff its hash prefix falls below the
  * stratum's threshold. Fixed-width lowercase-hex strings compare
  * lexicographically exactly as their numeric values, so the whole
  * predicate is a codegen'd string compare on both engines.
  *
  * This is a narrow, shuffle-free map over the corpus: at 100 TB it
  * costs one scan, composes with partition pruning, and never needs a
  * global count or sort the way reservoir/exact-k sampling does.
  */
object Sampling {

  /** Per-language downsampling (the classic corpus-rebalance move:
    * throttle the dominant language, keep more of the rest):
    * en is kept at ~10% (0x1999/0x10000), everything else at ~40%
    * (0x6666/0x10000). */
  /** Deterministic WEIGHTED sampling (Efraimidis–Spirakis priority
    * sampling): each doc draws a reproducible uniform u from a salted
    * md5 (13 hex chars = 52 bits, exact in a double) and competes with
    * key u^(1/w), w = n_chars — longer documents win proportionally
    * more often, and the top-k by key IS a weighted-without-replacement
    * sample. Fully distributed: the top-20 is a TakeOrderedAndProject
    * (per-partition heads, driver merge), no shuffle of the corpus.
    * u is an exact 52-bit integer scaled by a power of two, so both
    * engines compute bit-identical inputs to pow(); Java and C pow are
    * ≤1 ulp apart, negligible against the ~1e-4 typical key spacing
    * (same accepted boundary risk as every ln-scored query here). */
  def qWeightedSample(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .withColumn("u52",
        conv(substring(md5(concat(lit("wsmp:"), col("doc_id").cast("string"))), 1, 13),
          16, 10).cast("double"))
      .withColumn("key",
        pow(col("u52") / lit(4503599627370496.0), lit(1.0) / col("n_chars")))
      .orderBy(col("key").desc, col("doc_id"))
      .limit(20)
      .select(col("doc_id"), col("n_chars"), round(col("key"), 6).as("priority"))

  def qStratifiedSample(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .withColumn("hk",
        substring(md5(concat(lit("smpl:"), col("doc_id").cast("string"))), 1, 4))
      .withColumn("thresh",
        when(col("lang") === "en", lit("1999")).otherwise(lit("6666")))
      .filter(col("hk") < col("thresh"))
      .select("doc_id", "lang", "source", "hk")
      .orderBy("doc_id")

  /** Exact-k per-stratum sample: the 5 documents per language with the
    * smallest salted-md5 hash — deterministic (same winners on every
    * rerun/engine) and bounded-output. Rate sampling (above) can't
    * promise "exactly k"; the naive exact-k (row_number over a window)
    * full-sorts every stratum. This form routes through the bounded
    * TopKAggregator: map-side partial aggregation ships ≤ k rows per
    * (stratum, partition), so bytes shuffled are k × strata regardless
    * of corpus size. The 13-hex-char hash prefix (52 bits) is exact in
    * the aggregator's Double key, and fixed-width hex compares
    * lexicographically as its numeric value, so the oracle's
    * string-ordered row_number picks identical winners. */
  def qGroupSample(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, d)
      .select(col("lang"), col("doc_id"),
        negate(conv(substring(md5(concat(lit("gs:"), col("doc_id").cast("string"))), 1, 13),
          16, 10).cast("double")).as("nk"))
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .agg(new graft.functions.TopKAggregator[(String, Long, Double)](
        5, r => (r._3, r._2)).toColumn.name("topk"))
      .toDF("lang", "topk")
      .select(col("lang"), posexplode(col("topk")).as(Seq("pos", "e")))
      .select(col("lang"), col("e._2").as("doc_id"), (col("pos") + 1).as("rn"))
      .orderBy("lang", "rn")
  }

  /** Deterministic train/val/test assignment — the split every corpus
    * ships with, done the only way that survives re-runs and late
    * arrivals: hash the stable record key, never `rand()` and never
    * position. The first salted-md5 hex nibble partitions 16 ways:
    * 0-c → train (13/16 ≈ 81%), d-e → val (2/16), f → test (1/16).
    * A document's split is a pure function of its id — re-ingesting,
    * re-sharding, or growing the corpus never moves an old doc across
    * splits (the property that prevents silent test-set leakage).
    * Declared surface is the per-(source, split) accounting; the
    * assignment itself is a shuffle-free codegen'd projection any
    * downstream query can inline. */
  def qDataSplit(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .withColumn("h", substring(md5(concat(lit("split:"), col("doc_id"))), 1, 1))
      .withColumn("split",
        when(col("h") <= "c", "train").when(col("h") <= "e", "val").otherwise("test"))
      .groupBy("source", "split")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").cast("long").as("sum_chars"),
        min("doc_id").as("min_doc"))
      .orderBy("source", "split")

  /** Source mixture reweighting: the per-source sampling multiplier
    * that flattens the corpus to a uniform per-source token budget —
    * the standard domain-mixing step before training (a source with
    * 2× its fair share of tokens gets weight 0.5; a rare source gets
    * > 1, i.e. upsampling/repetition). weight = (total/n_sources) /
    * source_chars, computed in one aggregate pass plus a broadcast
    * 1-row total — no second scan, no driver-side math. The division
    * chain is pinned as the same double expression on both engines. */
  /** Shared per-source budget frame: (source, n_docs, sum_chars) ×
    * broadcast (total_chars, n_sources), with the UNROUNDED uniform-
    * budget weight `w` = (total/n_sources)/sum_chars. Both the
    * mixture-weight report and the upsampling plan derive from this
    * one expression, so the budget definition can never silently
    * diverge between them. */
  private def sourceBudget(spark: SparkSession, d: String): DataFrame = {
    val bySrc = Tables.documents(spark, d)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").cast("long").as("sum_chars"))
    val tot = bySrc.agg(sum("sum_chars").cast("long").as("total_chars"),
      count(lit(1)).as("n_sources"))
    bySrc.crossJoin(broadcast(tot))
      .withColumn("w", expr("CAST(total_chars AS DOUBLE) / n_sources / sum_chars"))
  }

  def qMixWeights(spark: SparkSession, d: String): DataFrame =
    sourceBudget(spark, d)
      .select(col("source"), col("n_docs"), col("sum_chars"),
        round(col("w"), 4).as("weight"))
      .orderBy("source")

  /** Upsampling plan: turn a per-source mixture weight w into the
    * epochs-and-remainder recipe a dataloader executes — every doc
    * repeats floor(w) times, plus one extra copy for the docs whose
    * salted hash falls below frac(w) (the deterministic fractional
    * epoch; same hash-threshold machinery as qStratifiedSample, so the
    * extra-copy set is reproducible and engine-independent). Declared
    * surface: per source, the integer epoch count, the fractional
    * rate, how many docs made the extra copy, and the resulting total
    * sampled doc count — Σ sampled ≈ corpus size × w by construction.
    * One corpus scan + the broadcast 1-row total; the per-doc
    * assignment is a shuffle-free projection any materializer can
    * inline. The 4-hex-digit threshold comparison makes frac exact to
    * 1/65536 — the declared comparison is on the integer-scaled
    * frac, so both engines cut the same doc set. */
  def qUpsamplePlan(spark: SparkSession, d: String): DataFrame = {
    val plan = sourceBudget(spark, d)
      .withColumn("epochs", floor(col("w")).cast("long"))
      // integer-scaled fractional part: exact threshold in [0, 65536)
      .withColumn("frac_scaled",
        floor((col("w") - col("epochs")) * 65536).cast("long"))
      .select("source", "n_docs", "epochs", "frac_scaled")
    val extra = Tables.documents(spark, d)
      .select(col("source"),
        conv(substring(md5(concat(lit("up:"), col("doc_id"))), 1, 4), 16, 10)
          .cast("long").as("hk"))
      .join(broadcast(plan), "source")
      .filter(col("hk") < col("frac_scaled"))
      .groupBy("source").agg(count(lit(1)).as("n_extra"))
    plan.join(extra, Seq("source"), "left")
      .withColumn("n_extra", coalesce(col("n_extra"), lit(0L)))
      .withColumn("n_sampled", col("epochs") * col("n_docs") + col("n_extra"))
      .select("source", "n_docs", "epochs", "frac_scaled", "n_extra", "n_sampled")
      .orderBy("source")
  }

  /** Budget-constrained top-p selection: per source, keep the
    * highest-quality documents until the kept set reaches 20% of the
    * source's character budget — the "best docs under a token budget"
    * curation move, mechanically DIFFERENT from q_quality_gate's
    * threshold cut: the cut point here is determined by the cumulative
    * BUDGET, not by a per-doc score bar, so shifting the quality
    * distribution never over- or under-fills the budget.
    *
    * Determinism/parity: ordering is (quality_score DESC, doc_id) on
    * the already-oracled rounded score; the cumulative sum is exact
    * integer chars; the 20% cut is the integer cross-multiply
    * `5·cum ≤ total` (no division, no floats); kept_ppm is integer
    * `div`. Plan shape: the per-source cumulative window and the kept
    * aggregate share one hash(source) exchange (the sessionize
    * pattern); source totals are a second aggregate broadcast back.
    * The inherent cost is the per-source sort — the documented 100 TB
    * swap is an approximate quality-quantile threshold (the
    * q_quality_gate shape) when a whole-source sort is unaffordable. */
  def qTopPSelect(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, d)
      .select(col("doc_id"), col("source"), col("n_chars"))
    val scored = docs.join(
      Quality.qQualityScore(spark, d).select("doc_id", "quality_score"), "doc_id")
    val w = Window.partitionBy("source")
      .orderBy(col("quality_score").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = docs.groupBy("source")
      .agg(count(lit(1)).as("n_total"),
        sum("n_chars").cast("long").as("total_chars"))
    val kept = scored.withColumn("cum_chars", sum("n_chars").over(w))
      .join(broadcast(totals.select("source", "total_chars")), "source")
      .filter(col("cum_chars") * 5 <= col("total_chars"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_kept"),
        sum("n_chars").cast("long").as("kept_chars"))
    totals.join(kept, Seq("source"), "left")
      .select(col("source"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_chars"), lit(0L)).as("kept_chars"),
        col("n_total"), col("total_chars"),
        expr("coalesce(kept_chars, CAST(0 AS BIGINT)) * 1000000 div total_chars")
          .as("kept_ppm"))
      .orderBy("source")
  }

  /** Temporal train/test split with an entity-leakage audit: events
    * before watermark−7d train, the last week tests — the
    * time-respecting split a forecasting/ranking pipeline MUST use
    * where qDataSplit's hash split would leak the future, plus the
    * number a reviewer asks first: how many test-period users also
    * appear in training (overlap is expected for returning users but
    * 100% overlap means the test set cannot measure cold-start). One
    * scan + 1-row watermark broadcast; the per-user presence flags
    * collapse map-side to |users| rows before the 1-row audit. */
  def qTemporalSplit(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(spark, d)
    val wm = ev.agg(date_sub(max(to_date(col("ts"))), 6).as("cutoff"))
    val flagged = ev.select(col("user_id"), to_date(col("ts")).as("day"))
      .crossJoin(broadcast(wm)) // 1-row cutoff (PlanQualitySpec-allowlisted)
      .withColumn("is_test", col("day") >= col("cutoff"))
    val users = flagged.groupBy("user_id")
      .agg(max(when(!col("is_test"), 1L).otherwise(0L)).as("in_train"),
        max(when(col("is_test"), 1L).otherwise(0L)).as("in_test"))
    val evCounts = flagged.agg(
      sum(when(!col("is_test"), 1L).otherwise(0L)).as("n_train_events"),
      sum(when(col("is_test"), 1L).otherwise(0L)).as("n_test_events"))
    users.agg(
        sum("in_train").as("train_users"),
        sum("in_test").as("test_users"),
        sum(col("in_train") * col("in_test")).as("overlap_users"))
      .crossJoin(broadcast(evCounts)) // 1-row event totals (allowlisted)
      .withColumn("overlap_ppm",
        expr("(overlap_users * 1000000) div greatest(test_users, 1L)"))
      .select("n_train_events", "n_test_events", "train_users", "test_users",
        "overlap_users", "overlap_ppm")
  }
}
