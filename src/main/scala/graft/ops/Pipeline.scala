package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** The LLM-pipeline FLAGSHIP: one composed end-to-end training-data
  * plan — the north-star analog of q_acquisition_plan's E1→E6 chain —
  * exercising four existing operator families in a single declared,
  * oracle-checked query:
  *
  *   1. quality FILTER  — min-length gate (n_chars ≥ 100, n_tokens
  *      ≥ 20): the cheap first pass every corpus pipeline runs before
  *      anything quadratic-ish touches the data;
  *   2. near-dup DEDUP  — MinHash-LSH pairs → connected components
  *      (DedupClusters over Quality.qMinhashNeardup), keep-canonical:
  *      a document survives iff it is unclustered or its cluster's
  *      canonical (min doc_id);
  *   3. PACK            — survivors land in 16 content-stable md5
  *      shards (qShardAssign's hash), laid head-to-tail in doc_id
  *      order and cut into 512-token context bins (qPackGreedy's
  *      running-sum window, one independent sort per shard);
  *   4. SHARD MANIFEST  — one row per shard: doc/token totals, bin
  *      count, doc-id range — what a distributed writer emits next to
  *      the data for the training dataloader.
  *
  * Scale shape: the filter prunes before the dedup join; the expensive
  * pair detection is the LSH path (band-bucketed, capped — never
  * all-pairs); cluster state is (doc, label) pairs; packing sorts per
  * shard, so parallelism = shard count (raise shards at 100 TB, not
  * window width); the manifest is a 16-group hash aggregate.
  */
object Pipeline {

  def qTrainingPipeline(spark: SparkSession, d: String): DataFrame = {
    // 1. quality gate
    val docs = Tables.documents(spark, d)
      .select(col("doc_id"), col("n_chars"),
        size(split(col("text"), "\\s+")).cast("long").as("n_tokens"))
      .filter(col("n_chars") >= 100 && col("n_tokens") >= 20)
    // 2. keep-canonical against the LSH dedup clusters
    val clusters = DedupClusters.qDedupClusters(spark, d)
      .select(col("doc_id"), col("is_canonical"))
    val kept = docs.join(clusters, Seq("doc_id"), "left")
      .filter(col("is_canonical").isNull || col("is_canonical"))
      .select("doc_id", "n_tokens")
    // 3. content-stable shard + greedy 512-token packing per shard
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val packed = kept
      .withColumn("shard", substring(md5(concat(lit("shard:"), col("doc_id"))), 1, 1))
      .withColumn("cum_before", coalesce(sum("n_tokens").over(w), lit(0L)))
      .withColumn("bin_id", expr("cum_before div 512"))
    // 4. shard manifest
    packed.groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").cast("long").as("sum_tokens"),
        countDistinct("bin_id").as("n_bins"),
        min("doc_id").as("min_doc"),
        max("doc_id").as("max_doc"))
      .orderBy("shard")
  }

  /** Curation funnel — the stage-by-stage survival report every
    * dataset card publishes next to the training set: how many
    * documents and tokens remain after each cumulative curation stage
    * (raw → min-length gate → language-ID'd English → near-dup
    * canonical). Each stage reuses a DECLARED operator's exact
    * semantics (the flagship's length gate; Quality.qLangId's
    * prediction; DedupClusters' keep-canonical rule), so the funnel
    * is an audit of the same pipeline the flagship executes — if the
    * two ever disagree, one of them is wrong.
    *
    * Scale shape: flags are computed ONCE on a persisted |docs|-row
    * frame (doc_id, n_tokens, three booleans — text never leaves the
    * scan); each stage row is an ungrouped aggregate over a filter of
    * that frame. The near-dup flag joins the cluster frame (pair-
    * stream-sized, ≪ corpus) as a left join on doc_id. */
  def qCurationFunnel(spark: SparkSession, d: String): DataFrame = {
    val lang = Quality.qLangId(spark, d).select(col("doc_id"), col("pred_lang"))
    val clusters = DedupClusters.qDedupClusters(spark, d)
      .select(col("doc_id"), col("is_canonical"))
    val flags = Tables.documents(spark, d)
      .select(col("doc_id"), col("n_chars"),
        size(split(col("text"), "\\s+")).cast("long").as("n_tokens"))
      .join(lang, "doc_id")
      .join(clusters, Seq("doc_id"), "left")
      .withColumn("f_len", col("n_chars") >= 100 && col("n_tokens") >= 20)
      .withColumn("f_lang", col("pred_lang") === "en")
      .withColumn("f_canon", col("is_canonical").isNull || col("is_canonical"))
      .persist() // one flag pass feeds all four stage aggregates
    def stage(idx: Long, name: String, cond: org.apache.spark.sql.Column) =
      flags.filter(cond)
        .agg(count(lit(1)).as("n_docs"),
          coalesce(sum("n_tokens"), lit(0L)).as("n_tokens"))
        .select(lit(idx).as("stage_idx"), lit(name).as("stage"),
          col("n_docs"), col("n_tokens"))
    stage(0L, "raw", lit(true))
      .unionByName(stage(1L, "min_length", col("f_len")))
      .unionByName(stage(2L, "lang_en", col("f_len") && col("f_lang")))
      .unionByName(stage(3L, "near_dedup",
        col("f_len") && col("f_lang") && col("f_canon")))
      .orderBy("stage_idx")
  }
}
