package graft

import org.apache.spark.sql.functions._

import graft.ops.{DedupClusters, Pipeline}

/** Invariants of the composed training-data flagship
  * (filter → dedup keep-canonical → pack → shard manifest). */
class PipelineSpec extends SparkSpec {

  test("manifest doc total = gated docs minus non-canonical clustered; bins tile tokens") {
    val manifest = Pipeline.qTrainingPipeline(spark, sfDir).cache()
    // independently recompute the survivor count from the parts
    val gated = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("n_chars"),
        size(split(col("text"), "\\s+")).as("n_tokens"))
      .filter(col("n_chars") >= 100 && col("n_tokens") >= 20)
    val dropped = gated.join(
        DedupClusters.qDedupClusters(spark, sfDir)
          .filter(!col("is_canonical")).select("doc_id"),
        Seq("doc_id"), "left_semi")
      .count()
    val expectedDocs = gated.count() - dropped
    assert(expectedDocs > 0)
    val totals = manifest.agg(sum("n_docs"), sum("sum_tokens")).collect().head
    assert(totals.getLong(0) == expectedDocs)
    // n_bins counts distinct STARTING bins: a doc straddling a bin
    // boundary occupies later bins without starting in them, so the
    // count is bounded by the 512-token tiling and by the doc count,
    // never below 1 per non-empty shard
    val badBins = manifest.filter(
      col("n_bins") < 1 ||
      col("n_bins") > ceil(col("sum_tokens") / 512.0).cast("long") ||
      col("n_bins") > col("n_docs"))
    assert(badBins.count() == 0)
    // 16 hex shards, doc ranges sane
    assert(manifest.count() == 16)
    assert(manifest.filter(col("min_doc") > col("max_doc")).count() == 0)
    manifest.unpersist()
  }
}
