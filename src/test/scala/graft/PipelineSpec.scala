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

  test("curation funnel: stages replay from the composed operators and shrink monotonically") {
    val got = Pipeline.qCurationFunnel(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.map(t => (t._1, t._2)).toSeq ==
      Seq((0L, "raw"), (1L, "min_length"), (2L, "lang_en"), (3L, "near_dedup")))
    // monotone non-increasing doc and token masses
    assert(got.map(_._3).toSeq.sliding(2).forall { case Seq(a, b) => b <= a; case _ => true })
    assert(got.map(_._4).toSeq.sliding(2).forall { case Seq(a, b) => b <= a; case _ => true })
    // replay every stage from the declared component operators
    val docs = Tables.documents(spark, sfDir).select("doc_id", "n_chars", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2).split("\\s+", -1).length.toLong))
    val pred = graft.ops.Quality.qLangId(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(6))).toMap
    val nonCanon = DedupClusters.qDedupClusters(spark, sfDir)
      .filter(!col("is_canonical")).collect().map(_.getLong(0)).toSet
    def tot(f: ((Long, Long, Long)) => Boolean) = {
      val s = docs.filter(f)
      (s.length.toLong, s.map(_._3).sum)
    }
    assert((got(0)._3, got(0)._4) == tot(_ => true))
    assert((got(1)._3, got(1)._4) == tot(d => d._2 >= 100 && d._3 >= 20))
    assert((got(2)._3, got(2)._4) ==
      tot(d => d._2 >= 100 && d._3 >= 20 && pred(d._1) == "en"))
    assert((got(3)._3, got(3)._4) ==
      tot(d => d._2 >= 100 && d._3 >= 20 && pred(d._1) == "en" && !nonCanon(d._1)))
  }
}
