package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sinks.Sinks

/** R16/R22/R9 sink semantics + the DSv2 HTTP source stub contract. */
class SinkSourceSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("graft_sink_").toString

  test("date-partitioned write lands one directory per UTC day") {
    val out = tmp()
    Sinks.writeDatePartitioned(
      Tables.events(spark, sfDir).limit(500), out)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("date_part="))
    assert(dirs.nonEmpty)
    val back = spark.read.parquet(out)
    assert(back.count() == 500)
    assert(back.columns.contains("date_part"))
  }

  test("verify-then-delete move: source removed only after counts verify") {
    val src = tmp() + "/src"
    val dst = tmp() + "/dst"
    Tables.region(spark, sfDir).write.parquet(src)
    val (moved, deleted) = Sinks.moveVerified(spark, src, dst)
    assert(moved == 5 && deleted)
    assert(!new java.io.File(src).exists())
    assert(spark.read.parquet(dst).count() == 5)
  }

  test("idempotent append: second run with same keys writes nothing") {
    val out = tmp() + "/sink"
    val df = Tables.region(spark, sfDir)
    assert(Sinks.appendNew(spark, df, "r_regionkey", out) == 5)
    assert(Sinks.appendNew(spark, df, "r_regionkey", out) == 0) // R9 re-run safety
    assert(spark.read.parquet(out).count() == 5)
  }

  test("HTTP source stub: one partition per host, placeholder rows, throttle option") {
    val df = spark.read.format("graft.sources.HttpPlaceholderSource")
      .option("urls",
        "http://10.0.0.1:8080/a,http://10.0.0.1:8080/b,http://10.0.0.2:8080/c")
      .option("maxConcurrentPerHost", 2)
      .load()
    assert(df.rdd.getNumPartitions == 2) // grouped by sensor host
    val rows = df.collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getString(r.fieldIndex("status")) == "PLACEHOLDER_FILE")
      assert(r.getString(r.fieldIndex("error_type")) == "CONNECTION_ERROR")
      assert(r.getInt(r.fieldIndex("max_concurrent")) == 2)
      assert(r.getString(r.fieldIndex("url"))
        .contains(r.getString(r.fieldIndex("host"))))
    }
  }

  test("multimodal: metadata matches payload and features are unit-normalized histograms") {
    import graft.ops.Multimodal
    val meta = Multimodal.qMultimodalMeta(spark, sfDir)
    val docs = Tables.documents(spark, sfDir)
    val joined = meta.join(docs, Seq("doc_id"))
      .filter(col("n_bytes") =!= length(col("text")))
    assert(joined.count() == 0) // ASCII corpus: bytes == chars
    val feats = Multimodal.qMultimodalFeatures(spark, sfDir)
    assert(feats.count() > 0)
    // per doc: 4 bucket rows, counts sum to n_bytes, shares sum to ~1
    val perDoc = feats.groupBy("doc_id")
      .agg(count(lit(1)).as("n_rows"), sum("n_in_bucket").as("n_sum"),
        first("n_bytes").as("nb"), sum("share").as("share_sum"))
      .filter(col("n_rows") =!= 4 || col("n_sum") =!= col("nb") ||
        abs(col("share_sum") - 1.0) > 0.01)
    assert(perDoc.count() == 0)
  }
}
