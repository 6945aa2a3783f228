package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.Streams

/** Streaming throughput bench: the committed performance record for
  * the streaming family (every other family has BENCH_LOCAL/BENCH_K10
  * evidence; streaming correctness is spec-gated but had no rows/s
  * artifact until round 10).
  *
  * Two pipelines, each driven as a real multi-micro-batch run over
  * file-stream input staged from the corpus (maxFilesPerTrigger forces
  * a batch cadence; Trigger.AvailableNow drains to completion — the
  * same execution path a production backfill takes):
  *
  *  - `ingest` — Streams.ingestPipeline at sf0.1: dead-letter split +
  *    watermark-bounded exactly-once dedup + station-dim broadcast
  *    enrichment over the events table mapped to the reference's
  *    (ts, event_id, station_id, content) fetch-result shape
  *    (app.py:498-619's loop as one continuous query). The ONLY
  *    stateful operator is the dedup; the record includes the state
  *    store's peak row count to prove state tracks the lateness
  *    horizon, not stream lifetime.
  *  - `neardup_gate` — Streams.nearDupGate: stateless LSH gate of
  *    arriving documents against the broadcast corpus band index
  *    (built once, reused across batches), per-batch sink-side pair
  *    dedup via foreachBatch (the documented pattern). State rows must
  *    be ZERO.
  *  - `sessionize` — Streams.sessionizeWithState: event-time session
  *    windows via flatMapGroupsWithState + EventTimeTimeout over
  *    time-ordered file batches. Peak state = one row per OPEN
  *    session (bounded by live users, not stream length).
  *  - `quality_gate` — Streams.perceptronGate: stateless learned
  *    quality filter over streamed embeddings (literal weights from
  *    the landed perceptron artifact; 40 id-offset corpus replicas).
  *
  *  - `cdc_latest` — Streams.cdcLatest: per-key current-row
  *    materialization via mapGroupsWithState (update mode). Peak
  *    state = one row per live key.
  *
  * Output: ONE JSON line (stdout + BENCH_STREAM.json) with per-pipeline
  * rows, seconds, rows/s, batch count, and peak state rows. Methodology
  * mirrors graft.Bench: an untimed warmup run (JIT + parquet footers),
  * then the timed run; timings are end-to-end query wall clock
  * (start → awaitTermination), which INCLUDES micro-batch scheduling
  * overhead — that is the honest number for a streaming pipeline. */
object BenchStream {

  private def freshDir(tag: String): String =
    Files.createTempDirectory(s"graft_bstream_$tag").toString

  /** Drains a streaming query built over `src` and returns
    * (elapsedSec, inputRows, batches, peakStateRows). */
  private def drain(build: () => org.apache.spark.sql.streaming.StreamingQuery)
      : (Double, Long, Long, Long) = {
    val t0 = System.nanoTime()
    val q = build()
    q.awaitTermination()
    val sec = (System.nanoTime() - t0) / 1e9
    val prog = q.recentProgress
    val rows = prog.map(_.numInputRows).sum
    val state = prog.flatMap(_.stateOperators.map(_.numRowsTotal))
      .reduceOption(_ max _).getOrElse(0L)
    (sec, rows, prog.length.toLong, state)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // serialized shuffle writer at every partition count (see
      // Bench.scala; never engages at > 200 partitions)
      .config("spark.shuffle.sort.bypassMergeThreshold", 2)
      // codegen class cache sized to the declared surface (see Bench)
      .config("spark.sql.codegen.cache.maxEntries", 10000)
      // r13: see Bench.scala — parallelism floor for byte-tiny
      // exchanges; never binds at production volumes.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // ---- stage the ingest input: events as fetch-result rows, 32
    // files so maxFilesPerTrigger=4 yields 8 micro-batches ----------
    val ingestIn = freshDir("ingest_in")
    Tables.events(spark, sfDir).select(
      col("ts"), col("event_id"),
      (col("user_id") % 50).as("station_id"),
      // ~2% dead-letter rows: the split must classify, not drop
      when(col("event_id") % 97 === 0, lit(null).cast("string"))
        .when(col("event_id") % 89 === 0, lit(""))
        .otherwise(col("props")).as("content"))
      .repartition(32)
      .write.mode("overwrite").parquet(ingestIn)
    val ingestSchema = spark.read.parquet(ingestIn).schema
    val stations = spark.range(50)
      .select(col("id").as("station_id"),
        concat(lit("STA_"), col("id")).as("station"))

    def runIngest(): (Double, Long, Long, Long) = drain { () =>
      val src = spark.readStream.schema(ingestSchema)
        .option("maxFilesPerTrigger", 4).parquet(ingestIn)
      Streams.ingestPipeline(src, stations)
        .writeStream.format("noop")
        .option("checkpointLocation", freshDir("ingest_ck"))
        .trigger(Trigger.AvailableNow())
        .start()
    }

    // ---- stage the near-dup arrivals: 8 corpus-sized micro-batches
    // (8 id-offset replicas of the corpus, EIGHT files per batch); the
    // index side is the full static corpus. The r10 record split ONE
    // corpus over 8 files — 625-row batches that measured the
    // micro-batch scheduler floor (~0.6 s/batch regardless of rows),
    // not gate capacity; r12: one FILE per batch serialized the
    // per-row signature work (one split = one task), so batches now
    // carry 8 splits each — honest trigger sizing, a production
    // source delivers many files/partitions per trigger. ----
    val gateIn = freshDir("gate_in")
    val corpus = Tables.documents(spark, sfDir).select("doc_id", "text")
    corpus.crossJoin(spark.range(8).select(col("id").as("rep")))
      .select((col("doc_id") + col("rep") * 10000000L).as("doc_id"), col("text"))
      .repartition(64)
      .write.mode("overwrite").parquet(gateIn)
    val gateSchema = spark.read.parquet(gateIn).schema
    val indexDocs = corpus

    def runGate(): (Double, Long, Long, Long) = drain { () =>
      val src = spark.readStream.schema(gateSchema)
        .option("maxFilesPerTrigger", 8).parquet(gateIn)
      Streams.nearDupGate(spark, src, indexDocs)
        .writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          // documented sink-side pattern: a pair colliding on k bands
          // arrives k times from the stateless gate; the sink dedupes
          batch.dropDuplicates("new_doc", "index_doc")
            .write.format("noop").mode("overwrite").save()
        }
        .option("checkpointLocation", freshDir("gate_ck"))
        .trigger(Trigger.AvailableNow())
        .start()
    }

    // ---- stage the sessionizer input: (ts, user_id) in TIME ORDER
    // (range-partitioned so batch k's events precede batch k+1's — the
    // arrival order the watermark contract guarantees in production) --
    val sessIn = freshDir("sess_in")
    Tables.events(spark, sfDir).select(col("ts"), col("user_id"))
      .repartitionByRange(8, col("ts"))
      .sortWithinPartitions("ts")
      .write.mode("overwrite").parquet(sessIn)
    val sessSchema = spark.read.parquet(sessIn).schema

    def runSessionize(): (Double, Long, Long, Long) = drain { () =>
      val src = spark.readStream.schema(sessSchema)
        .option("maxFilesPerTrigger", 1).parquet(sessIn)
      Streams.sessionizeWithState(src.withWatermark("ts", "10 minutes"))
        .toDF("user_id", "start_us", "end_us", "n_events")
        .writeStream.format("noop")
        .option("checkpointLocation", freshDir("sess_ck"))
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
    }

    // ---- stage the CDC input: change rows keyed by user --------------
    val cdcIn = freshDir("cdc_in")
    Tables.events(spark, sfDir).select(
      col("user_id"), unix_micros(col("ts")).as("us"),
      col("event_id"), col("event_type").as("op"), col("value"))
      .repartition(8)
      .write.mode("overwrite").parquet(cdcIn)
    val cdcSchema = spark.read.parquet(cdcIn).schema

    def runCdc(): (Double, Long, Long, Long) = drain { () =>
      val src = spark.readStream.schema(cdcSchema)
        .option("maxFilesPerTrigger", 1).parquet(cdcIn)
      Streams.cdcLatest(src.as[(Long, Long, Long, String, Double)])
        .toDF("user_id", "us", "event_id", "op", "value", "alive")
        .writeStream.format("noop")
        .option("checkpointLocation", freshDir("cdc_ck"))
        .outputMode("update")
        .trigger(Trigger.AvailableNow())
        .start()
    }

    // ---- stage the quality-gate arrivals: 40 id-offset replicas of
    // the embeddings corpus (200k rows at sf0.1) over 64 files, 8-file
    // batches; the weights are the landed perceptron artifact
    // (ops/Classifier), landed once untimed — the gate itself is a
    // stateless literal-weight projection + filter -----------------
    val qgIn = freshDir("qgate_in")
    Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
      .crossJoin(spark.range(40).select(col("id").as("rep")))
      .select((col("vec_id") + col("rep") * 10000000L).as("vec_id"),
        col("embedding"))
      .repartition(64)
      .write.mode("overwrite").parquet(qgIn)
    val qgSchema = spark.read.parquet(qgIn).schema
    graft.ops.Classifier.weightsTable(spark, sfDir).count() // land, untimed

    def runQGate(): (Double, Long, Long, Long) = drain { () =>
      val src = spark.readStream.schema(qgSchema)
        .option("maxFilesPerTrigger", 8).parquet(qgIn)
      Streams.perceptronGate(spark, sfDir, src)
        .writeStream.format("noop")
        .option("checkpointLocation", freshDir("qgate_ck"))
        .trigger(Trigger.AvailableNow())
        .start()
    }

    // untimed warmup, then the timed pass
    runIngest(); runGate(); runSessionize(); runCdc(); runQGate()
    val (iSec, iRows, iBatches, iState) = runIngest()
    val (gSec, gRows, gBatches, gState) = runGate()
    val (sSec, sRows, sBatches, sState) = runSessionize()
    val (cSec, cRows, cBatches, cState) = runCdc()
    val (qSec, qRows, qBatches, qState) = runQGate()

    def entry(rows: Long, sec: Double, batches: Long, state: Long): String =
      f"""{"rows":$rows,"sec":$sec%.3f,"rows_per_sec":${(rows / sec).round},""" +
        s""""batches":$batches,"state_rows_max":$state}"""
    val json =
      s"""{"metric":"stream_total","value":${"%.3f".format(iSec + gSec + sSec + cSec + qSec)},"unit":"sec","pipelines":{""" +
        s""""ingest":${entry(iRows, iSec, iBatches, iState)},""" +
        s""""neardup_gate":${entry(gRows, gSec, gBatches, gState)},""" +
        s""""sessionize":${entry(sRows, sSec, sBatches, sState)},""" +
        s""""cdc_latest":${entry(cRows, cSec, cBatches, cState)},""" +
        s""""quality_gate":${entry(qRows, qSec, qBatches, qState)}},""" +
        s""""sf":"$sfDir","trigger":"AvailableNow","estimator":"warmup+1"}"""
    println(json)
    val out = sys.env.getOrElse("SPARK_GRAFT_STREAM_OUT", "BENCH_STREAM.json")
    Files.writeString(Paths.get(out), json + "\n")
    spark.stop()
  }
}
