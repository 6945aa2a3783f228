package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing (BASELINE.json north star): image/audio/
  * video payloads as opaque `binary` columns with typed metadata,
  * decode/feature-extract/frame-sample as per-partition transforms.
  *
  * No media libraries exist in this container, so the DECODE STEP IS
  * STUBBED with a deterministic fake (byte-histogram "features",
  * stride "frame sampling") — clearly marked below. Everything Spark-
  * side is real and tested: the binary column schema, the partition-
  * preserving typed transform (the `mapInPandas`/`mapPartitions` batch
  * shape), and the metadata projection. Swapping the stub for a real
  * decoder changes only the function body, not the plan.
  *
  * Scale notes: payload bytes never shuffle — metadata projects out
  * before any join/agg, and feature extraction is a narrow
  * mapPartitions (no exchange). At 100 TB the binary column rides in
  * parquet with `spark.sql.files.maxPartitionBytes` sizing the splits.
  */
object Multimodal {

  /** The `documents` table re-landed as a multimodal table: payload =
    * UTF-8 bytes of `text` standing in for an image/audio blob. */
  def payloadTable(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .select(col("doc_id"), col("lang"),
        encode(col("text"), "UTF-8").as("content"))

  /** Typed metadata over the binary column — byte length and content
    * digest; the projection the reference keeps in filenames/S3 keys
    * (app.py:266-268) made columnar. Oracle-checked (q_multimodal_meta). */
  def qMultimodalMeta(spark: SparkSession, d: String): DataFrame =
    payloadTable(spark, d)
      .select(col("doc_id"), col("lang"),
        octet_length(col("content")).as("n_bytes"),
        md5(col("content")).as("content_md5"))
      .orderBy("doc_id")

  /** STUB decode + feature extraction: 4-bucket byte histogram
    * normalized to [0,1] — a deterministic stand-in for an image
    * embedding. Runs as a narrow per-partition typed transform with
    * the same batch shape a Pandas-UDF/mapInPandas decoder would use.
    * Declared in `queries` with a rows-only check (no SQL oracle for
    * the stubbed decode). */
  def qMultimodalFeatures(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val src = payloadTable(spark, d)
      .select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
    src.mapPartitions { rows =>
      rows.map { case (id, bytes) =>
        // ---- STUB: real impl would decode media here (???)
        val hist = new Array[Long](4)
        bytes.foreach(b => hist((b & 0xff) >> 6) += 1)
        val n = math.max(bytes.length, 1).toDouble
        (id, hist.map(h => math.round(h / n * 10000.0) / 10000.0).toSeq)
        // ---- end STUB
      }
    }.toDF("doc_id", "features")
      .orderBy("doc_id")
  }

  /** STUB frame sampling: every `stride`-th byte as a "frame" — the
    * plumbing (binary in, array-of-binary out, no shuffle) is what a
    * video frame sampler needs. */
  def frameSample(df: DataFrame, stride: Int): DataFrame =
    df.withColumn("frames", expr(
      s"transform(sequence(1, octet_length(content), $stride), i -> substring(content, i, 1))"))
}
