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
/** The pluggable media-decode boundary (r11 VERDICT item 5): decoding
  * an opaque payload to its sample plane (pixels as gray levels, PCM
  * samples, video frame bytes) is the ONLY media-specific step in the
  * multimodal family — everything after it (histograms, block-mean
  * resize, windowed energy, stride sampling, fingerprint dedup) is
  * engine plumbing. A production deployment implements this one
  * method over its codec (JNI ffmpeg, javax.imageio, …) and injects
  * it into the `*WithDecoder` transforms; the Spark plan shape —
  * narrow mapPartitions, payload bytes dying inside the partition,
  * scalar columns into the exchange — is identical for every decoder. */
trait MediaDecoder extends Serializable {
  /** The payload's decoded sample plane. Values are small non-negative
    * ints (8-bit gray / PCM levels); an empty array = undecodable or
    * empty payload (rows drop out exactly like zero-byte payloads). */
  def decode(payload: Array[Byte]): Array[Int]
}

/** Default decoder: identity on bytes — the honest stub (fixtures
  * carry no real media; on the ASCII corpus codepoint = byte, so this
  * is also exactly what the declared codegen'd plans read). */
object ByteStubDecoder extends MediaDecoder {
  def decode(payload: Array[Byte]): Array[Int] = payload.map(_ & 0xff)
}

object Multimodal {

  /** The `documents` table re-landed as a multimodal table: payload =
    * UTF-8 bytes of `text` standing in for an image/audio blob. */
  def payloadTable(spark: SparkSession, d: String): DataFrame =
    // r13: spread — every consumer does per-byte compute over the
    // payload; the fixture file is one split (identity at scale)
    Tables.documentsSpread(spark, d)
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

  /** STUB decode + feature extraction: 4-bucket byte histogram —
    * a deterministic stand-in for an image embedding. Runs as a narrow
    * per-partition typed transform with the same batch shape a
    * Pandas-UDF/mapInPandas decoder would use (binary in, fixed-width
    * numeric vector out). The decode emits raw bucket counts; the
    * normalized share is computed relationally so the rounding is the
    * SQL `round` on both engine and oracle side. Output is exploded to
    * one row per (doc_id, bucket) — scalar columns only, so the
    * driver's pandas sort/hash compare works and a DuckDB oracle over
    * the ASCII corpus (codepoint = byte) checks it exactly. */
  def qMultimodalFeatures(spark: SparkSession, d: String): DataFrame =
    featuresFromPayload(spark, payloadTable(spark, d))
      .orderBy("doc_id", "bucket")

  /** The decode/feature-extract transform itself, over ANY
    * `(doc_id, content: binary)` frame — the parquet payload table and
    * the `binaryFile` listing scan (R21→R12 flow, IntegrationSpec)
    * both feed this. Narrow (no shuffle); payload bytes die inside the
    * partition. */
  def featuresFromPayload(spark: SparkSession, payload: DataFrame): DataFrame =
    featuresWithDecoder(spark, payload, ByteStubDecoder)

  /** Decoder-injected form of [[featuresFromPayload]]: the decode step
    * goes through the [[MediaDecoder]] boundary (default byte stub ≡
    * the declared plan, pinned in MultimodalSpec); a real image
    * decoder changes only the injected object, never this plan. */
  def featuresWithDecoder(spark: SparkSession, payload: DataFrame,
      decoder: MediaDecoder): DataFrame = {
    import spark.implicits._
    payload
      .select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val plane = decoder.decode(bytes) // the ONLY media-specific step
          val hist = new Array[Long](4)
          plane.foreach(v => hist((v & 0xff) >> 6) += 1)
          (id, plane.length.toLong, hist.toSeq)
        }
      }.toDF("doc_id", "n_bytes", "hist")
      .select(col("doc_id"), col("n_bytes"),
        posexplode(col("hist")).as(Seq("bucket", "n_in_bucket")))
      .withColumn("share",
        round(col("n_in_bucket") / greatest(col("n_bytes"), lit(1L)).cast("double"), 4))
      .select("doc_id", "bucket", "n_in_bucket", "n_bytes", "share")
  }

  /** Decoder-injected RESIZE — [[qImageResize]]'s math (16-wide layout,
    * 16-row cap, 2×2 block mean via integer div) over the decoded
    * plane instead of the codegen'd byte reads. With [[ByteStubDecoder]]
    * the per-doc report is IDENTICAL to the declared query (pinned in
    * MultimodalSpec); a real decoder changes the pixel fetch, not the
    * aggregate shape. */
  def resizeWithDecoder(spark: SparkSession, payload: DataFrame,
      decoder: MediaDecoder): DataFrame = {
    import spark.implicits._
    payload
      .select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          val p = decoder.decode(bytes)
          val h2 = math.min(p.length / 16, 16) / 2
          if (h2 < 1) None
          else {
            var sum = 0L; var mn = Int.MaxValue; var mx = Int.MinValue
            var r = 0
            while (r < h2) {
              var c = 0
              while (c < 8) {
                val px = (p((r * 2) * 16 + c * 2) + p((r * 2) * 16 + c * 2 + 1) +
                  p((r * 2 + 1) * 16 + c * 2) + p((r * 2 + 1) * 16 + c * 2 + 1)) / 4
                sum += px; if (px < mn) mn = px; if (px > mx) mx = px
                c += 1
              }
              r += 1
            }
            Some((id, h2.toLong, h2.toLong * 8, sum, mn, mx))
          }
        }
      }.toDF("doc_id", "out_h", "n_px", "px_sum", "px_min", "px_max")
  }

  /** Decoder-injected AUDIO energy — [[qAudioEnergy]]'s windowed
    * Σ(s−96)²/peak math over decoded PCM samples. Byte stub ≡ the
    * declared query (pinned in MultimodalSpec). */
  def audioEnergyWithDecoder(spark: SparkSession, payload: DataFrame,
      decoder: MediaDecoder): DataFrame = {
    import spark.implicits._
    payload
      .select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          val p = decoder.decode(bytes)
          val nfr = math.min(p.length, 128) / 16
          (0 until nfr).map { fr =>
            var energy = 0L; var peak = 0L
            var k = fr * 16
            while (k < (fr + 1) * 16) {
              val s = p(k) - 96
              energy += s.toLong * s; if (math.abs(s) > peak) peak = math.abs(s)
              k += 1
            }
            (id, fr.toLong, 16L, energy, peak, energy < 64)
          }
        }
      }.toDF("doc_id", "fr", "n_samples", "energy", "peak", "is_silent")
  }

  /** Decoder-injected FRAME SAMPLE — [[qFrameSample]]'s stride-4 digest
    * over the decoded plane. Byte stub ≡ the declared query (pinned in
    * MultimodalSpec). */
  def frameSampleWithDecoder(spark: SparkSession, payload: DataFrame,
      decoder: MediaDecoder): DataFrame = {
    import spark.implicits._
    payload
      .select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.flatMap { case (id, bytes) =>
          val p = decoder.decode(bytes)
          if (p.isEmpty) None
          else {
            val frames = (0 until p.length by 4).map(i => p(i).toByte).toArray
            md.reset()
            val digest = md.digest(frames).map("%02x".format(_)).mkString
            Some((id, frames.length.toLong, digest))
          }
        }
      }.toDF("doc_id", "n_frames", "frames_md5")
  }

  /** STUB frame sampling: every `stride`-th byte as a "frame" — the
    * plumbing (binary in, array-of-binary out, no shuffle) is what a
    * video frame sampler needs. */
  def frameSample(df: DataFrame, stride: Int): DataFrame =
    // empty-payload guard: sequence(start, stop, step) THROWS when
    // start > stop with a positive step (Spark ANSI), so a zero-byte
    // payload must short-circuit to an empty frame list
    df.withColumn("frames", expr(
      s"""CASE WHEN octet_length(content) >= 1
         |  THEN transform(sequence(1, octet_length(content), $stride),
         |                 i -> substring(content, i, 1))
         |  ELSE CAST(array() AS ARRAY<BINARY>) END""".stripMargin))

  /** STUB decode + RESIZE: the payload's first bytes laid out as a
    * 16-wide "image" (h = length div 16 rows, capped at 16), then
    * downsampled 2× per axis by 2×2 block averaging — completing the
    * decode / feature-extract / RESIZE / frame-sample multimodal
    * quartet. The decode is the same honest stand-in as
    * qMultimodalFeatures (ASCII corpus: codepoint = byte, so
    * `ascii(substring(t, pos, 1))` IS the byte read); a real image
    * decoder changes the pixel fetch, not the plan.
    *
    * Plan shape: one narrow scan, a ≤128-element posexplode per doc
    * (output pixels, bounded by the 16×16 cap), four codegen'd
    * substring/ascii reads per output pixel, then one map-side-combined
    * per-doc aggregate — the only shuffle is 6 scalar columns per doc.
    * All arithmetic is integer (block mean via `div 4`): hash-stable by
    * construction. Declared surface = the per-doc resize report
    * (out dims, pixel count/checksum/range); the spec replays one
    * doc's full resized raster driver-side. */
  def qImageResize(spark: SparkSession, d: String): DataFrame =
    Tables.documentsSpread(spark, d)
      .select(col("doc_id"), col("text").as("t"))
      .withColumn("h2", expr("least(length(t) div 16, 16) div 2"))
      .filter(col("h2") >= 1)
      .select(col("doc_id"), col("t"), col("h2"),
        posexplode(expr("sequence(0, h2 * 8 - 1)")).as(Seq("k", "_i")))
      .withColumn("r", expr("k div 8"))
      .withColumn("c", expr("k % 8"))
      .withColumn("px", expr(
        """(ascii(substring(t, (r * 2) * 16 + c * 2 + 1, 1))
          | + ascii(substring(t, (r * 2) * 16 + c * 2 + 2, 1))
          | + ascii(substring(t, (r * 2 + 1) * 16 + c * 2 + 1, 1))
          | + ascii(substring(t, (r * 2 + 1) * 16 + c * 2 + 2, 1))) div 4""".stripMargin))
      .groupBy("doc_id")
      .agg(max("h2").as("out_h"), count(lit(1)).as("n_px"),
        sum("px").cast("long").as("px_sum"),
        min("px").as("px_min"), max("px").as("px_max"))
      .orderBy("doc_id")

  /** STUB decode + AUDIO feature extraction: the payload's first 128
    * bytes read as 8-bit PCM samples centered on 96 (the ASCII-corpus
    * midrange), cut into 16-sample frames, per-frame energy Σ(s−96)²
    * and peak |s−96| — the windowed-RMS shape an audio quality gate
    * computes (silence/clipping detection before transcription). The
    * decode is the same honest stand-in as qImageResize (`ascii
    * (substring(...))` IS the byte read on this corpus); a real PCM
    * decoder changes the sample fetch, not the plan.
    *
    * Plan shape: one narrow scan, a ≤128-element posexplode per doc,
    * one codegen'd byte read per sample, then a map-side-combined
    * (doc, frame) aggregate — all-integer output, hash-stable by
    * construction. */
  def qAudioEnergy(spark: SparkSession, d: String): DataFrame =
    Tables.documentsSpread(spark, d)
      .select(col("doc_id"), col("text").as("t"))
      .withColumn("nfr", expr("least(length(t), 128) div 16"))
      .filter(col("nfr") >= 1)
      .select(col("doc_id"), col("t"),
        posexplode(expr("sequence(0, nfr * 16 - 1)")).as(Seq("k", "_i")))
      .withColumn("fr", expr("k div 16"))
      .withColumn("s", expr("ascii(substring(t, k + 1, 1)) - 96"))
      .groupBy("doc_id", "fr")
      .agg(count(lit(1)).as("n_samples"),
        sum(expr("s * s")).cast("long").as("energy"),
        max(abs(col("s"))).cast("long").as("peak"))
      .withColumn("is_silent", col("energy") < 64)
      .orderBy("doc_id", "fr")

  /** Declared frame-sampling query: every 4th byte of each payload
    * (decoded — ASCII corpus, so byte = char) as the sampled "frame"
    * stream, digested per doc. Unlike the lambda API above this is the
    * codegen'd exploded form — posexplode of the stride positions +
    * substring per row, whole-stage codegen end to end (HOF lambdas
    * run interpreted; fine per-call on small arrays, wrong for a
    * declared 100 TB-shaped scan). The ordered re-assembly rides the
    * agg buffer via array_sort(collect_list(struct)), once per DOC. */
  def qFrameSample(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{transform => atransform}
    payloadTable(spark, d)
      .select(col("doc_id"), decode(col("content"), "UTF-8").as("t"))
      // stepped sequence(1, 0, 4) throws in ANSI mode — drop
      // zero-length payloads, matching the oracle's empty range()
      .filter(length(col("t")) >= 1)
      .select(col("doc_id"), col("t"),
        explode(expr("sequence(1, length(t), 4)")).as("i"))
      .select(col("doc_id"), col("i"), expr("substring(t, i, 1)").as("fr"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_frames"),
        md5(array_join(
          atransform(array_sort(collect_list(struct(col("i"), col("fr")))),
            x => x.getField("fr")), "")).as("frames_md5"))
      .orderBy("doc_id")
  }

  /** Cross-video near-duplicate detection by FRAME-FINGERPRINT
    * overlap — the video analog of MinHash dedup (re-encodes, crops,
    * and re-uploads share most frames even when container bytes
    * differ): fingerprint each sampled frame window (md5 of an 8-byte
    * payload slice at qFrameSample's stride-4 positions), DROP
    * boilerplate fingerprints seen in > 64 videos (intro cards/black
    * frames appear everywhere and would explode the join
    * quadratically — the LSH hot-band cap applied to frames), and
    * pair videos sharing ≥ 2 distinct surviving fingerprints.
    * Payload bytes never shuffle: only (doc, 32-char md5) pairs enter
    * the exchange, and the pair join is fingerprint-bucketed — never
    * all-pairs. With a real decoder the fingerprint becomes a
    * perceptual hash of the decoded frame; the plan is unchanged. */
  /** Loose-object binary ingest through Spark's `binaryFile` source —
    * the reference's actual bucket layout (one opaque payload file per
    * chunk, app.py:296-303) read back as a DataFrame: path → parsed
    * key, length → n_bytes, content → digest. The landed corpus is a
    * deterministic documents subset (doc_id % 13 == 0, doc_id < 5000:
    * ≤ 385 files at ANY scale factor — the bound is keyed to the id
    * domain, not the corpus size), written once per corpus through the
    * same write-once Landing pattern as lsh_pairs_v1, so Bench times
    * the listing scan, not the file writes. The oracle recomputes
    * every column from the `documents` table itself (the files' bytes
    * ARE the text's UTF-8), which pins the full read path: listing,
    * ordering, byte length, and content bytes via md5.
    *
    * Plan shape for 100 TB: `binaryFile` splits by FILE (each row is
    * one object), so a million-object bucket scans embarrassingly
    * parallel; the metadata projection (`path`, `length`) never
    * materializes `content` for files where only the digest column is
    * pruned away. The driver-side write of ≤ 385 fixture files is
    * landing setup, not the measured plan. */
  def qBinaryIngest(spark: SparkSession, d: String): DataFrame = {
    val dir = graft.sources.Landing.dir(d, "bin_ingest_v1") { path =>
      new java.io.File(path).mkdirs()
      // dim-bounded collect (≤385 rows by the id-domain predicate)
      Tables.documents(spark, d)
        .filter(col("doc_id") % 13 === 0 && col("doc_id") < 5000)
        .select("doc_id", "text").collect()
        .foreach { r =>
          java.nio.file.Files.write(
            java.nio.file.Paths.get(path, s"doc_${r.getLong(0)}.bin"),
            r.getString(1).getBytes("UTF-8"))
        }
    }
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.bin").load(dir)
      .select(
        regexp_extract(col("path"), "doc_(\\d+)\\.bin$", 1).cast("long").as("doc_id"),
        col("length").as("n_bytes"),
        md5(col("content")).as("content_md5"))
      .orderBy("doc_id")
  }

  def qFrameDedup(spark: SparkSession, d: String): DataFrame = {
    // spread: the window-explode map work otherwise runs on the single
    // input split (single-row-group fixture file; identity at scale)
    val fp = Tables.spread(spark, payloadTable(spark, d), "doc_id")
      .select(col("doc_id"), decode(col("content"), "UTF-8").as("t"))
      .filter(length(col("t")) >= 8)
      .select(col("doc_id"),
        explode(expr("sequence(1, length(t) - 7, 4)")).as("i"), col("t"))
      // the raw 8-char window IS the key: hashing it (md5 = 32 hex
      // chars) would quadruple the shuffled key bytes and add a hash
      // per window for nothing — the fingerprint never leaves the plan
      .select(col("doc_id"), expr("substring(t, i, 8)").as("fp"))
      // r13 (VERDICT item 4): the pinned exchange is keyed (fp,
      // doc_id), not fp alone. The r12 hash(fp) exchange carried RAW
      // occurrence rows with a pinned partition count — no AQE skew
      // rescue — and the measured fp histogram (sf0.1; a verbatim
      // K-replicated corpus scales every count by exactly K) shows
      // boilerplate 8-grams ('customer' 2,316 of 364,522 rows, df
      // 1,785 of 5,000 docs; 77% of all rows sit in fps over the df-64
      // cap): at production partition counts one universal shingle is
      // a hot partition. (fp, doc_id) is near-unique, so the exchange
      // cannot skew at ANY scale, and it still satisfies everything
      // heavy downstream: the distinct's (doc_id, fp) clustering runs
      // in place, and the df aggregate collapses map-side to one row
      // per (fp, partition) before its own tiny final exchange. Only
      // the pair-list aggregate re-exchanges by fp — AFTER the df ≤ 64
      // cap, where per-key volume is bounded by construction (≤ 64
      // docs per fp), so that exchange cannot skew either. The pinned
      // count (vs AQE coalescing) is still what keeps the
      // distinct/cache stage parallel at bench scale.
      .repartition(spark.sessionState.conf.numShufflePartitions,
        col("fp"), col("doc_id"))
      .distinct()
      .persist() // df-cap aggregate + pair-list aggregate share it
    // Pair expansion via a bounded per-fp doc list instead of a
    // self-join: the df ≤ 64 cap bounds the list, the ×df² explode is
    // map-side (the q_market_basket pattern), and ONE fp exchange of
    // capped lists replaces the self-join's two exchanges of capped
    // occurrence rows.
    val keep = fp.groupBy("fp").agg(count(lit(1)).as("df"))
      .filter(col("df") <= 64).select("fp")
    val docsPerFp = fp.join(keep, "fp")
      .groupBy("fp").agg(collect_list("doc_id").as("docs"))
    docsPerFp
      .select(explode(col("docs")).as("doc_a"), col("docs"))
      .select(col("doc_a"), explode(col("docs")).as("doc_b"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 2)
      .orderBy("doc_a", "doc_b")
  }
}
