package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{ByteStubDecoder, MediaDecoder, Multimodal}

/** The pluggable decode boundary: the byte-stub decoder reproduces
  * every declared multimodal plan exactly, and a non-stub decoder
  * drops in without touching the plans. */
class MultimodalSpec extends SparkSpec {

  private def rows(df: DataFrame, cols: String*): Seq[String] =
    df.select(cols.map(col): _*).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  private def payload = Multimodal.payloadTable(spark, sfDir)

  test("byte-stub decoder ≡ the declared codegen'd plans (features, resize, audio, frame sample)") {
    assert(rows(Multimodal.featuresWithDecoder(spark, payload, ByteStubDecoder),
        "doc_id", "bucket", "n_in_bucket", "n_bytes", "share") ==
      rows(Multimodal.qMultimodalFeatures(spark, sfDir),
        "doc_id", "bucket", "n_in_bucket", "n_bytes", "share"))
    assert(rows(Multimodal.resizeWithDecoder(spark, payload, ByteStubDecoder),
        "doc_id", "out_h", "n_px", "px_sum", "px_min", "px_max") ==
      rows(Multimodal.qImageResize(spark, sfDir),
        "doc_id", "out_h", "n_px", "px_sum", "px_min", "px_max"))
    assert(rows(Multimodal.audioEnergyWithDecoder(spark, payload, ByteStubDecoder),
        "doc_id", "fr", "n_samples", "energy", "peak", "is_silent") ==
      rows(Multimodal.qAudioEnergy(spark, sfDir),
        "doc_id", "fr", "n_samples", "energy", "peak", "is_silent"))
    assert(rows(Multimodal.frameSampleWithDecoder(spark, payload, ByteStubDecoder),
        "doc_id", "n_frames", "frames_md5") ==
      rows(Multimodal.qFrameSample(spark, sfDir),
        "doc_id", "n_frames", "frames_md5"))
    assert(Multimodal.qImageResize(spark, sfDir).count() > 0)
  }

  test("a non-stub decoder swaps in: plans unchanged, outputs follow the decoder") {
    import spark.implicits._
    // a 64-"pixel" synthetic payload: values 0..63 — big enough for one
    // 2-row resize block grid (64/16 = 4 rows -> h2 = 2)
    val fixture = Seq((1L, Array.tabulate(64)(_.toByte)))
      .toDF("doc_id", "content")
    // "invert" decoder: a trivial real transformation of the plane
    object Invert extends MediaDecoder {
      def decode(p: Array[Byte]): Array[Int] = p.map(b => 255 - (b & 0xff))
    }
    val stub = Multimodal.resizeWithDecoder(spark, fixture, ByteStubDecoder)
      .select("doc_id", "out_h", "n_px", "px_sum", "px_min", "px_max").head()
    val inv = Multimodal.resizeWithDecoder(spark, fixture, Invert)
      .select("doc_id", "out_h", "n_px", "px_sum", "px_min", "px_max").head()
    // plan-level facts identical (same plane geometry)...
    assert(stub.getLong(1) == 2L && inv.getLong(1) == 2L)
    assert(stub.getLong(2) == 16L && inv.getLong(2) == 16L)
    // ...pixel values follow the decoder: driver-side replay of the
    // 2x2 block-mean over each decoded plane (integer div, like the
    // plan — an algebraic 255-x shortcut would miss the truncation)
    def replay(plane: Int => Int): (Long, Int, Int) = {
      val px = for (r <- 0 until 2; c <- 0 until 8) yield
        (plane(r * 32 + c * 2) + plane(r * 32 + c * 2 + 1) +
          plane(r * 32 + 16 + c * 2) + plane(r * 32 + 16 + c * 2 + 1)) / 4
      (px.map(_.toLong).sum, px.min, px.max)
    }
    val (ss, smn, smx) = replay(identity)
    val (is, imn, imx) = replay(i => 255 - i)
    assert(stub.getLong(3) == ss && stub.getInt(4) == smn && stub.getInt(5) == smx)
    assert(inv.getLong(3) == is && inv.getInt(4) == imn && inv.getInt(5) == imx)
    // audio: inverting around 96 flips the sample sign pattern; a
    // driver-side replay pins the exact energies through the decoder
    val audio = Multimodal.audioEnergyWithDecoder(spark, fixture, Invert)
      .orderBy("fr").collect()
    val plane = Array.tabulate(64)(i => 255 - i)
    val expect = (0 until 4).map { fr =>
      val s = (fr * 16 until (fr + 1) * 16).map(k => plane(k) - 96)
      (s.map(x => x.toLong * x).sum, s.map(x => math.abs(x).toLong).max)
    }
    assert(audio.length == 4)
    audio.zip(expect).foreach { case (r, (energy, peak)) =>
      assert(r.getLong(3) == energy && r.getLong(4) == peak)
    }
  }
}
