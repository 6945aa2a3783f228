package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.util.sketch.CountMinSketch

/** Count-min sketch over long keys as a typed Aggregator — the
  * fixed-memory heavy-hitter path at 100 TB (reference analogue: the
  * per-station request accounting of app.py:399-431, which a corpus-
  * scale run can only afford as a sketch). Exact per-key counting
  * shuffles one (key, partial) row per distinct key; the sketch's
  * shuffle is CONSTANT — depth × width longs per map partition,
  * regardless of key cardinality — and merges associatively, the same
  * contract `Summingbird`-style aggregation layers assume.
  *
  * Wraps Spark's own `org.apache.spark.util.sketch.CountMinSketch`
  * (the spark-sketch module backing `DataFrameStatFunctions
  * .countMinSketch`), with the standard guarantees for depth d,
  * width w over N inserts: estimate ≥ true count always, and
  * estimate ≤ true count + e·N/w with probability ≥ 1 − e^−d.
  * The finished value is the sketch's serialized bytes, so the result
  * column can be stored, shipped, and re-merged across runs.
  */
class CmsAggregator(depth: Int, width: Int, seed: Int)
    extends Aggregator[Long, CountMinSketch, Array[Byte]] {

  override def zero: CountMinSketch = CountMinSketch.create(depth, width, seed)

  override def reduce(buf: CountMinSketch, key: Long): CountMinSketch = {
    buf.addLong(key)
    buf
  }

  override def merge(a: CountMinSketch, b: CountMinSketch): CountMinSketch =
    a.mergeInPlace(b)

  override def finish(buf: CountMinSketch): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    buf.writeTo(out)
    out.toByteArray
  }

  override def bufferEncoder: Encoder[CountMinSketch] =
    Encoders.javaSerialization[CountMinSketch]

  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}
