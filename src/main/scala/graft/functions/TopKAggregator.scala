package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

import scala.collection.mutable.ArrayBuffer

/** Bounded top-k per group as a typed Aggregator (SURVEY.md §2.3 E14's
  * scale form). The window-function top-k (`row_number() <= k`) sorts
  * every group's full row set after a shuffle of all rows; this
  * aggregator keeps a k-bounded buffer, so map-side partial
  * aggregation ships at most k rows per (key, partition) into the
  * shuffle — the difference between shuffling a 100 TB fact table and
  * shuffling k × |keys| rows.
  *
  * Ordering: value DESC, then id ASC — ties deterministic, matching
  * the oracle's `ORDER BY l_extendedprice DESC, l_linenumber`.
  */
class TopKAggregator[IN](k: Int, extract: IN => (Double, Long))
    extends Aggregator[IN, ArrayBuffer[(Double, Long)], Seq[(Double, Long)]] {

  private def lt(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: ArrayBuffer[(Double, Long)] = ArrayBuffer.empty

  override def reduce(
      buf: ArrayBuffer[(Double, Long)], in: IN): ArrayBuffer[(Double, Long)] =
    insert(buf, extract(in))

  private def insert(
      buf: ArrayBuffer[(Double, Long)], x: (Double, Long)): ArrayBuffer[(Double, Long)] = {
    if (buf.length < k || lt(x, buf.last)) {
      val i = buf.indexWhere(e => lt(x, e)) match {
        case -1 => buf.length
        case n => n
      }
      buf.insert(i, x)
      if (buf.length > k) buf.remove(k, buf.length - k)
    }
    buf
  }

  override def merge(
      a: ArrayBuffer[(Double, Long)], b: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] =
    b.foldLeft(a)(insert)

  override def finish(buf: ArrayBuffer[(Double, Long)]): Seq[(Double, Long)] = buf.toSeq

  override def bufferEncoder: Encoder[ArrayBuffer[(Double, Long)]] =
    Encoders.kryo[ArrayBuffer[(Double, Long)]]

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}
