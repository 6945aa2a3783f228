package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import scala.collection.mutable.ArrayBuffer

/** Typed interval-coalescing aggregator (SURVEY.md §2.3 E13b) — the
  * `Aggregator[IN, BUF, OUT]` form of the interval merge that undoes
  * the reference pipeline's deliberate ±120 s chunk overlap
  * (reference: app.py:375-376).
  *
  * Unlike the window-function formulation (ops/Inventory.qIntervalMerge,
  * which needs a total sort per key), the aggregator merges partial
  * buffers associatively, so map-side partial aggregation applies: each
  * partition reduces its rows to a small sorted disjoint-interval list
  * before the shuffle — the right shape at 100 TB where a key's rows
  * span many input splits. Buffer size is bounded by the number of
  * *disjoint* covered spans, not the row count.
  *
  * Intervals are `[start, end)` in epoch microseconds; two intervals
  * merge when they overlap or touch (`start <= end`).
  */
object IntervalMergeAggregator
    extends Aggregator[(Long, Long), ArrayBuffer[(Long, Long)], Seq[(Long, Long)]] {

  override def zero: ArrayBuffer[(Long, Long)] = ArrayBuffer.empty

  /** Insert one interval into a sorted disjoint list, coalescing. */
  override def reduce(
      buf: ArrayBuffer[(Long, Long)], iv: (Long, Long)): ArrayBuffer[(Long, Long)] =
    insert(buf, iv)

  override def merge(
      a: ArrayBuffer[(Long, Long)], b: ArrayBuffer[(Long, Long)]): ArrayBuffer[(Long, Long)] = {
    val (big, small) = if (a.length >= b.length) (a, b) else (b, a)
    small.foldLeft(big)(insert)
  }

  override def finish(buf: ArrayBuffer[(Long, Long)]): Seq[(Long, Long)] = buf.toSeq

  override def bufferEncoder: Encoder[ArrayBuffer[(Long, Long)]] =
    Encoders.kryo[ArrayBuffer[(Long, Long)]]

  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()

  private def insert(
      buf: ArrayBuffer[(Long, Long)], iv: (Long, Long)): ArrayBuffer[(Long, Long)] = {
    var (s, e) = iv
    // binary search for first interval whose end >= s (merge frontier)
    var lo = 0
    var hi = buf.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (buf(mid)._2 < s) lo = mid + 1 else hi = mid
    }
    var j = lo
    while (j < buf.length && buf(j)._1 <= e) {
      s = math.min(s, buf(j)._1)
      e = math.max(e, buf(j)._2)
      j += 1
    }
    buf.remove(lo, j - lo)
    buf.insert(lo, (s, e))
    buf
  }
}
