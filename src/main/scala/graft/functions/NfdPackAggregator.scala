package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import scala.collection.mutable.ArrayBuffer

/** Next-Fit-Decreasing bin packing over one group's file sizes — the
  * true largest-first NFD sibling of ops/Inventory.qCompactionPlan's
  * offset-concatenation scheme (which cuts the byte stream at exact
  * target boundaries and lets files straddle-assign, so its bins can
  * overflow the target). NFD instead KEEPS the target as a capacity:
  * files sorted largest-first, one open bin; a file that does not fit
  * the open bin's remaining capacity CLOSES it and opens a new one.
  * Only a single oversize file (> target) may exceed the target, by
  * owning its bin. Classic guarantee (asserted by InventorySpec):
  * every two consecutive bins sum to > target — summing over bin
  * pairs gives n_bins ≤ 2·⌈total/target⌉ ≤ 2·OPT, the textbook
  * next-fit bound.
  *
  * The fold is order-dependent (largest-first), so it is NOT an
  * associative reduce: the buffer collects the group's file sizes and
  * `finish` sorts + folds. That is safe here because the group's file
  * count is DIM-bounded — one "file" per (day, event_type), so the
  * buffer holds ≤ |event types| longs regardless of corpus size; at
  * 100 TB the aggregate's state is still a handful of longs per day.
  * Ties in size are interchangeable under NFD (bin count and bin byte
  * sums depend only on the sorted multiset), so no tiebreak column is
  * needed for determinism of the declared output.
  *
  * OUT = (n_files, n_bins, total_bytes, max_bin_bytes).
  */
class NfdPackAggregator(target: Long)
    extends Aggregator[(String, Long), ArrayBuffer[Long], (Long, Long, Long, Long)] {

  override def zero: ArrayBuffer[Long] = ArrayBuffer.empty

  override def reduce(buf: ArrayBuffer[Long], row: (String, Long)): ArrayBuffer[Long] = {
    buf += row._2
    buf
  }

  override def merge(a: ArrayBuffer[Long], b: ArrayBuffer[Long]): ArrayBuffer[Long] =
    a ++= b

  override def finish(buf: ArrayBuffer[Long]): (Long, Long, Long, Long) = {
    val sorted = buf.sortBy(x => -x)
    var bins = 0L
    var rem = 0L
    var cur = 0L
    var maxBin = 0L
    var total = 0L
    sorted.foreach { x =>
      total += x
      if (bins == 0L || x > rem) {
        bins += 1L
        cur = x
        rem = math.max(target - x, 0L)
      } else {
        cur += x
        rem -= x
      }
      maxBin = math.max(maxBin, cur)
    }
    (sorted.length.toLong, bins, total, maxBin)
  }

  override def bufferEncoder: Encoder[ArrayBuffer[Long]] =
    Encoders.kryo[ArrayBuffer[Long]]

  override def outputEncoder: Encoder[(Long, Long, Long, Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Long, Long, Long)]()
}
