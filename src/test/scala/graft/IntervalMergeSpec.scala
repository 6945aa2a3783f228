package graft

import scala.util.Random

import graft.functions.IntervalMergeAggregator

/** E13b: the typed Aggregator against a reference fold, including the
  * clamped-edge overlap cases from the reference chunker
  * (app.py:375-376), plus a property sweep with random intervals. */
class IntervalMergeSpec extends SparkSpec {

  private def naiveMerge(ivs: Seq[(Long, Long)]): Seq[(Long, Long)] =
    ivs.sortBy(identity).foldLeft(List.empty[(Long, Long)]) {
      case (acc, (s, e)) => acc match {
        case (ps, pe) :: rest if s <= pe => (ps, math.max(pe, e)) :: rest
        case _ => (s, e) :: acc
      }
    }.reverse

  private def viaAggregator(ivs: Seq[(Long, Long)]): Seq[(Long, Long)] = {
    import spark.implicits._
    val ds = spark.createDataset(ivs)
    ds.groupByKey(_ => 0)
      .agg(IntervalMergeAggregator.toColumn)
      .collect().head._2.sortBy(identity)
  }

  test("overlapping 1h chunks with ±120s buffer merge back to one day") {
    val hour = 3600L * 1000000
    val buf = 120L * 1000000
    val day = (0 until 24).map { h =>
      val s = h * hour
      (math.max(0, s - buf), math.min(24 * hour, s + hour + buf))
    }
    assert(viaAggregator(Random.shuffle(day)) == Seq((0L, 24 * hour)))
  }

  test("disjoint intervals stay disjoint; touching intervals coalesce") {
    assert(viaAggregator(Seq((0L, 10L), (20L, 30L))) == Seq((0L, 10L), (20L, 30L)))
    assert(viaAggregator(Seq((0L, 10L), (10L, 30L))) == Seq((0L, 30L)))
    assert(viaAggregator(Seq((5L, 6L), (0L, 100L))) == Seq((0L, 100L)))
  }

  test("property: aggregator equals naive sorted fold on random inputs") {
    val rnd = new Random(42)
    (1 to 20).foreach { _ =>
      val ivs = Seq.fill(rnd.nextInt(50) + 1) {
        val s = rnd.nextInt(1000).toLong
        (s, s + rnd.nextInt(100) + 1L)
      }
      assert(viaAggregator(ivs) == naiveMerge(ivs), s"inputs: $ivs")
    }
  }
}
