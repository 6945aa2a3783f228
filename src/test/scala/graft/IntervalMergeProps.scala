package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import scala.collection.mutable.ArrayBuffer

import graft.functions.IntervalMergeAggregator

/** ScalaCheck properties over the aggregator's pure merge logic
  * (SURVEY.md §5.3) — no Spark session needed, so thousands of cases
  * run in milliseconds. */
object IntervalMergeProps extends Properties("IntervalMergeAggregator") {

  private val genInterval: Gen[(Long, Long)] = for {
    s <- Gen.chooseNum(0L, 1000L)
    len <- Gen.chooseNum(1L, 120L)
  } yield (s, s + len)

  private val genIntervals: Gen[List[(Long, Long)]] =
    Gen.listOfN(60, genInterval).flatMap(l => Gen.choose(0, l.length).map(l.take))

  private def naive(ivs: Seq[(Long, Long)]): Seq[(Long, Long)] =
    ivs.sorted.foldLeft(List.empty[(Long, Long)]) {
      case ((ps, pe) :: rest, (s, e)) if s <= pe => (ps, math.max(pe, e)) :: rest
      case (acc, iv) => iv :: acc
    }.reverse

  private def viaReduce(ivs: Seq[(Long, Long)]): Seq[(Long, Long)] =
    IntervalMergeAggregator.finish(
      ivs.foldLeft(IntervalMergeAggregator.zero)(IntervalMergeAggregator.reduce))

  property("reduce-fold equals naive sorted merge") = forAll(genIntervals) { ivs =>
    viaReduce(ivs) == naive(ivs)
  }

  property("merge of split buffers equals whole fold (map-side combine safety)") =
    forAll(genIntervals, Gen.chooseNum(0, 60)) { (ivs, cut) =>
      val k = math.min(cut, ivs.length)
      val left = ivs.take(k).foldLeft(IntervalMergeAggregator.zero)(IntervalMergeAggregator.reduce)
      val right = ivs.drop(k).foldLeft(IntervalMergeAggregator.zero)(IntervalMergeAggregator.reduce)
      IntervalMergeAggregator.finish(IntervalMergeAggregator.merge(left, right)) == viaReduce(ivs)
    }

  property("output intervals are sorted, disjoint, non-touching") =
    forAll(genIntervals) { ivs =>
      val out = viaReduce(ivs)
      out.zip(out.drop(1)).forall { case ((_, e1), (s2, _)) => s2 > e1 } &&
        out.forall { case (s, e) => s < e } || ivs.isEmpty
    }

  property("order-insensitive: any permutation gives the same result") =
    forAll(genIntervals) { ivs =>
      viaReduce(ivs) == viaReduce(ivs.reverse)
    }
}
