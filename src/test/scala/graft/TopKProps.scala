package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.TopKAggregator

/** ScalaCheck properties for the bounded top-k buffer algebra. */
object TopKProps extends Properties("TopKAggregator") {

  private val agg = new TopKAggregator[(Double, Long)](3, identity)

  private val genRows: Gen[List[(Double, Long)]] =
    Gen.listOf(for {
      v <- Gen.chooseNum(0.0, 100.0)
      id <- Gen.chooseNum(0L, 50L)
    } yield (v, id))

  private def expected(rows: Seq[(Double, Long)]): Seq[(Double, Long)] =
    rows.sortBy { case (v, id) => (-v, id) }.take(3)

  property("fold equals sort-take") = forAll(genRows) { rows =>
    agg.finish(rows.foldLeft(agg.zero)(agg.reduce)) == expected(rows)
  }

  property("split-merge equals whole fold (map-side combine safety)") =
    forAll(genRows, Gen.chooseNum(0, 100)) { (rows, cut) =>
      val k = math.min(cut, rows.length)
      val l = rows.take(k).foldLeft(agg.zero)(agg.reduce)
      val r = rows.drop(k).foldLeft(agg.zero)(agg.reduce)
      agg.finish(agg.merge(l, r)) == expected(rows)
    }

  property("buffer never exceeds k") = forAll(genRows) { rows =>
    rows.foldLeft(agg.zero)(agg.reduce).length <= 3
  }
}
