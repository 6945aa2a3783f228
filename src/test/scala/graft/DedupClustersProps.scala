package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.ops.DedupClusters

/** Property: the distributed connected-components labeling equals a
  * plain union-find ground truth on random graphs. Few cases (each one
  * runs a full iterative Spark job) but each case is a whole random
  * graph, and the shrink path on failure isolates a minimal edge set. */
object DedupClustersProps extends Properties("DedupClusters") {

  // each case is an iterative Spark job — keep the count modest
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // min-relabel so every member maps to its component minimum,
    // matching the engine's canonical-id contract
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    nodes.groupBy(find).flatMap { case (_, members) =>
      val m = members.min
      members.map(_ -> m)
    }.toMap
  }

  private val genPairs: Gen[List[(Long, Long)]] = for {
    nIds <- Gen.choose(4L, 24L)
    n <- Gen.choose(1, 30)
    pairs <- Gen.listOfN(n,
      Gen.zip(Gen.choose(0L, nIds), Gen.choose(0L, nIds))
        .suchThat { case (a, b) => a != b })
  } yield pairs

  property("labels ≡ union-find on random graphs") = forAll(genPairs) { pairs =>
    pairs.isEmpty || {
      val spark = SparkSpec.session
      import spark.implicits._
      val got = DedupClusters
        .connectedComponents(pairs.toDF("doc_a", "doc_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == unionFind(pairs)
    }
  }
}
