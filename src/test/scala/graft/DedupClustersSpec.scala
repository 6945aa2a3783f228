package graft

import org.apache.spark.sql.functions._

import graft.ops.DedupClusters

/** Connected-components dedup clustering. */
class DedupClustersSpec extends SparkSpec {

  private def cc(pairs: Seq[(Long, Long)]) = {
    import spark.implicits._
    DedupClusters.connectedComponents(pairs.toDF("doc_a", "doc_b"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toMap
  }

  test("transitive pairs collapse into one component with min-id canonical") {
    // {1-2, 2-3} ∪ {10-11} → components {1,2,3} and {10,11}
    val labels = cc(Seq((1L, 2L), (2L, 3L), (10L, 11L)))
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("a 40-node path converges (pointer jumping beats the diameter)") {
    // worst case for plain propagation: one long chain
    val chain = (0L until 39L).map(i => (i, i + 1))
    val labels = cc(chain)
    assert(labels.size == 40 && labels.values.forall(_ == 0L))
  }

  test("declared query: canonical is the component min, sizes agree, members pair-connected") {
    val rows = DedupClusters.qDedupClusters(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty) // sf0.01 plants near-dup docs
    val byCluster = rows.groupBy(_.getLong(1))
    byCluster.foreach { case (canonical, members) =>
      assert(members.map(_.getLong(0)).min == canonical)
      // exactly one canonical per cluster, sizes consistent on every row
      assert(members.count(_.getBoolean(3)) == 1)
      assert(members.forall(_.getLong(2) == members.length))
      assert(members.length >= 2) // singletons never enter the pair graph
    }
  }
}
