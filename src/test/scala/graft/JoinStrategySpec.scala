package graft

import org.apache.spark.sql.functions._

/** The full physical-join menu on one logical join: Spark plans
  * broadcast-hash, sort-merge, or shuffled-hash from the same
  * declarative plan, steered by hints (or by AQE at runtime). The
  * engine's operators deliberately leave mid-size joins unhinted so
  * AQE picks per-scale — this spec pins that the menu exists and that
  * strategy choice NEVER changes results, which is what makes that
  * freedom safe at 100 TB. */
class JoinStrategySpec extends SparkSpec {

  private def joined(hint: Option[String]) = {
    val dim0 = Tables.customer(spark, sfDir).select("c_custkey", "c_mktsegment")
    val dim = hint.map(dim0.hint(_)).getOrElse(dim0)
    Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey")
      .join(dim, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "c_mktsegment")
  }

  test("hints steer the physical strategy: broadcast / merge / shuffle_hash") {
    def plan(h: String) = joined(Some(h)).queryExecution.executedPlan.toString
    assert(plan("broadcast").contains("BroadcastHashJoin"))
    assert(plan("merge").contains("SortMergeJoin"))
    assert(plan("shuffle_hash").contains("ShuffledHashJoin"))
  }

  test("every strategy returns identical rows") {
    val base = joined(Some("broadcast")).collect().toSeq.sortBy(_.getLong(0))
    for (h <- Seq("merge", "shuffle_hash")) {
      assert(joined(Some(h)).collect().toSeq.sortBy(_.getLong(0)) == base, s"strategy $h diverged")
    }
  }
}
