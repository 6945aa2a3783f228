package graft

import org.apache.spark.sql.functions._
import graft.ops.Acquisition
import graft.plans.AsOf

/** Contract for the custom as-of join operator (plans/AsOfJoin.scala):
  * the planned-native form must agree row-for-row with the
  * union-and-carry composition, and its plan must actually contain
  * AsOfJoinExec (not a fallback) with no Window operator. */
class AsOfJoinSpec extends SparkSpec {

  test("q_asof_native ≡ q_asof_latest row-for-row on testdata") {
    val native = Acquisition.qAsofNative(spark, sfDir).collect().toSeq
    val carried = Acquisition.qAsofLatest(spark, sfDir).collect().toSeq
    assert(native.size == carried.size)
    assert(native == carried)
  }

  test("plan contains AsOfJoinExec and no Window") {
    val df = Acquisition.qAsofNative(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("left-outer: keys with no right rows carry nulls") {
    import spark.implicits._
    val l = Seq((1L, 10L, "e1"), (2L, 10L, "e2")).toDF("k", "t", "tag")
    val r = Seq((1L, 5L, "a")).toDF("rk", "rt", "v")
    val out = AsOf.joinLatest(l, r, Seq("k"), Seq("rk"), "t", "rt")
      .select("tag", "v").collect().map(x => (x.getString(0), x.isNullAt(1)))
      .toMap
    assert(out == Map("e1" -> false, "e2" -> true))
  }

  test("at-or-before semantics with tiebreaks: equal time admissible, max tiebreak wins") {
    import spark.implicits._
    val l = Seq((1L, 10L, "e1"), (1L, 20L, "e2"), (1L, 3L, "e0"))
      .toDF("k", "t", "tag")
    val r = Seq((1L, 10L, "a"), (1L, 10L, "b"), (1L, 15L, "c"), (1L, 25L, "d"))
      .toDF("rk", "rt", "v")
    val out = AsOf.joinLatest(l, r, Seq("k"), Seq("rk"), "t", "rt",
        rightTiebreaks = Seq("v"))
      .select("tag", "v").collect()
      .map(x => (x.getString(0), Option(x.getString(1)))).toMap
    // e0 precedes every order -> null; e1 at t=10 admits both ties, "b"
    // (greater tiebreak) wins; e2 at t=20 sees latest admissible t=15.
    assert(out == Map("e0" -> None, "e1" -> Some("b"), "e2" -> Some("c")))
  }

  test("null keys never match on either side") {
    import spark.implicits._
    val l = Seq((Option(1L), 10L, "x"), (Option.empty[Long], 10L, "y"))
      .toDF("k", "t", "tag")
    val r = Seq((Option(1L), 5L, "a"), (Option.empty[Long], 5L, "n"))
      .toDF("rk", "rt", "v")
    val out = AsOf.joinLatest(l, r, Seq("k"), Seq("rk"), "t", "rt")
      .select("tag", "v").collect()
      .map(x => (x.getString(0), Option(x.getString(1)))).toMap
    assert(out == Map("x" -> Some("a"), "y" -> None))
  }

  test("empty right side yields all-null matches, not an empty result") {
    import spark.implicits._
    val l = Seq((1L, 10L, "e1"), (2L, 20L, "e2")).toDF("k", "t", "tag")
    val r = Seq((1L, 5L, "a")).toDF("rk", "rt", "v").filter(lit(false))
    val out = AsOf.joinLatest(l, r, Seq("k"), Seq("rk"), "t", "rt")
    assert(out.count() == 2)
    assert(out.filter(col("v").isNotNull).count() == 0)
  }

  test("merge survives multi-partition co-partitioning (many keys, both sides shuffled)") {
    import spark.implicits._
    // 500 keys x 20 left rows, right has rows at even times only; the
    // expected match is computable in closed form: greatest even <= t.
    val l = spark.range(10000).select(
      (col("id") % 500).as("k"), expr("id div 500").as("t"))
    val r = spark.range(5000).select(
      (col("id") % 500).as("rk"), expr("(id div 500) * 2").as("rt"))
    val out = AsOf.joinLatest(l, r, Seq("k"), Seq("rk"), "t", "rt")
      .select(col("k"), col("t"), col("rt")).collect()
    assert(out.length == 10000)
    out.foreach { row =>
      val t = row.getLong(1)
      val expected = (t / 2) * 2
      assert(!row.isNullAt(2) && row.getLong(2) == expected,
        s"k=${row.getLong(0)} t=$t got ${if (row.isNullAt(2)) "null" else row.getLong(2)}, want $expected")
    }
  }
}
