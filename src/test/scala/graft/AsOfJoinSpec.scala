package graft

import org.apache.spark.sql.functions._
import graft.ops.Acquisition
import graft.plans.AsOf

/** Contract for the custom as-of join operator (plans/AsOfJoin.scala):
  * both physical paths (broadcast for a dim-sized right side, shuffled
  * sort-merge otherwise) must agree row-for-row with the
  * union-and-carry composition, the strategy must pick the path the
  * stats call for, and neither plan may contain a Window operator. */
class AsOfJoinSpec extends SparkSpec {

  /** Run `f` with autoBroadcastJoinThreshold pinned, then restore. */
  private def withThreshold(v: String)(f: => Unit): Unit = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    spark.conf.set(key, v)
    try f finally spark.conf.set(key, old)
  }

  private def semanticsSuite(): Unit = {
    import spark.implicits._
    // left-outer: keys with no right rows carry nulls
    val l1 = Seq((1L, 10L, "e1"), (2L, 10L, "e2")).toDF("k", "t", "tag")
    val r1 = Seq((1L, 5L, "a")).toDF("rk", "rt", "v")
    val out1 = AsOf.joinLatest(l1, r1, Seq("k"), Seq("rk"), "t", "rt")
      .select("tag", "v").collect().map(x => (x.getString(0), x.isNullAt(1)))
      .toMap
    assert(out1 == Map("e1" -> false, "e2" -> true))

    // at-or-before + tiebreaks: equal time admissible, max tiebreak wins
    val l2 = Seq((1L, 10L, "e1"), (1L, 20L, "e2"), (1L, 3L, "e0"))
      .toDF("k", "t", "tag")
    val r2 = Seq((1L, 10L, "a"), (1L, 10L, "b"), (1L, 15L, "c"), (1L, 25L, "d"))
      .toDF("rk", "rt", "v")
    val out2 = AsOf.joinLatest(l2, r2, Seq("k"), Seq("rk"), "t", "rt",
        rightTiebreaks = Seq("v"))
      .select("tag", "v").collect()
      .map(x => (x.getString(0), Option(x.getString(1)))).toMap
    assert(out2 == Map("e0" -> None, "e1" -> Some("b"), "e2" -> Some("c")))

    // null keys never match on either side
    val l3 = Seq((Option(1L), 10L, "x"), (Option.empty[Long], 10L, "y"))
      .toDF("k", "t", "tag")
    val r3 = Seq((Option(1L), 5L, "a"), (Option.empty[Long], 5L, "n"))
      .toDF("rk", "rt", "v")
    val out3 = AsOf.joinLatest(l3, r3, Seq("k"), Seq("rk"), "t", "rt")
      .select("tag", "v").collect()
      .map(x => (x.getString(0), Option(x.getString(1)))).toMap
    assert(out3 == Map("x" -> Some("a"), "y" -> None))

    // empty right side yields all-null matches, not an empty result
    val r4 = Seq((1L, 5L, "a")).toDF("rk", "rt", "v").filter(lit(false))
    val out4 = AsOf.joinLatest(l1, r4, Seq("k"), Seq("rk"), "t", "rt")
    assert(out4.count() == 2)
    assert(out4.filter(col("v").isNotNull).count() == 0)

    // tolerance floor: matches older than minTime become null, and a
    // too-stale match for one row can still serve a later row
    val l6 = Seq((1L, 10L, "near"), (1L, 100L, "far"), (1L, 12L, "edge"))
      .toDF("k", "t", "tag")
    val r6 = Seq((1L, 7L, "a")).toDF("rk", "rt", "v")
    val out6 = AsOf.joinLatest(l6, r6, Seq("k"), Seq("rk"), "t", "rt",
        minTime = Some("t - 5"))
      .select("tag", "v").collect()
      .map(x => (x.getString(0), Option(x.getString(1)))).toMap
    // near: 7 >= 10-5 ok; edge: 7 >= 12-5 ok (boundary); far: 7 < 95 null
    assert(out6 == Map("near" -> Some("a"), "edge" -> Some("a"), "far" -> None))

    // allowExact = false: boundary rows excluded in both directions
    val outStrict = AsOf.joinLatest(l2, r2, Seq("k"), Seq("rk"), "t", "rt",
        rightTiebreaks = Seq("v"), allowExact = false)
      .select("tag", "v").collect()
      .map(x => (x.getString(0), Option(x.getString(1)))).toMap
    // e1 at t=10: the rt=10 ties are now excluded -> null (nothing
    // strictly before); e2 at t=20 still sees rt=15
    assert(outStrict == Map("e0" -> None, "e1" -> None, "e2" -> Some("c")))

    // forward direction: first right row at-or-after, min tiebreak on
    // ties, ceiling bound nulls too-distant matches
    val lf = Seq((1L, 10L, "f1"), (1L, 16L, "f2"), (1L, 30L, "f3"))
      .toDF("k", "t", "tag")
    val rf = Seq((1L, 10L, "b"), (1L, 10L, "a"), (1L, 25L, "c"))
      .toDF("rk", "rt", "v")
    val outF = AsOf.joinNext(lf, rf, Seq("k"), Seq("rk"), "t", "rt",
        rightTiebreaks = Seq("v"))
      .select("tag", "v").collect()
      .map(x => (x.getString(0), Option(x.getString(1)))).toMap
    // f1 at t=10: ties at rt=10, smallest tiebreak "a"; f2: next is 25
    // -> "c"; f3: nothing at-or-after 30 -> null
    assert(outF == Map("f1" -> Some("a"), "f2" -> Some("c"), "f3" -> None))
    val outFB = AsOf.joinNext(lf, rf, Seq("k"), Seq("rk"), "t", "rt",
        rightTiebreaks = Seq("v"), maxTime = Some("t + 5"))
      .select("tag", "v").collect()
      .map(x => (x.getString(0), Option(x.getString(1)))).toMap
    // ceiling t+5: f2's candidate at 25 > 21 -> null; f1 unaffected
    assert(outFB == Map("f1" -> Some("a"), "f2" -> None, "f3" -> None))

    // many keys, closed-form expected match (greatest even <= t)
    val l5 = spark.range(10000).select(
      (col("id") % 500).as("k"), expr("id div 500").as("t"))
    val r5 = spark.range(5000).select(
      (col("id") % 500).as("rk"), expr("(id div 500) * 2").as("rt"))
    val out5 = AsOf.joinLatest(l5, r5, Seq("k"), Seq("rk"), "t", "rt")
      .select(col("k"), col("t"), col("rt")).collect()
    assert(out5.length == 10000)
    out5.foreach { row =>
      val t = row.getLong(1)
      val expected = (t / 2) * 2
      assert(!row.isNullAt(2) && row.getLong(2) == expected,
        s"k=${row.getLong(0)} t=$t got ${if (row.isNullAt(2)) "null" else row.getLong(2)}, want $expected")
    }
  }

  test("q_asof_native ≡ q_asof_latest row-for-row on testdata (stats-selected path)") {
    val native = Acquisition.qAsofNative(spark, sfDir).collect().toSeq
    val carried = Acquisition.qAsofLatest(spark, sfDir).collect().toSeq
    assert(native.size == carried.size)
    assert(native == carried)
  }

  test("strategy picks broadcast for a dim-sized right side, merge when broadcast is off") {
    val df1 = Acquisition.qAsofNative(spark, sfDir)
    df1.collect()
    val p1 = df1.queryExecution.executedPlan.toString
    assert(p1.contains("BroadcastAsOfJoin"), p1)
    assert(!p1.contains("Window"), p1)
    withThreshold("-1") {
      val df2 = Acquisition.qAsofNative(spark, sfDir)
      df2.collect()
      val p2 = df2.queryExecution.executedPlan.toString
      assert(p2.contains("AsOfJoin") && !p2.contains("BroadcastAsOfJoin"), p2)
      assert(!p2.contains("Window"), p2)
      assert(Acquisition.qAsofNative(spark, sfDir).collect().toSeq ==
        Acquisition.qAsofLatest(spark, sfDir).collect().toSeq)
    }
  }

  test("broadcast hint overrides stats in both directions") {
    import spark.implicits._
    val l = Seq((1L, 10L, "e1")).toDF("k", "t", "tag")
    val r = Seq((1L, 5L, "a")).toDF("rk", "rt", "v")
    // force merge although the right side is tiny
    val merged = AsOf.joinLatest(l, r, Seq("k"), Seq("rk"), "t", "rt",
      broadcastHint = Some(false))
    merged.collect()
    val p1 = merged.queryExecution.executedPlan.toString
    assert(p1.contains("AsOfJoin") && !p1.contains("BroadcastAsOfJoin"), p1)
    // force broadcast although broadcasting is disabled
    withThreshold("-1") {
      val bc = AsOf.joinLatest(l, r, Seq("k"), Seq("rk"), "t", "rt",
        broadcastHint = Some(true))
      bc.collect()
      val p2 = bc.queryExecution.executedPlan.toString
      assert(p2.contains("BroadcastAsOfJoin"), p2)
    }
    // q_asof_merge is the hint-pinned query the driver oracle-gates
    val pinned = Acquisition.qAsofMerge(spark, sfDir)
    pinned.collect()
    val p3 = pinned.queryExecution.executedPlan.toString
    assert(p3.contains("AsOfJoin") && !p3.contains("BroadcastAsOfJoin"), p3)
    assert(pinned.collect().toSeq ==
      Acquisition.qAsofLatest(spark, sfDir).collect().toSeq)
  }

  test("q_asof_dim_enrich: temporal-dim shape plans BroadcastAsOfJoinExec and carries forward") {
    val df = Acquisition.qAsofDimEnrich(spark, sfDir)
    val rows = df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the stream-static enrichment plan: broadcast exec, no Window,
    // fact side never sorted into a merge
    assert(plan.contains("BroadcastAsOfJoin"), plan)
    assert(!plan.contains("Window"), plan)
    assert(rows.nonEmpty)
    // the lookup is a real SCD2 carry: a substantial share of events
    // match an eff_from strictly before their own day (a missing
    // version between dim row and event)
    val e = Tables.events(spark, sfDir)
      .select(col("event_id"), date_trunc("day", col("ts")).as("own_day"))
    val carried = df.join(e, "event_id")
      .filter(col("eff_from") < col("own_day")).count()
    assert(carried > 0, "no event carried forward — dim not temporal")
    // every matched version really is a qualifying (above-average) day
    val hotDays = {
      val daily = Tables.events(spark, sfDir)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).as("n"))
      val tot = daily.groupBy("event_type")
        .agg(sum("n").as("total"), count(lit(1)).as("nd"))
      daily.join(tot, "event_type")
        .filter(col("n") * col("nd") > col("total"))
        .select(col("d")).distinct().collect().map(_.getTimestamp(0)).toSet
    }
    assert(rows.forall(r => hotDays.contains(r.getTimestamp(1))))
  }

  test("pruning rule narrows unprojected children down to the referenced columns") {
    // No manual select on either side: the rule must keep only the
    // join-needed + consumer-needed columns, dropping event_type/value/
    // props on the left and status/price/priority on the right.
    val e = Tables.events(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
      .withColumn("t", col("o_orderdate").cast("timestamp"))
    val df = AsOf.joinLatest(e, o, Seq("user_id"), Seq("o_custkey"), "ts", "t")
      .filter(col("o_orderkey").isNotNull)
      .select("event_id", "o_orderkey")
    val j = df.queryExecution.optimizedPlan.collect {
      case x: graft.plans.AsOfJoin => x
    }.head
    assert(j.left.output.map(_.name).toSet == Set("event_id", "ts", "user_id"))
    assert(j.right.output.map(_.name).toSet == Set("o_orderkey", "o_custkey", "t"))
    // pruning reaches the parquet scan: the orders ReadSchema drops the
    // columns the query never references
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("o_orderstatus") && !plan.contains("o_totalprice"), plan)
    // and the narrowed plan still agrees with the manually-projected form
    val manual = AsOf.joinLatest(
        e.select("user_id", "ts", "event_id"),
        o.select("o_custkey", "t", "o_orderkey"),
        Seq("user_id"), Seq("o_custkey"), "ts", "t")
      .filter(col("o_orderkey").isNotNull)
      .select("event_id", "o_orderkey")
    assert(df.collect().toSeq.sortBy(_.getLong(0)) ==
      manual.collect().toSeq.sortBy(_.getLong(0)))
  }

  test("left-only filter conjuncts push below the join; right-side conjuncts stay above") {
    val e = Tables.events(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
      .withColumn("t", col("o_orderdate").cast("timestamp"))
    val df = AsOf.joinLatest(e, o, Seq("user_id"), Seq("o_custkey"), "ts", "t")
      .filter(col("event_id") < 500 && col("o_orderkey").isNotNull)
      .select("event_id", "o_orderkey")
    val j = df.queryExecution.optimizedPlan.collect {
      case x: graft.plans.AsOfJoin => x
    }.head
    // the event_id bound moved below the join (merged into the scan
    // side), so the join's left subtree already constrains event_id...
    assert(j.left.constraints.exists(_.references.map(_.name).toSet == Set("event_id")),
      j.left.toString)
    // ...and the right-side null filter did NOT move below
    assert(!j.right.exists {
      case org.apache.spark.sql.catalyst.plans.logical.Filter(c, _) =>
        c.references.exists(_.name == "o_orderkey")
      case _ => false
    }, j.right.toString)
    df.collect()
    // pushed predicate reaches the parquet scan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(event_id), LessThan(event_id,500)]") ||
      plan.contains("LessThan(event_id,500)"), plan)
    // semantics unchanged vs filtering after a plain as-of join
    val reference = AsOf.joinLatest(
        e.select("user_id", "ts", "event_id"),
        o.select("o_custkey", "t", "o_orderkey"),
        Seq("user_id"), Seq("o_custkey"), "ts", "t")
      .filter(col("event_id") < 500 && col("o_orderkey").isNotNull)
      .select("event_id", "o_orderkey")
    assert(df.collect().toSeq.sortBy(_.getLong(0)) ==
      reference.collect().toSeq.sortBy(_.getLong(0)))
  }

  test("as-of semantics hold on the broadcast path (default threshold)") {
    semanticsSuite()
  }

  test("as-of semantics hold on the sort-merge path (broadcast disabled)") {
    withThreshold("-1") { semanticsSuite() }
  }
}
