package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.Acquisition

/** Unit + property coverage for the acquisition-plan operators
  * (SURVEY.md §5.2-5.3): chunk coverage, buffer clamping at window
  * edges (reference: app.py:375-376), anti-join idempotence
  * (app.py:419-421), and key format∘parse = id (app.py:266-268 vs
  * 451-454). */
class AcquisitionSpec extends SparkSpec {

  test("chunk explosion covers each day with 24 non-overlapping hours") {
    val rows = Acquisition.qChunkExplode(spark, sfDir).collect()
    assert(rows.length % 24 == 0)
    val byDay = rows.map(_.getTimestamp(0)).groupBy(t =>
      t.toInstant.truncatedTo(java.time.temporal.ChronoUnit.DAYS))
    byDay.foreach { case (day, ts) =>
      assert(ts.length == 24)
      val hours = ts.map(_.toInstant.getEpochSecond % 86400 / 3600).sorted
      assert(hours.sameElements(0L until 24L))
    }
  }

  test("buffered bounds clamp at the day edges and extend ±120s inside") {
    val rows = Acquisition.qBufferedBounds(spark, sfDir)
      .withColumn("day_start", date_trunc("day", col("chunk_start")))
      .collect()
    rows.foreach { r =>
      val chunk = r.getTimestamp(r.fieldIndex("chunk_start")).getTime
      val qs = r.getTimestamp(r.fieldIndex("query_start")).getTime
      val qe = r.getTimestamp(r.fieldIndex("query_end")).getTime
      val dayStart = r.getTimestamp(r.fieldIndex("day_start")).getTime
      val dayEnd = dayStart + 86400000L
      // never outside the window (reference clamping, app.py:375-376)
      assert(qs >= dayStart && qe <= dayEnd)
      // inside the window the buffer is exactly ±120 s
      if (chunk - 120000 >= dayStart) assert(qs == chunk - 120000)
      if (chunk + 3720000 <= dayEnd) assert(qe == chunk + 3720000)
    }
  }

  test("anti-join dedup is idempotent: surviving plan re-run is empty") {
    val plan = Acquisition.qAntiDedup(spark, sfDir)
    // empty sink: everything survives a re-plan (R9 first run)
    val emptySink = plan.filter(lit(false))
    val second = plan.join(emptySink.withColumnRenamed("o_orderkey", "k"),
      col("o_orderkey") === col("k"), "left_anti")
    assert(second.count() == plan.count())
    // sink now contains the survivors: nothing survives (R9 re-run safety)
    val third = plan.join(plan, Seq("o_orderkey"), "left_anti")
    assert(third.count() == 0)
  }

  test("filename format and parse are inverse (format∘parse = id)") {
    val rows = Acquisition.qKeyProjection(spark, sfDir).collect()
    rows.foreach { r =>
      val filename = r.getString(r.fieldIndex("filename"))
      val parts = filename.split("\\.")
      assert(parts.length == 6)
      assert(r.getString(r.fieldIndex("station_parsed")) == parts(1))
      assert(r.getString(r.fieldIndex("channel_parsed")) == parts(3))
      assert(r.getString(r.fieldIndex("s3_key"))
        == parts(4).substring(0, 8) + "/" + filename)
    }
  }

  test("lookup join drops unmatched rows; miss channel is the complement") {
    val joined = Acquisition.qLookupJoin(spark, sfDir).count()
    val missed = Acquisition.qLookupMisses(spark, sfDir).count()
    val total = Tables.orders(spark, sfDir).count()
    // full dim: referential integrity ⇒ everything joins
    assert(joined == total)
    // partial dim (nation < 10): misses are exactly the high-nation orders
    assert(missed > 0)
    val highNation = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir)
        .filter(col("c_nationkey") >= 10).select("c_custkey"),
        col("o_custkey") === col("c_custkey"), "left_semi").count()
    assert(missed == highNation)
  }

  test("as-of join picks the latest order at-or-before each event") {
    // o_orderdate is TIMESTAMP_NTZ in the testdata parquet — compare
    // through epoch seconds to stay type-agnostic
    val rows = Acquisition.qAsofLatest(spark, sfDir)
      .select(unix_micros(col("ts")).as("t"),
        unix_micros(col("asof_date").cast("timestamp")).as("a"))
      .limit(100).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(1) <= r.getLong(0)))
  }

  test("bucketed range join ≡ naive theta join, and plans an equi shuffle join") {
    val bucketed = Acquisition.qRangeJoin(spark, sfDir)
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val p = ev.select(col("user_id").as("p_user"), col("ts").as("p_ts"),
      col("event_id").as("p_event"), col("value").as("p_value"))
    val naive = ev.join(p,
        ev("user_id") === p("p_user") && p("p_ts") < ev("ts") &&
          p("p_ts") >= ev("ts") - expr("INTERVAL 24 HOURS"), "left")
      .groupBy(ev("event_id"))
      .agg(count(col("p_event")).as("n_prior"),
        sum(col("p_value").cast("decimal(18,6)")).cast("double").as("sum_prior_value"))
    val rows = bucketed.collect()
    val bs = rows.map(_.toString).sorted
    val ns = naive.orderBy("event_id").collect().map(_.toString).sorted
    assert(bs.sameElements(ns))
    assert(rows.exists(_.getLong(1) > 0)) // trailing-24h activity is non-vacuous
    // the scale property: no nested-loop join in the bucketed plan
    val plan = bucketed.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"))
  }

  test("salted join ≡ plain lookup join") {
    val salted = Acquisition.qSkewJoinSalted(spark, sfDir).collect().map(_.toString)
    val e = Tables.events(spark, sfDir).select("event_id", "user_id", "value")
    val c = Tables.customer(spark, sfDir).select("c_custkey", "c_name")
    val plain = e.join(c, e("user_id") === c("c_custkey"))
      .select("event_id", "user_id", "c_name", "value")
      .orderBy("event_id").collect().map(_.toString)
    assert(salted.nonEmpty && salted.sameElements(plain))
  }

  test("completeness report covers the full grid; one cell recomputed from raw events") {
    val out = Acquisition.qCompleteness(spark, sfDir).collect()
    val ev = Tables.events(spark, sfDir)
      .selectExpr("event_type", "date_trunc('day', ts) AS day",
        "date_trunc('hour', ts) AS hr")
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getTimestamp(2)))
    val types = ev.map(_._1).distinct
    val days = ev.map(_._2).distinct
    // the grid is total: every (type, day) cell present exactly once
    assert(out.length == types.length * days.length)
    assert(out.map(r => (r.getString(0), r.getTimestamp(1))).distinct.length == out.length)
    out.foreach { r =>
      assert(r.getLong(2) + r.getLong(4) == 24L) // landed + missing = expected
      assert(r.getLong(2) >= 0 && r.getLong(2) <= 24)
    }
    // one cell recomputed: distinct landed hours for the first cell
    val first = out.head
    val expected = ev.filter(e => e._1 == first.getString(0)
      && e._2 == first.getTimestamp(1)).map(_._3).distinct.length
    assert(first.getLong(2) == expected.toLong)
  }

  test("PIT features: blind window and staleness floor hold; one user replays greedily") {
    import org.apache.spark.sql.functions.col
    val evs = Tables.events(spark, sfDir)
      .select("user_id", "event_id", "ts", "event_type", "value")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getTimestamp(2).getTime, r.getString(3), r.getDouble(4)))
    val byEvent = evs.map(e => e._2 -> e).toMap
    val rows = graft.ops.Acquisition.qPitFeatures(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime,
        r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    val hourMs = 3600L * 1000; val weekMs = 7L * 24 * hourMs
    rows.foreach { case (labelId, user, labelTs, featEvent, featValue) =>
      val f = byEvent(featEvent)
      assert(f._1 == user && f._5 == featValue)
      // leakage-safe: the feature predates the label by ≥ the blind hour
      assert(f._3 <= labelTs - hourMs && f._3 >= labelTs - hourMs - weekMs)
      // it is THE latest admissible one (ties to larger event_id)
      val better = evs.filter(e => e._1 == user &&
        e._3 <= labelTs - hourMs && e._3 >= labelTs - hourMs - weekMs &&
        (e._3 > f._3 || (e._3 == f._3 && e._2 > featEvent)))
      assert(better.isEmpty, s"label $labelId skipped fresher feature")
    }
    // every purchase with an admissible feature appears exactly once
    val expectedLabels = evs.filter(_._4 == "purchase").filter { l =>
      evs.exists(e => e._1 == l._1 &&
        e._3 <= l._3 - hourMs && e._3 >= l._3 - hourMs - weekMs) }
      .map(_._2).toSet
    assert(rows.map(_._1).toSet == expectedLabels)
  }

  test("backfill chunks: every detected gap fully covered by its hour chunks, buffers ±120s") {
    val gaps = graft.ops.Inventory.qGapDetect(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getTimestamp(2).getTime * 1000, r.getTimestamp(3).getTime * 1000))
    val got = Acquisition.qBackfillChunks(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime * 1000,
        r.getTimestamp(3).getTime * 1000, r.getTimestamp(4).getTime * 1000, r.getLong(5)))
    assert(got.nonEmpty)
    val hour = 3600L * 1000000
    val byUser = got.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // coverage: each gap's endpoints' hours (and all between) are planned
    gaps.foreach { case (u, p, t) =>
      val h0 = Math.floorDiv(p, hour); val h1 = Math.floorDiv(t, hour)
      (h0 to h1).foreach(h => assert(byUser(u).contains(h * hour)))
    }
    // chunk grid + buffers + covered-gap accounting
    val refCount = gaps.flatMap { case (u, p, t) =>
      (Math.floorDiv(p, hour) to Math.floorDiv(t, hour)).map(h => (u, h * hour)) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    got.foreach { case (u, cs, qs, qe, n) =>
      assert(cs % hour == 0 && qs == cs - 120L * 1000000 && qe == cs + hour + 120L * 1000000)
      assert(n == refCount((u, cs)))
    }
    assert(got.map(_._5).sum == gaps.map { case (_, p, t) =>
      Math.floorDiv(t, hour) - Math.floorDiv(p, hour) + 1 }.sum)
  }
}
