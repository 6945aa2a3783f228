package graft

import org.apache.spark.sql.functions._

import graft.ops.Analytics

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("star join totals equal the ungrouped fact totals (no row loss/dup through the dim chain)") {
    val joined = Analytics.qStarJoin(spark, sfDir)
    val Seq((nJoined, sumJoined)) = joined
      .agg(sum("n_orders"), round(sum("sum_price"), 2)).as[(Long, Double)].collect().toSeq
    val Seq((nFact, sumFact)) = Tables.orders(spark, sfDir)
      .agg(count(lit(1)), round(sum(col("o_totalprice").cast("decimal(18,6)")).cast("double"), 2))
      .as[(Long, Double)].collect().toSeq
    assert(nJoined == nFact)     // every order has a customer→nation→region chain
    assert(sumJoined == sumFact) // and is counted exactly once
  }

  test("star join broadcasts the dims (no shuffle exchange on nation/region)") {
    val plan = Analytics.qStarJoin(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("rolling stats frame is the trailing 7 rows: roll_n caps at 7, first row of each user is its own frame") {
    val df = Analytics.qRollingStats(spark, sfDir).cache()
    assert(df.filter(col("roll_n") > 7).count() == 0)
    // per-user first row (version order = ts, event_id): frame is just itself
    val first = df.withColumn("rn",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"), col("event_id"))))
      .filter(col("rn") === 1)
    assert(first.filter(col("roll_n") =!= 1 || col("roll_sum") =!= col("value")
      || col("roll_min") =!= col("value") || col("roll_max") =!= col("value")).count() == 0)
    df.unpersist()
  }

  test("ntile quartiles are balanced within 1 and ordered by value") {
    val df = Analytics.qNtileCume(spark, sfDir).cache()
    val sizes = df.groupBy("event_type", "quartile").count()
      .groupBy("event_type").agg((max("count") - min("count")).as("spread"))
    assert(sizes.filter(col("spread") > 1).count() == 0)
    // quartile boundaries respect value order: max(value) of q ≤ min(value) of q+1
    val bounds = df.groupBy("event_type", "quartile")
      .agg(min("value").as("lo"), max("value").as("hi"))
    val crossed = bounds.as("a").join(bounds.as("b"),
      $"a.event_type" === $"b.event_type" && $"a.quartile" + 1 === $"b.quartile")
      .filter($"a.hi" > $"b.lo")
    assert(crossed.count() == 0)
    df.unpersist()
  }

  test("funnel stages are consistent: timestamps strictly increase along the funnel") {
    val df = Analytics.qFunnel(spark, sfDir).cache()
    assert(df.filter(col("first_click").isNotNull && !(col("first_click") > col("first_view"))).count() == 0)
    assert(df.filter(col("first_purchase").isNotNull && !(col("first_purchase") > col("first_click"))).count() == 0)
    // stage label agrees with which timestamps exist
    assert(df.filter(col("stage") === "purchase" && col("first_purchase").isNull).count() == 0)
    assert(df.filter(col("stage") === "click" &&
      (col("first_click").isNull || col("first_purchase").isNotNull)).count() == 0)
    df.unpersist()
  }

  test("funnel timing counts converters and picks member-value medians") {
    val t = Analytics.qFunnelTime(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    val f = Analytics.qFunnel(spark, sfDir).cache()
    assert(t("view_to_click").getLong(1) ==
      f.filter(col("first_click").isNotNull).count())
    assert(t("click_to_purchase").getLong(1) ==
      f.filter(col("first_purchase").isNotNull).count())
    // strictly-increasing funnel => positive deltas; median is bracketed
    t.values.foreach { r =>
      val (mn, med, mx) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(mn > 0 && mn <= med && med <= mx)
    }
    // the view->click median is an actual observed delta
    val deltas = f.filter(col("first_click").isNotNull)
      .select((unix_micros(col("first_click")) - unix_micros(col("first_view"))).as("d"))
      .collect().map(_.getLong(0)).toSet
    assert(deltas.contains(t("view_to_click").getLong(3)))
    f.unpersist()
  }

  test("session stats agree with a direct rollup of the sessionizer output") {
    val st = Analytics.qSessionStats(spark, sfDir).collect().head
    val sessions = Analytics.qSessionize(spark, sfDir).collect()
    assert(st.getLong(0) == sessions.length)
    assert(st.getLong(1) == sessions.map(_.getLong(0)).distinct.length)
    assert(st.getLong(2) == sessions.count(_.getLong(2) == 1))
    val depths = sessions.map(_.getLong(2)).sorted
    assert(st.getLong(3) == depths((depths.length - 1) / 2)) // lower median, a member
    val durs = sessions.map(_.getLong(5)).sorted
    assert(st.getLong(4) == durs((durs.length - 1) / 2))
    assert(st.getLong(5) == durs.last)
  }

  test("freshness: staleness non-negative, at least one watermark owner; skew top-10 is the true top") {
    val fr = Analytics.qFreshness(spark, sfDir).collect()
    assert(fr.forall(_.getLong(3) >= 0))
    // >= 1 zero: the watermark owner(s) — feeds CAN tie at the max ts
    assert(fr.count(_.getLong(3) == 0) >= 1)
    assert(fr.map(_.getLong(1)).sum == Tables.events(spark, sfDir).count())
    val sk = Analytics.qSkewProfile(spark, sfDir).collect()
    val trueTop = Tables.events(spark, sfDir).groupBy("user_id").count()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (k, n) => (-n, k) }.take(10)
    assert(sk.map(r => (r.getLong(0), r.getLong(1))).toSeq == trueTop.toSeq)
    assert(sk.forall(r => r.getDouble(2) > 0 && r.getDouble(2) <= 1))
  }

  test("histogram covers every event exactly once and bins bound their members") {
    val hist = Analytics.qValueHistogram(spark, sfDir)
    val total = hist.agg(sum("n")).as[Long].collect().head
    assert(total == Tables.events(spark, sfDir).count())
    assert(hist.filter(col("bin") < 0 || col("bin") > 19).count() == 0)
  }

  test("winsorized values are clipped into [p05, p95] and untouched inside the band") {
    val df = Analytics.qWinsorize(spark, sfDir).cache()
    assert(df.filter(col("winsorized") < col("p05") || col("winsorized") > col("p95")).count() == 0)
    assert(df.filter(col("value").between(col("p05"), col("p95")) &&
      col("winsorized") =!= col("value")).count() == 0)
    df.unpersist()
  }

  test("time-RANGE rolling window agrees with the range-join form on count semantics") {
    // qRangeJoin counts STRICTLY-prior events in (t-24h, t); the RANGE
    // frame counts [t-24h, t] INCLUDING self and same-μs peers. On
    // unique (user_id, ts) pairs: window count = join count + 1.
    val win = Analytics.qRollingTime(spark, sfDir)
      .select(col("event_id"), col("n_24h"))
    val join = graft.ops.Acquisition.qRangeJoin(spark, sfDir)
      .select(col("event_id"), (col("n_prior") + 1).as("n_24h"))
    val tsUnique = Tables.events(spark, sfDir)
      .groupBy("user_id", "ts").count().filter(col("count") > 1).count() == 0
    assume(tsUnique) // precondition for the +1 equivalence
    assert(win.exceptAll(join).count() == 0 && join.exceptAll(win).count() == 0)
  }

  test("full outer join covers both key sets exactly once, zero-filled") {
    val out = Analytics.qFullOuter(spark, sfDir).cache()
    val oKeys = Tables.orders(spark, sfDir).select(col("o_custkey")).distinct()
    val eKeys = Tables.events(spark, sfDir).select(col("user_id")).distinct()
    val union = oKeys.withColumnRenamed("o_custkey", "join_key")
      .union(eKeys.withColumnRenamed("user_id", "join_key")).distinct()
    assert(out.count() == union.count())
    assert(out.filter(col("n_orders") === 0 && col("n_events") === 0).count() == 0)
    // order-only keys and event-only keys both survive
    assert(out.filter(col("n_events") === 0).count() ==
      oKeys.exceptAll(eKeys.withColumnRenamed("user_id", "o_custkey")).count())
    out.unpersist()
  }

  test("zscore outliers flag exactly the tails: |z| > 2.5, consistent with stddev_samp within tolerance") {
    val flagged = Analytics.qZscoreOutliers(spark, sfDir).cache()
    assert(flagged.filter(abs(col("z")) <= 2.5).count() == 0)
    // cross-check against Spark's built-in stats (different summation
    // order → tiny double drift; compare with a guard band)
    val ref = Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(avg("value").as("rmean"), stddev_samp("value").as("rstd"))
    val strict = Tables.events(spark, sfDir).join(ref, "event_type")
      .withColumn("rz", (col("value") - col("rmean")) / col("rstd"))
    val mustFlag = strict.filter(abs(col("rz")) > 2.51).count()
    val mayFlag = strict.filter(abs(col("rz")) > 2.49).count()
    val n = flagged.count()
    assert(n >= mustFlag && n <= mayFlag)
    flagged.unpersist()
  }

  test("scd2 versions tile each user's timeline: valid_to = next valid_from, one open version per user") {
    val df = Analytics.qScd2(spark, sfDir).cache()
    assert(df.filter(col("is_current")).groupBy("user_id").count()
      .filter(col("count") =!= 1).count() == 0)
    // non-current versions end exactly where the next begins
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("version")
    val gaps = df.withColumn("next_from", lead(col("valid_from"), 1).over(w))
      .filter(col("valid_to").isNotNull && col("valid_to") =!= col("next_from"))
    assert(gaps.count() == 0)
    df.unpersist()
  }

  test("event transitions conserve: totals equal events minus one per active user; one user recomputed") {
    val out = Analytics.qEventTransitions(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val ev = Tables.events(spark, sfDir)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
    val byUser = ev.groupBy(_._1)
    // each user with k events contributes exactly k-1 transitions
    assert(out.values.sum == byUser.values.map(v => (v.length - 1).toLong).sum)
    // one user's chain recomputed
    val (_, rows) = byUser.maxBy(_._2.length)
    val chain = rows.sortBy(r => (r._2.getTime, r._3)).map(_._4)
    val expected = chain.zip(chain.tail).groupBy(identity)
      .map { case (k, v) => k -> v.length.toLong }
    expected.foreach { case (pair, n) =>
      assert(out(pair) >= n, s"transition $pair: global ${out.get(pair)} < user's $n")
    }
  }

  test("retention: day-0 row counts every cohort member; actives never exceed cohort size") {
    val out = Analytics.qRetention(spark, sfDir).collect()
      .map(r => (r.getTimestamp(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(out.nonEmpty)
    val firstDays = Tables.events(spark, sfDir)
      .groupBy("user_id").agg(min(date_trunc("day", col("ts"))).as("c"))
      .collect().map(r => r.getTimestamp(1))
    val cohortSizes = firstDays.groupBy(identity).view.mapValues(_.length.toLong).toMap
    // day 0: everyone in the cohort is active by definition
    cohortSizes.foreach { case (day, size) =>
      assert(out((day, 0)) == size, s"cohort $day day-0 ${out.get((day, 0))} != $size")
    }
    // no (cohort, k) cell exceeds its cohort's size
    out.foreach { case ((day, _), n) => assert(n <= cohortSizes(day)) }
  }

  test("daily anomaly: flagged set equals a direct 2-sigma recompute over day counts") {
    val daily = Tables.events(spark, sfDir)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getTimestamp(0) -> r.getLong(1))
    val n = daily.length.toDouble
    val mean = daily.map(_._2).sum / n
    val variance = daily.map(d => d._2.toDouble * d._2).sum / n - mean * mean
    val expected = daily.filter { case (_, c) =>
      (c - mean) * (c - mean) > 4.0 * variance
    }.map(_._1).toSet
    val got = Analytics.qDailyAnomaly(spark, sfDir).collect()
      .map(_.getTimestamp(0)).toSet
    assert(got == expected)
    // degenerate guard: with uniform synthetic volumes the set may be
    // empty — the spec still pins the exact boundary arithmetic
    if (expected.isEmpty) assert(got.isEmpty)
  }

  test("sessionize: sessions partition each user's events at >30 min gaps exactly") {
    val df = Analytics.qSessionize(spark, sfDir).cache()
    // conservation: session event counts sum to the events table
    val total = Tables.events(spark, sfDir).count()
    assert(df.agg(sum("n_events")).first().getLong(0) == total)
    // session ids are dense ordinals from 1 per user
    df.collect().groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val ids = rows.map(_.getLong(1)).sorted
      assert(ids.head == 1L && ids.last == ids.length.toLong)
    }
    // consecutive sessions of a user are separated by more than 30 min
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("session_id")
    val tooClose = df
      .withColumn("prev_end", lag(unix_micros(col("end_ts")), 1).over(w))
      .filter(col("prev_end").isNotNull &&
        unix_micros(col("start_ts")) - col("prev_end") <= 1800000000L)
    assert(tooClose.count() == 0)
    // one user's sessions recomputed from the raw event stream
    val first = Tables.events(spark, sfDir).select("user_id").orderBy("user_id").first().getLong(0)
    val evs = Tables.events(spark, sfDir).filter(col("user_id") === first)
      .select(unix_micros(col("ts")).as("us"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    // count events per session split at >30 min gaps
    var counts = List(1)
    evs.sliding(2).foreach {
      case Array((a, _), (b, _)) =>
        if (b - a > 1800000000L) counts = 1 :: counts
        else counts = (counts.head + 1) :: counts.tail
      case _ =>
    }
    val got = df.filter(col("user_id") === first).orderBy("session_id")
      .collect().map(_.getLong(2)).toList
    assert(got == counts.reverse, s"user $first: engine $got vs recompute ${counts.reverse}")
    df.unpersist()
  }

  test("rfm: segments partition the customer base and buckets stay in 1..4") {
    val sf01 = "/root/testdata/sf0.01"
    val rows = graft.ops.Analytics.qRfm(spark, sf01).collect()
    spark.catalog.clearCache()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getString(0).matches("R[1-4]F[1-4]M[1-4]"),
      s"bad segment label ${r.getString(0)}"))
    val nCust = Tables.orders(spark, sf01).select("o_custkey").distinct().count()
    assert(rows.map(_.getLong(1)).sum == nCust,
      "segments do not partition the customer base")
    // quartile thresholds really do quarter each axis (±ties): every
    // single-axis bucket holds between 5% and 60% of customers
    for (axis <- 0 to 2) {
      val byBucket = rows.groupBy(_.getString(0).charAt(2 * axis + 1))
        .view.mapValues(_.map(_.getLong(1)).sum)
      byBucket.foreach { case (b, n) =>
        val share = n.toDouble / nCust
        assert(share > 0.05 && share < 0.6,
          s"axis $axis bucket $b holds ${share * 100}% of customers")
      }
    }
  }

  test("attribution: every purchase credits the carried-forward last touch") {
    val rows = graft.ops.Analytics.qAttribution(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val ev = Tables.events(spark, sfDir)
      .select("user_id", "ts", "event_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3), r.getDouble(4)))
    val credits = scala.collection.mutable.Map[String, (Long, BigDecimal)]()
    ev.groupBy(_._1).foreach { case (_, rs) =>
      var touch: Option[String] = None
      rs.sortBy(r => (r._2.getTime, r._3)).foreach { r =>
        if (r._4 == "purchase") {
          val ch = touch.getOrElse("direct")
          val (n, v) = credits.getOrElse(ch, (0L, BigDecimal(0)))
          credits(ch) = (n + 1,
            v + BigDecimal(r._5).setScale(6, BigDecimal.RoundingMode.HALF_UP))
        } else touch = Some(r._4)
      }
    }
    assert(rows.keySet == credits.keySet)
    credits.foreach { case (ch, (n, v)) =>
      assert(rows(ch)._1 == n, s"channel $ch purchase count")
      assert(math.abs(rows(ch)._2 - v.toDouble) < 1e-6, s"channel $ch revenue")
    }
    // total credited purchases = total purchase events (conservation)
    assert(rows.values.map(_._1).sum == ev.count(_._4 == "purchase"))
  }

  test("seasonal profile: cells conserve the type totals and shares sum within floor loss") {
    val rows = graft.ops.Analytics.qSeasonalProfile(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    spark.catalog.clearCache()
    assert(rows.forall(r => r._2 >= 0 && r._2 <= 6 && r._3 >= 0 && r._3 <= 23))
    val byType = rows.groupBy(_._1)
    val eventCounts = Tables.events(spark, sfDir).groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    byType.foreach { case (tpe, cells) =>
      assert(cells.map(_._4).sum == eventCounts(tpe), s"$tpe cell counts")
      val s = cells.map(_._5).sum
      assert(s <= 1000000L && s > 1000000L - cells.length, s"$tpe shares sum to $s")
    }
  }

  test("pareto: deciles partition customers and shares sum to one within floor loss") {
    val sf01 = "/root/testdata/sf0.01"
    val rows = graft.ops.Analytics.qPareto(spark, sf01).collect()
    spark.catalog.clearCache()
    assert(rows.map(_.getInt(0)).toSet.subsetOf((1 to 10).toSet))
    val nCust = Tables.orders(spark, sf01).select("o_custkey").distinct().count()
    assert(rows.map(_.getLong(1)).sum == nCust)
    val shares = rows.map(_.getLong(3))
    // ten floor divisions each lose < 1 ppm
    assert(shares.sum <= 1000000L && shares.sum > 1000000L - 10,
      s"shares sum to ${shares.sum}")
    // concentration: the top decile out-earns the bottom one
    assert(rows.maxBy(_.getInt(0)).getLong(3) > rows.minBy(_.getInt(0)).getLong(3))
  }

  test("activity bitmap: bits are exactly the user's active days in the window") {
    val rows = graft.ops.Analytics.qActivityBitmap(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), to_date(col("ts")).as("day")).collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val refDay = ev.map(_._2).maxBy(_.toEpochDay)
    val expect = ev.groupBy(_._1).view.mapValues { rs =>
      rs.map(r => refDay.toEpochDay - r._2.toEpochDay).filter(_ < 64).toSet
    }.toMap.filter(_._2.nonEmpty)
    assert(rows.keySet == expect.keySet)
    expect.foreach { case (u, days) =>
      val (bitmap, nActive, today) = rows(u)
      assert(bitmap == days.map(i => 1L << i).reduce(_ | _), s"user $u bitmap")
      assert(nActive == days.size.toLong, s"user $u popcount")
      assert(today == (if (days.contains(0L)) 1L else 0L), s"user $u today flag")
    }
  }

  test("changepoint: cusum peak matches a scalar replay and the series telescopes to zero") {
    val rows = graft.ops.Analytics.qChangepoint(spark, sfDir).collect()
    spark.catalog.clearCache()
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getDate(1), r.getLong(2)))
    daily.groupBy(_._1).foreach { case (tpe, ds) =>
      val series = ds.sortBy(_._2.toString)
      val total = series.map(_._3).sum
      val nDays = series.length.toLong
      var s = 0L
      var best = (0L, "")
      series.foreach { case (_, day, n) =>
        s += n * nDays - total
        if (math.abs(s) > best._1) best = (math.abs(s), day.toString)
      }
      assert(s == 0L, s"$tpe: scaled deviations must telescope to zero, got $s")
      val got = rows.find(_.getString(0) == tpe).get
      assert(got.getDate(1).toString == best._2 && got.getLong(2) == best._1,
        s"$tpe: engine (${got.getDate(1)}, ${got.getLong(2)}) vs replay $best")
      assert(got.getLong(3) == nDays && got.getLong(4) == total)
    }
  }

  test("autocorr: moment sums match a scalar replay of the calendar-lagged pairs") {
    val rows = Analytics.qAutocorr(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))))
      .toMap
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), expr("unix_micros(date_trunc('day', ts))").as("d"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
    val expected = for {
      lag <- Seq(1L, 7L)
      ((et, d), x) <- daily.toSeq
      y <- daily.get((et, d + lag * 86400000000L))
    } yield ((et, lag), (x, y))
    val replay = expected.groupBy(_._1).map { case (k, vs) =>
      val xs = vs.map(_._2._1); val ys = vs.map(_._2._2)
      k -> (vs.size.toLong, xs.sum, ys.sum,
        xs.map(v => v * v).sum, ys.map(v => v * v).sum,
        vs.map { case (_, (x, y)) => x * y }.sum)
    }
    assert(rows == replay)
    // weekly alignment must produce strictly fewer pairs than daily
    replay.keys.map(_._1).toSeq.distinct.foreach { et =>
      assert(rows((et, 7L))._1 < rows((et, 1L))._1)
    }
  }

  test("skyline: frontier-walk plan equals brute-force dominance on random 2-D points") {
    // 400 seeded random points in few distinct x values (forces the
    // equal-price tie paths and duplicate points) across 3 groups.
    val rnd = new scala.util.Random(7)
    val pts = (1L to 400L).map(i =>
      (s"g${rnd.nextInt(3)}", i, rnd.nextInt(12), (rnd.nextInt(9) * 25).toDouble))
    val df = pts.toDF("p_brand", "p_partkey", "p_size", "p_retailprice")
    val got = graft.ops.Analytics.skylineOf(df).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val want = pts.filter { case (g, _, sz, pr) =>
      !pts.exists { case (g2, _, sz2, pr2) =>
        g2 == g && pr2 <= pr && sz2 >= sz && (pr2 < pr || sz2 > sz)
      }
    }.map(p => (p._1, p._2)).toSet
    assert(got == want)
    assert(want.nonEmpty)
  }

  test("gap fill: scalar interpolation replay for one type; obs cells exact; grid complete") {
    val out = graft.ops.TimeWindows.qGapFill(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val dayUs = 86400000000L
    // full calendar grid per type
    val days = out.map(_._2).distinct.sorted
    assert(days.zip(days.tail).forall { case (a, b) => b - a == dayUs })
    val types = out.map(_._1).distinct
    assert(out.length == types.length * days.length)
    // scalar replay for one event type
    val t0 = types.min
    val daily = Tables.events(spark, sfDir)
      .filter(col("event_type") === t0)
      .select(unix_micros(date_trunc("DAY", col("ts"))).as("d"))
      .groupBy("d").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val d0 = days.head
    val obs = daily.filter { case (d, _) => ((d - d0) / dayUs) % 3 == 0 }
    val expect = days.map { d =>
      val di = (d - d0) / dayUs
      if (obs.contains(d)) (d, obs(d), "obs")
      else {
        val prev = obs.keys.filter(_ < d)
        val next = obs.keys.filter(_ > d)
        if (prev.isEmpty) (d, obs(next.min), "edge")
        else if (next.isEmpty) (d, obs(prev.max), "edge")
        else {
          val (pd, nd) = (prev.max, next.min)
          val (pdi, ndi) = ((pd - d0) / dayUs, (nd - d0) / dayUs)
          val v = (obs(pd) * (ndi - di) + obs(nd) * (di - pdi)) / (ndi - pdi)
          (d, v, "interp")
        }
      }
    }
    val got = out.filter(_._1 == t0).map(r => (r._2, r._3, r._4)).toSeq
    assert(got == expect.toSeq, s"got $got\nwant $expect")
    // every source kind occurs
    assert(Set("obs", "interp", "edge").subsetOf(out.map(_._4).toSet))
  }

  test("throttle: secondary-sort scan equals the sequential greedy replay per user") {
    val out = graft.ops.TimeWindows.qThrottleEvents(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val gap = 3600L * 1000000L
    val evs = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = evs.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      var lastKept = Long.MinValue
      rows.sortBy(r => (r._3, r._2)).flatMap { case (u, id, us) =>
        if (lastKept == Long.MinValue || us >= lastKept + gap) {
          lastKept = us; Some((u, id))
        } else None
      }
    }.toSet
    assert(out.toSet == want)
    // the throttle must actually drop something AND keep every user
    assert(out.length < evs.length)
    assert(out.map(_._1).distinct.length == evs.map(_._1).distinct.length)
  }

  test("ab test: arm moments replay from a per-user scan; arms partition the users") {
    val r = Analytics.qAbTest(spark, sfDir).collect().head
    val evs = Tables.events(spark, sfDir).select("user_id", "event_type").collect()
      .map(x => (x.getLong(0), x.getString(1)))
    val byUser = evs.groupBy(_._1).view
      .mapValues(_.exists(_._2 == "purchase")).toMap
    val (a, b) = byUser.partition(_._1 % 2 == 0)
    assert(r.getLong(0) == a.size.toLong && r.getLong(2) == b.size.toLong)
    assert(r.getLong(1) == a.count(_._2).toLong && r.getLong(3) == b.count(_._2).toLong)
    assert(r.getLong(0) + r.getLong(2) == byUser.size.toLong)
    assert(r.getLong(4) == 1000000L * r.getLong(1) / r.getLong(0))
    assert(r.getLong(5) == 1000000L * r.getLong(3) / r.getLong(2))
    assert(r.getLong(6) == r.getLong(4) - r.getLong(5))
  }

  test("movers: top-10 absolute swings match a full-ranking replay; deltas reconcile") {
    val rows = Analytics.qMovers(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.length == 10)
    rows.foreach { case (_, a, b, d) => assert(math.abs(d - (b - a)) < 1e-9) }
    // the |delta| ordering is non-increasing with brand tie-break
    val keys = rows.map { case (br, _, _, d) => (-math.abs(d), br) }
    assert(keys.sameElements(keys.sorted))
    // boundary check vs the unlimited ranking
    val all = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("2000-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("2002-01-01").cast("timestamp"))
      .join(Tables.part(spark, sfDir), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(
        sum(when(year(col("l_shipdate")) === 2000,
          col("l_extendedprice").cast("decimal(18,6)") *
            (lit(1).cast("decimal(18,6)") - col("l_discount").cast("decimal(18,6)")))
          .otherwise(lit(0).cast("decimal(18,6)"))).as("a"),
        sum(when(year(col("l_shipdate")) === 2001,
          col("l_extendedprice").cast("decimal(18,6)") *
            (lit(1).cast("decimal(18,6)") - col("l_discount").cast("decimal(18,6)")))
          .otherwise(lit(0).cast("decimal(18,6)"))).as("b"))
      .select(col("p_brand"), (col("b") - col("a")).cast("double").as("d"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val expectTop = all.sortBy { case (br, d) => (-math.abs(d), br) }.take(10).map(_._1)
    assert(rows.map(_._1).sameElements(expectTop))
  }

  test("cumulative users: running total is monotone and ends at the distinct-user count") {
    val rows = Analytics.qCumulativeUsers(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).sameElements(rows.map(_._1).sorted))
    // cumulative = prefix sum of new
    rows.foldLeft(0L) { case (acc, (_, n, cum)) =>
      assert(cum == acc + n); cum }
    assert(rows.last._3 ==
      Tables.events(spark, sfDir).select("user_id").distinct().count())
  }

  test("TWAP: one user-day replays in BigDecimal; held time never exceeds the day") {
    val rows = Analytics.qTwap(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, n, held, _) =>
      assert(n > 0 && held >= 0 && held <= 86400L) }
    // replay the densest user-day scalar-side
    val (user, day, n, held, ws) = rows.maxBy(_._3)
    val evs = Tables.events(spark, sfDir)
      .filter(col("user_id") === user &&
        expr("unix_micros(date_trunc('day', ts))") === day)
      .select(col("event_id"), col("value"), expr("unix_micros(ts)"))
      .as[(Long, Double, Long)].collect()
      .sortBy(e => (e._3, e._1))
    assert(n == evs.length)
    val durs = evs.zipWithIndex.map { case ((_, _, us), i) =>
      val next = if (i + 1 < evs.length) evs(i + 1)._3 else day + 86400000000L
      (next - us) / 1000000L }
    assert(held == durs.sum)
    val expect = evs.zip(durs).map { case ((_, v, _), dur) =>
      BigDecimal(v).setScale(6) * BigDecimal(dur) }.sum
    assert(BigDecimal(ws) == expect)
  }

  test("drift bins: period masses conserve; one bin replays; shares bounded") {
    val rows = Analytics.qDriftBins(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.forall(r => r._1 >= 0 && r._1 <= 9))
    val evs = Tables.events(spark, sfDir)
      .select(col("value"), col("ts").cast("string")).collect()
      .map(r => (r.getDouble(0), r.getString(1)))
    assert(rows.map(r => r._2 + r._3).sum == evs.length)
    val shareSumA = rows.map(_._4).sum
    assert(shareSumA <= 1000000L && 1000000L - shareSumA < rows.length)
    // one bin replayed
    val (bin, na, nb, _, _) = rows.head
    val inBin = evs.filter { case (v, _) =>
      math.min(math.max(math.floor(v / 50.0).toLong, 0L), 9L) == bin }
    val after = inBin.count(_._2 >= "2024-01-16")
    assert(na == inBin.length - after && nb == after)
  }

  test("sole-fault suppliers: the double correlation replays from a per-order scan") {
    val rows = graft.ops.Relational.qTpchSoleFault(spark, sfDir)
      .as[(Long, Long)].collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val lines = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_suppkey", "l_returnflag")
      .as[(Long, Long, String)].collect()
    val perOrder = lines.groupBy(_._1).view.mapValues { ls =>
      val bySupp = ls.groupBy(_._2).view
        .mapValues(_.exists(_._3 == "R")).toMap
      (bySupp.size, bySupp.count(_._2), bySupp.find(_._2).map(_._1))
    }.toMap
    val waits = perOrder.values
      .collect { case (n, f, Some(s)) if n > 1 && f == 1 => s }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expect = waits.toSeq.sortBy { case (s, w) => (-w, s) }.take(10)
    assert(rows.toSeq == expect)
  }

  test("cross-correlation: every lag's moment sums replay from the daily series") {
    val rows = Analytics.qCrossCorr(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.map(_._1).toSet == (-3L to 3L).toSet)
    // independent daily-count replay
    val daily = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("click", "purchase"))
      .groupBy(col("event_type"), expr("unix_micros(date_trunc('day', ts))").as("d"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
    val clicks = daily.collect { case (("click", d), n) => d -> n }
    val buys = daily.collect { case (("purchase", d), n) => d -> n }
    rows.foreach { case (lag, nd, sx, sy, sxx, syy, sxy) =>
      val pairs = clicks.toSeq.flatMap { case (d, x) =>
        buys.get(d + lag * 86400000000L).map(y => (x, y)) }
      assert(nd == pairs.length)
      assert(sx == pairs.map(_._1).sum && sy == pairs.map(_._2).sum)
      assert(sxx == pairs.map(p => p._1 * p._1).sum &&
        syy == pairs.map(p => p._2 * p._2).sum &&
        sxy == pairs.map(p => p._1 * p._2).sum)
    }
    spark.catalog.clearCache()
  }

  test("decayed trend: integer decay replays scala; full retention iff all mass on watermark day") {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), to_date(col("ts")).as("day"), col("value")).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getDouble(2)))
    val wm = ev.map(_._2).maxBy(_.toEpochDay)
    val got = Analytics.qDecayedTrend(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.map(_._1).toSet == ev.map(_._1).toSet)
    // ordered by decayed mass descending
    assert(got.map(_._4).toSeq == got.map(_._4).sortBy(-_).toSeq)
    got.foreach { case (t, n, raw, decayed, retained) =>
      val rows = ev.filter(_._1 == t)
      assert(n == rows.length)
      val ref = rows.map { case (_, day, v) =>
        val k = wm.toEpochDay - day.toEpochDay
        val w = math.floor(math.pow(2.0, -k / 7.0) * 1000000).toLong
        (math.floor(v * 1000).toLong, w)
      }
      assert(raw == ref.map(_._1).sum)
      assert(decayed == ref.map(p => p._1 * p._2).sum)
      assert(retained == decayed / math.max(raw, 1L))
      assert(retained <= 1000000L) // decay never amplifies
    }
  }

  test("return hazard: buckets partition the consecutive-gap multiset; survival telescopes") {
    val got = Analytics.qReturnHazard(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty && got.map(_._1).toSeq == got.map(_._1).sorted.toSeq)
    // survivors telescope: s_d = n_d + s_{d+1}; last bucket ends the chain
    got.zip(got.tail).foreach { case ((_, n, s, _), (_, _, s2, _)) => assert(s == n + s2) }
    assert(got.last._2 == got.last._3)
    got.foreach { case (_, n, s, h) => assert(h == n * 1000000L / s && h <= 1000000L) }
    // total gaps = events minus one per active user
    val ev = Tables.events(spark, sfDir).select("user_id").collect().map(_.getLong(0))
    assert(got.map(_._2).sum == ev.length - ev.distinct.length)
  }

  test("daily close: carry-forward replays per user; carried rows repeat the prior close") {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), to_date(col("ts")).as("day"), col("ts"), col("event_id"),
        col("value")).collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate,
        (r.getTimestamp(2).getTime, r.getLong(3)), r.getDouble(4)))
    val days = ev.map(_._2).distinct.sortBy(_.toEpochDay)
    val got = Analytics.qDailyClose(spark, sfDir).collect()
      .map(r => ((r.getLong(0), r.getDate(1).toLocalDate), (r.getLong(2), r.getBoolean(3))))
      .toMap
    val byUser = ev.groupBy(_._1)
    byUser.foreach { case (u, rows) =>
      val lastPerDay = rows.groupBy(_._2).view
        .mapValues(rs => rs.maxBy(r => r._3)._4).toMap
      val firstDay = rows.map(_._2).minBy(_.toEpochDay)
      var carried = Option.empty[Double]
      days.foreach { d =>
        if (d.isBefore(firstDay)) assert(!got.contains((u, d)))
        else {
          val fresh = lastPerDay.get(d)
          val expected = fresh.orElse(carried).get
          carried = Some(expected)
          val (milli, isCarried) = got((u, d))
          assert(milli == math.floor(expected * 1000).toLong)
          assert(isCarried == fresh.isEmpty)
        }
      }
    }
    assert(got.values.exists(_._2)) // carry-forward actually fires somewhere
  }

  test("user entropy: per-user shannon replay; single-type users sit at exactly zero") {
    val ev = Tables.events(spark, sfDir).select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val got = Analytics.qUserEntropy(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
    assert(got.length == ev.map(_._1).distinct.length)
    got.foreach { case (u, n, k, h, topPpm) =>
      val cs = ev.filter(_._1 == u).groupBy(_._2).values.map(_.size.toLong).toSeq
      assert(n == cs.sum && k == cs.length)
      assert(topPpm == cs.max * 1000000L / n)
      val ref = -cs.map { c =>
        BigDecimal((c.toDouble / n) * math.log(c.toDouble / n))
          .setScale(12, BigDecimal.RoundingMode.HALF_UP)
      }.sum.toDouble
      assert(math.abs(h - ref) < 1e-9)
      if (k == 1) assert(h == 0.0)
      assert(h <= math.log(k.toDouble) + 1e-9) // bounded by ln k
    }
  }

  test("psi drift: per-type smoothed PSI replays scala and is non-negative") {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"),
        expr("least(greatest(CAST(floor(value / 50.0) AS BIGINT), 0L), 9L)").as("bin"),
        (col("ts") >= lit("2024-01-16").cast("timestamp")).as("b")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    val got = Analytics.qPsiDrift(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.map(_._1).toSet == ev.map(_._1).toSet)
    got.foreach { case (t, ta, tb, psi) =>
      val rows = ev.filter(_._1 == t)
      assert(ta == rows.count(!_._3) && tb == rows.count(_._3))
      val ref = rows.map(_._2).distinct.map { bin =>
        val na = rows.count(r => r._2 == bin && !r._3).toLong
        val nb = rows.count(r => r._2 == bin && r._3).toLong
        val pa = (na + 1).toDouble / (ta + 10)
        val pb = (nb + 1).toDouble / (tb + 10)
        (pb - pa) * math.log(((nb + 1) * (ta + 10)).toDouble / ((tb + 10) * (na + 1)))
      }.sum
      assert(math.abs(psi - ref) < 1e-9 && psi >= -1e-9)
    }
  }

  test("cohort ltv: cumulative telescopes per cohort; week-0 users equal cohort size") {
    val got = Analytics.qCohortLtv(spark, sfDir).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5), r.getLong(6)))
    assert(got.nonEmpty)
    got.groupBy(_._1).values.foreach { rs =>
      val sorted = rs.sortBy(_._2)
      // week 0 exists and its active users equal the cohort size
      assert(sorted.head._2 == 0L && sorted.head._4 == sorted.head._3)
      // cumulative milli never decreases and ltv divides by the FIXED size
      sorted.zip(sorted.tail).foreach { case (a, b) => assert(b._6 >= a._6) }
      sorted.foreach(r => assert(r._7 == r._6 / r._3 && r._4 <= r._3))
    }
    // cohort sizes partition the user base
    val users = Tables.events(spark, sfDir).select("user_id").distinct().count()
    assert(got.groupBy(_._1).values.map(_.head._3).sum == users)
  }

  test("path trigrams: counts replay the per-user ordered sequences; top-20 by count then path") {
    val ev = Tables.events(spark, sfDir)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2), r.getString(3)))
    val ref = ev.groupBy(_._1).values.flatMap { rows =>
      val seq = rows.sortBy(r => (r._2, r._3)).map(_._4)
      seq.sliding(3).filter(_.length == 3).map(_.mkString(">"))
    }.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val total = ref.values.sum
    val expected = ref.toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
    val got = Analytics.qPathTrigrams(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.map(g => (g._1, g._2)).toSeq == expected)
    got.foreach { case (_, n, ppm) => assert(ppm == n * 1000000L / total) }
  }

  test("wau stickiness: windows nest (dau ≤ wau ≤ mau); singleton-day replays exactly") {
    val ud = Tables.events(spark, sfDir)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct().collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val days = ud.map(_._2).distinct
    val got = Analytics.qWauStickiness(spark, sfDir).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.length == days.length)
    got.foreach { case (d, dau, wau, mau, dwPpm, wmPpm) =>
      val dauRef = ud.count(_._2 == d).toLong
      val wauRef = ud.filter(p => { val k = d.toEpochDay - p._2.toEpochDay; k >= 0 && k <= 6 })
        .map(_._1).distinct.length.toLong
      val mauRef = ud.filter(p => { val k = d.toEpochDay - p._2.toEpochDay; k >= 0 && k <= 27 })
        .map(_._1).distinct.length.toLong
      assert(dau == dauRef && wau == wauRef && mau == mauRef)
      assert(dau <= wau && wau <= mau)
      assert(dwPpm == dau * 1000000L / wau && wmPpm == wau * 1000000L / mau)
    }
    spark.catalog.clearCache()
  }

  test("spearman: one row per event type, rho in [-1,1], one type replayed from driver-side ranks") {
    val out = Analytics.qSpearman(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) Double.NaN else r.getDouble(2)))
    val types = Tables.events(spark, sfDir).groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.map(_._1).toSet == types.keySet)
    out.foreach { case (t, n, rho) =>
      assert(n == types(t), t)
      assert(rho.isNaN || (rho >= -1.0 && rho <= 1.0), s"$t rho=$rho")
    }
    // replay the smallest type exactly: centered doubled ranks on the driver
    val t0 = types.minBy(_._2)._1
    val rows = Tables.events(spark, sfDir).filter(col("event_type") === t0)
      .select(col("value"), length(col("props")).cast("long"))
      .collect().map(r => (r.getDouble(0), r.getLong(1)))
    def cranks[A: Ordering](xs: Seq[A]): Seq[Long] = {
      val n = xs.length.toLong
      val minRank = xs.map(v => xs.count(implicitly[Ordering[A]].lt(_, v)) + 1L)
      val ties = xs.map(v => xs.count(_ == v).toLong)
      minRank.zip(ties).map { case (r, c) => 2 * r + c - 1 - (n + 1) }
    }
    val cx = cranks(rows.map(_._1).toSeq); val cy = cranks(rows.map(_._2).toSeq)
    val sxy = cx.zip(cy).map { case (a, b) => a * b }.sum
    val sxx = cx.map(a => a * a).sum; val syy = cy.map(a => a * a).sum
    val want = BigDecimal(sxy.toDouble / (math.sqrt(sxx.toDouble) * math.sqrt(syy.toDouble)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = out.find(_._1 == t0).get._3
    assert(math.abs(got - want) < 1e-9, s"$t0: $got vs $want")
  }
}
