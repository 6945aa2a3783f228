package graft

import org.apache.spark.sql.functions._

import graft.ops.{Analytics, Quality, Relational}

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("pricing summary: ship-date filter reaches the parquet scan (PushedFilters)") {
    val plan = Relational.qTpchPricing(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("l_shipdate"))
  }

  test("pricing summary: discounting never increases revenue, groups partition the filtered fact") {
    val df = Relational.qTpchPricing(spark, sfDir).cache()
    assert(df.filter(col("sum_disc_price") > col("sum_base")).count() == 0)
    val total = df.agg(sum("n_rows")).as[Long].head()
    val expected = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp")).count()
    assert(total == expected)
    df.unpersist()
  }

  test("shipping priority: top-10 is a distributed TakeOrderedAndProject, not a global sort") {
    val plan = Relational.qTpchShipping(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("shipping priority: exactly 10 rows in strictly ordered (revenue desc, date, key) position") {
    val rows = Relational.qTpchShipping(spark, sfDir)
      .select("revenue", "o_orderkey").as[(Double, Long)].collect()
    assert(rows.length == 10)
    assert(rows.map(_._1).sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
  }

  test("local-supplier volume: dims broadcast, only ASIA nations appear") {
    val df = Relational.qTpchVolume(spark, sfDir)
    assert(df.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    val asia = Tables.nation(spark, sfDir)
      .join(Tables.region(spark, sfDir).filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_name").as[String].collect().toSet
    assert(df.select("n_name").as[String].collect().forall(asia))
  }

  test("corr is bounded by [-1, 1] and shares its sign with covar") {
    val df = Analytics.qCorrGroup(spark, sfDir)
      .select("covar_samp", "corr").as[(Double, Double)].collect()
    assert(df.nonEmpty)
    assert(df.forall { case (_, c) => c >= -1.0 && c <= 1.0 })
    assert(df.forall { case (cv, c) => cv == 0 || c == 0 || (cv > 0) == (c > 0) })
  }

  test("corr of a column with itself is exactly 1 through the same moment pipeline") {
    // qty vs qty through the identical decimal-moment formula
    val m = Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,6)")).cast("double").as("sx"),
        sum((col("l_quantity") * col("l_quantity")).cast("decimal(18,6)")).cast("double").as("sxx"))
      .select(round((col("sxx") - col("sx") * col("sx") / col("n")) /
        (sqrt(col("sxx") - col("sx") * col("sx") / col("n")) *
          sqrt(col("sxx") - col("sx") * col("sx") / col("n"))), 6).as("corr"))
      .as[Double].collect()
    assert(m.forall(_ == 1.0))
  }

  test("MAD outliers: every flagged row actually satisfies |value - med| > 3 * mad") {
    val df = Analytics.qMadOutliers(spark, sfDir)
    // med/mad are rounded for display; recompute exact thresholds
    val ev = Tables.events(spark, sfDir).select("event_type", "event_id", "value")
    val med = ev.groupBy("event_type").agg(expr("percentile(value, 0.5)").as("xmed"))
    val wm = ev.join(med, "event_type")
    val mad = wm.groupBy("event_type")
      .agg(expr("percentile(abs(value - xmed), 0.5)").as("xmad"))
    val flagged = wm.join(mad, "event_type")
      .filter(abs(col("value") - col("xmed")) > lit(3) * col("xmad"))
      .select("event_id").as[Long].collect().toSet
    val got = df.select("event_id").as[Long].collect().toSet
    assert(got == flagged)
  }

  test("MAD is robust where z-score is not: flag sets differ yet agree on extreme tails") {
    val zs = Analytics.qZscoreOutliers(spark, sfDir).select("event_id").as[Long].collect().toSet
    val md = Analytics.qMadOutliers(spark, sfDir).select("event_id").as[Long].collect().toSet
    assert(md.nonEmpty)
    // not vacuously identical pipelines
    assert(zs != md || zs.isEmpty)
  }

  test("user journey: segment count matches event count and order follows event time") {
    val j = Analytics.qUserJourney(spark, sfDir).cache()
    // journey length agrees with the count aggregate
    assert(j.filter(size(split(col("journey"), ">")) =!= col("n_events")).count() == 0)
    // recompute one user's path directly from the ordered event stream
    val uid = j.select(min("user_id")).first().getLong(0)
    val expected = Tables.events(spark, sfDir)
      .filter(col("user_id") === uid)
      .orderBy(col("ts"), col("event_id"))
      .select("event_type").as[String].collect().mkString(">")
    assert(j.filter(col("user_id") === uid).select("journey").as[String].head() == expected)
    j.unpersist()
  }

  test("entropy: bounded by ln(distinct chars); exact Scala recompute of one document matches") {
    val df = Quality.qEntropy(spark, sfDir).cache()
    assert(df.filter(col("entropy") < -1e-12).count() == 0)
    assert(df.filter(col("entropy") > log(col("n_distinct_chars").cast("double")) + lit(1e-9)).count() == 0)
    val (docId, nChars, ent) = df.select("doc_id", "n_chars", "entropy")
      .as[(Long, Long, Double)].head()
    val text = Tables.documents(spark, sfDir)
      .filter(col("doc_id") === docId).select("text").as[String].head()
    val counts = text.groupBy(identity).view.mapValues(_.length.toLong)
    val sumDec = counts.values.map { c =>
      val p = c.toDouble / nChars
      BigDecimal(p * math.log(p)).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    }.sum
    assert(-(sumDec.toDouble) == ent)
    df.unpersist()
  }

  test("order latency: selected statistics replay exactly per priority") {
    import org.apache.spark.sql.functions._
    val rows = graft.ops.Relational.qOrderLatency(spark, sfDir).collect()
    val lat = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_shipdate")
      .join(Tables.orders(spark, sfDir)
        .select("o_orderkey", "o_orderdate", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"),
        datediff(col("l_shipdate").cast("date"), col("o_orderdate").cast("date"))
          .cast("long").as("lat")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    def disc(xs: Seq[Long], q: Double): Long = {
      val s = xs.sorted
      s(math.ceil(q * s.length).toInt.max(1) - 1)
    }
    rows.foreach { r =>
      val xs = lat.filter(_._1 == r.getString(0)).map(_._2).toSeq
      assert(r.getLong(1) == xs.length.toLong)
      assert(r.getLong(2) == xs.min && r.getLong(5) == xs.max)
      assert(r.getLong(3) == disc(xs, 0.5), s"${r.getString(0)} median")
      assert(r.getLong(4) == disc(xs, 0.9), s"${r.getString(0)} p90")
    }
    assert(rows.map(_.getLong(1)).sum == lat.length.toLong)
  }

  test("discount probe: all three predicates reach the scan; revenue replays in decimal") {
    import org.apache.spark.sql.functions._
    // default maxMetadataStringLength elides the PushedFilters list
    spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
    val df = graft.ops.Relational.qTpchDiscount(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    spark.conf.unset("spark.sql.maxMetadataStringLength")
    val pushed = plan.split("PushedFilters: \\[", 2)(1).split("]", 2)(0)
    for (c <- Seq("l_shipdate", "l_discount", "l_quantity"))
      assert(pushed.contains(s"GreaterThanOrEqual($c") || pushed.contains(s"LessThan($c"),
        s"$c predicate not pushed: [$pushed]")
    val row = df.collect().head
    val kept = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_discount") >= 0.03 && col("l_discount") <= 0.05 &&
        col("l_quantity") < 24)
      .select("l_extendedprice", "l_discount").collect()
    assert(row.getLong(0) == kept.length.toLong)
    val dec = kept.map(r => BigDecimal(r.getDouble(0)).setScale(6, BigDecimal.RoundingMode.HALF_UP) *
      BigDecimal(r.getDouble(1)).setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum
    assert(row.getDouble(1) == dec.toDouble)
  }

  test("returned-item report: top-20 boundary matches the unlimited ranking") {
    val top = graft.ops.Relational.qTpchReturned(spark, sfDir).collect()
    assert(top.length == 20)
    // descending revenue with the custkey tie-break
    val rev = top.map(r => (r.getDouble(4), r.getLong(0)))
    assert(rev.sameElements(rev.sortBy { case (v, k) => (-v, k) }))
    // every reported line count is against 'R' lines only
    assert(top.map(_.getLong(3)).sum > 0 && top.forall(_.getLong(3) > 0))
  }
}
