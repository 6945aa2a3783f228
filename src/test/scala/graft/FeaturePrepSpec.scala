package graft

import org.apache.spark.sql.functions._

import graft.ops.FeaturePrep

class FeaturePrepSpec extends SparkSpec {
  import spark.implicits._

  test("feature hash: term mass conserves into 2-hex-char buckets; deterministic") {
    val df = FeaturePrep.qFeatureHash(spark, sfDir).cache()
    val totalTf = df.agg(sum("tf")).as[Long].head()
    val words = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "").count()
    assert(totalTf == words) // no term lost or double-counted by bucketing
    assert(df.filter(!col("bucket").rlike("^[0-9a-f]{2}$")).count() == 0)
    // content-keyed: a re-run over a repartitioned input is identical
    val again = FeaturePrep.qFeatureHash(spark, sfDir)
    assert(df.except(again).count() == 0 && again.except(df).count() == 0)
    df.unpersist()
  }

  test("one-hot: exactly one indicator fires per row; plan is shuffle-free") {
    val df = FeaturePrep.qOnehot(spark, sfDir)
    val segCols = df.columns.filter(_.startsWith("seg_"))
    assert(segCols.length == 5)
    val rowSum = segCols.map(col).reduce(_ + _)
    assert(df.filter(rowSum =!= 1L).count() == 0)
    // encoding is a projection: no hash exchange anywhere in the plan
    // (the orderBy's range exchange is the output contract, not the encoder)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("hashpartitioning"), s"one-hot shuffled:\n$plan")
  }

  test("min-max norm: range lands in [0,1] with both endpoints hit per type") {
    val df = FeaturePrep.qMinmaxNorm(spark, sfDir).cache()
    assert(df.filter(col("norm_value") < 0.0 || col("norm_value") > 1.0).count() == 0)
    val ends = df.groupBy("event_type")
      .agg(min("norm_value").as("lo"), max("norm_value").as("hi"))
      .as[(String, Double, Double)].collect()
    assert(ends.nonEmpty && ends.forall { case (_, lo, hi) => lo == 0.0 && hi == 1.0 })
    df.unpersist()
  }

  test("target encode: encoding is a convex combination of segment mean and prior") {
    val rows = FeaturePrep.qTargetEncode(spark, sfDir)
      .as[(String, Long, Double, Double)].collect()
    val gs = rows.map(_._3).sum
    val gn = rows.map(_._2).sum
    val prior = gs / gn
    rows.foreach { case (_, n, s, enc) =>
      val segMean = s / n
      val (lo, hi) = (math.min(segMean, prior), math.max(segMean, prior))
      assert(enc >= lo - 1e-9 && enc <= hi + 1e-9) // smoothing shrinks toward prior
      // exact replay of the declared formula
      assert(math.abs(enc - (s + 10.0 * (gs / gn)) / (n + 10.0)) < 1e-12)
    }
  }

  test("k-fold: every fold occupied and roughly balanced; doc mass conserves") {
    val df = FeaturePrep.qKfold(spark, sfDir).cache()
    val perFold = df.groupBy("fold").agg(sum("n_docs").as("n"))
      .as[(Long, Long)].collect().toMap
    assert(perFold.keySet == Set(0L, 1L, 2L, 3L, 4L))
    val total = Tables.documents(spark, sfDir).count()
    assert(perFold.values.sum == total)
    val ideal = total.toDouble / 5
    assert(perFold.values.forall(n => n > ideal * 0.5 && n < ideal * 1.5))
    df.unpersist()
  }

  test("class weights: reweighted class masses equalize (n·w = N/k for every class)") {
    val rows = FeaturePrep.qClassWeights(spark, sfDir)
      .as[(Long, Long, Double)].collect()
    val total = rows.map(_._2).sum
    val k = rows.length
    rows.foreach { case (_, n, w) =>
      assert(math.abs(n * w - total.toDouble / k) < 1e-9)
    }
  }

  test("woe encode: log-odds replay from integer counts; zero-information iff rates equal") {
    val ev = Tables.events(spark, sfDir)
      .select(expr("CAST(dayofweek(ts) - 1 AS BIGINT)").as("dow"),
        (col("event_type") === "purchase").as("g")).collect()
      .map(r => (r.getLong(0), r.getBoolean(1)))
    val gTot = ev.count(_._2).toLong
    val bTot = ev.count(!_._2).toLong
    val got = FeaturePrep.qWoeEncode(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got.map(_._1).toSet == ev.map(_._1).toSet)
    got.foreach { case (dow, n, g, b, woe) =>
      val rows = ev.filter(_._1 == dow)
      assert(n == rows.length && g == rows.count(_._2) && b == rows.count(!_._2))
      val ref = math.log(((2 * g + 1) * bTot).toDouble / ((2 * b + 1) * gTot))
      assert(woe == ref) // identical integer operands ⇒ identical double
    }
  }

  test("pit rolling: strictly-prior 7-day frame — no event sees itself; counts replay") {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
        col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val week = 7L * 24 * 3600 * 1000000
    val byUser = ev.groupBy(_._2)
    val got = FeaturePrep.qPitRolling(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    assert(got.length == ev.length)
    val evById = ev.map(e => (e._1, e)).toMap
    got.foreach { case (eid, uid, n, sumMilli) =>
      val (_, _, us, _) = evById(eid)
      val prior = byUser(uid).filter(o => o._3 >= us - week && o._3 < us)
      assert(n == prior.length)
      val refSum = prior
        .map(o => BigDecimal(o._4).setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum
      assert(sumMilli == (refSum * 1000).setScale(0, BigDecimal.RoundingMode.FLOOR).toLong)
    }
    // the exclusive upper bound bites: at least one event has priors yet n < total user events
    assert(got.exists(g => g._3 > 0))
  }
}
