package graft

import org.apache.spark.sql.functions._

/** The 100 TB join-pruning story: when a selective dim filter feeds a
  * shuffle join, Spark can build a bloom filter from the dim's join
  * keys at runtime and push it into the fact scan — rows that cannot
  * match are dropped BEFORE the shuffle, which is the difference
  * between shuffling 100 TB and shuffling the ~1% that survives.
  * This is Catalyst's InjectRuntimeFilter rule; the engine's job is to
  * keep plans in the shape that lets it fire (selective filter on the
  * creation side, equi-join keys) — declarative plans, which every
  * graft operator already emits. The spec pins the contract: the
  * filter injects under cluster-scale thresholds, and never changes
  * results. */
class RuntimeFilterSpec extends SparkSpec {
  import spark.implicits._

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def selectiveJoin() = {
    // selective creation side: one priority of orders (~20% of rows)
    val dim = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey")
    Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_quantity")
      .join(dim, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey").agg(sum("l_quantity").as("q"))
  }

  test("bloom runtime filter injects into the fact side under shuffle-join plans") {
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force the shuffle join a 100 TB fact gets
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100GB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0") {
      val optimized = selectiveJoin().queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain") || optimized.contains("bloom_filter"),
        s"no bloom filter injected:\n$optimized")
    }
  }

  test("runtime filtering never changes results (false positives re-checked by the join)") {
    val plain = selectiveJoin().orderBy("l_orderkey").collect().toSeq
    val filtered = withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100GB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0") {
      selectiveJoin().orderBy("l_orderkey").collect().toSeq
    }
    assert(plain == filtered)
  }

  test("AQE splits a skewed shuffle-join partition (skew=true) and results are unchanged") {
    // The salted-join escape hatch (q_skew_join_salted) is the MANUAL
    // answer to a hot key; this pins the AUTOMATIC one: under AQE,
    // a shuffle join whose hot partition exceeds the skew thresholds
    // is split at runtime. The engine's plans stay in the
    // sort-merge-join shape AQE can rewrite — this contract is why.
    import spark.implicits._
    // key 0 carries 2000× the rows of every other key
    val fact = spark.range(0, 100000).select(lit(0L).as("k"), col("id").as("v"))
      .union(spark.range(0, 450).select((col("id") % 9 + 1).as("k"), col("id").as("v")))
    val dim = spark.range(0, 10).select(col("id").as("k"),
      concat(lit("d"), col("id")).as("name"))
    def run() = fact.join(dim, "k").groupBy("k").count()
    val plain = run().orderBy("k").collect().toSeq
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // the 100 TB fact never broadcasts
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.shuffle.partitions" -> "4") {
      val df = fact.join(dim, "k")
      // execute THIS dataframe so its AdaptiveSparkPlanExec finalizes
      // (count() would plan a different query and leave this one initial)
      val rows = df.collect().length.toLong
      assert(rows == plain.map(_.getLong(1)).sum)
      // the FINAL adaptive plan must carry the skew-split marker
      val finalPlan = df.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not split the skewed partition:\n$finalPlan")
      val skewed = run().orderBy("k").collect().toSeq
      assert(skewed == plain)
    }
  }
}
