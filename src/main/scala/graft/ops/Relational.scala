package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Classic warehouse-shaped analytics: the multi-join / aggregate /
  * top-k reports a completeness store grows into once the landed data
  * (reference: the S3 inventory tags, app.py:467-480) is queried like
  * a fact table. Shapes follow the public TPC-H patterns (pricing
  * summary, shipping priority, local-supplier volume) because those
  * are the canonical stress tests for join ordering, partial
  * aggregation, and distributed top-k — the three things that
  * dominate a 100 TB scan-join-agg plan.
  *
  * Scale notes:
  *  - Every aggregate routes doubles through exact DECIMAL sums, so
  *    results are independent of partial-aggregation order (AQE may
  *    change the partial/final split at runtime).
  *  - Revenue terms multiply DECIMAL-cast operands — decimal×decimal
  *    is exact in both engines, so the oracle hash-matches without
  *    float-association caveats. Products stay ≤ DECIMAL(38,12);
  *    never chain a third decimal factor (precision would overflow 38
  *    and both engines would round differently).
  *  - Dims (region/nation/supplier) are explicitly broadcast — they
  *    stay config-sized at 100 TB. customer/orders/lineitem joins are
  *    left to Catalyst/AQE: broadcast at test SF, shuffle-hash on a
  *    cluster, with runtime bloom pruning available (RuntimeFilterSpec).
  *  - Top-k is `orderBy().limit(k)` → TakeOrderedAndProject: each
  *    partition keeps k rows, the driver merges partition winners. A
  *    window rank over an unpartitioned ORDER BY would be a
  *    single-task global sort (the anti-pattern).
  */
object Relational {

  private def dec(c: Column): Column = c.cast("decimal(18,6)")
  private def decSum(c: Column): Column = sum(dec(c)).cast("double")

  /** Revenue term: extendedprice × (1 − discount), exact. */
  private def revenue: Column =
    sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,6)") - dec(col("l_discount"))))
      .cast("double")

  /** Pricing summary (TPC-H Q1 shape): one wide partial-aggregated
    * scan of lineitem with the ship-date filter pushed into the
    * parquet reader. The group-by key has 6 distinct values, so the
    * map-side combine reduces ~everything before the (tiny) shuffle —
    * the ideal 100 TB aggregation profile. */
  def qTpchPricing(spark: SparkSession, d: String): DataFrame =
    Tables.spread(spark,
        Tables.lineitem(spark, d)
          .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp")),
        "l_orderkey") // exchange sits ABOVE the filter: pushdown intact
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        decSum(col("l_quantity")).as("sum_qty"),
        decSum(col("l_extendedprice")).as("sum_base"),
        revenue.as("sum_disc_price"),
        count(lit(1)).as("n_rows"))
      .withColumn("avg_qty", col("sum_qty") / col("n_rows"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Shipping priority (TPC-H Q3 shape): segment-filtered customers ⋈
    * date-split orders ⋈ lineitem, revenue per order, top 10. Both
    * date predicates reach their scans (PushedFilters), the customer
    * filter shrinks the build side before the join, and the final
    * top-10 is a distributed TakeOrderedAndProject, not a sort. */
  def qTpchShipping(spark: SparkSession, d: String): DataFrame = {
    val cut = lit("1998-01-01").cast("timestamp")
    val cust = Tables.customer(spark, d)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    Tables.orders(spark, d)
      .filter(col("o_orderdate") < cut)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(
        Tables.lineitem(spark, d).filter(col("l_shipdate") > cut)
          .select("l_orderkey", "l_extendedprice", "l_discount"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
      .agg(revenue.as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderdate"), col("o_orderkey"))
      .limit(10)
  }

  /** Local-supplier volume (TPC-H Q5 shape): the 6-table join —
    * region-filtered nation chain on the customer side, supplier
    * joined on BOTH l_suppkey and the customer's nation (the classic
    * "local supplier" equi-pair). region/nation/supplier broadcast;
    * the orders year filter prunes before the big join. */
  def qTpchVolume(spark: SparkSession, d: String): DataFrame = {
    val nr = Tables.nation(spark, d)
      .join(broadcast(Tables.region(spark, d).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val cust = Tables.customer(spark, d)
      .join(broadcast(nr), col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey", "c_nationkey", "n_name")
    Tables.orders(spark, d)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(Tables.lineitem(spark, d)
          .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"),
        col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(Tables.supplier(spark, d).select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .groupBy("n_name")
      .agg(revenue.as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Sales by brand: the fact joined to the mid-size product dim on
    * partkey (the one dim no other query touches) and rolled up per
    * brand. part is broadcast at test SF by Catalyst; on a cluster it
    * crosses the threshold and AQE shuffle-joins it — exactly the dim
    * size where bucketing both sides on the key (IntegrationSpec's
    * co-located join) removes the exchange entirely. */
  /** Order-fulfillment latency report: days from order to each line's
    * ship date, distributed per order priority — min / discrete median
    * / p90 / max. The fact-dim join is the only shuffle; latency is an
    * integer day count and every summary statistic is a SELECTED
    * member value (percentile_disc), so the whole row is exact. */
  def qOrderLatency(spark: SparkSession, d: String): DataFrame =
    Tables.lineitem(spark, d)
      .select("l_orderkey", "l_shipdate")
      .join(Tables.orders(spark, d).select("o_orderkey", "o_orderdate", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("lat_days",
        datediff(col("l_shipdate").cast("date"), col("o_orderdate").cast("date")).cast("long"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_lines"),
        min("lat_days").as("min_days"),
        expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY lat_days) AS BIGINT)")
          .as("median_days"),
        expr("CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY lat_days) AS BIGINT)")
          .as("p90_days"),
        max("lat_days").as("max_days"))
      .orderBy("o_orderpriority")

  /** Forecast-revenue-change probe (TPC-H Q6 shape): how much revenue
    * a discount-band change would move — a single filtered scan with
    * ALL THREE predicates (ship-date range, discount band, quantity
    * cap) pushed into the parquet reader, then a global aggregate.
    * This is the purest 100 TB shape in the suite: zero joins, zero
    * group keys, the map-side combine collapses every partition to one
    * partial row, and the only shuffle is |partitions| rows wide. The
    * discount-band compares run on the SAME stored doubles in both
    * engines (no arithmetic before the compare), so the predicate is
    * parity-exact; the revenue product goes through DECIMAL as
    * everywhere else. */
  def qTpchDiscount(spark: SparkSession, d: String): DataFrame =
    Tables.lineitem(spark, d)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_discount") >= 0.03 && col("l_discount") <= 0.05 &&
        col("l_quantity") < 24)
      .agg(count(lit(1)).as("n_lines"),
        sum(dec(col("l_extendedprice")) * dec(col("l_discount"))).cast("double")
          .as("lost_revenue"))

  /** Returned-item report (TPC-H Q10 shape): the 20 customers who
    * returned the most revenue — the fact filtered to return-flagged
    * lines BEFORE any join (the scan ships only the ~25% 'R' slice),
    * then orders → customer → broadcast nation, and a distributed
    * top-20 via TakeOrderedAndProject. The revenue tie-break is
    * c_custkey so the limit boundary is a total order in both
    * engines. */
  def qTpchReturned(spark: SparkSession, d: String): DataFrame =
    Tables.lineitem(spark, d)
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
      .join(Tables.orders(spark, d).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, d).select("c_custkey", "c_name", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, d).select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "n_name")
      .agg(count(lit(1)).as("n_lines"), revenue.as("lost_revenue"))
      .orderBy(col("lost_revenue").desc, col("c_custkey"))
      .limit(20)

  def qBrandSales(spark: SparkSession, d: String): DataFrame =
    Tables.spread(spark,
        Tables.lineitem(spark, d)
          .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount"),
        "l_partkey")
      .join(Tables.part(spark, d).select("p_partkey", "p_brand"),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_items"),
        decSum(col("l_quantity")).as("sum_qty"),
        revenue.as("revenue"))
      .orderBy("p_brand")
}
