package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ad-hoc plan inspection harness (not part of the engine surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val ev = Tables.events(spark, d)
    time("events count")(println(ev.count()))
    time("events count2")(println(ev.count()))
    val base = ev.select(col("user_id"), col("event_id"), col("ts"),
      (col("ts") + expr("INTERVAL 5 MINUTES")).as("iv_end"))
    val ordered = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val prevRows = ordered.rowsBetween(Window.unboundedPreceding, -1)
    val one = base.withColumn("prev_max_end", max(col("iv_end")).over(prevRows))
    time("one window")(println(one.count()))
    val upToHere = ordered.rowsBetween(Window.unboundedPreceding, 0)
    val two = one
      .withColumn("is_new", when(
        col("prev_max_end").isNull || col("ts") > col("prev_max_end"), 1).otherwise(0))
      .withColumn("island", sum(col("is_new")).over(upToHere))
    time("two windows")(println(two.count()))
    val full = ops.Inventory.qIntervalMerge(spark, d)
    time("full")(println(full.count()))
    time("full again")(println(full.count()))
    spark.stop()
  }
}
