package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc plan inspection harness (not part of the engine surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // drive the DSv2 stub through the public read path
    val http = spark.read.format("graft.sources.HttpPlaceholderSource")
      .option("urls", "http://10.0.0.1:8080/a,http://10.0.0.1:8080/b,http://10.0.0.2:8080/c")
      .option("maxConcurrentPerHost", 2).load()
    println("[drive] http partitions=" + http.rdd.getNumPartitions)
    http.show(false)

    // drive the sinks through real directories
    val base = java.nio.file.Files.createTempDirectory("graft_drive_").toString
    val df = Tables.region(spark, "/root/testdata/sf0.001")
    println("[drive] appendNew #1=" + sinks.Sinks.appendNew(spark, df, "r_regionkey", s"$base/sink"))
    println("[drive] appendNew #2=" + sinks.Sinks.appendNew(spark, df, "r_regionkey", s"$base/sink"))
    df.write.parquet(s"$base/src")
    println("[drive] moveVerified=" + sinks.Sinks.moveVerified(spark, s"$base/src", s"$base/dst"))
    println("[drive] src exists after move=" + new java.io.File(s"$base/src").exists())

    // drive the typed aggregator through the Dataset API
    val merged = spark.createDataset(Seq((0L, 10L), (8L, 20L), (30L, 40L)))
      .groupByKey(_ => 0).agg(functions.IntervalMergeAggregator.toColumn).collect()
    println("[drive] merged=" + merged.map(_._2).mkString(","))

    spark.stop()
  }
}
