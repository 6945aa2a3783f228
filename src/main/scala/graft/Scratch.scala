package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc plan inspection harness (not part of the engine surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val sh = docs
      .withColumn("tk", expr("split(text, '\\\\s+')"))
      .filter(expr("size(tk) >= 3"))
      .select(col("doc_id"), col("lang"), expr(
        """array_distinct(transform(sequence(1, size(tk) - 2),
          |  i -> concat_ws(' ', element_at(tk, i), element_at(tk, i + 1), element_at(tk, i + 2))))"""
          .stripMargin).as("sh"))
    time("shingles only")(println("n=" + sh.count()))
    val inv = sh.select(col("lang"), col("doc_id"), explode(col("sh")).as("shingle"))
    time("inv count")(println("n=" + inv.count()))
    val joined = inv.select(col("lang"), col("doc_id").as("doc_a"), col("shingle"))
      .join(inv.select(col("lang"), col("doc_id").as("doc_b"), col("shingle")),
        Seq("lang", "shingle"))
      .filter(col("doc_a") < col("doc_b"))
    time("pair join count")(println("n=" + joined.count()))
    val common = joined.groupBy("lang", "doc_a", "doc_b").agg(count(lit(1)).as("n_common"))
    time("common count")(println("n=" + common.count()))
    spark.stop()
  }
}
