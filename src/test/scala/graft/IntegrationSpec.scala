package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.sinks.Sinks

/** Cross-module integration: streaming → idempotent sink (R22 as
  * foreachBatch), bucketed co-located joins (the SURVEY §7.5 shuffle
  * elimination), and the binaryFile listing source (R21). */
class IntegrationSpec extends SparkSpec {

  test("foreachBatch + appendNew: replayed batch writes nothing twice") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sink = Files.createTempDirectory("graft_stream_sink_").toString + "/out"
    val input = MemoryStream[(Long, String)]
    val counts = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = input.toDF().toDF("id", "payload").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        counts += Sinks.appendNew(spark, batch, "id", sink)
        ()
      }.start()
    try {
      input.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      // a re-delivered batch (at-least-once) must be a no-op
      input.addData((1L, "a"), (2L, "b"), (3L, "c"))
      q.processAllAvailable()
      assert(counts.toSeq == Seq(2L, 1L)) // second delivery: only id=3 lands
      assert(spark.read.parquet(sink).count() == 3)
    } finally q.stop()
  }

  test("bucketed tables join without a shuffle exchange") {
    val o = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey", "o_totalprice")
    val l = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_extendedprice")
    o.write.mode("overwrite").bucketBy(4, "o_orderkey").saveAsTable("orders_b")
    l.write.mode("overwrite").bucketBy(4, "l_orderkey").saveAsTable("lineitem_b")
    try {
      val j = spark.table("orders_b").join(spark.table("lineitem_b"),
        col("o_orderkey") === col("l_orderkey"))
      val plan = j.queryExecution.executedPlan.toString
      // co-located buckets: no Exchange feeding the join
      assert(!plan.contains("Exchange hashpartitioning"),
        s"unexpected shuffle in bucketed join plan:\n$plan")
      assert(j.count() > 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("binaryFile listing source: full-bucket scan with metadata (R21)") {
    val inv = spark.read.format("binaryFile")
      .load(s"$sfDir/*.parquet")
      .select(col("path"), col("length"),
        regexp_extract(col("path"), "([^/]+)\\.parquet$", 1).as("table_name"))
    val names = inv.collect().map(_.getString(2)).toSet
    assert(names.contains("lineitem") && names.contains("documents"))
    assert(inv.collect().forall(_.getLong(1) > 0))
  }
}
