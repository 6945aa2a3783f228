package graft

/** The spark.sql surface over registered views + native functions. */
class SqlSurfaceSpec extends SparkSpec {

  test("registered views answer plain SQL with pushdown intact") {
    Tables.createViews(spark, sfDir)
    val df = spark.sql(
      """SELECT c_name, count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderstatus = 'F'
        |GROUP BY c_name ORDER BY total DESC LIMIT 5""".stripMargin)
    assert(df.count() == 5)
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("o_orderstatus"))
  }

  test("vec_dot is callable from SQL over the embeddings view") {
    Tables.createViews(spark, sfDir)
    val row = spark.sql(
      """SELECT round(sum(vec_dot(CAST(embedding AS ARRAY<DOUBLE>),
        |                        CAST(embedding AS ARRAY<DOUBLE>))), 1) AS s
        |FROM embeddings""".stripMargin).collect().head
    // embeddings are unit vectors: sum of self-dots == row count
    assert(row.getDouble(0) == Tables.embeddings(spark, sfDir).count().toDouble)
  }

  test("events view exposes microsecond timestamps through SQL") {
    Tables.createViews(spark, sfDir)
    val n = spark.sql(
      "SELECT count(*) FROM events WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'")
      .collect().head.getLong(0)
    assert(n == Tables.events(spark, sfDir).count())
  }
}
