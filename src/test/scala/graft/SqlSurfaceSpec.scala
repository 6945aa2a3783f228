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

  test("zorder16 and word_shingles are callable from SQL") {
    Tables.createViews(spark, sfDir)
    // Morton key: interleave(3, 5) = bits 11 and 101 interleaved
    // -> 100111 = 39 (b in odd positions, a in even)
    val z = spark.sql("SELECT zorder16(3L, 5L) AS z").collect().head.getLong(0)
    assert(z == 39L, s"zorder16(3,5) = $z")
    val sh = spark.sql(
      "SELECT word_shingles('a b c d', 3) AS s").collect().head.getSeq[String](0)
    assert(sh == Seq("a b c", "b c d"))
  }

  test("the SQL user can express an ad-hoc skyline against the views and match the operator") {
    Tables.createViews(spark, sfDir)
    val viaSql = spark.sql(
      """SELECT p_brand, p_partkey FROM part p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM part q WHERE q.p_brand = p.p_brand
        |    AND q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
        |    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val viaOp = graft.ops.Analytics.qSkyline(spark, sfDir)
      .select("p_brand", "p_partkey")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(viaSql == viaOp)
    assert(viaOp.nonEmpty)
  }
}
