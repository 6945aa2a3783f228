package graft

import org.apache.spark.sql.functions._

import graft.ops.Probes

/** The shared embedding-family probe: one job per dataset per session,
  * facts match a direct computation, fixture rewrites invalidate. */
class ProbesSpec extends SparkSpec {

  test("probe facts match a direct computation; repeat calls are served from cache") {
    Probes.invalidateAll()
    val p = Probes.embeddings(spark, sfDir)
    val emb = Tables.embeddings(spark, sfDir)
      .select(expr("CAST(embedding AS ARRAY<DOUBLE>)").as("e"),
        col("label").cast("long").as("label"))
    val r = emb.agg(count(lit(1)), countDistinct(xxhash64(col("e"))),
      min("label"), max("label"),
      countDistinct(xxhash64(element_at(col("e"), 1), element_at(col("e"), 2)))).head()
    assert(p.n == r.getLong(0) && p.ndContent == r.getLong(1))
    assert(p.minLabel.contains(r.getLong(2)) && p.maxLabel.contains(r.getLong(3)))
    assert(p.ndXy == r.getLong(4))
    // a second call returns the SAME instance — a cache hit runs no job
    assert(Probes.embeddings(spark, sfDir) eq p)
  }

  test("rewriting a fixture dir invalidates its cached probe") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_probe_fix_").toString
    val e1 = Array.tabulate(16)(i => 0.1f * i)
    Seq((0L, e1, 1), (1L, e1, 2))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val p1 = Probes.embeddings(spark, dir)
    assert(p1.n == 2 && p1.ndContent == 1 && !p1.contentDupFree)
    // rewrite with distinct contents: the fingerprint (mtime+len)
    // changes, so the stale probe must not be served
    Seq((0L, e1, 1), (1L, e1.map(_ * 2f), 2), (2L, e1.map(_ * 3f), 3))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val p2 = Probes.embeddings(spark, dir)
    assert(p2.n == 3 && p2.ndContent == 3 && p2.contentDupFree)
  }
}
