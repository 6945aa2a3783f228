package graft

import org.apache.spark.sql.functions._

import graft.ops.Sampling

/** Deterministic stratified sampling. */
class SamplingSpec extends SparkSpec {

  private val sf01 = "/root/testdata/sf0.01"

  test("sample is deterministic across runs and a subset of the corpus") {
    val a = Sampling.qStratifiedSample(spark, sf01).collect()
    val b = Sampling.qStratifiedSample(spark, sf01).collect()
    assert(a.map(_.toString).sameElements(b.map(_.toString)))
    val corpusIds = Tables.documents(spark, sf01)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a.map(_.getLong(0)).toSet.subsetOf(corpusIds))
  }

  test("per-stratum rates land near their thresholds (hash is uniform)") {
    val docs = Tables.documents(spark, sf01)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = Sampling.qStratifiedSample(spark, sf01)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    docs.foreach { case (lang, n) =>
      val want = if (lang == "en") 0x1999.toDouble / 0x10000 else 0x6666.toDouble / 0x10000
      val got = sampled.getOrElse(lang, 0L).toDouble / n
      // 3-sigma binomial tolerance around the nominal rate
      val tol = 3 * math.sqrt(want * (1 - want) / n)
      assert(math.abs(got - want) <= tol,
        s"$lang: rate $got vs nominal $want (n=$n, tol=$tol)")
    }
  }
}
