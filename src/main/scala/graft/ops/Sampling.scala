package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Deterministic sampling for training-data curation.
  *
  * `sample()`/`rand()` are banned on this path: a training corpus
  * sample must be REPRODUCIBLE across re-runs, cluster sizes, and
  * engines (the oracle re-derives it bit-for-bit in DuckDB). The
  * sampling key is a cryptographic hash of a salted record key —
  * uniform over [0, 16^4), uncorrelated with any data column — and a
  * record is in the sample iff its hash prefix falls below the
  * stratum's threshold. Fixed-width lowercase-hex strings compare
  * lexicographically exactly as their numeric values, so the whole
  * predicate is a codegen'd string compare on both engines.
  *
  * This is a narrow, shuffle-free map over the corpus: at 100 TB it
  * costs one scan, composes with partition pruning, and never needs a
  * global count or sort the way reservoir/exact-k sampling does.
  */
object Sampling {

  /** Per-language downsampling (the classic corpus-rebalance move:
    * throttle the dominant language, keep more of the rest):
    * en is kept at ~10% (0x1999/0x10000), everything else at ~40%
    * (0x6666/0x10000). */
  def qStratifiedSample(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .withColumn("hk",
        substring(md5(concat(lit("smpl:"), col("doc_id").cast("string"))), 1, 4))
      .withColumn("thresh",
        when(col("lang") === "en", lit("1999")).otherwise(lit("6666")))
      .filter(col("hk") < col("thresh"))
      .select("doc_id", "lang", "source", "hk")
      .orderBy("doc_id")
}
