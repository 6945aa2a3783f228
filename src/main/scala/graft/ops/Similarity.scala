package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions

/** Similarity search over the `embeddings` table (SURVEY.md §2.3 E24 +
  * BASELINE.json ANN north star): brute-force cosine top-k as the
  * correctness baseline, IVF (inverted-file) clustering as the scale
  * path, and cosine near-duplicate pairs.
  *
  * Numeric portability contract with the DuckDB oracle: every float is
  * cast to double *before* any arithmetic, dot products fold
  * left-to-right (Spark `aggregate` ≡ DuckDB `list_sum` over a list
  * comprehension), so both engines produce bit-identical IEEE doubles;
  * displayed similarities are rounded to 4 decimals.
  *
  * Scale notes (100 TB posture):
  *  - brute force is probes × corpus: fine for a bounded probe set
  *    (the corpus side streams, probes broadcast), unusable for
  *    all-pairs — that is what IVF/LSH bucketing is for.
  *  - IVF assignment is corpus × centroids (centroids broadcast, one
  *    narrow pass); search touches only the probe's cluster, cutting
  *    compared vectors by ~n_clusters. Nothing here shuffles the
  *    corpus more than once.
  */
object Similarity {

  /** Embedding cast to double + L2 norm, computed once per row. The
    * norm uses the native `vec_dot` (graft.functions.VecDot): a
    * codegen'd left-fold identical in evaluation order to the oracle's
    * `list_sum` comprehension but ~10× faster than the interpreted
    * `aggregate`/`zip_with` composition. */
  private def withNorm(spark: SparkSession, df: DataFrame): DataFrame = {
    GraftFunctions.register(spark)
    df.withColumn("e", expr("CAST(embedding AS ARRAY<DOUBLE>)"))
      .withColumn("nrm", expr("sqrt(vec_dot(e, e))"))
  }

  /** Codegen'd left-fold dot product — same evaluation order as the
    * oracle's `list_sum([ea[i]*eb[i] ...])`. */
  private val dot = "vec_dot(ea, eb)"

  /** E24: brute-force cosine top-k — for each probe (vec_id < 5) the 5
    * nearest corpus vectors. The probe side is broadcast; the corpus
    * side never shuffles until the final per-probe top-k. */
  def qCosineTopk(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = withNorm(spark, Tables.embeddings(spark, d))
    val probes = v.filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("e").as("ea"), col("nrm").as("na"))
    val corpus = v.select(col("vec_id"), col("e").as("eb"), col("nrm").as("nb"))
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("vec_id"))
    corpus.join(broadcast(probes), col("vec_id") =!= col("probe_id"))
      .withColumn("cos", expr(s"$dot / (na * nb)"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("probe_id"), col("vec_id"), round(col("cos"), 4).as("cos_sim"), col("rn"))
      .orderBy("probe_id", "rn")
  }

  /** IVF-bucketed ANN: centroids = vec_id < 8 (a deterministic stand-in
    * for k-means training), each vector assigned to its nearest
    * centroid, probes (vec_id < 5) search only their own cluster,
    * top-3. The candidate set shrinks ~8×; recall is traded exactly as
    * in a real IVF index with nprobe=1. */
  def qAnnIvf(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = withNorm(spark, Tables.embeddings(spark, d))
    val centroids = v.filter(col("vec_id") < 8)
      .select(col("vec_id").as("centroid_id"), col("e").as("ea"), col("nrm").as("na"))
    val corpus = v.select(col("vec_id"), col("e").as("eb"), col("nrm").as("nb"))
    val wAssign = Window.partitionBy("vec_id")
      .orderBy(col("cos").desc, col("centroid_id"))
    val assigned = corpus.join(broadcast(centroids), lit(true))
      .withColumn("cos", expr(s"$dot / (na * nb)"))
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("centroid_id").as("cluster"), col("eb"), col("nb"))
    val probes = assigned.filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("cluster"),
        col("eb").as("ea"), col("nb").as("na"))
    val wTop = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("vec_id"))
    assigned.join(broadcast(probes), Seq("cluster"))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("cos", expr(s"$dot / (na * nb)"))
      .withColumn("rn", row_number().over(wTop))
      .filter(col("rn") <= 3)
      .select(col("probe_id"), col("cluster"), col("vec_id"),
        round(col("cos"), 4).as("cos_sim"), col("rn"))
      .orderBy("probe_id", "rn")
  }

  /** Embedding-cosine near-duplicate pairs (cos ≥ 0.45). All-pairs at
    * sf scale; at 100 TB this query is served by the IVF buckets above
    * (compare within-cluster only) — kept brute-force here as the
    * ground truth the bucketed variant is measured against. */
  def qEmbedNeardup(spark: SparkSession, d: String): DataFrame = {
    val v = withNorm(spark, Tables.embeddings(spark, d))
    val a = v.select(col("vec_id").as("vec_a"), col("e").as("ea"), col("nrm").as("na"))
    val b = v.select(col("vec_id").as("vec_b"), col("e").as("eb"), col("nrm").as("nb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("cos", expr(s"$dot / (na * nb)"))
      .filter(col("cos") >= 0.45)
      .select(col("vec_a"), col("vec_b"), round(col("cos"), 4).as("cos_sim"))
      .orderBy("vec_a", "vec_b")
  }
}
