package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Trained quality classifier over the `embeddings` table — the
  * missing "learned filter" stage of an LLM training-data pipeline
  * (the role fastText-style classifiers play in CCNet/GPT-3-era
  * curation: score every document, keep the high-quality tail).
  *
  * The trainer is the BATCH PERCEPTRON (Rosenblatt's rule applied to
  * the whole misclassified set per epoch — the subgradient step on
  * the perceptron loss): w ← w + Σ_{margin≤0} y·x, b ← b + Σ y.
  * It was chosen over logistic regression deliberately: the update
  * rule is ADDITIVE with no transcendentals, so the entire training
  * loop runs in EXACT integer arithmetic and is bit-identical across
  * engines — the same cross-engine discipline as Similarity's
  * decimal-staged k-means (Similarity.qKmeansTrain), taken one step
  * further: no doubles exist anywhere in the computation.
  *
  * Numeric contract ("micro-units"): each embedding component is cast
  * float → double → DECIMAL(18,6) (the proven q_kmeans_step cast; no
  * double is an exact tie at scale 6 — a tie would need a 5·10⁻⁷
  * binary fraction, which does not exist — so the two engines'
  * rounding modes cannot diverge) and scaled ×10⁶ into a BIGINT.
  * Weights are micro-unit sums of components (exact), margins are
  * y·(Σ w·x + b6·10⁶) in 10⁻¹²-units (exact, bounded: even at the
  * K=30 magnitude probe |Σ w·x| < 2.5·10¹⁸ < 2⁶³; the bias rides in
  * micro-units so no division ever happens in either engine). The binary target
  * is label parity: y = +1 for even labels, −1 for odd.
  *
  * Scale shape (100 TB posture): the corpus is persisted once and
  * scanned once per epoch. The margin pass is shuffle-FREE — the
  * (1-row) weight frame broadcasts and the dot product is a
  * zip_with/aggregate fold over the row's own array. The update pass
  * shuffles exactly `dims` partial sums (posexplode combines
  * map-side, the q_kmeans_step shape): bytes exchanged per epoch are
  * ∝ dims, independent of corpus size. The weight frame is
  * localCheckpoint'ed per epoch (constant-depth plan, fresh stats —
  * the DedupClusters iterative-algorithm discipline).
  *
  * Honesty note on the driver fixtures: the parity target is random
  * with respect to the embedding content there, so the trained filter
  * correctly collapses to chance (it predicts the −1 class for every
  * row, and qPerceptronEval's confusion matrix REPORTS that — which
  * is precisely the audit's job: a curation pipeline must see that a
  * filter learned nothing before trusting it). The spec proves the
  * machinery learns when signal exists (separable fixtures converge
  * in one epoch and the streaming gate splits them exactly).
  *
  * Reference anchor: the reference pipeline has no learned stage
  * (app.py is fetch-and-land); this family is part of the
  * training-data-pipeline surface the engine adds on top (SURVEY.md
  * §2.3 north stars).
  */
object Classifier {

  /** Training epochs. Three keeps the unrolled DuckDB oracle readable
    * while exercising the full fixed-point loop (epoch 1 updates on
    * every row — all margins are 0 under w₀ = 0 — epochs 2–3 on the
    * genuinely misclassified set). */
  private val epochs = 3

  /** (vec_id, y ∈ {+1,−1} INT, e6 ARRAY<BIGINT> micro-unit features). */
  private def corpus6(spark: SparkSession, d: String): DataFrame =
    Tables.embeddings(spark, d).select(
      col("vec_id"),
      when(col("label") % 2 === 0, lit(1)).otherwise(lit(-1)).as("y"),
      expr("transform(CAST(embedding AS ARRAY<DOUBLE>), " +
        "x -> CAST(CAST(x AS DECIMAL(18,6)) * 1000000 AS BIGINT))").as("e6"))

  /** Exact integer margin of every row under the broadcast weight
    * frame `(w ARRAY<BIGINT>, b6 BIGINT)`: y · (Σ wᵢ·xᵢ + b6·10⁶). */
  private def margins(corpus: DataFrame, w: DataFrame): DataFrame =
    corpus.crossJoin(broadcast(w))
      .withColumn("margin", col("y").cast("long") *
        (expr("aggregate(zip_with(e6, w, (x, wd) -> x * wd), " +
          "CAST(0 AS BIGINT), (acc, p) -> acc + p)") + col("b6") * lit(1000000L)))

  /** Runs the `epochs`-epoch batch-perceptron loop; returns the final
    * 1-row weight frame `(w ARRAY<BIGINT>, b6 BIGINT)`. */
  private def train(spark: SparkSession, corpus: DataFrame): DataFrame = {
    var w = corpus.limit(1)
      .select(expr("transform(e6, x -> CAST(0 AS BIGINT))").as("w"),
        lit(0L).as("b6"))
      .localCheckpoint()
    for (_ <- 1 to epochs) {
      val m = margins(corpus, w)
      // Per-dim update Σ_{margin≤0} y·x — the CASE-weight form keeps
      // every dim present (no empty-update edge case on a separable
      // corpus) and combines map-side: `dims` rows cross the exchange.
      val upd = m
        .select(col("y"), col("margin"), posexplode(col("e6")).as(Seq("dim", "x6")))
        .withColumn("g", when(col("margin") <= 0, col("y").cast("long")).otherwise(lit(0L)))
        .groupBy("dim").agg(sum(col("g") * col("x6")).as("u"))
        .groupBy()
        .agg(expr("transform(array_sort(collect_list(struct(dim, u))), p -> p.u)").as("du"))
      val db = m.groupBy()
        .agg(sum(when(col("margin") <= 0, col("y").cast("long")).otherwise(lit(0L))).as("db"))
      w = w.crossJoin(upd).crossJoin(db)
        .select(expr("zip_with(w, du, (a, b) -> a + b)").as("w"),
          (col("b6") + col("db") * lit(1000000L)).as("b6"))
        .localCheckpoint()
    }
    w
  }

  /** Landed trained-weights artifact (`perceptron_w_v1`): the declared
    * train OUTPUT shape — (dim, w6), bias at dim = −1 — written once
    * per corpus through the fingerprint-keyed Landing/TxTable pattern
    * (the own_pairs_v2 precedent). The "train once, score everywhere"
    * posture: at 100 TB the 3-epoch training pass is 3 full corpus
    * scans, and every consumer (batch eval/score, the streaming
    * quality gate) reads the dims+1-row artifact instead of paying
    * them again. coalesce(1): one small file, consumers broadcast. */
  private[graft] def weightsTable(spark: SparkSession, d: String): DataFrame = {
    val dir = graft.sources.Landing.table(spark, d, "perceptron_w_v1") {
      val corpus = corpus6(spark, d).persist()
      val w = train(spark, corpus)
      val out = w.select(posexplode(col("w")).as(Seq("dim", "w6")))
        .select(col("dim").cast("long").as("dim"), col("w6"))
        .union(w.select(lit(-1L).as("dim"), col("b6").as("w6")))
        .coalesce(1)
      corpus.unpersist(blocking = false)
      out
    }
    graft.sinks.TxTable.read(spark, dir)
  }

  /** The landed artifact folded back to the 1-row broadcastable
    * `(w ARRAY<BIGINT>, b6 BIGINT)` frame the margin pass consumes —
    * a dims+1-row aggregate, not a training job. */
  private[graft] def weightFrame(spark: SparkSession, d: String): DataFrame =
    weightsTable(spark, d).groupBy()
      .agg(expr("transform(array_sort(collect_list(IF(dim >= 0, " +
        "struct(dim, w6), NULL))), p -> p.w6)").as("w"),
        max(when(col("dim") === -1L, col("w6"))).as("b6"))

  /** Declared: final weight vector after 3 epochs, one row per
    * dimension in micro-units, the bias at dim = −1 (also micro-units
    * — the bias increments by whole counts ×10⁶, same unit as w).
    * Reads the landed artifact: the first caller per corpus pays the
    * training pipeline, everyone after reads dims+1 rows. */
  def qPerceptronTrain(spark: SparkSession, d: String): DataFrame =
    weightsTable(spark, d).orderBy("dim")

  /** Declared: training-set confusion counts of the 3-epoch model —
    * the fit audit a curation pipeline reads before trusting the
    * filter (predicted class is the sign of the ACTIVATION w·x + b =
    * margin·y, ties to −1 — a zero activation is counted wrong for
    * both classes by the trainer, and reported as the −1 class). */
  def qPerceptronEval(spark: SparkSession, d: String): DataFrame = {
    val w = weightFrame(spark, d)
    val out = margins(corpus6(spark, d), w)
      .select(col("y").cast("long").as("y"),
        when(col("margin") * col("y").cast("long") > 0, lit(1L))
          .otherwise(lit(-1L)).as("pred"))
      .groupBy("y", "pred").agg(count(lit(1)).as("n"))
      .orderBy("y", "pred")
    out
  }

  /** Declared: per-document quality scores from the trained filter —
    * the pipeline's actual consumption shape ("score everything, gate
    * on the margin"): document id, true class, exact integer margin,
    * and the gate decision. Bounded output (one row per kept doc is
    * the real shape; here the top-20 by margin keeps the declared
    * result magnitude-stable for the oracle). */
  def qPerceptronScore(spark: SparkSession, d: String): DataFrame = {
    val w = weightFrame(spark, d)
    val out = margins(corpus6(spark, d), w)
      .select(col("vec_id"), col("y").cast("long").as("y"),
        (col("margin") * col("y").cast("long")).as("score12"))
      .orderBy(col("score12").desc, col("vec_id"))
      .limit(20)
    out
  }
}
