package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Near-duplicate CLUSTERING: the step after pair detection that an
  * actual training-data dedup pipeline needs — group transitive
  * near-dup pairs into connected components and elect one canonical
  * document per component (reference analogue: the skip-if-exists
  * idempotence of app.py:270-273 picks one winner per filename; here
  * the "filename" is a similarity cluster).
  *
  * Algorithm: iterative min-label propagation with pointer jumping.
  * Each iteration does (a) one hop of neighbor-label propagation and
  * (b) one label-of-label shortcut (path compression), giving
  * O(log diameter) convergence instead of O(diameter) — the property
  * that matters when a boilerplate cluster chains thousands of docs.
  * All per-iteration state is (doc_id, label) pairs: bytes shuffled
  * scale with cluster membership, never with pair count squared, and
  * each iteration's result is `localCheckpoint()`ed: a plain
  * `persist()` caches the DATA but the logical plan still compounds
  * ~6× per iteration (every analysis/explain walks it — measured OOM
  * at 8 iterations), while a checkpoint truncates the lineage to a
  * `LogicalRDD` leaf so iteration N's plan is constant-size. On a
  * fault-tolerant cluster run, prefer reliable `checkpoint()` with a
  * checkpoint dir — localCheckpoint trades executor-loss recovery for
  * speed, the right trade in a single-JVM deployment.
  *
  * Convergence is detected with a count of changed labels — a driver
  * action per iteration, which is how every iterative-graph Spark
  * algorithm (GraphX/GraphFrames connected components included)
  * terminates; the data never collects.
  */
object DedupClusters {

  /** Pairs → (doc_id, canonical_id, cluster_size, is_canonical) for
    * every doc that belongs to a near-dup cluster. Canonical = min
    * doc_id reachable through the pair graph (deterministic, and the
    * usual "keep the earliest-ingested copy" policy). */
  private[graft] def connectedComponents(rawPairs: DataFrame): DataFrame = {
    // The pair-detection plan upstream (LSH + verify) is the expensive
    // part; nodes/edges/labels below each reference it, so materialize
    // it ONCE — otherwise the whole near-dup plan re-runs ~6× before
    // the first iteration even starts (measured: 7.1 s → dominated by
    // recompute, not by the propagation itself).
    val pairs = rawPairs.localCheckpoint()
    // Undirected edges PLUS a self-loop per node: the self-loop makes
    // the per-node neighbor-min aggregate include the node's own label,
    // so the iteration needs no union inside the loop (a union over
    // checkpointed frames trips Catalyst's constraint rewrite — the
    // checkpointed LogicalRDD preserves constraints that mention
    // pre-checkpoint attribute ids).
    val nodes = pairs.select(col("doc_a").as("s"))
      .union(pairs.select(col("doc_b").as("s"))).distinct()
    val edges = pairs.select(col("doc_a").as("s"), col("doc_b").as("t"))
      .union(pairs.select(col("doc_b").as("s"), col("doc_a").as("t")))
      .union(nodes.select(col("s"), col("s").as("t")))
      .localCheckpoint()
    var labels = nodes.select(col("s").as("d"))
      .withColumn("lbl", col("d")).localCheckpoint()
    var converged = false
    var iter = 0
    while (!converged && iter < 50) {
      // (a) min over own + neighbor labels (self-loops carry "own").
      // NOT checkpointed: its inputs (edges, labels) are already
      // LogicalRDD leaves, so the self-join below re-evaluating it
      // twice costs one extra small join — cheaper than the extra
      // materialization job per iteration (the loop runs on the
      // near-dup node set, where per-job latency dominates; measured
      // 1.94 s → 1.45 s for the whole loop at sf0.1).
      val hop = edges.join(labels, edges("s") === labels("d"))
        .groupBy(edges("t")).agg(min("lbl").as("lbl"))
        .select(col("t").as("d"), col("lbl"))
      // (b) pointer jumping: follow your label's label; carry the
      // change flag INTO the checkpointed frame so the convergence
      // count scans the materialized leaf instead of re-joining.
      val next = hop.as("x")
        .join(hop.as("y"), col("x.lbl") === col("y.d"), "left")
        .select(col("x.d").as("d"),
          least(col("x.lbl"), coalesce(col("y.lbl"), col("x.lbl"))).as("lbl"))
        .join(labels.withColumnRenamed("lbl", "old"), "d")
        .select(col("d"), col("lbl"), (col("lbl") < col("old")).as("chg"))
        .localCheckpoint()
      val changed = next.filter(col("chg")).count()
      labels = next.select("d", "lbl")
      converged = changed == 0
      iter += 1
    }
    val sized = labels
      .withColumn("cluster_size", count(lit(1)).over(Window.partitionBy("lbl")))
    sized.select(col("d").as("doc_id"), col("lbl").as("canonical_id"),
        col("cluster_size"), (col("d") === col("lbl")).as("is_canonical"))
      .orderBy("doc_id")
  }

  /** Declared query: clusters over the MinHash-LSH near-dup pair
    * stream (Quality.qMinhashNeardup, read through its landed
    * artifact — Quality.neardupPairs) — the 100 TB pair source: LSH
    * candidate generation is band-bucketed (never all-pairs, hot
    * bands capped), where the exact inverted-index Jaccard's Σdf²
    * bound depends on the shingle-frequency profile holding at scale.
    * The exact-Jaccard-pair clustering stays available below as the
    * spec's ground truth. */
  def qDedupClusters(spark: SparkSession, d: String): DataFrame =
    connectedComponents(Quality.neardupPairs(spark, d).select("doc_a", "doc_b"))

  /** The cluster table's SQL FRONT DOOR. Spark 4 rejects UNION-dedup
    * inside recursive CTEs (UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE), so
    * a SQL-only user cannot DERIVE connected components — but they can
    * read them: this lands [[qDedupClusters]]'s output as a write-once
    * TxTable artifact (keyed by corpus fingerprint, multi-JVM-safe)
    * and registers it as the `dedup_clusters_v1` temp view. After one
    * call, `SELECT canonical_id FROM dedup_clusters_v1 WHERE ...` works
    * in plain SQL; [[graft.Tables.createViews]] re-registers the view
    * for free on later sessions once the artifact exists. Returns the
    * view name. */
  def ensureClustersView(spark: SparkSession, d: String): String = {
    val dir = graft.sources.Landing.table(spark, d, "dedup_clusters_v1") {
      qDedupClusters(spark, d)
    }
    graft.sinks.TxTable.read(spark, dir).createOrReplaceTempView("dedup_clusters_v1")
    "dedup_clusters_v1"
  }

  /** Declared query over the SQL front door: materialize (or reuse)
    * the landed cluster artifact, then read it back THROUGH the
    * registered view with plain SQL — the exact path a SQL-only user
    * takes. Oracle-gated against the same recursive-CTE DuckDB oracle
    * as q_dedup_clusters (the view must equal the derivation). */
  def qClusterView(spark: SparkSession, d: String): DataFrame = {
    ensureClustersView(spark, d)
    spark.sql("SELECT doc_id, canonical_id, cluster_size, is_canonical " +
      "FROM dedup_clusters_v1 ORDER BY doc_id")
  }

  /** Dedup audit report: cluster-size histogram plus the corpus-level
    * removal count — the one-page summary a dedup run is judged by
    * ("how many docs survive keep-one-per-cluster?"). Composes the
    * declared cluster query: per size, the number of clusters and the
    * docs that keep-canonical would drop (size − 1 each). The input is
    * already ≤ |near-dup docs| rows, so the rollup is a trivial hash
    * aggregate — the expensive part is shared with (and measured
    * under) q_dedup_clusters. */
  def qClusterStats(spark: SparkSession, d: String): DataFrame =
    qDedupClusters(spark, d)
      .groupBy("cluster_size")
      .agg((count(lit(1)) / col("cluster_size")).cast("long").as("n_clusters"),
        (count(lit(1)) - count(lit(1)) / col("cluster_size")).cast("long").as("n_dropped"))
      .orderBy("cluster_size")

  /** SOFT dedup — duplicate-aware sampling weights: every document
    * survives, but a member of a k-document near-dup cluster trains
    * with weight 1/k (floored ppm), so the cluster contributes one
    * document's worth of gradient in expectation. The alternative to
    * keep-one-canonical when dedup confidence is low or duplicates
    * carry provenance signal (the standard soft-dedup option in LLM
    * data curation). Unclustered docs weigh 1.
    *
    * Scale shape: the cluster table is ≤ |near-dup docs| rows —
    * broadcast; the corpus streams once through a left join and a
    * codegen'd projection. The expensive part (LSH pairs + CC) is
    * shared with q_dedup_clusters and measured there. */
  def qDedupWeight(spark: SparkSession, d: String): DataFrame =
    graft.Tables.documents(spark, d).select(col("doc_id"), col("source"))
      .join(broadcast(qDedupClusters(spark, d).select("doc_id", "cluster_size")),
        Seq("doc_id"), "left_outer")
      .withColumn("cluster_size", coalesce(col("cluster_size"), lit(1L)))
      .withColumn("weight_ppm", expr("1000000 div cluster_size"))
      .orderBy("doc_id")

  /** Quality-aware canonicalization: per near-dup cluster keep the
    * HIGHEST-QUALITY member, not the smallest id — what a production
    * dedup actually does (of five scrapes of one page, keep the
    * cleanest). Ties on the (rounded) score break to the smaller
    * doc_id, matching the oracle's ORDER BY quality DESC, doc_id.
    * The corpus-side quality projection streams once past the
    * broadcast cluster set (near-dup members ≪ corpus); the argmax is
    * a max_by hash aggregate — no per-cluster sort. */
  def qDedupKeepBest(spark: SparkSession, d: String): DataFrame = {
    val clusters = qDedupClusters(spark, d)
      .select(col("doc_id"), col("canonical_id"), col("cluster_size"))
    val quality = Quality.qQualityScore(spark, d)
      .select(col("doc_id"), col("quality_score"))
    quality.join(broadcast(clusters), Seq("doc_id"))
      .groupBy("canonical_id")
      .agg(max(col("cluster_size")).as("cluster_size"),
        max_by(struct(col("doc_id"), col("quality_score")),
          struct(col("quality_score"), (-col("doc_id")).as("neg_id"))).as("best"))
      .select(col("canonical_id"), col("cluster_size"),
        col("best.doc_id").as("kept_doc"),
        col("best.quality_score").as("kept_quality"))
      .orderBy("canonical_id")
  }

  /** Spec-only ground truth: clusters over the exact same-lang
    * word-3-gram Jaccard ≥ 0.5 pairs (Quality.qNgramJaccard's pair
    * semantics) — DedupClustersSpec asserts the planted near-dup docs
    * cluster identically through either pair source. */
  private[graft] def clustersFromExactPairs(spark: SparkSession, d: String): DataFrame =
    connectedComponents(Quality.exactJaccardPairs(spark, d).select("doc_a", "doc_b"))

  /** Embedding-space near-dup clusters: the same min-label-propagation
    * components, fed by the SEMANTIC pair stream (multi-probe IVF
    * candidates + exact cosine ≥ 0.45 verify, Similarity.qEmbedNeardup)
    * instead of the lexical LSH stream — the dedup a corpus needs when
    * paraphrases and translations must collapse, not just re-crawls.
    * Pair generation stays cluster-bucketed (never all-pairs); the
    * component loop runs on the near-dup vec set only. */
  def qEmbedClusters(spark: SparkSession, d: String): DataFrame =
    connectedComponents(Similarity.embedNeardupPairs(spark, d)
        .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b")))
      .select(col("doc_id").as("vec_id"), col("canonical_id"),
        col("cluster_size"), col("is_canonical"))

  /** Dedup blocking audit — the 1-row report that decides whether a
    * blocking strategy is safe at 100 TB: the exact similarity join
    * blocks on language (qNgramJaccard: only same-lang pairs compared,
    * the classic cost cut), the LSH stream is unblocked. The audit
    * full-outer-joins the two pair sets and counts: in-block truth
    * pairs, how many of them LSH recovered (recall_ppm — LSH's
    * banding miss rate), LSH-only pairs INSIDE a block (verified real
    * near-dups the exact path also sees ⇒ expected 0 since exact
    * truth is lossless in-block), and LSH pairs STRADDLING blocks —
    * exactly the pairs blocking silently throws away (the
    * qCrossSourceLeak failure mode, measured instead of assumed).
    * Both pair frames are k-bounded products of already-declared
    * plans; the audit itself is one full-outer join + one 1-row
    * aggregate, reading both pair streams as materialized Landing
    * artifacts of the dedup runs themselves (exactly the production
    * shape) — so only the join+aggregate executes here. */
  def qDedupRecall(spark: SparkSession, d: String): DataFrame = {
    val lang = graft.Tables.documents(spark, d).select(col("doc_id"), col("lang"))
    val lsh = Quality.neardupPairs(spark, d).select("doc_a", "doc_b")
      .join(lang.select(col("doc_id").as("doc_a"), col("lang").as("lang_a")), Seq("doc_a"))
      .join(lang.select(col("doc_id").as("doc_b"), col("lang").as("lang_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (col("lang_a") === col("lang_b")).as("same_block"), lit(true).as("in_lsh"))
    val exact = Quality.exactJaccardPairs(spark, d)
      .select(col("doc_a"), col("doc_b"), lit(true).as("in_exact"))
    lsh.join(exact, Seq("doc_a", "doc_b"), "full_outer")
      .agg(
        count(when(col("in_exact"), lit(1))).as("n_exact"),
        count(when(col("in_exact") && col("in_lsh"), lit(1))).as("n_found"),
        count(when(col("in_lsh") && !coalesce(col("in_exact"), lit(false)) &&
          col("same_block"), lit(1))).as("n_extra_in_block"),
        count(when(col("in_lsh") && !col("same_block"), lit(1))).as("n_cross_block"))
      .withColumn("recall_ppm", expr("(n_found * 1000000) div n_exact"))
  }
}
