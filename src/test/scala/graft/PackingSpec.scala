package graft

import org.apache.spark.sql.functions._

import graft.ops.Packing

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("length buckets partition the corpus: doc counts sum to corpus size, bucket bounds nest in powers of two") {
    val df = Packing.qLengthBuckets(spark, sfDir).cache()
    assert(df.agg(sum("n_docs")).as[Long].collect().head ==
      Tables.documents(spark, sfDir).count())
    // bucket b holds token counts in [2^(b-1), 2^b)
    val bad = df.filter(
      col("min_tokens") < pow(lit(2.0), col("bucket") - 1).cast("long") ||
      col("max_tokens") >= pow(lit(2.0), col("bucket")).cast("long"))
    assert(bad.count() == 0)
    df.unpersist()
  }

  test("curriculum: phases partition the corpus into ordered quartile bands, key is deterministic") {
    val out = Packing.qCurriculum(spark, sfDir).cache()
    val docs = Tables.documents(spark, sfDir)
    // every document assigned exactly once
    assert(out.count() == docs.count())
    assert(out.select("doc_id").distinct().count() == docs.count())
    // phases are ordered bands over n_chars: no doc in a lower phase is
    // longer than any doc in a higher phase
    val bounds = out.groupBy("phase")
      .agg(min("n_chars").as("lo"), max("n_chars").as("hi"),
        count(lit(1)).as("n"))
      .orderBy("phase").collect()
    bounds.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getLong(a.fieldIndex("hi")) <= b.getLong(b.fieldIndex("lo")),
          s"phase bands overlap: $a vs $b")
      case _ =>
    }
    // quartile sizing: phases 0-2 each hold >= 1/8 and <= 1/2 of the
    // corpus (exact quarters up to ties at the disc thresholds)
    val n = docs.count()
    bounds.dropRight(1).foreach { r =>
      val c = r.getLong(r.fieldIndex("n"))
      assert(c >= n / 8 && c <= n / 2, s"phase size off: $r of $n")
    }
    // the order key is a pure function of doc_id — recomputing yields
    // byte-identical assignments
    assert(Packing.qCurriculum(spark, sfDir).exceptAll(out).count() == 0)
    out.unpersist()
  }

  test("greedy packing is gap-free per shard: offsets advance by exactly n_tokens across bins") {
    val df = Packing.qPackGreedy(spark, sfDir).cache()
    // reconstruct the global position: bin_id * 512 + bin_offset must equal
    // the running sum of preceding docs' tokens in doc_id order per shard
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val check = df.withColumn("expect", coalesce(sum("n_tokens").over(w), lit(0L)))
      .filter(col("bin_id") * 512 + col("bin_offset") =!= col("expect"))
    assert(check.count() == 0)
    assert(df.filter(col("bin_offset") < 0 || col("bin_offset") >= 512).count() == 0)
    df.unpersist()
  }

  test("shard assignment is total, deterministic, and roughly balanced") {
    val df = Packing.qShardAssign(spark, sfDir).cache()
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(df.agg(sum("n_docs")).as[Long].collect().head == nDocs)
    val counts = df.select("n_docs").as[Long].collect()
    // 16-way md5 split of 500 docs: every shard populated, none pathological
    assert(counts.length <= 16 && counts.min >= 1)
    assert(counts.max <= nDocs / 2)
    df.unpersist()
  }

  test("passage dedup keeps every chunk of a duplicate-free corpus prefix and counts chunks = ceil(tokens/10)") {
    val df = Packing.qPassageDedup(spark, sfDir).cache()
    val withTokens = Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(split(col("text"), "\\s+")).cast("long").as("n_tokens"))
      .join(df, "doc_id")
    assert(withTokens.filter(col("n_chunks") =!= ceil(col("n_tokens") / lit(10.0)).cast("long"))
      .count() == 0)
    // kept ratio is a valid fraction and at least one doc keeps everything
    // (the corpus-wide first document by (doc_id, ci) always keeps chunk 0)
    assert(df.filter(col("kept_ratio") < 0 || col("kept_ratio") > 1).count() == 0)
    assert(df.filter(col("n_kept") > col("n_chunks")).count() == 0)
    df.unpersist()
  }

  test("kmeans step: per-cluster member counts sum to the corpus and centroids move toward members") {
    val step = graft.ops.Similarity.qKmeansStep(spark, sfDir).cache()
    val corpus = Tables.embeddings(spark, sfDir).count()
    val perCluster = step.groupBy("cluster").agg(max("n_members").as("m"), min("n_members").as("lo"))
    // n_members is constant across dims within a cluster
    assert(perCluster.filter(col("m") =!= col("lo")).count() == 0)
    assert(perCluster.agg(sum("m")).as[Long].collect().head == corpus)
    // 8 clusters × 64 dims
    assert(step.count() == 8 * 64)
    step.unpersist()
  }

  test("surrogate keys are dense 0..n-1 and monotone in doc_id") {
    val sk = Packing.qSurrogateKey(spark, sfDir).cache()
    val n = sk.count()
    assert(sk.agg(min("sk"), max("sk")).as[(Long, Long)].collect().head == (0L, n - 1))
    assert(sk.select("sk").distinct().count() == n)
    // monotone: sorting by doc_id equals sorting by sk
    val w = org.apache.spark.sql.expressions.Window.orderBy("doc_id")
    assert(sk.withColumn("rn", row_number().over(w) - 1)
      .filter(col("sk") =!= col("rn")).count() == 0)
    sk.unpersist()
  }

  test("overlapping chunks: stride-5/size-10 windows tile every token with 50% overlap") {
    import graft.ops.Packing
    val ch = Packing.qChunkOverlap(spark, sfDir).cache()
    // window sizes are capped at 10 and only the last window may be short
    assert(ch.filter(col("n_tokens") > 10).count() == 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("win_id").desc)
    assert(ch.withColumn("rk", row_number().over(w))
      .filter(col("rk") > 1 && col("n_tokens") < 10).count() == 0)
    // consecutive full windows share exactly their 5-token overlap
    val a = ch.filter(col("doc_id") === ch.select(min("doc_id")).first().getLong(0))
      .orderBy("win_id").select("chunk").as[String].collect()
    if (a.length >= 2 && a(0).split(" ").length == 10) {
      assert(a(0).split(" ").drop(5).toSeq == a(1).split(" ").take(5).toSeq)
    }
    // every token position is covered: per doc, sum(n_tokens) ≥ token count
    val toks = Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(split(col("text"), "\\s+")).cast("long").as("n"))
    val cov = ch.groupBy("doc_id").agg(sum("n_tokens").as("c")).join(toks, "doc_id")
    assert(cov.filter(col("c") < col("n")).count() == 0)
    ch.unpersist()
  }

  test("shard manifest checksum is partitioning-invariant and tracks shard assign") {
    val manifest = Packing.qShardManifest(spark, sfDir).collect()
    // same accounting as the assignment query
    val assign = Packing.qShardAssign(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    manifest.foreach { r =>
      assert(assign(r.getString(0)) == ((r.getLong(1), r.getLong(2))))
    }
    // bit_xor fold is order/partitioning independent: recompute the
    // checksum through a deliberately different partitioning
    val reparted = Tables.documents(spark, sfDir).repartition(7, col("source"))
      .select(substring(md5(concat(lit("shard:"), col("doc_id"))), 1, 1).as("shard"),
        expr("CAST(conv(substring(md5(text), 1, 13), 16, 10) AS LONG)").as("h52"))
      .groupBy("shard").agg(expr("bit_xor(h52)").as("ck")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    manifest.foreach(r => assert(reparted(r.getString(0)) == r.getLong(3)))
  }

  test("csv config round-trip equals the dim it was written from") {
    val back = graft.sources.CsvSource.qCsvConfig(spark, sfDir)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    val dim = Tables.nation(spark, sfDir)
      .select(col("n_nationkey").cast("long"), col("n_name"), col("n_regionkey").cast("long"))
    assert(back.exceptAll(dim).count() == 0 && dim.exceptAll(back).count() == 0)
  }

  test("interleave: round-robin positions, dense per-source ordinals, deterministic") {
    val rows = Packing.qInterleave(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val n = Tables.documents(spark, sfDir).count()
    assert(rows.length.toLong == n) // every document placed exactly once
    assert(rows.map(_._4).distinct.length == rows.length) // positions unique
    val bySource = rows.groupBy(_._2)
    val nSrc = bySource.size.toLong
    bySource.values.foreach { g =>
      // ordinals dense 1..|source|
      assert(g.map(_._3).sorted.sameElements(1L to g.length.toLong))
      // a source's k-th doc sits exactly n_sources after its (k-1)-th:
      // every prefix of the global order carries the mixture ratio
      val pos = g.sortBy(_._3).map(_._4)
      assert(pos.zip(pos.drop(1)).forall { case (a, b) => b - a == nSrc })
      // round-robin residue is the same for the whole source
      assert(pos.map(_ % nSrc).distinct.length == 1)
    }
    // content-stable: a rerun reproduces the exact layout
    val again = Packing.qInterleave(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.sameElements(again))
  }

  test("epoch shuffle: sharded positions equal the direct global ranking; epochs permute differently") {
    val rows = Packing.qEpochShuffle(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = Tables.documents(spark, sfDir).count()
    // each epoch is a complete permutation of 1..n
    val byEpoch = rows.groupBy(_._1)
    assert(byEpoch.keySet == Set(0L, 1L))
    byEpoch.values.foreach { es =>
      assert(es.map(_._3).sorted.sameElements(1L to n))
      assert(es.map(_._2).distinct.length == n.toInt)
    }
    // sharded computation ≡ direct global rank by (md5 key, doc_id)
    val md = java.security.MessageDigest.getInstance("MD5")
    def key(e: Long, id: Long): String =
      md.digest(s"$e:shuf:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
    byEpoch.foreach { case (e, es) =>
      val direct = es.map(_._2).sortBy(id => (key(e, id), id))
        .zipWithIndex.map { case (id, i) => id -> (i + 1L) }.toMap
      es.foreach { case (_, id, pos) => assert(direct(id) == pos) }
    }
    // the two epochs are genuinely different orders
    val p0 = byEpoch(0L).sortBy(_._3).map(_._2)
    val p1 = byEpoch(1L).sortBy(_._3).map(_._2)
    assert(!p0.sameElements(p1))
    // the corpus never pays a single-task global sort for positions:
    // the only unpartitioned window runs on the 256-row offset table
    val plan = Packing.qEpochShuffle(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("row_number"))
  }

  test("span corruption: one doc's plan replays scalar-side; overlap merging bounds hold") {
    def L(r: org.apache.spark.sql.Row, i: Int): Long =
      r.get(i).asInstanceOf[Number].longValue
    val rows = Packing.qSpanCorrupt(spark, sfDir).collect()
      .map(r => (L(r, 0), L(r, 1), L(r, 2), L(r, 3), L(r, 4)))
    assert(rows.nonEmpty && rows.exists(_._3 > 0)) // some spans planned
    rows.foreach { case (_, n, spans, masked, ppm) =>
      assert(masked <= 3 * spans && masked >= spans) // merge bounds
      assert(masked <= n && ppm == masked * 1000000L / n)
    }
    // exact replay of the densest doc
    val (docId, n, spans, masked, _) = rows.maxBy(_._3)
    val md = java.security.MessageDigest.getInstance("MD5")
    def hash4(i: Long): Long = {
      val hex = md.digest(s"$docId:sp:$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(4)
      java.lang.Long.parseLong(hex, 16)
    }
    val starts = (1L to n).filter(i => hash4(i) % 20 == 0)
    val maskedSet = starts.flatMap(i => i to math.min(i + 2, n)).toSet
    assert(spans == starts.length && masked == maskedSet.size)
  }

  test("fim split: spans partition every doc, both orderings occur, cuts replay exactly") {
    val rows = Packing.qFimSplit(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))
    assert(rows.nonEmpty)
    // the three spans partition the token sequence, all non-negative
    rows.foreach { case (_, n, p, m, s, _) =>
      assert(p >= 0 && m >= 0 && s >= 0 && p + m + s == n)
    }
    // the PSM/SPM coin is a real 50/50-ish split, not a constant
    val modes = rows.map(_._6).toSet
    assert(modes == Set("PSM", "SPM"))
    // exact replay of one doc's cut points from first principles
    val (docId, n, p, m, s, mode) = rows.maxBy(_._2)
    val md = java.security.MessageDigest.getInstance("MD5")
    def hash4(tag: String): Long = {
      val hex = md.digest(s"$tag$docId".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(4)
      java.lang.Long.parseLong(hex, 16)
    }
    val c1 = hash4("fim1:") % (n + 1)
    val c2 = hash4("fim2:") % (n + 1)
    assert(p == math.min(c1, c2) && m == math.abs(c1 - c2)
      && s == n - math.max(c1, c2))
    assert(mode == (if (hash4("fimm:") % 2 == 0) "SPM" else "PSM"))
  }

  test("pad waste: both policies replay exactly from token counts") {
    val ns = Tables.documents(spark, sfDir).select("text").collect()
      .map(_.getString(0).split("\\s+", -1).length.toLong)
    def pow2(n: Long): Long =
      Seq(16L, 32L, 64L, 128L, 256L, 512L).find(n <= _).getOrElse(1024L)
    val ref = (ns.map(n => ("pow2_bucket", pow2(n), n)) ++
      ns.map(n => ("fixed_128", 128L, n)))
      .groupBy(r => (r._1, r._2))
      .map { case ((pol, b), g) =>
        val kept = g.map(r => math.min(r._3, b)).sum
        val docs = g.length.toLong
        ((pol, b), (docs, kept, g.map(r => r._3 - math.min(r._3, b)).sum,
          docs * b, (docs * b - kept) * 1000000L / (docs * b)))
      }
    val rows = Packing.qPadWaste(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(rows == ref)
    // fixed policy is exactly one row covering every doc
    assert(rows.keys.count(_._1 == "fixed_128") == 1)
    assert(rows(("fixed_128", 128L))._1 == ns.length.toLong)
  }

  test("rag chunks: stride-48 starts, 64-cap sizes, full token coverage per doc") {
    val out = Packing.qRagChunks(spark, sfDir).cache()
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(split(col("text"), "\\s+")).cast("long").as("n"))
    // every doc contributes a tok_start=1 chunk (even sub-minimum ones)
    assert(out.filter(col("tok_start") === 1).count() == docs.count())
    // sizes: capped at 64; sub-16 only allowed at tok_start=1
    assert(out.filter(col("chunk_tokens") > 64).count() == 0)
    assert(out.filter(col("chunk_tokens") < 16 && col("tok_start") =!= 1).count() == 0)
    // starts are the arithmetic grid 1 + 48k
    assert(out.filter((col("tok_start") - 1) % 48 =!= 0).count() == 0)
    // coverage is exact: the furthest kept chunk ends at the doc's last token
    val cover = out.groupBy("doc_id")
      .agg(max(col("tok_start") + col("chunk_tokens") - 1).as("covered"))
      .join(docs, "doc_id")
    assert(cover.filter(col("covered") =!= col("n")).count() == 0)
    out.unpersist()
  }

  test("batch buckets: both policies cover the corpus once; accounting is internally consistent") {
    val out = Packing.qBatchBuckets(spark, sfDir).cache()
    val nDocs = Tables.documents(spark, sfDir).count()
    val rows = out.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // the naive scope holds every doc; the bucket_* scopes partition the same corpus
    assert(rows("naive")._2 == nDocs)
    assert(rows.filter(_._1 != "naive").values.map(_._2).sum == nDocs)
    // token mass conserved across policies
    val bucketTokens = rows.filter(_._1 != "naive").values.map(_._3).sum
    assert(bucketTokens == rows("naive")._3)
    rows.foreach { case (scope, (nb, nd, st, pad, ppm)) =>
      assert(nb >= 1 && pad >= 0, scope)
      // waste_ppm is the integer-div image of pad/(pad+tokens)
      assert(ppm == pad * 1000000L / (pad + st), scope)
      // each batch holds at most 32 docs
      assert(nd <= nb * 32, scope)
    }
    // bucketing strictly reduces aggregate padding on this corpus
    val bucketPad = rows.filter(_._1 != "naive").values.map(_._4).sum
    assert(bucketPad < rows("naive")._4)
    out.unpersist()
  }
}
