package graft.sources

/** Write-once landing area for the file-format round-trip queries
  * (CSV/JSON config, ORC, text lines, partitioned parquet) and the
  * shared pair/edge artifacts (lsh_pairs_v1, lift_edges_v1).
  *
  * Each of those queries must first LAND data in its format before the
  * scan under test can read it. Landing into a fresh temp directory on
  * every invocation (a) re-runs the write job inside Bench's timed
  * window, so the reported "scan" seconds included a write, and (b)
  * leaks a directory per call (Bench runs each query 4+ times per
  * round). Instead: a deterministic path keyed by (sfDir fingerprint,
  * kind), the write executed only if the `_LANDED` marker is absent —
  * first call lands, every later call (and every later Bench pass; the
  * min-of-passes estimator then times the pure read) just scans. The
  * marker is written AFTER the data so a crashed landing re-lands
  * rather than serving a partial directory.
  *
  * The key folds in a SOURCE-DATA FINGERPRINT (name+size+mtime of every
  * file under sfDir, one level deep) so a regenerated corpus at the
  * same path invalidates the artifact automatically: the old failure
  * mode was a stale artifact from a prior corpus silently served to the
  * consumer queries while their oracles computed fresh from the new
  * data. Metadata-only, so the fingerprint costs microseconds — no
  * content read, no Spark job.
  */
object Landing {

  private val landed = scala.collection.mutable.Set[String]()

  /** Hex digest of (name, length, mtime) for every file under `sfDir`,
    * one level deep (the testdata tables are flat parquet files; a
    * directory entry contributes its own mtime plus its children's).
    * Stable across JVMs for an unchanged corpus; any regeneration —
    * even same-size — bumps mtime and re-keys the landing. */
  private def fingerprint(sfDir: String): String = {
    def entries(f: java.io.File): Seq[String] = {
      val kids = Option(f.listFiles()).map(_.toSeq).getOrElse(Seq.empty).sortBy(_.getName)
      kids.flatMap { k =>
        if (k.isFile) Seq(s"${k.getName}:${k.length}:${k.lastModified}")
        else s"${k.getName}/:${k.lastModified}" +: Option(k.listFiles())
          .map(_.toSeq).getOrElse(Seq.empty).sortBy(_.getName)
          .filter(_.isFile).map(g => s"${k.getName}/${g.getName}:${g.length}:${g.lastModified}")
      }
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    entries(new java.io.File(sfDir)).foreach(e => md.update(e.getBytes("UTF-8")))
    md.digest().map("%02x".format(_)).mkString.take(16)
  }

  /** Returns the landing directory for (sfDir, kind), running `write`
    * first iff this (JVM, disk) has not landed it for the CURRENT
    * corpus content yet. Landing under a NEW fingerprint first deletes
    * every sibling directory for the same sfDir with a different
    * fingerprint: a regenerated corpus re-keys the landing (the r5
    * staleness fix), and without the sweep each regeneration stranded
    * a full artifact set (lsh_pairs, lift_edges, ngram_pairs, format
    * fixtures) under the dead key — bounded per round but monotone
    * across rounds on a long-lived machine. */
  def dir(sfDir: String, kind: String)(write: String => Unit): String = synchronized {
    val safe = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    val fpDir = s"$safe-${fingerprint(sfDir)}"
    val root = new java.io.File(s"${sys.props("java.io.tmpdir")}/graft_landing")
    val path = s"$root/$fpDir/$kind"
    if (!landed(path)) {
      Option(root.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith(s"$safe-") && f.getName != fpDir)
        .foreach(deleteRecursively)
      val marker = new java.io.File(path, "_LANDED")
      if (!marker.exists()) {
        write(path)
        marker.getParentFile.mkdirs()
        marker.createNewFile()
      }
      landed += path
    }
    path
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete()
  }
}
