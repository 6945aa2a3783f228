package graft.sources

/** Write-once landing area for the file-format round-trip queries
  * (CSV/JSON config, ORC, text lines, partitioned parquet).
  *
  * Each of those queries must first LAND data in its format before the
  * scan under test can read it. Landing into a fresh temp directory on
  * every invocation (a) re-runs the write job inside Bench's timed
  * window, so the reported "scan" seconds included a write, and (b)
  * leaks a directory per call (Bench runs each query 4+ times per
  * round). Instead: a deterministic path keyed by (sfDir, kind), the
  * write executed only if the `_LANDED` marker is absent — first call
  * lands, every later call (and every later Bench pass; the min-of-
  * passes estimator then times the pure read) just scans. The marker
  * is written AFTER the data so a crashed landing re-lands rather than
  * serving a partial directory.
  */
object Landing {

  private val landed = scala.collection.mutable.Set[String]()

  /** Returns the landing directory for (sfDir, kind), running `write`
    * first iff this (JVM, disk) has not landed it yet. */
  def dir(sfDir: String, kind: String)(write: String => Unit): String = synchronized {
    val safe = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    val path = s"${sys.props("java.io.tmpdir")}/graft_landing/$safe/$kind"
    if (!landed(path)) {
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
}
