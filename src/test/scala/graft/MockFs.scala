package graft

import java.net.URI
import java.util.concurrent.atomic.AtomicInteger

import org.apache.hadoop.fs.{Path, RawLocalFileSystem}

/** A Hadoop FileSystem registered under a NON-default `mock://` scheme
  * (local-disk backed), with rename/delete call instrumentation. The
  * sinks claim "any object store via `fs.<scheme>.impl` config, no code
  * change"; exercising them over `mock://` proves the claim beyond
  * `file://` — every Path round-trips through scheme resolution — and
  * the counters pin the rename-NOT-copy assumption (the one S3A breaks:
  * its "rename" is a server-side copy+delete, so a sink relying on
  * cheap atomic-ish renames must know it is making that assumption;
  * the compaction swap and the committer's task-commit moves are
  * exactly such renames). */
class MockFs extends RawLocalFileSystem {
  override def getUri: URI = URI.create("mock:///")
  override def getScheme: String = "mock"
  override def rename(src: Path, dst: Path): Boolean = {
    MockFs.renames.incrementAndGet()
    super.rename(src, dst)
  }
  override def delete(p: Path, recursive: Boolean): Boolean = {
    MockFs.deletes.incrementAndGet()
    super.delete(p, recursive)
  }
}

object MockFs {
  val renames = new AtomicInteger(0)
  val deletes = new AtomicInteger(0)
  def reset(): Unit = { renames.set(0); deletes.set(0) }
}
