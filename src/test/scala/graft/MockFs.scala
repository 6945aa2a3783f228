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

/** The same instrumented local-backed FS registered under the LITERAL
  * `s3a` scheme with a BUCKET AUTHORITY (`s3a://test-bucket/...`), so
  * scheme-specific URI handling is pinned exactly as an S3A user would
  * hit it: authority parsing (the bucket must survive qualification
  * and the FileSystem cache key, and must NOT leak into the path), the
  * rename/delete call pattern the sinks assume, AND Spark's
  * scheme-dispatched listing path — `spark.sql.files
  * .useListFilesFileSystemList` defaults to `s3a`, so s3a paths list
  * through `FileSystem.listFiles`/`listLocatedStatus`, a code path the
  * generic mock:// scheme never exercises. Statuses are returned with
  * permissions/owner pre-materialized, exactly as real S3A does
  * (object stores have no POSIX permissions; S3A fabricates them) —
  * RawLocalFileSystem's lazy permission load cannot handle non-file
  * URIs, and an object-store FS must never hand out lazy statuses. */
class S3aMockFs extends MockFs {
  override def getUri: URI = URI.create("s3a://test-bucket/")
  override def getScheme: String = "s3a"

  private def loaded(st: org.apache.hadoop.fs.FileStatus): org.apache.hadoop.fs.FileStatus =
    new org.apache.hadoop.fs.FileStatus(st.getLen, st.isDirectory, st.getReplication,
      st.getBlockSize, st.getModificationTime, st.getAccessTime,
      org.apache.hadoop.fs.permission.FsPermission.valueOf(
        if (st.isDirectory) "drwxr-xr-x" else "-rw-r--r--"),
      "graft", "graft", st.getPath)

  override def getFileStatus(p: Path): org.apache.hadoop.fs.FileStatus =
    loaded(super.getFileStatus(p))

  override def listStatus(p: Path): Array[org.apache.hadoop.fs.FileStatus] =
    super.listStatus(p).map(loaded)
}
