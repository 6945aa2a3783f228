package graft

import java.io.File

import org.apache.spark.sql.functions._

import graft.sources.Landing

/** Crash-consistency contract of the write-once Landing area (the
  * mechanism behind the format round-trip queries AND the landed
  * near-dup pair artifacts): the `_LANDED` marker is written AFTER the
  * data, so a landing that crashed mid-write must re-land on the next
  * call instead of serving a partial directory — and a completed
  * landing must never re-run its writer. */
class LandingSpec extends SparkSpec {

  private def freshSfDir(): String =
    java.nio.file.Files.createTempDirectory("graft_landing_sf_").toString

  test("landing runs the writer once, then serves the artifact without re-running") {
    val sf = freshSfDir()
    var writes = 0
    def land() = Landing.dir(sf, "spec_once") { path =>
      writes += 1
      Tables.region(spark, sfDir).write.parquet(path)
    }
    val d1 = land()
    val d2 = land()
    assert(d1 == d2 && writes == 1)
    assert(spark.read.parquet(d1).count() == 5)
    assert(new File(d1, "_LANDED").exists())
  }

  test("a crashed landing (data without marker) re-lands instead of serving partial data") {
    val sf = freshSfDir()
    // simulate the crash: first writer dies AFTER writing partial data
    // but BEFORE the marker
    intercept[RuntimeException] {
      Landing.dir(sf, "spec_crash") { path =>
        Tables.region(spark, sfDir).limit(2).write.parquet(path)
        throw new RuntimeException("crash before marker")
      }
    }
    // the partial directory exists but is unmarked
    var relanded = false
    val dir = Landing.dir(sf, "spec_crash") { path =>
      relanded = true
      Tables.region(spark, sfDir).write.mode("overwrite").parquet(path)
    }
    assert(relanded, "unmarked partial landing was served as complete")
    assert(spark.read.parquet(dir).count() == 5)
    assert(new File(dir, "_LANDED").exists())
  }

  test("regeneration leaves exactly one fingerprint directory per sfDir") {
    val sf = freshSfDir()
    val root = new File(s"${sys.props("java.io.tmpdir")}/graft_landing")
    def fpDirs() = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory &&
        f.getName.startsWith(sf.replaceAll("[^A-Za-z0-9.]", "_") + "-"))
      .map(_.getName).toSeq
    def land() = Landing.dir(sf, "spec_prune") { path =>
      Tables.region(spark, sfDir).write.mode("overwrite").parquet(path)
    }
    land()
    val before = fpDirs()
    assert(before.size == 1)
    // regenerate the corpus: touching a file bumps its mtime, which
    // re-keys the fingerprint; the stale sibling must be swept
    val probe = new File(sf, "regen_probe.parquet")
    probe.createNewFile()
    probe.setLastModified(System.currentTimeMillis() + 5000)
    land()
    val after = fpDirs()
    assert(after.size == 1, s"stale fingerprint dirs not pruned: $after")
    assert(after.head != before.head, "fingerprint did not re-key on regeneration")
    assert(new File(new File(root, after.head), "spec_prune/_LANDED").exists())
  }

  test("the landed dedup pair artifact equals the live pair pipeline output") {
    // the contract the dedup family relies on: reading the artifact is
    // indistinguishable from running qMinhashNeardup
    val live = graft.ops.Quality.qMinhashNeardup(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    val landed = graft.ops.Quality.neardupPairs(spark, sfDir)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    assert(landed == live)
  }
}
