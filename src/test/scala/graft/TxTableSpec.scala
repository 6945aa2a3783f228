package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.sinks.TxTable

/** Commit-log table protocol: multi-writer safety, torn-read
  * impossibility, crashed-writer reclamation, transactional
  * compaction, write-once initialization. */
class TxTableSpec extends SparkSpec {

  private def freshTable(tag: String): String = {
    val d = Files.createTempDirectory(s"graft_tx_${tag}_").toString
    new java.io.File(d).delete() // TxTable creates its own layout
    d
  }

  private def frame(ids: Range) = {
    import spark.implicits._
    ids.map(i => (i.toLong, s"row_$i")).toDF("id", "payload")
  }

  test("append/read roundtrip: versions are contiguous, later appends visible") {
    val t = freshTable("rt")
    assert(TxTable.append(frame(0 until 10), t) == 0L)
    assert(TxTable.append(frame(10 until 15), t) == 1L)
    assert(TxTable.read(spark, t).count() == 15)
    assert(TxTable.read(spark, t, asOf = 0L).count() == 10)
    assert(TxTable.commits(spark, t).map(_.version) == Seq(0L, 1L))
  }

  test("two concurrent appenders: every commit lands, versions serialize with no lost update") {
    val t = freshTable("mw")
    val perWriter = 6
    val writers = (0 until 2).map { w =>
      new Thread(() => {
        (0 until perWriter).foreach { i =>
          val lo = (w * perWriter + i) * 100
          TxTable.append(frame(lo until lo + 100), t)
        }
      })
    }
    writers.foreach(_.start()); writers.foreach(_.join())
    val cs = TxTable.commits(spark, t)
    assert(cs.map(_.version) == (0L until 2L * perWriter))
    // no lost update: every staged row set is live exactly once
    val ids = TxTable.read(spark, t).select("id").collect().map(_.getLong(0))
    assert(ids.length == 2 * perWriter * 100 && ids.distinct.length == ids.length)
  }

  test("crashed writer: staged-but-uncommitted data is invisible; vacuum reclaims it, TTL protects in-flight") {
    val t = freshTable("crash")
    TxTable.append(frame(0 until 10), t)
    // simulate a writer that died after staging, before claiming
    frame(1000 until 1100).write.parquet(s"$t/data/dead-attempt")
    assert(TxTable.read(spark, t).count() == 10, "uncommitted staging leaked into a read")
    // a generous TTL keeps it (could be an in-flight writer)...
    assert(TxTable.vacuum(spark, t, ttlMs = 60000).isEmpty)
    // ...a zero TTL reclaims it
    assert(TxTable.vacuum(spark, t, ttlMs = 0) == Seq("data/dead-attempt"))
    assert(!Files.exists(Paths.get(s"$t/data/dead-attempt")))
    assert(TxTable.read(spark, t).count() == 10)
  }

  test("torn read impossible: a header-only (unterminated) commit file is not part of any snapshot") {
    val t = freshTable("torn")
    TxTable.append(frame(0 until 10), t)
    // an HDFS-style claimant mid-content-write: header but no `end`
    Files.write(Paths.get(s"$t/_txlog/${"%020d".format(1)}.txn"),
      "graft-txn-v1\nop=append\nadd=data/half/part-0.parquet\n".getBytes)
    assert(TxTable.commits(spark, t).map(_.version) == Seq(0L))
    assert(TxTable.read(spark, t).count() == 10)
    // and a commit BEYOND a contiguity gap is likewise excluded
    Files.write(Paths.get(s"$t/_txlog/${"%020d".format(3)}.txn"),
      "graft-txn-v1\nop=append\nadd=data/gap/part-0.parquet\nend\n".getBytes)
    assert(TxTable.commits(spark, t).map(_.version) == Seq(0L))
  }

  test("replaceCompact: one commit swaps the file set; rows identical; old version still time-travels") {
    val t = freshTable("compact")
    (0 until 4).foreach(i => TxTable.append(frame(i * 50 until (i + 1) * 50), t))
    val before = TxTable.files(spark, t)
    assert(before.length > 1)
    val v = TxTable.replaceCompact(spark, t, nOut = 1)
    assert(v == 4L)
    val after = TxTable.files(spark, t)
    assert(after.length == 1 && after.intersect(before).isEmpty)
    val live = TxTable.read(spark, t).select("id").collect().map(_.getLong(0)).sorted
    assert(live.toSeq == (0L until 200L))
    // time travel to the pre-compaction snapshot
    assert(TxTable.read(spark, t, asOf = 3L).count() == 200)
    assert(TxTable.files(spark, t, asOf = 3L) == before)
    // dropRemoved vacuum reclaims the superseded files
    val dropped = TxTable.vacuum(spark, t, ttlMs = 0, dropRemoved = true)
    assert(dropped.toSet == before.toSet)
  }

  test("compaction claim races a concurrent append: the append is never dropped") {
    val t = freshTable("occ")
    (0 until 3).foreach(i => TxTable.append(frame(i * 10 until (i + 1) * 10), t))
    // interleave: start compaction and an append concurrently, many rounds
    val appender = new Thread(() => {
      (0 until 4).foreach(i => TxTable.append(frame(1000 + i * 10 until 1010 + i * 10), t))
    })
    appender.start()
    (0 until 2).foreach(_ => TxTable.replaceCompact(spark, t, nOut = 1))
    appender.join()
    TxTable.replaceCompact(spark, t, nOut = 1)
    val ids = TxTable.read(spark, t).select("id").collect().map(_.getLong(0))
    assert(ids.length == 70 && ids.distinct.length == 70,
      s"rows lost or duplicated across compaction/append races: ${ids.length}")
  }

  test("commitOnce: exactly one concurrent initializer wins; loser's staging is reclaimed immediately") {
    val t = freshTable("once")
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Boolean]()
    val threads = (0 until 3).map { w =>
      new Thread(() => results.add(TxTable.commitOnce(frame(w * 100 until w * 100 + 10), t)))
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    import scala.jdk.CollectionConverters._
    assert(results.asScala.count(identity) == 1)
    assert(TxTable.commits(spark, t).map(_.version) == Seq(0L))
    assert(TxTable.read(spark, t).count() == 10)
    // losers cleaned up after themselves: only the winner's staging dir remains
    val staged = new java.io.File(s"$t/data").listFiles().filter(_.isDirectory)
    assert(staged.length == 1)
    // a later commitOnce is a no-op without staging anything
    assert(!TxTable.commitOnce(frame(0 until 5), t))
    assert(new java.io.File(s"$t/data").listFiles().count(_.isDirectory) == 1)
  }

  test("empty table reads throw with the table named; asOf past a dropRemoved vacuum throws on read") {
    val t = freshTable("empty")
    val ex = intercept[IllegalArgumentException] { TxTable.read(spark, t) }
    assert(ex.getMessage.contains(t))
  }
}
