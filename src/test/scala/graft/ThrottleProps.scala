package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.ops.TimeWindows

/** ScalaCheck properties for the distributed admission throttle
  * (TimeWindows.throttleKept): the greedy per-user recurrence is only
  * correct if EVERY row of a user reaches one partition in order, so
  * the kept set must be invariant to the physical partition count —
  * the repartition-boundary twin of SessionFoldProps' micro-batch
  * guard. Each sample runs the real Spark plan at 2, 8, and 32
  * shuffle partitions and compares against a driver-side reference
  * fold; Spark jobs are slow, so the sample count is small and the
  * generators lean on collision-heavy users/timestamps to exercise
  * ties and gap edges. */
object ThrottleProps extends Properties("Throttle") {

  // Each property fires 3 Spark jobs per sample — keep the count low.
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = SparkSpec.session

  private val gapUs = 100L

  // few users, tight timestamp range: plenty of same-user chains,
  // same-timestamp ties, and events exactly gapUs apart
  private val genEvents: Gen[List[(Long, Long, Long)]] =
    Gen.listOfN(120, for {
      u <- Gen.chooseNum(0L, 4L)
      us <- Gen.chooseNum(0L, 500L).map(x => x - x % 25) // multiples of 25 ⇒ exact-gap hits
    } yield (u, us)).map(_.zipWithIndex.map { case ((u, us), i) => (u, i.toLong, us) })

  /** The sequential semantics: per user in (us, event_id) order, keep
    * iff first or ≥ gap after the last KEPT event. */
  private def referenceKept(rows: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] =
    rows.groupBy(_._1).valuesIterator.flatMap { es =>
      var lastKept = Long.MinValue
      var first = true
      es.sortBy(e => (e._3, e._2)).filter { case (_, _, us) =>
        if (first || us >= lastKept + gapUs) { lastKept = us; first = false; true }
        else false
      }
    }.toSet

  private def sparkKept(rows: Seq[(Long, Long, Long)], partitions: Int): Set[(Long, Long, Long)] = {
    val key = "spark.sql.shuffle.partitions"
    val old = spark.conf.get(key)
    spark.conf.set(key, partitions.toString)
    try {
      import spark.implicits._
      val ds = rows.toDF("user_id", "event_id", "us").as[(Long, Long, Long)]
      TimeWindows.throttleKept(ds, gapUs).collect().toSet
    } finally spark.conf.set(key, old)
  }

  property("kept set is partition-count-invariant and equals the sequential fold") =
    forAll(genEvents) { rows =>
      val ref = referenceKept(rows)
      Seq(2, 8, 32).forall(np => sparkKept(rows, np) == ref)
    }
}
