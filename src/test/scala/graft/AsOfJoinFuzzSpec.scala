package graft

import graft.plans.AsOf

/** Randomized (fixed-seed, deterministic) equivalence for the as-of
  * operator: seeded scenarios driven through BOTH physical paths and
  * BOTH directions, with and without a tolerance bound, compared
  * against a brute-force in-memory reference. Complements the
  * example-based AsOfJoinSpec the way the repo's other fuzz suites
  * (TopKProps, IntervalMergeProps) complement theirs.
  */
class AsOfJoinFuzzSpec extends SparkSpec {

  /** Brute force: per left row, filter admissible candidates and pick
    * the extreme (time, tiebreak) — max for backward, min for forward. */
  private def reference(
      left: Seq[(Long, Long, Long)],      // (id, key, t)
      right: Seq[(Long, Long, String)],   // (key, t, v)
      forward: Boolean,
      bound: Option[Long],
      allowExact: Boolean): Map[Long, Option[String]] =
    left.map { case (id, k, t) =>
      val cands = right.filter { case (rk, rt, _) =>
        rk == k && (
          if (forward)
            (if (allowExact) rt >= t else rt > t) && bound.forall(b => rt <= t + b)
          else
            (if (allowExact) rt <= t else rt < t) && bound.forall(b => rt >= t - b))
      }
      val pick =
        if (cands.isEmpty) None
        else if (forward) Some(cands.minBy { case (_, rt, v) => (rt, v) }._3)
        else Some(cands.maxBy { case (_, rt, v) => (rt, v) }._3)
      id -> pick
    }.toMap

  test("seeded random scenarios: engine ≡ brute force over both paths × directions × bounds") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260813L)
    for (iter <- 1 to 10) {
      val nKeys = 1 + rnd.nextInt(6)
      val left = (0 until (5 + rnd.nextInt(40)))
        .map(i => (i.toLong, rnd.nextInt(nKeys).toLong, rnd.nextInt(40).toLong))
      val right = (0 until rnd.nextInt(40))
        .map(i => (rnd.nextInt(nKeys).toLong, rnd.nextInt(40).toLong, s"v$i"))
      val bound = if (rnd.nextBoolean()) Some(1L + rnd.nextInt(10)) else None
      val exact = rnd.nextBoolean()
      val ldf = left.toDF("id", "k", "t")
      val rdf = right.toDF("rk", "rt", "v")
      for (forward <- Seq(false, true); hint <- Seq(Some(true), Some(false))) {
        val df =
          if (forward)
            AsOf.joinNext(ldf, rdf, Seq("k"), Seq("rk"), "t", "rt",
              Seq("v"), bound.map(b => s"t + $b"), hint, allowExact = exact)
          else
            AsOf.joinLatest(ldf, rdf, Seq("k"), Seq("rk"), "t", "rt",
              Seq("v"), bound.map(b => s"t - $b"), hint, allowExact = exact)
        val got = df.select("id", "v").collect()
          .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
        val want = reference(left, right, forward, bound, exact)
        assert(got == want,
          s"iter=$iter forward=$forward hint=$hint bound=$bound exact=$exact\nleft=$left\nright=$right")
      }
      // nearest direction: closest absolute distance, ties to backward,
      // within-side ties to the directional tiebreak, bounded by maxDist
      val maxDist = if (rnd.nextBoolean()) Some(1L + rnd.nextInt(8)) else None
      for (hint <- Seq(Some(true), Some(false))) {
        val got = AsOf.joinNearest(ldf, rdf, Seq("k"), Seq("rk"), "t", "rt",
            Seq("v"), maxDist, hint)
          .select("id", "v").collect()
          .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
        val want = left.map { case (id, k, t) =>
          val cands = right.filter { case (rk, rt, _) =>
            rk == k && maxDist.forall(d => math.abs(rt - t) <= d) }
          val pick =
            if (cands.isEmpty) None
            else {
              val best = cands.map { case (_, rt, v) => (math.abs(rt - t), rt > t, v) }
              // distance asc, backward (false) before forward (true),
              // then max tiebreak backward / min tiebreak forward
              val (d0, f0, _) = best.minBy { case (d, f, _) => (d, f) }
              val side = best.filter { case (d, f, _) => d == d0 && f == f0 }
              Some(if (f0) side.map(_._3).min else side.map(_._3).max)
            }
          id -> pick
        }.toMap
        assert(got == want,
          s"iter=$iter nearest hint=$hint maxDist=$maxDist\nleft=$left\nright=$right")
      }
    }
  }
}
