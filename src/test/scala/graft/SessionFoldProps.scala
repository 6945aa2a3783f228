package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.streaming.Streams
import graft.streaming.Streams.SessionState

/** ScalaCheck properties over the pure session fold — the invariants
  * that make BOTH sessionization forms trustworthy: the batch query
  * (Analytics.qSessionize) and the stateful streaming operator
  * (Streams.sessionizeWithState) must agree because session
  * assignment depends only on the ordered event-time stream, never on
  * how the stream was chopped into micro-batches. No Spark session
  * needed — hundreds of cases run in milliseconds. */
object SessionFoldProps extends Properties("SessionFold") {

  private val gap = 100L

  // ascending event times with occasional >gap jumps
  private val genTimes: Gen[List[Long]] =
    Gen.listOfN(80, Gen.chooseNum(1L, 150L)).flatMap { deltas =>
      Gen.choose(0, deltas.length).map { n =>
        deltas.take(n).scanLeft(0L)(_ + _).tail
      }
    }

  private def foldAll(times: Seq[Long]): Seq[SessionState] = {
    val (open, closed) = Streams.foldSessions(None, times, gap)
    closed ++ open.toSeq
  }

  property("micro-batch boundaries never change the sessions (ordered arrival)") =
    forAll(genTimes, Gen.chooseNum(0, 80)) { (times, cut) =>
      val k = math.min(cut, times.length)
      val (b1, b2) = times.splitAt(k)
      val (openAfter1, closed1) = Streams.foldSessions(None, b1, gap)
      val (openAfter2, closed2) = Streams.foldSessions(openAfter1, b2, gap)
      (closed1 ++ closed2 ++ openAfter2.toSeq) == foldAll(times)
    }

  property("sessions partition the events: counts conserve, bounds nest, gaps split") =
    forAll(genTimes) { times =>
      val sessions = foldAll(times)
      val countsOk = sessions.map(_.n).sum == times.length
      val boundsOk = sessions.forall(s => s.startUs <= s.lastUs)
      val orderedOk = sessions.sliding(2).forall {
        case Seq(a, b) => b.startUs - a.lastUs > gap // split only at real gaps
        case _ => true
      }
      val internalOk = {
        // within a session no consecutive pair exceeds the gap
        val byStart = sessions.map(s => (s.startUs, s.lastUs)).toSet
        times.sorted.sliding(2).forall {
          case Seq(a, b) =>
            b - a <= gap || byStart.exists(_._1 == b) // a real break starts a session
          case _ => true
        }
      }
      countsOk && boundsOk && orderedOk && internalOk
    }

  property("empty batch is the identity on state") =
    forAll(Gen.option(Gen.chooseNum(0L, 1000L))) { seed =>
      val open = seed.map(t => SessionState(t, t + 10, 2))
      Streams.foldSessions(open, Seq.empty, gap) == ((open, Seq.empty))
    }
}
