package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Clockwork
import graft.streaming.Clockwork.{Abort, Coalesced, GiveUp, Retry}

/** T4/T8/T9 pure scheduler logic. */
class ClockworkSpec extends AnyFunSuite {

  private def utcMs(h: Int, m: Int, s: Int = 0): Long =
    ((h * 60L + m) * 60 + s) * 1000 // any day: hour arithmetic is modular

  test("T9 nextAlignedFire: before :30 -> this hour's :30; at/after -> next hour's") {
    assert(Clockwork.nextAlignedFire(utcMs(10, 7)) == utcMs(10, 30))
    assert(Clockwork.nextAlignedFire(utcMs(10, 29, 59)) == utcMs(10, 30))
    assert(Clockwork.nextAlignedFire(utcMs(10, 30)) == utcMs(11, 30))
    assert(Clockwork.nextAlignedFire(utcMs(10, 45)) == utcMs(11, 30))
    // sub-minute precision: :30:00.000 exactly is "past"
    assert(Clockwork.sleepDuration(utcMs(10, 7), utcMs(10, 30)) == 23 * 60.0)
  }

  test("T8 retryDecision: transient and auth retried on the ladder, other 4xx abort") {
    // 429 walks the full ladder then gives up
    assert(Clockwork.retryDecision(Some(429), 0) == Retry(30))
    assert(Clockwork.retryDecision(Some(429), 1) == Retry(60))
    assert(Clockwork.retryDecision(Some(429), 2) == Retry(120))
    assert(Clockwork.retryDecision(Some(429), 3) == Retry(240))
    assert(Clockwork.retryDecision(Some(429), 4) == GiveUp)
    // 5xx transient, 401 auth (cookie hot-swap), network error: retryable
    assert(Clockwork.retryDecision(Some(503), 0) == Retry(30))
    assert(Clockwork.retryDecision(Some(401), 2) == Retry(120))
    assert(Clockwork.retryDecision(None, 1) == Retry(60))
    // other 4xx: no retry at any attempt
    assert(Clockwork.retryDecision(Some(404), 0) == Abort)
    assert(Clockwork.retryDecision(Some(418), 3) == Abort)
    assert(Clockwork.maxLadderSeconds == 450)
  }

  test("T4 coalesce: a notify burst collapses to one reconcile; quiet gap re-arms") {
    // 5 per-row notifies within 250 ms -> ONE reconcile absorbing all 5
    val burst = Seq(1000L, 1010L, 1050L, 1120L, 1240L)
    assert(Clockwork.coalesce(burst, 250) == Seq(Coalesced(1250L, 5)))
    // a second edit after the quiet window fires separately
    val two = burst ++ Seq(5000L, 5010L)
    assert(Clockwork.coalesce(two, 250) ==
      Seq(Coalesced(1250L, 5), Coalesced(5250L, 2)))
    // an empty stream never fires
    assert(Clockwork.coalesce(Nil, 250).isEmpty)
    // signals landing exactly at the fire instant are absorbed (<=)
    assert(Clockwork.coalesce(Seq(0L, 250L, 251L), 250) ==
      Seq(Coalesced(250L, 2), Coalesced(501L, 1)))
  }
}
