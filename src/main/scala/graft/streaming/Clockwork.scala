package graft.streaming

/** T4/T8/T9 — the scheduler-side pure logic from the reference's clockwork
  * and cerebro loops, as deterministic functions (the async sleeping /
  * HTTP around them is connector territory; the DECISIONS are engine
  * logic and unit-testable):
  *
  *  - T9 `nextAlignedFire` — the ":30 past the hour" archival trigger
  *    (src/clockworkScheduler.py:131-161);
  *  - T8 `retryDecision` — the archival retry ladder with its status-code
  *    classification (src/clockworkScheduler.py:175-238);
  *  - T4 `coalesce` — NOTIFY-burst debouncing into single reconciles via
  *    a quiet window (cerebro.py:315-332).
  */
object Clockwork {

  private val HourMs = 3600L * 1000
  private val HalfHourMs = 1800L * 1000

  // ---- T9: fixed-time trigger ---------------------------------------------

  /** Next execution instant: minute 30, second 0 of the current UTC hour,
    * or of the next hour if :30 has passed. Pure epoch-ms arithmetic —
    * UTC hours are exactly 3600 s, so no calendar needed. */
  def nextAlignedFire(nowMs: Long): Long = {
    val hourStart = nowMs - Math.floorMod(nowMs, HourMs)
    val thisHalf = hourStart + HalfHourMs
    if (nowMs < thisHalf) thisHalf else thisHalf + HourMs
  }

  /** Seconds to sleep until the target instant (clockwork's
    * calculate_sleep_duration). */
  def sleepDuration(nowMs: Long, nextMs: Long): Double =
    (nextMs - nowMs) / 1000.0

  // ---- T8: retry ladder ----------------------------------------------------

  /** Backoff delays per retry attempt (clockworkScheduler.py:190). */
  val BackoffSeconds: Vector[Int] = Vector(30, 60, 120, 240)
  val MaxRetries = 4

  sealed trait RetryDecision
  /** Transient/auth failure with attempts left: wait then retry. */
  case class Retry(delaySeconds: Int) extends RetryDecision
  /** Attempts exhausted on a retryable failure. */
  case object GiveUp extends RetryDecision
  /** Non-retryable failure (other 4xx / unexpected error). */
  case object Abort extends RetryDecision

  /** The reference's classification, exactly:
    *  - 429 / 5xx: transient → retry with ladder backoff;
    *  - 400 / 401 / 403: auth errors → ALSO retried (cookies can be
    *    hot-swapped between attempts);
    *  - other 4xx: no retry;
    *  - network error (no status): retry.
    * `attempt` is 0-based (0 = the initial try). */
  def retryDecision(status: Option[Int], attempt: Int,
                    maxRetries: Int = MaxRetries): RetryDecision = {
    val retryable = status match {
      case Some(s) => s == 429 || s >= 500 || s == 400 || s == 401 || s == 403
      case None => true // network error
    }
    if (!retryable) Abort
    else if (attempt < maxRetries) Retry(BackoffSeconds(math.min(attempt, BackoffSeconds.length - 1)))
    else GiveUp
  }

  /** Total worst-case wall clock a single item can hold the ladder:
    * Σ backoff — the feasibility input for sizing the hourly window. */
  def maxLadderSeconds: Int = BackoffSeconds.sum

  // ---- T4: debounce / burst coalescing -------------------------------------

  /** One debounced reconcile: fired at `fireAtMs`, having absorbed
    * `absorbed` notifies. */
  case class Coalesced(fireAtMs: Long, absorbed: Int)

  /** Collapse a burst of NOTIFY timestamps into reconcile firings, the
    * reference's coalescing-worker semantics: the FIRST signal arms the
    * worker, which sleeps `quietMs`, then reconciles once for everything
    * that landed in the window; signals after the fire re-arm it. A burst
    * of per-row trigger notifies (one logical edit) becomes one
    * reconcile, not N redundant passes. */
  def coalesce(notifyTimesMs: Seq[Long], quietMs: Long): Seq[Coalesced] = {
    val sorted = notifyTimesMs.sorted
    val out = Vector.newBuilder[Coalesced]
    var i = 0
    while (i < sorted.length) {
      val fireAt = sorted(i) + quietMs
      var j = i
      while (j < sorted.length && sorted(j) <= fireAt) j += 1
      out += Coalesced(fireAt, j - i)
      i = j
    }
    out.result()
  }
}
