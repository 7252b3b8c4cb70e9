package graft.operators

/** BOUNDED per-data-dir memo — the standard holder for "built once per
  * corpus dir" serving state (stored-index paths, planning sketches, the
  * odd checkpointed standing frame). Replaces the two dozen raw
  * `ConcurrentHashMap[String, _]` memos the query packs accumulated:
  * each of those was keyed by data dir and grew without limit in a
  * long-lived multi-corpus service — exactly the leak class the r12/r13
  * rounds fixed one instance at a time (`Tables`, `overlapCache`,
  * `DupEdges`). This class is the uniform fix: LRU by ACCESS order with
  * a hard entry bound, self-registered in [[CacheRegistry]] so
  * `CacheAuditSpec` both enumerates it and asserts the bound live.
  *
  * Eviction semantics: values are almost always scratch PATHS (strings —
  * the artifact stays on disk under [[graft.Scratch]]'s shutdown-hook
  * root), so eviction costs a rebuild on next access, never correctness.
  * The optional `onEvict` hook covers the exceptions (e.g. releasing a
  * checkpointed frame's blocks); it is NonFatal-guarded like
  * [[CheckpointMemo]]'s — a VM error must propagate, a stopped-session
  * unpersist failure must not wedge the map.
  *
  * Concurrency: same discipline as [[CheckpointMemo]] — builds run
  * OUTSIDE the lock (index builds are multi-second Spark jobs; holding a
  * map lock across one would serialize unrelated dirs), with a
  * double-check on re-lock keeping one winner per key. A losing
  * concurrent build's value is handed to `onEvict` (for paths a no-op;
  * the orphan scratch dir is reclaimed by the shutdown hook). */
final class DirMemo[V](name: String, maxEntries: Int = 64,
                       onEvict: V => Unit = (_: V) => ()) {
  private def safeEvict(v: V): Unit =
    try onEvict(v) catch { case scala.util.control.NonFatal(_) => () }

  private val memo =
    new java.util.LinkedHashMap[String, V](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, V]): Boolean =
        if (size() > maxEntries) { safeEvict(e.getValue); true } else false
    }

  CacheRegistry.register(name, maxEntries, () => memo.synchronized(memo.size()))

  def computeIfAbsent(k: String, build: String => V): V = {
    val hit = memo.synchronized(memo.get(k))
    if (hit != null) hit
    else {
      val built = build(k)
      memo.synchronized {
        val winner = memo.get(k)
        if (winner != null) { safeEvict(built); winner }
        else { memo.put(k, built); built }
      }
    }
  }

  /** Validate-or-rebuild with the SAME build-outside-the-lock discipline
    * as [[computeIfAbsent]]: only the (cheap) `isLive` predicate runs
    * under the lock — e.g. "is the cached frame's SparkContext still
    * running" — never `build`, which may be a multi-second Spark job.
    * On a stale or missing entry the build runs unlocked, then re-locks
    * and double-checks: a concurrently installed LIVE winner beats our
    * build (ours is handed to `onEvict`); a stale incumbent is evicted
    * and replaced. At most one value per key survives; stale and losing
    * values always pass through `safeEvict`, so resource-holding values
    * (checkpointed frames) are released on every exit path.
    *
    * Prefer PATH values + [[computeIfAbsent]] where possible: a scratch
    * path is session-independent and eviction-safe by construction (the
    * r15 bloomStanding migration), so it needs no liveness predicate.
    * This method is for values that genuinely must be session-bound
    * (live frames, open handles) — it is spec-covered
    * (CacheAuditSpec) and currently has no production caller. */
  def computeValidated(k: String, isLive: V => Boolean,
                       build: String => V): V = {
    val hit = memo.synchronized {
      val v = memo.get(k)
      if (v != null && isLive(v)) v else null.asInstanceOf[V]
    }
    if (hit != null) hit
    else {
      val built = build(k)
      memo.synchronized {
        val winner = memo.get(k)
        if (winner != null && isLive(winner)) { safeEvict(built); winner }
        else {
          if (winner != null) safeEvict(winner)
          memo.put(k, built)
          built
        }
      }
    }
  }

  private[graft] def size: Int = memo.synchronized(memo.size())
}
