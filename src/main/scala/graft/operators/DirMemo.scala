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

  /** Build-outside-the-lock memoization: the lock is held only for map
    * reads/writes, never across `build` (which may be a multi-second
    * Spark job — holding the lock across one would serialize unrelated
    * dirs; the cross-latch handshake in CacheAuditSpec pins this). A
    * losing concurrent build passes through `onEvict`.
    *
    * On validate-or-rebuild (the r14 `computeValidated` experiment,
    * removed in r16 with no production caller ever materializing):
    * prefer PATH values — a scratch path is session-independent and
    * eviction-safe by construction (the r15 bloomStanding migration) —
    * and for values that must be session-bound, key the memo by the
    * session INSTANCE ([[CheckpointMemo]]'s shape: a restarted session
    * misses instead of serving dropped blocks), which makes a liveness
    * predicate structurally unnecessary. */
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

  private[graft] def size: Int = memo.synchronized(memo.size())
}
