package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A BOUNDED per-(session, dir) memo of localCheckpoint()ed frames — the
  * [[graft.Tables]] LRU discipline applied to checkpoint caches, plus the
  * one thing Tables doesn't need: eviction RELEASES the evicted frame's
  * persisted blocks through [[Checkpoints.release]] (a resolved plan
  * costs nothing to drop; a checkpoint pins executor storage until
  * someone unpersists the backing RDD).
  *
  * Why this exists: `TrieMap.getOrElseUpdate` memos of checkpointed
  * frames (the r12 `overlapCache` shape) leak exactly the block class
  * this repo bounds everywhere else — a long-lived multi-dir service
  * accumulates checkpointed edge tables without limit. LRU by ACCESS
  * order so hot suite keys survive churn; one lock, planning-path
  * frequency only (a handful of lookups per suite), never per-row.
  *
  * Safety: an evicted frame's blocks are released non-blocking, so a
  * caller still holding the old DataFrame reference races recompute-
  * from-nothing (localCheckpoint is not recoverable). That is the same
  * contract [[Checkpoints.release]] already states; at the default
  * bound of 64 keys an eviction only fires after 64 DISTINCT
  * (session, dir) pairs — far past any suite or service working set —
  * so the race is theoretical, and the bound is the point. */
final class CheckpointMemo(name: String, maxEntries: Int = 64) {
  private val memo =
    new java.util.LinkedHashMap[(SparkSession, String), DataFrame](
      16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(SparkSession, String), DataFrame]): Boolean =
        if (size() > maxEntries) {
          // Best-effort: a stopped session throws on unpersist; the entry
          // must still drop or the map wedges at capacity. NonFatal only —
          // a VM error (OOM, thread interrupt) must propagate, not be
          // eaten by cache bookkeeping.
          try Checkpoints.release(e.getValue)
          catch { case scala.util.control.NonFatal(_) => () }
          true
        } else false
    }

  CacheRegistry.register(name, maxEntries, () => memo.synchronized(memo.size()))

  /** Memoized checkpoint build. `build` MUST return the frame
    * localCheckpoint() itself returned (the [[Checkpoints.release]]
    * root contract). Built OUTSIDE the lock: localCheckpoint is an
    * eager Spark job, and holding a map lock across it would serialize
    * unrelated dirs behind one mining pass. The double-check on re-lock
    * keeps one winner per key; a losing concurrent build releases its
    * orphan checkpoint instead of leaking it. */
  def getOrElseUpdate(s: SparkSession, d: String,
                      build: => DataFrame): DataFrame = {
    val k = (s, d)
    val hit = memo.synchronized(memo.get(k))
    if (hit != null) hit
    else {
      val built = build
      memo.synchronized {
        val winner = memo.get(k)
        if (winner != null) {
          try Checkpoints.release(built)
          catch { case scala.util.control.NonFatal(_) => () }
          winner
        } else { memo.put(k, built); built }
      }
    }
  }

  private[graft] def size: Int = memo.synchronized(memo.size())
}
