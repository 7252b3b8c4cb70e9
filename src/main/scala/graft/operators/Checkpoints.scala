package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Storage hygiene for `localCheckpoint()`ed frames.
  *
  * `Dataset.unpersist` only talks to the CacheManager — which never sees
  * a checkpoint: the checkpointed plan is a `LogicalRDD` whose underlying
  * RDD holds the persisted blocks directly, so `df.unpersist()` on it
  * releases nothing. Iterative operators that checkpoint once per round
  * (connected components, BPE training) must release the PREVIOUS round's
  * blocks through the RDD itself or executor storage grows linearly with
  * rounds.
  *
  * Safety note: the caller must have already materialized every frame
  * derived from the released one (localCheckpoint is eager, so the next
  * round's checkpoint holds its own blocks). localCheckpoint is
  * explicitly not fault-tolerant — losing a later block after its parent
  * was released is the same executor-loss exposure localCheckpoint
  * already signs up for. */
object Checkpoints {

  /** Release the persisted blocks behind a localCheckpoint()ed frame.
    * Matches ONLY a LogicalRDD at the plan ROOT — i.e. the frame handed
    * in must itself be the checkpoint, not something derived from one. A
    * whole-plan traversal here would silently release every checkpointed
    * INPUT of a derived frame, including checkpoints other live frames
    * still share; restricting to the root turns that misuse into a LOUD
    * IllegalArgumentException (there is no silent branch — any non-
    * LogicalRDD root throws, never-checkpointed frames included), so the
    * contract callers must meet is: pass exactly the frame
    * localCheckpoint() returned. Non-blocking. */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case other => throw new IllegalArgumentException(
        "Checkpoints.release expects a frame whose plan root is the " +
          s"localCheckpoint LogicalRDD; got ${other.nodeName}. Release the " +
          "checkpointed frame itself, not a frame derived from it.")
    }
}
