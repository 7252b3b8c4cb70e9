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

  /** Release the persisted blocks behind a localCheckpoint()ed frame
    * (no-op for plans without a LogicalRDD). Non-blocking. */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
