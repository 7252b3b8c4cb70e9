package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
import org.apache.spark.sql.classic.{Dataset => ClassicDataset}
import org.apache.spark.sql.execution.LogicalRDD

/** `localCheckpoint()` that KEEPS the frame's hash partitioning visible
  * to the planner.
  *
  * Under AQE, `Dataset.localCheckpoint` reads the physical plan's
  * `outputPartitioning` through `AdaptiveSparkPlanExec`, which reports
  * `UnknownPartitioning` — so a frame that was just `repartition(n, key)`d
  * checkpoints into a `LogicalRDD` with no partitioning info, and every
  * downstream join/aggregate keyed on `key` re-exchanges the WHOLE frame.
  * For iterative operators that checkpoint an edge set once and probe it
  * every round (connected components), that silent re-exchange is a
  * Θ(E·rounds) shuffle-volume term — measured at 10× sf0.1 as a constant
  * 26 MB edge-sized exchange per round that this helper removes.
  *
  * The caller CONTRACT is that `df`'s physical output really is hash
  * partitioned by `keys` into its RDD's partitions with Catalyst
  * `HashPartitioning` semantics — true by construction for the output of
  * `repartition(n, col(keys…))` (and anything that preserves it). The
  * helper re-declares exactly that: it checkpoints the internal row RDD
  * (same copy+localCheckpoint shape as `Dataset.localCheckpoint`, eager)
  * and wraps it in a `LogicalRDD` carrying `HashPartitioning(keys, n)`
  * resolved against the new output attributes. Misdeclared keys would
  * produce wrong-result co-partitioned joins — hence the name says
  * PARTITIONED, not general-purpose: only hand it frames whose last
  * exchange is the declared repartition.
  *
  * Lives in `org.apache.spark.sql` because `LogicalRDD` and
  * `Dataset.ofRows` are `private[sql]` (same access bridge as
  * [[graftExpr]]). Frames returned here are root-`LogicalRDD`, so
  * `graft.operators.Checkpoints.release` accepts them. */
object graftRdd {
  def localCheckpointPartitioned(df: DataFrame, keys: Seq[String]): DataFrame =
    localCheckpointPartitionedN(df, keys)._1

  /** As [[localCheckpointPartitioned]], but also returns the
    * materialized ROW COUNT — the eager count() that makes the
    * checkpoint eager is computed anyway, and callers that size
    * downstream stage width from the TRUE cardinality (never a
    * Catalyst estimate) read it for free instead of re-counting
    * (r17: [[graft.operators.Dedup.connectedComponents]] re-checkpoints
    * a tiny edge set narrow so its fixpoint rounds stop paying
    * full-width stage scheduling). */
  def localCheckpointPartitionedN(df: DataFrame,
                                  keys: Seq[String]): (DataFrame, Long) = {
    val ds = df.asInstanceOf[ClassicDataset[Row]]
    val spark = ds.sparkSession
    val qe = ds.queryExecution
    // the declaring repartition must be the plan ROOT: any operator
    // after it that exchanges (a dropDuplicates, a join) would leave the
    // physical layout keyed differently from the declaration — a silent
    // wrong-co-partitioning hazard. Enforced loudly, like
    // Checkpoints.release's root check.
    qe.analyzed match {
      case r: org.apache.spark.sql.catalyst.plans.logical.RepartitionByExpression =>
        val names = r.partitionExpressions.collect {
          case a: org.apache.spark.sql.catalyst.expressions.Attribute => a.name
        }
        require(names == keys,
          s"localCheckpointPartitioned: plan root repartitions by $names " +
            s"but declares $keys — the declaring repartition must be the " +
            "LAST operator and match the declared keys")
      case other => throw new IllegalArgumentException(
        "localCheckpointPartitioned expects the frame's plan root to be " +
          s"the declaring repartition(n, ${keys.mkString(", ")}); got " +
          s"${other.nodeName}. Put .repartition(n, keys…) last.")
    }
    // same discipline as Dataset.localCheckpoint: unsafe rows are reused
    // buffers, copy before persisting; count() makes it eager
    val rdd = qe.toRdd.map(_.copy()).localCheckpoint()
    val n = rdd.count()
    val attrs = qe.analyzed.output
    val partExprs = keys.map { k =>
      attrs.find(_.name == k).getOrElse(throw new IllegalArgumentException(
        s"localCheckpointPartitioned: no column '$k' in ${attrs.map(_.name)}"))
    }
    (ClassicDataset.ofRows(spark,
      LogicalRDD(attrs, rdd,
        HashPartitioning(partExprs, rdd.getNumPartitions))(spark)), n)
  }
}
