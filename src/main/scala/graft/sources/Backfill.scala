package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The bulk price-history backfill envelope
  * (collect_price_history.py:33-155) as one planning function: classify
  * every manifest item, then schedule the surviving fetches under the
  * rate gate. The STORE is the source of truth — resume state is read
  * from the history table, never from a cursor file — so an interrupted
  * run re-planned with the same arguments picks up exactly where it
  * stopped, and months-stale items keep topping up instead of being
  * skipped forever.
  *
  * Per item (manifest order = CLI order):
  *  - `idx ≤ skip`                    → `skipped_resume` (the --skip N arm)
  *  - newest stored point ≥ cutoff    → `skipped_fresh` (no API call;
  *    bypassed entirely by `refresh` — the --refresh arm)
  *  - no stored rows                  → `backfill`
  *  - stale (older than `freshDays`)  → `topup` (per-point delta dedup
  *    downstream inserts only the new tail — t1's job, cheap)
  *
  * Fetches are numbered in manifest order and stamped `scheduled_ms`
  * under the sliding-window budget (`maxRequests`/`windowSeconds` — the
  * same SlidingWindowLog burst shape [[RateLimitedPayloadProvider]]
  * enforces at the source: first `maxRequests` fire immediately, the
  * next cohort when the window turns over), so total cadence never
  * exceeds the API budget no matter how many items are due.
  *
  * Scale shape: the manifest and the per-item max(ts) aggregate are
  * control-plane-sized (the reference's whole registry is one JSON
  * file); the single-partition window that numbers the fetch list is
  * bounded by that registry, never by history rows — the history table
  * is touched only by the distributed max(ts) aggregation. */
object Backfill {

  /** @param manifest (idxCol 1-based manifest position, nameCol, …)
    * @param history  stored points (nameCol, tsCol)
    * @return manifest columns + (last_ts, action, scheduled_ms — null for
    *         skipped rows), ordered by idxCol */
  def plan(manifest: DataFrame, history: DataFrame,
           idxCol: String, nameCol: String, tsCol: String,
           asOf: java.sql.Timestamp, freshDays: Double,
           skip: Int = 0, refresh: Boolean = false,
           maxRequests: Int = 15, windowSeconds: Long = 60L): DataFrame = {
    require(freshDays > 0, s"freshDays must be positive: $freshDays")
    require(maxRequests > 0 && windowSeconds > 0, "rate budget must be positive")
    val cutoff = new java.sql.Timestamp(
      asOf.getTime - (freshDays * 86400000.0).toLong)
    val lastTs = history.groupBy(col(nameCol)).agg(max(col(tsCol)).as("last_ts"))
    val classified = manifest.join(lastTs, Seq(nameCol), "left")
      .withColumn("action",
        when(col(idxCol) <= skip, lit("skipped_resume"))
          .when(!lit(refresh) && col("last_ts") >= lit(cutoff), lit("skipped_fresh"))
          .when(col("last_ts").isNull, lit("backfill"))
          .otherwise(lit("topup")))
    val fetches = classified
      .filter(col("action") === "backfill" || col("action") === "topup")
      .withColumn("k", row_number().over(Window.orderBy(col(idxCol))))
      .withColumn("scheduled_ms",
        (floor((col("k") - 1) / maxRequests) * (windowSeconds * 1000L)).cast("long"))
      .drop("k")
    val skipped = classified
      .filter(col("action").startsWith("skipped"))
      .withColumn("scheduled_ms", lit(null).cast("long"))
    fetches.unionByName(skipped).orderBy(col(idxCol))
  }
}
