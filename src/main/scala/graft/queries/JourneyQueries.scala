package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** User-journey reads over the event stream — the "what led to this"
  * questions a tracker's activity feed answers (the reference keeps a
  * typed per-user activity stream, `data/dataExamples.txt` activity
  * rows; its dashboards read it chronologically): last-touch
  * conversion attribution and the first-order event-transition matrix.
  *
  * Scale/determinism contract:
  *  - Both reads make ONE pass over raw events; every window partitions
  *    by `user_id` (bounded by per-user history, never corpus-wide) and
  *    orders by the unique (ts, event_id) pair, so results are
  *    deterministic under any row order.
  *  - Attribution picks the latest preceding touch with
  *    `max(struct(ts, event_id, event_type))` over an
  *    unbounded-preceding → 1-preceding frame — the single-pass
  *    running-argmax idiom, no self-join, no per-purchase re-scan. The
  *    oracle states the same pick as a lexicographic max over a
  *    zero-padded (epoch_us, event_id, type) string — identical order,
  *    engine-portable.
  *  - Money sums go through DECIMAL(12,2) (exact, order-independent)
  *    and cast to double only at the end; transition probabilities are
  *    emitted as exact integer permille (n·1000 DIV n_from, both
  *    operands non-negative so DIV ≡ floor on both engines).
  */
object JourneyQueries {
  type Q = (SparkSession, String) => DataFrame

  private val EventsSql =
    "(SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events) events"

  /** Attribution lookback: a touch older than this many days before the
    * purchase no longer gets credit. */
  private val LookbackDays = 7L
  private val LookbackUs = LookbackDays * 86400L * 1000000L

  // ---- W14: last-touch purchase attribution --------------------------------
  /** Every purchase is attributed to the user's most recent preceding
    * view/click touch within a 7-day lookback (channel "none" when no
    * touch qualifies); one row per channel with purchase count and
    * exact revenue. The running conditional argmax makes this a single
    * window pass — at 100 TB the cost is the one per-user shuffle the
    * sessionization family already pays, with no join against a touch
    * table. */
  /** Frame-level shape, shared with `JourneySpec`: attribute every
    * `convType` row to the latest preceding `touchTypes` row by the same
    * user within `lookbackUs`, and roll up per channel. */
  def lastTouchAttribution(ev: DataFrame, touchTypes: Seq[String],
                           convType: String, lookbackUs: Long): DataFrame = {
    val wPrev = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val touched = ev.withColumn("last_touch",
      max(when(col("event_type").isin(touchTypes: _*),
        struct(col("ts"), col("event_id"), col("event_type")))).over(wPrev))
    touched.filter(col("event_type") === convType)
      .withColumn("channel",
        when(col("last_touch").isNull ||
          unix_micros(col("ts")) -
            unix_micros(col("last_touch.ts")) > lookbackUs, "none")
          .otherwise(col("last_touch.event_type")))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(col("value").cast("decimal(12,2)")).cast("double")
          .as("revenue"))
      .orderBy(col("channel"))
  }

  def w14Attribution(s: SparkSession, d: String): DataFrame =
    lastTouchAttribution(
      Tables.events(s, d).select(col("user_id"), col("ts"),
        col("event_id"), col("event_type"), col("value")),
      Seq("view", "click"), "purchase", LookbackUs)

  /** Oracle: the (ts, event_id, type) running argmax restated as a
    * lexicographic max over zero-padded strings — epoch_us is 16
    * digits today, padded to 20 so the order is total for any epoch;
    * event_id padded to 12. Identical total order to the struct max. */
  val w14Sql: String =
    s"""WITH ord AS (
       |  SELECT user_id, ts, event_id, event_type, value,
       |    max(CASE WHEN event_type IN ('view', 'click') THEN
       |          lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') ||
       |          lpad(CAST(event_id AS VARCHAR), 12, '0') || event_type
       |        END) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |      AS touch_key
       |  FROM $EventsSql
       |), p AS (
       |  SELECT CASE WHEN touch_key IS NULL
       |                OR epoch_us(ts) - CAST(substring(touch_key, 1, 20) AS BIGINT)
       |                   > ${LookbackUs} THEN 'none'
       |              ELSE substring(touch_key, 33) END AS channel,
       |         value
       |  FROM ord WHERE event_type = 'purchase'
       |)
       |SELECT channel, count(*) AS n_purchases,
       |       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS revenue
       |FROM p GROUP BY channel ORDER BY channel""".stripMargin

  // ---- first-order event-transition matrix ---------------------------------
  /** (prev_type → next_type) counts over each user's chronological
    * stream, with the out-degree total and the exact integer permille
    * share — the Markov-chain summary a journey dashboard renders as a
    * Sankey. One lag window per user + one groupBy over the ≤|types|²
    * transition table. */
  /** Frame-level shape, shared with `JourneySpec`. */
  def transitionMatrix(ev: DataFrame): DataFrame = {
    val wOrd = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val trans = ev
      .withColumn("prev_type", lag(col("event_type"), 1).over(wOrd))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
    val wFrom = Window.partitionBy(col("prev_type"))
    trans
      .withColumn("n_from", sum(col("n")).over(wFrom))
      .select(col("prev_type"), col("next_type"), col("n"),
        col("n_from"), expr("n * 1000 DIV n_from").as("permille"))
      .orderBy(col("prev_type"), col("next_type"))
  }

  def seqTransitions(s: SparkSession, d: String): DataFrame =
    transitionMatrix(Tables.events(s, d).select(col("user_id"),
      col("ts"), col("event_id"), col("event_type")))

  val seqTransitionsSql: String =
    s"""WITH ord AS (
       |  SELECT user_id, event_type,
       |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
       |      AS prev_type
       |  FROM $EventsSql
       |), t AS (
       |  SELECT prev_type, event_type AS next_type, count(*) AS n
       |  FROM ord WHERE prev_type IS NOT NULL GROUP BY 1, 2
       |)
       |SELECT prev_type, next_type, n,
       |       CAST(SUM(n) OVER (PARTITION BY prev_type) AS BIGINT) AS n_from,
       |       n * 1000 // CAST(SUM(n) OVER (PARTITION BY prev_type) AS BIGINT)
       |         AS permille
       |FROM t ORDER BY prev_type, next_type""".stripMargin

  val defs: Map[String, Q] = Map(
    "w14_attribution" -> (w14Attribution _),
    "seq_transitions" -> (seqTransitions _))

  val oracle: Map[String, String] = Map(
    "w14_attribution" -> w14Sql,
    "seq_transitions" -> seqTransitionsSql)
}
