package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Relational

/** The reference's single-item admission path (POST /tracked-items,
  * api/main.py:749-858) composed from the engine's existing seams:
  * validate → cadence resolve → nameid resolve (the J1 manifest lookup) →
  * duplicate gate (an enabled duplicate is the suppressed no-op, T14) →
  * feasibility pre-check (A6, feasibility_utility.py:15-28) → upsert
  * classification (insert vs re-enable, the ON CONFLICT arm of
  * api/main.py:825-845).
  *
  * Control-plane by nature: one item per call, the verdict is a scalar —
  * the DataFrame probes are limit-1 key lookups plus one feasibility
  * aggregate over the tracked registry (a control table, not the corpus),
  * the same collect boundary as [[graft.sources.ConfigPlane]]. A 202 in
  * the reference means "tracked, collecting" — current data is then read
  * through the SAME readers GET uses ([[ReadApi]]), which is the caller's
  * composition, not this gate's. */
object ControlApi {

  /** responseModels.py:23-33. */
  val ValidStreams: Set[String] =
    Set("priceoverview", "histogram", "activity", "pricehistory")
  val NameidRequiredStreams: Set[String] = Set("histogram", "activity")
  val MinPollIntervalSec = 5
  val MaxPollIntervalSec = 86400
  val PricehistoryPollSec = 3600

  final case class AdmitRequest(
      marketHashName: String,
      stream: String,
      appid: Int = 730,
      currency: Int = 3,
      pollIntervalSec: Option[Int] = None)

  sealed trait Admission
  /** HTTP-shaped rejection: status ∈ {400 invalid, 404 missing,
    * 409 conflict}. */
  final case class Rejected(status: Int, reason: String) extends Admission
  /** op ∈ {insert, reenable}; feasibility numbers echo the capacity log
    * line of api/main.py:849. */
  final case class Admitted(op: String, itemNameid: Option[Long],
      pollIntervalSec: Int, required: Long, budget: Long,
      utilizationPct: Double) extends Admission
  /** PATCH verdict (TrackingAck status="updated", api/main.py:957-963):
    * the row's effective post-update state. */
  final case class Updated(stream: String, pollIntervalSec: Int,
      enabled: Boolean, itemNameid: Option[Long], note: String) extends Admission
  /** DELETE verdict (TrackingAck status="disabled", api/main.py:989-996):
    * disable-not-drop — the row and its history survive. */
  final case class Disabled(stream: String, note: String) extends Admission

  /** Admit ONE item into the tracked set (no batches).
    *
    * @param tracked  current registry (market_hash_name, stream, enabled,
    *                 poll_interval_sec, …)
    * @param manifest nameid manifest (market_hash_name, item_nameid) — the
    *                 resolve side of the histogram/activity streams
    * @param rateBudget / windowSeconds  the LIMITS budget the scheduler
    *                 validates against (read_rate_budget) */
  def admitItem(tracked: DataFrame, manifest: DataFrame, req: AdmitRequest,
                rateBudget: Long, windowSeconds: Long): Admission = {
    // --- validate (untrusted body), api/main.py:758-766 ---
    if (!ValidStreams.contains(req.stream))
      return Rejected(400, s"Invalid stream '${req.stream}'. Use one of: " +
        ValidStreams.toSeq.sorted.mkString(", "))
    if (req.marketHashName.trim.isEmpty)
      return Rejected(400, "market_hash_name must not be empty")
    if (req.appid <= 0)
      return Rejected(400, s"Invalid appid ${req.appid} (must be positive)")
    if (req.currency <= 0)
      return Rejected(400, s"Invalid currency id ${req.currency}")

    // --- cadence: pricehistory is a fixed hourly tick (client value
    // ignored); live streams must supply an in-bounds interval ---
    val pollInterval: Int =
      if (req.stream == "pricehistory") PricehistoryPollSec
      else req.pollIntervalSec match {
        case None => return Rejected(400,
          s"poll_interval_sec is required for the '${req.stream}' stream")
        case Some(v) if v < MinPollIntervalSec || v > MaxPollIntervalSec =>
          return Rejected(400, s"poll_interval_sec $v out of bounds " +
            s"[$MinPollIntervalSec, $MaxPollIntervalSec]")
        case Some(v) => v
      }

    // --- resolve item_nameid where the stream requires it (limit-1
    // manifest probe; unresolvable → the stream cannot be polled) ---
    val itemNameid: Option[Long] =
      if (!NameidRequiredStreams.contains(req.stream)) None
      else manifest
        .filter(col("market_hash_name") === req.marketHashName)
        .select(col("item_nameid")).limit(1).collect()
        .headOption.collect { case r if !r.isNullAt(0) => r.getLong(0) } match {
          case None => return Rejected(400,
            s"Couldn't resolve '${req.marketHashName}' — no item id, " +
              s"which the '${req.stream}' stream requires")
          case some => some
        }

    // --- duplicate gate: re-adding an enabled row is the suppressed
    // no-op (T14) → 409; a disabled row is a legitimate re-enable ---
    val existing = tracked
      .filter(col("market_hash_name") === req.marketHashName &&
        col("stream") === req.stream)
      .select(col("enabled")).limit(1).collect().headOption.map(_.getBoolean(0))
    if (existing.contains(true))
      return Rejected(409,
        s"'${req.marketHashName}' (${req.stream}) is already tracked")

    // --- feasibility pre-check BEFORE writing (POST adds load). The
    // enabled LIVE set only: pricehistory rows run on the fixed hourly
    // tick and add no sustained load (api/main.py:675-687), and a
    // pricehistory ADD contributes none either — it can't fail the gate
    // but still reports the capacity numbers ---
    val spark = tracked.sparkSession
    import spark.implicits._
    val liveIntervals = tracked
      .filter(col("enabled") && col("stream") =!= "pricehistory")
      .select(col("poll_interval_sec").cast("int").as("poll_interval_sec"))
    val withAdded =
      if (req.stream == "pricehistory") liveIntervals
      else liveIntervals.unionByName(
        Seq(pollInterval).toDF("poll_interval_sec"))
    val f = Relational.feasibility(withAdded, col("poll_interval_sec"),
      windowSeconds, rateBudget).collect()(0)
    val required = if (f.isNullAt(0)) 0L else f.getLong(0)
    if (required > rateBudget)
      return Rejected(409, s"Would exceed rate limit: $required " +
        s"req/${windowSeconds}s vs budget $rateBudget. " +
        "Increase poll_interval_sec or remove an item.")

    val util = required.toDouble / rateBudget.toDouble * 100.0
    Admitted(if (existing.isEmpty) "insert" else "reenable",
      itemNameid, pollInterval, required, rateBudget, util)
  }

  /** The single row a write targets, by its REAL unique key. */
  private final case class TargetRow(stream: String, enabled: Boolean,
      pollIntervalSec: Int, itemNameid: Option[Long])

  /** Resolve (market_hash_name [, stream]) to one registry row — the
    * write-target rule of api/main.py:696-729: stream given → exact pair
    * or 404; stream omitted → by name, 404 if absent, 409 if the name is
    * tracked on several streams (caller must disambiguate). The internal
    * id never crosses this boundary in either direction. */
  private def resolveTarget(tracked: DataFrame, name: String,
                            stream: Option[String]): Either[Rejected, TargetRow] = {
    val hasNameid = tracked.columns.contains("item_nameid")
    val base = tracked.filter(col("market_hash_name") === name)
    val rows = stream.fold(base)(st => base.filter(col("stream") === st))
      .select(col("stream"), col("enabled"),
        col("poll_interval_sec").cast("int"),
        (if (hasNameid) col("item_nameid").cast("long") else lit(null).cast("long"))
          .as("item_nameid"))
      .limit(3).collect() // 0 / 1 / many is all the verdict needs
    rows.length match {
      case 0 => Left(Rejected(404, stream match {
        case Some(st) => s"No tracked item '$name' on stream '$st'"
        case None => s"No tracked item '$name'"
      }))
      case 1 => Right(TargetRow(rows(0).getString(0), rows(0).getBoolean(1),
        rows(0).getInt(2),
        if (rows(0).isNullAt(3)) None else Some(rows(0).getLong(3))))
      case _ => Left(Rejected(409, s"'$name' is tracked on multiple " +
        "streams; specify stream to disambiguate"))
    }
  }

  final case class PatchRequest(
      marketHashName: String,
      stream: Option[String] = None,
      pollIntervalSec: Option[Int] = None,
      newStream: Option[String] = None,
      enabled: Option[Boolean] = None)

  /** PATCH /tracked-items (api/main.py:861-963): partial update of one
    * row's interval / stream / enabled, targeted by the real unique key.
    * Cadence resolves against the EFFECTIVE target stream (pricehistory's
    * is the fixed hourly tick — a supplied interval is ignored); nameid
    * resolves when the (new) stream requires one the row lacks.
    * Feasibility re-checks ONLY when the change INCREASES load (interval
    * decrease, enable, or a move onto a live stream) — computed with the
    * item's NEW interval against the enabled live set excluding the row
    * itself; load-decreasing changes can't fail and skip the check. */
  def patchItem(tracked: DataFrame, manifest: DataFrame, req: PatchRequest,
                rateBudget: Long, windowSeconds: Long): Admission = {
    if (req.pollIntervalSec.isEmpty && req.newStream.isEmpty && req.enabled.isEmpty)
      return Rejected(400,
        "Nothing to update: provide poll_interval_sec, new_stream, or enabled")
    req.newStream match {
      case Some(st) if !ValidStreams.contains(st) =>
        return Rejected(400, s"Invalid stream '$st'. Use one of: " +
          ValidStreams.toSeq.sorted.mkString(", "))
      case _ => ()
    }
    val cur = resolveTarget(tracked, req.marketHashName, req.stream) match {
      case Left(r) => return r
      case Right(row) => row
    }
    val newStream = req.newStream.getOrElse(cur.stream)
    val newEnabled = req.enabled.getOrElse(cur.enabled)
    val newInterval: Int =
      if (newStream == "pricehistory") PricehistoryPollSec
      else req.pollIntervalSec match {
        case Some(v) if v < MinPollIntervalSec || v > MaxPollIntervalSec =>
          return Rejected(400, s"poll_interval_sec $v out of bounds " +
            s"[$MinPollIntervalSec, $MaxPollIntervalSec]")
        case Some(v) => v
        case None => cur.pollIntervalSec
      }
    val newNameid: Option[Long] =
      if (!NameidRequiredStreams.contains(newStream) || cur.itemNameid.isDefined)
        cur.itemNameid
      else manifest
        .filter(col("market_hash_name") === req.marketHashName)
        .select(col("item_nameid")).limit(1).collect()
        .headOption.collect { case r if !r.isNullAt(0) => r.getLong(0) } match {
          case None => return Rejected(400,
            s"Couldn't resolve '${req.marketHashName}' — no item id, " +
              s"which the '$newStream' stream requires")
          case some => some
        }
    // sustained contribution: 0 when disabled or on the hourly archival
    // tick — a move onto/off pricehistory is just these zero terms
    def contribution(stream: String, interval: Int, enabled: Boolean): Long =
      if (!enabled || stream == "pricehistory") 0L
      else windowSeconds / interval
    val oldContrib = contribution(cur.stream, cur.pollIntervalSec, cur.enabled)
    val newContrib = contribution(newStream, newInterval, newEnabled)
    if (newContrib > oldContrib) {
      val spark = tracked.sparkSession
      import spark.implicits._
      val others = tracked
        .filter(col("enabled") && col("stream") =!= "pricehistory" &&
          !(col("market_hash_name") === req.marketHashName &&
            col("stream") === cur.stream))
        .select(col("poll_interval_sec").cast("int").as("poll_interval_sec"))
        .unionByName(Seq(newInterval).toDF("poll_interval_sec"))
      val f = Relational.feasibility(others, col("poll_interval_sec"),
        windowSeconds, rateBudget).collect()(0)
      val required = if (f.isNullAt(0)) 0L else f.getLong(0)
      if (required > rateBudget)
        return Rejected(409, s"Would exceed rate limit: $required " +
          s"req/${windowSeconds}s vs budget $rateBudget. " +
          "Pick a larger poll_interval_sec.")
    }
    Updated(newStream, newInterval, newEnabled, newNameid,
      if (newEnabled) "reconciling live" else "disabled")
  }

  /** DELETE /tracked-items (api/main.py:966-996): remove-by-DISABLE —
    * the row (and its tracking history) survives, the poller stops on
    * the next reconcile. Only frees budget → no feasibility check. Same
    * target resolution as PATCH (404 missing, 409 ambiguous name). */
  def removeItem(tracked: DataFrame, marketHashName: String,
                 stream: Option[String] = None): Admission =
    resolveTarget(tracked, marketHashName, stream) match {
      case Left(r) => r
      case Right(row) => Disabled(row.stream, "poller stops on reconcile")
    }
}
