package graft.sources

import java.security.MessageDigest
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S5/S13 — the config plane: `config.yaml` ⇄ `tracked_items` sync
  * (reference `utility/loadConfig_utility.py:118-139` and
  * `utility/configTableSync_utility.py`).
  *
  * Dual-master rule, mirrored from the reference's module header:
  *  - config → table on BOOT (seed/upsert from the human-editable file);
  *  - table → config on every table write that should mirror back;
  *  - the TABLE is the runtime master; config.yaml is the boot input.
  *
  * The YAML dialect here is the SUBSET the reference's config actually
  * uses (top-level scalar maps, one nested map block, one list-of-flat-maps
  * block, `#` comments) — parsed with a purpose-built reader instead of a
  * YAML dependency; `render` preserves the human-edited preamble
  * (everything before TRACKING_ITEMS, comments included) and rewrites only
  * the TRACKING_ITEMS block, the same "only the table-owned key is
  * replaced" contract as the reference's ruamel round-trip
  * (configTableSync_utility.py:275-301).
  *
  * Scale note: this is control-plane data (hundreds of rows) — the
  * DataFrame side exists so the table can live with the data tables; the
  * file side is driver-local by nature.
  */
object ConfigPlane {

  /** One TRACKING_ITEMS entry (config field names preserved where they
    * differ from the table's: `polling-interval-in-seconds`, `api_id`). */
  case class TrackingItem(marketHashName: String, appid: Int, currency: Int,
                          country: String, language: String,
                          pollIntervalSec: Int, apiId: String,
                          itemNameid: Option[Long])

  case class Limits(requests: Int, windowSeconds: Int)

  case class GraftConfig(limits: Limits, trackingItems: Seq[TrackingItem])

  /** YAML comment rule: '#' opens a comment only at line start or after
    * whitespace — a '#' inside a value ("Sticker | Team #1") is content. */
  private def stripComment(l: String): String = {
    var i = 0
    while (i < l.length) {
      if (l(i) == '#' && (i == 0 || l(i - 1) == ' ' || l(i - 1) == '\t'))
        return l.take(i)
      i += 1
    }
    l
  }

  /** config api_id ↔ tracked_items.stream
    * (configTableSync_utility.py:41-48). */
  val ApiIdToStream: Map[String, String] = Map(
    "priceoverview" -> "priceoverview",
    "itemordershistogram" -> "histogram",
    "itemordersactivity" -> "activity",
    "pricehistory" -> "pricehistory")
  val StreamToApiId: Map[String, String] = ApiIdToStream.map(_.swap)

  // ---- S5: load ------------------------------------------------------------

  /** Parse the config.yaml subset. Unknown top-level keys are ignored;
    * missing LIMITS defaults to the reference's 15 req / 60 s. */
  def parse(yaml: String): GraftConfig = {
    val lines = yaml.linesIterator
      .map(stripComment)
      .filter(l => l.trim.nonEmpty && l.contains(':')) // key: value lines only
      .toVector
    var limits = Limits(15, 60)
    val items = Vector.newBuilder[TrackingItem]
    var i = 0
    def kv(l: String): (String, String) = {
      val c = l.indexOf(':')
      (l.take(c).trim, l.drop(c + 1).trim)
    }
    while (i < lines.length) {
      val line = lines(i)
      if (!line.startsWith(" ") && !line.startsWith("-")) {
        val (key, _) = kv(line)
        key match {
          case "LIMITS" =>
            var req = limits.requests; var win = limits.windowSeconds
            i += 1
            while (i < lines.length && lines(i).startsWith(" ")) {
              kv(lines(i)) match {
                case ("REQUESTS", v) => req = v.toInt
                case ("WINDOW_SECONDS", v) => win = v.toInt
                case _ => ()
              }
              i += 1
            }
            i -= 1
            limits = Limits(req, win)
          case "TRACKING_ITEMS" =>
            i += 1
            var fields = Map.empty[String, String]
            // an entry missing a required field is DISCARDED, not fatal —
            // the reference's load path drops invalid items and continues
            // (loadConfig_utility.py:100-116); one typo must not take down
            // the whole boot sync
            def flush(): Unit = if (fields.nonEmpty) {
              scala.util.Try(TrackingItem(
                fields("market_hash_name"), fields("appid").toInt,
                fields("currency").toInt, fields("country"),
                fields("language"),
                fields("polling-interval-in-seconds").toInt,
                fields("api_id"), fields.get("item_nameid").map(_.toLong)))
                .foreach(items += _)
              fields = Map.empty
            }
            while (i < lines.length &&
                   (lines(i).startsWith("-") || lines(i).startsWith(" "))) {
              val l = lines(i)
              if (l.startsWith("-")) flush()
              val (k, v) = kv(l.dropWhile(c => c == '-' || c == ' '))
              fields += (k -> v)
              i += 1
            }
            flush()
            i -= 1
          case _ => () // unknown top-level key: preserved by render, ignored here
        }
      }
      i += 1
    }
    GraftConfig(limits, items.result())
  }

  /** Items safe to poll: histogram/activity API calls REQUIRE item_nameid
    * (loadConfig_utility.py:100-116 discards such items at load). */
  def validItems(cfg: GraftConfig): Seq[TrackingItem] =
    cfg.trackingItems.filter(it =>
      ApiIdToStream.get(it.apiId) match {
        case Some("histogram") | Some("activity") => it.itemNameid.isDefined
        case Some(_) => true
        case None => false // unknown api_id: not a pollable stream
      })

  /** Desired tracked_items rows from a parsed config (config → table
    * direction; build_desired_rows_from_config). */
  def desiredRows(spark: SparkSession, cfg: GraftConfig): DataFrame = {
    import spark.implicits._
    validItems(cfg)
      .map(it => (it.marketHashName, ApiIdToStream(it.apiId), it.appid,
        it.currency, it.country, it.language, it.pollIntervalSec,
        it.itemNameid, true))
      .toDF("market_hash_name", "stream", "appid", "currency", "country",
        "language", "poll_interval_sec", "item_nameid", "enabled")
  }

  /** Config → table reconcile plan (sync_config_to_table): upsert every
    * desired row; DISABLE (not delete) enabled rows the config no longer
    * lists — keeps the row for re-enable + history. Output: one row per
    * affected key with op ∈ {upsert, disable}. */
  def syncOps(current: DataFrame, desired: DataFrame): DataFrame = {
    val keys = Seq("market_hash_name", "stream")
    val d = desired.select(keys.map(col): _*).withColumn("_d", lit(1))
    val c = current.filter(col("enabled")).select(keys.map(col): _*)
      .withColumn("_c", lit(1))
    d.join(c, keys, "full_outer")
      .withColumn("op", when(col("_d").isNotNull, lit("upsert"))
        .otherwise(lit("disable")))
      .select(keys.map(col) :+ col("op"): _*)
  }

  // ---- S13: writeback ------------------------------------------------------

  /** Table → config: rebuild ONLY the TRACKING_ITEMS block from the
    * enabled rows (sorted by name, stream — the reference's ORDER BY),
    * preserving everything the human wrote above it (comments, LIMITS,
    * unknown keys). Rows are TrackingItems so the caller decides how they
    * leave the table (control-plane-sized collect). */
  def render(existingYaml: String, enabledRows: Seq[TrackingItem]): String = {
    val all = existingYaml.linesIterator.toVector
    val start = all.indexWhere(_.trim.startsWith("TRACKING_ITEMS:"))
    val keep = if (start < 0) all.mkString("\n")
      else all.take(start).mkString("\n")
    // anything AFTER the items block (another top-level key the human
    // added below it) must survive the writeback too — the block ends at
    // the first line that is neither a list item nor indented
    val tail = if (start < 0) Vector.empty[String]
      else all.drop(start + 1)
        .dropWhile(l => l.trim.isEmpty || l.startsWith("-") || l.startsWith(" "))
    val items = enabledRows
      .sortBy(it => (it.marketHashName, ApiIdToStream.getOrElse(it.apiId, it.apiId)))
      .map { it =>
        val base =
          s"""- market_hash_name: ${it.marketHashName}
             |  appid: ${it.appid}
             |  currency: ${it.currency}
             |  country: ${it.country}
             |  language: ${it.language}
             |  polling-interval-in-seconds: ${it.pollIntervalSec}
             |  api_id: ${it.apiId}""".stripMargin
        it.itemNameid.fold(base)(id => base + s"\n  item_nameid: $id")
      }
    val tailStr = if (tail.isEmpty) "" else tail.mkString("", "\n", "\n")
    (keep.stripLineEnd + "\nTRACKING_ITEMS:\n" + items.mkString("\n") + "\n" + tailStr)
  }

  /** Enabled table rows → TrackingItems (the collect boundary; table order
    * is re-imposed in render). */
  def enabledItems(tracked: DataFrame): Seq[TrackingItem] =
    tracked.filter(col("enabled"))
      .select(col("market_hash_name"), col("stream"), col("appid"),
        col("currency"), col("country"), col("language"),
        col("poll_interval_sec"), col("item_nameid"))
      .collect().toIndexedSeq
      .map(r => TrackingItem(r.getString(0),
        r.getInt(2), r.getInt(3), r.getString(4), r.getString(5), r.getInt(6),
        StreamToApiId.getOrElse(r.getString(1), r.getString(1)),
        if (r.isNullAt(7)) None else Some(r.getLong(7))))

  // ---- loop guard ----------------------------------------------------------

  def hashText(text: String): String =
    MessageDigest.getInstance("SHA-256")
      .digest(text.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  /** Breaks the file↔table ping-pong: the writeback path remembers the
    * sha-256 of what it wrote BEFORE writing, so the file watcher
    * recognises its own echo and skips it
    * (configTableSync_utility.py:56-78). */
  final class WritebackGuard {
    @volatile private var lastWritten: Option[String] = None
    def remember(content: String): Unit = { lastWritten = Some(hashText(content)) }
    def isOwnEcho(content: String): Boolean =
      lastWritten.contains(hashText(content))
  }
}
