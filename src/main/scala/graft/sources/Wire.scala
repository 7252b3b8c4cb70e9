package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.SteamParsers

/** Bronze→silver wire layer for the four Steam endpoints (SURVEY §2.1
  * S1-S11): explicit StructTypes mirroring the Pydantic contracts
  * (reference src/dataClasses.py — permissive unions land as StringType at
  * bronze), `from_json` ingestion, and silver projections applying the
  * F1-F5 sanitization family to produce rows shaped like the reference DDL
  * (src/SQLinserts.py:165-357).
  *
  * At scale each silver builder is a pure projection over a streaming or
  * batch bronze table — no shuffles; the HTTP fetch itself is a connector
  * concern outside the engine (the driver contract feeds JSON payloads). */
object Wire {

  // ---- bronze schemas (strings stay raw; cast in silver) -------------------

  val priceOverviewWire: StructType = StructType(Seq(
    StructField("success", BooleanType),
    StructField("lowest_price", StringType),
    StructField("median_price", StringType),
    StructField("volume", StringType)))

  val ordersHistogramWire: StructType = StructType(Seq(
    StructField("success", StringType),
    StructField("sell_order_count", StringType),
    StructField("sell_order_table", ArrayType(StructType(Seq(
      StructField("price", StringType), StructField("quantity", StringType))))),
    StructField("buy_order_count", StringType),
    StructField("buy_order_table", ArrayType(StructType(Seq(
      StructField("price", StringType), StructField("quantity", StringType))))),
    StructField("highest_buy_order", StringType),
    StructField("lowest_sell_order", StringType),
    StructField("buy_order_graph", ArrayType(ArrayType(StringType))),
    StructField("sell_order_graph", ArrayType(ArrayType(StringType))),
    StructField("price_prefix", StringType),
    StructField("price_suffix", StringType)))

  val ordersActivityWire: StructType = StructType(Seq(
    StructField("success", StringType),
    StructField("activity", ArrayType(StringType)),
    StructField("timestamp", LongType)))

  val priceHistoryWire: StructType = StructType(Seq(
    StructField("success", BooleanType),
    StructField("price_prefix", StringType),
    StructField("price_suffix", StringType),
    StructField("prices", ArrayType(ArrayType(StringType)))))

  /** Bronze ingestion: (id, payload STRING) → (id, parsed STRUCT). */
  def bronze(raw: DataFrame, schema: StructType): DataFrame =
    raw.withColumn("w", from_json(col("payload"), schema))

  // ---- silver projections (reference DDL shape) ----------------------------

  /** price_overview silver: parsed scalars + derived currency (first
    * symbol match on either price string, USD default —
    * SQLinserts.py:379-403). */
  def silverPriceOverview(b: DataFrame): DataFrame =
    b.select(col("id"),
      col("w.success").as("success"),
      SteamParsers.parseSteamPriceUdf(col("w.lowest_price")).as("lowest_price"),
      SteamParsers.parseSteamPriceUdf(col("w.median_price")).as("median_price"),
      SteamParsers.parseVolumeUdf(col("w.volume")).as("volume"),
      coalesce(
        SteamParsers.extractCurrencyUdf(col("w.lowest_price")),
        SteamParsers.extractCurrencyUdf(col("w.median_price")),
        lit("USD")).as("currency"))

  /** orders_histogram silver: counts via F3, scalar bid/ask via F2 (minor
    * units ÷ 100 — NOT F1, the 100× trap), nested tables/graphs kept
    * native, currency from the price suffix (SQLinserts.py:405-454). */
  def silverOrdersHistogram(b: DataFrame): DataFrame =
    b.select(col("id"),
      SteamParsers.parseVolumeUdf(col("w.buy_order_count")).as("buy_order_count"),
      SteamParsers.parseVolumeUdf(col("w.sell_order_count")).as("sell_order_count"),
      SteamParsers.orderPriceMinorToMajorUdf(col("w.highest_buy_order")).as("highest_buy_order"),
      SteamParsers.orderPriceMinorToMajorUdf(col("w.lowest_sell_order")).as("lowest_sell_order"),
      col("w.buy_order_table").as("buy_order_table"),
      col("w.sell_order_table").as("sell_order_table"),
      col("w.buy_order_graph").as("buy_order_graph"),
      col("w.sell_order_graph").as("sell_order_graph"),
      coalesce(SteamParsers.extractCurrencyUdf(col("w.price_suffix")), lit("USD"))
        .as("currency"))

  /** orders_activity silver: raw HTML array kept, parsed event structs
    * stamped with the response-level epoch (F7+F8), count invariant
    * (SQLinserts.py:456-500). */
  def silverOrdersActivity(b: DataFrame): DataFrame =
    b.select(col("id"),
      col("w.activity").as("activity_raw"),
      transform(col("w.activity"), h => {
        val p = SteamParsers.parseActivityHtmlUdf(h)
        struct(p.getField("price").as("price"),
          p.getField("currency").as("currency"),
          p.getField("action").as("action"),
          timestamp_seconds(col("w.timestamp")).as("timestamp"),
          h.as("raw_html"))
      }).as("parsed_activities"),
      size(col("w.activity")).as("activity_count"),
      col("w.timestamp").as("steam_timestamp"))

  /** F8 events view: one row per parsed activity (explode with ordinal). */
  def activityEvents(silver: DataFrame): DataFrame =
    silver.select(col("id"), col("steam_timestamp"),
        posexplode(col("parsed_activities")).as(Seq("ord", "ev")))
      .select(col("id"), col("ord"),
        col("ev.price").as("price"), col("ev.currency").as("currency"),
        col("ev.action").as("action"), col("ev.timestamp").as("event_ts"))

  /** price_history silver: wire triples [date_str, price, vol_str] →
    * typed points via F5 + F3; unparseable dates are dropped (the
    * reference skips those rows, SQLinserts.py:541-543). */
  def silverPriceHistory(b: DataFrame): DataFrame =
    b.select(col("id"),
        coalesce(SteamParsers.extractCurrencyUdf(col("w.price_suffix")), lit("USD"))
          .as("currency"),
        posexplode(col("w.prices")).as(Seq("ord", "p")))
      .select(col("id"), col("ord"), col("currency"),
        SteamParsers.parseSteamDatetimeUdf(element_at(col("p"), 1)).as("time"),
        element_at(col("p"), 2).cast("double").as("price"),
        SteamParsers.parseVolumeUdf(element_at(col("p"), 3)).as("volume"))
      .filter(col("time").isNotNull)
}
