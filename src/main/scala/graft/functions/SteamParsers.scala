package graft.functions

import java.time.{LocalDateTime, ZoneOffset}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** The reference's "financial-grade sanitization" layer, re-expressed as
  * pure Scala functions + Spark UDFs (SURVEY.md §2.7 F1-F9).
  *
  * Semantics mirror the reference exactly, including its sharp edges:
  *  - F1 `parseSteamPrice` (reference src/SQLinserts.py:593-637): strips 19
  *    currency symbols IN ORDER (so "CDN$5.00" → "CDN5.00" → unparseable →
  *    null, because "$" is stripped before "CDN$" can match), then
  *    disambiguates EU "1.234,56" vs US "1,234.56" by last-separator
  *    position; a lone comma is decimal iff exactly 2 trailing digits.
  *  - F2 `orderPriceMinorToMajor` (src/SQLinserts.py:640-656): integer
  *    minor-units ÷ 100; deliberately NOT F1 (the documented 100× trap).
  *  - F4 `extractCurrency` (src/SQLinserts.py:677-714): ordered first-match
  *    substring scan, so "R$..." yields USD ("$" wins before "R$").
  *  - F5 `parseSteamDatetime` (src/SQLinserts.py:716-753): "Jul 02 2014
  *    01: +0" → naive-UTC hour timestamp; garbage → null.
  *  - F6/F7 activity variants (utility/parseActivityHTML_utility.py:13-98):
  *    8-symbol map with break-on-first-match then naive ','→'.' replace;
  *    HTML span regex extraction with first-non-empty-price-wins.
  *
  * These are row-level scalar functions; in the silver layer they run inside
  * a single projection over the scan, so at cluster scale they add no
  * shuffle. parseSteamPrice also exists as a codegen'd Catalyst expression
  * (graft.plans) for the bench path.
  */
object SteamParsers {

  // ---- shared helpers -----------------------------------------------------

  /** Python-float()-compatible numeric parse (restricted to finite decimal
    * forms — the only forms Steam emits). */
  private val floatRe = """^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$""".r
  private def pyFloat(s: String): Option[Double] =
    if (floatRe.matches(s)) try Some(s.toDouble) catch { case _: Exception => None }
    else None

  private val intRe = """^[+-]?\d+$""".r
  private def pyLong(s: String): Option[Long] =
    if (intRe.matches(s)) try Some(s.toLong) catch { case _: Exception => None }
    else None

  // ---- F1 -----------------------------------------------------------------

  /** Ordered strip list — order matters (see scaladoc). Exposed to
    * graft.queries so the oracle-SQL generator derives from THIS table —
    * one source of truth, the two sides cannot drift. */
  private[graft] val stripSymbols: Seq[String] = Seq(
    "$", "€", "£", "¥", "₹", "₽", "pуб.", "R$", "CDN$", "A$", "HK$", "S$",
    "₩", "₴", "CHF", "kr", "zł", "R", "฿")

  def parseSteamPrice(priceStr: String): Option[Double] = {
    if (priceStr == null || priceStr.isEmpty) return None
    var cleaned = priceStr.trim
    stripSymbols.foreach { sym => cleaned = cleaned.replace(sym, "") }
    cleaned = cleaned.trim
    val hasComma = cleaned.contains(',')
    val hasDot = cleaned.contains('.')
    if (hasComma && hasDot) {
      if (cleaned.lastIndexOf(',') > cleaned.lastIndexOf('.'))
        cleaned = cleaned.replace(".", "").replace(',', '.') // EU: 1.234,56
      else
        cleaned = cleaned.replace(",", "")                   // US: 1,234.56
    } else if (hasComma) {
      // lone comma: decimal iff exactly 2 digits after the LAST comma
      val lastPart = cleaned.substring(cleaned.lastIndexOf(',') + 1)
      if (lastPart.length == 2) cleaned = cleaned.replace(',', '.')
      else cleaned = cleaned.replace(",", "")
    }
    pyFloat(cleaned)
  }

  // ---- F2 -----------------------------------------------------------------

  def orderPriceMinorToMajor(centsStr: String): Option[Double] = {
    if (centsStr == null || centsStr.isEmpty) return None
    pyLong(centsStr.replace(",", "")).map(_ / 100.0)
  }

  // ---- F3 -----------------------------------------------------------------

  def parseVolume(volumeStr: String): Option[Int] = {
    if (volumeStr == null || volumeStr.isEmpty) return None
    pyLong(volumeStr.replace(",", "").replace(".", ""))
      .filter(v => v >= Int.MinValue && v <= Int.MaxValue).map(_.toInt)
  }

  // ---- F4 -----------------------------------------------------------------

  /** Ordered symbol → ISO-4217 scan; FIRST substring match wins. Exposed
    * like [[stripSymbols]] so the oracle-SQL side generates from it. */
  private[graft] val currencyMap: Seq[(String, String)] = Seq(
    "$" -> "USD", "€" -> "EUR", "£" -> "GBP", "¥" -> "JPY", "₹" -> "INR",
    "₽" -> "RUB", "pуб." -> "RUB", "R$" -> "BRL", "CDN$" -> "CAD",
    "A$" -> "AUD", "HK$" -> "HKD", "S$" -> "SGD", "₩" -> "KRW",
    "₴" -> "UAH", "CHF" -> "CHF", "kr" -> "SEK", "zł" -> "PLN",
    "R" -> "ZAR", "฿" -> "THB")

  def extractCurrency(priceStr: String): Option[String] = {
    if (priceStr == null || priceStr.isEmpty) return None
    currencyMap.collectFirst { case (sym, code) if priceStr.contains(sym) => code }
  }

  // ---- F5 -----------------------------------------------------------------

  private val monthAbbr: Map[String, Int] = Map(
    "jan" -> 1, "feb" -> 2, "mar" -> 3, "apr" -> 4, "may" -> 5, "jun" -> 6,
    "jul" -> 7, "aug" -> 8, "sep" -> 9, "oct" -> 10, "nov" -> 11, "dec" -> 12)

  /** "Jul 02 2014 01: +0" → naive-UTC timestamp at the hour. */
  def parseSteamDatetime(dateStr: String): Option[java.sql.Timestamp] = {
    if (dateStr == null || dateStr.isEmpty) return None
    val parts = dateStr.trim.split("\\s+")
    if (parts.length < 4) return None
    try {
      val month = monthAbbr.getOrElse(parts(0).toLowerCase, return None)
      val day = parts(1).toInt
      val year = parts(2).toInt
      val hour = parts(3).reverse.dropWhile(_ == ':').reverse.toInt
      if (hour < 0 || hour > 23) return None
      val ldt = LocalDateTime.of(year, month, day, hour, 0, 0)
      Some(java.sql.Timestamp.from(ldt.toInstant(ZoneOffset.UTC)))
    } catch { case _: Exception => None }
  }

  // ---- F6 (activity variant of F1+F4) -------------------------------------

  private val activityCurrencyMap: Seq[(String, String)] = Seq(
    "€" -> "EUR", "$" -> "USD", "£" -> "GBP", "¥" -> "JPY", "₽" -> "RUB",
    "R$" -> "BRL", "CDN$" -> "CAD", "A$" -> "AUD")

  /** Returns (price, currency); naive ','→'.' replace — "1,234.56" → null. */
  def parsePriceAndCurrency(priceStr0: String): (Option[Double], Option[String]) = {
    if (priceStr0 == null) return (None, None)
    var priceStr = priceStr0.trim
    var currency: Option[String] = None
    activityCurrencyMap.collectFirst {
      case (sym, code) if priceStr.contains(sym) => (sym, code)
    } foreach { case (sym, code) =>
      currency = Some(code)
      priceStr = priceStr.replace(sym, "").trim
    }
    if (priceStr.isEmpty) return (None, None)
    pyFloat(priceStr.replace(',', '.')) match {
      case Some(p) => (Some(p), currency)
      case None    => (None, None)
    }
  }

  // ---- F7 (HTML tape parse) ----------------------------------------------

  private val priceSpanRe =
    """<span class="market_activity_cell market_activity_price[^"]*">\s*([^<]+?)\s*</span>""".r
  private val actionSpanRe =
    """<span class="market_activity_action">([^<]+)</span>""".r

  /** One HTML tape line → (price, currency, action). Raw HTML is kept by the
    * caller (the silver projection carries the input column through). */
  def parseActivityHtml(html: String): (Option[Double], Option[String], Option[String]) = {
    if (html == null) return (None, None, None)
    var price: Option[Double] = None
    var currency: Option[String] = None
    val it = priceSpanRe.findAllMatchIn(html)
    while (it.hasNext && price.isEmpty) {
      val s = it.next().group(1).trim
      if (s.nonEmpty) {
        val (p, c) = parsePriceAndCurrency(s)
        if (p.isDefined) { price = p; currency = c }
      }
    }
    val action = actionSpanRe.findFirstMatchIn(html).map(_.group(1).trim)
    (price, currency, action)
  }

  // ---- F9 (read-path re-parse) -------------------------------------------

  /** api/main.py:225-232 — strip ',', float-cast, null on failure. */
  def parsePriceToFloat(s: String): Option[Double] = {
    if (s == null) return None
    pyFloat(s.replace(",", ""))
  }

  // ---- F10 currency id maps ----------------------------------------------

  /** utility/loadTrackedItems_utility.py:25-30 */
  val steamCurrencyIdToIso: Map[Int, String] =
    Map(1 -> "USD", 2 -> "GBP", 3 -> "EUR", 24 -> "INR")

  /** src/snoozerScheduler.py:21-26 — ISO → (steam id, default country) */
  val isoToSteamIdCountry: Map[String, (Int, String)] =
    Map("USD" -> (1, "US"), "GBP" -> (2, "GB"), "EUR" -> (3, "DE"),
        "INR" -> (24, "IN"))

  // ---- Column surface -----------------------------------------------------
  // Native codegen expressions (ParserExprs.scala) calling the pure
  // functions above — no ScalaUDF serialization boundary; the names keep
  // the historical *Udf suffix so call sites read unchanged.

  import org.apache.spark.sql.graftExpr.{column => ec, expression => ee}

  val parseSteamPriceUdf: Column => Column = c => ec(SteamPriceExpr(ee(c)))
  val orderPriceMinorToMajorUdf: Column => Column = c => ec(MinorUnitsExpr(ee(c)))
  val parseVolumeUdf: Column => Column = c => ec(VolumeExpr(ee(c)))
  val extractCurrencyUdf: Column => Column = c => ec(CurrencyExpr(ee(c)))
  val parseSteamDatetimeUdf: Column => Column = c => ec(SteamDatetimeExpr(ee(c)))
  val parsePriceToFloatUdf: Column => Column = c => ec(PriceToFloatExpr(ee(c)))

  /** HTML line → struct(price, currency, action) for use under transform(). */
  val parseActivityHtmlUdf: Column => Column = c => ec(ActivityHtmlExpr(ee(c)))
}
