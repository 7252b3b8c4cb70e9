package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.SteamParsers._

/** Golden cases from FIXTURES.md §3 (reference dataExamples.txt +
  * SQLinserts.py parser semantics) plus ScalaCheck properties for the
  * locale round-trip (SURVEY §5 / §7.4.1). */
class SteamParsersSpec extends AnyFunSuite {

  /** seeded property sampling (scalacheck bridge unavailable offline) */
  private def forSamples(lo: Long, hi: Long)(f: Long => Unit): Unit = {
    val rnd = new scala.util.Random(42)
    (0 until 500).foreach { _ =>
      f(lo + (rnd.nextLong().abs % (hi - lo + 1)))
    }
  }

  test("F1 golden: locale price parse") {
    assert(parseSteamPrice("0,03€") == Some(0.03))
    assert(parseSteamPrice("$5.00") == Some(5.0))
    assert(parseSteamPrice("1.234,56€") == Some(1234.56))
    assert(parseSteamPrice("1,234.56") == Some(1234.56))
    assert(parseSteamPrice("1,000") == Some(1000.0))
    assert(parseSteamPrice("0,85") == Some(0.85))
    assert(parseSteamPrice("5,0") == Some(50.0)) // 1 trailing digit → thousands
    assert(parseSteamPrice(null) == None)
    assert(parseSteamPrice("") == None)
    assert(parseSteamPrice("abc") == None)
    // ordered-strip sharp edge: '$' stripped first leaves "CDN" behind
    assert(parseSteamPrice("CDN$5.00") == None)
    assert(parseSteamPrice("R$5.00") == Some(5.0)) // 'R' strip rescues BRL
  }

  test("F2 golden: minor units (the 100x trap)") {
    assert(orderPriceMinorToMajor("6711") == Some(67.11))
    assert(orderPriceMinorToMajor("3") == Some(0.03))
    assert(orderPriceMinorToMajor("1,234") == Some(12.34))
    assert(orderPriceMinorToMajor("") == None)
    assert(orderPriceMinorToMajor(null) == None)
    // F1 on the same input would be 100x off:
    assert(parseSteamPrice("6711") == Some(6711.0))
  }

  test("F3 golden: volume parse") {
    assert(parseVolume("435") == Some(435))
    assert(parseVolume("1,234") == Some(1234))
    assert(parseVolume("1.234.567") == Some(1234567))
    assert(parseVolume(null) == None)
    assert(parseVolume("n/a") == None)
  }

  test("F4 golden: ordered currency scan") {
    assert(extractCurrency("0,03€") == Some("EUR"))
    assert(extractCurrency("$5.00") == Some("USD"))
    assert(extractCurrency("R$5.00") == Some("USD")) // '$' wins before 'R$'
    assert(extractCurrency("pуб. 10,50") == Some("RUB"))
    assert(extractCurrency("kr 12,34") == Some("SEK"))
    assert(extractCurrency("R 123,45") == Some("ZAR"))
    assert(extractCurrency("123") == None)
    assert(extractCurrency(null) == None)
  }

  test("F5 golden: steam datetime") {
    val ts = parseSteamDatetime("Jul 02 2014 01: +0")
    assert(ts.map(_.toInstant.toString) == Some("2014-07-02T01:00:00Z"))
    assert(parseSteamDatetime("Dec 25 2023 14: +0")
      .map(_.toInstant.toString) == Some("2023-12-25T14:00:00Z"))
    assert(parseSteamDatetime("garbage") == None)
    assert(parseSteamDatetime("Jul 02 2014 25: +0") == None) // hour 25
    assert(parseSteamDatetime("Feb 30 2021 01: +0") == None) // invalid day
    assert(parseSteamDatetime(null) == None)
  }

  test("F6 golden: activity price+currency (naive comma replace)") {
    assert(parsePriceAndCurrency("0,85€") == (Some(0.85), Some("EUR")))
    assert(parsePriceAndCurrency("$12.50") == (Some(12.5), Some("USD")))
    assert(parsePriceAndCurrency("1,234.56") == (None, None)) // "1.234.56"
    assert(parsePriceAndCurrency("") == (None, None))
  }

  test("F7 golden: HTML tape parse") {
    val html =
      "<div class=\"market_activity_line_item ellipsis\">\n\t<span class=\"market_activity_placeholder\"></span>\n\t" +
        "<span class=\"market_activity_cell market_activity_price \">\n\t\t\t</span>\n\t" +
        "<span class=\"market_activity_cell market_activity_price \">\n\t\t0,85€\t</span>\n\t" +
        "<span class=\"market_activity_cell market_activity_price \">\n\t\t\t</span>\n\t" +
        "<span class=\"market_activity_action\">Purchased</span>\n</div>\n"
    assert(parseActivityHtml(html) == (Some(0.85), Some("EUR"), Some("Purchased")))
    assert(parseActivityHtml("<div>nothing</div>") == (None, None, None))
  }

  test("F1 property: US-formatted amounts round-trip") {
    forSamples(1L, 99999999L) { minor => // minor units
      val major = minor / 100.0
      val grouped = f"$major%,.2f" // e.g. 1,234.56
      assert(parseSteamPrice("$" + grouped) == Some(major))
    }
  }

  test("F1 property: EU-formatted amounts round-trip") {
    forSamples(1L, 99999999L) { minor =>
      val major = minor / 100.0
      val us = f"$major%,.2f"
      val eu = us.map { case ',' => '.'; case '.' => ','; case c => c }
      assert(parseSteamPrice(eu + "€") == Some(major))
    }
  }

  test("F2 property: minor units always /100 of integer string") {
    forSamples(0L, 10000000L) { n =>
      assert(orderPriceMinorToMajor(n.toString) == Some(n / 100.0))
    }
  }
}
