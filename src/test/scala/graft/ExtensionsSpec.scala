package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.GraftExtensions

/** SQL-surface registration of the native expressions. Own session: the
  * extension must be installed at build time. */
class ExtensionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    // getOrCreate would silently return another suite's session, which has
    // no extensions installed — force a session this suite owns
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
  }

  test("registered SQL functions evaluate like the Column API") {
    val r = spark.sql(
      """SELECT graft_poly_hash('abc')               AS ph,
        |       graft_simhash('the quick fox', 30)   AS sh,
        |       graft_steam_price('1.234,56€')       AS price,
        |       graft_minor_to_major('3')            AS bid,
        |       graft_extract_currency('0,03€')      AS cur,
        |       graft_parse_volume('1,234')          AS vol,
        |       size(graft_shingle_hashes('a b c d', 3)) AS nsh,
        |       graft_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                    array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS cos
        |""".stripMargin).collect()(0)
    assert(r.getLong(0) == 96354L)
    assert(r.getLong(1) >= 0L)
    assert(r.getDouble(2) == 1234.56)
    assert(r.getDouble(3) == 0.03)
    assert(r.getString(4) == "EUR")
    assert(r.getInt(5) == 1234)
    assert(r.getInt(6) == 2)
    assert(math.abs(r.getDouble(7) - 1.0) < 1e-12)
  }

  test("graft_hash_embed: d floats, signed token counts, empty-ish text still d-dim") {
    val r = spark.sql(
      """SELECT graft_hash_embed('a b a', 16) AS e,
        |       graft_hash_embed('', 16)      AS z""".stripMargin).collect()(0)
    val e = r.getSeq[Float](0)
    assert(e.length == 16)
    // 3 tokens, each ±1 into one of 16 slots → L1 mass ≤ 3, parity exact
    assert(e.map(math.abs).sum <= 3.0f && e.map(math.abs).sum % 1.0f == 0.0f)
    assert(r.getSeq[Float](1).length == 16)
  }

  test("banded LSH keys SQL function: band 0 equals graft_lsh_bucket") {
    val r = spark.sql(
      """SELECT graft_lsh_band_keys(array(CAST(0.3 AS FLOAT), CAST(-0.7 AS FLOAT)), 8, 6) AS ks,
        |       graft_lsh_bucket(array(CAST(0.3 AS FLOAT), CAST(-0.7 AS FLOAT)), 6) AS b0
        |""".stripMargin).collect()(0)
    val ks = r.getSeq[Long](0)
    assert(ks.length == 8 && ks.forall(k => k >= 0 && k < 64))
    assert(ks.head == r.getLong(1))
  }

  test("seq shingle hashes SQL function: positional, non-distinct") {
    val r = spark.sql(
      """SELECT graft_seq_shingle_hashes('a b c b c d', 2) AS seq,
        |       graft_shingle_hashes('a b c b c d', 2) AS dis
        |""".stripMargin).collect()(0)
    val seq = r.getSeq[Long](0)
    val dis = r.getSeq[Long](1)
    assert(seq.length == 5)            // one hash per 2-gram start position
    assert(seq(1) == seq(3))           // 'b c' recurs at positions 1 and 3
    assert(seq.distinct == dis)        // first-occurrence distinct = set kernel
  }

  test("winnow and char-ngram SQL functions") {
    val r = spark.sql(
      """SELECT size(graft_winnow('a b c d e f g h', 3, 4)) AS nw,
        |       size(graft_char_ngrams('abcdef', 3, false)) AS nc,
        |       size(graft_char_ngrams('aaaa', 3, true)) AS nd
        |""".stripMargin).collect()(0)
    assert(r.getInt(0) >= 1)
    assert(r.getInt(1) == 4) // 6 chars -> 4 trigrams
    assert(r.getInt(2) == 1) // 'aaa','aaa' distinct -> 1
  }

  test("activity html parse returns a struct in SQL") {
    val r = spark.sql(
      """SELECT graft_parse_activity_html(
        |  '<span class="market_activity_cell market_activity_price ">0,85€</span><span class="market_activity_action">Purchased</span>') AS p
        |""".stripMargin).select("p.price", "p.currency", "p.action").collect()(0)
    assert(r.getDouble(0) == 0.85 && r.getString(1) == "EUR" && r.getString(2) == "Purchased")
  }
}
