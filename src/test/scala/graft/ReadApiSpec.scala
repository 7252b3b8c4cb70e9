package graft

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.api.ReadApi

/** REST-surface parity: each endpoint function returns the reference's
  * shapes (limits, ordering, 404 seam, no-op suppression). */
class ReadApiSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("overview: newest-first, capped at 200") {
    val s = spark
    import s.implicits._
    val rows = (1 to 250).map(i =>
      ("itemA", ts(f"2024-01-01 ${i / 60}%02d:${i % 60}%02d:00"), "EUR", 1.0 + i, 2.0 + i, i))
      .toDF("market_hash_name", "timestamp", "currency", "lowest_price", "median_price", "volume")
    val out = ReadApi.overview(rows, "itemA").collect()
    assert(out.length == ReadApi.OverviewLimit)
    assert(out.head.getTimestamp(0).after(out.last.getTimestamp(0)))
  }

  test("history: range whitelist + ascending order + bad range rejected") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      ("itemA", ts("2023-01-01 00:00:00"), 1.0, 1),
      ("itemA", ts("2024-01-20 00:00:00"), 2.0, 2),
      ("itemA", ts("2024-01-30 00:00:00"), 3.0, 3))
      .toDF("market_hash_name", "time", "price", "volume")
    val asOf = lit("2024-01-31 00:00:00").cast("timestamp")
    assert(ReadApi.history(rows, "itemA", "week", asOf).collect().map(_.getDouble(1)).toSeq == Seq(3.0))
    assert(ReadApi.history(rows, "itemA", "month", asOf).count() == 2)
    assert(ReadApi.history(rows, "itemA", "all", asOf).count() == 3)
    intercept[IllegalArgumentException] {
      ReadApi.history(rows, "itemA", "'; DROP TABLE--", asOf)
    }
  }

  test("activity: tail clamps like Python [-50:] when fewer than 50 events") {
    val s = spark
    import s.implicits._
    // latest snapshot holds 3 events — far under ActivityTail; the endpoint
    // must return all 3 (Spark's raw slice(c,-50,50) would return EMPTY)
    val snap = Seq(
      ("itemA", ts("2024-01-01 10:00:00"), Seq("e1", "e2", "e3")),
      ("itemA", ts("2024-01-01 09:00:00"), Seq("old")))
      .toDF("market_hash_name", "timestamp", "parsed_activities")
    val out = ReadApi.activity(snap, "itemA").collect()
    assert(out.length == 1)
    assert(out(0).getSeq[String](out(0).fieldIndex("parsed_activities")).toList ==
      List("e1", "e2", "e3"))
    // and a genuinely long tail still slices to the last k
    val long = Seq(("itemB", ts("2024-01-01 10:00:00"), (1 to 60).map(i => s"e$i")))
      .toDF("market_hash_name", "timestamp", "parsed_activities")
    val r = ReadApi.activity(long, "itemB").collect()(0)
    val tail = r.getSeq[String](r.fieldIndex("parsed_activities")).toList
    assert(tail.length == ReadApi.ActivityTail && tail.head == "e11" && tail.last == "e60")
  }

  test("itemExists: the 200-empty vs 404 seam") {
    val s = spark
    import s.implicits._
    val tracked = Seq(("itemA", "priceoverview", true), ("itemB", "histogram", false))
      .toDF("market_hash_name", "stream", "enabled")
    assert(ReadApi.itemExists(tracked, "itemA"))
    assert(!ReadApi.itemExists(tracked, "itemB")) // disabled → 404
    assert(!ReadApi.itemExists(tracked, "nope"))
  }

  test("meta: tracked count + last ingest + window request count") {
    val s = spark
    import s.implicits._
    val tracked = Seq(("a", true), ("b", true), ("c", false)).toDF("market_hash_name", "enabled")
    val t1 = Seq(ts("2024-01-01 10:00:00"), ts("2024-01-01 10:00:30")).toDF("timestamp")
    val t2 = Seq(ts("2024-01-01 09:00:00")).toDF("timestamp")
    val asOf = lit("2024-01-01 10:01:00").cast("timestamp")
    val r = ReadApi.meta(tracked, Seq(t1, t2), asOf, 60).collect()(0)
    assert(r.getAs[Timestamp]("last_ingest") == ts("2024-01-01 10:00:30"))
    assert(r.getAs[Long]("requests_in_window") == 2) // 10:00:00 + 10:00:30
    assert(r.getAs[Long]("tracked_count") == 2)
  }

  test("replaceTrackedItems: insert/update/delete classified, noop suppressed") {
    val s = spark
    import s.implicits._
    val current = Seq(("a", "priceoverview", 30), ("b", "activity", 8), ("c", "histogram", 60))
      .toDF("market_hash_name", "stream", "poll_interval_sec")
    val desired = Seq(("a", "priceoverview", 30), ("b", "activity", 15), ("d", "pricehistory", 3600))
      .toDF("market_hash_name", "stream", "poll_interval_sec")
    val ops = ReadApi.replaceTrackedItems(current, desired, Seq("poll_interval_sec"))
      .collect().map(r => (r.getString(0), r.getString(2))).toMap
    assert(ops == Map("b" -> "update", "c" -> "delete", "d" -> "insert")) // 'a' = noop, absent
  }
}
