package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational
import org.apache.spark.sql.functions.col

/** intervalJoin semantics: exact half-open containment, bin-boundary
  * coverage (an interval spanning bins matches points in every spanned
  * bin), no duplicate pairs, and the no-cartesian plan contract. */
class RelationalOpsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def pts(ts: Long*) = {
    val s = spark
    import s.implicits._
    ts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("pid", "t")
  }

  private def ivs(rows: (Long, Long, Long)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("iid", "lo", "hi")
  }

  test("half-open [lo, hi): lo in, hi out; bin-spanning intervals covered") {
    // binWidth 10; interval 5..25 spans bins 0,1,2
    val out = Relational.intervalJoin(
      pts(4L, 5L, 9L, 10L, 19L, 24L, 25L, 30L), "t",
      ivs((100L, 5L, 25L)), "lo", "hi", binWidth = 10L)
      .select(col("pid"), col("t")).collect().map(_.getLong(1)).toSet
    assert(out == Set(5L, 9L, 10L, 19L, 24L)) // 4 before, 25=hi out, 30 out
  }

  test("each matching (point, interval) pair appears exactly once") {
    val out = Relational.intervalJoin(
      pts(0L, 7L, 13L), "t",
      ivs((1L, 0L, 20L), (2L, 5L, 15L), (3L, 30L, 30L)), "lo", "hi", 7L)
      .select(col("pid"), col("iid")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length == out.distinct.length)
    // interval 3 is empty (hi <= lo): never matches
    assert(!out.map(_._2).contains(3L))
    assert(out.toSet == Set((0L, 1L), (1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L)))
  }

  test("plan is a hash join on the bin — no cartesian, no nested loop") {
    val plan = Relational.intervalJoin(pts(1L, 2L), "t",
      ivs((1L, 0L, 10L)), "lo", "hi", 10L)
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("negative timestamps: truncating DIV is monotone, coverage holds") {
    val out = Relational.intervalJoin(
      pts(-15L, -10L, -6L, -5L, 0L), "t",
      ivs((1L, -12L, -5L)), "lo", "hi", 10L)
      .collect().map(_.getLong(1)).toSet
    assert(out == Set(-10L, -6L))
  }
}
