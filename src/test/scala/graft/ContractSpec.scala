package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The driver contract as a regression test: a new query wired without
  * its oracle twin (or vice versa) fails here, in the same commit, rather
  * than as a silent rows-only downgrade in the next correctness report. */
class ContractSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Sketch queries are engine-specific and stay rows-only BY DESIGN —
    * additions to this set need the same documented justification. */
  private val RowsOnlyByDesign = Set("a16_approx_distinct")

  test("every query has an oracle twin unless documented rows-only") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing == RowsOnlyByDesign,
      s"queries without oracle: ${missing -- RowsOnlyByDesign}")
  }

  test("no oracle without a query; names are well-formed") {
    assert((SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet).isEmpty)
    assert(SparkEntry.queries.keySet.forall(_.matches("[a-z][a-z0-9_]*")))
  }

  test("flagship entry returns rows at the smoke scale factor") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
