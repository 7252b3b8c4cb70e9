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

  test("every query has an oracle twin — no rows-only downgrades") {
    // even the HLL sketch query carries an oracle now: its contract is
    // the error BOUND (each engine checks its own sketch vs its own
    // exact count), not the engine-specific estimate
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }

  test("no oracle without a query; names are well-formed") {
    assert((SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet).isEmpty)
    assert(SparkEntry.queries.keySet.forall(_.matches("[a-z][a-z0-9_]*")))
  }

  test("flagship entry returns rows at the smoke scale factor") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
