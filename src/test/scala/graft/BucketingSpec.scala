package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing: pre-shuffled storage layout so repeated equi-joins and
  * aggregations on the bucket key run with NO exchange — the 100 TB
  * answer to "this join shuffles the fact table every query". The
  * reference leans on a covering index per item; bucketing is the
  * distributed equivalent (co-located, co-sorted per key). */
class BucketingSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val wh = java.nio.file.Files.createTempDirectory("graft_wh").toString
    SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force the issue
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  test("bucketed tables join and aggregate without a shuffle") {
    val s = spark
    import s.implicits._
    val facts = (1 to 1000).map(i => (i % 50L, i.toLong, i * 1.5)).toDF("item_id", "seq", "price")
    val dims = (0 until 50).map(i => (i.toLong, s"item_$i")).toDF("item_id", "name")
    facts.write.mode("overwrite").bucketBy(8, "item_id").sortBy("item_id")
      .saveAsTable("facts_b")
    dims.write.mode("overwrite").bucketBy(8, "item_id").sortBy("item_id")
      .saveAsTable("dims_b")

    val joined = s.table("facts_b").join(s.table("dims_b"), "item_id")
    val joinPlan = joined.queryExecution.executedPlan.toString
    assert(!joinPlan.contains("Exchange"), s"bucketed join must not shuffle:\n$joinPlan")
    assert(joined.count() == 1000)

    val agg = s.table("facts_b").groupBy("item_id").agg(sum("price"))
    val aggPlan = agg.queryExecution.executedPlan.toString
    assert(!aggPlan.contains("Exchange"), s"bucketed agg must not shuffle:\n$aggPlan")
    assert(agg.count() == 50)

    // non-bucketed baseline DOES shuffle — the comparison that matters
    val plain = facts.join(dims, "item_id")
    assert(plain.queryExecution.executedPlan.toString.contains("Exchange"))
  }
}
