package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata (TESTDATA.md).
  *
  * All reads are plain parquet scans; Catalyst pushes filters/pruning into
  * the scan, so callers should NOT cache or materialize here. At cluster
  * scale these would be catalog tables partitioned by date — the query
  * surface below only relies on column pruning + predicate pushdown, both of
  * which work identically on partitioned layouts.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** events.parquet carries TIMESTAMP(NANOS) which Spark cannot read as a
    * timestamp; read nanos as long and floor-convert to microseconds (the
    * same truncation DuckDB applies casting TIMESTAMP_NS → TIMESTAMP).
    * The raw nanos survive as `ts_ns` so range predicates can be phrased
    * against the PHYSICAL column and reach the parquet scan as
    * PushedFilters (a filter on the derived `ts` cannot be pushed through
    * the conversion expression — at cluster scale that is the difference
    * between pruning row groups and reading the full table). */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts_ns div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
