package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * W1 latest-per-key — the reference's core read shape
    * (api/main.py:248-320) as a single-shuffle max(struct) aggregation. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.w1LatestEventPerUser(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.defs ++ InventoryQueries.defs ++ InventoryQueries2.defs ++ SteamQueries.defs ++ WireQueries.defs ++
      TrainingQueries.defs ++ SimilarityQueries.defs ++ TextQueries.defs ++ MultimodalQueries.defs ++ SequenceQueries.defs ++
      SearchQueries.defs ++ GraphQueries.defs ++ DataQualityQueries.defs ++ TimeSeriesQueries.defs ++ JourneyQueries.defs
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracle ++ InventoryQueries.oracle ++ InventoryQueries2.oracle ++ SteamQueries.oracle ++ WireQueries.oracle ++
      TrainingQueries.oracle ++ SimilarityQueries.oracle ++ TextQueries.oracle ++ MultimodalQueries.oracle ++ SequenceQueries.oracle ++
      SearchQueries.oracle ++ GraphQueries.oracle ++ DataQualityQueries.oracle ++ TimeSeriesQueries.oracle ++ JourneyQueries.oracle
}
