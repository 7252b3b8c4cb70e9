package graft.sources

import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Time-partitioned parquet store with retention — the Spark shape of the
  * reference's hypertable + compression + retention policies
  * (src/SQLinserts.py:246-357):
  *
  *  - hypertable partitioning on time  → `partitionBy(date)` directories;
  *    range predicates prune partitions at the source level.
  *  - `segmentby market_hash_name` compression → `sortWithinPartitions`
  *    on the series key: parquet gets long same-key runs (RLE/dict), and
  *    per-item scans touch few row groups via min/max stats — the same
  *    locality the covering index provided.
  *  - drop_chunks retention (90 d / 30 d)  → partition-directory drop; a
  *    metadata-only operation, no data rewrite, exactly like chunk drops.
  *
  * At cluster scale the same code targets an object store; retention
  * stays O(partitions-dropped). */
object PartitionedStore {

  val DateCol = "p_date"

  /** Append rows partitioned by the date of `tsCol`, clustered by
    * `keyCol` within each partition. */
  def append(df: DataFrame, path: String, tsCol: String, keyCol: String): Unit =
    df.withColumn(DateCol, to_date(col(tsCol)))
      .repartition(col(DateCol))
      .sortWithinPartitions(col(keyCol), col(tsCol))
      .write.mode(SaveMode.Append)
      .option("compression", "zstd") // columnar-compression analog of the
      .partitionBy(DateCol)          // reference's Timescale policies
      .parquet(path)

  /** Reprocess: replace ONLY the partitions present in `df` (dynamic
    * partition overwrite), leaving all other days untouched — the
    * idempotent backfill path (re-running a day's job converges instead
    * of duplicating). */
  def overwritePartitions(df: DataFrame, path: String, tsCol: String,
                          keyCol: String): Unit =
    df.withColumn(DateCol, to_date(col(tsCol)))
      .repartition(col(DateCol))
      .sortWithinPartitions(col(keyCol), col(tsCol))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .option("compression", "zstd")
      .partitionBy(DateCol)
      .parquet(path)

  /** Read back with partition pruning available on DateCol. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Retention: drop partition directories strictly older than
    * `keepDays` before `asOf`. Returns dropped partition names. */
  def dropExpired(path: String, keepDays: Int, asOf: java.time.LocalDate): Seq[String] = {
    val cutoff = asOf.minusDays(keepDays)
    val root = Paths.get(path)
    if (!Files.exists(root)) return Nil
    val dropped = Files.list(root).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith(s"$DateCol="))
      .filter { p =>
        val d = p.getFileName.toString.stripPrefix(s"$DateCol=")
        scala.util.Try(java.time.LocalDate.parse(d)).toOption.exists(_.isBefore(cutoff))
      }
      .toList
    dropped.foreach(deleteRecursive)
    dropped.map(_.getFileName.toString)
  }

  /** Small-file compaction — the nightly companion of retention. Each
    * streaming micro-batch (or per-poll append, the reference's 5-minute
    * cadence) lands its own file per partition, so a day accumulates
    * hundreds of tiny files: scan tasks, open() round-trips, and footer
    * reads all grow with file count, not data size. Partitions whose file
    * count exceeds `maxFiles` are rewritten into
    * ⌈rows / targetRowsPerFile⌉ files with the (key, ts) clustering
    * restored (small appends interleave keys; the rewrite re-sorts, so
    * RLE/dict compression and min/max row-group skipping recover too).
    *
    * Quiet partitions are untouched — the loop runs over OFFENDING
    * partitions only (nightly ≈ yesterday's), each rewritten to a hidden
    * sibling then swapped in via two renames (original → trash sibling,
    * rewrite → original, delete trash): at every instant the partition
    * path holds a complete copy, so a crash at any point loses no data —
    * the worst case leaves a hidden `.trash`/`.compact` sibling for the
    * next run to reclaim (stale ones are cleaned up front). Returns the
    * compacted partition names. */
  def compact(spark: SparkSession, path: String, keyCol: String,
              tsCol: String, maxFiles: Int = 8,
              targetRowsPerFile: Long = 4000000L): Seq[String] = {
    val root = Paths.get(path)
    if (!Files.exists(root)) return Nil
    // recover from any prior crash: a partition sitting in `.trash` with no
    // original means the crash hit between the two swap renames — restore
    // the original (always complete); orphaned trash/rewrite dirs whose
    // original exists are just stale garbage
    Files.list(root).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith(".") &&
        p.getFileName.toString.endsWith(".trash")).toList
      .foreach { trash =>
        val orig = trash.resolveSibling(
          trash.getFileName.toString.stripPrefix(".").stripSuffix(".trash"))
        if (!Files.exists(orig)) Files.move(trash, orig)
        else deleteRecursive(trash)
      }
    val offending = Files.list(root).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith(s"$DateCol=") &&
        Files.isDirectory(p))
      .filter { p =>
        Files.list(p).iterator().asScala
          .count(_.getFileName.toString.endsWith(".parquet")) > maxFiles
      }
      .toList
    offending.foreach { dir =>
      val name = dir.getFileName.toString
      val tmp = dir.resolveSibling(s".$name.compact")
      val trash = dir.resolveSibling(s".$name.trash")
      deleteRecursive(tmp) // a stale rewrite is never authoritative
      val part = spark.read.parquet(dir.toString)
      val nFiles = math.max(1L,
        (part.count() + targetRowsPerFile - 1) / targetRowsPerFile).toInt
      part.repartition(nFiles)
        .sortWithinPartitions(col(keyCol), col(tsCol))
        .write.mode(SaveMode.Overwrite)
        .option("compression", "zstd")
        .parquet(tmp.toString)
      Files.move(dir, trash) // original stays whole until the rewrite is live
      Files.move(tmp, dir)
      deleteRecursive(trash)
    }
    offending.map(_.getFileName.toString)
  }

  private def deleteRecursive(p: Path): Unit = {
    if (Files.isDirectory(p))
      Files.list(p).iterator().asScala.toList.foreach(deleteRecursive)
    Files.deleteIfExists(p)
  }
}
