package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.PartitionedStore

/** Versioned-snapshot semantics: atomic manifest publish, time travel,
  * append commits, orphan invisibility, vacuum. */
class VersionedStoreSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def df(ids: Range) = {
    val s = spark
    import s.implicits._
    ids.map(i => (i.toLong, s"row-$i")).toDF("id", "payload")
  }

  test("snapshot commits: each version is a full table; time travel reads any of them") {
    val path = Files.createTempDirectory("vstore").toString
    val v1 = PartitionedStore.commitVersion(df(0 until 3), path)
    val v2 = PartitionedStore.commitVersion(df(0 until 5), path)
    assert(v1 == 1L && v2 == 2L)
    assert(PartitionedStore.versions(path) == Seq(1L, 2L))
    assert(PartitionedStore.readVersion(spark, path, Some(1L)).count() == 3)
    assert(PartitionedStore.readVersion(spark, path, Some(2L)).count() == 5)
    assert(PartitionedStore.readVersion(spark, path).count() == 5, "latest wins by default")
  }

  test("append commits: write cost is the delta; old versions stay intact") {
    val path = Files.createTempDirectory("vstore").toString
    PartitionedStore.commitVersion(df(0 until 3), path)
    val v2 = PartitionedStore.commitVersion(df(100 until 102), path, append = true)
    assert(PartitionedStore.readVersion(spark, path, Some(v2)).count() == 5)
    assert(PartitionedStore.readVersion(spark, path, Some(1L)).count() == 3,
      "time travel to the pre-append version")
    // the append's own data dir holds only the delta rows
    val dataDirs = Files.list(Paths.get(path, "data")).iterator()
    var n = 0
    dataDirs.forEachRemaining(_ => n += 1)
    assert(n == 2, "append adds one directory, not a rewrite")
  }

  test("a crash before manifest publish leaves the data invisible; vacuum reclaims it") {
    val path = Files.createTempDirectory("vstore").toString
    PartitionedStore.commitVersion(df(0 until 3), path)
    // simulate a crashed commit: data directory with no manifest
    val orphan = Paths.get(path, "data", "v9-deadbeef")
    df(0 until 2).write.parquet(orphan.toString)
    assert(PartitionedStore.versions(path) == Seq(1L),
      "unpublished data must not surface as a version")
    assert(PartitionedStore.readVersion(spark, path).count() == 3)
    val removed = PartitionedStore.vacuum(path)
    assert(removed == Seq("v9-deadbeef"))
    assert(!Files.exists(orphan))
    assert(PartitionedStore.readVersion(spark, path).count() == 3, "live data untouched")
  }

  test("truncating history then vacuuming reclaims unreferenced snapshot dirs") {
    val path = Files.createTempDirectory("vstore").toString
    PartitionedStore.commitVersion(df(0 until 3), path)
    PartitionedStore.commitVersion(df(0 until 5), path) // full snapshot: v1's dir now unshared
    Files.delete(Paths.get(path, "_manifests", "v1.list"))
    val removed = PartitionedStore.vacuum(path)
    assert(removed.length == 1 && removed.head.startsWith("v1-"))
    assert(PartitionedStore.readVersion(spark, path).count() == 5)
  }
}
