package graft
import org.apache.spark.sql.SparkSession

/** Standalone re-measure of ONE registered query: N timed passes with
  * post-AQE join-strategy fingerprints per pass — the adjudication tool
  * the r10 verdict asked for when two artifacts disagree on a single
  * query (j12_entity_resolve: 1.19 s committed vs 16.7 s in the driver
  * run). Run on an idle box; identical session config to [[Bench]] so a
  * divergence is the query, not the harness.
  *
  * Usage: runMain graft.BenchOne <query_name> [n_passes=5] */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val n = if (args.length > 1) args(1).toInt else 5
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    val obs = (1 to n).map { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      val fp = Bench.planFingerprint(fn(spark, sfDir))
      println(f"""{"pass":$i,"sec":$t%.3f,"plan":"$fp"}""")
      t
    }
    println(f"""{"query":"$name","sf":"$sfDir","best":${obs.min}%.3f,"worst":${obs.max}%.3f}""")
    spark.stop()
  }
}
