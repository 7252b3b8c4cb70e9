package graft

import org.apache.spark.sql.SparkSession

/** Targeted re-timer for bench triage: times the named queries (cold +
  * three steady passes) with exactly [[Bench]]'s measurement discipline
  * (noop-sink materialization, entry-query warmup, same session conf) so
  * a single suspicious number from a full run can be re-measured on a
  * quiet box in seconds instead of re-running the whole suite. Usage:
  *
  *   sbt -batch "runMain graft.BenchOne rag_retrieve rag_retrieve_indexed"
  *
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  * SPARK_GRAFT_CPUS (default 32 — triage wants the bench box shape).
  * Output: one BENCHONE line per query; not part of the driver contract.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: BenchOne <queryName> [more...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def materialize(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    try { materialize(SparkEntry.entry(spark)) } catch { case _: Throwable => () }
    args.foreach { q =>
      val fn = SparkEntry.queries.getOrElse(q,
        sys.error(s"unknown query '$q' — not in SparkEntry.queries"))
      def t(): Double = {
        val t0 = System.nanoTime()
        materialize(fn(spark, sfDir))
        (System.nanoTime() - t0) / 1e9
      }
      val cold = t(); val s = Seq(t(), t(), t())
      // post-AQE join-strategy fingerprint (Bench.planFingerprint): a
      // triage re-time must distinguish "same plan, so contention" from
      // "a broadcast fell off" — times alone can't (the r10 lesson)
      val fp = Bench.planFingerprint(fn(spark, sfDir))
      println(f"BENCHONE $q%s cold=$cold%.3f steady_min=${s.min}%.3f " +
        s"steady=${s.map(x => f"$x%.3f").mkString("[", ",", "]")} plan=$fp")
    }
    spark.stop()
  }
}
