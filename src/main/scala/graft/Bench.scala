package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
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
    // Full materialization, not count(): under count() Catalyst prunes
    // every unevaluated projection, so projection-heavy queries (parser /
    // hash kernels) would be benchmarked with their kernels optimized
    // away. The noop sink evaluates all output columns and discards rows
    // executor-side — no driver collect, no disk.
    def materialize(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // JVM/codegen warmup so the first measured query isn't charged for it
    try { materialize(SparkEntry.entry(spark)) } catch { case _: Throwable => () }
    // Every query runs twice, both passes timed. Pass 1 ("queries") is the
    // cold contract — same as every prior round. Pass 2 ("steady") excludes
    // per-query codegen/JIT/shuffle-file warmup, so cold-run jitter on a
    // shared sandbox can't masquerade as a plan regression: compare steady
    // maps across rounds for regressions, cold maps for first-run latency.
    def timed(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { materialize(fn(spark, sfDir)) } catch { case _: Throwable => () }
      (System.nanoTime() - t0) / 1e9
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      name -> (timed(fn), timed(fn))
    }
    def jmap(m: Iterable[(String, Double)]): String =
      m.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val cold = jmap(results.map { case (k, (c, _)) => k -> c })
    val steady = jmap(results.map { case (k, (_, s)) => k -> s })
    val coldTotal = results.values.map(_._1).sum
    val steadyTotal = results.values.map(_._2).sum
    // Delta ≪ corpus, with numbers: the incremental index paths claim
    // nightly cost tracks the delta, not the standing corpus. Each pair
    // times a FULL rebuild over (standing ∪ delta) against an append of
    // a 1% delta onto a prebuilt standing index (standing build untimed);
    // both end atomically published and queryable, so the ratio compares
    // like for like. At this sf absolute times are small — the claim
    // under test is the RATIO, which only widens with corpus size
    // (append cost is O(delta), rebuild O(corpus)).
    import org.apache.spark.sql.functions.{col, explode, lit, sequence}
    val incremental: Seq[(String, Double)] = {
      def timedOp(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
      // 20× replication (distinct ids) so the standing corpus is big
      // enough that rebuild cost is corpus-bound — at fixture SF both
      // paths would otherwise drown in fixed per-job latency and the
      // delta-tracking ratio under test would be invisible
      def amplify(df: org.apache.spark.sql.DataFrame, idCol: String): org.apache.spark.sql.DataFrame =
        df.withColumn("rep", explode(sequence(lit(0), lit(19))))
          .withColumn(idCol, col(idCol) * 20 + col("rep"))
          .drop("rep")
      val docs = amplify(Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text")), "doc_id")
      val dStand = docs.filter(col("doc_id") % 100 =!= 0)
      val dDelta = docs.filter(col("doc_id") % 100 === 0)
      val bmRebuild = timedOp(graft.operators.Search.writeBm25Index(
        docs, "doc_id", "text", tmp("bench_bm25_rb")))
      val bmStandPath = tmp("bench_bm25_inc")
      graft.operators.Search.writeBm25Index(dStand, "doc_id", "text", bmStandPath)
      val bmAppend = timedOp(graft.operators.Search.appendBm25Index(
        spark, dDelta, "doc_id", "text", bmStandPath))
      val emb = amplify(Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding")), "vec_id")
      val eStand = emb.filter(col("vec_id") % 100 =!= 0)
      val eDelta = emb.filter(col("vec_id") % 100 === 0)
      val ivfRebuild = timedOp(graft.operators.Similarity.writeIvfIndex(
        emb, "vec_id", "embedding", 32, tmp("bench_ivf_rb")))
      val ivfStandPath = tmp("bench_ivf_inc")
      graft.operators.Similarity.writeIvfIndex(
        eStand, "vec_id", "embedding", 32, ivfStandPath)
      val ivfAppend = timedOp(graft.operators.Similarity.appendIvfIndex(
        spark, eDelta, "vec_id", "embedding", ivfStandPath))
      // third leg of the stored-index trilogy: near-dup LSH
      val lshRebuild = timedOp(graft.operators.Dedup.writeLshIndex(
        docs, "doc_id", "text", tmp("bench_lsh_rb")))
      val lshStandPath = tmp("bench_lsh_inc")
      graft.operators.Dedup.writeLshIndex(dStand, "doc_id", "text", lshStandPath)
      val lshAppend = timedOp(graft.operators.Dedup.appendLshIndex(
        spark, dDelta, "doc_id", "text", lshStandPath))
      Seq("bm25_rebuild" -> bmRebuild, "bm25_append_1pct" -> bmAppend,
        "ivf_rebuild" -> ivfRebuild, "ivf_append_1pct" -> ivfAppend,
        "lsh_rebuild" -> lshRebuild, "lsh_append_1pct" -> lshAppend)
    }
    println(s"""{"metric":"total","value":$coldTotal,"unit":"sec","queries":$cold,"steady":$steady,"steady_total":$steadyTotal,"incremental":${jmap(incremental)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
