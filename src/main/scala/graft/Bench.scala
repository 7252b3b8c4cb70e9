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
    def timedIn(dir: String)(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { materialize(fn(spark, dir)) } catch { case _: Throwable => () }
      (System.nanoTime() - t0) / 1e9
    }
    def timed(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double =
      timedIn(sfDir)(fn)
    val results = SparkEntry.queries.map { case (name, fn) =>
      name -> (timed(fn), timed(fn))
    }
    // 3-decimal times: ms resolution is below sandbox jitter, and the
    // driver's artifact keeps only the last 2,000 chars of this line —
    // every spare digit costs steady-map entries in the surviving tail.
    def r3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    def jmap(m: Iterable[(String, Double)]): String =
      m.map { case (k, v) => "\"" + k + "\":" + r3(v) }.mkString("{", ",", "}")
    val cold = jmap(results.map { case (k, (c, _)) => k -> c })
    val steady = jmap(results.map { case (k, (_, s)) => k -> s })
    val coldTotal = results.values.map(_._1).sum
    val steadyTotal = results.values.map(_._2).sum
    import org.apache.spark.sql.functions.{col, concat, explode, lit, regexp_replace, sequence}
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    def timedOp(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // n× replication with distinct ids so an amplified corpus is big
    // enough that index/build cost is corpus-bound — at fixture SF both
    // paths would otherwise drown in fixed per-job latency.
    def amplify(df: org.apache.spark.sql.DataFrame, idCol: String, n: Int): org.apache.spark.sql.DataFrame =
      df.withColumn("rep", explode(sequence(lit(0), lit(n - 1))))
        .withColumn(idCol, col(idCol) * n + col("rep"))
        .drop("rep")
    // Delta ≪ corpus, with numbers: the incremental index paths claim
    // nightly cost tracks the delta, not the standing corpus. Each pair
    // times a FULL rebuild over (standing ∪ delta) against an append of
    // a 1% delta onto a prebuilt standing index (standing build untimed);
    // both end atomically published and queryable, so the ratio compares
    // like for like. At this sf absolute times are small — the claim
    // under test is the RATIO, which only widens with corpus size
    // (append cost is O(delta), rebuild O(corpus)).
    val incremental: Seq[(String, Double)] = {
      val docs = amplify(Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text")), "doc_id", 20)
      val dStand = docs.filter(col("doc_id") % 100 =!= 0)
      val dDelta = docs.filter(col("doc_id") % 100 === 0)
      val bmRebuild = timedOp(graft.operators.Search.writeBm25Index(
        docs, "doc_id", "text", tmp("bench_bm25_rb")))
      val bmStandPath = tmp("bench_bm25_inc")
      graft.operators.Search.writeBm25Index(dStand, "doc_id", "text", bmStandPath)
      val bmAppend = timedOp(graft.operators.Search.appendBm25Index(
        spark, dDelta, "doc_id", "text", bmStandPath))
      val emb = amplify(Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding")), "vec_id", 20)
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
    // Scaling curve: the "survives 100×" claim with numbers. The five
    // hottest steady operators re-timed on 1×/4×/20× corpora written as
    // real parquet dirs, so each point runs the EXACT registered query
    // (same plan, bigger scan). Replicated text is salted per replica
    // (every token suffixed "_<rep>") so replicas share no shingles —
    // plain duplication would give every doc 19 near-identical twins and
    // the TRUE pair count would grow quadratically in the factor, which
    // would measure the corpus pathology, not the engine. With salting
    // the near-dup/cluster structure replicates n×, i.e. honest linear
    // work. Query-id predicates (doc_id < NQ) stay invariant: ids map to
    // id*n+rep, so exactly NQ rows keep ids below NQ at every factor.
    // The LSH rebuild-vs-append pair rides the same curve: append cost is
    // O(delta) and should flatten while rebuild grows with the corpus.
    val scaleFactors = Seq(1, 4, 20)
    val scaling: Seq[(String, Seq[(String, Double)])] = {
      val dirs = scaleFactors.map { n =>
        val dir = tmp(s"bench_scale_x$n")
        val salted = amplify(Tables.documents(spark, sfDir), "doc_id", n)
          .withColumn("rep", (col("doc_id") % n).cast("string"))
          .withColumn("text", regexp_replace(col("text"), lit(" "),
            concat(lit("_"), col("rep"), lit(" "))))
          .drop("rep")
        salted.write.parquet(s"$dir/documents.parquet")
        amplify(Tables.embeddings(spark, sfDir), "vec_id", n)
          .write.parquet(s"$dir/embeddings.parquet")
        n -> dir
      }
      val queriesUnderTest = Seq("dedup_minhash_pairs", "search_bm25_indexed",
        "dedup_clusters_incremental", "sim_ivf_topk", "corpus_build")
      val perQuery = queriesUnderTest.map { qn =>
        val fn = SparkEntry.queries(qn)
        qn -> dirs.map { case (n, dir) =>
          // indexed search pays its one-time corpus build on the first
          // call per dir; time the serving read (what production repeats)
          if (qn == "search_bm25_indexed")
            try materialize(fn(spark, dir)) catch { case _: Throwable => () }
          s"x$n" -> timedIn(dir)(fn)
        }
      }
      val lshCurve = dirs.map { case (n, dir) =>
        val docs = spark.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), col("text"))
        val rb = timedOp(graft.operators.Dedup.writeLshIndex(
          docs, "doc_id", "text", tmp(s"bench_lsh_x${n}_rb")))
        val standPath = tmp(s"bench_lsh_x${n}_inc")
        graft.operators.Dedup.writeLshIndex(
          docs.filter(col("doc_id") % 100 =!= 0), "doc_id", "text", standPath)
        val ap = timedOp(graft.operators.Dedup.appendLshIndex(
          spark, docs.filter(col("doc_id") % 100 === 0), "doc_id", "text", standPath))
        (n, rb, ap)
      }
      perQuery ++ Seq(
        "lsh_rebuild" -> lshCurve.map { case (n, rb, _) => s"x$n" -> rb },
        "lsh_append_1pct" -> lshCurve.map { case (n, _, ap) => s"x$n" -> ap })
    }
    val scalingJson = scaling
      .map { case (k, m) => "\"" + k + "\":" + jmap(m) }.mkString("{", ",", "}")
    // Field order is deliberate: the driver's BENCH_r{N}.json keeps only
    // the LAST 2,000 chars of this line, so the cross-round signals
    // (steady tail, steady_total, incremental, scaling) print last and
    // survive the tail capture; the cold map prints first and is
    // recoverable from bench_full.json, which holds the identical line.
    val line = s"""{"metric":"total","value":${r3(coldTotal)},"unit":"sec","sf":"$sfDir","queries":$cold,"steady":$steady,"steady_total":${r3(steadyTotal)},"incremental":${jmap(incremental)},"scaling":$scalingJson}"""
    println(line)
    try java.nio.file.Files.write(java.nio.file.Paths.get("bench_full.json"),
      line.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case _: Throwable => () }
    spark.stop()
  }
}
