package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lexical retrieval over `documents` — the keyword half of a retrieval
  * stack whose vector half is [[Similarity]]. BM25 follows Robertson &
  * Zaragoza, "The Probabilistic Relevance Framework: BM25 and Beyond"
  * (FnTIR 2009); reciprocal-rank fusion follows Cormack, Clarke &
  * Büttcher, "Reciprocal Rank Fusion outperforms Condorcet and individual
  * Rank Learning Methods" (SIGIR 2009).
  *
  * Scale shapes:
  *  - BM25: the query set is small by construction → its term vocabulary
  *    BROADCASTS, and the corpus-side (doc, term) tf rows are semi-joined
  *    down to query-vocabulary postings BEFORE anything else happens — the
  *    fraction of a 100 TB corpus that flows past the first join is the
  *    fraction that mentions a query term. Corpus statistics (N, total
  *    token count) are one map-side-combinable aggregate broadcast as a
  *    1-row frame; per-term df is computed on the ALREADY-FILTERED
  *    postings (df of a term only needs rows containing that term).
  *    Final ranking is the same bounded CollectTopK aggregation as the
  *    ANN stack — no corpus-sized window sort.
  *  - RRF: fuses ALREADY-BOUNDED top-k lists (each |queries|·k rows), so
  *    the fusion itself is negligible at any corpus size.
  *
  * Determinism: a BM25 score is a sum of per-term contributions, and
  * float addition is order-dependent — a different partitioning would
  * produce different last-bit scores, and a second engine could not
  * hash-match. Each contribution is therefore one fixed-shape double
  * expression tree (every IEEE op correctly rounded, so any engine
  * replays it bitwise) QUANTIZED to floor(c·10⁶) integer micro-points;
  * the per-doc sum is an integer sum — order-independent and bit-stable
  * everywhere — and the final score divides back once. Same trick as
  * [[Similarity.kmeansRefine]]'s quantized centroid sums. IDF uses the
  * RSJ odds form (N − df + 0.5)/(df + 0.5) WITHOUT the ln wrapper: ln is
  * libm-dependent (not cross-engine replayable) and strictly monotone, so
  * dropping it reorders nothing for single-term matches and re-weights
  * rare terms more sharply for multi-term sums — documented, deliberate,
  * and bitwise-verifiable (the same trade [[TextAnalysis.tfidfTopK]]
  * makes). */
object Search {

  /** Fixed-point scale for the order-independent contribution sums. */
  val Quantum: Double = 1e6

  /** BM25 top-k: for each query row, the k highest-scoring documents
    * (self-matches excluded when a query IS a corpus doc, i.e. equal
    * ids). Output: (query_id, idCol, score, rank), rank 1..k by
    * (score desc, id asc).
    *
    * k1 / b are the classic defaults (1.2, 0.75). They enter the plan as
    * pre-folded decimal literals so an oracle can splice the exact same
    * constants into its expression tree. */
  def bm25TopK(docs: DataFrame, queries: DataFrame, idCol: String,
               textCol: String, queryIdCol: String, queryTextCol: String,
               k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // postings materialized ONCE (localCheckpoint): the per-doc-length agg
    // and the query-vocabulary semi-join are two consumers of the same
    // corpus tokenize+count — without the checkpoint each re-runs it.
    // Narrow (id, term, tf) rows, memory-and-disk: the spill-safe shape.
    val tf = termFrequencies(docs, idCol, textCol).localCheckpoint()
    val qterms = broadcast(queries
      .select(col(queryIdCol).as("query_id"),
        explode(split(trim(col(queryTextCol)), " ")).as("term"))
      .distinct())
    val (dl, stats) = docLengths(tf, idCol)
    Similarity.topKPerQuery(
      bm25ScoresFrom(queryPostings(tf, qterms), dl, stats, qterms, idCol, k1, b),
      idCol, "score", k)
  }

  /** Per-doc lengths + the broadcast 1-row corpus stats, computed from
    * postings in ONE aggregation and checkpointed — `dl` feeds the score
    * join AND the stats reduction (and in the PRF path both passes), so
    * an unpersisted version would re-aggregate the postings per consumer. */
  private def docLengths(tf: DataFrame, idCol: String): (DataFrame, DataFrame) = {
    val dl = tf.groupBy(col(idCol)).agg(sum(col("tf")).as("dl"))
      .localCheckpoint()
    (dl, broadcast(dl.agg(
      count(lit(1)).as("n_docs"), sum(col("dl")).as("total_tokens"))))
  }

  /** Corpus postings restricted to the query vocabulary FIRST — the only
    * corpus-sized input a scoring pass touches. */
  private def queryPostings(tf: DataFrame, qterms: DataFrame): DataFrame =
    tf.join(broadcast(qterms.select(col("term")).distinct()), "term")

  /** (id, term, tf) postings of the corpus — built once, shared by the
    * plain and PRF search paths. */
  private def termFrequencies(docs: DataFrame, idCol: String,
                              textCol: String): DataFrame =
    docs.select(col(idCol), explode(split(trim(col(textCol)), " ")).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))

  /** Quantized BM25 scores of every (query, doc) pair sharing ≥1 term —
    * the scoring core behind [[bm25TopK]] and [[bm25PrfTopK]]. `qterms`
    * is a (query_id, term) frame, small by construction (broadcast by
    * callers). */
  /** The scoring core against PREBUILT parts: query-vocabulary postings
    * `tfq` (idCol, term, tf — every row of every query term, nothing
    * else), per-doc lengths `dl` and the 1-row corpus `stats` — shared by
    * the derive-in-run path ([[bm25Scores]]) and the materialized-index
    * path ([[bm25IndexTopK]]), so their score expressions cannot drift.
    * df is counted on `tfq` itself: a term's df only needs rows
    * containing that term, which `tfq` holds in full — exact either way. */
  private def bm25ScoresFrom(tfq: DataFrame, dl: DataFrame, stats: DataFrame,
                             qterms: DataFrame, idCol: String,
                             k1: Double, b: Double): DataFrame = {
    val dfreq = tfq.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tfq.select(col(idCol), col("term"), col("tf"))
      .join(dfreq, "term")
      .join(qterms, "term")
      .filter(col(idCol) =!= col("query_id"))
      .join(dl, idCol)
      .crossJoin(stats)
      .withColumn("avgdl",
        col("total_tokens").cast("double") / col("n_docs").cast("double"))
      .withColumn("c",
        ((col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5))) *
          ((col("tf").cast("double") * lit(k1 + 1.0)) /
            (col("tf").cast("double") +
              lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl").cast("double") / col("avgdl"))))))
      .withColumn("qc", floor(col("c") * lit(Quantum)).cast("long"))
      .groupBy(col("query_id"), col(idCol))
      .agg(sum(col("qc")).as("qsum"))
      .select(col("query_id"), col(idCol),
        (col("qsum").cast("double") / lit(Quantum)).as("score"))
  }

  /** BM25 with pseudo-relevance feedback (RM3-lite, Lavrenko & Croft's
    * relevance-model idea reduced to its deterministic core): a first
    * BM25 pass takes each query's top `fbDocs` documents, the `fbTerms`
    * most frequent NEW terms of that feedback set (total tf desc, term
    * asc — exact integer ordering, no interpolation weights to drift)
    * join the query vocabulary, and a second BM25 pass ranks against the
    * expanded term set. Recall instrument: documents sharing no literal
    * query term but co-occurring with the feedback vocabulary become
    * reachable.
    *
    * Scale shape: both passes are [[bm25Scores]] (query vocab broadcast,
    * postings filtered first); the feedback-term selection works on
    * |queries|·fbDocs posting rows — a bounded CollectTopK per query,
    * never a corpus aggregation. */
  def bm25PrfTopK(docs: DataFrame, queries: DataFrame, idCol: String,
                  textCol: String, queryIdCol: String, queryTextCol: String,
                  k: Int, fbDocs: Int = 3, fbTerms: Int = 3,
                  k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // the shared postings feed BOTH scoring passes plus the feedback-term
    // join — at least three corpus tokenize+aggregate jobs if left as an
    // unpersisted sub-plan. One checkpoint, one corpus pass, ever; dl and
    // stats likewise computed once and shared by both passes.
    val tf = termFrequencies(docs, idCol, textCol).localCheckpoint()
    val (dl, stats) = docLengths(tf, idCol)
    def pass(q: DataFrame): DataFrame =
      bm25ScoresFrom(queryPostings(tf, q), dl, stats, q, idCol, k1, b)
    val qterms0 = broadcast(queries
      .select(col(queryIdCol).as("query_id"),
        explode(split(trim(col(queryTextCol)), " ")).as("term"))
      .distinct())
    val fb = Similarity.topKPerQuery(pass(qterms0), idCol, "score", fbDocs)
    // candidate expansion terms: total tf across the feedback docs, minus
    // terms the query already has; top fbTerms by (tf desc, term asc)
    val fbTf = fb.select(col("query_id"), col(idCol))
      .join(tf, idCol)
      .join(qterms0.select(col("query_id"), col("term").as("term"),
        lit(true).as("in_q")), Seq("query_id", "term"), "left")
      .filter(col("in_q").isNull)
      .groupBy(col("query_id"), col("term"))
      .agg(sum(col("tf")).as("fbtf"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("fbtf").desc, col("term").asc)
    // |queries|·fbTerms rows — checkpointing this pins pass-1 to exactly
    // ONE evaluation: without it the expanded-vocabulary frame (whose
    // lineage embeds the whole first pass) is re-evaluated at every place
    // pass-2 consumes it (postings semi-join + contributions join)
    val expansion = fbTf.withColumn("r", row_number().over(w))
      .filter(col("r") <= fbTerms)
      .select(col("query_id"), col("term"))
      .localCheckpoint()
    val qterms1 = broadcast(
      qterms0.select(col("query_id"), col("term")).union(expansion).distinct())
    Similarity.topKPerQuery(pass(qterms1), idCol, "score", k)
  }

  /** Reciprocal-rank fusion of ranked lists into one hybrid top-k.
    * Each input is a (query_id, idCol, rank) frame (extra columns
    * ignored); a document's fused score is Σ 1/(c + rank) over the lists
    * that ranked it. Contributions are summed in LIST ORDER via chained
    * coalesced additions (a fixed expression tree, not a float agg), so
    * the fused score is bit-replayable. Output: (query_id, idCol,
    * rrf_score, rank), rank 1..k by (rrf_score desc, id asc). */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, k: Int,
              c: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    val sides = rankings.zipWithIndex.map { case (r, i) =>
      r.select(col("query_id"), col(idCol), col("rank").as(s"rank_$i"))
    }
    val joined = sides.reduce(_.join(_, Seq("query_id", idCol), "full_outer"))
    val fused = joined.select(col("query_id"), col(idCol),
      rankings.indices
        .map(i => coalesce(
          lit(1.0) / (lit(c.toDouble) + col(s"rank_$i").cast("double")),
          lit(0.0)))
        .reduce(_ + _).as("rrf_score"))
    Similarity.topKPerQuery(fused, idCol, "rrf_score", k)
  }

  // ---- materialized inverted index -----------------------------------------

  /** Materialize the BM25 serving state ONCE: postings written TERM-
    * BUCKETED (bucket = pmod(xxhash64(term), nBuckets) — a partition
    * column, so a query's vocabulary resolves to a handful of bucket
    * directory reads and every other posting byte is never listed,
    * opened, or scanned), per-doc lengths, and the 1-row corpus stats
    * (which also records nBuckets, so readers can never hash into a
    * mismatched layout). This is the store-don't-rederive shape a serving
    * path needs at 100 TB — the analog of [[Similarity.writeIvfIndex]]
    * for the lexical arm: [[bm25TopK]] re-derives postings from raw text
    * per run; [[bm25IndexTopK]] reads them back and re-derives nothing. */
  def writeBm25Index(docs: DataFrame, idCol: String, textCol: String,
                     path: String, nBuckets: Int = 64): Unit = {
    require(nBuckets > 0, s"nBuckets must be positive: $nBuckets")
    import graft.sources.PartitionedStore
    // one corpus pass feeds postings, dl and stats alike
    val tf = termFrequencies(docs, idCol, textCol).localCheckpoint()
    val dl = tf.groupBy(col(idCol)).agg(sum(col("tf")).as("dl"))
      .localCheckpoint()
    val dv = PartitionedStore.commitVersion(dl, s"$path/dl")
    val sv = PartitionedStore.commitVersion(
      dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_tokens"))
        .withColumn("n_buckets", lit(nBuckets)), s"$path/stats")
    val pv = PartitionedStore.commitVersion(
      tf.withColumn("bucket", pmod(xxhash64(col("term")), lit(nBuckets.toLong)))
        .repartition(col("bucket"))
        .sortWithinPartitions(col("term"), col(idCol)),
      s"$path/postings", partitionCols = Seq("bucket"))
    PartitionedStore.publishComposite(path,
      Map("postings" -> pv, "dl" -> dv, "stats" -> sv))
  }

  /** Incremental maintenance of a [[writeBm25Index]] layout — the
    * nightly-delivery form (the lexical twin of
    * [[Similarity.appendIvfIndex]]): the delta's postings hash into the
    * EXISTING bucket layout and append into those directories only, its
    * doc lengths append, and the 1-row stats update by exact integer
    * arithmetic from the old stats + the delta's own aggregate — cost
    * tracks the DELTA; the standing corpus is never re-read. Correctness
    * falls out of the layout: per-term df is counted on the pruned
    * postings at query time (old + appended rows together), so a query
    * after an append is bit-identical to one against a full rebuild
    * (the spec's claim). Small appended files are a compaction rewrite
    * commit's job (commitVersion dropDirs), not this one's.
    *
    * Crash contract — ATOMIC via the composite pointer: component
    * commits (dl, postings, stats) land first as new UNREFERENCED
    * versions of their stores — each append pinned to the parent the
    * SERVED composite references, never the raw latest, so a retry
    * after a crash cannot stack on an orphan — and the index flips to
    * the new generation only at [[graft.sources.PartitionedStore
    * .publishComposite]]. A crash anywhere before that leaves readers
    * on the old generation with consistent idf/avgdl; racing appenders
    * error at a component commit or the publish (loser-errors), never
    * corrupt. Re-delivered doc ids are dropped by an anti-join against
    * the served dl (idempotent delivery — without it a duplicate id
    * would double-count n_docs and fan out the score join). */
  def appendBm25Index(spark: org.apache.spark.sql.SparkSession,
                      delta: DataFrame, idCol: String, textCol: String,
                      path: String): Unit = {
    import graft.sources.PartitionedStore
    val served = PartitionedStore.readComposite(path)
    val statsRow = PartitionedStore
      .readVersion(spark, s"$path/stats", Some(served("stats")))
      .select(col("n_docs"), col("total_tokens"), col("n_buckets")).collect()(0)
    val nBuckets = statsRow.getInt(2)
    // a tombstoned id arriving in a delta is NOT a re-delivery — it is a
    // resurrection of deleted content, and a takedown pipeline must fail
    // loudly on it, never silently re-serve. Legitimate re-use of the id
    // becomes possible after compaction physically reclaims it.
    served.get("tombstones").foreach { tv =>
      val tomb = PartitionedStore.readVersion(
        spark, s"$path/tombstones", Some(tv))
      val clash = delta.join(broadcast(tomb), Seq(idCol), "left_semi")
        .select(col(idCol)).limit(3).collect()
      if (clash.nonEmpty) throw new IllegalStateException(
        s"append would resurrect tombstoned ids (e.g. ${clash.mkString(", ")})" +
          s" at $path; compact the index to reclaim them first")
    }
    val existing = PartitionedStore
      .readVersion(spark, s"$path/dl", Some(served("dl"))).select(col(idCol))
    val fresh = delta.join(existing, Seq(idCol), "left_anti")
    val tf = termFrequencies(fresh, idCol, textCol).localCheckpoint()
    val dl = tf.groupBy(col(idCol)).agg(sum(col("tf")).as("dl"))
      .localCheckpoint()
    // release on EVERY exit (success, no-op return, commit failure): a
    // nightly append loop that leaks two checkpoints per run pins
    // executor storage until the session dies
    try {
      if (dl.isEmpty) return // fully re-delivered delta: the append is a no-op
      val dv = PartitionedStore.commitVersion(dl, s"$path/dl",
        append = true, parent = Some(served("dl")))
      val pv = PartitionedStore.commitVersion(
        tf.withColumn("bucket", pmod(xxhash64(col("term")), lit(nBuckets.toLong)))
          .repartition(col("bucket"))
          .sortWithinPartitions(col("term"), col(idCol)),
        s"$path/postings", append = true, parent = Some(served("postings")),
        partitionCols = Seq("bucket"))
      val d = dl.agg(count(lit(1)).as("dn"), sum(col("dl")).as("dt")).collect()(0)
      val (dn, dt) = (d.getLong(0), if (d.isNullAt(1)) 0L else d.getLong(1))
      val sv = PartitionedStore.commitVersion(
        spark.range(1).select(
          lit(statsRow.getLong(0) + dn).as("n_docs"),
          lit(statsRow.getLong(1) + dt).as("total_tokens"),
          lit(nBuckets).as("n_buckets")),
        s"$path/stats")
      PartitionedStore.publishComposite(path,
        Map("postings" -> pv, "dl" -> dv, "stats" -> sv))
    } finally {
      Checkpoints.release(tf); Checkpoints.release(dl)
    }
  }

  /** Tombstone DELETE from a [[writeBm25Index]] layout — the takedown /
    * right-to-be-forgotten verb that completes the stored-index CRUD
    * story (write / append / delete / compact). Cost tracks the DELETE
    * SET, not the corpus: the doc ids append into a `tombstones`
    * component, corpus stats shrink by exact integer arithmetic from the
    * deleted docs' own `dl` rows (one narrow per-doc-metadata read —
    * postings are never touched), and the composite republishes
    * atomically. Serving reads ([[bm25IndexTopK]]) anti-join the
    * tombstone set (small, broadcast) out of the pruned postings BEFORE
    * df is counted, so a query after a delete is bit-identical to one
    * against an index rebuilt without the deleted docs — the oracle's
    * claim (`search_bm25_deleted`). Physical rows survive, invisible,
    * until [[compactBm25Index]] reclaims them (the Delta/Iceberg
    * deletion-vector model); until then a tombstoned id cannot be
    * re-appended ([[appendBm25Index]] raises — silently resurrecting
    * deleted content is the one failure a takedown pipeline must not
    * have). Never-indexed and already-deleted ids no-op without
    * publishing a generation. */
  def deleteFromBm25Index(spark: org.apache.spark.sql.SparkSession,
                          ids: DataFrame, path: String): Unit = {
    import graft.sources.PartitionedStore
    val served = PartitionedStore.readComposite(path)
    val statsRow = PartitionedStore
      .readVersion(spark, s"$path/stats", Some(served("stats")))
      .select(col("n_docs"), col("total_tokens"), col("n_buckets")).collect()(0)
    val dl = PartitionedStore.readVersion(spark, s"$path/dl", Some(served("dl")))
    val idCol = dl.columns.filterNot(_ == "dl") match {
      case Array(only) => only
      case other => throw new IllegalArgumentException(
        s"ambiguous dl id column among ${other.mkString(", ")}")
    }
    val prior = served.get("tombstones").map(tv =>
      PartitionedStore.readVersion(spark, s"$path/tombstones", Some(tv)))
    val requested = ids.select(col(ids.columns.head).as(idCol)).distinct()
    val fresh = prior.fold(requested)(p =>
      requested.join(broadcast(p), Seq(idCol), "left_anti"))
    // checkpointed: consumed by the no-op gate, the stats aggregate and
    // the tombstone commit — one evaluation of the dl semi-join
    val gone = dl.join(broadcast(fresh), Seq(idCol), "left_semi")
      .localCheckpoint()
    try {
      if (gone.isEmpty) return // nothing indexed-and-undeleted: no-op
      val d = gone.agg(count(lit(1)).as("dn"), sum(col("dl")).as("dt"))
        .collect()(0)
      val tv = PartitionedStore.commitVersion(gone.select(col(idCol)),
        s"$path/tombstones", append = served.contains("tombstones"),
        parent = served.get("tombstones"))
      val sv = PartitionedStore.commitVersion(
        spark.range(1).select(
          lit(statsRow.getLong(0) - d.getLong(0)).as("n_docs"),
          lit(statsRow.getLong(1) - d.getLong(1)).as("total_tokens"),
          lit(statsRow.getInt(2)).as("n_buckets")),
        s"$path/stats")
      PartitionedStore.publishComposite(path,
        served ++ Map("tombstones" -> tv, "stats" -> sv))
    } finally Checkpoints.release(gone)
  }

  /** Compact a [[writeBm25Index]] layout after a run of nightly appends:
    * every append adds a small data dir to postings and dl, and read cost
    * creeps with file count — this collapses each back to one clustered
    * rewrite (postings re-bucketed + term-sorted, dl coalesced) and
    * republishes the composite. Query results are bit-identical by
    * construction (a rewrite commit of the same rows); the PREVIOUS
    * generation still time-travels to the uncompacted dirs until
    * vacuumed. Compacts the SERVED generation's components — never
    * raw-latest, which could resurrect a crashed append's orphan. */
  def compactBm25Index(spark: org.apache.spark.sql.SparkSession,
                       path: String): Unit = {
    import graft.sources.PartitionedStore
    val served = PartitionedStore.readComposite(path)
    // the id column is whatever the writer used: the postings column that
    // is none of the fixed ones (same by-name resolution as rollupMerge)
    val idCol = PartitionedStore
      .readVersion(spark, s"$path/postings", Some(served("postings")))
      .columns.filterNot(Set("term", "tf", "bucket")) match {
      case Array(only) => only
      case other => throw new IllegalArgumentException(
        s"ambiguous postings id column among ${other.mkString(", ")}")
    }
    // tombstone reclaim rides the rewrite for free: deleted rows are
    // anti-joined out of both components and the tombstone set leaves
    // the composite — serving results are unchanged (reads were already
    // filtering those rows), the bytes and the re-add embargo are gone
    val minus = served.get("tombstones").map { tv =>
      (PartitionedStore.readVersion(spark, s"$path/tombstones", Some(tv)),
        Seq(idCol))
    }
    val pv = PartitionedStore.compactVersion(spark, s"$path/postings",
      partitionCols = Seq("bucket"), sortCols = Seq("term", idCol),
      version = Some(served("postings")), minus = minus)
    val dv = PartitionedStore.compactVersion(spark, s"$path/dl",
      version = Some(served("dl")), minus = minus)
    PartitionedStore.publishComposite(path,
      served - "tombstones" ++ Map("postings" -> pv, "dl" -> dv))
  }

  /** BM25 top-k against a [[writeBm25Index]] layout — identical results
    * to [[bm25TopK]] (same [[bm25ScoresFrom]] expression tree, bit for
    * bit), different I/O shape: the query vocabulary's term buckets are
    * resolved driver-side (|query vocab| hashes — the same justified
    * planning-time collect as [[Similarity.ivfIndexTopK]]'s probe cells)
    * and pushed into the postings read as a static partition filter. */
  /** [[bm25IndexTopK]] with a METADATA filter — the per-tenant /
    * per-source read ONE index serves for every filter, instead of an
    * index per tenant: `allowedDocs` (an idCol frame, derived from a
    * column-pruned metadata scan or a stored metadata component) semi-
    * joins the bucket-pruned postings and the dl table, and the corpus
    * statistics RECOMPUTE over the filtered dl — dl-sized work, never a
    * corpus re-tokenization. Because [[bm25ScoresFrom]] counts df on
    * the postings it is given, every statistic (n_docs, avgdl, each df)
    * sees exactly the filtered corpus — bit-identical to
    * [[bm25TopK]] over pre-filtered docs (the graded oracle states
    * precisely that), which score-then-filter would NOT be (wrong idf).
    * Tombstones still apply first: a deleted doc is gone from every
    * tenant's view. */
  def bm25IndexTopKFiltered(spark: org.apache.spark.sql.SparkSession,
                            path: String, queries: DataFrame,
                            allowedDocs: DataFrame, idCol: String,
                            queryIdCol: String, queryTextCol: String,
                            k: Int, k1: Double = 1.2,
                            b: Double = 0.75): DataFrame =
    bm25IndexServe(spark, path, queries, idCol, queryIdCol, queryTextCol,
      k, k1, b, Some(allowedDocs))

  def bm25IndexTopK(spark: org.apache.spark.sql.SparkSession, path: String,
                    queries: DataFrame, idCol: String, queryIdCol: String,
                    queryTextCol: String, k: Int,
                    k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25IndexServe(spark, path, queries, idCol, queryIdCol, queryTextCol,
      k, k1, b, None)

  /** Boolean-AND retrieval through the stored index: every doc
    * containing ALL of a query's (distinct) terms — the filter verb of
    * an inverted index beside the ranked BM25 verbs, and the exact
    * candidate generator a phrase/proximity stage would consume.
    *
    * Serving shape is identical to [[bm25IndexTopK]]'s: one composite
    * resolution pins all components to a generation, the postings read
    * prunes to the query vocabulary's bucket dirs, tombstoned docs
    * leave before counting. The AND itself is one groupBy on the
    * pruned postings — count of DISTINCT matched terms per (query,
    * doc) equals the query's term count — so cost is postings-rows ∝
    * query vocabulary, never corpus size. Output: (query_id, doc_id),
    * one row per qualifying doc. */
  def bm25IndexBooleanAnd(spark: org.apache.spark.sql.SparkSession,
                          path: String, queries: DataFrame, idCol: String,
                          queryIdCol: String,
                          queryTextCol: String): DataFrame = {
    import graft.sources.PartitionedStore
    val served = PartitionedStore.readComposite(path)
    val stats = PartitionedStore.readVersion(spark, s"$path/stats",
      Some(served("stats")))
    val nBuckets = stats.select(col("n_buckets")).collect()(0).getInt(0)
    val qterms = broadcast(queries
      .select(col(queryIdCol).as("query_id"),
        explode(split(trim(col(queryTextCol)), " ")).as("term"))
      .distinct())
    val nTerms = broadcast(qterms.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_terms")))
    val qbuckets = qterms
      .select(pmod(xxhash64(col("term")), lit(nBuckets.toLong)).as("b"))
      .distinct().collect().map(_.getLong(0)).toSeq
    val tfq0 = PartitionedStore.readVersion(spark, s"$path/postings",
        Some(served("postings")))
      .filter(col("bucket").isin(qbuckets: _*))
      .join(qterms, "term")
    val tfq = served.get("tombstones").fold(tfq0) { tv =>
      tfq0.join(broadcast(PartitionedStore.readVersion(
        spark, s"$path/tombstones", Some(tv))), Seq(idCol), "left_anti")
    }
    // postings hold one row per (term, doc) already — plain count IS the
    // distinct matched-term count
    tfq.groupBy(col("query_id"), col(idCol))
      .agg(count(lit(1)).as("n_hit"))
      .join(nTerms, "query_id")
      .filter(col("n_hit") === col("n_terms"))
      .select(col("query_id"), col(idCol))
  }

  // ---- positional phrase index ---------------------------------------------

  /** Materialize a POSITIONAL inverted index: one `(id, pos, term)` row
    * per token occurrence, term-bucketed like [[writeBm25Index]]'s
    * postings (bucket = pmod(xxhash64(term), nBuckets), a partition
    * column), plus a narrow `meta` component carrying `metaCols` (what a
    * phrase hit returns without ever touching raw text) and the 1-row
    * layout stats. Positions make the index answer what the BM25
    * layout's (term, tf) rows cannot: WHERE a term sits, hence
    * phrase/proximity queries by position arithmetic instead of a text
    * re-scan. Positions are offsets in the trim+single-space-split token
    * sequence — the same tokenization every lexical operator here uses,
    * which is what makes phrase adjacency ⇔ space-delimited substring
    * containment (the graded oracle's independent formulation). ~1 row
    * per corpus TOKEN: the positional layout is the storage price of the
    * phrase verb; bucketing keeps every query's read pruned to its
    * vocabulary's directories. */
  def writePhraseIndex(docs: DataFrame, idCol: String, textCol: String,
                       metaCols: Seq[String], path: String,
                       nBuckets: Int = 64): Unit = {
    require(nBuckets > 0, s"nBuckets must be positive: $nBuckets")
    import graft.sources.PartitionedStore
    val postings = docs
      .select(col(idCol), posexplode(split(trim(col(textCol)), " ")))
      .withColumnRenamed("col", "term")
    val mv = PartitionedStore.commitVersion(
      docs.select((col(idCol) +: metaCols.map(col)): _*), s"$path/meta")
    val sv = PartitionedStore.commitVersion(
      docs.sparkSession.range(1).select(lit(nBuckets).as("n_buckets")),
      s"$path/stats")
    val pv = PartitionedStore.commitVersion(
      postings
        .withColumn("bucket", pmod(xxhash64(col("term")), lit(nBuckets.toLong)))
        .repartition(col("bucket"))
        .sortWithinPartitions(col("term"), col(idCol), col("pos")),
      s"$path/postings", partitionCols = Seq("bucket"))
    PartitionedStore.publishComposite(path,
      Map("postings" -> pv, "meta" -> mv, "stats" -> sv))
  }

  /** Incremental maintenance of a [[writePhraseIndex]] layout — the
    * nightly-delivery form, mirroring [[appendBm25Index]]: the delta's
    * positional postings hash into the EXISTING bucket layout and append
    * into those directories only, its meta rows append, and the
    * composite republishes atomically — cost tracks the DELTA, the
    * standing corpus is never re-read. There are no corpus-level
    * statistics to adjust (phrase matching is exact, not scored), so
    * append-equals-rebuild needs no arithmetic at all: it falls out of
    * the layout. Re-delivered ids drop via an anti-join against the
    * served meta (idempotent delivery); a tombstoned id RAISES — an
    * append resurrecting taken-down content must fail loudly. */
  def appendPhraseIndex(spark: org.apache.spark.sql.SparkSession,
                        delta: DataFrame, idCol: String, textCol: String,
                        metaCols: Seq[String], path: String): Unit = {
    import graft.sources.PartitionedStore
    val served = PartitionedStore.readComposite(path)
    val nBuckets = PartitionedStore
      .readVersion(spark, s"$path/stats", Some(served("stats")))
      .select(col("n_buckets")).collect()(0).getInt(0)
    served.get("tombstones").foreach { tv =>
      val tomb = PartitionedStore.readVersion(
        spark, s"$path/tombstones", Some(tv))
      val clash = delta.join(broadcast(tomb), Seq(idCol), "left_semi")
        .select(col(idCol)).limit(3).collect()
      if (clash.nonEmpty) throw new IllegalStateException(
        s"append would resurrect tombstoned ids (e.g. ${clash.mkString(", ")})" +
          s" at $path; compact the index to reclaim them first")
    }
    val existing = PartitionedStore
      .readVersion(spark, s"$path/meta", Some(served("meta")))
      .select(col(idCol))
    val fresh = delta.join(existing, Seq(idCol), "left_anti")
      .localCheckpoint() // read twice: meta append + postings explode
    try {
      if (fresh.isEmpty) return // fully re-delivered delta: no-op
      val mv = PartitionedStore.commitVersion(
        fresh.select((col(idCol) +: metaCols.map(col)): _*), s"$path/meta",
        append = true, parent = Some(served("meta")))
      val pv = PartitionedStore.commitVersion(
        fresh.select(col(idCol), posexplode(split(trim(col(textCol)), " ")))
          .withColumnRenamed("col", "term")
          .withColumn("bucket",
            pmod(xxhash64(col("term")), lit(nBuckets.toLong)))
          .repartition(col("bucket"))
          .sortWithinPartitions(col("term"), col(idCol), col("pos")),
        s"$path/postings", append = true, parent = Some(served("postings")),
        partitionCols = Seq("bucket"))
      PartitionedStore.publishComposite(path,
        served ++ Map("postings" -> pv, "meta" -> mv))
    } finally Checkpoints.release(fresh)
  }

  /** Tombstone DELETE from a [[writePhraseIndex]] layout — the takedown
    * verb in the same deletion-vector model as the other three stored
    * index families: cost is O(delete set) (ids append into a
    * `tombstones` component, atomic republish; the positional postings
    * are never touched), [[phraseIndexMatch]] anti-joins the set before
    * returning hits, so a post-delete phrase query is bit-identical to
    * one against an index rebuilt without the deleted docs. No stats
    * shrink — the phrase verb carries none. Physical rows survive,
    * invisible, until [[compactPhraseIndex]] reclaims them; meanwhile
    * [[appendPhraseIndex]] refuses the ids. Never-indexed or already-
    * deleted ids no-op without publishing. */
  def deleteFromPhraseIndex(spark: org.apache.spark.sql.SparkSession,
                            ids: DataFrame, path: String): Unit = {
    import graft.sources.PartitionedStore
    val served = PartitionedStore.readComposite(path)
    val meta = PartitionedStore.readVersion(spark, s"$path/meta",
      Some(served("meta")))
    val idCol = meta.columns.head // writer contract: id leads the meta row
    val prior = served.get("tombstones").map(tv =>
      PartitionedStore.readVersion(spark, s"$path/tombstones", Some(tv)))
    val requested = ids.select(col(ids.columns.head).as(idCol)).distinct()
    val fresh = prior.fold(requested)(p =>
      requested.join(broadcast(p), Seq(idCol), "left_anti"))
    val gone = meta.select(col(idCol))
      .join(broadcast(fresh), Seq(idCol), "left_semi")
      .localCheckpoint()
    try {
      if (gone.isEmpty) return // nothing indexed-and-undeleted: no-op
      val tv = PartitionedStore.commitVersion(gone,
        s"$path/tombstones", append = served.contains("tombstones"),
        parent = served.get("tombstones"))
      PartitionedStore.publishComposite(path, served + ("tombstones" -> tv))
    } finally Checkpoints.release(gone)
  }

  /** Compact a [[writePhraseIndex]] layout after appends/deletes:
    * postings collapse back to one clustered rewrite per bucket dir,
    * meta coalesces, tombstoned rows are physically reclaimed from both
    * components and the tombstone set leaves the composite (answers
    * unchanged — serving already filtered them; the bytes and the
    * re-append embargo are gone). Compacts the SERVED generation, never
    * raw-latest. */
  def compactPhraseIndex(spark: org.apache.spark.sql.SparkSession,
                         path: String): Unit = {
    import graft.sources.PartitionedStore
    val served = PartitionedStore.readComposite(path)
    val idCol = PartitionedStore
      .readVersion(spark, s"$path/meta", Some(served("meta"))).columns.head
    val minus = served.get("tombstones").map { tv =>
      (PartitionedStore.readVersion(spark, s"$path/tombstones", Some(tv)),
        Seq(idCol))
    }
    val pv = PartitionedStore.compactVersion(spark, s"$path/postings",
      partitionCols = Seq("bucket"), sortCols = Seq("term", idCol),
      version = Some(served("postings")), minus = minus)
    val mv = PartitionedStore.compactVersion(spark, s"$path/meta",
      version = Some(served("meta")), minus = minus)
    PartitionedStore.publishComposite(path,
      served - "tombstones" ++ Map("postings" -> pv, "meta" -> mv))
  }

  /** Exact phrase matching through a [[writePhraseIndex]] layout — the
    * anchor-join formulation: query token i at document position p
    * witnesses a phrase start at anchor p−i, so a document matches iff
    * some (id, anchor) collects ALL m query offsets. The postings read
    * prunes to the phrase vocabulary's bucket dirs (the phrase's terms
    * hash driver-side — the same justified planning-time collect as
    * [[bm25IndexTopK]]'s bucket resolution); the anchor aggregation runs
    * over pruned postings rows only (∝ corpus frequency of the phrase's
    * terms, never corpus size), and a plain count IS the distinct-offset
    * count because (id, offset, anchor) determines pos — one row each.
    * A repeated word in the phrase works for the same reason: each of
    * its offsets joins every occurrence row separately. Raw text is
    * never read — the hit list joins the stored `meta` component for its
    * output columns. Output: meta rows of matching docs. */
  def phraseIndexMatch(spark: org.apache.spark.sql.SparkSession,
                       path: String, phrase: String,
                       idCol: String): DataFrame = {
    import graft.sources.PartitionedStore
    val terms = phrase.trim.split(" ").toSeq
    require(terms.nonEmpty && terms.forall(_.nonEmpty),
      s"phrase must be non-empty single-spaced tokens: '$phrase'")
    val served = PartitionedStore.readComposite(path)
    val nBuckets = PartitionedStore
      .readVersion(spark, s"$path/stats", Some(served("stats")))
      .select(col("n_buckets")).collect()(0).getInt(0)
    import spark.implicits._
    val qdf = terms.zipWithIndex.toDF("term", "offset")
    val qbuckets = qdf
      .select(pmod(xxhash64(col("term")), lit(nBuckets.toLong)).as("b"))
      .distinct().collect().map(_.getLong(0)).toSeq
    val hits0 = PartitionedStore.readVersion(spark, s"$path/postings",
        Some(served("postings")))
      .filter(col("bucket").isin(qbuckets: _*))
      .join(broadcast(qdf), "term")
      .select(col(idCol), (col("pos") - col("offset")).as("anchor"))
      .groupBy(col(idCol), col("anchor"))
      .agg(count(lit(1)).as("n_hit"))
      .filter(col("n_hit") === terms.length)
      .select(col(idCol)).distinct()
    // tombstoned docs leave before meta resolution — a post-delete query
    // is bit-identical to one against an index rebuilt without them
    val hits = served.get("tombstones").fold(hits0) { tv =>
      hits0.join(broadcast(PartitionedStore.readVersion(
        spark, s"$path/tombstones", Some(tv))), Seq(idCol), "left_anti")
    }
    PartitionedStore.readVersion(spark, s"$path/meta", Some(served("meta")))
      .join(hits, Seq(idCol), "left_semi")
  }

  /** Unordered proximity (NEAR/k) through the SAME [[writePhraseIndex]]
    * layout phrase search serves from — the second verb the positional
    * storage price buys: a document matches iff some occurrence of
    * `termA` and some occurrence of `termB` sit within `k` token
    * positions of each other (either order). The postings read prunes
    * to the TWO terms' bucket dirs (driver-side hash, the same
    * justified planning-time collect as [[phraseIndexMatch]]); the
    * position check is then an equi-join on the doc id between the two
    * terms' pruned occurrence sets with an |posA − posB| ≤ k filter —
    * per-doc cost ∝ occA·occB, both bounded by the doc's token count,
    * and total cost ∝ the terms' corpus frequency, never corpus size.
    * Tombstoned docs leave before meta resolution, so a post-delete
    * proximity query is bit-identical to one against an index rebuilt
    * without them. Output: meta rows of matching docs. `termA ≠ termB`
    * is required — self-proximity would need distinct-position
    * semantics this verb deliberately doesn't carry. */
  def proximityMatch(spark: org.apache.spark.sql.SparkSession,
                     path: String, termA: String, termB: String, k: Int,
                     idCol: String): DataFrame = {
    require(termA.nonEmpty && termB.nonEmpty && termA != termB,
      s"proximity needs two distinct non-empty terms: '$termA', '$termB'")
    require(k >= 1, s"proximity window must be >= 1 token: $k")
    import graft.sources.PartitionedStore
    val served = PartitionedStore.readComposite(path)
    val nBuckets = PartitionedStore
      .readVersion(spark, s"$path/stats", Some(served("stats")))
      .select(col("n_buckets")).collect()(0).getInt(0)
    import spark.implicits._
    val qbuckets = Seq(termA, termB).toDF("term")
      .select(pmod(xxhash64(col("term")), lit(nBuckets.toLong)).as("b"))
      .distinct().collect().map(_.getLong(0)).toSeq
    val occ = PartitionedStore.readVersion(spark, s"$path/postings",
        Some(served("postings")))
      .filter(col("bucket").isin(qbuckets: _*))
      .filter(col("term").isin(termA, termB))
      .select(col(idCol), col("term"), col("pos"))
    val hits0 = occ.filter(col("term") === termA)
      .select(col(idCol), col("pos").as("pa"))
      .join(occ.filter(col("term") === termB)
        .select(col(idCol), col("pos").as("pb")), Seq(idCol))
      .filter(abs(col("pa") - col("pb")) <= k)
      .select(col(idCol)).distinct()
    val hits = served.get("tombstones").fold(hits0) { tv =>
      hits0.join(broadcast(PartitionedStore.readVersion(
        spark, s"$path/tombstones", Some(tv))), Seq(idCol), "left_anti")
    }
    PartitionedStore.readVersion(spark, s"$path/meta", Some(served("meta")))
      .join(hits, Seq(idCol), "left_semi")
  }

  // ---- symmetric-delete (SymSpell) fuzzy vocabulary index ------------------

  /** Materialize a SYMMETRIC-DELETE vocabulary index (Garbe's SymSpell
    * shape): for every distinct corpus term, one row per VARIANT — the
    * term itself plus each single-character deletion — carrying the
    * term and its document frequency, bucketed by pmod(xxhash64(variant),
    * nBuckets) as a partition column. Edit-distance-1 lookup then never
    * scans the vocabulary: q matches t within distance 1 iff their
    * variant sets intersect (identity covers t=q; q's deletion covers an
    * insertion typo; t's deletion covers a deletion typo; same-position
    * deletions coincide exactly for a substitution), so a query reads
    * only the bucket dirs its ≤ len+1 variants hash into — the candidate
    * superset is verified by exact levenshtein afterwards, so a variant
    * coincidence costs a check, never a wrong row. ~V·(L+1) rows for a
    * V-term, length-L vocabulary — far smaller than the postings the
    * corpus already stores. Build is one distinct + one position
    * explode; deletion strings are plain substring arithmetic (codegen),
    * not HOF lambdas. */
  def writeSymDelIndex(docs: DataFrame, idCol: String, textCol: String,
                       path: String, nBuckets: Int = 64): Unit = {
    require(nBuckets > 0, s"nBuckets must be positive: $nBuckets")
    import graft.sources.PartitionedStore
    val vocab = docs
      .select(col(idCol), explode(split(trim(col(textCol)), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("term")).agg(countDistinct(col(idCol)).as("df"))
      .localCheckpoint() // read twice: identity rows + deletion explode
    try {
      val identity = vocab.select(col("term").as("variant"), col("term"),
        col("df"))
      val deletions = vocab
        .select(col("term"), col("df"),
          explode(sequence(lit(1), length(col("term")))).as("i"))
        .select(
          expr("concat(substring(term, 1, i - 1), substring(term, i + 1, length(term)))")
            .as("variant"),
          col("term"), col("df"))
      val sv = PartitionedStore.commitVersion(
        docs.sparkSession.range(1).select(lit(nBuckets).as("n_buckets")),
        s"$path/stats")
      val vv = PartitionedStore.commitVersion(
        identity.unionByName(deletions)
          .withColumn("bucket",
            pmod(xxhash64(col("variant")), lit(nBuckets.toLong)))
          .repartition(col("bucket"))
          .sortWithinPartitions(col("variant"), col("term")),
        s"$path/variants", partitionCols = Seq("bucket"))
      PartitionedStore.publishComposite(path,
        Map("variants" -> vv, "stats" -> sv))
    } finally Checkpoints.release(vocab)
  }

  /** Edit-distance-≤1 vocabulary lookup through a [[writeSymDelIndex]]
    * layout — the spell-correction read ("most frequent near term wins"):
    * the query's variants generate DRIVER-SIDE (≤ len+1 strings — the
    * same justified planning collect as the bucket resolutions), the
    * variants read prunes to their bucket dirs, candidates dedupe to
    * (term, df) and the exact `levenshtein` check keeps true neighbours
    * only. Output: (term, df, dist), the correction candidates with the
    * evidence a ranker needs. */
  def symDelLookup(spark: org.apache.spark.sql.SparkSession, path: String,
                   query: String): DataFrame = {
    import graft.sources.PartitionedStore
    require(query.nonEmpty && !query.contains(" "),
      s"query must be one non-empty term: '$query'")
    val served = PartitionedStore.readComposite(path)
    val nBuckets = PartitionedStore
      .readVersion(spark, s"$path/stats", Some(served("stats")))
      .select(col("n_buckets")).collect()(0).getInt(0)
    val qVariants = (query +:
      (0 until query.length).map(i =>
        query.substring(0, i) + query.substring(i + 1))).distinct
    import spark.implicits._
    val qdf = qVariants.toDF("variant")
    val qbuckets = qdf
      .select(pmod(xxhash64(col("variant")), lit(nBuckets.toLong)).as("b"))
      .distinct().collect().map(_.getLong(0)).toSeq
    PartitionedStore.readVersion(spark, s"$path/variants",
        Some(served("variants")))
      .filter(col("bucket").isin(qbuckets: _*))
      .join(broadcast(qdf), "variant")
      .select(col("term"), col("df")).distinct()
      .withColumn("dist", levenshtein(col("term"), lit(query), 1))
      .filter(col("dist") >= 0) // thresholded: −1 encodes dist > 1 (r17)
  }

  private def bm25IndexServe(spark: org.apache.spark.sql.SparkSession,
                             path: String, queries: DataFrame, idCol: String,
                             queryIdCol: String, queryTextCol: String,
                             k: Int, k1: Double, b: Double,
                             allowed: Option[DataFrame]): DataFrame = {
    import graft.sources.PartitionedStore
    // ONE composite resolution pins every component to the same
    // generation — a concurrent append can publish mid-query without
    // this read ever mixing its postings with our stats
    val served = PartitionedStore.readComposite(path)
    val stats = PartitionedStore.readVersion(spark, s"$path/stats",
      Some(served("stats")))
    val statsRow = stats.select(col("n_docs"), col("total_tokens"),
      col("n_buckets")).collect()(0)
    val nBuckets = statsRow.getInt(2)
    val qterms = broadcast(queries
      .select(col(queryIdCol).as("query_id"),
        explode(split(trim(col(queryTextCol)), " ")).as("term"))
      .distinct())
    val qbuckets = qterms
      .select(pmod(xxhash64(col("term")), lit(nBuckets.toLong)).as("b"))
      .distinct().collect().map(_.getLong(0)).toSeq
    val tfq0 = PartitionedStore.readVersion(spark, s"$path/postings",
        Some(served("postings")))
      .filter(col("bucket").isin(qbuckets: _*))
      .join(broadcast(qterms.select(col("term")).distinct()), "term")
    // tombstoned docs leave the postings BEFORE df is counted, so idf,
    // scores and ranks all see the post-delete corpus exactly as a
    // rebuild-without would (stats were adjusted at delete time)
    val tfq1 = served.get("tombstones").fold(tfq0) { tv =>
      tfq0.join(broadcast(PartitionedStore.readVersion(
        spark, s"$path/tombstones", Some(tv))), Seq(idCol), "left_anti")
    }
    val dl0 = PartitionedStore.readVersion(spark, s"$path/dl", Some(served("dl")))
    // metadata filter: restrict postings + dl, RECOMPUTE stats over the
    // filtered dl (dl-sized aggregation — never a corpus re-read); the
    // unfiltered path keeps the stored 1-row stats untouched
    val (tfq, dl, statsServe) = allowed match {
      case Some(ids) =>
        val keep = ids.select(col(idCol))
        val dlF = dl0.join(keep, Seq(idCol), "left_semi")
        (tfq1.join(keep, Seq(idCol), "left_semi"), dlF,
          broadcast(dlF.agg(count(lit(1)).as("n_docs"),
            sum(col("dl")).as("total_tokens"))))
      case None =>
        (tfq1, dl0,
          broadcast(stats.select(col("n_docs"), col("total_tokens"))))
    }
    Similarity.topKPerQuery(
      bm25ScoresFrom(tfq, dl, statsServe, qterms, idCol, k1, b),
      idCol, "score", k)
  }

  // ---- character-trigram substring index -------------------------------------

  /** Materialize a CHARACTER-TRIGRAM substring index (the pg_trgm idea:
    * Postgres `contrib/pg_trgm` serves arbitrary `LIKE '%x%'` predicates
    * from a trigram inverted index): one `(id, h)` row per DISTINCT
    * char-3-gram hash of the text, hash-bucketed like the other stored
    * families (bucket = pmod(h, nBuckets), a partition column), plus a
    * `meta` component that carries `metaCols` AND the text itself — the
    * stored-field copy the exact-confirm stage reads so serving never
    * touches the raw corpus. Trigram hashing runs in the codegen kernel
    * ([[graft.functions.CharNgramHashesExpr]]) — the same polynomial the
    * serve side replays driver-side, so build and lookup can never skew.
    * ~len(text) rows per doc: the storage price of substring search that
    * no tokenized index (BM25/phrase) can answer — a needle crossing a
    * token boundary ("ta str" inside "data stream") has no term to look
    * up. Deletes reuse the layout-generic deletion-vector verb
    * ([[deleteFromPhraseIndex]] touches only `meta` + `tombstones`). */
  /** Intra-batch duplicate-id normalization for the trigram layout,
    * where a doubled id is not merely wasteful but CORRUPTING:
    * [[substringIndexLookup]]'s candidate test is `n_hit ==
    * n_needle_grams` exactly, so a doc whose (id, h) postings were
    * written twice counts 2× per gram and silently turns UNFINDABLE (a
    * false negative, the worst failure mode an index can have). Exact
    * duplicate rows (a re-delivered batch) collapse to one; an id that
    * still appears twice carries CONFLICTING payloads, and that raises
    * in-plan — gating the live text column so column pruning can never
    * eliminate the guard — consistent with the tombstone-clash raise:
    * ambiguous input fails loudly, never silently. One groupBy + join
    * over the doc table (not the ~len(text)× larger postings). */
  private def uniqueIdsOrRaise(df: DataFrame, idCol: String,
                               textCol: String, ctx: String): DataFrame = {
    val exact = df.dropDuplicates()
    val counts = exact.groupBy(col(idCol)).agg(count(lit(1)).as("_nid"))
    exact.join(counts, Seq(idCol))
      .withColumn(textCol,
        when(col("_nid") > 1, raise_error(concat(
          lit(s"$ctx: conflicting rows for one $idCol within a batch (id="),
          col(idCol).cast("string"),
          lit(") — doubled postings would make exact-count matching " +
            "silently unfindable; dedup the feed"))))
          .otherwise(col(textCol)))
      .drop("_nid")
  }

  def writeTrigramIndex(docs0: DataFrame, idCol: String, textCol: String,
                        metaCols: Seq[String], path: String,
                        nBuckets: Int = 64): Unit = {
    require(nBuckets > 0, s"nBuckets must be positive: $nBuckets")
    import graft.sources.PartitionedStore
    import org.apache.spark.sql.graftExpr
    val docs = uniqueIdsOrRaise(docs0, idCol, textCol, "writeTrigramIndex")
    val grams = graftExpr.column(graft.functions.CharNgramHashesExpr(
      graftExpr.expression(col(textCol)), 3, distinct = true))
    val postings = docs
      .select(col(idCol), explode(grams).as("h"))
    val mv = PartitionedStore.commitVersion(
      docs.select((col(idCol) +: metaCols.map(col) :+ col(textCol)): _*),
      s"$path/meta")
    val sv = PartitionedStore.commitVersion(
      docs.sparkSession.range(1).select(lit(nBuckets).as("n_buckets")),
      s"$path/stats")
    val pv = PartitionedStore.commitVersion(
      postings
        .withColumn("bucket", pmod(col("h"), lit(nBuckets.toLong)))
        .repartition(col("bucket"))
        .sortWithinPartitions(col("h"), col(idCol)),
      s"$path/postings", partitionCols = Seq("bucket"))
    PartitionedStore.publishComposite(path,
      Map("postings" -> pv, "meta" -> mv, "stats" -> sv))
  }

  /** Incremental maintenance of a [[writeTrigramIndex]] layout — the
    * nightly-delivery form, mirroring [[appendPhraseIndex]]: the delta's
    * distinct trigram postings hash into the EXISTING bucket layout and
    * append into those directories only, its meta rows (stored-field
    * text included) append, and the composite republishes atomically —
    * cost tracks the DELTA, the standing corpus is never re-read. Like
    * the phrase index there are no corpus-level statistics (substring
    * matching is exact, not scored), so append-equals-rebuild falls out
    * of the layout with no arithmetic. Re-delivered ids drop via an
    * anti-join against the served meta (idempotent delivery); a
    * tombstoned id RAISES — an append resurrecting taken-down content
    * must fail loudly. */
  def appendTrigramIndex(spark: org.apache.spark.sql.SparkSession,
                         delta: DataFrame, idCol: String, textCol: String,
                         metaCols: Seq[String], path: String): Unit = {
    import graft.sources.PartitionedStore
    import org.apache.spark.sql.graftExpr
    val served = PartitionedStore.readComposite(path)
    val nBuckets = PartitionedStore
      .readVersion(spark, s"$path/stats", Some(served("stats")))
      .select(col("n_buckets")).collect()(0).getInt(0)
    served.get("tombstones").foreach { tv =>
      val tomb = PartitionedStore.readVersion(
        spark, s"$path/tombstones", Some(tv))
      val clash = delta.join(broadcast(tomb), Seq(idCol), "left_semi")
        .select(col(idCol)).limit(3).collect()
      if (clash.nonEmpty) throw new IllegalStateException(
        s"append would resurrect tombstoned ids (e.g. ${clash.mkString(", ")})" +
          s" at $path; compact the index to reclaim them first")
    }
    val existing = PartitionedStore
      .readVersion(spark, s"$path/meta", Some(served("meta")))
      .select(col(idCol))
    // cross-BATCH re-delivery drops via the anti-join; INTRA-batch
    // duplicates (the same id twice in one delta) would slip past it
    // and double-write postings — normalized/raised by the shared guard
    val fresh = uniqueIdsOrRaise(delta, idCol, textCol, "appendTrigramIndex")
      .join(existing, Seq(idCol), "left_anti")
      .localCheckpoint() // read twice: meta append + postings explode
    try {
      if (fresh.isEmpty) return // fully re-delivered delta: no-op
      val mv = PartitionedStore.commitVersion(
        fresh.select((col(idCol) +: metaCols.map(col) :+ col(textCol)): _*),
        s"$path/meta", append = true, parent = Some(served("meta")))
      val grams = graftExpr.column(graft.functions.CharNgramHashesExpr(
        graftExpr.expression(col(textCol)), 3, distinct = true))
      val pv = PartitionedStore.commitVersion(
        fresh.select(col(idCol), explode(grams).as("h"))
          .withColumn("bucket", pmod(col("h"), lit(nBuckets.toLong)))
          .repartition(col("bucket"))
          .sortWithinPartitions(col("h"), col(idCol)),
        s"$path/postings", append = true, parent = Some(served("postings")),
        partitionCols = Seq("bucket"))
      PartitionedStore.publishComposite(path,
        served ++ Map("postings" -> pv, "meta" -> mv))
    } finally Checkpoints.release(fresh)
  }

  /** Compact a [[writeTrigramIndex]] layout after appends/deletes —
    * [[compactPhraseIndex]]'s discipline on the trigram layout: postings
    * collapse to one clustered rewrite per bucket dir, meta coalesces,
    * tombstoned rows are physically reclaimed from both components and
    * the tombstone set leaves the composite (answers unchanged — serving
    * already filtered them; the bytes and the re-append embargo are
    * gone). Compacts the SERVED generation, never raw-latest. */
  def compactTrigramIndex(spark: org.apache.spark.sql.SparkSession,
                          path: String): Unit = {
    import graft.sources.PartitionedStore
    val served = PartitionedStore.readComposite(path)
    val idCol = PartitionedStore
      .readVersion(spark, s"$path/meta", Some(served("meta"))).columns.head
    val minus = served.get("tombstones").map { tv =>
      (PartitionedStore.readVersion(spark, s"$path/tombstones", Some(tv)),
        Seq(idCol))
    }
    val pv = PartitionedStore.compactVersion(spark, s"$path/postings",
      partitionCols = Seq("bucket"), sortCols = Seq("h", idCol),
      version = Some(served("postings")), minus = minus)
    val mv = PartitionedStore.compactVersion(spark, s"$path/meta",
      version = Some(served("meta")), minus = minus)
    PartitionedStore.publishComposite(path,
      served - "tombstones" ++ Map("postings" -> pv, "meta" -> mv))
  }

  /** Arbitrary-substring lookup through a [[writeTrigramIndex]] layout —
    * candidate-then-confirm, the pg_trgm serving shape: the needle's
    * distinct trigram hashes compute DRIVER-SIDE through the very kernel
    * the build used ([[graft.functions.HashOps.charNgramHashes]] — zero
    * formula drift possible), the postings read prunes to those hashes'
    * bucket dirs, and a doc is a candidate iff it holds ALL needle
    * trigrams (count == |needle trigram set|; postings are distinct per
    * (id, h) by construction, so a plain count is the distinct count).
    * Candidates then confirm `contains(text, needle)` against the
    * stored-field text in `meta` — hash collisions or trigram
    * false-positives ("ab", "bc", "cd" present but never adjacent) cost
    * one string scan over the candidate set, never a wrong row. Serve
    * cost ∝ the needle trigrams' corpus frequency, never corpus size;
    * the raw corpus is never read. Tombstoned docs leave before the
    * confirm. Output: meta rows (id, metaCols, text) of true matches. */
  def substringIndexLookup(spark: org.apache.spark.sql.SparkSession,
                           path: String, needle: String, idCol: String,
                           textCol: String,
                           maxProbeTrigrams: Int = 16): DataFrame = {
    import graft.sources.PartitionedStore
    require(needle.length >= 3,
      s"needle must be at least 3 chars for trigram lookup: '$needle'")
    require(maxProbeTrigrams >= 1,
      s"maxProbeTrigrams must be positive: $maxProbeTrigrams")
    val served = PartitionedStore.readComposite(path)
    val nBuckets = PartitionedStore
      .readVersion(spark, s"$path/stats", Some(served("stats")))
      .select(col("n_buckets")).collect()(0).getInt(0)
    // A long needle (a whole pasted paragraph) carries hundreds of
    // trigrams; requiring ALL of them would widen the probe to most
    // bucket dirs for no recall gain — any SUBSET of the needle's
    // trigrams is already a sound candidate condition (a true match
    // holds every one of them), and the exact confirm below restores
    // full precision. Probe the maxProbeTrigrams smallest hashes
    // (deterministic pick), bounding the read at ≤ that many dirs.
    val hashes = graft.functions.HashOps
      .charNgramHashes(
        org.apache.spark.unsafe.types.UTF8String.fromString(needle),
        3, distinct = true)
      .toLongArray().toSeq.sorted.take(maxProbeTrigrams)
    val buckets = hashes.map(h => java.lang.Math.floorMod(h, nBuckets.toLong))
      .distinct
    val cand0 = PartitionedStore.readVersion(spark, s"$path/postings",
        Some(served("postings")))
      .filter(col("bucket").isin(buckets: _*))
      .filter(col("h").isin(hashes: _*))
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_hit"))
      .filter(col("n_hit") === hashes.length)
      .select(col(idCol))
    val cand = served.get("tombstones").fold(cand0) { tv =>
      cand0.join(broadcast(PartitionedStore.readVersion(
        spark, s"$path/tombstones", Some(tv))), Seq(idCol), "left_anti")
    }
    PartitionedStore.readVersion(spark, s"$path/meta", Some(served("meta")))
      .join(cand, Seq(idCol), "left_semi")
      .filter(contains(col(textCol), lit(needle)))
  }
}
