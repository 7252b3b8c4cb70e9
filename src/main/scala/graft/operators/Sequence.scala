package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence-preparation operators for LLM pretraining: fixed-window
  * chunking of documents and concat-and-cut packing of documents into
  * fixed-capacity context windows.
  *
  * Both are deterministic integer arithmetic over token counts, so the
  * DuckDB oracle replays them exactly.
  *
  * Scale shapes:
  *  - chunking is explode-over-sequence — a pure generator projection, no
  *    shuffle; output rows carry only the chunk text, never the full doc.
  *  - packing is ONE window cumsum per shard (hash-partition by shard id,
  *    per-partition sort by doc id) — the exact plan of any windowed
  *    aggregation; no driver-side loop, no global sort. Shards are
  *    independent, so 1000 executors pack 1000 shards concurrently.
  */
object Sequence {

  /** Fixed-size token windows with stride (stride < window ⇒ overlap).
    * Output: (idCol, chunk_id, start_token [1-based], n_chunk_tokens,
    * chunk_text). Documents shorter than one window yield one short chunk;
    * the final window is clipped, and a trailing window fully contained in
    * the previous one is not emitted (standard tokenizer-windowing rule).
    *
    * No lambda HOFs — sequence/slice/array_join are all codegen'd — so the
    * whole operator stays inside WholeStageCodegen. */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
                  window: Int, stride: Int): DataFrame = {
    require(stride > 0 && window >= stride,
      "need 0 < stride <= window (stride > window would drop tokens)")
    val toks = split(trim(col(textCol)), " ")
    val n = size(toks)
    // number of windows: 1 + ceil(max(n - window, 0) / stride)
    val nChunks = (lit(1) +
      ceil(greatest(n - window, lit(0)).cast("double") / stride).cast("int"))
    df.select(col(idCol), toks.as("_toks"),
        posexplode(sequence(lit(0), nChunks - 1)).as(Seq("chunk_id", "_k")))
      .select(col(idCol), col("chunk_id"),
        (col("_k") * stride + 1).as("start_token"),
        size(slice(col("_toks"), col("_k") * stride + 1, lit(window)))
          .cast("long").as("n_chunk_tokens"),
        array_join(slice(col("_toks"), col("_k") * stride + 1, lit(window)), " ")
          .as("chunk_text"))
  }

  /** Concat-and-cut packing (the GPT-style pretraining batch layout):
    * within each shard, documents are concatenated in id order and the
    * stream is cut every `capacity` tokens. Emits each document's
    * placement: its token offset interval [start_offset, end_offset) in
    * the shard stream and the first/last context windows it lands in
    * (bin_first == bin_last ⟺ the doc fits one window).
    *
    * Sharding is `idCol % nShards` — deterministic, reshard-stable, and
    * replayable in any engine (no engine-specific hash). */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
                    capacity: Int, nShards: Int): DataFrame = {
    val n = size(split(trim(col(textCol)), " ")).cast("long")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol), pmod(col(idCol), lit(nShards)).cast("int").as("shard"),
        n.as("n_tokens"))
      .withColumn("end_offset", sum(col("n_tokens")).over(w))
      .withColumn("start_offset", col("end_offset") - col("n_tokens"))
      .select(col(idCol), col("shard"), col("n_tokens"),
        col("start_offset"), col("end_offset"),
        floor(col("start_offset") / capacity).as("bin_first"),
        floor((col("end_offset") - 1) / capacity).as("bin_last"))
  }

  /** Deterministic global shuffle for training-order assembly: every doc
    * gets a shard (content hash mod nShards) and a position within its
    * shard (ordered by hash, id tie-break). The "shuffle" is really a
    * hash-sort — reproducible on any cluster size, stable under reruns
    * and backfills, and with no RNG/seed plumbing (the property a
    * `rand()`-keyed repartition lacks). Output: (idCol, h, shard, pos).
    *
    * Scale shape: one hash-partition exchange on shard + a per-partition
    * sort — the minimal plan for any global ordering; shards are
    * independent, so 1000 executors order 1000 shards concurrently and a
    * trainer reads each shard sequentially. Input columns are carried
    * through so downstream stages need no re-join. */
  def shuffleShards(df: DataFrame, idCol: String, textCol: String,
                    nShards: Int): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col("h"), col(idCol))
    // scrambled hash (Mix.sampleHash): raw polyHash of near-identical texts
    // clusters, which would place similar docs ADJACENT in shard order —
    // the opposite of a shuffle
    df.withColumn("h", Mix.sampleHash(col(textCol)))
      .withColumn("shard", pmod(col("h"), lit(nShards)).cast("int"))
      .withColumn("pos", row_number().over(w).cast("long"))
  }

  /** Rendezvous (highest-random-weight) placement of shards onto
    * `nWorkers` workers (Thaler & Ravishankar 1998 — the consistent-
    * placement primitive behind sticky routing, cache affinity, and
    * shard→executor pinning on a 1000-node cluster): every (shard,
    * worker) pair scores with an integer scramble that does NOT depend
    * on the worker-SET size, and the shard goes to its argmax. The
    * property that makes it rendezvous and not `mod nWorkers`: removing
    * a worker reassigns ONLY the shards it owned — every other score is
    * unchanged, so every other argmax is too (spec-pinned) — where a
    * mod-placement reshuffles nearly everything. The argmax is the
    * engine-portable combined-integer form max(score·W + worker) % W
    * (worker < W makes it lexicographic on (score, worker) with a
    * deterministic tie rule both engines state identically — no
    * arg_max() tie ambiguity). Cost: |shards|·W scored rows, one
    * aggregation — shards are control-plane-sized, never data rows.
    * Output: (shardCol, worker). */
  def rendezvousAssign(shards: DataFrame, shardCol: String,
                       nWorkers: Int): DataFrame = {
    require(nWorkers >= 1, s"need at least one worker: $nWorkers")
    val p = graft.operators.Dedup.HashMod
    val m = Mix.ScrambleM
    val w = nWorkers.toLong
    val workers = broadcast(shards.sparkSession.range(nWorkers)
      .select(col("id").as("worker")))
    shards.crossJoin(workers)
      .withColumn("score",
        ((col(shardCol) + 1L) * m % p + col("worker") + 1L) * m % p * m % p)
      .groupBy(col(shardCol))
      .agg((max(col("score") * w + col("worker")) % w).as("worker"))
  }

  /** Globally DENSE deterministic ids 0..N−1 in scrambled-hash order,
    * WITHOUT a global sort — the distributed id-assignment shape (sample
    * indices, row ids, vocab ids): a single-task
    * row_number() OVER (ORDER BY …) is the classic scale-killer, so the
    * order is decomposed as (shard, h, id) and built two-phase: rank
    * within shard (window bounded by the shard, 1/nShards of the data per
    * task) plus an exclusive prefix sum of the nShards shard COUNTS —
    * an aggregate of nShards rows whose tiny window never touches data —
    * broadcast back as offsets. Deterministic on any cluster layout;
    * ids are gapless by construction. Output: (idCol, shard, dense_id). */
  def denseIds(df: DataFrame, idCol: String, textCol: String,
               nShards: Int): DataFrame = {
    val hashed = df.select(col(idCol), Mix.sampleHash(col(textCol)).as("h"))
      .withColumn("shard", pmod(col("h"), lit(nShards)).cast("int"))
    val w = Window.partitionBy(col("shard")).orderBy(col("h"), col(idCol))
    val ranked = hashed.withColumn("rk", row_number().over(w).cast("long"))
    val wo = Window.orderBy(col("shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = broadcast(hashed.groupBy(col("shard"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("offset", coalesce(sum(col("cnt")).over(wo), lit(0L)))
      .select(col("shard"), col("offset")))
    ranked.join(offsets, "shard")
      .select(col(idCol), col("shard"),
        (col("offset") + col("rk") - 1).as("dense_id"))
  }

  /** Per-shard packing summary: windows used vs the lower bound
    * ⌈tokens/capacity⌉ — the packing-efficiency report a batch builder
    * reads. */
  def packingStats(packed: DataFrame, capacity: Int): DataFrame =
    packed.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        (max(col("bin_last")) + 1).as("n_bins"))
      .withColumn("fill_ratio",
        col("n_tokens").cast("double") / (col("n_bins") * capacity))
}
