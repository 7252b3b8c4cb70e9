package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Domain-mixing operators for training-data assembly: rebalance a corpus
  * across sources with temperature sampling (p_s ∝ n_s^α, the multilingual
  * / multi-domain rebalancing rule of XLM-style pretraining — Lample &
  * Conneau 2019) using deterministic hash-threshold
  * selection instead of RNG.
  *
  * Reproducibility contract: per-source weights are sqrt counts quantized
  * to integers (×1e6, floored) so their SUM is exact long arithmetic —
  * partition-order-independent on any cluster and bitwise-replayable by
  * the oracle; the only double math left is a fixed-shape chain of
  * IEEE-deterministic ops (one sqrt, two divides, two multiplies, floor).
  *
  * Scale shape: pass 1 is a tiny groupBy(source) count (map-side partial
  * agg, result is #sources rows); the per-source keep thresholds BROADCAST
  * back, so pass 2 is a scan + broadcast hash join + filter — the corpus
  * is never shuffled.
  */
object Mix {

  /** Multiplier for the scramble rounds: prime, large enough that a ±1
    * hash delta wraps mod P ~1000× after two rounds, small enough that
    * h·M never overflows a long (P·M < 2^50). */
  val ScrambleM = 999983L

  /** Threshold-sampling hash: polyHash avalanched by two multiplicative
    * Lehmer rounds mod P. Raw polyHash values of near-identical texts
    * (docs differing in a trailing digit) cluster within a few hundred of
    * each other — fine for mod-100 rate gates, fatal for a full-range
    * threshold compare. Two ×M mod P rounds spread a ±1 delta across the
    * whole range while staying in exact long arithmetic (DuckDB BIGINT
    * errors on 64-bit wraparound, so xor/shift mixers are not
    * oracle-replayable; mod-P products are). */
  def sampleHash(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val p = Dedup.HashMod
    (Dedup.polyHash(text) * ScrambleM % p) * ScrambleM % p
  }

  /** Multi-epoch deterministic reshuffle: one (epoch, shard, pos) plan row
    * per document per epoch, where each epoch's permutation is the
    * scrambled order of an EPOCH-SALTED hash — h_e = scramble(h₀ + e) —
    * so epochs reorder independently (the +e lands inside the avalanche,
    * not after it) while every epoch still covers every doc exactly once.
    * This is the "reshuffle between epochs" a multi-epoch training run
    * needs, computed as a plan instead of a stateful shuffle service.
    *
    * Shape: the text hashes ONCE (h₀); the per-epoch explode generates
    * E narrow (id, h₀, epoch) rows — text never replicates; ranking
    * windows partition by (epoch, shard), bounded by a shard of one
    * epoch. Exact long arithmetic end to end (oracle-replayable). */
  def epochShuffle(df: DataFrame, idCol: String, textCol: String,
                   epochs: Int, nShards: Int): DataFrame = {
    val p = Dedup.HashMod
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("epoch"), col("shard")).orderBy(col("h"), col(idCol))
    df.select(col(idCol), Dedup.polyHash(col(textCol)).as("h0"))
      .select(col(idCol), col("h0"),
        explode(sequence(lit(0), lit(epochs - 1))).as("epoch"))
      .withColumn("h",
        (col("h0") + col("epoch")) * lit(ScrambleM) % lit(p) * lit(ScrambleM) % lit(p))
      .withColumn("shard", pmod(col("h"), lit(nShards)).cast("int"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col(idCol), col("epoch"), col("shard"), col("h"), col("pos"))
  }

  /** Deterministic FIXED-SIZE per-group sample: exactly the k docs with
    * the smallest scrambled content hashes in each group — "give me k per
    * source" (eval slices, per-domain probes, human-review queues), with
    * hash-threshold sampling's reproducibility but an exact count instead
    * of a rate. Implemented as a bounded top-k aggregation (CollectTopK,
    * reversed): each partition reduces a group to ≤ k candidates BEFORE
    * the exchange, so only partitions×k narrow rows shuffle and no
    * reducer sorts a group's full membership — the same scale shape as
    * the ANN final ranking, vs the per-group window sort that hands a
    * whole group to one task. Output: (grpCol, idCol, h, rank 1..k by
    * (h, id)). */
  def sampleFixedK(df: DataFrame, grpCol: String, idCol: String,
                   textCol: String, k: Int): DataFrame =
    bottomKByHash(df.select(col(grpCol), col(idCol),
      sampleHash(col(textCol)).as("h")), grpCol, idCol, "h", k)

  /** Deterministic WEIGHTED fixed-k sampling by hash priority — the
    * weighted sibling of [[sampleFixedK]], in the priority-sampling
    * shape (Ohlsson's sequential Poisson sampling / Duffield-Lund-Thorup
    * priority sampling: draw u, keep the k smallest u/w — heavier items
    * get smaller priorities, hence seats roughly proportional to
    * weight): priority = scrambled content hash DIV weight, exact
    * integer division (both engines floor on non-negative operands), no
    * RNG, no seed plumbing — identical on any cluster size or engine and
    * stable under reruns/backfills, the property the production pattern
    * exists for. Non-positive weights raise IN-PLAN (a zero weight would
    * divide-by-zero into an engine-specific null ordering). Same bounded
    * CollectTopK plan as the unweighted sibling. Output:
    * (grpCol, idCol, pr, rank). */
  def sampleWeightedPriority(df: DataFrame, grpCol: String, idCol: String,
                             textCol: String, weightCol: String,
                             k: Int): DataFrame = {
    val w = when(col(weightCol) <= 0, raise_error(concat(
      lit(s"sampleWeightedPriority: non-positive weight in $weightCol — "),
      col(weightCol).cast("string"))))
      .otherwise(col(weightCol).cast("long"))
    bottomKByHash(df.select(col(grpCol), col(idCol),
        sampleHash(col(textCol)).as("h0"), w.as("w"))
      .select(col(grpCol), col(idCol),
        expr("h0 DIV w").as("pr")), // integer DIV: both engines floor on >= 0
      grpCol, idCol, "pr", k)
      .withColumnRenamed("h", "pr")
  }

  /** The bottom-k core of [[sampleFixedK]] over PRE-hashed rows — the
    * serving half of the streaming sample leg, where candidates arrive
    * from a store instead of being hashed in-plan. Because bottom-k is
    * MIN-OF-UNION algebra (k smallest of a union = k smallest of the
    * per-part k-smallest), re-ranking stored per-batch candidates is
    * exactly the whole-corpus sample — and a verbatim re-delivered
    * candidate set is absorbed by the distinct the caller applies.
    * Same bounded CollectTopK plan: ≤ partitions×k rows shuffle,
    * no per-group sort. */
  def bottomKByHash(hashed: DataFrame, grpCol: String, idCol: String,
                    hCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.graftExpr
    import org.apache.spark.sql.catalyst.expressions.aggregate.CollectTopK
    val key = struct(col(hCol).as("h"), col(idCol))
    val topk = graftExpr.column(
      new CollectTopK(graftExpr.expression(key), k, true).toAggregateExpression())
    hashed.groupBy(col(grpCol))
      .agg(topk.as("tops"))
      .select(col(grpCol), posexplode(col("tops")).as(Seq("r0", "t")))
      .select(col(grpCol), col(s"t.$idCol").as(idCol), col("t.h").as("h"),
        (col("r0") + 1).cast("int").as("rank"))
  }

  /** Weighted SYSTEMATIC sample, deterministic and exact: lay the
    * corpus's integer weights (token counts) end to end in id order and
    * pick every document whose span crosses a multiple of `stride` —
    * selection probability proportional to weight, expected sample size
    * Σw/stride, zero randomness, and `picks` counts multi-crossings so
    * oversized documents are weighted faithfully (Madow's systematic
    * PPS sampling, with the random start pinned to 0 for determinism).
    *
    * The cumulative weight is the textbook
    * `sum(w) OVER (ORDER BY id)` — a single-partition global window at
    * corpus scale — so it is decomposed two-phase like
    * [[DataQuality.idGaps]]: per-block (id DIV blockSize) windows over
    * narrow (block, id, w) rows, block offsets from one global window
    * over the TINY per-block sum table, exclusive-prefix join back.
    * No global sort ever sees data rows.
    * Output: (idCol, w, cum, picks), picks ≥ 1 rows only. */
  def sampleSystematicW(df: DataFrame, idCol: String, wCol: String,
                        stride: Long, blockSize: Long = 4096L): DataFrame = {
    require(stride > 0 && blockSize > 0)
    import org.apache.spark.sql.expressions.Window
    val rows = df.select(col(idCol), col(wCol).cast("long").as("w"))
      .withColumn("b", expr(s"$idCol DIV $blockSize"))
    val wIn = Window.partitionBy(col("b")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val blockOff = Window.orderBy(col("b")) // tiny: one row per block
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = rows.groupBy(col("b")).agg(sum(col("w")).as("bw"))
      .withColumn("off", coalesce(sum(col("bw")).over(blockOff), lit(0L)))
      .select(col("b"), col("off"))
    rows.withColumn("cum_in", sum(col("w")).over(wIn))
      .join(offsets, "b")
      .withColumn("cum", col("off") + col("cum_in"))
      .withColumn("picks",
        expr(s"cum DIV $stride") - expr(s"(cum - w) DIV $stride"))
      .filter(col("picks") >= 1L)
      .select(col(idCol), col("w"), col("cum"), col("picks"))
  }

  /** EXACT top-fraction selection by an integer score — "keep the best
    * 20% by quality" — without a global sort: the classic
    * row_number() OVER (ORDER BY score) plan funnels the corpus into one
    * task, so the rank is decomposed two-phase. Phase 1: a score-bucket
    * histogram (one map-side-combinable groupBy; bucket count rows reach
    * the driver — KBs, and the cutoff must exist at planning time, so
    * this is the one justified collect, same as the budget-selection
    * threshold). Phase 2: everything above the boundary bucket passes by
    * FILTER alone; the exact remainder comes from the boundary bucket via
    * a bounded top-k aggregation (partial-aggregated map-side to ≤ k per
    * partition — only boundary-bucket candidates move, never the corpus).
    * Deterministic total order (score desc, id asc); exactly
    * ⌊N·frac⌋ rows. Output: (idCol, score). */
  def topFraction(df: DataFrame, idCol: String, scoreCol: String,
                  frac: Double, bucketWidth: Long = 64L): DataFrame = {
    import org.apache.spark.sql.graftExpr
    import org.apache.spark.sql.catalyst.expressions.aggregate.CollectTopK
    // the boundary-bucket tie-break negates the id; a non-numeric id would
    // negate to null under non-ANSI mode and silently null the output ids
    require(df.schema(idCol).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"topFraction needs a numeric id column for its (score, -id) " +
        s"tie-break; '$idCol' is ${df.schema(idCol).dataType.simpleString}")
    val scored = df.select(col(idCol), col(scoreCol).cast("long").as("score"))
      .withColumn("bkt", floor(col("score") / bucketWidth).cast("long"))
    val hist = scored.groupBy(col("bkt")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(-_._1)
    val n = hist.map(_._2).sum
    val k = math.floor(n * frac).toLong
    var above = 0L
    var cut = Long.MaxValue
    hist.foreach { case (b, c) =>
      if (above < k && cut == Long.MaxValue) {
        if (above + c >= k) cut = b else above += c
      }
    }
    val pass = scored.filter(col("bkt") > cut)
      .select(col(idCol), col("score"))
    val needed = (k - above).toInt
    if (cut == Long.MaxValue || needed <= 0) pass
    else {
      val key = struct(col("score"), (-col(idCol)).as("nid"))
      val topk = graftExpr.column(
        new CollectTopK(graftExpr.expression(key), needed, false)
          .toAggregateExpression())
      val boundary = scored.filter(col("bkt") === cut)
        .groupBy().agg(topk.as("tops"))
        .select(explode(col("tops")).as("t"))
        .select((-col("t.nid")).as(idCol), col("t.score").as("score"))
      pass.unionByName(boundary)
    }
  }

  /** Per-GROUP exact top-fraction — "keep the best 20% of every domain" —
    * the per-domain form of [[topFraction]], same two-phase shape with the
    * cutoff search moved INTO the plan: phase 1 builds a (group, bucket)
    * score histogram (map-side combinable; groups×buckets narrow rows),
    * and each group's boundary bucket falls out of a prefix-sum window
    * over THAT tiny table — above < k ≤ above + cnt picks exactly one
    * bucket per group, so no per-group driver loop. Phase 2: rows in
    * buckets above the group's boundary pass by broadcast-join + FILTER
    * alone; the exact remainder comes from the boundary bucket via a
    * bounded per-group top-k aggregation (CollectTopK — map-side partial,
    * never a per-group window sort over data rows; only boundary-bucket
    * candidates move). The single driver touch is max(needed) — one row,
    * needed at plan time because CollectTopK's k is a literal (the same
    * justified planning boundary as [[topFraction]]'s histogram).
    * Deterministic per-group total order (score desc, id asc); exactly
    * ⌊n_g·frac⌋ rows per group. Output: (grpCol, idCol, score). */
  def topFractionByGroup(df: DataFrame, grpCol: String, idCol: String,
                         scoreCol: String, frac: Double,
                         bucketWidth: Long = 64L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.graftExpr
    import org.apache.spark.sql.catalyst.expressions.aggregate.CollectTopK
    require(df.schema(idCol).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"topFractionByGroup needs a numeric id column for its (score, -id) " +
        s"tie-break; '$idCol' is ${df.schema(idCol).dataType.simpleString}")
    val scored = df.select(col(grpCol), col(idCol),
        col(scoreCol).cast("long").as("score"))
      .withColumn("bkt", floor(col("score") / bucketWidth).cast("long"))
    val hist = scored.groupBy(col(grpCol), col("bkt")).agg(count(lit(1)).as("cnt"))
    val wAll = Window.partitionBy(col(grpCol))
    val wAbove = Window.partitionBy(col(grpCol)).orderBy(col("bkt").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cuts = hist
      .withColumn("k",
        floor(sum(col("cnt")).over(wAll).cast("double") * frac).cast("long"))
      .withColumn("above", coalesce(sum(col("cnt")).over(wAbove), lit(0L)))
      .filter(col("above") < col("k") && col("above") + col("cnt") >= col("k"))
      .select(col(grpCol), col("bkt").as("cut"),
        (col("k") - col("above")).as("needed"))
    val passed = scored.join(broadcast(cuts), grpCol)
      .filter(col("bkt") > col("cut"))
      .select(col(grpCol), col(idCol), col("score"))
    val kMaxRow = cuts.agg(max(col("needed"))).collect()
    val kMax =
      if (kMaxRow.isEmpty || kMaxRow(0).isNullAt(0)) 0
      else kMaxRow(0).getLong(0).toInt
    if (kMax <= 0) passed
    else {
      val key = struct(col("score"), (-col(idCol)).as("nid"))
      val topk = graftExpr.column(
        new CollectTopK(graftExpr.expression(key), kMax, false)
          .toAggregateExpression())
      val boundary = scored.join(broadcast(cuts), grpCol)
        .filter(col("bkt") === col("cut"))
        .groupBy(col(grpCol), col("needed"))
        .agg(topk.as("tops"))
        .select(col(grpCol), col("needed"),
          posexplode(col("tops")).as(Seq("r0", "t")))
        .filter(col("r0") < col("needed"))
        .select(col(grpCol), (-col("t.nid")).as(idCol), col("t.score").as("score"))
      passed.unionByName(boundary)
    }
  }

  /** Per-source keep thresholds for α=0.5 temperature sampling at a target
    * corpus fraction. Output: (srcCol, n_s, thr) where a doc survives iff
    * [[sampleHash]](text) < thr. keep_prob_s = min(1, target_n·(w_s/Σw)/n_s)
    * with w_s = ⌊√n_s·1e6⌋ and target_n = ⌊N·targetFrac⌋. */
  def temperatureThresholds(df: DataFrame, srcCol: String,
                            targetFrac: Double): DataFrame = {
    val counts = df.groupBy(col(srcCol)).agg(count(lit(1)).as("n_s"))
    val weighted = counts.withColumn("w_q",
      floor(sqrt(col("n_s").cast("double")) * 1e6))
    val totals = weighted.agg(sum(col("w_q")).as("total_q"),
      sum(col("n_s")).as("n_total"))
    weighted.crossJoin(broadcast(totals))
      .withColumn("target_n", floor(col("n_total").cast("double") * targetFrac))
      .withColumn("keep_prob", least(lit(1.0),
        col("target_n").cast("double") *
          (col("w_q").cast("double") / col("total_q").cast("double")) /
          col("n_s").cast("double")))
      .withColumn("thr", floor(col("keep_prob") * Dedup.HashMod))
      .select(col(srcCol), col("n_s"), col("thr"))
  }

  /** Annealed mixture schedule: per-epoch source weights moving from
    * √-flattened toward proportional over three epochs — the "start
    * balanced, finish natural" data schedule of multi-epoch pretraining.
    * α_e ∈ {0.5, 0.75, 1.0}, built ONLY from sqrt compositions
    * (n^0.75 = √(n·√n)) because IEEE sqrt is correctly rounded in every
    * libm while pow is not — the same cross-engine determinism rule as
    * the ln-free commonness score. Weights quantize to ×1e6 longs so the
    * per-epoch totals are exact. Output per (epoch, source): quantized
    * weight, realized fraction, and the epoch's expected doc count at
    * `targetFrac` of the corpus. */
  def annealSchedule(df: DataFrame, srcCol: String,
                     targetFrac: Double): DataFrame = {
    val counts = df.groupBy(col(srcCol)).agg(count(lit(1)).as("n_s"))
    val n = col("n_s").cast("double")
    val wq = when(col("epoch") === 0, floor(sqrt(n) * 1e6))
      .when(col("epoch") === 1, floor(sqrt(n * sqrt(n)) * 1e6))
      .otherwise(floor(n * 1e6))
    val perEpoch = org.apache.spark.sql.expressions.Window.partitionBy(col("epoch"))
    counts
      .crossJoin(broadcast(counts.agg(sum(col("n_s")).as("n_total"))))
      .withColumn("epoch", explode(sequence(lit(0), lit(2))))
      .withColumn("w_q", wq)
      .withColumn("frac",
        col("w_q").cast("double") / sum(col("w_q")).over(perEpoch).cast("double"))
      .withColumn("expected_docs",
        floor(col("frac") * floor(col("n_total").cast("double") * targetFrac).cast("double")))
      .select(col("epoch"), col(srcCol), col("n_s"), col("w_q"),
        col("frac"), col("expected_docs"))
  }

  /** Greedy token-budget selection: per source, take documents in
    * descending score order until the token budget is exhausted (the
    * "best docs under N tokens per domain" assembly step). The
    * (scoreCol desc, idCol) order is total, so the selected SET is
    * deterministic on any cluster. Output: input row + cum_tokens, a doc
    * kept iff the budget covers its ENTIRE token count (cum ≤ budget).
    *
    * TWO-PHASE shape — the naive single window
    * (partitionBy(source).orderBy(score desc, id)) funnels every
    * candidate row of a source into ONE task for a full sort; with a
    * handful of sources at 100 TB that is a single-task sort of billions
    * of rows. Instead:
    *   1. aggregate (source, score) → token sum — map-side combinable,
    *      result is |sources|·|distinct scores| NARROW rows; a per-source
    *      cumsum over THAT table (tiny sort) yields each score-group's
    *      base offset, and groups whose base already exceeds the budget
    *      are discarded wholesale;
    *   2. the surviving groups broadcast back; only rows of
    *      at-or-before-the-cutoff groups — a set bounded by
    *      budget/min_doc_tokens plus one boundary group, NOT by corpus
    *      size — get the exact within-group cumsum (window per
    *      (source, score), ordered by id, partitions bounded by group
    *      size and parallel across groups).
    * cum_tokens = group base + within-group cumsum is identical to the
    * single-window value, bit for bit (long arithmetic, same total
    * order). */
  def budgetSelect(df: DataFrame, idCol: String, srcCol: String,
                   scoreCol: String, tokensCol: String, budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gw = Window.partitionBy(col(srcCol)).orderBy(col(scoreCol).desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val groups = df.groupBy(col(srcCol), col(scoreCol))
      .agg(sum(col(tokensCol)).as("_gsum"))
      .withColumn("_gbase", sum(col("_gsum")).over(gw) - col("_gsum"))
      .filter(col("_gbase") <= budget)
      .select(col(srcCol), col(scoreCol), col("_gbase"))
    val ww = Window.partitionBy(col(srcCol), col(scoreCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    df.join(broadcast(groups), Seq(srcCol, scoreCol))
      .withColumn("cum_tokens", col("_gbase") + sum(col(tokensCol)).over(ww))
      .filter(col("cum_tokens") <= budget)
      .select(df.columns.map(col).toIndexedSeq :+ col("cum_tokens"): _*)
  }

  /** Quality-curriculum banding: partition the corpus into `nBands`
    * difficulty bands by score (band 1 = highest-scoring / "easiest"
    * slice) using VALUE cutoffs at the integer ranks ⌈n·b/B⌉ of the
    * (score desc) order — the curriculum-learning admission rule
    * (Bengio et al. 2009) phrased so no per-row rank ever exists:
    * cutoff scores come from a prefix-sum window over the tiny
    * per-VALUE score histogram (the winsorize/topFraction machinery —
    * distinct-score rows, never data rows), broadcast back, and each
    * row's band is a pure value compare. Score ties are closed under
    * banding (every row with the cutoff score joins the band whose rank
    * interval its value crosses), so the output is deterministic under
    * any partitioning — and the oracle can state the same cutoffs with
    * a naive cumulative histogram. Output: (idCol, score, band ∈ 1..B).
    */
  def curriculumBands(df: DataFrame, idCol: String, scoreCol: String,
                      nBands: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nBands >= 2, s"need at least 2 bands: $nBands")
    val scored = df.select(col(idCol), col(scoreCol).cast("long").as("score"))
    val hist = scored.groupBy(col("score")).agg(count(lit(1)).as("cnt"))
    // window over the distinct-score histogram only (plan-pinned class)
    val cum = hist.withColumn("cum",
      sum(col("cnt")).over(Window.orderBy(col("score").desc)
        .rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy()))
    // cutoff b = the score at rank ceil(n*b/B) descending = the LARGEST
    // score whose cumulative count reaches that rank
    val cuts = cum
      .crossJoin(broadcast(
        spark(df).range(1, nBands.toLong).select(col("id").as("b"))))
      .withColumn("rank_b", expr(s"(n * b + $nBands - 1) DIV $nBands"))
      .filter(col("cum") >= col("rank_b"))
      .groupBy(col("b")).agg(max(col("score")).as("cut"))
    scored.crossJoin(broadcast(
        cuts.groupBy().agg(
          sort_array(collect_list(struct(col("b"), col("cut"))))
            .as("cuts"))))
      .withColumn("band",
        coalesce(
          get(filter(col("cuts"), c => col("score") >= c.getField("cut")),
            lit(0)).getField("b"),
          lit(nBands.toLong)))
      .select(col(idCol), col("score"), col("band"))
  }

  private def spark(df: DataFrame) = df.sparkSession

  /** Curriculum schedule: epoch e (1..B) admits bands 1..e — easy slices
    * first, the full corpus by the final epoch. The admission matrix is
    * an epochs × per-band-summary cross of two tiny broadcast frames;
    * the corpus itself is touched once (the banding scan) and never
    * re-scanned per epoch. Output: (epoch, band, n_docs, sum_score). */
  def curriculumSchedule(bands: DataFrame, nBands: Int): DataFrame = {
    val perBand = bands.groupBy(col("band"))
      .agg(count(lit(1)).as("n_docs"), sum(col("score")).as("sum_score"))
    perBand.crossJoin(broadcast(
        spark(bands).range(1, nBands.toLong + 1).select(col("id").as("epoch"))))
      .filter(col("band") <= col("epoch"))
      .select(col("epoch"), col("band"), col("n_docs"), col("sum_score"))
  }

  /** α=0.5 temperature mix report: per source, input size, kept size, and
    * realized keep fraction. Rare sources keep (up to) everything, dominant
    * sources are downsampled toward the √-flattened target mix. */
  def temperatureSample(df: DataFrame, idCol: String, srcCol: String,
                        textCol: String, targetFrac: Double): DataFrame = {
    val rates = temperatureThresholds(df, srcCol, targetFrac)
    df.select(col(srcCol), sampleHash(col(textCol)).as("h"))
      .join(broadcast(rates), srcCol)
      .groupBy(col(srcCol), col("n_s"))
      .agg(sum(when(col("h") < col("thr"), 1L).otherwise(0L)).as("n_kept"))
      .select(col(srcCol), col("n_s").as("n_in"), col("n_kept"),
        (col("n_kept").cast("double") / col("n_s").cast("double")).as("keep_frac"))
  }
}
