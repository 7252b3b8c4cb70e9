package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Market-history time-series operators — the rollups a price tracker
  * serves from its observation stream (the reference charts per-item
  * history and daily movement from raw observations,
  * api/main.py:248-320, DOCUMENTATION.md:171-318), generalized to the
  * shapes any metric store needs: OHLC bars, regular-grid resampling
  * with forward fill, and per-key linear trend.
  *
  * Scale/determinism contract shared by all three:
  *  - The ONLY pass over raw data rows is a map-side-combinable
  *    `groupBy(key, bucket)` aggregation. Windows appear exclusively
  *    over the post-aggregation (key × bucket) table, whose size is
  *    bounded by cardinality × grid length, not by data volume — at
  *    100 TB the raw scan dominates and nothing downstream grows with
  *    it.
  *  - First/last-in-bucket is `min/max(struct(orderCols…, payload))`
  *    — the single-shuffle latest-per-key idiom, never a full-width
  *    `row_number` window over data rows.
  *  - Float values are quantized to `floor(x·1e6)` longs BEFORE any
  *    sum (addition-order independence), so a second engine summing
  *    the same rows hash-matches bit for bit; min/max/first/last stay
  *    raw doubles (order-insensitive picks, no arithmetic).
  */
object TimeSeries {

  /** value quantum for order-independent sums: floor(x·1e6). */
  /** Quantize to integer micro-units, with the cross-engine DIV
    * precondition enforced IN-PLAN: every downstream exact mean /
    * interpolation in this pack divides quantized sums with long DIV,
    * which is engine-identical only while operands are non-negative
    * (Spark DIV truncates toward zero, DuckDB `//` floors — they
    * diverge on any negative numerator). Today's `events.value` is
    * positive by construction, but a future testdata generation with
    * negative values would otherwise hash-mismatch SILENTLY; this guard
    * turns that into a loud in-plan raise at the first offending row
    * (one codegen'd conditional per row — free next to the multiply).
    * [[ewmaDaily]] needs no guard: its shiftright recurrence is
    * floor-consistent by construction. */
  /** Default day-count bound for the per-row prefix-fold ops (~27
    * years of daily rows): the quadratic cost of [[ewmaAnomalies]] /
    * [[cusumChangepoints]] is bounded by the CALENDAR, not by data
    * volume, and this guard turns that documented contract into an
    * enforced one — a multi-decade key would otherwise silently pay
    * ~10⁷ fold steps per row. */
  val MaxFoldDays: Int = 10000

  /** In-plan day-count envelope: raises on the first key whose daily
    * series exceeds `maxDays` (one size() compare per KEY — free next
    * to the collect_list it guards), otherwise passes the series
    * through unchanged. A raise, not a truncation: dropping days would
    * silently change every downstream prefix fold. */
  private def boundedSeries(series: Column, maxDays: Int,
                            op: String): Column =
    when(size(series) > maxDays, raise_error(concat(
      lit(s"TimeSeries.$op: key has "), size(series).cast("string"),
      lit(s" days > maxDays=$maxDays — the per-row prefix folds are " +
        "quadratic in day count; raise maxDays explicitly if the " +
        "calendar span is intended"))))
      .otherwise(series)

  private def qval(c: Column): Column =
    when(c < 0, raise_error(concat(
      lit("TimeSeries: negative value breaks cross-engine DIV parity "),
      lit("(Spark truncates, DuckDB floors) — got "), c.cast("string"))))
      .otherwise(floor(c * lit(1e6)).cast("long"))

  /** OHLC bars: one row per (key, bucket) with open/high/low/close,
    * observation count, and the quantized value sum (callers derive an
    * exact mean as `qsum DIV n`). Open/close tie-break is the unique
    * (tsCol, idCol) pair, so bar edges are deterministic under any row
    * order. One shuffle; partial aggregation does the heavy lifting
    * map-side. Output: (key, bucket, open, high, low, close, n, qsum).
    */
  def ohlcBars(df: DataFrame, keyCol: String, tsCol: String,
               idCol: String, valCol: String,
               bucket: Column): DataFrame =
    df.groupBy(col(keyCol).as("key"), bucket.as("bucket"))
      .agg(
        min(struct(col(tsCol), col(idCol), col(valCol))).as("_o"),
        max(struct(col(tsCol), col(idCol), col(valCol))).as("_c"),
        max(col(valCol)).as("high"),
        min(col(valCol)).as("low"),
        count(lit(1)).as("n"),
        sum(qval(col(valCol))).as("qsum"))
      .select(col("key"), col("bucket"),
        col(s"_o.$valCol").as("open"), col("high"), col("low"),
        col(s"_c.$valCol").as("close"), col("n"), col("qsum"))

  /** Regular-grid resample with forward fill: every key gets a row at
    * every grid step between the GLOBAL bounds, carrying the last
    * observed value at-or-before that step (null before a key's first
    * observation, flagged by `observed` at steps with a real reading).
    *
    * Two-phase shape: (1) last-observation-per-(key, step) — the one
    * aggregation over raw rows; (2) the dense grid is built from a
    * one-row bounds agg via `sequence()`, cross-joined against the
    * broadcast key dimension (tiny × tiny — never a data-row
    * cartesian), left-joined to the hourly lasts, and forward-filled.
    * The fill avoids engine-specific IGNORE NULLS: a running
    * `count(observed)` window assigns each gap run the index of the
    * observation that opened it, and `max(value)` over (key, run)
    * broadcasts that single observation across its run. Both windows
    * run over the (key × grid) table only.
    *
    * `step` e.g. `expr("INTERVAL 1 HOUR")`, with `trunc` the matching
    * bucket unit for `date_trunc` ("hour"). Output:
    * (key, grid_ts, value_ffill, observed). */
  def resampleFfill(df: DataFrame, keyCol: String, tsCol: String,
                    idCol: String, valCol: String,
                    trunc: String, step: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val obs = df.groupBy(col(keyCol).as("key"),
        date_trunc(trunc, col(tsCol)).as("grid_ts"))
      .agg(max(struct(col(tsCol), col(idCol), col(valCol))).as("_l"))
      .select(col("key"), col("grid_ts"), col(s"_l.$valCol").as("v_obs"))
    val bounds = df.agg(
      date_trunc(trunc, min(col(tsCol))).as("t0"),
      date_trunc(trunc, max(col(tsCol))).as("t1"))
    val grid = bounds.select(
      explode(sequence(col("t0"), col("t1"), step)).as("grid_ts"))
    val keys = df.select(col(keyCol).as("key")).distinct()
    val dense = grid.crossJoin(broadcast(keys))
      .join(obs, Seq("key", "grid_ts"), "left")
    val run = Window.partitionBy(col("key")).orderBy(col("grid_ts"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = dense
      .withColumn("_run", count(col("v_obs")).over(run))
    filled
      .withColumn("value_ffill",
        max(col("v_obs")).over(
          Window.partitionBy(col("key"), col("_run"))))
      .select(col("key"), col("grid_ts"), col("value_ffill"),
        col("v_obs").isNotNull.as("observed"))
  }

  /** Trailing moving aggregate over daily totals, kept exact: per
    * (key, day), the quantized value sum and count over the trailing
    * `windowDays`-day range — a RANGE frame on the integer day index
    * (days since `epoch`), so missing days correctly shrink the window
    * instead of stretching it (7 trailing DAYS, not 7 trailing rows).
    * The exact windowed mean is `win_qsum DIV win_n` — long floor
    * division, deterministic across engines. Raw rows are touched once
    * (the daily groupBy); the range-frame window runs over the tiny
    * (key × day) table only.
    * Output: (key, day, n_d, qsum_d, win_n, win_qsum, avg_q). */
  def movingDailyAgg(df: DataFrame, keyCol: String, tsCol: String,
                     valCol: String, epoch: String,
                     windowDays: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = df.groupBy(col(keyCol).as("key"),
        to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n_d"), sum(qval(col(valCol))).as("qsum_d"))
      .withColumn("x", datediff(col("day"), lit(epoch).cast("date"))
        .cast("long"))
    val w = Window.partitionBy(col("key")).orderBy(col("x"))
      .rangeBetween(-(windowDays - 1).toLong, 0L)
    daily
      .withColumn("win_n", sum(col("n_d")).over(w))
      .withColumn("win_qsum", sum(col("qsum_d")).over(w))
      .select(col("key"), col("day"), col("n_d"), col("qsum_d"),
        col("win_n"), col("win_qsum"),
        expr("win_qsum DIV win_n").as("avg_q"))
  }

  /** Regular-grid resample with LINEAR INTERPOLATION between the
    * bracketing observations, kept integer-exact for non-negative
    * values: at grid index x between observations (x₀,v₀) and (x₁,v₁)
    * (quantized longs, epoch-step indices),
    * `interp = (v₀·(x₁−x) + v₁·(x−x₀)) DIV (x₁−x₀)` — the weighted-
    * average form keeps every operand non-negative, where the naive
    * `v₀ + (v₁−v₀)·…` would hit the Spark-truncates/DuckDB-floors
    * divergence whenever the series falls.
    *
    * Same two-phase shape as [[resampleFfill]]: one aggregation over
    * raw rows, dense grid from the bounds agg × broadcast keys, then
    * TWO run-index windows (forward for the previous observation,
    * backward for the next — each run's single non-null row broadcasts
    * its value and grid index via per-run max), all over the
    * (key × grid) table. Rows before the first / after the last
    * observation hold the nearest endpoint; observed rows return their
    * own value exactly. Output: (key, grid_ts, vq, kind) with
    * kind ∈ obs | interp | hold. */
  def resampleInterp(df: DataFrame, keyCol: String, tsCol: String,
                     idCol: String, valCol: String,
                     trunc: String, step: Column,
                     stepMicros: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val obs = df.groupBy(col(keyCol).as("key"),
        date_trunc(trunc, col(tsCol)).as("grid_ts"))
      .agg(max(struct(col(tsCol), col(idCol), col(valCol))).as("_l"))
      .select(col("key"), col("grid_ts"),
        qval(col(s"_l.$valCol")).as("vq_obs"))
    val bounds = df.agg(
      date_trunc(trunc, min(col(tsCol))).as("t0"),
      date_trunc(trunc, max(col(tsCol))).as("t1"))
    val grid = bounds.select(
      explode(sequence(col("t0"), col("t1"), step)).as("grid_ts"))
    val keys = df.select(col(keyCol).as("key")).distinct()
    val dense = grid.crossJoin(broadcast(keys))
      .join(obs, Seq("key", "grid_ts"), "left")
      .withColumn("x", expr(s"unix_micros(grid_ts) DIV $stepMicros"))
    val fwd = Window.partitionBy(col("key")).orderBy(col("grid_ts"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bwd = Window.partitionBy(col("key")).orderBy(col("grid_ts").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ox = when(col("vq_obs").isNotNull, col("x"))
    val runs = dense
      .withColumn("_rf", count(col("vq_obs")).over(fwd))
      .withColumn("_rb", count(col("vq_obs")).over(bwd))
    val wf = Window.partitionBy(col("key"), col("_rf"))
    val wb = Window.partitionBy(col("key"), col("_rb"))
    runs
      .withColumn("pv", max(col("vq_obs")).over(wf))
      .withColumn("px", max(ox).over(wf))
      .withColumn("nv", max(col("vq_obs")).over(wb))
      .withColumn("nx", max(ox).over(wb))
      .select(col("key"), col("grid_ts"),
        when(col("vq_obs").isNotNull, col("vq_obs"))
          .when(col("pv").isNotNull && col("nv").isNotNull,
            expr("(pv * (nx - x) + nv * (x - px)) DIV (nx - px)"))
          .otherwise(coalesce(col("pv"), col("nv"))).as("vq"),
        when(col("vq_obs").isNotNull, lit("obs"))
          .when(col("pv").isNotNull && col("nv").isNotNull, lit("interp"))
          .otherwise(lit("hold")).as("kind"))
  }

  /** Day-of-week seasonality profile, kept exact: per (key, dow) the
    * observation count, quantized value sum, and exact floor-division
    * means — per-slot and all-week — so callers read the weekly shape
    * (weekend dip, Monday spike) as integer mean pairs without any
    * cross-engine division hazard. `dow` is 0=Monday computed as
    * (days since `epoch`) mod 7 with `epoch` pinned to a Monday —
    * Spark's dayofweek (Sun=1) and DuckDB's dayofweek (Sun=0) /
    * isodow (Mon=1) conventions never enter. One map-combinable
    * groupBy over raw rows; the all-week totals come from a window
    * over the tiny (key × 7) profile table.
    * Output: (key, dow, n, qsum, mean_q, all_mean_q). */
  def dowProfile(df: DataFrame, keyCol: String, tsCol: String,
                 valCol: String, mondayEpoch: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byDow = df.groupBy(col(keyCol).as("key"),
        pmod(datediff(to_date(col(tsCol)), lit(mondayEpoch).cast("date"))
          .cast("long"), lit(7L)).as("dow"))
      .agg(count(lit(1)).as("n"), sum(qval(col(valCol))).as("qsum"))
    val wk = Window.partitionBy(col("key")) // 7 rows per key
    byDow
      .withColumn("tot_n", sum(col("n")).over(wk))
      .withColumn("tot_q", sum(col("qsum")).over(wk))
      .select(col("key"), col("dow"), col("n"), col("qsum"),
        expr("qsum DIV n").as("mean_q"),
        expr("tot_q DIV tot_n").as("all_mean_q"))
  }

  /** Seasonal adjustment: each (key, day) total minus its day-of-week
    * mean — the residual series trend/anomaly detectors should consume
    * when weekly seasonality would otherwise dominate (a Sunday spike
    * is only a spike relative to SUNDAYS). The dow means are computed
    * over DAILY TOTALS (sum DIV count of that slot's days — non-negative
    * long DIV, engine-portable), broadcast back from the tiny key×7
    * profile; the residual is a pure integer subtraction (it goes
    * negative — no division ever touches it). Same engine-agnostic dow
    * arithmetic as [[dowProfile]] (days since a pinned Monday, mod 7).
    * Raw rows aggregate once. Output: (key, day, dow, yv, dow_mean_q,
    * resid_q). */
  def deseasonalize(df: DataFrame, keyCol: String, tsCol: String,
                    valCol: String, mondayEpoch: String): DataFrame = {
    val daily = df.groupBy(col(keyCol).as("key"),
        to_date(col(tsCol)).as("day"))
      .agg(sum(qval(col(valCol))).as("yv"))
      .withColumn("dow",
        pmod(datediff(col("day"), lit(mondayEpoch).cast("date"))
          .cast("long"), lit(7L)))
    val prof = daily.groupBy(col("key"), col("dow"))
      .agg(count(lit(1)).as("nd"), sum(col("yv")).as("qs"))
      .select(col("key"), col("dow"), expr("qs DIV nd").as("dow_mean_q"))
    daily.join(broadcast(prof), Seq("key", "dow"))
      .select(col("key"), col("day"), col("dow"), col("yv"),
        col("dow_mean_q"), (col("yv") - col("dow_mean_q")).as("resid_q"))
  }

  /** Per-key exponential smoothing of daily totals, kept exact: the
    * EWMA recurrence with α = 1/4 in pure long arithmetic —
    * s ← (3·s + x) DIV 4 — where every operand is non-negative, so
    * floor division and truncating division agree and the fold is
    * bit-identical across engines (a general `s + (x−s)/4` form would
    * diverge: Spark's DIV truncates toward zero, DuckDB's `//` floors,
    * and x−s goes negative). Seeded with the first day's value, folded
    * in ascending day order — the same index-order contract as the
    * dot-product kernels, so DuckDB's `list_reduce` replays it exactly.
    *
    * Scale shape: raw rows meet ONE map-combinable daily groupBy; the
    * fold then runs per key over its daily-total array, bounded by the
    * calendar span (thousands of entries at most), never by data
    * volume. The sort_array + aggregate HOF is CodegenFallback, but it
    * touches |keys|·|days| rows — a post-aggregation table.
    * Output: (key, n_days, last_day, ewma_q). */
  def ewmaDaily(df: DataFrame, keyCol: String, tsCol: String,
                valCol: String): DataFrame =
    df.groupBy(col(keyCol).as("key"), to_date(col(tsCol)).as("day"))
      .agg(sum(qval(col(valCol))).as("yv"))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n_days"), max(col("day")).as("last_day"),
        sort_array(collect_list(struct(col("day"), col("yv"))))
          .as("series"))
      .select(col("key"), col("n_days"), col("last_day"),
        aggregate(
          expr("slice(series, 2, greatest(size(series) - 1, 0))"),
          col("series").getItem(0).getField("yv"),
          // (3s + x) DIV 4 as a right shift — operands non-negative
          (acc, e) => shiftright(acc * 3 + e.getField("yv"), 2))
          .as("ewma_q"))

  /** EWMA-baseline anomaly flags over daily totals, kept exact: each
    * day's quantized total is compared against the integer EWMA
    * ([[ewmaDaily]]'s (3s+x) DIV 4 recurrence) of all PRIOR days, and
    * flagged when the deviation exceeds `thrNum/thrDen` of that
    * baseline — `thrDen·|x − s| > thrNum·s`, a pure integer
    * comparison, no division. The prefix EWMAs are per-row folds over
    * the per-key daily array (quadratic in days — the array is bounded
    * by the calendar span, thousands at most, and only ever built
    * post-aggregation; DuckDB replays the same slice-folds with
    * `list_slice` + `list_reduce`). Day one has no baseline and is
    * never flagged. The quadratic envelope is ENFORCED, not assumed:
    * a key whose day count exceeds `maxDays` raises in-plan (see
    * [[boundedSeries]]). Output: (key, day, yv, prev_ewma, anom). */
  def ewmaAnomalies(df: DataFrame, keyCol: String, tsCol: String,
                    valCol: String, thrNum: Long, thrDen: Long,
                    maxDays: Int = MaxFoldDays): DataFrame = {
    val fold = (acc: Column, e: Column) =>
      shiftright(acc * 3 + e.getField("yv"), 2)
    df.groupBy(col(keyCol).as("key"), to_date(col(tsCol)).as("day"))
      .agg(sum(qval(col(valCol))).as("yv"))
      .groupBy(col("key"))
      .agg(boundedSeries(
        sort_array(collect_list(struct(col("day"), col("yv")))),
        maxDays, "ewmaAnomalies").as("series"))
      .select(col("key"),
        posexplode(col("series")).as(Seq("i", "e")), col("series"))
      .withColumn("prev_ewma", when(col("i") >= 1,
        aggregate(expr("slice(series, 2, i - 1)"),
          col("series").getItem(0).getField("yv"), fold)))
      .select(col("key"), col("e.day").as("day"), col("e.yv").as("yv"),
        col("prev_ewma"),
        (col("prev_ewma").isNotNull &&
          abs(col("e.yv") - col("prev_ewma")) * lit(thrDen) >
            col("prev_ewma") * lit(thrNum)).as("anom"))
  }

  /** Two-sided integer CUSUM changepoint flags over daily totals (Page
    * 1954) — the level-shift detector the EWMA anomaly rule cannot
    * express: a single spike day resets, but a SUSTAINED drift
    * accumulates until the cumulative-sum statistic crosses the decision
    * interval. Offline form: reference μ = the key's whole-span integer
    * mean of quantized daily totals (sum DIV n — non-negative operands,
    * so Spark truncate ≡ DuckDB floor), slack κ = μ DIV `slackDen`,
    * decision interval h = μ·`hMul`. Per day i:
    *   s⁺ᵢ = max(0, s⁺ᵢ₋₁ + (yvᵢ − μ − κ))   (upward shifts)
    *   s⁻ᵢ = max(0, s⁻ᵢ₋₁ + (μ − κ − yvᵢ))   (downward shifts)
    * flagged when either side exceeds h. Pure integer add/compare — no
    * division inside the recurrence, nothing engine-specific; DuckDB
    * replays each prefix with a 0-seeded `list_reduce` (seed prepended —
    * its fold has no init parameter) and the spec replays it on the
    * driver. Per-row prefix folds are quadratic in the key's DAY COUNT
    * — bounded by calendar span, never by data volume, and only ever
    * run post-aggregation over the (key × day) table, the same cost
    * shape as [[ewmaAnomalies]] — and like it, the envelope is
    * ENFORCED via [[boundedSeries]] rather than assumed.
    * Output: (key, day, yv, mu, s_pos, s_neg, chg). */
  def cusumChangepoints(df: DataFrame, keyCol: String, tsCol: String,
                        valCol: String, slackDen: Long = 4L,
                        hMul: Long = 2L,
                        maxDays: Int = MaxFoldDays): DataFrame = {
    df.groupBy(col(keyCol).as("key"), to_date(col(tsCol)).as("day"))
      .agg(sum(qval(col(valCol))).as("yv"))
      .groupBy(col("key"))
      .agg(boundedSeries(
        sort_array(collect_list(struct(col("day"), col("yv")))),
        maxDays, "cusumChangepoints").as("series"),
        sum(col("yv")).as("sy"), count(lit(1)).as("n"))
      .withColumn("mu", expr("sy div n"))
      .withColumn("kap", expr(s"mu div $slackDen"))
      .select(col("key"), col("mu"), col("kap"),
        posexplode(col("series")).as(Seq("i", "e")), col("series"))
      .withColumn("s_pos",
        aggregate(expr("slice(series, 1, i + 1)"), lit(0L), (acc, e) =>
          greatest(lit(0L),
            acc + (e.getField("yv") - col("mu") - col("kap")))))
      .withColumn("s_neg",
        aggregate(expr("slice(series, 1, i + 1)"), lit(0L), (acc, e) =>
          greatest(lit(0L),
            acc + (col("mu") - col("kap") - e.getField("yv")))))
      .select(col("key"), col("e.day").as("day"), col("e.yv").as("yv"),
        col("mu"), col("s_pos"), col("s_neg"),
        (col("s_pos") > col("mu") * lit(hMul) ||
          col("s_neg") > col("mu") * lit(hMul)).as("chg"))
  }

  /** Autocorrelation of daily totals at lags 1..`maxLag`, exact — THE
    * seasonality detector (a weekly rhythm shows as an ACF peak at lag
    * 7) emitted as integer (numerator, denominator) pairs so no float
    * division ever runs: acf_k = Σx̃ₜ·x̃ₜ₊ₖ / Σx̃², with x̃ the daily
    * total CENTERED by the per-key integer mean (sum DIV n —
    * non-negative operands, portable). Centering is what keeps the
    * products in long range — and unlike the rest of the pack this op
    * quantizes to CENTS, not micro-units: the ACF consumes PRODUCTS of
    * residuals, so the quantum appears SQUARED — micro-unit residuals
    * (~10¹⁰ at sf0.01) already overflow 2⁶³ when squared, while cents
    * residuals square to ~10¹² and their sums stay far inside long up
    * to ~10⁴× this volume (beyond that, widen to DECIMAL(38,0) — one
    * cast). The ACF RATIO is quantum-invariant, so the coarser quantum
    * costs only sub-cent rounding. Lag pairing is a self-join of the (key, dayIndex) table on
    * dayIndex+k — the tiny post-aggregation table, never data rows; a
    * calendar GAP yields no pair at that lag (stated semantics — pairs
    * are day-distance k apart, not row-distance). Output: (key, lag,
    * n_pairs, cov_num, var_den). */
  def acfDaily(df: DataFrame, keyCol: String, tsCol: String,
               valCol: String, maxLag: Int, epoch: String): DataFrame = {
    val qcents = when(col(valCol) < 0, raise_error(concat(
      lit("TimeSeries: negative value breaks cross-engine DIV parity "),
      lit("(Spark truncates, DuckDB floors) — got "),
      col(valCol).cast("string"))))
      .otherwise(floor(col(valCol) * lit(1e2)).cast("long"))
    val daily = df.groupBy(col(keyCol).as("key"),
        to_date(col(tsCol)).as("day"))
      .agg(sum(qcents).as("yv"))
      .withColumn("x", datediff(col("day"), lit(epoch).cast("date"))
        .cast("long"))
    val centered = daily
      .join(broadcast(daily.groupBy(col("key"))
        .agg(expr("sum(yv) DIV count(1)").as("mu"))), Seq("key"))
      .select(col("key"), col("x"), (col("yv") - col("mu")).as("r"))
    val varDen = centered.groupBy(col("key"))
      .agg(sum(col("r") * col("r")).as("var_den"))
    val lags = df.sparkSession.range(1, maxLag.toLong + 1)
      .select(col("id").as("lag"))
    val b = centered.select(col("key").as("k2"), col("x").as("x2"),
      col("r").as("r2"))
    centered.crossJoin(broadcast(lags))
      .join(b, col("k2") === col("key") && col("x2") === col("x") + col("lag"))
      .groupBy(col("key"), col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("r") * col("r2")).as("cov_num"))
      .join(broadcast(varDen), Seq("key"))
      .select(col("key"), col("lag"), col("n_pairs"), col("cov_num"),
        col("var_den"))
  }

  /** Cross-metric covariance of two DAILY series per key, exact — the
    * elasticity read ("does revenue move with activity?") emitted as
    * integer rationals so no sqrt or float division ever runs: per
    * (key, day) the cents value total `a` and the event count `b`
    * aggregate from raw rows ONCE, both center by their per-key integer
    * means (sum DIV n — non-negative operands, engine-portable), and
    * the output is (n_days, cov_num = Σãb̃, var_a = Σã², var_b = Σb̃²)
    * — the consumer forms r = cov/√(var_a·var_b) if it wants the
    * normalized value; the SIGN and any cross-key comparison read
    * directly off the rationals. Same cents-not-micros quantum choice
    * as [[acfDaily]] (residual PRODUCTS square the quantum; cents keep
    * ~10¹² per-term magnitudes — far inside long at 10⁴× this volume,
    * beyond that widen to DECIMAL(38,0)). Residual products see
    * negative operands — multiplication only, never DIV (the
    * cross-engine hazard). Two aggregations over the tiny (key × day)
    * table after the one raw scan. Output: (key, n_days, cov_num,
    * var_a, var_b). */
  def xcorrDaily(df: DataFrame, keyCol: String, tsCol: String,
                 valCol: String): DataFrame = {
    val qcents = when(col(valCol) < 0, raise_error(concat(
      lit("TimeSeries: negative value breaks cross-engine DIV parity "),
      lit("(Spark truncates, DuckDB floors) — got "),
      col(valCol).cast("string"))))
      .otherwise(floor(col(valCol) * lit(1e2)).cast("long"))
    val daily = df.groupBy(col(keyCol).as("key"),
        to_date(col(tsCol)).as("day"))
      .agg(sum(qcents).as("a"), count(lit(1)).as("b"))
    val means = daily.groupBy(col("key"))
      .agg(count(lit(1)).as("n_days"),
        expr("sum(a) DIV count(1)").as("ma"),
        expr("sum(b) DIV count(1)").as("mb"))
    daily.join(broadcast(means), Seq("key"))
      .groupBy(col("key"), col("n_days"))
      .agg(sum((col("a") - col("ma")) * (col("b") - col("mb")))
          .as("cov_num"),
        sum((col("a") - col("ma")) * (col("a") - col("ma"))).as("var_a"),
        sum((col("b") - col("mb")) * (col("b") - col("mb"))).as("var_b"))
      .select(col("key"), col("n_days"), col("cov_num"), col("var_a"),
        col("var_b"))
  }

  /** Holt double-exponential smoothing (level + trend) of daily totals,
    * kept integer-exact — the one-step forecaster [[ewmaDaily]] cannot
    * be: EWMA's single state lags a trending series by construction;
    * Holt carries a trend term that closes the lag. α = β = 1/4 as
    * floor-shift recurrences over quantized totals:
    *   level′ = (3·(level + trend) + y) >> 2
    *   trend′ = (3·trend + (level′ − level)) >> 2
    * TREND (and the level′−level delta) go NEGATIVE on falling series,
    * where INTEGER DIVISION SIGN SEMANTICS are not portable (DuckDB's
    * `//` truncates in v1.0.0 but has floored in other releases) — so
    * every division here is an ARITHMETIC RIGHT SHIFT, floor by
    * construction on both engines (Spark `shiftright`, DuckDB `>>` —
    * both sign-preserving on signed 64-bit); no qval-style
    * non-negativity precondition needed. The fold state is a (level,
    * trend) STRUCT: Spark's `aggregate` takes any accumulator type, and
    * the oracle replays the same fold with `list_reduce` over
    * same-typed structs (its accumulator must match the element type —
    * day values ride in as {level: y, trend: 0} structs). Seeded
    * level₁ = y₁, trend₁ = 0, folded ascending; one pass over raw rows,
    * the fold over the bounded per-key daily array. Output: (key,
    * n_days, last_day, level_q, trend_q, forecast_q = level + trend).
    */
  def holtDaily(df: DataFrame, keyCol: String, tsCol: String,
                valCol: String): DataFrame =
    df.groupBy(col(keyCol).as("key"), to_date(col(tsCol)).as("day"))
      .agg(sum(qval(col(valCol))).as("yv"))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n_days"), max(col("day")).as("last_day"),
        sort_array(collect_list(struct(col("day"), col("yv"))))
          .as("series"))
      .withColumn("st",
        aggregate(
          expr("slice(series, 2, greatest(size(series) - 1, 0))"),
          struct(col("series").getItem(0).getField("yv").as("level"),
            lit(0L).as("trend")),
          (acc, e) => {
            val lvl2 = shiftright(
              (acc.getField("level") + acc.getField("trend")) * 3 +
                e.getField("yv"), 2)
            struct(lvl2.as("level"),
              shiftright(acc.getField("trend") * 3 +
                (lvl2 - acc.getField("level")), 2).as("trend"))
          }))
      .select(col("key"), col("n_days"), col("last_day"),
        col("st.level").as("level_q"), col("st.trend").as("trend_q"),
        (col("st.level") + col("st.trend")).as("forecast_q"))

  /** Mann-Kendall trend statistic over daily totals — the
    * NON-PARAMETRIC significance twin of [[trendSlope]]'s OLS line:
    * S = Σ_{i<j} sign(yvⱼ − yvᵢ) counts concordant minus discordant day
    * pairs, so a monotone drift pushes S toward ±n(n−1)/2 while noise
    * cancels — and because only SIGNS enter, S is outlier-immune and
    * trivially integer-exact (no products, no division, no variance
    * normalization — the z-score needs sqrt, which the determinism
    * contract bans; |S| against n(n−1)/2 is the scale-free strength
    * read, emitted as the pair). Pairing is a self-join on day order
    * over the post-aggregation (key × day) table — O(days²) pairs per
    * key, bounded by calendar span squared, never by data volume. Raw
    * rows are scanned once. Output: (key, n_days, s_stat, max_s,
    * trend ∈ up|down|flat). */
  def mkTrend(df: DataFrame, keyCol: String, tsCol: String,
              valCol: String): DataFrame = {
    val daily = df.groupBy(col(keyCol).as("key"),
        to_date(col(tsCol)).as("day"))
      .agg(sum(qval(col(valCol))).as("yv"))
    val b = daily.select(col("key").as("k2"), col("day").as("day2"),
      col("yv").as("yv2"))
    val pairs = daily.join(b,
        col("k2") === col("key") && col("day2") > col("day"))
      .select(col("key"),
        when(col("yv2") > col("yv"), 1L)
          .when(col("yv2") < col("yv"), -1L).otherwise(0L).as("sgn"))
    val nd = daily.groupBy(col("key")).agg(count(lit(1)).as("n_days"))
    pairs.groupBy(col("key")).agg(sum(col("sgn")).as("s_stat"))
      .join(nd, "key")
      .select(col("key"), col("n_days"), col("s_stat"),
        expr("n_days * (n_days - 1) DIV 2").as("max_s"),
        when(col("s_stat") > 0L, "up").when(col("s_stat") < 0L, "down")
          .otherwise("flat").as("trend"))
  }

  /** Per-key least-squares trend over per-bucket totals, kept exact:
    * regress the quantized per-day value total Y on the day index x
    * (days since `epoch`), and emit the OLS slope as an integer
    * numerator/denominator pair — slope = num/den, where
    * num = n·Σxy − Σx·Σy and den = n·Σx² − (Σx)² over the key's daily
    * rows. All arithmetic is long-integer on (day-index, quantized
    * daily total): x is bounded by the calendar span and n by span
    * days, so the products stay far inside long range at any SF this
    * engine benches (a deployment regressing decades of 100 TB days
    * would widen the sums to DECIMAL(38,0) — one cast, same plan).
    * Raw rows are touched once (the daily groupBy); the regression
    * itself runs over the tiny (key × day) table.
    * Output: (key, n_days, slope_num, slope_den). */
  def trendSlope(df: DataFrame, keyCol: String, tsCol: String,
                 valCol: String, epoch: String): DataFrame = {
    val daily = df.groupBy(col(keyCol).as("key"),
        to_date(col(tsCol)).as("day"))
      .agg(sum(qval(col(valCol))).as("yv"))
      .withColumn("x", datediff(col("day"), lit(epoch).cast("date"))
        .cast("long"))
    daily.groupBy(col("key"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("x") * col("yv")).as("sxy"),
        sum(col("x")).as("sx"),
        sum(col("yv")).as("sy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("key"), col("n_days"),
        (col("n_days") * col("sxy") - col("sx") * col("sy"))
          .as("slope_num"),
        (col("n_days") * col("sxx") - col("sx") * col("sx"))
          .as("slope_den"))
  }

  /** Theil–Sen robust trend: the median of all pairwise daily slopes
    * per key, kept exactly replayable across engines. Each pair
    * (i < j) of the key's daily rows yields the rational slope
    * num/den = (yv_j − yv_i)/(x_j − x_i) with den > 0; the median is
    * selected under the TOTAL ORDER
    * (floor(num·2²⁰ / den), num, den) — the first component is the
    * slope floor-scaled to 2⁻²⁰ micro-units/day, exact long integer on
    * both engines (floor division emulated as
    * `(a − pmod(a, den)) DIV den`, which is exact because the
    * numerator is made divisible first — sidestepping the
    * truncate-vs-floor divergence on negative numerators), so two
    * rationals can tie on it only when they differ by < 2⁻²⁰, in which
    * case the (num, den) lexicographic tail makes the pick
    * deterministic. The lower median (rank ⌈P/2⌉ of P pairs) is taken.
    *
    * Scale: raw rows are touched once (the daily groupBy); the pair
    * self-join and the per-key ranking window run over the
    * calendar-bounded (key × day) table — P = O(days²) pairs per key,
    * never data-volume-bound. An in-plan guard raises when
    * |num| ≥ 2⁴², the point where the 2²⁰ shift could overflow long
    * (daily quantized totals would need to exceed ~4·10¹² micro-units,
    * ~250× this engine's sf0.1 reality).
    * Output: (key, n_days, n_pairs, slope_num, slope_den,
    * slope_scaled) with slope = slope_num/slope_den and
    * slope_scaled = floor(slope_num·2²⁰/slope_den). */
  def theilSen(df: DataFrame, keyCol: String, tsCol: String,
               valCol: String, epoch: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = df.groupBy(col(keyCol).as("key"),
        to_date(col(tsCol)).as("day"))
      .agg(sum(qval(col(valCol))).as("yv"))
      .withColumn("x", datediff(col("day"), lit(epoch).cast("date"))
        .cast("long"))
    val b = daily.select(col("key").as("k2"), col("x").as("x2"),
      col("yv").as("yv2"))
    val guarded = when(abs(col("yv2") - col("yv")) >= lit(1L << 42),
      raise_error(lit("TimeSeries.theilSen: |slope numerator| >= 2^42 " +
        "— the 2^20 median-order shift would overflow long; rescale " +
        "the value quantum"))).otherwise(col("yv2") - col("yv"))
    val pairs = daily.join(b,
        col("k2") === col("key") && col("x2") > col("x"))
      .select(col("key"), guarded.as("num"),
        (col("x2") - col("x")).as("den"))
      .withColumn("sh", col("num") * lit(1L << 20))
      // exact floor division: subtract the non-negative remainder
      // first, so truncating DIV equals mathematical floor on both
      // engines regardless of num's sign
      .withColumn("skey",
        expr("(sh - pmod(sh, den)) DIV den"))
    val nd = daily.groupBy(col("key")).agg(count(lit(1)).as("n_days"))
    val wRank = Window.partitionBy(col("key"))
      .orderBy(col("skey"), col("num"), col("den"))
    val ranked = pairs
      .withColumn("rk", row_number().over(wRank))
      .withColumn("n_pairs",
        count(lit(1)).over(Window.partitionBy(col("key"))))
    ranked.filter(col("rk") === expr("(n_pairs + 1) DIV 2"))
      .join(nd, "key")
      .select(col("key"), col("n_days"), col("n_pairs"),
        col("num").as("slope_num"), col("den").as("slope_den"),
        col("skey").as("slope_scaled"))
  }

  /** Forecast-BASELINE evaluation (the M-competition discipline: a
    * forecaster that cannot beat naive baselines is not a forecaster):
    * per key, over the newest `evalDays` days, the total absolute error
    * of the LAST-VALUE naive forecast (ŷ(d) = y(d−1)) vs the
    * SEASONAL-naive forecast (ŷ(d) = y(d−season)) — the two baselines
    * every published forecast eval reports, and the cheapest seasonality
    * detector there is (snaive < naive ⇔ the weekly pattern carries more
    * signal than yesterday). All integer: quantized daily sums, ABS
    * differences, BIGINT totals — no division, no float (`sae` = summed
    * absolute error; MAE's ranking is identical because both share the
    * denominator). Eval days whose d−1 or d−season total is absent drop
    * via the inner joins (stated: both engines replay the same rule).
    *
    * Scale shape: ONE aggregation of the raw stream to (key × day)
    * rows; the two lag lookups are equi-joins of that tiny table against
    * itself SHIFTED (date_add on the lag side — never a window sort over
    * raw rows), the per-key max-day frame broadcasts. The daily rollup
    * is checkpointed: three lineage forks would otherwise re-aggregate
    * the raw stream three times. Output: (key, n_eval, sae_naive_q,
    * sae_snaive_q, snaive_better). */
  def naiveBaselineEval(df: DataFrame, keyCol: String, tsCol: String,
                        valCol: String, season: Int,
                        evalDays: Int): DataFrame = {
    require(season >= 1 && evalDays >= 1,
      s"season and evalDays must be positive: $season, $evalDays")
    val daily = df
      .groupBy(col(keyCol).as("key"), to_date(col(tsCol)).as("day"))
      .agg(sum(qval(col(valCol))).as("yv"))
      .localCheckpoint() // read four times: eval days + 2 lags + max-day
    try {
      val maxd = broadcast(daily.groupBy(col("key"))
        .agg(max(col("day")).as("maxd")))
      val lag1 = daily.select(col("key"),
        date_add(col("day"), 1).as("day"), col("yv").as("yv_lag1"))
      val lagS = daily.select(col("key"),
        date_add(col("day"), season).as("day"), col("yv").as("yv_lag_s"))
      daily.join(lag1, Seq("key", "day"))
        .join(lagS, Seq("key", "day"))
        .join(maxd, "key")
        .filter(col("day") > date_sub(col("maxd"), evalDays))
        .groupBy(col("key"))
        .agg(count(lit(1)).as("n_eval"),
          sum(abs(col("yv") - col("yv_lag1"))).as("sae_naive_q"),
          sum(abs(col("yv") - col("yv_lag_s"))).as("sae_snaive_q"))
        .withColumn("snaive_better",
          col("sae_snaive_q") < col("sae_naive_q"))
        .localCheckpoint() // tiny per-key result outlives daily's release
    } finally Checkpoints.release(daily)
  }
}
