package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declarative data-quality verification — the Deequ idea (Schelter et al.,
  * "Automating large-scale data quality verification", VLDB 2018)
  * re-expressed as plain Spark aggregation, under this engine's
  * integer-determinism contract.
  *
  * A suite is a list of [[Check]]s against ONE table. Every check
  * contributes one aggregate expression, and the whole suite evaluates in a
  * SINGLE pass over the table: one `agg(...)` producing one row of metrics,
  * unpivoted to per-check rows with `stack`. At 100 TB the table scan IS
  * the cost — N checks must not mean N scans, and here they never do.
  * Uniqueness checks add `count(DISTINCT col)` aggregates (Catalyst plans
  * the multi-distinct via one Expand — still a single scan, one extra
  * shuffle). Cross-table referential checks are separate left-anti-join
  * counts (the dimension side broadcasts when small) unioned into the same
  * report schema.
  *
  * All observed metrics are LONG (fractions as parts-per-million via
  * integer floor division, bounds on quantized `floor(x·100)` values), so a
  * second engine computing the same report hash-matches bit for bit.
  *
  * Report schema: `(table_name, check_name, col_name, observed, threshold,
  * cmp, passed)` — `passed = observed >= threshold` when `cmp = ">="`,
  * `observed <= threshold` when `cmp = "<="`.
  *
  * The reference has no verification surface (its ingest trusts the wire
  * JSON — src/priceUpdater.py:61-118 parses and inserts unchecked); this is
  * a SURVEY §8 pipeline extension: the admission gate a 100 TB corpus
  * build runs before a snapshot is published.
  */
object DataQuality {

  /** Fractional metrics are parts-per-million longs. */
  val Ppm = 1000000L

  /** One declarative constraint: `metricSql` is an AGGREGATE SQL expression
    * over the table yielding a LONG; the check passes iff
    * `observed cmp threshold`. */
  sealed trait Check {
    def name: String
    def column: String
    def metricSql: String
    def threshold: Long
    def cmp: String // ">=" | "<="
  }

  /** Fraction of rows with `column` non-null, in ppm (floor). */
  final case class Completeness(column: String, minPpm: Long = Ppm) extends Check {
    val name = "completeness"
    def metricSql = s"count($column) * $Ppm DIV count(1)"
    def threshold = minPpm
    def cmp = ">="
  }

  /** Distinct values per non-null value, in ppm (floor) — `Ppm` means the
    * column is a key. NULLs are excluded from both sides. */
  final case class Uniqueness(column: String, minPpm: Long = Ppm) extends Check {
    val name = "uniqueness"
    def metricSql = s"count(DISTINCT $column) * $Ppm DIV count($column)"
    def threshold = minPpm
    def cmp = ">="
  }

  /** Fraction of rows whose `column` is one of `allowed`, in ppm. */
  final case class InSet(column: String, allowed: Seq[String],
                         minPpm: Long = Ppm) extends Check {
    val name = "in_set"
    private def lits = allowed.map(v => s"'${v.replace("'", "''")}'").mkString(", ")
    def metricSql = s"count(CASE WHEN $column IN ($lits) THEN 1 END) * $Ppm DIV count(1)"
    def threshold = minPpm
    def cmp = ">="
  }

  /** Lower bound on `min(floor(column·100))` (cents-quantized doubles;
    * pass the threshold in the same ×100 units). */
  final case class MinBound(column: String, lo: Long) extends Check {
    val name = "min_bound"
    def metricSql = s"min(CAST(FLOOR($column * 1e2) AS BIGINT))"
    def threshold = lo
    def cmp = ">="
  }

  /** Upper bound on `max(floor(column·100))`. */
  final case class MaxBound(column: String, hi: Long) extends Check {
    val name = "max_bound"
    def metricSql = s"max(CAST(FLOOR($column * 1e2) AS BIGINT))"
    def threshold = hi
    def cmp = "<="
  }

  /** Evaluate all `checks` against `df` in one aggregation pass.
    * One row per check, report schema as documented on the object. */
  def suite(tableName: String, df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "empty check suite")
    val metrics = checks.zipWithIndex.map { case (c, i) => expr(c.metricSql).as(s"m$i") }
    val oneRow = df.agg(metrics.head, metrics.tail: _*)
    val stackArgs = checks.zipWithIndex.map { case (c, i) =>
      s"'${c.name}', '${c.column}', m$i, CAST(${c.threshold} AS BIGINT), '${c.cmp}'"
    }.mkString(", ")
    oneRow
      .selectExpr(s"stack(${checks.size}, $stackArgs) AS " +
        "(check_name, col_name, observed, threshold, cmp)")
      .select(lit(tableName).as("table_name"), col("check_name"), col("col_name"),
        col("observed"), col("threshold"), col("cmp"))
      .withColumn("passed",
        when(col("cmp") === ">=", col("observed") >= col("threshold"))
          .otherwise(col("observed") <= col("threshold")))
  }

  /** Referential-integrity check: count of `child` rows whose `childKey`
    * has no match in `parent.parentKey` (orphans; a NULL child key counts
    * as an orphan — it references nothing). One left-anti join: the parent
    * side broadcasts when small, otherwise a shuffled semi-join — never a
    * cartesian. Passes iff the orphan count is 0. */
  def referential(tableName: String, child: DataFrame, childKey: String,
                  parent: DataFrame, parentKey: String): DataFrame =
    child.select(col(childKey))
      .join(parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("observed"))
      .select(lit(tableName).as("table_name"),
        lit("referential").as("check_name"), lit(childKey).as("col_name"),
        col("observed"), lit(0L).as("threshold"), lit("<=").as("cmp"),
        (col("observed") <= 0L).as("passed"))

  /** Sequence-continuity check: the missing runs ("gaps") of an integer
    * id column — the completeness diagnostic a dense-id ingest runs to
    * prove nothing was dropped. The textbook gaps-and-islands query is a
    * `lead() OVER (ORDER BY id)` — a single-partition global sort, dead
    * at scale. Two-phase instead:
    *
    *  1. ids hash into fixed `blockSize` blocks; a `lead` window runs
    *     WITHIN each block (narrow (block, id) rows, partitioned
    *     shuffle) → intra-block gaps;
    *  2. per-block (min, max) summary — |ids|/blockSize rows — takes ONE
    *     tiny global window for the bridge gaps between consecutive
    *     non-empty blocks (entirely-missing blocks are spanned by their
    *     neighbors' bridge). The only global sort in the plan runs over
    *     the block summary, never over data rows — the
    *     [[Relational.madOutliers]] histogram discipline.
    *
    * Every consecutive-present pair is either intra-block or a bridge,
    * so the union equals the naive formulation row for row. Duplicate
    * ids collapse first. Output: (gap_start, gap_end, n_missing),
    * gaps strictly inside [min(id), max(id)]. */
  def idGaps(df: DataFrame, idCol: String, blockSize: Long = 4096L): DataFrame = {
    require(blockSize > 0, s"blockSize must be positive: $blockSize")
    import org.apache.spark.sql.expressions.Window
    val ids = df.select(col(idCol).cast("long").as("id")).distinct()
      .withColumn("b", expr(s"id DIV $blockSize"))
    val wIn = Window.partitionBy(col("b")).orderBy(col("id"))
    val intra = ids.withColumn("nxt", lead(col("id"), 1).over(wIn))
      .filter(col("nxt") > col("id") + 1L)
    val summary = ids.groupBy(col("b"))
      .agg(min(col("id")).as("mn"), max(col("id")).as("mx"))
    val wB = Window.orderBy(col("b")) // tiny: one row per non-empty block
    val bridge = summary.withColumn("nxt_mn", lead(col("mn"), 1).over(wB))
      .filter(col("nxt_mn") > col("mx") + 1L)
      .select(col("mx").as("id"), col("nxt_mn").as("nxt"))
    intra.select(col("id"), col("nxt")).unionAll(bridge)
      .select((col("id") + 1L).as("gap_start"), (col("nxt") - 1L).as("gap_end"),
        (col("nxt") - col("id") - 1L).as("n_missing"))
  }

  /** Union per-table suites + referential checks into one ordered report
    * (total order: (table_name, check_name, col_name) is unique by
    * construction — one check instance per (table, kind, column)). */
  def report(parts: Seq[DataFrame]): DataFrame =
    parts.reduce(_.unionAll(_))
      .orderBy(col("table_name"), col("check_name"), col("col_name"))

  /** Categorical distribution drift between two cohorts of one table,
    * kept integer-exact: per key value, the total-variation-distance
    * contribution scaled by 2·N₁·N₂ — `contrib = |c₁·N₂ − c₂·N₁|`, so
    * TVD = Σcontrib / (2·N₁·N₂) without this operator ever dividing.
    * (PSI/KL need logs, which the determinism contract bans; TVD is
    * the rational-arithmetic drift measure, and ½Σ|p−q| bounds it.)
    *
    * One scan: a single `groupBy(key)` with conditional counts for
    * both cohorts (map-side combinable — a key appearing only in one
    * cohort simply counts 0 in the other, which is the full-outer-join
    * semantics without a join). Totals come from a one-row agg over
    * the tiny per-key table, cross-joined back via broadcast. At
    * 100 TB the cost is the one scan; everything after is |keys| rows.
    * Output: (key, c1, c2, contrib). */
  /** First-significant-digit Benford conformance report — the classic
    * fabricated-numbers screen (Benford 1938; Nigrini's forensic
    * accounting standard): naturally-occurring multiplicative amounts
    * lead with digit d at frequency log₁₀(1+1/d); uniform or hand-typed
    * values don't. The nine expected frequencies are FIXED INTEGER ppm
    * CONSTANTS (⌊log₁₀(1+1/d)·10⁶⌋ — literals on both engines, so the
    * banned runtime log never executes), the observed share is the
    * non-negative `n_d·10⁶ DIV N`, and the flag is a pure integer
    * threshold on |deviation|. The digit comes from the QUANTIZED
    * integer amount's decimal string (first char of cents — identical
    * string rendering of a BIGINT in any engine; never a double
    * format). One scan groups by digit (≤9 result rows, map-side
    * combinable); a broadcast 9-row frame restores absent digits with
    * n=0. Output: (digit, n, obs_ppm, benford_ppm, dev_ppm, flag). */
  val BenfordPpm: Seq[(Int, Long)] = Seq(
    1 -> 301029L, 2 -> 176091L, 3 -> 124938L, 4 -> 96910L, 5 -> 79181L,
    6 -> 66946L, 7 -> 57991L, 8 -> 51152L, 9 -> 45757L)

  def benfordReport(df: DataFrame, centsCol: Column,
                    flagPpm: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val expected = BenfordPpm.toDF("digit", "benford_ppm")
      .select(col("digit").cast("long").as("digit"), col("benford_ppm"))
    // Precondition cents >= 1, enforced IN-PLAN on both engines (the
    // oracle carries the matching error() guard): a zero amount has no
    // 1-9 leading digit (its row would silently vanish from the digit
    // join while the oracle's total kept it — denominator drift), and a
    // negative amount's leading char is '-', which DuckDB refuses to
    // CAST while Spark nulls. Either way the screen's answer would be
    // wrong or divergent, so the first offending row raises loudly.
    val guarded = when(centsCol < 1L, raise_error(concat(
        lit("benfordReport: cents < 1 breaks the first-digit screen "),
        lit("(no 1-9 leading digit) — got "), centsCol.cast("string"))))
      .otherwise(centsCol)
    val obs = df
      .select(substring(guarded.cast("string"), 1, 1)
        .cast("long").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    // the corpus total is a window over the ≤9-row digit histogram —
    // never a second scan of the fact table (a positive integer's
    // leading digit is always 1-9, so the joined frame holds every row)
    import org.apache.spark.sql.expressions.Window
    broadcast(expected)
      .join(obs, Seq("digit"), "left")
      .na.fill(0L, Seq("n"))
      .withColumn("total", sum(col("n")).over(Window.partitionBy()))
      .select(col("digit"), col("n"),
        expr("n * 1000000 DIV total").as("obs_ppm"), col("benford_ppm"))
      .withColumn("dev_ppm", col("obs_ppm") - col("benford_ppm"))
      .withColumn("flag", abs(col("dev_ppm")) > flagPpm)
  }

  def distributionDrift(df: DataFrame, keyCol: String,
                        inCohort1: Column): DataFrame = {
    val perKey = df.groupBy(col(keyCol).as("key"))
      .agg(count(when(inCohort1, lit(1))).as("c1"),
        count(when(!inCohort1, lit(1))).as("c2"))
    val totals = perKey.agg(sum(col("c1")).cast("long").as("n1"),
      sum(col("c2")).cast("long").as("n2"))
    perKey.crossJoin(broadcast(totals))
      .select(col("key"), col("c1"), col("c2"),
        abs(col("c1") * col("n2") - col("c2") * col("n1")).as("contrib"))
  }

  /** Hash-partition skew diagnosis — the "would this partitioning hold at
    * 1000×" read, measured instead of guessed: bucket every row by
    * `polyHash(key) pmod nBuckets` (the engine's portable hash, so a
    * second engine replays the assignment bit for bit) and report, per
    * bucket, the row count, the distinct-key count, the integer-ppm share
    * of all rows, and a `hot` verdict — bucket exceeds `hotNum/hotDen`
    * times its fair share `total/nBuckets`, decided by the
    * cross-multiplied comparison `n_rows·nBuckets·hotDen > hotNum·total`
    * (no division ever happens).
    * The pair (n_rows, n_keys) separates the two skew diseases: many rows
    * over ONE key (salting territory — no partitioner fixes a single hot
    * key) vs many keys colliding (more partitions fix it). ONE scan: a
    * map-side-combinable (bucket, key) pre-aggregation then a bucket
    * rollup — output is nBuckets rows however large the table. Empty
    * buckets are absent (stated; the fair-share compare uses nBuckets,
    * not the observed bucket count). */
  def partitionSkew(df: DataFrame, keyCol: Column, nBuckets: Int,
                    hotNum: Long = 2L, hotDen: Long = 1L): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1: $nBuckets")
    require(hotNum > 0 && hotDen > 0, "hot threshold must be positive")
    val perKey = df
      .select(pmod(Dedup.polyHash(keyCol.cast("string")),
        lit(nBuckets.toLong)).as("bucket"), keyCol.cast("string").as("k"))
      .groupBy(col("bucket"), col("k")).agg(count(lit(1)).as("n"))
    val perBucket = perKey.groupBy(col("bucket"))
      .agg(sum(col("n")).as("n_rows"), count(lit(1)).as("n_keys"))
    val total = perBucket.agg(sum(col("n_rows")).as("total"))
    perBucket.crossJoin(broadcast(total))
      .select(col("bucket"), col("n_rows"), col("n_keys"),
        expr(s"n_rows * $Ppm DIV total").as("share_ppm"),
        (col("n_rows") * lit(nBuckets.toLong) * lit(hotDen) >
          lit(hotNum) * col("total")).as("hot"))
  }

  /** Categorical-independence deviation report — the chi-square question
    * ("does dim2's distribution depend on dim1?") with the statistic
    * decomposed into per-cell integer evidence instead of one
    * libm-burdened number: for every (dim1, dim2) cell, the observed
    * count, both marginal totals, dim2's share WITHIN the dim1 row
    * (`obs·10⁶ DIV row_total`), dim2's GLOBAL share
    * (`col_total·10⁶ DIV total`), their difference, and a flag when the
    * absolute deviation exceeds `thresholdPpm`. Under independence every
    * dev_ppm is ~0; a flagged cell names exactly which combination
    * misbehaves (the actionable form — a scalar chi² says only "
    * something does"). Shares never multiply counts by counts, so the
    * arithmetic stays in long range to ~9·10¹² rows. ONE data scan: the
    * cell aggregation; marginals re-aggregate the |dim1|·|dim2| cell
    * frame (tiny by construction — categorical dims), joined back
    * broadcast. */
  def independenceReport(df: DataFrame, dim1: Column, dim2: Column,
                         thresholdPpm: Long): DataFrame = {
    require(thresholdPpm >= 0, s"thresholdPpm must be >= 0: $thresholdPpm")
    val cells = df.select(dim1.as("d1"), dim2.as("d2"))
      .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("obs"))
      .localCheckpoint() // tiny; read three more times for the marginals
    try {
      val rt = cells.groupBy(col("d1")).agg(sum(col("obs")).as("row_total"))
      val ct = cells.groupBy(col("d2")).agg(sum(col("obs")).as("col_total"))
      val t = cells.agg(sum(col("obs")).as("total"))
      cells.join(broadcast(rt), "d1").join(broadcast(ct), "d2")
        .crossJoin(broadcast(t))
        .select(col("d1"), col("d2"), col("obs"), col("row_total"),
          col("col_total"),
          expr(s"obs * $Ppm DIV row_total").as("within_ppm"),
          expr(s"col_total * $Ppm DIV total").as("global_ppm"))
        .withColumn("dev_ppm", col("within_ppm") - col("global_ppm"))
        .withColumn("flagged", abs(col("dev_ppm")) > lit(thresholdPpm))
        .localCheckpoint() // materialize so the cell blocks can release
    } finally {
      Checkpoints.release(cells)
    }
  }

  /** Golden-record survivorship: merge each resolved entity cluster into
    * one record under stated, deterministic rules. Input is the members
    * frame (rep, cid, c_name, c_nationkey, c_acctbal, c_mktsegment)
    * where `rep` is the cluster representative (min member id from the
    * CC closure — stable under any merge order). Rules: name and nation
    * survive from the representative row; balance is the cluster max (a
    * pick, no arithmetic); segment is the cluster MODE with the
    * (count desc, segment desc) tie-break — `max(struct(cnt, seg))`,
    * the same total order an oracle states as `row_number() OVER
    * (ORDER BY cnt DESC, seg DESC) = 1`. Two groupBys over the members
    * table and one join back to the representative rows — no window
    * over data rows, shuffle keyed on `rep` throughout.
    * Output: (entity_rep, n_members, golden_name, rep_nation,
    * max_acctbal, mode_segment). */
  def survivorship(members: DataFrame): DataFrame = {
    val segMode = members.groupBy(col("rep"), col("c_mktsegment"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("rep"))
      .agg(max(struct(col("cnt"), col("c_mktsegment"))).as("mx"))
      .select(col("rep"), col("mx.c_mktsegment").as("mode_segment"))
    members.groupBy(col("rep"))
      .agg(count(lit(1)).as("n_members"),
        max(col("c_acctbal")).as("max_acctbal"))
      .join(segMode, "rep")
      .join(members.filter(col("cid") === col("rep"))
        .select(col("rep"), col("c_name").as("golden_name"),
          col("c_nationkey").as("rep_nation")), "rep")
      .select(col("rep").as("entity_rep"), col("n_members"),
        col("golden_name"), col("rep_nation"), col("max_acctbal"),
        col("mode_segment"))
  }
}
