package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Bench.shouldRetime]] — the contention self-defense decision —
  * against the exact blind spot the r10 driver artifact exposed: a query
  * uniformly slow in BOTH passes passes the steady-vs-cold and
  * 1.5×-median triggers and lands in the artifact unchallenged. The
  * cross-round prior (committed [[BenchPrior]] steady) is the anchor
  * that catches it. */
class BenchSpec extends AnyFunSuite {

  test("r10 blind spot: j12-shaped slowdown (slow in BOTH passes) is " +
    "caught ONLY by the 3x-prior trigger") {
    // the literal r10 driver numbers: cold 25.6, steady 16.7, in-run
    // median ~0.6, committed prior 1.19 — old rule never re-timed it
    val cold = 25.6; val steady = 16.7; val med = 0.6
    assert(!Bench.shouldRetime(cold, steady, med, None),
      "without a prior the old heuristics accept it (the blind spot)")
    assert(Bench.shouldRetime(cold, steady, med, Some(1.19)),
      "3x committed prior must catch it")
  }

  test("in-run trigger fires on steady above BOTH cold and 1.5x the " +
    "median base (max semantics — OR would negate the blind spot above)") {
    assert(Bench.shouldRetime(cold = 1.0, steady = 1.2, medBase = 0.5,
      prior = None), "steady above cold and above 1.5x base")
    assert(Bench.shouldRetime(cold = 2.0, steady = 3.5, medBase = 2.0,
      prior = None), "steady 3.5 > max(2.0, 3.0)")
    // steady below cold is NOT an in-run trigger by itself: that is the
    // j12 shape, which only the prior catches (main loop still grants
    // one extra retry when steady > cold, outside shouldRetime)
    assert(!Bench.shouldRetime(cold = 10.0, steady = 9.0, medBase = 2.0,
      prior = None), "slow in both passes: accepted without a prior")
    assert(!Bench.shouldRetime(cold = 10.0, steady = 2.9, medBase = 2.0,
      prior = None), "within both envelopes: accepted")
  }

  test("prior trigger is an absolute floor, not a substitute: a query " +
    "within 3x its prior but over the in-run envelope still re-times; " +
    "one within every envelope does not") {
    assert(Bench.shouldRetime(cold = 0.4, steady = 0.9, medBase = 0.5,
      prior = Some(0.8)), "in-run trigger independent of prior")
    assert(!Bench.shouldRetime(cold = 1.0, steady = 0.9, medBase = 0.7,
      prior = Some(0.5)), "0.9 < 3x0.5 and below cold: accepted")
  }

  test("stage order: the compact tail line prints BEFORE any incremental/" +
    "scaling leg (a timeout kill mid-scaling still tails into per-query " +
    "data) AND re-emits as the true last line (r11: rc=124 zeroed the " +
    "whole artifact)") {
    val so = Bench.stageOrder
    assert(so.head == "compact_early", so.toString)
    assert(so.indexOf("compact_early") < so.indexOf("incremental"))
    assert(so.indexOf("compact_early") < so.indexOf("scaling"))
    assert(so.last == "compact_final", so.toString)
    // main (the full JSON line / bench_full.json write) stays before the
    // final compact line — the last-line contract of the driver capture
    assert(so.indexOf("main") == so.size - 2)
  }

  test("budget guard: legs run while seconds remain at leg START; the " +
    "rest are dropped BY NAME (loud, never silent), and a zero budget " +
    "drops everything") {
    var clock = 0.0
    val ran = scala.collection.mutable.ListBuffer[String]()
    def leg(name: String, cost: Double) =
      name -> (() => { ran += name; clock += cost; name })
    val legs = Seq(leg("a", 10), leg("b", 10), leg("c", 10))
    val (done, dropped) = Bench.runWithBudget(legs, () => 15.0 - clock)
    assert(done.map(_._1) == Seq("a", "b"), done.toString) // b STARTS at 10<15
    assert(dropped == Seq("c"), dropped.toString)
    assert(ran.toList == List("a", "b"))
    val (d2, drop2) = Bench.runWithBudget(legs, () => 0.0)
    assert(d2.isEmpty && drop2 == Seq("a", "b", "c"))
  }

  test("compact line schema: byte-compatible with the r10 contract on a " +
    "healthy run; dropped_legs appears ONLY when legs were dropped") {
    val slow = Seq("q1" -> 1.5, "q2" -> 0.25)
    val healthy = Bench.compactLine(263, 204.428, slow, Seq.empty)
    assert(healthy ==
      """{"n_queries":263,"steady_total":204.428,"slowest":{"q1":1.500,"q2":0.250}}""",
      healthy)
    val degraded = Bench.compactLine(2, 3.0, slow, Seq("lsh_curve", "trgm_curve"))
    assert(degraded.contains(""""dropped_legs":["lsh_curve","trgm_curve"]"""),
      degraded)
    assert(degraded.endsWith("""}}"""), "slowest stays the closing field")
  }

  test("scaling leg order: newest-evidence-first (r12: the budget drop " +
    "consumed the two newest index families' only independent scaling " +
    "evidence) — corpus writes lead, mining precedes its edge-set " +
    "consumers, legacy absorbers (graph, j12, bm25) close the list") {
    val lo = Bench.scalingLegOrder
    assert(lo.take(2) == Seq("corpus", "corpus_link"), lo.toString)
    // r15: the feature-store curve is the newest evidence — it rides
    // right behind the corpus writes (its own events-only dirs are
    // written inside the leg, each write budget-checked)
    assert(lo.indexOf("pit_curve") == 2, lo.toString)
    // r16: the interval-join family rides the pit dirs, so it must run
    // AFTER pit_curve (which writes them) and stays near the front as
    // the round's newest evidence
    assert(lo.indexOf("intervals_curve") == 3, lo.toString)
    // the two legs the r12 driver run dropped run right after the corpus
    assert(lo.indexOf("trgm_curve") < lo.indexOf("mining"), lo.toString)
    assert(lo.indexOf("lsh_curve") < lo.indexOf("mining"), lo.toString)
    // mining prices the memoized edge set BEFORE perquery
    // (dedup_clusters_incremental) and the graph rows consume it
    assert(lo.indexOf("mining") < lo.indexOf("perquery"), lo.toString)
    assert(lo.indexOf("mining") < lo.indexOf("graph"), lo.toString)
    // dedup_minhash_pairs (perquery) — the r12 contention-cliff question
    // — runs before the expensive linkage legs so a drop never eats it
    assert(lo.indexOf("perquery") < lo.indexOf("linkage_j17"), lo.toString)
    // long-stable legacy rows absorb any drop; the spill probe closes
    // the list (r16): it deliberately saturates execution memory, so
    // running it LAST means it cannot contaminate any law leg, and a
    // budget drop costs a diagnostic, never a law
    assert(lo.takeRight(4) == Seq("graph", "linkage_j12", "bm25_curve",
      "spill_probe"), lo.toString)
  }

  test("bench_exempt contrast arms: every exempt query stays GRADED " +
    "(still in SparkEntry.queries with an oracleSql twin), its timed " +
    "replacement evidence exists (sampled twin / scaling leg), and the " +
    "sampled arms themselves are never exempt") {
    val ex = Bench.benchExempt
    assert(ex == Set("eval_neardup_pr", "eval_snm_recall",
      "j14_entity_dual"), ex.toString)
    ex.foreach { q =>
      assert(SparkEntry.queries.contains(q), s"$q dropped from grading")
      assert(SparkEntry.oracleSql.contains(q), s"$q lost its oracle twin")
    }
    // the timed replacements: sampled twins stay in the timed pass...
    Seq("eval_neardup_pr_sampled", "eval_snm_recall_sampled").foreach { q =>
      assert(SparkEntry.queries.contains(q) && !ex(q), q)
    }
    // ...and the j14-vs-j17 law comparison stays in the scaling block
    assert(Bench.scalingLegOrder.contains("linkage_j14"),
      "exempting j14 steady must not retire its scaling leg")
    assert(Bench.scalingLegOrder.contains("linkage_j17"))
  }

  test("ShuffleTally: a shuffling job accrues write bytes; a narrow job " +
    "accrues none (the load-immune volume twin the scaling rows emit " +
    "as <row>_shuf_mb)") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    val tally = new Bench.ShuffleTally
    spark.sparkContext.addSparkListener(tally)
    // the same poll-stabilize discipline Bench.main uses: stabilize on
    // the monotone TASK-END count, not on bytes (r15 ADVICE: bytes
    // starts at 0, so two 0==0 reads before the groupBy's async events
    // deliver would exit early under load — a flaky false failure, and
    // it contradicted the taskEnds discipline the production drain
    // documents), then read bytes once stable
    def drain(): Long = {
      var prev = tally.taskEnds.get(); var stable = 0; var waited = 0
      while (stable < 2 && waited < 4000) {
        Thread.sleep(50); waited += 50
        val cur = tally.taskEnds.get()
        if (cur == prev) stable += 1 else { stable = 0; prev = cur }
      }
      tally.bytes.get()
    }
    (1 to 10000).toDF("x")
      .groupBy((org.apache.spark.sql.functions.col("x") % 7).as("k"))
      .count().collect()
    val afterShuffle = drain()
    assert(afterShuffle > 0L, "a groupBy must write shuffle bytes")
    (1 to 1000).toDF("y")
      .select(org.apache.spark.sql.functions.col("y") * 2).collect()
    assert(drain() == afterShuffle,
      "a narrow map job must not move the shuffle tally")
    assert(tally.spilled.get() == 0L,
      "tiny in-memory jobs must not spill (the artifact's spill_mb field)")
    // r16 (steady_shuf_mb map): volume is the load-immune per-query
    // signal precisely because the SAME plan over the SAME data writes
    // the SAME bytes — pin that determinism at the tally level: two
    // runs of one shuffling query produce byte-identical drained
    // deltas. The frame is REBUILT per run (a def, exactly like the
    // bench re-invoking the registered query fn): re-collecting one
    // DataFrame instance would skip the map stage off its still-live
    // shuffle files and measure 0.
    def q = (1 to 20000).toDF("x")
      .groupBy((org.apache.spark.sql.functions.col("x") % 97).as("k"))
      .agg(org.apache.spark.sql.functions.sum("x"))
    val base = drain()
    q.collect()
    val d1 = drain() - base
    q.collect()
    val d2 = drain() - base - d1
    assert(d1 > 0L, "the volume query must shuffle")
    assert(d1 == d2,
      s"same plan + same data must shuffle identical bytes: $d1 vs $d2")
  }

  test("BenchPrior.scaling is the committed scaling block (artifact of " +
    "record, full curve incl. the corpus-write rows); non-timing rows " +
    "excluded; the minhash-cliff anchor present") {
    val sc = BenchPrior.scaling
    assert(sc.size == 25, sc.size.toString)
    // r16: the interval family is anchored (w19 full curve). j18 was
    // trimmed to x4 through r17; r18 extends it to x10 (verdict item 3:
    // the checkpoint volume trade needs an x10 bytes-per-pair bound) —
    // this committed prior still predates that run, so x4 is the top
    // anchored point; the round-close regen flips the x10 assert below.
    assert(sc("w19_peak_concurrency").contains("x10"))
    assert(sc("j18_session_overlap").contains("x4"))
    // r15: the feature-store curve + its corpus-write row are anchored
    assert(sc("j19_pit_features").contains("x10") &&
      sc.contains("scale_corpus_write_pit"))
    assert(!sc.contains("cc_rounds") && !sc.contains("j14_suffix_block_rows") &&
      !sc.contains("j14_split_suffix_len"),
      "counts/lengths are not seconds — retrying on them would be meaningless")
    // the r12-cliff property: the contended driver number (50.268 s)
    // must trip the 3x trigger against any clean-box committed anchor
    val mh = sc("dedup_minhash_pairs")("x20")
    assert(mh > 1.0 && mh < 12.0 && 50.268 > 3.0 * mh, mh.toString)
    // the two legs missing from the r12 DRIVER artifact stay anchored
    assert(sc.contains("search_substring_indexed_serve") &&
      sc.contains("lsh_rebuild"))
    // the corpus writes are priced (and retry-anchored) since r13
    assert(sc.contains("scale_corpus_write"))
    // linkage priors: j17 (the linear-law production arm) carries the
    // x10 top scale; j14 (the quadratic contrast arm) tops out at x4
    // since r14 — its x10 point was the single priciest bench row
    // (60.4 s committed / 88.8 s driver) and the blocking-law crossover
    // is already visible at x4
    assert(sc("j17_entity_symdel").contains("x10"))
    assert(sc("j14_entity_dual").contains("x4") &&
      !sc("j14_entity_dual").contains("x10"),
      "the j14 x10 point must stay retired (budget insurance)")
    // r16: j12 (the single-pass contrast arm to j15_snm_multipass) got
    // the same trim — its superlinear windowed-pair law is visible at
    // x4; the x20 point was the block's second-priciest row
    assert(sc("j12_entity_resolve").contains("x4") &&
      !sc("j12_entity_resolve").contains("x20"),
      "the j12 x20 point must stay retired (budget insurance)")
    // r16 spill-probe rows never anchor a retry
    assert(!sc.contains("spill_probe") && !sc.contains("spill_probe_sec") &&
      !sc.contains("spill_probe_capacity_mb"),
      "probe diagnostics are not retry anchors")
  }

  test("BenchPrior resource is the committed r16-close steady map: 292 " +
    "entries (295 graded minus the 3 bench-exempt contrast arms), " +
    "median in the committed envelope, j12 prior present") {
    assert(BenchPrior.steady.size == 292, BenchPrior.steady.size.toString)
    assert(Bench.benchExempt.forall(q => !BenchPrior.steady.contains(q)),
      "exempt arms must not anchor a retime trigger they never run")
    assert(BenchPrior.median > 0.1 && BenchPrior.median < 2.0,
      BenchPrior.median.toString)
    assert(BenchPrior.steady.contains("j12_entity_resolve"))
    // the anchor property: median base can only tighten, never loosen,
    // the trigger vs a load-inflated in-run median
    val inflatedMed = BenchPrior.median * 1.23 // r10's observed multiplier
    assert(math.max(inflatedMed, BenchPrior.median) == inflatedMed &&
      math.max(0.1, BenchPrior.median) == BenchPrior.median)
  }
}
