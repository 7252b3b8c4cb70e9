#!/usr/bin/env python3
"""Regenerate src/main/scala/graft/BenchPrior.scala from a committed
bench_full.json (the BUILDER's run of record, never the driver's
possibly-contended artifact).

Usage: python3 tools/bench_prior.py bench_full.json "r13 close run note"

Emits both the per-query STEADY map (anchors the per-query contention
self-defense) and the SCALING point map (anchors the scaling legs'
>3x-prior retry). Non-timing scaling rows (counts/lengths, not seconds)
are excluded -- retrying on them would be meaningless.
"""
import json
import sys

NON_TIMING_ROWS = {"cc_rounds", "j14_suffix_block_rows", "j14_split_suffix_len",
                   # spill_probe rows are a memory-boundary diagnostic
                   # (spilled MB / capacity / probe times) -- retrying a
                   # probe on a prior anchor would be meaningless
                   "spill_probe", "spill_probe_sec", "spill_probe_capacity_mb",
                   "spill_probe_capacity_ub_mb"}

def main() -> None:
    artifact, note = sys.argv[1], sys.argv[2]
    d = json.load(open(artifact))
    steady = dict(sorted(d["steady"].items()))
    # *_shuf_mb rows are shuffle VOLUME (deterministic, load-immune) —
    # not seconds; retrying on them would be meaningless, like cc_rounds
    # `_true_pairs` twins (r17) are untimed per-dir pair COUNTS — like
    # `_shuf_mb` they are laws beside the time rows, not seconds
    scaling = {k: v for k, v in d["scaling"].items()
               if k not in NON_TIMING_ROWS and not k.endswith("_shuf_mb")
               and not k.endswith("_true_pairs")}
    sf = d["sf"]

    steady_lines = ",\n".join(f'    "{k}" -> {v}' for k, v in steady.items())
    scaling_lines = ",\n".join(
        '    "%s" -> Map(%s)' % (k, ", ".join(f'"{x}" -> {t}' for x, t in v.items()))
        for k, v in scaling.items())

    out = f'''package graft

/** Committed prior-round per-query STEADY times (seconds, sf0.1) — the
  * cross-round anchor for [[Bench]]'s contention self-defense. r10's
  * driver artifact exposed the blind spot this closes: a query slow in
  * BOTH passes (j12_entity_resolve 25.6 s cold / 16.7 s steady vs 1.19 s
  * committed) sails past the steady-vs-cold and 1.5×-in-run-median
  * triggers, because under sustained load the in-run median inflates
  * with the suite. Two uses: (1) any steady > 3× its committed prior is
  * re-timed regardless of the in-run heuristics; (2) the prior MEDIAN
  * anchors the 1.5× base (max(in-run, prior)), so load cannot dilate the
  * trigger. Regenerated each round via `tools/bench_prior.py` from the
  * BUILDER's committed bench_full.json (builder run of record, never the
  * driver's possibly-contended artifact); only consulted when benching
  * the same SF dir the prior was measured at.
  *
  * Source artifact: {note}. */
object BenchPrior {{
  val sfDir: String = "{sf}"
  val steady: Map[String, Double] = Map(
{steady_lines}
  )
  val median: Double = {{
    val v = steady.values.toSeq.sorted
    v(v.size / 2)
  }}

  /** Committed prior-round SCALING points (seconds; row -> x-factor ->
    * time), same artifact of record as [[steady]]. Anchors the scaling
    * legs' contention retry (r12 verdict task #2: the driver box timed
    * dedup_minhash_pairs x20 at 50.3 s vs 4.07 s committed — a 12×
    * leg-specific cliff the per-query re-timing machinery never
    * protected scaling legs from; any point > 3× its committed prior
    * re-times, best-of kept, attempts recorded in `scaling_retimed`).
    * Non-timing rows (cc_rounds, the j14 block-size/split rows) are
    * excluded — they are counts, not seconds. */
  val scaling: Map[String, Map[String, Double]] = Map(
{scaling_lines})
}}
'''
    with open("src/main/scala/graft/BenchPrior.scala", "w") as f:
        f.write(out)
    print(f"BenchPrior.scala: {len(steady)} steady entries, "
          f"{len(scaling)} scaling rows from {artifact}")

if __name__ == "__main__":
    main()
