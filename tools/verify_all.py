#!/usr/bin/env python3
"""One-command full correctness grade at EVERY scale the driver grades —
the r10 lesson ("sf0.01-green can hide scale-only oracle divergence")
promoted from a checklist practice to a tool (r13 verdict task #7).

For each data dir: runs the Spark dump (graft.Verify) then the DuckDB
compare (tools/check.py), and fails loudly — nonzero exit + a per-dir
summary — if ANY query fails at ANY scale. Usage:

    python3 tools/verify_all.py [--no-cache] [dir ...]

Defaults to /root/testdata/sf0.01 AND /root/testdata/sf0.1 (the two
scales the round-close gate requires). The oracle side is CACHED by
default (check.py --cache: >10 min cold at sf0.1, seconds warm;
invalidation is structural — testdata fingerprint, DuckDB version,
compare-logic source hash). --no-cache makes a clean-room fresh
re-grade a first-class invocation (r15 ADVICE: opting out used to
require deleting $GRAFT_ORACLE_CACHE out-of-band). Per-dir check wall
time is printed so the warm-vs-cold cost of the gate is in the round
notes, not folklore.
"""
import os
import subprocess
import sys
import time

def main():
    args = [a for a in sys.argv[1:] if a != "--no-cache"]
    cache_flag = [] if "--no-cache" in sys.argv[1:] else ["--cache"]
    dirs = args or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    results = []
    for d in dirs:
        tag = os.path.basename(d.rstrip("/"))
        out = f"/tmp/verify_all_{tag}"
        print(f"== {d} -> {out}", flush=True)
        dump = subprocess.run(
            ["sbt", "-batch", f"runMain graft.Verify {d} {out}"],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        if dump.returncode != 0:
            results.append((d, dump.returncode,
                            f"Verify dump failed rc={dump.returncode}"))
            continue
        # cached by default: oracle results memoized by (testdata
        # fingerprint, SQL) — the sf0.1 DuckDB pass is >10 min cold,
        # seconds warm; a testdata regeneration or compare-logic edit
        # invalidates loudly (check.py prints ORACLE CACHE INVALIDATED
        # and re-runs everything fresh). --no-cache bypasses it.
        t0 = time.monotonic()
        check = subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(__file__), "check.py")]
            + cache_flag + [d, out],
            capture_output=True, text=True)
        check_secs = time.monotonic() - t0
        tail = (check.stdout.strip().splitlines() or ["<no output>"])[-1]
        tail += f" [check {check_secs:.1f}s{' cached' if cache_flag else ''}]"
        fails = [l for l in check.stdout.splitlines() if l.startswith("FAIL")]
        # PASS is check.py's return code, recorded verbatim — never a
        # string match on the summary line (a format drift to "10 fail"
        # must not read as PASS).
        results.append((d, check.returncode,
                        tail if check.returncode == 0
                        else tail + " | " + "; ".join(fails[:5])))
        for line in fails:
            print(line, flush=True)
        print(f"== {d}: rc={check.returncode} {tail}", flush=True)
    print("\n==== verify_all summary")
    bad = False
    for d, rc, r in results:
        ok = rc == 0
        bad |= not ok
        print(f"{'PASS' if ok else 'FAIL'} {d} (rc={rc}): {r}")
    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    main()
