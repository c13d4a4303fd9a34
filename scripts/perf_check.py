"""Perf-regression tripwire: compare a fresh bench.py run against the most
recent driver-recorded BENCH_r*.json and fail loudly on a >10% drop.

Run this BEFORE committing anything that touches renderer/ or ops/ (see
CLAUDE.md).  r2 shipped three days of commits on top of a 31% regression to
the one number the driver records (VERDICT r2 Weak #1) — this exists so
that cannot happen again.

Usage:
    python scripts/perf_check.py            # runs bench.py on the chip
    python scripts/perf_check.py 385.2      # check a number you already have
    python scripts/perf_check.py --secondary vpt,bdpt
        # re-measure those scripts/bench_all.py rows on the chip and diff
        # them against the committed BENCH_SECONDARY.json ledger (>10%
        # slower fails; run the rows a renderer/ops change could touch —
        # r3 shipped its biggest BDPT rewrite unmeasured, VERDICT r3 #3)
Exit status 0 = ok, 1 = regression, 2 = no baseline found.
"""
import glob
import json
import os
import re
import subprocess
import sys

TOLERANCE = 0.10

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def check_secondary(rows):
    """Re-run the given bench_all rows and diff vs BENCH_SECONDARY.json.

    All secondary metrics are time-per-spp (lower is better)."""
    path = os.path.join(REPO, "BENCH_SECONDARY.json")
    try:
        with open(path) as f:
            ledger = json.load(f)
    except OSError:
        print("perf_check: no BENCH_SECONDARY.json ledger", file=sys.stderr)
        return 2
    env = dict(os.environ, ROWS=rows)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "bench_all.py")],
        capture_output=True, text=True, check=True, env=env)
    fresh = None
    for line in out.stdout.splitlines():
        if line.strip().startswith("{"):
            try:
                parsed = json.loads(line)
            except json.JSONDecodeError:
                continue  # progress/log line that happens to start with {
            if isinstance(parsed, dict):
                fresh = parsed
    if not fresh:
        raise RuntimeError(f"no JSON in bench_all output:\n{out.stdout}")
    rc = 0
    for k, v in fresh.items():
        base = ledger.get(k)
        if base is None:
            print(f"perf_check: {k}={v} (no ledger row — add it)")
            continue
        ceil = base * (1.0 + TOLERANCE)
        verdict = "OK" if v <= ceil else "REGRESSION"
        print(f"perf_check: {k} fresh={v} ledger={base} ceil={ceil:.3f}"
              f" -> {verdict}")
        if v > ceil:
            rc = 1
    if rc:
        print("perf_check: FAIL — secondary regression; bisect before "
              "committing (or re-record the ledger with WRITE=1 if the "
              "change is a justified tradeoff, and say so in the commit).",
              file=sys.stderr)
    return rc


def last_recorded():
    """(value, path) from the highest-numbered BENCH_r*.json."""
    best = None
    for p in glob.glob(os.path.join(REPO, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        if not m:
            continue
        try:
            with open(p) as f:
                doc = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        # the driver wraps bench.py's line under "parsed"; accept both
        val = doc.get("value", doc.get("parsed", {}).get("value"))
        if val is None:
            continue
        rnd = int(m.group(1))
        if best is None or rnd > best[0]:
            best = (rnd, float(val), p)
    return best


def fresh_value():
    out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                         capture_output=True, text=True, check=True)
    # bench.py prints exactly one JSON line on stdout
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            return float(json.loads(line)["value"])
    raise RuntimeError(f"no JSON line in bench.py output:\n{out.stdout}")


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--secondary":
        rows = sys.argv[2] if len(sys.argv) > 2 else "vpt,bdpt"
        return check_secondary(rows)
    base = last_recorded()
    if base is None:
        print("perf_check: no BENCH_r*.json baseline found", file=sys.stderr)
        return 2
    rnd, base_val, path = base
    if len(sys.argv) > 1:
        val = float(sys.argv[1])
    else:
        val = fresh_value()
    floor = base_val * (1.0 - TOLERANCE)
    verdict = "OK" if val >= floor else "REGRESSION"
    print(f"perf_check: fresh={val:.1f} baseline={base_val:.1f} "
          f"(round {rnd}, {os.path.basename(path)}) floor={floor:.1f} "
          f"-> {verdict}")
    if val < floor:
        print(f"perf_check: FAIL — {100 * (1 - val / base_val):.1f}% below "
              f"the last recorded round. Bisect before committing.",
              file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
