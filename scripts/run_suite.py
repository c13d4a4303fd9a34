#!/usr/bin/env python
"""Run the FULL test suite in ONE process and record the result.

VERDICT r4 #6: the full-suite one-process run is the stability gate the
r3 segfault hid behind; keep consecutive green runs visible in-repo.
Appends a line to SUITE_LOG.md: date, pass/fail counts, wall time, HEAD.

Usage: python scripts/run_suite.py        (from the repo root)
"""
import datetime
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    env = dict(os.environ, PYTHONPATH="")
    t0 = time.time()
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-q"],
        cwd=REPO, env=env, capture_output=True, text=True)
    dt = time.time() - t0
    tail = "\n".join(out.stdout.splitlines()[-5:])
    print(tail)
    m = re.search(r"(\d+) passed", out.stdout)
    passed = int(m.group(1)) if m else 0
    failed = sum(int(x) for x in re.findall(r"(\d+) (?:failed|error)",
                                            out.stdout))
    head = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                          cwd=REPO, capture_output=True,
                          text=True).stdout.strip()
    date = datetime.date.today().isoformat()
    status = "GREEN" if (out.returncode == 0 and failed == 0) else "RED"
    line = (f"| {date} | {head} | {status} | {passed} passed"
            f"{f' / {failed} failed' if failed else ''} | {dt:.0f}s |\n")
    log = os.path.join(REPO, "SUITE_LOG.md")
    if not os.path.exists(log):
        with open(log, "w") as f:
            f.write("# Full-suite one-process runs (scripts/run_suite.py)"
                    "\n\n| date | HEAD | status | result | wall |\n"
                    "|---|---|---|---|---|\n")
    with open(log, "a") as f:
        f.write(line)
    print(line.strip())
    return out.returncode


if __name__ == "__main__":
    sys.exit(main())
