"""Full-suite runner: one pytest process PER TEST FILE, serially.

The complete suite in ONE process has never been reliable on the
1-core build host (NOTES.md round 3+): hundreds of accumulated
XLA:CPU executables eventually destabilize in-process compilation
(deterministic late-suite failures that every per-file run passes).
The validated full-suite methodology since round 3 is serial
per-file — this script codifies it.

Usage:
    python tools/run_suite.py [-k FILTER] [--fast]

Prints one line per file and a final summary; exit code 0 iff every
file passed. --fast adds -m "not slow" (the fast tier, which IS
stable as a single process — kept per-file here anyway for symmetry).
"""

from __future__ import annotations

import argparse
import glob
import os
import subprocess
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-k", default="", help="only files matching")
    ap.add_argument("--fast", action="store_true",
                    help='add -m "not slow"')
    args = ap.parse_args(argv)

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = sorted(glob.glob(os.path.join(root, "tests", "test_*.py")))
    if args.k:
        files = [f for f in files if args.k in os.path.basename(f)]
    results, t_all = [], time.monotonic()
    for f in files:
        name = os.path.basename(f)
        cmd = [sys.executable, "-m", "pytest", f, "-q",
               "--no-header", "-p", "no:cacheprovider"]
        if args.fast:
            cmd += ["-m", "not slow"]
        t0 = time.monotonic()
        r = subprocess.run(cmd, cwd=root, capture_output=True,
                           text=True)
        dt = time.monotonic() - t0
        tail = [ln for ln in r.stdout.strip().splitlines() if ln]
        summary = tail[-1] if tail else "(no output)"
        ok = r.returncode == 0 or "no tests ran" in summary
        results.append((name, ok, r.returncode, dt, summary))
        print(f"{'ok ' if ok else 'FAIL'} {name:36s} {dt:7.1f}s  "
              f"{summary}", flush=True)
        if not ok and r.returncode >= 128:
            print(r.stdout[-2000:], file=sys.stderr)

    bad = [r for r in results if not r[1]]
    print(f"\n{len(results) - len(bad)}/{len(results)} files passed "
          f"in {time.monotonic() - t_all:.0f}s")
    for name, _, rc, _, summary in bad:
        print(f"  FAIL {name} (rc={rc}): {summary}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
