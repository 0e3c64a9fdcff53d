#!/usr/bin/env python
"""Round gate: the three end-of-round checks, one command, quotable output.

VERDICT r3 #5: the reference-differential oracle (``pytest -m xslow`` —
it diffs this framework's exports against the actual reference code in
``/root/reference``) is the build's strongest parity evidence, but after
moving to the xslow tier nothing institutionalized running it; it could
rot silently between rounds.  This script makes the end-of-round ritual
a single command whose output the final commit message quotes verbatim:

  1. driver checks (``tools/preflight.py``: bench.py + dryrun_multichip
     under the driver's kill-window semantics, + cache health),
  2. the default test suite (``pytest -q``, fast tier),
  3. the xslow reference-differential oracle (``pytest -m xslow``).

Each gate prints ``[gate] <name>: PASS/FAIL wall=<s>`` plus the evidence
line (bench JSON / pass counts).  Exit 0 iff all three pass.

Env:  GATE_SKIP_PREFLIGHT=1 / GATE_SKIP_SUITE=1 / GATE_SKIP_XSLOW=1
      (for partial reruns; the final round commit must quote all three)
      GATE_SUITE_TIMEOUT (default 3600), GATE_XSLOW_TIMEOUT (default 1800)
"""

import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_gate(name: str, cmd, timeout: float):
    t0 = time.perf_counter()
    try:
        p = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                           timeout=timeout)
        rc, out = p.returncode, p.stdout + p.stderr
    except subprocess.TimeoutExpired as e:
        rc = 124
        out = ((e.stdout or b"").decode(errors="replace")
               if isinstance(e.stdout, bytes) else (e.stdout or ""))
    wall = time.perf_counter() - t0
    return rc, out, wall


def main() -> int:
    results = []

    if os.environ.get("GATE_SKIP_PREFLIGHT") != "1":
        rc, out, wall = run_gate(
            "preflight", [sys.executable, "tools/preflight.py"], 2400)
        ok = rc == 0
        results.append(("preflight(driver-checks+cache)", ok, wall))
        print(f"[gate] preflight: {'PASS' if ok else 'FAIL'} "
              f"wall={wall:.0f}s")
        for line in out.splitlines():
            if line.startswith("[preflight]"):
                print(f"[gate]   {line}")

    if os.environ.get("GATE_SKIP_SUITE") != "1":
        rc, out, wall = run_gate(
            "suite", [sys.executable, "-m", "pytest", "tests/", "-q",
                      "--no-header", "-p", "no:cacheprovider"],
            float(os.environ.get("GATE_SUITE_TIMEOUT", "3600")))
        tail = [ln for ln in out.strip().splitlines()
                if re.search(r"\d+ (passed|failed|error)", ln)]
        ok = rc == 0
        results.append(("default suite", ok, wall))
        print(f"[gate] suite: {'PASS' if ok else 'FAIL'} wall={wall:.0f}s"
              f" | {tail[-1].strip() if tail else '(no summary)'}")

    if os.environ.get("GATE_SKIP_XSLOW") != "1":
        rc, out, wall = run_gate(
            "xslow", [sys.executable, "-m", "pytest", "tests/", "-q",
                      "--no-header", "-p", "no:cacheprovider",
                      "-m", "xslow"],
            float(os.environ.get("GATE_XSLOW_TIMEOUT", "1800")))
        tail = [ln for ln in out.strip().splitlines()
                if re.search(r"\d+ (passed|failed|error)", ln)]
        ok = rc == 0
        results.append(("xslow reference-differential oracle", ok, wall))
        print(f"[gate] xslow: {'PASS' if ok else 'FAIL'} wall={wall:.0f}s"
              f" | {tail[-1].strip() if tail else '(no summary)'}")

    all_ok = all(ok for _, ok, _ in results)
    print(f"[gate] {'ALL GATES PASS' if all_ok else 'GATE FAILURE'}")
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main())
