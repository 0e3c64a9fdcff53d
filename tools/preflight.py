#!/usr/bin/env python
"""Preflight: run the two driver checks under the driver's own timeout.

Round 2's failure mode was "everything works, nothing recorded": both
driver artifacts (`BENCH_r02.json`, `MULTICHIP_r02.json`) were rc=124
kills because the checks, while correct, outlived the driver's ~10-minute
window (VERDICT round 2 §missing-1).  This script reproduces the driver's
semantics exactly — `timeout <window> python bench.py` and
`timeout <window> python -c "import __graft_entry__ as g;
g.dryrun_multichip(8)"` — and prints pass/fail + wall time for each, so
"the driver will record evidence" is itself a checked claim before every
end-of-round commit.

Exit code 0 iff both checks pass inside the window.

It also prints a CACHE-HEALTH line (VERDICT r3 #3b): the committed
``.jax_cache``'s entry count + size against a documented bound, an
execute check of a cached CPU executable (the cache was compiled on a
host with ``+prefer-no-gather/scatter``; XLA warns the mismatch "could
lead to execution errors such as SIGILL" on every load — this check
makes "it works on this host" a *checked* claim: a SIGILL crashes the
probe subprocess and fails preflight), and — unless
``PREFLIGHT_SKIP_COLD=1`` — a TIMED cache-bypass compile of the dryrun
trainer, so "cold still fits the window" is measured, not hoped.

Env:  PREFLIGHT_WINDOW   driver kill window in seconds (default 480 —
                         tighter than the observed ~600 s for margin)
      PREFLIGHT_SKIP_BENCH=1 / PREFLIGHT_SKIP_DRYRUN=1 to run one only
      PREFLIGHT_SKIP_COLD=1    skip the timed cache-bypass compile
"""

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE_DIR = os.path.join(REPO, ".jax_cache")
# Documented bounds (r5 split — VERDICT r4 weak #5b: the old single
# bound measured the whole directory, so running the gates it serves
# pushed it OVER BOUND: the driver's dryrun writes a ~593 MB CPU
# flagship executable and an xslow run adds ~1 GB of ViT A/B entries,
# all legitimately UNTRACKED per-container scratch).
#   * TRACKED entries (git ls-files — the committed warm hit-set of the
#     driver checks + default suite, tools/cache_audit.py):
CACHE_MAX_MB = 260.0
CACHE_MAX_ENTRIES = 900   # r4: sub-second init jits are cached too
#                           (~300 few-KB entries that cut ~2 min of
#                           remote round-trips per bench/CLI start)
#   * UNTRACKED scratch (gitignored churn written by gate/driver runs in
#     this container; never ships).  Bound is a leak detector, sized for
#     one dryrun executable + one xslow cycle + margin:
CACHE_SCRATCH_MAX_MB = 4000.0


def run_check(name: str, cmd: list, window: float) -> dict:
    t0 = time.perf_counter()
    try:
        proc = subprocess.run(cmd, cwd=REPO, capture_output=True,
                              text=True, timeout=window)
        rc, out, err = proc.returncode, proc.stdout, proc.stderr
    except subprocess.TimeoutExpired as e:
        rc = 124
        out = (e.stdout or b"").decode() if isinstance(e.stdout, bytes) \
            else (e.stdout or "")
        err = (e.stderr or b"").decode() if isinstance(e.stderr, bytes) \
            else (e.stderr or "")
    wall = time.perf_counter() - t0

    # bench contract: last stdout line is one JSON object with a
    # non-null "value"; dryrun contract: stdout ends with "OK"
    parsed = None
    for line in reversed(out.strip().splitlines() or [""]):
        try:
            parsed = json.loads(line)
            break
        except ValueError:
            continue
    ok = rc == 0
    if name == "bench":
        ok = ok and parsed is not None and parsed.get("value") is not None
    else:
        ok = ok and "OK" in out

    return {"name": name, "ok": ok, "rc": rc, "wall_s": round(wall, 1),
            "parsed": parsed,
            "tail": (err.strip().splitlines() or [""])[-1][:200]}


def cache_health(window: float) -> bool:
    """The committed compile cache as a checked claim, not a hope.

    TRACKED entries (the shipped warm set) and UNTRACKED scratch (churn
    this container's gate/driver runs wrote) are bounded SEPARATELY, so
    running the gates no longer invalidates the health line they print
    (VERDICT r4 weak #5b: one dryrun + one xslow cycle legitimately
    writes ~1.6 GB of gitignored scratch)."""
    try:
        p = subprocess.run(["git", "ls-files", ".jax_cache"], cwd=REPO,
                           capture_output=True, text=True, timeout=30)
        tracked = {os.path.basename(f) for f in p.stdout.split()}
    except (OSError, subprocess.TimeoutExpired):
        tracked = set()
    files = [f for f in os.listdir(CACHE_DIR)
             if os.path.isfile(os.path.join(CACHE_DIR, f))] \
        if os.path.isdir(CACHE_DIR) else []
    t_files = [f for f in files if f in tracked]
    u_files = [f for f in files if f not in tracked]
    t_mb = sum(os.path.getsize(os.path.join(CACHE_DIR, f))
               for f in t_files) / 1e6
    u_mb = sum(os.path.getsize(os.path.join(CACHE_DIR, f))
               for f in u_files) / 1e6
    bound_ok = (t_mb <= CACHE_MAX_MB and len(t_files) <= CACHE_MAX_ENTRIES
                and u_mb <= CACHE_SCRATCH_MAX_MB)
    print(f"[preflight] cache-health: tracked {len(t_files)} entries / "
          f"{t_mb:.1f} MB (bound {CACHE_MAX_ENTRIES} / "
          f"{CACHE_MAX_MB:.0f} MB); untracked scratch {len(u_files)} / "
          f"{u_mb:.1f} MB (bound {CACHE_SCRATCH_MAX_MB:.0f} MB) "
          f"{'OK' if bound_ok else 'OVER BOUND'}")

    # execute probe: load + RUN cached CPU executables in a subprocess.
    # The cache was compiled on a host with +prefer-no-gather/scatter;
    # XLA's cpu_aot_loader warns every load that the mismatch "could
    # lead to execution errors such as SIGILL".  A SIGILL kills the
    # probe -> nonzero rc -> preflight fails loudly instead of the
    # driver checks dying mid-window.
    probe = (
        "import logging\n"
        "msgs = []\n"
        "class H(logging.Handler):\n"
        "    def emit(self, r): msgs.append(r.getMessage())\n"
        "lg = logging.getLogger('jax._src.compiler')\n"
        "lg.setLevel(logging.DEBUG); lg.addHandler(H())\n"
        "import jax, jax.numpy as jnp\n"
        "jax.config.update('jax_platforms','cpu')\n"
        f"jax.config.update('jax_compilation_cache_dir', {CACHE_DIR!r})\n"
        "jax.config.update('jax_persistent_cache_min_compile_time_secs',"
        " 0.0)\n"
        "def srtpu_cache_probe(a):\n"
        "    return (a @ a).sum()\n"
        "x = jax.jit(srtpu_cache_probe)(jnp.ones((128, 128)))\n"
        "assert float(x) == 128.0 ** 3\n"
        "hit = any('cache hit' in m.lower() for m in msgs)\n"
        "print('EXEC_OK', 'HIT' if hit else 'MISS')\n")
    hit = False
    try:
        p = subprocess.run([sys.executable, "-c", probe], cwd=REPO,
                           capture_output=True, text=True, timeout=120)
        exec_ok = p.returncode == 0 and "EXEC_OK" in p.stdout
        hit = "EXEC_OK HIT" in p.stdout
        mismatch = "cpu_aot_loader" in p.stderr
    except subprocess.TimeoutExpired:
        exec_ok, mismatch = False, False
    verdict = ("OK" if exec_ok else
               "FAILED (SIGILL-class hazard is real on this host — "
               "drop .jax_cache)")
    note = (" [feature-mismatch warnings present: cache built with "
            "+prefer-no-gather/scatter; execute probe passed, so "
            "known-benign here]" if exec_ok and mismatch else "")
    # a probe that MISSED the cache compiled a fresh local executable —
    # its success proves nothing about the COMMITTED blobs (ADVICE r4):
    # say so explicitly instead of letting the OK read as verified
    src = ("loaded from cache" if hit else
           "UNVERIFIED — probe entry MISSED the cache, so this ran a "
           "fresh local compile, not a committed blob (seed it: run "
           "preflight once, then `git add -f .jax_cache/<probe entry>`)")
    print(f"[preflight] cache-health: cached-executable run "
          f"{verdict} ({src}){note}")

    # bench-step artifact freshness: a stale artifact silently costs the
    # driver bench ~5 min of live tracing (bench.py falls back) — make
    # staleness visible here rather than discovered in the window
    try:
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "export_benchstep",
            os.path.join(REPO, "tools", "export_benchstep.py"))
        ebs = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ebs)
        with open(os.path.join(ebs.ART_DIR, "manifest.json")) as f:
            man = json.load(f)
        fresh = man["fingerprint"] == ebs.source_fingerprint()
        print("[preflight] cache-health: bench-step artifact "
              + ("FRESH" if fresh else
                 "STALE — re-run tools/export_benchstep.py (bench will "
                 "fall back to ~5 min live tracing)"))
    except (OSError, KeyError, ValueError):
        print("[preflight] cache-health: bench-step artifact ABSENT — "
              "run tools/export_benchstep.py on the chip rig")

    cold_ok = True
    if os.environ.get("PREFLIGHT_SKIP_COLD") != "1":
        # cache-BYPASS compile of the dryrun trainer: does a cold clone
        # (empty cache / foreign CPU) still fit the driver window?
        with tempfile.TemporaryDirectory(prefix="srtpu_coldcache_") as td:
            env = dict(os.environ)
            env["JAX_COMPILATION_CACHE_DIR"] = td
            t0 = time.perf_counter()
            try:
                p = subprocess.run(
                    [sys.executable, "-c",
                     "import __graft_entry__ as g; g.dryrun_multichip(8)"],
                    cwd=REPO, env=env, capture_output=True, text=True,
                    timeout=window)
                cold_ok = p.returncode == 0 and "OK" in p.stdout
            except subprocess.TimeoutExpired:
                cold_ok = False
            wall = time.perf_counter() - t0
        print(f"[preflight] cache-health: cold (cache-bypass) dryrun "
              f"compile {'PASS' if cold_ok else 'FAIL'} "
              f"wall={wall:.1f}s (window {window:.0f}s)")
    return bound_ok and exec_ok and cold_ok


def main() -> int:
    window = float(os.environ.get("PREFLIGHT_WINDOW", "480"))
    checks = []
    if os.environ.get("PREFLIGHT_SKIP_BENCH") != "1":
        checks.append(("bench", [sys.executable, "bench.py"]))
    if os.environ.get("PREFLIGHT_SKIP_DRYRUN") != "1":
        checks.append(("dryrun_multichip", [
            sys.executable, "-c",
            "import __graft_entry__ as g; g.dryrun_multichip(8)"]))
    if os.environ.get("PREFLIGHT_MULTIPROC") == "1":
        # multi-HOST drill: 2 gloo processes x 4 virtual devices, one
        # step over the spanning mesh (VERDICT r3 #7; env-gated so the
        # driver default stays fast)
        checks.append(("dryrun_multiproc", [
            sys.executable, "-c",
            "import __graft_entry__ as g; g.dryrun_multiproc(2, 4)"]))

    all_ok = cache_health(window)
    for name, cmd in checks:
        res = run_check(name, cmd, window)
        all_ok &= res["ok"]
        status = "PASS" if res["ok"] else "FAIL"
        print(f"[preflight] {name}: {status} rc={res['rc']} "
              f"wall={res['wall_s']}s (window {window:.0f}s)")
        if res["parsed"] is not None:
            print(f"[preflight]   {json.dumps(res['parsed'])}")
        if not res["ok"]:
            print(f"[preflight]   tail: {res['tail']}")
    print(f"[preflight] {'OK' if all_ok else 'FAILED'}")
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main())
