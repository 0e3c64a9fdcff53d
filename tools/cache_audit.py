#!/usr/bin/env python
"""Audit / prune the committed XLA compile cache (``.jax_cache``).

The repo ships a warm persistent compile cache so the driver's timed
checks (bench.py, dryrun_multichip) and the test suite land inside their
kill windows on a cold clone.  That cache is a liability unless bounded:
entries are keyed to XLA version + backend, stale keys accumulate
silently, and by round 3 it had grown to 252 committed blobs / 168 MB
with churn after every suite run (VERDICT r3 weak-1 / next-round #3).

This tool makes the cache's contents a *measured* set:

``trace``
    Run any command with JAX cache hit/miss telemetry captured to a log
    file (one cache key per line).  Works by injecting a
    ``sitecustomize.py`` via ``PYTHONPATH`` that attaches a
    file-writing DEBUG handler to ``jax._src.compiler`` — the logger
    that prints "Persistent compilation cache hit for ... with key
    '<key>'" — so it covers every python subprocess the command spawns
    (pytest workers, CLI integration tests, the bench).  Nothing is
    written to stdout/stderr: the handler only appends keys to the log.

``report``
    Classify every ``.jax_cache`` entry as HIT (its key appears in the
    log) or UNHIT, with sizes, and show the tracked/untracked split.

``prune --apply``
    Delete UNHIT entries: ``git rm --quiet`` for tracked ones, plain
    unlink for untracked churn.  Without ``--apply`` it only prints what
    would go.

Round policy (documented bound): after a full ``trace`` of the driver
checks + default test suite, the cache holds ONLY hit entries; the
working tree must be clean after a suite run because ``.jax_cache`` is
gitignored for NEW files (already-tracked entries stay tracked — git
semantics) and updates are committed deliberately via ``git add -f``.

Usage:
  python tools/cache_audit.py trace --log /tmp/cache_hits.txt -- \
      python bench.py
  python tools/cache_audit.py report --log /tmp/cache_hits.txt
  python tools/cache_audit.py prune  --log /tmp/cache_hits.txt --apply
"""

import argparse
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE_DIR = os.path.join(REPO, ".jax_cache")

_SITECUSTOMIZE = '''\
# injected by tools/cache_audit.py trace — appends every persistent-
# compile-cache key jax touches (hit or miss) to $SRTPU_CACHE_AUDIT.
import logging
import os

# Prepending this dir to PYTHONPATH SHADOWS any existing sitecustomize
# (this rig keeps the axon TPU plugin registration in
# /root/.axon_site/sitecustomize.py) — chain to the first shadowed one
# so tracing never changes which backends exist.
def _chain():
    import importlib.util
    import sys

    me = os.path.dirname(os.path.abspath(__file__))
    for p in sys.path:
        if not p or os.path.abspath(p) == me:
            continue
        cand = os.path.join(p, "sitecustomize.py")
        if os.path.exists(cand):
            spec = importlib.util.spec_from_file_location(
                "_srtpu_chained_sitecustomize", cand)
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            return

_chain()

_path = os.environ.get("SRTPU_CACHE_AUDIT")
if _path:
    class _CacheKeyHandler(logging.Handler):
        def emit(self, record):
            try:
                msg = record.getMessage()
                if "compilation cache" in msg.lower() and "key '" in msg:
                    key = msg.split("key '", 1)[1].split("'", 1)[0]
                    with open(_path, "a") as f:
                        f.write(key + "\\n")
            except Exception:
                pass

    _lg = logging.getLogger("jax._src.compiler")
    _lg.setLevel(logging.DEBUG)
    _lg.addHandler(_CacheKeyHandler())
'''


def entries():
    if not os.path.isdir(CACHE_DIR):
        return []
    return sorted(f for f in os.listdir(CACHE_DIR)
                  if os.path.isfile(os.path.join(CACHE_DIR, f)))


def tracked():
    out = subprocess.run(["git", "ls-files", ".jax_cache"], cwd=REPO,
                         capture_output=True, text=True).stdout
    return {os.path.basename(line) for line in out.splitlines() if line}


def read_log(path):
    keys = set()
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    keys.add(line + "-cache")   # disk name = key + "-cache"
    return keys


def cmd_trace(args):
    site_dir = tempfile.mkdtemp(prefix="srtpu_cache_audit_")
    with open(os.path.join(site_dir, "sitecustomize.py"), "w") as f:
        f.write(_SITECUSTOMIZE)
    env = dict(os.environ)
    env["SRTPU_CACHE_AUDIT"] = os.path.abspath(args.log)
    env["PYTHONPATH"] = site_dir + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else "")
    print(f"[cache_audit] tracing -> {args.log}", file=sys.stderr)
    return subprocess.call(args.cmd, env=env)


def classify(log_path):
    hit_names = read_log(log_path)
    trk = tracked()
    rows = []
    for name in entries():
        size = os.path.getsize(os.path.join(CACHE_DIR, name))
        rows.append((name, size, name in hit_names, name in trk))
    return rows


def cmd_report(args):
    rows = classify(args.log)
    hit = [r for r in rows if r[2]]
    unhit = [r for r in rows if not r[2]]
    mb = lambda rs: sum(r[1] for r in rs) / 1e6  # noqa: E731
    print(f"cache entries: {len(rows)} ({mb(rows):.1f} MB) | "
          f"hit: {len(hit)} ({mb(hit):.1f} MB) | "
          f"unhit: {len(unhit)} ({mb(unhit):.1f} MB)")
    for name, size, _, trk in sorted(unhit, key=lambda r: -r[1]):
        print(f"  UNHIT {'tracked  ' if trk else 'untracked'} "
              f"{size/1e6:7.2f} MB  {name}")
    return 0


def cmd_prune(args):
    rows = classify(args.log)
    unhit = [r for r in rows if not r[2]]
    if not unhit:
        print("[cache_audit] nothing to prune")
        return 0
    to_git_rm = [n for n, _, _, trk in unhit if trk]
    to_unlink = [n for n, _, _, trk in unhit if not trk]
    verb = "pruning" if args.apply else "would prune"
    print(f"[cache_audit] {verb} {len(to_git_rm)} tracked + "
          f"{len(to_unlink)} untracked entries "
          f"({sum(r[1] for r in unhit)/1e6:.1f} MB)")
    if not args.apply:
        return 0
    for i in range(0, len(to_git_rm), 50):
        subprocess.check_call(
            ["git", "rm", "--quiet", "-f"]
            + [os.path.join(".jax_cache", n)
               for n in to_git_rm[i:i + 50]], cwd=REPO)
    for n in to_unlink:
        os.unlink(os.path.join(CACHE_DIR, n))
    return 0


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    sub = ap.add_subparsers(dest="mode", required=True)
    t = sub.add_parser("trace")
    t.add_argument("--log", required=True)
    t.add_argument("cmd", nargs=argparse.REMAINDER,
                   help="-- command to run")
    r = sub.add_parser("report")
    r.add_argument("--log", required=True)
    p = sub.add_parser("prune")
    p.add_argument("--log", required=True)
    p.add_argument("--apply", action="store_true")
    args = ap.parse_args(argv)
    if args.mode == "trace":
        if args.cmd and args.cmd[0] == "--":
            args.cmd = args.cmd[1:]
        if not args.cmd:
            ap.error("trace needs a command after --")
        return cmd_trace(args)
    if args.mode == "report":
        return cmd_report(args)
    return cmd_prune(args)


if __name__ == "__main__":
    sys.exit(main())
