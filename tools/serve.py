#!/usr/bin/env python
"""Run the HTTP serving daemon over an exported artifact.

The CLI face of ``situation_recognition_tpu.server.serve_http``: loads a
StableHLO artifact directory (``tools/export_serving.py`` output) and
serves it with dynamic micro-batching — concurrent single-image requests
coalesce into one TPU dispatch per ``--max_wait_ms`` window.

Usage:
  python tools/serve.py artifact_dir [--host 127.0.0.1] [--port 8000] \\
      [--max_wait_ms 5] [--max_batch N] [--all_devices]

Endpoints:
  POST /predict            image bytes -> {verb, verb_id, verb_prob, roles}
  POST /predict?verb=NAME  gt-verb-conditioned entry (prob 1, sr.py:249-251)
  GET  /healthz | /stats | /meta

``--all_devices`` spreads dispatches round-robin over every local chip
(``serving.load_inference(devices=jax.devices())``).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("artifact", help="artifact directory")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--max_wait_ms", type=float, default=5.0,
                    help="batching window a lone request waits")
    ap.add_argument("--max_batch", type=int, default=None,
                    help="cap per dispatch (default: the artifact's baked "
                         "batch size)")
    ap.add_argument("--all_devices", action="store_true",
                    help="round-robin dispatches over every local device")
    ap.add_argument("--max_queue", type=int, default=256,
                    help="per-entry admission bound; overload gets 429 "
                         "(bounds daemon memory under any load)")
    ap.add_argument("--allow_reload", action="store_true",
                    help="enable POST /admin/reload artifact hot-swap")
    args = ap.parse_args(argv)

    import jax

    from situation_recognition_tpu.server import serve_http

    devices = jax.devices() if args.all_devices else None
    httpd = serve_http(args.artifact, host=args.host, port=args.port,
                       max_wait_ms=args.max_wait_ms,
                       max_batch=args.max_batch, devices=devices,
                       max_queue=args.max_queue,
                       allow_reload=args.allow_reload)
    host, port = httpd.server_address[:2]
    print(f"serving {args.artifact} on http://{host}:{port} "
          f"(max_wait_ms={args.max_wait_ms}, "
          f"devices={len(devices) if devices else 1})", flush=True)
    try:
        import threading

        threading.Event().wait()        # run until killed
    except KeyboardInterrupt:
        pass
    finally:
        httpd.shutdown()
        httpd.batcher.close()


if __name__ == "__main__":
    main()
