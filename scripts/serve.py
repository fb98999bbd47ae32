#!/usr/bin/env python
"""Serve an exported artifact over local HTTP until stopped.

A long-lived inference daemon (eval/serve.py) around a StableHLO serving
artifact (scripts/export.py): load once, warm up every exported
signature, then answer ``POST /predict`` (npz batch in, JSON probs out)
on one chip.  The reference has no serving daemon — its eval path
re-instantiates the model per invocation (test_ddp.py:65-105).

Example:
  python scripts/export.py ... --out model.llmmil
  python scripts/serve.py --artifact model.llmmil --port 8000

  # client
  python - <<'PY'
  import io, json, urllib.request, numpy as np
  buf = io.BytesIO()
  np.savez(buf, input_pathology=np.random.randn(1, 8192, 768)
           .astype(np.float32), mask_pathology=np.ones((1, 8192), bool),
           input_CI=np.random.rand(1, 9).astype(np.float32))
  r = urllib.request.urlopen(urllib.request.Request(
      "http://127.0.0.1:8000/predict", buf.getvalue()))
  print(json.load(r))
  PY
"""

import argparse
import os
import signal
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--artifact", required=True,
                   help="artifact file from scripts/export.py")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--no_warmup", action="store_true",
                   help="skip pre-compiling every signature at startup "
                        "(first request per signature then pays it)")
    args = p.parse_args(argv)

    from llmmil_tpu.eval.serve import serve_artifact

    srv = serve_artifact(args.artifact, host=args.host, port=args.port,
                         warmup=not args.no_warmup)
    sigs = "\n  ".join(sorted(srv.model.signatures))
    print(f"serving {args.artifact} on http://{args.host}:{srv.port}\n"
          f"signatures:\n  {sigs}", flush=True)

    # POSIX requires the waited-for signals to be blocked before sigwait —
    # otherwise CPython's default SIGINT handler races the C sigwait loop
    # (Ctrl-C can hang) and SIGTERM keeps its terminate-now disposition,
    # skipping srv.stop().
    signal.pthread_sigmask(signal.SIG_BLOCK,
                           {signal.SIGINT, signal.SIGTERM})
    stop = signal.sigwait([signal.SIGINT, signal.SIGTERM])
    print(f"signal {stop}: shutting down", flush=True)
    srv.stop()


if __name__ == "__main__":
    main()
