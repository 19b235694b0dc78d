"""HTTP model serving for hybrid/baseline checkpoints.

The reference has no serving story — its inference entry point is a
batch script (``/root/reference/test.py:149-237``). Production use of
the same model is a long-lived process that answers SMILES→pChEMBL
queries; this module provides that as a dependency-free stdlib HTTP
server wrapping :class:`~mgat_graphsage_tpu.eval.predict.Predictor`
(which caches the jitted bucketed prediction program across calls, so
repeat requests never re-trace):

    python -m mgat_graphsage_tpu.serve \
        checkpoints/flagship/best_model.msgpack --port 8080

    POST /predict   {"smiles": ["CCO", "c1ccccc1O"]}
        -> {"predictions": [5.81, 6.02], "model": "flagship"}
    GET  /health    -> {"status": "ok", "model": "flagship", ...}

Unparseable or over-shape-budget molecules come back as ``null`` in the
index-aligned predictions array (the Predictor's NaN rows), never as a
dropped element. Device dispatch is serialized with a lock: one JAX
client owns the chip, and interleaved dispatch from request threads
would contend rather than parallelize.
"""

from __future__ import annotations

import argparse
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional

import numpy as np

__all__ = ["PredictionServer", "make_server", "main"]

MAX_BODY_BYTES = 16 << 20   # 16 MiB ≈ 200k generous SMILES per request
MAX_BATCH = 100_000


class PredictionServer:
    """Owns the Predictor and turns request dicts into response dicts.

    Separated from the HTTP plumbing so tests (and alternative
    frontends) can call :meth:`predict_payload` directly.
    """

    def __init__(self, ckpt_path: str, infer_dtype: Optional[str] = None,
                 batch_size: int = 64):
        from .eval.predict import Predictor

        self.predictor = Predictor(ckpt_path, infer_dtype=infer_dtype)
        self.batch_size = int(batch_size)
        self.ckpt_path = ckpt_path
        self._lock = threading.Lock()
        self._requests = 0
        self._molecules = 0

    # -- endpoint bodies ------------------------------------------------
    def health(self) -> dict:
        cfg = self.predictor.cfg
        return {
            "status": "ok",
            "model": cfg.name,
            "fingerprint": cfg.fingerprint,
            "checkpoint": self.ckpt_path,
            "max_nodes": self.predictor.max_nodes,
            "max_edges": self.predictor.max_edges,
            "requests_served": self._requests,
            "molecules_served": self._molecules,
        }

    def predict_payload(self, payload: dict) -> dict:
        smiles = payload.get("smiles")
        if isinstance(smiles, str):
            smiles = [smiles]
        if (not isinstance(smiles, list) or not smiles
                or not all(isinstance(s, str) for s in smiles)):
            raise ValueError(
                "body must be {\"smiles\": [\"...\", ...]} "
                "(a non-empty list of SMILES strings)")
        if len(smiles) > MAX_BATCH:
            raise ValueError(
                f"at most {MAX_BATCH} molecules per request "
                f"(got {len(smiles)}); split the input")
        with self._lock:
            preds = self.predictor(smiles, batch_size=self.batch_size)
            self._requests += 1
            self._molecules += len(smiles)
        out: List[Optional[float]] = [
            None if not np.isfinite(p) else float(p) for p in preds]
        return {"predictions": out, "model": self.predictor.cfg.name,
                "count": len(out)}


def make_server(ckpt_path: str, host: str = "127.0.0.1", port: int = 8080,
                infer_dtype: Optional[str] = None,
                batch_size: int = 64) -> ThreadingHTTPServer:
    """Build (but don't start) the HTTP server; ``port=0`` picks a free
    port (``server.server_address[1]`` reports it — used by tests)."""
    backend = PredictionServer(ckpt_path, infer_dtype=infer_dtype,
                               batch_size=batch_size)

    class Handler(BaseHTTPRequestHandler):
        server_version = "mgat-serve/1.0"

        def _reply(self, code: int, obj: dict) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 (http.server API)
            if self.path.rstrip("/") in ("", "/health"):
                self._reply(200, backend.health())
            else:
                self._reply(404, {"error": f"unknown path {self.path}; "
                                           f"GET /health or POST /predict"})

        def do_POST(self):  # noqa: N802
            if self.path.rstrip("/") != "/predict":
                self._reply(404, {"error": f"unknown path {self.path}; "
                                           f"POST /predict"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                if length > MAX_BODY_BYTES:
                    self._reply(413, {"error": "request body too large"})
                    return
                payload = json.loads(self.rfile.read(length) or b"{}")
                if not isinstance(payload, dict):
                    raise ValueError("body must be a JSON object")
            except (ValueError, json.JSONDecodeError) as e:
                self._reply(400, {"error": f"bad request: {e}"})
                return
            try:
                self._reply(200, backend.predict_payload(payload))
            except ValueError as e:
                self._reply(400, {"error": str(e)})
            except Exception as e:  # noqa: BLE001 — keep the server alive
                self._reply(500, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, fmt, *args):
            pass  # quiet; observability comes from /health counters

    server = ThreadingHTTPServer((host, port), Handler)
    server.backend = backend  # for tests / embedding
    return server


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Serve SMILES->pChEMBL predictions over HTTP")
    p.add_argument("ckpt", help="native checkpoint (.msgpack); import "
                                "reference .pth files first via "
                                "mgat_graphsage_tpu.compat")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--infer-dtype", default=None,
                   help="e.g. bfloat16 for bf16 serving")
    args = p.parse_args(argv)
    server = make_server(args.ckpt, args.host, args.port,
                         infer_dtype=args.infer_dtype,
                         batch_size=args.batch_size)
    host, port = server.server_address[:2]
    print(f"serving {args.ckpt} on http://{host}:{port} "
          f"(POST /predict, GET /health)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    main()
