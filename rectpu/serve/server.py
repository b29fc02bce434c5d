"""Minimal JSON prediction server over an exported model.

Replaces the reference's ML-Engine model deployment
(/root/reference/scripts/mle_deploy.sh: find latest export -> create model
version -> online predict). Here: ``python -m rectpu.serve.server --job-dir
checkpoints/deep_fm`` serves the newest export under job_dir at
POST /predict with the ML-Engine request shape:

    {"instances": [{"user_id": 1, "item_id": 10, "age": 25, "gender": "F",
                    "occupation": "student", "zipcode": "85711",
                    "release_year": 1994, "action": 1}, ...]}

Response: {"predictions": [{"probabilities": p, "logits": l, "class_id": c}]}.
Stdlib http.server only — no framework dependencies.
"""

from __future__ import annotations

import json
from argparse import ArgumentParser
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from rectpu.serve.export import SERVING_REQUIRED, latest_export, load_model
from rectpu.utils.logging import get_logger

logger = get_logger(__name__)


def instances_to_columns(instances: list[dict]) -> dict:
    columns: dict = {}
    keys = set()
    for inst in instances:
        keys.update(inst.keys())
    for key in keys:
        columns[key] = np.asarray([inst.get(key, 0) for inst in instances])
    return columns


def make_handler(served):
    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            if self.path.rstrip("/") not in ("/predict", "/v1/predict", ""):
                self.send_error(404)
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(length) or b"{}")
                instances = body["instances"]
                out = served.predict(instances_to_columns(instances))
                predictions = [
                    {
                        "probabilities": float(out["probabilities"][i]),
                        "logits": float(out["logits"][i]),
                        "class_id": int(out["class_id"][i]),
                    }
                    for i in range(len(instances))
                ]
                payload = json.dumps({"predictions": predictions}).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)
            except Exception as e:  # surface the error to the client
                payload = json.dumps({"error": f"{type(e).__name__}: {e}"}).encode()
                self.send_response(400)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

        def do_GET(self):
            if self.path.rstrip("/") == "/healthz":
                self.send_response(200)
                self.send_header("Content-Length", "2")
                self.end_headers()
                self.wfile.write(b"ok")
            else:
                self.send_error(404)

        def log_message(self, fmt, *args):
            logger.debug("http: " + fmt, *args)

    return Handler


def serve(job_dir: str | None = None, export_dir: str | None = None,
          host: str = "127.0.0.1", port: int = 8080, use_serialized: bool = False,
          compilation_cache_dir: str | None = "/tmp/jax_cache",
          batch_window_ms: float = 2.0, max_in_flight: int = 4,
          num_dispatchers: int = 1, table_quant: str | None = None):
    if compilation_cache_dir:
        # persistent XLA cache: without it every server start recompiles the
        # predict buckets (minutes over a remote-compile TPU tunnel)
        import jax

        try:
            jax.config.update("jax_compilation_cache_dir", compilation_cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:
            pass
    if export_dir is None:
        export_dir = latest_export(job_dir)
        if export_dir is None:
            raise FileNotFoundError(f"no export under {job_dir}/export/exporter")
    if use_serialized and table_quant:
        # the StableHLO graph was traced over fp params — quantized serving
        # retraces the Python model, contradicting the explicit --serialized
        raise ValueError("--serialized and --table-quant are mutually exclusive")
    served = load_model(export_dir, use_serialized=use_serialized)
    if table_quant == "int8":
        # in-memory post-training quantization (serve/quant.py); pre-quantized
        # exports (model.json table_quant) need no flag — load_model handles them
        from rectpu.serve.quant import quantize_serving

        served = quantize_serving(served)
        logger.info("embedding table quantized to int8 (per-row scales)")
    logger.info("serving %s (required features: %s)", export_dir, SERVING_REQUIRED)
    logger.info("warming up predict compile...")
    served.warmup(sizes=(1, 2, 8, 64, 512))
    logger.info("warmup done")
    if batch_window_ms > 0:
        # coalesce concurrent requests into one device dispatch (ML-Engine
        # server-side batching parity); the handler only needs .predict()
        from rectpu.serve.batching import MicroBatcher

        served = MicroBatcher(served, max_delay_ms=batch_window_ms,
                              max_in_flight=max_in_flight,
                              num_dispatchers=num_dispatchers)
        logger.info("request micro-batching on (window %.1f ms)", batch_window_ms)
    httpd = ThreadingHTTPServer((host, port), make_handler(served))
    logger.info("listening on http://%s:%d/predict", host, port)
    httpd.serve_forever()


if __name__ == "__main__":
    ap = ArgumentParser()
    ap.add_argument("--job-dir", default="checkpoints/deep_fm",
                    help="job dir whose newest export to serve")
    ap.add_argument("--export-dir", default=None, help="explicit export directory")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--serialized", action="store_true",
                    help="execute the export's StableHLO graph (apply.jaxexport) "
                         "instead of retracing the Python model")
    ap.add_argument("--compilation-cache-dir", default="/tmp/jax_cache",
                    help="persistent XLA compilation cache ('' disables)")
    ap.add_argument("--batch-window-ms", type=float, default=2.0,
                    help="coalesce concurrent requests into one device call, "
                         "waiting up to this long to fill a batch (0 disables)")
    ap.add_argument("--max-in-flight", type=int, default=4,
                    help="batches allowed in flight on the device before the "
                         "dispatcher backpressures (pipelining depth)")
    ap.add_argument("--table-quant", choices=["int8"], default=None,
                    help="quantize the embedding table at load time "
                         "(per-row int8; ~4x less gather HBM at predict)")
    ap.add_argument("--num-dispatchers", type=int, default=1,
                    help="dispatcher threads: 1 = pipelined single dispatcher "
                         "(co-located TPU); >1 = pool overlapping dispatch "
                         "round trips (high-latency tunneled backends)")
    a = ap.parse_args()
    serve(a.job_dir, a.export_dir, a.host, a.port, use_serialized=a.serialized,
          compilation_cache_dir=a.compilation_cache_dir,
          batch_window_ms=a.batch_window_ms, max_in_flight=a.max_in_flight,
          num_dispatchers=a.num_dispatchers, table_quant=a.table_quant)
