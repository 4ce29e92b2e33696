"""``mtvaf-serve`` — HTTP serving front-end over a trained run.

Loads a predictor from a training run's ``--save_path`` (run_config.json +
best_model.npz, see ``infer.load_predictor``) — or a frozen deployment
bundle via ``--bundle`` (mtvaf-export artifacts; byte-stable programs, no
model code) — and serves it through the dynamic-batching
``BatchingServer`` on a stdlib ThreadingHTTPServer — zero extra
dependencies, one compiled device program.

  mtvaf-serve --save_path out/ --port 8088
  curl -s localhost:8088/predict -d '{"sentences": ["the pizza was great"]}'
  -> {"results": [[["pizza", "POS"]]]}
  curl -s localhost:8088/stats
  -> {"served": 1, "p50_ms": ..., "mean_batch": ...}
  curl -s localhost:8088/metrics        # Prometheus text exposition
  -> mtvaf_served_total 1 ... mtvaf_latency_ms{quantile="0.5"} ...

Multimodal (prefix) runs accept per-sentence images as base64-encoded
JPEG/PNG aligned with ``sentences`` (null entries allowed):
``{"sentences": [...], "images": ["<b64>", null, ...]}`` — decoded with
the production eval transform; sentences without an image run text-only
(no visual guides), same as the trainers on a missing image.

Concurrent HTTP requests coalesce into shared device batches: each
sentence becomes one BatchingServer submit, so a burst of single-sentence
POSTs from many clients fills 16-row device batches exactly like the
closed-loop bench (BENCH_SERVE.json).
"""

from __future__ import annotations

import argparse
import json
import logging

logger = logging.getLogger(__name__)


def _decode_image(b64: str):
    """base64 JPEG/PNG → the production (224, 224, 3) fp32 eval transform."""
    import base64

    from ..data.images import process_image_bytes
    return process_image_bytes(base64.b64decode(b64))


def _prometheus(stats: dict) -> str:
    """BatchingServer.stats() → Prometheus text exposition (0.0.4)."""
    lines = [
        "# HELP mtvaf_served_total Requests served.",
        "# TYPE mtvaf_served_total counter",
        f"mtvaf_served_total {stats.get('served', 0)}",
        "# HELP mtvaf_rejected_total Requests shed at max_queue.",
        "# TYPE mtvaf_rejected_total counter",
        f"mtvaf_rejected_total {stats.get('rejected', 0)}",
        "# HELP mtvaf_replicas Predictor replicas (serving devices).",
        "# TYPE mtvaf_replicas gauge",
        f"mtvaf_replicas {stats.get('replicas', 1)}",
    ]
    if "batches" in stats:
        lines += [
            "# HELP mtvaf_batches_total Device batches dispatched "
            "(recent window).",
            "# TYPE mtvaf_batches_total counter",
            f"mtvaf_batches_total {stats['batches']}",
            "# HELP mtvaf_mean_batch Mean batch occupancy "
            "(recent window).",
            "# TYPE mtvaf_mean_batch gauge",
            f"mtvaf_mean_batch {stats['mean_batch']}",
            "# HELP mtvaf_latency_ms Request latency quantiles "
            "(recent window).",
            "# TYPE mtvaf_latency_ms summary",
        ]
        for q, key in (("0.5", "p50_ms"), ("0.95", "p95_ms"),
                       ("0.99", "p99_ms")):
            lines.append(
                f'mtvaf_latency_ms{{quantile="{q}"}} {stats[key]}')
    rb = stats.get("replica_batches", [])
    if rb:
        lines += ["# HELP mtvaf_replica_batches_total Batches per replica.",
                  "# TYPE mtvaf_replica_batches_total counter"]
        lines += [f'mtvaf_replica_batches_total{{replica="{i}"}} {n}'
                  for i, n in enumerate(rb)]
    return "\n".join(lines) + "\n"


def bundle_ladder(predictor, batch_shapes):
    """Serving ladder for a frozen bundle: default to the bundle's exported
    rungs; reject a requested ladder past the largest rung (fit() would
    raise mid-serving otherwise) and warn on shapes that are not rungs
    (those batches pad up to the next rung's program)."""
    rungs = predictor.export_rungs
    if batch_shapes is None:
        logger.info("serving ladder from bundle rungs: %s", rungs)
        return list(rungs)
    if max(batch_shapes) > max(rungs):
        raise SystemExit(
            f"--batch_shapes {batch_shapes} exceeds the bundle's largest "
            f"exported rung {max(rungs)}; re-export with larger "
            f"--batch_sizes or lower the ladder")
    off = [s for s in batch_shapes if s not in rungs]
    if off:
        logger.warning(
            "batch shapes %s are not exported rungs %s: those batches pad "
            "up to the next rung's program", off, rungs)
    return batch_shapes


def build_app(server):
    """Request handler class bound to a BatchingServer (separable for
    tests)."""
    from http.server import BaseHTTPRequestHandler

    from ..serve import QueueFull

    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *args):  # route to logging, not stderr
            logger.debug("http: " + fmt, *args)

        def do_GET(self):
            if self.path == "/stats":
                self._reply(200, server.stats())
            elif self.path == "/metrics":
                body = _prometheus(server.stats()).encode()
                self.send_response(200)
                self.send_header("Content-Type",
                                 "text/plain; version=0.0.4")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif self.path == "/healthz":
                self._reply(200, {"ok": True})
            else:
                self._reply(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/predict":
                self._reply(404, {"error": "unknown path"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                sentences = req["sentences"]
                # explicit checks, not assert: validation must survive -O
                if not isinstance(sentences, list) or not all(
                        isinstance(s, str) for s in sentences):
                    raise ValueError("'sentences' must be a list of strings")
                images = req.get("images")
                if images is not None:
                    if (not isinstance(images, list)
                            or len(images) != len(sentences)):
                        raise ValueError("'images' must align with "
                                         "'sentences' (null entries allowed)")
                    images = [None if b is None else _decode_image(b)
                              for b in images]
            except Exception as e:  # noqa: BLE001
                self._reply(400, {"error": f"bad request: {e}"})
                return
            try:
                futs = [server.submit(s, image=img)
                        for s, img in zip(sentences,
                                          images or [None] * len(sentences))]
                results = [f.result(timeout=120) for f in futs]
            except QueueFull as e:
                # load shed: tell the client to back off and retry.  Any
                # sentences of this request that DID queue before the bound
                # hit still compute (their futures are dropped) — wasted
                # work under a rare race, never a wrong answer.
                self.send_response(429)
                body = json.dumps({"error": str(e)}).encode()
                self.send_header("Content-Type", "application/json")
                self.send_header("Retry-After", "1")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            except Exception as e:  # noqa: BLE001
                self._reply(500, {"error": str(e)})
                return
            self._reply(200, {"results": results})

    return Handler


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser("mtvaf-serve")
    p.add_argument("--save_path", default=None,
                   help="training run directory (run_config.json + "
                        "best_model.npz)")
    p.add_argument("--bundle", default=None,
                   help="serve a frozen mtvaf-export bundle instead of a "
                        "run directory (byte-stable programs, no model "
                        "code; --serve_devices stays 1 — frozen programs "
                        "pin their device placement)")
    p.add_argument("--bert_name", default=None,
                   help="override the run's tokenizer directory")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8088)
    p.add_argument("--max_batch", type=int, default=16)
    p.add_argument("--batch_shapes", default=None,
                   help="comma-separated ladder of compiled batch shapes "
                        "(e.g. '1,4,16,64'): idle singles run the smallest "
                        "rung's short program, a saturated queue fills the "
                        "largest; default = one shape (--max_batch).  Each "
                        "rung compiles once at startup")
    p.add_argument("--max_wait_ms", type=float, default=5.0)
    p.add_argument("--pipeline_depth", type=int, default=4)
    p.add_argument("--partial_inflight", type=int, default=None,
                   help="max batches already in flight at which an aged "
                        "below-top-rung batch still dispatches (default "
                        "min(2, pipeline_depth)); deeper pipelines hold "
                        "partial takes for fill — under saturation the "
                        "server then runs full top-rung batches")
    p.add_argument("--max_queue", type=int, default=None,
                   help="backpressure bound: shed requests with HTTP 429 "
                        "once this many are already waiting (default "
                        "unbounded; production: a few top-rung batches, "
                        "e.g. 4x the largest batch shape)")
    p.add_argument("--image_dtype", default="float32",
                   choices=("float32", "float16", "uint8"),
                   help="host->device transfer dtype for image rows: "
                        "float16 halves the multimodal upload bytes (cast "
                        "back to fp32 on device); uint8 quarters them — "
                        "rows ship as raw pixels and the ImageNet "
                        "normalize re-runs inside the device program "
                        "(exact for uint8-origin pixels)")
    p.add_argument("--serve_devices", default="1",
                   help="'auto' = one predictor replica per local chip "
                        "(data-parallel serving: shared queue, one dispatch "
                        "worker per chip, throughput scales with chips); an "
                        "integer N uses the first N local devices; default "
                        "1 = single-device")
    args = p.parse_args(argv)
    batch_shapes = [int(s) for s in args.batch_shapes.split(",")] \
        if args.batch_shapes else None

    from http.server import ThreadingHTTPServer

    from ..serve import BatchingServer

    if bool(args.save_path) == bool(args.bundle):
        raise SystemExit("pass exactly one of --save_path / --bundle")
    if args.bundle and args.serve_devices != "1":
        # frozen programs pin their device placement; BatchingServer's
        # to_device replication would raise mid-construction anyway —
        # fail at flag-parse time with the same guidance
        raise SystemExit(
            "--bundle serves single-device (frozen programs pin their "
            "placement); for multi-chip serving run one mtvaf-serve "
            "per chip behind a load balancer, or serve the live run "
            "with --save_path --serve_devices auto")
    if args.bundle:
        if args.image_dtype != "float32":
            # frozen programs pin their image input dtype at export time
            # (manifest image_dtype) — a runtime flag cannot change it
            raise SystemExit(
                "--image_dtype applies to live predictors only; bundles "
                "freeze the transfer dtype at export (re-export from a "
                "predictor built with image_dtype='float16'/'uint8')")
        from ..export import load_exported_predictor
        logger.info("loading frozen bundle from %s", args.bundle)
        predictor = load_exported_predictor(args.bundle,
                                            bert_name=args.bert_name)
        batch_shapes = bundle_ladder(predictor, batch_shapes)
    else:
        from ..infer import load_predictor
        logger.info("loading predictor from %s", args.save_path)
        predictor = load_predictor(args.save_path, bert_name=args.bert_name,
                                   image_dtype=args.image_dtype)
    if predictor.cfg.use_prefix:
        logger.warning(
            "prefix run: POST base64 'images' aligned with 'sentences' for "
            "visual guides; requests without images run text-only (the "
            "first image-bearing batch compiles a second program)")
    devices = None
    if args.serve_devices != "1":
        import jax
        local = jax.local_devices()
        n = len(local) if args.serve_devices == "auto" \
            else int(args.serve_devices)
        if not 1 <= n <= len(local):
            raise SystemExit(f"--serve_devices {args.serve_devices}: have "
                             f"{len(local)} local devices")
        devices = local[:n] if n > 1 else None
        if devices:
            logger.info("data-parallel serving over %d devices", n)
    with BatchingServer(predictor, max_batch=args.max_batch,
                        max_wait_ms=args.max_wait_ms,
                        pipeline_depth=args.pipeline_depth,
                        batch_shapes=batch_shapes,
                        devices=devices,
                        max_queue=args.max_queue,
                        partial_inflight=args.partial_inflight) as server:
        # compile every serving rung before accepting traffic
        server.warmup()
        httpd = ThreadingHTTPServer((args.host, args.port),
                                    build_app(server))
        logger.info("serving on http://%s:%d (POST /predict, GET /stats)",
                    args.host, args.port)
        try:
            httpd.serve_forever()
        except KeyboardInterrupt:
            logger.info("shutting down")
        finally:
            httpd.server_close()


if __name__ == "__main__":
    main()
