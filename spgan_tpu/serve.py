"""Panorama serving: a minimal production-style HTTP inference server.

The engine compiles once at startup; requests draw from the compiled lattice
program (batch = task.batch_size panoramas per device step; single-flight
around the accelerator).  Endpoints:

  GET /healthz                  -> {"status": "ok", ...}
  GET /generate?seed=N&index=I  -> PNG (panorama I of the batch seeded N)
  GET /metadata                 -> model/engine config + throughput stats

Run:  python -m spgan_tpu.serve --model-config ... --test-config ... \
        [--ckpt ...] [--port 8000]
"""
from __future__ import annotations

import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional
from urllib.parse import parse_qs, urlparse

import numpy as np


class PanoramaService:
    """Thread-safe generation with per-seed batch caching."""

    def __init__(self, g, params, cfg):
        from spgan_tpu.infer.engine import PanoramaEngine
        from spgan_tpu.infer.stitcher import build_close_loop_plan

        self.cfg = cfg
        plan = build_close_loop_plan(g, cfg.task.height, cfg.task.width)
        self.engine = PanoramaEngine(
            g=g, plan=plan, batch=cfg.task.batch_size,
            patch_chunk=cfg.task.patch_chunk,
            grid_partial=cfg.train_params.partial,
            compute_dtype=cfg.train_params.compute_dtype)
        self.params = params
        self._lock = threading.Lock()
        self._cache_seed: Optional[int] = None
        self._cache: Optional[np.ndarray] = None
        self.stats = {"requests": 0, "batches": 0, "last_batch_secs": None}

    def warmup(self):
        import jax

        t0 = time.perf_counter()
        self._batch(0)
        return time.perf_counter() - t0

    def _batch(self, seed: int) -> np.ndarray:
        import jax

        with self._lock:
            if self._cache_seed == seed:
                return self._cache
            t0 = time.perf_counter()
            meta = self.engine.generate(self.params, jax.random.PRNGKey(seed))
            out = np.asarray(self.engine.crop_to_target(meta))
            self.stats["batches"] += 1
            self.stats["last_batch_secs"] = round(time.perf_counter() - t0, 4)
            self._cache_seed, self._cache = seed, out
            return out

    def generate_png(self, seed: int, index: int) -> bytes:
        from PIL import Image

        batch = self._batch(seed)
        self.stats["requests"] += 1
        img = batch[index % batch.shape[0]]
        arr = (np.clip((img + 1) / 2, 0, 1) * 255 + 0.5).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        return buf.getvalue()

    def metadata(self) -> dict:
        plan = self.engine.plan
        return {
            "task": "close_loop_panorama",
            "height": plan.target_h, "width": plan.target_w,
            "batch": self.engine.batch,
            "lattice": [plan.num_steps_h, plan.num_steps_w],
            "compute_dtype": self.engine.compute_dtype,
            "use_pallas": bool(self.engine.use_pallas),
            "stats": self.stats,
        }


def make_handler(service: PanoramaService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _json(self, obj, code=200):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            u = urlparse(self.path)
            try:
                if u.path == "/healthz":
                    self._json({"status": "ok"})
                elif u.path == "/metadata":
                    self._json(service.metadata())
                elif u.path == "/generate":
                    q = parse_qs(u.query)
                    seed = int(q.get("seed", ["0"])[0])
                    idx = int(q.get("index", ["0"])[0])
                    png = service.generate_png(seed, idx)
                    self.send_response(200)
                    self.send_header("Content-Type", "image/png")
                    self.send_header("Content-Length", str(len(png)))
                    self.end_headers()
                    self.wfile.write(png)
                else:
                    self._json({"error": "not found"}, 404)
            except Exception as e:  # noqa: BLE001
                self._json({"error": str(e)}, 500)

    return Handler


def serve(service: PanoramaService, port: int = 8000):
    httpd = ThreadingHTTPServer(("127.0.0.1", port), make_handler(service))
    return httpd


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--model-config", required=True)
    ap.add_argument("--test-config", required=True)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--port", type=int, default=8000)
    args = ap.parse_args()

    import jax

    from spgan_tpu.config import load_config
    from spgan_tpu.models.generator import Generator
    from spgan_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = load_config(args.model_config, args.test_config)
    g = Generator.from_config(cfg)
    if args.ckpt:
        from spgan_tpu.compat.load import load_generator_params

        params = load_generator_params(args.ckpt, g)
    else:
        params = g.init(jax.random.PRNGKey(cfg.task.seed))
        print(" [!] serving randomly initialized weights (no --ckpt)")
    svc = PanoramaService(g, params, cfg)
    dt = svc.warmup()
    print(f" [*] warmup/compile: {dt:.1f}s; serving on :{args.port}")
    serve(svc, args.port).serve_forever()


if __name__ == "__main__":
    main()
