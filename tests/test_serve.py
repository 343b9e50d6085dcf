"""Serving smoke test: tiny model, real HTTP round trips on localhost."""
import json
import threading
import urllib.request

import numpy as np
import jax

from spgan_tpu.config import Config
from spgan_tpu.models.generator import Generator
from spgan_tpu.serve import PanoramaService, serve


def test_http_serving_roundtrip():
    cfg = Config()
    tp = cfg.train_params
    tp.global_latent_dim = 32
    tp.local_latent_dim = 16
    tp.channel_multiplier = 1
    tp.n_mlp = 2
    tp.ss_n_layers = 2
    cfg.task.height, cfg.task.width = 128, 672
    cfg.task.batch_size = 2
    g = Generator.from_config(cfg)
    object.__setattr__(g.ts, "channel_base", 48)
    params = g.init(jax.random.PRNGKey(0))

    svc = PanoramaService(g, params, cfg)
    httpd = serve(svc, port=0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        with urllib.request.urlopen(base + "/healthz", timeout=300) as r:
            assert json.load(r)["status"] == "ok"
        with urllib.request.urlopen(base + "/generate?seed=7&index=1",
                                    timeout=600) as r:
            png = r.read()
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        from PIL import Image
        import io

        img = np.asarray(Image.open(io.BytesIO(png)))
        assert img.shape == (128, 672, 3)
        with urllib.request.urlopen(base + "/metadata", timeout=60) as r:
            meta = json.load(r)
        assert meta["lattice"] == [svc.engine.plan.num_steps_h,
                                   svc.engine.plan.num_steps_w]
        assert meta["stats"]["requests"] == 1
        # cached batch: second image from the same seed without regeneration
        with urllib.request.urlopen(base + "/generate?seed=7&index=0",
                                    timeout=120) as r:
            r.read()
        with urllib.request.urlopen(base + "/metadata", timeout=60) as r:
            assert json.load(r)["stats"]["batches"] == 1
    finally:
        httpd.shutdown()
