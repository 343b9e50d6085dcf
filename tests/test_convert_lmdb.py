"""tools/convert_lmdb.py exercised against a fake in-memory lmdb module
(the real lmdb package is unavailable here — the tool targets the machine
where the reference LMDB was prepared).  The fake mimics the reference's key
layout (prepare_data.py:114: f"{size}-{idx:08d}" + a "length" key)."""
import io
import os
import runpy
import sys
import types

import numpy as np


class _FakeTxn:
    def __init__(self, d):
        self.d = d

    def get(self, k):
        return self.d.get(k)

    def cursor(self):
        return iter(sorted(self.d.items()))

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


class _FakeEnv:
    def __init__(self, d):
        self.d = d

    def begin(self, write=False):
        return _FakeTxn(self.d)


def _install_fake_lmdb(store):
    mod = types.ModuleType("lmdb")
    mod.open = lambda path, **kw: _FakeEnv(store)
    sys.modules["lmdb"] = mod


def test_convert_lmdb_to_spr(tmp_path, monkeypatch):
    from PIL import Image

    rng = np.random.RandomState(0)
    h, w, n = 32, 48, 5
    imgs = rng.randint(0, 255, (n, h, w, 3), np.uint8)
    store = {b"length": str(n).encode()}
    for i in range(n):
        buf = io.BytesIO()
        Image.fromarray(imgs[i]).save(buf, format="PNG")
        store[f"[768, 256]-{i:08d}".encode()] = buf.getvalue()

    _install_fake_lmdb(store)
    try:
        out = str(tmp_path / "data.spr")
        monkeypatch.setattr(sys, "argv", [
            "convert_lmdb.py", "--lmdb", "fake", "--out", out,
            "--height", str(h), "--width", str(w)])
        runpy.run_path(os.path.join(os.path.dirname(__file__), "..",
                                    "tools", "convert_lmdb.py"),
                       run_name="__main__")
    finally:
        del sys.modules["lmdb"]

    # read back through the SPR reader used by the training pipeline
    from spgan_tpu.config import Config
    from spgan_tpu.data.pipeline import make_data_source

    cfg = Config()
    cfg.data_params.source = "spr"
    cfg.data_params.folder = out
    count, load = make_data_source(cfg)
    assert count == n
    np.testing.assert_array_equal(load(2), imgs[2])
