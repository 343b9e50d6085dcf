"""Host data pipeline: pano -> square resize -> flip -> random patch crop.

Behavioral parity targets (reference dataset.py):
  * MaybeResize (:95-114): center-crop to square + Lanczos resize to full_size
  * random horizontal flip (:490-497)
  * CropPatch (:117-270): random patch crop with ac_coords labels — for
    coord_num_dir==3: (raw x ratio, sin(pi*y'), cos(pi*y')) with the
    reference's exact (input-patch-1) denominators (:195-199)
  * [-1,1] normalization (:507-512)
  * RectCropPatch (:273-386) is intentionally absent: the reference defines
    it but never instantiates it anywhere (dead code) — nothing to match.

Sources: "synthetic" (noise panos, for smoke/integration), "folder" (a
directory of image files), "npy" (a packed (N,H,W,3) uint8 array — the
prepare_data.py analogue, see spgan_tpu/data/records.py), "lmdb" (a
reference-prepared LMDB read in-process via the pure-python parser,
spgan_tpu/data/lmdb_read.py), "spr" (packed records, native C++ loader).

The loader is a double-buffered background-thread prefetcher; batches are
numpy, handed to jax.device_put by the training loop.
"""
from __future__ import annotations

import os
import queue
import threading
from dataclasses import dataclass
from glob import glob
from typing import Dict, Iterator, Optional

import numpy as np

from spgan_tpu.config import Config


def center_square_resize(img: np.ndarray, size: int) -> np.ndarray:
    """Center-crop to square then resize (Lanczos) — MaybeResize parity."""
    h, w = img.shape[:2]
    if h != w:
        if h > w:
            t = (h - w) // 2
            img = img[t:t + w]
        else:
            t = (w - h) // 2
            img = img[:, t:t + h]
    if img.shape[0] != size:
        import cv2

        img = cv2.resize(img, (size, size), interpolation=cv2.INTER_LANCZOS4)
    return img


@dataclass
class PatchCropper:
    input_size: int   # full_size, e.g. 197
    patch_size: int   # e.g. 101
    coord_num_dir: int = 3

    def __call__(self, img: np.ndarray, rng: np.random.RandomState):
        """img: (S, S, 3). Returns (patch, ac_coords)."""
        span = self.input_size - self.patch_size
        xst = rng.randint(0, span) if span > 0 else 0
        yst = rng.randint(0, span) if span > 0 else 0
        patch = img[xst:xst + self.patch_size, yst:yst + self.patch_size]

        def ratio(v):
            # reference denominators: input - patch - 1 (dataset.py:196-198)
            return v / (self.input_size - self.patch_size - 1) * 2.0 - 1.0

        if self.coord_num_dir == 3:
            ac = np.array([ratio(xst),
                           np.sin(ratio(yst) * np.pi),
                           np.cos(ratio(yst) * np.pi)], np.float32)
        else:
            raise NotImplementedError(self.coord_num_dir)
        return patch, ac


def _synthetic_source(n: int, data_size, seed: int = 0):
    """Deterministic random panos (smooth-ish noise) for smoke testing."""
    w, h = data_size
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 255, (n, h // 8, w // 8, 3), np.uint8)

    def load(idx):
        import cv2

        return cv2.resize(base[idx % n], (w, h),
                          interpolation=cv2.INTER_LINEAR)

    return n, load


def _folder_source(folder: str):
    paths = sorted(
        p for p in glob(os.path.join(folder, "*"))
        if p.lower().endswith((".png", ".jpg", ".jpeg", ".webp")))
    assert paths, f"no images found in {folder}"

    def load(idx):
        from PIL import Image

        return np.asarray(Image.open(paths[idx % len(paths)]).convert("RGB"))

    return len(paths), load


def _npy_source(path: str):
    arr = np.load(path, mmap_mode="r")

    def load(idx):
        return np.asarray(arr[idx % arr.shape[0]])

    return arr.shape[0], load


def _lmdb_source(folder: str, key_prefix: Optional[str] = None):
    """A reference-prepared LMDB read directly (dataset.py:388-610 key
    layout f"{size}-{idx}") via the pure-python parser — no conversion and
    no `lmdb` module needed.

    A multi-resolution LMDB (reference prepare_data.py resize_multiple)
    stores every image once per size under distinct prefixes; training on
    all of them would silently duplicate and rescale the dataset, so when
    more than one prefix exists `lmdb_key_prefix` must pick one.
    """
    import io
    import re

    try:
        import lmdb  # the C binding, if someone installed it
    except ImportError:
        from spgan_tpu.data import lmdb_read as lmdb

    env = lmdb.open(folder, readonly=True, lock=False, readahead=False,
                    meminit=False)
    key_re = re.compile(rb"^(.*)-(\d{5,8})$")
    by_prefix: Dict[bytes, list] = {}
    with env.begin(write=False) as txn:
        # keys-only walk: do NOT materialize every stored image here
        for k in txn.cursor().iternext(values=False):
            m = key_re.match(k)
            if m:
                by_prefix.setdefault(m.group(1), []).append(k)
    assert by_prefix, f"no image keys found in LMDB {folder}"
    if key_prefix is not None:
        enc = key_prefix.encode()
        if enc not in by_prefix:
            raise ValueError(
                f"lmdb_key_prefix {key_prefix!r} not in LMDB {folder}; "
                f"present: {sorted(p.decode() for p in by_prefix)}")
        keys = by_prefix[enc]
    elif len(by_prefix) > 1:
        raise ValueError(
            f"LMDB {folder} stores multiple resolutions/prefixes "
            f"{sorted(p.decode() for p in by_prefix)} — training on all "
            "would duplicate each image once per stored size; set "
            "data_params.lmdb_key_prefix to pick one")
    else:
        (keys,) = by_prefix.values()

    def load(idx):
        from PIL import Image

        with env.begin(write=False) as txn:
            raw = txn.get(keys[idx % len(keys)])
        return np.asarray(Image.open(io.BytesIO(raw)).convert("RGB"))

    return len(keys), load


def make_data_source(cfg: Config):
    dp = cfg.data_params
    if dp.source == "synthetic":
        return _synthetic_source(max(64, min(dp.num_train, 512)),
                                 cfg.train_params.data_size)
    if dp.source == "folder":
        return _folder_source(dp.folder)
    if dp.source == "npy":
        return _npy_source(dp.folder)
    if dp.source == "lmdb":
        return _lmdb_source(dp.folder or dp.lmdb_root,
                            key_prefix=dp.lmdb_key_prefix)
    if dp.source == "spr":
        from spgan_tpu.data.native_loader import read_records

        arr = read_records(dp.folder)
        return arr.shape[0], lambda idx: np.asarray(arr[idx % arr.shape[0]])
    raise ValueError(
        f"unknown data source {dp.source!r}; supported: synthetic | folder "
        "| npy | lmdb (a reference-prepared LMDB dir, read in-process) "
        "| spr (convert a reference LMDB via tools/convert_lmdb.py)")


class NativeTrainPipeline:
    """Training batches straight from the C++ record loader (SPR1 files,
    see spgan_tpu/data/native_loader.py) — replaces the python crop path and
    the reference's LMDB/DataLoader worker pool."""

    def __init__(self, cfg: Config, seed: int = 0, include_full: bool = False):
        from spgan_tpu.data.native_loader import NativeRecordLoader

        tp = cfg.train_params
        self._ld = NativeRecordLoader(
            cfg.data_params.folder, full_size=tp.full_size,
            patch_size=tp.patch_size, batch=tp.batch_size, seed=seed,
            include_full=include_full)

    def __iter__(self):
        return self

    def __next__(self):
        return self._ld.next_batch()

    def close(self):
        self._ld.close()


def make_train_pipeline(cfg: Config, seed: int = 0,
                        include_full: bool = False):
    """Pick the native loader for .spr sources; fall back to the pure-python
    pipeline (mmap read_records via make_data_source) when the C++ loader
    can't be built (no g++ on the host)."""
    if (cfg.data_params.source == "spr"
            or (cfg.data_params.folder or "").endswith(".spr")):
        try:
            return NativeTrainPipeline(cfg, seed=seed,
                                       include_full=include_full)
        except RuntimeError as e:
            import sys

            print(f"[data] native loader unavailable ({e}); "
                  "using the pure-python SPR reader", file=sys.stderr)
            # Force the SPR source in the fallback: the .spr branch may have
            # been entered via the folder-suffix check while source is
            # something else, and TrainPipeline dispatches on source — without
            # this the fallback would silently read the wrong data.
            if cfg.data_params.source != "spr":
                import dataclasses as _dc

                cfg = _dc.replace(
                    cfg, data_params=_dc.replace(cfg.data_params,
                                                 source="spr"))
    return TrainPipeline(cfg, seed=seed, include_full=include_full)


class TrainPipeline:
    """Background-prefetched training batches:
    {"patch": (B,101,101,3) f32 in [-1,1], "ac_coords": (B,3),
     "full": (B,197,197,3)}"""

    def __init__(self, cfg: Config, seed: int = 0, prefetch: int = 4,
                 include_full: bool = False):
        self.cfg = cfg
        self.n, self.load = make_data_source(cfg)
        tp = cfg.train_params
        self.cropper = PatchCropper(tp.full_size, tp.patch_size,
                                    tp.coord_num_dir)
        self.include_full = include_full
        self.rng = np.random.RandomState(seed)
        self.batch = tp.batch_size
        self._q: "queue.Queue" = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _sample_one(self, rng):
        idx = rng.randint(0, self.n)
        img = self.load(idx)
        # reference transform order (dataset.py:458-497): MaybeResize to
        # extra_pre_resize (square-crop + Lanczos) FIRST, then MaybeResize to
        # full_size — two resampling stages, not one
        pre = self.cfg.train_params.extra_pre_resize
        if pre is not None:
            img = center_square_resize(img, pre)
        img = center_square_resize(img, self.cfg.train_params.full_size)
        if rng.rand() < 0.5:
            img = img[:, ::-1]
        patch, ac = self.cropper(img, rng)
        return img, patch, ac

    def _make_batch(self, rng):
        fulls, patches, acs = [], [], []
        for _ in range(self.batch):
            f, p, a = self._sample_one(rng)
            fulls.append(f)
            patches.append(p)
            acs.append(a)

        def norm(x):
            return np.asarray(x, np.float32) / 127.5 - 1.0

        out = {"patch": norm(np.stack(patches)),
               "ac_coords": np.stack(acs).astype(np.float32)}
        if self.include_full:
            out["full"] = norm(np.stack(fulls))
        return out

    def _worker(self):
        while not self._stop.is_set():
            b = self._make_batch(self.rng)
            while not self._stop.is_set():
                try:
                    self._q.put(b, timeout=0.5)
                    break
                except queue.Full:
                    continue

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        return self

    def __next__(self) -> Dict[str, np.ndarray]:
        return self._q.get()

    def close(self):
        self._stop.set()
