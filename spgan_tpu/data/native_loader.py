"""ctypes binding for the native C++ record loader (native/spgan_loader.cc).

Builds the shared library on first use (cached next to the source); falls
back gracefully if a toolchain is unavailable — TrainPipeline then uses the
pure-python path.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "spgan_loader.cc")
_SO = os.path.join(os.path.dirname(_SRC), "libspgan_loader.so")

_lib = None


def _build() -> Optional[str]:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             _SRC, "-o", _SO],
            check=True, capture_output=True)
        return _SO
    except Exception:
        return None


def get_lib():
    global _lib
    if _lib is not None:
        return _lib
    so = _build()
    if so is None:
        return None
    lib = ctypes.CDLL(so)
    lib.spr_open.restype = ctypes.c_void_p
    lib.spr_open.argtypes = [ctypes.c_char_p]
    lib.spr_close.argtypes = [ctypes.c_void_p]
    lib.spr_size.restype = ctypes.c_uint64
    lib.spr_size.argtypes = [ctypes.c_void_p]
    lib.spr_make_batch.restype = ctypes.c_int
    lib.spr_make_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_uint64, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
    lib.spr_write.restype = ctypes.c_int
    lib.spr_write.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                              ctypes.c_uint64, ctypes.c_uint32,
                              ctypes.c_uint32]
    _lib = lib
    return lib


def read_records(path: str) -> np.ndarray:
    """mmap an SPR1 file -> (N,H,W,3) uint8 view (header: magic u32, n u64,
    h u32, w u32, c u32, then raw pixels)."""
    with open(path, "rb") as f:
        head = f.read(24)
    magic = np.frombuffer(head, np.uint32, count=1)[0]
    assert magic == 0x31525053, f"not an SPR1 file: {path}"
    n = int(np.frombuffer(head, np.uint64, count=1, offset=4)[0])
    h, w, c = (int(v) for v in np.frombuffer(head, np.uint32, count=3,
                                             offset=12))
    assert c == 3
    return np.memmap(path, np.uint8, mode="r", offset=24,
                     shape=(n, h, w, c))


def write_records(path: str, images: np.ndarray) -> None:
    """images: (N,H,W,3) uint8 -> packed SPR1 file."""
    lib = get_lib()
    images = np.ascontiguousarray(images, np.uint8)
    n, h, w, c = images.shape
    assert c == 3
    if lib is not None:
        rc = lib.spr_write(path.encode(), images.ctypes.data, n, h, w)
        assert rc == 0, f"spr_write failed rc={rc}"
        return
    # pure-python fallback
    with open(path, "wb") as f:
        f.write(np.uint32(0x31525053).tobytes())
        f.write(np.uint64(n).tobytes())
        f.write(np.uint32(h).tobytes())
        f.write(np.uint32(w).tobytes())
        f.write(np.uint32(3).tobytes())
        f.write(images.tobytes())


class NativeRecordLoader:
    """Batch assembler over a SPR1 record file, all crops/resize/normalize in
    C++ (one call per batch)."""

    def __init__(self, path: str, full_size: int, patch_size: int,
                 batch: int, seed: int = 0, include_full: bool = False):
        self.lib = get_lib()
        if self.lib is None:
            raise RuntimeError("native loader unavailable (no g++?)")
        self.handle = self.lib.spr_open(path.encode())
        assert self.handle, f"cannot open record file {path}"
        self.full_size = full_size
        self.patch_size = patch_size
        self.batch = batch
        self.seed = np.uint64(seed)
        self.include_full = include_full
        self._patch = np.empty((batch, patch_size, patch_size, 3), np.float32)
        self._ac = np.empty((batch, 3), np.float32)
        self._full = (np.empty((batch, full_size, full_size, 3), np.float32)
                      if include_full else None)

    def __len__(self) -> int:
        return int(self.lib.spr_size(self.handle))

    def next_batch(self) -> dict:
        self.seed = np.uint64(int(self.seed) + 1)
        rc = self.lib.spr_make_batch(
            self.handle, self.batch, self.full_size, self.patch_size,
            int(self.seed),
            self._patch.ctypes.data, self._ac.ctypes.data,
            self._full.ctypes.data if self._full is not None else None)
        assert rc == 0, f"spr_make_batch failed rc={rc}"
        out = {"patch": self._patch.copy(), "ac_coords": self._ac.copy()}
        if self._full is not None:
            out["full"] = self._full.copy()
        return out

    def close(self):
        if self.handle:
            self.lib.spr_close(self.handle)
            self.handle = None
