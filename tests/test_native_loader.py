"""Native C++ record loader: build, IO round-trip, batch semantics."""
import numpy as np
import pytest

from spgan_tpu.data.native_loader import (NativeRecordLoader, get_lib,
                                          write_records)


@pytest.fixture(scope="module")
def record_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("rec") / "toy.spr"
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 255, (8, 128, 384, 3), np.uint8)
    write_records(str(p), imgs)
    return str(p), imgs


def test_native_lib_builds():
    assert get_lib() is not None, "g++ build of native loader failed"


def test_loader_batches(record_file):
    path, imgs = record_file
    ld = NativeRecordLoader(path, full_size=96, patch_size=64, batch=4, seed=1)
    try:
        assert len(ld) == 8
        b = ld.next_batch()
        assert b["patch"].shape == (4, 64, 64, 3)
        assert b["ac_coords"].shape == (4, 3)
        assert -1.0 <= b["patch"].min() and b["patch"].max() <= 1.0
        assert np.abs(b["patch"]).max() > 0.1  # actually filled
        b2 = ld.next_batch()
        assert not np.array_equal(b["patch"], b2["patch"])
        # ac labels: x raw in ~[-1,1.05], y channels sin/cos
        ac = np.concatenate([b["ac_coords"], b2["ac_coords"]])
        assert np.abs(ac[:, 1] ** 2 + ac[:, 2] ** 2 - 1.0).max() < 1e-5
    finally:
        ld.close()


def test_loader_full_images(record_file):
    path, _ = record_file
    ld = NativeRecordLoader(path, full_size=96, patch_size=64, batch=2,
                            seed=2, include_full=True)
    try:
        b = ld.next_batch()
        assert b["full"].shape == (2, 96, 96, 3)
        # patch must be a crop of full (bitwise, same normalize path)
        full0 = b["full"][0]
        patch0 = b["patch"][0]
        found = False
        for xs in range(96 - 64):
            for ys in range(96 - 64):
                if np.array_equal(full0[xs:xs + 64, ys:ys + 64], patch0):
                    found = True
                    break
            if found:
                break
        assert found, "patch is not a crop of the full image"
    finally:
        ld.close()
