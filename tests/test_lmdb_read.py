"""Pure-Python LMDB reader (spgan_tpu/data/lmdb_read.py) vs the test-only
writer fixture (tests/helpers/lmdb_writer.py).

Closes the buildable part of the round-2 "real-LMDB ingestion" gap: the
reference's on-disk format (dataset.py:388-610, prepare_data.py:100-175)
can now be read with zero extra dependencies.  Reader and writer are
independent implementations of the published liblmdb 0.9 layout (top-down
binary-search walk vs bottom-up bulk pack), and
test_brute_force_page_scan_agrees additionally checks the tree walk
against a tree-free scan of every P_LEAF page in the file.
"""
import io
import os
import struct
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from helpers.lmdb_writer import write_lmdb  # noqa: E402

from spgan_tpu.data import lmdb_read  # noqa: E402


def _roundtrip(tmp_path, items, name="db"):
    d = write_lmdb(str(tmp_path / name), items)
    env = lmdb_read.open(d, readonly=True, lock=False)
    return env


def test_small_db_get_and_order(tmp_path):
    items = {f"k{i:03d}".encode(): f"value-{i}".encode() for i in range(10)}
    items[b"length"] = b"10"
    env = _roundtrip(tmp_path, items)
    assert env.stat()["entries"] == len(items)
    assert env.stat()["depth"] == 1
    with env.begin(write=False) as txn:
        for k, v in items.items():
            assert txn.get(k) == v
        assert txn.get(b"absent") is None
        assert txn.get(b"") is None
        got = list(txn.cursor())
    assert got == sorted(items.items())
    env.close()


def test_multipage_btree(tmp_path):
    # ~2000 x ~500B values -> hundreds of leaf pages -> depth >= 2 and a
    # multi-node branch level, exercising the separator descent
    rng = np.random.RandomState(0)
    items = {f"{256}-{i:08d}".encode(): rng.bytes(400 + i % 200)
             for i in range(2000)}
    env = _roundtrip(tmp_path, items)
    st = env.stat()
    assert st["depth"] >= 2 and st["leaf_pages"] > 100, st
    txn = env.begin()
    keys = sorted(items)
    for i in range(0, 2000, 37):          # sample gets across the tree
        assert txn.get(keys[i]) == items[keys[i]], keys[i]
    # probe keys that fall BETWEEN leaves / beyond the ends
    assert txn.get(b"256-99999999") is None
    assert txn.get(b"0") is None
    assert txn.get(b"256-00000500x") is None
    assert list(txn.cursor()) == [(k, items[k]) for k in keys]


def test_binary_keys_random_lengths(tmp_path):
    """Random-length binary keys (incl. prefix-of-another-key cases) stress
    the memcmp ordering and the branch separators that land on arbitrary
    byte boundaries; python bytes ordering == LMDB's default memcmp order."""
    rng = np.random.RandomState(5)
    items = {}
    while len(items) < 700:
        k = rng.bytes(rng.randint(1, 40))
        items[k] = rng.bytes(rng.randint(0, 900))
        if len(items) % 3 == 0:
            items[k + b"\x00"] = b"suffix"   # prefix pairs
    env = _roundtrip(tmp_path, items)
    txn = env.begin()
    for k in sorted(items)[::13]:
        assert txn.get(k) == items[k]
    assert list(txn.cursor()) == [(k, items[k]) for k in sorted(items)]


def test_overflow_values(tmp_path):
    # jpeg-sized values (10-40 KB) -> F_BIGDATA overflow chains
    rng = np.random.RandomState(1)
    items = {f"img-{i:04d}".encode(): rng.bytes(10_000 + 7777 * i)
             for i in range(5)}
    items[b"small"] = b"x"
    env = _roundtrip(tmp_path, items)
    assert env.stat()["overflow_pages"] > 10
    with env.begin() as txn:
        for k, v in items.items():
            assert txn.get(k) == v
        assert [k for k, _ in txn.cursor()] == sorted(items)


def test_meta_page_selection(tmp_path):
    # the writer emits meta0 = fresh empty db (txnid 0), meta1 = committed
    # tree (txnid 1); reading the data proves the larger txnid won
    env = _roundtrip(tmp_path, {b"a": b"1"})
    assert env.txnid == 1
    assert env.begin().get(b"a") == b"1"


def test_empty_db(tmp_path):
    env = _roundtrip(tmp_path, {})
    with env.begin() as txn:
        assert txn.get(b"anything") is None
        assert list(txn.cursor()) == []


def test_readonly_guard(tmp_path):
    d = write_lmdb(str(tmp_path / "db"), {b"a": b"1"})
    with pytest.raises(lmdb_read.LmdbFormatError):
        lmdb_read.open(d, readonly=False)
    env = lmdb_read.open(d)
    with pytest.raises(lmdb_read.LmdbFormatError):
        env.begin(write=True)


def test_brute_force_page_scan_agrees(tmp_path):
    """Tree-free oracle: walk EVERY page in data.mdb, decode the ones whose
    header says P_LEAF, and compare the union of their nodes with the
    cursor's tree walk — a descent bug shared by reader and writer would
    still have to survive this structural cross-check."""
    rng = np.random.RandomState(2)
    items = {f"k{i:06d}".encode(): rng.bytes(rng.randint(1, 3000))
             for i in range(500)}
    d = write_lmdb(str(tmp_path / "db"), items)
    env = lmdb_read.open(d)

    raw = open(os.path.join(d, "data.mdb"), "rb").read()
    psize = env.psize
    found = {}
    for off in range(0, len(raw), psize):
        _, _, flags, lower, _ = struct.unpack_from("<QHHHH", raw, off)
        if flags != 0x02:  # exactly P_LEAF (metas/branches/overflow differ)
            continue
        n = (lower - 16) >> 1
        for i in range(n):
            p = struct.unpack_from("<H", raw, off + 16 + 2 * i)[0]
            lo, hi, nf, ks = struct.unpack_from("<HHHH", raw, off + p)
            key = raw[off + p + 8:off + p + 8 + ks]
            dsize = lo | (hi << 16)
            doff = off + p + 8 + ks
            if nf & 0x01:  # F_BIGDATA
                ovpg = struct.unpack_from("<Q", raw, doff)[0]
                val = raw[ovpg * psize + 16:ovpg * psize + 16 + dsize]
            else:
                val = raw[doff:doff + dsize]
            found[key] = val
    assert found == items
    assert dict(env.begin().cursor()) == items


def test_keys_only_iteration(tmp_path):
    """iternext(values=False) walks keys without materializing values (the
    pipeline's startup enumeration path for multi-GB LMDBs)."""
    items = {f"k{i}".encode(): b"v" * 5000 for i in range(20)}  # overflowing
    env = _roundtrip(tmp_path, items)
    got = list(env.begin().cursor().iternext(values=False))
    assert got == sorted(items)


def _png_bytes(arr):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def test_convert_lmdb_fallback_end_to_end(tmp_path, monkeypatch):
    """tools/convert_lmdb.py with NO python-lmdb installed: the built-in
    parser reads a reference-layout LMDB (keys f"{size}-{idx:08d}" +
    b"length", PNG-encoded values — prepare_data.py:100-175) and packs the
    decoded images into an SPR1 record file."""
    rng = np.random.RandomState(3)
    imgs = rng.randint(0, 255, (4, 32, 64, 3), np.uint8)
    items = {f"256-{i:08d}".encode(): _png_bytes(imgs[i]) for i in range(4)}
    items[b"length"] = b"4"
    d = write_lmdb(str(tmp_path / "ref_lmdb"), items)

    out = str(tmp_path / "out.spr")
    monkeypatch.setattr(sys, "argv", [
        "convert_lmdb.py", "--lmdb", d, "--out", out,
        "--height", "32", "--width", "64"])
    # force the ImportError fallback even where python-lmdb IS installed:
    # sys.modules[name] = None makes `import lmdb` raise ImportError
    monkeypatch.setitem(sys.modules, "lmdb", None)
    import importlib

    mod = importlib.import_module("tools.convert_lmdb")
    mod.main()

    from spgan_tpu.data.native_loader import read_records

    got = np.asarray(read_records(out))
    np.testing.assert_array_equal(got, imgs)


def test_pipeline_lmdb_source(tmp_path):
    """data_params.source == "lmdb": training batches flow straight from a
    reference-prepared LMDB through the standard pipeline."""
    from spgan_tpu.config import load_config

    rng = np.random.RandomState(4)
    imgs = rng.randint(0, 255, (3, 48, 48, 3), np.uint8)
    items = {f"48-{i:08d}".encode(): _png_bytes(imgs[i]) for i in range(3)}
    items[b"length"] = b"3"
    d = write_lmdb(str(tmp_path / "lmdb"), items)

    cfg = load_config("configs/model/spgan.yaml")
    import dataclasses

    cfg = dataclasses.replace(
        cfg, data_params=dataclasses.replace(
            cfg.data_params, source="lmdb", folder=d))

    from spgan_tpu.data.pipeline import make_data_source

    n, load = make_data_source(cfg)
    assert n == 3
    for i in range(3):
        np.testing.assert_array_equal(load(i), imgs[i])


def test_pipeline_lmdb_multi_resolution_guard(tmp_path):
    """A multi-resolution LMDB (reference prepare_data resize_multiple
    stores each image once per size) must NOT silently train on duplicated
    rescaled copies: no prefix -> loud error listing the prefixes;
    lmdb_key_prefix picks one."""
    import dataclasses

    from spgan_tpu.config import load_config
    from spgan_tpu.data.pipeline import _lmdb_source

    rng = np.random.RandomState(6)
    imgs = rng.randint(0, 255, (2, 32, 32, 3), np.uint8)
    items = {}
    for prefix in (b"128", b"256"):
        for i in range(2):
            items[prefix + f"-{i:08d}".encode()] = _png_bytes(imgs[i])
    items[b"length"] = b"2"
    d = write_lmdb(str(tmp_path / "multires"), items)

    with pytest.raises(ValueError, match="multiple resolutions"):
        _lmdb_source(d)
    with pytest.raises(ValueError, match="not in LMDB"):
        _lmdb_source(d, key_prefix="512")
    n, load = _lmdb_source(d, key_prefix="256")
    assert n == 2
    np.testing.assert_array_equal(load(0), imgs[0])

    cfg = load_config("configs/model/spgan.yaml")
    cfg = dataclasses.replace(
        cfg, data_params=dataclasses.replace(
            cfg.data_params, source="lmdb", folder=d,
            lmdb_key_prefix="128"))
    from spgan_tpu.data.pipeline import make_data_source

    n2, _ = make_data_source(cfg)
    assert n2 == 2
