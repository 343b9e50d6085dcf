"""Minimal LMDB *writer* — TEST FIXTURE ONLY.

Builds a valid data.mdb from a {key: value} dict so the pure-Python
reader (spgan_tpu/data/lmdb_read.py) can be tested without liblmdb.
Follows the same file-format facts documented in the reader module
(liblmdb 0.9.x on-disk layout, 64-bit, MDB_DATA_VERSION=1), but is a
fully independent implementation: it packs pages bottom-up (leaves ->
branches -> root) the way a bulk load would, while the reader walks the
tree top-down with binary search — a format misunderstanding on either
side breaks the round-trip tests.

Realism choices mirroring liblmdb:
  * node bodies are allocated from the page's upper end downward while
    the pointer array grows from byte 16 upward (lower/upper semantics)
  * node sizes are 2-byte aligned (EVEN())
  * values whose node would exceed ~nodemax (= (psize-16)/2, the
    MDB_MINKEYS=2 bound) go to F_BIGDATA overflow chains
  * meta page 0 is the freshly-created empty-db meta (txnid 0, root
    invalid) and meta page 1 the committed one (txnid 1) — readers must
    pick the larger txnid, which the round-trip tests therefore cover
"""
from __future__ import annotations

import os
import struct
from typing import Dict, List, Tuple

_PAGEHDRSZ = 16
_P_INVALID = 0xFFFFFFFFFFFFFFFF
P_BRANCH, P_LEAF, P_OVERFLOW, P_META = 0x01, 0x02, 0x04, 0x08
F_BIGDATA = 0x01
_MAGIC, _VERSION = 0xBEEFC0DE, 1


def _even(n: int) -> int:
    return (n + 1) & ~1


class _PageBuilder:
    """Packs nodes into one page, bodies top-down from `upper`."""

    def __init__(self, psize: int, flags: int):
        self.psize = psize
        self.flags = flags
        self.nodes: List[bytes] = []
        self.used = 0  # ptr slots + node bodies

    def fits(self, node: bytes) -> bool:
        return _PAGEHDRSZ + self.used + 2 + _even(len(node)) <= self.psize

    def add(self, node: bytes):
        assert self.fits(node)
        self.nodes.append(node)
        self.used += 2 + _even(len(node))

    def render(self, pgno: int) -> bytes:
        buf = bytearray(self.psize)
        ptrs = []
        upper = self.psize
        for node in self.nodes:
            upper -= _even(len(node))
            buf[upper:upper + len(node)] = node
            ptrs.append(upper)
        lower = _PAGEHDRSZ + 2 * len(self.nodes)
        struct.pack_into("<QHHHH", buf, 0, pgno, 0, self.flags, lower, upper)
        for i, p in enumerate(ptrs):
            struct.pack_into("<H", buf, _PAGEHDRSZ + 2 * i, p)
        return bytes(buf)


def _leaf_node(key: bytes, data: bytes, flags: int, dsize: int) -> bytes:
    return struct.pack("<HHHH", dsize & 0xFFFF, dsize >> 16, flags,
                       len(key)) + key + data


def _branch_node(key: bytes, pgno: int) -> bytes:
    return struct.pack("<HHHH", pgno & 0xFFFF, (pgno >> 16) & 0xFFFF,
                       pgno >> 32, len(key)) + key


def _db_record(flags=0, depth=0, branch=0, leaf=0, overflow=0, entries=0,
               root=_P_INVALID, pad=0) -> bytes:
    return struct.pack("<IHHQQQQQ", pad, flags, depth, branch, leaf,
                       overflow, entries, root)


def _meta_page(pgno: int, psize: int, main_db: bytes, last_pg: int,
               txnid: int, mapsize: int) -> bytes:
    buf = bytearray(psize)
    struct.pack_into("<QHHHH", buf, 0, pgno, 0, P_META, 0, 0)
    off = _PAGEHDRSZ
    struct.pack_into("<IIQQ", buf, off, _MAGIC, _VERSION, 0, mapsize)
    off += 24
    free_db = _db_record(pad=psize)          # dbs[0].md_pad == page size
    buf[off:off + 48] = free_db
    buf[off + 48:off + 96] = main_db
    struct.pack_into("<QQ", buf, off + 96, last_pg, txnid)
    return bytes(buf)


def write_lmdb(path: str, items: Dict[bytes, bytes],
               psize: int = 4096) -> str:
    """Write `items` as an LMDB directory (data.mdb inside). Returns the
    directory path (pass it to lmdb_read.open)."""
    os.makedirs(path, exist_ok=True)
    nodemax = (psize - _PAGEHDRSZ) // 2
    pages: Dict[int, bytes] = {}
    next_pg = 2  # 0/1 are the meta pages

    def alloc() -> int:
        nonlocal next_pg
        n = next_pg
        next_pg += 1
        return n

    n_overflow = 0
    # ---- leaves ---------------------------------------------------------
    leaves: List[Tuple[bytes, int]] = []  # (first key, pgno)
    cur = _PageBuilder(psize, P_LEAF)
    cur_first = None
    for key in sorted(items):
        val = items[key]
        assert len(key) <= 511, "key longer than MDB_MAXKEYSIZE"
        if 8 + len(key) + len(val) > nodemax:
            npages = (_PAGEHDRSZ + len(val) + psize - 1) // psize
            ovpg = alloc()
            chain = bytearray(npages * psize)
            struct.pack_into("<QHHI", chain, 0, ovpg, 0, P_OVERFLOW, npages)
            chain[_PAGEHDRSZ:_PAGEHDRSZ + len(val)] = val
            pages[ovpg] = bytes(chain)
            for _ in range(1, npages):
                alloc()  # the chain occupies npages consecutive pgnos
            n_overflow += npages
            node = _leaf_node(key, struct.pack("<Q", ovpg), F_BIGDATA,
                              len(val))
        else:
            node = _leaf_node(key, val, 0, len(val))
        if not cur.fits(node):
            pg = alloc()
            pages[pg] = cur.render(pg)
            leaves.append((cur_first, pg))
            cur = _PageBuilder(psize, P_LEAF)
            cur_first = None
        if cur_first is None:
            cur_first = key
        cur.add(node)
    if cur.nodes or not leaves:
        pg = alloc()
        pages[pg] = cur.render(pg)
        leaves.append((cur_first or b"", pg))

    # ---- branches, bottom-up until a single root ------------------------
    depth, n_branch = 1, 0
    level = leaves
    while len(level) > 1:
        depth += 1
        nxt: List[Tuple[bytes, int]] = []
        cur = _PageBuilder(psize, P_BRANCH)
        cur_first = None
        for i, (first_key, child) in enumerate(level):
            # node 0 of every branch page carries the -inf sentinel (empty
            # key); subsequent nodes carry their child's first key
            key = b"" if not cur.nodes else first_key
            node = _branch_node(key, child)
            if not cur.fits(node):
                pg = alloc()
                pages[pg] = cur.render(pg)
                nxt.append((cur_first, pg))
                n_branch += 1
                cur = _PageBuilder(psize, P_BRANCH)
                node = _branch_node(b"", child)
                cur_first = None
            if cur_first is None:
                cur_first = first_key
            cur.add(node)
        pg = alloc()
        pages[pg] = cur.render(pg)
        nxt.append((cur_first, pg))
        n_branch += 1
        level = nxt
    root = level[0][1]
    if not items:
        root, depth = _P_INVALID, 0

    # ---- metas + file ----------------------------------------------------
    last_pg = next_pg - 1
    fsize = (last_pg + 1) * psize
    main = _db_record(depth=depth, branch=n_branch,
                      leaf=len(leaves) if items else 0,
                      overflow=n_overflow, entries=len(items), root=root)
    empty = _db_record()
    mapsize = max(fsize, 1 << 20)
    out = bytearray(fsize)
    out[0:psize] = _meta_page(0, psize, empty, 1, 0, mapsize)
    out[psize:2 * psize] = _meta_page(1, psize, main, last_pg, 1, mapsize)
    for pg, data in pages.items():
        out[pg * psize:pg * psize + len(data)] = data
    with open(os.path.join(path, "data.mdb"), "wb") as f:
        f.write(out)
    return path
