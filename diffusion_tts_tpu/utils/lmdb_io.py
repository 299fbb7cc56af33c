"""Dependency-free LMDB reading (and a minimal writer for fixtures).

The reference's dataset_tool ingests LMDB image databases via the ``lmdb``
package (edm/dataset_tool.py:113-139). That package is not a baked-in
dependency here, so ``iterate_lmdb`` prefers it when importable and
otherwise falls back to a pure-Python parser of the on-disk format
(LMDB 0.9 data format, version 1): pick the live meta page by txnid, walk
the main DB's B+tree depth-first, yield (key, value) in key order,
following big-value nodes to their overflow page runs.

``write_lmdb`` emits a minimal single-transaction database (meta pair +
leaf pages + optional branch root + overflow runs) — enough to round-trip
fixtures through either reader. Not a general-purpose writer.
"""
from __future__ import annotations

import os
import struct
from typing import Iterable, Iterator

PAGESIZE = 4096
PAGEHDRSZ = 16
MDB_MAGIC = 0xBEEFC0DE
MDB_DATA_VERSION = 1

P_BRANCH = 0x01
P_LEAF = 0x02
P_OVERFLOW = 0x04
P_META = 0x08
F_BIGDATA = 0x01
P_INVALID = 0xFFFFFFFFFFFFFFFF

_NODE_HDR = struct.Struct("<HHHH")  # mn_lo, mn_hi, mn_flags, mn_ksize
# MDB_db: pad, flags, depth, branch_pages, leaf_pages, overflow_pages, entries, root
_DB = struct.Struct("<IHHQQQQQ")
# MDB_meta prefix: magic, version, address, mapsize
_META_HEAD = struct.Struct("<IIQQ")
_PAGE_HDR = struct.Struct("<QHHHH")  # pgno, pad, flags, pb_lower, pb_upper


def _data_path(path: str) -> str:
    if os.path.isdir(path):
        return os.path.join(path, "data.mdb")
    return path


class _PurePythonLMDB:
    """Read-only cursor over an LMDB data file."""

    def __init__(self, path: str):
        with open(_data_path(path), "rb") as f:
            self._buf = f.read()
        metas = []
        for pg in (0, 1):
            off = pg * PAGESIZE + PAGEHDRSZ
            magic, version, _addr, _mapsize = _META_HEAD.unpack_from(self._buf, off)
            if magic != MDB_MAGIC:
                raise ValueError(f"not an LMDB data file: bad magic on meta page {pg}")
            if version != MDB_DATA_VERSION:
                raise ValueError(f"unsupported LMDB data version {version}")
            dbs_off = off + _META_HEAD.size
            main_db = _DB.unpack_from(self._buf, dbs_off + _DB.size)  # dbs[1] = MAIN
            last_pg, txnid = struct.unpack_from("<QQ", self._buf, dbs_off + 2 * _DB.size)
            metas.append((txnid, main_db, last_pg))
        txnid, main_db, _ = max(metas, key=lambda m: m[0])
        (_pad, _flags, self.depth, _branch, _leaf, _ovf,
         self.entries, self.root) = main_db

    def _page(self, pgno: int) -> tuple[int, int, int]:
        """Returns (byte offset, flags, numkeys)."""
        off = pgno * PAGESIZE
        _pgno, _pad, flags, lower, _upper = _PAGE_HDR.unpack_from(self._buf, off)
        numkeys = (lower - PAGEHDRSZ) >> 1
        return off, flags, numkeys

    def _node(self, page_off: int, idx: int) -> tuple[int, int, int, int]:
        """Returns (node offset, lo|hi<<16, flags, ksize)."""
        (ptr,) = struct.unpack_from("<H", self._buf, page_off + PAGEHDRSZ + 2 * idx)
        noff = page_off + ptr
        lo, hi, flags, ksize = _NODE_HDR.unpack_from(self._buf, noff)
        return noff, lo | (hi << 16), flags, ksize

    def _iter_page(self, pgno: int) -> Iterator[tuple[bytes, bytes]]:
        off, flags, numkeys = self._page(pgno)
        if flags & P_LEAF:
            for i in range(numkeys):
                noff, dsize, nflags, ksize = self._node(off, i)
                key = self._buf[noff + _NODE_HDR.size:noff + _NODE_HDR.size + ksize]
                dstart = noff + _NODE_HDR.size + ksize
                if nflags & F_BIGDATA:
                    (ovf_pgno,) = struct.unpack_from("<Q", self._buf, dstart)
                    ovf_off = ovf_pgno * PAGESIZE + PAGEHDRSZ
                    value = self._buf[ovf_off:ovf_off + dsize]
                else:
                    value = self._buf[dstart:dstart + dsize]
                yield key, value
        elif flags & P_BRANCH:
            for i in range(numkeys):
                noff, lohi, nflags, _ksize = self._node(off, i)
                child = lohi | (nflags << 32)  # NODEPGNO: lo | hi<<16 | flags<<32
                yield from self._iter_page(child)
        else:
            raise ValueError(f"unexpected page flags {flags:#x} at pgno {pgno}")

    def items(self) -> Iterator[tuple[bytes, bytes]]:
        if self.root == P_INVALID:
            return
        yield from self._iter_page(self.root)


def lmdb_entries(path: str) -> int:
    """Entry count of the main DB (reference: txn.stat()['entries'],
    edm/dataset_tool.py:117)."""
    try:
        import lmdb  # type: ignore

        with lmdb.open(_data_path(path) if not os.path.isdir(path) else path,
                       readonly=True, lock=False, subdir=os.path.isdir(path)) as env:
            with env.begin(write=False) as txn:
                return txn.stat()["entries"]
    except ImportError:
        return _PurePythonLMDB(path).entries


def iterate_lmdb(path: str) -> Iterator[tuple[bytes, bytes]]:
    """Yield (key, value) from an LMDB database dir or data.mdb file, in key
    order. Uses the ``lmdb`` package when importable, else the built-in
    parser."""
    try:
        import lmdb  # type: ignore

        with lmdb.open(_data_path(path) if not os.path.isdir(path) else path,
                       readonly=True, lock=False, subdir=os.path.isdir(path)) as env:
            with env.begin(write=False) as txn:
                for key, value in txn.cursor():
                    yield bytes(key), bytes(value)
        return
    except ImportError:
        pass
    yield from _PurePythonLMDB(path).items()


def _node_bytes(key: bytes, dsize: int, flags: int, data: bytes) -> bytes:
    raw = _NODE_HDR.pack(dsize & 0xFFFF, (dsize >> 16) & 0xFFFF, flags, len(key))
    raw += key + data
    if len(raw) % 2:
        raw += b"\0"  # nodes are 2-byte aligned
    return raw


def _pack_page(pgno: int, flags: int, nodes: list[bytes]) -> bytes:
    ptrs_end = PAGEHDRSZ + 2 * len(nodes)
    upper = PAGESIZE
    ptrs, body = [], {}
    for n in nodes:
        upper -= len(n)
        ptrs.append(upper)
        body[upper] = n
    assert upper >= ptrs_end, "page overflow"
    page = bytearray(PAGESIZE)
    _PAGE_HDR.pack_into(page, 0, pgno, 0, flags, ptrs_end, upper)
    struct.pack_into(f"<{len(ptrs)}H", page, PAGEHDRSZ, *ptrs)
    for off, n in body.items():
        page[off:off + len(n)] = n
    return bytes(page)


def write_lmdb(path: str, items: Iterable[tuple[bytes, bytes]]) -> str:
    """Write a minimal LMDB database dir (data.mdb) holding ``items``.
    Keys are sorted as required by the format. Returns the db dir."""
    items = sorted(items)
    os.makedirs(path, exist_ok=True)
    pages: dict[int, bytes] = {}
    next_pg = 2  # 0, 1 = meta

    def alloc(n=1):
        nonlocal next_pg
        pg = next_pg
        next_pg += n
        return pg

    # Values too large for a leaf go to overflow page runs.
    max_inline = (PAGESIZE - PAGEHDRSZ) // 2 - _NODE_HDR.size - 2  # conservative
    leaf_nodes: list[tuple[bytes, bytes]] = []  # (first_key, node_bytes) pending
    n_overflow = 0
    prepared = []
    for key, value in items:
        if len(value) > max_inline - len(key):
            npages = -(-(PAGEHDRSZ + len(value)) // PAGESIZE)
            ovf_pg = alloc(npages)
            run = bytearray(npages * PAGESIZE)
            _PAGE_HDR.pack_into(run, 0, ovf_pg, 0, P_OVERFLOW, 0, 0)
            struct.pack_into("<I", run, 12, npages)  # pb_pages overlays lower/upper
            run[PAGEHDRSZ:PAGEHDRSZ + len(value)] = value
            for j in range(npages):
                pages[ovf_pg + j] = bytes(run[j * PAGESIZE:(j + 1) * PAGESIZE])
            n_overflow += npages
            prepared.append((key, _node_bytes(key, len(value), F_BIGDATA,
                                              struct.pack("<Q", ovf_pg))))
        else:
            prepared.append((key, _node_bytes(key, len(value), 0, value)))

    # Greedy fill leaf pages.
    leaves: list[tuple[int, bytes, list[bytes]]] = []  # (pgno, first_key, nodes)
    cur_nodes: list[bytes] = []
    cur_first: bytes | None = None
    cur_size = PAGEHDRSZ

    def flush_leaf():
        nonlocal cur_nodes, cur_first, cur_size
        if cur_nodes:
            leaves.append((alloc(), cur_first, cur_nodes))
        cur_nodes, cur_first, cur_size = [], None, PAGEHDRSZ

    for key, node in prepared:
        if cur_size + len(node) + 2 > PAGESIZE:
            flush_leaf()
        if cur_first is None:
            cur_first = key
        cur_nodes.append(node)
        cur_size += len(node) + 2
    flush_leaf()

    for pgno, _first, nodes in leaves:
        pages[pgno] = _pack_page(pgno, P_LEAF, nodes)

    if not leaves:
        root, depth = P_INVALID, 0
    elif len(leaves) == 1:
        root, depth = leaves[0][0], 1
    else:
        branch_nodes = []
        for j, (pgno, first, _nodes) in enumerate(leaves):
            key = b"" if j == 0 else first
            raw = _NODE_HDR.pack(pgno & 0xFFFF, (pgno >> 16) & 0xFFFF,
                                 (pgno >> 32) & 0xFFFF, len(key)) + key
            if len(raw) % 2:
                raw += b"\0"
            branch_nodes.append(raw)
        root = alloc()
        pages[root] = _pack_page(root, P_BRANCH, branch_nodes)
        depth = 2

    last_pg = next_pg - 1
    filesize = (last_pg + 1) * PAGESIZE
    buf = bytearray(filesize)
    for txnid, pg in ((0, 0), (1, 1)):
        off = pg * PAGESIZE
        _PAGE_HDR.pack_into(buf, off, pg, 0, P_META, 0, 0)
        moff = off + PAGEHDRSZ
        _META_HEAD.pack_into(buf, moff, MDB_MAGIC, MDB_DATA_VERSION, 0, filesize)
        dbs = moff + _META_HEAD.size
        _DB.pack_into(buf, dbs, 0, 0, 0, 0, 0, 0, 0, P_INVALID)  # FREE_DBI
        _DB.pack_into(buf, dbs + _DB.size, 0, 0, depth,
                      1 if depth == 2 else 0, len(leaves), n_overflow,
                      len(items), root)
        struct.pack_into("<QQ", buf, dbs + 2 * _DB.size, last_pg, txnid)
    for pgno, page in pages.items():
        buf[pgno * PAGESIZE:(pgno + 1) * PAGESIZE] = page
    with open(os.path.join(path, "data.mdb"), "wb") as f:
        f.write(buf)
    return path


__all__ = ["iterate_lmdb", "lmdb_entries", "write_lmdb"]
