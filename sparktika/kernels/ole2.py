"""OLE2 / Compound File Binary reader (from scratch, MS-CFB public spec).

Just enough to pull named streams out of legacy Office files: header,
DIFAT (header-resident entries), FAT chains, directory tree, and the
mini-stream (for streams below the mini cutoff). Used by kernels/xls.py
to reach the BIFF8 `Workbook` stream.

Bomb posture: all reads are bounds-checked against the actual byte
buffer; chain walks are capped at the theoretical sector count so a
crafted cyclic FAT terminates (KernelError) instead of spinning.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

from .errors import KernelError

MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_FREE = 0xFFFFFFFF
_ENDOFCHAIN = 0xFFFFFFFE


_NOSTREAM = 0xFFFFFFFF


@dataclass
class DirEntry:
    name: str
    obj_type: int  # 1=storage, 2=stream, 5=root
    start_sector: int
    size: int
    index: int = -1        # directory slot (tree pointers refer to slots)
    left: int = _NOSTREAM
    right: int = _NOSTREAM
    child: int = _NOSTREAM


class Ole2File:
    def __init__(self, data: bytes):
        if not data.startswith(MAGIC) or len(data) < 512:
            raise KernelError("not an OLE2 compound file")
        self.data = data
        (self.sector_shift,) = struct.unpack_from("<H", data, 30)
        (self.mini_shift,) = struct.unpack_from("<H", data, 32)
        if not (7 <= self.sector_shift <= 12) or self.mini_shift > self.sector_shift:
            raise KernelError("implausible OLE2 sector shifts")
        self.sector_size = 1 << self.sector_shift
        self.mini_size = 1 << self.mini_shift
        (self.n_fat_sectors,) = struct.unpack_from("<I", data, 44)
        (self.dir_start,) = struct.unpack_from("<I", data, 48)
        (self.mini_cutoff,) = struct.unpack_from("<I", data, 56)
        (self.minifat_start,) = struct.unpack_from("<I", data, 60)
        (self.n_minifat,) = struct.unpack_from("<I", data, 64)
        (self.difat_start,) = struct.unpack_from("<I", data, 68)
        (self.n_difat,) = struct.unpack_from("<I", data, 72)
        self.max_sectors = max(1, (len(data) - 512) // self.sector_size) + 1
        self.fat = self._read_fat()
        self.entries = self._read_directory()
        self.minifat = self._read_minifat()
        self._ministream: bytes | None = None

    # --- sector plumbing ---------------------------------------------------

    def _sector(self, n: int) -> bytes:
        off = 512 + n * self.sector_size
        if off < 512 or off + self.sector_size > len(self.data):
            raise KernelError(f"sector {n} out of bounds (truncated file)")
        return self.data[off : off + self.sector_size]

    def _read_fat(self) -> list[int]:
        difat: list[int] = list(struct.unpack_from("<109I", self.data, 76))
        # chained DIFAT sectors (rare; bounded)
        sec, hops = self.difat_start, 0
        per = self.sector_size // 4 - 1
        while sec not in (_ENDOFCHAIN, _FREE) and hops < self.max_sectors:
            raw = self._sector(sec)
            vals = struct.unpack(f"<{per + 1}I", raw)
            difat.extend(vals[:-1])
            sec = vals[-1]
            hops += 1
        fat: list[int] = []
        # only the first n_fat_sectors DIFAT entries are live; stale slots in
        # the header array (often zero-filled) must not be read as FAT sectors
        live = [fs for fs in difat if fs not in (_FREE, _ENDOFCHAIN)]
        for fs in live[: self.n_fat_sectors]:
            raw = self._sector(fs)
            fat.extend(struct.unpack(f"<{self.sector_size // 4}I", raw))
            if len(fat) >= self.max_sectors + self.sector_size // 4:
                break
        return fat

    def _chain(self, start: int, fat: list[int]) -> list[int]:
        out, sec, hops = [], start, 0
        while sec not in (_ENDOFCHAIN, _FREE) and sec < len(fat):
            out.append(sec)
            sec = fat[sec]
            hops += 1
            if hops > self.max_sectors * 2:
                raise KernelError("cyclic FAT chain (bomb guard)")
        return out

    def _read_stream_sectors(self, start: int, size: int) -> bytes:
        chunks = [self._sector(s) for s in self._chain(start, self.fat)]
        return b"".join(chunks)[:size]

    def _read_directory(self) -> list[DirEntry]:
        raw = self._read_stream_sectors(self.dir_start, 1 << 30)
        entries = []
        self._slots: list[DirEntry | None] = []
        for off in range(0, len(raw) - 127, 128):
            slot = off // 128
            name_len = struct.unpack_from("<H", raw, off + 64)[0]
            if name_len < 2 or name_len > 64:
                self._slots.append(None)
                continue
            name = raw[off : off + name_len - 2].decode("utf-16-le", "replace")
            obj_type = raw[off + 66]
            left, right, child = struct.unpack_from("<III", raw, off + 68)
            (start,) = struct.unpack_from("<I", raw, off + 116)
            (size,) = struct.unpack_from("<Q", raw, off + 120)
            if obj_type in (1, 2, 5):
                e = DirEntry(name, obj_type, start,
                             min(size, len(self.data) * 256),
                             index=slot, left=left, right=right, child=child)
                entries.append(e)
                self._slots.append(e)
            else:
                self._slots.append(None)
        return entries

    def _read_minifat(self) -> list[int]:
        if self.minifat_start in (_ENDOFCHAIN, _FREE) or self.n_minifat == 0:
            return []
        raw = self._read_stream_sectors(self.minifat_start, self.n_minifat * self.sector_size)
        return list(struct.unpack(f"<{len(raw) // 4}I", raw))

    def _mini_stream(self) -> bytes:
        if self._ministream is None:
            root = next((e for e in self.entries if e.obj_type == 5), None)
            if root is None:
                raise KernelError("OLE2 file has no root entry")
            self._ministream = self._read_stream_sectors(root.start_sector, root.size)
        return self._ministream

    # --- public API ----------------------------------------------------------

    def stream_names(self) -> list[str]:
        return [e.name for e in self.entries if e.obj_type == 2]

    def subtree(self, child_slot: int) -> list[DirEntry]:
        """All entries in the left/right sibling tree rooted at `child_slot`
        (a directory entry's `child` pointer). Cycle-safe and bounded; a
        NOSTREAM or out-of-range pointer yields an empty list — callers
        written against flat legacy files keep working."""
        out: list[DirEntry] = []
        stack = [child_slot]
        seen: set[int] = set()
        while stack:
            slot = stack.pop()
            if (slot == _NOSTREAM or slot >= len(self._slots)
                    or slot in seen):
                continue
            seen.add(slot)
            if len(seen) > len(self._slots):
                raise KernelError("cyclic OLE2 directory tree (bomb guard)")
            e = self._slots[slot]
            if e is None:
                continue
            out.append(e)
            stack.extend((e.left, e.right))
        return out

    def storage_children(self, storage: DirEntry) -> list[DirEntry]:
        return self.subtree(storage.child)

    def root_children(self) -> list[DirEntry]:
        """Top-level entries per the directory tree; falls back to 'every
        non-root entry' when the root's child pointer is absent (flat
        writers)."""
        root = next((e for e in self.entries if e.obj_type == 5), None)
        if root is not None and root.child != _NOSTREAM:
            kids = self.subtree(root.child)
            if kids:
                return kids
        return [e for e in self.entries if e.obj_type != 5]

    def read_entry(self, e: DirEntry) -> bytes:
        """Read a stream by its directory entry (unambiguous when the same
        stream name repeats across storages, e.g. per-attachment MAPI
        property streams)."""
        if e.size < self.mini_cutoff and self.minifat:
            mini = self._mini_stream()
            out, sec, hops = [], e.start_sector, 0
            while sec not in (_ENDOFCHAIN, _FREE) and sec < len(self.minifat):
                off = sec * self.mini_size
                out.append(mini[off : off + self.mini_size])
                sec = self.minifat[sec]
                hops += 1
                if hops > len(self.minifat) + 1:
                    raise KernelError("cyclic miniFAT chain (bomb guard)")
            return b"".join(out)[: e.size]
        return self._read_stream_sectors(e.start_sector, e.size)

    def read_stream(self, name: str) -> bytes:
        e = next((x for x in self.entries if x.obj_type == 2 and x.name == name), None)
        if e is None:
            raise KernelError(f"OLE2 stream not found: {name!r}")
        return self.read_entry(e)


class ScopedOle:
    """View of an Ole2File rooted at a sub-storage entry: the same read
    API, but `root_children()` / `stream_names()` / `read_stream()` are
    scoped to the storage's subtree. Lets kernels written against a
    file's root (msg, doc, xls) run unchanged on EMBEDDED compound
    documents (ObjectPool members, .msg attachment objects) without
    re-serializing them — the Spark-side analog of Tika's embedded
    document recursion (ref: tika-fork-main ConfigurableAutoDetectParser
    .java:131-165, installed for embedded docs at TikaForkMain.java:297).

    Lookups stay tree-scoped per the invariant that property/stream
    names repeat inside every sub-storage (kernels/msg.py regression)."""

    def __init__(self, ole: "Ole2File | ScopedOle", storage: DirEntry):
        # flatten nested scopes onto the backing file
        self._ole = ole._ole if isinstance(ole, ScopedOle) else ole
        self._storage = storage

    def root_children(self) -> list[DirEntry]:
        return self._ole.storage_children(self._storage)

    def storage_children(self, storage: DirEntry) -> list[DirEntry]:
        return self._ole.storage_children(storage)

    def read_entry(self, e: DirEntry) -> bytes:
        return self._ole.read_entry(e)

    def _subtree_entries(self) -> list[DirEntry]:
        out: list[DirEntry] = []
        stack = [self._storage]
        hops = 0
        while stack:
            st = stack.pop()
            hops += 1
            if hops > len(self._ole.entries) + 1:
                raise KernelError("cyclic OLE2 storage nesting (bomb guard)")
            for e in self._ole.storage_children(st):
                out.append(e)
                if e.obj_type == 1:
                    stack.append(e)
        return out

    def stream_names(self) -> list[str]:
        return [e.name for e in self._subtree_entries() if e.obj_type == 2]

    def read_stream(self, name: str) -> bytes:
        # direct children first (the overwhelmingly common layout for
        # embedded office docs), then deeper matches
        for e in self.root_children():
            if e.obj_type == 2 and e.name == name:
                return self.read_entry(e)
        for e in self._subtree_entries():
            if e.obj_type == 2 and e.name == name:
                return self.read_entry(e)
        raise KernelError(f"OLE2 stream not found in scope: {name!r}")
