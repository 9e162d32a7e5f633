"""SQLite database text extraction, from the public file format
(sqlite.org/fileformat2.html), from scratch.

Tika 1.20 ships SQLite3Parser (tika-parsers, linked by the reference's
build.gradle); crawls carry .sqlite/.db files constantly (app exports,
data dumps). This reader walks the real on-disk structure — no sqlite3
library at parse time, so a malicious database can't reach the C
engine:

  header      page size / reserved space / text encoding / page count
  b-trees     table leaves (0x0D) + interiors (0x05) in rowid order;
              WITHOUT ROWID tables live in index b-trees (0x0A/0x02)
              and render from their key records
  records     varint serial types: NULL / 1-8 byte ints / float64 /
              const 0,1 / text (header encoding) / blob (rendered "")
  overflow    payload spill chains, cycle- and length-guarded

Rendering mirrors the spreadsheet kernels: one line per table name
(sqlite_schema order), then each row's values tab-joined; floats use
the same integer-collapse formatting as xlsb/xlsx. sqlite_% internal
tables and indexes are skipped; virtual tables (rootpage 0) are
counted but yield no rows.

Bomb posture (invariant 7): page/row/depth caps, visited-set cycle
guards on b-tree and overflow walks, deadline polls, KernelError on
structural lies; a corrupt table degrades to its parsed prefix rather
than failing the file.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .errors import DeadlineError, KernelError, check_deadline

SQLITE_MIME = "application/x-sqlite3"
MAGIC = b"SQLite format 3\x00"

_MAX_PAGES_WALKED = 200_000
_MAX_ROWS = 500_000
_MAX_DEPTH = 20
_MAX_OVERFLOW = 10_000


@dataclass
class SqliteResult:
    text: str
    n_tables: int = 0
    table_names: list[str] = field(default_factory=list)
    truncated: bool = False
    metadata: dict[str, str] = field(default_factory=dict)


def _varint(buf: bytes, pos: int) -> tuple[int, int]:
    """SQLite varint: 1-9 bytes, big-endian 7-bit groups."""
    v = 0
    for i in range(8):
        b = buf[pos + i]
        v = (v << 7) | (b & 0x7F)
        if not b & 0x80:
            return v, pos + i + 1
    return (v << 8) | buf[pos + 8], pos + 9


# shared spreadsheet-family float collapse (r5 review 3: three verbatim
# copies would let a future NaN-class fix silently diverge oracles)
from .xlsb import _fmt_num as _fmt_float  # noqa: E402


def _declared_columns(sql: str):
    """(declared names, primary-key names) from CREATE TABLE sql, or
    (None, None) when unparseable. Tolerant mini-parser: top-level
    comma split, quoted identifiers, inline + table-level PRIMARY KEY."""
    import re

    m = re.search(r"\((.*)\)", sql, re.S)
    if not m:
        return None, None
    parts, depth, cur = [], 0, []
    for ch in m.group(1):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    names, pks = [], []
    for part in parts:
        part = part.strip()
        if not part:
            continue
        up = part.upper()
        if up.startswith(("PRIMARY", "UNIQUE", "CHECK", "FOREIGN",
                          "CONSTRAINT")):
            if up.startswith("PRIMARY"):
                inner = re.search(r"\((.*?)\)", part, re.S)
                if inner:
                    pks = [c.strip().strip('"`[]').split()[0]
                           for c in inner.group(1).split(",") if c.strip()]
            continue
        nm = part.split()[0].strip('"`[]')
        names.append(nm)
        if "PRIMARY KEY" in up:
            pks.append(nm)
    return (names, pks) if names else (None, None)


def _without_rowid_perm(sql: str):
    """Stored->declared permutation for a WITHOUT ROWID table: the
    index-btree record stores PK columns FIRST, then the rest in
    declared order — Tika's SELECT * rendering wants declared order
    (r5 review 3). None when the schema is unparseable."""
    names, pks = _declared_columns(sql)
    if not names or not pks:
        return None
    if len(set(names)) != len(names):
        # quoted multi-word identifiers truncate to their first token
        # (consistently on both sides, so ORDER survives) — but a
        # truncation COLLISION would mis-permute; fall back to stored
        return None
    stored = pks + [n for n in names if n not in pks]
    if sorted(stored) != sorted(names):
        return None
    return [stored.index(n) for n in names]


class _Db:
    def __init__(self, data: bytes, deadline: float | None):
        self.data = data
        self.deadline = deadline
        if len(data) < 512 or data[:16] != MAGIC:
            raise KernelError("sqlite: bad magic/too small")
        ps = int.from_bytes(data[16:18], "big")
        self.page_size = 65536 if ps == 1 else ps
        if self.page_size < 512 or self.page_size & (self.page_size - 1):
            raise KernelError("sqlite: invalid page size")
        self.reserved = data[20]
        self.usable = self.page_size - self.reserved
        if self.usable < 480:
            raise KernelError("sqlite: reserved space too large")
        enc = int.from_bytes(data[56:60], "big")
        self.encoding = {0: "utf-8", 1: "utf-8", 2: "utf-16-le",
                         3: "utf-16-be"}.get(enc)
        if self.encoding is None:
            raise KernelError(f"sqlite: unknown text encoding {enc}")
        self.n_pages = min(int.from_bytes(data[28:32], "big")
                           or len(data) // self.page_size,
                           len(data) // self.page_size)

    def page(self, num: int) -> bytes:
        if not 1 <= num <= self.n_pages:
            raise KernelError(f"sqlite: page {num} out of range")
        off = (num - 1) * self.page_size
        return self.data[off:off + self.page_size]

    # ---------------------------------------------------------- records
    def _record(self, payload: bytes) -> list:
        hlen, pos = _varint(payload, 0)
        serials = []
        while pos < hlen:
            st, pos = _varint(payload, pos)
            serials.append(st)
        vals: list = []
        pos = hlen
        for st in serials:
            if st == 0:
                vals.append(None)
            elif 1 <= st <= 6:
                n = (1, 2, 3, 4, 6, 8)[st - 1]
                vals.append(int.from_bytes(payload[pos:pos + n], "big",
                                           signed=True))
                pos += n
            elif st == 7:
                import struct
                vals.append(struct.unpack(">d", payload[pos:pos + 8])[0])
                pos += 8
            elif st == 8:
                vals.append(0)
            elif st == 9:
                vals.append(1)
            elif st >= 12 and st % 2 == 0:
                vals.append(payload[pos:pos + (st - 12) // 2])
                pos += (st - 12) // 2
            elif st >= 13:
                n = (st - 13) // 2
                vals.append(payload[pos:pos + n].decode(self.encoding,
                                                        "replace"))
                pos += n
            else:
                raise KernelError(f"sqlite: reserved serial type {st}")
        return vals

    def _payload(self, page: bytes, pos: int, plen: int,
                 leaf_type: int) -> bytes:
        """Cell payload with overflow resolution. U/X/M per the spec's
        leaf-overflow formulas (table leaf X = U-35; index X =
        ((U-12)*64/255)-23)."""
        u = self.usable
        x = u - 35 if leaf_type == 0x0D else ((u - 12) * 64) // 255 - 23
        if plen <= x:
            return page[pos:pos + plen]
        m = ((u - 12) * 32) // 255 - 23
        k = m + (plen - m) % (u - 4)
        stored = k if k <= x else m
        out = bytearray(page[pos:pos + stored])
        nxt = int.from_bytes(page[pos + stored:pos + stored + 4], "big")
        seen: set[int] = set()
        while nxt and len(out) < plen:
            check_deadline(self.deadline, "sqlite overflow")
            if nxt in seen or len(seen) > _MAX_OVERFLOW:
                raise KernelError("sqlite: overflow chain cycle/limit")
            seen.add(nxt)
            pg = self.page(nxt)
            nxt = int.from_bytes(pg[:4], "big")
            out += pg[4:4 + min(u - 4, plen - len(out))]
        if len(out) < plen:
            raise KernelError("sqlite: overflow chain short")
        return bytes(out)

    # ---------------------------------------------------------- b-trees
    def walk_table(self, root: int):
        """Yield records of the b-tree rooted at `root`, in key order.
        Handles rowid-table pages (0x05/0x0D) and index pages
        (0x02/0x0A — WITHOUT ROWID tables)."""
        # work stack of ("page", num, depth) | ("rec", payload-values):
        # interior INDEX pages interleave child subtrees with their own
        # key records, so exact key order needs both kinds queued
        stack: list[tuple] = [("page", root, 0)]
        visited: set[int] = set()
        walked = 0
        while stack:
            kind, *args = stack.pop()
            if kind == "rec":
                yield args[0]
                continue
            num, depth = args
            check_deadline(self.deadline, "sqlite btree")
            walked += 1
            if walked > _MAX_PAGES_WALKED or depth > _MAX_DEPTH:
                raise KernelError("sqlite: b-tree too large/deep")
            if num in visited:
                raise KernelError("sqlite: b-tree page cycle")
            visited.add(num)
            pg = self.page(num)
            hoff = 100 if num == 1 else 0
            ptype = pg[hoff]
            if ptype not in (0x02, 0x05, 0x0A, 0x0D):
                raise KernelError(f"sqlite: bad page type {ptype}")
            interior = ptype in (0x02, 0x05)
            ncell = int.from_bytes(pg[hoff + 3:hoff + 5], "big")
            parr = hoff + (12 if interior else 8)
            ptrs = [int.from_bytes(pg[parr + 2 * i:parr + 2 * i + 2], "big")
                    for i in range(ncell)]
            if interior:
                right = int.from_bytes(pg[hoff + 8:hoff + 12], "big")
                work: list[tuple] = []
                for p in ptrs:
                    child = int.from_bytes(pg[p:p + 4], "big")
                    work.append(("page", child, depth + 1))
                    if ptype == 0x02:
                        # interior index cell carries its own key record
                        plen, pos = _varint(pg, p + 4)
                        work.append(("rec", self._record(
                            self._payload(pg, pos, plen, 0x0A))))
                work.append(("page", right, depth + 1))
                stack.extend(reversed(work))
                continue
            for p in reversed(ptrs):
                if ptype == 0x0D:
                    plen, pos = _varint(pg, p)
                    _rowid, pos = _varint(pg, pos)
                else:  # 0x0A index leaf
                    plen, pos = _varint(pg, p)
                stack.append(("rec", self._record(
                    self._payload(pg, pos, plen, ptype))))


def extract_sqlite(data: bytes, max_chars: int = -1,
                   deadline: float | None = None) -> SqliteResult:
    import struct

    db = _Db(data, deadline)
    # sqlite_schema rows: (type, name, tbl_name, rootpage, sql).
    # IndexError/struct.error from truncated cells degrade like
    # KernelError — structural lies never escape the kernel boundary
    _SOFT = (KernelError, IndexError, struct.error, OverflowError)
    tables: list[tuple[str, int, str]] = []
    try:
        for rec in db.walk_table(1):
            if len(rec) >= 4 and rec[0] == "table":
                name, root = rec[1], rec[3]
                sql = rec[4] if len(rec) >= 5 and isinstance(rec[4], str) \
                    else ""
                if isinstance(name, str) and not name.startswith("sqlite_"):
                    tables.append((name,
                                   root if isinstance(root, int) else 0,
                                   sql))
    except DeadlineError:
        raise  # a timeout must surface as timeout, never a clean prefix
    except _SOFT:
        if not tables:
            raise KernelError("sqlite: schema unreadable")
        # keep whatever schema prefix parsed
    parts: list[str] = []
    n_chars = 0
    truncated = False
    for name, root, sql in tables:
        parts.append(name)
        n_chars += len(name) + 1
        if root == 0:
            continue  # virtual table: no storage
        perm = (_without_rowid_perm(sql)
                if "WITHOUT" in sql.upper().replace("\n", " ") else None)
        try:
            rows = 0
            for rec in db.walk_table(root):
                if perm is not None and len(rec) == len(perm):
                    rec = [rec[i] for i in perm]
                rows += 1
                if rows > _MAX_ROWS:
                    raise KernelError("sqlite: row count exceeds cap")
                cells = []
                for v in rec:
                    if v is None or isinstance(v, bytes):
                        cells.append("")
                    elif isinstance(v, float):
                        cells.append(_fmt_float(v))
                    else:
                        cells.append(str(v))
                line = "\t".join(cells)
                if any(cells):
                    parts.append(line)
                    n_chars += len(line) + 1
                if max_chars != -1 and n_chars > max_chars:
                    truncated = True
                    break
        except DeadlineError:
            raise
        except _SOFT:
            pass  # corrupt table: keep its parsed prefix + siblings
        if truncated:
            break
    text = "\n".join(parts) + ("\n" if parts else "")
    if max_chars != -1 and len(text) > max_chars:
        text = text[:max_chars]
        truncated = True
    return SqliteResult(text=text, n_tables=len(tables),
                        table_names=[t[0] for t in tables],
                        truncated=truncated,
                        metadata={"Content-Type": SQLITE_MIME})
