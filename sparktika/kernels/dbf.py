"""dBASE .dbf table kernel — from scratch.

Tika 1.20 parity: org.apache.tika.parser.dbf.DBFParser (added in Tika
1.16; reached by the reference via the tika-parsers:1.20 jar,
build.gradle). Built from the public xBase/dBASE III+ file layout:

- 32-byte header: version byte, YYMMDD last-update, u32 LE record
  count, u16 LE header size, u16 LE record size;
- 32-byte field descriptors from offset 32 until the 0x0D terminator:
  11-byte NUL-padded name, 1-byte type (C N F D L M...), 4 reserved,
  length, decimal count;
- fixed-width records after the header: 1-byte deletion flag (0x20
  live, 0x2A deleted) + the fields, ASCII/cp1252; 0x1A EOF marker.

DBF has NO magic, so detection (mime.detect_dbf) demands mutually
consistent header facts: a known version byte, a plausible update
date, header size == 32 + 32*n_fields + 1, and record size == 1 +
sum(field lengths) — four independent checks that random binary
virtually never satisfies together.

Text contract (extract_dbf_text oracle): first line is the TAB-joined
field names, then one TAB-joined line per live record with
per-type-trimmed values (C rstrip, N/F/D/L strip) — the same
row-rendering shape Tika's DBFParser writes into its XHTML table.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .errors import KernelError, check_deadline

_VERSIONS = {0x02, 0x03, 0x30, 0x31, 0x43, 0x63, 0x83, 0x8B, 0xCB, 0xF5}
_FIELD_TYPES = set(b"CNFDLMB@IO+GTY")
_MAX_FIELDS = 512
_MAX_RECORDS = 1_000_000


@dataclass
class DbfField:
    name: str
    ftype: str
    length: int
    decimals: int


@dataclass
class DbfResult:
    version: int
    n_records: int
    last_update: str            # YYYY-MM-DD
    fields: list[DbfField]
    rows: list[list[str]] = field(default_factory=list)
    truncated: bool = False

    def render_text(self) -> str:
        lines = ["\t".join(f.name for f in self.fields)]
        lines += ["\t".join(r) for r in self.rows]
        return "".join(ln + "\n" for ln in lines)


def looks_like_dbf(data: bytes) -> bool:
    """Magic-less detection: four independent header consistency checks."""
    if len(data) < 68:  # header + >=1 field descriptor + terminator
        return False
    if data[0] not in _VERSIONS:
        return False
    yy, mm, dd = data[1], data[2], data[3]
    if not (1 <= mm <= 12 and 1 <= dd <= 31):
        return False
    header_size = int.from_bytes(data[8:10], "little")
    record_size = int.from_bytes(data[10:12], "little")
    if header_size < 65 or (header_size - 33) % 32 != 0 or record_size < 2:
        return False
    n_fields = (header_size - 33) // 32
    if not 1 <= n_fields <= _MAX_FIELDS or 32 + 32 * n_fields >= len(data):
        return False
    total = 1
    for i in range(n_fields):
        off = 32 + 32 * i
        if data[off] == 0x0D:
            return False        # terminator before the declared count
        if data[off + 11] not in _FIELD_TYPES:
            return False
        total += data[off + 16]
    if data[32 + 32 * n_fields] != 0x0D:
        return False
    return total == record_size


def parse_dbf(data: bytes, max_chars: int = 1 << 24,
              deadline: float | None = None) -> DbfResult:
    if not looks_like_dbf(data):
        raise KernelError("dbf: header consistency checks failed")
    version = data[0]
    yy, mm, dd = data[1], data[2], data[3]
    year = 1900 + yy if yy >= 70 else 2000 + yy
    n_records = int.from_bytes(data[4:8], "little")
    header_size = int.from_bytes(data[8:10], "little")
    record_size = int.from_bytes(data[10:12], "little")
    n_fields = (header_size - 33) // 32
    fields: list[DbfField] = []
    for i in range(n_fields):
        off = 32 + 32 * i
        raw_name = data[off: off + 11].split(b"\x00", 1)[0]
        fields.append(DbfField(
            name=raw_name.decode("cp1252", "replace"),
            ftype=chr(data[off + 11]),
            length=data[off + 16],
            decimals=data[off + 17]))

    if n_records > _MAX_RECORDS:
        raise KernelError(f"dbf: implausible record count {n_records}")
    rows: list[list[str]] = []
    truncated = False
    out_chars = 0
    pos = header_size
    for r in range(n_records):
        if r % 1024 == 0:
            check_deadline(deadline, "dbf records")
        if pos >= len(data) or data[pos] == 0x1A:
            # historic writers sometimes place the EOF marker before the
            # declared count — stop cleanly rather than refuse
            break
        if pos + record_size > len(data):
            raise KernelError("dbf: truncated record area")
        flag = data[pos]
        if flag == 0x2A:        # deleted
            pos += record_size
            continue
        if flag != 0x20:
            raise KernelError(f"dbf: bad deletion flag {flag:#x}")
        vals: list[str] = []
        fpos = pos + 1
        for f in fields:
            raw = data[fpos: fpos + f.length]
            s = raw.decode("cp1252", "replace")
            s = s.rstrip() if f.ftype == "C" else s.strip()
            vals.append(s)
            fpos += f.length
        out_chars += sum(len(v) + 1 for v in vals)
        if out_chars > max_chars:
            truncated = True
            break
        rows.append(vals)
        pos += record_size

    return DbfResult(
        version=version, n_records=n_records,
        last_update=f"{year:04d}-{mm:02d}-{dd:02d}",
        fields=fields, rows=rows, truncated=truncated)


def build_dbf(fields: list[tuple[str, str, int]],
              rows: list[list[str]], last_update=(26, 1, 15),
              version: int = 0x03,
              deleted_rows: set[int] | None = None) -> bytes:
    """Writer for synth corpora / tests: dBASE III layout, live records
    only, values space-padded (C left-justified, others right)."""
    n_fields = len(fields)
    record_size = 1 + sum(ln for _, _, ln in fields)
    header_size = 32 + 32 * n_fields + 1
    yy, mm, dd = last_update
    hdr = bytearray(32)
    hdr[0] = version
    hdr[1], hdr[2], hdr[3] = yy, mm, dd
    hdr[4:8] = len(rows).to_bytes(4, "little")
    hdr[8:10] = header_size.to_bytes(2, "little")
    hdr[10:12] = record_size.to_bytes(2, "little")
    out = bytearray(hdr)
    for name, ftype, ln in fields:
        d = bytearray(32)
        d[0:11] = name.encode("cp1252")[:11].ljust(11, b"\x00")
        d[11] = ord(ftype)
        d[16] = ln
        out += d
    out.append(0x0D)
    for ri, row in enumerate(rows):
        out.append(0x2A if deleted_rows and ri in deleted_rows else 0x20)
        for (name, ftype, ln), val in zip(fields, row):
            b = val.encode("cp1252")[:ln]
            out += b.ljust(ln, b" ") if ftype == "C" else b.rjust(ln, b" ")
    out.append(0x1A)
    return bytes(out)
