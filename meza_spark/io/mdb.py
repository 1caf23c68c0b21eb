"""Pure-stdlib read-only parser for MS Access Jet4 databases (.mdb).

The reference shells out to the mdbtools CLI (ref: meza/io.py:598-674,
``mdb-tables``/``mdb-export`` subprocess pipes); this container has no
mdbtools, so this module parses the Jet4 on-disk format directly from
the PUBLIC format documentation (the mdbtools project's HACKING notes
describe the page/TDEF/row layouts; Jet "unicode compression" is the
documented 0xFFFE-prefix toggle scheme).

Format scope — honest gates, not silent wrong answers:
  - Jet4 (Access 2000+, 4 KB pages): supported — table catalog
    (MSysObjects), TDEF column defs, fixed/var row cracking, null
    mask, overflow (lookup) rows, compressed/UTF-16 text, inline +
    single-page + chained LVAL memos, bool/byte/int/long/money/
    float/double/datetime/text/memo/GUID. Validated against the
    reference's real Access-generated test.mdb (mdb-export parity).
  - Jet3 (Access 97, 2 KB pages): supported — 2 KB pages, 18-byte
    column entries (type@0, num@1, varnum@3, flags@13,
    fixed-offset@14, length@16 per the mdbtools HACKING layout),
    1-byte name lengths, latin-1 text, 1-byte row column counts and
    var-offset tails, rows ≥ 256 bytes via the JUMP-TABLE var-offset
    scheme (mdbtools mdb_crack_row3 semantics: one slot per 256 row
    bytes holding the var-column index where the segment counter
    increments, with the dummy-last-slot rule), and LVAL memos (the
    12-byte descriptor layout is shared with Jet4; only the text
    encoding differs). No real Access-97 file exists in this
    container, so the Jet3 path is verified by writer→parser
    roundtrip plus the shared-machinery argument (everything but the
    fmt constants is the same code the real Jet4 fixture validates);
    per the r5 ADVICE, TDEF parsing carries structural sanity checks
    (known type codes, in-page extents, name bounds) so a diverged
    constant fails loudly instead of returning silently wrong rows.

A minimal WRITER (``build_jet`` / ``records2mdb`` in io/writers.py)
exists so the reader can be differential-oracle-gated (mdb_roundtrip)
and Jet3 fixture units are possible at all; it emits the exact subset
the parser documents (no indexes, no usage maps, single-page TDEFs).

Scale note: .mdb is a desktop format hard-capped at 2 GB, so the
driver-side parse + ``createDataFrame`` path (one file per task via
``io_join`` for many files) is the right distribution model — same
policy as xls/dbf (SURVEY §4.2.3).
"""

from __future__ import annotations

import struct
from datetime import datetime, timedelta

__all__ = ["JetDb", "JetTable", "JetColumn", "build_jet"]

_EPOCH = datetime(1899, 12, 30)

# Per-version format constants (public: mdbtools HACKING). Offsets are
# within a page unless noted; col_* are within one column entry.
_FMT = {
    3: dict(page_size=2048, version_byte=0x00,
            tdef_num_rows=0x0C, tdef_max_cols=0x15, tdef_num_var=0x17,
            tdef_num_cols=0x19, tdef_num_ridx=0x1F, tdef_cols_start=0x2B,
            ridx_entry=8, col_entry=18,
            col_num=1, col_varnum=3, col_flags=13, col_offf=14,
            col_len=16,
            data_nrows=0x08, data_offs=0x0A,
            rcols_size=1, voff_size=1),
    4: dict(page_size=4096, version_byte=0x01,
            tdef_num_rows=0x10, tdef_max_cols=0x29, tdef_num_var=0x2B,
            tdef_num_cols=0x2D, tdef_num_ridx=0x33, tdef_cols_start=0x3F,
            ridx_entry=12, col_entry=25,
            col_num=5, col_varnum=7, col_flags=15, col_offf=21,
            col_len=23,
            data_nrows=0x0C, data_offs=0x0E,
            rcols_size=2, voff_size=2),
}

# Jet column type codes (public, mdbtools HACKING)
BOOL, BYTE, INT, LONGINT, MONEY, FLOAT, DOUBLE, DATETIME = \
    0x01, 0x02, 0x03, 0x04, 0x05, 0x06, 0x07, 0x08
BINARY, TEXT, OLE, MEMO, GUID, NUMERIC = \
    0x09, 0x0A, 0x0B, 0x0C, 0x0F, 0x10
_KNOWN_TYPES = {BOOL, BYTE, INT, LONGINT, MONEY, FLOAT, DOUBLE,
                DATETIME, BINARY, TEXT, OLE, MEMO, GUID, NUMERIC,
                0x0D, 0x0E, 0x12}      # repid/unknown/complex appear
                                       # in real system catalogs


class JetColumn:
    __slots__ = ("name", "type", "num", "off_v", "off_f", "length",
                 "is_fixed")

    def __repr__(self):
        return (f"JetColumn({self.name!r}, type={self.type}, "
                f"num={self.num}, fixed={self.is_fixed})")


# Hostile/corrupt .mdb bytes must surface as the dispatcher-expected
# ValueError, not raw IndexError/struct.error from deep in the page
# walk — at crawl scale a damaged file fails its task cleanly (and
# `unsupported`-style callers can skip it) instead of presenting an
# exception class nobody catches. Found by the round-7 byte-mutation
# fuzz (tests/test_properties.py::test_io_parser_fuzz_never_bombs).
_CORRUPT_ERRS = (struct.error, IndexError, KeyError, UnicodeDecodeError,
                 OverflowError, ZeroDivisionError)


def _corrupt_guard(fn):
    import functools

    @functools.wraps(fn)
    def wrap(*a, **k):
        try:
            return fn(*a, **k)
        except _CORRUPT_ERRS as e:
            raise ValueError(
                f"corrupt mdb: {type(e).__name__}: {e}") from e
    return wrap


class JetTable:
    @_corrupt_guard
    def __init__(self, db: "JetDb", name: str, tdef_pg: int):
        self.db = db
        self.name = name
        self.tdef_pg = tdef_pg
        self._parse_tdef()

    def _parse_tdef(self):
        db = self.db
        pg = db.page(self.tdef_pg)
        if not pg or pg[0] != 0x02:
            raise ValueError(f"page {self.tdef_pg} is not a TDEF page")
        # stitch continuation pages: the TDEF payload continues after
        # each continuation page's 8-byte header; a corrupt pointer
        # chain (cycle or out-of-range) must not loop forever
        buf = bytearray(pg)
        nxt, = struct.unpack_from("<I", pg, 4)
        seen = {self.tdef_pg}
        while nxt:
            if nxt in seen or nxt >= db.num_pages:
                raise ValueError("corrupt TDEF continuation chain")
            seen.add(nxt)
            cont = db.page(nxt)
            buf += cont[8:]
            nxt, = struct.unpack_from("<I", cont, 4)
        pg = bytes(buf)
        fmt = db.fmt
        self.num_rows, = struct.unpack_from("<I", pg, fmt["tdef_num_rows"])
        self.max_cols, = struct.unpack_from("<H", pg, fmt["tdef_max_cols"])
        self.num_var_cols, = struct.unpack_from("<H", pg, fmt["tdef_num_var"])
        self.num_cols, = struct.unpack_from("<H", pg, fmt["tdef_num_cols"])
        num_real_idx, = struct.unpack_from("<I", pg, fmt["tdef_num_ridx"])
        pos = fmt["tdef_cols_start"] + num_real_idx * fmt["ridx_entry"]
        # structural sanity (r5 ADVICE): no real Access-97 fixture
        # exists in this container, so a diverged _FMT[3] constant
        # must FAIL LOUDLY here instead of silently returning wrong
        # rows — validate entry extents, known type codes, and name
        # offsets against the stitched TDEF before trusting them
        if self.num_cols > 255 or \
                pos + self.num_cols * fmt["col_entry"] > len(pg):
            raise ValueError(
                f"TDEF for {self.name!r} declares {self.num_cols} "
                "columns past the page extent — corrupt file or "
                "unsupported Jet layout")
        cols = []
        unknown_types = 0
        for _ in range(self.num_cols):
            c = JetColumn()
            c.type = pg[pos]
            if c.type not in _KNOWN_TYPES:
                # a single exotic type code (newer Access 'calculated'
                # etc.) still reads — _value falls back to raw bytes —
                # but a MAJORITY of unknown codes means the column
                # stride itself is wrong (diverged _FMT constant /
                # corrupt TDEF): fail loudly rather than return
                # silently wrong rows
                unknown_types += 1
            c.num, = struct.unpack_from("<H", pg, pos + fmt["col_num"])
            c.off_v, = struct.unpack_from("<H", pg, pos + fmt["col_varnum"])
            c.is_fixed = bool(pg[pos + fmt["col_flags"]] & 0x01)
            c.off_f, = struct.unpack_from("<H", pg, pos + fmt["col_offf"])
            c.length, = struct.unpack_from("<H", pg, pos + fmt["col_len"])
            cols.append(c)
            pos += fmt["col_entry"]
        if cols and unknown_types > len(cols) // 2:
            raise ValueError(
                f"TDEF for {self.name!r}: {unknown_types} of "
                f"{len(cols)} column type codes are unknown — corrupt "
                "file or unsupported Jet layout")
        for c in cols:
            if db.version >= 4:
                nlen, = struct.unpack_from("<H", pg, pos)
                if nlen > 128 or pos + 2 + nlen > len(pg):
                    raise ValueError(
                        f"TDEF for {self.name!r} has a column name "
                        "overrunning the page — corrupt file or "
                        "unsupported Jet layout")
                c.name = pg[pos + 2:pos + 2 + nlen].decode("utf-16-le")
                pos += 2 + nlen
            else:
                nlen = pg[pos]
                if nlen == 0 or pos + 1 + nlen > len(pg):
                    raise ValueError(
                        f"TDEF for {self.name!r} has a column name "
                        "overrunning the page — corrupt file or "
                        "unsupported Jet layout")
                c.name = pg[pos + 1:pos + 1 + nlen].decode("latin-1")
                pos += 1 + nlen
        # row layout order = column number order
        self.columns = sorted(cols, key=lambda c: c.num)

    # -- row access ------------------------------------------------------

    def rows(self):
        """Yield rows as dicts (column name → python value) from every
        data page owned by this table's TDEF. Page discovery is a
        single sweep of the (≤2 GB) file — the usage-map walk mdbtools
        does buys nothing at this format's size cap. Corrupt pages
        surface as ValueError (see _corrupt_guard)."""
        try:
            yield from self._rows_walk()
        except _CORRUPT_ERRS as e:
            raise ValueError(
                f"corrupt mdb: {type(e).__name__}: {e}") from e

    def _rows_walk(self):
        db = self.db
        for p in range(db.num_pages):
            pg = db.page(p)
            if not pg or pg[0] != 0x01:
                continue
            owner, = struct.unpack_from("<I", pg, 4)
            if owner != self.tdef_pg:
                continue
            yield from self._page_rows(p)

    def _page_rows(self, pgno: int):
        db = self.db
        pg = db.page(pgno)
        nrows, = struct.unpack_from("<H", pg, db.fmt["data_nrows"])
        offs = [struct.unpack_from("<H", pg, db.fmt["data_offs"] + 2 * i)[0]
                for i in range(nrows)]
        prev = db.page_size
        for off in offs:
            start = off & 0x1FFF
            end = prev
            prev = start
            if off & 0x8000:        # deleted
                continue
            row = pg[start:end]
            if off & 0x4000:        # lookup: 4-byte pointer to the
                row = db.row_bytes(  # overflow page holding the row
                    struct.unpack_from("<I", row, 0)[0])
                if row is None:
                    continue
            out = self._crack_row(row)
            if out is not None:
                yield out

    def _crack_row(self, row: bytes):
        fmt = self.db.fmt
        rsz, vsz = fmt["rcols_size"], fmt["voff_size"]
        if len(row) < rsz:
            return None
        rcols = row[0] if rsz == 1 else struct.unpack_from("<H", row, 0)[0]
        bm = (rcols + 7) // 8
        if len(row) < bm + rsz:
            return None
        nullmask = row[len(row) - bm:]

        def has_value(num):
            return bool(nullmask[num // 8] >> (num % 8) & 1) \
                if num < rcols else False

        var_off = None
        if self.num_var_cols:
            base = len(row) - bm - vsz
            if vsz == 2:
                rvar, = struct.unpack_from("<H", row, base)
                var_off = [struct.unpack_from(
                    "<H", row, base - 2 * (i + 1))[0]
                    for i in range(rvar + 1)]
            else:
                # Jet3: 1-byte offsets are LOW bytes; rows >= 256
                # bytes add a jump table between the var-count byte
                # and the var table — one slot per 256 bytes of row,
                # each holding the var-column index at which the
                # 256-segment counter increments (mdbtools
                # mdb_crack_row3 semantics, incl. the dummy-last-jump
                # rule: the slot is always present, its entry is
                # ignored when no offset can reach that segment).
                rvar = row[base]
                row_len = len(row)
                num_jumps = (row_len - 1) // 256
                col_ptr = row_len - bm - num_jumps - 2
                if num_jumps and (col_ptr - rvar) // 256 < num_jumps:
                    num_jumps -= 1
                jump = [row[row_len - bm - 2 - j]
                        for j in range(num_jumps)]
                var_off = []
                jumps_used = 0
                for i in range(rvar + 1):
                    while jumps_used < num_jumps \
                            and i == jump[jumps_used]:
                        jumps_used += 1
                    var_off.append(row[col_ptr - i] + 256 * jumps_used)
        out = {}
        for c in self.columns:
            bit = has_value(c.num)
            if c.type == BOOL:       # stored IN the null mask
                out[c.name] = bit
                continue
            if not bit:
                out[c.name] = None
                continue
            if c.is_fixed:
                data = row[rsz + c.off_f:rsz + c.off_f + c.length]
            else:
                if var_off is None or c.off_v >= len(var_off) - 1:
                    out[c.name] = None
                    continue
                data = row[var_off[c.off_v]:var_off[c.off_v + 1]]
            out[c.name] = self._value(c, data)
        return out

    def _value(self, c: JetColumn, b: bytes):
        t = c.type
        try:
            if t == BYTE:
                return b[0]
            if t == INT:
                return struct.unpack("<h", b[:2])[0]
            if t == LONGINT:
                return struct.unpack("<i", b[:4])[0]
            if t == MONEY:
                from decimal import Decimal

                return (Decimal(struct.unpack("<q", b[:8])[0])
                        / Decimal(10000))
            if t == FLOAT:
                return struct.unpack("<f", b[:4])[0]
            if t == DOUBLE:
                return struct.unpack("<d", b[:8])[0]
            if t == DATETIME:
                days = struct.unpack("<d", b[:8])[0]
                # Access stores time-of-day as |fraction|; round to
                # the nearest second (double jitter)
                base = _EPOCH + timedelta(days=int(days))
                frac = abs(days - int(days))
                return base + timedelta(
                    seconds=round(frac * 86400))
            if t == TEXT:
                return _decode_text(b, self.db.version)
            if t == MEMO:
                # same 12-byte descriptor layout in Jet3 and Jet4
                # (mdbtools reads both through one path); only the
                # text payload encoding differs (latin-1 vs UTF-16)
                return self._lval(b)
            if t == GUID:
                return b[:16].hex()
            if t in (BINARY, OLE):
                return bytes(b)
        except (struct.error, IndexError):
            return None
        return bytes(b)

    def _lval(self, b: bytes):
        """Memo/OLE long value: 12-byte descriptor → inline bytes or
        LVAL page row(s); payload text decodes per the file version
        (latin-1 for Jet3, UTF-16/compressed for Jet4)."""
        ver = self.db.version
        if len(b) < 12:
            return _decode_text(b, ver)
        memo_len = int.from_bytes(b[:3], "little")
        flags = b[3]
        if flags & 0x80:            # inline
            return _decode_text(b[12:12 + memo_len], ver)
        ptr, = struct.unpack_from("<I", b, 4)
        if flags & 0x40:            # single LVAL page row
            data = self.db.row_bytes(ptr)
            return _decode_text(data or b"", ver)
        chunks = []                  # chained LVAL rows
        seen = set()                 # corrupt-file cycle guard
        while ptr and ptr not in seen:
            seen.add(ptr)
            data = self.db.row_bytes(ptr)
            if data is None or len(data) < 4:
                break
            ptr, = struct.unpack_from("<I", data, 0)
            chunks.append(data[4:])
        return _decode_text(b"".join(chunks)[:memo_len], ver)


class JetDb:
    """Read-only Jet4 database. ``list_tables()`` resolves user-table
    names from the MSysObjects catalog (TDEF fixed at page 2);
    ``table(name)`` parses its TDEF and iterates rows."""

    MSYSOBJECTS_PG = 2

    def __init__(self, path_or_bytes):
        if isinstance(path_or_bytes, (bytes, bytearray)):
            self.data = bytes(path_or_bytes)
        else:
            with open(path_or_bytes, "rb") as f:
                self.data = f.read()
        if self.data[4:19] != b"Standard Jet DB":
            raise ValueError("not a Jet (.mdb) database")
        if len(self.data) < 0x200:
            raise ValueError("truncated Jet database header")
        self.version = 4 if self.data[0x14] >= 1 else 3
        self.fmt = _FMT[self.version]
        self.page_size = self.fmt["page_size"]
        self.num_pages = len(self.data) // self.page_size

    def page(self, n: int) -> bytes:
        return self.data[n * self.page_size:(n + 1) * self.page_size]

    def row_bytes(self, ptr: int):
        """Resolve a (page, row) pointer — low byte row number, upper
        3 bytes page — to that row's byte span, or None if deleted."""
        rowno = ptr & 0xFF
        pgno = ptr >> 8
        if not 0 < pgno < self.num_pages:
            return None
        pg = self.page(pgno)
        nrows, = struct.unpack_from("<H", pg, self.fmt["data_nrows"])
        if rowno >= nrows:
            return None
        offs = self.fmt["data_offs"]
        off, = struct.unpack_from("<H", pg, offs + 2 * rowno)
        if off & 0x8000:
            return None
        end = self.page_size if rowno == 0 else (
            struct.unpack_from("<H", pg, offs + 2 * (rowno - 1))[0]
            & 0x1FFF)
        return pg[off & 0x1FFF:end]

    @_corrupt_guard
    def list_tables(self, include_system: bool = False):
        """``[(name, tdef_page)]`` in catalog order — the order
        ``mdb-tables`` prints (the reference's "first table" default,
        ref meza/io.py:639-656)."""
        cat = JetTable(self, "MSysObjects", self.MSYSOBJECTS_PG)
        out = []
        for row in cat.rows():
            typ = row.get("Type")
            name = row.get("Name")
            tid = row.get("Id")
            if typ is None or name is None or tid is None:
                continue
            if not isinstance(typ, int) or not isinstance(tid, int) \
                    or not isinstance(name, str):
                # corrupt catalog rows can decode any column under a
                # wrong type code (fuzz find) — skip, don't TypeError
                continue
            if (typ & 0x7F) != 1:    # 1 = table
                continue
            system = name.startswith(("MSys", "~"))
            if system and not include_system:
                continue
            out.append((name, tid & 0x00FFFFFF))
        return out

    @_corrupt_guard
    def table(self, name: str | None = None) -> JetTable:
        tables = self.list_tables()
        if not tables:
            raise ValueError("no user tables in database")
        if name is None:
            name, pg = tables[0]
        else:
            match = [t for t in tables if t[0] == name]
            if not match:
                raise ValueError(
                    f"table {name!r} not found; have "
                    f"{[t[0] for t in tables]}")
            name, pg = match[0]
        return JetTable(self, name, pg)


def _decode_text(b: bytes, version: int = 4) -> str:
    """Text payload → str. Jet3 stores latin-1 bytes; Jet4 stores
    UTF-16LE, with a 0xFFFE prefix marking the documented
    unicode-compression scheme (0x00 toggles between 1-byte and 2-byte
    characters)."""
    if version < 4:
        return b.decode("latin-1")
    if len(b) >= 2 and b[0] == 0xFF and b[1] == 0xFE:
        out = bytearray()
        i, comp = 2, True
        n = len(b)
        while i < n:
            if b[i] == 0x00:
                # toggle marker at a char boundary flips the mode
                # (mirrors mdbtools decompress_unicode)
                comp = not comp
                i += 1
            elif comp:
                out += bytes((b[i], 0))
                i += 1
            elif i + 1 < n:
                out += b[i:i + 2]
                i += 2
            else:
                break
        return out.decode("utf-16-le", errors="replace")
    try:
        return b.decode("utf-16-le")
    except UnicodeDecodeError:
        return b.decode("latin-1")


# ---------------------------------------------------------------------------
# Minimal Jet writer (fixture generation + records2mdb sink)
# ---------------------------------------------------------------------------

def _encode_text(s: str, version: int) -> bytes:
    if version < 4:
        return s.encode("latin-1", errors="replace")
    return s.encode("utf-16-le")


def _py_coltype(values):
    """Infer a Jet column type from the first non-None python value.
    Returns (jet_type, is_fixed, fixed_len)."""
    from decimal import Decimal

    v = next((x for x in values if x is not None), None)
    if isinstance(v, bool):
        return BOOL, True, 0
    if isinstance(v, int):
        return LONGINT, True, 4
    if isinstance(v, float):
        return DOUBLE, True, 8
    if isinstance(v, Decimal):
        return MONEY, True, 8
    if isinstance(v, datetime):
        return DATETIME, True, 8
    if isinstance(v, (bytes, bytearray)):
        return BINARY, False, 0
    return TEXT, False, 0          # str / all-null


def _encode_value(t: int, v, version: int) -> bytes:
    from decimal import Decimal

    if t == LONGINT:
        if not -(1 << 31) <= v < (1 << 31):
            raise ValueError(
                f"value {v} exceeds Access LONGINT (int32) range — "
                "store as double or text")
        return struct.pack("<i", v)
    if t == DOUBLE:
        return struct.pack("<d", float(v))
    if t == MONEY:
        return struct.pack("<q", int(Decimal(v) * 10000))
    if t == DATETIME:
        delta = v - _EPOCH
        days = delta.days + delta.seconds / 86400.0
        return struct.pack("<d", days)
    if t == TEXT:
        return _encode_text(str(v), version)
    if t == BINARY:
        return bytes(v)
    raise ValueError(f"unsupported jet type {t}")


class _JetWriter:
    """Assembles a minimal, parser-complete Jet file: page 0 header,
    MSysObjects catalog (TDEF page 2 + one data page), one TDEF + data
    pages per user table. No usage maps, no indexes, single-page
    TDEFs — exactly the documented subset ``JetDb`` reads."""

    def __init__(self, version: int = 4, memo_threshold: int | None = None):
        if version not in _FMT:
            raise ValueError(f"jet version must be 3 or 4, got {version}")
        self.version = version
        self.fmt = _FMT[version]
        self.memo_threshold = memo_threshold
        self.pages: list[bytearray] = []

    def _new_page(self) -> int:
        self.pages.append(bytearray(self.fmt["page_size"]))
        return len(self.pages) - 1

    # -- TDEF -------------------------------------------------------------

    def _tdef_page(self, pgno: int, cols, num_rows: int):
        """cols: [(name, jet_type, is_fixed, off_f, off_v, length)]"""
        fmt, pg = self.fmt, self.pages[pgno]
        pg[0] = 0x02
        pg[1] = 0x01
        struct.pack_into("<I", pg, 4, 0)                  # no continuation
        struct.pack_into("<I", pg, fmt["tdef_num_rows"], num_rows)
        struct.pack_into("<H", pg, fmt["tdef_max_cols"], len(cols))
        nvar = sum(1 for c in cols if not c[2])
        struct.pack_into("<H", pg, fmt["tdef_num_var"], nvar)
        struct.pack_into("<H", pg, fmt["tdef_num_cols"], len(cols))
        struct.pack_into("<I", pg, fmt["tdef_num_ridx"], 0)
        pos = fmt["tdef_cols_start"]
        for num, (name, t, is_fixed, off_f, off_v, length) in \
                enumerate(cols):
            pg[pos] = t
            struct.pack_into("<H", pg, pos + fmt["col_num"], num)
            struct.pack_into("<H", pg, pos + fmt["col_varnum"], off_v)
            pg[pos + fmt["col_flags"]] = 0x01 if is_fixed else 0x02
            struct.pack_into("<H", pg, pos + fmt["col_offf"], off_f)
            struct.pack_into("<H", pg, pos + fmt["col_len"], length)
            pos += fmt["col_entry"]
        for name, *_ in cols:
            if self.version >= 4:
                nb = name.encode("utf-16-le")
                struct.pack_into("<H", pg, pos, len(nb))
                pg[pos + 2:pos + 2 + len(nb)] = nb
                pos += 2 + len(nb)
            else:
                nb = name.encode("latin-1")
                pg[pos] = len(nb)
                pg[pos + 1:pos + 1 + len(nb)] = nb
                pos += 1 + len(nb)
        if pos > fmt["page_size"]:
            raise ValueError("TDEF exceeds one page (too many/long "
                             "column names for the minimal writer)")

    # -- rows -------------------------------------------------------------

    def _lval_store(self, payload: bytes) -> bytes:
        """Place a memo payload on LVAL page(s) and return its 12-byte
        descriptor (+ nothing inline). Small payloads inline (flag
        0x80), one-page payloads use a single LVAL row (0x40), larger
        ones a backward-built chain of (next_ptr, chunk) rows (0x00) —
        the three layouts :meth:`JetTable._lval` reads."""
        fmt = self.fmt
        max_row = fmt["page_size"] - fmt["data_offs"] - 2

        def lval_row(data: bytes) -> int:
            pgno = self._new_page()
            pg = self.pages[pgno]
            pg[0] = 0x01
            pg[1] = 0x01
            pg[4:8] = b"LVAL"          # owner slot marks LVAL pages,
            #                            so table sweeps skip them
            floor_ = fmt["page_size"] - len(data)
            pg[floor_:floor_ + len(data)] = data
            struct.pack_into("<H", pg, fmt["data_nrows"], 1)
            struct.pack_into("<H", pg, fmt["data_offs"], floor_)
            return (pgno << 8) | 0
        n = len(payload)
        if n + 12 <= 64:                       # inline
            return (n.to_bytes(3, "little") + b"\x80"
                    + b"\x00" * 8 + payload)
        if n <= max_row:                       # single LVAL row
            ptr = lval_row(payload)
            return (n.to_bytes(3, "little") + b"\x40"
                    + struct.pack("<I", ptr) + b"\x00" * 4)
        chunk = max_row - 4                    # chained LVAL rows
        ptr = 0
        for at in range(((n - 1) // chunk) * chunk, -1, -chunk):
            ptr = lval_row(struct.pack("<I", ptr)
                           + payload[at:at + chunk])
        return (n.to_bytes(3, "little") + b"\x00"
                + struct.pack("<I", ptr) + b"\x00" * 4)

    def _encode_row(self, cols, rec: dict) -> bytes:
        fmt = self.fmt
        rsz, vsz = fmt["rcols_size"], fmt["voff_size"]
        rcols = len(cols)
        bm = (rcols + 7) // 8
        fixed_size = max((c[3] + c[5] for c in cols if c[2]), default=0)
        fixed = bytearray(fixed_size)
        nullmask = bytearray(bm)
        var_data = bytearray()
        nvar = sum(1 for c in cols if not c[2])
        var_off = [0] * (nvar + 1)
        var_start = rsz + fixed_size
        for num, (name, t, is_fixed, off_f, off_v, length) in \
                enumerate(cols):
            v = rec.get(name)
            if t == BOOL:
                if v:
                    nullmask[num // 8] |= 1 << (num % 8)
                continue
            if is_fixed:
                if v is not None:
                    nullmask[num // 8] |= 1 << (num % 8)
                    fixed[off_f:off_f + length] = \
                        _encode_value(t, v, self.version)
            else:
                var_off[off_v] = var_start + len(var_data)
                if v is not None:
                    nullmask[num // 8] |= 1 << (num % 8)
                    if t == MEMO:
                        var_data += self._lval_store(
                            _encode_text(str(v), self.version))
                    else:
                        var_data += _encode_value(t, v, self.version)
        var_off[nvar] = var_start + len(var_data)
        head = (bytes([rcols]) if rsz == 1
                else struct.pack("<H", rcols)) + bytes(fixed) + \
            bytes(var_data)
        trailer = bytearray()
        if nvar:
            if vsz == 2:
                for i in range(nvar, -1, -1):
                    trailer += struct.pack("<H", var_off[i])
                trailer += struct.pack("<H", nvar)
            else:
                # Jet3: low bytes + jump table. The jump table's own
                # bytes count toward the row length that sizes it —
                # find the fixpoint nj == (row_len - 1) // 256, then
                # emit one slot per segment: the first var-col index
                # reaching that segment, 0xFF for the dummy slot the
                # reader's adjustment rule ignores.
                base_len = rsz + fixed_size + len(var_data) \
                    + (nvar + 1) + 1 + bm
                nj = 0
                while (base_len + nj - 1) // 256 > nj:
                    nj += 1
                jump = []
                for seg in range(1, nj + 1):
                    idx = next((i for i in range(nvar + 1)
                                if var_off[i] >= 256 * seg), None)
                    jump.append(0xFF if idx is None else idx)
                for i in range(nvar, -1, -1):
                    trailer.append(var_off[i] & 0xFF)
                for j in range(nj - 1, -1, -1):
                    trailer.append(jump[j])
                trailer.append(nvar)
        row = head + bytes(trailer) + bytes(nullmask)
        return row

    def _data_pages(self, tdef_pg: int, cols, records) -> int:
        """Pack rows end-to-start into as many data pages as needed;
        returns the row count written."""
        fmt = self.fmt
        pgno = None
        floor_ = None
        nrows = 0
        total = 0
        # a fresh page holds a single row of at most page_size minus
        # the page header and one offset slot
        max_row = fmt["page_size"] - fmt["data_offs"] - 2
        for rec in records:
            row = self._encode_row(cols, rec)
            if len(row) > max_row:
                raise ValueError(
                    f"row of {len(row)} bytes exceeds the "
                    f"{max_row}-byte Jet{self.version} data-page "
                    "capacity — the minimal writer does not emit "
                    "overflow rows; store oversized text elsewhere")
            if pgno is None or \
                    floor_ - len(row) < fmt["data_offs"] + 2 * (nrows + 1):
                pgno = self._new_page()
                pg = self.pages[pgno]
                pg[0] = 0x01
                pg[1] = 0x01
                struct.pack_into("<I", pg, 4, tdef_pg)
                floor_ = fmt["page_size"]
                nrows = 0
            pg = self.pages[pgno]
            floor_ -= len(row)
            pg[floor_:floor_ + len(row)] = row
            struct.pack_into("<H", pg, fmt["data_offs"] + 2 * nrows,
                             floor_)
            nrows += 1
            total += 1
            struct.pack_into("<H", pg, fmt["data_nrows"], nrows)
        return total

    # -- assembly ---------------------------------------------------------

    def build(self, tables: dict[str, list[dict]]) -> bytes:
        """tables: {name: [records]} → .mdb file bytes."""
        fmt = self.fmt
        hdr = self._new_page()                     # page 0
        self._new_page()                           # page 1 (free map)
        cat_tdef = self._new_page()                # page 2: MSysObjects
        assert cat_tdef == JetDb.MSYSOBJECTS_PG
        cat_cols = [("Id", LONGINT, True, 0, 0, 4),
                    ("Type", LONGINT, True, 4, 0, 4),
                    ("Name", TEXT, False, 0, 0, 0)]
        user = []
        for name, records in tables.items():
            recs = list(records)
            keys = list(recs[0].keys()) if recs else []
            specs = []
            off_f = 0
            off_v = 0
            for k in keys:
                t, is_fixed, flen = _py_coltype([r.get(k) for r in recs])
                if t == TEXT and self.memo_threshold is not None and \
                        any(len(_encode_text(str(r[k]), self.version))
                            > self.memo_threshold
                            for r in recs if r.get(k) is not None):
                    t = MEMO             # long text → LVAL storage
                if is_fixed:
                    specs.append((k, t, True, off_f, 0, flen))
                    off_f += flen
                else:
                    specs.append((k, t, False, 0, off_v, 0))
                    off_v += 1
            tdef_pg = self._new_page()
            self._tdef_page(tdef_pg, specs, len(recs))
            self._data_pages(tdef_pg, specs, recs)
            user.append({"Id": tdef_pg, "Type": 1, "Name": name})
        self._tdef_page(cat_tdef, cat_cols, len(user))
        self._data_pages(cat_tdef, cat_cols, user)
        pg0 = self.pages[hdr]
        pg0[4:19] = b"Standard Jet DB"
        pg0[0x14] = fmt["version_byte"]
        return b"".join(bytes(p) for p in self.pages)


def build_jet(tables: dict[str, list[dict]], version: int = 4,
              memo_threshold: int | None = None) -> bytes:
    """Build a minimal .mdb byte string holding ``tables``
    ({name: [row dicts]}); column types are inferred from the first
    non-null value per key (bool/int/float/Decimal/datetime/str/bytes
    → BOOL/LONGINT/DOUBLE/MONEY/DATETIME/TEXT/BINARY). With
    ``memo_threshold`` set, text columns whose encoded values exceed
    it become MEMO columns stored on LVAL pages (inline /
    single-page / chained per payload size) — both Jet versions."""
    return _JetWriter(version, memo_threshold).build(tables)
