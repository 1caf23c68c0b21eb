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
    float/double/datetime/text/memo/GUID.
  - Jet3 (Access 97, 2 KB pages): NotImplementedError (different
    struct layouts; no fixture to verify against — a wrong parse is
    worse than a gate).

Scale note: .mdb is a desktop format hard-capped at 2 GB, so the
driver-side parse + ``createDataFrame`` path (one file per task via
``io_join`` for many files) is the right distribution model — same
policy as xls/dbf (SURVEY §4.2.3).
"""

from __future__ import annotations

import struct
from datetime import datetime, timedelta

__all__ = ["JetDb", "JetTable", "JetColumn"]

_EPOCH = datetime(1899, 12, 30)

# Jet column type codes (public, mdbtools HACKING)
BOOL, BYTE, INT, LONGINT, MONEY, FLOAT, DOUBLE, DATETIME = \
    0x01, 0x02, 0x03, 0x04, 0x05, 0x06, 0x07, 0x08
BINARY, TEXT, OLE, MEMO, GUID, NUMERIC = \
    0x09, 0x0A, 0x0B, 0x0C, 0x0F, 0x10


class JetColumn:
    __slots__ = ("name", "type", "num", "off_v", "off_f", "length",
                 "is_fixed")

    def __repr__(self):
        return (f"JetColumn({self.name!r}, type={self.type}, "
                f"num={self.num}, fixed={self.is_fixed})")


class JetTable:
    def __init__(self, db: "JetDb", name: str, tdef_pg: int):
        self.db = db
        self.name = name
        self.tdef_pg = tdef_pg
        self._parse_tdef()

    def _parse_tdef(self):
        db = self.db
        pg = db.page(self.tdef_pg)
        if pg[0] != 0x02:
            raise ValueError(f"page {self.tdef_pg} is not a TDEF page")
        # stitch continuation pages: the TDEF payload continues after
        # each continuation page's 8-byte header
        buf = bytearray(pg)
        nxt, = struct.unpack_from("<I", pg, 4)
        while nxt:
            cont = db.page(nxt)
            buf += cont[8:]
            nxt, = struct.unpack_from("<I", cont, 4)
        pg = bytes(buf)
        self.num_rows, = struct.unpack_from("<I", pg, 0x10)
        self.max_cols, = struct.unpack_from("<H", pg, 0x29)
        self.num_var_cols, = struct.unpack_from("<H", pg, 0x2B)
        self.num_cols, = struct.unpack_from("<H", pg, 0x2D)
        num_real_idx, = struct.unpack_from("<I", pg, 0x33)
        pos = 0x3F + num_real_idx * 12
        cols = []
        for _ in range(self.num_cols):
            c = JetColumn()
            c.type = pg[pos]
            c.num, = struct.unpack_from("<H", pg, pos + 5)
            c.off_v, = struct.unpack_from("<H", pg, pos + 7)
            c.is_fixed = bool(pg[pos + 15] & 0x01)
            c.off_f, = struct.unpack_from("<H", pg, pos + 21)
            c.length, = struct.unpack_from("<H", pg, pos + 23)
            cols.append(c)
            pos += 25
        for c in cols:
            nlen, = struct.unpack_from("<H", pg, pos)
            c.name = pg[pos + 2:pos + 2 + nlen].decode("utf-16-le")
            pos += 2 + nlen
        # row layout order = column number order
        self.columns = sorted(cols, key=lambda c: c.num)

    # -- row access ------------------------------------------------------

    def rows(self):
        """Yield rows as dicts (column name → python value) from every
        data page owned by this table's TDEF. Page discovery is a
        single sweep of the (≤2 GB) file — the usage-map walk mdbtools
        does buys nothing at this format's size cap."""
        db = self.db
        for p in range(db.num_pages):
            pg = db.page(p)
            if pg[0] != 0x01:
                continue
            owner, = struct.unpack_from("<I", pg, 4)
            if owner != self.tdef_pg:
                continue
            yield from self._page_rows(p)

    def _page_rows(self, pgno: int):
        db = self.db
        pg = db.page(pgno)
        nrows, = struct.unpack_from("<H", pg, 0x0C)
        offs = [struct.unpack_from("<H", pg, 0x0E + 2 * i)[0]
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
        if len(row) < 2:
            return None
        rcols, = struct.unpack_from("<H", row, 0)
        bm = (rcols + 7) // 8
        if len(row) < bm + 2:
            return None
        nullmask = row[len(row) - bm:]

        def has_value(num):
            return bool(nullmask[num // 8] >> (num % 8) & 1) \
                if num < rcols else False

        var_off = None
        if self.num_var_cols:
            base = len(row) - bm - 2
            rvar, = struct.unpack_from("<H", row, base)
            var_off = [struct.unpack_from(
                "<H", row, base - 2 * (i + 1))[0]
                for i in range(rvar + 1)]
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
                data = row[2 + c.off_f:2 + c.off_f + c.length]
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
                return _decode_text(b)
            if t == MEMO:
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
        LVAL page row(s)."""
        if len(b) < 12:
            return _decode_text(b)
        memo_len = int.from_bytes(b[:3], "little")
        flags = b[3]
        if flags & 0x80:            # inline
            return _decode_text(b[12:12 + memo_len])
        ptr, = struct.unpack_from("<I", b, 4)
        if flags & 0x40:            # single LVAL page row
            data = self.db.row_bytes(ptr)
            return _decode_text(data or b"")
        chunks = []                  # chained LVAL rows
        seen = set()                 # corrupt-file cycle guard
        while ptr and ptr not in seen:
            seen.add(ptr)
            data = self.db.row_bytes(ptr)
            if data is None or len(data) < 4:
                break
            ptr, = struct.unpack_from("<I", data, 0)
            chunks.append(data[4:])
        return _decode_text(b"".join(chunks)[:memo_len])


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
        version = self.data[0x14]
        if version < 1:
            raise NotImplementedError(
                "Jet3 (Access 97) .mdb is not supported by the native "
                "parser — only Jet4 (Access 2000+); install mdbtools "
                "for Jet3 files")
        self.page_size = 4096
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
        nrows, = struct.unpack_from("<H", pg, 0x0C)
        if rowno >= nrows:
            return None
        off, = struct.unpack_from("<H", pg, 0x0E + 2 * rowno)
        if off & 0x8000:
            return None
        end = self.page_size if rowno == 0 else (
            struct.unpack_from("<H", pg, 0x0E + 2 * (rowno - 1))[0]
            & 0x1FFF)
        return pg[off & 0x1FFF:end]

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
            if (typ & 0x7F) != 1:    # 1 = table
                continue
            system = name.startswith(("MSys", "~"))
            if system and not include_system:
                continue
            out.append((name, tid & 0x00FFFFFF))
        return out

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


def _decode_text(b: bytes) -> str:
    """Jet4 text payload → str: 0xFFFE prefix marks the documented
    unicode-compression scheme (0x00 toggles between 1-byte and 2-byte
    characters); otherwise plain UTF-16LE."""
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
