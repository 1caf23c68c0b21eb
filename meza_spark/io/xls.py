"""Legacy Excel 97-2003 (.xls, BIFF8) — stdlib struct-level reader and
a minimal writer used by the sink and the test fixtures.

The reference reads .xls natively through xlrd (ref: meza/io.py:
1033-1118 ``read_xls``); this container has no xlrd, so the format is
parsed from bytes (r2 verdict #7):

  * OLE2 / Compound File Binary container: header, (DI)FAT chains,
    directory; streams resolved through the FAT or — for streams under
    the 4096-byte cutoff — the root entry's mini stream via the
    miniFAT.
  * BIFF8 Workbook stream: globals substream (BOF, DATEMODE, FORMAT,
    XF, SST with CONTINUE spill, BOUNDSHEET), then per-sheet substreams
    (NUMBER, RK, MULRK, LABELSST, LABEL, BOOLERR, BLANK/MULBLANK,
    FORMULA cached numeric results).
  * Serial-date cells detected via the cell XF's number format (the
    built-in date ifmts and custom formats containing date codes, the
    same rule xlrd applies) and rendered as ISO strings under the
    1900/1904 date system — matching what the reference's sanitize
    step emits for date cells (meza/io.py:963-1022).

Everything here is plain bytes → list-of-rows; the Spark side reads
files per-partition exactly like the xlsx path (io/readers.py
``_per_file``), so one DataFrame spans many .xls files at scale.
"""

from __future__ import annotations

import datetime
import re
import struct

# ---------------------------------------------------------------------------
# OLE2 / Compound File Binary
# ---------------------------------------------------------------------------

_CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_FREE = 0xFFFFFFFF
_ENDCHAIN = 0xFFFFFFFE


def _cfb_streams(data: bytes) -> dict[str, bytes]:
    """Parse a compound file → {stream name: bytes} (top level only)."""
    if data[:8] != _CFB_MAGIC:
        raise ValueError("not an OLE2 compound file (bad magic)")
    sect_shift = struct.unpack("<H", data[30:32])[0]
    mini_shift = struct.unpack("<H", data[32:34])[0]
    ssz, msz = 1 << sect_shift, 1 << mini_shift
    n_fat = struct.unpack("<I", data[44:48])[0]
    dir_start = struct.unpack("<I", data[48:52])[0]
    mini_cutoff = struct.unpack("<I", data[56:60])[0]
    minifat_start = struct.unpack("<I", data[60:64])[0]
    n_minifat = struct.unpack("<I", data[64:68])[0]
    difat_start = struct.unpack("<I", data[68:72])[0]
    n_difat = struct.unpack("<I", data[72:76])[0]

    def sector(i: int) -> bytes:
        off = 512 + i * ssz
        return data[off:off + ssz]

    # FAT sector list: 109 header entries + DIFAT chain
    fat_sectors = [x for x in struct.unpack("<109I", data[76:512])
                   if x not in (_FREE, _ENDCHAIN)][:n_fat]
    di = difat_start
    # a corrupt header can declare up to 2^32 DIFAT sectors; the real
    # count can never exceed the file's sector capacity
    n_difat = min(n_difat, len(data) // max(ssz, 64) + 1)
    for _ in range(n_difat):
        if di in (_FREE, _ENDCHAIN):
            break
        blk = sector(di)
        ents = struct.unpack(f"<{ssz // 4}I", blk)
        fat_sectors += [x for x in ents[:-1] if x not in (_FREE, _ENDCHAIN)]
        di = ents[-1]
    fat: list[int] = []
    for s in fat_sectors[:n_fat]:
        fat += struct.unpack(f"<{ssz // 4}I", sector(s))

    def chain(start: int, size: int | None = None) -> bytes:
        out, cur, guard = [], start, 0
        while cur not in (_FREE, _ENDCHAIN) and guard <= len(fat):
            out.append(sector(cur))
            cur = fat[cur] if cur < len(fat) else _ENDCHAIN
            guard += 1
        blob = b"".join(out)
        return blob[:size] if size is not None else blob

    # directory entries (128 B each)
    dirblob = chain(dir_start)
    entries = []
    for off in range(0, len(dirblob) - 127, 128):
        e = dirblob[off:off + 128]
        cb = struct.unpack("<H", e[64:66])[0]
        if cb < 2 or cb > 64:
            continue
        name = e[:cb - 2].decode("utf-16-le", "ignore")
        etype = e[66]
        start = struct.unpack("<I", e[116:120])[0]
        size = struct.unpack("<I", e[120:124])[0]
        entries.append((name, etype, start, size))

    root = next((e for e in entries if e[1] == 5), None)
    mini_container = chain(root[2], root[3]) if root and root[3] else b""
    minifat: list[int] = []
    cur = minifat_start
    for _ in range(n_minifat):
        if cur in (_FREE, _ENDCHAIN):
            break
        minifat += struct.unpack(f"<{ssz // 4}I", sector(cur))
        cur = fat[cur] if cur < len(fat) else _ENDCHAIN

    def mini_chain(start: int, size: int) -> bytes:
        out, cur, guard = [], start, 0
        while cur not in (_FREE, _ENDCHAIN) and guard <= len(minifat):
            out.append(mini_container[cur * msz:(cur + 1) * msz])
            cur = minifat[cur] if cur < len(minifat) else _ENDCHAIN
            guard += 1
        return b"".join(out)[:size]

    streams = {}
    for name, etype, start, size in entries:
        if etype != 2:  # stream objects only
            continue
        if size < mini_cutoff:
            streams[name] = mini_chain(start, size)
        else:
            streams[name] = chain(start, size)
    return streams


# ---------------------------------------------------------------------------
# BIFF8 reader
# ---------------------------------------------------------------------------

_DATE_IFMTS = set(range(14, 23)) | set(range(27, 37)) | {45, 46, 47} \
    | set(range(50, 59))
_DATE_FMT_RE = re.compile(r"[dmyhs]", re.IGNORECASE)


def _records(stream: bytes, pos: int = 0):
    """Yield (record id, data, offset) from a BIFF stream; stops on a
    zeroed region (zero-padded CFB sector tails)."""
    n = len(stream)
    while pos + 4 <= n:
        rid, sz = struct.unpack("<HH", stream[pos:pos + 4])
        if rid == 0:
            return
        yield rid, stream[pos + 4:pos + 4 + sz], pos
        pos += 4 + sz


def _unistr(data: bytes, pos: int, cch: int):
    """BIFF8 XLUnicodeString body after the cch field: flags byte, then
    optional rich/ext lengths, chars. Returns (text, next pos)."""
    flags = data[pos]
    pos += 1
    crun = cext = 0
    if flags & 0x08:
        crun = struct.unpack("<H", data[pos:pos + 2])[0]
        pos += 2
    if flags & 0x04:
        cext = struct.unpack("<I", data[pos:pos + 4])[0]
        pos += 4
    if flags & 0x01:
        text = data[pos:pos + 2 * cch].decode("utf-16-le", "replace")
        pos += 2 * cch
    else:
        text = data[pos:pos + cch].decode("latin-1")
        pos += cch
    return text, pos + 4 * crun + cext


def _parse_sst(data: bytes, continues: list[bytes]) -> list[str]:
    """SST with CONTINUE records: strings may split at any byte; each
    CONTINUE opens with a fresh compressed/utf16 flag byte."""
    blocks = [data] + continues
    bi, pos = 0, 8
    total_unique = struct.unpack("<I", data[4:8])[0]
    out: list[str] = []

    def remaining():
        return len(blocks[bi]) - pos

    def advance():
        nonlocal bi, pos
        bi += 1
        pos = 0

    def read(n: int) -> bytes:
        nonlocal pos
        chunk = blocks[bi][pos:pos + n]
        pos += n
        return chunk

    while len(out) < total_unique and bi < len(blocks):
        if remaining() < 3:
            advance()
            continue
        cch = struct.unpack("<H", read(2))[0]
        flags = read(1)[0]
        crun = struct.unpack("<H", read(2))[0] if flags & 0x08 else 0
        cext = struct.unpack("<I", read(4))[0] if flags & 0x04 else 0
        chars, wide = [], bool(flags & 0x01)
        need = cch
        while need:
            if remaining() == 0:
                advance()
                wide = bool(read(1)[0] & 0x01)  # fresh flag byte
                continue
            take = min(need, remaining() // (2 if wide else 1))
            if take == 0:
                advance()
                wide = bool(read(1)[0] & 0x01)
                continue
            raw = read(take * (2 if wide else 1))
            chars.append(raw.decode("utf-16-le" if wide else "latin-1",
                                    "replace"))
            need -= take
        skip = 4 * crun + cext
        while skip:
            if remaining() == 0:
                advance()
                continue
            step = min(skip, remaining())
            read(step)
            skip -= step
        out.append("".join(chars))
    return out


def _rk_value(rk: int) -> float | int:
    """RK decode. Only the explicit integer encoding yields int —
    NUMBER/float-RK cells stay float even when integral, so a column
    mixing 10.5 and -3.0 keeps one Spark type."""
    cents = rk & 0x01
    if rk & 0x02:  # 30-bit signed int
        v = rk >> 2
        if v & 0x20000000:
            v -= 0x40000000
        return v / 100 if cents else v
    val = struct.unpack("<d", struct.pack("<Q", (rk & ~0x3) << 32))[0]
    return val / 100 if cents else val


def _serial_to_iso(serial: float, date1904: bool) -> str:
    if 0 <= serial < 1:
        # time-of-day only (no date part) — the reference renders these
        # as %H:%M:%S (meza/io.py:998-1001, sanitize_sheet time_func)
        secs = round(serial * 86400)
        return "%02d:%02d:%02d" % (secs // 3600, secs // 60 % 60,
                                   secs % 60)
    if date1904:
        epoch = datetime.datetime(1904, 1, 1)
    else:
        # 1900 system with Excel's phantom 1900-02-29: serials >= 61
        # are correct from the 1899-12-30 epoch (xlrd's convention)
        epoch = datetime.datetime(1899, 12, 30)
        if serial < 61:
            epoch = datetime.datetime(1899, 12, 31)
    dt = epoch + datetime.timedelta(days=serial)
    if abs(serial - int(serial)) < 1e-9:
        return dt.date().isoformat()
    # snap sub-millisecond float noise to the whole second (with carry —
    # a bare microsecond=0 replace would truncate :12.99999 to :12)
    if dt.microsecond >= 999000:
        dt += datetime.timedelta(microseconds=1000000 - dt.microsecond)
    elif dt.microsecond < 1000:
        dt = dt.replace(microsecond=0)
    return dt.isoformat()


def read_biff_grid(path: str, sheet: int = 0,
                   force_1904: bool | None = None) -> list[list]:
    """Parse one .xls file → dense grid (list of rows) with the same
    cell semantics as the xlsx reader: numbers as int/float, strings,
    booleans, date-formatted serials as ISO strings.

    Corrupt bytes raise ValueError (the error class the read_xls
    dispatcher handles), never raw struct/index errors — a damaged
    spreadsheet in a crawl fails its task cleanly (round-7 fuzz)."""
    with open(path, "rb") as f:
        data = f.read()
    try:
        return _biff_grid_walk(data, sheet, force_1904)
    except (struct.error, IndexError, KeyError, UnicodeDecodeError,
            OverflowError, ZeroDivisionError) as e:
        raise ValueError(f"corrupt xls: {type(e).__name__}: {e}") from e


def _biff_grid_walk(data: bytes, sheet: int,
                    force_1904: bool | None) -> list[list]:
    streams = _cfb_streams(data)
    wb = streams.get("Workbook") or streams.get("Book")
    if wb is None:
        raise ValueError("no Workbook stream in compound file")

    # ---- globals substream
    sst: list[str] = []
    xf_ifmt: list[int] = []
    fmt_strings: dict[int, str] = {}
    sheets: list[int] = []  # BOF offsets
    date1904 = False
    it = _records(wb)
    pending_sst = None
    for rid, rec, off in it:
        if rid == 0x000A:  # EOF of globals
            break
        if rid == 0x0022:  # DATEMODE
            date1904 = bool(struct.unpack("<H", rec[:2])[0])
        elif rid == 0x00FC:  # SST
            pending_sst = (rec, [])
        elif rid == 0x003C and pending_sst is not None:  # CONTINUE
            pending_sst[1].append(rec)
        elif rid == 0x041E:  # FORMAT
            ifmt = struct.unpack("<H", rec[:2])[0]
            cch = struct.unpack("<H", rec[2:4])[0]
            text, _ = _unistr(rec, 4, cch)
            fmt_strings[ifmt] = text
        elif rid == 0x00E0:  # XF
            xf_ifmt.append(struct.unpack("<H", rec[2:4])[0])
        elif rid == 0x0085:  # BOUNDSHEET
            sheets.append(struct.unpack("<I", rec[:4])[0])
    if pending_sst is not None:
        sst = _parse_sst(*pending_sst)
    if force_1904 is not None:
        date1904 = force_1904

    def is_date_xf(ixfe: int) -> bool:
        if ixfe >= len(xf_ifmt):
            return False
        ifmt = xf_ifmt[ixfe]
        if ifmt in _DATE_IFMTS:
            return True
        fmt = fmt_strings.get(ifmt)
        if not fmt:
            return False
        bare = re.sub(r'"[^"]*"|\[[^\]]*\]', "", fmt)
        return bool(_DATE_FMT_RE.search(bare)) and "#" not in bare

    if sheet >= len(sheets):
        raise IndexError(f"sheet {sheet} out of range ({len(sheets)})")

    def num(v: float | int, ixfe: int):
        if is_date_xf(ixfe):
            return _serial_to_iso(float(v), date1904)
        return v

    cells: dict[tuple[int, int], object] = {}
    for rid, rec, off in _records(wb, sheets[sheet]):
        if rid == 0x000A:  # sheet EOF
            break
        if rid == 0x0203:  # NUMBER
            rw, col, ixfe = struct.unpack("<HHH", rec[:6])
            cells[rw, col] = num(struct.unpack("<d", rec[6:14])[0], ixfe)
        elif rid == 0x027E:  # RK
            rw, col, ixfe, rk = struct.unpack("<HHHI", rec[:10])
            cells[rw, col] = num(_rk_value(rk), ixfe)
        elif rid == 0x00BD:  # MULRK
            rw, col0 = struct.unpack("<HH", rec[:4])
            body = rec[4:-2]
            for i in range(len(body) // 6):
                ixfe, rk = struct.unpack("<HI", body[i * 6:i * 6 + 6])
                cells[rw, col0 + i] = num(_rk_value(rk), ixfe)
        elif rid == 0x00FD:  # LABELSST
            rw, col, ixfe, isst = struct.unpack("<HHHI", rec[:10])
            cells[rw, col] = sst[isst] if isst < len(sst) else ""
        elif rid == 0x0204:  # LABEL (inline)
            rw, col, ixfe, cch = struct.unpack("<HHHH", rec[:8])
            cells[rw, col] = _unistr(rec, 8, cch)[0]
        elif rid == 0x0205:  # BOOLERR
            rw, col, ixfe, v, is_err = struct.unpack("<HHHBB", rec[:8])
            cells[rw, col] = None if is_err else bool(v)
        elif rid == 0x0006:  # FORMULA — cached numeric result only
            rw, col, ixfe = struct.unpack("<HHH", rec[:6])
            res = rec[6:14]
            if res[6:8] != b"\xff\xff":
                cells[rw, col] = num(struct.unpack("<d", res)[0], ixfe)

    if not cells:
        return []
    nrows = max(r for r, _ in cells) + 1
    ncols = max(c for _, c in cells) + 1
    return [[cells.get((r, c), "") for c in range(ncols)]
            for r in range(nrows)]


# ---------------------------------------------------------------------------
# Minimal BIFF8 writer (sink + fixtures)
# ---------------------------------------------------------------------------

def _rec(rid: int, payload: bytes) -> bytes:
    return struct.pack("<HH", rid, len(payload)) + payload


def _short_unistr(s: str) -> bytes:
    b = s.encode("latin-1", "replace")
    return struct.pack("<BB", len(b), 0) + b


def write_biff(grid: list[list], path: str, sheet_name: str = "Sheet1",
               date1904: bool = False) -> None:
    """Write a grid as a single-sheet BIFF8 .xls. Cells: str → SST +
    LABELSST, bool → BOOLERR, int in ±2^29 → RK, other numbers →
    NUMBER, datetime/date → serial NUMBER with a date XF, None → blank.

    Small by design (the sink's per-partition files); the CFB container
    pads the Workbook stream past the 4096-byte mini-stream cutoff so
    only the regular FAT path is needed.
    """
    strings: list[str] = []
    sidx: dict[str, int] = {}
    n_cells = 0

    def intern(s: str) -> int:
        if s not in sidx:
            sidx[s] = len(strings)
            strings.append(s)
        return sidx[s]

    sheet_cells = []
    epoch = datetime.datetime(1904, 1, 1) if date1904 \
        else datetime.datetime(1899, 12, 30)
    for r, row in enumerate(grid):
        for c, v in enumerate(row):
            if v is None or v == "":
                continue
            n_cells += 1
            if isinstance(v, bool):
                sheet_cells.append(_rec(0x0205, struct.pack(
                    "<HHHBB", r, c, 15, int(v), 0)))
            elif isinstance(v, (datetime.datetime, datetime.date)):
                dt = v if isinstance(v, datetime.datetime) \
                    else datetime.datetime(v.year, v.month, v.day)
                serial = (dt - epoch).total_seconds() / 86400.0
                if not date1904 and serial < 61:
                    # pre-1900-03-01 serials predate Excel's phantom
                    # leap day: true serial is one less than the
                    # 1899-12-30-epoch count
                    serial -= 1.0
                sheet_cells.append(_rec(0x0203, struct.pack(
                    "<HHHd", r, c, 16, serial)))
            elif isinstance(v, int) and -(1 << 29) <= v < (1 << 29):
                sheet_cells.append(_rec(0x027E, struct.pack(
                    "<HHHI", r, c, 15, ((v & 0x3FFFFFFF) << 2) | 0x02)))
            elif isinstance(v, (int, float)):
                sheet_cells.append(_rec(0x0203, struct.pack(
                    "<HHHd", r, c, 15, float(v))))
            else:
                isst = intern(str(v))
                sheet_cells.append(_rec(0x00FD, struct.pack(
                    "<HHHI", r, c, 15, isst)))

    sst_body = struct.pack("<II", n_cells, len(strings))
    for s in strings:
        b = s.encode("latin-1", "replace")
        sst_body += struct.pack("<HB", len(b), 0) + b

    bof_globals = _rec(0x0809, struct.pack("<HHHHII", 0x0600, 0x0005,
                                           0x0DBB, 0x07CC, 0, 0))
    bof_sheet = _rec(0x0809, struct.pack("<HHHHII", 0x0600, 0x0010,
                                         0x0DBB, 0x07CC, 0, 0))
    # 16 style XFs (convention), then cell XF 15 (general) & 16 (date)
    xfs = b"".join(_rec(0x00E0, struct.pack("<HHHHHHHHHH",
                                            0, 0, 0xFFF5, 0x20, 0, 0, 0,
                                            0, 0, 0)) for _ in range(15))
    xfs += _rec(0x00E0, struct.pack("<HHHHHHHHHH", 0, 0, 0x0001, 0x20,
                                    0, 0, 0, 0, 0, 0))       # XF 15 general
    xfs += _rec(0x00E0, struct.pack("<HHHHHHHHHH", 0, 14, 0x0001, 0x20,
                                    0, 0, 0, 0, 0, 0))       # XF 16 ifmt 14
    datemode = _rec(0x0022, struct.pack("<H", int(date1904)))

    sheet_stream = bof_sheet + b"".join(sheet_cells) + _rec(0x000A, b"")

    # BOUNDSHEET needs the sheet BOF offset: assemble globals with a
    # placeholder, then patch
    bs_payload = struct.pack("<IBB", 0, 0, 0) + _short_unistr(sheet_name)
    globals_tail = datemode + xfs + _rec(0x0085, bs_payload) \
        + _rec(0x00FC, sst_body) + _rec(0x000A, b"")
    globals_stream = bof_globals + globals_tail
    sheet_off = len(globals_stream)
    bs_payload = struct.pack("<IBB", sheet_off, 0, 0) \
        + _short_unistr(sheet_name)
    globals_stream = bof_globals + datemode + xfs \
        + _rec(0x0085, bs_payload) + _rec(0x00FC, sst_body) \
        + _rec(0x000A, b"")
    assert len(globals_stream) == sheet_off
    workbook = globals_stream + sheet_stream
    if len(workbook) < 4096:  # skip the mini-stream machinery
        workbook += b"\x00" * (4096 - len(workbook))

    with open(path, "wb") as f:
        f.write(_cfb_single_stream("Workbook", workbook))


def _cfb_single_stream(name: str, payload: bytes) -> bytes:
    """Minimal CFB v3 container holding one ≥4096-byte stream."""
    ssz = 512
    n_payload = (len(payload) + ssz - 1) // ssz
    # layout: [FAT sectors][dir sector][payload sectors]
    n_fat = 1
    while (n_fat * (ssz // 4)) < (n_fat + 1 + n_payload):
        n_fat += 1
    dir_sector = n_fat
    first_payload = n_fat + 1
    total = first_payload + n_payload

    fat = [0xFFFFFFFD] * n_fat           # FAT sectors mark themselves
    fat.append(_ENDCHAIN)                # directory (single sector)
    for i in range(n_payload):
        fat.append(first_payload + i + 1 if i < n_payload - 1
                   else _ENDCHAIN)
    fat += [_FREE] * (n_fat * (ssz // 4) - len(fat))
    fat_blob = struct.pack(f"<{len(fat)}I", *fat)

    def dirent(nm: str, etype: int, start: int, size: int,
               child: int = 0xFFFFFFFF) -> bytes:
        raw = nm.encode("utf-16-le") + b"\x00\x00"
        e = raw + b"\x00" * (64 - len(raw))
        e += struct.pack("<H", len(raw))
        e += struct.pack("<BB", etype, 1)            # black
        e += struct.pack("<III", 0xFFFFFFFF, 0xFFFFFFFF, child)
        e += b"\x00" * 16 + b"\x00" * 4              # clsid + state
        e += b"\x00" * 16                            # timestamps
        e += struct.pack("<II", start, size)
        e += b"\x00" * 4
        return e

    root = dirent("Root Entry", 5, _ENDCHAIN, 0, child=1)
    stream_e = dirent(name, 2, first_payload, len(payload))
    empty = b"\x00" * 60 + struct.pack("<H", 0) + b"\x00\x01" \
        + struct.pack("<III", 0xFFFFFFFF, 0xFFFFFFFF, 0xFFFFFFFF) \
        + b"\x00" * 40 + struct.pack("<II", 0, 0) + b"\x00" * 4
    dirblob = root + stream_e + empty + empty

    header = _CFB_MAGIC + b"\x00" * 16
    header += struct.pack("<HH", 0x003E, 0x0003)     # minor, major
    header += struct.pack("<H", 0xFFFE)              # little endian
    header += struct.pack("<HH", 9, 6)               # sector shifts
    header += b"\x00" * 6
    header += struct.pack("<I", 0)                   # num dir sectors (v3)
    header += struct.pack("<I", n_fat)
    header += struct.pack("<I", dir_sector)
    header += struct.pack("<I", 0)                   # transaction
    header += struct.pack("<I", 4096)                # mini cutoff
    header += struct.pack("<I", _ENDCHAIN)           # minifat start
    header += struct.pack("<I", 0)                   # minifat count
    header += struct.pack("<I", _ENDCHAIN)           # difat start
    header += struct.pack("<I", 0)                   # difat count
    difat = list(range(n_fat)) + [_FREE] * (109 - n_fat)
    header += struct.pack("<109I", *difat)
    assert len(header) == 512

    body = fat_blob + dirblob + payload
    pad = (-len(body)) % ssz
    return header + body + b"\x00" * pad
