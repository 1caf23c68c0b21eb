"""WARC (Web ARChive, ISO 28500) source + sink — the container format
web-scale corpora actually arrive in (Common Crawl ships ~100 TB of
.warc.gz per snapshot).

Reference analog: meza reads each container format it claims with its
own stdlib parser (ref: meza/io.py:598-676 mdb, 677-724 dbf,
1033-1118 xls); this module does the same for WARC with nothing but
``gzip``/``io``/``struct``-free byte logic.

Scale shape: Common Crawl's convention is ONE gzip member per WARC
record, so a ``.warc.gz`` is a concatenation of independently
decompressable members. ``read_warc`` rides Spark's ``binaryFile``
source (one task per archive) and walks members sequentially inside
the task with ``gzip.GzipFile`` over a ``BytesIO`` — records stream
out one at a time, so peak memory is one record, not one archive
(the decompressed-size amplification hazard read_csv_distributed
documents). A 90k-file crawl snapshot becomes a 90k-task scan; no
driver bottleneck, no shared state.
"""

from __future__ import annotations

import gzip as _gzip
import io as _pyio
from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame, SparkSession

_CRLF = b"\r\n"

# WARC named fields surfaced as columns (lower-cased, underscored).
_FIELDS = ("WARC-Type", "WARC-Target-URI", "WARC-Date",
           "WARC-Record-ID", "Content-Type", "Content-Length")

_SCHEMA = ("file string, warc_type string, target_uri string, "
           "warc_date string, record_id string, content_type string, "
           "http_status int, http_content_type string, payload binary")


def _parse_headers(block: bytes) -> dict[str, str]:
    """Parse a CRLF header block (WARC or HTTP) into a dict; header
    names case-fold, continuation lines (obs-fold) append."""
    out: dict[str, str] = {}
    last = None
    for line in block.split(b"\r\n"):
        if not line.strip():
            continue
        if line[:1] in (b" ", b"\t") and last is not None:
            out[last] += " " + line.strip().decode("utf-8", "replace")
            continue
        name, _, val = line.partition(b":")
        last = name.strip().decode("ascii", "replace").lower()
        out[last] = val.strip().decode("utf-8", "replace")
    return out


def _iter_warc_records(stream) -> Iterator[tuple[dict[str, str], bytes]]:
    """Yield ``(warc_headers, payload_bytes)`` from a decompressed
    byte stream of concatenated WARC records."""
    while True:
        # skip inter-record blank lines to the next version line
        version = b""
        while True:
            line = stream.readline()
            if not line:
                return
            if line.strip():
                version = line.strip()
                break
        if not version.startswith(b"WARC/"):
            raise ValueError(
                f"read_warc: expected a WARC/<ver> record boundary, "
                f"got {version[:40]!r} (truncated or non-WARC input)")
        header_lines = []
        while True:
            line = stream.readline()
            if not line or line in (b"\r\n", b"\n"):
                break
            header_lines.append(line)
        headers = _parse_headers(b"".join(header_lines))
        length = int(headers.get("content-length", "0"))
        payload = stream.read(length)
        if len(payload) != length:
            raise ValueError(
                "read_warc: truncated record payload "
                f"({len(payload)}/{length} bytes)")
        yield headers, payload


def _split_http(payload: bytes):
    """If the payload is an HTTP response envelope, return
    ``(status, content_type, body)``; else ``(None, None, payload)``."""
    if not payload.startswith(b"HTTP/"):
        return None, None, payload
    head, sep, body = payload.partition(b"\r\n\r\n")
    if not sep:
        return None, None, payload
    status_line, _, rest = head.partition(b"\r\n")
    parts = status_line.split(None, 2)
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        return None, None, payload
    http = _parse_headers(rest)
    return status, http.get("content-type"), body


def read_warc(spark: SparkSession, path: str,
              record_types: Sequence[str] = ("response", "resource"),
              strip_http: bool = True) -> DataFrame:
    """Distributed WARC/WARC.GZ reader: one row per record of the
    requested ``WARC-Type``s, one task per archive file.

    Columns: ``file, warc_type, target_uri, warc_date, record_id,
    content_type, http_status, http_content_type, payload``.
    ``payload`` is the raw body bytes — for ``response`` records the
    HTTP envelope is stripped (status + Content-Type surface as
    typed columns) unless ``strip_http=False``. Decode to text
    downstream with ``F.decode`` / ``llm.htmltext.extract_text``.

    Gzip archives are walked member-by-member (Common Crawl's
    record-per-member layout) so memory stays O(one record); plain
    ``.warc`` files parse identically from the raw bytes.
    """
    import pandas as _pd

    wanted = {t.lower() for t in record_types}

    def _parse(batches):
        for pdf in batches:
            rows = []
            for fname, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                if data[:2] == b"\x1f\x8b":
                    stream = _gzip.GzipFile(
                        fileobj=_pyio.BytesIO(data))
                else:
                    stream = _pyio.BytesIO(data)
                stream = _pyio.BufferedReader(stream, 1 << 20)
                for hdr, payload in _iter_warc_records(stream):
                    wtype = hdr.get("warc-type", "")
                    if wtype.lower() not in wanted:
                        continue
                    status = ctype = None
                    if strip_http:
                        status, ctype, payload = _split_http(payload)
                    rows.append((
                        fname, wtype,
                        hdr.get("warc-target-uri"),
                        hdr.get("warc-date"),
                        hdr.get("warc-record-id"),
                        hdr.get("content-type"),
                        status, ctype, payload))
            yield _pd.DataFrame(rows, columns=[
                "file", "warc_type", "target_uri", "warc_date",
                "record_id", "content_type", "http_status",
                "http_content_type", "payload"])

    return (spark.read.format("binaryFile").load(path)
            .select("path", "content")
            .mapInPandas(_parse, schema=_SCHEMA))


def records2warc(df: DataFrame, path: str, url_col: str = "url",
                 payload_col: str = "text",
                 date_col: str | None = None,
                 default_date: str = "2020-01-01T00:00:00Z",
                 content_type: str = "text/html",
                 gzip_members: bool | None = None) -> None:
    """DataFrame → single WARC/1.0 artifact (inverse of
    ``read_warc``; the fixture path for the roundtrip gate and the
    standard "re-shard curated pages" sink shape).

    Each row becomes one ``response`` record wrapping an HTTP/1.1 200
    envelope; with ``gzip_members`` (default: on iff ``path`` ends in
    ``.gz``) every record is its own gzip member — Common Crawl's
    independently-seekable layout. Record IDs are deterministic
    (row-content sha1 URNs), so the artifact is byte-stable across
    cluster layouts. Streams via ``toLocalIterator`` like the other
    single-artifact sinks (writers.py) — driver memory stays O(row).
    """
    import re as _re

    gz = path.endswith(".gz") if gzip_members is None else gzip_members
    cols = [url_col, payload_col] + ([date_col] if date_col else [])
    it = df.select(*cols).toLocalIterator()
    _unsafe = _re.compile(r"[\x00-\x20\x7f]")
    with open(path, "wb") as sink:
        for row in it:
            url = "" if row[0] is None else str(row[0])
            # whitespace/control chars in a header value would corrupt
            # the CRLF record framing — percent-encode JUST those
            # (WARC-Target-URI forbids them; IRIs keep their non-ASCII)
            url = _unsafe.sub(
                lambda m: "%%%02X" % ord(m.group()), url)
            body = row[1]
            body = (b"" if body is None else
                    body if isinstance(body, (bytes, bytearray))
                    else str(body).encode("utf-8"))
            date = (str(row[2]) if date_col and row[2] is not None
                    else default_date)
            sink.write(_record_bytes(url, body, date, content_type, gz))


def _record_bytes(url: str, body: bytes, date: str, content_type: str,
                  gz: bool, warc_type: str = "response") -> bytes:
    """One serialized record (shared by the single-artifact and
    sharded sinks, so the two stay byte-identical per record).
    ``response`` records wrap an HTTP/1.1 envelope; other types
    (``conversion`` = WET extracted text, ``metadata`` = WAT JSON,
    ``resource``) carry the body directly with its own Content-Type.
    Record IDs are row-content sha1 URNs and gzip members use mtime=0
    — byte-stable across runs and cluster layouts."""
    import hashlib as _hashlib

    if warc_type == "response":
        payload = (b"HTTP/1.1 200 OK\r\nContent-Type: "
                   + content_type.encode("ascii")
                   + b"\r\nContent-Length: "
                   + str(len(body)).encode("ascii")
                   + b"\r\n\r\n" + body)
        rec_ctype = b"application/http; msgtype=response"
    else:
        payload = body
        rec_ctype = content_type.encode("ascii")
    rid = _hashlib.sha1(url.encode("utf-8") + b"\x00" + body).hexdigest()
    rec = (b"WARC/1.0\r\n"
           b"WARC-Type: " + warc_type.encode("ascii") + _CRLF
           + b"WARC-Target-URI: " + url.encode("utf-8") + _CRLF
           + b"WARC-Date: " + date.encode("ascii") + _CRLF
           + b"WARC-Record-ID: <urn:sha1:" + rid.encode("ascii")
           + b">\r\n"
           b"Content-Type: " + rec_ctype + _CRLF
           + b"Content-Length: " + str(len(payload)).encode("ascii")
           + b"\r\n\r\n" + payload + _CRLF + _CRLF)
    return _gzip.compress(rec, 6, mtime=0) if gz else rec


def records2warc_sharded(df: DataFrame, dir_path: str,
                         url_col: str = "url",
                         payload_col: str = "text",
                         date_col: str | None = None,
                         default_date: str = "2020-01-01T00:00:00Z",
                         content_type: str = "text/html",
                         shards: int | None = None,
                         record_type: str = "response") -> int:
    """DataFrame → a DIRECTORY of ``part-NNNNN.warc.gz`` shards,
    written in parallel by the executors (one shard per partition) —
    Common Crawl's own segment layout, and the scale-correct inverse
    of ``read_warc``'s one-task-per-archive scan.

    This is the sink a 100 TB pipeline needs: ``records2warc`` funnels
    every record through the driver one at a time (O(N) serial gzip —
    fine for a golden fixture, super-linear in any timed pipeline),
    while this writer keeps the work where the data already is. Rows
    land in the shard of whatever partition holds them; per-record
    bytes are identical to the single-artifact sink, so readers see
    the same records either way. Returns the number of non-empty
    shards written. Executors must share the filesystem at
    ``dir_path`` (true on local mode and on any shared-mount cluster;
    on object storage, write to a local scratch then upload)."""
    import os as _os

    _os.makedirs(dir_path, exist_ok=True)
    for old in _os.listdir(dir_path):
        if old.startswith("part-") and old.endswith(".warc.gz"):
            _os.remove(_os.path.join(dir_path, old))
    cols = [url_col, payload_col] + ([date_col] if date_col else [])
    part = df.select(*cols)
    if shards is not None:
        part = part.repartition(shards)
    has_date = bool(date_col)

    def _write_part(idx, it):
        # imperative per-partition side effect — the one legitimate
        # RDD use; everything upstream stays a DataFrame
        import re as _re

        unsafe = _re.compile(r"[\x00-\x20\x7f]")
        path = _os.path.join(dir_path, f"part-{idx:05d}.warc.gz")
        wrote = 0
        with open(path, "wb") as sink:
            for row in it:
                url = "" if row[0] is None else str(row[0])
                url = unsafe.sub(lambda m: "%%%02X" % ord(m.group()), url)
                body = row[1]
                body = (b"" if body is None else
                        body if isinstance(body, (bytes, bytearray))
                        else str(body).encode("utf-8"))
                date = (str(row[2]) if has_date and row[2] is not None
                        else default_date)
                sink.write(_record_bytes(url, bytes(body), date,
                                         content_type, True,
                                         record_type))
                wrote += 1
        if not wrote:
            _os.remove(path)
        yield wrote

    counts = part.rdd.mapPartitionsWithIndex(_write_part).collect()
    return sum(1 for c in counts if c)


# ------------------------------------------------- WET / WAT (Common
# Crawl's derived formats: WET = conversion records carrying the
# extracted plain text, WAT = metadata records carrying a JSON
# envelope of per-page metadata)

def read_wet(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WET reader: ``conversion`` records → one row per
    page with the extracted TEXT decoded — the standard entry point
    when the corpus ships pre-extracted (Common Crawl *.warc.wet.gz).
    Columns: ``file, target_uri, warc_date, text, n_chars``."""
    from pyspark.sql import functions as F

    df = read_warc(spark, path, record_types=("conversion",),
                   strip_http=False)
    text = F.decode(F.col("payload"), "UTF-8")
    return df.select("file", "target_uri", "warc_date",
                     text.alias("text"),
                     F.length(text).alias("n_chars"))


def records2wet_sharded(df: DataFrame, dir_path: str,
                        url_col: str = "url", text_col: str = "text",
                        date_col: str | None = None,
                        default_date: str = "2020-01-01T00:00:00Z",
                        shards: int | None = None) -> int:
    """DataFrame → a directory of ``part-NNNNN.warc.gz`` WET shards
    (``conversion`` records, ``text/plain`` bodies), written by the
    executors — the inverse of ``read_wet`` at scale."""
    return records2warc_sharded(
        df, dir_path, url_col=url_col, payload_col=text_col,
        date_col=date_col, default_date=default_date,
        content_type="text/plain", shards=shards,
        record_type="conversion")


def wat_payload(url_col: str = "url", title_col: str = "title",
                links_col: str = "links"):
    """Column expression building a WAT ``Envelope`` JSON (the
    Common Crawl field spine: WARC-Header-Metadata target URI,
    HTML-Metadata Head.Title and Links[{url}]) — JVM-side
    ``to_json``, no Python."""
    from pyspark.sql import functions as F

    return F.to_json(F.struct(F.struct(
        F.struct(F.col(url_col).alias("WARC-Target-URI"))
         .alias("WARC-Header-Metadata"),
        F.struct(F.struct(F.struct(
            F.struct(F.col(title_col).alias("Title")).alias("Head"),
            F.transform(F.col(links_col),
                        lambda u: F.struct(u.alias("url")))
             .alias("Links")).alias("HTML-Metadata"))
         .alias("HTTP-Response-Metadata")).alias("Payload-Metadata"))
        .alias("Envelope")))


def records2wat_sharded(df: DataFrame, dir_path: str,
                        url_col: str = "url", title_col: str = "title",
                        links_col: str = "links",
                        date_col: str | None = None,
                        default_date: str = "2020-01-01T00:00:00Z",
                        shards: int | None = None) -> int:
    """DataFrame (url, title, links array<string>) → WAT shards
    (``metadata`` records, ``application/json`` envelopes)."""
    from pyspark.sql import functions as F

    cols = [F.col(url_col).alias("__u"),
            wat_payload(url_col, title_col, links_col).alias("__j")]
    if date_col:
        cols.append(F.col(date_col))
    return records2warc_sharded(
        df.select(*cols), dir_path, url_col="__u", payload_col="__j",
        date_col=date_col, default_date=default_date,
        content_type="application/json", shards=shards,
        record_type="metadata")


def read_wat(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WAT reader: ``metadata`` records → one row per
    page with the envelope's headline fields surfaced (page title,
    outlink URLs + count) — JVM-side JSON path extraction, no
    Python beyond the record framing.
    Columns: ``file, target_uri, warc_date, title, links, n_links``."""
    from pyspark.sql import functions as F

    df = read_warc(spark, path, record_types=("metadata",),
                   strip_http=False)
    js = F.decode(F.col("payload"), "UTF-8")
    html_meta = ("$['Envelope']['Payload-Metadata']"
                 "['HTTP-Response-Metadata']['HTML-Metadata']")
    title = F.get_json_object(js, html_meta + "['Head']['Title']")
    links_json = F.get_json_object(js, html_meta + "['Links']")
    links = F.transform(
        F.from_json(links_json, "array<struct<url:string>>"),
        lambda s: s.getField("url"))
    return df.select("file", "target_uri", "warc_date",
                     title.alias("title"), links.alias("links"),
                     F.coalesce(F.size(links),
                                F.lit(0)).alias("n_links"))
