"""WebDataset tar-shard source + sink — the POSIX-tar sample-sharding
convention multimodal training pipelines standardize on: a shard is a
plain ``.tar`` (or ``.tar.gz``) whose members are named
``<key>.<ext>``, and all members sharing a key form ONE sample
(``000017.jpg`` + ``000017.json`` + ``000017.txt``). Samples must be
adjacent in the archive — that is what makes a shard sequentially
streamable from object storage with zero index.

Reference analog: meza reads each container format it claims with its
own stdlib parser (ref: meza/io.py:598-676 mdb, 677-724 dbf,
1033-1118 xls); this module does the same for WebDataset with nothing
but ``tarfile``/``gzip``.

Scale shape: ``read_webdataset`` rides Spark's ``binaryFile`` source —
one task per shard, members walked sequentially in-task with
``tarfile`` stream mode, samples emitted on key change so state is one
sample, never one archive. A 10k-shard corpus becomes a 10k-task scan
with no driver involvement. The sink is two-shaped like the other
containers here: ``records2webdataset`` streams ONE deterministic
artifact on the driver (fixture/gate path), while
``write_webdataset_shards`` is the scale path — samples hash to shards
by an engine-invariant md5 key, each shard's tar is written ON AN
EXECUTOR by ``applyInPandas``, and only a tiny manifest (shard id,
sample count, byte size) ever reaches the driver.
"""

from __future__ import annotations

import gzip as _gzip
import io as _pyio
import tarfile as _tarfile
from collections.abc import Iterator, Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SCHEMA = ("file string, key string, exts array<string>, "
           "data map<string, binary>")


def _split_member(name: str) -> tuple[str, str]:
    """WebDataset member-name rule: key = basename up to the FIRST
    dot, extension = everything after it (so ``a/0001.seg.png`` →
    key ``0001``, ext ``seg.png``)."""
    base = name.rsplit("/", 1)[-1]
    key, _, ext = base.partition(".")
    return key, ext


def _iter_tar_samples(data: bytes) -> Iterator[tuple[str, dict[str, bytes]]]:
    """Yield ``(key, {ext: payload})`` samples from tar bytes
    (gzip-compressed or plain — tarfile's ``r|*`` sniffs). Samples
    emit on key change (the WebDataset adjacency contract), so peak
    state is one sample."""
    stream = _pyio.BytesIO(data)
    cur_key: str | None = None
    cur: dict[str, bytes] = {}
    with _tarfile.open(fileobj=stream, mode="r|*") as tf:
        for member in tf:
            if not member.isfile():
                continue
            key, ext = _split_member(member.name)
            if key != cur_key:
                if cur_key is not None:
                    yield cur_key, cur
                cur_key, cur = key, {}
            fh = tf.extractfile(member)
            cur[ext] = fh.read() if fh is not None else b""
    if cur_key is not None:
        yield cur_key, cur


def read_webdataset(spark: SparkSession, path: str,
                    ext_filter: list[str] | None = None,
                    on_error: str = "raise") -> DataFrame:
    """Distributed WebDataset reader: one row per SAMPLE (not per tar
    member), one task per shard file.

    Columns: ``file`` (shard path), ``key`` (sample key), ``exts``
    (sorted member extensions present), ``data`` (map ext → raw
    bytes). Decode downstream with ``element_at(data, 'txt')`` +
    ``F.decode`` — the reader never guesses at payload encodings
    (images/audio stay opaque binary per the multimodal column
    contract, llm/multimodal.py).

    ``ext_filter`` keeps only the named extensions inside each sample
    (the sample row still appears if ANY survive) — pushing the
    column prune into the member walk so unwanted modalities are
    dropped before they ride the Arrow batch.

    ``on_error``: ``'raise'`` (default) or ``'skip'``. Note the tar
    format's own leniency: ``tarfile`` treats mid-archive garbage or
    truncation as end-of-archive, so a damaged shard silently yields
    its readable prefix in EITHER mode — pair with the sink manifests
    to detect shortfalls. What actually raises is a file that is not
    a tar at all, or a gzip CRC failure; ``'skip'`` keeps the scan
    alive past those too — whatever samples parsed before the error
    are kept (a not-a-tar file contributes zero), consistent with the
    truncation case (the never-abort-the-batch posture of
    ``read_ndjson_quarantine``).
    """
    import pandas as _pd

    if on_error not in ("raise", "skip"):
        raise ValueError(f"read_webdataset: on_error={on_error!r}")
    wanted = set(ext_filter) if ext_filter else None

    def _parse(batches):
        for pdf in batches:
            rows = []
            for fname, content in zip(pdf["path"], pdf["content"]):
                it = _iter_tar_samples(bytes(content))
                while True:
                    try:
                        key, members = next(it)
                    except StopIteration:
                        break
                    except (_tarfile.TarError, EOFError, OSError):
                        if on_error == "skip":
                            break
                        raise
                    if wanted is not None:
                        members = {e: b for e, b in members.items()
                                   if e in wanted}
                        if not members:
                            continue
                    rows.append((fname, key, sorted(members), members))
            yield _pd.DataFrame(
                rows, columns=["file", "key", "exts", "data"])

    return (spark.read.format("binaryFile").load(path)
            .select("path", "content")
            .mapInPandas(_parse, schema=_SCHEMA))


def _coerce(val) -> bytes:
    if val is None:
        return b""
    if isinstance(val, (bytes, bytearray)):
        return bytes(val)
    return str(val).encode("utf-8")


def _tar_add(tf: _tarfile.TarFile, name: str, payload: bytes) -> None:
    """Append one member with pinned metadata (mtime/uid/gid zero,
    blank names, 0644) so shard bytes are stable run-to-run."""
    info = _tarfile.TarInfo(name=name)
    info.size = len(payload)
    info.mtime = 0
    info.uid = info.gid = 0
    info.uname = info.gname = ""
    info.mode = 0o644
    tf.addfile(info, _pyio.BytesIO(payload))


def _write_tar(sink, rows: Iterator, members: Mapping[str, int],
               gz: bool) -> int:
    """Stream ``(key, v0, v1, ...)`` tuples into an open binary sink
    as a USTAR archive; returns the sample count. ``members`` maps
    extension → tuple position."""
    # filename="" keeps the FNAME field out of the gzip header —
    # GzipFile would otherwise embed the sink's basename and break
    # byte-determinism across differently-named shards
    raw = (_gzip.GzipFile(filename="", fileobj=sink, mode="wb", mtime=0)
           if gz else sink)
    n = 0
    with _tarfile.open(fileobj=raw, mode="w",
                       format=_tarfile.USTAR_FORMAT) as tf:
        for row in rows:
            key = str(row[0])
            # the reader splits member names at the FIRST dot, so a
            # dotted key would come back as a different key with
            # mangled extensions, and a '/' would nest it — refuse
            # loudly instead of corrupting the roundtrip silently
            if "." in key or "/" in key or not key:
                raise ValueError(
                    f"webdataset: sample key {key!r} must be "
                    f"non-empty and contain no '.' or '/' (keys and "
                    f"extensions split at the first dot on read)")
            for ext, pos in members.items():
                _tar_add(tf, f"{key}.{ext}", _coerce(row[pos]))
            n += 1
    if gz:
        raw.close()
    return n


def records2webdataset(df: DataFrame, path: str, key_col: str,
                       members: Mapping[str, str],
                       gzip_shard: bool | None = None) -> None:
    """DataFrame → ONE WebDataset tar shard (inverse of
    ``read_webdataset``; the fixture path for the roundtrip gate).

    ``members`` maps member extension → source column
    (``{"txt": "text", "json": "meta"}``); string columns encode
    utf-8, binary columns pass through, nulls become empty members.
    Rows stream via ``toLocalIterator`` in DataFrame order (order the
    frame for byte-determinism); member metadata is pinned, and
    ``.gz`` paths gzip the whole shard with mtime=0, so equal input
    order ⇒ byte-identical shards. Driver memory stays O(row).
    """
    gz = path.endswith(".gz") if gzip_shard is None else gzip_shard
    cols = [key_col] + list(members.values())
    pos = {ext: i + 1 for i, ext in enumerate(members)}
    it = df.select(*cols).toLocalIterator()
    with open(path, "wb") as sink:
        _write_tar(sink, it, pos, gz)


def write_webdataset_shards(df: DataFrame, dir_path: str, key_col: str,
                            members: Mapping[str, str],
                            n_shards: int = 8,
                            prefix: str = "shard") -> DataFrame:
    """Scale-path WebDataset sink: samples hash to ``n_shards`` shards
    by an md5 coin on the key (engine- and partitioning-invariant, the
    repo's deterministic-sampling primitive), each shard sorts by key
    and writes ``<dir>/<prefix>-NNNNNN.tar`` ON ITS EXECUTOR via
    ``applyInPandas`` — the driver never sees payload bytes, only the
    returned manifest ``(shard, n_samples, n_bytes)``.

    One shuffle (the groupBy), one tar per group; with a shared
    filesystem (or object store mount) this is the standard
    "materialize a curated corpus as training shards" step. Shard
    assignment is content-addressed, so re-runs land every sample in
    the same shard regardless of input partitioning.
    """
    import os as _os

    import pandas as _pd

    _os.makedirs(dir_path, exist_ok=True)
    cols = [key_col] + list(members.values())
    pos = {ext: i + 1 for i, ext in enumerate(members)}
    shard = (F.conv(F.substring(F.md5(F.col(key_col).cast("string")),
                                1, 8), 16, 10)
             .cast("long") % n_shards).alias("_shard")
    width = max(6, len(str(n_shards - 1)))

    def _emit(pdf: _pd.DataFrame) -> _pd.DataFrame:
        sid = int(pdf["_shard"].iloc[0])
        pdf = pdf.sort_values(key_col, kind="mergesort")
        rows = list(pdf[cols].itertuples(index=False, name=None))
        fname = _os.path.join(dir_path, f"{prefix}-{sid:0{width}d}.tar")
        with open(fname, "wb") as sink:
            n = _write_tar(sink, iter(rows), pos, gz=False)
        size = _os.path.getsize(fname)
        return _pd.DataFrame(
            {"shard": [sid], "n_samples": [n], "n_bytes": [size]})

    return (df.select(shard, *cols)
            .groupBy("_shard")
            .applyInPandas(_emit,
                           "shard long, n_samples long, n_bytes long"))
