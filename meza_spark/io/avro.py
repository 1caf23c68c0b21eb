"""Avro Object Container File source + sink, pure stdlib.

pip-installed PySpark ships WITHOUT the spark-avro module (it's a
separate jar), so ``spark.read.format("avro")`` fails in exactly the
environments this package targets; like the reference's stance of
parsing each claimed byte format itself (ref: meza/io.py:598-676 mdb,
1033-1118 xls), this implements the OCF spec (Avro 1.11, public) with
``struct``/``zlib``/``json`` only.

Supported schema surface: records of the primitive types (null,
boolean, int, long, float, double, bytes, string), nullable unions
``["null", T]`` in either order, and arrays of primitives — the shape
tabular exports actually use. Codecs: ``null`` and ``deflate``.
Anything else raises with the offending schema node (honest gate, no
silent misparse).

Scale shape: ``read_avro`` rides ``binaryFile`` (one task per file;
OCF blocks decode sequentially in-task, memory O(one block)); the
sink streams ``toLocalIterator`` into size-bounded blocks like the
other single-artifact writers. A directory of N files is an N-task
scan — the right shape for the multi-file exports Avro pipelines
emit.
"""

from __future__ import annotations

import io as _pyio
import json as _json
import struct as _struct
import zlib as _zlib
from hashlib import md5 as _md5

from pyspark.sql import DataFrame, SparkSession

_MAGIC = b"Obj\x01"

# ---------------------------------------------------------------- codec

def _zigzag_encode(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf, pos: int) -> tuple[int, int]:
    shift = u = 0
    while True:
        b = buf[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (u >> 1) ^ -(u & 1), pos


def _enc_str(s: str) -> bytes:
    b = s.encode("utf-8")
    return _zigzag_encode(len(b)) + b


_SPARK2AVRO = {"int": "int", "bigint": "long", "smallint": "int",
               "tinyint": "int", "float": "float", "double": "double",
               "boolean": "boolean", "string": "string",
               "binary": "bytes"}
_AVRO2SPARK = {"int": "int", "long": "bigint", "float": "float",
               "double": "double", "boolean": "boolean",
               "string": "string", "bytes": "binary", "null": "string"}


def _avro_schema_of(df: DataFrame, name: str) -> dict:
    fields = []
    for f, t in df.dtypes:
        if t.startswith("array<"):
            inner = t[6:-1]
            if inner not in _SPARK2AVRO:
                raise ValueError(
                    f"records2avro: unsupported array element {inner!r}")
            ft = {"type": "array", "items": _SPARK2AVRO[inner]}
        elif t in _SPARK2AVRO:
            ft = _SPARK2AVRO[t]
        else:
            raise ValueError(
                f"records2avro: unsupported column type {t!r} ({f}); "
                "cast to a primitive first")
        fields.append({"name": f, "type": ["null", ft]})
    return {"type": "record", "name": name, "fields": fields}


def _write_value(out: bytearray, v, typ):
    """Encode one value of resolved (non-union) Avro type ``typ``."""
    if typ == "null":
        return
    if typ == "boolean":
        out.append(1 if v else 0)
    elif typ in ("int", "long"):
        out += _zigzag_encode(int(v))
    elif typ == "float":
        out += _struct.pack("<f", float(v))
    elif typ == "double":
        out += _struct.pack("<d", float(v))
    elif typ == "string":
        out += _enc_str(str(v))
    elif typ == "bytes":
        b = bytes(v)
        out += _zigzag_encode(len(b)) + b
    elif isinstance(typ, dict) and typ.get("type") == "array":
        items = typ["items"]
        seq = list(v)
        if seq:
            out += _zigzag_encode(len(seq))
            for x in seq:
                _write_value(out, x, items)
        out += _zigzag_encode(0)
    else:
        raise ValueError(f"records2avro: cannot encode type {typ!r}")


def records2avro(df: DataFrame, path: str, codec: str = "deflate",
                 block_rows: int = 4096, name: str = "record") -> None:
    """DataFrame → single ``.avro`` OCF artifact. Every column is
    written as ``["null", T]`` (null-safe); the 16-byte sync marker is
    the md5 of the schema JSON, so the artifact is byte-stable across
    runs (same reason the WARC sink pins gzip mtime)."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"records2avro: unsupported codec {codec!r}")
    schema = _avro_schema_of(df, name)
    schema_json = _json.dumps(schema, sort_keys=True)
    sync = _md5(schema_json.encode()).digest()
    ftypes = [f["type"][1] for f in schema["fields"]]

    def _flush(sink, rows: bytearray, n: int):
        data = bytes(rows)
        if codec == "deflate":
            # raw deflate (no zlib wrapper), per the spec
            data = _zlib.compress(data, 6)[2:-4]
        sink.write(_zigzag_encode(n) + _zigzag_encode(len(data))
                   + data + sync)

    with open(path, "wb") as sink:
        sink.write(_MAGIC)
        meta = {"avro.schema": schema_json, "avro.codec": codec}
        sink.write(_zigzag_encode(len(meta)))
        for k, v in sorted(meta.items()):
            sink.write(_enc_str(k))
            b = v.encode("utf-8")
            sink.write(_zigzag_encode(len(b)) + b)
        sink.write(_zigzag_encode(0))
        sink.write(sync)
        buf, n = bytearray(), 0
        for row in df.toLocalIterator():
            for v, t in zip(row, ftypes):
                if v is None:
                    buf += _zigzag_encode(0)        # union branch: null
                else:
                    buf += _zigzag_encode(1)
                    _write_value(buf, v, t)
            n += 1
            if n >= block_rows:
                _flush(sink, buf, n)
                buf, n = bytearray(), 0
        if n:
            _flush(sink, buf, n)


# ---------------------------------------------------------------- read

def _read_value(buf, pos: int, typ):
    if isinstance(typ, list):                       # union
        idx, pos = _zigzag_decode(buf, pos)
        return _read_value(buf, pos, typ[idx])
    if isinstance(typ, dict):
        t = typ.get("type")
        if t == "array":
            out = []
            while True:
                n, pos = _zigzag_decode(buf, pos)
                if n == 0:
                    break
                if n < 0:                           # block with byte size
                    _, pos = _zigzag_decode(buf, pos)
                    n = -n
                for _ in range(n):
                    v, pos = _read_value(buf, pos, typ["items"])
                    out.append(v)
            return out, pos
        return _read_value(buf, pos, t)
    if typ == "null":
        return None, pos
    if typ == "boolean":
        return buf[pos] == 1, pos + 1
    if typ in ("int", "long"):
        return _zigzag_decode(buf, pos)
    if typ == "float":
        return _struct.unpack_from("<f", buf, pos)[0], pos + 4
    if typ == "double":
        return _struct.unpack_from("<d", buf, pos)[0], pos + 8
    if typ in ("string", "bytes"):
        ln, pos = _zigzag_decode(buf, pos)
        raw = bytes(buf[pos:pos + ln])
        return (raw.decode("utf-8") if typ == "string" else raw), \
            pos + ln
    raise ValueError(f"read_avro: unsupported schema node {typ!r}")


def _spark_type_of(typ) -> str:
    if isinstance(typ, list):
        non_null = [t for t in typ if t != "null"]
        if len(non_null) != 1:
            raise ValueError(
                f"read_avro: only nullable unions supported, got {typ!r}")
        return _spark_type_of(non_null[0])
    if isinstance(typ, dict):
        if typ.get("type") == "array":
            return f"array<{_spark_type_of(typ['items'])}>"
        return _spark_type_of(typ["type"])
    if typ in _AVRO2SPARK:
        return _AVRO2SPARK[typ]
    raise ValueError(f"read_avro: unsupported schema node {typ!r}")


def _parse_header(buf):
    if bytes(buf[:4]) != _MAGIC:
        raise ValueError("read_avro: not an Avro object container "
                         f"(magic {bytes(buf[:4])!r})")
    pos, meta = 4, {}
    while True:
        n, pos = _zigzag_decode(buf, pos)
        if n == 0:
            break
        if n < 0:
            _, pos = _zigzag_decode(buf, pos)
            n = -n
        for _ in range(n):
            k, pos = _read_value(buf, pos, "string")
            v, pos = _read_value(buf, pos, "bytes")
            meta[k] = v
    sync = bytes(buf[pos:pos + 16])
    return meta, sync, pos + 16


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Distributed Avro OCF reader: one task per file, blocks decoded
    sequentially in-task. Schema comes from a bounded driver read of
    the first file's header (the standard multi-file contract: all
    files share one schema)."""
    import pandas as _pd

    from .readers import _first_file

    with open(_first_file(path), "rb") as f:
        head = f.read(1 << 16)
    meta, _, _ = _parse_header(head)
    schema = _json.loads(meta["avro.schema"].decode())
    if schema.get("type") != "record":
        raise ValueError("read_avro: top-level schema must be a record")
    names = [f["name"] for f in schema["fields"]]
    types = [f["type"] for f in schema["fields"]]
    out_schema = ", ".join(
        f"`{n}` {_spark_type_of(t)}" for n, t in zip(names, types))

    def _parse(batches):
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                buf = bytes(content)
                fmeta, fsync, pos = _parse_header(buf)
                codec = fmeta.get("avro.codec", b"null").decode()
                fschema = _json.loads(fmeta["avro.schema"].decode())
                ftypes = [f["type"] for f in fschema["fields"]]
                while pos < len(buf):
                    n, pos = _zigzag_decode(buf, pos)
                    size, pos = _zigzag_decode(buf, pos)
                    block = buf[pos:pos + size]
                    pos += size
                    if bytes(buf[pos:pos + 16]) != fsync:
                        raise ValueError(
                            "read_avro: sync marker mismatch "
                            "(corrupt or truncated block)")
                    pos += 16
                    if codec == "deflate":
                        block = _zlib.decompress(block, -15)
                    elif codec != "null":
                        raise ValueError(
                            f"read_avro: unsupported codec {codec!r}")
                    bpos = 0
                    for _ in range(n):
                        row = []
                        for t in ftypes:
                            v, bpos = _read_value(block, bpos, t)
                            row.append(v)
                        rows.append(row)
            yield _pd.DataFrame(rows, columns=names)

    return (spark.read.format("binaryFile").load(path)
            .select("content")
            .mapInPandas(_parse, schema=out_schema))
