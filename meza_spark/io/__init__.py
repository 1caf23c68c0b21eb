"""Readers and writers (reference: meza/io.py, meza/convert.py sinks).

Splittable formats (csv/tsv/json/parquet/text) go straight through
``spark.read`` — distributed scans with pushdown. Non-splittable
formats (xls, html, yaml, dbf, sqlite, fixed-width headers) parse
per-FILE in parallel: one task per file via ``parallelize(paths)`` +
driver-side schema union, matching SURVEY §4.2.3's "parallelize across
files, not within".
"""

from .archive import (encode_gz, encode_tar, encode_zip,
                      expand_archive, expand_archive_bytes)
from .readers import (
    detect_encoding, io_join, read, read_csv, read_dbf, read_fixed_fmt,
    read_geojson, read_html, read_json, read_mdb, read_media, read_ndjson,
    read_sqlite, read_tsv, read_xls, read_yaml,
)
from .writers import (
    hash_file, records2csv, records2geojson, records2json, write,
)

__all__ = [
    "read", "read_csv", "read_tsv", "read_fixed_fmt", "read_json",
    "read_ndjson", "read_geojson", "read_yaml", "read_html", "read_xls",
    "read_sqlite", "read_dbf", "read_mdb", "io_join", "read_media",
    "detect_encoding",
    "records2csv", "records2json", "records2geojson", "write",
    "hash_file",
    "expand_archive", "expand_archive_bytes", "encode_zip",
    "encode_tar", "encode_gz",
]
