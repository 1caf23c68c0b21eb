"""Writers (reference: meza/convert.py records2* + meza/io.py write).

Distributed-first: every writer has a ``single_file`` escape hatch for
meza-parity small outputs (driver-side assembly), but the default path
is executor-parallel ``df.write`` — at 100 TB nothing should funnel
through the driver.
"""

from __future__ import annotations

import json as _json
import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["records2csv", "records2json", "records2geojson", "write",
           "write_bucketed",
           "hash_file"]


def hash_file(path_or_df, algo: str = "sha1", spark=None):
    """File content digest (ref: meza/io.py:1504-1551).

    Driver path: ``hash_file('/p/file')`` → hex digest via hashlib.
    Distributed path: ``hash_file(dir, spark=spark)`` → DataFrame of
    (path, digest) over Spark's binaryFile source — hash 1M files in
    parallel instead of one driver loop.
    """
    import hashlib

    if spark is not None:
        df = spark.read.format("binaryFile").load(path_or_df)
        if algo == "sha1":
            h = F.sha1("content")
        elif algo == "md5":
            h = F.md5("content")
        else:
            h = F.sha2("content", int(algo.replace("sha", "") or 256))
        return df.select("path", h.alias("digest"))
    h = hashlib.new(algo)
    with open(path_or_df, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _collapse_part(dir_path: str, final_path: str, ext: str):
    part = next(p for p in sorted(os.listdir(dir_path))
                if p.startswith("part-") and p.endswith(ext))
    shutil.move(os.path.join(dir_path, part), final_path)
    shutil.rmtree(dir_path)


def records2csv(df: DataFrame, path: str, header: bool = True,
                single_file: bool = False, **options) -> None:
    """DataFrame → CSV (ref: meza/convert.py:807-849; header from
    column order, which the engine preserves end-to-end).

    Default: distributed ``df.write.csv`` (one file per partition).
    ``single_file=True``: coalesce(1) + collapse — the meza-style one
    .csv artifact; only for driver-sized results.
    """
    w = df.write.mode("overwrite").option("header", str(header).lower())
    for k, v in options.items():
        w = w.option(k, v)
    if single_file:
        tmp = path + ".d"
        w = df.coalesce(1).write.mode("overwrite") \
            .option("header", str(header).lower())
        for k, v in options.items():
            w = w.option(k, v)
        w.csv(tmp)
        _collapse_part(tmp, path, ".csv")
    else:
        w.csv(path)


def records2json(df: DataFrame, path: str, newline: bool = True,
                 single_file: bool = False) -> None:
    """DataFrame → JSON (ref: meza/convert.py:852-892): NDJSON by
    default (splittable, scalable); ``newline=False`` writes one JSON
    array — a single object by definition, but STREAMED to disk via
    ``toJSON().toLocalIterator()`` (executors serialize, the driver
    holds one partition at a time, never the whole result), matching
    the reference's array form without its all-in-memory cost."""
    if newline and not single_file:
        df.write.mode("overwrite").json(path)
        return
    if newline:
        tmp = path + ".d"
        df.coalesce(1).write.mode("overwrite").json(tmp)
        _collapse_part(tmp, path, ".json")
        return
    with open(path, "w", encoding="utf-8") as f:
        f.write("[")
        for i, line in enumerate(df.toJSON().toLocalIterator()):
            f.write(",\n " if i else "")
            f.write(line)
        f.write("]")


def records2geojson(df: DataFrame, path: str, id_col: str = "id",
                    lon_col: str = "lon", lat_col: str = "lat",
                    pos_col: str = "pos", seq_col: str = "seq") -> None:
    """Flat records → GeoJSON FeatureCollection with computed global
    bbox (ref: meza/convert.py:998-1099, gen_subresults 980-995,
    bbox 1061-1088).

    Spark-first: per-feature assembly is a ``groupBy(id)`` +
    ``collect_list(struct(pos,seq,lon,lat))`` aggregation sorted by
    (ring, vertex order); the bbox is a global min/max agg — both
    distributed. Only the final FeatureCollection wrapper (one JSON
    object by definition) materializes on the driver.

    Geometry fidelity: ``read_geojson`` emits ``seq`` (vertex order)
    and ``pos`` (polygon ring index); sorting on (pos, seq) rebuilds
    LineString vertex order exactly and groups Polygon coordinates
    back into their original rings. When those columns are absent
    (hand-built frames), vertices fall back to (lon, lat) sort —
    deterministic, but order-preserving only for Points.
    """
    has_pos = pos_col in df.columns
    has_seq = seq_col in df.columns
    skip = {id_col, lon_col, lat_col, "type"}
    skip |= {pos_col} if has_pos else set()
    skip |= {seq_col} if has_seq else set()
    prop_cols = [c for c in df.columns if c not in skip]
    bbox_row = df.agg(F.min(lon_col), F.min(lat_col),
                      F.max(lon_col), F.max(lat_col)).collect()[0]
    bbox = [float(v) for v in bbox_row]

    pos_expr = (F.coalesce(F.col(pos_col).cast("long"), F.lit(0))
                if has_pos else F.lit(0))
    seq_parts = ([F.coalesce(F.col(seq_col).cast("long"),
                             F.lit(0)).alias("seq")] if has_seq else [])
    grouped = (df.groupBy(id_col)
               .agg(F.first("type").alias("_gtype"),
                    F.sort_array(F.collect_list(F.struct(
                        pos_expr.alias("pos"), *seq_parts,
                        F.col(lon_col).alias("lon"),
                        F.col(lat_col).alias("lat")))).alias("_coords"),
                    *[F.first(c, ignorenulls=True).alias(c)
                      for c in prop_cols]))
    feats = []
    for r in grouped.collect():
        gtype = r["_gtype"]
        if gtype == "Point":
            c0 = r["_coords"][0]
            geometry = {"type": "Point", "coordinates": [c0["lon"],
                                                         c0["lat"]]}
        elif gtype == "LineString":
            geometry = {"type": "LineString",
                        "coordinates": [[c["lon"], c["lat"]]
                                        for c in r["_coords"]]}
        else:
            rings: list[list[list[float]]] = []
            for c in r["_coords"]:  # already sorted by (pos, seq)
                while len(rings) <= c["pos"]:
                    rings.append([])
                rings[c["pos"]].append([c["lon"], c["lat"]])
            geometry = {"type": "Polygon", "coordinates": rings}
        feats.append({
            "type": "Feature", "id": r[id_col], "geometry": geometry,
            "properties": {c: r[c] for c in prop_cols},
        })
    feats.sort(key=lambda f: (f["id"] is None, f["id"]))
    collection = {"type": "FeatureCollection", "bbox": bbox,
                  "features": feats}
    with open(path, "w", encoding="utf-8") as f:
        _json.dump(collection, f, default=float)


def write(df: DataFrame, path: str, fmt: str | None = None,
          partition_by=None, mode: str = "overwrite", **options) -> None:
    """Generic sink dispatcher (ref: meza/io.py:1434-1501 ``write`` —
    there a file flusher; here the ``df.write`` facade)."""
    fmt = fmt or os.path.splitext(path)[1].lstrip(".") or "parquet"
    fmt = {"jsonl": "json", "ndjson": "json"}.get(fmt, fmt)
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    for k, v in options.items():
        w = w.option(k, v)
    getattr(w, fmt)(path)


def write_bucketed(df: DataFrame, table: str, bucket_by: str | list[str],
                   n_buckets: int = 32, sort_by=None,
                   fmt: str = "parquet", mode: str = "overwrite") -> None:
    """Bucketed table write — the co-located-join primitive at scale.

    Two tables bucketed on the same key with the same bucket count
    sort-merge-join WITHOUT an Exchange on either side: the shuffle is
    paid once at write time, then every subsequent join/groupBy on the
    bucket key is shuffle-free. This is the 100 TB answer for a fact
    table joined repeatedly on the same key (orders⋈lineitem); the
    reference has no analog (its only join is a nested loop,
    meza/process.py:785-810).
    """
    cols = [bucket_by] if isinstance(bucket_by, str) else list(bucket_by)
    w = (df.write.mode(mode).format(fmt)
         .bucketBy(n_buckets, *cols))
    if sort_by:
        sb = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        w = w.sortBy(*sb)
    w.saveAsTable(table)
