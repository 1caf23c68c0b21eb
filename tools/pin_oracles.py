"""Regenerate `_oracle_pins.py` — VALUES-literal oracles for the
seeded, deterministic-but-not-SQL-expressible queries (k-means / ANN /
SemDeDup), per r2 verdict #3 ("embed the expected seeded output as a
VALUES literal the way infer_types_orders does").

The pinned queries are bit-deterministic across engine configs
(hash-ordered fit samples + seeded numpy Lloyd — verified by running
under different cpu/shuffle-partition settings), so a captured run is
a faithful oracle at the SF it was captured at. Round 8 (r7 verdict
#7): pins are captured at BOTH driver SFs — 0.01 (the correctness
gate; also the flat `PINNED` dict `oracle_sql()` merges) and 0.1 (the
scale-diff gate) — so SCALE_DIFF covers the full registry instead of
PINNED-SKIPping 13 queries. Any other SF still reports PINNED-SKIP.

Usage: python tools/pin_oracles.py          # rewrites _oracle_pins.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PIN_SFS = ("0.01", "0.1")   # first entry = the driver-facing flat dict

# query name -> columns are taken from the result frame itself
PIN_QUERIES = [
    "embed_kmeans",
    "dedup_semantic",
    "embed_ann_lsh",
    "embed_ann_ivf",
    "embed_ann_pq",
    "embed_ann_ivfpq",
    "embed_pca",
    "llm_bpe_tokens",
    "llm_lr_score",
    "multimodal_jpeg",
    "multimodal_jpeg_prog",
    "multimodal_avi",
    "multimodal_mp4v",
]


def _lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, float):
        return repr(v)  # shortest round-trip decimal; parses identically
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return str(v)


def main():
    import __spark_entry__ as entry
    from meza_spark.session import get_spark

    spark = get_spark("pin_oracles",
                      conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()

    by_sf: dict[str, dict[str, str]] = {}
    for sf in PIN_SFS:
        pins = {}
        for name in PIN_QUERIES:
            df = qs[name](spark, f"/root/testdata/sf{sf}")
            cols = df.columns
            rows = sorted(tuple(r) for r in df.collect())
            values = ",\n              ".join(
                "(" + ", ".join(_lit(v) for v in row) + ")" for row in rows)
            sel = ", ".join(f"col{i} AS {c}" for i, c in enumerate(cols))
            pins[name] = (f"SELECT {sel}\n            FROM (VALUES "
                          f"{values}) v\n")
            print(f"pinned {name} @ sf{sf}: {len(rows)} rows x "
                  f"{len(cols)} cols")
        by_sf[sf] = pins

    # the pin DATA goes to a JSON fixture, NOT a .py file, so the
    # generated VALUES text stays out of the repo's Python LoC
    # surface (r8 verdict task #6); _oracle_pins.py is a small
    # hand-written loader over this file
    import json

    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "fixtures",
        "oracle_pins.json")
    with open(out_path, "w") as f:
        json.dump({"pin_sf": PIN_SFS[0], "pinned_by_sf": by_sf},
                  f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
