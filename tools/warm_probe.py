"""Warm profiling probe — times query CONSTRUCTION (fn(spark, sf_dir),
including any declared eager barrier jobs) separately from EXECUTION
(noop sink) in one warm session, the split the bench's per-query
number hides. Used by the r10 optimization round to find py4j-chatty
builders and to warm-A/B individual queries.

Usage:
  python tools/warm_probe.py [--reps N] [--sf DIR] [query ...]
With no query names: all HEADLINE queries (construction profile).
Output: one JSON line per query {name, build: [...], exec: [...]} and
a sorted summary on stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    args = sys.argv[1:]
    reps = 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/meza_bench_split_sf0.1")
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--reps":
            reps = int(args[i + 1]); i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]; i += 2
        else:
            names.append(args[i]); i += 1

    import bench
    import __spark_entry__ as entry

    spark = bench._open_session(entry)
    qs = entry.queries()
    if not names:
        names = [n for n in bench.HEADLINE if n in qs]
    bench._warmup(spark, qs, sf_dir)

    rows = []
    for name in names:
        fn = qs[name]
        builds, execs = [], []
        for _ in range(reps):
            t0 = time.time()
            df = fn(spark, sf_dir)
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            builds.append(round(t1 - t0, 3))
            execs.append(round(t2 - t1, 3))
        row = {"name": name, "build": builds, "exec": execs,
               "best_build": min(builds), "best_exec": min(execs)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    rows.sort(key=lambda r: -(r["best_build"] + r["best_exec"]))
    tb = sum(r["best_build"] for r in rows)
    te = sum(r["best_exec"] for r in rows)
    print(f"\nTOTAL best: build {tb:.1f}s exec {te:.1f}s "
          f"({len(rows)} queries)", file=sys.stderr)
    for r in rows[:40]:
        print(f"{r['best_build']+r['best_exec']:7.3f}  "
              f"b={r['best_build']:6.3f} e={r['best_exec']:6.3f}  "
              f"{r['name']}", file=sys.stderr)


if __name__ == "__main__":
    main()
