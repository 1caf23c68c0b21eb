"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": N, "unit": "sec", "queries":
{...}, "sf": ...}.

Each query executes via the `noop` sink so the full plan runs (no
driver-side collect cost, no column pruning down to count(*)).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing", "q3_shipping", "q5_local_supplier", "cut_project", "tfilter_orders",
    "unique_custseg", "sort_topk", "pivot_returnflag", "join_inner",
    "join_left", "rollup_agg", "grouping_sets", "window_tumbling",
    "window_running", "topk_per_group", "lag_lead", "corr_manual",
    "cast_fuzzy_date", "llm_token_count", "llm_quality", "llm_fingerprint",
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash", "embed_topk",
    "embed_ann_lsh", "multimodal_meta", "grouped_apply",
    "stream_session_static", "join_asof", "join_range",
    "dedup_embed_cosine", "ngram_jaccard_pairs", "fillempty_bfill",
    "cast_decimal", "flatten_props", "string_funcs", "join_salted",
    "agg_salted", "udaf_range", "group_collect", "type_predicates",
    "infer_types_orders",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    import __spark_entry__ as entry
    from meza_spark.session import get_spark

    spark = get_spark("meza_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry.queries()
    # warmup: JVM + codegen + parquet footer caches, and the Python
    # worker pool (first Arrow-UDF query otherwise pays worker spawn)
    qs["sort_topk"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    spark.range(64).repartition(32) \
        .mapInPandas(lambda it: it, "id long") \
        .write.format("noop").mode("overwrite").save()

    times = {}
    total = 0.0
    for name in HEADLINE:
        fn = qs.get(name)
        if fn is None:
            continue
        # best-of-2: this host's load varies run-to-run by ±25%; the min
        # is the reproducible steady-state signal
        best = None
        for _ in range(2):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        times[name] = round(best, 3)
        total += times[name]

    print(json.dumps({
        "metric": "headline_queries_total_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))


if __name__ == "__main__":
    main()
