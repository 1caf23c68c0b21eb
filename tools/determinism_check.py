"""Cross-config determinism audit: run queries under two deliberately
different engine configs (cpu count, shuffle partitions) in separate
JVMs and compare order-insensitive result hashes.

This is the property the VALUES-pinned oracles and every
`deterministic sampling` claim rest on: identical output bits
regardless of partition layout, parallelism, or scheduling. The seeded
fits (k-means/ANN/SemDeDup), the md5-threshold samplers, and the
two-pass cumsum packers are the queries most at risk — they form the
default subset.

Usage: python tools/determinism_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_QUERIES = [
    # seeded fits (feed the VALUES pins)
    "embed_kmeans", "dedup_semantic", "embed_ann_lsh", "embed_ann_ivf",
    "embed_ann_pq", "embed_ann_ivfpq",
    # hash-order / cumsum determinism
    "sample_hash", "sample_stratified_count", "sample_quality",
    "sample_split", "shuffle_rank", "pack_shards", "pack_sequences",
    # kernel-scored pair ops
    "dedup_minhash_lsh", "dedup_simhash", "dedup_embed_cosine",
    "dedup_near_e2e", "dedup_span_rewrite", "dedup_incremental_near",
    # round-4: iterative float loop + exact-moment fit + budget prefix
    "graph_pagerank", "embed_pca", "sample_budget", "decontam_fuzzy",
    "llm_bpe_tokens",
    # round-4b: fitted-model determinism (DSIR ratios, GD weights)
    "dsir_weights", "dsir_sample", "llm_lr_score",
    # round-4c: kernel argmax, MW iteration, coin-flip resample,
    # float z-pipeline over a row-frame window
    "decontam_semantic", "domain_weights", "mixture_resample",
    "zscore_events",
    "cusum_events",
    "ewma_events",
    "attribution_events",
    "graph_lpa",
    "session_paths_events",
    "top_session_paths",
    "rfm_events",
    "inverted_index_docs",
    "json_normalize_lines",
    # round-5: IEEE fast paths (window-frame float sums must still be
    # layout-invariant given the tiebreak total order) + the
    # interlace-mixed PNG decode
    "zscore_events_fast",
    "cusum_events_fast",
    "ewma_events_fast",
    "multimodal_png", "multimodal_gif", "multimodal_jpeg",
    "multimodal_mixed",
    "multimodal_g711",
    "multimodal_tiff",
    # round-6: progressive JPEG, animation walks (GIF/APNG incl. the
    # float over-blend), MJPEG container walks, new audio containers,
    # Jet3 jump-table/LVAL roundtrip
    "multimodal_jpeg_prog",
    "multimodal_gif_anim",
    "multimodal_apng",
    "multimodal_avi",
    "multimodal_mp4v",
    "multimodal_aiff",
    "multimodal_au",
    "mdb3_wide_roundtrip",
    # round-7: the fast-path contract gates (full-outer join of the
    # exact and IEEE twins must be layout-invariant) and the realigned
    # type-inference convergence
    "zscore_fast_parity",
    "cusum_fast_parity",
    "ewma_fast_parity",
    "infer_types_orders",
    # round-7 second pass: the sequential ADPCM state walk (pure
    # int state machine — must be bit-identical everywhere) and the
    # 16-bit palette lookup
    "multimodal_ima4",
    "multimodal_tiff_pal16",
    "multimodal_pcm_deep",
    # round-8: the VP8L entropy/transform machinery (pure integer
    # bit arithmetic) and the binaryFile+sniff directory roundtrip
    "multimodal_webp",
    "multimodal_webp_anim",
    "multimodal_flac",
    "media_dir_roundtrip",
    # round-9: PDF pipeline + the widened avif/heic/svg headers cycle
    # + the zip-document (docx/pptx/odt/epub) pipeline
    "pdf_extract",
    "office_extract",
    "rtf_extract",
    "doc_extract_mixed",
    "doc_dir_e2e",
    "markup_strip",
    "eml_extract",
    "archive_expand",
    "subtitle_extract",
    "ipynb_extract",
    "code_quality_docs",
    "python_facts",
    "wet_wat_roundtrip",
    "robots_eval",
    "sitemap_extract",
    "frontier_e2e",
    "multimodal_headers",
]

_WORKER = r"""
import hashlib, json, os, sys
sys.path.insert(0, {root!r})
os.environ["SPARK_GRAFT_CPUS"] = {cpus!r}
import __spark_entry__ as entry
from meza_spark.session import get_spark
spark = get_spark("det_{tag}", shuffle_partitions={shuffle},
                  conf={{"spark.ui.showConsoleProgress": "false"}})
spark.sparkContext.setLogLevel("ERROR")
qs = entry.queries()
out = {{}}
for name in {names!r}:
    df = qs[name](spark, {sf_dir!r})
    rows = sorted(tuple(str(x) for x in r) for r in df.collect())
    out[name] = [len(rows),
                 hashlib.md5(str(rows).encode()).hexdigest()]
print("DETJSON" + json.dumps(out))
"""


def _run(root, sf_dir, names, tag, cpus, shuffle):
    code = _WORKER.format(root=root, cpus=cpus, tag=tag, shuffle=shuffle,
                          names=names, sf_dir=sf_dir)
    r = subprocess.run([sys.executable, "-c", code],
                       capture_output=True, text=True)
    for line in r.stdout.splitlines():
        if line.startswith("DETJSON"):
            return json.loads(line[len("DETJSON"):])
    raise RuntimeError(f"worker[{tag}] produced no result:\n"
                       f"{r.stdout[-2000:]}\n{r.stderr[-2000:]}")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]) \
        else "/root/testdata/sf0.01"
    names = [a for a in sys.argv[2:] if not os.path.isdir(a)] \
        or DEFAULT_QUERIES
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    a = _run(root, sf_dir, names, "a", "4", 7)
    b = _run(root, sf_dir, names, "b", "32", 13)

    fails = 0
    for name in names:
        same = a[name] == b[name]
        fails += 0 if same else 1
        mark = "✓" if same else "✗"
        print(f"{mark} {name:24s} rows={a[name][0]:<8d} "
              f"{'MATCH' if same else f'{a[name]} != {b[name]}'}")
    print(f"\n{len(names)} queries, {fails} nondeterministic")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
