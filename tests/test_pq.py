"""Product quantization: train/encode/ADC query."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from meza_spark.llm.pq import pq_ann_topk, pq_encode, pq_train


def _clustered_df(spark, n=400, dim=16, n_clusters=8, seed=3):
    # L2-normalized vectors: PQ's ADC ranks by L2, the exact baseline
    # by cosine — on the unit sphere the two orders coincide, which is
    # the documented deployment (normalize_embeddings upstream)
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 5, (n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for i in range(n):
        v = centers[i % n_clusters] + rng.normal(0, 0.3, dim)
        v /= np.linalg.norm(v)
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>"), centers


def test_pq_train_shapes_and_determinism(spark):
    df, _ = _clustered_df(spark)
    cb1 = pq_train(df, m=4, nbits=4, fit_sample=300, seed=11)
    cb2 = pq_train(df, m=4, nbits=4, fit_sample=300, seed=11)
    assert cb1.shape == (4, 16, 4)
    np.testing.assert_array_equal(cb1, cb2)
    # dim not divisible by m
    with pytest.raises(ValueError):
        pq_train(df, m=5)


def test_pq_encode_codes(spark):
    df, _ = _clustered_df(spark)
    cb = pq_train(df, m=4, nbits=4, fit_sample=300, seed=11)
    enc = pq_encode(df, cb)
    rows = enc.select("pq_code").collect()
    assert len(rows) == 400
    for r in rows[:20]:
        code = r["pq_code"]
        assert len(code) == 4
        assert all(0 <= c < 16 for c in code)
    # deterministic across partitionings
    a = {r["vec_id"]: list(r["pq_code"]) for r in enc.collect()}
    b = {r["vec_id"]: list(r["pq_code"])
         for r in pq_encode(df.repartition(7), cb).collect()}
    assert a == b


def test_pq_ann_recall_vs_exact(spark):
    from meza_spark.llm.similarity import cosine_topk

    df, centers = _clustered_df(spark)
    cb = pq_train(df, m=4, nbits=6, fit_sample=400, seed=11)
    enc = pq_encode(df, cb).persist()
    q = [float(x) for x in centers[0]]
    exact = [r["vec_id"] for r in
             cosine_topk(df, q, k=10).collect()]
    approx = [r["vec_id"] for r in
              pq_ann_topk(enc, q, cb, k=10).collect()]
    # distinct cluster-0 points + 24-bit codes: ADC recovers most of
    # top-10 and never leaves the query's cluster
    assert len(set(exact) & set(approx)) >= 7
    assert all(a % 8 == 0 for a in approx)
    # refine re-scores exactly → ordering matches the exact scan on
    # the candidate superset
    refined = [r["vec_id"] for r in
               pq_ann_topk(enc, q, cb, k=10, vec_col="embedding",
                           refine=4).collect()]
    assert len(set(exact) & set(refined)) >= 9


def test_pq_scan_reads_codes_only(spark):
    df, centers = _clustered_df(spark)
    cb = pq_train(df, m=4, nbits=4, fit_sample=300, seed=11)
    enc = pq_encode(df, cb)
    from meza_spark.util import explain_str

    plan = explain_str(
        pq_ann_topk(enc, [float(x) for x in centers[0]], cb, k=5),
        "simple")
    # no join / no exchange of the corpus beyond the top-k reduction
    assert "TakeOrderedAndProject" in plan


def test_ivfpq_recall_and_determinism(spark):
    from meza_spark.llm.pq import ivfpq_ann_topk, ivfpq_encode, ivfpq_train
    from meza_spark.llm.similarity import cosine_topk

    df, centers = _clustered_df(spark)
    co, cb = ivfpq_train(df, nlist=8, m=4, nbits=6, fit_sample=400,
                         seed=11)
    assert co.shape == (8, 16) and cb.shape == (4, 64, 4)
    enc = ivfpq_encode(df, co, cb).persist()
    cells = enc.select("ivf_cell").distinct().count()
    assert 2 <= cells <= 8
    q = [float(x) for x in centers[0]]
    exact = [r["vec_id"] for r in cosine_topk(df, q, k=10).collect()]
    approx = [r["vec_id"] for r in
              ivfpq_ann_topk(enc, q, co, cb, k=10, nprobe=2).collect()]
    assert len(set(exact) & set(approx)) >= 7
    refined = [r["vec_id"] for r in
               ivfpq_ann_topk(enc, q, co, cb, k=10, nprobe=2,
                              vec_col="embedding", refine=4).collect()]
    assert len(set(exact) & set(refined)) >= 9
    # deterministic across partitionings
    a = {r["vec_id"]: (r["ivf_cell"], list(r["pq_code"]))
         for r in enc.collect()}
    b = {r["vec_id"]: (r["ivf_cell"], list(r["pq_code"]))
         for r in ivfpq_encode(df.repartition(7), co, cb).collect()}
    assert a == b


def test_ivfpq_probe_filter_prunes(spark):
    from meza_spark.llm.pq import ivfpq_ann_topk, ivfpq_encode, ivfpq_train

    df, centers = _clustered_df(spark)
    co, cb = ivfpq_train(df, nlist=8, m=4, nbits=4, fit_sample=400, seed=11)
    enc = ivfpq_encode(df, co, cb)
    from meza_spark.util import explain_str

    plan = explain_str(
        ivfpq_ann_topk(enc, [float(x) for x in centers[0]], co, cb,
                       k=5, nprobe=2), "extended")
    assert "ivf_cell" in plan and ("IN" in plan or "in(" in plan.lower())
