"""DoReMi-lite domain reweighting (llm/mixing.py)."""

import math

import pytest
from pyspark.sql import functions as F

from meza_spark.llm.mixing import fit_domain_weights, mixture_sample


@pytest.fixture()
def corpus(spark):
    rows = []
    for i in range(300):
        if i % 3 == 0:
            rows.append((i, "web", 100.0))      # low loss
        elif i % 3 == 1:
            rows.append((i, "books", 200.0))    # mid
        else:
            rows.append((i, "code", 300.0))     # high loss
    return spark.createDataFrame(
        rows, "doc_id long, source string, loss double")


def test_upweights_high_loss_domains(corpus):
    w = {r["domain"]: r["weight_micro"]
         for r in fit_domain_weights(corpus, "source", "loss").collect()}
    assert w["code"] > w["books"] > w["web"]
    assert abs(sum(w.values()) - 1_000_000) <= 3   # rounding slack
    m = {r["domain"]: r["mean_loss_micro"]
         for r in fit_domain_weights(corpus, "source", "loss").collect()}
    assert m == {"web": 100_000_000, "books": 200_000_000,
                 "code": 300_000_000}


def test_equal_losses_stay_uniform(spark):
    df = spark.createDataFrame(
        [(i, "d%d" % (i % 4), 5.0) for i in range(40)],
        "doc_id long, source string, loss double")
    w = [r["weight_micro"]
         for r in fit_domain_weights(df, "source", "loss").collect()]
    assert w == [250_000] * 4


def test_partitioning_invariance(corpus):
    a = sorted(map(tuple, fit_domain_weights(
        corpus.repartition(7), "source", "loss").collect()))
    b = sorted(map(tuple, fit_domain_weights(
        corpus.coalesce(1), "source", "loss").collect()))
    assert a == b


def test_matches_hand_replica(spark):
    """Bit-exact vs an independent plain-float replica of the update
    (two domains, means 10 and 30, one iteration)."""
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 10.0), (3, "b", 30.0)],
        "doc_id long, source string, loss double")
    got = {r["domain"]: r["weight_micro"] for r in fit_domain_weights(
        df, "source", "loss", iters=1, lr=0.5,
        smoothing=0.1).collect()}
    w0 = math.floor(1e6 / 2 + 0.5)
    lam = {"a": 0.0, "b": 1.0}
    b = {d: math.floor(w0 * (1 + 0.5 * lam[d]) + 0.5) for d in lam}
    tot = sum(b.values())
    exp = {d: math.floor(((1 - 0.1) * (b[d] / tot) + 0.1 / 2)
                         * 1e6 + 0.5) for d in lam}
    assert got == exp


def test_smoothing_keeps_domains_alive(corpus):
    w = {r["domain"]: r["weight_micro"] for r in fit_domain_weights(
        corpus, "source", "loss", iters=50).collect()}
    # many iterations concentrate on 'code', but u-smoothing floors
    # every domain at ~s/k
    assert w["web"] >= 30_000
    assert w["code"] > 700_000 > w["books"]


def test_mixture_sample_shapes_corpus(corpus):
    weights = fit_domain_weights(corpus, "source", "loss")
    out = mixture_sample(corpus, weights, "source", "doc_id")
    counts = {r["source"]: r["n"] for r in
              out.groupBy("source").agg(F.count("*").alias("n"))
              .collect()}
    # the most-upweighted domain keeps everything; lower-loss domains
    # thin out monotonically
    assert counts["code"] == 100
    assert counts.get("web", 0) < counts.get("books", 0) < 100
    # deterministic: same rows again
    again = mixture_sample(corpus, weights, "source", "doc_id")
    assert sorted(r["doc_id"] for r in out.collect()) == \
        sorted(r["doc_id"] for r in again.collect())


def test_empty_input(spark):
    df = spark.createDataFrame([], "doc_id long, source string, loss double")
    assert fit_domain_weights(df, "source", "loss").count() == 0
