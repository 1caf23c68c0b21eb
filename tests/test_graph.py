"""Graph operators: degrees + PageRank vs a plain-Python replica."""

import pytest

from meza_spark.graph import degrees, pagerank


def _py_pagerank(edge_list, n_iter=10, damping=0.85, round_digits=12):
    """Row-by-row replica of the documented formula (same rounding
    schedule) — the hand-check the Spark loop must match exactly."""
    from collections import defaultdict
    from decimal import Decimal

    w = defaultdict(float)
    for s, d, ww in edge_list:
        w[(s, d)] += ww
    outw = defaultdict(float)
    for (s, _d), ww in w.items():
        outw[s] += ww
    verts = sorted({s for s, _, _ in edge_list}
                   | {d for _, d, _ in edge_list})
    n = len(verts)
    base = (1.0 - damping) / n
    r = {v: round(1.0 / n, round_digits) for v in verts}
    for _ in range(n_iter):
        dang = float(sum((Decimal(str(r[v])) for v in verts
                          if v not in outw), Decimal(0)))
        contrib = defaultdict(list)
        for (s, d), ww in w.items():
            contrib[d].append(r[s] * ww / outw[s])
        r = {v: round(base + damping
                      * (float(sum((Decimal(repr(c))
                                    for c in contrib.get(v, [])),
                                   Decimal(0))) + dang / n),
                      round_digits)
             for v in verts}
    return r


@pytest.fixture(scope="module")
def cycle_edges(spark):
    return spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "src long, dst long")


def test_degrees(spark):
    e = spark.createDataFrame([(1, 2), (1, 3), (2, 3), (2, 3)],
                              "src long, dst long")
    got = {r["v"]: (r["out_degree"], r["in_degree"], r["degree"])
           for r in degrees(e).collect()}
    assert got == {1: (2, 0, 2), 2: (2, 1, 3), 3: (0, 3, 3)}


def test_pagerank_cycle_uniform(cycle_edges):
    """A 3-cycle is rank-regular: every vertex holds exactly 1/3."""
    got = {r["v"]: r["pagerank"]
           for r in pagerank(cycle_edges, n_iter=5).collect()}
    assert got == pytest.approx({1: 1 / 3, 2: 1 / 3, 3: 1 / 3},
                                abs=1e-9)


def test_pagerank_dangling_and_weights(spark):
    """Chain with a dangling sink + weighted fan-out matches the
    plain-Python replica digit-for-digit (same rounding schedule)."""
    rows = [(1, 2, 3.0), (1, 3, 1.0), (2, 3, 2.0), (4, 1, 1.0)]
    e = spark.createDataFrame(rows, "src long, dst long, w double")
    got = {r["v"]: r["pagerank"]
           for r in pagerank(e, weight="w", n_iter=10).collect()}
    exp = _py_pagerank(rows, n_iter=10)
    assert got == exp
    # probability mass is conserved (dangling redistribution works)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_parallel_edges_collapse(spark):
    """Parallel unweighted edges pre-aggregate: 2× (1→2) behaves as
    weight 2, not as two separate unit contributions with a doubled
    out-weight denominator (either way ranks match the replica)."""
    rows = [(1, 2, 1.0), (1, 2, 1.0), (1, 3, 1.0), (2, 1, 1.0),
            (3, 1, 1.0)]
    e = spark.createDataFrame(rows, "src long, dst long, w double")
    got = {r["v"]: r["pagerank"]
           for r in pagerank(e, weight="w", n_iter=8).collect()}
    assert got == _py_pagerank(rows, n_iter=8)


def test_pagerank_empty(spark):
    e = spark.createDataFrame([], "src long, dst long")
    assert pagerank(e).count() == 0
