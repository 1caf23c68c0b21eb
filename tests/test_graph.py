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


def test_label_propagation_two_triangles(spark):
    from meza_spark.graph import label_propagation

    edges = [(1, 2), (2, 3), (3, 1), (4, 5), (5, 6), (6, 4), (3, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = dict((r["v"], r["community"])
               for r in label_propagation(df, n_iter=5).collect())
    # each triangle settles on one community label
    assert got[1] == got[2] == got[3]
    assert got[4] == got[5] == got[6]
    # partitioning invariance (the determinism claim)
    got2 = dict((r["v"], r["community"]) for r in label_propagation(
        df.repartition(5), n_iter=5).collect())
    assert got == got2


def test_label_propagation_exact_python_replica(spark):
    from collections import Counter

    from meza_spark.graph import label_propagation

    edges = [(i, (i * 7) % 12) for i in range(12) if i != (i * 7) % 12]
    edges += [(2, 9), (3, 10)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = dict((r["v"], r["community"])
               for r in label_propagation(df, n_iter=3).collect())

    und = set()
    for a, b in edges:
        if a != b:
            und.add((a, b))
            und.add((b, a))
    labels = {v: v for v, _ in und}
    for _ in range(3):
        nxt = {}
        for v in labels:
            cnt = Counter(labels[b] for a, b in und if a == v)
            if cnt:
                best = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
                nxt[v] = best[0]
            else:
                nxt[v] = labels[v]
        labels = nxt
    assert got == labels


def test_label_propagation_self_loops_ignored(spark):
    from meza_spark.graph import label_propagation

    df = spark.createDataFrame([(1, 1), (1, 2)], "src long, dst long")
    # one round: each vertex adopts its only neighbor's label (the
    # self-loop contributes nothing); two rounds swap back — the
    # documented synchronous-LPA oscillation on a 2-path
    one = dict((r["v"], r["community"])
               for r in label_propagation(df, n_iter=1).collect())
    assert one == {1: 2, 2: 1}
    two = dict((r["v"], r["community"])
               for r in label_propagation(df, n_iter=2).collect())
    assert two == {1: 1, 2: 2}
