"""Operator unit tests mirroring the reference's test strategy
(SURVEY §5: tests/test_process.py in reubano/meza — fixtures re-created
per FIXTURES.md §9, not copied)."""

import pyspark.sql.functions as F
import pytest

from meza_spark import process as pr
from meza_spark.util import explain_str


@pytest.fixture(scope="module")
def people(spark):
    return spark.createDataFrame(
        [(1, "alice", 30, 55.5), (2, "bob", None, 60.0),
         (3, "carol", 25, None), (4, "dave", 25, 70.0)],
        "id int, name string, age int, weight double")


def test_cut_keep(people):
    out = pr.cut(people, ["id", "name"])
    assert out.columns == ["id", "name"]
    assert out.count() == 4


def test_cut_exclude_prune(spark):
    df = spark.createDataFrame([(1, None), (None, None)], "a int, b int")
    out = pr.cut(df, ["a"], exclude=True, prune=True)
    assert out.columns == ["b"]
    assert out.count() == 0


def test_tfilter_pred_and_inverse(people):
    assert pr.tfilter(people, "age", lambda c: c == 25).count() == 2
    assert pr.tfilter(people, "age", lambda c: c == 25, inverse=True).count() == 2
    # default pred = truthiness: nulls drop
    assert pr.tfilter(people, "age").count() == 3


def test_grep_substring_regex_any_match(people):
    rules = [{"fields": ["name"], "pattern": "a"}]
    assert pr.grep(people, rules).count() == 3  # alice, carol, dave
    rules = [{"fields": ["name"], "pattern": "^[ab]", "regex": True}]
    assert pr.grep(people, rules).count() == 2
    both = [{"fields": ["name"], "pattern": "alice"},
            {"fields": ["name"], "pattern": "bob"}]
    assert pr.grep(people, both, any_match=True).count() == 2
    assert pr.grep(people, both, any_match=False).count() == 0
    assert pr.grep(people, both, any_match=True, inverse=True).count() == 2


def test_unique_deterministic(people):
    out = pr.unique(people, ["age"], keep="first")
    rows = {r["age"]: r["id"] for r in out.collect()}
    assert rows[25] == 3  # min id among age=25
    assert out.count() == 3


def test_hash_md5(spark):
    df = spark.createDataFrame([("x",)], "v string")
    row = pr.hash_(df, ["v"], "md5").collect()[0]
    import hashlib
    assert row["v"] == hashlib.md5(b"x").hexdigest()


def test_sort_multi_key(people):
    out = pr.sort(people, ["age", "id"], reverse=[True, False]).collect()
    assert [r["id"] for r in out] == [1, 3, 4, 2]  # nulls last? spark: nulls first on asc... desc -> nulls last
    ages = [r["age"] for r in out]
    assert ages[0] == 30


def test_peek(people):
    df, rows = pr.peek(people, 2)
    assert len(rows) == 2 and df.count() == 4


def test_fillempty_constant_and_fill_key(people):
    out = pr.fillempty(people, value=0, fields=["age"])
    assert out.filter(F.col("age").isNull()).count() == 0
    out2 = pr.fillempty(people, fill_key="id", fields=["age"])
    assert out2.filter(F.col("id") == 2).collect()[0]["age"] == 2


def test_fillempty_ffill_bfill(spark):
    df = spark.createDataFrame(
        [(1, None), (2, 10), (3, None), (4, None), (5, 20)],
        "ord int, v int")
    f = pr.fillempty(df, method="front", fields=["v"], order_by="ord")
    got = {r["ord"]: r["v"] for r in f.collect()}
    assert got == {1: None, 2: 10, 3: 10, 4: 10, 5: 20}
    b = pr.fillempty(df, method="back", fields=["v"], order_by="ord")
    got = {r["ord"]: r["v"] for r in b.collect()}
    assert got == {1: 10, 2: 10, 3: 20, 4: 20, 5: 20}


def test_unique_keyfunc(spark):
    df = spark.createDataFrame(
        [(1, "Alice"), (2, "ALICE"), (3, "bob")], "id int, name string")
    out = pr.unique(df, pred=F.lower(F.col("name")))
    assert sorted(r["id"] for r in out.collect()) == [1, 3]
    # callable df -> Column form
    out2 = pr.unique(df, pred=lambda d: F.lower(d["name"]))
    assert sorted(r["id"] for r in out2.collect()) == [1, 3]


def test_unique_bufsize_windowed(spark):
    # key 'a' at rows 1,3,10 with bufsize 5: row3 dropped (dist 2),
    # row10 kept (dist 7 > 5); 'b' unique throughout
    rows = [(1, "a"), (2, "b"), (3, "a")] + \
           [(i, f"x{i}") for i in range(4, 10)] + [(10, "a")]
    df = spark.createDataFrame(rows, "ord int, k string")
    out = pr.unique(df, pred=F.col("k"), bufsize=5, order_by="ord")
    assert sorted(r["ord"] for r in out.collect()) == \
        [1, 2] + list(range(4, 10)) + [10]
    with pytest.raises(ValueError):
        pr.unique(df, bufsize=5)


def test_tfilter_value_level_python_pred(people):
    # len() on a Column raises -> auto-wrapped in a UDF (escape hatch)
    out = pr.tfilter(people, "name", pred=lambda v: v is not None
                     and len(v) == 3)
    assert sorted(r["name"] for r in out.collect() if r["name"]) \
        == sorted(n for n in [r["name"] for r in people.collect()]
                  if n and len(n) == 3)
    # Column-fn path still works untouched
    out2 = pr.tfilter(people, "age", pred=lambda c: c > 25)
    assert all(r["age"] > 25 for r in out2.collect())


def test_grep_value_level_python_pattern(people):
    out = pr.grep(people, [{"fields": ["name"],
                            "pattern": lambda v: bool(v)
                            and v.lower().startswith("a")}])
    names = {r["name"] for r in out.collect()}
    assert names == {n for n in
                     (r["name"] for r in people.collect())
                     if n and n.lower().startswith("a")}


def test_fillempty_empty_string_hole_and_pred(spark):
    # meza's fill treats '' as a hole for text (fntools.py:921-923);
    # pred widens the hole definition — and both apply across modes
    df = spark.createDataFrame(
        [(1, "a"), (2, ""), (3, None), (4, "N/A"), (5, "b")],
        "ord int, v string")
    const = pr.fillempty(df, value="X", fields=["v"])
    got = {r["ord"]: r["v"] for r in const.collect()}
    assert got == {1: "a", 2: "X", 3: "X", 4: "N/A", 5: "b"}
    # pred REPLACES the ''-default (meza: custom pred overrides
    # `x is None or x == ''`); null is always a hole
    predf = pr.fillempty(df, value="X", fields=["v"],
                         pred=lambda c: c == "N/A")
    got = {r["ord"]: r["v"] for r in predf.collect()}
    assert got == {1: "a", 2: "", 3: "X", 4: "X", 5: "b"}
    ff = pr.fillempty(df, method="front", fields=["v"], order_by="ord")
    got = {r["ord"]: r["v"] for r in ff.collect()}
    assert got == {1: "a", 2: "a", 3: "a", 4: "N/A", 5: "b"}


def test_aggregate_and_merge(people):
    assert pr.aggregate(people, "age", "sum", alias="s").collect()[0]["s"] == 80
    m = pr.merge(people.select("age", "weight"), op="sum",
                 pred=lambda c: True).collect()[0]
    assert m["age"] == 80 and m["weight"] == 185.5


def test_merge_coalescing_union(spark):
    # ragged dicts {a,b,c} / {a,b,d} (FIXTURES §9 merge)
    df = spark.createDataFrame(
        [(1, 2, 3, None), (4, 5, None, 7)], "a int, b int, c int, d int")
    m = pr.merge(df).collect()[0]
    assert (m["a"], m["b"], m["c"], m["d"]) == (4, 5, 3, 7)


def test_group_modes(people):
    g = pr.group(people, "age", aggs={"n": ("id", "count")})
    got = {r["age"]: r["n"] for r in g.collect()}
    assert got[25] == 2
    lists = pr.group(people, "age").collect()
    by_age = {r["age"]: r["group"] for r in lists}
    assert len(by_age[25]) == 2


def test_pivot_matches_reference_shape(spark):
    # FIXTURES §9 pivot table: A,B,C,D with a missing cell
    df = spark.createDataFrame(
        [("foo", "one", "small", 1), ("foo", "one", "large", 2),
         ("foo", "one", "large", 2), ("foo", "two", "small", 3),
         ("foo", "two", "small", 3), ("bar", "one", "small", 4),
         ("bar", "one", "large", 5), ("bar", "two", "small", 6),
         ("bar", "two", "large", 7)],
        "a string, b string, c string, d int")
    out = pr.pivot(df, rows=["a", "b"], column="c", data="d", op="sum")
    got = {(r["a"], r["b"]): (r["small"], r["large"]) for r in out.collect()}
    assert got[("foo", "two")] == (6, None)  # missing cell stays null
    assert got[("bar", "one")] == (4, 5)
    filled = pr.pivot(df, rows=["a", "b"], column="c", data="d",
                      op="sum", fill_value=0)
    got = {(r["a"], r["b"]): (r["small"], r["large"]) for r in filled.collect()}
    assert got[("foo", "two")] == (6, 0)


def test_normalize_roundtrip(spark):
    df = spark.createDataFrame([(1, 10, 20)], "id int, x int, y int")
    out = pr.normalize(df, ["x", "y"], key_name="k", value_name="v")
    got = {(r["id"], r["k"]): r["v"] for r in out.collect()}
    assert got[(1, "x")] == "10" and got[(1, "y")] == "20"
    inv = pr.normalize(df, ["id"], invert=True, key_name="k", value_name="v")
    assert inv.count() == 2


def test_join_kinds(spark):
    l = spark.createDataFrame([(1, "a"), (2, "b")], "k int, lv string")
    r = spark.createDataFrame([(2, "x"), (3, "y")], "k int, rv string")
    assert pr.join(l, r, on="k").count() == 1
    assert pr.join(l, r, on="k", how="left").count() == 2
    assert pr.join(l, r, on="k", how="full").count() == 3
    assert pr.join(l, r, on="k", how="left_anti").count() == 1
    assert pr.join(l, r, on=None).count() == 4


def test_prepend(people):
    out = pr.prepend(people, {"id": 0, "name": "zed", "age": 1,
                              "weight": 1.0})
    assert out.count() == 5


def test_everseen_running_min(spark):
    df = spark.createDataFrame([(1, 5), (2, 3), (3, 4)], "ord int, v int")
    out = pr.everseen(df, "v", "ord", op="min").collect()
    got = {r["ord"]: r["v_everseen"] for r in out}
    assert got == {1: 5, 2: 3, 3: 3}


def test_topk_per_group(spark):
    df = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 20), ("a", 3, 30), ("b", 4, 5)],
        "g string, id int, v int")
    out = pr.topk_per_group(df, ["g"], ["v", "id"], k=2, desc=[True, False])
    got = sorted((r["g"], r["id"]) for r in out.collect())
    assert got == [("a", 2), ("a", 3), ("b", 4)]


def test_json_recode(spark):
    df = spark.createDataFrame([(1, 2.5)], "a int, b double")
    out = pr.json_recode(df).collect()[0]
    assert out["a"] == "1" and out["b"] == "2.5"


def test_split_partitioned_write(spark, tmp_path):
    df = spark.createDataFrame([("x", 1), ("y", 2)], "g string, v int")
    path = str(tmp_path / "out")
    pr.split(df, path, field="g")
    back = spark.read.parquet(path)
    assert back.count() == 2
    assert sorted(back.columns) == ["g", "v"]


def test_asof_join_backward_forward_tolerance(spark):
    left = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "a", 35.0), (4, "b", 5.0)],
        "id int, k string, t double")
    right = spark.createDataFrame(
        [("a", 10.0, "x"), ("a", 30.0, "y"), ("b", 50.0, "z")],
        "k string, t double, tag string")

    back = {r["id"]: r["tag"] for r in
            pr.asof_join(left, right, on="t", by=["k"]).collect()}
    # tie at t=10 matches (>=); t=20 carries x; t=35 carries y; b@5 none
    assert back == {1: "x", 2: "x", 3: "y", 4: None}

    fwd = {r["id"]: r["tag"] for r in
           pr.asof_join(left, right, on="t", by=["k"],
                        direction="forward").collect()}
    assert fwd == {1: "x", 2: "y", 3: None, 4: "z"}

    tol = {r["id"]: r["tag"] for r in
           pr.asof_join(left, right, on="t", by=["k"],
                        tolerance=5.0).collect()}
    # t=20 is 10 past the t=10 right row -> voided by tolerance
    assert tol == {1: "x", 2: None, 3: "y", 4: None}


def test_asof_join_name_collision_suffix(spark):
    left = spark.createDataFrame([(1, 10.0, "L")], "id int, t double, tag string")
    right = spark.createDataFrame([(5.0, "R")], "t double, tag string")
    out = pr.asof_join(left, right, on="t")
    row = out.collect()[0]
    assert row["tag"] == "L" and row["tag_right"] == "R"
    assert row["t_right"] == 5.0


def test_flatten_nested_structs(spark):
    df = spark.createDataFrame(
        [(1, ((2, "x"), 3.0))],
        "id int, s struct<inner: struct<a: int, b: string>, c: double>")
    out = pr.flatten(df)
    assert out.columns == ["id", "s_inner_a", "s_inner_b", "s_c"]
    assert out.collect()[0].asDict() == {
        "id": 1, "s_inner_a": 2, "s_inner_b": "x", "s_c": 3.0}


def test_slice_rows_negative_last(spark):
    df = spark.range(1, 11).withColumnRenamed("id", "n")
    out = pr.slice_rows(df, "n", first=3, last=-2)  # rows 3..8
    assert [r["n"] for r in out.collect()] == [3, 4, 5, 6, 7, 8]


def test_embedding_near_dupes_block_on(spark):
    from meza_spark.llm.similarity import embedding_near_dupes

    df = spark.createDataFrame(
        [(1, [1.0, 0.0], "g"), (2, [1.0, 0.01], "g"), (3, [0.0, 1.0], "g"),
         (4, [1.0, 0.0], "h")],
        "vec_id int, embedding array<double>, label string")
    out = embedding_near_dupes(df, threshold=0.9, block_on="label")
    pairs = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert pairs == {(1, 2)}  # 3 is orthogonal, 4 is in another block


def test_salted_join_matches_plain_join(spark):
    left = spark.createDataFrame(
        [(i % 3, i) for i in range(300)], "k int, v int")  # skewed-ish
    right = spark.createDataFrame([(0, "a"), (1, "b"), (5, "x")],
                                  "k int, tag string")
    plain = pr.join(left, right, on="k").select("k", "v", "tag")
    salted = pr.salted_join(left, right, on="k").select("k", "v", "tag")
    assert sorted(map(tuple, plain.collect())) == \
        sorted(map(tuple, salted.collect()))
    lplain = pr.join(left, right, on="k", how="left")
    lsalted = pr.salted_join(left, right, on="k", how="left")
    assert lplain.count() == lsalted.count() == 300


def test_bucketed_join_no_shuffle(spark, tmp_path):
    from meza_spark.io.writers import write_bucketed

    a = spark.createDataFrame([(i, i * 2) for i in range(100)],
                              "k bigint, va bigint")
    b = spark.createDataFrame([(i, i * 3) for i in range(100)],
                              "k bigint, vb bigint")
    write_bucketed(a, "bk_a", "k", n_buckets=4, sort_by="k")
    write_bucketed(b, "bk_b", "k", n_buckets=4, sort_by="k")
    # disable broadcast so the join would otherwise need an exchange
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("bk_a").join(spark.table("bk_b"), "k")
        plan = explain_str(j, "simple")
        assert "Exchange" not in plan, plan
        assert j.count() == 100
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS bk_a")
        spark.sql("DROP TABLE IF EXISTS bk_b")


def test_salted_agg_matches_plain(spark):
    df = spark.createDataFrame(
        [(("hot" if i % 10 else "cold"), float(i)) for i in range(1000)],
        "k string, v double")
    got = {r["k"]: (r["s"], r["n"], r["mx"]) for r in
           pr.salted_agg(df, "k", {"s": ("v", "sum"), "n": ("v", "count"),
                                   "mx": ("v", "max")}, salt=8).collect()}
    want = {r["k"]: (r["s"], r["n"], r["mx"]) for r in
            df.groupBy("k").agg(
                __import__("pyspark.sql.functions", fromlist=["x"]).sum("v").alias("s"),
                F.count("v").alias("n"), F.max("v").alias("mx")).collect()}
    assert got == want

    import pytest
    with pytest.raises(ValueError):
        pr.salted_agg(df, "k", {"a": ("v", "avg")})


def test_ivf_ann_recall(spark):
    from meza_spark.llm.similarity import cosine_topk, ivf_ann_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter("vec_id = 0").select("embedding").collect()[0][0]
    exact = {r["vec_id"] for r in cosine_topk(emb, q, k=10).collect()}
    # probing every cell must reproduce exact search
    full = {r["vec_id"] for r in
            ivf_ann_topk(emb, q, k=10, nlist=8, nprobe=8).collect()}
    assert full == exact
    part = {r["vec_id"] for r in
            ivf_ann_topk(emb, q, k=10, nlist=8, nprobe=3).collect()}
    assert len(part & exact) >= 5  # partial probe keeps decent recall


def test_fillempty_limit_consecutive(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, None), (4, None), (5, 20), (6, None)],
        "ord int, v int")
    out = pr.fillempty(df, method="front", fields=["v"], order_by="ord",
                       limit=2)
    got = {r["ord"]: r["v"] for r in out.collect()}
    # ord=4 is 3 rows past the donor at ord=1 -> stays null
    assert got == {1: 10, 2: 10, 3: 10, 4: None, 5: 20, 6: 20}
    back = pr.fillempty(df, method="back", fields=["v"], order_by="ord",
                        limit=1)
    got = {r["ord"]: r["v"] for r in back.collect()}
    assert got == {1: 10, 2: None, 3: None, 4: 20, 5: 20, 6: None}


def test_normalized_join_messy_keys(spark):
    from meza_spark.process import normalized_join

    left = spark.createDataFrame(
        [("United  States",), ("Côte d'Ivoire",), ("nowhere",)], ["name"])
    right = spark.createDataFrame(
        [("UNITED-STATES!", 1), ("côte d’ivoire", 2), ("Japan", 3)],
        ["label", "v"])
    out = normalized_join(left, right, left_on="name",
                          right_on="label")
    got = {r["name"]: r["v"] for r in out.collect()}
    assert got["United  States"] == 1      # case/punct/spacing noise
    assert "nowhere" not in got


def test_fuzzy_join_blocked_and_unblocked(spark):
    from meza_spark.process import fuzzy_join

    left = spark.createDataFrame(
        [("smith", "s"), ("jones", "j")], ["name", "blk"])
    right = spark.createDataFrame(
        [("smyth", "s", 1), ("stone", "s", 2), ("jonez", "j", 3)],
        ["label", "blk2", "v"])
    un = fuzzy_join(left, right, left_on="name", right_on="label",
                    max_distance=1)
    got = {(r["name"], r["label"]) for r in un.collect()}
    assert got == {("smith", "smyth"), ("jones", "jonez")}
    bl = fuzzy_join(left, right, left_on="name", right_on="label",
                    max_distance=1, block_on=("blk", "blk2"))
    assert {(r["name"], r["label"]) for r in bl.collect()} == got
    plan = explain_str(bl, "simple")
    assert "NestedLoop" not in plan   # block key → hash join


def test_resample_gap_fill_modes(spark):
    import datetime as _dt

    from meza_spark.process import resample

    base = _dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [("a", base, 1.0),
            ("a", base + _dt.timedelta(hours=3), 5.0),  # 2-hour gap
            ("b", base, 2.0)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = resample(df, "ts", "3600", keys="k",
                   aggs={"n": ("ts", "count"), "mx": ("v", "max")},
                   fill="ffill")
    got = {(r["k"], r["bucket_ts"].hour): (r["n"], r["mx"])
           for r in out.collect()}
    # a: hours 0..3 materialized; gap hours carry forward hour-0 value
    assert got[("a", 0)] == (1, 1.0)
    assert got[("a", 1)] == (1, 1.0)   # gap row, ffilled
    assert got[("a", 2)] == (1, 1.0)
    assert got[("a", 3)] == (1, 5.0)
    assert got[("b", 0)] == (1, 2.0)
    assert len(got) == 5
    # zero mode: gaps become 0 instead
    z = resample(df, "ts", "3600", keys="k",
                 aggs={"n": ("ts", "count")}, fill="zero")
    gz = {(r["k"], r["bucket_ts"].hour): r["n"] for r in z.collect()}
    assert gz[("a", 1)] == 0 and gz[("a", 2)] == 0


def test_resample_linear_interpolation(spark):
    import datetime as _dt

    from meza_spark.process import resample

    base = _dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [("a", base, 10.0),
            ("a", base + _dt.timedelta(hours=3), 40.0)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = resample(df, "ts", "3600", keys="k",
                   aggs={"mx": ("v", "max")}, fill="linear")
    got = {r["bucket_ts"].hour: r["mx"] for r in out.collect()}
    assert got == {0: 10.0, 1: 20.0, 2: 30.0, 3: 40.0}


def test_resolve_entities_golden_record(spark):
    from meza_spark.process import resolve_entities

    rows = [
        (1, "acme corp", "NY", "retail"),
        (2, "acme c0rp", "NY", "retail"),     # 1-edit dup of 1
        (3, "acme corpX", "NY", None),        # chains to the cluster
        (4, "zenith ltd", "SF", "mining"),    # singleton
    ]
    df = spark.createDataFrame(rows, "id long, name string, city string,"
                                     " sector string")
    out = {r["entity_id"]: r for r in
           resolve_entities(df, "id", "name", max_distance=1).collect()}
    assert set(out) == {1, 4}
    e = out[1]
    assert e["n_members"] == 3
    # all three names distinct (count 1 each) -> tie breaks to the
    # lexicographically SMALLEST value ('0' < 'o')
    assert e["name"] == "acme c0rp"
    assert e["city"] == "NY"
    assert e["sector"] == "retail"       # nulls never win the vote
    assert out[4]["n_members"] == 1 and out[4]["name"] == "zenith ltd"


def test_resolve_entities_majority_vote(spark):
    from meza_spark.process import resolve_entities

    rows = [(1, "bob", "a"), (2, "bob", "b"), (3, "bob", "b")]
    df = spark.createDataFrame(rows, "id long, name string, tag string")
    out = resolve_entities(df, "id", "name", max_distance=0).collect()
    assert len(out) == 1
    assert out[0]["tag"] == "b"          # majority wins over min value
    assert out[0]["entity_id"] == 1


class TestCoOccurrence:
    def test_pairs_and_support(self, spark):
        from meza_spark.process import co_occurrence

        df = spark.createDataFrame(
            [(1, "a"), (1, "b"), (1, "c"), (1, "a"),   # dup a: 1 group
             (2, "a"), (2, "b"),
             (3, "a"), (3, "b"),
             (4, "z")],                                 # singleton
            "basket long, item string")
        got = {(r["item_a"], r["item_b"]): r["n_groups"]
               for r in co_occurrence(df, "basket", "item").collect()}
        assert got == {("a", "b"): 3, ("a", "c"): 1, ("b", "c"): 1}
        sup = co_occurrence(df, "basket", "item", min_support=2)
        assert [tuple(r) for r in sup.collect()] == [("a", "b", 3)]

    def test_max_group_cap_drops_megabaskets(self, spark):
        from meza_spark.process import co_occurrence

        rows = [(1, f"i{k}") for k in range(50)] + [(2, "a"), (2, "b")]
        df = spark.createDataFrame(rows, "basket long, item string")
        got = co_occurrence(df, "basket", "item", max_group=10).collect()
        assert [tuple(r) for r in got] == [("a", "b", 1)]
        full = co_occurrence(df, "basket", "item", max_group=None)
        assert full.count() == 50 * 49 // 2 + 1


def test_normalize_json_infer_explode_and_guards(spark):
    import pytest as _pt

    from meza_spark.process import normalize_json

    rows = [
        (1, '{"o": 10, "tag": "a", "lines": '
            '[{"p": 1, "q": 2.5}, {"p": 2, "q": 1.0}]}'),
        (2, '{"o": 20, "tag": "b", "lines": [{"p": 9, "q": 4.0}]}'),
        (3, '{"o": 30, "tag": "c", "lines": []}'),     # empty array
        (4, None),                                      # null doc
        (5, "not json at all"),                         # parse failure
    ]
    df = spark.createDataFrame(rows, "row_id long, js string")
    out = normalize_json(df, "js", "lines", keep=["row_id"],
                         prefix="l_").orderBy("row_id", "l_p")
    got = [tuple(r) for r in out.collect()]
    # scalars carried, array exploded; empty/null/corrupt -> no rows
    assert got == [(1, 10, "a", 1, 2.5), (1, 10, "a", 2, 1.0),
                   (2, 20, "b", 9, 4.0)]
    assert out.columns == ["row_id", "o", "tag", "l_p", "l_q"]
    # scalar-array documents explode to a single value column
    sdf = spark.createDataFrame(
        [(1, '{"k": 1, "xs": [10, 20]}')], "row_id long, js string")
    sv = normalize_json(sdf, "js", "xs").collect()
    assert sorted(r["value"] for r in sv) == [10, 20]
    # keep_empty=True: parents with empty/null docs surface once
    outer = normalize_json(df, "js", "lines", keep=["row_id"],
                           prefix="l_", keep_empty=True)
    ids = sorted(r["row_id"] for r in outer.collect())
    assert ids == [1, 1, 2, 3, 4, 5]
    # guards: unknown field / non-array field / no sample
    with _pt.raises(ValueError):
        normalize_json(df, "js", "nope")
    with _pt.raises(ValueError):
        normalize_json(df, "js", "o")
    with _pt.raises(ValueError):
        normalize_json(spark.createDataFrame([], "js string"),
                       "js", "lines")
