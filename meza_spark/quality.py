"""Declarative data-quality constraint checking (deequ-style, public
pattern: Schelter et al., "Automating Large-Scale Data Quality
Verification", VLDB'18).

Beyond-reference: meza validates per-value via type casts
(ref: meza/convert.py:101-510) but has no table-level contract check.
A pipeline gate wants "0 nulls in the key, key unique, values in
range, FK resolves" as ONE cheap report.

Scale design: all row-local rules (not_null / range / regex / custom
predicate) fold into a single aggregation scan — one pass regardless
of rule count. ``unique`` adds one groupBy on the checked key;
``ref`` adds one anti-join per referenced table (broadcast when the
dimension is small). Output is tiny (one row per rule).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["check", "observed_metrics", "partition_stats"]


def check(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Evaluate constraint ``rules`` → ``(rule, violations)`` frame,
    one row per rule, in the order given.

    Rule dicts (``name`` optional, defaults to a generated label):
      - ``{"type": "not_null", "field": f}``
      - ``{"type": "unique", "fields": [f, ...]}`` — count of rows in
        excess of one per key (0 = key is unique)
      - ``{"type": "range", "field": f, "lo": x, "hi": y}`` — nulls
        don't violate range (pair with not_null)
      - ``{"type": "regex", "field": f, "pattern": p}`` — full-match
        anchored, nulls don't violate
      - ``{"type": "ref", "field": f, "ref": other_df,
         "ref_field": g}`` — foreign-key rows with no match (nulls
        don't violate)
      - ``{"type": "predicate", "cond": Column}`` — rows where the
        condition is FALSE or NULL
    """
    agg_rules = []     # (name, violation-count expression)
    extra = []         # (name, one-row DataFrame) for shuffle rules

    for i, r in enumerate(rules):
        field_label = r.get("field") or "_".join(r.get("fields", [])) or i
        name = r.get("name") or f"{r['type']}_{field_label}"
        t = r["type"]
        if t == "not_null":
            agg_rules.append(
                (name, F.sum(F.col(r["field"]).isNull().cast("long"))))
        elif t == "range":
            c = F.col(r["field"])
            bad = c.isNotNull() & ((c < F.lit(r["lo"]))
                                   | (c > F.lit(r["hi"])))
            agg_rules.append((name, F.sum(bad.cast("long"))))
        elif t == "regex":
            c = F.col(r["field"])
            bad = c.isNotNull() & ~c.rlike(f"^(?:{r['pattern']})$")
            agg_rules.append((name, F.sum(bad.cast("long"))))
        elif t == "predicate":
            bad = ~F.coalesce(r["cond"], F.lit(False))
            agg_rules.append((name, F.sum(bad.cast("long"))))
        elif t == "unique":
            keys = list(r["fields"])
            dup = (df.groupBy(*keys)
                   .agg((F.count(F.lit(1)) - 1).alias("_x"))
                   .agg(F.coalesce(F.sum("_x"), F.lit(0))
                        .alias("violations")))
            extra.append((name, dup))
        elif t == "ref":
            c = F.col(r["field"])
            missing = (df.where(c.isNotNull())
                       .join(r["ref"].select(
                           F.col(r["ref_field"]).alias(r["field"])),
                           on=r["field"], how="left_anti")
                       .agg(F.count(F.lit(1)).alias("violations")))
            extra.append((name, missing))
        else:
            raise ValueError(f"check: unknown rule type {t!r}")

    spark = df.sparkSession
    parts = []
    if agg_rules:
        row = df.agg(*[F.coalesce(e, F.lit(0)).cast("long").alias(f"_r{i}")
                       for i, (_, e) in enumerate(agg_rules)])
        stacked = ", ".join(f"'{n}', _r{i}"
                            for i, (n, _) in enumerate(agg_rules))
        parts.append(row.select(F.expr(
            f"stack({len(agg_rules)}, {stacked}) AS (rule, violations)")))
    for name, one in extra:
        parts.append(one.select(F.lit(name).alias("rule"),
                                F.col("violations").cast("long")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    if not parts:
        return spark.createDataFrame([], "rule string, violations long")
    return out


def observed_metrics(df: DataFrame, cols: Sequence[str] | None = None,
                     name: str = "meza_metrics"):
    """Zero-extra-scan pipeline instrumentation via ``df.observe`` —
    the Spark-native way to get row counts, null counts, and value
    bounds OUT of a production job without a second aggregation pass
    (the metrics piggyback on whatever action the caller already
    runs; at 100 TB a separate ``df.count()`` audit scan is the
    single most expensive line in most pipelines).

    Returns ``(instrumented_df, observation)``: run any action on the
    returned frame, then read ``observation.get`` — a dict with
    ``n_rows`` plus ``<col>_nulls`` / ``<col>_min`` / ``<col>_max``
    per requested column. On a STREAMING frame the same observed
    metrics surface per micro-batch in ``StreamingQueryProgress
    .observedMetrics[name]`` (df.observe accepts the name-form only
    there) — pass a string name and read the progress JSON.
    """
    from pyspark.sql import Observation

    cols = list(cols) if cols is not None else []
    exprs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        exprs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
                     .alias(f"{c}_nulls"))
        exprs.append(F.min(c).alias(f"{c}_min"))
        exprs.append(F.max(c).alias(f"{c}_max"))
    if df.isStreaming:
        return df.observe(name, *exprs), None
    obs = Observation(name)
    return df.observe(obs, *exprs), obs


def partition_stats(df: DataFrame) -> DataFrame:
    """Partition-skew diagnostic: one row per physical partition with
    its row count — the first thing to look at when a stage straggles
    (a 1000-executor job is as slow as its fattest partition).
    Returns ``(partition_id, n_rows)`` plus a ``skew`` ratio column
    (partition rows / mean rows over ALL partitions) so hot
    partitions read directly off the report.

    Built on ``mapInPandas`` + ``TaskContext`` rather than a
    ``groupBy(spark_partition_id())`` — the aggregate form yields NO
    row for an empty partition, so a frame where everything hashed to
    one partition would report its single visible partition as
    skew 1.0, "perfectly balanced" (the exact pathology this exists
    to expose). Here every partition emits exactly one row, empty
    ones included, and the skew denominator is the true mean.
    """
    import pandas as _pd

    def _count(batches):
        from pyspark import TaskContext

        pid, n = TaskContext.get().partitionId(), 0
        for pdf in batches:
            n += len(pdf)
        yield _pd.DataFrame({"partition_id": [pid], "n_rows": [n]})

    one_col = df.select(F.lit(1).alias("_one"))
    by_part = one_col.mapInPandas(
        _count, "partition_id int, n_rows long")
    total = by_part.agg(
        F.sum("n_rows").alias("_t"),
        F.count(F.lit(1)).alias("_p"))
    return (by_part.crossJoin(F.broadcast(total))
            .select("partition_id", "n_rows",
                    F.when(F.col("_t") > 0,
                           F.col("n_rows") * F.col("_p")
                           / F.col("_t")).alias("skew"))
            .orderBy("partition_id"))
