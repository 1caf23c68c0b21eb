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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["check"]


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
