"""Benchmark decontamination: remove (or flag) training documents that
share a verbatim word n-gram with an evaluation/benchmark set.

The standard pre-training hygiene step (GPT-3 §C / PaLM-style 8-gram to
13-gram overlap): any training doc containing an n-gram that also
occurs in a benchmark document is contaminated.

Scale shape (the 100 TB plan):
  - the benchmark side is small by nature (eval sets are thousands of
    docs, not billions) → its distinct gram hashes BROADCAST;
  - the corpus side explodes to (id, gram_hash) JVM-side — grams are
    hashed to int64 (xxhash64) before the join so no text rides it;
  - the broadcast semi-join filters on the map side; the only shuffle
    is the ids-only distinct of contaminated doc ids.

No reference analog (meza has no corpus ops); part of the
beyond-reference training-data layer mandated by the build charter.
"""

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import shingles_from_tokens, tokens

__all__ = ["contaminated_ids", "decontaminate",
           "fuzzy_contamination_pairs", "decontaminate_fuzzy"]


def _gram_hashes(df: DataFrame, text_col: str, id_col: str,
                 n: int) -> DataFrame:
    """(id, gram_hash int64) pairs, distinct per doc, all JVM-side."""
    toks = tokens(F.lower(F.col(text_col)))
    grams = shingles_from_tokens(F.col("_toks"), n)
    return (df.select(id_col, toks.alias("_toks"))
            .select(id_col, F.explode(grams).alias("_g"))
            .select(id_col, F.xxhash64("_g").alias("gram_hash")))


def contaminated_ids(docs: DataFrame, benchmark: DataFrame,
                     text_col: str = "text", id_col: str = "doc_id",
                     n: int = 8) -> DataFrame:
    """Distinct ids of training docs sharing an ``n``-gram with any
    benchmark doc. The benchmark gram set is broadcast; docs' grams
    never shuffle."""
    bench = (benchmark
             .select(tokens(F.lower(F.col(text_col))).alias("_bt"))
             .select(F.explode(
                 shingles_from_tokens(F.col("_bt"), n)).alias("_g"))
             .select(F.xxhash64("_g").alias("gram_hash"))
             .distinct())
    hits = _gram_hashes(docs, text_col, id_col, n) \
        .join(F.broadcast(bench), "gram_hash", "left_semi")
    return hits.select(id_col).distinct()


def fuzzy_contamination_pairs(docs: DataFrame, benchmark: DataFrame,
                              text_col: str = "text",
                              id_col: str = "doc_id",
                              n: int = 5,
                              min_containment: float = 0.5) -> DataFrame:
    """NEAR-match decontamination pairs: ``(doc_id, bench_id,
    containment)`` where containment = the fraction of the BENCHMARK
    doc's distinct ``n``-grams present in the training doc.

    Verbatim single-gram overlap (:func:`contaminated_ids`) misses
    lightly-edited leakage (paraphrased punctuation, shifted
    whitespace shrink the shared-gram count below "any"); Jaccard
    misses an eval item quoted inside a much longer document. The
    benchmark-side containment is the measure eval-leak audits
    actually want (Brown et al. GPT-3 appendix C dedupe against dev
    sets — public): "how much of this eval item appears in that
    training doc".

    Scale shape: ONE inverted-index probe — the benchmark's
    (gram_hash, bench_id) table is BROADCAST (eval sets are small by
    nature); doc grams explode JVM-side to int64 hashes and map-side
    semi-join it, so the only shuffle carries ``(doc_id, bench_id)``
    id pairs for docs sharing ≥1 gram. Per-pair match counts then
    divide by the benchmark doc's gram count. The corpus text never
    rides a shuffle; cost is O(matching pairs), not O(docs × bench).
    """
    bench_grams = (benchmark
                   .select(F.col(id_col).alias("bench_id"),
                           tokens(F.lower(F.col(text_col)))
                           .alias("_bt"))
                   .select("bench_id",
                           F.explode(F.array_distinct(
                               shingles_from_tokens(F.col("_bt"), n)))
                           .alias("_g"))
                   .select("bench_id", F.xxhash64("_g").alias("gram_hash"))
                   .distinct())
    bench_sizes = bench_grams.groupBy("bench_id").agg(
        F.count(F.lit(1)).alias("_nb"))
    # no .distinct() on the doc side: shingles_from_tokens already
    # dedupes per document, and a distinct here would shuffle the
    # whole corpus's (id, gram) pairs — the map-side broadcast probe
    # is the point
    doc_grams = _gram_hashes(docs, text_col, id_col, n)
    matches = (doc_grams.join(F.broadcast(bench_grams), on="gram_hash")
               .groupBy(id_col, "bench_id")
               .agg(F.count(F.lit(1)).alias("_m")))
    out = (matches.join(F.broadcast(bench_sizes), on="bench_id")
           .select(id_col, "bench_id",
                   (F.col("_m").cast("double") / F.col("_nb"))
                   .alias("containment")))
    return out.where(F.col("containment") >= min_containment)


def decontaminate_fuzzy(docs: DataFrame, benchmark: DataFrame,
                        text_col: str = "text", id_col: str = "doc_id",
                        n: int = 5, min_containment: float = 0.5,
                        mode: str = "remove",
                        strategy: str | None = None) -> DataFrame:
    """Records in, records out: drop (or flag) training docs whose
    benchmark-side n-gram containment against ANY benchmark doc
    reaches ``min_containment`` — the fuzzy sibling of
    :func:`decontaminate`.

    Strategies (``None`` picks by frame type, same policy as
    :func:`decontaminate`):
      - ``'join'`` (batch default): inverted-index probe via
        :func:`fuzzy_contamination_pairs`; the drop set is ids-only
        and distinct. Scales with the match count.
      - ``'array'`` (streaming default): the benchmark rides as ONE
        broadcast row holding ``(grams, threshold_count)`` per bench
        doc; each training row checks
        ``∃b: |grams(doc) ∩ grams(b)| ≥ ceil(θ·|grams(b)|)``
        row-locally — fully STATELESS (no aggregation state), so it
        runs on a streaming frame with no watermark. Per-row cost is
        O(|bench| · |doc grams|): right-sized for real eval sets.
    """
    if mode not in ("remove", "flag"):
        raise ValueError(f"decontaminate_fuzzy: unknown mode {mode!r}")
    if strategy is None:
        strategy = "array" if docs.isStreaming else "join"
    if strategy == "join":
        ids = (fuzzy_contamination_pairs(docs, benchmark, text_col,
                                         id_col, n, min_containment)
               .select(id_col).distinct())
        if mode == "remove":
            return docs.join(ids, on=id_col, how="left_anti")
        flag = ids.withColumn("contaminated", F.lit(True))
        return (docs.join(flag, on=id_col, how="left")
                .withColumn("contaminated",
                            F.coalesce("contaminated", F.lit(False))))
    if strategy != "array":
        raise ValueError(
            f"decontaminate_fuzzy: unknown strategy {strategy!r}")
    bench_row = (benchmark
                 .select(tokens(F.lower(F.col(text_col))).alias("_bt"))
                 .select(F.array_distinct(F.transform(
                     shingles_from_tokens(F.col("_bt"), n),
                     lambda g: F.xxhash64(g))).alias("_bg"))
                 .where(F.size("_bg") > 0)
                 .agg(F.collect_list("_bg").alias("_bench")))
    # tokens materialize as a column FIRST: shingles_from_tokens
    # references its array ~n+2 times, and an inline tokenizer would
    # re-run the regex split per reference over the FULL corpus (the
    # dsir.py lesson — measured 2.5-4x on the gram stage)
    doc_grams = F.array_distinct(F.transform(
        shingles_from_tokens(F.col("_toks"), n),
        lambda g: F.xxhash64(g)))
    # per bench doc: m >= 1 AND m/nb >= θ — the SAME IEEE division the
    # join strategy applies, so the two strategies flag identical rows
    # (a ceil(θ·nb) integer form would diverge where θ·nb lands on a
    # float-representation boundary, e.g. 0.4 × 5)
    hit = F.exists(
        F.col("_bench"),
        lambda bg: (F.size(F.array_intersect(F.col("_dg"), bg)) >= 1)
        & (F.size(F.array_intersect(F.col("_dg"), bg)).cast("double")
           / F.size(bg) >= F.lit(min_containment)))
    out = (docs.withColumn("_toks", tokens(F.lower(F.col(text_col))))
           .withColumn("_dg", doc_grams)
           .crossJoin(F.broadcast(bench_row))
           .withColumn("contaminated", F.coalesce(hit, F.lit(False)))
           .drop("_toks", "_dg", "_bench"))
    if mode == "remove":
        return out.where(~F.col("contaminated")).drop("contaminated")
    return out


def decontaminate(docs: DataFrame, benchmark: DataFrame,
                  text_col: str = "text", id_col: str = "doc_id",
                  n: int = 8, mode: str = "remove",
                  strategy: str | None = None) -> DataFrame:
    """Records in, records out (the engine-wide dedup contract).

    ``mode='remove'``: drop contaminated docs.
    ``mode='flag'``: keep every row, add a ``contaminated`` boolean —
    the audit form.

    Two physical strategies (``strategy=None`` picks automatically):
      - ``'join'`` (batch default): explode doc grams → broadcast
        semi-join the bench gram set → ids-only distinct → anti/flag
        join. Scales to arbitrarily large benchmark sets.
      - ``'array'`` (streaming default — the id-join would be a
        stream-stream join): the bench gram-hash set rides as ONE
        one-row array through a broadcast cross join and each row
        checks ``arrays_overlap`` locally. Fully STATELESS, so it
        runs on a streaming frame with no watermark; right-sized for
        real eval sets (≤ ~1M grams — the per-row overlap probe walks
        the doc's grams against a hashed lookup of the smaller side).
    """
    if strategy is None:
        strategy = "array" if docs.isStreaming else "join"
    if mode not in ("remove", "flag"):
        raise ValueError(f"decontaminate: unknown mode {mode!r}")
    if strategy == "join":
        ids = contaminated_ids(docs, benchmark, text_col, id_col, n)
        if mode == "remove":
            return docs.join(ids, on=id_col, how="left_anti")
        # no forced broadcast: the contaminated set is usually tiny
        # (AQE converts to broadcast at runtime) but is UNBOUNDED on a
        # pathological corpus — a hint here could OOM the driver
        flag = ids.withColumn("contaminated", F.lit(True))
        return (docs.join(flag, on=id_col, how="left")
                .withColumn("contaminated",
                            F.coalesce("contaminated", F.lit(False))))
    if strategy != "array":
        raise ValueError(f"decontaminate: unknown strategy {strategy!r}")
    bench_row = (benchmark
                 .select(tokens(F.lower(F.col(text_col))).alias("_bt"))
                 .select(F.explode(
                     shingles_from_tokens(F.col("_bt"), n)).alias("_g"))
                 .select(F.xxhash64("_g").alias("_gh")).distinct()
                 .agg(F.collect_set("_gh").alias("_bench_grams")))
    # materialized token column first — see decontaminate_fuzzy note
    doc_grams = F.transform(
        shingles_from_tokens(F.col("_toks"), n),
        lambda g: F.xxhash64(g))
    hit = F.arrays_overlap(doc_grams, F.col("_bench_grams"))
    out = (docs.withColumn("_toks", tokens(F.lower(F.col(text_col))))
           .crossJoin(F.broadcast(bench_row))
           .withColumn("contaminated", F.coalesce(hit, F.lit(False)))
           .drop("_toks"))
    if mode == "remove":
        return out.where(~F.col("contaminated")) \
            .drop("_bench_grams", "contaminated")
    return out.drop("_bench_grams")
