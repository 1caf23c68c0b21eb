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
           "fuzzy_contamination_pairs", "decontaminate_fuzzy",
           "semantic_contamination", "decontaminate_semantic"]


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


def semantic_contamination(corpus_emb: DataFrame, bench_emb: DataFrame,
                           threshold: float = 0.9,
                           vec_col: str = "embedding",
                           id_col: str = "vec_id",
                           max_bench: int = 1_000_000,
                           round_digits: int = 4) -> DataFrame:
    """Embedding-space decontamination (the paraphrase-leakage net the
    verbatim n-gram scan can't catch): flag every corpus row whose
    embedding has cosine >= ``threshold`` against ANY benchmark
    embedding. Returns ``(id_col, bench_id, cosine_eN)`` for flagged
    rows — ``cosine_eN`` is the max cosine in 10^round_digits units,
    ``bench_id`` the smallest benchmark id achieving it.

    Scale shape: the benchmark side is small by definition (eval sets,
    not corpora), so its normalized matrix BROADCASTS and scoring is a
    row-local Arrow-batched matmul over the corpus scan — EXACT (every
    pair scored, unlike the bucketed :func:`~meza_spark.llm.similarity.
    cosine_join` path) with ZERO shuffle; the plan stays an append-only
    map, so the same frame runs under Structured Streaming untouched.
    ``max_bench`` guards the bounded collect (count checked first).

    The threshold compares in quantized integer units, so engine
    last-ulp drift cannot flip a boundary row (memory: parity traps).
    """
    import numpy as np

    n_bench = bench_emb.count()
    if n_bench > max_bench:
        raise ValueError(
            f"semantic_contamination: benchmark side has {n_bench} "
            f"rows > max_bench={max_bench}; this path broadcasts the "
            "benchmark matrix — use similarity.cosine_join for "
            "corpus-vs-corpus scale")
    rows = (bench_emb
            .where(F.col(id_col).isNotNull()
                   & F.col(vec_col).isNotNull() & (F.size(vec_col) > 0))
            .select(F.col(id_col),
                    F.transform(vec_col, lambda x: x.cast("double")))
            .collect())                       # bounded: eval-set sized
    rows.sort(key=lambda r: r[0])             # argmax tie -> min id
    # bench ids keep their native type (long ids -> int64 array,
    # string/UUID ids -> object array); the output schema mirrors it
    bench_id_type = dict(bench_emb.dtypes)[id_col]
    bench_ids = np.array([r[0] for r in rows])
    B = np.array([r[1] for r in rows], dtype=np.float64)
    Bn = B / np.linalg.norm(B, axis=1, keepdims=True)
    scale = 10.0 ** round_digits
    cut = int(threshold * scale + 0.5)
    spark = corpus_emb.sparkSession
    bc = spark.sparkContext.broadcast((bench_ids, Bn))

    def _score(batches):
        import pandas as pd
        ids_b, Bn_b = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
            Vn = V / np.maximum(
                np.linalg.norm(V, axis=1, keepdims=True), 1e-300)
            S = Vn @ Bn_b.T                       # (batch, n_bench)
            j = np.argmax(S, axis=1)              # first max = min id
            best = S[np.arange(len(S)), j]
            q = np.floor(best * scale + 0.5).astype(np.int64)
            keep = q >= cut
            yield pd.DataFrame({
                "_cid": pdf["_cid"].to_numpy()[keep],
                "bench_id": ids_b[j[keep]],
                "cos_q": q[keep]})

    base = (corpus_emb
            .where(F.col(vec_col).isNotNull() & (F.size(vec_col) > 0))
            .select(F.col(id_col).alias("_cid"),
                    F.transform(vec_col, lambda x: x.cast("double"))
                    .alias("_v")))
    id_type = dict(corpus_emb.dtypes)[id_col]
    out = base.mapInPandas(
        _score,
        schema=f"_cid {id_type}, bench_id {bench_id_type}, cos_q long")
    return out.select(F.col("_cid").alias(id_col), "bench_id",
                      F.col("cos_q").alias(f"cosine_e{round_digits}"))


def decontaminate_semantic(docs: DataFrame, corpus_emb: DataFrame,
                           bench_emb: DataFrame,
                           threshold: float = 0.9,
                           doc_id_col: str = "doc_id",
                           emb_id_col: str = "vec_id",
                           vec_col: str = "embedding",
                           mode: str = "remove",
                           max_bench: int = 1_000_000) -> DataFrame:
    """Apply :func:`semantic_contamination` to a records table:
    ``mode='remove'`` anti-joins the flagged ids (ids-only shuffle);
    ``mode='flag'`` left-joins a ``contaminated`` boolean on."""
    hits = (semantic_contamination(
        corpus_emb, bench_emb, threshold=threshold,
        vec_col=vec_col, id_col=emb_id_col, max_bench=max_bench)
        .select(F.col(emb_id_col).alias("_hit_id")).distinct())
    if mode == "remove":
        return docs.join(hits, docs[doc_id_col] == hits["_hit_id"],
                         "left_anti")
    if mode != "flag":
        raise ValueError(f"decontaminate_semantic: unknown mode {mode!r}")
    return (docs.join(hits, docs[doc_id_col] == hits["_hit_id"], "left")
            .withColumn("contaminated", F.col("_hit_id").isNotNull())
            .drop("_hit_id"))
