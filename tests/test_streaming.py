"""Structured Streaming tests: file-drop micro-batches through the
stateful ops (windows, watermark dedupe, running fold), verified via
memory sinks."""

import datetime
import time

import pytest
from pyspark.sql import functions as F

from meza_spark import streaming as st


def _wait(query, min_rows, spark, name, timeout=60):
    deadline = time.time() + timeout
    while time.time() < deadline:
        query.processAllAvailable()
        n = spark.sql(f"SELECT count(*) FROM {name}").collect()[0][0]
        if n >= min_rows:
            return
        time.sleep(0.3)
    raise TimeoutError(f"{name} reached only {n} rows")


@pytest.fixture
def events_stream(spark, tmp_path):
    """A file-drop parquet stream of (ts, user, v) events."""
    src = tmp_path / "src"
    src.mkdir()
    base = datetime.datetime(2024, 1, 1)
    rows = [(base + datetime.timedelta(minutes=m), f"u{m % 2}", float(m))
            for m in range(10)]
    df = spark.createDataFrame(rows, "ts timestamp, user string, v double")
    df.coalesce(1).write.mode("overwrite").parquet(str(src / "batch1"))
    schema = df.schema
    return str(src / "batch1"), schema


def test_tumbling_window_stream(spark, events_stream, tmp_path):
    path, schema = events_stream
    sdf = st.read_stream(spark, path, schema=schema)
    assert sdf.isStreaming
    agg = st.tumbling_window_agg(sdf, "ts", "5 minutes",
                                 {"n": ("v", "count"), "mx": ("v", "max")})
    q = st.write_stream(agg, fmt="memory", query_name="tumble",
                        output_mode="complete",
                        checkpoint=str(tmp_path / "ck1"))
    try:
        _wait(q, 2, spark, "tumble")
        got = {r["window_start"].minute: (r["n"], r["mx"])
               for r in spark.sql("SELECT * FROM tumble").collect()}
        assert got[0] == (5, 4.0) and got[5] == (5, 9.0)
    finally:
        q.stop()


def test_stream_dedupe_within_watermark(spark, events_stream, tmp_path):
    path, schema = events_stream
    sdf = st.read_stream(spark, path, schema=schema)
    deduped = st.stream_dedupe(sdf, ["user"], "ts", watermark="1 hour")
    q = st.write_stream(deduped, fmt="memory", query_name="dd",
                        checkpoint=str(tmp_path / "ck2"))
    try:
        _wait(q, 2, spark, "dd")
        rows = spark.sql("SELECT * FROM dd").collect()
        assert len(rows) == 2          # one per user within the watermark
        assert {r["user"] for r in rows} == {"u0", "u1"}
    finally:
        q.stop()


def test_stream_fill_running_stateful(spark, events_stream, tmp_path):
    path, schema = events_stream
    sdf = st.read_stream(spark, path, schema=schema)
    run = st.stream_fill_running(sdf, ["user"], "v", "ts", op="max")
    q = st.write_stream(run, fmt="memory", query_name="runmax",
                        checkpoint=str(tmp_path / "ck3"))
    try:
        _wait(q, 10, spark, "runmax")
        rows = spark.sql("SELECT * FROM runmax ORDER BY ts").collect()
        u0 = [r["v_running"] for r in rows if r["user"] == "u0"]
        assert u0 == [0.0, 2.0, 4.0, 6.0, 8.0]   # running max per key
    finally:
        q.stop()


def test_stateless_ops_work_on_streams(spark, events_stream):
    """The reference's stream-safe ops ARE streaming ops here: cut /
    tfilter / hash_ compose onto a streaming frame unchanged."""
    from meza_spark import process as pr

    path, schema = events_stream
    sdf = st.read_stream(spark, path, schema=schema)
    out = pr.hash_(pr.tfilter(pr.cut(sdf, ["user", "v"]), "v",
                              lambda c: c > 3), ["user"])
    assert out.isStreaming
    assert out.columns == ["user", "v"]


def test_session_window_static(spark):
    base = datetime.datetime(2024, 1, 1)
    rows = [(base, "a", 1.0),
            (base + datetime.timedelta(minutes=2), "a", 2.0),
            (base + datetime.timedelta(minutes=30), "a", 3.0)]
    df = spark.createDataFrame(rows, "ts timestamp, k string, v double")
    out = st.session_window_agg(df, "ts", "5 minutes", ["k"],
                                {"n": ("v", "count")})
    ns = sorted(r["n"] for r in out.collect())
    assert ns == [1, 2]    # 30-min gap splits the session


def test_stream_static_join_enriches(spark, tmp_path):
    import time

    from meza_spark.streaming import (read_stream, stream_static_join,
                                      write_stream)

    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame([(1, "a"), (2, "b"), (3, "zz")],
                          ["k", "v"]).coalesce(1) \
        .write.mode("overwrite").parquet(str(src))
    dim = spark.createDataFrame([("a", "alpha"), ("b", "beta")],
                                ["v", "label"])
    stream = read_stream(spark, str(src), fmt="parquet",
                         schema="k long, v string")
    joined = stream_static_join(stream, dim, on="v", how="left")
    q = write_stream(joined, fmt="memory",
                     query_name="t_enrich", output_mode="append",
                     checkpoint=str(tmp_path / "ck"))
    try:
        q.processAllAvailable()
        out = {r["k"]: r["label"]
               for r in spark.sql("SELECT * FROM t_enrich").collect()}
    finally:
        q.stop()
    assert out == {1: "alpha", 2: "beta", 3: None}


def test_foreach_batch_sink_delivers_batches(spark, tmp_path):
    from meza_spark.streaming import foreach_batch_sink, read_stream

    src = tmp_path / "feb_src"
    src.mkdir()
    spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"]).coalesce(1) \
        .write.mode("overwrite").parquet(str(src))
    seen = []

    def collect_batch(batch_df, batch_id):
        seen.append((batch_id, {r["k"] for r in batch_df.collect()}))

    stream = read_stream(spark, str(src), fmt="parquet",
                         schema="k long, v string")
    q = foreach_batch_sink(stream, collect_batch,
                           checkpoint=str(tmp_path / "feb_ck"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert len(seen) == 1
    assert seen[0][1] == {1, 2}


def test_stream_stream_join_time_bounded(spark, tmp_path):
    import datetime as dt

    from meza_spark.streaming import (read_stream, stream_stream_join,
                                      write_stream)

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    l_src, r_src = tmp_path / "ss_l", tmp_path / "ss_r"
    spark.createDataFrame(
        [(1, "k1", t0), (2, "k2", t0)],
        ["lid", "k", "lts"]).coalesce(1).write.parquet(str(l_src))
    spark.createDataFrame(
        [(10, "k1", t0 + dt.timedelta(minutes=5)),     # within bound
         (11, "k2", t0 + dt.timedelta(hours=2)),       # outside bound
         (12, "k3", t0)],                              # no key match
        ["rid", "k", "rts"]).coalesce(1).write.parquet(str(r_src))
    ls = read_stream(spark, str(l_src), fmt="parquet",
                     schema="lid long, k string, lts timestamp")
    rs = read_stream(spark, str(r_src), fmt="parquet",
                     schema="rid long, k string, rts timestamp")
    joined = stream_stream_join(ls, rs, "k", "lts", "rts",
                                time_bound="15 minutes")
    q = write_stream(joined.select("lid", "rid"), fmt="memory",
                     query_name="t_ssj", output_mode="append",
                     checkpoint=str(tmp_path / "ssj_ck"))
    try:
        q.processAllAvailable()
        got = {(r["lid"], r["rid"])
               for r in spark.sql("SELECT * FROM t_ssj").collect()}
    finally:
        q.stop()
    assert got == {(1, 10)}


def test_streaming_decontam_flag_and_gopher(spark, tmp_path):
    """The new text ops are stream-safe: gopher_filter is stateless;
    decontaminate(mode='flag') is a stream-static broadcast join of
    the static benchmark gram set — both run on a streaming frame."""
    from meza_spark.llm.decontam import decontaminate
    from meza_spark.llm.text import gopher_filter

    src = tmp_path / "docs"
    src.mkdir()
    rows = [(1, "the quick brown fox jumps over the lazy dog today"),
            (2, "totally unrelated words about nothing in particular")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.coalesce(1).write.mode("overwrite").parquet(str(src / "b1"))
    sdf = st.read_stream(spark, str(src / "b1"), schema=df.schema)
    bench = spark.createDataFrame(
        [(9, "x the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string")

    flagged = decontaminate(sdf, bench, n=8, mode="flag")
    scored = gopher_filter(flagged)
    assert scored.isStreaming
    q = st.write_stream(scored.select("doc_id", "contaminated",
                                      "gopher_keep"),
                        fmt="memory", query_name="deco",
                        checkpoint=str(tmp_path / "ckd"))
    try:
        _wait(q, 2, spark, "deco")
        got = {r["doc_id"]: r["contaminated"]
               for r in spark.sql("SELECT * FROM deco").collect()}
        assert got == {1: True, 2: False}
    finally:
        q.stop()


def test_available_now_incremental_runs(spark, tmp_path):
    """Two pipeline invocations over a growing directory: run 1
    processes the initial file and stops; run 2 (same checkpoint)
    processes ONLY the file added in between — the incremental-batch
    contract."""
    src = tmp_path / "inc"
    src.mkdir()
    sink = tmp_path / "out"
    ck = tmp_path / "ck"
    schema = "id long, v string"
    spark.createDataFrame([(1, "a")], schema).coalesce(1) \
        .write.mode("append").parquet(str(src))

    def run_once():
        sdf = st.read_stream(spark, str(src), schema=schema,
                             maxFilesPerTrigger="100")
        q = st.write_stream(sdf, path=str(sink), fmt="parquet",
                            checkpoint=str(ck), available_now=True)
        q.awaitTermination(60)

    run_once()
    assert spark.read.parquet(str(sink)).count() == 1
    spark.createDataFrame([(2, "b"), (3, "c")], schema).coalesce(1) \
        .write.mode("append").parquet(str(src))
    run_once()
    got = sorted(r["id"] for r in
                 spark.read.parquet(str(sink)).collect())
    assert got == [1, 2, 3]  # run 2 appended only the new rows


def _curate(df, bench):
    """The incremental-curation pipeline under test: Gopher quality
    rules -> deterministic quality-weighted sampling -> benchmark
    decontamination — every stage row-local/stateless, so the SAME
    function runs on a batch frame and a streaming frame."""
    from meza_spark.llm.decontam import decontaminate
    from meza_spark.llm.sampling import quality_sample
    from meza_spark.llm.text import gopher_filter

    out = gopher_filter(df).where("gopher_keep")
    out = out.withColumn("q", (F.length("text") / 400.0))
    out = quality_sample(out, "doc_id", "q", gamma=0.5, seed=3)
    out = decontaminate(out, bench, strategy="array", mode="remove")
    return out.select("doc_id", "text")


def test_streaming_curation_pipeline_batch_parity(spark, tmp_path):
    """r2 verdict #10: one LLM-curation pipeline end-to-end as
    readStream -> transforms -> writeStream(AvailableNow), asserting
    row parity with the identical batch run over the same growing
    directory (two incremental invocations, checkpointed)."""
    import random

    rnd = random.Random(11)
    words = ("the and of to is quick brown fox lazy dog data spark "
             "stream batch corpus quality filter sample training").split()

    def doc(i, n):
        return (i, " ".join(rnd.choice(words) for _ in range(n)))

    batch1 = [doc(i, 60 + i % 120) for i in range(60)]
    batch1 += [(100 + i, "short text") for i in range(5)]      # gopher-drop
    schema = "doc_id long, text string"
    # benchmark set contaminating a known slice: exact copies of two
    # corpus docs (8-gram overlap guaranteed: docs are >=60 tokens)
    bench = spark.createDataFrame([batch1[3], batch1[7]], schema)

    src = tmp_path / "docs"
    src.mkdir()
    sink = tmp_path / "curated"
    ck = tmp_path / "ck"
    spark.createDataFrame(batch1, schema).coalesce(1) \
        .write.mode("append").parquet(str(src))

    def run_stream_once():
        sdf = st.read_stream(spark, str(src), schema=schema)
        q = st.write_stream(_curate(sdf, bench), path=str(sink),
                            fmt="parquet", checkpoint=str(ck),
                            available_now=True)
        q.awaitTermination(120)

    run_stream_once()
    got1 = sorted(r["doc_id"]
                  for r in spark.read.parquet(str(sink)).collect())
    want1 = sorted(r["doc_id"] for r in _curate(
        spark.read.parquet(str(src)), bench).collect())
    assert got1 == want1 and len(got1) > 0
    assert 103 not in got1 and 107 not in got1   # decontaminated

    # second drop: only the new files are processed, parity holds on
    # the union
    batch2 = [doc(200 + i, 80 + i % 40) for i in range(30)]
    spark.createDataFrame(batch2, schema).coalesce(1) \
        .write.mode("append").parquet(str(src))
    run_stream_once()
    got2 = sorted(r["doc_id"]
                  for r in spark.read.parquet(str(sink)).collect())
    want2 = sorted(r["doc_id"] for r in _curate(
        spark.read.parquet(str(src)), bench).collect())
    assert got2 == want2
    assert len(got2) > len(got1)


def test_streaming_classifier_score_batch_parity(spark, tmp_path):
    """The learned quality filter runs UNCHANGED on a stream: fit on
    the batch backfill (bounded driver fit), then score_logistic —
    literal weights, row-local codegen — inside readStream →
    writeStream(AvailableNow). Stream rows must score bit-identically
    to the batch run (integer micro-logits make parity exact)."""
    from meza_spark.llm.classifier import (fit_logistic,
                                           quality_features,
                                           score_logistic)

    rows = [(i, ("the quick brown fox " * (3 + i % 9)).strip())
            for i in range(40)]
    schema = "doc_id long, text string"
    src = tmp_path / "docs"
    src.mkdir()
    spark.createDataFrame(rows, schema).coalesce(1) \
        .write.mode("append").parquet(str(src))

    batch = quality_features(spark.read.parquet(str(src))) \
        .withColumn("label", (F.col("n_chars_q") >= 120).cast("double"))
    w = fit_logistic(batch, "label")

    sdf = st.read_stream(spark, str(src), schema=schema)
    scored = score_logistic(quality_features(sdf), w) \
        .select("doc_id", "logit_micro", "pred")
    sink, ck = tmp_path / "scored", tmp_path / "ck2"
    q = st.write_stream(scored, path=str(sink), fmt="parquet",
                        checkpoint=str(ck), available_now=True)
    q.awaitTermination(120)

    got = {r["doc_id"]: (r["logit_micro"], r["pred"])
           for r in spark.read.parquet(str(sink)).collect()}
    want = {r["doc_id"]: (r["logit_micro"], r["pred"])
            for r in score_logistic(batch, w)
            .select("doc_id", "logit_micro", "pred").collect()}
    assert got == want and len(got) == 40


def test_streaming_semantic_decontam_batch_parity(spark, tmp_path):
    """semantic_contamination's scoring plan is an append-only
    broadcast matmul (zero shuffle), so the SAME call runs on a
    streaming corpus frame: flag parity with the batch run is exact
    (quantized-integer threshold compare)."""
    from meza_spark.llm.decontam import semantic_contamination

    rows = [(i, [float((i * 7 + j * 3) % 11 - 5) for j in range(8)])
            for i in range(30)]
    schema = "vec_id long, embedding array<double>"
    src = tmp_path / "emb"
    src.mkdir()
    spark.createDataFrame(rows, schema).coalesce(1) \
        .write.mode("append").parquet(str(src))
    bench = spark.createDataFrame(rows[:5], schema)

    batch_hits = semantic_contamination(
        spark.read.parquet(str(src)), bench, threshold=0.8)

    sdf = st.read_stream(spark, str(src), schema=schema)
    stream_hits = semantic_contamination(sdf, bench, threshold=0.8)
    sink, ck = tmp_path / "hits", tmp_path / "ck_sem"
    q = st.write_stream(stream_hits, path=str(sink), fmt="parquet",
                        checkpoint=str(ck), available_now=True)
    q.awaitTermination(120)

    got = sorted(map(tuple, spark.read.parquet(str(sink)).collect()))
    want = sorted(map(tuple, batch_hits.collect()))
    assert got == want and len(got) >= 5   # bench clones always flag


def test_streaming_cusum_batch_parity(spark, tmp_path):
    """stream_cusum (applyInPandasWithState, 4 ints of state per key)
    must emit EXACTLY the batch analytics.cusum statistics on the
    same rows — the integer-micro pipeline is order-exact, so the
    windowed closed form and the carried recursion agree bit-for-bit.
    Two AvailableNow runs over a growing directory also pin that
    state survives across micro-batch boundaries."""
    import datetime as dt

    src = tmp_path / "cusrc"
    src.mkdir()
    sink = tmp_path / "cuout"
    ck = tmp_path / "cuck"
    schema = "id long, ts timestamp, k string, v double"
    rows = [(i, dt.datetime(2024, 1, 1, 0, i), f"k{i % 2}",
             10.0 + (8.0 if i >= 14 else 0.0) + (i % 3))
            for i in range(20)]
    # first half lands before run 1, second half before run 2 —
    # forcing the statistic to carry across micro-batches
    spark.createDataFrame(rows[:10], schema).coalesce(1) \
        .write.mode("append").parquet(str(src))

    def run_once():
        sdf = st.read_stream(spark, str(src), schema=schema)
        out = st.stream_cusum(sdf, ["k"], "ts", "v", target=10.0,
                              slack=1.0, threshold=5.0)
        q = st.write_stream(out, path=str(sink), fmt="parquet",
                            checkpoint=str(ck), available_now=True)
        q.awaitTermination(120)

    run_once()
    spark.createDataFrame(rows[10:], schema).coalesce(1) \
        .write.mode("append").parquet(str(src))
    run_once()

    got = {r["id"]: (r["cusum_hi_micro"], r["cusum_lo_micro"], r["alarm"])
           for r in spark.read.parquet(str(sink)).collect()}
    batch = st.stream_cusum(spark.createDataFrame(rows, schema), ["k"],
                            "ts", "v", target=10.0, slack=1.0,
                            threshold=5.0)
    exp = {r["id"]: (r["cusum_hi_micro"], r["cusum_lo_micro"], r["alarm"])
           for r in batch.collect()}
    assert got == exp
    assert len(got) == 20
    # the shifted tail must be alarming on the high side
    assert got[19][2] is True and got[19][0] > 0


def test_streaming_session_paths_batch_parity(spark, tmp_path):
    """stream_session_paths: closed sessions with ordered event-type
    paths emit exactly once as the watermark passes last-event + gap;
    event-time timeouts carry open sessions across micro-batches.
    Files arrive in event-time order (late-beyond-watermark input is
    dropped by the engine like every watermarked stateful op)."""
    schema = "id long, ts timestamp, user_id long, event_type string"
    base = datetime.datetime(2024, 1, 1, 8, 0, 0)

    def m(mins):
        return base + datetime.timedelta(minutes=mins)

    def us(mins, micros):
        return base + datetime.timedelta(minutes=mins,
                                         microseconds=micros)

    f1 = [(1, m(0), 1, "signup"), (2, m(5), 1, "view"),
          (3, m(10), 1, "click"), (4, m(1), 2, "view")]
    f2 = [(5, m(30), 2, "click"),                       # joins user2
          (6, m(180), 1, "view"), (7, m(182), 1, "purchase"),
          # user 3: events 3600.0004 s apart — batch's double-second
          # gap math SPLITS them; ms-truncated math would merge (the
          # regression the µs state fix pins)
          (8, us(200, 250), 3, "view"), (9, us(260, 650), 3, "click"),
          # user 4: 3599.9996 s apart — one session in both paths
          (10, us(200, 700), 4, "view"),
          (11, us(260, 300), 4, "click")]
    s1 = [(99, base + datetime.timedelta(days=2), 999, "noop")]
    s2 = [(100, base + datetime.timedelta(days=4), 999, "noop")]

    src = tmp_path / "sp_src"
    src.mkdir()
    ck, out = tmp_path / "sp_ck", tmp_path / "sp_out"

    def write(rs):
        spark.createDataFrame(rs, schema).coalesce(1) \
            .write.mode("append").parquet(str(src))

    def run_once():
        sdf = st.read_stream(spark, str(src), schema=schema)
        o = st.stream_session_paths(sdf, "user_id", "ts", "event_type",
                                    gap_seconds=3600,
                                    watermark="1 minute")
        q = (o.writeStream.format("parquet").option("path", str(out))
             .option("checkpointLocation", str(ck))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    for batch in (f1, f2, s1, s2):
        write(batch)
        run_once()

    got = sorted(map(tuple, spark.read.parquet(str(out)).collect()))
    # batch replay over the same rows: stream must equal the batch
    # sessions that are CLOSED by the final watermark (everything but
    # the sentinel user's last session)
    full = st.stream_session_paths(
        spark.createDataFrame(f1 + f2 + s1 + s2, schema),
        "user_id", "ts", "event_type", gap_seconds=3600)
    allb = sorted(map(tuple, full.collect()))
    # the watermark lags one batch, so the sentinel user's own
    # sessions are still open when the runs stop; every REAL user
    # session has closed and must match the batch replay exactly
    exp = [t for t in allb if t[0] != 999]
    assert got == sorted(exp)
    paths = {(t[0], t[1]): t[4] for t in got}
    assert paths[(1, int(base.timestamp() * 1000))] == "signup>view>click"
    assert paths[(2, int(m(1).timestamp() * 1000))] == "view>click"


def test_streaming_media_decode_batch_parity(spark, tmp_path):
    """decode_image and decode_audio are streaming-safe: the Arrow
    mapInPandas media path is stateless and row-local, so
    readStream → decode → writeStream(AvailableNow) must emit exactly
    the batch decode of the same payloads (PNG pixels and WAV sample
    stats alike). This pins the 100-TB ingest shape: media decode
    runs inside the streaming ingest DAG, no separate batch hop."""
    import struct

    import numpy as np

    from meza_spark.llm.multimodal import (_encode_png, decode_audio,
                                           decode_image)

    from meza_spark.llm.flac import encode_flac
    from meza_spark.llm.webp import encode_webp_lossless

    rng = np.random.default_rng(41)
    img_rows = []
    for i in range(6):
        px = rng.integers(0, 256, (5 + i, 7, 3), dtype=np.uint8)
        # r8: alternate PNG and lossless WebP payloads — the webp
        # module must be stream-safe too
        enc = _encode_png if i % 2 else encode_webp_lossless
        img_rows.append((i, bytearray(enc(px))))
    wav_rows = []
    for i in range(4):
        v = ((np.arange(50 + i) * 13 + i * 7) % 901 - 450).astype("<i2")
        data = v.tobytes()
        wav = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
               + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000,
                                       16000, 2, 16)
               + b"data" + struct.pack("<I", len(data)) + data)
        wav_rows.append((100 + i, bytearray(wav)))
    for i in range(2):                 # r8: FLAC through the same DAG
        sig = ((np.arange(80) * 19 + i * 31) % 1201 - 600).astype(np.int64)
        wav_rows.append((200 + i, bytearray(encode_flac(sig, rate=8000))))

    schema = "media_id long, payload binary"
    for kind, rows, op in (("img", img_rows, decode_image),
                           ("aud", wav_rows, decode_audio)):
        src = tmp_path / f"{kind}_src"
        src.mkdir()
        ck, out = tmp_path / f"{kind}_ck", tmp_path / f"{kind}_out"
        # two file arrivals → two micro-batches
        half = len(rows) // 2
        for part in (rows[:half], rows[half:]):
            spark.createDataFrame(part, schema).coalesce(1) \
                .write.mode("append").parquet(str(src))
        sdf = spark.readStream.schema(
            "media_id long, payload binary").parquet(str(src))
        q = (op(sdf).writeStream.format("parquet")
             .option("path", str(out))
             .option("checkpointLocation", str(ck))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        got = sorted(map(tuple, spark.read.parquet(str(out)).collect()))
        want = sorted(map(tuple, op(
            spark.createDataFrame(rows, schema)).collect()))
        assert got == want, kind
