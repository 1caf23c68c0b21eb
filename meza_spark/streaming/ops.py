"""Structured Streaming variants (SURVEY §2.8).

The reference's "streaming" is lazy pull over possibly-infinite
iterators — no watermarks, no event time, no triggers (meza
docs/FAQ.rst:13-15; infinite-input tests tests/test_process.py:50-51).
Everything stream-safe there (cut/tfilter/grep/type_cast/hash/
normalize/fillempty-front) is a stateless projection/filter here and
works UNCHANGED on a streaming DataFrame — that is the point of
building on the DataFrame API: ``process.cut(stream_df, ...)`` is
already a streaming operator.

This module adds the genuinely stateful pieces the reference cannot
express:
  - event-time tumbling/sliding/session windows with watermarks
  - bounded-memory dedupe as ``dropDuplicatesWithinWatermark`` — the
    principled version of meza's 4096-row seen-deque
    (meza/process.py:887-898)
  - running folds via ``applyInPandasWithState`` (op_everseen's
    stateful analog, meza/fntools.py:1190-1218)

Scale notes: state stores shard by key across executors; watermarks
bound state size. Use ``spark.sql.shuffle.partitions`` ≈ cores for the
stateful shuffle, and RocksDB state store on real clusters.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "read_stream", "write_stream", "tumbling_window_agg",
    "sliding_window_agg", "session_window_agg", "stream_dedupe",
    "stream_fill_running", "stream_static_join",
    "stream_cusum", "stream_session_paths",
]


def read_stream(spark, path: str | None = None, fmt: str = "parquet",
                schema=None, **options) -> DataFrame:
    """Streaming source facade: file-drop directory (parquet/csv/json),
    or ``fmt='rate'`` for testing. File sources need an explicit
    schema (no inference on unbounded input)."""
    r = spark.readStream.format(fmt)
    if schema is not None:
        r = r.schema(schema)
    for k, v in options.items():
        r = r.option(k, v)
    return r.load(path) if path else r.load()


def write_stream(df: DataFrame, path: str | None = None,
                 fmt: str = "memory", query_name: str = "meza_stream",
                 output_mode: str = "append", checkpoint: str | None = None,
                 available_now: bool = False, **options):
    """Streaming sink facade; returns the StreamingQuery.

    ``available_now=True`` = INCREMENTAL BATCH: process everything
    currently available, then stop — with a ``checkpoint``, each
    invocation picks up only files that arrived since the last run
    (the nightly-pipeline "process only the new data" contract, state
    tracked by the engine, no manifest bookkeeping).
    """
    w = (df.writeStream.format(fmt).outputMode(output_mode)
         .queryName(query_name))
    if available_now:
        w = w.trigger(availableNow=True)
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    for k, v in options.items():
        w = w.option(k, v)
    if path:
        w = w.option("path", path)
    return w.start()


def tumbling_window_agg(df: DataFrame, ts_col: str, window: str,
                        aggs: dict[str, tuple[str, str]],
                        keys: Sequence[str] = (),
                        watermark: str = "10 minutes") -> DataFrame:
    """Event-time tumbling window aggregation with late-data watermark.

    ``aggs`` = {'out': ('field', 'op')} like process.group. Works on
    static frames too (window() is just an expression)."""
    from ..process import _agg_col

    wdf = df.withWatermark(ts_col, watermark) if df.isStreaming else df
    cols = [_agg_col(op, f).alias(name) for name, (f, op) in aggs.items()]
    return (wdf.groupBy(F.window(ts_col, window), *keys).agg(*cols)
            .select(F.col("window.start").alias("window_start"),
                    F.col("window.end").alias("window_end"),
                    *keys, *[F.col(n) for n in aggs]))


def sliding_window_agg(df: DataFrame, ts_col: str, window: str, slide: str,
                       aggs: dict[str, tuple[str, str]],
                       keys: Sequence[str] = (),
                       watermark: str = "10 minutes") -> DataFrame:
    """Sliding event-time windows (window length + slide interval)."""
    from ..process import _agg_col

    wdf = df.withWatermark(ts_col, watermark) if df.isStreaming else df
    cols = [_agg_col(op, f).alias(name) for name, (f, op) in aggs.items()]
    return (wdf.groupBy(F.window(ts_col, window, slide), *keys).agg(*cols)
            .select(F.col("window.start").alias("window_start"),
                    F.col("window.end").alias("window_end"),
                    *keys, *[F.col(n) for n in aggs]))


def session_window_agg(df: DataFrame, ts_col: str, gap: str,
                       keys: Sequence[str],
                       aggs: dict[str, tuple[str, str]],
                       watermark: str = "10 minutes") -> DataFrame:
    """Session windows: events within ``gap`` of each other merge into
    one session per key."""
    from ..process import _agg_col

    wdf = df.withWatermark(ts_col, watermark) if df.isStreaming else df
    cols = [_agg_col(op, f).alias(name) for name, (f, op) in aggs.items()]
    return (wdf.groupBy(F.session_window(ts_col, gap), *keys).agg(*cols)
            .select(F.col("session_window.start").alias("session_start"),
                    F.col("session_window.end").alias("session_end"),
                    *keys, *[F.col(n) for n in aggs]))


def stream_dedupe(df: DataFrame, fields: Sequence[str], ts_col: str,
                  watermark: str = "10 minutes") -> DataFrame:
    """Bounded-state streaming dedupe — the watermarked version of
    meza's seen-deque (``unique``, meza/process.py:851-898): exact
    within the watermark horizon, state evicted beyond it."""
    if df.isStreaming:
        return (df.withWatermark(ts_col, watermark)
                .dropDuplicatesWithinWatermark(list(fields)))
    return df.dropDuplicates(list(fields))


def stream_fill_running(df: DataFrame, key_cols: Sequence[str],
                        value_col: str, ts_col: str, op: str = "max",
                        watermark: str = "10 minutes") -> DataFrame:
    """Per-key running extrema over a stream — op_everseen
    (meza/fntools.py:1190-1218) as a stateful streaming op via
    ``applyInPandasWithState``.

    Emits each micro-batch's rows with ``{value}_running`` appended;
    state is one scalar per key (bounded)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    if not df.isStreaming:
        from ..process import everseen

        out = everseen(df, value_col, order_by=ts_col, op=op,
                       partition_by=list(key_cols))
        return out.withColumnRenamed(f"{value_col}_everseen",
                                     f"{value_col}_running")

    in_cols = df.columns
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema]
        + [f"{value_col}_running double"])
    state_schema = "acc double"
    agg = {"max": max, "min": min, "sum": lambda a, b: a + b}[op]

    def fn(key, pdfs, state):
        acc = state.get[0] if state.exists else None
        rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            for _, row in pdf.iterrows():
                v = float(row[value_col])
                acc = v if acc is None else agg(acc, v)
                rows.append(list(row[in_cols]) + [acc])
        state.update((acc,))
        yield pd.DataFrame(rows, columns=in_cols + [f"{value_col}_running"])

    return (df.withWatermark(ts_col, watermark)
            .groupBy(*key_cols)
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "append", GroupStateTimeout.NoTimeout))


def stream_static_join(stream_df: DataFrame, static_df: DataFrame,
                       on: str | list, how: str = "left") -> DataFrame:
    """Enrich a stream with a static dimension (the canonical
    stream⋈dim pattern: events joined to a reference table).

    Structured Streaming supports stream-static equi-joins natively
    for inner/left; the static side is re-planned per micro-batch, so
    an updated dim table directory is picked up without restarting the
    query. The explicit ``broadcast`` hint keeps every micro-batch
    join shuffle-free (dim tables are small by definition; without the
    hint a large-stats dim could tip AQE into shuffling the BATCH side
    each micro-batch, which at production rates dominates latency).
    """
    return stream_df.join(F.broadcast(static_df), on=on, how=how)


def foreach_batch_sink(df: DataFrame, fn, query_name: str = "meza_feb",
                       checkpoint: str | None = None,
                       output_mode: str = "append", **options):
    """Custom sink via ``foreachBatch``: ``fn(batch_df, batch_id)``
    runs per micro-batch with a BATCH DataFrame — the escape hatch for
    sinks Structured Streaming lacks natively (meza's write() targets:
    sqlite, dbf, xlsx...; or idempotent JDBC upserts).

    Exactly-once caveat, stated rather than hidden: foreachBatch is
    at-least-once on retry; pair ``batch_id`` with an idempotent or
    transactional write (e.g. overwrite-by-batch-id partitions) for
    effective exactly-once. A checkpoint location makes batch ids
    stable across restarts.
    """
    w = (df.writeStream.foreachBatch(fn).outputMode(output_mode)
         .queryName(query_name))
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    for k, v in options.items():
        w = w.option(k, v)
    return w.start()


def stream_stream_join(left: DataFrame, right: DataFrame, on: str,
                       left_ts: str, right_ts: str,
                       watermark: str = "10 minutes",
                       time_bound: str = "15 minutes",
                       how: str = "inner") -> DataFrame:
    """Watermarked stream-stream equi-join with an event-time bound —
    the two-streams correlation primitive (clicks ⋈ impressions).

    Both sides carry watermarks and the join condition includes
    ``|left_ts - right_ts| ≤ time_bound``: together these let the
    state store EVICT rows older than watermark+bound instead of
    buffering both streams forever — the difference between bounded
    and unbounded state at production rates. Outer variants emit the
    unmatched side only once its watermark passes (late-data safe).
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[on] == rw[on])
        & (rw[right_ts] >= F.expr(f"{left_ts} - INTERVAL {time_bound}"))
        & (rw[right_ts] <= F.expr(f"{left_ts} + INTERVAL {time_bound}")))
    return lw.join(rw, cond, how)


def stream_cusum(df: DataFrame, key_cols: Sequence[str], ts_col: str,
                 value_col: str, target: float, slack: float = 0.0,
                 threshold: float | None = None,
                 watermark: str = "10 minutes") -> DataFrame:
    """Streaming CUSUM changepoint alarms — ``analytics.cusum`` in
    known-target mode as a stateful operator: per key the state is
    FOUR int64s (running sum + running min, each side), so a
    million-key stream carries ~32 MB of state store total.

    Batch frames delegate to ``analytics.cusum(target=...)`` and the
    integer-micro pipeline makes stream output EXACTLY equal batch
    output on the same rows (the parity unit pins it): the batch path
    computes ``S_t - min(0, min S_k)`` with window functions, the
    stream path carries (S, min S) across micro-batches — the same
    exact integers either way. Rows sort by ``ts_col`` inside each
    micro-batch; cross-batch order is arrival order (late rows fold
    into the statistic when they arrive — CUSUM is a monitor, not a
    replayable report; use the batch op for audits).
    """
    import math as _math

    if not df.isStreaming:
        from ..analytics import cusum

        return cusum(df, list(key_cols), ts_col, value_col, slack=slack,
                     threshold=threshold, target=target)

    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    tgt_u = _math.floor(target * 1000000 + 0.5)
    slack_u = _math.floor(slack * 1000000 + 0.5)
    thr_u = (None if threshold is None
             else _math.floor(threshold * 1000000 + 0.5))
    in_cols = list(df.columns)
    out_cols = in_cols + ["cusum_hi_micro", "cusum_lo_micro"] \
        + (["alarm"] if thr_u is not None else [])
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema]
        + ["cusum_hi_micro long", "cusum_lo_micro long"]
        + (["alarm boolean"] if thr_u is not None else []))
    state_schema = "shi long, mhi long, slo long, mlo long"

    def fn(key, pdfs, state):
        shi, mhi, slo, mlo = (state.get if state.exists else (0, 0, 0, 0))
        rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col, kind="mergesort")
            for _, row in pdf.iterrows():
                vq = _math.floor(float(row[value_col]) * 1000000 + 0.5)
                shi += vq - tgt_u - slack_u
                slo += tgt_u - vq - slack_u
                mhi, mlo = min(mhi, shi), min(mlo, slo)
                hi, lo = shi - min(0, mhi), slo - min(0, mlo)
                out = list(row[in_cols]) + [hi, lo]
                if thr_u is not None:
                    out.append(hi >= thr_u or lo >= thr_u)
                rows.append(out)
        state.update((shi, mhi, slo, mlo))
        yield pd.DataFrame(rows, columns=out_cols)

    return (df.withWatermark(ts_col, watermark)
            .groupBy(*key_cols)
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "append", GroupStateTimeout.NoTimeout))


def stream_session_paths(df: DataFrame, user_col: str, ts_col: str,
                         type_col: str, gap_seconds: int = 1800,
                         watermark: str = "10 minutes") -> DataFrame:
    """Completed sessions with their ordered event-type PATH
    (``signup>view>click``) — the clickstream-mining primitive.
    Emits one row per CLOSED session: ``(key, session_start,
    session_end, n_events, path)`` with start/end in epoch ms.

    Streaming frames use ``applyInPandasWithState`` with an
    EVENT-TIME TIMEOUT: events buffer in per-key state, the timeout
    is pinned at last-event + gap, and when the watermark passes it
    the handler splits the buffer into gap-sessions, emits every
    closed one exactly once, and retains the open tail. This is the
    capability ``F.session_window`` aggregation cannot express — a
    windowed agg can count a session, but it cannot emit the ordered
    member sequence on close. State per key = the open tail only.
    (Spark 4's ``transformWithStateInPandas`` timer API expresses the
    same thing; this build's Python workers lack its protobuf
    transport, and the timeout form is equivalent here.)

    Batch frames produce the identical rows via ``process.sessionize``
    + one ordered collect per session (the parity unit pins stream ==
    batch). Late events inside the watermark fold into their session;
    beyond it they are dropped like every watermarked stateful op.
    """
    gap_ms = int(gap_seconds) * 1000

    if not df.isStreaming:
        from ..process import sessionize

        # tiebreak on the type column: tied timestamps otherwise make
        # the lag() session assignment partitioning-dependent
        sess = sessionize(df, user_col, ts_col,
                          gap_seconds=gap_seconds, tiebreak=type_col)
        ts_ms = F.unix_millis(F.col(ts_col).cast("timestamp"))
        ordered = F.array_sort(
            F.collect_list(F.struct(ts_ms.alias("t"),
                                    F.col(type_col).alias("et"))))
        return (sess.groupBy(user_col, "session_id")
                .agg(F.min(ts_ms).alias("session_start"),
                     F.max(ts_ms).alias("session_end"),
                     F.count(F.lit(1)).alias("n_events"),
                     F.array_join(
                         F.transform(ordered, lambda x: x["et"]), ">")
                     .alias("path"))
                .drop("session_id"))

    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    key_field = [f for f in df.schema if f.name == user_col][0]
    out_schema = (f"{user_col} {key_field.dataType.simpleString()}, "
                  "session_start long, session_end long, "
                  "n_events long, path string")
    out_cols = [user_col, "session_start", "session_end",
                "n_events", "path"]
    # state carries MICROSECONDS: the batch path splits sessions on
    # microsecond-precision double seconds (process.sessionize), and
    # real event data carries sub-ms parts — gap math in truncated ms
    # would merge/split differently than batch on ~0.4 ms boundaries
    # field named tus, not ts: a restart from a checkpoint written by
    # the older millisecond-state build must FAIL the state-schema
    # check loudly rather than silently reinterpret ms as µs
    state_schema = "tus array<long>, et array<string>"
    ts_col_, type_col_ = ts_col, type_col
    gap_s = float(gap_seconds)

    def _sessions(evs):
        """Split on the IDENTICAL arithmetic the batch window uses:
        each µs timestamp becomes a float64 second (one IEEE divide,
        same as Spark's timestamp→double cast) and the diff compares
        against the float gap."""
        groups, cur = [], [evs[0]]
        for e in evs[1:]:
            if (e[0] / 1e6) - (cur[-1][0] / 1e6) > gap_s:
                groups.append(cur)
                cur = [e]
            else:
                cur.append(e)
        groups.append(cur)
        return groups

    def fn(key, pdfs, state):
        evs = []
        if state.exists:
            ts, et = state.get
            evs = list(zip(ts, et))
        for pdf in pdfs:
            if not len(pdf):
                continue
            t = (pdf[ts_col_].astype("int64") // 1_000)   # ns → µs
            evs += list(zip(t.tolist(),
                            pdf[type_col_].astype(str).tolist()))
        rows = []
        if evs:
            evs.sort()   # (µs, type) — sessionize's (ts, tiebreak)
            groups = _sessions(evs)
            # a session is closed once the watermark (ms) passes its
            # last event + gap, with a 1 ms guard for the µs→ms
            # truncation — whether we got here via the timeout or via
            # new data (a timeout may not even be settable for an
            # already-stale session: timestamps at or before the
            # current watermark are invalid)
            wm = state.getCurrentWatermarkMs()
            closed = [g for g in groups
                      if g[-1][0] // 1000 + gap_ms + 1 <= wm]
            keep = [g for g in groups
                    if g[-1][0] // 1000 + gap_ms + 1 > wm]
            # member order inside the path matches the batch collect:
            # (ms, type) — equal keys are interchangeable
            rows = [(key[0], g[0][0] // 1000, g[-1][0] // 1000, len(g),
                     ">".join(e[1] for e in
                              sorted((e[0] // 1000, e[1]) for e in g)))
                    for g in closed]
            tail = [e for g in keep for e in g]
            if tail:
                state.update(([e[0] for e in tail],
                              [e[1] for e in tail]))
                state.setTimeoutTimestamp(
                    max(tail[-1][0] // 1000 + gap_ms + 2, wm + 1))
            else:
                state.remove()
        elif state.exists:
            state.remove()
        if rows:
            yield pd.DataFrame(rows, columns=out_cols)

    return (df.withWatermark(ts_col, watermark)
            .groupBy(user_col)
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "append",
                                    GroupStateTimeout.EventTimeTimeout))
