"""Event-time streaming transformations over the tick stream.

The reference never aggregates its stream — Firehose just batches bytes
(SURVEY §2.9). These are the idiomatic upgrades its design implies:
watermarked event-time windows (the "what did BTC do in the last hour"
query its data shape begs for), streaming dedup (the reference's path is
at-least-once — replays are a WHEN, not an IF), and a custom stateful
operator via ``applyInPandasWithState`` for running per-key statistics
that windows can't express.

All functions take and return streaming DataFrames — they compose with
any source in :mod:`.sources` and any sink in :mod:`.sinks`, and they
also work unchanged on *batch* DataFrames (Spark's unified semantics),
which is how the oracle tests check them.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def tumbling_window_agg(
    ticks: DataFrame,
    window: str = "1 hour",
    watermark: str = "10 minutes",
    ts_col: str = "data_hora",
    value_col: str = "preco_brl",
) -> DataFrame:
    """Watermarked tumbling OHLC-style aggregate per event-time window.

    The watermark bounds state: windows older than max(event time) −
    watermark are finalized and dropped, so state size is O(windows in
    flight), not O(stream length) — the property that lets this run
    forever on a 1000-executor cluster.
    """
    return (
        ticks.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"))
        .agg(
            F.min(value_col).alias("low"),
            F.max(value_col).alias("high"),
            F.avg(value_col).alias("avg_price"),
            F.count(F.lit(1)).alias("n_ticks"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "low",
            "high",
            "avg_price",
            "n_ticks",
        )
    )


def sliding_window_agg(
    ticks: DataFrame,
    window: str = "10 minutes",
    slide: str = "1 minute",
    watermark: str = "10 minutes",
    ts_col: str = "data_hora",
    value_col: str = "preco_brl",
) -> DataFrame:
    """Sliding-window moving average (each event lands in window/slide
    overlapping windows — state cost scales with that factor)."""
    return (
        ticks.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window, slide).alias("w"))
        .agg(F.avg(value_col).alias("moving_avg"), F.count(F.lit(1)).alias("n_ticks"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "moving_avg",
            "n_ticks",
        )
    )


def session_window_agg(
    events: DataFrame,
    gap: str = "30 minutes",
    key_col: str = "user_id",
    ts_col: str = "ts",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Session windows: activity bursts separated by ≥gap of silence.

    ``F.session_window`` is the native streaming equivalent of the batch
    sessionization in ``operators.windows`` (lag + cumulative-sum over a
    partition) — same semantics, state-bounded by the watermark.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.col(key_col), F.session_window(ts_col, gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def dedup_ticks(
    ticks: DataFrame,
    keys: list[str] | None = None,
    ts_col: str = "data_hora",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup inside the watermark horizon.

    Upgrades the reference's at-least-once Firehose delivery to
    effectively-once: a replayed record with the same (event time, key)
    within the watermark is dropped; the watermark bounds the dedup
    state so it never grows with the stream. When the dedup keys omit
    the event-time column, plain ``dropDuplicates`` could never evict
    state — that case routes to ``dropDuplicatesWithinWatermark``, which
    expires keys once the watermark passes their event time.
    """
    cols = keys or [ts_col, "preco_brl"]
    wm = ticks.withWatermark(ts_col, watermark)
    if ts_col not in cols:
        return wm.dropDuplicatesWithinWatermark(cols)
    return wm.dropDuplicates(cols)


# ---------------------------------------------------------------------------
# Custom stateful operator: running per-key statistics
# ---------------------------------------------------------------------------

_STATS_STATE = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
        T.StructField("m2", T.DoubleType()),  # Welford sum of squared deltas
        T.StructField("last_price", T.DoubleType()),
    ]
)

_STATS_OUT = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("n", T.LongType()),
        T.StructField("mean", T.DoubleType()),
        T.StructField("variance", T.DoubleType()),
        T.StructField("last_price", T.DoubleType()),
    ]
)


def stateful_running_stats(
    ticks: DataFrame,
    key_col: str = "symbol",
    value_col: str = "preco_brl",
    ts_col: str = "data_hora",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Running count/mean/variance per key via ``applyInPandasWithState``.

    This is the operator shape windows can't express: unbounded running
    state updated per micro-batch (Welford merge, so variance is exact
    and single-pass). State is one tiny struct per key — constant
    memory per key regardless of stream length. Batch-mode fallback
    (used by the oracle tests) computes the same result with a plain
    aggregate, since ``applyInPandasWithState`` is streaming-only.
    """
    if not ticks.isStreaming:
        return (
            ticks.groupBy(F.col(key_col).alias("key"))
            .agg(
                F.count(value_col).alias("n"),
                F.avg(value_col).alias("mean"),
                F.coalesce(F.var_pop(value_col), F.lit(0.0)).alias("variance"),
                # tie-break equal timestamps by value so the result is
                # deterministic (matters for oracle hash-comparison)
                F.max_by(
                    value_col, F.struct(F.col(ts_col), F.col(value_col))
                ).alias("last_price"),
            )
        )

    import numpy as np  # local: executor-side dependency only
    import pandas as pd

    def update(key, pdf_iter: Iterator[pd.DataFrame], state):
        if state.exists:
            n, total, m2, last = state.get
        else:
            n, total, m2, last = 0, 0.0, 0.0, float("nan")
        for pdf in pdf_iter:
            # vectorized Welford: batch moments in three numpy reductions,
            # then Chan's parallel merge with the carried state — exact
            # single-pass variance, no per-row Python
            v = pdf.sort_values(ts_col)[value_col].astype(float).to_numpy()
            nb = len(v)
            if nb == 0:
                continue
            sb = float(v.sum())
            mb = sb / nb
            m2b = float(((v - mb) ** 2).sum())
            if n == 0:
                n, total, m2 = nb, sb, m2b
            else:
                delta = mb - total / n
                m2 += m2b + delta * delta * n * nb / (n + nb)
                total += sb
                n += nb
            last = float(v[-1])
        state.update((n, total, m2, last))
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "n": [n],
                "mean": [total / n if n else None],
                "variance": [m2 / n if n else None],
                "last_price": [last],
            }
        )

    return (
        ticks.withWatermark(ts_col, watermark)
        .groupBy(F.col(key_col))
        .applyInPandasWithState(
            update,
            outputStructType=_STATS_OUT,
            stateStructType=_STATS_STATE,
            outputMode="update",
            timeoutConf="NoTimeout",
        )
    )


_ALERT_OUT = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("anchor", T.DoubleType()),
        T.StructField("move_pct", T.DoubleType()),
    ]
)


def _make_ratchet():
    """Build the sequential anchor-ratchet as a by-value-picklable
    closure: emit row i when |v[i]/anchor - 1| >= pct, then re-anchor
    at v[i]. Shared by the streaming processor and the batch fallback
    so both paths are bit-identical.

    Factory form (not a module-level function captured by the worker
    closures): cloudpickle serializes module-level functions of this
    package BY REFERENCE, and executors can't import the package when
    the driver loads ``__spark_entry__.py`` by path from outside the
    repo — the round driver's invocation. A factory-made closure is
    pickled by value and ships standalone."""

    def ratchet(v, ts, anchor: float, pct: float):
        out = []
        for i in range(len(v)):
            price = float(v[i])
            if anchor != anchor:  # NaN: first event anchors silently
                anchor = price
                continue
            move = price / anchor - 1.0
            if abs(move) >= pct:
                out.append((ts[i], price, anchor, round(move, 6)))
                anchor = price
        return out, anchor

    return ratchet


def _ratchet_alerts(v, ts, anchor: float, pct: float):
    """Driver/test-side alias of the worker ratchet closure."""
    return _make_ratchet()(v, ts, anchor, pct)


def stateful_price_alerts(
    ticks: DataFrame,
    pct: float = 0.05,
    key_col: str = "symbol",
    value_col: str = "preco_brl",
    ts_col: str = "data_hora",
) -> DataFrame:
    """Large-move alerts per key via ``transformWithStateInPandas``
    (Spark 4's StatefulProcessor API — the arbitrary-state operator that
    supersedes ``applyInPandasWithState``; requires the RocksDB state
    store, see tests/test_streaming.py).

    Emits a row each time the price moves ≥ ``pct`` from the last
    EMITTED price (the anchor then ratchets forward). This is
    inherently sequential per key — no window/aggregate expresses a
    self-referencing anchor — which is exactly the shape the arbitrary
    stateful API exists for. State is ONE double per key (the anchor),
    persisted in the checkpoint across micro-batches and restarts.

    Batch fallback runs the identical ratchet via ``applyInPandas``
    (per-key sequential scan) so the streaming result is
    differential-tested against the batch plan.
    """
    import pandas as pd

    ratchet = _make_ratchet()

    if not ticks.isStreaming:

        def batch_ratchet(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(ts_col)
            rows, _ = ratchet(
                pdf[value_col].astype(float).to_numpy(),
                # numpy datetime64 view, NOT list(): the ratchet only
                # reads ts[i] on EMITS, so only emitted rows ever
                # materialize a timestamp object (guide §4 — r13)
                pdf[ts_col].to_numpy(),
                float("nan"),
                pct,
            )
            return pd.DataFrame(
                {
                    "key": [str(pdf[key_col].iloc[0])] * len(rows),
                    "ts": [r[0] for r in rows],
                    "price": [r[1] for r in rows],
                    "anchor": [r[2] for r in rows],
                    "move_pct": [r[3] for r in rows],
                }
            )

        return ticks.groupBy(key_col).applyInPandas(batch_ratchet, _ALERT_OUT)

    try:
        import google.protobuf  # noqa: F401 — TWS state protocol dep
    except ImportError as exc:  # pragma: no cover — env-dependent
        raise RuntimeError(
            "stateful_price_alerts' streaming path uses "
            "transformWithStateInPandas, whose state-server protocol "
            "requires the 'protobuf' package (absent in this container; "
            "tests skip accordingly). The batch path and the "
            "applyInPandasWithState operator (stateful_running_stats) "
            "carry the stateful coverage here."
        ) from exc

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class AlertProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._anchor = handle.getValueState("anchor", "anchor double")

        def handleInputRows(self, key, rows, timer_values):
            anchor = (
                float(self._anchor.get()[0])
                if self._anchor.exists()
                else float("nan")
            )
            pdfs = [pdf.sort_values(ts_col) for pdf in rows]
            pdf = pd.concat(pdfs).sort_values(ts_col) if pdfs else pd.DataFrame()
            if len(pdf):
                out, anchor = ratchet(
                    pdf[value_col].astype(float).to_numpy(),
                    # same lazy datetime64 handoff as the batch path
                    pdf[ts_col].to_numpy(),
                    anchor,
                    pct,
                )
                if anchor == anchor:
                    self._anchor.update((anchor,))
                if out:
                    yield pd.DataFrame(
                        {
                            "key": [str(key[0])] * len(out),
                            "ts": [r[0] for r in out],
                            "price": [r[1] for r in out],
                            "anchor": [r[2] for r in out],
                            "move_pct": [r[3] for r in out],
                        }
                    )

        def close(self) -> None:
            pass

    return ticks.groupBy(F.col(key_col)).transformWithStateInPandas(
        AlertProcessor(),
        outputStructType=_ALERT_OUT,
        outputMode="append",
        timeMode="none",
    )


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts_r",
    lookback: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream⋈stream equi-join bounded by an event-time interval: each
    left event matches right events of the same key within
    ``[left_ts - lookback, left_ts]``.

    Both sides carry watermarks and the join condition carries the time
    bound — together they let the engine EXPIRE join state (a right row
    older than watermark+lookback can never match again and is dropped).
    An unbounded stream-stream join would accumulate state forever; this
    is the shape that runs indefinitely. Right-side columns must already
    be named apart from left's (``right_ts`` default reflects that).
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[key] == rw[f"{key}_r"])
        & (rw[right_ts] >= lw[left_ts] - F.expr(f"INTERVAL {lookback}"))
        & (rw[right_ts] <= lw[left_ts])
    )
    return lw.join(rw, cond, "inner")


_EWMA_OUT = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("n", T.LongType()),
        T.StructField("ewma", T.DoubleType()),
    ]
)


def stateful_ewma(
    ticks: DataFrame,
    key_col: str = "symbol",
    value_col: str = "preco_brl",
    ts_col: str = "data_hora",
    alpha: float = 0.2,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming per-key EWMA: unbounded sequential state no window can
    express, as one ``applyInPandasWithState`` pass (state per key =
    (count, ewma), two scalars).

    Same recurrence as the batch operator (operators/windows.ewma):
    y_t = alpha·x_t + (1−alpha)·y_{t−1}, identical literal
    coefficients, rows ordered by event time within each micro-batch.
    Batch-mode input falls back to the exact batch operator, so the
    stream-equals-batch test is the correctness oracle.

    Note on Spark 4's ``transformWithStateInPandas`` (the typed-state
    successor: named state variables, timers, TTL, RocksDB-backed
    store): its Python state-server protocol imports ``google.protobuf``,
    which this container does not ship, so the operator stays on the
    stable ``applyInPandasWithState`` API — the state contract here (a
    2-field struct) ports to a TWS ValueState one-for-one."""
    a = float(alpha)
    b = 0.8 if alpha == 0.2 else 1.0 - a  # see operators/windows.ewma

    if not ticks.isStreaming:
        from ..operators.windows import ewma as batch_ewma

        per_row = batch_ewma(
            ticks, [key_col], [ts_col], value_col, alpha=alpha
        )
        w = Window.partitionBy(key_col).orderBy(F.desc(ts_col))
        return (
            per_row.withColumn("__rn", F.row_number().over(w))
            # count the FULL key history before keeping only its latest
            # row (the window reuses __rn's exchange — no extra shuffle)
            .withColumn(
                "__n", F.count(F.lit(1)).over(Window.partitionBy(key_col))
            )
            .filter(F.col("__rn") == 1)
            .select(
                F.col(key_col).alias("key"),
                F.col("__n").alias("n"),
                F.col("ewma"),
            )
        )

    import pandas as pd  # local: executor-side dependency only

    def update(key, pdf_iter: Iterator[pd.DataFrame], state):
        n, prev = state.get if state.exists else (0, None)
        for pdf in pdf_iter:
            pdf = pdf.sort_values(ts_col, kind="mergesort")
            for x in pdf[value_col].tolist():
                prev = float(x) if prev is None else a * float(x) + b * prev
                n += 1
        state.update((n, prev))
        yield pd.DataFrame({"key": [key[0]], "n": [n], "ewma": [prev]})

    return (
        ticks.withWatermark(ts_col, watermark)
        .groupBy(F.col(key_col))
        .applyInPandasWithState(
            update,
            outputStructType=_EWMA_OUT,
            stateStructType=T.StructType(
                [
                    T.StructField("n", T.LongType()),
                    T.StructField("ewma", T.DoubleType()),
                ]
            ),
            outputMode="update",
            timeoutConf="NoTimeout",
        )
    )
