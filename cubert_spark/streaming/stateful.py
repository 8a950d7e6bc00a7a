"""Custom stateful streaming operators via applyInPandasWithState —
the extension point Cubert's user TupleOperator/BlockOperator surface
(SURVEY.md §2.9) maps to in a streaming world.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_counts(df: DataFrame, key_col: str = "event_type") -> DataFrame:
    """Running per-key event counts across micro-batches — the
    canonical stateful op. State is one long per key; timeout disabled
    (counts are eternal). Output: one row per key per batch with the
    updated total."""
    import pandas as pd

    def update(key, pdf_iter: Iterator["pd.DataFrame"], state: GroupState):
        n = sum(len(pdf) for pdf in pdf_iter)
        (total,) = state.get if state.exists else (0,)
        total += n
        state.update((total,))
        yield pd.DataFrame({"key": [key[0]], "total": [total]})

    return df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType="key string, total long",
        stateStructType="total long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def per_key_ema(
    df: DataFrame,
    key_col: str,
    value_col: str,
    alpha: float = 0.3,
    ttl_minutes: int | None = None,
    ts_col: str | None = None,
) -> DataFrame:
    """Streaming exponential moving average per key — the
    feature-engineering shape (e.g. per-user running engagement score)
    batch engines can't express incrementally.

    State is (ema double, n long) per key. With ``ttl_minutes``, idle
    keys expire via ProcessingTimeTimeout and their state is removed —
    the knob that keeps state bounded when the key space is unbounded
    (drifting user populations at corpus scale). Output one row per
    key per batch: (key, ema, n).

    Null values are skipped (standard aggregate semantics — one null
    must not NaN-poison the state forever). Keys are stringified into
    the output ``key`` column. An EMA is order-sensitive: pass
    ``ts_col`` to fold each micro-batch in event-time order; without
    it, arrival order within a batch is used (post-shuffle order is
    not deterministic across runs).

    Note: with a processing-time timeout the query keeps triggering to
    fire expirations, so ``availableNow`` does NOT self-terminate —
    drive TTL'd queries with a bounded awaitTermination + stop (see
    tests/test_streaming.py::test_per_key_ema_ttl_path)."""
    import pandas as pd

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_minutes
        else GroupStateTimeout.NoTimeout
    )

    def update(key, pdf_iter: Iterator["pd.DataFrame"], state: GroupState):
        if ttl_minutes and state.hasTimedOut:
            state.remove()
            return
        ema, n = state.get if state.exists else (None, 0)
        chunks = list(pdf_iter)
        if chunks:
            batch = pd.concat(chunks, ignore_index=True)
            if ts_col is not None:
                batch = batch.sort_values(ts_col, kind="stable")
            for v in batch[value_col]:
                if pd.isna(v):
                    continue
                v = float(v)
                ema = v if ema is None else alpha * v + (1 - alpha) * ema
                n += 1
        state.update((ema, n))
        if ttl_minutes:
            state.setTimeoutDuration(ttl_minutes * 60 * 1000)
        yield pd.DataFrame({"key": [str(key[0])], "ema": [ema], "n": [n]})

    return df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType="key string, ema double, n long",
        stateStructType="ema double, n long",
        outputMode="update",
        timeoutConf=timeout,
    )
