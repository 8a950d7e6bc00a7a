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
