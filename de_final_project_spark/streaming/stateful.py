"""Custom stateful streaming operator via ``applyInPandasWithState`` —
the escape hatch for per-key logic Spark's built-in stateful operators
(windowed agg, session window, stream dedup) cannot express.

Demonstrated operator: a per-user lifetime profile (event count, value
total, first/last seen) maintained across micro-batches. The built-in
alternative would be ``complete``-mode aggregation, which rewrites the
whole result table each batch; keyed state emits only the touched keys —
the shape that scales to billions of users with RocksDB state backing.

State flows Arrow-batched (pandas per group-batch), so the Python hop is
vectorized, not per-row. The reference's analog is its hand-rolled
watermark file — a single global key of state (SURVEY.md §2.10).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, n_events long, total_value double, "
    "first_seen timestamp, last_seen timestamp"
)
STATE_SCHEMA = "n long, total double, first_us long, last_us long"

_US = 1_000_000


def _update_user_profile(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    n, total, first_us, last_us = (
        state.get if state.exists else (0, 0.0, None, None)
    )
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        ts_us = pdf["ts"].astype("int64") // 1000  # ns -> us
        lo, hi = int(ts_us.min()), int(ts_us.max())
        first_us = lo if first_us is None else min(first_us, lo)
        last_us = hi if last_us is None else max(last_us, hi)
    state.update((n, total, first_us, last_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total],
            "first_seen": [pd.Timestamp(first_us, unit="us")],
            "last_seen": [pd.Timestamp(last_us, unit="us")],
        }
    )


def user_profile_stateful(events: DataFrame) -> DataFrame:
    """Running per-user profile over an event stream; emits the updated
    profile row for every user touched in the micro-batch."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_profile,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
