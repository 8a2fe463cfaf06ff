"""Keep-latest-by-key deduplication — the reference's signature operator.

The reference concatenates every ingest file in S3 listing order and runs
``drop_duplicates(subset=[pk], keep='last')`` so the newest file's row wins
(reference src/process_lambda.py:95-199; SURVEY.md §2.5 D1). Positional
"last" is meaningless in a distributed engine, so this operator defines an
explicit total order instead: rank rows per key by version columns
descending (``last_updated``, then ingest batch id, then a final arbitrary
but deterministic tiebreak) and keep rank 1.

Physical shape: one hash-partition exchange on the key columns feeding a
running-window rank — the same shuffle a groupBy would need, i.e. the
minimum possible. At 100 TB the exchange partitions by pk across
executors; no driver-side state, no collect.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_RANK_COL = "__kl_rank"


def keep_latest(
    df: DataFrame,
    keys: Sequence[str] | str,
    order_cols: Sequence[str] | str,
) -> DataFrame:
    """Keep exactly one row per key: the max of ``order_cols`` (compared
    in sequence, descending, NULLS LAST so a versioned row beats an
    unversioned one).

    Ties on all order columns are broken by the remaining columns
    descending, making the result deterministic for any input — the
    pandas fallback to file order (SURVEY.md §7.4 risk 3) becomes an
    explicit documented total order.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    order_cols = [order_cols] if isinstance(order_cols, str) else list(order_cols)
    tiebreak = [c for c in df.columns if c not in keys and c not in order_cols]
    ordering = [F.col(c).desc_nulls_last() for c in order_cols] + [
        F.col(c).desc_nulls_last() for c in tiebreak
    ]
    w = Window.partitionBy(*keys).orderBy(*ordering)
    return (
        df.withColumn(_RANK_COL, F.row_number().over(w))
        .filter(F.col(_RANK_COL) == 1)
        .drop(_RANK_COL)
    )
