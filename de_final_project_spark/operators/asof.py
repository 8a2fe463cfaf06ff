"""As-of (temporal lookup) join — an operator the reference lacks but a
time-series/star pipeline at scale needs (SURVEY.md §7.3 step 8 extension
surface; the reference's nearest analog is its watermark max-probe,
src/ingestion_lambda.py:159).

Spark has no ASOF JOIN primitive, so this implements the scalable
union-and-fill formulation instead of a naive inequality join:

  1. tag left rows side=1, right rows side=0;
  2. union them (right contributes only key + ts + payload columns);
  3. one window per key ordered by (ts, side, tiebreak) carries the most
     recent right payload forward with ``last(..., ignorenulls=True)``;
  4. keep only left rows.

Cost model: ONE hash shuffle of |L|+|R| rows on the key and a per-key
sort — no row explosion, no range-join quadratic blowup, no broadcast
requirement on either side. This is the formulation that survives a
100 TB fact table joined to a 10 TB quote/state stream; an inequality
join would degenerate to BroadcastNestedLoop or a cross product.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "_asof_side"


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    payload_cols: Sequence[str],
    tiebreak_col: str | None = None,
) -> DataFrame:
    """For every left row, attach the payload of the latest right row with
    the same key and ``right.ts <= left.ts`` (ties: the right row wins, so
    a same-timestamp state change is visible to the event that carries it).

    ``payload_cols`` must not collide with left column names — alias on
    the right side first. A genuinely-null payload value in the matched
    right row is treated as transparent by the ignore-nulls fill; make
    payloads non-null (coalesce to a sentinel) if that distinction matters.
    """
    keys = list(keys)
    payload_cols = list(payload_cols)
    overlap = set(payload_cols) & set(left.columns)
    if overlap:
        raise ValueError(f"payload columns collide with left: {sorted(overlap)}")

    rhs_cols = [*keys, ts_col, *payload_cols]
    if tiebreak_col is not None and tiebreak_col not in rhs_cols:
        rhs_cols.append(tiebreak_col)
    lhs = left.withColumn(_SIDE, F.lit(1))
    rhs = right.select(*rhs_cols).withColumn(_SIDE, F.lit(0))
    unioned = lhs.unionByName(rhs, allowMissingColumns=True)

    order = [F.col(ts_col).asc(), F.col(_SIDE).asc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc_nulls_first())
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in payload_cols:
        unioned = unioned.withColumn(c, F.last(c, ignorenulls=True).over(w))
    out = unioned.where(F.col(_SIDE) == 1).drop(_SIDE)
    if tiebreak_col is not None and tiebreak_col not in left.columns:
        out = out.drop(tiebreak_col)
    return out
