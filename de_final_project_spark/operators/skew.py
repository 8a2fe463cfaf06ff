"""Skew mitigation — salted two-phase aggregation and salted broadcast-side
replication for hot keys.

The reference never meets skew (single-node pandas has no partitions —
SURVEY.md §4), but at 100 TB a handful of hot keys (one celebrity user,
one default enum value) turns a hash shuffle into a single straggler
task. Two standard remedies, DataFrame-native:

- ``salted_agg``: append a random-ish salt to the grouping key, aggregate
  partially per (key, salt), then re-aggregate per key. The hot key's
  rows spread across ``n_salts`` reducers; the second aggregate touches
  only ``n_salts`` rows per key. Works for any algebraic aggregate
  (sum/count/min/max — pass the merge expressions for the second phase).
- ``replicate_small_for_salted_join``: the matching join-side transform —
  explode the small side once per salt so a salted big side still joins
  on (key, salt).

AQE's skew-join handling (``spark.sql.adaptive.skewJoin``) covers sorted
shuffle joins at runtime; these helpers cover aggregations and broadcast
patterns AQE does not rewrite. Salt derivation is a hash of stable row
columns, not rand(): deterministic under retries/speculation, which
matters because a recomputed task must re-produce the same salt or
shuffle files disagree.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def with_salt(df: DataFrame, salt_from: Sequence[str], n_salts: int) -> DataFrame:
    """Add a deterministic salt in [0, n_salts) hashed from ``salt_from``
    columns (pick high-cardinality non-key columns so a hot key's rows
    spread; the hash is stable under task retry)."""
    h = F.hash(*[F.col(c) for c in salt_from])
    return df.withColumn(SALT_COL, F.pmod(h, F.lit(n_salts)))


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: dict[str, Column],
    merge_aggs: dict[str, Column],
    salt_from: Sequence[str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``partial_aggs``: name -> aggregate over the raw rows, computed per
    (keys, salt). ``merge_aggs``: name -> aggregate over the partial
    columns, computed per keys (e.g. partial ``F.count(...)`` merges with
    ``F.sum(name)``). Result: one row per key, identical to the unsalted
    groupBy — only the shuffle distribution differs.
    """
    keys = list(keys)
    partial = (
        with_salt(df, salt_from, n_salts)
        .groupBy(*keys, SALT_COL)
        .agg(*[expr.alias(name) for name, expr in partial_aggs.items()])
    )
    return partial.groupBy(*keys).agg(
        *[expr.alias(name) for name, expr in merge_aggs.items()]
    )


def replicate_small_for_salted_join(
    small: DataFrame, n_salts: int
) -> DataFrame:
    """Cross the small join side with the salt domain so it matches a
    salted big side on (key, salt). Cost: |small| × n_salts rows — still
    broadcast-sized when the small side is a dimension."""
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias(SALT_COL)
    return small.select("*", salts)
