"""Guard rails for operators that are correctness baselines, not scale
paths.

The exact O(n²)/O(n·q) variants (brute-force kNN, exact embedding
near-dup, all-pairs SimHash) exist to validate their bucketed twins
(LSH, IVF, pigeonhole blocks) — they must never land on a full corpus by
accident. ``guard_exact_baseline`` makes that contract executable: it
refuses inputs past a configurable row threshold with an error that
names the scale path to use instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# Spark conf key so a caller can raise the ceiling EXPLICITLY (e.g. a
# one-off offline validation on a bigger sample) without code changes.
MAX_ROWS_CONF = "spark.de_final_project.exactBaselineMaxRows"
DEFAULT_MAX_ROWS = 1_000_000


class ExactBaselineTooLarge(ValueError):
    """Input exceeds the exact-baseline guard threshold."""


def guard_exact_baseline(
    df: DataFrame, operator: str, scale_path: str
) -> DataFrame:
    """Raise if ``df`` is too large for a quadratic baseline.

    The count is a control-plane scalar (one cheap action on an
    already-pruned input), paid once per baseline invocation — the whole
    point is that these operators only ever run on validation-sized
    inputs."""
    limit = int(df.sparkSession.conf.get(MAX_ROWS_CONF, str(DEFAULT_MAX_ROWS)))
    n = df.count()
    if n > limit:
        raise ExactBaselineTooLarge(
            f"{operator} is an exact O(n^2)-class correctness baseline; its "
            f"input has {n:,} rows, over the {limit:,}-row guard. Use "
            f"{scale_path} for full-corpus runs, or raise {MAX_ROWS_CONF} "
            f"explicitly for a deliberate oversized validation."
        )
    return df
