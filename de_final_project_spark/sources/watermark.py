"""Watermark store — the incremental change-tracking state.

The reference keeps ``update_tracking.json`` in S3 mapping each source
table to the max ``last_updated`` it has ingested, compares as ISO strings,
and advances it after each cycle (src/ingestion_lambda.py:121,177-232).
Here the same contract is a tiny JSON document handled driver-side; the
data-plane filter it feeds is a real timestamp comparison that the JDBC /
Parquet source pushes down.
"""

from __future__ import annotations

import json
import os

# The reference's bootstrap sentinel ("0000-00-00 00:00:00.0",
# src/ingestion_lambda.py:121) only works because it compares strings; with
# real timestamps the natural bottom element is the epoch floor.
EPOCH_FLOOR = "1970-01-01 00:00:00.000000"


class WatermarkStore:
    """Per-table high-watermark persistence (K6 / P3-P4 equivalents)."""

    def __init__(self, path: str):
        self.path = path
        self._state: dict[str, str] = {}
        if os.path.exists(path):
            with open(path) as f:
                self._state = json.load(f)

    def get(self, table: str) -> str:
        return self._state.get(table, EPOCH_FLOOR)

    def advance(self, table: str, new_max: str) -> bool:
        """Advance the watermark if ``new_max`` is later; return whether
        anything changed (the reference's update-gating predicate P4,
        src/ingestion_lambda.py:218-225)."""
        if new_max > self.get(table):
            self._state[table] = new_max
            return True
        return False

    def persist(self) -> None:
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._state, f, indent=2, sort_keys=True)
        os.replace(tmp, self.path)
