"""Multi-table ATOMIC transactions via a catalog log.

A single ``VersionedTable`` commit is atomic, but a pipeline invariant
usually spans tables — "the fact table and its rollup advance together",
"documents and their search index agree". Two independent table commits
leave a window where readers see one side moved and the other not. The
industry answer (Iceberg REST-catalog multi-table commits, Nessie,
Delta's catalog-owned commits) is a CATALOG LOG: tables commit
independently to their own logs (keeping table-level rebase/conflict
semantics intact), and a tiny catalog entry atomically flips the set of
*pinned* table versions readers resolve through. Visibility of the
GROUP is then one put-if-absent — the same primitive the table log
already requires of its store, so every backend that can host a table
can host the catalog.

Semantics and their limits, stated plainly:

- Readers resolving through :meth:`TransactionalCatalog.read` observe
  version SETS that some catalog commit declared consistent — never a
  torn mix. Snapshot-across-tables = pick one catalog version and read
  every table at its pins.
- Readers going straight to a table see its own log's latest state,
  including catalog-uncommitted versions. That is the documented
  trade of catalog-level atomicity (same as Iceberg: table metadata
  exists before the catalog swap) — the catalog is the consistency
  boundary, not a lock on the table.
- A crash between table commits and the catalog flip leaves landed
  table versions invisible THROUGH THE CATALOG forever (the next txn
  re-pins whatever it produces); their data ages out with vacuum. No
  undo is needed because nothing was published.
- Concurrency: the catalog flip is optimistic — it retries while
  unrelated tables' pins move, and raises ``ConcurrentWriteError`` when
  another txn moved a pin THIS txn also changes (write-write conflict
  at catalog granularity; the table logs below have already serialized
  the row-level story).
- The catalog log is metadata-plane-tiny by design (one small JSON per
  multi-table txn, listing only pins), so head discovery by listing is
  fine here — unlike the table log, whose entries scale with churn and
  earn the checkpoint/pointer machinery.

Reference parity: the reference pipeline updates its warehouse tables
one ``to_sql`` at a time with no cross-table boundary at all
(src/warehousing_lambda.py) — a reader mid-run sees facts without their
dimensions. This module is the Spark-first repair of that gap.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession

from de_final_project_spark.operators.txlog import (
    ConcurrentWriteError,
    LocalFSLogStore,
    LogStore,
    VersionedTable,
)


class TransactionalCatalog:
    def __init__(self, root: str, log_store: LogStore | None = None):
        self.root = root
        self._store = log_store or LocalFSLogStore(
            os.path.join(root, "_catalog_log")
        )
        self._tables: dict[str, VersionedTable] = {}

    # ------------------------------------------------------ registry
    def register(self, name: str, table: VersionedTable) -> None:
        if name in self._tables:
            raise ValueError(f"table {name!r} already registered")
        self._tables[name] = table

    def table(self, name: str) -> VersionedTable:
        return self._tables[name]

    # ------------------------------------------------------ log plane
    @staticmethod
    def _entry_name(version: int) -> str:
        return f"catalog.{version:08d}.json"

    def latest_version(self) -> int | None:
        names = [
            n for n in self._store.list_names() if n.startswith("catalog.")
        ]
        if not names:
            return None
        return max(int(n.split(".")[1]) for n in names)

    def _read_entry(self, version: int) -> dict:
        return json.loads(self._store.read(self._entry_name(version)))

    def pins(self, version: int | None = None) -> dict[str, int]:
        """The pinned table versions at a catalog version (default
        head). Empty before the first commit."""
        v = version if version is not None else self.latest_version()
        if v is None:
            return {}
        return dict(self._read_entry(v)["pins"])

    # ------------------------------------------------------ txn plane
    def commit(
        self, updates: dict[str, int], base_version: int | None
    ) -> int:
        """Atomically flip the named tables' pins to the given (already
        landed) table versions. ``base_version`` is the catalog version
        the caller's writes were based on — the conflict check compares
        against it: if a concurrent catalog commit moved a pin this txn
        also changes, the txn must re-read and re-derive (its writes
        may be stale), so it conflicts. Pins of untouched tables are
        carried from the CURRENT head (last-writer-wins composition of
        disjoint txns)."""
        for name in updates:
            if name not in self._tables:
                raise ValueError(f"unregistered table {name!r}")
        base_pins = (
            self.pins(base_version) if base_version is not None else {}
        )
        while True:
            head = self.latest_version()
            head_pins = self.pins(head) if head is not None else {}
            for name, v in updates.items():
                if head_pins.get(name) != base_pins.get(name):
                    raise ConcurrentWriteError(
                        f"catalog pin for {name!r} moved "
                        f"{base_pins.get(name)} -> {head_pins.get(name)} "
                        f"since base catalog v{base_version}; re-read "
                        "and re-derive before committing"
                    )
            new_v = (head or 0) + 1
            entry = {
                "version": new_v,
                "ts": time.time(),
                "pins": {**head_pins, **updates},
                "updated": sorted(updates),
            }
            if self._store.put_if_absent(
                self._entry_name(new_v), json.dumps(entry).encode()
            ):
                return new_v
            # lost the version race: loop — the conflict check re-runs
            # against the new head, so only DISJOINT txns slide through

    # ------------------------------------------------------ read plane
    def read(
        self,
        spark: SparkSession,
        name: str,
        catalog_version: int | None = None,
    ) -> DataFrame:
        """Read a table AT ITS PINNED VERSION — the consistency
        boundary. Raises if the table has never been pinned (no catalog
        commit covered it yet). Cross-table snapshot = pass the same
        ``catalog_version`` to every read."""
        pins = self.pins(catalog_version)
        if name not in pins:
            raise FileNotFoundError(
                f"table {name!r} has no catalog pin"
                + (
                    f" at catalog v{catalog_version}"
                    if catalog_version is not None
                    else ""
                )
            )
        return self._tables[name].read(spark, version=pins[name])


class MultiTableTransaction:
    """One write set across registered tables, published atomically.

    Usage::

        txn = MultiTableTransaction(catalog)
        txn.run("events",  lambda t: t.append(batch))
        txn.run("hourly",  lambda t: t.overwrite(rollup))
        txn.commit()   # one catalog flip; before it, catalog readers
                       # still see the previous consistent pair

    ``run`` executes the table write IMMEDIATELY (table-level conflict
    checks apply right there) and records the produced version for the
    flip. After ``commit`` the instance is spent."""

    def __init__(self, catalog: TransactionalCatalog):
        self.catalog = catalog
        self.base = catalog.latest_version()
        self._updates: dict[str, int] = {}
        self._done = False

    def run(self, name: str, write_fn) -> int:
        if self._done:
            raise RuntimeError("transaction already committed")
        v = write_fn(self.catalog.table(name))
        if not isinstance(v, int):
            raise TypeError(
                f"write_fn for {name!r} must return the committed table "
                f"version (got {type(v).__name__}) — every VersionedTable "
                "write method returns it"
            )
        self._updates[name] = v
        return v

    def commit(self) -> int:
        if self._done:
            raise RuntimeError("transaction already committed")
        if not self._updates:
            raise ValueError("empty transaction")
        v = self.catalog.commit(self._updates, self.base)
        self._done = True
        return v


# ---------------------------------------------------------------- query


def catalog_consistent_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable multi-table atomicity: an events table and its
    hourly rollup advance ONLY together. Txn 1 publishes history + its
    rollup; txn 2 appends a batch and rewrites the rollup — and between
    the table writes landing and the catalog flip, catalog readers still
    see the OLD pair, consistent (asserted inline: rollup row totals
    equal the raw count on BOTH sides of the flip, never a torn mix).
    Returns the final rollup read through the catalog; the oracle is the
    plain hourly aggregate over all events — a torn publish, lost batch,
    or double-apply flips the hash."""
    import pyspark.sql.functions as F

    from de_final_project_spark.session import scratch_dir
    from de_final_project_spark.sources.readers import read_testdata

    def rollup(df: DataFrame) -> DataFrame:
        return (
            df.groupBy(
                F.date_trunc("hour", "ts").alias("hour"), "event_type"
            )
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.col("value").cast("decimal(12,2)")).alias("_sv"),
            )
            .select(
                "hour",
                "event_type",
                "n_events",
                F.col("_sv").cast("double").alias("sum_value"),
            )
        )

    ev = read_testdata(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts", "value"
    )
    lo, hi = ev.agg(F.min("event_id"), F.max("event_id")).first()
    cut = (lo + hi) // 2
    history = ev.where(F.col("event_id") <= cut)
    batch = ev.where(F.col("event_id") > cut)

    root = scratch_dir("catalog_txn")
    cat = TransactionalCatalog(root)
    cat.register("events", VersionedTable(os.path.join(root, "events")))
    cat.register("hourly", VersionedTable(os.path.join(root, "hourly")))

    t1 = MultiTableTransaction(cat)
    t1.run("events", lambda t: t.overwrite(history))
    t1.run("hourly", lambda t: t.overwrite(rollup(history)))
    t1.commit()
    n_hist = cat.read(spark, "events").count()

    t2 = MultiTableTransaction(cat)
    t2.run("events", lambda t: t.append(batch))
    # both table writes have LANDED in their own logs here — but the
    # catalog still serves the txn-1 pair, and it is consistent
    t2.run(
        "hourly",
        lambda t: t.overwrite(rollup(cat.table("events").read(spark))),
    )
    mid_raw = cat.read(spark, "events").count()
    mid_agg = (
        cat.read(spark, "hourly").agg(F.sum("n_events")).first()[0]
    )
    assert mid_raw == mid_agg == n_hist, (mid_raw, mid_agg, n_hist)
    t2.commit()
    fin_raw = cat.read(spark, "events").count()
    fin_agg = (
        cat.read(spark, "hourly").agg(F.sum("n_events")).first()[0]
    )
    assert fin_raw == fin_agg == n_hist + batch.count()
    return cat.read(spark, "hourly")


CATALOG_CONSISTENT_ROLLUP_SQL = """
SELECT date_trunc('hour', ts) AS hour,
       event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
"""
