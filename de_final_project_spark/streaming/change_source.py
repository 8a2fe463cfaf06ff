"""``readStream``-native change-feed source over a VersionedTable
commit log (VERDICT r8 item 2): a Python streaming DataSource
(pyspark.sql.datasource, Spark 4's public custom-source API) whose
offsets are LOG VERSIONS, so triggers, checkpointing, restart-resume
and backpressure come from Structured Streaming itself instead of the
hand-rolled ChangeFeedConsumer replay loop (operators/txlog.py —
which remains the general-purpose batch consumer).

Design — change rows WITHOUT write-time change files or snapshot
diffs: every supported commit kind already carries exact row-level
change evidence in the log + data files, so the per-version CDC cost
is O(changed rows), never O(table):

- ``append`` (and the initial ``overwrite``/``append`` at v1): the
  commit's new files ARE the inserted rows.
- ``delete_rows`` (deletion-vector DELETE): the positional sidecar
  names (file, row_index) pairs; reading those positions back out of
  the immutable data files yields the deleted rows' old images.
- ``update_rows`` (deletion-vector UPDATE): sidecar positions are the
  ``update_preimage`` rows, the appended pointer's files the
  ``update_postimage`` rows — the Delta CDF shape.
- ``compact`` / ``compact_parts``: content-preserving rewrites emit
  zero change rows.

Copy-on-write rewrites (merge/delete/update/overwrite@v>1/restore)
carry no row-level evidence — computing their delta needs a snapshot
diff, which is ChangeFeedConsumer/read_changes territory; this source
fails FAST and loudly on such a version rather than silently skipping
it. A pipeline that wants readStream subscription therefore writes its
DML through the MOR forms — exactly the write shape a 100 TB table
wants anyway.

Executor-side reads are plain pyarrow parquet IO over task specs the
driver assembled from the log — no SparkSession, no LogStore handle
on executors — and rows flow back as Arrow record batches (zero
row-at-a-time Python). ``maxVersionsPerTrigger`` rate-limits offset
advance per trigger.

Reference analog: none (the reference is batch-rebuild only,
src/process_lambda.py:449-474); this is the subscription surface of
the transaction log."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

_CHANGE_TYPE = "_change_type"
_COMMIT_VERSION = "_commit_version"

_SUPPORTED = (
    "append", "delete_rows", "update_rows", "compact", "compact_parts",
)


def _arrow_to_ddl(t: pa.DataType) -> str:
    if pa.types.is_int64(t):
        return "bigint"
    if pa.types.is_int32(t):
        return "int"
    if pa.types.is_int16(t):
        return "smallint"
    if pa.types.is_int8(t):
        return "tinyint"
    if pa.types.is_float64(t):
        return "double"
    if pa.types.is_float32(t):
        return "float"
    if pa.types.is_boolean(t):
        return "boolean"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    raise ValueError(f"unsupported arrow type for change feed: {t}")


def _normalize(t: pa.DataType) -> pa.DataType:
    # Spark hands timestamps to Arrow as microseconds; parquet files may
    # carry ns (NANOS/INT96 round-trips) — normalize so batches conform.
    if pa.types.is_timestamp(t):
        return pa.timestamp("us")
    return t


def _table_arrow_fields(table) -> list[tuple[str, pa.DataType]]:
    """Data-column arrow schema from any live file of the head entry
    (one footer read — the table's files share one logical schema; an
    additively-evolved older file just null-fills at conform time)."""
    from de_final_project_spark.operators.txlog import _ptrs

    head = table.latest_version()
    if head is None:
        raise FileNotFoundError(f"no commits at {table.path}")
    entry = table._read_entry(head)
    for e in entry["live"].values():
        for ptr in _ptrs(e):
            d = os.path.join(
                table.path, ptr["commit_dir"], ptr.get("part_dir", "")
            )
            if not os.path.isdir(d):
                continue
            for n in sorted(os.listdir(d)):
                if n.endswith(".parquet"):
                    sch = pq.read_schema(os.path.join(d, n))
                    return [
                        (f.name, _normalize(f.type)) for f in sch
                    ]
    raise FileNotFoundError(f"no live data files at {table.path}")


def _head_colmap(table) -> dict | None:
    """The head entry's column mapping ({logical -> physical}) or None
    when the table never enabled mapping. The stream resolves names
    under the mapping FROZEN at reader start (files keep physical
    names, so older versions read correctly through the current map);
    a rename/drop committed mid-stream raises in partitions() — the
    Delta rule: restart the stream to adopt a new schema."""
    head = table.latest_version()
    if head is None:
        return None
    return table._read_entry(head).get("colmap")


def _discover_partition_col(table) -> str | None:
    """The table handle here is reconstructed from just a path (the
    readStream option), so the partition column is discovered
    Hive-style from the live pointers' ``col=value`` dir names — the
    same convention the engine's partition discovery reader (S4) uses."""
    from de_final_project_spark.operators.txlog import _ptrs

    head = table.latest_version()
    if head is None:
        return None
    for e in table._read_entry(head)["live"].values():
        for ptr in _ptrs(e):
            pd = ptr.get("part_dir", "")
            if "=" in pd:
                return pd.split("=", 1)[0]
    return None


def _pointer_files(table, ptr: dict) -> list[str]:
    base = os.path.join(table.path, ptr["commit_dir"])
    if ptr.get("files") is not None:
        return [os.path.join(base, fe["f"]) for fe in ptr["files"]]
    d = os.path.join(base, ptr.get("part_dir", ""))
    return [
        os.path.join(d, n)
        for n in sorted(os.listdir(d))
        if n.endswith(".parquet")
    ]


def _part_value_from_path(path: str, part_col: str) -> str | None:
    for seg in path.split(os.sep):
        if seg.startswith(f"{part_col}="):
            return seg.split("=", 1)[1]
    return None


def version_tasks(table, entry: dict) -> list[dict]:
    """Executor-ready task specs for one committed version: everything
    a partition reader needs (absolute file paths, sidecar dirs, tags,
    partition values) with zero further log access. Raises on a commit
    kind that carries no row-level change evidence."""
    v = entry["version"]
    op = entry.get("op")
    from de_final_project_spark.operators.txlog import _ptrs

    if op in ("compact", "compact_parts"):
        return []  # content-preserving rewrite: no change rows
    if op in ("rename_column", "drop_column"):
        # metadata-only schema evolution: zero row-level changes (the
        # mid-stream schema-change guard lives in partitions(), which
        # sees the version BEFORE tasks are requested)
        return []
    if v == 1 and op in ("overwrite", "append"):
        tasks = []
        for p, e in entry["live"].items():
            for ptr in _ptrs(e):
                tasks.append(
                    {
                        "kind": "insert",
                        "files": _pointer_files(table, ptr),
                        "pval": p,
                    }
                )
        return tasks
    if op == "append":
        tasks = []
        for p, e in entry["live"].items():
            for ptr in _ptrs(e):
                if ptr.get("v") == v:
                    tasks.append(
                        {
                            "kind": "insert",
                            "files": _pointer_files(table, ptr),
                            "pval": p,
                        }
                    )
        return tasks
    if op in ("delete_rows", "update_rows"):
        side = [
            t
            for t in entry.get("dv", [])
            if t.get("v") == v and "cols" not in t
        ]
        assert len(side) == 1, f"v{v}: expected one positional sidecar"
        tasks = [
            {
                "kind": (
                    "delete" if op == "delete_rows" else "update_preimage"
                ),
                "sidecar": os.path.join(table.path, side[0]["commit_dir"]),
                "root": table.path,
            }
        ]
        if op == "update_rows":
            for p, e in entry["live"].items():
                for ptr in _ptrs(e):
                    if ptr.get("v") == v:
                        tasks.append(
                            {
                                "kind": "update_postimage",
                                "files": _pointer_files(table, ptr),
                                "pval": p,
                            }
                        )
        return tasks
    raise ValueError(
        f"version {v} is a '{op}' commit, which records no row-level "
        f"change evidence; the readStream change feed supports "
        f"{_SUPPORTED} (+ the initial overwrite). Write DML through the "
        "merge-on-read forms, or consume via ChangeFeedConsumer/"
        "read_changes (snapshot-diff CDC)."
    )


class _VersionPartition(InputPartition):
    def __init__(self, version, tasks, fields, part_col, part_col_out=None):
        self.version = version
        self.tasks = tasks
        # [(physical file name, logical output name, arrow type)]
        self.fields = fields
        self.part_col = part_col  # physical (parses col=value dirs)
        self.part_col_out = part_col_out or part_col  # logical name


def _conform(
    tbl: pa.Table,
    fields: list[tuple[str, str, pa.DataType]],
    part_col_out: str | None,
    pval: str | None,
    tag: str,
    version: int,
) -> pa.Table:
    """Project an arrow table onto the declared stream schema: data
    columns selected by their PHYSICAL file name and emitted under
    their LOGICAL name (identical unless column mapping renamed them),
    null-filled if an old file lacks one, cast to the normalized type;
    then the partition value as a string column and the CDC metadata
    columns."""
    n = tbl.num_rows
    cols, names = [], []
    for phys, logical, typ in fields:
        if phys in tbl.column_names:
            cols.append(tbl.column(phys).cast(typ))
        else:
            cols.append(pa.nulls(n, type=typ))
        names.append(logical)
    if part_col_out is not None:
        cols.append(pa.array([pval] * n, type=pa.string()))
        names.append(part_col_out)
    cols.append(pa.array([tag] * n, type=pa.string()))
    names.append(_CHANGE_TYPE)
    cols.append(pa.array([version] * n, type=pa.int64()))
    names.append(_COMMIT_VERSION)
    return pa.table(dict(zip(names, cols)))


class ChangeFeedStreamReader(DataSourceStreamReader):
    """Offsets are {"version": N} = 'consumed through commit N'."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("option 'path' (the table root) is required")
        self.starting = int(options.get("startingversion", 0))
        mvt = options.get("maxversionspertrigger")
        self.max_per_trigger = int(mvt) if mvt else None
        self._last_end: int | None = None
        from de_final_project_spark.operators.txlog import VersionedTable

        self._table = VersionedTable(self.path)
        # name resolution frozen at stream start (see _head_colmap)
        self._init_head = self._table.latest_version() or 0
        self._colmap = _head_colmap(self._table)
        inv = (
            {p: l for l, p in self._colmap.items()}
            if self._colmap
            else None
        )
        raw = _table_arrow_fields(self._table)
        self._fields = (
            [(n, inv[n], t) for n, t in raw if n in inv]
            if inv is not None
            else [(n, n, t) for n, t in raw]
        )
        self._part_col = _discover_partition_col(self._table)
        self._part_col_out = (
            inv.get(self._part_col, self._part_col)
            if inv is not None and self._part_col
            else self._part_col
        )

    def initialOffset(self):
        return {"version": self.starting}

    def latestOffset(self):
        head = self._table.latest_version() or 0
        if self._last_end is None:
            # First trigger of this reader instance: report everything
            # pending. Capping here would under-shoot the checkpointed
            # offset after a restart (the reader cannot see Spark's
            # checkpoint until partitions() runs) and would starve an
            # availableNow run, whose end target is captured at start.
            end = head
        elif self.max_per_trigger:
            end = max(
                min(head, self._last_end + self.max_per_trigger),
                self._last_end,
            )
        else:
            end = max(head, self._last_end)
        self._last_end = end
        return {"version": end}

    def partitions(self, start, end):
        lo, hi = start["version"], end["version"]
        # after a restart the internal cursor resyncs to the
        # checkpointed offset Spark hands us
        self._last_end = max(self._last_end or 0, hi)
        out = []
        for v in range(lo + 1, hi + 1):
            entry = self._table._read_entry(v)
            if v > self._init_head and entry.get("colmap") != self._colmap:
                raise ValueError(
                    f"column mapping changed at v{v} mid-stream "
                    "(RENAME/DROP COLUMN); the stream's output schema "
                    "was resolved at start — restart the stream to "
                    "adopt the new column names"
                )
            tasks = version_tasks(self._table, entry)
            if tasks:
                out.append(
                    _VersionPartition(
                        v, tasks, self._fields, self._part_col,
                        self._part_col_out,
                    )
                )
        if not out:
            # Structured Streaming requires >= 1 partition per batch;
            # an empty-change window yields an empty reader
            out.append(
                _VersionPartition(
                    hi, [], self._fields, self._part_col,
                    self._part_col_out,
                )
            )
        return out

    def read(self, partition):
        fields = partition.fields
        part_col = partition.part_col  # physical: parses col=value dirs
        part_out = partition.part_col_out  # logical output name
        v = partition.version
        for task in partition.tasks:
            if task["kind"] in ("insert", "update_postimage"):
                for f in task["files"]:
                    tbl = pq.read_table(f)
                    if tbl.num_rows:
                        yield from _conform(
                            tbl, fields, part_out, task["pval"],
                            task["kind"], v,
                        ).to_batches()
            else:  # delete / update_preimage: positions out of files
                side = pq.read_table(task["sidecar"])
                by_file: dict[str, list[int]] = {}
                for frel, pos in zip(
                    side.column("__file").to_pylist(),
                    side.column("__pos").to_pylist(),
                ):
                    by_file.setdefault(frel, []).append(pos)
                for frel, positions in sorted(by_file.items()):
                    fabs = os.path.join(task["root"], frel)
                    rows = pq.read_table(fabs).take(sorted(positions))
                    pval = (
                        _part_value_from_path(frel, part_col)
                        if part_col
                        else None
                    )
                    if rows.num_rows:
                        yield from _conform(
                            rows, fields, part_out, pval,
                            task["kind"], v,
                        ).to_batches()

    def commit(self, end):
        pass  # offset durability is the streaming checkpoint's job


class ChangeFeedDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "versioned_change_feed"

    def schema(self) -> str:
        from de_final_project_spark.operators.txlog import VersionedTable

        table = VersionedTable(self.options["path"])
        cmap = _head_colmap(table)
        inv = {p: l for l, p in cmap.items()} if cmap else None
        fields = _table_arrow_fields(table)
        if inv is not None:
            # logical names under the head's column mapping; unmapped
            # physical columns are dropped-column bytes — omitted
            fields = [(inv[n], t) for n, t in fields if n in inv]
        parts = [f"`{n}` {_arrow_to_ddl(t)}" for n, t in fields]
        part_col = _discover_partition_col(table)
        if part_col and inv is not None:
            part_col = inv.get(part_col, part_col)
        if part_col:
            # staged files never contain the partition column (it lives
            # in dir names); surfaced as a string for the consumer to
            # cast — documented, same trade as Hive-style discovery
            parts.append(f"`{part_col}` string")
        parts.append(f"`{_CHANGE_TYPE}` string")
        parts.append(f"`{_COMMIT_VERSION}` bigint")
        return ", ".join(parts)

    def streamReader(self, schema):
        return ChangeFeedStreamReader(
            {k.lower(): v for k, v in self.options.items()}
        )


def read_change_feed(
    spark: SparkSession,
    path: str,
    starting_version: int = 0,
    max_versions_per_trigger: int | None = None,
) -> DataFrame:
    """``spark.readStream`` over a VersionedTable's commit log. Each
    micro-batch carries whole committed versions (never a partial one),
    tagged ``_change_type`` (insert / delete / update_preimage /
    update_postimage) and ``_commit_version`` for in-batch ordering and
    txn-stamp idempotence downstream."""
    spark.dataSource.register(ChangeFeedDataSource)
    r = (
        spark.readStream.format("versioned_change_feed")
        .option("path", path)
        .option("startingVersion", str(starting_version))
    )
    if max_versions_per_trigger is not None:
        r = r.option(
            "maxVersionsPerTrigger", str(max_versions_per_trigger)
        )
    return r.load()


# ------------------------------------------------------------ driver query

def streamed_gold_from_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable readStream CDC pipeline: a bronze events table
    takes four commits — initial load, blind APPEND of the second half,
    deletion-vector UPDATE (event_id % 7: patched, value doubled), and
    deletion-vector DELETE (event_id % 11) — then a GENUINE Structured
    Streaming query (availableNow trigger, offsets checkpointed by
    Spark; versions ordered inside the batch — steady-state per-trigger
    rate limiting is pinned by test under a processingTime trigger)
    subscribes via the versioned_change_feed source and
    maintains a gold table through foreachBatch: postimages/inserts
    MERGE with txn=(consumer, version) stamps, deletes apply as key
    tombstones. The gold read must equal full-rebuild semantics — the
    oracle restates the final state over raw events with the same
    integer-modulus predicates (value*2 is bit-exact)."""
    from de_final_project_spark.operators.txlog import VersionedTable
    from de_final_project_spark.session import scratch_dir
    from de_final_project_spark.sources.readers import read_testdata

    ev = read_testdata(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.col("ts").cast("timestamp").alias("ts"),
        "value",
    ).withColumn("pbucket", (F.col("user_id") % 4).cast("int"))
    lo, hi = ev.agg(F.min("event_id"), F.max("event_id")).first()
    cut = (lo + hi) // 2

    root = scratch_dir("stream_gold_feed")
    bronze = VersionedTable(
        os.path.join(root, "bronze"), partition_col="pbucket"
    )
    bronze.overwrite(ev.where(F.col("event_id") <= cut))
    bronze.append(ev.where(F.col("event_id") > cut))
    bronze.update_where(
        spark,
        "event_id % 7 = 0",
        {"event_type": "'patched'", "value": F.col("value") * 2},
        mode="mor",
    )
    bronze.delete_where(spark, "event_id % 11 = 0", mode="mor")

    gold_dir = os.path.join(root, "gold")

    def apply_batch(batch_df, batch_id):
        # Persist the delivered feed ONCE: the change-feed source reads
        # its parquet in Python workers, and every per-version filter /
        # emptiness probe / merge below would otherwise re-run that
        # Python read path (4 versions x 2 probes x merge sources).
        batch_df = batch_df.persist()
        try:
            if batch_df.isEmpty():
                return
            s = batch_df.sparkSession
            gold = VersionedTable(gold_dir, partition_col="pbucket")
            versions = sorted(
                r[0]
                for r in batch_df.select(_COMMIT_VERSION).distinct().collect()
            )
            for v in versions:
                sub = batch_df.where(F.col(_COMMIT_VERSION) == v)
                ups = (
                    sub.where(
                        F.col(_CHANGE_TYPE).isin("insert", "update_postimage")
                    )
                    .drop(_CHANGE_TYPE, _COMMIT_VERSION, "pbucket")
                    .withColumn(
                        "pbucket", (F.col("user_id") % 4).cast("int")
                    )
                )
                if ups.limit(1).count():
                    # Control-plane insert-only proof per version: the
                    # bronze log's op for v (a metadata read) says
                    # whether these rows are pure inserts — v1's
                    # initial load and append commits carry all-new
                    # event_ids (unique-keyed producer contract), so
                    # the gold MERGE's rewrite would be the identity on
                    # stored rows; land them as a pointer-list append
                    # instead. Update postimages keep the real MERGE.
                    if v == 1 or bronze.window_ops(v - 1, v) == ["append"]:
                        gold.append(ups, txn=("gold", v))
                    else:
                        gold.merge(s, ups, ["event_id"], txn=("gold", v))
                dels = (
                    sub.where(F.col(_CHANGE_TYPE) == "delete")
                    .select("event_id")
                    .distinct()
                )
                if dels.limit(1).count():
                    gold.delete_keys(s, dels)
        finally:
            batch_df.unpersist()

    q = (
        read_change_feed(spark, bronze.path)
        .writeStream.foreachBatch(apply_batch)
        .option(
            "checkpointLocation", os.path.join(root, "ckpt")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    gold = VersionedTable(gold_dir, partition_col="pbucket")
    return gold.read(spark).withColumn(
        "pbucket", F.col("pbucket").cast("long")
    )


STREAMED_GOLD_FROM_FEED_SQL = """
SELECT event_id, user_id,
       CASE WHEN event_id % 7 = 0 THEN 'patched' ELSE event_type END
           AS event_type,
       ts,
       CASE WHEN event_id % 7 = 0 THEN value * 2 ELSE value END AS value,
       user_id % 4 AS pbucket
FROM events
WHERE event_id % 11 <> 0
"""
