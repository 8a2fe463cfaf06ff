"""Property-based test for data skipping: for ARBITRARY conjunctive
predicates, a file containing any satisfying row must never be pruned
(the no-false-negative contract that makes skipping safe to trust).
The pruning decision is pure log metadata, so each generated example
costs no Spark job: the table is built once, its per-file rows are
collected once, and every drawn predicate is checked against both the
pruner's verdict and a reference Python evaluation of the same
three-valued comparison semantics (NULL never satisfies)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from de_final_project_spark.operators.txlog import VersionedTable

_STATE: dict = {}


@pytest.fixture(scope="module")
def skipping_table(spark, tmp_path_factory):
    """One partitioned, stats-indexed table + its per-file row map."""
    if _STATE:
        return _STATE
    path = str(tmp_path_factory.mktemp("prop") / "t")
    df = spark.range(600).selectExpr(
        "id AS k",
        "CAST(id % 3 AS INT) AS pb",
        "concat('s', CAST((id * 7) % 10 AS STRING)) AS s",
        # nulls exercise the NULL-never-satisfies discipline
        "CASE WHEN id % 11 = 0 THEN CAST(NULL AS DOUBLE) "
        "ELSE CAST(id AS DOUBLE) * 0.5 END AS v",
    )
    t = VersionedTable(path, partition_col="pb", stats_cols=["k", "s", "v"])
    t.overwrite(df.repartitionByRange(4, "k"))
    live = t._read_entry(t.latest_version())["live"]
    # one pass: which rows live in which file of which partition
    rows = (
        t.read(spark)
        .withColumn("_f", F.input_file_name())
        .collect()
    )
    by_file: dict[tuple[str, str], list] = {}
    for r in rows:
        for p, e in live.items():
            for fe in e["files"]:
                if r["_f"].endswith("/" + fe["f"].split("/")[-1]) and (
                    f"pb={p}" in r["_f"]
                ):
                    by_file.setdefault((p, fe["f"]), []).append(r)
    _STATE.update({"table": t, "live": live, "by_file": by_file})
    return _STATE


_COLS = {
    "k": st.integers(min_value=-10, max_value=650),
    "pb": st.integers(min_value=-1, max_value=4),
    "s": st.sampled_from(
        ["s0", "s3", "s9", "a", "zz", "s", "x AND k > 500"]
    ),
    "v": st.floats(
        min_value=-5.0, max_value=320.0, allow_nan=False, width=32
    ),
}

_OPS = ["<", "<=", ">", ">=", "="]


def _sql_lit(v) -> str:
    if isinstance(v, str):
        return "'" + v + "'"
    return repr(v)


@st.composite
def conjunct(draw):
    col = draw(st.sampled_from(list(_COLS)))
    kind = draw(st.sampled_from(["cmp", "cmp", "cmp", "in", "between"]))
    if kind == "in":
        vals = draw(st.lists(_COLS[col], min_size=1, max_size=3))
        return (
            col,
            "in",
            vals,
            f"{col} IN ({', '.join(_sql_lit(v) for v in vals)})",
        )
    if kind == "between":
        lo, hi = draw(_COLS[col]), draw(_COLS[col])
        return (
            col,
            "between",
            (lo, hi),
            f"{col} BETWEEN {_sql_lit(lo)} AND {_sql_lit(hi)}",
        )
    op = draw(st.sampled_from(_OPS))
    lit = draw(_COLS[col])
    return (col, op, lit, f"{col} {op} {_sql_lit(lit)}")


def _satisfies(row, col, op, lit) -> bool:
    v = row[col]
    if v is None:
        return False
    if op == "in":
        return any(_satisfies(row, col, "=", x) for x in lit)
    if op == "between":
        return _satisfies(row, col, ">=", lit[0]) and _satisfies(
            row, col, "<=", lit[1]
        )
    if isinstance(v, str) != isinstance(lit, str):
        # SQL would cast; our generator only crosses int/float, where
        # Python comparison semantics match SQL's numeric promotion
        if isinstance(v, str) or isinstance(lit, str):
            return False
    return {
        "<": v < lit,
        "<=": v <= lit,
        ">": v > lit,
        ">=": v >= lit,
        "=": v == lit,
    }[op]


@given(conjs=st.lists(conjunct(), min_size=1, max_size=3))
@settings(
    max_examples=120,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_pruning_never_drops_a_matching_file(skipping_table, conjs):
    t = skipping_table["table"]
    where = " AND ".join(c[3] for c in conjs)
    pruned, _ = t._prune_live(skipping_table["live"], where)
    surviving = {
        (p, f)
        for p, e in pruned.items()
        for f in e.get("only_files", [fe["f"] for fe in e.get("files", [])])
    }
    for (p, fname), rows in skipping_table["by_file"].items():
        has_match = any(
            all(_satisfies(r, c, op, lit) for c, op, lit, _ in conjs)
            for r in rows
        )
        if has_match:
            assert (p, fname) in surviving, (
                f"file {p}/{fname} holds a matching row but was pruned "
                f"for predicate: {where}"
            )
