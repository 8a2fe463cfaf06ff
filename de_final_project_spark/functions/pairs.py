"""Blocked pair-scoring via Arrow-batched NumPy — the within-group
quadratic stage of the SemDeDup-style dedup tiers, moved off the
interpreted expression evaluator.

Why this exists (OPTIMIZATION r12): the within-cluster pair stage used
to be a self equi-join on the block key with an interpreted
higher-order-function dot product per pair. Two measured problems at
sf0.1:

- the fold-based HOF evaluates ~20 µs/pair (no whole-stage codegen for
  lambda expressions), so ~1M pairs cost ~20 s of CPU;
- the join's shuffle INPUT is tiny (thousands of vectors), so AQE's
  byte-based partition coalescing collapses the join to ONE task and
  the pair compute runs serially — byte-sized inputs, compute-heavy
  outputs are exactly the shape AQE mis-sizes.

Here each block's vectors cross the Arrow boundary once (rows, not
pairs), and the pair dots run as vectorized NumPy inside the worker.
An unrolled 64-term codegen expression was also measured and REJECTED
(3× slower than the HOF — the 192-node arithmetic tree defeats
codegen's common-subexpression handling).

EXACTNESS CONTRACT (the oracle compares stringified doubles, so this
is load-bearing): the dot product is accumulated dimension-by-
dimension in array order — ``acc += a[d]*b[d]`` for d = 0..dim-1
starting from +0.0 — which performs the IDENTICAL sequence of IEEE
multiply/add roundings as the engine's previous
``aggregate(zip_with(a, b, *), 0.0, +)`` fold and as DuckDB's
``list_dot_product``. Norms accumulate ``x*x`` the same way before one
``sqrt``; cosine divides by ``(norm_a * norm_b)`` in that association.
NumPy reductions like ``np.dot``/``.sum()`` are deliberately NOT used:
their pairwise summation reorders the adds. Rounding/thresholding
stays in Spark so ``F.round``'s HALF_UP is computed by one engine only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _fold_dots(A, B, ia, ib, dim: int):
    """Exact left-to-right fold of per-pair dot products: pairs
    (ia[k], ib[k]) over row matrices A, B (each n×dim float64)."""
    import numpy as np

    acc = np.zeros(len(ia), dtype="float64")
    Aa = A[ia]
    Bb = B[ib]
    for d in range(dim):
        acc += Aa[:, d] * Bb[:, d]
    return acc


# Column-chunk budget for the Gram accumulation below: chunks are sized
# so the (m_a × chunk) accumulator stays ~128 MB regardless of block
# shape.
_GRAM_BUDGET = 1 << 24


def _gram_pairs(A, B, ida, idb, dim: int, na=None, nb=None, both=False):
    """All (ida[i] < idb[j]) pairs scored by the exact d-order fold —
    computed as a Gram-matrix accumulation ``G += outer(A[:,d], B[:,d])``
    for d ascending. Each G[i,j] performs the IDENTICAL sequence of
    IEEE multiply/add roundings as the per-pair fold (same start 0.0,
    same dimension order), so values are bit-equal to _fold_dots; what
    changes is memory traffic — 8 bytes per pair instead of gathering
    two pairs×dim row copies (measured 5-8 s → sub-second on ~2M-pair
    blocks, OPTIMIZATION r12). Column-chunked so the accumulator stays
    bounded for any block size. Returns (ia, jb, dots) global indices
    into A/B rows.

    ``both=True`` additionally returns the REVERSE-orientation pairs
    (ida[i] > idb[j]) selected from the SAME accumulated G — IEEE
    multiply commutes bit-exactly and the d-order add sequence is one
    and the same matrix cell, so G[i,j] equals the fold in either
    operand order; the Gram (the m_a·m_b·dim flops) is paid once for
    both directions (OPTIMIZATION r13). Return shape becomes
    (ia, jb, dots, ia_rev, jb_rev, dots_rev)."""
    import numpy as np

    m_a, m_b = A.shape[0], B.shape[0]
    chunk = max(1, _GRAM_BUDGET // max(m_a, 1))
    out_i: list = []
    out_j: list = []
    out_d: list = []
    rev_i: list = []
    rev_j: list = []
    rev_d: list = []
    for c0 in range(0, m_b, chunk):
        c1 = min(m_b, c0 + chunk)
        G = np.zeros((m_a, c1 - c0), dtype="float64")
        for d in range(dim):
            G += A[:, d][:, None] * B[c0:c1, d][None, :]
        ia, jb = np.nonzero(ida[:, None] < idb[None, c0:c1])
        if len(ia):
            dots = G[ia, jb]
            if na is not None:
                dots = dots / (na[ia] * nb[jb + c0])
            out_i.append(ia)
            out_j.append(jb + c0)
            out_d.append(dots)
        if both:
            ra, rb = np.nonzero(ida[:, None] > idb[None, c0:c1])
            if len(ra):
                rdots = G[ra, rb]
                if na is not None:
                    rdots = rdots / (na[ra] * nb[rb + c0])
                rev_i.append(ra)
                rev_j.append(rb + c0)
                rev_d.append(rdots)

    def _cat(i, j, d):
        if not i:
            z = np.zeros(0, dtype="int64")
            return z, z, np.zeros(0, dtype="float64")
        return np.concatenate(i), np.concatenate(j), np.concatenate(d)

    fwd = _cat(out_i, out_j, out_d)
    if not both:
        return fwd
    return fwd + _cat(rev_i, rev_j, rev_d)


def _fold_norms(A, dim: int):
    import numpy as np

    acc = np.zeros(A.shape[0], dtype="float64")
    for d in range(dim):
        acc += A[:, d] * A[:, d]
    return np.sqrt(acc)


def _mat(col) -> "object":
    import numpy as np

    if len(col) == 0:
        return np.zeros((0, 0), dtype="float64")
    return np.stack([np.asarray(v, dtype="float64") for v in col])


def _align_key_types(a: DataFrame, b: DataFrame, keys: list[str]):
    """Cast both sides' key columns to one common type BEFORE a
    cogroup. Spark's cogroup matches the two sides' groups WITHOUT
    coercing key types: an ``int`` key on one side (e.g. a partition
    column read back from hive dirs, inferred int32) and a ``bigint``
    on the other silently land the SAME VALUE in two disjoint groups,
    so one side's pdf arrives empty and pairs vanish — found live at
    sf1 (r13): the SemDeDup index's cluster column reads back as int
    while fresh assignments carry long, and 31 of 40 clusters lost
    their stored side. Integral pairs widen to bigint; other mismatches
    cast the b side to a's type (the caller's frames are id/cluster
    keys — exact)."""
    from pyspark.sql import functions as F

    integral = {"tinyint", "smallint", "int", "bigint"}
    da, db = dict(a.dtypes), dict(b.dtypes)
    for k in keys:
        if da[k] == db[k]:
            continue
        target = "bigint" if {da[k], db[k]} <= integral else da[k]
        if da[k] != target:
            a = a.withColumn(k, F.col(k).cast(target))
        if db[k] != target:
            b = b.withColumn(k, F.col(k).cast(target))
    return a, b


def pair_dots_within(
    df: DataFrame,
    keys: list[str],
    id_col: str = "vec_id",
    vec_col: str = "u",
    cosine: bool = False,
) -> DataFrame:
    """All (a_id < b_id) pairs within each ``keys`` block, scored with
    the exact fold dot product of ``vec_col`` (or the exact cosine —
    dot / (norm_a * norm_b) — when ``cosine=True``). Returns
    keys + (a_id, b_id, _dot).

    One Arrow crossing per block ROW (never per pair); pair scoring is
    vectorized NumPy. Block sizes are the caller's contract (the
    SemDeDup cluster-size guard) — pair output is m²/2 per block."""
    import pandas as pd

    schema = ", ".join(
        [f"`{k}` {dict(df.dtypes)[k]}" for k in keys]
        + ["a_id bigint", "b_id bigint", "_dot double"]
    )

    def score(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        m = len(pdf)
        if m < 2:
            return pd.DataFrame(
                {c: [] for c in keys + ["a_id", "b_id", "_dot"]}
            )
        order = np.argsort(pdf[id_col].to_numpy(), kind="stable")
        pdf = pdf.iloc[order]
        ids = pdf[id_col].to_numpy()
        A = _mat(pdf[vec_col].to_numpy())
        dim = A.shape[1]
        n = _fold_norms(A, dim) if cosine else None
        # ids are sorted and unique, so the (ida < idb) Gram selection
        # enumerates exactly the upper triangle in triu order.
        ia, ib, dots = _gram_pairs(A, A, ids, ids, dim, na=n, nb=n)
        out = {k: [pdf[k].iloc[0]] * len(ia) for k in keys}
        out["a_id"] = ids[ia]
        out["b_id"] = ids[ib]
        out["_dot"] = dots
        return pd.DataFrame(out)

    return df.groupBy(*keys).applyInPandas(score, schema=schema)


def pair_dots_update(
    stored: DataFrame,
    new: DataFrame,
    keys: list[str],
    id_col: str = "vec_id",
    vec_col: str = "u",
) -> DataFrame:
    """Every (a_id < b_id) pair INVOLVING at least one ``new``-side row,
    blocked on ``keys`` — the one-pass form of the incremental-dedup
    keep rule's two directions (OPTIMIZATION r13):

    - pairs whose LATER (b) side is new — the "is the arrival dropped?"
      direction (b may have a stored or in-batch smaller-id neighbor);
    - pairs whose later side is STORED and earlier side is new — the
      "does a late small-id arrival revoke an earlier keep?" direction.

    The two sets are disjoint and their union is exactly {a < b : a or
    b new} (stored-stored pairs were judged when their later member
    arrived — they are never re-scored). Output adds ``b_new`` so the
    caller splits the directions without a join.

    Exactness: the stored×new Gram is accumulated ONCE (A=stored,
    B=new, d ascending) and serves both orientations — IEEE multiply
    commutes bit-exactly and the d-order accumulation sequence is
    identical, so G[i,j] equals both fold(stored_i·new_j) and
    fold(new_j·stored_i); the new×new pairs use the same upper-triangle
    Gram as pair_dots_within. Values are bit-equal to two
    pair_dots_between calls (pinned by test)."""
    import pandas as pd

    # positional access + toDF re-projection: same analyzer hazards as
    # pair_dots_between (shared-lineage cogroup sides). Key dtypes are
    # ALIGNED first — see _align_key_types (sf1 finding).
    stored = stored.select(*keys, id_col, vec_col)
    new = new.select(*keys, id_col, vec_col)
    stored, new = _align_key_types(stored, new, keys)
    schema = ", ".join(
        [f"`{k}` {dict(stored.dtypes)[k]}" for k in keys]
        + ["a_id bigint", "b_id bigint", "_dot double", "b_new boolean"]
    )
    id_pos, vec_pos = len(keys), len(keys) + 1

    def score(
        key, spdf: "pd.DataFrame", npdf: "pd.DataFrame"
    ) -> "pd.DataFrame":
        import numpy as np

        cols = keys + ["a_id", "b_id", "_dot", "b_new"]
        empty = pd.DataFrame({c: [] for c in cols})
        if len(npdf) == 0:
            return empty
        idn = npdf.iloc[:, id_pos].to_numpy()
        N = _mat(npdf.iloc[:, vec_pos].to_numpy())
        dim = N.shape[1]
        outs = []
        if len(spdf) > 0:
            ids = spdf.iloc[:, id_pos].to_numpy()
            S = _mat(spdf.iloc[:, vec_pos].to_numpy())
            # ONE stored×new Gram; both orientations select from it
            i_sn, j_sn, d_sn, i_ns, j_ns, d_ns = _gram_pairs(
                S, N, ids, idn, dim, both=True
            )
            if len(i_sn):
                # stored earlier (a), new later (b)
                outs.append((ids[i_sn], idn[j_sn], d_sn, True))
            if len(i_ns):
                # new earlier (a), stored later (b): same G cells,
                # operand order commutes bit-exactly
                outs.append((idn[j_ns], ids[i_ns], d_ns, False))
        # within-batch pairs: the later side is new by construction
        order = np.argsort(idn, kind="stable")
        Ns, idns = N[order], idn[order]
        i_nn, j_nn, d_nn = _gram_pairs(Ns, Ns, idns, idns, dim)
        if len(i_nn):
            outs.append((idns[i_nn], idns[j_nn], d_nn, True))
        if not outs:
            return empty
        out = {k: [key[i]] * sum(len(o[0]) for o in outs)
               for i, k in enumerate(keys)}
        out["a_id"] = np.concatenate([o[0] for o in outs])
        out["b_id"] = np.concatenate([o[1] for o in outs])
        out["_dot"] = np.concatenate([o[2] for o in outs])
        out["b_new"] = np.concatenate(
            [np.full(len(o[0]), o[3]) for o in outs]
        )
        return pd.DataFrame(out)

    return (
        stored.toDF(*stored.columns)
        .groupBy(*keys)
        .cogroup(new.toDF(*new.columns).groupBy(*keys))
        .applyInPandas(score, schema=schema)
    )


def pair_dots_between(
    a: DataFrame,
    b: DataFrame,
    keys: list[str],
    id_col: str = "vec_id",
    vec_col: str = "u",
    cosine: bool = False,
) -> DataFrame:
    """All (a_id < b_id) pairs with the a-side from ``a`` and the
    b-side from ``b``, blocked on ``keys`` (cogrouped) — the
    two-relation probe shape of the incremental indexes (stored × new,
    new × stored). Same exactness contract as pair_dots_within."""
    import pandas as pd

    # Pin column POSITIONS: when the two sides share lineage (the
    # build-time self-probe), Spark's relation dedup re-suffixes one
    # side's attribute names before they reach the Python worker, so
    # name-based access breaks. Both sides are projected to the same
    # (keys..., id, vec) order here and read positionally in score().
    # Key dtypes are ALIGNED first — see _align_key_types (sf1
    # finding: an int-vs-bigint key silently splits every group).
    a = a.select(*keys, id_col, vec_col)
    b = b.select(*keys, id_col, vec_col)
    a, b = _align_key_types(a, b, keys)
    schema = ", ".join(
        [f"`{k}` {dict(a.dtypes)[k]}" for k in keys]
        + ["a_id bigint", "b_id bigint", "_dot double"]
    )
    id_pos, vec_pos = len(keys), len(keys) + 1

    def score(key, apdf: "pd.DataFrame", bpdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        empty = pd.DataFrame({c: [] for c in keys + ["a_id", "b_id", "_dot"]})
        if len(apdf) == 0 or len(bpdf) == 0:
            return empty
        ida = apdf.iloc[:, id_pos].to_numpy()
        idb = bpdf.iloc[:, id_pos].to_numpy()
        A = _mat(apdf.iloc[:, vec_pos].to_numpy())
        B = _mat(bpdf.iloc[:, vec_pos].to_numpy())
        dim = A.shape[1]
        na = _fold_norms(A, dim) if cosine else None
        nb = _fold_norms(B, dim) if cosine else None
        ia, ib, dots = _gram_pairs(A, B, ida, idb, dim, na=na, nb=nb)
        if len(ia) == 0:
            return empty
        out = {k: [key[i]] * len(ia) for i, k in enumerate(keys)}
        out["a_id"] = ida[ia]
        out["b_id"] = idb[ib]
        out["_dot"] = dots
        return pd.DataFrame(out)

    # toDF on both sides: the two sides often derive from the SAME
    # relation (build-time self-probe), and Spark's self-cogroup
    # dedup otherwise mis-prunes the second side's data columns down
    # to the grouping key (observed on 4.1: the b-side worker pdf
    # arrived with only the key column). Re-projecting through toDF
    # mints fresh attribute ids on each side, which both satisfies the
    # ambiguity analyzer and keeps every column flowing.
    return (
        a.toDF(*a.columns)
        .groupBy(*keys)
        .cogroup(b.toDF(*b.columns).groupBy(*keys))
        .applyInPandas(score, schema=schema)
    )
