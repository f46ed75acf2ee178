"""Distributed sampling operators: uniform and weighted sampling
without replacement (Efraimidis–Spirakis A-Res priorities).

Shape: every row gets a deterministic priority from a seeded hash of
its key (uniform: u; weighted: u^(1/w), computed in log space); the
sample = global top-k by priority. Each batch emits only its local
top-k partial, so the "shuffle" the final selection sees is k rows per
batch — never the input. Deterministic by construction (same seed +
same keys -> same sample on any partitioning, any cluster size, any
retry order), which is what a resumable 100 TB pipeline needs from a
sample.

The reference has no sampling (SURVEY.md §2.6 — sorts/limits/sampling
all absent); this completes the category alongside sort/top-k in
relational.py.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data


def _hash_u64(keys, seed: int) -> np.ndarray:
    """Deterministic uint64 per key: first 8 bytes of
    sha256('{seed}:{key}') — the exact form DuckDB can recompute
    (CAST('0x' || substr(sha256(...), 1, 16) AS UBIGINT)), which makes
    the uniform sample SQL-oracle-expressible (VERDICT r02 #7)."""
    out = np.empty(len(keys), dtype=np.uint64)
    pre = f"{seed}:".encode()
    for i, k in enumerate(keys):
        out[i] = int.from_bytes(
            hashlib.sha256(pre + str(k).encode()).digest()[:8], "big"
        )
    return out


def _priorities(keys, seed: int) -> np.ndarray:
    """Deterministic u in (0, 1) per key (for the weighted path)."""
    return (_hash_u64(keys, seed).astype(np.float64) + 1.0) / float(2**64 + 2)


def sample_without_replacement(
    ds: ray.data.Dataset,
    k: int,
    key_col: str,
    seed: int = 42,
    weight_col: str | None = None,
) -> ray.data.Dataset:
    """Top-k rows by deterministic priority == a uniform (or, with
    weight_col, Efraimidis–Spirakis weighted) sample without
    replacement. Rows with weight <= 0 are never sampled."""

    def partial(t: pa.Table) -> pa.Table:
        if weight_col is not None:
            u = _priorities(t[key_col].to_pylist(), seed)
            w = t[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
            # log-space: priority = u^(1/w); log p = log(u)/w; top-k by
            # LARGEST, so negate into the shared ascending-int64 frame
            # is not possible — keep float and flip the sign
            logp = np.where(w > 0, np.log(u) / np.maximum(w, 1e-300), -np.inf)
            prio = pa.array(-logp, pa.float64())
            part_key = -logp
        else:
            # uniform: the raw integer hash IS the priority (k smallest
            # = uniform sample), exact-int64 comparable — identical to
            # the SQL oracle's UBIGINT>>1 compare, no float rounding
            ph = (_hash_u64(t[key_col].to_pylist(), seed) >> 1).astype(np.int64)
            prio = pa.array(ph, pa.int64())
            part_key = ph
        t = t.append_column("__prio", prio)
        if t.num_rows > k:
            top = np.argpartition(part_key, k)[:k]  # local top-k partial
            t = t.take(np.sort(top))
        return t

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.sort("__prio").limit(k).drop_columns(["__prio"])


def stratified_sample(
    ds: ray.data.Dataset, k: int, group_col: str, key_col: str, seed: int = 42
) -> ray.data.Dataset:
    """Per-group uniform sample without replacement: the k smallest
    priorities WITHIN each group (the balanced-per-language /
    per-source sample a training-mix pipeline draws). Each batch emits
    only its local per-group top-k partial, so the shuffle sees at
    most k rows per (batch, group) — never the input; the final top-k
    runs per group in one vectorized ``map_groups`` call. Deterministic
    (seeded hash priorities), so SQL-oracle-expressible via
    row_number() over (partition by group order by hash)."""

    def partial(t: pa.Table) -> pa.Table:
        prio = (_hash_u64(t[key_col].to_pylist(), seed) >> 1).astype(np.int64)
        t = t.append_column("__prio", pa.array(prio, pa.int64()))
        groups = t[group_col].to_numpy(zero_copy_only=False)
        # sort by (group, prio); first k rows of each group run = the
        # group's local top-k
        codes = np.unique(groups, return_inverse=True)[1]
        order = np.lexsort((prio, codes))
        rank_in_group = np.arange(len(order)) - np.concatenate(
            ([0], np.cumsum(np.bincount(codes)))
        )[codes[order]]
        return t.take(order[rank_in_group < k])

    def finish(g: pa.Table) -> pa.Table:
        prio = g["__prio"].to_numpy(zero_copy_only=False)
        top = np.argsort(prio, kind="stable")[:k]
        return g.take(np.sort(top)).drop_columns(["__prio"])

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(finish, batch_format="pyarrow")
    )


def domain_mix(
    ds: ray.data.Dataset,
    weight_of,
    group_col: str,
    key_col: str,
    seed: int = 42,
) -> ray.data.Dataset:
    """Weighted per-domain Bernoulli downsampling — the corpus-mixing
    step of a training pipeline (keep 75% of one source, 25% of
    another). ``weight_of(group_value) -> float in [0,1]``; a row is
    kept iff hash64('{seed}:{key}') < floor(weight * 2**64) — an EXACT
    integer compare, no float rounding at the boundary, so the SQL
    oracle replays it bit-for-bit. Pure per-batch filter: no shuffle,
    no state, streams at any scale. Thresholds are computed once per
    distinct group value per batch (np.unique), not per row."""

    def f(t: pa.Table) -> pa.Table:
        u = _hash_u64(t[key_col].to_pylist(), seed)
        groups = t[group_col].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(groups, return_inverse=True)
        thresh = np.array(
            [min(int(weight_of(g) * (1 << 64)), (1 << 64) - 1) for g in uniq],
            dtype=np.uint64,
        )
        return t.filter(pa.array(u < thresh[inv]))

    return ds.map_batches(f, batch_format="pyarrow")


def split_sample(
    ds: ray.data.Dataset, fraction: float, key_col: str, seed: int = 42
) -> ray.data.Dataset:
    """Deterministic hash-split Bernoulli sample: keeps rows whose
    priority < fraction. Unlike top-k sampling this needs NO shuffle at
    all — each batch filters independently — and composes into
    disjoint train/test splits (fraction f and its complement)."""

    def f(t: pa.Table) -> pa.Table:
        u = _priorities(t[key_col].to_pylist(), seed)
        return t.filter(pa.array(u < fraction))

    return ds.map_batches(f, batch_format="pyarrow")


def domain_cap(
    ds: ray.data.Dataset,
    group_col: str,
    key_col: str,
    rank_col: str,
    cap: int,
) -> ray.data.Dataset:
    """Per-domain document QUOTA — the RefinedWeb/C4-style curation
    step that keeps at most ``cap`` documents per host so no single
    domain dominates the training mix (Bernoulli mixing, domain_mix
    above, thins proportionally; a cap bounds absolutely). Keeps the
    top ``cap`` rows per ``group_col`` ranked by
    (``rank_col`` DESC, ``key_col`` ASC) — deterministic, so the SQL
    replay is a plain ROW_NUMBER window.

    Scale shape: ONE column-pruned shuffle of (key, group, rank) —
    never the text — hash-bucketed on the group (4xCPU buckets, the
    _n_partitions rule); inside a bucket the rank is a vectorized
    lexsort + run-length pass over ALL its groups at once. Hot
    domains skew buckets at worst by their (key, rank) pairs, which is
    the floor for an exact per-group top-cap; at 100 TB a
    pathologically hot host could pre-thin with a per-partition local
    cap >= cap first (same trick as the ANN partial top-ks).

    Output: {key_col, group_col, rk} for kept rows, rk in [1, cap]."""
    from georay.relational import _hash_bucket, _n_partitions

    n_parts = _n_partitions()

    def bucket(t: pa.Table) -> pa.Table:
        t = t.select([key_col, group_col, rank_col])
        g = np.asarray(t[group_col].to_pylist())
        # hash only the UNIQUE domains (domain_mix's trick): the
        # per-batch distinct-domain count is tiny next to the row count
        uniq, inv = np.unique(g, return_inverse=True)
        uh = np.array(
            [int.from_bytes(hashlib.sha256(s.encode()).digest()[:8], "big") >> 1
             for s in uniq],
            dtype=np.int64,
        )
        return t.append_column("__gb", pa.array(uh[inv] % n_parts, pa.int64()))

    def per_group_cap(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    key_col: pa.array([], pa.int64()),
                    group_col: pa.array([], pa.string()),
                    "rk": pa.array([], pa.int64()),
                }
            )
        keys = t[key_col].to_numpy(zero_copy_only=False)
        grp = np.asarray(t[group_col].to_pylist())
        rnk = t[rank_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((keys, -rnk, grp))
        grp_s = grp[order]
        new = np.r_[True, grp_s[1:] != grp_s[:-1]]
        starts = np.flatnonzero(new)
        runlen = np.diff(np.r_[starts, len(grp_s)])
        rk = np.arange(len(grp_s)) - np.repeat(starts, runlen) + 1
        keep = rk <= cap
        sel = order[keep]
        return pa.table(
            {
                key_col: pa.array(keys[sel], pa.int64()),
                group_col: pa.array(grp[sel].tolist(), pa.string()),
                "rk": pa.array(rk[keep], pa.int64()),
            }
        )

    return (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby("__gb")
        .map_groups(per_group_cap, batch_format="pyarrow")
    )
