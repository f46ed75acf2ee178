"""Approximate-aggregate sketches: HyperLogLog distinct counting.

The reference has no sketches (SURVEY.md §2.6); a 100 TB pipeline needs
them — an exact COUNT(DISTINCT) shuffles every key, an HLL shuffles a
fixed 2^p-byte register array per (batch, group) regardless of input
size, and registers merge with an elementwise max (associative +
commutative: safe under any partitioning or retry order).

Flajolet et al. 2007 estimator with linear-counting small-range
correction; numpy-vectorized register updates (the exponent trick:
bit_length(w) == frexp(w).exponent for w < 2^52, exact in float64).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray
import ray.data

DEFAULT_P = 12  # 4096 registers, ~1.6% relative error


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def hash64(values) -> np.ndarray:
    """Deterministic 64-bit hashes for int64 or string arrays."""
    arr = np.asarray(values)
    if arr.dtype.kind in "iu":
        x = arr.astype(np.uint64)
        # splitmix64 finalizer
        x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        return x ^ (x >> np.uint64(31))
    out = np.empty(len(arr), dtype=np.uint64)
    for i, v in enumerate(arr):
        out[i] = int.from_bytes(
            hashlib.blake2b(str(v).encode(), digest_size=8).digest(), "big"
        )
    return out


def empty_registers(p: int = DEFAULT_P) -> np.ndarray:
    return np.zeros(1 << p, dtype=np.uint8)


def update_registers(registers: np.ndarray, hashes: np.ndarray, p: int = DEFAULT_P):
    """Vectorized HLL register update (in place)."""
    if not len(hashes):
        return registers
    idx = (hashes >> np.uint64(64 - p)).astype(np.int64)
    w = hashes & np.uint64((1 << (64 - p)) - 1)
    # rho = leading zeros of the (64-p)-bit word + 1
    bl = np.zeros(len(w), dtype=np.int64)
    nz = w != 0
    bl[nz] = np.frexp(w[nz].astype(np.float64))[1]  # == bit_length, exact < 2^52
    rho = np.where(nz, (64 - p) - bl + 1, 64 - p + 1).astype(np.uint8)
    np.maximum.at(registers, idx, rho)
    return registers


def merge_registers(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def estimate(registers: np.ndarray) -> float:
    m = len(registers)
    e = _alpha(m) * m * m / np.sum(np.exp2(-registers.astype(np.float64)))
    if e <= 2.5 * m:
        zeros = int(np.count_nonzero(registers == 0))
        if zeros:
            return m * np.log(m / zeros)
    return float(e)


def approx_distinct(ds: ray.data.Dataset, col: str, p: int = DEFAULT_P) -> float:
    """Global approximate COUNT(DISTINCT col): per-batch registers ->
    driver-side max-merge (one 2^p-byte row per batch crosses the
    wire, never the keys)."""

    def partial(t: pa.Table) -> pa.Table:
        regs = empty_registers(p)
        update_registers(regs, hash64(t[col].to_numpy(zero_copy_only=False)), p)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    regs = empty_registers(p)
    for r in parts:
        regs = merge_registers(regs, np.frombuffer(r["regs"], dtype=np.uint8))
    return estimate(regs)


def grouped_approx_distinct(
    ds: ray.data.Dataset, key: str, col: str, p: int = DEFAULT_P, alias: str = "approx_distinct"
) -> ray.data.Dataset:
    """Per-group approximate COUNT(DISTINCT col): per-(batch, group)
    registers -> groupby(key) max-merge -> estimate. The shuffle moves
    one fixed-size register row per (batch, group)."""

    def partial(t: pa.Table) -> pa.Table:
        keys = t[key].to_numpy(zero_copy_only=False)
        vals = hash64(t[col].to_numpy(zero_copy_only=False))
        out_k, out_r = [], []
        order = np.argsort(keys, kind="stable")
        sk = keys[order]
        bounds = np.nonzero(sk[1:] != sk[:-1])[0] + 1  # string-safe diff
        for grp in np.split(order, bounds):
            if not len(grp):
                continue
            regs = empty_registers(p)
            update_registers(regs, vals[grp], p)
            out_k.append(keys[grp[0]])
            out_r.append(regs.tobytes())
        return pa.table({key: pa.array(out_k), "regs": pa.array(out_r, pa.binary())})

    def finish(g: pa.Table) -> pa.Table:
        regs = empty_registers(p)
        for blob in g["regs"].to_pylist():
            regs = merge_registers(regs, np.frombuffer(blob, dtype=np.uint8))
        return pa.table(
            {
                key: g[key].slice(0, 1),
                alias: pa.array([int(round(estimate(regs)))], pa.int64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return parts.groupby(key).map_groups(finish, batch_format="pyarrow")


# ------------------------------------------- quantile sketch (histogram)

QSKETCH_BINS = 4096


def approx_quantiles(
    ds: "ray.data.Dataset",
    col: str,
    qs=(0.5, 0.9, 0.99),
    n_bins: int = QSKETCH_BINS,
):
    """Approximate quantiles via a mergeable fixed-bin histogram sketch.

    Two passes, both streaming: (1) a grouped Min/Max fixes the bin
    domain; (2) each batch bincounts into n_bins equi-width bins (one
    np.clip + np.bincount — no sort, no per-row Python) and partial
    histograms merge by elementwise sum (a small fixed-size vector per
    batch, the same shuffle shape as the HLL registers). The quantile
    is read from the cumulative histogram with DuckDB quantile_disc
    rank semantics applied at bin granularity.

    Error bound: the reported value is the UPPER EDGE of the bin holding
    the target rank, so it is within one bin width
    ((max-min)/n_bins) above the exact quantile_disc value —
    deterministic, not probabilistic. Memory is O(n_bins) per batch and
    total, independent of row count (the property a 100-TB run needs;
    the exact path sorts whole groups instead)."""
    import ray.data
    from ray.data.aggregate import Max as AggMax
    from ray.data.aggregate import Min as AggMin

    stats = ds.aggregate(AggMin(col), AggMax(col))
    lo = float(stats[f"min({col})"])
    hi = float(stats[f"max({col})"])
    if not np.isfinite(lo) or not np.isfinite(hi) or hi <= lo:
        hi = lo + 1.0
    width = (hi - lo) / n_bins

    def partial(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        idx = np.clip(((v - lo) / width).astype(np.int64), 0, n_bins - 1)
        h = np.bincount(idx, minlength=n_bins).astype(np.int64)
        return pa.table({"hist": pa.array([h.tobytes()], pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    total = np.zeros(n_bins, dtype=np.int64)
    for row in parts:  # one fixed-size vector per input batch
        total += np.frombuffer(row["hist"], dtype=np.int64)
    n = int(total.sum())
    cum = np.cumsum(total)
    out = {"n_rows": [n]}
    for q in qs:
        rank = max(0, int(np.ceil(q * n)) - 1)  # quantile_disc rank
        b = int(np.searchsorted(cum, rank + 1))
        out[f"p{str(q).replace('0.', '')}"] = [lo + (b + 1) * width]
    return pa.table(
        {
            **{k: pa.array(v, pa.int64() if k == "n_rows" else pa.float64())
               for k, v in out.items()},
        }
    )


def grouped_approx_quantiles(
    ds: "ray.data.Dataset",
    group_col: str,
    col: str,
    qs=(0.5, 0.9),
    n_bins: int = 512,
):
    """Per-GROUP approximate quantiles via the same mergeable
    equi-width histogram sketch as approx_quantiles: one tiny grouped
    Min/Max fixes each group's bin domain, then every batch emits one
    O(groups x n_bins) partial histogram — memory independent of row
    count per group, the property the exact per-group sort path gives
    up at scale. Same deterministic upper-bin-edge error contract
    (within one bin width above quantile_disc)."""
    import ray.data
    from ray.data.aggregate import Count as AggCount
    from ray.data.aggregate import Max as AggMax
    from ray.data.aggregate import Min as AggMin

    stats = (
        ds.groupby(group_col)
        .aggregate(AggMin(col), AggMax(col), AggCount())
        .take_all()
    )
    groups = sorted(r[group_col] for r in stats)
    gidx = {g: i for i, g in enumerate(groups)}
    lo = np.empty(len(groups))
    width = np.empty(len(groups))
    n_rows = np.zeros(len(groups), dtype=np.int64)
    for r in stats:
        i = gidx[r[group_col]]
        glo, ghi = float(r[f"min({col})"]), float(r[f"max({col})"])
        if not np.isfinite(glo) or not np.isfinite(ghi) or ghi <= glo:
            ghi = glo + 1.0
        lo[i] = glo
        width[i] = (ghi - glo) / n_bins
        n_rows[i] = int(r["count()"])

    gkeys = np.array(groups)  # sorted -> searchsorted IS the group index

    def partial(t: pa.Table) -> pa.Table:
        g = np.searchsorted(
            gkeys, t[group_col].to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.clip(((v - lo[g]) / width[g]).astype(np.int64), 0, n_bins - 1)
        h = np.bincount(g * n_bins + b, minlength=len(groups) * n_bins).astype(
            np.int64
        )
        return pa.table({"hist": pa.array([h.tobytes()], pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    total = np.zeros(len(groups) * n_bins, dtype=np.int64)
    for row in parts:  # one fixed-size vector per input batch
        total += np.frombuffer(row["hist"], dtype=np.int64)
    total = total.reshape(len(groups), n_bins)
    cum = np.cumsum(total, axis=1)
    cols = {
        group_col: pa.array(groups),
        "n_rows": pa.array(n_rows, pa.int64()),
    }
    for q in qs:
        vals = []
        for i in range(len(groups)):
            rank = max(0, int(np.ceil(q * n_rows[i])) - 1)
            b = int(np.searchsorted(cum[i], rank + 1))
            vals.append(lo[i] + (b + 1) * width[i])
        cols[f"p{str(q).replace('0.', '')}"] = pa.array(vals, pa.float64())
    return pa.table(cols)


def hll_overlap(
    ds: ray.data.Dataset, key: str, col: str, p: int = DEFAULT_P
) -> pa.Table:
    """Pairwise AUDIENCE OVERLAP between all group pairs, estimated
    from ONE scan: per-group HLL registers are mergeable, so
    |A ∪ B| is the register-wise max and |A ∩ B| falls out of
    inclusion-exclusion — the raw key sets never meet in a join. The
    canonical sketch trick for cross-segment user overlap /
    cross-corpus vocabulary overlap at any scale.

    Shape: grouped_approx_distinct's partial (one 2^p-byte register
    row per (batch, group)) -> groupby(key) max-merge to ONE register
    row per group -> the G register rows reach the driver (G = group
    cardinality — the event-type / corpus-name alphabet, BOUNDED by
    contract like every dimension side here) -> vectorized pairwise
    union + estimate. All estimates round to int64 BEFORE the
    subtraction, so overlap arithmetic is integer-exact and the SQL
    replay hash-matches.

    Output (driver-side pa.Table, G*(G-1)/2 rows): {grp_a, grp_b,
    approx_a, approx_b, approx_union, approx_overlap}, pairs ordered
    (grp_a < grp_b)."""

    def partial(t: pa.Table) -> pa.Table:
        keys = t[key].to_numpy(zero_copy_only=False)
        vals = hash64(t[col].to_numpy(zero_copy_only=False))
        out_k, out_r = [], []
        order = np.argsort(keys, kind="stable")
        sk = keys[order]
        bounds = np.nonzero(sk[1:] != sk[:-1])[0] + 1
        for grp in np.split(order, bounds):
            if not len(grp):
                continue
            regs = empty_registers(p)
            update_registers(regs, vals[grp], p)
            out_k.append(keys[grp[0]])
            out_r.append(regs.tobytes())
        return pa.table({key: pa.array(out_k), "regs": pa.array(out_r, pa.binary())})

    def merge_group(g: pa.Table) -> pa.Table:
        regs = empty_registers(p)
        for blob in g["regs"].to_pylist():
            regs = merge_registers(regs, np.frombuffer(blob, dtype=np.uint8))
        return pa.table(
            {key: g[key].slice(0, 1), "regs": pa.array([regs.tobytes()], pa.binary())}
        )

    rows = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key)
        .map_groups(merge_group, batch_format="pyarrow")
        .take_all()
    )
    rows.sort(key=lambda r: r[key])
    groups = [r[key] for r in rows]
    regsets = [np.frombuffer(r["regs"], dtype=np.uint8) for r in rows]
    ests = [int(round(estimate(r))) for r in regsets]
    ga, gb, ea, eb, eu, ov = [], [], [], [], [], []
    for i in range(len(groups)):
        for j in range(i + 1, len(groups)):
            u = int(round(estimate(merge_registers(regsets[i], regsets[j]))))
            ga.append(groups[i])
            gb.append(groups[j])
            ea.append(ests[i])
            eb.append(ests[j])
            eu.append(u)
            ov.append(max(ests[i] + ests[j] - u, 0))
    return pa.table(
        {
            "grp_a": pa.array(ga),
            "grp_b": pa.array(gb),
            "approx_a": pa.array(ea, pa.int64()),
            "approx_b": pa.array(eb, pa.int64()),
            "approx_union": pa.array(eu, pa.int64()),
            "approx_overlap": pa.array(ov, pa.int64()),
        }
    )


# ----------------------------------------------------------- Count-Min


def countmin_counts(
    docs: ray.data.Dataset,
    terms: tuple,
    depth: int = 4,
    width: int = 1024,
):
    """Count-Min sketch point queries (Cormode & Muthukrishnan 2005):
    per queried term the CMS estimate (min over depth counter rows of
    the hashed cell) next to the EXACT occurrence count — the one-sided
    overestimate guarantee (est >= exact, error <= 2N/width w.p.
    1-2^-depth) visible in the output itself.

    Scale shape (why CMS at 100 TB): an exact per-term count over an
    unbounded vocabulary shuffles every key; the sketch is a FIXED
    depth x width int64 matrix per batch partial that merges by
    elementwise SUM — associative/commutative, safe under any
    partitioning or retry order. Partials emit only the NONZERO cells
    as (flat_idx, n) rows, the (<= depth*width)-key fold happens in
    tiny_key_sum's fan-in tree, and the driver holds one O(depth*width)
    vector — never a vocabulary. The exact side prunes to the queried
    terms inside the same scan (bounded |terms| keys).

    Hashing is the repo-standard sha256-first-8-bytes on "{row}:{tok}"
    (sketch.hash64 / textops._hash64_strings), so the whole sketch
    replays cell-exactly in DuckDB SQL.

    Output: term, cms_est, exact_n, sorted by term."""
    from georay.relational import tiny_key_sum

    if depth < 1 or width < 1:
        raise ValueError("countmin_counts: depth and width must be >= 1")
    qterms = tuple(terms)

    def partial(t: pa.Table) -> pa.Table:
        """One scan emits BOTH partial kinds: sketch cells at flat keys
        [0, depth*width) and exact queried-term counts at flat key
        -(term_index+1) — the fold stays a single tiny_key_sum."""
        from georay.textops import _hash64_strings, tokenize

        toks = []
        for text in t["text"].to_pylist():
            toks.extend(tokenize(text or ""))
        if not toks:
            return pa.table(
                {"flat": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        uniq, cnt = np.unique(np.asarray(toks, dtype=object), return_counts=True)
        mats = np.zeros(depth * width, np.int64)
        for i in range(depth):
            cells = (
                _hash64_strings([f"{i}:{u}" for u in uniq]) % np.uint64(width)
            ).astype(np.int64)
            np.add.at(mats, i * width + cells, cnt)
        nz = np.flatnonzero(mats)
        flat = [nz]
        n = [mats[nz]]
        pos = {u: c for u, c in zip(uniq.tolist(), cnt.tolist())}
        tflat = [-(j + 1) for j, q in enumerate(qterms) if pos.get(q, 0)]
        if tflat:
            flat.append(np.asarray(tflat, np.int64))
            n.append(np.asarray([pos[qterms[-(f) - 1]] for f in tflat], np.int64))
        return pa.table(
            {
                "flat": pa.array(np.concatenate(flat), pa.int64()),
                "n": pa.array(np.concatenate(n), pa.int64()),
            }
        )

    folded = tiny_key_sum(
        docs.map_batches(partial, batch_format="pyarrow"), ["flat"], ["n"]
    ).take_all()
    mat = np.zeros(depth * width, np.int64)
    exact = {}
    for r in folded:
        if r["flat"] >= 0:
            mat[r["flat"]] = r["n"]
        else:
            exact[qterms[-r["flat"] - 1]] = r["n"]

    from georay.textops import _hash64_strings

    rows = []
    for q in sorted(qterms):
        est = min(
            int(mat[i * width + int(_hash64_strings([f"{i}:{q}"])[0] % np.uint64(width))])
            for i in range(depth)
        )
        rows.append((q, est, int(exact.get(q, 0))))
    return pa.table(
        {
            "term": pa.array([r[0] for r in rows], pa.string()),
            "cms_est": pa.array([r[1] for r in rows], pa.int64()),
            "exact_n": pa.array([r[2] for r in rows], pa.int64()),
        }
    )
