"""Global rank assignment (distributed row_number / NTILE): give every
row its exact 1-based position in the total order (key ASC, tie ASC)
without ever sorting the dataset on one machine.

Shape (the same scan decomposition as georay/packing.py, keyed by
VALUE RANGE instead of id range):

  1. one Min/Max aggregate fixes the key domain; per-batch equi-width
     bincount partials merge into a global histogram (fixed O(bins)
     vectors, the approx_quantiles shape);
  2. the cumulative histogram picks ~equal-count bucket boundaries;
     value → bucket is a pure monotone function (a bin→bucket lookup
     table), so equal keys always co-locate and the OUTPUT is
     independent of both the partitioning and the boundary choice;
  3. exact bucket counts (a tiny groupby) prefix-sum on the driver
     into per-bucket rank offsets — O(buckets) driver state;
  4. one groupby(bucket).map_groups sorts each bucket by (key, tie)
     and emits offset + local position.

Skewed keys degrade gracefully: a hot value lands in one bucket (it
must — ties share a bucket), and the histogram makes every OTHER
bucket stay ~equal-count. NTILE uses exact SQL semantics (first n%k
tiles get the extra row).

The reference has no ranking op (SURVEY.md §2.6: sorts/limits only
via take); this provides the global-order primitive that percentile
bucketing / curriculum ordering of a training corpus needs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Count
from ray.data.aggregate import Max as AggMax
from ray.data.aggregate import Min as AggMin

HIST_BINS = 8192


def rank_by(
    ds: ray.data.Dataset,
    key_col: str,
    tie_col: str,
    n_buckets: int | None = None,
    ntile: int | None = None,
) -> ray.data.Dataset:
    """(tie_col, key_col, rnk[, ntile_k]) with rnk = 1-based global
    row_number over (key_col ASC, tie_col ASC). ``ntile`` adds an
    NTILE(ntile) column with exact SQL semantics."""
    if n_buckets is None:
        try:
            cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            cpus = 8
        n_buckets = 4 * cpus

    # rank_by is a MULTI-PASS consumer (min/max aggregate, histogram
    # partials, final offset map) — materialize once so a lazy scoring
    # chain upstream executes once, not three times; blocks spill to
    # the object store rather than recompute (the fan-out idiom)
    ds = ds.materialize()
    stats = ds.aggregate(AggMin(key_col), AggMax(key_col))
    if stats is None or stats.get(f"min({key_col})") is None:  # empty input
        # same schema as the non-empty path: every input column plus
        # rnk (+ ntile_k), so downstream composition still binds.
        # schema() is None when an executed-empty upstream produced no
        # typed blocks (e.g. a groupby over zero rows) — fall back to
        # the key/tie columns so the output still carries them
        sch = ds.schema()
        if sch is None:
            names, types = [key_col, tie_col], [pa.int64(), pa.int64()]
            if key_col == tie_col:
                names, types = [key_col], [pa.int64()]
        else:
            names, types = sch.names, sch.types
        fields = {n: pa.array([], t) for n, t in zip(names, types)}
        fields["rnk"] = pa.array([], pa.int64())
        if ntile is not None:
            fields[f"ntile_{ntile}"] = pa.array([], pa.int64())
        return ray.data.from_arrow(pa.table(fields))
    lo = float(stats[f"min({key_col})"])
    hi = float(stats[f"max({key_col})"])
    if not np.isfinite(lo) or not np.isfinite(hi) or hi <= lo:
        hi = lo + 1.0
    width = (hi - lo) / HIST_BINS

    def hist_partial(t: pa.Table) -> pa.Table:
        v = t[key_col].to_numpy(zero_copy_only=False).astype(np.float64)
        idx = np.clip(((v - lo) / width).astype(np.int64), 0, HIST_BINS - 1)
        h = np.bincount(idx, minlength=HIST_BINS).astype(np.int64)
        return pa.table({"hist": pa.array([h.tobytes()], pa.binary())})

    parts = ds.map_batches(hist_partial, batch_format="pyarrow").take_all()
    total = np.zeros(HIST_BINS, dtype=np.int64)
    for row in parts:  # one fixed-size vector per input batch
        total += np.frombuffer(row["hist"], dtype=np.int64)
    n_rows = int(total.sum())

    # bin -> bucket lookup: cut the cumulative histogram at ~equal
    # counts. Monotone by construction, so value order is preserved
    # across buckets and equal values share a bucket.
    cum = np.cumsum(total)
    targets = (np.arange(1, n_buckets) * n_rows) // n_buckets
    cuts = np.searchsorted(cum, targets, side="left")
    lut = np.searchsorted(cuts, np.arange(HIST_BINS), side="right").astype(np.int64)

    lut_h = ray.put(lut)

    def add_bucket(t: pa.Table) -> pa.Table:
        l = ray.get(lut_h)
        v = t[key_col].to_numpy(zero_copy_only=False).astype(np.float64)
        idx = np.clip(((v - lo) / width).astype(np.int64), 0, HIST_BINS - 1)
        return t.append_column("__bucket", pa.array(l[idx], pa.int64()))

    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow")

    # exact per-bucket counts -> rank offset of each bucket
    cnts = (
        bucketed.groupby("__bucket")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
        .sort_values("__bucket")
    )
    bucket_ids = cnts["__bucket"].to_numpy().astype(np.int64)
    offsets = np.concatenate(([0], np.cumsum(cnts["n"].to_numpy())[:-1])).astype(
        np.int64
    )
    off_h = ray.put((bucket_ids, offsets))

    k = ntile
    if k is not None:
        q, r = divmod(n_rows, k)

    def rank_bucket(g: pa.Table) -> pa.Table:
        bids, offs = ray.get(off_h)
        key = g[key_col].to_numpy(zero_copy_only=False)
        tie = g[tie_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((tie, key))
        base = offs[np.searchsorted(bids, g["__bucket"][0].as_py())]
        rnk = np.empty(len(order), dtype=np.int64)
        rnk[order] = base + 1 + np.arange(len(order))
        # carry every input column through (rank composes into
        # downstream stages, e.g. packing.pack_by_rank)
        cols = {c: g[c] for c in g.column_names if c != "__bucket"}
        cols["rnk"] = pa.array(rnk, pa.int64())
        if k is not None:
            # SQL NTILE: the first r tiles have q+1 rows, the rest q
            i0 = rnk - 1
            head = r * (q + 1)
            nt = np.where(i0 < head, i0 // max(q + 1, 1), r + (i0 - head) // max(q, 1))
            cols[f"ntile_{k}"] = pa.array(nt + 1, pa.int64())
        return pa.table(cols)

    return bucketed.groupby("__bucket").map_groups(rank_bucket, batch_format="pyarrow")
