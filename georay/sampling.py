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


def _priorities(keys, seed: int) -> np.ndarray:
    """Deterministic u in (0, 1) per key: blake2b(seed, key) / 2^64."""
    out = np.empty(len(keys), dtype=np.float64)
    s = str(seed).encode()
    for i, k in enumerate(keys):
        h = hashlib.blake2b(s + b"\x00" + str(k).encode(), digest_size=8).digest()
        out[i] = (int.from_bytes(h, "big") + 1) / (2**64 + 2)  # never 0 or 1
    return out


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
        u = _priorities(t[key_col].to_pylist(), seed)
        if weight_col is not None:
            w = t[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
            # log-space: priority = u^(1/w); log p = log(u)/w
            logp = np.where(w > 0, np.log(u) / np.maximum(w, 1e-300), -np.inf)
        else:
            logp = np.log(u)
        t = t.append_column("__logp", pa.array(logp, pa.float64()))
        if t.num_rows > k:
            top = np.argpartition(-logp, k)[:k]  # local top-k partial
            t = t.take(np.sort(top))
        return t

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return (
        partials.sort("__logp", descending=True)
        .limit(k)
        .drop_columns(["__logp"])
    )


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
