"""Sequence packing: assign every document a start offset in the
concatenated token stream and a fixed-token-budget shard id — the op
that turns a filtered corpus into equal-sized training shards
(GPT-style concatenate-and-chunk packing, where a document may
straddle a shard boundary).

This is a distributed prefix sum (exclusive scan). Shape:

  1. bucket every doc by a range key (``doc_id // bucket_width``) —
     deterministic, independent of Ray's batching, so pass 1 and
     pass 2 agree on the grouping no matter how blocks split;
  2. pass 1: per-batch ``np.add.at`` partials of (bucket, token sum)
     → tiny ``groupby(bucket)`` — the driver sees ONE row per bucket
     (O(corpus / bucket_width), ~800k rows at 100 TB with 128 MB
     buckets: megabytes, not the corpus);
  3. driver: exclusive cumsum over the sorted bucket sums → broadcast
     the offsets via ``ray.put`` (read once per task, never per batch);
  4. pass 2: ``groupby(bucket).map_groups`` — inside each bucket sort
     by doc_id, ``np.cumsum`` the token counts, add the bucket's
     global offset. One vectorized Python call per bucket; buckets are
     block-sized by construction.

Token counting reuses ``textops.tokenize`` (whitespace split), so the
output is SQL-oracle-expressible: start = SUM(n_tokens) OVER (ORDER BY
doc_id ROWS UNBOUNDED PRECEDING AND 1 PRECEDING), shard = start //
budget.

At 100 TB the only driver-side state is the bucket-sum table (step 3);
the scan itself never shuffles the corpus — pass 2's groupby moves
each row once to its bucket, the same single hash exchange every other
wide op in this repo pays.

The reference has no packing op (SURVEY.md §2.6); this is part of the
beyond-reference training-data tier alongside dedup/sampling.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from .textops import tokenize

# docs per range bucket. With the synthetic corpus's ~128-char docs
# this is ~128 KB of text per bucket at sf0.001 and block-sized at
# sf0.1+; a real deployment sizes it to ~target_max_block_size /
# mean_doc_bytes (and uses a sampled quantile split when the sort key
# is not dense).
BUCKET_WIDTH = 1024


def _bucket_of(doc_ids: np.ndarray) -> np.ndarray:
    return doc_ids // BUCKET_WIDTH


def pack_sequences(
    docs: ray.data.Dataset, budget: int = 4096
) -> ray.data.Dataset:
    """Per-doc (doc_id, n_tokens, start_offset, shard_id) where
    start_offset is the doc's position in the doc_id-ordered
    concatenated token stream and shard_id = start_offset // budget."""

    def partial_sums(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ntok = np.fromiter(
            (len(tokenize(x or "")) for x in t["text"].to_pylist()),
            dtype=np.int64,
            count=t.num_rows,
        )
        buckets = _bucket_of(ids)
        uniq, inv = np.unique(buckets, return_inverse=True)
        sums = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(sums, inv, ntok)
        return pa.table(
            {
                "bucket": pa.array(uniq, pa.int64()),
                "tok_sum": pa.array(sums, pa.int64()),
            }
        )

    # pass 1: O(#buckets) rows reach the driver — bounded, not the corpus
    bucket_sums = (
        docs.map_batches(partial_sums, batch_format="pyarrow")
        .groupby("bucket")
        .sum("tok_sum")
        .to_pandas()
    )
    if len(bucket_sums) == 0:  # drained input: nothing to pack
        buckets = np.empty(0, dtype=np.int64)
        offsets = np.empty(0, dtype=np.int64)
    else:
        bucket_sums = bucket_sums.sort_values("bucket")
        buckets = bucket_sums["bucket"].to_numpy().astype(np.int64)
        totals = bucket_sums["sum(tok_sum)"].to_numpy().astype(np.int64)
        offsets = np.concatenate(([0], np.cumsum(totals)[:-1]))
    handle = ray.put((buckets, offsets))

    def add_bucket(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("bucket", pa.array(_bucket_of(ids), pa.int64()))

    def pack_bucket(g: pa.Table) -> pa.Table:
        bkts, offs = ray.get(handle)
        ids = g["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        ntok = np.fromiter(
            (len(tokenize(x or "")) for x in g["text"].to_pylist()),
            dtype=np.int64,
            count=g.num_rows,
        )[order]
        base = offs[np.searchsorted(bkts, _bucket_of(ids[:1])[0])]
        start = base + np.concatenate(([0], np.cumsum(ntok)[:-1]))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(ntok, pa.int64()),
                "start_offset": pa.array(start, pa.int64()),
                "shard_id": pa.array(start // budget, pa.int64()),
            }
        )

    return (
        docs.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pack_bucket, batch_format="pyarrow")
    )


def pack_by_rank(
    ranked: ray.data.Dataset,
    rank_col: str = "rnk",
    tokens_col: str = "n_tokens",
    budget: int = 4096,
) -> ray.data.Dataset:
    """Sequence packing along a PRECOMPUTED global order: rows carry a
    dense 1-based rank (from georay.rank.rank_by) and a token count;
    output adds the start offset in the rank-ordered token stream and
    the budget shard id. Same two-pass distributed scan as
    pack_sequences, but bucketed by rank range — exact because ranks
    are dense, whatever the key that produced them was.

    This is the composition a curriculum pipeline runs: score docs →
    rank by score → pack the ordered stream into fixed-token shards.
    """

    def bucket_of(rnk: np.ndarray) -> np.ndarray:
        return (rnk - 1) // BUCKET_WIDTH

    def partial_sums(t: pa.Table) -> pa.Table:
        rnk = t[rank_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ntok = t[tokens_col].to_numpy(zero_copy_only=False).astype(np.int64)
        buckets = bucket_of(rnk)
        uniq, inv = np.unique(buckets, return_inverse=True)
        sums = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(sums, inv, ntok)
        return pa.table(
            {
                "bucket": pa.array(uniq, pa.int64()),
                "tok_sum": pa.array(sums, pa.int64()),
            }
        )

    bucket_sums = (
        ranked.map_batches(partial_sums, batch_format="pyarrow")
        .groupby("bucket")
        .sum("tok_sum")
        .to_pandas()
        .sort_values("bucket")
    )
    buckets = bucket_sums["bucket"].to_numpy().astype(np.int64)
    totals = bucket_sums["sum(tok_sum)"].to_numpy().astype(np.int64)
    offsets = np.concatenate(([0], np.cumsum(totals)[:-1]))
    handle = ray.put((buckets, offsets))

    def add_bucket(t: pa.Table) -> pa.Table:
        rnk = t[rank_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("bucket", pa.array(bucket_of(rnk), pa.int64()))

    def pack_bucket(g: pa.Table) -> pa.Table:
        bkts, offs = ray.get(handle)
        rnk = g[rank_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(rnk, kind="stable")
        g = g.take(order)
        rnk = rnk[order]
        ntok = g[tokens_col].to_numpy(zero_copy_only=False).astype(np.int64)
        base = offs[np.searchsorted(bkts, bucket_of(rnk[:1])[0])]
        start = base + np.concatenate(([0], np.cumsum(ntok)[:-1]))
        g = g.drop_columns(["bucket"])
        g = g.append_column("start_offset", pa.array(start, pa.int64()))
        return g.append_column("shard_id", pa.array(start // budget, pa.int64()))

    return (
        ranked.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pack_bucket, batch_format="pyarrow")
    )
