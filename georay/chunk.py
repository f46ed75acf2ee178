"""Sliding-window token chunking: split each document into
fixed-token-count chunks with overlap (the RAG / context-window
preprocessing step of a training-data pipeline).

Chunk k of a document with n whitespace tokens covers tokens
``[k*stride, k*stride + window)`` with ``stride = window - overlap``,
for every k with ``k*stride < n`` — so the last chunk may be short,
every token appears in >=1 chunk, and consecutive chunks share
``overlap`` tokens. Zero-token documents produce no chunks.

Scale shape: a stateless ``map_batches`` flat-map — no shuffle, no
state, output rows ~ input tokens / stride. Everything is Arrow
kernels + numpy index arithmetic: ``utf8_split_whitespace`` tokenizes,
a single ``take`` gathers every chunk's tokens, ``binary_join``
reassembles the chunk strings; no Python loop over rows or chunks.

The reference has no chunking op (it is a geo decoder service); this
extends the engine per the task brief's training-data operator set,
with the same whitespace-token convention as georay/textops.py so the
DuckDB oracle (regexp_split_to_array + list_slice) replays it exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def chunk_texts(
    ds: ray.data.Dataset,
    window: int = 64,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """(id_col, chunk_idx, n_tok, chunk_text): one row per sliding
    window of ``window`` tokens advancing by ``window - overlap``."""
    if not 0 <= overlap < window:
        raise ValueError("require 0 <= overlap < window")
    stride = window - overlap

    def chunk(t: pa.Table) -> pa.Table:
        toks = pc.utf8_split_whitespace(
            pc.utf8_trim_whitespace(t[text_col])
        ).combine_chunks()
        flat = toks.flatten()
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        ntok = np.diff(offs)
        # the all-whitespace/empty doc tokenizes to [''] — zero real tokens
        one = ntok == 1
        if one.any():
            first = np.asarray(flat.take(offs[:-1][one]))
            ntok = ntok.copy()
            ntok[np.flatnonzero(one)[first == ""]] = 0

        nchunks = -(-ntok // stride)  # ceil; 0 tokens -> 0 chunks
        doc_rep = np.repeat(np.arange(t.num_rows, dtype=np.int64), nchunks)
        total = int(nchunks.sum())
        if total == 0:
            return pa.table(
                {
                    id_col: pa.array([], t[id_col].type),
                    "chunk_idx": pa.array([], pa.int32()),
                    "n_tok": pa.array([], pa.int64()),
                    "chunk_text": pa.array([], pa.string()),
                }
            )
        # chunk_idx = position within its document
        first_of_doc = np.concatenate(([0], np.cumsum(nchunks)[:-1]))
        chunk_idx = np.arange(total, dtype=np.int64) - first_of_doc[doc_rep]

        start = offs[:-1][doc_rep] + chunk_idx * stride
        end = np.minimum(start + window, offs[1:][doc_rep])
        lens = end - start
        # gather indices for every chunk's tokens in one take
        chunk_offs = np.concatenate(([0], np.cumsum(lens)))
        idx = np.arange(chunk_offs[-1], dtype=np.int64) - np.repeat(
            chunk_offs[:-1] - start, lens
        )
        gathered = flat.take(pa.array(idx, pa.int64()))
        # int32 list offsets: a batch is block-size-bounded (~128 MB),
        # so its token count stays far under 2^31
        chunks = pa.ListArray.from_arrays(pa.array(chunk_offs, pa.int32()), gathered)
        return pa.table(
            {
                id_col: t[id_col].take(pa.array(doc_rep, pa.int64())),
                "chunk_idx": pa.array(chunk_idx.astype(np.int32), pa.int32()),
                "n_tok": pa.array(lens, pa.int64()),
                "chunk_text": pc.binary_join(chunks, " "),
            }
        )

    return ds.map_batches(chunk, batch_format="pyarrow")
