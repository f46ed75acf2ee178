"""Edge paths of the round-3 operators: empty inputs, constant keys,
degenerate weights — the branches a long-running pipeline hits when a
filter upstream drains a partition or a column is constant."""

import numpy as np
import pyarrow as pa
import pytest


def _ds(tbl):
    import ray.data

    return ray.data.from_arrow(tbl)


def test_pack_sequences_empty(ray_session):
    from georay.packing import pack_sequences

    t = pa.table(
        {"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())}
    )
    out = pack_sequences(_ds(t)).to_pandas()
    assert len(out) == 0


def test_rank_by_constant_key(ray_session):
    from georay.rank import rank_by

    t = pa.table(
        {
            "id": pa.array(range(100), pa.int64()),
            "v": pa.array([7] * 100, pa.int64()),
        }
    )
    out = rank_by(_ds(t).repartition(4), "v", "id", ntile=4).to_pandas()
    out = out.sort_values("rnk").reset_index(drop=True)
    # hi==lo branch: every row one bucket, ties ranked by id
    assert (out["id"].to_numpy() == np.arange(100)).all()
    assert out.groupby("ntile_4").size().tolist() == [25, 25, 25, 25]


def test_connected_components_empty_edges(ray_session):
    from georay.graph import connected_components

    t = pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    out = connected_components(_ds(t)).to_pandas()
    assert len(out) == 0


def test_domain_mix_weight_over_one(ray_session):
    from georay.sampling import domain_mix

    t = pa.table(
        {
            "id": pa.array(range(200), pa.int64()),
            "grp": pa.array(["g"] * 200, pa.string()),
        }
    )
    out = domain_mix(_ds(t), lambda g: 2.0, "grp", "id").to_pandas()
    assert len(out) == 200  # clamped to keep-everything


def test_tfidf_all_empty_texts(ray_session):
    from georay.textops import tfidf_top_terms

    t = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["", "   "], pa.string()),
        }
    )
    out = tfidf_top_terms(_ds(t)).to_pandas()
    assert len(out) == 0


def test_unigram_logprob_all_empty_texts(ray_session):
    from georay.textops import unigram_logprob

    t = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["", ""], pa.string()),
        }
    )
    out = unigram_logprob(_ds(t)).to_pandas().sort_values("doc_id")
    assert out["n_tokens"].tolist() == [0, 0]
    assert out["logprob_unats"].tolist() == [0, 0]


def test_stratified_sample_single_row_groups(ray_session):
    from georay.sampling import stratified_sample

    t = pa.table(
        {
            "id": pa.array(range(5), pa.int64()),
            "grp": pa.array([f"g{i}" for i in range(5)], pa.string()),
        }
    )
    out = stratified_sample(_ds(t), 3, "grp", "id").to_pandas()
    assert len(out) == 5  # every singleton group keeps its row


def test_rank_by_empty(ray_session):
    from georay.rank import rank_by

    t = pa.table(
        {
            "id": pa.array([], pa.int64()),
            "v": pa.array([], pa.int64()),
            "text": pa.array([], pa.string()),
        }
    )
    out = rank_by(_ds(t), "v", "id", ntile=4)
    assert out.count() == 0
    # schema matches the non-empty path: inputs carried + rnk + ntile
    # (to_pandas drops columns on empty datasets, so check the schema)
    assert set(out.schema().names) == {"id", "v", "text", "rnk", "ntile_4"}


def _empty_docs():
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())}
        )
    )


def test_doc_entropy_empty(ray_session):
    from georay.textops import doc_entropy

    assert doc_entropy(_empty_docs()).count() == 0


def test_bm25_empty_corpus(ray_session):
    from georay.textops import bm25_topk

    out = bm25_topk(_empty_docs(), ("a",), k=3)
    assert out.num_rows == 0
    assert out.column_names == ["rnk", "doc_id", "bm25_micro"]


def test_chunk_texts_all_empty_docs(ray_session):
    from georay.chunk import chunk_texts

    ds = _empty_docs()
    assert chunk_texts(ds).count() == 0


def test_normalize_dedup_empty(ray_session):
    from georay.textops import dedup_normalized, normalize_text

    assert normalize_text(_empty_docs()).count() == 0
    assert dedup_normalized(_empty_docs()).count() == 0


def test_bigram_logprob_single_token_docs(ray_session):
    from georay.textops import bigram_logprob

    t = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["solo", ""], pa.string()),
        }
    )
    out = bigram_logprob(_ds(t)).to_pandas().sort_values("doc_id")
    assert out["n_bigrams"].tolist() == [0, 0]
    assert out["logprob_unats"].tolist() == [0, 0]


def test_dup_substring_spans_all_short(ray_session):
    from georay.textops import dup_substring_spans

    t = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["ab", "c"], pa.string()),
        }
    )
    out = dup_substring_spans(_ds(t), L=20).to_pandas().sort_values("doc_id")
    assert out["n_pos"].tolist() == [0, 0]
    assert out["n_dup"].tolist() == [0, 0]


def test_hopping_window_empty(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from georay.relational import hopping_window_counts

    t = pa.table(
        {
            "event_id": pa.array([], pa.int64()),
            "ts": pa.array([], pa.timestamp("us")),
            "user_id": pa.array([], pa.int64()),
            "event_type": pa.array([], pa.string()),
            "value": pa.array([], pa.float64()),
            "props": pa.array([], pa.string()),
        }
    )
    pq.write_table(t, f"{tmp_path}/events.parquet")
    assert hopping_window_counts(str(tmp_path)).count() == 0


def test_attribution_join_no_purchases(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from georay.relational import attribution_join

    t = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array([10, 20], pa.timestamp("us")),
            "user_id": pa.array([1, 1], pa.int64()),
            "event_type": pa.array(["click", "view"], pa.string()),
            "value": pa.array([1.0, 2.0], pa.float64()),
            "props": pa.array(["", ""], pa.string()),
        }
    )
    pq.write_table(t, f"{tmp_path}/events.parquet")
    assert attribution_join(str(tmp_path)).count() == 0
