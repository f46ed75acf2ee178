"""Driver contract for georay (Ray Data spatial ingest + join + tiling
engine; see SURVEY.md).

The driver initialises Ray BEFORE importing this module; nothing here
(or in georay) calls ray.init()/ray.shutdown().

- entry(): flagship geotag pipeline on the sf0.001-sized deterministic
  pages corpus (BASELINE.json input_hint shape), returns the joined
  Dataset.
- queries(): every implemented operator/pipeline; callables take sf_dir.
- oracle_sql(): DuckDB-equivalent SQL for the SQL-expressible subset,
  including the geo pipelines (the pages corpus + payload grid are
  closed-form deterministic, so SQL recomputes coordinates, containment,
  mercator cells/tiles and layer rollups from first principles against
  the synthesized parquet). Approximate/seeded/binary operators
  (HLL, sampling, simhash, media) remain rows-only + pytest goldens.

Aggregated money/value columns are exact integer units (cents / 1e-4 /
1e-6) on BOTH sides so hashes match regardless of summation order.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

ANN_QUERY_IDS = [0, 1, 2, 3]
ANN_K = 5
NGRAM_TAU = 0.8
PREFIX_TAU = 0.6
EMB_TAU = 0.3


def entry() -> Any:
    from georay.pages import pages_dir_for
    from georay.pipelines.flagship import geotag_pipeline

    pages_path = pages_dir_for("/root/testdata/sf0.001")
    res = geotag_pipeline(pages_path)
    return res["joined"]


# ------------------------------------------------------------- queries


def _blocks_for(path: str) -> int:
    """~64 MB/block, floored at one per CPU (tiny test inputs otherwise
    split into 64+ blocks and every shuffle pays per-block latency)."""
    import os

    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    try:
        nbytes = os.path.getsize(path)
    except OSError:
        nbytes = 1 << 30
    return max(cpus, nbytes // (64 << 20))


def _docs(sf_dir: str):
    import ray.data

    p = f"{sf_dir}/documents.parquet"
    return ray.data.read_parquet(p, override_num_blocks=_blocks_for(p))


def _emb(sf_dir: str):
    import ray.data

    p = f"{sf_dir}/embeddings.parquet"
    return ray.data.read_parquet(p, override_num_blocks=_blocks_for(p))


def _q_pricing(sf_dir):
    from georay.relational import pricing_summary

    return pricing_summary(sf_dir)


def _q_top_orders(sf_dir):
    from georay.relational import top_orders

    return top_orders(sf_dir)


def _q_region_revenue(sf_dir):
    from georay.relational import region_revenue

    return region_revenue(sf_dir)


def _q_events_hourly(sf_dir):
    from georay.relational import events_hourly

    return events_hourly(sf_dir)


def _q_orders_filter_sort(sf_dir):
    from georay.relational import orders_filter_sort

    return orders_filter_sort(sf_dir)


def _q_part_stats(sf_dir):
    from georay.relational import supplier_part_stats

    return supplier_part_stats(sf_dir)


def _q_cust_order_counts(sf_dir):
    from georay.relational import cust_order_counts

    return cust_order_counts(sf_dir)


def _q_mktsegment_stats(sf_dir):
    from georay.relational import mktsegment_stats

    return mktsegment_stats(sf_dir)


def _q_priority_line_counts(sf_dir):
    from georay.relational import priority_line_counts

    return priority_line_counts(sf_dir)


def _q_top_orders_per_segment(sf_dir):
    from georay.relational import top_orders_per_segment

    return top_orders_per_segment(sf_dir)


def _q_daily_active_users(sf_dir):
    from georay.relational import daily_active_users

    return daily_active_users(sf_dir)


def _q_orders_by_month(sf_dir):
    from georay.relational import orders_by_month

    return orders_by_month(sf_dir)


def _q_customer_name_match(sf_dir):
    from georay.relational import customer_name_match

    return customer_name_match(sf_dir)


def _q_event_sessions(sf_dir):
    from georay.relational import event_session_assignment

    return event_session_assignment(sf_dir)


def _q_asof_last_order(sf_dir):
    from georay.relational import asof_last_order

    return asof_last_order(sf_dir)


def _q_user_sessions(sf_dir):
    from georay.relational import user_sessions

    return user_sessions(sf_dir)


def _q_sample_orders(sf_dir):
    """Deterministic uniform sample without replacement: priority is
    the sha256-prefix key hash, so the SQL oracle recomputes the exact
    sample; uniformity pinned by tests/test_sampling.py."""
    import ray.data

    from georay.sampling import sample_without_replacement

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )
    return sample_without_replacement(orders, 100, "o_orderkey", seed=42)


def _q_weighted_sample(sf_dir):
    """Efraimidis-Spirakis weighted sample without replacement
    (priority u^(1/w) in log space, u from the seeded sha256 key hash
    so the SQL oracle replays the identical race); weight =
    o_totalprice (georay/sampling.py sample_without_replacement)."""
    import ray.data

    from georay.sampling import sample_without_replacement

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )
    return sample_without_replacement(
        orders, 100, "o_orderkey", seed=42, weight_col="o_totalprice"
    )


def _q_price_band_pairs(sf_dir):
    """Cross-key band join: order pairs with |totalprice| difference
    under 2.0, via the replicate-to-adjacent-band plan
    (georay/relational.py price_band_pairs)."""
    from georay.relational import price_band_pairs

    return price_band_pairs(sf_dir)


def _q_key_skew_profile(sf_dir):
    """Key-skew observability: exact integer Gini + p50/p90/max of the
    per-user event-count distribution — the pre-shuffle diagnostic a
    salting decision reads (georay/relational.py key_skew_profile)."""
    from georay.relational import key_skew_profile

    return key_skew_profile(sf_dir)


def _q_join_size_estimate(sf_dir):
    """Exact join-cardinality profile (orders x events on custkey):
    output size, shared keys, hottest key — the planner stat read
    before broadcast/bucket/salt (georay/relational.py
    join_size_estimate)."""
    from georay.relational import join_size_estimate

    return join_size_estimate(sf_dir)


def _q_top_users_by_active_days(sf_dir):
    """Per event type the top-5 users by DISTINCT active days with
    rank — exact distinct-count + per-group top-k window in one
    user-co-located pass (georay/relational.py
    top_users_by_active_days)."""
    from georay.relational import top_users_by_active_days

    return top_users_by_active_days(sf_dir)


def _q_value_concentration(sf_dir):
    """Per event type the share of total value contributed by its
    top-10 users — the Lorenz/iceberg concentration stat, exact
    integer micro-units (georay/relational.py value_concentration)."""
    from georay.relational import value_concentration

    return value_concentration(sf_dir)


def _q_salted_join_sample(sf_dir):
    """Skew-salted audit sample of the many-to-many events x orders join
    (user_id = o_custkey): per event type the exact pair count plus the
    count and price mass of a deterministic hash-sampled pair subset —
    hot keys get their own salted partition range so the heaviest key
    fans over n_salts tasks (georay/relational.py salted_join_sample)."""
    from georay.relational import salted_join_sample

    return salted_join_sample(sf_dir)


def _q_term_drift(sf_dir):
    """Split-drift statistic: smoothed integer rate ratio of each
    term between even/odd doc_id halves (georay/textops.py
    term_drift)."""
    from georay.textops import term_drift

    return term_drift(_docs(sf_dir))


def _q_hll_overlap(sf_dir):
    """Pairwise audience overlap between event types from mergeable
    per-type HLL registers (inclusion-exclusion on the register-max
    union; georay/sketch.py hll_overlap). Deterministic sketch -> full
    SQL register replay."""
    import ray.data

    from georay.sketch import hll_overlap

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    )
    return hll_overlap(ds, "event_type", "user_id")


def _q_approx_users_by_type(sf_dir):
    """HyperLogLog per-group approximate COUNT(DISTINCT). The sketch is
    deterministic (splitmix64 + fixed p=12 registers), so it has a full
    SQL oracle that replays the hash and estimator in DuckDB; accuracy
    (<7% vs exact) is pinned by tests/test_sketch.py."""
    import ray.data

    from georay.sketch import grouped_approx_distinct

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "user_id"])
    return grouped_approx_distinct(ds, "event_type", "user_id")


def _q_dedup_exact(sf_dir):
    from georay.textops import dedup_exact

    return dedup_exact(_docs(sf_dir))


def _q_rolling_event_sums(sf_dir):
    from georay.relational import rolling_event_sums

    return rolling_event_sums(sf_dir)


def _q_customers_without_urgent(sf_dir):
    from georay.relational import customers_without_urgent_orders

    return customers_without_urgent_orders(sf_dir)


def _q_approx_price_quantiles(sf_dir):
    """Histogram quantile sketch over order totals: O(n_bins) memory
    at any scale; deterministic (not probabilistic), so even the
    approximate answer is oracle-verifiable."""
    import ray.data

    from georay.sketch import approx_quantiles

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_totalprice"]
    )
    return approx_quantiles(orders, "o_totalprice", qs=(0.5, 0.9, 0.99))


def _q_order_price_quantiles(sf_dir):
    from georay.relational import order_price_quantiles

    return order_price_quantiles(sf_dir)


def _q_top_words(sf_dir):
    from georay.textops import top_words

    return top_words(_docs(sf_dir), k=50)


def _q_vocab_ids(sf_dir):
    """Tokenizer vocabulary: top-64 corpus words with contiguous ids in
    (count desc, word asc) order."""
    from georay.textops import vocab_ids

    return vocab_ids(_docs(sf_dir), vocab_size=64)


def _q_token_counts(sf_dir):
    from georay.textops import token_counts

    return token_counts(_docs(sf_dir))


def _q_quality_counts(sf_dir):
    from georay.textops import quality_counts

    return quality_counts(_docs(sf_dir))


def _q_chunk_texts(sf_dir):
    from georay.chunk import chunk_texts

    return chunk_texts(_docs(sf_dir), window=32, overlap=8)


def _q_doc_entropy(sf_dir):
    from georay.textops import doc_entropy

    return doc_entropy(_docs(sf_dir))


BM25_TERMS = ("hash", "join", "vector")


def _q_bm25_topk(sf_dir):
    from georay.textops import bm25_topk

    return bm25_topk(_docs(sf_dir), BM25_TERMS, k=20)


def _q_ngram_jaccard(sf_dir):
    from georay.textops import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_docs(sf_dir), threshold=NGRAM_TAU)


def _q_minhash_near_dups(sf_dir):
    from georay.textops import minhash_near_dups

    return minhash_near_dups(_docs(sf_dir), threshold=NGRAM_TAU)


def _q_ngram_novelty(sf_dir):
    """Per-doc corpus-unique-bigram novelty permille
    (georay/textops.py ngram_novelty)."""
    from georay.textops import ngram_novelty

    return ngram_novelty(_docs(sf_dir))


def _q_keep_first_shingles(sf_dir):
    """C4-style 'retain the first copy' dedup accounting at bigram
    granularity: per doc, how many positional shingle instances are
    the globally FIRST occurrence of their shingle by (doc_id, pos)
    (georay/textops.py keep_first_shingles)."""
    from georay.textops import keep_first_shingles

    return keep_first_shingles(_docs(sf_dir))


def _q_containment_join(sf_dir):
    """Exact overlap-coefficient (containment/quote) self-join at
    tau=0.8: pairs with |A∩B|/min(|A|,|B|) >= t over word bigrams,
    with exact intersection and min-side counts (georay/textops.py
    containment_join)."""
    from georay.textops import containment_join

    return containment_join(_docs(sf_dir), threshold=0.8)


def _q_jaccard_prefix_join(sf_dir):
    """Exact AllPairs prefix-filtered Jaccard self-join at tau=0.6
    with exact intersection/union counts (georay/textops.py
    jaccard_prefix_join)."""
    from georay.textops import jaccard_prefix_join

    return jaccard_prefix_join(_docs(sf_dir), threshold=PREFIX_TAU)


def _q_simhash(sf_dir):
    from georay.textops import simhash_table

    return simhash_table(_docs(sf_dir))


def _q_simhash_near_dups(sf_dir):
    from georay.textops import simhash_near_dups

    return simhash_near_dups(_docs(sf_dir), radius=3)


def _q_langid(sf_dir):
    from georay.textops import langid_table

    return langid_table(_docs(sf_dir))


def _q_quality_scores(sf_dir):
    from georay.textops import quality_scores

    return quality_scores(_docs(sf_dir))


def _q_fingerprints(sf_dir):
    from georay.textops import fingerprint_rows

    return fingerprint_rows(_docs(sf_dir))


def _q_scrub_text(sf_dir):
    from georay.textops import scrub_text

    return scrub_text(_docs(sf_dir))


def _q_normalize_text(sf_dir):
    from georay.textops import normalize_text

    return normalize_text(_docs(sf_dir))


def _q_dedup_normalized(sf_dir):
    from georay.textops import dedup_normalized

    return dedup_normalized(_docs(sf_dir))


def _q_doc_repetition(sf_dir):
    from georay.textops import doc_repetition

    return doc_repetition(_docs(sf_dir))


def _q_boilerplate_segments(sf_dir):
    """CCNet-style corpus-frequency boilerplate: per-doc count/ratio of
    4-token segments occurring in >= 3 distinct documents (co-partitioned
    df resolution, no broadcast)."""
    from georay.textops import boilerplate_segments

    return boilerplate_segments(_docs(sf_dir), window=4, min_df=3)


def _q_url_host_stats(sf_dir):
    import ray.data

    from georay.pages import pages_dir_for
    from georay.textops import url_host_stats

    pages = ray.data.read_parquet(pages_dir_for(sf_dir), columns=["url", "lang"])
    return url_host_stats(pages)


def _q_dataset_split(sf_dir):
    """Deterministic hash-threshold train/val/test assignment
    (georay/textops.py dataset_split)."""
    from georay.textops import dataset_split

    return dataset_split(_docs(sf_dir))


def _q_url_bpe_tokens(sf_dir):
    """Top-40 GPT-2-style regex pre-tokens over the crawl URLs
    (georay/textops.py url_bpe_tokens)."""
    import ray.data

    from georay.pages import pages_dir_for
    from georay.textops import url_bpe_tokens

    pages = ray.data.read_parquet(pages_dir_for(sf_dir), columns=["url"])
    return url_bpe_tokens(pages)


def _q_decontam_ngrams(sf_dir):
    from georay.textops import decontam_ngrams

    return decontam_ngrams(_docs(sf_dir), n=3)


def _q_quality_filter(sf_dir):
    from georay.textops import quality_filter

    return quality_filter(_docs(sf_dir))


def _q_pack_sequences(sf_dir):
    """Distributed prefix-sum sequence packing: per-doc start offset in
    the doc_id-ordered concatenated token stream + 4096-token shard id
    (georay/packing.py)."""
    from georay.packing import pack_sequences

    return pack_sequences(_docs(sf_dir), budget=4096)


def _q_stratified_sample(sf_dir):
    """Per-language uniform sample of 20 docs (seeded sha256-prefix
    priorities, per-group top-k partials; georay/sampling.py)."""
    from georay.sampling import stratified_sample

    return stratified_sample(
        _docs(sf_dir).select_columns(["doc_id", "lang"]), 20, "lang", "doc_id", seed=7
    )


def _q_domain_cap(sf_dir):
    """Per-source document quota: keep at most 12 docs per source
    ranked by (n_chars DESC, doc_id ASC) — the RefinedWeb-style
    absolute domain cap (georay/sampling.py domain_cap)."""
    from georay.sampling import domain_cap

    return domain_cap(
        _docs(sf_dir).select_columns(["doc_id", "source", "n_chars"]),
        group_col="source",
        key_col="doc_id",
        rank_col="n_chars",
        cap=12,
    )


def _q_domain_mix(sf_dir):
    """Weighted per-source Bernoulli downsample (even sources keep 75%,
    odd 25%) — exact integer hash-threshold compare, shuffle-free."""
    from georay.sampling import domain_mix

    def weight_of(src: str) -> float:
        return 0.75 if int(src[3:]) % 2 == 0 else 0.25

    return domain_mix(
        _docs(sf_dir).select_columns(["doc_id", "source"]),
        weight_of,
        "source",
        "doc_id",
        seed=11,
    )


def _q_user_event_deltas(sf_dir):
    """LAG window: per user in (ts, event_id) order, microseconds and
    cents-value delta since the previous event (georay/relational.py)."""
    from georay.relational import user_event_deltas

    return user_event_deltas(sf_dir)


def _q_mad_outliers(sf_dir):
    """Per-supplier robust price profile — exact integer 2x-median /
    4x-MAD order statistics and the 1.5-MAD Tukey fence count
    (georay/relational.py mad_outliers)."""
    from georay.relational import mad_outliers

    return mad_outliers(sf_dir)


def _q_event_transitions(sf_dir):
    """Markov transition counts over per-user event sequences
    (georay/relational.py event_transitions): one bucket shuffle,
    integer-packed pair collapse per worker, tiny_key_sum finish."""
    from georay.relational import event_transitions

    return event_transitions(sf_dir)


def _q_user_event_zscores(sf_dir):
    from georay.relational import user_event_zscores

    return user_event_zscores(sf_dir)


def _q_part_pair_counts(sf_dir):
    from georay.relational import part_pair_counts

    return part_pair_counts(sf_dir, min_orders=2)


def _q_funnel_users(sf_dir):
    from georay.relational import funnel_users

    return funnel_users(sf_dir)


def _q_rolling_time_sums(sf_dir):
    from georay.relational import rolling_time_sums

    return rolling_time_sums(sf_dir)


def _q_hopping_window_counts(sf_dir):
    """Hopping/sliding window counts (1h span, 15min hop) per event
    type (georay/relational.py hopping_window_counts)."""
    from georay.relational import hopping_window_counts

    return hopping_window_counts(sf_dir)


def _q_attribution_join(sf_dir):
    """Interval join: purchases x same-user events in the trailing 24h,
    strictly before (georay/relational.py attribution_join)."""
    from georay.relational import attribution_join

    return attribution_join(sf_dir)


def _q_orders_rollup(sf_dir):
    from georay.relational import orders_rollup

    return orders_rollup(sf_dir)


def _q_orders_cube(sf_dir):
    """GROUP BY CUBE subtotals over one fact scan
    (georay/relational.py orders_cube)."""
    from georay.relational import orders_cube

    return orders_cube(sf_dir)


def _q_weekly_retention(sf_dir):
    from georay.relational import weekly_retention

    return weekly_retention(sf_dir)


def _q_curriculum_pack(sf_dir):
    """Curriculum pipeline composition: unigram-LM score -> global
    rank by (logprob_unats, doc_id) -> prefix-sum packing of the
    rank-ordered token stream into 4096-token shards (textops ->
    rank.rank_by -> packing.pack_by_rank)."""
    from georay.packing import pack_by_rank
    from georay.rank import rank_by
    from georay.textops import unigram_logprob

    scored = unigram_logprob(_docs(sf_dir))
    ranked = rank_by(scored, "logprob_unats", "doc_id")
    return pack_by_rank(ranked, budget=4096)


def _q_curate_corpus(sf_dir):
    """End-to-end corpus curation: quality filter -> normalized dedup
    -> rank -> 4096-token packing (georay/textops.py curate_corpus)."""
    from georay.textops import curate_corpus

    return curate_corpus(_docs(sf_dir))


def _q_ccnet_buckets(sf_dir):
    """CCNet-style head/middle/tail quality buckets: per-token mean
    unigram-LM score (micro-nats) -> global NTILE(3), bucket 1 = most
    corpus-like (head). Composition: textops.unigram_logprob ->
    rank.rank_by(ntile=3)."""
    import numpy as np
    import pyarrow as pa

    from georay.rank import rank_by
    from georay.textops import unigram_logprob

    scored = unigram_logprob(_docs(sf_dir))

    def mean_row(t):
        n = t["n_tokens"].to_numpy(zero_copy_only=False)
        lp = t["logprob_unats"].to_numpy(zero_copy_only=False)
        keep = n > 0
        mean = np.floor(lp[keep] / n[keep]).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(
                    t["doc_id"].to_numpy(zero_copy_only=False)[keep], pa.int64()
                ),
                "mean_unats": pa.array(mean, pa.int64()),
                # rank_by orders ASC; negate so bucket 1 = highest score
                "neg_mean": pa.array(-mean, pa.int64()),
            }
        )

    ranked = rank_by(
        scored.map_batches(mean_row, batch_format="pyarrow"),
        "neg_mean",
        "doc_id",
        ntile=3,
    )

    def out(t):
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "mean_unats": t["mean_unats"],
                "bucket": t["ntile_3"].cast(pa.int64()),
            }
        )

    return ranked.map_batches(out, batch_format="pyarrow")


def _q_hard_negatives(sf_dir):
    """Contrastive hard negatives: top-k cosine among DIFFERENT-label
    vectors per query (georay/ann.py hard_negatives)."""
    from georay.ann import hard_negatives

    return hard_negatives(_emb(sf_dir), ANN_QUERY_IDS, k=ANN_K)


def _q_pmi_collocations(sf_dir):
    """Top-20 bigram collocations by PMI (integer micro-nats;
    georay/textops.py)."""
    from georay.textops import pmi_collocations

    return pmi_collocations(_docs(sf_dir), k=20, min_count=5)


def _q_doc_rank_ntile(sf_dir):
    """Exact global row_number + NTILE(10) over (n_chars, doc_id) —
    distributed rank via histogram range buckets (georay/rank.py)."""
    from georay.rank import rank_by

    return rank_by(
        _docs(sf_dir).select_columns(["doc_id", "n_chars"]),
        "n_chars",
        "doc_id",
        ntile=10,
    )


def _q_unigram_logprob(sf_dir):
    """Per-doc log-prob under the corpus unigram LM, in integer
    micro-nats (order-independent int64 sums; georay/textops.py)."""
    from georay.textops import unigram_logprob

    return unigram_logprob(_docs(sf_dir))


def _q_dup_substring_spans(sf_dir):
    """Exact-substring duplicate positions per doc (Lee et al. 2022
    suffix-array criterion; georay/textops.py dup_substring_spans)."""
    from georay.textops import dup_substring_spans

    return dup_substring_spans(_docs(sf_dir))


def _q_bigram_logprob(sf_dir):
    """Per-doc log-prob under the corpus bigram LM (KenLM-style
    perplexity quality filter), in integer micro-nats
    (georay/textops.py bigram_logprob)."""
    from georay.textops import bigram_logprob

    return bigram_logprob(_docs(sf_dir))


def _q_dedup_clusters(sf_dir):
    """Near-dup CLUSTER ids: MinHash+LSH pairs -> distributed connected
    components (BSP min-label propagation with pointer doubling;
    georay/graph.py). cluster_id = min doc_id of the component."""
    from georay.graph import dedup_clusters

    return dedup_clusters(_docs(sf_dir))


def _q_cluster_representatives(sf_dir):
    """Keep-one-per-cluster: longest member (max n_chars, tie min
    doc_id) of every near-dup cluster, with member counts — bucketed
    length join + one hash-bucketed argmax groupby (georay/graph.py)."""
    import ray.data

    from georay.graph import cluster_representatives

    lens = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )
    return cluster_representatives(_docs(sf_dir), lens)


def _q_tfidf_top_terms(sf_dir):
    """Per-doc top-3 keywords by TF-IDF (vocab-bounded broadcast df
    table + per-batch scoring; georay/textops.py)."""
    from georay.textops import tfidf_top_terms

    return tfidf_top_terms(_docs(sf_dir), k=3)


def _q_ann_topk(sf_dir):
    from georay.textops import ann_topk

    return ann_topk(_emb(sf_dir), ANN_QUERY_IDS, k=ANN_K)


def _q_emb_near_dups(sf_dir):
    from georay.textops import embedding_near_dups

    return embedding_near_dups(_emb(sf_dir), threshold=EMB_TAU)


def _q_knn_label_vote(sf_dir):
    from georay.ann import knn_label_vote

    return knn_label_vote(_emb(sf_dir), ANN_QUERY_IDS, k=ANN_K)


def _q_label_centroids(sf_dir):
    from georay.ann import label_centroids

    return label_centroids(_emb(sf_dir))


def _q_embedding_clusters(sf_dir):
    from georay.ann import cluster_assign_fixed

    return cluster_assign_fixed(_emb(sf_dir), k=8)


def _q_ann_topk_ivf(sf_dir):
    from georay.ann import ann_topk_ivf

    return ann_topk_ivf(_emb(sf_dir), ANN_QUERY_IDS, k=ANN_K, n_clusters=8, nprobe=8)


def _q_ann_topk_lsh(sf_dir):
    """LSH-bucketed approximate cosine top-k: sign-bit band signatures
    gate candidates, exact cosine ranks them (georay/ann.py
    ann_topk_lsh)."""
    from georay.ann import ann_topk_lsh

    return ann_topk_lsh(_emb(sf_dir), ANN_QUERY_IDS, k=ANN_K, n_planes=16, n_bands=4)


def _q_ann_topk_pq(sf_dir):
    """PQ-scored approximate top-k (IVF-PQ retrieval half): integer
    lookup-table distances, deterministic cross-engine."""
    from georay.ann import ann_topk_pq

    return ann_topk_pq(_emb(sf_dir), ANN_QUERY_IDS, k=ANN_K, n_codes=8, n_sub=2)


def _q_pq_encode(sf_dir):
    """Product-quantization codes (2 subspaces, 8 deterministic codes):
    the IVF-PQ compression half of the ANN scale path."""
    from georay.ann import pq_encode

    return pq_encode(_emb(sf_dir), n_codes=8, n_sub=2)


def _q_dsir_weights(sf_dir):
    """DSIR importance weights toward the lang='en' slice
    (georay/textops.py dsir_weights)."""
    from georay.textops import dsir_weights

    return dsir_weights(_docs(sf_dir), target_lang="en")


def _q_embedding_pca(sf_dir):
    """Top principal direction by 5-superstep power iteration + per-vec
    projection (georay/ann.py power_pca)."""
    from georay.ann import power_pca

    return power_pca(_emb(sf_dir), n_iters=5)


def _q_oov_rate(sf_dir):
    """Per-doc OOV fraction vs the top-25 corpus vocab (georay/textops.py
    oov_rate) — tokenizer-coverage scoring."""
    from georay.textops import oov_rate

    return oov_rate(_docs(sf_dir), vocab_size=25)


def _q_kmeans_iter(sf_dir):
    """Distributed Lloyd k-means training, 3 supersteps (georay/ann.py
    kmeans_iter); output = final assignment vs the trained centroids."""
    from georay.ann import kmeans_iter

    return kmeans_iter(_emb(sf_dir), k=8, n_iters=3)


def _q_semantic_dedup(sf_dir):
    """SemDeDup (cluster, then prune within-cluster cosine near-dups;
    georay/ann.py semantic_dedup). tau matches EMB_TAU so the synthetic
    near-orthogonal embeddings produce a real pruned set."""
    from georay.ann import semantic_dedup

    return semantic_dedup(_emb(sf_dir), k=8, thresh_micro=int(EMB_TAU * 1_000_000))


def _q_graph_pagerank(sf_dir):
    """Integer-exact PageRank (5 supersteps) over the customer-supplier
    interaction multigraph — the iterative numeric BSP operator
    (georay/graph.py pagerank)."""
    from georay.graph import pagerank, supplier_customer_edges

    return pagerank(supplier_customer_edges(sf_dir), n_iters=5)


def _q_hits_scores(sf_dir):
    """HITS hubs/authorities over the directed customer->supplier
    interaction multigraph (georay/graph.py hits); integer L-inf
    normalization makes every iterate exact."""
    import pyarrow.compute as _pc

    from georay.graph import hits, supplier_customer_edges

    # supplier_customer_edges emits both directions; HITS wants the
    # directed bipartite half (customers = even ids = hubs)
    directed = supplier_customer_edges(sf_dir).map_batches(
        lambda t: t.filter(_pc.equal(_pc.bit_wise_and(t["src"], 1), 0)),
        batch_format="pyarrow",
    )
    return hits(directed, n_iters=4)


def _q_hits_full(sf_dir):
    """HITS with the lossless {node, hub, authority} schema
    (both_scores=True) — the general-directed-graph API where a node
    holding both roles keeps both scores (ADVICE r04)."""
    import pyarrow.compute as _pc

    from georay.graph import hits, supplier_customer_edges

    directed = supplier_customer_edges(sf_dir).map_batches(
        lambda t: t.filter(_pc.equal(_pc.bit_wise_and(t["src"], 1), 0)),
        batch_format="pyarrow",
    )
    return hits(directed, n_iters=4, both_scores=True)


def _q_label_propagation(sf_dir):
    """Semi-supervised label propagation: nation labels seeded on the
    10% of customers with custkey % 10 == 0 spread 3 synchronous
    plurality rounds across the cust<->supp interaction multigraph
    (georay/graph.py label_propagation)."""
    import pyarrow.compute as _pc

    from georay.graph import label_propagation, supplier_customer_edges
    from georay.relational import _read

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])

    def to_seeds(t):
        import numpy as _np
        import pyarrow as _pa

        ck = t["c_custkey"].to_numpy(zero_copy_only=False).astype(_np.int64)
        nk = t["c_nationkey"].to_numpy(zero_copy_only=False).astype(_np.int64)
        m = ck % 10 == 0
        return _pa.table(
            {
                "node": _pa.array(ck[m] * 2, _pa.int64()),
                "label": _pa.array(nk[m], _pa.int64()),
            }
        )

    seeds = cust.map_batches(to_seeds, batch_format="pyarrow")
    return label_propagation(supplier_customer_edges(sf_dir), seeds, n_iters=3)


def _q_personalized_pagerank(sf_dir):
    """Personalized PageRank seeded on the BUILDING-segment customer
    nodes over the cust<->supp interaction multigraph (georay/graph.py
    pagerank(source_nodes=...)); integer-nano exact like
    graph_pagerank."""
    import pyarrow.compute as _pc

    from georay.graph import pagerank, supplier_customer_edges
    from georay.relational import _read

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    keys = cust.map_batches(
        lambda t: t.filter(_pc.equal(t["c_mktsegment"], "BUILDING")).select(
            ["c_custkey"]
        ),
        batch_format="pyarrow",
    ).to_pandas()["c_custkey"].to_numpy()
    return pagerank(
        supplier_customer_edges(sf_dir), n_iters=5, source_nodes=keys * 2
    )


def _q_triangle_counts(sf_dir):
    """Per-node triangle counts over the part co-order graph
    (part_pair_counts edges, min_orders=2) via degree-ordered wedge
    generation + edge-key co-partition (georay/graph.py
    triangle_counts)."""
    from georay.graph import triangle_counts
    from georay.relational import part_pair_counts

    return triangle_counts(part_pair_counts(sf_dir, min_orders=2))


def _q_bloom_semi_join(sf_dir):
    """Bloom-filter join pruning: broadcast 128 KiB bitmap prunes the
    lineitem scan before one co-partitioned confirm+aggregate shuffle
    (georay/relational.py bloom_semi_join). Result is the exact
    semi-join aggregate — the filter only prunes."""
    from georay.relational import bloom_semi_join

    return bloom_semi_join(sf_dir, min_size=48)


def _q_part_skyline(sf_dir):
    """Pareto frontier of parts on (price low, size high): local
    vectorized skyline sweep per block + remote skyline-merge fan-in
    tree (georay/relational.py part_skyline)."""
    from georay.relational import part_skyline

    return part_skyline(sf_dir)


def _q_props_rollup(sf_dir):
    """JSON property extraction + per-type rollup over events.props
    (georay/relational.py props_rollup); one Arrow extract_regex
    kernel, no per-row parsing."""
    from georay.relational import props_rollup

    return props_rollup(sf_dir)


def _q_mutual_knn(sf_dir):
    """Mutual (reciprocal) k-NN pairs over the embedding table at k=5
    (georay/ann.py mutual_knn)."""
    from georay.ann import mutual_knn

    return mutual_knn(_emb(sf_dir), k=5)


def _q_mutual_knn_ivf(sf_dir):
    """Sub-quadratic mutual k-NN: IVF-gated candidates (first-8-vector
    cells, nprobe=2) + the exact top-k/mutuality folds
    (georay/ann.py mutual_knn_ivf; VERDICT r04 #1)."""
    from georay.ann import mutual_knn_ivf

    return mutual_knn_ivf(_emb(sf_dir), k=5, n_cells=8, nprobe=2)


def _q_grouped_price_quantiles(sf_dir):
    """Per-priority approximate order-price quantiles via the grouped
    mergeable histogram sketch (georay/sketch.py
    grouped_approx_quantiles); deterministic upper-bin-edge contract,
    so even the approximation is oracle-verifiable."""
    import ray.data

    from georay.sketch import grouped_approx_quantiles

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderpriority", "o_totalprice"]
    )
    return grouped_approx_quantiles(
        orders, "o_orderpriority", "o_totalprice", qs=(0.5, 0.9), n_bins=512
    )


def _q_user_drawdown(sf_dir):
    """Per-user max peak-to-trough drawdown of the event-value series
    (georay/relational.py user_drawdown) — segmented running-max scan,
    one bucketed shuffle."""
    from georay.relational import user_drawdown

    return user_drawdown(sf_dir)


def _q_seeded_shuffle(sf_dir):
    """Deterministic global shuffle order via splitmix64(doc_id ^ seed)
    rank (georay/textops.py seeded_shuffle)."""
    from georay.textops import seeded_shuffle

    return seeded_shuffle(_docs(sf_dir), seed=42)


def _q_orders_pivot(sf_dir):
    """Month x priority wide pivot via packed-code bincount partials +
    tiny month fold (georay/relational.py orders_pivot)."""
    from georay.relational import orders_pivot

    return orders_pivot(sf_dir)


def _q_greedy_coverage(sf_dir):
    """Greedy max-coverage selection of 5 docs by marginal distinct-
    bigram gain (georay/textops.py greedy_coverage)."""
    from georay.textops import greedy_coverage

    return greedy_coverage(_docs(sf_dir), k=5)


def _q_linreg_train(sf_dir):
    """Distributed exact-integer full-batch GD linear regression, 5
    rounds (georay/textops.py linreg_train); output = per-doc
    prediction + residual in nano-units under the trained weights."""
    from georay.textops import linreg_train

    return linreg_train(_docs(sf_dir), n_rounds=5)


def _q_kcenter_sample(sf_dir):
    """Greedy farthest-point diversity sample of 8 embedding vectors
    (georay/ann.py kcenter_sample); oracle unrolls the 7 selection
    rounds with the same 1e-4 distance quantization."""
    from georay.ann import kcenter_sample

    return kcenter_sample(_emb(sf_dir), k=8)


def _q_common_neighbors(sf_dir):
    """Top-20 predicted links (non-edge pairs by common-neighbor
    count) over the part co-order graph (georay/graph.py
    common_neighbors_topk)."""
    from georay.graph import common_neighbors_topk
    from georay.relational import part_pair_counts

    return common_neighbors_topk(part_pair_counts(sf_dir, min_orders=2), k=20)


def _q_kcore(sf_dir):
    """3-core of the part co-order graph via distributed iterative
    peeling (georay/graph.py kcore); oracle unrolls 16 peel rounds
    (fixpoint at sf0.01 is 10 rounds; extra rounds are idempotent)."""
    from georay.graph import kcore
    from georay.relational import part_pair_counts

    return kcore(part_pair_counts(sf_dir, min_orders=2), k=3)


def _q_hash_features(sf_dir):
    """Signed 16-dim feature-hashing vectors per doc, sparse explosion
    (georay/textops.py hash_features)."""
    from georay.textops import hash_features

    return hash_features(_docs(sf_dir), n_dims=16)


def _q_temperature_mix(sf_dir):
    """alpha=1/2 temperature-scaled per-source sampling weights
    (georay/textops.py temperature_mix) — integer-quantized sqrt
    numerators, integer-division ppm weights."""
    from georay.textops import temperature_mix

    return temperature_mix(_docs(sf_dir), alpha_num=1, alpha_den=2)


def _q_kwic_snippets(sf_dir):
    """Keyword-in-context span extraction for 'vector' (+-20 chars),
    vectorized buffer gather (georay/textops.py kwic_snippets)."""
    from georay.textops import kwic_snippets

    return kwic_snippets(_docs(sf_dir), term="vector", window=20)


def _q_moss_pairs(sf_dir):
    """MOSS shared-fingerprint pair detection: document pairs sharing
    >= 2 distinct winnowed fingerprints (df <= 50 noise filter), exact
    shared counts (georay/textops.py moss_pairs)."""
    from georay.textops import moss_pairs

    return moss_pairs(_docs(sf_dir))


CMS_TERMS = ("data", "hash", "join", "the", "vector", "zzz_absent")


def _q_countmin(sf_dir):
    """Count-Min sketch point queries: CMS estimate vs exact count for
    a fixed term set, depth=4 width=1024, mergeable sum partials
    (georay/sketch.py countmin_counts)."""
    from georay.sketch import countmin_counts

    return countmin_counts(_docs(sf_dir), CMS_TERMS, depth=4, width=1024)


def _q_bpe_merges(sf_dir):
    """BPE vocabulary induction (Sennrich et al. 2016): the top-4
    byte-pair merges over the corpus word-frequency table, distributed
    pair-count partials per iteration (georay/textops.py bpe_merges)."""
    from georay.textops import bpe_merges

    return bpe_merges(_docs(sf_dir), k=4)


def _q_bpe_encode(sf_dir):
    """Train-then-segment: learn 4 BPE merges distributed, one more
    corpus pass applies them per doc — doc_id, n_words, n_bpe_tokens
    (georay/textops.py bpe_encode)."""
    from georay.textops import bpe_encode

    return bpe_encode(_docs(sf_dir), k=4)


def _q_association_rules(sf_dir):
    """Association-rule mining over order baskets: directed rules with
    exact integer support/confidence/lift, top-50 by lift
    (georay/relational.py association_rules)."""
    from georay.relational import association_rules

    return association_rules(sf_dir, min_support=3, k=50)


def _q_rrf_fusion(sf_dir):
    """Hybrid-retrieval reciprocal-rank fusion of the BM25 lexical
    ranking and query-0's dense cosine ranking (georay/textops.py
    rrf_fusion): integer 1e9/(60+rank) contributions, k=20 both."""
    from georay.textops import rrf_fusion

    return rrf_fusion(_docs(sf_dir), _emb(sf_dir), BM25_TERMS, query_id=0, k=20)


def _q_grouped_heavy_hitters(sf_dir):
    """Per-language frequency-threshold heavy hitters (count*30 >
    in-group total; georay/textops.py grouped_heavy_hitters) — the
    per-group Misra-Gries mergeable-summary fan-in, O(k*G) driver rows."""
    from georay.textops import grouped_heavy_hitters

    return grouped_heavy_hitters(_docs(sf_dir), group_col="lang", k=30)


def _q_heavy_hitters(sf_dir):
    """Misra-Gries frequency-threshold heavy hitters (count*30 > corpus
    total; georay/textops.py heavy_hitters) — mergeable-summary fan-in,
    driver sees O(k) rows."""
    from georay.textops import heavy_hitters

    return heavy_hitters(_docs(sf_dir), k=30)


def _q_quality_logreg(sf_dir):
    """Hash-derived linear quality-classifier inference (georay/
    textops.py quality_logreg): order-free integer token-weight sums,
    label = score > 0."""
    from georay.textops import quality_logreg

    return quality_logreg(_docs(sf_dir))


def _q_image_ahash_dups(sf_dir):
    """Perceptual-hash (4x4 aHash) image near-dup groups — multimodal
    dedup (georay/multimodal.py image_ahash_dups)."""
    from georay.multimodal import image_ahash_dups

    return image_ahash_dups(_media(sf_dir))


# multimodal (deterministic GRB media corpus). The GRB container is a
# plain header + raw bytes, so DuckDB can replay the decoders byte-by-
# byte (hex(payload) + substring + '0x' cast over a generate_series):
# audio_features, video_frames, image_stats and audio_stats carry full
# SQL oracles. image_features keeps list columns in the LIBRARY op
# (pipeline use); its driver projection joins each list into a
# comma-separated string of integer micro-units (exact integer-sum
# means; stds quantized the same way image_stats rounds to 6 dp), so
# the hash gate can compare it too — lists themselves stringify
# differently numpy-vs-python in the driver's hash.


def _media(sf_dir):
    import ray.data

    from georay.multimodal import media_dir_for

    return ray.data.read_parquet(media_dir_for(sf_dir))


def _q_image_features(sf_dir):
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from georay.multimodal import image_features

    feats = image_features(_media(sf_dir)).drop_columns(["thumb"])

    def project(t: pa.Table) -> pa.Table:
        # list<float> -> "m0,m1,..." of micro-unit ints, one string per
        # image: floor(x*1e6+0.5) is exact for the integer-sum means and
        # matches the DuckDB side's identical quantization for the stds
        cols = {c: t[c] for c in ("media_id", "width", "height", "channels")}
        for col in ("chan_mean", "chan_std"):
            arr = t[col].combine_chunks()
            flat = pc.list_flatten(arr).to_numpy(zero_copy_only=False)
            micro = np.floor(flat * 1e6 + 0.5).astype(np.int64).astype("U")
            offs = arr.offsets.to_numpy(zero_copy_only=False)
            cols[f"{col}_micro"] = pa.array(
                [",".join(micro[offs[i] : offs[i + 1]]) for i in range(t.num_rows)],
                pa.string(),
            )
        return pa.table(cols)

    return feats.map_batches(project, batch_format="pyarrow")


def _q_audio_features(sf_dir):
    from georay.multimodal import audio_features

    return audio_features(_media(sf_dir)).drop_columns(["rms", "zcr"])


def _q_video_frames(sf_dir):
    from georay.multimodal import video_frame_sample

    return video_frame_sample(_media(sf_dir)).drop_columns(["frame"])


def _q_image_stats(sf_dir):
    from georay.multimodal import image_stats

    return image_stats(_media(sf_dir))


def _q_audio_stats(sf_dir):
    from georay.multimodal import audio_stats

    return audio_stats(_media(sf_dir))


# geo pipelines (pages corpus; rows-only checks + pytest goldens)


def _geo_features(sf_dir):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from georay.pages import pages_dir_for
    from georay.pipeline import decode_features

    pages = ray.data.read_parquet(pages_dir_for(sf_dir))
    feats = decode_features(pages)

    def project(t: pa.Table) -> pa.Table:
        # oracle-comparable projection: engine-internal QC columns
        # (decode_error nulls, arity_ok) stay on the full features
        # checkpoint; bboxes round to 9 decimals (KML reprojection ulp)
        t = t.drop_columns(["wkb", "decode_error"])
        for col in ("minx", "miny", "maxx", "maxy"):
            vals = np.round(t[col].to_numpy(zero_copy_only=False), 9)
            t = t.drop_columns([col]).append_column(col, pa.array(vals, pa.float64()))
        return t

    return feats.map_batches(project, batch_format="pyarrow").drop_columns(["arity_ok"])


def _geo_layers(sf_dir):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from georay.pages import pages_dir_for
    from georay.pipeline import decode_features, layer_stats

    pages = ray.data.read_parquet(pages_dir_for(sf_dir))
    stats = layer_stats(decode_features(pages))

    def round_bbox(t: pa.Table) -> pa.Table:
        # pin bboxes to 9 decimals (~0.1 mm): the KML reprojection path
        # carries a 1-ulp deg->rad->deg wobble the SQL oracle can't
        # reproduce; both sides round identically
        for col in ("bbox_minx", "bbox_miny", "bbox_maxx", "bbox_maxy"):
            vals = np.round(t[col].to_numpy(zero_copy_only=False), 9)
            t = t.drop_columns([col]).append_column(col, pa.array(vals, pa.float64()))
        return t

    return stats.map_batches(round_bbox, batch_format="pyarrow")


def _geo_pip_join(sf_dir):
    from georay.pages import pages_dir_for
    from georay.pipelines.flagship import geotag_pipeline

    res = geotag_pipeline(pages_dir_for(sf_dir))
    return res["joined"]


def _geo_tile_counts(sf_dir):
    from georay.pages import pages_dir_for
    from georay.pipelines.flagship import geotag_pipeline

    res = geotag_pipeline(pages_dir_for(sf_dir))
    return res["tiles"]


def _geo_knn(sf_dir):
    import numpy as np
    import pyarrow as pa

    from georay.pages import pages_dir_for
    from georay.pipelines.flagship import geotag_pipeline

    res = geotag_pipeline(pages_dir_for(sf_dir), knn_k=3)

    def round_dist(t: pa.Table) -> pa.Table:
        # millimeter rounding: engine numpy trig and DuckDB libm differ
        # in the last ulp, which flips ~1e-3 of values at a 1e-6 grid
        # boundary; at 1e-3 the flip probability is ~1e-6 of rows
        d = np.round(t["distance_m"].to_numpy(zero_copy_only=False), 3)
        return t.drop_columns(["distance_m"]).append_column(
            "distance_m", pa.array(d, pa.float64())
        )

    return res["knn"].map_batches(round_dist, batch_format="pyarrow")


def _geo_extract(sf_dir):
    import ray.data

    from georay.pages import pages_dir_for
    from georay.pipeline import extract_batch

    pages = ray.data.read_parquet(pages_dir_for(sf_dir))
    return pages.map_batches(extract_batch, batch_format="pyarrow").drop_columns(["html"])


def _geo_summary(sf_dir):
    """Schema-only summary of the first geo payload (reference
    POST /summary semantics, services/summary.js)."""
    import pandas as pd

    from georay.decode import decode_blob
    from georay.fixtures import build_payload
    from georay.merge import summarize_rows

    name, blob = build_payload(0)
    result = decode_blob(blob, name)
    layers = summarize_rows(result.rows, result.default_crs)
    return pd.DataFrame(
        [
            {
                "name": l["name"],
                "count": l["count"],
                "geometry": l["geometry"],
                "n_columns": len(l["columns"]),
            }
            for l in layers
        ]
    )


def _geo_polygon_tiles(sf_dir):
    """Vector->raster direction of the tile assignment: every decoded
    polygon's slippy-tile cover as (tile, polygon_id) pairs."""
    import ray.data

    from georay.pages import pages_dir_for
    from georay.pipeline import decode_features
    from georay.spatial.index import build_polygon_index
    from georay.spatial.tiles import polygon_tile_table

    pages = ray.data.read_parquet(pages_dir_for(sf_dir), columns=["url", "html"])
    index = build_polygon_index(decode_features(pages).materialize())
    return ray.data.from_arrow(polygon_tile_table(index))


def _geo_areas(sf_dir):
    """Planar shoelace area + perimeter per decoded grid polygon,
    quantized to 1e-10 units (georay/spatial/measure.py docstring has
    the tolerance argument); the oracle is the grid closed form."""
    import ray.data

    from georay.pages import pages_dir_for
    from georay.pipeline import decode_features
    from georay.spatial.measure import polygon_measures

    pages = ray.data.read_parquet(pages_dir_for(sf_dir), columns=["url", "html"])
    return polygon_measures(decode_features(pages))


def _geo_hulls(sf_dir):
    """Convex hull per decoded grid polygon (monotone chain over the
    full ring vertex set; interior hole rings never contribute hull
    vertices, so every grid cell hulls to its outer rectangle: 4
    vertices, w*h area — the closed form the oracle replays)."""
    import ray.data

    from georay.pages import pages_dir_for
    from georay.pipeline import decode_features
    from georay.spatial.measure import polygon_hulls

    pages = ray.data.read_parquet(pages_dir_for(sf_dir), columns=["url", "html"])
    return polygon_hulls(decode_features(pages))


def _geo_hex_counts(sf_dir):
    """Hexagonal (H3-role) page binning: axial hex cell per page
    coordinate, count per cell. Per-batch np.unique partials feed one
    small groupby-sum — the tile-counts pre-aggregation shape; the hex
    math is bit-identical on both engines (cells.py hex_encode doc)."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Sum

    from georay.pages import pages_dir_for
    from georay.pipeline import coords_batch
    from georay.spatial.cells import hex_encode

    pages = ray.data.read_parquet(pages_dir_for(sf_dir), columns=["url"])

    def hex_partial(t: pa.Table) -> pa.Table:
        ids = hex_encode(
            t["lon"].to_numpy(zero_copy_only=False),
            t["lat"].to_numpy(zero_copy_only=False),
            0.02,
        )
        u, c = np.unique(ids, return_counts=True)
        return pa.table(
            {
                "hex_cell": pa.array(u, pa.int64()),
                "n_pages": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    parts = pages.map_batches(coords_batch, batch_format="pyarrow").map_batches(
        hex_partial, batch_format="pyarrow"
    )
    return parts.groupby("hex_cell").aggregate(Sum("n_pages", alias_name="n_pages"))


def _geo_simplify(sf_dir):
    """DP-simplify every decoded polygon at a sub-cell tolerance and
    report per-polygon vertex counts plus the post-simplify area (the
    grid rectangles are DP fixed points, so the closed form pins the
    whole decode -> simplify -> re-encode -> measure chain; DP behavior
    on non-trivial shapes is pinned by tests/test_simplify.py)."""
    import ray.data

    from georay.pages import pages_dir_for
    from georay.pipeline import decode_features
    from georay.spatial.measure import polygon_measures
    from georay.spatial.simplify import simplify_features

    pages = ray.data.read_parquet(pages_dir_for(sf_dir), columns=["url", "html"])
    simplified = simplify_features(decode_features(pages), tolerance=1e-4)
    return polygon_measures(simplified)


def _geo_tile_contrast(sf_dir):
    """Spatial hotspot contrast per z15 tile: 9*count - sum(3x3
    neighborhood counts) — the local spatial-window statistic (a
    pure-integer Getis-Ord-style local score; positive = denser than
    the neighborhood). Works over the already-tiny tile-count table:
    each tile fans out 9 (neighbor, count) contributions keyed by the
    packed neighbor id, ONE hash-bucketed fold sums them, and only
    tiles that exist contribute (missing neighbors are zero on both
    engines)."""
    import numpy as np
    import pyarrow as pa

    from georay.pages import pages_dir_for
    from georay.pipelines.flagship import geotag_pipeline
    from georay.relational import _hash_bucket, _n_partitions

    tiles = geotag_pipeline(pages_dir_for(sf_dir))["tiles"]
    n_parts = _n_partitions()
    ZBITS, XBITS = np.int64(1) << np.int64(58), np.int64(1) << np.int64(29)

    def fan_out(t: pa.Table) -> pa.Table:
        tile = t["tile"].to_numpy(zero_copy_only=False)
        n = t["n_pages"].to_numpy(zero_copy_only=False).astype(np.int64)
        z = tile // ZBITS
        x = (tile % ZBITS) // XBITS
        y = tile % XBITS
        outs = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                nx, ny = x + dx, y + dy
                ok = (nx >= 0) & (ny >= 0)
                key = z[ok] * ZBITS + nx[ok] * XBITS + ny[ok]
                outs.append(
                    pa.table(
                        {
                            "key": pa.array(key, pa.int64()),
                            "n": pa.array(n[ok], pa.int64()),
                            # the dx=dy=0 row doubles as the base-tile
                            # marker carrying its own count
                            "self_n": pa.array(
                                n[ok] if (dx == 0 and dy == 0) else np.full(ok.sum(), -1, np.int64),
                                pa.int64(),
                            ),
                            "__bucket": pa.array(
                                _hash_bucket(key, n_parts), pa.int64()
                            ),
                        }
                    )
                )
        return pa.concat_tables(outs)

    def fold(g: pa.Table) -> pa.Table:
        key = g["key"].to_numpy(zero_copy_only=False)
        n = g["n"].to_numpy(zero_copy_only=False)
        self_n = g["self_n"].to_numpy(zero_copy_only=False)
        order = np.argsort(key, kind="stable")
        key, n, self_n = key[order], n[order], self_n[order]
        starts = np.r_[0, np.flatnonzero(key[1:] != key[:-1]) + 1]
        nb_sum = np.add.reduceat(n, starts)
        base = np.maximum.reduceat(self_n, starts)  # -1 unless the tile exists
        keep = base >= 0
        return pa.table(
            {
                "tile": pa.array(key[starts][keep], pa.int64()),
                "n_pages": pa.array(base[keep].astype(np.int64), pa.int64()),
                "contrast": pa.array(
                    (9 * base[keep] - nb_sum[keep]).astype(np.int64), pa.int64()
                ),
            }
        )

    return (
        tiles.map_batches(fan_out, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(fold, batch_format="pyarrow")
    )


def _geo_tile_pyramid(sf_dir):
    """Tile-pyramid rollup: page counts per tile at zooms 15/13/11.
    ONE pass aggregates the finest level (per-batch np.unique partials,
    the tile-counts shape); coarser levels roll up the already-tiny
    z15 table with pure-integer cell_parent bit arithmetic — the
    aggregate-then-rollup pattern that never rescans the corpus."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from georay.pages import pages_dir_for
    from georay.pipeline import coords_batch
    from georay.relational import _hash_bucket, _n_partitions
    from georay.spatial.cells import cell_encode, cell_parent

    pages = ray.data.read_parquet(pages_dir_for(sf_dir), columns=["url"])
    n_parts = _n_partitions()

    def bucketed_sum(ds):
        """tile-count sum via hash-bucket + vectorized reduceat — Ray's
        generic Aggregate costs seconds of fixed exchange per call even
        on O(tiles) tables; three of those dominated this query's wall."""

        def add_bucket(t: pa.Table) -> pa.Table:
            tiles = t["tile"].to_numpy(zero_copy_only=False)
            return t.append_column(
                "__bucket", pa.array(_hash_bucket(tiles, n_parts), pa.int64())
            )

        def reduce_bucket(t: pa.Table) -> pa.Table:
            tiles = t["tile"].to_numpy(zero_copy_only=False)
            n = t["n_pages"].to_numpy(zero_copy_only=False)
            order = np.argsort(tiles)
            tiles, n = tiles[order], n[order]
            starts = (
                np.concatenate(([0], np.flatnonzero(tiles[1:] != tiles[:-1]) + 1))
                if len(tiles)
                else np.array([], np.int64)
            )
            totals = (
                np.add.reduceat(n, starts) if len(tiles) else np.array([], np.int64)
            )
            return pa.table(
                {
                    "tile": pa.array(tiles[starts], pa.int64()),
                    "n_pages": pa.array(totals.astype(np.int64), pa.int64()),
                }
            )

        return (
            ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(reduce_bucket, batch_format="pyarrow")
        )

    def z15_partial(t: pa.Table) -> pa.Table:
        cells = cell_encode(
            t["lon"].to_numpy(zero_copy_only=False),
            t["lat"].to_numpy(zero_copy_only=False),
            15,
        )
        u, c = np.unique(cells, return_counts=True)
        return pa.table(
            {
                "tile": pa.array(u, pa.int64()),
                "n_pages": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    # materialize at the fan-out: z15 feeds two consumers (its own
    # level + the z13 rollup) and Ray re-executes lineage per consumer
    # — without this the corpus scan runs 4x. The table is O(tiles).
    z15 = bucketed_sum(
        pages.map_batches(coords_batch, batch_format="pyarrow").map_batches(
            z15_partial, batch_format="pyarrow"
        )
    ).materialize()

    def add_zoom(z: int):
        def f(t: pa.Table) -> pa.Table:
            return t.append_column(
                "zoom", pa.array(np.full(t.num_rows, z, np.int64), pa.int64())
            )

        return f

    def parent_of(z: int):
        def f(t: pa.Table) -> pa.Table:
            tiles = cell_parent(t["tile"].to_numpy(zero_copy_only=False), z)
            return pa.table({"tile": pa.array(tiles, pa.int64()), "n_pages": t["n_pages"]})

        return f

    def rollup(ds, z):
        return bucketed_sum(ds.map_batches(parent_of(z), batch_format="pyarrow"))

    out15 = z15.map_batches(add_zoom(15), batch_format="pyarrow")
    z13 = rollup(z15, 13).materialize()
    out13 = z13.map_batches(add_zoom(13), batch_format="pyarrow")
    out11 = rollup(z13, 11).map_batches(add_zoom(11), batch_format="pyarrow")
    return out15.union(out13).union(out11)


def _geo_tile_coverage(sf_dir):
    """Raster<-vector coverage fractions: Sutherland-Hodgman clip of
    every decoded polygon against each zoom-15 tile it touches, area
    per (polygon, tile) quantized at 1e10 (measure.py tolerance doc);
    the oracle is the closed-form rect-intersection over the grid."""
    import ray.data

    from georay.pages import pages_dir_for
    from georay.pipeline import decode_features
    from georay.spatial.measure import polygon_tile_coverage

    pages = ray.data.read_parquet(pages_dir_for(sf_dir), columns=["url", "html"])
    return polygon_tile_coverage(decode_features(pages), zoom=15)


def _geo_tile_hours(sf_dir):
    """Spatio-temporal rollup: page counts per (z13 tile, crawl hour) —
    the tile x time-window density surface a crawl scheduler reads.
    Per-batch np.unique partials over the 2-col key (the tile-counts
    shape: the shuffle moves one row per (batch, tile, hour), never one
    per page), then one small groupby."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Sum

    from georay.pages import page_coords, pages_dir_for
    from georay.spatial.cells import cell_encode

    pages = ray.data.read_parquet(pages_dir_for(sf_dir), columns=["url", "warc_ts"])

    def partial(t: pa.Table) -> pa.Table:
        urls = t["url"].to_pylist()
        lons = np.empty(len(urls))
        lats = np.empty(len(urls))
        for i, u in enumerate(urls):
            lons[i], lats[i] = page_coords(u)
        tiles = cell_encode(lons, lats, 13).astype(np.int64)
        hours = (
            t["warc_ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 3_600_000_000
        )
        keys, counts = np.unique(np.stack([tiles, hours], axis=1), axis=0, return_counts=True)
        return pa.table(
            {
                "tile": pa.array(keys[:, 0], pa.int64()),
                "hour": pa.array(keys[:, 1], pa.int64()),
                "n_pages": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    return (
        pages.map_batches(partial, batch_format="pyarrow")
        .groupby(["tile", "hour"])
        .aggregate(Sum("n_pages", alias_name="n_pages"))
    )


def _geo_dissolve(sf_dir):
    """Region merge (dissolve): polygons connected through shared edges
    WITHIN the same layer collapse to one region (region_id = min
    polygon_id of the connected component). Composition: distributed
    segment-groupby adjacency with the layer attribute riding the
    segment rows (same_prop — the constraint costs zero extra joins)
    -> BSP connected components; singletons fold in through a final
    Min groupby (each polygon contributes its own id as a candidate
    label).

    Grid closed form: layer = pid % 2 flips on horizontal neighbors and
    is constant down a column, so every present column dissolves into
    one region labeled by its row-0 cell: region_id = pid % 16."""
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Min

    from georay.graph import connected_components
    from georay.pages import pages_dir_for
    from georay.pipeline import decode_features
    from georay.spatial.measure import polygon_adjacency, polygon_attrs

    pages = ray.data.read_parquet(pages_dir_for(sf_dir), columns=["url", "html"])
    feats = decode_features(pages).materialize()  # two consumers below
    # dedupe=False: connected components is duplicate-edge-tolerant, so
    # the adjacency op's global pair-dedup shuffle is pure overhead here
    same = polygon_adjacency(feats, same_prop="layer", dedupe=False)
    attrs = polygon_attrs(feats)  # the present polygon universe
    cc = connected_components(same)  # (node, label)

    # singleton fold-in: every polygon votes its own id; Min picks the
    # component label when one exists (label <= member ids)
    self_rows = attrs.map_batches(
        lambda t: pa.table(
            {
                "node": t["polygon_id"],
                "label": t["polygon_id"],
            }
        ),
        batch_format="pyarrow",
    )
    return (
        cc.union(self_rows)
        .groupby("node")
        .aggregate(Min("label", alias_name="region_id"))
        .map_batches(
            lambda t: t.rename_columns(["polygon_id", "region_id"]),
            batch_format="pyarrow",
        )
    )


def _geo_radius_join(sf_dir, radius_m: float = 3000.0):
    """Radius search: every (page, polygon) pair whose polygon CENTROID
    lies within radius_m haversine meters of the page point — the
    proximity join behind geofenced retrieval. The centroid side is the
    bounded CentroidIndex broadcast (same contract as flagship kNN);
    each batch does one vectorized [B, P] haversine against it, no
    shuffle. At 100x polygons the prefilter is the kNN cell-ring
    machinery (georay/spatial/join.py); the threshold COMPARISON is
    float-safe without quantization (cross-engine skew ~um vs a 3 km
    radius).

    Output: url, polygon_id."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from georay.pages import page_coords, pages_dir_for
    from georay.pipeline import decode_features
    from georay.relational import broadcast_map_batches
    from georay.spatial.index import build_centroid_index_remote
    from georay.spatial.join import haversine_m

    feats = decode_features(
        ray.data.read_parquet(pages_dir_for(sf_dir), columns=["url", "html"])
    )
    cref = build_centroid_index_remote(
        feats.select_columns(["wkb", "geom_type", "props_json", "cols_json"])
    )
    pages = ray.data.read_parquet(pages_dir_for(sf_dir), columns=["url"])

    def radius_fn(t: pa.Table, idx) -> pa.Table:
        urls = t["url"].to_pylist()
        lons = np.empty(len(urls))
        lats = np.empty(len(urls))
        for i, u in enumerate(urls):
            lons[i], lats[i] = page_coords(u)
        cents = idx.centroids  # [P, 2]
        pids = np.asarray(idx.polygon_ids, dtype=np.int64)
        d = haversine_m(
            lons[:, None], lats[:, None], cents[None, :, 0], cents[None, :, 1]
        )
        ii, jj = np.nonzero(d <= radius_m)
        return pa.table(
            {
                "url": t["url"].take(pa.array(ii, pa.int64())),
                "polygon_id": pa.array(pids[jj], pa.int64()),
            }
        )

    return broadcast_map_batches(pages, radius_fn, cref)


def _geo_adjacency(sf_dir):
    """Shared-edge polygon adjacency derived from decoded geometry
    (distributed quantized boundary-segment groupby); the oracle is the
    grid closed form (|Δcol| + |Δrow| == 1)."""
    import ray.data

    from georay.pages import pages_dir_for
    from georay.pipeline import decode_features
    from georay.spatial.measure import polygon_adjacency

    pages = ray.data.read_parquet(pages_dir_for(sf_dir), columns=["url", "html"])
    return polygon_adjacency(decode_features(pages))


def _geo_summary_abbrev(sf_dir):
    """Abbreviated (metadata-only) summary of a huge shapefile blob:
    reference POST /summary with X-Blob-Length over the gate
    (services/summary.js + shapefile.js:293-320)."""
    import pandas as pd

    from georay.fixtures import build_payload
    from georay.summary import summarize_blob

    name, blob = build_payload(3)  # shapefile zip payload
    s = summarize_blob(blob, name, blob_length=20 * 1024**3)
    return pd.DataFrame(
        [
            {"name": l["name"], "count": l["count"], "projection": l["projection"]}
            for l in s["layers"]
        ]
    )


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "pricing_summary": _q_pricing,
        "top_orders": _q_top_orders,
        "region_revenue": _q_region_revenue,
        "events_hourly": _q_events_hourly,
        "orders_filter_sort": _q_orders_filter_sort,
        "part_stats": _q_part_stats,
        "dedup_exact": _q_dedup_exact,
        "token_counts": _q_token_counts,
        "chunk_texts": _q_chunk_texts,
        "bm25_topk": _q_bm25_topk,
        "doc_entropy": _q_doc_entropy,
        "top_words": _q_top_words,
        "vocab_ids": _q_vocab_ids,
        "order_price_quantiles": _q_order_price_quantiles,
        "approx_price_quantiles": _q_approx_price_quantiles,
        "rolling_event_sums": _q_rolling_event_sums,
        "customers_without_urgent": _q_customers_without_urgent,
        "quality_counts": _q_quality_counts,
        "ngram_jaccard_dups": _q_ngram_jaccard,
        "jaccard_prefix_join": _q_jaccard_prefix_join,
        "containment_join": _q_containment_join,
        "ngram_novelty": _q_ngram_novelty,
        "keep_first_shingles": _q_keep_first_shingles,
        "minhash_near_dups": _q_minhash_near_dups,
        "simhash": _q_simhash,
        "simhash_near_dups": _q_simhash_near_dups,
        "langid": _q_langid,
        "quality_scores": _q_quality_scores,
        "fingerprints": _q_fingerprints,
        "scrub_text": _q_scrub_text,
        "normalize_text": _q_normalize_text,
        "dedup_normalized": _q_dedup_normalized,
        "doc_repetition": _q_doc_repetition,
        "boilerplate_segments": _q_boilerplate_segments,
        "url_host_stats": _q_url_host_stats,
        "url_bpe_tokens": _q_url_bpe_tokens,
        "dataset_split": _q_dataset_split,
        "decontam_ngrams": _q_decontam_ngrams,
        "quality_filter": _q_quality_filter,
        "pack_sequences": _q_pack_sequences,
        "stratified_sample": _q_stratified_sample,
        "domain_cap": _q_domain_cap,
        "domain_mix": _q_domain_mix,
        "tfidf_top_terms": _q_tfidf_top_terms,
        "dedup_clusters": _q_dedup_clusters,
        "cluster_representatives": _q_cluster_representatives,
        "unigram_logprob": _q_unigram_logprob,
        "bigram_logprob": _q_bigram_logprob,
        "dup_substring_spans": _q_dup_substring_spans,
        "doc_rank_ntile": _q_doc_rank_ntile,
        "pmi_collocations": _q_pmi_collocations,
        "curriculum_pack": _q_curriculum_pack,
        "user_event_deltas": _q_user_event_deltas,
        "event_transitions": _q_event_transitions,
        "mad_outliers": _q_mad_outliers,
        "user_event_zscores": _q_user_event_zscores,
        "part_pair_counts": _q_part_pair_counts,
        "funnel_users": _q_funnel_users,
        "rolling_time_sums": _q_rolling_time_sums,
        "attribution_join": _q_attribution_join,
        "hopping_window_counts": _q_hopping_window_counts,
        "orders_rollup": _q_orders_rollup,
        "orders_cube": _q_orders_cube,
        "weekly_retention": _q_weekly_retention,
        "ann_topk": _q_ann_topk,
        "ann_topk_ivf": _q_ann_topk_ivf,
        "embedding_clusters": _q_embedding_clusters,
        "pq_encode": _q_pq_encode,
        "ann_topk_pq": _q_ann_topk_pq,
        "ann_topk_lsh": _q_ann_topk_lsh,
        "hard_negatives": _q_hard_negatives,
        "ccnet_buckets": _q_ccnet_buckets,
        "curate_corpus": _q_curate_corpus,
        "label_centroids": _q_label_centroids,
        "knn_label_vote": _q_knn_label_vote,
        "embedding_near_dups": _q_emb_near_dups,
        "semantic_dedup": _q_semantic_dedup,
        "kmeans_iter": _q_kmeans_iter,
        "oov_rate": _q_oov_rate,
        "embedding_pca": _q_embedding_pca,
        "dsir_weights": _q_dsir_weights,
        "graph_pagerank": _q_graph_pagerank,
        "label_propagation": _q_label_propagation,
        "personalized_pagerank": _q_personalized_pagerank,
        "hits_scores": _q_hits_scores,
        "hits_full": _q_hits_full,
        "triangle_counts": _q_triangle_counts,
        "kcore": _q_kcore,
        "common_neighbors": _q_common_neighbors,
        "kcenter_sample": _q_kcenter_sample,
        "linreg_train": _q_linreg_train,
        "greedy_coverage": _q_greedy_coverage,
        "seeded_shuffle": _q_seeded_shuffle,
        "orders_pivot": _q_orders_pivot,
        "user_drawdown": _q_user_drawdown,
        "grouped_price_quantiles": _q_grouped_price_quantiles,
        "mutual_knn": _q_mutual_knn,
        "mutual_knn_ivf": _q_mutual_knn_ivf,
        "props_rollup": _q_props_rollup,
        "part_skyline": _q_part_skyline,
        "bloom_semi_join": _q_bloom_semi_join,
        "image_ahash_dups": _q_image_ahash_dups,
        "heavy_hitters": _q_heavy_hitters,
        "grouped_heavy_hitters": _q_grouped_heavy_hitters,
        "quality_logreg": _q_quality_logreg,
        "rrf_fusion": _q_rrf_fusion,
        "moss_pairs": _q_moss_pairs,
        "countmin": _q_countmin,
        "bpe_merges": _q_bpe_merges,
        "bpe_encode": _q_bpe_encode,
        "kwic_snippets": _q_kwic_snippets,
        "temperature_mix": _q_temperature_mix,
        "hash_features": _q_hash_features,
        "cust_order_counts": _q_cust_order_counts,
        "mktsegment_stats": _q_mktsegment_stats,
        "priority_line_counts": _q_priority_line_counts,
        "top_orders_per_segment": _q_top_orders_per_segment,
        "daily_active_users": _q_daily_active_users,
        "approx_users_by_type": _q_approx_users_by_type,
        "hll_overlap": _q_hll_overlap,
        "orders_by_month": _q_orders_by_month,
        "sample_orders": _q_sample_orders,
        "weighted_sample": _q_weighted_sample,
        "price_band_pairs": _q_price_band_pairs,
        "term_drift": _q_term_drift,
        "key_skew_profile": _q_key_skew_profile,
        "join_size_estimate": _q_join_size_estimate,
        "top_users_by_active_days": _q_top_users_by_active_days,
        "value_concentration": _q_value_concentration,
        "salted_join_sample": _q_salted_join_sample,
        "association_rules": _q_association_rules,
        "user_sessions": _q_user_sessions,
        "asof_last_order": _q_asof_last_order,
        "event_sessions": _q_event_sessions,
        "customer_name_match": _q_customer_name_match,
        "image_features": _q_image_features,
        "audio_features": _q_audio_features,
        "video_frames": _q_video_frames,
        "image_stats": _q_image_stats,
        "audio_stats": _q_audio_stats,
        "geo_extract": _geo_extract,
        "geo_features": _geo_features,
        "geo_layers": _geo_layers,
        "geo_pip_join": _geo_pip_join,
        "geo_tile_counts": _geo_tile_counts,
        "geo_tile_contrast": _geo_tile_contrast,
        "geo_polygon_tiles": _geo_polygon_tiles,
        "geo_knn": _geo_knn,
        "geo_areas": _geo_areas,
        "geo_hulls": _geo_hulls,
        "geo_simplify": _geo_simplify,
        "geo_hex_counts": _geo_hex_counts,
        "geo_tile_coverage": _geo_tile_coverage,
        "geo_tile_pyramid": _geo_tile_pyramid,
        "geo_tile_hours": _geo_tile_hours,
        "geo_dissolve": _geo_dissolve,
        "geo_radius_join": _geo_radius_join,
        "geo_adjacency": _geo_adjacency,
        "geo_summary": _geo_summary,
        "geo_summary_abbrev": _geo_summary_abbrev,
    }


# ---------------------------------------------------------- oracle sql

# The geo oracles recompute the deterministic pages corpus closed-form
# (georay/pages.py page_coords, georay/fixtures.py grid model). The
# corpus path is NOT baked in (ADVICE r02: a hard-pinned sf0.01 glob
# would falsely fail if the gate ever ran at another sf): the SQL
# carries a token that oracle_sql() substitutes with the corpus for
# GEORAY_ORACLE_SF_DIR (default sf0.01, where the driver's gate runs),
# and the present-polygon count is computed FROM the corpus, so the
# geo oracles are valid at any sf. pages_dir_for() synthesizes/caches
# the corpus on first use.
_PAGES_GLOB = "__PAGES_GLOB__"
_MEDIA_GLOB = "__MEDIA_GLOB__"


def _oracle_sf_dir() -> str:
    import os

    return os.environ.get("GEORAY_ORACLE_SF_DIR", "/root/testdata/sf0.01")

def _fingerprints_ctes() -> str:
    """Winnowing fingerprint replay (doc_id, ord, fp) as a CTE chain
    ending in `fpr` — shared by the fingerprints oracle and the
    moss_pairs stitch."""
    return """
t AS (SELECT doc_id, TRIM(text) AS tt,
             regexp_split_to_array(TRIM(text), '\\s+') AS w FROM documents),
            words AS (SELECT doc_id, CAST(u.i AS BIGINT) AS i, w[i+1] AS tok
                      FROM t, UNNEST(range(len(w))) AS u(i) WHERE tt <> ''),
            g AS (SELECT a.doc_id, a.i,
                         a.tok || ' ' || b.tok || ' ' || c.tok || ' ' || d.tok || ' ' || e.tok AS gram
                  FROM words a
                  JOIN words b ON b.doc_id = a.doc_id AND b.i = a.i + 1
                  JOIN words c ON c.doc_id = a.doc_id AND c.i = a.i + 2
                  JOIN words d ON d.doc_id = a.doc_id AND d.i = a.i + 3
                  JOIN words e ON e.doc_id = a.doc_id AND e.i = a.i + 4),
            h AS (SELECT doc_id, i,
                         CAST(('0x' || substr(sha256(gram), 1, 16)) AS UBIGINT) AS hv FROM g),
            n AS (SELECT doc_id, COUNT(*) AS nh FROM h GROUP BY 1),
            small AS (SELECT h.doc_id, CAST(0 AS BIGINT) AS ord,
                             CAST(MIN(hv) >> 1 AS BIGINT) AS fp
                      FROM h JOIN n USING (doc_id) WHERE nh <= 4 GROUP BY h.doc_id),
            w AS (SELECT h.doc_id, h.i,
                         MIN(hv) OVER (PARTITION BY h.doc_id ORDER BY h.i
                                       ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mn,
                         nh
                  FROM h JOIN n USING (doc_id) WHERE nh > 4),
            w2 AS (SELECT doc_id, i, mn FROM w WHERE i <= nh - 4),
            j AS (SELECT w2.doc_id, w2.i, MIN(h2.i) AS jpos
                  FROM w2 JOIN h h2 ON h2.doc_id = w2.doc_id
                                   AND h2.i BETWEEN w2.i AND w2.i + 3 AND h2.hv = w2.mn
                  GROUP BY 1, 2),
            sel AS (SELECT doc_id, i, jpos,
                           LAG(jpos) OVER (PARTITION BY doc_id ORDER BY i) AS prev FROM j),
            ev AS (SELECT doc_id, i, jpos FROM sel WHERE prev IS NULL OR jpos <> prev),
            big AS (SELECT ev.doc_id,
                           ROW_NUMBER() OVER (PARTITION BY ev.doc_id ORDER BY ev.i) - 1 AS ord,
                           CAST(h3.hv >> 1 AS BIGINT) AS fp
                    FROM ev JOIN h h3 ON h3.doc_id = ev.doc_id AND h3.i = ev.jpos),
fpr AS (SELECT doc_id, ord, fp FROM big
        UNION ALL
        SELECT doc_id, ord, fp FROM small)"""


def _bpe_ctes(k: int):
    """BPE merge-induction replay: per iteration, pair counts from
    adjacent (pos, pos+1) symbol rows, argmax by (cnt DESC, l, r),
    then the greedy left-to-right merge as gaps-and-islands — inside
    each maximal run of consecutive matching positions the 1st, 3rd,
    ... matches are taken (identical to the Python scanner), taken
    positions absorb pos+1, and positions are re-ranked."""
    ctes = ["""
t AS (SELECT doc_id, TRIM(text) AS tt,
             regexp_split_to_array(TRIM(text), '\\s+') AS w FROM documents),
words AS (SELECT doc_id, w[i+1] AS tok FROM t, UNNEST(range(len(w))) AS u(i)
          WHERE tt <> ''),
wc AS (SELECT tok AS word, COUNT(*)::BIGINT AS freq FROM words GROUP BY 1),
s0 AS MATERIALIZED (
    SELECT word, freq, CAST(u.i AS BIGINT) AS pos,
           substr(word, CAST(u.i AS INTEGER) + 1, 1) AS sym
    FROM wc, UNNEST(range(length(word))) AS u(i))"""]
    for i in range(1, k + 1):
        p = i - 1
        ctes.append(f"""
p{i} AS MATERIALIZED (
    SELECT a.sym AS l, b.sym AS r, SUM(a.freq)::BIGINT AS cnt
    FROM s{p} a JOIN s{p} b ON b.word = a.word AND b.pos = a.pos + 1
    GROUP BY 1, 2),
m{i} AS MATERIALIZED (SELECT l, r, cnt FROM p{i} ORDER BY cnt DESC, l, r LIMIT 1),
mm{i} AS MATERIALIZED (
    SELECT a.word, a.pos
    FROM s{p} a JOIN s{p} b ON b.word = a.word AND b.pos = a.pos + 1
    JOIN m{i} m ON a.sym = m.l AND b.sym = m.r),
ch{i} AS (SELECT word, pos,
                 pos - ROW_NUMBER() OVER (PARTITION BY word ORDER BY pos) AS isl
          FROM mm{i}),
tk{i} AS MATERIALIZED (
    SELECT word, pos FROM (
        SELECT word, pos,
               ROW_NUMBER() OVER (PARTITION BY word, isl ORDER BY pos) AS rn
        FROM ch{i}) WHERE rn % 2 = 1),
s{i} AS MATERIALIZED (
    SELECT word, freq,
           ROW_NUMBER() OVER (PARTITION BY word ORDER BY opos) - 1 AS pos, sym
    FROM (SELECT s.word, s.freq, s.pos AS opos,
                 CASE WHEN tk.pos IS NOT NULL THEN s.sym || nx.sym
                      ELSE s.sym END AS sym
          FROM s{p} s
          LEFT JOIN tk{i} tk ON tk.word = s.word AND tk.pos = s.pos
          LEFT JOIN s{p} nx ON nx.word = s.word AND nx.pos = s.pos + 1
          WHERE NOT EXISTS (SELECT 1 FROM tk{i} c
                            WHERE c.word = s.word AND c.pos = s.pos - 1)))""")
    unions = "\n            UNION ALL ".join(
        f'SELECT {i}::BIGINT AS merge_rank, l AS "left", r AS "right", '
        f"cnt AS pair_count FROM m{i}"
        for i in range(1, k + 1)
    )
    return ",".join(ctes), unions


def _bpe_sql(k: int) -> str:
    ctes, unions = _bpe_ctes(k)
    return (
        "WITH " + ctes
        + f"\n            SELECT * FROM ({unions}) ORDER BY merge_rank"
    )


def _bpe_encode_sql(k: int) -> str:
    ctes, _ = _bpe_ctes(k)
    return (
        "WITH " + ctes + f""",
wsym AS (SELECT word, COUNT(*)::BIGINT AS nsym FROM s{k} GROUP BY 1)
SELECT d.doc_id,
       COUNT(w.tok)::BIGINT AS n_words,
       COALESCE(SUM(wsym.nsym), 0)::BIGINT AS n_bpe_tokens
FROM documents d
LEFT JOIN words w ON w.doc_id = d.doc_id
LEFT JOIN wsym ON wsym.word = w.tok
GROUP BY 1"""
    )


def _bm25_topk_sql(k: int) -> str:
    """BM25 top-k replay (terms hash/join/vector, k1=1.2, b=0.75,
    per-term contributions quantized to integer micro-units before the
    sum). Shared by the bm25_topk oracle and the rrf_fusion stitch."""
    return f"""
            WITH t AS (
              SELECT doc_id, regexp_split_to_array(TRIM(text), '\\s+') AS w
              FROM documents WHERE TRIM(text) <> ''
            ),
            d AS (
              SELECT doc_id, CAST(len(w) AS BIGINT) AS dl,
                     CAST(len(list_filter(w, x -> x = 'hash')) AS BIGINT) AS tf0,
                     CAST(len(list_filter(w, x -> x = 'join')) AS BIGINT) AS tf1,
                     CAST(len(list_filter(w, x -> x = 'vector')) AS BIGINT) AS tf2
              FROM t
            ),
            s AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(dl) AS BIGINT) AS tot,
                     CAST(SUM(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df0,
                     CAST(SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df1,
                     CAST(SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df2
              FROM d
            ),
            sc AS (
              SELECT doc_id,
                (CASE WHEN tf0 = 0 THEN 0 ELSE CAST(FLOOR(
                   ln((n - df0 + 0.5)/(df0 + 0.5) + 1.0)
                   * ((tf0 * 2.2) / (tf0 + 1.2*(1.0 - 0.75 + 0.75*(dl/(CAST(tot AS DOUBLE)/n)))))
                   * 1000000 + 0.5) AS BIGINT) END)
                + (CASE WHEN tf1 = 0 THEN 0 ELSE CAST(FLOOR(
                   ln((n - df1 + 0.5)/(df1 + 0.5) + 1.0)
                   * ((tf1 * 2.2) / (tf1 + 1.2*(1.0 - 0.75 + 0.75*(dl/(CAST(tot AS DOUBLE)/n)))))
                   * 1000000 + 0.5) AS BIGINT) END)
                + (CASE WHEN tf2 = 0 THEN 0 ELSE CAST(FLOOR(
                   ln((n - df2 + 0.5)/(df2 + 0.5) + 1.0)
                   * ((tf2 * 2.2) / (tf2 + 1.2*(1.0 - 0.75 + 0.75*(dl/(CAST(tot AS DOUBLE)/n)))))
                   * 1000000 + 0.5) AS BIGINT) END)
                AS bm25_micro
              FROM d, s
            ),
            r AS (
              SELECT doc_id, bm25_micro,
                     row_number() OVER (ORDER BY bm25_micro DESC, doc_id) AS rn
              FROM sc
            )
            SELECT CAST(rn AS BIGINT) AS rnk, doc_id, bm25_micro
            FROM r WHERE rn <= {k}
    """


def _ann_topk_sql(qids: str, k: int) -> str:
    """Brute cosine top-k replay (self excluded, 0-based rank). Shared
    by the ann_topk oracle and the rrf_fusion stitch."""
    return f"""
            WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
                       FROM embeddings WHERE vec_id IN ({qids})),
            s AS (SELECT q.qid AS query_id, e.vec_id AS neighbor_id,
                         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe) AS sim
                  FROM embeddings e, q WHERE e.vec_id <> q.qid),
            r AS (SELECT query_id, neighbor_id,
                         ROW_NUMBER() OVER (PARTITION BY query_id
                                            ORDER BY sim DESC, neighbor_id ASC) - 1 AS rank
                  FROM s)
            SELECT query_id, rank, neighbor_id FROM r WHERE rank < {k}
    """


_UNIGRAM_LM_SQL = """
            WITH t AS (SELECT doc_id, TRIM(text) AS tt FROM documents),
            words AS (
              SELECT doc_id, UNNEST(regexp_split_to_array(tt, '\\s+')) AS w
              FROM t WHERE tt <> ''),
            cnt AS (SELECT w, COUNT(*) AS n FROM words GROUP BY w),
            tot AS (SELECT SUM(n) AS total FROM cnt),
            lp AS (SELECT w,
                          CAST(floor(ln(CAST(n AS DOUBLE) / total) * 1000000 + 0.5)
                               AS BIGINT) AS unats
                   FROM cnt CROSS JOIN tot),
            per_doc AS (
              SELECT words.doc_id,
                     CAST(COUNT(*) AS BIGINT) AS n_tokens,
                     CAST(SUM(lp.unats) AS BIGINT) AS logprob_unats
              FROM words JOIN lp ON words.w = lp.w GROUP BY words.doc_id)
            SELECT d.doc_id,
                   COALESCE(p.n_tokens, 0) AS n_tokens,
                   COALESCE(p.logprob_unats, 0) AS logprob_unats
            FROM documents d LEFT JOIN per_doc p USING (doc_id)
"""


_SHP_WKT_SQL = (
    'GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",'
    'SPHEROID["WGS_1984",6378137.0,298.257223563]],'
    'PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]]'
)


def _MERC_Y_SQL(lat_col: str, n: int) -> str:
    """SQL for the web-mercator tile row of a latitude column — the
    ln(t + sqrt(t*t+1)) form of asinh (DuckDB has no asinh)."""
    t = f"tan(radians({lat_col}))"
    return (
        f"CAST(floor((1.0 - ln({t} + sqrt({t} * {t} + 1.0)) / pi()) / 2.0 * {n}) "
        "AS BIGINT)"
    )


def _pack_cell_sql(zoom: int, x_sql: str, y_sql: str) -> str:
    """cell id packing: zoom << 58 | x << 29 | y (georay.spatial.cells)."""
    return f"({zoom} * 288230376151711744 + ({x_sql}) * 536870912 + ({y_sql}))"


# joined pages (inside an indexed grid polygon, holes excluded) with
# z13 cell + z15 tile — mirrors georay.fixtures closed forms exactly,
# including the float op ORDER (w recomputed as x1-x0 for hole bounds,
# as hole_bounds does)
# LEAST(4K, 256) with K = payload-page count: the polygon ids present
# in a corpus of n pages are exactly [0, min(4*ceil(n/100), 256))
# (georay/fixtures.payload_polygon_ids) — computed FROM the corpus so
# every geo oracle is valid at any sf, not just the driver's sf0.01.
_NPOLY_CTE = f"""
    npoly AS (
      SELECT LEAST(4 * COUNT(*), 256) AS np
      FROM read_parquet('{_PAGES_GLOB}')
      WHERE CAST(regexp_extract(url, '([0-9]+)$', 1) AS BIGINT) % 100 = 0
    )
"""

_GEO_JOIN_CTE = f"""
    WITH {_NPOLY_CTE},
    p AS (
      SELECT url,
             CAST(('0x' || substr(sha256('coord:' || url), 1, 16)) AS UBIGINT) AS h
      FROM read_parquet('{_PAGES_GLOB}')
    ),
    pt AS (
      SELECT url,
             -122.5 + (CAST(h % 4294967296 AS DOUBLE) / 4294967296.0)
                      * (CAST(-122.2 AS DOUBLE) - CAST(-122.5 AS DOUBLE)) AS lon,
             47.4 + (CAST(h // 4294967296 AS DOUBLE) / 4294967296.0)
                    * (CAST(47.8 AS DOUBLE) - CAST(47.4 AS DOUBLE)) AS lat
      FROM p
    ),
    g AS (
      SELECT url, lon, lat,
             CAST(floor((lon - (-122.5)) / (CAST(-122.2 AS DOUBLE) - CAST(-122.5 AS DOUBLE)) * 16) AS BIGINT) AS c,
             CAST(floor((lat - 47.4) / (CAST(47.8 AS DOUBLE) - CAST(47.4 AS DOUBLE)) * 16) AS BIGINT) AS r
      FROM pt
      WHERE lon >= -122.5 AND lon < -122.2 AND lat >= 47.4 AND lat < 47.8
    ),
    cb AS (
      SELECT url, lon, lat, r * 16 + c AS polygon_id,
             -122.5 + c * ((CAST(-122.2 AS DOUBLE) - CAST(-122.5 AS DOUBLE)) / 16) AS x0,
             47.4 + r * ((CAST(47.8 AS DOUBLE) - CAST(47.4 AS DOUBLE)) / 16) AS y0,
             (-122.5 + c * ((CAST(-122.2 AS DOUBLE) - CAST(-122.5 AS DOUBLE)) / 16)) + ((CAST(-122.2 AS DOUBLE) - CAST(-122.5 AS DOUBLE)) / 16) AS x1,
             (47.4 + r * ((CAST(47.8 AS DOUBLE) - CAST(47.4 AS DOUBLE)) / 16)) + ((CAST(47.8 AS DOUBLE) - CAST(47.4 AS DOUBLE)) / 16) AS y1
      FROM g
    ),
    joined AS (
      SELECT url, lon, lat, polygon_id,
             {_pack_cell_sql(13, "CAST(floor((lon + 180.0) / 360.0 * 8192) AS BIGINT)", _MERC_Y_SQL("lat", 8192))} AS cell,
             {_pack_cell_sql(15, "CAST(floor((lon + 180.0) / 360.0 * 32768) AS BIGINT)", _MERC_Y_SQL("lat", 32768))} AS tile
      FROM cb
      WHERE polygon_id < (SELECT np FROM npoly)
        AND NOT (polygon_id % 7 = 3
                 AND lon > x0 + 0.25 * (x1 - x0) AND lon < x1 - 0.25 * (x1 - x0)
                 AND lat > y0 + 0.25 * (y1 - y0) AND lat < y1 - 0.25 * (y1 - y0))
    )
"""


_SIMHASH_SQL = """
    WITH t AS (SELECT doc_id, TRIM(text) AS tt,
              regexp_split_to_array(TRIM(text), '\\s+') AS w FROM documents),
    words AS (SELECT doc_id, w[i+1] AS tok FROM t, UNNEST(range(len(w))) AS u(i)
              WHERE tt <> ''),
    h AS (SELECT doc_id, CAST(('0x' || substr(sha256(tok), 1, 16)) AS UBIGINT) AS hv
          FROM words),
    bits AS (SELECT doc_id, CAST(u.j AS INTEGER) AS j,
            SUM(CASE WHEN (hv >> CAST(u.j AS INTEGER)) & 1 = 1
             THEN 1 ELSE -1 END) AS votes
             FROM h, UNNEST(range(64)) AS u(j) GROUP BY 1, 2),
    sh AS (SELECT doc_id,
          CAST(SUM(CASE WHEN votes > 0 AND j < 63
                THEN CAST(1 AS BIGINT) << j ELSE 0 END) AS BIGINT)
          + CAST(SUM(CASE WHEN votes > 0 AND j = 63
                  THEN -9223372036854775808 ELSE 0 END) AS BIGINT)
            AS simhash
           FROM bits GROUP BY 1)
    SELECT d.doc_id, CAST(COALESCE(sh.simhash, 0) AS BIGINT) AS simhash
    FROM documents d LEFT JOIN sh USING (doc_id)
"""


_SIMHASH_DUPS_SQL = f"""
    WITH sh2 AS ({_SIMHASH_SQL})
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM sh2 a JOIN sh2 b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    ORDER BY doc_a, doc_b
"""


_EXACT_JACCARD_SQL = f"""
    WITH t AS (SELECT doc_id, regexp_split_to_array(TRIM(text), '\\s+') w FROM documents),
    words AS (SELECT doc_id, i, w[i+1] AS tok FROM t, UNNEST(range(len(w))) AS u(i)),
    bigrams AS (SELECT DISTINCT a.doc_id, a.tok || ' ' || b.tok AS bg
                FROM words a JOIN words b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
    cnt AS (SELECT doc_id, COUNT(*) n FROM bigrams GROUP BY 1),
    inter AS (SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) i
              FROM bigrams x JOIN bigrams y ON x.bg = y.bg AND x.doc_id < y.doc_id
              GROUP BY 1, 2)
    SELECT a, b
    FROM inter JOIN cnt ca ON ca.doc_id = a JOIN cnt cb ON cb.doc_id = b
    WHERE CAST(i AS DOUBLE) / (ca.n + cb.n - i) >= {NGRAM_TAU}
"""

_LANG_STOPS = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it", "that", "for"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "los", "se", "no"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein", "mit", "zu", "den"),
    "fr": ("le", "la", "et", "les", "des", "est", "un", "une", "du", "que"),
    "pt": ("o", "a", "de", "que", "e", "do", "da", "em", "um", "para"),
}
_LANGID_SCORE_COLS = ", ".join(
    "COUNT(DISTINCT lower(tok)) FILTER (WHERE lower(tok) IN ({})) / 10.0 AS s_{}".format(
        ", ".join(f"'{w}'" for w in words), lang
    )
    for lang, words in _LANG_STOPS.items()
)


def _ensure_oracle_corpus() -> str:
    """The geo oracle SQL reads the synthesized pages parquet; make sure
    it exists even if the driver evaluates oracles before queries.
    Returns the glob the geo oracles should read."""
    from georay.pages import pages_dir_for

    return pages_dir_for(_oracle_sf_dir()) + "/*.parquet"


def _ensure_media_corpus() -> str:
    """The media oracle SQL reads the synthesized GRB media parquet;
    synthesize it (cached) and return the glob to read."""
    from georay.multimodal import media_dir_for

    return media_dir_for(_oracle_sf_dir()) + "/*.parquet"


def _pagerank_sql(n_iters: int = 5) -> str:
    """Unrolled integer-nano PageRank over the cust<->supp multigraph:
    every operation is int64/HUGEINT floor arithmetic, so DuckDB
    reproduces georay.graph.pagerank bit-for-bit (no float summation
    order anywhere)."""
    prev = "r0t"
    iters = []
    for i in range(1, n_iters + 1):
        iters.append(
            f"""i{i} AS (
              SELECT n.node, CAST(p.base + (85 * COALESCE(f.s, 0)) // 100 AS BIGINT) AS r
              FROM nodes n CROSS JOIN params p LEFT JOIN (
                SELECT e.dst AS node, SUM(rr.r // dg.d) AS s
                FROM e JOIN {prev} rr ON e.src = rr.node
                       JOIN deg dg ON e.src = dg.node
                GROUP BY e.dst) f ON n.node = f.node)"""
        )
        prev = f"i{i}"
    joined = ",\n        ".join(iters)
    return f"""
        WITH pair AS (
          SELECT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
          FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        ),
        e AS (SELECT c AS src, s AS dst FROM pair
              UNION ALL SELECT s AS src, c AS dst FROM pair),
        nodes AS (SELECT DISTINCT src AS node FROM e),
        deg AS (SELECT src AS node, COUNT(*) AS d FROM e GROUP BY src),
        params AS (SELECT CAST(1000000000000 // COUNT(*) AS BIGINT) AS r0,
                          CAST((15 * (1000000000000 // COUNT(*))) // 100 AS BIGINT) AS base
                   FROM nodes),
        r0t AS (SELECT node, r0 AS r FROM nodes, params),
        {joined}
        SELECT node, r AS rank_nano FROM {prev}
    """


def _hits_sql(n_iters: int = 4, both: bool = False) -> str:
    """Unrolled HITS replay with exact integer L-infinity
    normalization (v * 1e9 // max in HUGEINT — the same arithmetic
    georay.graph._linf_scale runs in Python ints)."""
    parts = [
        """pair AS MATERIALIZED (SELECT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
                 FROM orders JOIN lineitem ON l_orderkey = o_orderkey)""",
        "e AS MATERIALIZED (SELECT src, dst FROM pair)",
        """nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM e
                  UNION SELECT DISTINCT dst FROM e)""",
        "h0 AS MATERIALIZED (SELECT node, 1000000000::HUGEINT AS v FROM nodes)",
    ]
    for i in range(1, n_iters + 1):
        parts.append(
            f"""ar{i} AS MATERIALIZED (SELECT n.node, COALESCE(s.sv, 0)::HUGEINT AS v
              FROM nodes n LEFT JOIN (
                SELECT e.dst AS node, SUM(hv.v) AS sv
                FROM e JOIN h{i - 1} hv ON e.src = hv.node GROUP BY e.dst) s
              ON n.node = s.node)"""
        )
        parts.append(
            f"""a{i} AS MATERIALIZED (SELECT node,
                 v * 1000000000 // GREATEST((SELECT MAX(v) FROM ar{i}), 1) AS v
               FROM ar{i})"""
        )
        parts.append(
            f"""hr{i} AS MATERIALIZED (SELECT n.node, COALESCE(s.sv, 0)::HUGEINT AS v
              FROM nodes n LEFT JOIN (
                SELECT e.src AS node, SUM(av.v) AS sv
                FROM e JOIN a{i} av ON e.dst = av.node GROUP BY e.src) s
              ON n.node = s.node)"""
        )
        parts.append(
            f"""h{i} AS MATERIALIZED (SELECT node,
                 v * 1000000000 // GREATEST((SELECT MAX(v) FROM hr{i}), 1) AS v
               FROM hr{i})"""
        )
    joined = ",\n        ".join(parts)
    if both:
        return f"""
        WITH {joined}
        SELECT n.node,
               CAST(hh.v AS BIGINT) AS hub,
               CAST(aa.v AS BIGINT) AS authority
        FROM nodes n
        JOIN h{n_iters} hh ON hh.node = n.node
        JOIN a{n_iters} aa ON aa.node = n.node
    """
    return f"""
        WITH {joined}
        SELECT n.node,
               CAST(CASE WHEN n.node IN (SELECT src FROM e)
                         THEN hh.v ELSE aa.v END AS BIGINT) AS score
        FROM nodes n
        JOIN h{n_iters} hh ON hh.node = n.node
        JOIN a{n_iters} aa ON aa.node = n.node
    """


def _hll_overlap_sql() -> str:
    """Pairwise HLL overlap replay: the approx_users_by_type register
    simulation (splitmix64 chain, p=12, rho via bit length) kept as
    sparse (event_type, idx, r) rows, then per-type estimates AND
    per-pair union estimates (register-wise MAX across the two types)
    with inclusion-exclusion on the ROUNDED BIGINTs — integer-exact
    subtraction, matching georay.sketch.hll_overlap."""
    est = (
        "CAST(round(CASE WHEN (0.7213/(1+1.079/4096))*4096*4096"
        " / ({s} + (4096-{n})) <= 2.5*4096 AND (4096-{n}) > 0"
        " THEN 4096 * ln(4096.0/(4096-{n}))"
        " ELSE (0.7213/(1+1.079/4096))*4096*4096 / ({s} + (4096-{n}))"
        " END) AS BIGINT)"
    )
    return f"""
        WITH hashes AS (
          SELECT event_type,
                 xor(x2, x2 // 2147483648) AS h
          FROM (
            SELECT event_type,
                   ((x1x % 4294967296) * 321982955
                    + (((x1x // 4294967296) * 321982955
                        + (x1x % 4294967296) * 2496678331) % 4294967296)
                      * 4294967296) % 18446744073709551616 AS x2
            FROM (
              SELECT event_type, xor(x1, x1 // 134217728) AS x1x
              FROM (
                SELECT event_type,
                       ((x0x % 4294967296) * 484763065
                        + (((x0x // 4294967296) * 484763065
                            + (x0x % 4294967296) * 3210233709) % 4294967296)
                          * 4294967296) % 18446744073709551616 AS x1
                FROM (
                  SELECT event_type, xor(x0, x0 // 1073741824) AS x0x
                  FROM (
                    SELECT event_type,
                           (user_id::HUGEINT + 11400714819323198485)
                             % 18446744073709551616 AS x0
                    FROM events)))))
        ),
        regs AS MATERIALIZED (
          SELECT event_type,
                 (h // 4503599627370496)::BIGINT AS idx,
                 MAX(CASE WHEN (h % 4503599627370496) = 0 THEN 53
                          ELSE 53 - length(bin((h % 4503599627370496)::BIGINT))
                     END) AS r
          FROM hashes GROUP BY event_type, idx
        ),
        agg AS (
          SELECT event_type, COUNT(*) AS n_present,
                 SUM(power(2.0, -r)) AS sum_present
          FROM regs GROUP BY event_type
        ),
        est AS MATERIALIZED (
          SELECT event_type,
                 {est.format(s="sum_present", n="n_present")} AS a
          FROM agg
        ),
        pairs AS (
          SELECT a.event_type AS ta, b.event_type AS tb
          FROM est a JOIN est b ON a.event_type < b.event_type
        ),
        uregs AS (
          SELECT p.ta, p.tb, r.idx, MAX(r.r) AS r
          FROM pairs p JOIN regs r
            ON r.event_type = p.ta OR r.event_type = p.tb
          GROUP BY 1, 2, 3
        ),
        uagg AS (
          SELECT ta, tb, COUNT(*) AS n_present,
                 SUM(power(2.0, -r)) AS sum_present
          FROM uregs GROUP BY 1, 2
        ),
        uest AS (
          SELECT ta, tb, {est.format(s="sum_present", n="n_present")} AS u
          FROM uagg
        )
        SELECT p.ta AS grp_a, p.tb AS grp_b,
               ea.a AS approx_a, eb.a AS approx_b, u.u AS approx_union,
               GREATEST(ea.a + eb.a - u.u, 0) AS approx_overlap
        FROM pairs p
        JOIN est ea ON ea.event_type = p.ta
        JOIN est eb ON eb.event_type = p.tb
        JOIN uest u ON u.ta = p.ta AND u.tb = p.tb
    """


def _label_prop_sql(n_iters: int = 3) -> str:
    """Unrolled synchronous label-propagation replay: per round, a
    vote count per (node, label) from labeled in-neighbors, plurality
    with ties to the smallest label, seeds pinned, no-vote nodes keep
    their previous state (matching georay.graph.label_propagation)."""
    parts = [
        """pair AS MATERIALIZED (SELECT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
                 FROM orders JOIN lineitem ON l_orderkey = o_orderkey)""",
        "e AS MATERIALIZED (SELECT src, dst FROM pair UNION ALL SELECT dst, src FROM pair)",
        """nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM e
                  UNION SELECT DISTINCT dst FROM e)""",
        """seeds AS MATERIALIZED (SELECT c_custkey * 2 AS node,
                  CAST(c_nationkey AS BIGINT) AS label
                  FROM customer WHERE c_custkey % 10 = 0)""",
        """l0 AS MATERIALIZED (SELECT n.node, COALESCE(s.label, -1) AS label
              FROM nodes n LEFT JOIN seeds s ON s.node = n.node)""",
    ]
    for i in range(1, n_iters + 1):
        parts.append(
            f"""v{i} AS MATERIALIZED (SELECT e.dst AS node, l.label, COUNT(*) AS c
              FROM e JOIN l{i - 1} l ON e.src = l.node
              WHERE l.label <> -1 GROUP BY 1, 2)"""
        )
        parts.append(
            f"""b{i} AS MATERIALIZED (SELECT node, label FROM (
                SELECT node, label,
                       ROW_NUMBER() OVER (PARTITION BY node
                                          ORDER BY c DESC, label) AS rn
                FROM v{i}) WHERE rn = 1)"""
        )
        parts.append(
            f"""l{i} AS MATERIALIZED (SELECT n.node,
                 CASE WHEN s.label IS NOT NULL THEN s.label
                      WHEN b.label IS NOT NULL THEN b.label
                      ELSE p.label END AS label
               FROM nodes n
               LEFT JOIN seeds s ON s.node = n.node
               LEFT JOIN b{i} b ON b.node = n.node
               LEFT JOIN l{i - 1} p ON p.node = n.node)"""
        )
    joined = ",\n        ".join(parts)
    return f"""
        WITH {joined}
        SELECT node, label FROM l{n_iters}
    """


def _ppr_sql(n_iters: int = 5) -> str:
    """Unrolled integer-nano PERSONALIZED PageRank: identical update
    arithmetic to _pagerank_sql, but teleport mass lives only on the
    BUILDING-customer source nodes (matching
    pagerank(source_nodes=...))."""
    prev = "r0t"
    iters = []
    for i in range(1, n_iters + 1):
        iters.append(
            f"""i{i} AS (
              SELECT n.node,
                     CAST(COALESCE(sb.base_s, 0)
                          + (85 * COALESCE(f.s, 0)) // 100 AS BIGINT) AS r
              FROM nodes n
              LEFT JOIN srcbase sb ON n.node = sb.node
              LEFT JOIN (
                SELECT e.dst AS node, SUM(rr.r // dg.d) AS s
                FROM e JOIN {prev} rr ON e.src = rr.node
                       JOIN deg dg ON e.src = dg.node
                GROUP BY e.dst) f ON n.node = f.node)"""
        )
        prev = f"i{i}"
    joined = ",\n        ".join(iters)
    return f"""
        WITH pair AS (
          SELECT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
          FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        ),
        e AS (SELECT c AS src, s AS dst FROM pair
              UNION ALL SELECT s AS src, c AS dst FROM pair),
        nodes AS (SELECT DISTINCT src AS node FROM e),
        deg AS (SELECT src AS node, COUNT(*) AS d FROM e GROUP BY src),
        src_c AS (SELECT DISTINCT c_custkey * 2 AS node FROM customer
                  WHERE c_mktsegment = 'BUILDING'),
        srcg AS (SELECT s.node FROM src_c s JOIN nodes n ON n.node = s.node),
        p AS (SELECT CAST(1000000000000 // COUNT(*) AS BIGINT) AS r0s FROM srcg),
        srcbase AS (SELECT node, CAST((15 * r0s) // 100 AS BIGINT) AS base_s, r0s
                    FROM srcg, p),
        r0t AS (SELECT n.node, CAST(COALESCE(sb.r0s, 0) AS BIGINT) AS r
                FROM nodes n LEFT JOIN srcbase sb ON n.node = sb.node),
        {joined}
        SELECT node, r AS rank_nano FROM {prev}
    """


def _kcore_sql(k: int = 3, rounds: int = 16) -> str:
    """Unrolled k-core peeling over the part co-order graph
    (part_pair_counts edges, min_orders=2): each round recomputes
    degrees and keeps edges whose BOTH endpoints have degree >= k.
    Peeling is idempotent past the fixpoint, so any unroll count >=
    the true round count (10 at sf0.01) reproduces georay.graph.kcore
    exactly."""
    parts = [
        "lp AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)",
        """e0 AS MATERIALIZED (
          SELECT a.l_partkey AS pa, b.l_partkey AS pb
          FROM lp a JOIN lp b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2 HAVING COUNT(*) >= 2)""",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"""d{i} AS MATERIALIZED (
              SELECT node, COUNT(*) AS deg FROM (
                SELECT pa AS node FROM e{i - 1}
                UNION ALL SELECT pb FROM e{i - 1})
              GROUP BY 1)"""
        )
        parts.append(
            f"""e{i} AS MATERIALIZED (
              SELECT e.pa, e.pb FROM e{i - 1} e
              JOIN d{i} da ON da.node = e.pa AND da.deg >= {k}
              JOIN d{i} db ON db.node = e.pb AND db.deg >= {k})"""
        )
    joined = ",\n        ".join(parts)
    return f"""
        WITH {joined}
        SELECT node AS part_key, COUNT(*)::BIGINT AS degree FROM (
          SELECT pa AS node FROM e{rounds}
          UNION ALL SELECT pb FROM e{rounds})
        GROUP BY 1
    """


def _greedy_coverage_sql(k: int = 5) -> str:
    """Unrolled greedy max-coverage replay: round r picks the doc with
    the most not-yet-covered distinct bigrams (ties to lowest doc_id),
    excluding already-selected docs; candidates are docs with >= 1
    bigram — the same candidate set as georay.textops.greedy_coverage's
    shingle table."""
    parts = [
        r"""t AS MATERIALIZED (
          SELECT doc_id, regexp_split_to_array(TRIM(text), '\s+') AS w FROM documents)""",
        """words AS MATERIALIZED (
          SELECT doc_id, i, w[i+1] AS tok FROM t, UNNEST(range(len(w))) AS u(i))""",
        """b AS MATERIALIZED (
          SELECT DISTINCT a.doc_id, a.tok || ' ' || b.tok AS bg
          FROM words a JOIN words b ON a.doc_id = b.doc_id AND b.i = a.i + 1)""",
        "g1 AS MATERIALIZED (SELECT doc_id, COUNT(*)::BIGINT AS gain FROM b GROUP BY 1)",
        """s1 AS MATERIALIZED (
          SELECT 0::BIGINT AS sel_rank, doc_id, gain FROM g1
          ORDER BY gain DESC, doc_id LIMIT 1)""",
        "cov1 AS MATERIALIZED (SELECT DISTINCT bg FROM b JOIN s1 USING (doc_id))",
        "sel1 AS MATERIALIZED (SELECT doc_id FROM s1)",
    ]
    for r in range(2, k + 1):
        parts.append(
            f"""g{r} AS MATERIALIZED (
              SELECT b.doc_id, CAST(COUNT(*) - COUNT(cv.bg) AS BIGINT) AS gain
              FROM b LEFT JOIN cov{r - 1} cv ON b.bg = cv.bg
              WHERE b.doc_id NOT IN (SELECT doc_id FROM sel{r - 1})
              GROUP BY 1)"""
        )
        parts.append(
            f"""s{r} AS MATERIALIZED (
              SELECT {r - 1}::BIGINT AS sel_rank, doc_id, gain FROM g{r}
              ORDER BY gain DESC, doc_id LIMIT 1)"""
        )
        parts.append(
            f"""cov{r} AS MATERIALIZED (
              SELECT bg FROM cov{r - 1}
              UNION SELECT bg FROM b JOIN s{r} USING (doc_id))"""
        )
        parts.append(
            f"""sel{r} AS MATERIALIZED (
              SELECT doc_id FROM sel{r - 1} UNION ALL SELECT doc_id FROM s{r})"""
        )
    union = "\n        UNION ALL ".join(
        f"SELECT sel_rank, doc_id, gain FROM s{r}" for r in range(1, k + 1)
    )
    joined = ",\n        ".join(parts)
    return f"""
        WITH {joined}
        {union}
    """


def _linreg_sql(n_rounds: int = 5, lr_shift: int = 16) -> str:
    """Unrolled exact-integer gradient-descent replay of
    georay.textops.linreg_train: every quantity is BIGINT nano-units,
    every update uses DuckDB's truncating `//` (the numpy side
    matches with sign*(abs//d)), so the trajectory is bit-exact with
    no float anywhere."""
    div = 1 << lr_shift
    parts = [
        r"""d AS MATERIALIZED (
          SELECT doc_id,
                 CASE WHEN TRIM(text) = '' THEN 0
                      ELSE LEN(regexp_split_to_array(TRIM(text), '\s+'))
                 END AS ntok,
                 LENGTH(text) AS nch
          FROM documents)""",
        r"""dist AS MATERIALIZED (
          SELECT d.doc_id, COALESCE(u.cnt, 0) AS ndist FROM d LEFT JOIN (
            SELECT doc_id, COUNT(DISTINCT tok) AS cnt FROM (
              SELECT doc_id, UNNEST(regexp_split_to_array(TRIM(text), '\s+')) AS tok
              FROM documents WHERE TRIM(text) <> '') GROUP BY 1) u
          ON d.doc_id = u.doc_id)""",
        """f AS MATERIALIZED (
          SELECT d.doc_id, CAST(ntok // 8 AS BIGINT) AS x1,
                 CAST(nch // 64 AS BIGINT) AS x2,
                 CAST(ndist * 1000000000 AS BIGINT) AS y_nano
          FROM d JOIN dist ON d.doc_id = dist.doc_id)""",
        "w0 AS (SELECT 0::BIGINT AS a, 0::BIGINT AS b, 0::BIGINT AS c)",
    ]
    for r in range(1, n_rounds + 1):
        parts.append(
            f"""g{r} AS MATERIALIZED (
              SELECT CAST(SUM(w.a + w.b * x1 + w.c * x2 - y_nano) AS BIGINT) AS g0,
                     CAST(SUM((w.a + w.b * x1 + w.c * x2 - y_nano) * x1) AS BIGINT) AS g1,
                     CAST(SUM((w.a + w.b * x1 + w.c * x2 - y_nano) * x2) AS BIGINT) AS g2
              FROM f, w{r - 1} w)"""
        )
        parts.append(
            f"""w{r} AS (SELECT w.a - g.g0 // {div} AS a,
                            w.b - g.g1 // {div} AS b,
                            w.c - g.g2 // {div} AS c
                     FROM w{r - 1} w, g{r} g)"""
        )
    joined = ",\n        ".join(parts)
    return f"""
        WITH {joined}
        SELECT f.doc_id,
               CAST(w.a + w.b * x1 + w.c * x2 AS BIGINT) AS pred_nano,
               CAST(w.a + w.b * x1 + w.c * x2 - y_nano AS BIGINT) AS resid_nano
        FROM f, w{n_rounds} w
    """


def _kcenter_sql(k: int = 8) -> str:
    """Unrolled greedy farthest-point replay: seed = lowest vec_id;
    each round picks (max 1e-4-quantized min squared distance to the
    selected set, then lowest vec_id). Same quantization point as
    pq_encode (list_distance^2 at 1e4 is DuckDB/numpy-stable); every
    CTE is MATERIALIZED so the chain doesn't inline exponentially."""
    parts = [
        "e AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings)",
        """c0 AS MATERIALIZED (
          SELECT 0::BIGINT AS sel_rank, vec_id, 0::BIGINT AS dist_q
          FROM e WHERE vec_id = (SELECT MIN(vec_id) FROM e))""",
        "sel1 AS MATERIALIZED (SELECT vec_id FROM c0)",
    ]
    for r in range(1, k):
        parts.append(
            f"""m{r} AS MATERIALIZED (
              SELECT e.vec_id,
                     MIN(CAST(FLOOR(POW(list_distance(e.embedding, ce.embedding), 2)
                                    * 10000 + 0.5) AS BIGINT)) AS q
              FROM e, e ce
              WHERE ce.vec_id IN (SELECT vec_id FROM sel{r})
              GROUP BY e.vec_id)"""
        )
        parts.append(
            f"""c{r} AS MATERIALIZED (
              SELECT {r}::BIGINT AS sel_rank, vec_id, q AS dist_q
              FROM m{r} ORDER BY q DESC, vec_id LIMIT 1)"""
        )
        if r + 1 < k:
            parts.append(
                f"""sel{r + 1} AS MATERIALIZED (
                  SELECT vec_id FROM sel{r} UNION ALL SELECT vec_id FROM c{r})"""
            )
    union = "\n          UNION ALL ".join(
        f"SELECT sel_rank, vec_id, dist_q FROM c{r}" for r in range(k)
    )
    joined = ",\n        ".join(parts)
    return f"""
        WITH {joined}
        {union}
    """


def _kmeans_sql(k: int = 8, n_iters: int = 3) -> str:
    """Unrolled Lloyd k-means replay: per round, micro-quantized cosine
    argmax assignment (ties to lowest cid), then per-dim member means
    quantized to 1e-4 — the same two quantization points
    georay.ann.kmeans_iter applies, so both engines walk the identical
    centroid trajectory. Empty clusters carry the previous centroid."""
    rounds = []
    prev = "c0"
    for r in range(1, n_iters + 1):
        rounds.append(
            f"""a{r} AS (SELECT vec_id, cid AS cluster FROM (
              SELECT e.vec_id, c.cid,
                     row_number() OVER (PARTITION BY e.vec_id ORDER BY
                       CAST(FLOOR(list_cosine_similarity(
                              CAST(e.embedding AS DOUBLE[]), c.ce)
                            * 1000000 + 0.5) AS BIGINT) DESC, c.cid) AS rn
              FROM embeddings e, {prev} c) WHERE rn = 1),
            m{r} AS (SELECT a{r}.cluster AS cid, ed.dim,
                            FLOOR(AVG(ed.v) * 10000 + 0.5) / 10000 AS mv
                     FROM a{r} JOIN ed ON a{r}.vec_id = ed.vec_id
                     GROUP BY a{r}.cluster, ed.dim),
            c{r} AS (SELECT cid, list(mv ORDER BY dim) AS ce
                     FROM m{r} GROUP BY cid
                     UNION ALL
                     SELECT p.cid, p.ce FROM {prev} p
                     WHERE p.cid NOT IN (SELECT cid FROM m{r}))"""
        )
        prev = f"c{r}"
    joined = ",\n            ".join(rounds)
    return f"""
        WITH ed AS (SELECT vec_id, d.i - 1 AS dim,
                           list_extract(CAST(embedding AS DOUBLE[]), d.i) AS v
                    FROM embeddings, generate_series(1, 4096) AS d(i)
                    WHERE d.i <= len(embedding)),
        c0 AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS ce
               FROM embeddings WHERE vec_id < {k}),
        {joined}
        SELECT vec_id, CAST(cluster AS INTEGER) AS cluster, cos_micro FROM (
          SELECT e.vec_id, c.cid AS cluster,
                 CAST(FLOOR(list_cosine_similarity(
                        CAST(e.embedding AS DOUBLE[]), c.ce)
                      * 1000000 + 0.5) AS BIGINT) AS cos_micro,
                 row_number() OVER (PARTITION BY e.vec_id ORDER BY
                   CAST(FLOOR(list_cosine_similarity(
                          CAST(e.embedding AS DOUBLE[]), c.ce)
                        * 1000000 + 0.5) AS BIGINT) DESC, c.cid) AS rn
          FROM embeddings e, {prev} c) WHERE rn = 1
    """


def _pca_sql(n_iters: int = 5) -> str:
    """Unrolled power-iteration replay of georay.ann.power_pca: mean
    and per-round normalized direction quantized to 1e-6, v0 = the
    all-ones direction — the same trajectory the Ray engine walks, in
    plain SUM/AVG SQL."""
    rounds = []
    prev = "v0"
    for r in range(1, n_iters + 1):
        rounds.append(
            f"""dot{r} AS (SELECT cd.vec_id, SUM(cd.c * w.w) AS t
                      FROM cd JOIN {prev} w USING (dim) GROUP BY cd.vec_id),
            p{r} AS (SELECT cd.dim, SUM(cd.c * dd.t) AS p
                     FROM cd JOIN dot{r} dd USING (vec_id) GROUP BY cd.dim),
            n{r} AS (SELECT sqrt(SUM(p * p)) AS nrm FROM p{r}),
            v{r} AS (SELECT dim, FLOOR(p / nrm * 1000000 + 0.5) / 1000000 AS w
                     FROM p{r}, n{r})"""
        )
        prev = f"v{r}"
    joined = ",\n            ".join(rounds)
    return f"""
        WITH ed AS (SELECT vec_id, d.i - 1 AS dim,
                           list_extract(CAST(embedding AS DOUBLE[]), d.i) AS v
                    FROM embeddings, generate_series(1, 4096) AS d(i)
                    WHERE d.i <= len(embedding)),
        mu AS (SELECT dim, FLOOR(AVG(v) * 1000000 + 0.5) / 1000000 AS m
               FROM ed GROUP BY dim),
        cd AS (SELECT ed.vec_id, ed.dim, ed.v - mu.m AS c
               FROM ed JOIN mu USING (dim)),
        v0 AS (SELECT dim,
                      FLOOR(1.0 / sqrt((SELECT COUNT(*) FROM mu)) * 1000000 + 0.5)
                        / 1000000 AS w
               FROM mu),
        {joined}
        SELECT cd.vec_id,
               CAST(FLOOR(SUM(cd.c * w.w) * 1000000 + 0.5) AS BIGINT) AS proj_micro
        FROM cd JOIN {prev} w USING (dim) GROUP BY cd.vec_id
    """


def oracle_sql() -> dict[str, str]:
    try:
        glob = _ensure_oracle_corpus()
    except Exception:
        glob = None
    try:
        media_glob = _ensure_media_corpus()
    except Exception:
        media_glob = None
    sql = _add_derived_oracles(_oracle_sql_raw())
    # corpus unavailable: exclude the oracles that read a missing path
    # rather than hand the driver failing SQL
    if glob is None:
        sql = {k: v for k, v in sql.items() if _PAGES_GLOB not in v}
    else:
        sql = {k: v.replace(_PAGES_GLOB, glob) for k, v in sql.items()}
    if media_glob is None:
        sql = {k: v for k, v in sql.items() if _MEDIA_GLOB not in v}
    else:
        sql = {k: v.replace(_MEDIA_GLOB, media_glob) for k, v in sql.items()}
    return sql


def _oracle_sql_raw() -> dict[str, str]:
    return {
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
                   CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_price_cents,
                   CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                       * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT) AS sum_disc_price_em4,
                   COUNT(*) AS count_order
            FROM lineitem
            GROUP BY l_returnflag, l_linestatus
        """,
        "top_orders": """
            SELECT o_orderkey, c_name, o_totalprice
            FROM orders JOIN customer ON o_custkey = c_custkey
            ORDER BY o_totalprice DESC, o_orderkey ASC
            LIMIT 10
        """,
        "region_revenue": """
            SELECT r_name,
                   CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                       * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT) AS revenue_em4
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name
        """,
        "events_hourly": """
            SELECT CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS window_hour,
                   event_type,
                   COUNT(*) AS n_events,
                   CAST(SUM(CAST(ROUND(value*1000000) AS BIGINT)) AS BIGINT) AS sum_value_em6
            FROM events
            GROUP BY 1, 2
        """,
        "orders_filter_sort": """
            SELECT o_orderkey, o_orderdate, o_totalprice
            FROM orders
            WHERE o_orderstatus = 'O'
            ORDER BY o_orderdate ASC, o_orderkey ASC
            LIMIT 100
        """,
        "part_stats": """
            SELECT p_brand,
                   COUNT(*) AS n_parts,
                   CAST(SUM(CAST(ROUND(p_retailprice*100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
                   CAST(MIN(p_size) AS BIGINT) AS min_size,
                   CAST(MAX(p_size) AS BIGINT) AS max_size
            FROM part
            GROUP BY p_brand
        """,
        "dedup_exact": """
            SELECT MIN(doc_id) AS doc_id, COUNT(*) AS dup_count
            FROM documents
            GROUP BY text
        """,
        "rolling_event_sums": """
            SELECT event_id, user_id,
                   CAST(SUM(CAST(ROUND(value*1000000) AS BIGINT)) OVER (
                        PARTITION BY user_id
                        ORDER BY epoch_us(ts), event_id
                        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS w_sum_em6
            FROM events
        """,
        "customers_without_urgent": """
            SELECT c_custkey FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey
                                AND o_orderpriority = '1-URGENT')
        """,
        # HLL is deterministic (splitmix64 on int64 user ids, fixed
        # p=12 registers), so DuckDB can replay it exactly: the 64-bit
        # mixer runs in HUGEINT with each 64x64 multiply split into
        # 32-bit halves (a*b mod 2^64 without INT128 overflow), rho
        # comes from length(bin(w)) (integer-exact bit_length), and the
        # Flajolet estimator + linear-counting correction are plain
        # float math. Verified equal to georay.sketch at sf 0.001/0.01/0.1.
        "hll_overlap": _hll_overlap_sql(),
        "approx_users_by_type": """
            WITH hashes AS (
              SELECT event_type,
                     xor(x2, x2 // 2147483648) AS h
              FROM (
                SELECT event_type,
                       ((x1x % 4294967296) * 321982955
                        + (((x1x // 4294967296) * 321982955
                            + (x1x % 4294967296) * 2496678331) % 4294967296)
                          * 4294967296) % 18446744073709551616 AS x2
                FROM (
                  SELECT event_type, xor(x1, x1 // 134217728) AS x1x
                  FROM (
                    SELECT event_type,
                           ((x0x % 4294967296) * 484763065
                            + (((x0x // 4294967296) * 484763065
                                + (x0x % 4294967296) * 3210233709) % 4294967296)
                              * 4294967296) % 18446744073709551616 AS x1
                    FROM (
                      SELECT event_type, xor(x0, x0 // 1073741824) AS x0x
                      FROM (
                        SELECT event_type,
                               (user_id::HUGEINT + 11400714819323198485)
                                 % 18446744073709551616 AS x0
                        FROM events)))))
            ),
            regs AS (
              SELECT event_type,
                     (h // 4503599627370496)::BIGINT AS idx,
                     MAX(CASE WHEN (h % 4503599627370496) = 0 THEN 53
                              ELSE 53 - length(bin((h % 4503599627370496)::BIGINT))
                         END) AS r
              FROM hashes GROUP BY event_type, idx
            ),
            agg AS (
              SELECT event_type, COUNT(*) AS n_present,
                     SUM(power(2.0, -r)) AS sum_present
              FROM regs GROUP BY event_type
            )
            SELECT event_type,
                   CAST(round(CASE
                     WHEN (0.7213/(1+1.079/4096))*4096*4096
                          / (sum_present + (4096-n_present)) <= 2.5*4096
                          AND (4096-n_present) > 0
                     THEN 4096 * ln(4096.0/(4096-n_present))
                     ELSE (0.7213/(1+1.079/4096))*4096*4096
                          / (sum_present + (4096-n_present))
                   END) AS BIGINT) AS approx_distinct
            FROM agg
        """,
        # Text-hygiene oracles: pyarrow and DuckDB both embed RE2, so
        # regexp_replace/extract_all replay pc.replace_substring_regex /
        # pc.count_substring_regex byte-for-byte; patterns apply in the
        # same fixed order (email, ip, phone) with each count taken on
        # the text that pattern actually saw.
        # normalize: lower -> non-alnum runs to one space -> trim; the
        # 64-bit hash is the sha256-prefix-8 both engines compute
        "normalize_text": """
            WITH n AS (
              SELECT doc_id,
                     TRIM(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))
                       AS norm_text
              FROM documents
            )
            SELECT doc_id, norm_text,
                   CAST(('0x' || substr(sha256(norm_text), 1, 16)) AS UBIGINT)
                     AS norm_hash
            FROM n
        """,
        # SQL groups by the normalized STRING; Ray groups by its 64-bit
        # hash — identical modulo sha256-prefix collisions (~n^2/2^64)
        "dedup_normalized": """
            WITH n AS (
              SELECT doc_id,
                     TRIM(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))
                       AS norm_text
              FROM documents
            )
            SELECT MIN(doc_id) AS doc_id, COUNT(*) AS dup_count
            FROM n GROUP BY norm_text
        """,
        "scrub_text": """
            WITH s1 AS (
              SELECT doc_id,
                     regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                                    '<EMAIL>', 'g') AS x,
                     LEN(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
                       AS n_emails
              FROM documents),
            s2 AS (
              SELECT doc_id,
                     regexp_replace(x, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b',
                                    '<IP>', 'g') AS x,
                     n_emails,
                     LEN(regexp_extract_all(x, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b'))
                       AS n_ips
              FROM s1),
            s3 AS (
              SELECT doc_id,
                     regexp_replace(x, '\\+?\\d[\\d\\- ]{7,}\\d', '<PHONE>', 'g') AS x,
                     n_emails, n_ips,
                     LEN(regexp_extract_all(x, '\\+?\\d[\\d\\- ]{7,}\\d')) AS n_phones
              FROM s2)
            SELECT doc_id, TRIM(regexp_replace(x, '\\s+', ' ', 'g')) AS clean_text,
                   n_emails, n_ips, n_phones
            FROM s3
        """,
        # corpus-frequency boilerplate: segments are NON-overlapping
        # 4-token windows (list_slice over generate_series, the
        # chunk_texts idiom); df counts DISTINCT docs per segment text
        # (the Ray side groups by the segment's sha256-prefix-8 hash —
        # same partition at 64-bit collision odds); counts keep
        # within-doc multiplicity
        "boilerplate_segments": """
            WITH t AS (
              SELECT doc_id, regexp_split_to_array(TRIM(text), '\\s+') AS w
              FROM documents WHERE TRIM(text) <> ''
            ),
            s AS (
              SELECT doc_id,
                     array_to_string(list_slice(w, k*4 + 1, k*4 + 4), ' ') AS seg
              FROM t, generate_series(0, 99999) AS g(k)
              WHERE k*4 < len(w)
            ),
            df AS (
              SELECT seg, COUNT(DISTINCT doc_id) AS df FROM s GROUP BY seg
            ),
            fl AS (
              SELECT s.doc_id, CASE WHEN df.df >= 3 THEN 1 ELSE 0 END AS b
              FROM s JOIN df USING (seg)
            )
            SELECT doc_id,
                   COUNT(*) AS n_segs,
                   CAST(SUM(b) AS BIGINT) AS n_boiler,
                   CAST(FLOOR(SUM(b) * 1000000.0 / COUNT(*) + 0.5) AS BIGINT)
                     AS boiler_ratio_micro
            FROM fl GROUP BY doc_id
        """,
        "doc_repetition": """
            WITH base AS (
              SELECT doc_id,
                     CASE WHEN TRIM(text) = '' THEN []::VARCHAR[]
                          ELSE regexp_split_to_array(TRIM(text), '\\s+') END AS a
              FROM documents
            ),
            dst AS (
              SELECT doc_id, COUNT(DISTINCT tok) AS n_distinct
              FROM (SELECT doc_id, unnest(a) AS tok FROM base) GROUP BY doc_id
            ),
            grams AS (
              SELECT doc_id, unnest(list_transform(generate_series(1, len(a) - 1),
                                                   i -> a[i] || ' ' || a[i+1])) AS g
              FROM base WHERE len(a) >= 2
            ),
            bg AS (
              SELECT doc_id, MAX(c) AS top_bigram_n
              FROM (SELECT doc_id, g, COUNT(*) AS c FROM grams GROUP BY doc_id, g)
              GROUP BY doc_id
            )
            SELECT b.doc_id, len(b.a) AS n_tokens,
                   COALESCE(d.n_distinct, 0) AS n_distinct,
                   COALESCE(g.top_bigram_n, 0) AS top_bigram_n
            FROM base b LEFT JOIN dst d USING (doc_id) LEFT JOIN bg g USING (doc_id)
        """,
        "url_host_stats": f"""
            SELECT regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
                   COUNT(*) AS n_pages,
                   COUNT(DISTINCT lang) AS n_langs
            FROM read_parquet('{_PAGES_GLOB}')
            GROUP BY host
        """,
        # train/val/test: sha256-prefix of "split:7:{doc_id}" against
        # integer fraction thresholds (test < 5%, val < 10%, else train)
        "dataset_split": f"""
            SELECT doc_id,
                   CASE WHEN CAST(('0x' || substr(sha256(
                               'split:7:' || CAST(doc_id AS VARCHAR)), 1, 16))
                             AS UBIGINT)
                          < CAST({int(0.05 * float(2**64))} AS UBIGINT)
                        THEN 'test'
                        WHEN CAST(('0x' || substr(sha256(
                               'split:7:' || CAST(doc_id AS VARCHAR)), 1, 16))
                             AS UBIGINT)
                          < CAST({int(0.10 * float(2**64))} AS UBIGINT)
                        THEN 'val'
                        ELSE 'train' END AS split
            FROM documents
        """,
        # GPT-2-style pre-tokenizer categories over URLs, top-40 by
        # (count desc, token asc)
        "url_bpe_tokens": f"""
            WITH toks AS (
              SELECT UNNEST(regexp_extract_all(
                       url, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9]+')) AS tok
              FROM read_parquet('{_PAGES_GLOB}')),
            cnt AS (SELECT tok, COUNT(*) AS n FROM toks GROUP BY tok),
            r AS (SELECT tok, n,
                         ROW_NUMBER() OVER (ORDER BY n DESC, tok) AS rn
                  FROM cnt)
            SELECT tok,
                   CASE WHEN regexp_matches(tok, '^[A-Za-z]') THEN 'alpha'
                        WHEN regexp_matches(tok, '^[0-9]') THEN 'num'
                        ELSE 'other' END AS category,
                   n
            FROM r WHERE rn <= 40
        """,
        # Decontamination: eval membership replays the sampling hash
        # split (sha256-prefix UBIGINT vs the same int threshold the
        # Ray side computes); gram identity compares the gram STRINGS,
        # which equals the Ray side's 64-bit gram-hash membership
        # modulo sha256-prefix collisions (~1e-8 at this scale).
        "decontam_ngrams": f"""
            WITH base AS (
              SELECT doc_id,
                     CASE WHEN TRIM(text) = '' THEN []::VARCHAR[]
                          ELSE regexp_split_to_array(TRIM(text), '\\s+') END AS a
              FROM documents),
            ev AS (
              SELECT doc_id FROM documents
              WHERE CAST(('0x' || substr(sha256('7:' || CAST(doc_id AS VARCHAR)), 1, 16))
                         AS UBIGINT) < CAST({int(0.02 * float(2**64))} AS UBIGINT)),
            grams AS (
              SELECT DISTINCT doc_id,
                     unnest(list_transform(generate_series(1, len(a) - 2),
                                           i -> a[i] || ' ' || a[i+1] || ' ' || a[i+2])) AS g
              FROM base WHERE len(a) >= 3),
            evg AS (SELECT DISTINCT g FROM grams
                    WHERE doc_id IN (SELECT doc_id FROM ev))
            SELECT doc_id, COUNT(*) AS n_shared_grams
            FROM grams
            WHERE doc_id NOT IN (SELECT doc_id FROM ev)
              AND g IN (SELECT g FROM evg)
            GROUP BY doc_id
        """,
        "quality_filter": """
            WITH base AS (
              SELECT doc_id,
                     CASE WHEN TRIM(text) = '' THEN []::VARCHAR[]
                          ELSE regexp_split_to_array(TRIM(text), '\\s+') END AS a
              FROM documents),
            dst AS (
              SELECT doc_id, COUNT(DISTINCT tok) AS n_distinct
              FROM (SELECT doc_id, unnest(a) AS tok FROM base) GROUP BY doc_id),
            bg AS (
              SELECT doc_id, MAX(c) AS top_bigram_n
              FROM (SELECT doc_id, g, COUNT(*) AS c FROM
                    (SELECT doc_id, unnest(list_transform(generate_series(1, len(a) - 1),
                                                          i -> a[i] || ' ' || a[i+1])) AS g
                     FROM base WHERE len(a) >= 2) GROUP BY doc_id, g)
              GROUP BY doc_id),
            rep AS (
              SELECT b.doc_id, len(b.a) AS n_tokens,
                     COALESCE(d.n_distinct, 0) AS n_distinct,
                     COALESCE(g.top_bigram_n, 0) AS top_bigram_n
              FROM base b LEFT JOIN dst d USING (doc_id) LEFT JOIN bg g USING (doc_id))
            SELECT * FROM rep
            WHERE n_tokens >= 20 AND n_tokens <= 100000
              AND 100 * n_distinct >= 40 * n_tokens
              AND 100 * top_bigram_n <= 8 * n_tokens
        """,
        # PMI in integer micro-nats, same float op order as the engine:
        # (n_ab/N_bi) / ((n_a/N_uni)*(n_b/N_uni)), ln, *1e6, half-up
        "pmi_collocations": """
            WITH t AS (SELECT doc_id, regexp_split_to_array(TRIM(text), '\\s+') AS w
                       FROM documents WHERE TRIM(text) <> ''),
            words AS (SELECT doc_id, i, w[i+1] AS tok
                      FROM t, UNNEST(range(len(w))) AS u(i)),
            uni AS (SELECT tok, COUNT(*) AS n FROM words GROUP BY tok),
            nu AS (SELECT CAST(SUM(n) AS DOUBLE) AS n_uni FROM uni),
            big AS (SELECT a.tok AS ta, b.tok AS tb,
                           a.tok || ' ' || b.tok AS bigram
                    FROM words a JOIN words b
                      ON a.doc_id = b.doc_id AND b.i = a.i + 1),
            bc AS (SELECT bigram, MIN(ta) AS ta, MIN(tb) AS tb, COUNT(*) AS n
                   FROM big GROUP BY bigram HAVING COUNT(*) >= 5),
            nb AS (SELECT CAST(SUM(n) AS DOUBLE) AS n_bi
                   FROM (SELECT COUNT(*) AS n FROM big GROUP BY bigram)),
            sc AS (SELECT bc.bigram, CAST(bc.n AS BIGINT) AS n,
                          CAST(floor(ln((CAST(bc.n AS DOUBLE) / nb.n_bi) /
                                        ((CAST(ua.n AS DOUBLE) / nu.n_uni) *
                                         (CAST(ub.n AS DOUBLE) / nu.n_uni)))
                                     * 1000000 + 0.5) AS BIGINT) AS pmi_unats
                   FROM bc
                   JOIN uni ua ON ua.tok = bc.ta
                   JOIN uni ub ON ub.tok = bc.tb
                   CROSS JOIN nu CROSS JOIN nb)
            SELECT bigram, n, pmi_unats FROM sc
            ORDER BY pmi_unats DESC, bigram LIMIT 20
        """,
        # cohort retention: active users per epoch-week also active
        # the following week
        "weekly_retention": """
            WITH uw AS (
              SELECT DISTINCT user_id,
                     CAST(epoch_us(ts) // 604800000000 AS BIGINT) AS week
              FROM events
            )
            SELECT a.week, COUNT(*) AS n_active,
                   CAST(COUNT(b.user_id) AS BIGINT) AS n_retained
            FROM uw a LEFT JOIN uw b
              ON a.user_id = b.user_id AND b.week = a.week + 1
            GROUP BY a.week
        """,
        # OLAP rollup: subtotals at every prefix level, NULL markers
        "orders_rollup": """
            SELECT o_orderpriority, o_orderstatus,
                   COUNT(*) AS n_orders,
                   CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                     AS total_cents
            FROM orders
            GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
        """,
        "orders_cube": """
            SELECT o_orderpriority, o_orderstatus,
                   COUNT(*) AS n_orders,
                   CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                     AS total_cents
            FROM orders
            GROUP BY CUBE (o_orderpriority, o_orderstatus)
        """,
        # RANGE window (time-interval frame, ts peers share a frame)
        "rolling_time_sums": """
            SELECT event_id, CAST(user_id AS BIGINT) AS user_id,
                   CAST(SUM(CAST(ROUND(value * 1000000) AS BIGINT)) OVER (
                     PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 10 MINUTES PRECEDING
                           AND CURRENT ROW) AS BIGINT) AS win_sum_micro
            FROM events
        """,
        # hopping window: each event lands in span/hop = 4 overlapping
        # windows whose starts are hop-aligned
        "hopping_window_counts": """
            WITH e AS (SELECT CAST(epoch_us(ts) AS BIGINT) AS us,
                              event_type FROM events),
            w AS (SELECT (us // 900000000) * 900000000
                           - i.i * 900000000 AS win_us,
                         event_type
                  FROM e, (SELECT UNNEST(generate_series(0, 3)) AS i) i)
            SELECT win_us, event_type, COUNT(*) AS n_events
            FROM w GROUP BY 1, 2
        """,
        # interval join: purchases x same-user events in the trailing
        # 24h, strictly before (self and ts-peers excluded); values
        # quantized to integer micro-units before the sum
        "attribution_join": """
            WITH p AS (
              SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'purchase')
            SELECT p.event_id,
                   CAST(COUNT(e.event_id) AS BIGINT) AS n_prior,
                   CAST(COALESCE(
                     SUM(CAST(ROUND(e.value * 1000000) AS BIGINT)), 0)
                     AS BIGINT) AS prior_sum_micro
            FROM p LEFT JOIN events e
              ON e.user_id = p.user_id
             AND e.ts >= p.ts - INTERVAL 24 HOURS
             AND e.ts < p.ts
            GROUP BY p.event_id
        """,
        # funnel: EXISTS(click before purchase) == MIN(click ts) <
        # MAX(purchase ts) — one grouped conditional min/max
        "funnel_users": """
            SELECT user_id,
                   MIN(epoch_us(ts)) FILTER (WHERE event_type = 'click')
                     AS first_click_us,
                   MAX(epoch_us(ts)) FILTER (WHERE event_type = 'purchase')
                     AS last_purchase_us
            FROM events
            GROUP BY user_id
            HAVING MIN(epoch_us(ts)) FILTER (WHERE event_type = 'click')
                   < MAX(epoch_us(ts)) FILTER (WHERE event_type = 'purchase')
        """,
        # market-basket co-occurrence: distinct part pairs per order,
        # counted across orders, kept at >= 2 co-occurrences
        "part_pair_counts": """
            WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
            SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                   COUNT(*) AS n_orders
            FROM lp a JOIN lp b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2 HAVING COUNT(*) >= 2
        """,
        # per-user standardization; z micro-quantized on both sides,
        # single-event users (population std 0) -> null
        "user_event_zscores": """
            SELECT event_id, CAST(user_id AS BIGINT) AS user_id,
                   CASE WHEN STDDEV_POP(value) OVER (PARTITION BY user_id) > 0
                        THEN CAST(FLOOR(
                          (value - AVG(value) OVER (PARTITION BY user_id))
                          / STDDEV_POP(value) OVER (PARTITION BY user_id)
                          * 1000000 + 0.5) AS BIGINT)
                        ELSE NULL END AS z_micro
            FROM events
        """,
        "user_event_deltas": """
            SELECT event_id, user_id,
                   ts_us - LAG(ts_us) OVER w AS gap_us,
                   val_c - LAG(val_c) OVER w AS dvalue_cents
            FROM (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
                         CAST(ROUND(value * 100) AS BIGINT) AS val_c
                  FROM events)
            WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
        """,
        # robust per-supplier outlier profile: 2x-median and 4x-MAD are
        # exact integer order-statistic sums; the fence is the integer
        # test 4*|2c-med2| > 3*mad4 (= |x-med| > 1.5*MAD)
        "mad_outliers": """
            WITH li AS (
              SELECT l_suppkey AS suppkey,
                     CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS c
              FROM lineitem
            ),
            m AS (SELECT suppkey, COUNT(*) AS n,
                         CAST(ROUND(2 * MEDIAN(c)) AS BIGINT) AS med2
                  FROM li GROUP BY suppkey),
            d AS (SELECT li.suppkey, ABS(2 * li.c - m.med2) AS dev
                  FROM li JOIN m USING (suppkey)),
            md AS (SELECT suppkey,
                          CAST(ROUND(2 * MEDIAN(dev)) AS BIGINT) AS mad4
                   FROM d GROUP BY suppkey),
            o AS (SELECT d.suppkey,
                         COUNT(*) FILTER (WHERE 4 * d.dev > 3 * md.mad4) AS n_outliers
                  FROM d JOIN md USING (suppkey) GROUP BY d.suppkey)
            SELECT m.suppkey, m.n, m.med2 AS med2_cents,
                   md.mad4 AS mad4_cents, o.n_outliers
            FROM m JOIN md USING (suppkey) JOIN o USING (suppkey)
            ORDER BY m.suppkey
        """,
        "event_transitions": """
            WITH o AS (
              SELECT user_id, event_type,
                     LAG(event_type) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id) AS prev_type
              FROM events
            )
            SELECT prev_type, event_type, COUNT(*) AS n
            FROM o WHERE prev_type IS NOT NULL
            GROUP BY prev_type, event_type
            ORDER BY prev_type, event_type
        """,
        "doc_rank_ntile": """
            SELECT doc_id, n_chars,
                   row_number() OVER (ORDER BY n_chars, doc_id) AS rnk,
                   NTILE(10) OVER (ORDER BY n_chars, doc_id) AS ntile_10
            FROM documents
        """,
        # unigram LM scoring: token log-probs quantized half-up to
        # integer micro-nats on BOTH sides, per-doc scores are exact
        # int64 sums (no float accumulation order in the hash)
        "unigram_logprob": _UNIGRAM_LM_SQL,
        # exact-substring dedup: a character position is dup iff its
        # 20-gram occurs anywhere else in the corpus (any doc, any
        # offset) — the Lee et al. repeated-span criterion
        "dup_substring_spans": """
            WITH t AS (SELECT doc_id, text FROM documents
                       WHERE length(text) >= 20),
            pp AS (SELECT doc_id, text,
                          UNNEST(generate_series(1, length(text) - 19)) AS i
                   FROM t),
            pos AS (SELECT doc_id, substring(text, i, 20) AS g FROM pp),
            cnt AS (SELECT g, COUNT(*) AS tot FROM pos GROUP BY g),
            per AS (SELECT doc_id, g, COUNT(*) AS c
                    FROM pos GROUP BY doc_id, g),
            j AS (SELECT doc_id,
                         SUM(c) AS n_pos,
                         SUM(CASE WHEN tot > 1 THEN c ELSE 0 END) AS n_dup
                  FROM per JOIN cnt USING (g) GROUP BY doc_id)
            SELECT d.doc_id,
                   CAST(COALESCE(j.n_pos, 0) AS BIGINT) AS n_pos,
                   CAST(COALESCE(j.n_dup, 0) AS BIGINT) AS n_dup
            FROM documents d LEFT JOIN j USING (doc_id)
        """,
        # bigram LM scoring: conditional ln(n(w1,w2)/n(w1 as first)),
        # quantized half-up to integer micro-nats per bigram, int64
        # sum per doc — replays georay.textops.bigram_logprob exactly
        "bigram_logprob": """
            WITH t AS (SELECT doc_id, TRIM(text) AS tt FROM documents),
            arr AS (SELECT doc_id, regexp_split_to_array(tt, '\\s+') AS a
                    FROM t WHERE tt <> ''),
            toks AS (SELECT doc_id, UNNEST(a) AS w,
                            UNNEST(generate_series(1, len(a))) AS pos
                     FROM arr),
            bi AS (SELECT a.doc_id, a.w AS w1, b.w AS w2
                   FROM toks a JOIN toks b
                     ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
            cnt AS (SELECT w1, w2, COUNT(*) AS n FROM bi GROUP BY w1, w2),
            ft AS (SELECT w1, SUM(n) AS tot FROM cnt GROUP BY w1),
            lp AS (SELECT w1, w2,
                          CAST(floor(ln(CAST(n AS DOUBLE) / tot) * 1000000 + 0.5)
                               AS BIGINT) AS unats
                   FROM cnt JOIN ft USING (w1)),
            per_doc AS (
              SELECT bi.doc_id,
                     CAST(COUNT(*) AS BIGINT) AS n_bigrams,
                     CAST(SUM(lp.unats) AS BIGINT) AS logprob_unats
              FROM bi JOIN lp USING (w1, w2) GROUP BY bi.doc_id)
            SELECT d.doc_id,
                   COALESCE(p.n_bigrams, 0) AS n_bigrams,
                   COALESCE(p.logprob_unats, 0) AS logprob_unats
            FROM documents d LEFT JOIN per_doc p USING (doc_id)
        """,
        # curriculum packing: rank by LM score then prefix-sum-pack the
        # ordered token stream — the composed pipeline's oracle is the
        # composed SQL (row_number + window prefix sum over the LM CTE)
        "curriculum_pack": f"""
            WITH lm AS ({_UNIGRAM_LM_SQL}),
            r AS (SELECT doc_id, n_tokens, logprob_unats,
                         row_number() OVER (ORDER BY logprob_unats, doc_id) AS rnk
                  FROM lm),
            s AS (SELECT *,
                         CAST(COALESCE(SUM(n_tokens) OVER (
                            ORDER BY rnk
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                           AS BIGINT) AS start_offset
                  FROM r)
            SELECT doc_id, n_tokens, logprob_unats, rnk, start_offset,
                   start_offset // 4096 AS shard_id
            FROM s
        """,
        # connected components over the near-dup pair graph: the LSH
        # pair set equals the exact-Jaccard pair set at this scale (see
        # minhash_near_dups), so the oracle computes reachability
        # closure over the exact pairs with a recursive CTE and takes
        # the per-node minimum
        "dedup_clusters": f"""
            WITH RECURSIVE
            pairs AS (SELECT a, b FROM ({_EXACT_JACCARD_SQL})),
            e AS (SELECT a AS u, b AS v FROM pairs
                  UNION ALL SELECT b, a FROM pairs),
            walk (node, reach) AS (
              SELECT u, u FROM e
              UNION
              SELECT w.node, e.v FROM walk w JOIN e ON e.u = w.reach
            )
            SELECT node AS doc_id, MIN(reach) AS cluster_id
            FROM walk GROUP BY node
        """,
        "cluster_representatives": f"""
            WITH RECURSIVE
            pairs AS (SELECT a, b FROM ({_EXACT_JACCARD_SQL})),
            e AS (SELECT a AS u, b AS v FROM pairs
                  UNION ALL SELECT b, a FROM pairs),
            walk (node, reach) AS (
              SELECT u, u FROM e
              UNION
              SELECT w.node, e.v FROM walk w JOIN e ON e.u = w.reach
            ),
            clusters AS (
              SELECT node AS doc_id, MIN(reach) AS cluster_id
              FROM walk GROUP BY node)
            SELECT cluster_id, rep_doc_id, rep_n_chars, n_members FROM (
              SELECT c.cluster_id, d.doc_id AS rep_doc_id,
                     CAST(d.n_chars AS BIGINT) AS rep_n_chars,
                     COUNT(*) OVER (PARTITION BY c.cluster_id) AS n_members,
                     ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                                        ORDER BY d.n_chars DESC, d.doc_id) AS rn
              FROM clusters c JOIN documents d USING (doc_id))
            WHERE rn = 1
        """,
        # sequence packing: the window prefix sum IS the distributed
        # scan's contract (SUM over BIGINT goes HUGEINT in DuckDB ->
        # cast back)
        "pack_sequences": """
            WITH t AS (
              SELECT doc_id,
                     CASE WHEN TRIM(text) = '' THEN 0
                          ELSE LEN(regexp_split_to_array(TRIM(text), '\\s+'))
                     END AS n_tokens
              FROM documents),
            s AS (
              SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
                     CAST(COALESCE(SUM(n_tokens) OVER (
                        ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS BIGINT) AS start_offset
              FROM t)
            SELECT doc_id, n_tokens, start_offset,
                   start_offset // 4096 AS shard_id
            FROM s
        """,
        "stratified_sample": """
            SELECT lang, doc_id FROM (
              SELECT lang, doc_id,
                     row_number() OVER (
                       PARTITION BY lang
                       ORDER BY CAST(('0x' || substr(sha256('7:' || CAST(doc_id AS VARCHAR)), 1, 16))
                                     AS UBIGINT) >> 1, doc_id) AS rn
              FROM documents)
            WHERE rn <= 20
        """,
        "domain_cap": """
            WITH r AS (SELECT doc_id, source,
                              ROW_NUMBER() OVER (PARTITION BY source
                                                 ORDER BY n_chars DESC, doc_id) AS rk
                       FROM documents)
            SELECT doc_id, source, rk FROM r WHERE rk <= 12
        """,
        # thresholds are floor(w * 2^64) as exact UBIGINT literals
        # (0.75 and 0.25 are dyadic, so the floats are exact)
        "domain_mix": """
            SELECT doc_id, source FROM documents
            WHERE CAST(('0x' || substr(sha256('11:' || CAST(doc_id AS VARCHAR)), 1, 16))
                       AS UBIGINT)
                  < CASE WHEN CAST(substr(source, 4) AS INTEGER) % 2 = 0
                         THEN CAST('13835058055282163712' AS UBIGINT)
                         ELSE CAST('4611686018427387904' AS UBIGINT) END
        """,
        # same float op order as the engine: ln(CAST(n AS DOUBLE)/df)
        # first, then * tf, then round 6 — ranking on the rounded score
        "tfidf_top_terms": """
            WITH t AS (SELECT doc_id, TRIM(text) AS tt FROM documents),
            words AS (
              SELECT doc_id, UNNEST(regexp_split_to_array(tt, '\\s+')) AS term
              FROM t WHERE tt <> ''),
            tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM words GROUP BY 1, 2),
            df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM words GROUP BY 1),
            nd AS (SELECT COUNT(*) AS n FROM documents),
            sc AS (
              SELECT f.doc_id, f.term,
                     ROUND(f.tf * ln(CAST(nd.n AS DOUBLE) / d.df), 6) AS tfidf
              FROM tf f JOIN df d USING (term) CROSS JOIN nd),
            r AS (
              SELECT doc_id, term, tfidf,
                     row_number() OVER (
                       PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn
              FROM sc)
            SELECT doc_id, term, tfidf FROM r WHERE rn <= 3
        """,
        # GRB media oracles: the container is magic + packed header +
        # raw bytes, so SQL replays the decoder with hex(payload) +
        # 2-char substrings + '0x' casts over a generate_series. The
        # float outputs are chosen to be summation-order-independent
        # (integer-exact sums / power-of-two divides, IEEE sqrt) so no
        # rounding is needed — except the image std (two-pass variance
        # of non-integer deviations), rounded to 6 dp on BOTH sides.
        "audio_features": f"""
            SELECT media_id, sample_rate,
                   CAST((octet_length(payload) - 12) // 2 AS BIGINT) AS n_samples,
                   CAST(((octet_length(payload) - 12) // 2) // 1024 AS INTEGER) AS n_frames
            FROM read_parquet('{_MEDIA_GLOB}') WHERE kind = 'audio'
        """,
        "video_frames": f"""
            WITH v AS (
              SELECT media_id, width, height, octet_length(payload) AS blen,
                     hex(payload) AS hx
              FROM read_parquet('{_MEDIA_GLOB}') WHERE kind = 'video'
            ),
            meta AS (
              SELECT media_id, width, height,
                     CAST((blen - 11) // (width * height) AS INTEGER) AS nf,
                     CAST(('0x' || substring(hx, 2*10 + 1, 2)) AS INTEGER) AS fps, hx
              FROM v
            ),
            fr AS (
              SELECT media_id, width, height, nf, fps, hx,
                     CAST(j AS INTEGER) AS frame_idx
              FROM meta, generate_series(0, 9999, 4) AS t(j) WHERE j < nf
            ),
            px AS (
              SELECT media_id, frame_idx, fps,
                     CAST(('0x' || substring(hx, 2*(11 + frame_idx*width*height + i) + 1, 2))
                          AS INTEGER) AS v
              FROM fr, generate_series(0, 99999) AS t(i) WHERE i < width*height
            )
            SELECT media_id, frame_idx,
                   CAST(frame_idx * 1000 // fps AS INTEGER) AS t_ms,
                   AVG(v) AS frame_mean
            FROM px GROUP BY media_id, frame_idx, fps
        """,
        "image_features": f"""
            WITH im AS (
              SELECT media_id, width, height, channels, hex(payload) AS hx
              FROM read_parquet('{_MEDIA_GLOB}') WHERE kind = 'image'
            ),
            px AS (
              SELECT media_id, width, height, channels,
                     CAST(i % channels AS INTEGER) AS channel,
                     CAST(('0x' || substring(hx, 2*(9 + i) + 1, 2)) AS INTEGER) AS v
              FROM im, generate_series(0, 99999) AS t(i)
              WHERE i < width*height*channels
            ),
            mu AS (
              SELECT media_id, channel, AVG(v) AS m FROM px
              GROUP BY media_id, channel
            ),
            st AS (
              SELECT p.media_id, p.width, p.height, p.channels, p.channel,
                     CAST(FLOOR(mu.m * 1000000 + 0.5) AS BIGINT) AS mean_micro,
                     CAST(FLOOR(sqrt(AVG((p.v - mu.m)*(p.v - mu.m))) * 1000000 + 0.5)
                          AS BIGINT) AS std_micro
              FROM px p JOIN mu ON p.media_id = mu.media_id AND p.channel = mu.channel
              GROUP BY p.media_id, p.width, p.height, p.channels, p.channel, mu.m
            )
            SELECT media_id, width, height, channels,
                   string_agg(CAST(mean_micro AS VARCHAR), ',' ORDER BY channel)
                     AS chan_mean_micro,
                   string_agg(CAST(std_micro AS VARCHAR), ',' ORDER BY channel)
                     AS chan_std_micro
            FROM st GROUP BY media_id, width, height, channels
        """,
        "image_stats": f"""
            WITH im AS (
              SELECT media_id, width, height, channels, hex(payload) AS hx
              FROM read_parquet('{_MEDIA_GLOB}') WHERE kind = 'image'
            ),
            px AS (
              SELECT media_id, width, height, CAST(i % channels AS INTEGER) AS channel,
                     CAST(('0x' || substring(hx, 2*(9 + i) + 1, 2)) AS INTEGER) AS v
              FROM im, generate_series(0, 99999) AS t(i)
              WHERE i < width*height*channels
            ),
            mu AS (
              SELECT media_id, channel, AVG(v) AS m FROM px
              GROUP BY media_id, channel
            )
            SELECT p.media_id, p.width, p.height, p.channel,
                   mu.m AS chan_mean,
                   round(sqrt(AVG((p.v - mu.m)*(p.v - mu.m))), 6) AS chan_std
            FROM px p JOIN mu ON p.media_id = mu.media_id AND p.channel = mu.channel
            GROUP BY p.media_id, p.width, p.height, p.channel, mu.m
        """,
        "audio_stats": f"""
            WITH au AS (
              SELECT media_id, octet_length(payload) AS blen, hex(payload) AS hx
              FROM read_parquet('{_MEDIA_GLOB}') WHERE kind = 'audio'
            ),
            meta AS (
              SELECT media_id, hx,
                     CAST(((blen - 12) // 2) // 1024 AS BIGINT) AS nf
              FROM au
            ),
            smp AS (
              SELECT media_id, i // 1024 AS frame_idx, i % 1024 AS j,
                     CASE WHEN b0 + 256*b1 >= 32768 THEN b0 + 256*b1 - 65536
                          ELSE b0 + 256*b1 END AS v
              FROM (
                SELECT media_id, i,
                       CAST(('0x' || substring(hx, 2*(12 + 2*i) + 1, 2)) AS INTEGER) AS b0,
                       CAST(('0x' || substring(hx, 2*(12 + 2*i + 1) + 1, 2)) AS INTEGER) AS b1
                FROM meta, generate_series(0, 99999) AS t(i) WHERE i < nf * 1024
              )
            ),
            rms AS (
              SELECT media_id, frame_idx, sqrt(AVG(CAST(v AS DOUBLE) * v)) AS rms
              FROM smp GROUP BY media_id, frame_idx
            ),
            zc AS (
              SELECT media_id, frame_idx,
                     COUNT(*) FILTER (WHERE (v < 0) <> (prev < 0)) / 1024.0 AS zcr
              FROM (SELECT media_id, frame_idx, j, v,
                           lag(v) OVER (PARTITION BY media_id, frame_idx ORDER BY j) AS prev
                    FROM smp)
              WHERE prev IS NOT NULL
              GROUP BY media_id, frame_idx
            )
            SELECT r.media_id, CAST(r.frame_idx AS INTEGER) AS frame_idx, r.rms, z.zcr
            FROM rms r JOIN zc z ON r.media_id = z.media_id AND r.frame_idx = z.frame_idx
        """,
        "approx_price_quantiles": """
            WITH v AS (SELECT o_totalprice AS x FROM orders),
            s AS (SELECT CAST(MIN(x) AS DOUBLE) AS lo, CAST(MAX(x) AS DOUBLE) AS hi,
                         COUNT(*) AS n FROM v),
            p AS (SELECT lo, n, (hi - lo) / 4096 AS width FROM s),
            b AS (SELECT LEAST(GREATEST(CAST(FLOOR((CAST(x AS DOUBLE) - lo) / width)
                                         AS BIGINT), 0), 4095) AS bin
                  FROM v, p),
            h AS (SELECT bin, COUNT(*) AS c FROM b GROUP BY bin),
            cum AS (SELECT bin, CAST(SUM(c) OVER (ORDER BY bin) AS BIGINT) AS cm FROM h)
            SELECT n AS n_rows,
                   lo + ((SELECT MIN(bin) FROM cum
                          WHERE cm >= CAST(CEIL(CAST(0.5 AS DOUBLE) * n) AS BIGINT))
                         + 1) * width AS p5,
                   lo + ((SELECT MIN(bin) FROM cum
                          WHERE cm >= CAST(CEIL(CAST(0.9 AS DOUBLE) * n) AS BIGINT))
                         + 1) * width AS p9,
                   lo + ((SELECT MIN(bin) FROM cum
                          WHERE cm >= CAST(CEIL(CAST(0.99 AS DOUBLE) * n) AS BIGINT))
                         + 1) * width AS p99
            FROM p
        """,
        "order_price_quantiles": """
            SELECT c_mktsegment,
                   CAST(quantile_disc(CAST(ROUND(o_totalprice*100) AS BIGINT), 0.5)
                        AS BIGINT) AS p50_cents,
                   CAST(quantile_disc(CAST(ROUND(o_totalprice*100) AS BIGINT), 0.9)
                        AS BIGINT) AS p90_cents,
                   COUNT(*) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment
        """,
        "top_words": """
            WITH toks AS (
              SELECT UNNEST(regexp_split_to_array(TRIM(text), '\\s+')) AS word
              FROM documents WHERE TRIM(text) <> ''
            ),
            c AS (SELECT word, COUNT(*) AS n FROM toks GROUP BY word)
            SELECT word, n FROM c ORDER BY n DESC, word ASC LIMIT 50
        """,
        "vocab_ids": """
            WITH toks AS (
              SELECT UNNEST(regexp_split_to_array(TRIM(text), '\\s+')) AS word
              FROM documents WHERE TRIM(text) <> ''
            ),
            c AS (SELECT word, COUNT(*) AS n FROM toks GROUP BY word),
            r AS (
              SELECT word, n,
                     ROW_NUMBER() OVER (ORDER BY n DESC, word ASC) - 1 AS token_id
              FROM c
            )
            SELECT token_id, word, n FROM r WHERE token_id < 64
        """,
        "token_counts": """
            SELECT doc_id,
                   CASE WHEN TRIM(text) = '' THEN 0
                        ELSE LEN(regexp_split_to_array(TRIM(text), '\\s+'))
                   END AS n_tokens
            FROM documents
        """,
        # unigram token entropy in integer micro-nats: each TYPE's
        # (c/n)*ln(n/c) term quantized before the (order-free) sum
        "doc_entropy": """
            WITH t AS (
              SELECT doc_id, regexp_split_to_array(TRIM(text), '\\s+') AS w,
                     TRIM(text) AS tt
              FROM documents
            ),
            words AS (
              SELECT doc_id, w[i+1] AS tok
              FROM t, UNNEST(range(len(w))) AS u(i) WHERE tt <> ''
            ),
            ty AS (SELECT doc_id, tok, COUNT(*) AS c FROM words GROUP BY 1, 2),
            nn AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n FROM ty GROUP BY 1),
            e AS (
              SELECT ty.doc_id,
                     CAST(SUM(CAST(FLOOR(
                       (c / CAST(n AS DOUBLE)) * ln(CAST(n AS DOUBLE) / c)
                       * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS em,
                     MAX(n) AS n
              FROM ty JOIN nn ON ty.doc_id = nn.doc_id GROUP BY 1
            )
            SELECT d.doc_id,
                   COALESCE(CAST(e.n AS BIGINT), 0) AS n_tokens,
                   COALESCE(e.em, 0) AS entropy_micro
            FROM documents d LEFT JOIN e ON d.doc_id = e.doc_id
        """,
        # Okapi BM25 (k1=1.2, b=0.75) for the fixed query (hash, join,
        # vector): each term contribution floor(x*1e6+0.5)-quantized
        # BEFORE the sum, so the total is an order-free integer; rank
        # over (score desc, doc_id) AFTER quantization on both sides
        "bm25_topk": _bm25_topk_sql(20),
        # hybrid retrieval: stitch the two ranker replays, fuse with
        # integer floor(1e9/(60+rank)) contributions (both 1-based)
        "rrf_fusion": f"""
            WITH lex AS ({_bm25_topk_sql(20)}),
            den AS ({_ann_topk_sql("0", 20)}),
            u AS (
              SELECT doc_id, CAST(1000000000 // (60 + rnk) AS BIGINT) AS s
              FROM lex
              UNION ALL
              SELECT neighbor_id AS doc_id,
                     CAST(1000000000 // (60 + rank + 1) AS BIGINT) AS s
              FROM den
            ),
            f AS (SELECT doc_id, SUM(s) AS rrf_nano FROM u GROUP BY doc_id)
            SELECT CAST(ROW_NUMBER() OVER (ORDER BY rrf_nano DESC, doc_id ASC)
                        AS BIGINT) AS rnk,
                   doc_id, CAST(rrf_nano AS BIGINT) AS rrf_nano
            FROM f
        """,
        # sliding window of 32 tokens advancing by 24 (overlap 8); the
        # last chunk may be short; zero-token docs emit no chunks
        "chunk_texts": """
            WITH t AS (
              SELECT doc_id, regexp_split_to_array(TRIM(text), '\\s+') AS w
              FROM documents WHERE TRIM(text) <> ''
            ),
            c AS (
              SELECT doc_id, CAST(k AS INTEGER) AS chunk_idx,
                     list_slice(w, k*24 + 1, k*24 + 32) AS ch
              FROM t, generate_series(0, 99999) AS s(k)
              WHERE k*24 < len(w)
            )
            SELECT doc_id, chunk_idx, CAST(len(ch) AS BIGINT) AS n_tok,
                   array_to_string(ch, ' ') AS chunk_text
            FROM c
        """,
        "quality_counts": """
            SELECT doc_id,
                   LENGTH(text) AS n_chars_q,
                   LENGTH(text) - LENGTH(regexp_replace(text, '[.!?,;:]', '', 'g')) AS n_punct,
                   LENGTH(text) - LENGTH(regexp_replace(text, '[0-9]', '', 'g')) AS n_digits,
                   LENGTH(text) - LENGTH(regexp_replace(text, '[A-Z]', '', 'g')) AS n_upper
            FROM documents
        """,
        "ngram_jaccard_dups": _EXACT_JACCARD_SQL,
        "ngram_novelty": r"""
            WITH t AS (SELECT doc_id, regexp_split_to_array(TRIM(text), '\s+') AS w
                       FROM documents),
            words AS (SELECT doc_id, i, w[i+1] AS tok
                      FROM t, UNNEST(range(len(w))) AS u(i)),
            bigrams AS (SELECT DISTINCT a.doc_id, a.tok || ' ' || b.tok AS bg
                        FROM words a JOIN words b
                          ON a.doc_id = b.doc_id AND b.i = a.i + 1),
            df AS (SELECT bg, COUNT(*) AS c FROM bigrams GROUP BY bg),
            per AS (SELECT b.doc_id, COUNT(*) AS tot,
                           COUNT(*) FILTER (WHERE df.c = 1) AS nu
                    FROM bigrams b JOIN df USING (bg) GROUP BY 1)
            SELECT d.doc_id,
                   COALESCE(tot, 0)::BIGINT AS n_shingles,
                   COALESCE(nu, 0)::BIGINT AS n_unique,
                   COALESCE(1000 * nu // tot, 0)::BIGINT AS novelty_permille
            FROM documents d LEFT JOIN per USING (doc_id)
        """,
        "keep_first_shingles": r"""
            WITH t AS (SELECT doc_id, regexp_split_to_array(TRIM(text), '\s+') AS w
                       FROM documents),
            words AS (SELECT doc_id, i, w[i+1] AS tok
                      FROM t, UNNEST(range(len(w))) AS u(i)),
            bigrams AS (SELECT a.doc_id, a.i AS pos, a.tok || ' ' || b.tok AS bg
                        FROM words a JOIN words b
                          ON a.doc_id = b.doc_id AND b.i = a.i + 1),
            flagged AS (SELECT doc_id, pos,
                               ROW_NUMBER() OVER (PARTITION BY bg
                                                  ORDER BY doc_id, pos) AS rn
                        FROM bigrams),
            per AS (SELECT doc_id, COUNT(*) AS tot,
                           COUNT(*) FILTER (WHERE rn = 1) AS kept
                    FROM flagged GROUP BY 1)
            SELECT d.doc_id,
                   COALESCE(tot, 0)::BIGINT AS n_shingles,
                   COALESCE(kept, 0)::BIGINT AS n_kept,
                   COALESCE(1000 * kept // tot, 0)::BIGINT AS kept_permille
            FROM documents d LEFT JOIN per USING (doc_id)
        """,
        "jaccard_prefix_join": f"""
            WITH t AS (SELECT doc_id, regexp_split_to_array(TRIM(text), '\\s+') w FROM documents),
            words AS (SELECT doc_id, i, w[i+1] AS tok FROM t, UNNEST(range(len(w))) AS u(i)),
            bigrams AS (SELECT DISTINCT a.doc_id, a.tok || ' ' || b.tok AS bg
                        FROM words a JOIN words b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
            cnt AS (SELECT doc_id, COUNT(*) n FROM bigrams GROUP BY 1),
            inter AS (SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) i
                      FROM bigrams x JOIN bigrams y ON x.bg = y.bg AND x.doc_id < y.doc_id
                      GROUP BY 1, 2)
            SELECT a, b, i::BIGINT AS n_inter, (ca.n + cb.n - i)::BIGINT AS n_union
            FROM inter JOIN cnt ca ON ca.doc_id = a JOIN cnt cb ON cb.doc_id = b
            WHERE CAST(i AS DOUBLE) / (ca.n + cb.n - i) >= {PREFIX_TAU}
        """,
        "containment_join": """
            WITH t AS (SELECT doc_id, regexp_split_to_array(TRIM(text), '\\s+') w FROM documents),
            words AS (SELECT doc_id, i, w[i+1] AS tok FROM t, UNNEST(range(len(w))) AS u(i)),
            bigrams AS (SELECT DISTINCT a.doc_id, a.tok || ' ' || b.tok AS bg
                        FROM words a JOIN words b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
            cnt AS (SELECT doc_id, COUNT(*) n FROM bigrams GROUP BY 1),
            inter AS (SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) i
                      FROM bigrams x JOIN bigrams y ON x.bg = y.bg AND x.doc_id < y.doc_id
                      GROUP BY 1, 2)
            SELECT a, b, i::BIGINT AS n_inter, LEAST(ca.n, cb.n)::BIGINT AS n_min
            FROM inter JOIN cnt ca ON ca.doc_id = a JOIN cnt cb ON cb.doc_id = b
            WHERE CAST(i AS DOUBLE) / LEAST(ca.n, cb.n) >= 0.8
        """,
        # LSH with 32x4 bands catches J >= 0.8 pairs with prob
        # 1-(1-tau^4)^32 (> 1-5e-8 at tau=0.8, ~1-1e-15 at the synthetic
        # corpus's J~0.9 dup pairs) and the verify stage drops every
        # false candidate, so the LSH output EQUALS the exact pair set
        # here (also pinned by tests/test_textops_jaccard.py) — the
        # exact closed form IS its oracle (VERDICT r02 #6).
        "minhash_near_dups": _EXACT_JACCARD_SQL,
        "sample_orders": """
            SELECT o_orderkey, o_totalprice FROM (
              SELECT o_orderkey, o_totalprice,
                     CAST(('0x' || substr(sha256('42:' || CAST(o_orderkey AS VARCHAR)), 1, 16))
                          AS UBIGINT) >> 1 AS prio
              FROM orders)
            ORDER BY prio LIMIT 100
        """,
        "weighted_sample": """
            -- Efraimidis-Spirakis race: keep the 100 largest ln(u)/w
            -- (== the k smallest -ln(u)/w engine priorities); u is the
            -- same sha256-derived double the engine computes.
            SELECT o_orderkey, o_totalprice FROM (
              SELECT o_orderkey, o_totalprice,
                     ln((CAST(('0x' || substr(sha256('42:' || CAST(o_orderkey AS VARCHAR)), 1, 16))
                              AS UBIGINT)::DOUBLE + 1.0) / 18446744073709551616.0)
                       / o_totalprice AS lp
              FROM orders)
            ORDER BY lp DESC LIMIT 100
        """,
        "price_band_pairs": """
            SELECT a.o_orderkey AS key_lo, b.o_orderkey AS key_hi,
                   ABS(CAST(ROUND(a.o_totalprice*1e6) AS BIGINT)
                       - CAST(ROUND(b.o_totalprice*1e6) AS BIGINT)) AS diff_micro
            FROM orders a JOIN orders b
              ON a.o_orderkey < b.o_orderkey
             AND ABS(CAST(ROUND(a.o_totalprice*1e6) AS BIGINT)
                     - CAST(ROUND(b.o_totalprice*1e6) AS BIGINT)) < 2000000
        """,
        "join_size_estimate": """
            WITH a AS (SELECT o_custkey AS key, COUNT(*)::BIGINT AS na
                       FROM orders GROUP BY 1),
            b AS (SELECT user_id AS key, COUNT(*)::BIGINT AS nb
                  FROM events GROUP BY 1),
            j AS (SELECT COALESCE(a.na, 0) AS na, COALESCE(b.nb, 0) AS nb
                  FROM a FULL OUTER JOIN b ON a.key = b.key)
            SELECT SUM(CASE WHEN na > 0 THEN 1 ELSE 0 END)::BIGINT AS n_keys_a,
                   SUM(CASE WHEN nb > 0 THEN 1 ELSE 0 END)::BIGINT AS n_keys_b,
                   SUM(CASE WHEN na > 0 AND nb > 0 THEN 1 ELSE 0 END)::BIGINT AS n_keys_shared,
                   SUM(na * nb)::BIGINT AS join_rows,
                   MAX(na * nb)::BIGINT AS max_key_rows
            FROM j
        """,
        "top_users_by_active_days": """
            WITH d AS (SELECT event_type, user_id,
                              COUNT(DISTINCT epoch_us(ts) // 86400000000)::BIGINT AS n_days
                       FROM events GROUP BY 1, 2),
            r AS (SELECT event_type, user_id, n_days,
                         ROW_NUMBER() OVER (PARTITION BY event_type
                                            ORDER BY n_days DESC, user_id ASC) AS rnk
                  FROM d)
            SELECT event_type, CAST(rnk AS BIGINT) AS rnk, user_id, n_days
            FROM r WHERE rnk <= 5
        """,
        "association_rules": """
            WITH dp AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
                        FROM lineitem),
            n AS (SELECT COUNT(DISTINCT ok)::BIGINT AS n_orders FROM dp),
            ps AS (SELECT pk, COUNT(*)::BIGINT AS supp FROM dp GROUP BY 1),
            pr AS (SELECT a.pk AS p_a, b.pk AS p_b, COUNT(*)::BIGINT AS n_both
                   FROM dp a JOIN dp b ON a.ok = b.ok AND a.pk < b.pk
                   GROUP BY 1, 2 HAVING COUNT(*) >= 3),
            bi AS (SELECT p_a AS antecedent, p_b AS consequent, n_both FROM pr
                   UNION ALL
                   SELECT p_b, p_a, n_both FROM pr),
            r AS (SELECT bi.antecedent, bi.consequent, bi.n_both,
                         sa.supp AS n_ante,
                         ((1000000 * bi.n_both) // sa.supp)::BIGINT AS conf_micro,
                         ((1000000::HUGEINT * bi.n_both * n.n_orders)
                          // (sa.supp::HUGEINT * sc.supp))::BIGINT AS lift_micro
                  FROM bi
                  JOIN ps sa ON sa.pk = bi.antecedent
                  JOIN ps sc ON sc.pk = bi.consequent
                  CROSS JOIN n)
            SELECT antecedent, consequent, n_both, n_ante, conf_micro, lift_micro
            FROM r ORDER BY lift_micro DESC, antecedent, consequent LIMIT 50
        """,
        "salted_join_sample": """
            SELECT e.event_type,
                   COUNT(*)::BIGINT AS n_pairs,
                   SUM(CASE WHEN (e.event_id*2654435761 + o.o_orderkey*40503)
                                 % 1000 < 125 THEN 1 ELSE 0 END)::BIGINT
                       AS n_sampled,
                   COALESCE(SUM(CASE WHEN (e.event_id*2654435761
                                           + o.o_orderkey*40503) % 1000 < 125
                            THEN CAST(ROUND(o.o_totalprice*1e6) AS BIGINT)
                            ELSE 0 END), 0)::BIGINT AS sampled_price_micro
            FROM events e JOIN orders o ON e.user_id = o.o_custkey
            GROUP BY 1 ORDER BY 1
        """,
        "value_concentration": """
            WITH s AS (SELECT event_type, user_id,
                              SUM(CAST(ROUND(value * 1e6) AS BIGINT)) AS v
                       FROM events GROUP BY 1, 2),
            r AS (SELECT event_type, user_id, v,
                         ROW_NUMBER() OVER (PARTITION BY event_type
                                            ORDER BY v DESC, user_id ASC) AS rnk
                  FROM s),
            t AS (SELECT event_type, SUM(v)::BIGINT AS total_micro FROM s GROUP BY 1),
            k AS (SELECT event_type, SUM(v)::BIGINT AS topk_micro
                  FROM r WHERE rnk <= 10 GROUP BY 1)
            SELECT event_type, total_micro, topk_micro,
                   (1000000 * topk_micro // total_micro)::BIGINT AS share_micro
            FROM t JOIN k USING (event_type)
        """,
        "key_skew_profile": """
            WITH c AS (SELECT user_id, COUNT(*)::BIGINT AS cnt
                       FROM events GROUP BY user_id),
            r AS (SELECT user_id, cnt,
                         ROW_NUMBER() OVER (ORDER BY cnt, user_id)::BIGINT AS rnk
                  FROM c),
            s AS (SELECT COUNT(*)::BIGINT AS n, SUM(cnt)::BIGINT AS s0,
                         SUM(rnk*cnt)::BIGINT AS s1, MAX(cnt)::BIGINT AS cmax
                  FROM r)
            SELECT n AS n_keys, s0 AS n_rows, cmax AS cnt_max,
                   (SELECT cnt FROM r, s WHERE rnk = (n-1)*50//100 + 1) AS cnt_p50,
                   (SELECT cnt FROM r, s WHERE rnk = (n-1)*90//100 + 1) AS cnt_p90,
                   CAST((1000000::HUGEINT * (2*s1 - (n+1)*s0))
                        // ((n)::HUGEINT * s0) AS BIGINT) AS gini_micro
            FROM s
        """,
        "term_drift": r"""
            WITH words AS (
              SELECT doc_id % 2 AS par,
                     UNNEST(regexp_split_to_array(TRIM(text), '\s+')) AS term
              FROM documents WHERE TRIM(text) <> ''),
            tc AS (SELECT term,
                      SUM(CASE WHEN par = 0 THEN 1 ELSE 0 END)::BIGINT AS cnt_a,
                      SUM(CASE WHEN par = 1 THEN 1 ELSE 0 END)::BIGINT AS cnt_b
                   FROM words GROUP BY term),
            tot AS (SELECT SUM(cnt_a)::BIGINT AS na, SUM(cnt_b)::BIGINT AS nb,
                           COUNT(*)::BIGINT AS v FROM tc)
            SELECT term, cnt_a, cnt_b,
                   CAST(((cnt_a+1)::HUGEINT * 1000000 * (nb+v))
                        // ((cnt_b+1)::HUGEINT * (na+v)) AS BIGINT) AS drift_micro
            FROM tc, tot WHERE cnt_a + cnt_b >= 5
        """,
        "simhash": _SIMHASH_SQL,
        "simhash_near_dups": _SIMHASH_DUPS_SQL,
        "fingerprints": f"""
            WITH {_fingerprints_ctes()}
            SELECT doc_id, ord, fp FROM fpr
        """,
        "bpe_merges": _bpe_sql(4),
        "bpe_encode": _bpe_encode_sql(4),
        "countmin": """
            WITH t AS (SELECT TRIM(text) AS tt,
                              regexp_split_to_array(TRIM(text), '\\s+') AS w
                       FROM documents),
            words AS (SELECT w[i+1] AS tok FROM t, UNNEST(range(len(w))) AS u(i)
                      WHERE tt <> ''),
            cnt AS (SELECT tok, COUNT(*)::BIGINT AS n FROM words GROUP BY tok),
            d AS (SELECT UNNEST(range(4)) AS i),
            cells AS (SELECT d.i,
                             CAST(('0x' || substr(sha256(
                               CAST(d.i AS VARCHAR) || ':' || cnt.tok), 1, 16))
                               AS UBIGINT) % 1024 AS cell,
                             SUM(cnt.n)::BIGINT AS cn
                      FROM cnt CROSS JOIN d GROUP BY 1, 2),
            q AS (SELECT * FROM (VALUES ('data'),('hash'),('join'),('the'),
                                        ('vector'),('zzz_absent')) v(term)),
            qc AS (SELECT q.term, d.i,
                          CAST(('0x' || substr(sha256(
                            CAST(d.i AS VARCHAR) || ':' || q.term), 1, 16))
                            AS UBIGINT) % 1024 AS cell
                   FROM q CROSS JOIN d),
            est AS (SELECT qc.term, MIN(COALESCE(cells.cn, 0))::BIGINT AS cms_est
                    FROM qc LEFT JOIN cells ON cells.i = qc.i AND cells.cell = qc.cell
                    GROUP BY 1),
            ex AS (SELECT q.term, COALESCE(cnt.n, 0)::BIGINT AS exact_n
                   FROM q LEFT JOIN cnt ON cnt.tok = q.term)
            SELECT est.term, cms_est, exact_n FROM est JOIN ex ON ex.term = est.term
            ORDER BY est.term
        """,
        "moss_pairs": f"""
            WITH {_fingerprints_ctes()},
            d AS (SELECT DISTINCT doc_id, fp FROM fpr),
            df AS (SELECT fp FROM d GROUP BY fp HAVING COUNT(*) <= 50),
            p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                         COUNT(*)::BIGINT AS n_shared
                  FROM d a JOIN d b ON a.fp = b.fp AND a.doc_id < b.doc_id
                  JOIN df ON df.fp = a.fp GROUP BY 1, 2)
            SELECT doc_a, doc_b, n_shared FROM p WHERE n_shared >= 2
            ORDER BY doc_a, doc_b
        """,
        "quality_scores": """
            WITH t AS (SELECT doc_id, text, TRIM(text) AS tt,
                              regexp_split_to_array(TRIM(text), '\\s+') AS w FROM documents),
            words AS (SELECT doc_id, w[i+1] AS tok FROM t, UNNEST(range(len(w))) AS u(i)
                      WHERE tt <> ''),
            agg AS (SELECT doc_id, COUNT(*) AS n,
                           COUNT(*) FILTER (WHERE lower(tok) IN
                             ('the','and','of','to','a','in','is','it','that','for')) AS n_stop,
                           SUM(length(tok)) AS sum_len
                    FROM words GROUP BY 1),
            q AS (SELECT t.doc_id, COALESCE(agg.n, 0) AS n,
                         COALESCE(agg.n_stop, 0) AS n_stop,
                         COALESCE(agg.sum_len, 0) AS sum_len,
                         length(t.text) AS n_chars,
                         length(t.text) - length(regexp_replace(t.text, '[.!?,;:]', '', 'g'))
                           AS n_punct
                  FROM t LEFT JOIN agg USING (doc_id))
            SELECT doc_id,
                   LEAST(1.0, n / 50.0)
                   * (0.5 + 0.5 * LEAST((n_stop / CAST(GREATEST(1, n) AS DOUBLE)) * 4, 1.0))
                   * (CASE WHEN sum_len / CAST(GREATEST(1, n) AS DOUBLE) BETWEEN 3 AND 9
                           THEN 1.0 ELSE 0.6 END)
                   * (1.0 - LEAST((n_punct / CAST(GREATEST(1, n_chars) AS DOUBLE)) * 5, 0.5))
                     AS quality
            FROM q
        """,
        "langid": f"""
            WITH t AS (SELECT doc_id, lang, TRIM(text) AS tt,
                              regexp_split_to_array(TRIM(text), '\\s+') AS w FROM documents),
            words AS (SELECT doc_id, w[i+1] AS tok FROM t, UNNEST(range(len(w))) AS u(i)
                      WHERE tt <> ''),
            s AS (SELECT doc_id, {_LANGID_SCORE_COLS} FROM words GROUP BY 1),
            j AS (SELECT t.doc_id, t.lang,
                         COALESCE(s.s_en, 0) AS s_en, COALESCE(s.s_es, 0) AS s_es,
                         COALESCE(s.s_de, 0) AS s_de, COALESCE(s.s_fr, 0) AS s_fr,
                         COALESCE(s.s_pt, 0) AS s_pt
                  FROM t LEFT JOIN s USING (doc_id))
            SELECT doc_id, lang,
                   CASE WHEN GREATEST(s_en, s_es, s_de, s_fr, s_pt) = 0 THEN 'und'
                        WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr AND s_en >= s_pt THEN 'en'
                        WHEN s_es >= s_de AND s_es >= s_fr AND s_es >= s_pt THEN 'es'
                        WHEN s_de >= s_fr AND s_de >= s_pt THEN 'de'
                        WHEN s_fr >= s_pt THEN 'fr'
                        ELSE 'pt' END AS lang_pred,
                   GREATEST(s_en, s_es, s_de, s_fr, s_pt) AS lang_score
            FROM j
        """,
        # single-row schema summaries of fixed fixture payloads: the
        # expected output is a closed-form constant of the corpus params
        # (payload #0 = 4-polygon geojson layer_0 with 4 columns;
        # abbreviated = .prj-only metadata, count unknown -> 0)
        "geo_summary": """
            SELECT 'layer_0' AS name, CAST(4 AS BIGINT) AS count,
                   'polygon' AS geometry, CAST(4 AS BIGINT) AS n_columns
        """,
        "geo_summary_abbrev": """
            SELECT 'grid' AS name, CAST(0 AS BIGINT) AS count,
                   'longlat' AS projection
        """,
        "ann_topk": _ann_topk_sql("0, 1, 2, 3", ANN_K),
        # kNN classification: majority label of the k nearest (same
        # ordering as ann_topk), vote ties -> the smallest label
        "knn_label_vote": f"""
            WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
                       FROM embeddings WHERE vec_id IN (0, 1, 2, 3)),
            s AS (SELECT q.qid AS query_id, e.vec_id AS neighbor_id,
                         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe) AS sim
                  FROM embeddings e, q WHERE e.vec_id <> q.qid),
            r AS (SELECT query_id, neighbor_id,
                         ROW_NUMBER() OVER (PARTITION BY query_id
                                            ORDER BY sim DESC, neighbor_id ASC) - 1 AS rank
                  FROM s),
            kk AS (SELECT query_id, neighbor_id FROM r WHERE rank < {ANN_K}),
            lv AS (SELECT kk.query_id, e.label, COUNT(*) AS votes
                   FROM kk JOIN embeddings e ON e.vec_id = kk.neighbor_id
                   GROUP BY 1, 2),
            m AS (SELECT query_id, label, votes,
                         ROW_NUMBER() OVER (PARTITION BY query_id
                                            ORDER BY votes DESC, label ASC) AS rn
                  FROM lv)
            SELECT query_id, CAST(label AS INTEGER) AS label, votes
            FROM m WHERE rn = 1
        """,
        # mean-pooled embedding per label, exploded to scalar rows;
        # means micro-quantized on both sides (float32-exact inputs)
        "label_centroids": """
            WITH u AS (
              SELECT label, CAST(u.i AS INTEGER) AS dim,
                     CAST(embedding[u.i + 1] AS DOUBLE) AS v
              FROM embeddings, UNNEST(range(len(embedding))) AS u(i)
            )
            SELECT CAST(label AS INTEGER) AS label, dim,
                   CAST(COUNT(*) AS BIGINT) AS n_vecs,
                   CAST(FLOOR(AVG(v) * 1000000 + 0.5) AS BIGINT) AS mean_micro
            FROM u GROUP BY 1, 2
        """,
        # fixed centroids = vec_id < 8; cosine micro-quantized BEFORE
        # the argmax, ties to the lowest centroid id (both sides), so
        # float-summation-order differences can't flip an assignment
        # PQ: per (vector, subspace, code) the squared euclidean
        # distance quantized to 1e4 units before the argmin (ties ->
        # lowest code); list_distance(slice)^2 replays numpy's
        # sum((a-b)^2) within ~1e-11 abs vs the 1e-4 boundary spacing
        "pq_encode": """
            WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                       FROM embeddings),
            cb AS (SELECT vec_id AS code, v FROM e WHERE vec_id < 8),
            d AS (
              SELECT e.vec_id, cb.code, s.m AS sub,
                     CAST(FLOOR(POWER(list_distance(
                              list_slice(e.v, s.m*32 + 1, s.m*32 + 32),
                              list_slice(cb.v, s.m*32 + 1, s.m*32 + 32)), 2)
                            * 10000 + 0.5) AS BIGINT) AS dm
              FROM e, cb, (SELECT 0 AS m UNION ALL SELECT 1) s
            ),
            best AS (
              SELECT vec_id, sub, code, dm,
                     ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                        ORDER BY dm, code) AS rn
              FROM d
            )
            SELECT vec_id,
                   CAST(MAX(CASE WHEN sub = 0 THEN code END) AS INTEGER) AS code_0,
                   CAST(MAX(CASE WHEN sub = 1 THEN code END) AS INTEGER) AS code_1,
                   CAST(SUM(CASE WHEN rn = 1 THEN dm END) AS BIGINT) AS dist_dm
            FROM best WHERE rn = 1 GROUP BY vec_id
        """,
        # PQ retrieval: the d CTE below is the SAME per-(vector, sub,
        # code) quantized distance pq_encode pins; codes = argmin rows,
        # a query's approx distance = sum of its LUT rows at the
        # neighbor's codes; rank by (dist asc, vec_id asc)
        "ann_topk_pq": f"""
            WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                       FROM embeddings),
            cb AS (SELECT vec_id AS code, v FROM e WHERE vec_id < 8),
            d AS (
              SELECT e.vec_id, cb.code, s.m AS sub,
                     CAST(FLOOR(POWER(list_distance(
                              list_slice(e.v, s.m*32 + 1, s.m*32 + 32),
                              list_slice(cb.v, s.m*32 + 1, s.m*32 + 32)), 2)
                            * 10000 + 0.5) AS BIGINT) AS dm
              FROM e, cb, (SELECT 0 AS m UNION ALL SELECT 1) s
            ),
            codes AS (
              SELECT vec_id, sub, code FROM (
                SELECT vec_id, sub, code,
                       ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                          ORDER BY dm, code) AS rn
                FROM d
              ) WHERE rn = 1
            ),
            lut AS (
              SELECT vec_id AS qid, sub, code, dm FROM d
              WHERE vec_id IN (0, 1, 2, 3)
            ),
            approx AS (
              SELECT l.qid AS query_id, c.vec_id AS neighbor_id,
                     SUM(l.dm) AS dist
              FROM codes c JOIN lut l ON l.sub = c.sub AND l.code = c.code
              WHERE c.vec_id <> l.qid
              GROUP BY 1, 2
            ),
            r AS (
              SELECT query_id, neighbor_id,
                     ROW_NUMBER() OVER (PARTITION BY query_id
                                        ORDER BY dist, neighbor_id) - 1 AS rank
              FROM approx
            )
            SELECT query_id, rank, neighbor_id FROM r WHERE rank < {ANN_K}
        """,
        # end-to-end curation: the quality_filter predicate gates, the
        # normalized form dedups (min doc_id kept), survivors rank by
        # doc_id and pack into 4096-token shards by prefix sums
        "curate_corpus": """
            WITH base AS (
              SELECT doc_id,
                     CASE WHEN TRIM(text) = '' THEN []::VARCHAR[]
                          ELSE regexp_split_to_array(TRIM(text), '\\s+') END AS a,
                     TRIM(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))
                       AS norm_text
              FROM documents),
            dst AS (
              SELECT doc_id, COUNT(DISTINCT tok) AS n_distinct
              FROM (SELECT doc_id, unnest(a) AS tok FROM base) GROUP BY doc_id),
            bg AS (
              SELECT doc_id, MAX(c) AS top_bigram_n
              FROM (SELECT doc_id, g, COUNT(*) AS c FROM
                    (SELECT doc_id,
                            unnest(list_transform(generate_series(1, len(a) - 1),
                                                  i -> a[i] || ' ' || a[i+1])) AS g
                     FROM base WHERE len(a) >= 2) GROUP BY doc_id, g)
              GROUP BY doc_id),
            keep AS (
              SELECT b.doc_id, len(b.a) AS n_tokens, b.norm_text
              FROM base b LEFT JOIN dst d USING (doc_id)
                          LEFT JOIN bg g USING (doc_id)
              WHERE len(b.a) >= 20 AND len(b.a) <= 100000
                AND 100 * COALESCE(d.n_distinct, 0) >= 40 * len(b.a)
                AND 100 * COALESCE(g.top_bigram_n, 0) <= 8 * len(b.a)),
            uniq AS (SELECT MIN(doc_id) AS doc_id, COUNT(*) AS dup_count
                     FROM keep GROUP BY norm_text),
            j AS (SELECT u.doc_id, k.n_tokens, u.dup_count
                  FROM uniq u JOIN keep k USING (doc_id)),
            r AS (SELECT doc_id, n_tokens, dup_count,
                         row_number() OVER (ORDER BY doc_id) AS rnk FROM j),
            s AS (SELECT *,
                         CAST(COALESCE(SUM(n_tokens) OVER (
                            ORDER BY rnk
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                           AS BIGINT) AS start_offset
                  FROM r)
            SELECT doc_id, n_tokens, dup_count, rnk, start_offset,
                   start_offset // 4096 AS shard_id
            FROM s
        """,
        # CCNet head/middle/tail: per-token mean LM score (floor of
        # the micro-nat total over n_tokens) -> NTILE(3), 1 = head
        "ccnet_buckets": f"""
            WITH lm AS ({_UNIGRAM_LM_SQL}),
            m AS (SELECT doc_id,
                         CAST(FLOOR(logprob_unats * 1.0 / n_tokens) AS BIGINT)
                           AS mean_unats
                  FROM lm WHERE n_tokens > 0)
            SELECT doc_id, mean_unats,
                   CAST(NTILE(3) OVER (ORDER BY mean_unats DESC, doc_id)
                        AS BIGINT) AS bucket
            FROM m
        """,
        # hard negatives: brute cosine over the label-mismatch set
        "hard_negatives": f"""
            WITH q AS (SELECT vec_id AS qid, label AS qlabel,
                              CAST(embedding AS DOUBLE[]) AS qe
                       FROM embeddings WHERE vec_id IN (0, 1, 2, 3)),
            s AS (SELECT q.qid AS query_id, e.vec_id AS neighbor_id,
                         list_cosine_similarity(
                           CAST(e.embedding AS DOUBLE[]), q.qe) AS sim
                  FROM embeddings e, q WHERE e.label <> q.qlabel),
            r AS (SELECT query_id, neighbor_id,
                         ROW_NUMBER() OVER (PARTITION BY query_id
                                            ORDER BY sim DESC,
                                                     neighbor_id ASC) - 1 AS rank
                  FROM s)
            SELECT query_id, rank, neighbor_id FROM r WHERE rank < {ANN_K}
        """,
        # LSH retrieval: sign bit j = quantized dot with plane j >= 1
        # (1e4 units, the pq_encode recipe), 4 bands x 4 bits packed
        # MSB-first; candidates share >= 1 band with the query; exact
        # cosine ranks candidates (sim desc, neighbor_id asc)
        "ann_topk_lsh": f"""
            WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                       FROM embeddings),
            h AS (SELECT vec_id AS hid, v AS hv FROM e WHERE vec_id < 16),
            bits AS (
              SELECT e.vec_id, h.hid,
                     CASE WHEN CAST(FLOOR(list_dot_product(e.v, h.hv)
                                          * 10000 + 0.5) AS BIGINT) >= 1
                          THEN 1 ELSE 0 END AS bit
              FROM e, h),
            bands AS (
              SELECT vec_id, hid // 4 AS band,
                     SUM(bit * CASE hid % 4 WHEN 0 THEN 8 WHEN 1 THEN 4
                                            WHEN 2 THEN 2 ELSE 1 END) AS code
              FROM bits GROUP BY 1, 2),
            qb AS (SELECT vec_id AS qid, band, code FROM bands
                   WHERE vec_id IN (0, 1, 2, 3)),
            cand AS (
              SELECT DISTINCT qb.qid AS query_id, b.vec_id AS neighbor_id
              FROM bands b JOIN qb ON b.band = qb.band AND b.code = qb.code
              WHERE b.vec_id <> qb.qid),
            s AS (
              SELECT c.query_id, c.neighbor_id,
                     list_cosine_similarity(ev.v, qv.v) AS sim
              FROM cand c
              JOIN e ev ON ev.vec_id = c.neighbor_id
              JOIN e qv ON qv.vec_id = c.query_id),
            r AS (SELECT query_id, neighbor_id,
                         ROW_NUMBER() OVER (PARTITION BY query_id
                                            ORDER BY sim DESC,
                                                     neighbor_id ASC) - 1 AS rank
                  FROM s)
            SELECT query_id, rank, neighbor_id FROM r WHERE rank < {ANN_K}
        """,
        "embedding_clusters": """
            WITH c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS ce
                       FROM embeddings WHERE vec_id < 8),
            s AS (SELECT e.vec_id, c.cid,
                         CAST(FLOOR(list_cosine_similarity(
                                CAST(e.embedding AS DOUBLE[]), c.ce) * 1000000 + 0.5)
                              AS BIGINT) AS cos_micro
                  FROM embeddings e, c),
            r AS (SELECT vec_id, cid, cos_micro,
                         row_number() OVER (
                           PARTITION BY vec_id
                           ORDER BY cos_micro DESC, cid) AS rn
                  FROM s)
            SELECT vec_id, CAST(cid AS INTEGER) AS cluster, cos_micro
            FROM r WHERE rn = 1
        """,
        "ann_topk_ivf": f"""
            WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
                       FROM embeddings WHERE vec_id IN (0, 1, 2, 3)),
            s AS (SELECT q.qid AS query_id, e.vec_id AS neighbor_id,
                         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe) AS sim
                  FROM embeddings e, q WHERE e.vec_id <> q.qid),
            r AS (SELECT query_id, neighbor_id,
                         ROW_NUMBER() OVER (PARTITION BY query_id
                                            ORDER BY sim DESC, neighbor_id ASC) - 1 AS rank
                  FROM s)
            SELECT query_id, rank, neighbor_id FROM r WHERE rank < {ANN_K}
        """,
        "cust_order_counts": """
            SELECT c_custkey, COUNT(o_orderkey) AS n_orders
            FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            GROUP BY c_custkey
        """,
        "mktsegment_stats": """
            SELECT c_mktsegment,
                   CAST(COUNT(DISTINCT c_nationkey) AS BIGINT) AS n_nations,
                   CAST(SUM(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_negative,
                   COUNT(*) AS n_cust
            FROM customer
            GROUP BY c_mktsegment
        """,
        "priority_line_counts": """
            SELECT l_returnflag,
                   CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                            THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                   COUNT(*) AS n_lines,
                   COUNT(*) - CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                                        THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY l_returnflag
        """,
        "top_orders_per_segment": """
            WITH j AS (SELECT c_mktsegment, o_orderkey, o_totalprice
                       FROM orders JOIN customer ON o_custkey = c_custkey),
            r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                               ORDER BY o_totalprice DESC,
                                                        o_orderkey ASC) AS rnk
                  FROM j)
            SELECT c_mktsegment, rnk, o_orderkey, o_totalprice
            FROM r WHERE rnk <= 3
        """,
        "orders_by_month": """
            SELECT strftime(o_orderdate, '%Y-%m') AS ym,
                   COUNT(*) AS n_orders,
                   CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS sum_total_cents
            FROM orders
            GROUP BY 1
        """,
        "customer_name_match": """
            SELECT c_mktsegment, COUNT(*) AS n_matched
            FROM customer
            WHERE c_name LIKE '%7%'
            GROUP BY c_mktsegment
        """,
        "event_sessions": """
            WITH e AS (SELECT event_id, user_id,
                              CAST(epoch_us(ts) AS BIGINT) AS us FROM events),
            l AS (SELECT user_id, us,
                         LAG(us) OVER (PARTITION BY user_id ORDER BY us) AS prev
                  FROM e),
            s AS (SELECT user_id, us,
                         CASE WHEN prev IS NULL OR us - prev > 1800000000
                              THEN 1 ELSE 0 END AS new_s
                  FROM l),
            c AS (SELECT user_id, us,
                         SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
                                          ROWS UNBOUNDED PRECEDING) AS sess
                  FROM s),
            iv AS (SELECT user_id, CAST(sess AS BIGINT) AS session_idx,
                          MIN(us) AS start_us, MAX(us) AS end_us
                   FROM c GROUP BY user_id, sess)
            SELECT e.event_id, e.user_id, iv.session_idx
            FROM e JOIN iv ON e.user_id = iv.user_id
                          AND e.us BETWEEN iv.start_us AND iv.end_us
        """,
        "asof_last_order": """
            SELECT e.event_id,
                   e.user_id,
                   COALESCE(
                     (SELECT CAST(MAX(epoch_us(o.o_orderdate)) AS BIGINT)
                      FROM orders o
                      WHERE o.o_custkey = e.user_id
                        AND epoch_us(o.o_orderdate) <= epoch_us(e.ts)),
                     -1) AS last_order_us
            FROM events e
        """,
        "user_sessions": """
            WITH e AS (SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS us FROM events),
            l AS (SELECT user_id, us,
                         LAG(us) OVER (PARTITION BY user_id ORDER BY us) AS prev
                  FROM e),
            s AS (SELECT user_id, us,
                         CASE WHEN prev IS NULL OR us - prev > 1800000000
                              THEN 1 ELSE 0 END AS new_s
                  FROM l),
            c AS (SELECT user_id, us,
                         SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
                                          ROWS UNBOUNDED PRECEDING) AS sess
                  FROM s)
            SELECT user_id,
                   CAST(sess AS BIGINT) AS session_idx,
                   MIN(us) AS start_us,
                   MAX(us) AS end_us,
                   COUNT(*) AS n_events
            FROM c
            GROUP BY user_id, sess
        """,
        "daily_active_users": """
            SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau,
                   COUNT(*) AS n_events
            FROM events
            GROUP BY 1
        """,
        "embedding_near_dups": f"""
            SELECT a.vec_id AS a, b.vec_id AS b
            FROM embeddings a
            JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
            WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])) >= {EMB_TAU}
        """,
        "semantic_dedup": f"""
            WITH c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS ce
                       FROM embeddings WHERE vec_id < 8),
            s AS (SELECT e.vec_id, c.cid,
                         CAST(FLOOR(list_cosine_similarity(
                                CAST(e.embedding AS DOUBLE[]), c.ce) * 1000000 + 0.5)
                              AS BIGINT) AS cos_micro
                  FROM embeddings e, c),
            a AS (SELECT vec_id, cid AS cluster FROM (
                    SELECT vec_id, cid,
                           row_number() OVER (PARTITION BY vec_id
                                              ORDER BY cos_micro DESC, cid) AS rn
                    FROM s) WHERE rn = 1),
            emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings),
            pruned AS (SELECT DISTINCT x.vec_id
                       FROM a x JOIN a y
                         ON x.cluster = y.cluster AND y.vec_id < x.vec_id
                       JOIN emb ex ON ex.vec_id = x.vec_id
                       JOIN emb ey ON ey.vec_id = y.vec_id
                       WHERE CAST(FLOOR(list_cosine_similarity(ex.ev, ey.ev)
                                        * 1000000 + 0.5) AS BIGINT)
                             >= {int(EMB_TAU * 1_000_000)})
            SELECT a.vec_id, CAST(a.cluster AS INTEGER) AS cluster,
                   (p.vec_id IS NULL) AS keep
            FROM a LEFT JOIN pruned p ON a.vec_id = p.vec_id
        """,
        "graph_pagerank": _pagerank_sql(5),
        "label_propagation": _label_prop_sql(3),
        "personalized_pagerank": _ppr_sql(5),
        "hits_scores": _hits_sql(4),
        "hits_full": _hits_sql(4, both=True),
        "triangle_counts": """
            WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
            e AS (
                SELECT a.l_partkey AS pa, b.l_partkey AS pb
                FROM lp a JOIN lp b
                  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
                GROUP BY 1, 2 HAVING COUNT(*) >= 2
            ),
            tri AS (
                SELECT e1.pa AS x, e1.pb AS y, e2.pb AS z
                FROM e e1
                JOIN e e2 ON e1.pb = e2.pa
                JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
            ),
            nodes AS (
                SELECT x AS node FROM tri
                UNION ALL SELECT y FROM tri
                UNION ALL SELECT z FROM tri
            )
            SELECT node AS part_key, COUNT(*)::BIGINT AS n_triangles
            FROM nodes GROUP BY 1
        """,
        "kcore": _kcore_sql(3, 16),
        "common_neighbors": """
            WITH lp AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
            e AS MATERIALIZED (
                SELECT a.l_partkey AS pa, b.l_partkey AS pb
                FROM lp a JOIN lp b
                  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
                GROUP BY 1, 2 HAVING COUNT(*) >= 2),
            bidir AS (SELECT pa AS u, pb AS v FROM e UNION ALL SELECT pb, pa FROM e),
            wedge AS (SELECT a.v AS x, b.v AS y, COUNT(*) AS cn
                      FROM bidir a JOIN bidir b ON a.u = b.u AND a.v < b.v
                      GROUP BY 1, 2),
            nonedge AS (SELECT x, y, cn FROM wedge w
                        WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.pa = w.x AND e.pb = w.y))
            SELECT x AS part_a, y AS part_b, cn::BIGINT AS n_common
            FROM nonedge ORDER BY cn DESC, x, y LIMIT 20
        """,
        "bloom_semi_join": """
            SELECT l_partkey AS part_key,
                   COUNT(*)::BIGINT AS n_items,
                   CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_size >= 48
            GROUP BY 1
        """,
        "part_skyline": """
            SELECT p_partkey, p_size, p_retailprice FROM part p
            WHERE NOT EXISTS (
              SELECT 1 FROM part q
              WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
                AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
        """,
        "kmeans_iter": _kmeans_sql(8, 3),
        "kcenter_sample": _kcenter_sql(8),
        "linreg_train": _linreg_sql(5, 16),
        "greedy_coverage": _greedy_coverage_sql(5),
        "seeded_shuffle": """
            WITH x0t AS (SELECT doc_id,
                   (xor(doc_id, 42)::HUGEINT + 11400714819323198485)
                     % 18446744073709551616 AS x0 FROM documents),
            x0xt AS (SELECT doc_id, xor(x0, x0 // 1073741824) AS x0x FROM x0t),
            x1t AS (SELECT doc_id,
                   ((x0x % 4294967296) * 484763065
                    + (((x0x // 4294967296) * 484763065
                        + (x0x % 4294967296) * 3210233709) % 4294967296)
                      * 4294967296) % 18446744073709551616 AS x1 FROM x0xt),
            x1xt AS (SELECT doc_id, xor(x1, x1 // 134217728) AS x1x FROM x1t),
            x2t AS (SELECT doc_id,
                   ((x1x % 4294967296) * 321982955
                    + (((x1x // 4294967296) * 321982955
                        + (x1x % 4294967296) * 2496678331) % 4294967296)
                      * 4294967296) % 18446744073709551616 AS x2 FROM x1xt),
            ht AS (SELECT doc_id, xor(x2, x2 // 2147483648) AS h FROM x2t)
            SELECT doc_id, ROW_NUMBER() OVER (ORDER BY h, doc_id) AS shuffle_pos
            FROM ht
        """,
        "props_rollup": """
            WITH e AS (SELECT event_type,
                              CAST(NULLIF(regexp_extract(props, '"k": (\\d+)', 1), '')
                                   AS BIGINT) AS k
                       FROM events)
            SELECT event_type,
                   COUNT(k)::BIGINT AS n_events,
                   CAST(SUM(k) AS BIGINT) AS sum_k,
                   CAST(MIN(k) AS BIGINT) AS min_k,
                   CAST(MAX(k) AS BIGINT) AS max_k
            FROM e GROUP BY 1
        """,
        "mutual_knn": """
            WITH s AS (
              SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                     CAST(FLOOR(list_cosine_similarity(
                            CAST(a.embedding AS DOUBLE[]),
                            CAST(b.embedding AS DOUBLE[])) * 1000000 + 0.5)
                          AS BIGINT) AS m
              FROM embeddings a, embeddings b
              WHERE a.vec_id <> b.vec_id),
            r AS (SELECT query_id, neighbor_id,
                         ROW_NUMBER() OVER (PARTITION BY query_id
                                            ORDER BY m DESC, neighbor_id) AS rk
                  FROM s),
            t AS (SELECT query_id, neighbor_id FROM r WHERE rk <= 5)
            SELECT x.query_id AS a, x.neighbor_id AS b
            FROM t x JOIN t y
              ON y.query_id = x.neighbor_id AND y.neighbor_id = x.query_id
            WHERE x.query_id < x.neighbor_id
        """,
        "mutual_knn_ivf": """
            WITH c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS ce
                       FROM embeddings WHERE vec_id < 8),
            cs AS (SELECT e.vec_id, c.cid,
                          CAST(FLOOR(list_cosine_similarity(
                                 CAST(e.embedding AS DOUBLE[]), c.ce) * 1000000 + 0.5)
                               AS BIGINT) AS m
                   FROM embeddings e, c),
            cr AS (SELECT vec_id, cid,
                          ROW_NUMBER() OVER (PARTITION BY vec_id
                                             ORDER BY m DESC, cid) AS rn
                   FROM cs),
            a1 AS (SELECT vec_id, cid FROM cr WHERE rn = 1),
            probe AS (SELECT vec_id, cid FROM cr WHERE rn <= 2),
            cand AS (SELECT p.vec_id AS query_id, n.vec_id AS neighbor_id
                     FROM probe p JOIN a1 n
                       ON n.cid = p.cid AND n.vec_id <> p.vec_id),
            s AS (SELECT cand.query_id, cand.neighbor_id,
                         CAST(FLOOR(list_cosine_similarity(
                                CAST(a.embedding AS DOUBLE[]),
                                CAST(b.embedding AS DOUBLE[])) * 1000000 + 0.5)
                              AS BIGINT) AS m
                  FROM cand
                  JOIN embeddings a ON a.vec_id = cand.query_id
                  JOIN embeddings b ON b.vec_id = cand.neighbor_id),
            r AS (SELECT query_id, neighbor_id,
                         ROW_NUMBER() OVER (PARTITION BY query_id
                                            ORDER BY m DESC, neighbor_id) AS rk
                  FROM s),
            t AS (SELECT query_id, neighbor_id FROM r WHERE rk <= 5)
            SELECT x.query_id AS a, x.neighbor_id AS b
            FROM t x JOIN t y
              ON y.query_id = x.neighbor_id AND y.neighbor_id = x.query_id
            WHERE x.query_id < x.neighbor_id
        """,
        "grouped_price_quantiles": """
            WITH v AS (SELECT o_orderpriority AS grp,
                              CAST(o_totalprice AS DOUBLE) AS x FROM orders),
            s AS (SELECT grp, CAST(MIN(x) AS DOUBLE) AS lo,
                         CAST(MAX(x) AS DOUBLE) AS hi, COUNT(*) AS n
                  FROM v GROUP BY 1),
            p AS (SELECT grp, lo, n,
                         (CASE WHEN hi <= lo THEN lo + 1.0 ELSE hi END - lo) / 512
                           AS width
                  FROM s),
            b AS (SELECT v.grp,
                         LEAST(GREATEST(CAST(FLOOR((x - lo) / width) AS BIGINT), 0),
                               511) AS bin
                  FROM v JOIN p ON v.grp = p.grp),
            h AS (SELECT grp, bin, COUNT(*) AS c FROM b GROUP BY 1, 2),
            cum AS (SELECT grp, bin,
                           CAST(SUM(c) OVER (PARTITION BY grp ORDER BY bin) AS BIGINT)
                             AS cm
                    FROM h)
            SELECT p.grp AS o_orderpriority, p.n::BIGINT AS n_rows,
                   lo + ((SELECT MIN(bin) FROM cum
                          WHERE cum.grp = p.grp
                            AND cm >= CAST(CEIL(0.5 * n) AS BIGINT)) + 1) * width
                     AS p5,
                   lo + ((SELECT MIN(bin) FROM cum
                          WHERE cum.grp = p.grp
                            AND cm >= CAST(CEIL(0.9 * n) AS BIGINT)) + 1) * width
                     AS p9
            FROM p
        """,
        "user_drawdown": """
            WITH e AS (
              SELECT user_id, ts, event_id,
                     CAST(ROUND(value * 100) AS BIGINT) AS cents
              FROM events),
            d AS (
              SELECT user_id,
                     MAX(cents) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) - cents AS dd
              FROM e)
            SELECT user_id, COUNT(*)::BIGINT AS n_events,
                   MAX(dd)::BIGINT AS max_drawdown_cents
            FROM d GROUP BY 1
        """,
        "orders_pivot": """
            SELECT (year(o_orderdate) * 100 + month(o_orderdate))::BIGINT AS month_key,
                   (COUNT(*) FILTER (WHERE o_orderpriority LIKE '1%'))::BIGINT AS n_urgent,
                   (COUNT(*) FILTER (WHERE o_orderpriority LIKE '2%'))::BIGINT AS n_high,
                   (COUNT(*) FILTER (WHERE o_orderpriority LIKE '3%'))::BIGINT AS n_medium,
                   (COUNT(*) FILTER (WHERE o_orderpriority LIKE '4%'))::BIGINT AS n_notspec,
                   (COUNT(*) FILTER (WHERE o_orderpriority LIKE '5%'))::BIGINT AS n_low
            FROM orders GROUP BY 1
        """,
        "embedding_pca": _pca_sql(5),
        "dsir_weights": """
            WITH dt AS (
              SELECT doc_id, lang,
                     UNNEST(regexp_split_to_array(TRIM(text), '\\s+')) AS word
              FROM documents WHERE TRIM(text) <> ''
            ),
            c AS (SELECT word, COUNT(*) AS nr,
                         COUNT(*) FILTER (WHERE lang = 'en') AS nt
                  FROM dt GROUP BY word),
            tot AS (SELECT SUM(nr) AS sr, SUM(nt) AS st, COUNT(*) AS v FROM c),
            lp AS (SELECT word,
                          CAST(FLOOR(ln((nt + 1.0) / (st + v)) * 1000000 + 0.5)
                               AS BIGINT)
                          - CAST(FLOOR(ln((nr + 1.0) / (sr + v)) * 1000000 + 0.5)
                                 AS BIGINT) AS diff
                   FROM c, tot),
            agg AS (SELECT dt.doc_id, COUNT(*) AS n_tokens,
                           SUM(lp.diff) AS w
                    FROM dt JOIN lp USING (word) GROUP BY dt.doc_id)
            SELECT d.doc_id,
                   COALESCE(a.n_tokens, 0) AS n_tokens,
                   CAST(COALESCE(a.w, 0) AS BIGINT) AS w_unats
            FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
        """,
        "oov_rate": """
            WITH toks AS (
              SELECT UNNEST(regexp_split_to_array(TRIM(text), '\\s+')) AS word
              FROM documents WHERE TRIM(text) <> ''
            ),
            vocab AS (
              SELECT word FROM (
                SELECT word,
                       ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, word ASC) - 1
                         AS tid
                FROM toks GROUP BY word)
              WHERE tid < 25
            ),
            dt AS (
              SELECT doc_id,
                     UNNEST(regexp_split_to_array(TRIM(text), '\\s+')) AS word
              FROM documents WHERE TRIM(text) <> ''
            ),
            agg AS (
              SELECT doc_id, COUNT(*) AS n_tokens,
                     COUNT(*) FILTER (
                       WHERE word NOT IN (SELECT word FROM vocab)) AS n_oov
              FROM dt GROUP BY doc_id
            )
            SELECT d.doc_id,
                   COALESCE(a.n_tokens, 0) AS n_tokens,
                   COALESCE(a.n_oov, 0) AS n_oov,
                   CASE WHEN COALESCE(a.n_tokens, 0) = 0 THEN 0
                        ELSE (a.n_oov * 1000) // a.n_tokens END AS oov_permille
            FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
        """,
        # signed hashing trick: bucket = sha-prefix-64 % 16, sign from
        # hash bit 32; nonzero cells only
        "hash_features": """
            WITH dt AS (
              SELECT doc_id,
                     UNNEST(regexp_split_to_array(TRIM(text), '\\s+')) AS word
              FROM documents WHERE TRIM(text) <> ''
            ),
            h AS (SELECT doc_id,
                         CAST(('0x' || substr(sha256(word), 1, 16)) AS UBIGINT) AS hv
                  FROM dt),
            f AS (SELECT doc_id, CAST(hv % 16 AS BIGINT) AS dim,
                         CASE WHEN (hv >> 32) & 1 = 1 THEN 1 ELSE -1 END AS s
                  FROM h),
            agg AS (SELECT doc_id, dim, CAST(SUM(s) AS BIGINT) AS val
                    FROM f GROUP BY doc_id, dim)
            SELECT doc_id, dim, val FROM agg WHERE val <> 0
        """,
        # alpha=1/2 temperature weights: sqrt numerators quantized to
        # integer micro-units, weights by integer division (exact)
        "temperature_mix": """
            WITH c AS (SELECT source, COUNT(*) AS n_docs
                       FROM documents GROUP BY source),
            q AS (SELECT source, n_docs,
                         CAST(FLOOR(SQRT(CAST(n_docs AS DOUBLE)) * 1000000 + 0.5)
                              AS BIGINT) AS num_micro
                  FROM c),
            s AS (SELECT CAST(SUM(num_micro) AS BIGINT) AS den FROM q)
            SELECT source, n_docs, num_micro,
                   CAST(num_micro * 1000000 // den AS BIGINT) AS weight_ppm
            FROM q, s ORDER BY source
        """,
        # first-occurrence KWIC window: pos is 0-based, snippet is the
        # clipped [pos-20, pos+len('vector')+20) span
        "kwic_snippets": """
            WITH p AS (SELECT doc_id, text, strpos(text, 'vector') AS sp
                       FROM documents)
            SELECT doc_id, CAST(sp - 1 AS BIGINT) AS pos,
                   substr(text, GREATEST(sp - 20, 1),
                          sp + 25 - GREATEST(sp - 21, 0)) AS snippet
            FROM p WHERE sp > 0
        """,
        "grouped_heavy_hitters": """
            WITH toks AS (
              SELECT lang,
                     UNNEST(regexp_split_to_array(TRIM(text), '\\s+')) AS word
              FROM documents WHERE TRIM(text) <> ''
            ),
            c AS (SELECT lang, word, COUNT(*) AS n FROM toks GROUP BY 1, 2),
            tot AS (SELECT lang, COUNT(*) AS t FROM toks GROUP BY 1)
            SELECT c.lang, c.word, CAST(n AS BIGINT) AS n
            FROM c JOIN tot ON c.lang = tot.lang
            WHERE n * 30 > t
        """,
        "heavy_hitters": """
            WITH toks AS (
              SELECT UNNEST(regexp_split_to_array(TRIM(text), '\\s+')) AS word
              FROM documents WHERE TRIM(text) <> ''
            ),
            c AS (SELECT word, COUNT(*) AS n FROM toks GROUP BY word),
            tot AS (SELECT COUNT(*) AS t FROM toks)
            SELECT word, CAST(n AS BIGINT) AS n
            FROM c, tot WHERE n * 30 > t
            ORDER BY n DESC, word ASC
        """,
        "quality_logreg": """
            WITH dt AS (
              SELECT doc_id,
                     UNNEST(regexp_split_to_array(TRIM(text), '\\s+')) AS word
              FROM documents WHERE TRIM(text) <> ''
            ),
            w AS (
              SELECT doc_id,
                     CAST(CAST(('0x' || substr(sha256(word), 1, 16)) AS UBIGINT)
                          % 2001 AS BIGINT) - 1000 AS wt
              FROM dt
            ),
            agg AS (SELECT doc_id, COUNT(*) AS n_tokens, SUM(wt) AS score
                    FROM w GROUP BY doc_id)
            SELECT d.doc_id,
                   COALESCE(a.n_tokens, 0) AS n_tokens,
                   CAST(COALESCE(a.score, 0) AS BIGINT) AS score,
                   CAST(CASE WHEN COALESCE(a.score, 0) > 0
                             THEN 1 ELSE 0 END AS BIGINT) AS label
            FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
        """,
        "image_ahash_dups": f"""
            WITH im AS (
              SELECT media_id, width, height, channels, hex(payload) AS hx
              FROM read_parquet('{_MEDIA_GLOB}') WHERE kind = 'image'
            ),
            px AS (
              SELECT media_id,
                     ((i // channels) // width) * 4 // height AS br,
                     ((i // channels) % width) * 4 // width AS bc,
                     CAST(('0x' || substring(hx, 2*(9 + i) + 1, 2)) AS INTEGER) AS v
              FROM im, generate_series(0, 99999) AS t(i)
              WHERE i < width*height*channels
            ),
            bs AS (SELECT media_id, br, bc, SUM(v) AS s
                   FROM px GROUP BY media_id, br, bc),
            tot AS (SELECT media_id, SUM(s) AS ts FROM bs GROUP BY media_id),
            hsh AS (SELECT b.media_id,
                           CAST(SUM(CASE WHEN b.s * 16 > t.ts
                                         THEN CAST(1 AS BIGINT) << (br*4 + bc)
                                         ELSE 0 END) AS BIGINT) AS ahash
                    FROM bs b JOIN tot t USING (media_id)
                    GROUP BY b.media_id)
            SELECT media_id, ahash,
                   COUNT(*) OVER (PARTITION BY ahash) AS n_same
            FROM hsh
        """,
        # ---- geo oracles: the pages corpus + payloads are closed-form
        # deterministic (georay/pages.py, georay/fixtures.py), so DuckDB
        # can recompute coordinates (sha256 -> uint64 -> bbox scale),
        # grid containment (incl. donut holes), mercator cells/tiles and
        # per-layer bbox rollups from first principles. Paths pin the
        # sf0.01 corpus the driver's correctness gate runs at.
        "geo_extract": f"""
            WITH p AS (
              SELECT url, warc_ts, lang, text,
                     CAST(('0x' || substr(sha256('coord:' || url), 1, 16)) AS UBIGINT) AS h,
                     CAST(regexp_extract(url, '([0-9]+)$', 1) AS BIGINT) AS i
              FROM read_parquet('{_PAGES_GLOB}')
            )
            SELECT url, warc_ts, lang, text,
                   -122.5 + (CAST(h % 4294967296 AS DOUBLE) / 4294967296.0)
                            * (CAST(-122.2 AS DOUBLE) - CAST(-122.5 AS DOUBLE)) AS lon,
                   47.4 + (CAST(h // 4294967296 AS DOUBLE) / 4294967296.0)
                          * (CAST(47.8 AS DOUBLE) - CAST(47.4 AS DOUBLE)) AS lat,
                   (i % 100 = 0) AS has_payload
            FROM p
        """,
        # grid closed form: cell w x h, donut (pid%7=3) loses the
        # centered half-width hole; quantized at 1e10 every output is
        # an exact integer (measure.py docstring has the margin math)
        # hull of every grid cell = its outer rectangle (hole rings
        # are interior): 4 hull vertices, area w*h, for every present
        # polygon id.
        "geo_hulls": f"""
            WITH {_NPOLY_CTE},
            ids AS (
              SELECT CAST(v AS BIGINT) AS pid
              FROM range(256) t(v), npoly WHERE v < npoly.np
            )
            SELECT pid AS polygon_id,
                   CAST(4 AS BIGINT) AS hull_nv,
                   CAST(FLOOR(((CAST(-122.2 AS DOUBLE) - CAST(-122.5 AS DOUBLE)) / 16)
                              * ((CAST(47.8 AS DOUBLE) - CAST(47.4 AS DOUBLE)) / 16)
                              * 10000000000 + 0.5) AS BIGINT) AS hull_area_q
            FROM ids
        """,
        "geo_areas": f"""
            WITH {_NPOLY_CTE},
            ids AS (
              SELECT CAST(v AS BIGINT) AS pid
              FROM range(256) t(v), npoly WHERE v < npoly.np
            ),
            g AS (
              SELECT pid,
                     (CAST(-122.2 AS DOUBLE) - CAST(-122.5 AS DOUBLE)) / 16 AS w,
                     (CAST(47.8 AS DOUBLE) - CAST(47.4 AS DOUBLE)) / 16 AS h
              FROM ids
            ),
            m AS (
              SELECT pid,
                     CASE WHEN pid % 7 = 3
                          THEN w*h - (0.5*w)*(0.5*h) ELSE w*h END AS area,
                     CASE WHEN pid % 7 = 3
                          THEN 2*(w+h) + 2*(0.5*w + 0.5*h) ELSE 2*(w+h) END AS perim
              FROM g
            )
            SELECT pid AS polygon_id,
                   CAST(FLOOR(area * 10000000000 + 0.5) AS BIGINT) AS area_q,
                   CAST(FLOOR(perim * 10000000000 + 0.5) AS BIGINT) AS perim_q
            FROM m
        """,
        # closed-form rect-intersection per (grid polygon, zoom-15
        # tile): tile lat bounds use the exp-form sinh (DuckDB has
        # none); the ~1e-16 transcendental skew is ~1e-6 of a 1e10
        # quantization unit. Zero-coverage rows drop on BOTH sides, so
        # a one-ulp tile-range disagreement cannot change the output.
        "geo_tile_coverage": f"""
            WITH {_NPOLY_CTE},
            ids AS (
              SELECT CAST(v AS BIGINT) AS pid
              FROM range(256) t(v), npoly WHERE v < npoly.np
            ),
            pb AS (
              SELECT pid,
                     -122.5 + (pid % 16)
                       * ((CAST(-122.2 AS DOUBLE) - CAST(-122.5 AS DOUBLE)) / 16) AS px0,
                     47.4 + (pid // 16)
                       * ((CAST(47.8 AS DOUBLE) - CAST(47.4 AS DOUBLE)) / 16) AS py0
              FROM ids
            ),
            pb2 AS (
              SELECT pid, px0, py0,
                     px0 + ((CAST(-122.2 AS DOUBLE) - CAST(-122.5 AS DOUBLE)) / 16) AS px1,
                     py0 + ((CAST(47.8 AS DOUBLE) - CAST(47.4 AS DOUBLE)) / 16) AS py1
              FROM pb
            ),
            txr AS (
              SELECT pid, px0, px1, py0, py1,
                     CAST(floor((px0 + 180.0) / 360.0 * 32768) AS BIGINT) AS txa,
                     CAST(floor((px1 + 180.0) / 360.0 * 32768) AS BIGINT) AS txb,
                     {_MERC_Y_SQL("py1", 32768)} AS tya,
                     {_MERC_Y_SQL("py0", 32768)} AS tyb
              FROM pb2
            ),
            tl AS (
              SELECT pid, px0, px1, py0, py1, txa + i AS tx, tya + j AS ty
              FROM txr, generate_series(0, 99) sx(i), generate_series(0, 99) sy(j)
              WHERE i <= txb - txa AND j <= tyb - tya
            ),
            tb AS (
              SELECT pid, px0, px1, py0, py1, tx, ty,
                     tx / 32768.0 * 360.0 - 180.0 AS tlon0,
                     (tx + 1) / 32768.0 * 360.0 - 180.0 AS tlon1,
                     degrees(atan((exp(pi() * (1 - 2 * ty / 32768.0))
                                   - exp(-(pi() * (1 - 2 * ty / 32768.0)))) / 2.0)) AS tlat1,
                     degrees(atan((exp(pi() * (1 - 2 * (ty + 1) / 32768.0))
                                   - exp(-(pi() * (1 - 2 * (ty + 1) / 32768.0)))) / 2.0)) AS tlat0
              FROM tl
            ),
            cv AS (
              SELECT pid, tx, ty,
                     GREATEST(LEAST(px1, tlon1) - GREATEST(px0, tlon0), 0)
                     * GREATEST(LEAST(py1, tlat1) - GREATEST(py0, tlat0), 0)
                     - CASE WHEN pid % 7 = 3 THEN
                         GREATEST(LEAST(px1 - 0.25*(px1-px0), tlon1)
                                  - GREATEST(px0 + 0.25*(px1-px0), tlon0), 0)
                         * GREATEST(LEAST(py1 - 0.25*(py1-py0), tlat1)
                                    - GREATEST(py0 + 0.25*(py1-py0), tlat0), 0)
                       ELSE 0 END AS cov
              FROM tb
            )
            SELECT pid AS polygon_id,
                   {_pack_cell_sql(15, "tx", "ty")} AS tile,
                   CAST(FLOOR(cov * 10000000000 + 0.5) AS BIGINT) AS cov_q
            FROM cv
            WHERE CAST(FLOOR(cov * 10000000000 + 0.5) AS BIGINT) > 0
        """,
        # shared-edge adjacency over the grid: right neighbor within a
        # row, upper neighbor within a column (corner touches excluded)
        "geo_adjacency": f"""
            WITH {_NPOLY_CTE},
            ids AS (
              SELECT CAST(v AS BIGINT) AS pid
              FROM range(256) t(v), npoly WHERE v < npoly.np
            )
            SELECT a.pid AS a, b.pid AS b
            FROM ids a JOIN ids b ON a.pid < b.pid
            WHERE (b.pid = a.pid + 1 AND a.pid % 16 < 15)
               OR (b.pid = a.pid + 16)
        """,
        # pyramid rollup: z15 tile from the mercator closed form,
        # parents by integer x>>2 / x>>4 (bit-exact on both sides)
        # spatio-temporal rollup: z13 tile from the mercator closed
        # form over the coord hash, hour from epoch(warc_ts)//3600
        "geo_tile_hours": f"""
            WITH p AS (
              SELECT url, warc_ts,
                     CAST(('0x' || substr(sha256('coord:' || url), 1, 16)) AS UBIGINT) AS h
              FROM read_parquet('{_PAGES_GLOB}')
            ),
            pt AS (
              SELECT warc_ts,
                     -122.5 + (CAST(h % 4294967296 AS DOUBLE) / 4294967296.0)
                              * (CAST(-122.2 AS DOUBLE) - CAST(-122.5 AS DOUBLE)) AS lon,
                     47.4 + (CAST(h // 4294967296 AS DOUBLE) / 4294967296.0)
                            * (CAST(47.8 AS DOUBLE) - CAST(47.4 AS DOUBLE)) AS lat
              FROM p
            ),
            xy AS (
              SELECT CAST(floor((lon + 180.0) / 360.0 * 8192) AS BIGINT) AS x,
                     {_MERC_Y_SQL("lat", 8192)} AS y,
                     CAST(epoch(warc_ts) AS BIGINT) // 3600 AS hour
              FROM pt
            )
            SELECT {_pack_cell_sql(13, "x", "y")} AS tile, hour,
                   COUNT(*) AS n_pages
            FROM xy GROUP BY 1, 2
        """,
        # radius join: page coords from the url-hash closed form,
        # centroid = grid-cell center (the decoded outer ring's vertex
        # mean lands on the same point within ulps; the 3 km threshold
        # comparison is float-safe without quantization)
        "geo_radius_join": f"""
            WITH {_NPOLY_CTE},
            p AS (
              SELECT url,
                     CAST(('0x' || substr(sha256('coord:' || url), 1, 16)) AS UBIGINT) AS h
              FROM read_parquet('{_PAGES_GLOB}')
            ),
            pt AS (
              SELECT url,
                     -122.5 + (CAST(h % 4294967296 AS DOUBLE) / 4294967296.0)
                              * (CAST(-122.2 AS DOUBLE) - CAST(-122.5 AS DOUBLE)) AS lon,
                     47.4 + (CAST(h // 4294967296 AS DOUBLE) / 4294967296.0)
                            * (CAST(47.8 AS DOUBLE) - CAST(47.4 AS DOUBLE)) AS lat
              FROM p
            ),
            cent AS (
              SELECT CAST(v AS BIGINT) AS polygon_id,
                     -122.5 + ((CAST(v AS BIGINT) % 16) + 0.5)
                              * ((CAST(-122.2 AS DOUBLE) - CAST(-122.5 AS DOUBLE)) / 16) AS cx,
                     47.4 + ((CAST(v AS BIGINT) // 16) + 0.5)
                            * ((CAST(47.8 AS DOUBLE) - CAST(47.4 AS DOUBLE)) / 16) AS cy
              FROM range(256) t(v), npoly WHERE v < npoly.np
            )
            SELECT pt.url, cent.polygon_id
            FROM pt, cent
            WHERE 2.0 * 6371008.8 * asin(sqrt(
                    pow(sin(radians(cent.cy - pt.lat) / 2.0), 2)
                    + cos(radians(pt.lat)) * cos(radians(cent.cy))
                      * pow(sin(radians(cent.cx - pt.lon) / 2.0), 2)
                  )) <= 3000.0
        """,
        # dissolve: same-layer (pid %% 2) shared-edge components over
        # the grid collapse each present column to one region labeled
        # by its row-0 cell
        "geo_dissolve": f"""
            WITH {_NPOLY_CTE},
            ids AS (
              SELECT CAST(v AS BIGINT) AS pid
              FROM range(256) t(v), npoly WHERE v < npoly.np
            )
            SELECT pid AS polygon_id, pid % 16 AS region_id FROM ids
        """,
        "geo_tile_pyramid": f"""
            WITH p AS (
              SELECT url,
                     CAST(('0x' || substr(sha256('coord:' || url), 1, 16)) AS UBIGINT) AS h
              FROM read_parquet('{_PAGES_GLOB}')
            ),
            pt AS (
              SELECT -122.5 + (CAST(h % 4294967296 AS DOUBLE) / 4294967296.0)
                              * (CAST(-122.2 AS DOUBLE) - CAST(-122.5 AS DOUBLE)) AS lon,
                     47.4 + (CAST(h // 4294967296 AS DOUBLE) / 4294967296.0)
                            * (CAST(47.8 AS DOUBLE) - CAST(47.4 AS DOUBLE)) AS lat
              FROM p
            ),
            xy AS (
              SELECT CAST(floor((lon + 180.0) / 360.0 * 32768) AS BIGINT) AS x,
                     {_MERC_Y_SQL("lat", 32768)} AS y
              FROM pt
            )
            SELECT {_pack_cell_sql(15, "x", "y")} AS tile,
                   COUNT(*) AS n_pages, CAST(15 AS BIGINT) AS zoom
            FROM xy GROUP BY 1
            UNION ALL
            SELECT {_pack_cell_sql(13, "x // 4", "y // 4")} AS tile,
                   COUNT(*) AS n_pages, CAST(13 AS BIGINT) AS zoom
            FROM xy GROUP BY 1
            UNION ALL
            SELECT {_pack_cell_sql(11, "x // 16", "y // 16")} AS tile,
                   COUNT(*) AS n_pages, CAST(11 AS BIGINT) AS zoom
            FROM xy GROUP BY 1
        """,
        # pointy-top axial hex binning, size 0.02 deg: the SAME double
        # op sequence as cells.hex_encode (mul/div/floor/compare + one
        # sqrt), so cell ids match bit-for-bit with no rounding margin
        "geo_hex_counts": f"""
            WITH p AS (
              SELECT url,
                     CAST(('0x' || substr(sha256('coord:' || url), 1, 16)) AS UBIGINT) AS h
              FROM read_parquet('{_PAGES_GLOB}')
            ),
            pt AS (
              SELECT -122.5 + (CAST(h % 4294967296 AS DOUBLE) / 4294967296.0)
                              * (CAST(-122.2 AS DOUBLE) - CAST(-122.5 AS DOUBLE)) AS lon,
                     47.4 + (CAST(h // 4294967296 AS DOUBLE) / 4294967296.0)
                            * (CAST(47.8 AS DOUBLE) - CAST(47.4 AS DOUBLE)) AS lat
              FROM p
            ),
            ax AS (
              SELECT ((sqrt(3.0) / 3.0) * lon - (1.0 / 3.0) * lat) / 0.02 AS qf,
                     ((2.0 / 3.0) * lat) / 0.02 AS rf
              FROM pt
            ),
            c AS (
              SELECT qf AS xf, -qf - rf AS yf, rf AS zf,
                     FLOOR(qf + 0.5) AS rx,
                     FLOOR(-qf - rf + 0.5) AS ry,
                     FLOOR(rf + 0.5) AS rz
              FROM ax
            ),
            f AS (
              SELECT CASE WHEN abs(rx - xf) > abs(ry - yf)
                           AND abs(rx - xf) > abs(rz - zf)
                          THEN -ry - rz ELSE rx END AS q,
                     CASE WHEN NOT (abs(rx - xf) > abs(ry - yf)
                                    AND abs(rx - xf) > abs(rz - zf))
                           AND NOT (abs(ry - yf) > abs(rz - zf))
                          THEN -rx - ry ELSE rz END AS r
              FROM c
            )
            SELECT (CAST(q AS BIGINT) + 1048576) * 2097152
                   + (CAST(r AS BIGINT) + 1048576) AS hex_cell,
                   COUNT(*) AS n_pages
            FROM f GROUP BY 1
        """,
        "geo_pip_join": f"""
            {_GEO_JOIN_CTE}
            SELECT url, lon, lat, cell, polygon_id,
                   polygon_id % 2 AS polygon_layer,
                   'cell_' || CAST(polygon_id AS VARCHAR) AS polygon_name,
                   tile
            FROM joined
        """,
        "geo_tile_counts": f"""
            {_GEO_JOIN_CTE}
            SELECT tile, COUNT(*) AS n_pages
            FROM joined
            GROUP BY tile
        """,
        "geo_tile_contrast": f"""
            {_GEO_JOIN_CTE}
            , tc AS (SELECT tile, COUNT(*) AS n FROM joined GROUP BY tile),
            xy AS (SELECT tile, n,
                          (tile % 288230376151711744) // 536870912 AS x,
                          tile % 536870912 AS y
                   FROM tc),
            nb AS (SELECT a.tile, a.n, SUM(b.n) AS s
                   FROM xy a JOIN xy b
                     ON abs(a.x - b.x) <= 1 AND abs(a.y - b.y) <= 1
                   GROUP BY 1, 2)
            SELECT tile, n::BIGINT AS n_pages, (9 * n - s)::BIGINT AS contrast
            FROM nb
        """,
        "geo_polygon_tiles": f"""
            WITH {_NPOLY_CTE},
            pid AS (SELECT CAST(v AS BIGINT) AS polygon_id FROM range(256) t(v)
                    WHERE v < (SELECT np FROM npoly)),
            b AS (
              SELECT polygon_id,
                     -122.5 + (polygon_id % 16) * ((CAST(-122.2 AS DOUBLE) - CAST(-122.5 AS DOUBLE)) / 16) AS x0,
                     47.4 + (polygon_id // 16) * ((CAST(47.8 AS DOUBLE) - CAST(47.4 AS DOUBLE)) / 16) AS y0,
                     -122.5 + (polygon_id % 16) * ((CAST(-122.2 AS DOUBLE) - CAST(-122.5 AS DOUBLE)) / 16)
                       + ((CAST(-122.2 AS DOUBLE) - CAST(-122.5 AS DOUBLE)) / 16) AS x1,
                     47.4 + (polygon_id // 16) * ((CAST(47.8 AS DOUBLE) - CAST(47.4 AS DOUBLE)) / 16)
                       + ((CAST(47.8 AS DOUBLE) - CAST(47.4 AS DOUBLE)) / 16) AS y1
              FROM pid
            ),
            r AS (
              SELECT polygon_id,
                     CAST(floor((x0 + 180.0) / 360.0 * 32768) AS BIGINT) AS tx0,
                     CAST(floor((x1 + 180.0) / 360.0 * 32768) AS BIGINT) AS tx1,
                     {_MERC_Y_SQL('y1', 32768)} AS ty0,
                     {_MERC_Y_SQL('y0', 32768)} AS ty1
              FROM b
            )
            SELECT 15 * 288230376151711744 + CAST(ux.x AS BIGINT) * 536870912
                     + CAST(uy.y AS BIGINT) AS tile,
                   polygon_id
            FROM r,
                 UNNEST(range(tx0, tx1 + 1)) AS ux(x),
                 UNNEST(range(ty0, ty1 + 1)) AS uy(y)
        """,
        "geo_features": f"""
            WITH p AS (
              SELECT url,
                     CAST(regexp_extract(url, '([0-9]+)$', 1) AS BIGINT) AS i
              FROM read_parquet('{_PAGES_GLOB}')
            ),
            pay AS (SELECT url, i // 100 AS k FROM p WHERE i % 100 = 0),
            f AS (
              SELECT url, k, CAST(k % 4 AS BIGINT) AS fmt,
                     CAST(u.j AS BIGINT) AS seq,
                     (4 * k + CAST(u.j AS BIGINT)) % 256 AS pid
              FROM pay, UNNEST(range(4)) AS u(j)
            ),
            b AS (
              SELECT *,
                     -122.5 + (pid % 16) * ((CAST(-122.2 AS DOUBLE) - CAST(-122.5 AS DOUBLE)) / 16) AS x0,
                     47.4 + (pid // 16) * ((CAST(47.8 AS DOUBLE) - CAST(47.4 AS DOUBLE)) / 16) AS y0
              FROM f
            )
            SELECT url, seq,
                   CAST(0 AS INTEGER) AS layer_position,
                   'layer_0' AS layer_name,
                   CASE WHEN fmt = 0 THEN 'aedc508930994337'
                        WHEN fmt = 3 THEN 'c32d6581c30de105'
                        ELSE 'd21e8ba3813051f8' END AS layer_sig,
                   CASE WHEN fmt = 0 THEN '+proj=longlat +ellps=WGS84 +no_defs'
                        WHEN fmt = 3 THEN '{_SHP_WKT_SQL}'
                        ELSE '+proj=longlat +ellps=WGS84 +datum=WGS84 +no_defs'
                   END AS crs,
                   CASE WHEN fmt = 3 THEN 'multipolygon' ELSE 'polygon' END
                     AS layer_geom_type,
                   CASE WHEN fmt = 3 THEN 'multipolygon' ELSE 'polygon' END
                     AS geom_type,
                   CASE WHEN fmt IN (1, 2)
                        THEN '["cell_' || pid || '",' || pid || ',' || (pid % 2) || ']'
                        ELSE '[' || pid || ',"cell_' || pid || '",' || (pid % 2) || ']'
                   END AS props_json,
                   CASE WHEN fmt IN (1, 2)
                        THEN '[["the_geom","name","polygon_id","layer"],["polygon","string","number","number"]]'
                        WHEN fmt = 0
                        THEN '[["the_geom","polygon_id","name","layer"],["polygon","number","string","number"]]'
                        ELSE '[["the_geom","polygon_id","name","layer"],["multipolygon","number","string","number"]]'
                   END AS cols_json,
                   ROUND(x0, 9) AS minx, ROUND(y0, 9) AS miny,
                   ROUND(x0 + ((CAST(-122.2 AS DOUBLE) - CAST(-122.5 AS DOUBLE)) / 16), 9) AS maxx,
                   ROUND(y0 + ((CAST(47.8 AS DOUBLE) - CAST(47.4 AS DOUBLE)) / 16), 9) AS maxy
            FROM b
        """,
        "geo_knn": f"""
            WITH {_NPOLY_CTE},
            p AS (
              SELECT url,
                     CAST(('0x' || substr(sha256('coord:' || url), 1, 16)) AS UBIGINT) AS h
              FROM read_parquet('{_PAGES_GLOB}')
            ),
            pt AS (
              SELECT url,
                     -122.5 + (CAST(h % 4294967296 AS DOUBLE) / 4294967296.0)
                              * (CAST(-122.2 AS DOUBLE) - CAST(-122.5 AS DOUBLE)) AS lon,
                     47.4 + (CAST(h // 4294967296 AS DOUBLE) / 4294967296.0)
                            * (CAST(47.8 AS DOUBLE) - CAST(47.4 AS DOUBLE)) AS lat
              FROM p
            ),
            cent AS (
              SELECT CAST(v AS BIGINT) AS polygon_id,
                     ((-122.5 + (v % 16) * ((CAST(-122.2 AS DOUBLE) - CAST(-122.5 AS DOUBLE)) / 16))
                      + ((-122.5 + (v % 16) * ((CAST(-122.2 AS DOUBLE) - CAST(-122.5 AS DOUBLE)) / 16))
                         + ((CAST(-122.2 AS DOUBLE) - CAST(-122.5 AS DOUBLE)) / 16))) / 2 AS cx,
                     ((47.4 + (v // 16) * ((CAST(47.8 AS DOUBLE) - CAST(47.4 AS DOUBLE)) / 16))
                      + ((47.4 + (v // 16) * ((CAST(47.8 AS DOUBLE) - CAST(47.4 AS DOUBLE)) / 16))
                         + ((CAST(47.8 AS DOUBLE) - CAST(47.4 AS DOUBLE)) / 16))) / 2 AS cy
              FROM range(256) t(v), npoly WHERE v < npoly.np
            ),
            d AS (
              SELECT pt.url, cent.polygon_id,
                     2.0 * 6371008.8 * asin(sqrt(
                         pow(sin(radians(cent.cy - pt.lat) / 2), 2)
                         + cos(radians(pt.lat)) * cos(radians(cent.cy))
                           * pow(sin(radians(cent.cx - pt.lon) / 2), 2)
                     )) AS dist
              FROM pt, cent
            ),
            r AS (
              SELECT url, polygon_id, dist,
                     ROW_NUMBER() OVER (PARTITION BY url
                                        ORDER BY dist ASC, polygon_id ASC) - 1 AS rank
              FROM d
            )
            SELECT url, CAST(rank AS INTEGER) AS rank, polygon_id,
                   ROUND(dist, 3) AS distance_m
            FROM r WHERE rank < 3
        """,
        "geo_layers": f"""
            WITH p AS (
              SELECT url,
                     CAST(regexp_extract(url, '([0-9]+)$', 1) AS BIGINT) AS i
              FROM read_parquet('{_PAGES_GLOB}')
            ),
            pay AS (SELECT url, i // 100 AS k FROM p WHERE i % 100 = 0),
            cells AS (
              SELECT url, k, CAST(k % 4 AS BIGINT) AS fmt,
                     (4 * k + CAST(u.j AS BIGINT)) % 256 AS pid
              FROM pay, UNNEST(range(4)) AS u(j)
            ),
            bounds AS (
              SELECT url, fmt,
                     -122.5 + (pid % 16) * ((CAST(-122.2 AS DOUBLE) - CAST(-122.5 AS DOUBLE)) / 16) AS x0,
                     47.4 + (pid // 16) * ((CAST(47.8 AS DOUBLE) - CAST(47.4 AS DOUBLE)) / 16) AS y0
              FROM cells
            ),
            agg AS (
              SELECT url, fmt, COUNT(*) AS count,
                     ROUND(MIN(x0), 9) AS bbox_minx, ROUND(MIN(y0), 9) AS bbox_miny,
                     ROUND(MAX(x0 + ((CAST(-122.2 AS DOUBLE) - CAST(-122.5 AS DOUBLE)) / 16)), 9) AS bbox_maxx,
                     ROUND(MAX(y0 + ((CAST(47.8 AS DOUBLE) - CAST(47.4 AS DOUBLE)) / 16)), 9) AS bbox_maxy
              FROM bounds GROUP BY url, fmt
            )
            SELECT url,
                   CAST(0 AS BIGINT) AS layer_position,
                   'layer_0' AS layer_name,
                   CASE WHEN fmt = 0 THEN 'aedc508930994337'
                        WHEN fmt = 3 THEN 'c32d6581c30de105'
                        ELSE 'd21e8ba3813051f8' END AS layer_sig,
                   CASE WHEN fmt = 0 THEN '+proj=longlat +ellps=WGS84 +no_defs'
                        WHEN fmt = 3 THEN '{_SHP_WKT_SQL}'
                        ELSE '+proj=longlat +ellps=WGS84 +datum=WGS84 +no_defs'
                   END AS crs,
                   CASE WHEN fmt = 3 THEN 'multipolygon' ELSE 'polygon' END
                     AS layer_geom_type,
                   CASE WHEN fmt IN (1, 2)
                        THEN '[["the_geom","name","polygon_id","layer"],["polygon","string","number","number"]]'
                        WHEN fmt = 0
                        THEN '[["the_geom","polygon_id","name","layer"],["polygon","number","string","number"]]'
                        ELSE '[["the_geom","polygon_id","name","layer"],["multipolygon","number","string","number"]]'
                   END AS cols_json,
                   count, bbox_minx, bbox_miny, bbox_maxx, bbox_maxy
            FROM agg
        """,
    }


# the grid rectangles are Douglas-Peucker fixed points at sub-cell
# tolerance, so geo_simplify's decode -> simplify -> re-encode ->
# measure chain must land on geo_areas' exact closed form
def _add_derived_oracles(sql: dict) -> dict:
    sql["geo_simplify"] = sql["geo_areas"]
    return sql
