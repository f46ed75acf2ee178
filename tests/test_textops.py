"""Text-hygiene ops: PII scrubbing, repetition signals, host rollup."""

import numpy as np
import pyarrow as pa

from georay import textops



def test_scrub_text_redacts(ray_session):
    import ray.data

    t = pa.table(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "mail me: a.b+c@ex-ample.co.uk  now",
                "ip 10.0.0.1 or call +1 555-123 4567",
                "   plain   words   ",
            ],
        }
    )
    out = {r["doc_id"]: r for r in textops.scrub_text(ray.data.from_arrow(t)).take_all()}
    assert out[0]["clean_text"] == "mail me: <EMAIL> now"
    assert out[0]["n_emails"] == 1 and out[0]["n_ips"] == 0
    assert out[1]["clean_text"] == "ip <IP> or call <PHONE>"
    assert out[1]["n_ips"] == 1 and out[1]["n_phones"] == 1
    assert out[2]["clean_text"] == "plain words"


def test_doc_repetition_counts(ray_session):
    import ray.data

    t = pa.table(
        {
            "doc_id": [0, 1, 2],
            "text": ["a b a b a", "x", ""],
        }
    )
    rows = {r["doc_id"]: r for r in textops.doc_repetition(ray.data.from_arrow(t)).take_all()}
    assert rows[0]["n_tokens"] == 5 and rows[0]["n_distinct"] == 2
    assert rows[0]["top_bigram_n"] == 2  # "a b" twice
    assert rows[1] == {"doc_id": 1, "n_tokens": 1, "n_distinct": 1, "top_bigram_n": 0}
    assert rows[2]["n_tokens"] == 0


def test_url_host_stats_rollup(ray_session):
    import ray.data

    t = pa.table(
        {
            "url": [
                "https://a.example/1",
                "https://a.example/2",
                "https://b.example/1",
            ],
            "lang": ["en", "de", "en"],
        }
    )
    rows = {r["host"]: r for r in textops.url_host_stats(ray.data.from_arrow(t)).take_all()}
    assert rows["a.example"]["n_pages"] == 2 and rows["a.example"]["n_langs"] == 2
    assert rows["b.example"]["n_pages"] == 1 and rows["b.example"]["n_langs"] == 1


def test_decontam_flags_overlap(ray_session):
    import ray.data

    # doc 17 hashes into the 2% eval split? Don't assume — instead use a
    # fraction of 0 (no eval docs -> no contamination) and 1.0-epsilon
    # style checks via explicit seeds is flaky; assert structural facts.
    t = pa.table(
        {
            "doc_id": list(range(60)),
            "text": ["common three gram here %d" % i for i in range(60)],
        }
    )
    ds = ray.data.from_arrow(t)
    rows = textops.decontam_ngrams(ds, n=3, eval_fraction=0.5, seed=1).take_all()
    # every doc shares "common three gram" / "three gram here"; with a
    # ~50% eval split, every train doc must be flagged with >= 2 hits
    assert rows, "expected contamination with a shared prefix"
    assert all(r["n_shared_grams"] >= 2 for r in rows)
    # no contamination when the eval split is empty
    assert textops.decontam_ngrams(ds, n=3, eval_fraction=0.0).take_all() == []


def test_quality_filter_rules(ray_session):
    import ray.data

    long_diverse = " ".join("w%d" % i for i in range(30))
    t = pa.table(
        {
            "doc_id": [0, 1, 2],
            "text": [
                long_diverse,          # passes everything
                "a b " * 15,           # 30 tokens but 2 distinct + hot bigram
                "short text",          # under min_tokens
            ],
        }
    )
    rows = textops.quality_filter(ray.data.from_arrow(t)).take_all()
    assert [r["doc_id"] for r in rows] == [0]
    assert rows[0]["n_tokens"] == 30 and rows[0]["n_distinct"] == 30


def test_tfidf_top_terms_closed_form(ray_session):
    import math

    import ray.data

    from georay.textops import tfidf_top_terms

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                ["apple apple banana", "banana cherry", "cherry cherry cherry", ""],
                pa.string(),
            ),
        }
    )
    out = (
        tfidf_top_terms(ray.data.from_arrow(t), k=2)
        .to_pandas()
        .sort_values(["doc_id", "tfidf"], ascending=[True, False])
        .reset_index(drop=True)
    )
    # n_docs=4 (the empty doc counts toward the corpus size);
    # df: apple=1, banana=2, cherry=2
    def s(tf, df):
        return round(tf * math.log(4 / df), 6)

    rows = list(map(tuple, out[["doc_id", "term", "tfidf"]].to_numpy()))
    assert rows == [
        (0, "apple", s(2, 1)),
        (0, "banana", s(1, 2)),
        (1, "banana", s(1, 2)),
        (1, "cherry", s(1, 2)),
        (2, "cherry", s(3, 2)),
    ]


def test_unigram_logprob_closed_form(ray_session):
    import math

    import ray.data

    from georay.textops import unigram_logprob

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["a a b", "b c", ""], pa.string()),
        }
    )
    out = (
        unigram_logprob(ray.data.from_arrow(t))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # counts: a=2, b=2, c=1; total=5
    u = lambda n: math.floor(math.log(n / 5) * 1e6 + 0.5)
    assert out["n_tokens"].tolist() == [3, 2, 0]
    assert out["logprob_unats"].tolist() == [2 * u(2) + u(2), u(2) + u(1), 0]


def test_dup_substring_spans_closed_form(ray_session):
    import ray.data

    from georay.textops import dup_substring_spans

    # L=4: doc0 and doc1 share "abcd"; doc0 repeats "xyxy" at two
    # offsets of itself via "xyxyxy"; doc2 is unique; doc3 too short
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(["abcd xyxyxy", "zabcdz", "qwerty", "ab"], pa.string()),
        }
    )
    out = (
        dup_substring_spans(ray.data.from_arrow(t), L=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # doc0 grams (8): abcd,bcd ,cd x,d xy," xyx","xyxy","yxyx","xyxy"
    #  dup: abcd (doc1), xyxy x2 + yxyx? yxyx occurs once -> not dup
    assert out["n_pos"].tolist() == [8, 3, 3, 0]
    assert out["n_dup"].tolist() == [3, 1, 0, 0]


def test_bigram_logprob_closed_form(ray_session):
    import math

    import ray.data

    from georay.textops import bigram_logprob

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(["a b a b", "a b c", "x", ""], pa.string()),
        }
    )
    out = (
        bigram_logprob(ray.data.from_arrow(t))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # bigram counts: (a,b)=3, (b,a)=1, (b,c)=1; first-word totals: a=3, b=2
    u = lambda n, tot: math.floor(math.log(n / tot) * 1e6 + 0.5)
    assert out["n_bigrams"].tolist() == [3, 2, 0, 0]
    assert out["logprob_unats"].tolist() == [
        2 * u(3, 3) + u(1, 2),  # "a b","b a","a b"
        u(3, 3) + u(1, 2),  # "a b","b c"
        0,
        0,
    ]


def test_pmi_collocations_closed_form(ray_session):
    import math

    import ray.data

    from georay.textops import pmi_collocations

    # "x y" always co-occurs (8 times); fillers break other pairings
    texts = ["x y a%d" % i for i in range(8)] + ["a%d b c" % i for i in range(4)]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    out = (
        pmi_collocations(ray.data.from_arrow(t), k=5, min_count=4)
        .to_pandas()
        .reset_index(drop=True)
    )
    # unigrams: x=8, y=8, b=4, c=4, a0..a7 = 2 or 1...; bigrams with n>=4: "x y"=8, "b c"=4
    n_uni = sum(len(s.split()) for s in texts)
    n_bi = sum(len(s.split()) - 1 for s in texts)
    u = lambda nab, na, nb: math.floor(
        math.log((nab / n_bi) / ((na / n_uni) * (nb / n_uni))) * 1e6 + 0.5
    )
    rows = list(map(tuple, out[["bigram", "n", "pmi_unats"]].to_numpy()))
    assert ("x y", 8, u(8, 8, 8)) in rows and ("b c", 4, u(4, 4, 4)) in rows
    assert len(rows) == 2  # nothing else reaches min_count


def test_normalize_text_and_dedup_normalized(ray_session):
    import pyarrow as pa
    import ray.data

    from georay.textops import dedup_normalized, normalize_text

    texts = [
        "Hello,   World!",
        "hello world",
        "HELLO-world",
        "different doc",
        "",
    ]
    t = pa.table(
        {"doc_id": pa.array(range(5), pa.int64()), "text": pa.array(texts)}
    )
    ds = ray.data.from_arrow(t).repartition(2)
    norm = normalize_text(ds).to_pandas().sort_values("doc_id")
    assert norm["norm_text"].tolist() == [
        "hello world",
        "hello world",
        "hello world",
        "different doc",
        "",
    ]
    # identical norm text -> identical hash
    assert norm["norm_hash"].iloc[0] == norm["norm_hash"].iloc[1] == norm["norm_hash"].iloc[2]

    kept = dedup_normalized(ds).to_pandas().sort_values("doc_id")
    assert kept["doc_id"].tolist() == [0, 3, 4]
    assert kept.set_index("doc_id")["dup_count"].to_dict() == {0: 3, 3: 1, 4: 1}


def test_bm25_topk(ray_session):
    import math

    import pyarrow as pa
    import ray.data

    from georay.textops import bm25_topk

    texts = [
        "hash join hash hash",          # heavy on both terms
        "join vector scan",             # one of each
        "scan filter sort",             # no query terms
        "hash",                         # short doc, one term
        "",                             # empty -> excluded from corpus stats
    ]
    t = pa.table(
        {"doc_id": pa.array(range(5), pa.int64()), "text": pa.array(texts)}
    )
    out = bm25_topk(
        ray.data.from_arrow(t).repartition(2), ("hash", "join"), k=3
    ).to_pandas()

    # plain-python BM25 reference with the same micro quantization
    def ref():
        docs = [(i, tx.split()) for i, tx in enumerate(texts) if tx.strip()]
        n = len(docs)
        avgdl = sum(len(w) for _, w in docs) / n
        scores = []
        for i, w in docs:
            total = 0
            for term in ("hash", "join"):
                tf = w.count(term)
                if tf == 0:
                    continue
                df = sum(1 for _, ww in docs if term in ww)
                idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
                contrib = idf * ((tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * (len(w) / avgdl))))
                total += math.floor(contrib * 1e6 + 0.5)
            scores.append((i, total))
        scores.sort(key=lambda x: (-x[1], x[0]))
        return scores[:3]

    exp = ref()
    got = list(zip(out["doc_id"], out["bm25_micro"]))
    assert got == exp
    assert out["rnk"].tolist() == [1, 2, 3]


def test_doc_entropy(ray_session):
    import math

    import pyarrow as pa
    import ray.data

    from georay.textops import doc_entropy

    texts = ["a a a a", "a b c d", "a a b b", ""]
    t = pa.table(
        {"doc_id": pa.array(range(4), pa.int64()), "text": pa.array(texts)}
    )
    out = (
        doc_entropy(ray.data.from_arrow(t).repartition(2))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["n_tokens"].tolist() == [4, 4, 4, 0]
    # constant doc -> 0; uniform 4 types -> ln(4); 2x2 -> ln(2)
    def q(terms):
        return sum(math.floor(x * 1e6 + 0.5) for x in terms)

    assert out["entropy_micro"].tolist() == [
        0,
        q([0.25 * math.log(4.0)] * 4),
        q([0.5 * math.log(2.0)] * 2),
        0,
    ]
    # diversity ordering: uniform > half-half > constant
    e = out["entropy_micro"]
    assert e[1] > e[2] > e[0] == 0


def test_boilerplate_segments_closed_form(ray_session):
    """4-token segments; 'a b c d' appears in 3 distinct docs (boiler at
    min_df=3), 'e f g h' in 2 (not boiler); within-doc multiplicity
    counts in n_boiler; a doc with no boiler segments scores 0."""
    import pyarrow as pa
    import ray.data

    from georay.textops import boilerplate_segments

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "a b c d e f g h",          # 1 boiler of 2 segs
                    "a b c d a b c d",          # 2 boiler of 2 segs (multiplicity)
                    "a b c d x y z w",          # 1 boiler of 2 segs
                    "e f g h p q r s",          # df(e f g h)=2 -> 0 boiler
                ]
            ),
        }
    )
    out = (
        boilerplate_segments(
            ray.data.from_arrow(docs).repartition(3), window=4, min_df=3
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["n_segs"].tolist() == [2, 2, 2, 2]
    assert out["n_boiler"].tolist() == [1, 2, 1, 0]
    assert out["boiler_ratio_micro"].tolist() == [500000, 1000000, 500000, 0]


def test_vocab_ids_closed_form(ray_session):
    """Ids are contiguous in (count desc, word asc) order; V caps."""
    import pyarrow as pa
    import ray.data

    from georay.textops import vocab_ids

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["b a a c", "a b z"]),
        }
    )
    out = vocab_ids(ray.data.from_arrow(docs).repartition(2), vocab_size=3)
    assert out["word"].to_pylist() == ["a", "b", "c"]  # a:3, b:2, then c/z tie -> c
    assert out["token_id"].to_pylist() == [0, 1, 2]
    assert out["n"].to_pylist() == [3, 2, 1]


def test_curate_corpus_invariants(ray_session):
    """Filter gates, dedup keeps min doc_id, offsets are prefix sums."""
    import numpy as np
    import ray.data

    from georay.textops import curate_corpus

    body = " ".join(f"w{i}" for i in range(30))  # 30 distinct tokens
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                [body, body, "too short", body + " extra"], pa.string()
            ),
        }
    )
    out = (
        curate_corpus(ray.data.from_arrow(t), budget=32)
        .to_pandas()
        .sort_values("rnk")
        .reset_index(drop=True)
    )
    # doc2 fails min_tokens; doc1 is a normalized dup of doc0 (min kept)
    assert out["doc_id"].tolist() == [0, 3]
    assert out["dup_count"].tolist() == [2, 1]
    assert out["n_tokens"].tolist() == [30, 31]
    assert out["start_offset"].tolist() == [0, 30]
    assert out["shard_id"].tolist() == [0, 0]

    # empty survivor set keeps the schema
    t2 = pa.table(
        {
            "doc_id": pa.array([0], pa.int64()),
            "text": pa.array(["tiny"], pa.string()),
        }
    )
    out2 = curate_corpus(ray.data.from_arrow(t2)).to_pandas()
    assert len(out2) == 0


def test_dup_substring_spans_random_reference(ray_session):
    """Vectorized gram/hash pipeline vs a brute python dict over random
    low-alphabet strings (high collision pressure on the gram space)."""
    import numpy as np
    import ray.data

    from georay.textops import dup_substring_spans

    rng = np.random.default_rng(99)
    L = 5
    texts = [
        "".join(rng.choice(list("abc "), size=int(rng.integers(0, 40))))
        for _ in range(60)
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(60), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    out = (
        dup_substring_spans(ray.data.from_arrow(t).repartition(7), L=L)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    from collections import Counter

    gram_total = Counter()
    per_doc = []
    for tx in texts:
        grams = [tx[p : p + L] for p in range(max(0, len(tx) - L + 1))]
        per_doc.append(grams)
        gram_total.update(grams)
    for i, grams in enumerate(per_doc):
        n_dup = sum(1 for g in grams if gram_total[g] > 1)
        assert out["n_pos"][i] == len(grams)
        assert out["n_dup"][i] == n_dup


def test_url_bpe_tokens_closed_form(ray_session):
    """Byte-class span tokenizer vs a regex reference; category labels."""
    import re

    import ray.data

    from georay.textops import url_bpe_tokens

    urls = ["https://a1.example/x9", "ftp://a1.example/x9", ""]
    t = pa.table({"url": pa.array(urls, pa.string())})
    out = url_bpe_tokens(ray.data.from_arrow(t).repartition(2), k=100).to_pandas()
    from collections import Counter

    want = Counter()
    for u in urls:
        want.update(re.findall(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9]+", u))
    assert dict(zip(out["tok"], out["n"])) == dict(want)
    for _, r in out.iterrows():
        c = "alpha" if r.tok[0].isalpha() else ("num" if r.tok[0].isdigit() else "other")
        assert r.category == c


def test_dataset_split_deterministic_and_balanced(ray_session):
    import ray.data

    from georay.textops import dataset_split

    t = pa.table(
        {
            "doc_id": pa.array(range(4000), pa.int64()),
            "text": pa.array(["x"] * 4000, pa.string()),
        }
    )
    a = dataset_split(ray.data.from_arrow(t).repartition(3)).to_pandas()
    b = dataset_split(ray.data.from_arrow(t).repartition(9)).to_pandas()
    assert a.sort_values("doc_id").split.tolist() == b.sort_values("doc_id").split.tolist()
    frac = a.split.value_counts(normalize=True)
    assert 0.85 < frac.get("train", 0) < 0.95
    assert 0.03 < frac.get("val", 0) < 0.07
    assert 0.03 < frac.get("test", 0) < 0.07


def test_oov_rate(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from georay.textops import oov_rate, tokenize, top_words

    texts = {
        0: "a a a b b c rare1",
        1: "a b c",
        2: "rare2 rare3",
        3: "",
        4: "   ",
        5: "a a a a a a a a",
    }
    t = pa.table(
        {
            "doc_id": pa.array(sorted(texts), pa.int64()),
            "text": pa.array([texts[k] for k in sorted(texts)], pa.string()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(3)
    out = (
        oov_rate(ds, vocab_size=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # vocab (count desc, word asc) = a, b, c
    vocab = {r["word"] for r in top_words(ds, k=3).take_all()}
    assert vocab == {"a", "b", "c"}
    for i, row in out.iterrows():
        toks = tokenize(texts[int(row["doc_id"])])
        n_oov = sum(1 for w in toks if w not in vocab)
        assert row["n_tokens"] == len(toks)
        assert row["n_oov"] == n_oov
        assert row["oov_permille"] == (
            n_oov * 1000 // len(toks) if toks else 0
        )


def test_dsir_weights(ray_session):
    import math

    import numpy as np
    import pyarrow as pa
    import ray.data

    from georay.textops import dsir_weights, tokenize

    docs = [
        (0, "en", "alpha alpha beta"),
        (1, "en", "alpha gamma"),
        (2, "fr", "delta delta delta"),
        (3, "fr", "alpha delta"),
        (4, "en", ""),
    ]
    t = pa.table(
        {
            "doc_id": pa.array([d[0] for d in docs], pa.int64()),
            "lang": pa.array([d[1] for d in docs], pa.string()),
            "text": pa.array([d[2] for d in docs], pa.string()),
        }
    )
    out = (
        dsir_weights(ray.data.from_arrow(t).repartition(3), target_lang="en")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # driver-side replay
    raw, tgt = {}, {}
    for _, lg, tx in docs:
        for w in tokenize(tx):
            raw[w] = raw.get(w, 0) + 1
            if lg == "en":
                tgt[w] = tgt.get(w, 0) + 1
    v = len(raw)
    nr = sum(raw.values())
    nt = sum(tgt.values())
    diff = {
        w: math.floor(math.log((tgt.get(w, 0) + 1.0) / (nt + v)) * 1e6 + 0.5)
        - math.floor(math.log((raw[w] + 1.0) / (nr + v)) * 1e6 + 0.5)
        for w in raw
    }
    for did, _, tx in docs:
        row = out[out["doc_id"] == did].iloc[0]
        toks = tokenize(tx)
        assert row["n_tokens"] == len(toks)
        assert row["w_unats"] == sum(diff[w] for w in toks)
    # the English-only docs must score above the French-only one
    w = dict(zip(out["doc_id"], out["w_unats"]))
    assert w[0] > w[2] and w[1] > w[2]


def test_heavy_hitters_exact_threshold(ray_session):
    import ray.data

    # 20 'a', 6 'b', 5 'c', 4 'd' (total 35). k=6: n*6 > 35 -> a (120),
    # b (36); c (30) and d (24) miss.
    t = pa.table(
        {
            "doc_id": [0, 1, 2],
            "text": ["a " * 20, "b " * 6 + "c " * 5, "d " * 4],
        }
    )
    rows = textops.heavy_hitters(ray.data.from_arrow(t), k=6).take_all()
    assert [(r["word"], r["n"]) for r in rows] == [("a", 20), ("b", 6)]


def test_heavy_hitters_mg_compression_superset(ray_session):
    import ray.data
    import numpy as np

    # Vocabulary (60 distinct) far exceeds k=5, forcing the Misra-Gries
    # decrement at every fan-in; the one true heavy hitter must survive.
    rng = np.random.default_rng(7)
    texts = []
    for i in range(400):
        tail = " ".join(f"w{rng.integers(0, 60)}" for _ in range(3))
        texts.append(("alpha " * 10) + tail)
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(400), pa.int64()), "text": texts})
    ).repartition(8)
    rows = textops.heavy_hitters(ds, k=5).take_all()
    # alpha: 4000 of 5200 tokens; every w*: ~20 <= 5200/5.
    assert [(r["word"], r["n"]) for r in rows] == [("alpha", 4000)]


def test_heavy_hitters_empty(ray_session):
    import ray.data

    t = pa.table({"doc_id": [0], "text": ["   "]})
    assert textops.heavy_hitters(ray.data.from_arrow(t), k=3).take_all() == []


def test_quality_logreg_matches_brute(ray_session):
    import hashlib
    import ray.data

    texts = ["hash join vector", "scan scan scan filter", "", "   ", "solo"]
    t = pa.table({"doc_id": pa.array(range(5), pa.int64()), "text": texts})
    rows = {
        r["doc_id"]: r
        for r in textops.quality_logreg(ray.data.from_arrow(t)).take_all()
    }

    def w(tok):
        h = int.from_bytes(hashlib.sha256(tok.encode()).digest()[:8], "big")
        return (h % 2001) - 1000

    for i, txt in enumerate(texts):
        toks = txt.split()
        score = sum(w(x) for x in toks)
        assert rows[i]["n_tokens"] == len(toks)
        assert rows[i]["score"] == score
        assert rows[i]["label"] == (1 if score > 0 else 0)


def test_rrf_fusion_math(ray_session):
    import ray.data

    # doc 0 matches both rankers; construct a corpus where doc 0 is
    # lexically best for 'hash' AND embedding-nearest to query vec 9.
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": ["hash hash hash", "hash join", "scan filter"],
        }
    )
    emb = pa.table(
        {
            "vec_id": pa.array([0, 1, 2, 9], pa.int64()),
            "embedding": pa.array(
                [[1.0, 0.0], [0.0, 1.0], [0.7, 0.7], [0.99, 0.1]],
                pa.list_(pa.float32()),
            ),
            "label": pa.array([0, 0, 0, 0], pa.int64()),
        }
    )
    rows = textops.rrf_fusion(
        ray.data.from_arrow(docs),
        ray.data.from_arrow(emb),
        ("hash", "join", "vector"),
        query_id=9,
        k=2,
        c=60,
    ).take_all()
    by_id = {r["doc_id"]: r for r in rows}
    # lexical: doc1 rnk1 (matches the rarer 'join'), doc0 rnk2;
    # dense (query 9): vec0 rank 1, vec2 rank 2 (1-based contributions)
    b = 10**9
    assert by_id[0]["rrf_nano"] == b // 62 + b // 61
    assert by_id[1]["rrf_nano"] == b // 61
    assert by_id[2]["rrf_nano"] == b // 62
    # doc0 is the only doc on BOTH lists -> fused winner
    assert rows[0]["doc_id"] == 0 and rows[0]["rnk"] == 1
    assert [r["doc_id"] for r in rows[1:]] == [1, 2]


def test_kwic_snippets_edges(ray_session):
    import ray.data

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "text": [
                "vector at the very start of this line padded out",
                "a match of vector in the middle here padded padded",
                "this one ends exactly with the word vector",
                "no match in this document at all",
                "vector vector twice but only the first one counts",
            ],
        }
    )
    rows = {
        r["doc_id"]: r
        for r in textops.kwic_snippets(
            ray.data.from_arrow(t), term="vector", window=5
        ).take_all()
    }
    assert 3 not in rows
    assert rows[0]["pos"] == 0 and rows[0]["snippet"] == "vector at t"
    assert rows[1]["pos"] == 11 and rows[1]["snippet"] == "h of vector in t"
    assert rows[2]["pos"] == 36 and rows[2]["snippet"] == "word vector"
    assert rows[4]["pos"] == 0 and rows[4]["snippet"] == "vector vect"


def test_temperature_mix_sqrt_weights(ray_session):
    import ray.data

    # counts 16, 4, 4 -> sqrt 4, 2, 2 -> weights 1/2, 1/4, 1/4
    t = pa.table(
        {
            "doc_id": pa.array(range(24), pa.int64()),
            "source": ["a"] * 16 + ["b"] * 4 + ["c"] * 4,
        }
    )
    rows = textops.temperature_mix(ray.data.from_arrow(t)).take_all()
    assert [(r["source"], r["n_docs"], r["num_micro"], r["weight_ppm"]) for r in rows] == [
        ("a", 16, 4_000_000, 500_000),
        ("b", 4, 2_000_000, 250_000),
        ("c", 4, 2_000_000, 250_000),
    ]


def test_hash_features_signed_counts(ray_session):
    import hashlib

    import numpy as np
    import ray.data

    texts = ["hash join join", "", "vector"]
    t = pa.table({"doc_id": pa.array(range(3), pa.int64()), "text": texts})
    rows = textops.hash_features(ray.data.from_arrow(t), n_dims=8).take_all()

    def cell(tok):
        h = int.from_bytes(hashlib.sha256(tok.encode()).digest()[:8], "big")
        return h % 8, 1 if (h >> 32) & 1 else -1

    exp = {}
    for d, tok in [(0, "hash"), (0, "join"), (0, "join"), (2, "vector")]:
        dim, s = cell(tok)
        exp[(d, dim)] = exp.get((d, dim), 0) + s
    exp = {k: v for k, v in exp.items() if v != 0}
    got = {(r["doc_id"], r["dim"]): r["val"] for r in rows}
    assert got == exp


def test_simhash_near_dups_matches_bruteforce(ray_session):
    import numpy as np
    import ray.data

    # identical docs (hamming 0), a one-word tweak (small hamming),
    # and unrelated texts; brute-force over simhash_table is the oracle
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat",
        "completely different subject matter entirely here",
        "numbers one two three four five six seven eight",
        "the quick brown fox jumps over the lazy dog",
    ]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts})
    ds = ray.data.from_arrow(t)

    sig = {r["doc_id"]: r["simhash"] for r in textops.simhash_table(ds).take_all()}
    ids = sorted(sig)
    radius = 3
    expect = {}
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            h = bin((sig[ids[i]] ^ sig[ids[j]]) & (2**64 - 1)).count("1")
            if h <= radius:
                expect[(ids[i], ids[j])] = h
    assert (0, 1) in expect and (0, 5) in expect and (1, 5) in expect

    rows = textops.simhash_near_dups(ds, radius=radius).take_all()
    got = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in rows}
    assert got == expect
    assert len(rows) == len(got)  # each pair emitted exactly once


def test_linreg_train_partition_invariant_and_learns(ray_session):
    import numpy as np
    """Exact-integer GD: the trajectory must not depend on block layout
    (int sums are order-free), and 5 rounds must beat the zero model."""
    import pyarrow as pa

    import ray.data
    from georay.textops import linreg_train

    rng = np.random.default_rng(41)
    words = ["ant", "bee", "cat", "dog", "elk", "fox", "gnu", "hen"]
    texts = [
        " ".join(rng.choice(words, size=int(rng.integers(3, 60))))
        for _ in range(120)
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )

    def run(blocks):
        ds = ray.data.from_arrow(t).repartition(blocks)
        df = linreg_train(ds, n_rounds=5).to_pandas().sort_values("doc_id")
        return list(zip(df["doc_id"], df["pred_nano"], df["resid_nano"]))

    r3 = run(3)
    assert r3 == run(7)
    resid = np.array([r[2] for r in r3], dtype=np.float64)
    # zero model residual = -y_nano; with lr=2^-16 and this corpus's
    # tiny Hessian, 5 rounds move ~9%/round toward the optimum —
    # require a clear (>20%) SSE cut; exactness is the oracle's job
    y = np.array([r[1] for r in r3], dtype=np.float64) - resid
    assert (resid**2).sum() < 0.8 * (y**2).sum()


def test_greedy_coverage_matches_sequential(ray_session):
    """Distributed per-block top-1 + fan-in must replay the sequential
    greedy max-coverage trajectory (marginal distinct-shingle gain,
    ties to lowest doc_id, selected docs excluded)."""
    import pyarrow as pa

    import ray.data
    from georay.textops import greedy_coverage, word_shingles

    texts = {
        0: "a b c d e f",          # 5 bigrams
        1: "a b c d e f g h",      # superset of 0: 7 bigrams
        2: "x y z w",              # disjoint: 3 bigrams
        3: "a b c x y",            # overlaps both
        4: "",                     # no shingles: never a candidate
        5: "x y z w",              # duplicate of 2
    }
    sets = {
        i: set(int(x) for x in word_shingles(t))
        for i, t in texts.items()
        if len(word_shingles(t))
    }
    covered, sel, want = set(), set(), []
    for r in range(4):
        cands = [
            (-len(s - covered), i) for i, s in sets.items() if i not in sel
        ]
        cands.sort()
        g, i = cands[0]
        want.append((r, i, -g))
        sel.add(i)
        covered |= sets[i]

    t = pa.table(
        {
            "doc_id": pa.array(list(texts), pa.int64()),
            "text": pa.array(list(texts.values()), pa.string()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(3)
    got_t = greedy_coverage(ds, k=4)
    got = list(
        zip(
            got_t["sel_rank"].to_pylist(),
            got_t["doc_id"].to_pylist(),
            got_t["gain"].to_pylist(),
        )
    )
    assert got == want
    # sanity on the known corpus: doc 1 first (7 bigrams), then the
    # disjoint doc 2 (3 new), and duplicates/subsets add nothing
    assert got[0][1] == 1 and got[1][1] == 2


def test_seeded_shuffle_is_deterministic_permutation(ray_session):
    import numpy as np
    import pyarrow as pa

    import ray.data
    from georay.textops import seeded_shuffle

    t = pa.table(
        {
            "doc_id": pa.array(range(200), pa.int64()),
            "text": pa.array(["x"] * 200, pa.string()),
        }
    )

    def run(blocks, seed):
        ds = ray.data.from_arrow(t).repartition(blocks)
        df = seeded_shuffle(ds, seed=seed).to_pandas().sort_values("doc_id")
        return df["shuffle_pos"].to_numpy()

    a = run(3, seed=42)
    # a permutation of 1..n, identical under a different block layout
    assert sorted(a) == list(range(1, 201))
    assert np.array_equal(a, run(9, seed=42))
    # a different seed gives a different order
    assert not np.array_equal(a, run(3, seed=7))


def test_ngram_novelty_closed_form(ray_session):
    import pyarrow as pa

    import ray.data
    from georay.textops import ngram_novelty

    texts = {
        0: "a b c d",        # bigrams: ab bc cd
        1: "a b x y",        # ab xy? -> "a b","b x","x y"
        2: "q r",            # "q r" unique
        3: "",               # no shingles: zeros
        4: "solo",           # single token: zeros
    }
    t = pa.table(
        {
            "doc_id": pa.array(sorted(texts), pa.int64()),
            "text": pa.array([texts[k] for k in sorted(texts)], pa.string()),
        }
    )
    out = (
        ngram_novelty(ray.data.from_arrow(t).repartition(3))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    rows = {
        r.doc_id: (r.n_shingles, r.n_unique, r.novelty_permille)
        for r in out.itertuples()
    }
    # doc0: "a b" shared with doc1; "b c","c d" unique -> 2/3
    assert rows[0] == (3, 2, 666)
    assert rows[1] == (3, 2, 666)
    assert rows[2] == (1, 1, 1000)
    assert rows[3] == (0, 0, 0)
    assert rows[4] == (0, 0, 0)


def test_grouped_heavy_hitters(ray_session):
    """Per-group threshold semantics against a brute-force reference;
    the MG fold must surface every in-group phi-frequent token even
    with many partial folds (partition invariance)."""
    import collections

    import ray.data

    from georay.textops import grouped_heavy_hitters

    docs = []
    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(40)]
    for i in range(60):
        grp = "en" if i % 3 else "de"
        words = ["hot"] * 5 + list(rng.choice(vocab, size=10))
        if grp == "de":
            words += ["der"] * 8
        docs.append({"doc_id": i, "lang": grp, "text": " ".join(words)})
    k = 10
    counts = collections.defaultdict(collections.Counter)
    for d in docs:
        counts[d["lang"]].update(d["text"].split())
    want = sorted(
        (g, w, n)
        for g, c in counts.items()
        for w, n in c.items()
        if n * k > sum(c.values())
    )
    t = pa.table(
        {
            "doc_id": pa.array([d["doc_id"] for d in docs], pa.int64()),
            "lang": pa.array([d["lang"] for d in docs]),
            "text": pa.array([d["text"] for d in docs]),
        }
    )
    for blocks in (2, 13):
        got = grouped_heavy_hitters(
            ray.data.from_arrow(t).repartition(blocks), "lang", k=k
        ).to_pandas()
        assert sorted(zip(got["lang"], got["word"], got["n"])) == want


def test_keep_first_shingles_golden(ray_session):
    import pyarrow as pa

    import ray.data
    from georay.textops import keep_first_shingles

    texts = {
        0: "a b c a b",      # positions: "a b"(0) "b c"(1) "c a"(2) "a b"(3)
        1: "a b x y",        # "a b"(0) "b x"(1) "x y"(2)
        2: "",               # zeros
        3: "solo",           # zeros
    }
    t = pa.table(
        {
            "doc_id": pa.array(sorted(texts), pa.int64()),
            "text": pa.array([texts[k] for k in sorted(texts)], pa.string()),
        }
    )
    out = (
        keep_first_shingles(ray.data.from_arrow(t).repartition(3))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    rows = {
        r.doc_id: (r.n_shingles, r.n_kept, r.kept_permille)
        for r in out.itertuples()
    }
    # doc0 owns the first occurrence of "a b" (pos 0); its repeat at
    # pos 3 is dropped -> kept 3 of 4; doc1's "a b" loses to doc0 but
    # "b x","x y" are first -> 2 of 3
    assert rows[0] == (4, 3, 750)
    assert rows[1] == (3, 2, 666)
    assert rows[2] == (0, 0, 0)
    assert rows[3] == (0, 0, 0)
    # every distinct shingle keeps exactly one copy corpus-wide
    assert sum(k for _, k, _ in rows.values()) == 5
