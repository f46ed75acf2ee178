"""Round-5 operators: band join (price_band_pairs) and split-drift
(term_drift) — goldens with hand-checkable inputs plus a brute-force
cross-check, including the band-boundary and strict-epsilon edges."""

import collections
import itertools

import numpy as np
import pyarrow as pa
import pytest


def _orders(tmp_path, prices):
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "o_orderkey": pa.array(range(1, len(prices) + 1), pa.int64()),
            "o_custkey": pa.array([1] * len(prices), pa.int64()),
            "o_orderstatus": pa.array(["O"] * len(prices)),
            "o_totalprice": pa.array(prices, pa.float64()),
            "o_orderdate": pa.array([0] * len(prices), pa.timestamp("us")),
            "o_orderpriority": pa.array(["5-LOW"] * len(prices)),
        }
    )
    pq.write_table(t, str(tmp_path / "orders.parquet"))
    return str(tmp_path)


def _pairs(ds):
    return {
        (r["key_lo"], r["key_hi"], r["diff_micro"]) for r in ds.take_all()
    }


def test_band_join_boundary_and_strictness(ray_session, tmp_path):
    from georay.relational import price_band_pairs

    # eps = 2.0 -> bands [0,2), [2,4), ...
    # keys:      1    2    3    4    5     6
    prices = [1.9, 3.7, 1.0, 3.0, 3.7, 100.0]
    sf = _orders(tmp_path, prices)
    got = _pairs(price_band_pairs(sf))
    assert got == {
        (1, 2, 1_800_000),  # straddles the band boundary (ghost path)
        (2, 4, 700_000),
        (1, 4, 1_100_000),  # also straddles the boundary
        (2, 5, 0),  # exact-equal values pair exactly once
        (1, 5, 1_800_000),  # key 5 duplicates key 2's price
        (4, 5, 700_000),
        # (1,3) diff 0.9 -> included
        (1, 3, 900_000),
        # (3,4) diff exactly 2.0 -> EXCLUDED (strict <)
    } | {(1, 3, 900_000)}
    assert (3, 4, 2_000_000) not in got


def test_band_join_matches_bruteforce(ray_session, tmp_path):
    from georay.relational import price_band_pairs

    rng = np.random.default_rng(17)
    prices = np.round(rng.uniform(0.0, 40.0, 300), 2).tolist()
    sf = _orders(tmp_path, prices)
    got = _pairs(price_band_pairs(sf))
    v = np.rint(np.asarray(prices) * 1e6).astype(np.int64)
    want = set()
    for i, j in itertools.combinations(range(len(prices)), 2):
        d = abs(int(v[i]) - int(v[j]))
        if d < 2_000_000:
            want.add((i + 1, j + 1, d))
    assert got == want


def test_band_join_empty_and_singleton(ray_session, tmp_path):
    from georay.relational import price_band_pairs

    sf = _orders(tmp_path, [5.0])
    assert price_band_pairs(sf).count() == 0


def test_term_drift_exact_formula(ray_session, tmp_path):
    import pyarrow.parquet as pq

    import ray.data
    from georay.textops import term_drift

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "cat cat cat dog",  # even split
                    "cat dog dog dog",  # odd split
                    "cat cat bird",  # even
                    "dog",  # odd
                ]
            ),
            "lang": pa.array(["en"] * 4),
            "source": pa.array(["s"] * 4),
            "n_chars": pa.array([1] * 4, pa.int64()),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    ds = ray.data.read_parquet(str(tmp_path / "documents.parquet"))
    rows = {r["term"]: r for r in term_drift(ds, min_count=2).take_all()}
    # split A (even doc_id): cat*5 dog*1 bird*1 -> na=7
    # split B (odd doc_id):  cat*1 dog*4        -> nb=5
    # vocab v=3
    assert rows["cat"]["cnt_a"] == 5 and rows["cat"]["cnt_b"] == 1
    assert rows["dog"]["cnt_a"] == 1 and rows["dog"]["cnt_b"] == 4
    na, nb, v = 7, 5, 3
    for term in ("cat", "dog"):
        ca, cb = rows[term]["cnt_a"], rows[term]["cnt_b"]
        want = ((ca + 1) * 1_000_000 * (nb + v)) // ((cb + 1) * (na + v))
        assert rows[term]["drift_micro"] == want
    # bird: cnt 1 < min_count 2 -> filtered out
    assert "bird" not in rows


def test_term_drift_partition_invariance(ray_session):
    import ray.data
    from georay.textops import term_drift

    ds = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet")
    a = sorted(
        (r["term"], r["drift_micro"]) for r in term_drift(ds).take_all()
    )
    b = sorted(
        (r["term"], r["drift_micro"])
        for r in term_drift(ds.repartition(7)).take_all()
    )
    assert a == b and len(a) > 0


def test_monotone_chain_matches_bruteforce():
    from georay.spatial.measure import _monotone_chain

    rng = np.random.default_rng(3)
    for trial in range(5):
        pts = rng.uniform(-10, 10, (60, 2)).round(3)
        hull = _monotone_chain(pts)
        hv = {tuple(p) for p in hull}
        # brute force: a point is a hull VERTEX iff some half-plane
        # through it keeps all other points strictly on one side
        # (extreme point). Checked via: p is extreme iff it is NOT in
        # the convex hull of the others — approximated by the support
        # test over all direction pairs.
        def is_extreme(i):
            p = pts[i]
            others = np.delete(pts, i, axis=0)
            # p extreme iff exists direction d with p.d > max(others.d)
            dirs = others - p  # candidate separating normals
            for a in range(0, 360, 1):
                d = np.array([np.cos(np.radians(a)), np.sin(np.radians(a))])
                if (others @ d).max() < p @ d - 1e-9:
                    return True
            return False

        brute = {tuple(pts[i]) for i in range(len(pts)) if is_extreme(i)}
        assert hv == brute, f"trial {trial}"
        # hull area >= bbox of hull points/2 sanity + contains all pts
        x, y = hull[:, 0], hull[:, 1]
        area = 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))
        assert area > 0


def test_monotone_chain_collinear_and_degenerate():
    from georay.spatial.measure import _monotone_chain

    # all collinear -> 2 endpoints
    pts = np.array([[0.0, 0.0], [1.0, 1.0], [2.0, 2.0], [3.0, 3.0]])
    h = _monotone_chain(pts)
    assert len(h) == 2
    # square with collinear mid-edge points and duplicates -> 4 corners
    sq = np.array(
        [
            [0, 0], [1, 0], [2, 0], [2, 1], [2, 2],
            [1, 2], [0, 2], [0, 1], [0, 0], [1, 0],
        ],
        dtype=np.float64,
    )
    h = _monotone_chain(sq)
    assert len(h) == 4
    assert {tuple(p) for p in h} == {(0, 0), (2, 0), (2, 2), (0, 2)}


def test_polygon_hulls_hole_ring_ignored(ray_session):
    import ray.data
    from georay.geometry import wkb_encode
    from georay.spatial.measure import polygon_hulls

    import json as _json

    outer = [[0.0, 0.0], [4.0, 0.0], [4.0, 2.0], [0.0, 2.0], [0.0, 0.0]]
    hole = [[1.0, 0.5], [2.0, 0.5], [2.0, 1.5], [1.0, 1.5], [1.0, 0.5]]
    t = pa.table(
        {
            "wkb": pa.array([wkb_encode("polygon", [outer, hole])]),
            "geom_type": pa.array(["polygon"]),
            "props_json": pa.array([_json.dumps([7])]),
            "cols_json": pa.array([_json.dumps([["the_geom", "polygon_id"], ["geometry", "number"]])]),
        }
    )
    rows = polygon_hulls(ray.data.from_arrow(t)).take_all()
    assert len(rows) == 1
    r = rows[0]
    assert r["polygon_id"] == 7 and r["hull_nv"] == 4
    assert r["hull_area_q"] == int(8.0 * 1e10)  # hole never subtracts


def test_key_skew_profile_exact_gini(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from georay.relational import key_skew_profile

    # users 1..4 with counts 1, 1, 2, 6 (skewed)
    uids = [1] + [2] + [3] * 2 + [4] * 6
    t = pa.table(
        {
            "event_id": pa.array(range(len(uids)), pa.int64()),
            "ts": pa.array(range(len(uids)), pa.timestamp("us")),
            "user_id": pa.array(uids, pa.int64()),
            "event_type": pa.array(["a"] * len(uids)),
            "value": pa.array([0.0] * len(uids)),
            "props": pa.array([""] * len(uids)),
        }
    )
    pq.write_table(t, f"{tmp_path}/events.parquet")
    row = key_skew_profile(str(tmp_path)).to_pylist()[0]
    # sorted counts asc: [1,1,2,6]; n=4, s0=10, s1=1*1+2*1+3*2+4*6=33
    assert row["n_keys"] == 4 and row["n_rows"] == 10 and row["cnt_max"] == 6
    # p50 rank = (4-1)*50//100+1 = 2 -> cnt 1; p90 rank = 3 -> cnt 2
    assert row["cnt_p50"] == 1 and row["cnt_p90"] == 2
    assert row["gini_micro"] == (1_000_000 * (2 * 33 - 5 * 10)) // (4 * 10)


def test_join_size_estimate_golden(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from georay.relational import join_size_estimate

    orders = pa.table(
        {
            "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
            "o_custkey": pa.array([10, 10, 20, 30], pa.int64()),
            "o_orderstatus": pa.array(["O"] * 4),
            "o_totalprice": pa.array([1.0] * 4),
            "o_orderdate": pa.array([0] * 4, pa.timestamp("us")),
            "o_orderpriority": pa.array(["5-LOW"] * 4),
        }
    )
    events = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "ts": pa.array([0] * 5, pa.timestamp("us")),
            "user_id": pa.array([10, 10, 10, 20, 99], pa.int64()),
            "event_type": pa.array(["a"] * 5),
            "value": pa.array([0.0] * 5),
            "props": pa.array([""] * 5),
        }
    )
    pq.write_table(orders, f"{tmp_path}/orders.parquet")
    pq.write_table(events, f"{tmp_path}/events.parquet")
    row = join_size_estimate(str(tmp_path)).to_pylist()[0]
    # key 10: 2x3=6; key 20: 1x1=1; 30 and 99 one-sided
    assert row == {
        "n_keys_a": 3,
        "n_keys_b": 3,
        "n_keys_shared": 2,
        "join_rows": 7,
        "max_key_rows": 6,
    }


def _write_events(tmp_path, user_ids, days, types, values):
    import pyarrow.parquet as pq

    n = len(user_ids)
    t = pa.table(
        {
            "event_id": pa.array(list(range(1, n + 1)), pa.int64()),
            "ts": pa.array(
                [d * 86_400_000_000 + 1 for d in days], pa.timestamp("us")
            ),
            "user_id": pa.array(user_ids, pa.int64()),
            "event_type": pa.array(types, pa.string()),
            "value": pa.array(values, pa.float64()),
            "props": pa.array([""] * n, pa.string()),
        }
    )
    pq.write_table(t, f"{tmp_path}/events.parquet")


def test_top_users_by_active_days_golden(ray_session, tmp_path):
    from georay.relational import top_users_by_active_days

    # user 1: type a on days 0,1,2 (3 distinct, one day repeated);
    # user 2: type a on days 0,0 (1 distinct); user 3: type a day 5
    # (1 distinct, ties with user 2 -> user 2 first by id);
    # user 1: type b day 0
    _write_events(
        tmp_path,
        user_ids=[1, 1, 1, 1, 2, 2, 3, 1],
        days=[0, 1, 2, 2, 0, 0, 5, 0],
        types=["a"] * 7 + ["b"],
        values=[1.0] * 8,
    )
    rows = sorted(
        top_users_by_active_days(str(tmp_path), k=2).take_all(),
        key=lambda r: (r["event_type"], r["rnk"]),
    )
    assert rows == [
        {"event_type": "a", "rnk": 1, "user_id": 1, "n_days": 3},
        {"event_type": "a", "rnk": 2, "user_id": 2, "n_days": 1},
        {"event_type": "b", "rnk": 1, "user_id": 1, "n_days": 1},
    ]


def test_value_concentration_golden(ray_session, tmp_path):
    from georay.relational import value_concentration

    # type a: user sums 1->30.0, 2->10.0, 3->5.0, 4->5.0; top-2 = 40.0
    # of 50.0 -> share 800000; type b: one user, share 1000000
    _write_events(
        tmp_path,
        user_ids=[1, 1, 2, 3, 4, 9],
        days=[0, 1, 0, 0, 0, 0],
        types=["a", "a", "a", "a", "a", "b"],
        values=[10.0, 20.0, 10.0, 5.0, 5.0, 7.5],
    )
    rows = sorted(
        value_concentration(str(tmp_path), k=2).take_all(),
        key=lambda r: r["event_type"],
    )
    assert rows == [
        {
            "event_type": "a",
            "total_micro": 50_000_000,
            "topk_micro": 40_000_000,
            "share_micro": 800_000,
        },
        {
            "event_type": "b",
            "total_micro": 7_500_000,
            "topk_micro": 7_500_000,
            "share_micro": 1_000_000,
        },
    ]


def test_salted_join_sample_brute_parity(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from georay.relational import salted_join_sample, _SJS_A, _SJS_B, _SJS_MOD

    rng = np.random.default_rng(7)
    n_ev, n_od = 400, 120
    # user 5 is deliberately hot on both sides
    ev_user = np.r_[np.full(200, 5), rng.integers(0, 20, n_ev - 200)].astype(np.int64)
    ev_type = np.array(["a", "b", "c"])[rng.integers(0, 3, n_ev)]
    ev_id = np.arange(1, n_ev + 1, dtype=np.int64) * 13
    od_cust = np.r_[np.full(40, 5), rng.integers(0, 20, n_od - 40)].astype(np.int64)
    od_key = np.arange(1, n_od + 1, dtype=np.int64) * 7
    od_price = np.round(rng.uniform(10, 5000, n_od), 2)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(ev_id),
                "ts": pa.array([1_000_000] * n_ev, pa.timestamp("us")),
                "user_id": pa.array(ev_user),
                "event_type": pa.array(ev_type, pa.string()),
                "value": pa.array(np.ones(n_ev)),
                "props": pa.array([""] * n_ev, pa.string()),
            }
        ),
        f"{tmp_path}/events.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(od_key),
                "o_custkey": pa.array(od_cust),
                "o_orderstatus": pa.array(["O"] * n_od, pa.string()),
                "o_totalprice": pa.array(od_price),
                "o_orderdate": pa.array([1] * n_od, pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"] * n_od, pa.string()),
            }
        ),
        f"{tmp_path}/orders.parquet",
    )

    # brute force over the full pair space
    import collections

    exp = collections.defaultdict(lambda: [0, 0, 0])
    od_pm = np.rint(od_price * 1e6).astype(np.int64)
    by_cust = collections.defaultdict(list)
    for i in range(n_od):
        by_cust[int(od_cust[i])].append(i)
    for j in range(n_ev):
        for i in by_cust.get(int(ev_user[j]), []):
            e = exp[ev_type[j]]
            e[0] += 1
            if (int(ev_id[j]) * _SJS_A + int(od_key[i]) * _SJS_B) % _SJS_MOD < 125:
                e[1] += 1
                e[2] += int(od_pm[i])

    got = {
        r["event_type"]: (r["n_pairs"], r["n_sampled"], r["sampled_price_micro"])
        for r in salted_join_sample(str(tmp_path), hot_threshold=50, n_salts=3).take_all()
    }
    assert got == {k: tuple(v) for k, v in exp.items()}
    # hot path off (threshold huge) gives identical results
    got_cold = {
        r["event_type"]: (r["n_pairs"], r["n_sampled"], r["sampled_price_micro"])
        for r in salted_join_sample(str(tmp_path), hot_threshold=10**9).take_all()
    }
    assert got_cold == got


def test_moss_pairs_brute_parity(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import ray.data

    from georay.textops import moss_pairs, winnow_fingerprints

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(30)]
    texts = []
    # seeded clones: docs 0/1/2 share a long passage; 3/4 share another
    base = " ".join(rng.choice(vocab, 40))
    other = " ".join(rng.choice(vocab, 35))
    texts.append(base + " alpha beta")
    texts.append("gamma " + base)
    texts.append(base)
    texts.append(other + " delta")
    texts.append("eps " + other)
    for _ in range(15):
        texts.append(" ".join(rng.choice(vocab, 25)))
    n = len(texts)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * n, pa.string()),
                "source": pa.array(["s"] * n, pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        f"{tmp_path}/documents.parquet",
    )

    max_df, min_shared = 50, 2
    fps = {i: set(winnow_fingerprints(t)) for i, t in enumerate(texts)}
    df = collections.Counter(f for s in fps.values() for f in s)
    live = {f for f, c in df.items() if c <= max_df}
    exp = {}
    for a, b in itertools.combinations(range(n), 2):
        c = len(fps[a] & fps[b] & live)
        if c >= min_shared:
            exp[(a, b)] = c

    docs = ray.data.read_parquet(f"{tmp_path}/documents.parquet")
    got = {
        (r["doc_a"], r["doc_b"]): r["n_shared"]
        for r in moss_pairs(docs, min_shared=min_shared, max_df=max_df).take_all()
    }
    assert got == exp
    assert (0, 1) in got and (0, 2) in got and (3, 4) in got

    # the df filter is load-bearing: max_df=2 kills fingerprints shared
    # by all three clones but keeps the 2-doc passage
    got2 = {
        (r["doc_a"], r["doc_b"]): r["n_shared"]
        for r in moss_pairs(docs, min_shared=1, max_df=2).take_all()
    }
    live2 = {f for f, c in df.items() if c <= 2}
    exp2 = {}
    for a, b in itertools.combinations(range(n), 2):
        c = len(fps[a] & fps[b] & live2)
        if c >= 1:
            exp2[(a, b)] = c
    assert got2 == exp2


def test_countmin_counts_exact_replay(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import ray.data

    from georay.sketch import countmin_counts
    from georay.textops import _hash64_strings, tokenize

    rng = np.random.default_rng(3)
    vocab = [f"t{i}" for i in range(40)]
    texts = [" ".join(rng.choice(vocab, rng.integers(5, 30))) for _ in range(60)]
    texts.append("")  # empty-doc path
    n = len(texts)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * n, pa.string()),
                "source": pa.array(["s"] * n, pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        f"{tmp_path}/documents.parquet",
    )
    depth, width = 2, 16  # tiny sketch => real collisions exercised
    terms = ("t0", "t7", "t39", "missing")

    # pure-python reference sketch
    all_toks = [t for x in texts for t in tokenize(x)]
    exact = collections.Counter(all_toks)
    mat = np.zeros((depth, width), np.int64)
    for tok, c in exact.items():
        for i in range(depth):
            mat[i, int(_hash64_strings([f"{i}:{tok}"])[0] % np.uint64(width))] += c
    exp = {}
    for q in terms:
        est = min(
            int(mat[i, int(_hash64_strings([f"{i}:{q}"])[0] % np.uint64(width))])
            for i in range(depth)
        )
        exp[q] = (est, exact.get(q, 0))

    docs = ray.data.read_parquet(f"{tmp_path}/documents.parquet").repartition(7)
    out = countmin_counts(docs, terms, depth=depth, width=width)
    got = {
        t: (e, x)
        for t, e, x in zip(
            out["term"].to_pylist(), out["cms_est"].to_pylist(), out["exact_n"].to_pylist()
        )
    }
    assert got == exp
    # the CMS one-sided guarantee
    assert all(e >= x for e, x in got.values())
    # collisions actually happened at width=64 (otherwise test is vacuous)
    assert any(e > x for e, x in got.values())


def test_bpe_merges_reference_parity(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import ray.data

    from georay.textops import bpe_merges, tokenize

    texts = [
        "low lower lowest low low",
        "new newer newest new newer",
        "wide wider widest low newer",
        "",  # empty-doc path
        "a ab abc a",  # short words, single-char words
    ]
    n = len(texts)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * n, pa.string()),
                "source": pa.array(["s"] * n, pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        f"{tmp_path}/documents.parquet",
    )

    # pure-python Sennrich reference
    wc = collections.Counter(t for x in texts for t in tokenize(x))
    vocab = {w: list(w) for w in wc}
    exp = []
    for _ in range(4):
        stats = collections.Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += wc[w]
        if not stats:
            break
        (l, r), c = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        exp.append((l, r, c))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out

    docs = ray.data.read_parquet(f"{tmp_path}/documents.parquet").repartition(3)
    out = bpe_merges(docs, k=4)
    got = list(
        zip(out["left"].to_pylist(), out["right"].to_pylist(), out["pair_count"].to_pylist())
    )
    assert got == exp
    assert out["merge_rank"].to_pylist() == [1, 2, 3, 4]


def test_bpe_encode_reference_parity(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import ray.data

    from georay.textops import _bpe_apply, bpe_encode, tokenize

    texts = ["low lower low", "newer newest", "", "a ab"]
    n = len(texts)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * n, pa.string()),
                "source": pa.array(["s"] * n, pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        f"{tmp_path}/documents.parquet",
    )
    # reference: learn merges with the pure-python trainer from the
    # bpe_merges test, then count symbols per doc
    wc = collections.Counter(t for x in texts for t in tokenize(x))
    vocab = {w: list(w) for w in wc}
    merges = []
    for _ in range(3):
        stats = collections.Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += wc[w]
        if not stats:
            break
        (l, r), _c = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((l, r))
        vocab = {w: _bpe_apply(w, merges) for w in wc}
    exp = {}
    for i, x in enumerate(texts):
        toks = tokenize(x)
        exp[i] = (len(toks), sum(len(_bpe_apply(w, merges)) for w in toks))

    docs = ray.data.read_parquet(f"{tmp_path}/documents.parquet").repartition(2)
    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_encode(docs, k=3).take_all()
    }
    assert got == exp
    assert got[2] == (0, 0)  # empty doc emitted with zeros


def test_association_rules_brute_parity(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from georay.relational import association_rules

    rng = np.random.default_rng(5)
    rows_ok, rows_pk = [], []
    for ok in range(1, 61):
        g = rng.integers(1, 6)
        parts = rng.choice(np.arange(1, 15), size=g, replace=True)
        for p in parts:
            rows_ok.append(ok)
            rows_pk.append(int(p))
    # duplicate lines inside an order must not inflate supports
    rows_ok.append(1); rows_pk.append(rows_pk[0])
    n = len(rows_ok)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(rows_ok, pa.int64()),
                "l_partkey": pa.array(rows_pk, pa.int64()),
                "l_suppkey": pa.array([1] * n, pa.int64()),
                "l_quantity": pa.array([1.0] * n),
                "l_extendedprice": pa.array([10.0] * n),
                "l_discount": pa.array([0.0] * n),
                "l_tax": pa.array([0.0] * n),
                "l_returnflag": pa.array(["N"] * n, pa.string()),
                "l_linestatus": pa.array(["O"] * n, pa.string()),
                "l_shipdate": pa.array([1] * n, pa.timestamp("us")),
            }
        ),
        f"{tmp_path}/lineitem.parquet",
    )

    baskets = collections.defaultdict(set)
    for ok, pk in zip(rows_ok, rows_pk):
        baskets[ok].add(pk)
    N = len(baskets)
    supp = collections.Counter(p for s in baskets.values() for p in s)
    pair = collections.Counter()
    for s in baskets.values():
        for a in s:
            for b in s:
                if a < b:
                    pair[(a, b)] += 1
    exp = []
    for (a, b), nb in pair.items():
        if nb < 2:
            continue
        for ante, cons in ((a, b), (b, a)):
            conf = (1_000_000 * nb) // supp[ante]
            lift = (1_000_000 * nb * N) // (supp[ante] * supp[cons])
            exp.append((lift, ante, cons, nb, supp[ante], conf))
    exp.sort(key=lambda r: (-r[0], r[1], r[2]))
    exp = [(r[1], r[2], r[3], r[4], r[5], r[0]) for r in exp[:10]]

    got = [
        (r["antecedent"], r["consequent"], r["n_both"], r["n_ante"],
         r["conf_micro"], r["lift_micro"])
        for r in association_rules(str(tmp_path), min_support=2, k=10).take_all()
    ]
    assert got == exp
