"""AS-OF join: the miss branch (key with no prior order) and the
boundary (order exactly at the event time joins)."""

import pyarrow as pa
import pytest


@pytest.fixture()
def tmp_tables(ray_session, tmp_path):
    import pyarrow.parquet as pq

    events = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "user_id": pa.array([7, 7, 9], pa.int64()),
            "ts": pa.array([100, 250, 50], pa.timestamp("us")),
            "event_type": pa.array(["a", "a", "a"]),
            "value": pa.array([0.0, 0.0, 0.0]),
            "props": pa.array(["", "", ""]),
        }
    )
    orders = pa.table(
        {
            "o_orderkey": pa.array([1, 2], pa.int64()),
            "o_custkey": pa.array([7, 7], pa.int64()),
            "o_orderstatus": pa.array(["O", "O"]),
            "o_totalprice": pa.array([1.0, 2.0]),
            "o_orderdate": pa.array([100, 200], pa.timestamp("us")),
            "o_orderpriority": pa.array(["5-LOW", "5-LOW"]),
        }
    )
    pq.write_table(events, str(tmp_path / "events.parquet"))
    pq.write_table(orders, str(tmp_path / "orders.parquet"))
    return str(tmp_path)


def test_asof_miss_and_boundary(tmp_tables):
    from georay.relational import asof_last_order

    rows = {r["event_id"]: r["last_order_us"] for r in asof_last_order(tmp_tables).take_all()}
    assert rows[1] == 100  # order exactly AT the event time joins (<=)
    assert rows[2] == 200  # latest at-or-before 250
    assert rows[3] == -1  # user 9 has no orders -> miss marker


# ------------------------------------------- rolling windows / quantiles


def test_rolling_window_user_boundary(ray_session, tmp_path):
    """The ROWS window must reset at user boundaries and tie-break by
    event_id (deterministic window membership on equal timestamps)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from georay.relational import rolling_event_sums

    # user 1: values 1,2,3,4 at ts 10,20,20,30 (tie at 20 ordered by id)
    # user 2: single event — window is just itself
    t = pa.table(
        {
            "event_id": pa.array([100, 101, 102, 103, 200], pa.int64()),
            "user_id": pa.array([1, 1, 1, 1, 2], pa.int64()),
            "ts": pa.array([10, 20, 20, 30, 10], pa.timestamp("us")),
            "value": pa.array([1.0, 2.0, 3.0, 4.0, 9.0]),
        }
    )
    pq.write_table(t, f"{tmp_path}/events.parquet")
    out = {
        r["event_id"]: r["w_sum_em6"]
        for r in rolling_event_sums(str(tmp_path), window=3).take_all()
    }
    assert out == {
        100: 1_000_000,            # [1]
        101: 3_000_000,            # [1,2]
        102: 6_000_000,            # [1,2,3]
        103: 9_000_000,            # [2,3,4] — 1 fell out of the window
        200: 9_000_000,            # user 2 resets
    }


def test_grouped_quantile_disc_semantics(ray_session, tmp_path):
    """Engine quantile index must equal DuckDB quantile_disc
    (rank ceil(q*n)-1 of the sorted group)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from georay.relational import order_price_quantiles

    rng = np.random.default_rng(5)
    n = 101
    prices = np.round(rng.uniform(10, 1000, n), 2)
    cust = pa.table(
        {
            "c_custkey": pa.array(np.arange(n, dtype=np.int64)),
            "c_mktsegment": pa.array(["SEG"] * n),
        }
    )
    orders = pa.table(
        {
            "o_custkey": pa.array(np.arange(n, dtype=np.int64)),
            "o_totalprice": pa.array(prices),
        }
    )
    pq.write_table(cust, f"{tmp_path}/customer.parquet")
    pq.write_table(orders, f"{tmp_path}/orders.parquet")
    row = order_price_quantiles(str(tmp_path)).take_all()[0]
    cents = np.sort(np.rint(prices * 100).astype(np.int64))
    assert row["p50_cents"] == int(cents[int(np.ceil(0.5 * n)) - 1])
    assert row["p90_cents"] == int(cents[int(np.ceil(0.9 * n)) - 1])
    assert row["n_orders"] == n


def test_user_event_deltas_lag_semantics(ray_session):
    sf_dir_small = "/root/testdata/sf0.001"
    import duckdb
    import pandas as pd

    from georay.relational import user_event_deltas

    got = (
        user_event_deltas(sf_dir_small)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = con.execute(
        f"""
        SELECT event_id, user_id,
               ts_us - LAG(ts_us) OVER w AS gap_us,
               val_c - LAG(val_c) OVER w AS dvalue_cents
        FROM (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
                     CAST(ROUND(value * 100) AS BIGINT) AS val_c
              FROM read_parquet('{sf_dir_small}/events.parquet'))
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
        ORDER BY event_id
        """
    ).df()
    pd.testing.assert_frame_equal(
        got.astype({"gap_us": "float64", "dvalue_cents": "float64"}),
        exp.astype({"gap_us": "float64", "dvalue_cents": "float64"}),
        check_dtype=False,
    )


def test_user_event_zscores_properties(ray_session):
    """Within each user: mean(z) ~ 0, population std(z) ~ 1; single-event
    users are null."""
    import numpy as np

    from georay.relational import user_event_zscores

    df = user_event_zscores("/root/testdata/sf0.001").to_pandas()
    assert len(df) == 1000
    valid = df[df["z_micro"].notna()].copy()
    valid["z"] = valid["z_micro"] / 1e6
    g = valid.groupby("user_id")["z"]
    assert (g.mean().abs() < 1e-5).all()
    assert (np.abs(g.std(ddof=0) - 1) < 1e-5).all()
    # null exactly for single-event users
    nulls = df[df["z_micro"].isna()]["user_id"]
    sizes = df.groupby("user_id").size()
    assert set(nulls) == set(sizes[sizes == 1].index)


def test_part_pair_counts_reference(ray_session):
    """Pair-generation index arithmetic vs a plain-python reference
    over the real sf0.001 lineitem."""
    from collections import Counter
    from itertools import combinations

    import duckdb

    from georay.relational import part_pair_counts

    got = part_pair_counts("/root/testdata/sf0.001", min_orders=2).to_pandas()
    rows = duckdb.sql(
        "SELECT DISTINCT l_orderkey, l_partkey "
        "FROM read_parquet('/root/testdata/sf0.001/lineitem.parquet')"
    ).fetchall()
    orders = {}
    for ok, pk in rows:
        orders.setdefault(ok, set()).add(pk)
    counts = Counter()
    for parts in orders.values():
        for a, b in combinations(sorted(parts), 2):
            counts[(a, b)] += 1
    want = {k: v for k, v in counts.items() if v >= 2}
    gotd = {
        (int(r.part_a), int(r.part_b)): int(r.n_orders)
        for r in got.itertuples()
    }
    assert gotd == want


def test_funnel_users_reference(ray_session):
    """Temporal-precedence reduction vs a plain-python scan."""
    import duckdb

    from georay.relational import funnel_users

    got = funnel_users("/root/testdata/sf0.001").to_pandas()
    rows = duckdb.sql(
        "SELECT user_id, event_type, epoch_us(ts) FROM "
        "read_parquet('/root/testdata/sf0.001/events.parquet')"
    ).fetchall()
    by_user = {}
    for uid, et, us in rows:
        by_user.setdefault(uid, []).append((us, et))
    want = {}
    for uid, evs in by_user.items():
        clicks = [us for us, et in evs if et == "click"]
        buys = [us for us, et in evs if et == "purchase"]
        if clicks and buys and min(clicks) < max(buys):
            want[uid] = (min(clicks), max(buys))
    gotd = {
        int(r.user_id): (int(r.first_click_us), int(r.last_purchase_us))
        for r in got.itertuples()
    }
    assert gotd == want and len(want) > 0


def test_rolling_time_sums_reference(ray_session):
    """RANGE-frame semantics (ts peers share a frame) vs a plain scan."""
    import duckdb

    from georay.relational import rolling_time_sums

    got = rolling_time_sums("/root/testdata/sf0.001").to_pandas()
    rows = duckdb.sql(
        "SELECT event_id, user_id, epoch_us(ts), CAST(ROUND(value*1000000) AS BIGINT)"
        " FROM read_parquet('/root/testdata/sf0.001/events.parquet')"
    ).fetchall()
    by_user = {}
    for eid, uid, us, vm in rows:
        by_user.setdefault(uid, []).append((us, eid, vm))
    want = {}
    W = 600_000_000
    for uid, evs in by_user.items():
        evs.sort()
        for us, eid, _ in evs:
            # frame: all events with ts in [us - W, us] INCLUDING peers
            want[eid] = sum(v for u2, _, v in evs if us - W <= u2 <= us)
    gotd = dict(zip(got["event_id"], got["win_sum_micro"]))
    assert gotd == want


def test_hopping_window_counts_semantics(ray_session):
    """Every event appears in exactly span/hop windows; each window's
    count equals a brute-force interval scan."""
    import duckdb

    from georay.relational import hopping_window_counts

    got = hopping_window_counts("/root/testdata/sf0.001").to_pandas()
    rows = duckdb.sql(
        "SELECT epoch_us(ts), event_type"
        " FROM read_parquet('/root/testdata/sf0.001/events.parquet')"
    ).fetchall()
    # total window memberships = 4 per event
    assert got["n_events"].sum() == 4 * len(rows)
    SPAN, HOP = 3_600_000_000, 900_000_000
    # spot-check a handful of windows against a brute interval scan
    for _, r in got.head(20).iterrows():
        w, et = int(r.win_us), r.event_type
        assert w % HOP == 0
        brute = sum(1 for us, t in rows if t == et and w <= us < w + SPAN)
        assert brute == int(r.n_events)


def test_attribution_join_reference(ray_session):
    """Interval-join semantics (strictly-before window, ts-peers and
    self excluded, probe side filtered to purchases) vs a plain scan."""
    import duckdb

    from georay.relational import attribution_join

    got = attribution_join("/root/testdata/sf0.001").to_pandas()
    rows = duckdb.sql(
        "SELECT event_id, user_id, epoch_us(ts), event_type,"
        " CAST(ROUND(value*1000000) AS BIGINT)"
        " FROM read_parquet('/root/testdata/sf0.001/events.parquet')"
    ).fetchall()
    by_user = {}
    for eid, uid, us, et, vm in rows:
        by_user.setdefault(uid, []).append((us, eid, et, vm))
    want = {}
    W = 86_400_000_000
    for uid, evs in by_user.items():
        for us, eid, et, _ in evs:
            if et != "purchase":
                continue
            prior = [(u2, v) for u2, _, _, v in evs if us - W <= u2 < us]
            want[eid] = (len(prior), sum(v for _, v in prior))
    gotd = {
        eid: (n, s)
        for eid, n, s in zip(got["event_id"], got["n_prior"], got["prior_sum_micro"])
    }
    assert gotd == want
    assert len(gotd) > 0


def test_orders_rollup_levels(ray_session):
    """Every subtotal level sums to the grand total and the NULL
    markers land exactly at ROLLUP's prefix levels."""
    from georay.relational import orders_rollup

    df = orders_rollup("/root/testdata/sf0.001").to_pandas()
    fine = df[df["o_orderstatus"].notna()]
    mid = df[df["o_orderstatus"].isna() & df["o_orderpriority"].notna()]
    grand = df[df["o_orderpriority"].isna()]
    assert len(grand) == 1 and grand["o_orderstatus"].isna().all()
    total = int(grand["n_orders"].iloc[0])
    assert fine["n_orders"].sum() == mid["n_orders"].sum() == total
    assert fine["total_cents"].sum() == int(grand["total_cents"].iloc[0])
    # per-priority subtotal == sum of its fine rows
    for _, row in mid.iterrows():
        sub = fine[fine["o_orderpriority"] == row.o_orderpriority]
        assert sub["n_orders"].sum() == row.n_orders
        assert sub["total_cents"].sum() == row.total_cents


def test_weekly_retention_reference(ray_session):
    import duckdb

    from georay.relational import weekly_retention

    got = (
        weekly_retention("/root/testdata/sf0.001")
        .to_pandas()
        .sort_values("week")
        .reset_index(drop=True)
    )
    rows = duckdb.sql(
        "SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 FROM "
        "read_parquet('/root/testdata/sf0.001/events.parquet')"
    ).fetchall()
    weeks = {}
    for uid, w in rows:
        weeks.setdefault(int(w), set()).add(uid)
    for _, r in got.iterrows():
        active = weeks[int(r.week)]
        nxt = weeks.get(int(r.week) + 1, set())
        assert r.n_active == len(active)
        assert r.n_retained == len(active & nxt)
    assert set(got["week"]) == set(weeks)


def test_orders_cube_levels(ray_session):
    """CUBE emits all four grouping sets; every level sums to the
    grand total; the extra (status) level matches a direct groupby."""
    import duckdb

    from georay.relational import orders_cube

    got = orders_cube("/root/testdata/sf0.001").to_pandas()
    grand = got[got.o_orderpriority.isna() & got.o_orderstatus.isna()]
    assert len(grand) == 1
    total = int(grand.n_orders.iloc[0])
    fine = got[got.o_orderpriority.notna() & got.o_orderstatus.notna()]
    by_p = got[got.o_orderpriority.notna() & got.o_orderstatus.isna()]
    by_s = got[got.o_orderpriority.isna() & got.o_orderstatus.notna()]
    assert fine.n_orders.sum() == by_p.n_orders.sum() == by_s.n_orders.sum() == total
    want = dict(
        duckdb.sql(
            "SELECT o_orderstatus, COUNT(*) FROM"
            " read_parquet('/root/testdata/sf0.001/orders.parquet')"
            " GROUP BY 1"
        ).fetchall()
    )
    assert dict(zip(by_s.o_orderstatus, by_s.n_orders)) == want


def test_event_transitions_vs_duckdb(ray_session):
    sf_dir_small = "/root/testdata/sf0.001"
    import duckdb
    import pandas as pd

    from georay.relational import event_transitions

    got = event_transitions(sf_dir_small).to_pandas().reset_index(drop=True)
    exp = duckdb.connect().execute(
        f"""
        WITH o AS (SELECT user_id, event_type,
                          LAG(event_type) OVER (PARTITION BY user_id
                                                ORDER BY ts, event_id) AS prev_type
                   FROM read_parquet('{sf_dir_small}/events.parquet'))
        SELECT prev_type, event_type, COUNT(*) AS n FROM o
        WHERE prev_type IS NOT NULL GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_event_transitions_single_and_empty_users(ray_session):
    # a user with one event contributes no pair; ties on ts break by
    # event_id
    import pyarrow as pa
    import ray.data

    from georay.relational import event_transitions

    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "user_id": pa.array([7, 7, 7, 9], pa.int64()),
            "ts": pa.array([100, 100, 200, 50], pa.timestamp("us")),
            "event_type": ["a", "b", "a", "z"],
        }
    )
    import os, tempfile
    import pyarrow.parquet as pq

    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "events.parquet"))
        rows = event_transitions(d).take_all()
    assert [(r["prev_type"], r["event_type"], r["n"]) for r in rows] == [
        ("a", "b", 1),
        ("b", "a", 1),
    ]


def test_user_drawdown_brute(ray_session, tmp_path):
    """Segmented running-max scan vs a per-user python reference."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from georay.relational import user_drawdown

    rng = np.random.default_rng(19)
    n = 400
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10**6, n), unit="s"),
            "user_id": rng.integers(0, 12, n).astype(np.int64),
            "event_type": ["x"] * n,
            "value": np.round(rng.uniform(0, 300, n), 2),
            "props": ["{}"] * n,
        }
    )
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), tmp_path / "events.parquet")

    want = {}
    for uid, g in df.sort_values(["ts", "event_id"]).groupby("user_id"):
        cents = np.rint(g["value"].to_numpy() * 100).astype(np.int64)
        dd = np.maximum.accumulate(cents) - cents
        want[uid] = (len(g), int(dd.max()))

    got = user_drawdown(str(tmp_path)).to_pandas()
    assert {
        r.user_id: (r.n_events, r.max_drawdown_cents) for r in got.itertuples()
    } == want
