"""Relational operators over the TPC-H-ish tables: grouped aggregates,
broadcast (map-side) joins, an explicit bucketed hash join for
large x large, filters, multi-key sort + top-k, tumbling-window
aggregates over the events stream.

These are the engine-breadth operators a user composes with the geo
stages; each has a DuckDB oracle in __ray_entry__.oracle_sql().
Patterns: prune at the read (columns=), pre-aggregate inside
map_batches before every groupby, broadcast the small side of joins
with ray.put, bucket-hash-join when both sides are large.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum


def _read(sf_dir: str, table: str, columns=None, num_blocks=None):
    if num_blocks is None:
        num_blocks = _fact_blocks(sf_dir, table)
    return ray.data.read_parquet(
        f"{sf_dir}/{table}.parquet", columns=columns, override_num_blocks=num_blocks
    )


def _fact_blocks(sf_dir: str, table: str) -> int:
    """Block count for a fact-table read, sized from DATA bytes
    (~64 MB/block) with a floor of one block per CPU: small-sf test
    inputs otherwise split into 64+ tiny blocks and every downstream
    shuffle pays fixed per-block latency."""
    import os

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    try:
        nbytes = os.path.getsize(f"{sf_dir}/{table}.parquet")
    except OSError:
        nbytes = 1 << 30
    return max(cpus, nbytes // (64 << 20))


def _read_small(sf_dir: str, table: str, columns=None):
    """Broadcast-side read: a small dimension table headed for ray.put
    doesn't need a distributed read plan (each Ray Data read pays
    ~0.5s of driver/scheduling latency); read it directly with arrow.
    At a scale where the table stops being broadcast-sized, the caller
    should be on bucket_hash_join anyway."""
    import pyarrow.parquet as pq

    return pq.read_table(f"{sf_dir}/{table}.parquet", columns=columns).to_pandas()


DEFAULT_BROADCAST_BUDGET_BYTES = 256 << 20


def _broadcast_budget() -> int:
    import os

    return int(os.environ.get("GEORAY_BROADCAST_BUDGET", DEFAULT_BROADCAST_BUDGET_BYTES))


def dim_side(sf_dir: str, table: str, columns=None, budget_bytes=None):
    """Broadcast-vs-bucket decision for the dimension side of a join
    (VERDICT r02 #3: a plan that always ships O(|dim|) to every worker
    is a scale-killer once the dimension grows with the corpus).

    Returns ("broadcast", pandas_frame) when the table's on-disk
    parquet footprint x4 (conservative decompression factor) fits the
    budget — caller builds its BroadcastMap / sorted array and
    ray.puts it once. Otherwise returns ("bucket", Dataset) of the
    same projection and the caller must route through
    bucket_hash_join. The decision reads file metadata only, never
    row data. Budget: GEORAY_BROADCAST_BUDGET env (bytes), default
    256 MB — tests force the bucket path with a tiny budget."""
    import os

    budget = _broadcast_budget() if budget_bytes is None else budget_bytes
    try:
        nbytes = os.path.getsize(f"{sf_dir}/{table}.parquet")
    except OSError:
        nbytes = 1 << 62
    if nbytes * 4 <= budget:
        return "broadcast", _read_small(sf_dir, table, columns=columns)
    return "bucket", _read(sf_dir, table, columns=columns)


def _group_runs(*keys):
    """Arrow-native per-batch grouping (the user_drawdown idiom,
    VERDICT r04 #6): lexsort the rows by the key tuple (first key is
    the primary sort key) and find group boundaries. Returns (order,
    starts) — order is the permutation, starts indexes group starts in
    the sorted view; callers take key values at order[starts], run
    lengths via np.diff(np.r_[starts, n]), and exact int64 aggregates
    via np.add.reduceat(vals[order], starts). Replaces the pandas
    round-trip (`t.to_pandas(); df.groupby(...)`) in hot per-batch
    kernels — no object conversion, no index churn."""
    order = np.lexsort(tuple(reversed(keys)))
    n = len(order)
    if n == 0:
        return order, np.empty(0, np.int64)
    change = np.zeros(n, dtype=bool)
    change[0] = True
    for k in keys:
        ks = k[order]
        change[1:] |= ks[1:] != ks[:-1]
    return order, np.flatnonzero(change)


def _dict_codes(col):
    """Dictionary-encode a string column of a pyarrow Table into
    (int64 codes, value-array) for _group_runs keying; group labels
    come back via values.take(codes[order][starts])."""
    d = pc.dictionary_encode(col.combine_chunks())
    return d.indices.to_numpy(zero_copy_only=False).astype(np.int64), d.dictionary


# ---------------------------------------------------------------- q1


def pricing_summary(sf_dir: str):
    """TPC-H Q1-shaped pricing summary: per (returnflag, linestatus)
    sums with a pre-aggregation combiner before the groupby.

    Money amounts aggregate in EXACT integer units (cents / basis
    points) so the result is bit-identical regardless of summation
    order — the property the oracle hash-compare needs and the property
    a distributed sum should have anyway."""
    ds = _read(
        sf_dir,
        "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        cents = np.rint(df["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        disc_c = np.rint(df["l_discount"].to_numpy() * 100).astype(np.int64)
        df["qty"] = np.rint(df["l_quantity"].to_numpy()).astype(np.int64)
        df["base_cents"] = cents
        df["disc_em4"] = cents * (100 - disc_c)  # price * (1-disc), 1e-4 units
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("qty", "sum"),
            sum_base_price_cents=("base_cents", "sum"),
            sum_disc_price_em4=("disc_em4", "sum"),
            count_order=("qty", "size"),
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    agged = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty", alias_name="sum_qty"),
        Sum("sum_base_price_cents", alias_name="sum_base_price_cents"),
        Sum("sum_disc_price_em4", alias_name="sum_disc_price_em4"),
        Sum("count_order", alias_name="count_order"),
    )
    # deterministic output order (tiny result; pins the driver hash)
    return agged.sort(["l_returnflag", "l_linestatus"])


# ------------------------------------------------- broadcast join + topk


def top_orders(sf_dir: str, k: int = 10):
    """orders x customer join -> top-k by totalprice (deterministic
    tie-break on orderkey). Customer side via dim_side: broadcast map
    under the budget; above it, take the top-k FIRST (per-batch
    partial top-k, so the global sort sees k rows/batch) and bucket-
    hash-join only the k winners against the streaming customer
    projection."""
    mode, cust = dim_side(sf_dir, "customer", columns=["c_custkey", "c_name"])
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def topk_batch(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(
            ["o_totalprice", "o_orderkey"], ascending=[False, True]
        ).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    if mode == "broadcast":
        cust_ref = ray.put(
            BroadcastMap(cust["c_custkey"].to_numpy(), cust["c_name"].to_numpy())
        )

        def joiner(t: pa.Table, cust) -> pa.Table:
            names, _ = cust.lookup(t["o_custkey"].to_numpy(zero_copy_only=False))
            out = t.append_column("c_name", pa.array(names.tolist(), pa.string()))
            return topk_batch(out)

        partials = broadcast_map_batches(orders, joiner, cust_ref)
        top = partials.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(k)
        return top.select_columns(["o_orderkey", "c_name", "o_totalprice"])

    partials = orders.map_batches(topk_batch, batch_format="pyarrow")
    top = partials.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(k)
    joined = bucket_hash_join(top, cust, on="o_custkey", right_on="c_custkey")
    return joined.sort(
        ["o_totalprice", "o_orderkey"], descending=[True, False]
    ).select_columns(["o_orderkey", "c_name", "o_totalprice"])


# ------------------------------------------------------ bucketed join


def default_join_buckets() -> int:
    """Bucket count sized from the cluster, not a constant: 4x the
    cluster CPU count so the bucket shuffle and the per-bucket merges
    keep every core busy and no single bucket has to hold more than
    ~1/(4*cpus) of the data in one worker's heap. At 100 TB the caller
    should instead pass n_buckets ~ est_bytes / 128 MB."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(16, 4 * cpus)


def _merge_sum_partials_impl(group_cols, sum_cols, *tables):
    cols = list(group_cols) + list(sum_cols)
    # zero-row blocks can carry degenerate (null-typed) schemas — drop
    live = [t.select(cols) for t in tables if t.num_rows]
    if not live:
        return tables[0].select(cols)
    t = pa.concat_tables(live)
    df = t.to_pandas()
    g = df.groupby(list(group_cols), as_index=False)[list(sum_cols)].sum()
    return pa.Table.from_pandas(g, preserve_index=False)


_merge_sum_partials = ray.remote(_merge_sum_partials_impl)


def tiny_key_sum(ds: ray.data.Dataset, group_cols, sum_cols, sort_cols=None):
    """Final aggregate for a partials Dataset whose group cardinality is
    TINY (a handful of keys, each block already pre-aggregated): a
    remote fan-in tree replaces the sort-based groupby shuffle AND the
    output sort — each of those is an all-to-all barrier with ~1.5 s
    fixed latency at 32 cpus regardless of data size, which dominated
    region_revenue's wall (profile: <0.9 s of remote compute inside a
    5.3 s wall). Integer sums are order-free, so the tree is exact.
    Returns a 1-block Dataset sorted by sort_cols."""
    from georay.textops import _tree_reduce

    refs = ds.materialize().to_arrow_refs()
    final = ray.get(
        _tree_reduce(refs, _merge_sum_partials, args=(tuple(group_cols), tuple(sum_cols)))
    )
    if sort_cols:
        final = final.sort_by([(c, "ascending") for c in sort_cols])
    return ray.data.from_arrow(final)


def bucket_hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    n_buckets: int | None = None,
    right_on: str | None = None,
):
    """Explicit partitioned hash join for large x large: both sides get
    bucket = hash(key) % B, groupby bucket co-locates matching keys,
    per-bucket merge inside map_groups. B defaults to 4x cluster CPUs
    (see default_join_buckets); raise it for hot keys / bigger data.

    The per-group merge runs in Arrow format and splits the sides
    BEFORE converting to pandas, so null-padded columns from the
    schema union never coerce int64 -> float64 (dtype-stable output,
    which the oracle hash compare relies on)."""
    right_on = right_on or on
    if n_buckets is None:
        n_buckets = default_join_buckets()

    lschema = left.schema().base_schema
    rschema = right.schema().base_schema
    lcols = list(lschema.names)
    rcols = list(rschema.names)
    # Unified schema on BOTH sides (other side's columns as typed
    # nulls): a bucket whose group batch holds rows from only one side
    # would otherwise carry that side's schema alone and break the
    # column split below.
    other = {0: [f for f in rschema if f.name not in lcols],
             1: [f for f in lschema if f.name not in rcols]}

    def add_bucket(col, side):
        def f(t: pa.Table) -> pa.Table:
            keys = t[col].to_numpy(zero_copy_only=False).astype(np.int64)
            b = np.abs((keys * np.int64(2654435761)) % np.int64(n_buckets))
            for field in other[side]:
                t = t.append_column(field.name, pa.nulls(len(t), field.type))
            t = t.append_column("__bucket", pa.array(b, pa.int64()))
            t = t.append_column("__side", pa.array(np.full(len(t), side, dtype=np.int8)))
            return t.select(lcols + [f.name for f in other[0]] + ["__bucket", "__side"])

        return f

    lt = left.map_batches(add_bucket(on, 0), batch_format="pyarrow")
    rt = right.map_batches(add_bucket(right_on, 1), batch_format="pyarrow")

    def merge_bucket(t: pa.Table) -> pa.Table:
        l = t.filter(pc.equal(t["__side"], 0)).select(lcols).to_pandas()
        r = t.filter(pc.equal(t["__side"], 1)).select(rcols).to_pandas()
        out = l.merge(r, left_on=on, right_on=right_on)
        return pa.Table.from_pandas(out, preserve_index=False)

    both = lt.union(rt)
    return both.groupby("__bucket").map_groups(merge_bucket, batch_format="pyarrow")


def region_revenue(sf_dir: str):
    """lineitem |><| orders (bucketed hash join) with customer joined
    via dim_side (broadcast custkey->region-name map under the budget,
    else a second bucketed join); nation/region are constant-25/5-row
    tables and always ride as a dict."""
    nation = _read_small(sf_dir, "nation")
    region = _read_small(sf_dir, "region")
    n2r = dict(zip(nation["n_nationkey"], nation["n_regionkey"]))
    r2name = dict(zip(region["r_regionkey"], region["r_name"]))
    mode, cust = dim_side(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    lineitem = _read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"]
    )

    def li_partial(t: pa.Table) -> pa.Table:
        # pre-aggregate revenue per orderkey INSIDE the batch before the
        # join shuffle: the bucketed join then moves ~|orderkeys| rows
        # instead of every lineitem (summing before joining is sound —
        # the join key is the aggregation key)
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.rint(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        disc_c = np.rint(t["l_discount"].to_numpy(zero_copy_only=False) * 100).astype(
            np.int64
        )
        rev = cents * (100 - disc_c)
        order, starts = _group_runs(ok)
        if not len(starts):
            return pa.table(
                {
                    "l_orderkey": pa.array([], pa.int64()),
                    "revenue_em4": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "l_orderkey": pa.array(ok[order][starts], pa.int64()),
                "revenue_em4": pa.array(
                    np.add.reduceat(rev[order], starts), pa.int64()
                ),
            }
        )

    li_agg = lineitem.map_batches(li_partial, batch_format="pyarrow")
    joined = bucket_hash_join(li_agg, orders, on="l_orderkey", right_on="o_orderkey")

    def region_partial(names: np.ndarray, rev: np.ndarray) -> pa.Table:
        # per-batch (r_name, sum) fold with no pandas round-trip:
        # factorize the handful of region names, reduceat the exact
        # integer revenue over group runs
        uniq, codes = np.unique(np.asarray(names, dtype=object), return_inverse=True)
        order, starts = _group_runs(codes.astype(np.int64))
        if not len(starts):
            return pa.table(
                {
                    "r_name": pa.array([], pa.string()),
                    "revenue_em4": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "r_name": pa.array(uniq[codes[order][starts]], pa.string()),
                "revenue_em4": pa.array(np.add.reduceat(rev[order], starts), pa.int64()),
            }
        )

    if mode == "broadcast":
        c2r_ref = ray.put(
            BroadcastMap(
                cust["c_custkey"].to_numpy(),
                np.array([r2name[n2r[nk]] for nk in cust["c_nationkey"]], dtype=object),
            )
        )

        def revenue_by_region(t: pa.Table, c2r) -> pa.Table:
            names, _ = c2r.lookup(t["o_custkey"].to_numpy(zero_copy_only=False))
            return region_partial(names, t["revenue_em4"].to_numpy(zero_copy_only=False))

        partials = broadcast_map_batches(joined, revenue_by_region, c2r_ref)
    else:
        # nationkey -> region name is a constant-size lut; apply it on
        # the streaming customer projection, then bucket-join by custkey
        lut = np.empty(max(n2r) + 1, dtype=object)
        for nk, rk in n2r.items():
            lut[nk] = r2name[rk]

        def add_rname(t: pa.Table) -> pa.Table:
            nk = t["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {
                    "c_custkey": t["c_custkey"].cast(pa.int64()),
                    "r_name": pa.array(lut[nk].tolist(), pa.string()),
                }
            )

        cust_r = cust.map_batches(add_rname, batch_format="pyarrow")
        joined2 = bucket_hash_join(joined, cust_r, on="o_custkey", right_on="c_custkey")

        def part(t: pa.Table) -> pa.Table:
            return region_partial(
                t["r_name"].to_numpy(zero_copy_only=False),
                t["revenue_em4"].to_numpy(zero_copy_only=False),
            )

        partials = joined2.map_batches(part, batch_format="pyarrow")
    return tiny_key_sum(partials, ["r_name"], ["revenue_em4"], sort_cols=["r_name"])


# -------------------------------------------------------- window agg


def events_hourly(sf_dir: str):
    """Tumbling 1-hour window per event_type over the events stream:
    count + sum(value). Windows come from timestamp arithmetic inside
    map_batches (no per-row python); the groupby sees pre-aggregated
    (window, type) partials."""
    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        micros = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        hour = micros // 3_600_000_000
        df = t.to_pandas()
        df["window_hour"] = hour
        # exact integer micro-units -> order-independent sums
        df["value_em6"] = np.rint(df["value"].to_numpy() * 1e6).astype(np.int64)
        g = df.groupby(["window_hour", "event_type"], as_index=False).agg(
            n_events=("value_em6", "size"), sum_value_em6=("value_em6", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    agged = partials.groupby(["window_hour", "event_type"]).aggregate(
        Sum("n_events", alias_name="n_events"),
        Sum("sum_value_em6", alias_name="sum_value_em6"),
    )
    return agged.sort(["window_hour", "event_type"])


def hopping_window_counts(
    sf_dir: str, span_us: int = 3_600_000_000, hop_us: int = 900_000_000
):
    """HOPPING (sliding) window counts per event_type: overlapping
    windows of `span_us` starting every `hop_us` — each event lands in
    span/hop windows (here 4). The streaming-sibling of events_hourly's
    tumbling window; Ray Data has no window-assign primitive, so the
    fan-out is an integer-arithmetic explode INSIDE map_batches
    followed by the usual two-phase count (the shuffle sees one row
    per (batch, window, type) partial, never one per event x window —
    at 100 TB the fan-out factor multiplies pre-aggregated partials,
    not shuffled rows).

    Window starts are aligned to hop boundaries (floor(ts/hop)*hop -
    i*hop for i in 0..span/hop-1); partial windows at the stream edges
    are emitted as-is (no watermark clipping), matching the SQL replay.

    Output: (win_us, event_type, n_events), win_us = window-start epoch
    microseconds."""
    fanout = span_us // hop_us
    ds = _read(sf_dir, "events", columns=["ts", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        micros = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        base = (micros // hop_us) * hop_us
        # fan each event into its `fanout` covering windows
        wins = (
            base[:, None] - np.arange(fanout, dtype=np.int64)[None, :] * hop_us
        ).ravel()
        types = t["event_type"].to_pandas().to_numpy().repeat(fanout)
        df = pd.DataFrame({"win_us": wins, "event_type": types})
        g = df.groupby(["win_us", "event_type"], as_index=False, sort=False).agg(
            n_events=("win_us", "size")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["win_us", "event_type"])
        .aggregate(Sum("n_events", alias_name="n_events"))
    )


def orders_filter_sort(sf_dir: str, k: int = 100):
    """Filter + multi-key sort + limit."""
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_totalprice", "o_orderstatus"])
    filtered = ds.map_batches(
        lambda t: t.filter(pc.equal(t["o_orderstatus"], "O")), batch_format="pyarrow"
    )
    return (
        filtered.sort(["o_orderdate", "o_orderkey"])
        .limit(k)
        .select_columns(["o_orderkey", "o_orderdate", "o_totalprice"])
    )


def supplier_part_stats(sf_dir: str):
    """part stats per brand: grouped count/sum/min/max — exercises the
    plain (no pre-agg) aggregate path; price summed in exact cents."""
    ds = _read(sf_dir, "part", columns=["p_brand", "p_retailprice", "p_size"])

    def cents(t: pa.Table) -> pa.Table:
        c = np.rint(t["p_retailprice"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return t.append_column("price_cents", pa.array(c, pa.int64()))

    agged = ds.map_batches(cents, batch_format="pyarrow").groupby("p_brand").aggregate(
        Count(alias_name="n_parts"),
        Sum("price_cents", alias_name="sum_price_cents"),
        Min("p_size", alias_name="min_size"),
        Max("p_size", alias_name="max_size"),
    )
    return agged.sort("p_brand")


# ------------------------------------------------- outer / semi joins


def cust_order_counts(sf_dir: str):
    """customer LEFT JOIN orders -> per-customer order count including
    zero-order customers. Shape: co-partitioned tagged union — both
    sides are pre-aggregated per batch to (key, n, left_flag) rows,
    then ONE groupby(key).aggregate(Sum) co-locates each key and a
    vectorized post-filter keeps keys that had a customer row. Nothing
    key-cardinality-sized ever touches the driver (per VERDICT r01 #3:
    the counts map is one row per customer — NOT broadcast-sized at
    100x scale)."""
    orders = _read(sf_dir, "orders", columns=["o_custkey"])
    cust = _read(sf_dir, "customer", columns=["c_custkey"])

    def o_partial(t: pa.Table) -> pa.Table:
        keys = t["o_custkey"].to_numpy(zero_copy_only=False)
        uniq, counts = np.unique(keys, return_counts=True)
        return pa.table(
            {
                "key": pa.array(uniq, pa.int64()),
                "n": pa.array(counts, pa.int64()),
                "left_flag": pa.array(np.zeros(len(uniq), dtype=np.int64)),
            }
        )

    def c_partial(t: pa.Table) -> pa.Table:
        keys = t["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "key": pa.array(keys, pa.int64()),
                "n": pa.array(np.zeros(len(keys), dtype=np.int64)),
                "left_flag": pa.array(np.ones(len(keys), dtype=np.int64)),
            }
        )

    both = cust.map_batches(c_partial, batch_format="pyarrow").union(
        orders.map_batches(o_partial, batch_format="pyarrow")
    )
    agged = both.groupby("key").aggregate(
        Sum("n", alias_name="n_orders"), Sum("left_flag", alias_name="n_cust_rows")
    )

    def finish(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["n_cust_rows"], 0))
        return pa.table(
            {
                "c_custkey": t["key"].cast(pa.int64()),
                "n_orders": t["n_orders"].cast(pa.int64()),
            }
        )

    return agged.map_batches(finish, batch_format="pyarrow")


def mktsegment_stats(sf_dir: str):
    """Distinct-count + conditional aggregate per market segment:
    COUNT(DISTINCT nation), negative-balance count, total. Distinct is
    two-phase: per-batch dedup of (segment, nation) pairs shrinks the
    shuffle to |segments| x |nations| rows."""
    ds = _read(sf_dir, "customer", columns=["c_mktsegment", "c_nationkey", "c_acctbal"])

    def partial(t: pa.Table) -> pa.Table:
        seg_codes, seg_vals = _dict_codes(t["c_mktsegment"])
        nat = t["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        neg = (t["c_acctbal"].to_numpy(zero_copy_only=False) < 0).astype(np.int64)
        order, starts = _group_runs(seg_codes, nat)
        if not len(starts):
            return pa.table(
                {
                    "c_mktsegment": pa.array([], pa.string()),
                    "c_nationkey": pa.array([], pa.int64()),
                    "n_negative": pa.array([], pa.int64()),
                    "n_cust": pa.array([], pa.int64()),
                }
            )
        runlen = np.diff(np.r_[starts, len(order)])
        return pa.table(
            {
                "c_mktsegment": seg_vals.take(
                    pa.array(seg_codes[order][starts], pa.int64())
                ).cast(pa.string()),
                "c_nationkey": pa.array(nat[order][starts], pa.int64()),
                "n_negative": pa.array(np.add.reduceat(neg[order], starts), pa.int64()),
                "n_cust": pa.array(runlen.astype(np.int64), pa.int64()),
            }
        )

    # two-phase exact distinct with no set/list columns in the shuffle
    # (VERDICT r02 #5): the (segment, nation) groupby both sums the
    # conditional aggregates AND dedups the pairs; the per-segment pass
    # then just counts rows.
    per_pair = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["c_mktsegment", "c_nationkey"])
        .aggregate(
            Sum("n_negative", alias_name="n_negative"), Sum("n_cust", alias_name="n_cust")
        )
    )

    def per_seg(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby("c_mktsegment", as_index=False).agg(
            n_nations=("c_nationkey", "size"),
            n_negative=("n_negative", "sum"),
            n_cust=("n_cust", "sum"),
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        per_pair.map_batches(per_seg, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(
            Sum("n_nations", alias_name="n_nations"),
            Sum("n_negative", alias_name="n_negative"),
            Sum("n_cust", alias_name="n_cust"),
        )
    )


def priority_line_counts(sf_dir: str):
    """TPC-H Q12-shaped conditional aggregate over lineitem x orders:
    per returnflag, how many lines belong to URGENT/HIGH orders vs the
    rest. Orders side via dim_side: under the budget a SORTED int64
    key array is broadcast (8 bytes/key, binary-search membership);
    above it, lineitem pre-aggregates to (orderkey, returnflag, n)
    and bucket-hash-joins the streaming orders flag projection."""
    mode, orders = dim_side(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_returnflag"])

    if mode == "broadcast":
        high = np.sort(
            orders.loc[
                orders["o_orderpriority"].isin(["1-URGENT", "2-HIGH"]), "o_orderkey"
            ].to_numpy(dtype=np.int64)
        )
        high_ref = ray.put(high)

        def li_high_partial(t: pa.Table, high) -> pa.Table:
            keys = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            if len(high):
                # membership via binary search on the sorted broadcast array
                pos = np.minimum(np.searchsorted(high, keys), len(high) - 1)
                is_high = high[pos] == keys
            else:
                is_high = np.zeros(len(keys), dtype=bool)
            df = pd.DataFrame(
                {
                    "l_returnflag": t["l_returnflag"].to_pandas(),
                    "is_high": is_high.astype(np.int64),
                }
            )
            g = df.groupby("l_returnflag", as_index=False).agg(
                high_line_count=("is_high", "sum"), n_lines=("is_high", "size")
            )
            return pa.Table.from_pandas(g, preserve_index=False)

        partials = broadcast_map_batches(li, li_high_partial, high_ref)
    else:

        def li_partial(t: pa.Table) -> pa.Table:
            df = pd.DataFrame(
                {
                    "l_orderkey": t["l_orderkey"].to_numpy(zero_copy_only=False),
                    "l_returnflag": t["l_returnflag"].to_pandas(),
                }
            )
            g = df.groupby(["l_orderkey", "l_returnflag"], as_index=False).size()
            return pa.Table.from_pandas(
                g.rename(columns={"size": "n"}), preserve_index=False
            )

        def o_flag(t: pa.Table) -> pa.Table:
            pri = t["o_orderpriority"]
            is_high = pc.or_(
                pc.equal(pri, "1-URGENT"), pc.equal(pri, "2-HIGH")
            ).cast(pa.int64())
            return pa.table(
                {"o_orderkey": t["o_orderkey"].cast(pa.int64()), "is_high": is_high}
            )

        li_agg = li.map_batches(li_partial, batch_format="pyarrow")
        flags = orders.map_batches(o_flag, batch_format="pyarrow")
        joined = bucket_hash_join(li_agg, flags, on="l_orderkey", right_on="o_orderkey")

        def part(t: pa.Table) -> pa.Table:
            n = t["n"].to_numpy(zero_copy_only=False)
            df = pd.DataFrame(
                {
                    "l_returnflag": t["l_returnflag"].to_pandas(),
                    "high": n * t["is_high"].to_numpy(zero_copy_only=False),
                    "n": n,
                }
            )
            g = df.groupby("l_returnflag", as_index=False).agg(
                high_line_count=("high", "sum"), n_lines=("n", "sum")
            )
            return pa.Table.from_pandas(g, preserve_index=False)

        partials = joined.map_batches(part, batch_format="pyarrow")
    agged = partials.groupby("l_returnflag").aggregate(
        Sum("high_line_count", alias_name="high_line_count"),
        Sum("n_lines", alias_name="n_lines"),
    )

    def low(t: pa.Table) -> pa.Table:
        lo = pc.subtract(t["n_lines"], t["high_line_count"])
        return t.append_column("low_line_count", lo)

    return agged.map_batches(low, batch_format="pyarrow")


def top_orders_per_segment(sf_dir: str, k: int = 3):
    """ROW_NUMBER() OVER (PARTITION BY segment ORDER BY totalprice
    DESC) <= k: broadcast the customer->segment map onto streaming
    orders, per-batch partial top-k per segment (so the shuffle sees
    <= k x segments rows per batch), then a per-segment final top-k
    with rank. Customer side via dim_side (broadcast map under the
    budget, bucketed hash join above it)."""
    mode, cust = dim_side(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def seg_topk(segs: np.ndarray, okey: np.ndarray, price: np.ndarray) -> pa.Table:
        # per-segment top-k by (price desc, orderkey asc) with no
        # pandas round-trip: factorize the few segment names, lexsort
        # (seg, -price, okey), keep rows whose rank within their run
        # is < k
        if not len(okey):
            return pa.table(
                {
                    "c_mktsegment": pa.array([], pa.string()),
                    "o_orderkey": pa.array([], pa.int64()),
                    "o_totalprice": pa.array([], pa.float64()),
                }
            )
        segs = np.asarray(segs, dtype=object)
        uniq, codes = np.unique(segs, return_inverse=True)
        order = np.lexsort((okey, -price, codes))
        c = codes[order]
        starts = np.r_[0, np.flatnonzero(c[1:] != c[:-1]) + 1]
        runlen = np.diff(np.r_[starts, len(c)])
        pos = np.arange(len(c), dtype=np.int64) - np.repeat(starts, runlen)
        keep = order[pos < k]
        return pa.table(
            {
                "c_mktsegment": pa.array(segs[keep], pa.string()),
                "o_orderkey": pa.array(okey[keep].astype(np.int64), pa.int64()),
                "o_totalprice": pa.array(price[keep], pa.float64()),
            }
        )

    if mode == "broadcast":
        seg_ref = ray.put(
            BroadcastMap(cust["c_custkey"].to_numpy(), cust["c_mktsegment"].to_numpy())
        )

        def seg_partial(t: pa.Table, seg) -> pa.Table:
            segs, _ = seg.lookup(t["o_custkey"].to_numpy(zero_copy_only=False))
            return seg_topk(
                segs,
                t["o_orderkey"].to_numpy(zero_copy_only=False),
                t["o_totalprice"].to_numpy(zero_copy_only=False),
            )

        partials = broadcast_map_batches(orders, seg_partial, seg_ref)
    else:
        joined = bucket_hash_join(orders, cust, on="o_custkey", right_on="c_custkey")
        partials = joined.map_batches(
            lambda t: seg_topk(
                t["c_mktsegment"].to_numpy(zero_copy_only=False),
                t["o_orderkey"].to_numpy(zero_copy_only=False),
                t["o_totalprice"].to_numpy(zero_copy_only=False),
            ),
            batch_format="pyarrow",
        )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True]).head(k)
        df = df.reset_index(drop=True)
        df["rnk"] = np.arange(1, len(df) + 1, dtype=np.int64)
        return df[["c_mktsegment", "rnk", "o_orderkey", "o_totalprice"]]

    return partials.groupby("c_mktsegment").map_groups(finish, batch_format="pandas")


def daily_active_users(sf_dir: str):
    """Events -> per-day distinct users + event count. Exact distinct
    with NO list/set columns in any shuffle (VERDICT r02 #5): phase 1
    pre-aggregates per batch then groupby(day, user_id) sums event
    counts; phase 2 groupby(day) counts the (now-distinct) user rows.
    Both shuffles move one fixed-width row per key — a hot day's user
    set never lands in one worker as a Python object."""
    ds = _read(sf_dir, "events", columns=["ts", "user_id"])

    def partial(t: pa.Table) -> pa.Table:
        micros = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {
                "day": micros // 86_400_000_000,
                "user_id": t["user_id"].to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby(["day", "user_id"], as_index=False).size()
        return pa.Table.from_pandas(g.rename(columns={"size": "n"}), preserve_index=False)

    per_user = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["day", "user_id"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def per_day(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "day": t["day"].to_numpy(zero_copy_only=False),
                "n": t["n"].to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby("day", as_index=False).agg(dau=("n", "size"), n_events=("n", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        per_user.map_batches(per_day, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("dau", alias_name="dau"), Sum("n_events", alias_name="n_events"))
    )


# ------------------------------------------------ scalar-function ops


def orders_by_month(sf_dir: str):
    """Calendar date functions: orders per year-month with exact-cents
    totals (strftime bucketing inside map_batches, tiny grouped Sum)."""
    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["ym"] = df["o_orderdate"].dt.strftime("%Y-%m")
        df["cents"] = np.rint(df["o_totalprice"].to_numpy() * 100).astype(np.int64)
        g = df.groupby("ym", as_index=False).agg(
            n_orders=("cents", "size"), sum_total_cents=("cents", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("ym")
        .aggregate(
            Sum("n_orders", alias_name="n_orders"),
            Sum("sum_total_cents", alias_name="sum_total_cents"),
        )
        .sort("ym")
    )


def customer_name_match(sf_dir: str, needle: str = "7"):
    """String predicate + projection: customers whose name contains the
    needle, counted per segment (Arrow match_substring, no Python rows)."""
    ds = _read(sf_dir, "customer", columns=["c_name", "c_mktsegment"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.match_substring(t["c_name"], needle))
        df = t.to_pandas()
        g = df.groupby("c_mktsegment", as_index=False).agg(n_matched=("c_name", "size"))
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(Sum("n_matched", alias_name="n_matched"))
    )


class BroadcastMap:
    """Vectorized broadcast-join kernel: int64 keys sorted once, values
    taken by binary search — no per-row Python in the hot path (VERDICT
    r01 #2/#6). Build once on the driver, ray.put, fetch per worker."""

    def __init__(self, keys, values):
        keys = np.asarray(keys, dtype=np.int64)
        order = np.argsort(keys, kind="stable")
        self.keys = keys[order]
        self.values = np.asarray(values, dtype=object)[order]

    def lookup(self, q: np.ndarray):
        """-> (values array with None for misses, found mask)."""
        q = np.asarray(q, dtype=np.int64)
        if len(self.keys) == 0:
            return np.full(len(q), None, dtype=object), np.zeros(len(q), dtype=bool)
        pos = np.minimum(np.searchsorted(self.keys, q), len(self.keys) - 1)
        found = self.keys[pos] == q
        out = self.values[pos].copy()
        out[~found] = None
        return out, found


# Task-mode broadcast stages (the PIP-join pattern): the broadcast
# object is immutable, so plain tasks + a per-worker-process ray.get
# cache beat a (1, 4) autoscaling actor pool — the pool ramps from ONE
# actor and serializes most of the stage behind spawn latency, while
# tasks use every CPU immediately with work stealing.
_WORKER_BCAST: dict = {}


def _bcast_task(batch: pa.Table, ref, fn):
    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    obj = _WORKER_BCAST.get(key)
    if obj is None:
        obj = ray.get(ref)
        _WORKER_BCAST[key] = obj
    return fn(batch, obj)


def broadcast_map_batches(ds: ray.data.Dataset, fn, ref) -> ray.data.Dataset:
    """map_batches(fn(batch, broadcast_obj)) in task mode with the
    broadcast fetched once per worker process (keyed by ObjectRef)."""
    return ds.map_batches(
        _bcast_task, fn_kwargs={"ref": ref, "fn": fn}, batch_format="pyarrow"
    )


def _hash_bucket(keys: np.ndarray, n_parts: int) -> np.ndarray:
    return np.abs((keys.astype(np.int64) * np.int64(2654435761)) % np.int64(n_parts))


def _n_partitions() -> int:
    """Partition count for hash-bucketed per-key shapes: a groupby on
    the raw key runs one Python map_groups call per (tiny) key group;
    bucketing the key first gives ~4xCPU vectorized partition calls
    that process every key in the partition with numpy."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(16, 4 * cpus)


def user_sessions(sf_dir: str, gap_minutes: int = 30):
    """Gap-based session windows over the events stream: a user's
    events more than `gap_minutes` apart start a new session.

    Shape: ONE shuffle on bucket = hash(user_id) % (4x cpus); inside a
    partition every user sessionizes in the same numpy pass (lexsort by
    (user, ts), session starts = user-change OR over-gap, reduceat for
    per-session min/max/count). Ties in ts are harmless (gap 0 keeps
    them in one session regardless of tie order)."""
    gap_us = gap_minutes * 60 * 1_000_000
    n_parts = _n_partitions()
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def to_us(t: pa.Table) -> pa.Table:
        us = t["ts"].cast(pa.int64())
        uid = t["user_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": pa.array(uid, pa.int64()),
                "us": us,
                "__bucket": pa.array(_hash_bucket(uid, n_parts), pa.int64()),
            }
        )

    def sessionize_bucket(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        us = t["us"].to_numpy(zero_copy_only=False)
        order = np.lexsort((us, uid))
        uid, us = uid[order], us[order]
        n = len(uid)
        if n == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "session_idx": pa.array([], pa.int64()),
                    "start_us": pa.array([], pa.int64()),
                    "end_us": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                }
            )
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = uid[1:] != uid[:-1]
        new_sess = new_user.copy()
        new_sess[1:] |= (us[1:] - us[:-1]) > gap_us
        starts = np.nonzero(new_sess)[0]
        ends = np.concatenate([starts[1:], [n]])
        # per-user 1-based session index: global session ordinal minus
        # the ordinal of the user's first session
        sess_ord = np.arange(len(starts), dtype=np.int64)
        user_first = np.maximum.accumulate(np.where(new_user[starts], sess_ord, 0))
        return pa.table(
            {
                "user_id": pa.array(uid[starts], pa.int64()),
                "session_idx": pa.array(sess_ord - user_first + 1, pa.int64()),
                "start_us": pa.array(us[starts], pa.int64()),
                "end_us": pa.array(us[ends - 1], pa.int64()),
                "n_events": pa.array(ends - starts, pa.int64()),
            }
        )

    return (
        ds.map_batches(to_us, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(sessionize_bucket, batch_format="pyarrow")
    )


def user_event_deltas(sf_dir: str):
    """LAG window over the events stream: per user, in (ts, event_id)
    order, the microseconds since the user's previous event and the
    value change from it (first event per user -> nulls). The standard
    per-entity time-series featurization (inter-arrival gaps, deltas).

    Shape: the user_sessions shape — ONE shuffle on bucket =
    hash(user_id) % (4x cpus); inside a partition every user's lag
    computes in the same numpy pass (lexsort by (user, ts, event_id),
    shifted diffs, user-change positions masked to null). event_id
    breaks ts ties so the order — and the oracle's LAG — is total."""
    n_parts = _n_partitions()
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])

    def to_us(t: pa.Table) -> pa.Table:
        uid = t["user_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": pa.array(uid, pa.int64()),
                "us": t["ts"].cast(pa.int64()),
                "value_c": pa.array(
                    np.rint(
                        t["value"].to_numpy(zero_copy_only=False) * 100
                    ).astype(np.int64),
                    pa.int64(),
                ),
                "__bucket": pa.array(_hash_bucket(uid, n_parts), pa.int64()),
            }
        )

    def lag_bucket(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        us = t["us"].to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        val = t["value_c"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, us, uid))
        uid, us, eid, val = uid[order], us[order], eid[order], val[order]
        n = len(uid)
        gap = np.empty(n, dtype=np.int64)
        dval = np.empty(n, dtype=np.int64)
        first = np.empty(n, dtype=bool)
        first[:1] = True
        if n:
            first[1:] = uid[1:] != uid[:-1]
            gap[1:] = us[1:] - us[:-1]
            dval[1:] = val[1:] - val[:-1]
            gap[0] = dval[0] = 0
        mask = pa.array(~first)
        return pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "user_id": pa.array(uid, pa.int64()),
                "gap_us": pc.if_else(
                    mask, pa.array(gap, pa.int64()), pa.scalar(None, pa.int64())
                ),
                "dvalue_cents": pc.if_else(
                    mask, pa.array(dval, pa.int64()), pa.scalar(None, pa.int64())
                ),
            }
        )

    return (
        ds.map_batches(to_us, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(lag_bucket, batch_format="pyarrow")
    )


def weekly_retention(sf_dir: str):
    """Cohort retention: per ISO week, how many active users were also
    active the NEXT week (the activation/retention curve primitive).

    Shape: per-batch distinct (user, week) partials collapse the event
    stream; ONE hash(user)-bucket shuffle co-locates each user's weeks;
    inside a partition the week-over-week match is a sorted
    searchsorted against week+1 (no self-join shuffle); per-week
    partial counts then roll up in a tiny final groupby.

    Output: week (epoch days / 7), n_active, n_retained (active in
    week AND week+1; the last week has n_retained counted against the
    week after it, 0 if none)."""
    n_parts = _n_partitions()
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        uid = t["user_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        week = (t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
                // (7 * 86_400_000_000))
        order = np.lexsort((week, uid))
        uid, week = uid[order], week[order]
        if len(uid):
            dup = np.concatenate(
                ([False], (uid[1:] == uid[:-1]) & (week[1:] == week[:-1]))
            )
            uid, week = uid[~dup], week[~dup]
        return pa.table(
            {
                "user_id": pa.array(uid, pa.int64()),
                "week": pa.array(week, pa.int64()),
                "__bucket": pa.array(_hash_bucket(uid, n_parts), pa.int64()),
            }
        )

    def retain_bucket(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        week = t["week"].to_numpy(zero_copy_only=False)
        order = np.lexsort((week, uid))
        uid, week = uid[order], week[order]
        # distinct again (rows from different batches may repeat)
        if len(uid):
            dup = np.concatenate(
                ([False], (uid[1:] == uid[:-1]) & (week[1:] == week[:-1]))
            )
            uid, week = uid[~dup], week[~dup]
        n = len(uid)
        retained = np.zeros(n, dtype=bool)
        if n:
            # sorted (uid, week): the next row is the user's next week
            nxt_same = np.concatenate((uid[1:] == uid[:-1], [False]))
            nxt_inc = np.concatenate((week[1:] == week[:-1] + 1, [False]))
            retained = nxt_same & nxt_inc
        uw, inv = np.unique(week, return_inverse=True)
        act = np.bincount(inv, minlength=len(uw)).astype(np.int64)
        ret = np.bincount(inv, weights=retained, minlength=len(uw)).astype(np.int64)
        return pa.table(
            {
                "week": pa.array(uw, pa.int64()),
                "n_active": pa.array(act, pa.int64()),
                "n_retained": pa.array(ret, pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(retain_bucket, batch_format="pyarrow")
        .groupby("week")
        .aggregate(
            Sum("n_active", alias_name="n_active"),
            Sum("n_retained", alias_name="n_retained"),
        )
    )


def orders_rollup(sf_dir: str):
    """GROUP BY ROLLUP(priority, status): subtotal rows at every prefix
    level — (priority, status), (priority), and the grand total — the
    OLAP cube/rollup surface Ray Data has no primitive for.

    Shape: ONE two-phase groupby at the finest level; the coarser
    levels re-aggregate that already-tiny table (the tile-pyramid
    aggregate-then-rollup pattern — the fact table is scanned once).
    NULL plays the SQL subtotal marker. Money kept in integer cents.

    Output: o_orderpriority | null, o_orderstatus | null, n_orders,
    total_cents."""
    ds = _read(sf_dir, "orders", columns=["o_orderpriority", "o_orderstatus", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        pri_codes, pri_vals = _dict_codes(t["o_orderpriority"])
        st_codes, st_vals = _dict_codes(t["o_orderstatus"])
        cents = np.rint(t["o_totalprice"].to_numpy(zero_copy_only=False) * 100).astype(
            np.int64
        )
        order, starts = _group_runs(pri_codes, st_codes)
        if not len(starts):
            return pa.table(
                {
                    "o_orderpriority": pa.array([], pa.string()),
                    "o_orderstatus": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                    "c": pa.array([], pa.int64()),
                }
            )
        runlen = np.diff(np.r_[starts, len(order)])
        return pa.table(
            {
                "o_orderpriority": pri_vals.take(
                    pa.array(pri_codes[order][starts], pa.int64())
                ).cast(pa.string()),
                "o_orderstatus": st_vals.take(
                    pa.array(st_codes[order][starts], pa.int64())
                ).cast(pa.string()),
                "n": pa.array(runlen.astype(np.int64), pa.int64()),
                "c": pa.array(np.add.reduceat(cents[order], starts), pa.int64()),
            }
        )

    fine = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["o_orderpriority", "o_orderstatus"])
        .aggregate(Sum("n", alias_name="n_orders"), Sum("c", alias_name="total_cents"))
    ).materialize()  # feeds three consumers; O(priorities x statuses) rows

    def level(keep_priority: bool, keep_status: bool):
        def f(t: pa.Table) -> pa.Table:
            import pandas as pd

            df = t.to_pandas()
            if not keep_status:
                df["o_orderstatus"] = None
            if not keep_priority:
                df["o_orderpriority"] = None
            keys = ["o_orderpriority", "o_orderstatus"]
            g = (
                df.groupby(keys, dropna=False, sort=False)
                .agg(n_orders=("n_orders", "sum"), total_cents=("total_cents", "sum"))
                .reset_index()
            )
            return pa.table(
                {
                    "o_orderpriority": pa.array(
                        [None if pd.isna(v) else v for v in g["o_orderpriority"]],
                        pa.string(),
                    ),
                    "o_orderstatus": pa.array(
                        [None if pd.isna(v) else v for v in g["o_orderstatus"]],
                        pa.string(),
                    ),
                    "n_orders": pa.array(
                        g["n_orders"].to_numpy().astype(np.int64), pa.int64()
                    ),
                    "total_cents": pa.array(
                        g["total_cents"].to_numpy().astype(np.int64), pa.int64()
                    ),
                }
            )

        return f

    # the fine table is O(groups); each coarser level is one cheap
    # map over it (repartition(1) so the whole level reduces at once)
    finest = fine.map_batches(level(True, True), batch_format="pyarrow")
    by_priority = fine.repartition(1).map_batches(
        level(True, False), batch_format="pyarrow"
    )
    grand = fine.repartition(1).map_batches(
        level(False, False), batch_format="pyarrow"
    )
    return finest.union(by_priority).union(grand)


def orders_cube(sf_dir: str):
    """GROUP BY CUBE(priority, status): every grouping set — (priority,
    status), (priority), (status), and the grand total. The full-cube
    sibling of orders_rollup (which emits only the prefix sets); the
    extra (status) level is one more cheap re-aggregation over the
    same O(groups) fine table, so the fact table is STILL scanned
    once whatever the number of grouping sets — the property that
    matters at 100 TB, where each extra fact scan is the cost.

    Output: o_orderpriority | null, o_orderstatus | null, n_orders,
    total_cents."""
    # compose over the rollup's three levels plus the (status) set,
    # derived from the SAME single fact scan: orders_rollup's fine
    # table is rebuilt here rather than shared because each query is
    # independently registered; the two-phase partial keeps it cheap
    ds = _read(
        sf_dir, "orders", columns=["o_orderpriority", "o_orderstatus", "o_totalprice"]
    )

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "o_orderpriority": t["o_orderpriority"].to_pandas(),
                "o_orderstatus": t["o_orderstatus"].to_pandas(),
                "cents": np.rint(
                    t["o_totalprice"].to_numpy(zero_copy_only=False) * 100
                ).astype(np.int64),
            }
        )
        g = (
            df.groupby(["o_orderpriority", "o_orderstatus"], sort=False)
            .agg(n=("cents", "size"), c=("cents", "sum"))
            .reset_index()
        )
        return pa.table(
            {
                "o_orderpriority": pa.array(g["o_orderpriority"], pa.string()),
                "o_orderstatus": pa.array(g["o_orderstatus"], pa.string()),
                "n": pa.array(g["n"].to_numpy().astype(np.int64), pa.int64()),
                "c": pa.array(g["c"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    fine = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["o_orderpriority", "o_orderstatus"])
        .aggregate(Sum("n", alias_name="n_orders"), Sum("c", alias_name="total_cents"))
    ).materialize()  # feeds four consumers; O(priorities x statuses) rows

    def level(keep_priority: bool, keep_status: bool):
        def f(t: pa.Table) -> pa.Table:
            df = t.to_pandas()
            if not keep_status:
                df["o_orderstatus"] = None
            if not keep_priority:
                df["o_orderpriority"] = None
            keys = ["o_orderpriority", "o_orderstatus"]
            g = (
                df.groupby(keys, dropna=False, sort=False)
                .agg(n_orders=("n_orders", "sum"), total_cents=("total_cents", "sum"))
                .reset_index()
            )
            return pa.table(
                {
                    "o_orderpriority": pa.array(
                        [None if pd.isna(v) else v for v in g["o_orderpriority"]],
                        pa.string(),
                    ),
                    "o_orderstatus": pa.array(
                        [None if pd.isna(v) else v for v in g["o_orderstatus"]],
                        pa.string(),
                    ),
                    "n_orders": pa.array(
                        g["n_orders"].to_numpy().astype(np.int64), pa.int64()
                    ),
                    "total_cents": pa.array(
                        g["total_cents"].to_numpy().astype(np.int64), pa.int64()
                    ),
                }
            )

        return f

    out = fine.map_batches(level(True, True), batch_format="pyarrow")
    for kp, ks in ((True, False), (False, True), (False, False)):
        out = out.union(
            fine.repartition(1).map_batches(level(kp, ks), batch_format="pyarrow")
        )
    return out


def funnel_users(sf_dir: str, first: str = "click", then: str = "purchase"):
    """Funnel conversion: users with a `first` event strictly before a
    `then` event. The temporal-precedence predicate EXISTS(t1 < t2)
    reduces exactly to MIN(ts | first) < MAX(ts | then) — so the whole
    sequence pattern is ONE two-phase grouped aggregate (per-batch
    conditional min/max partials, tiny user-key shuffle), never a
    per-user ordered scan.

    Output: user_id, first_click_us, last_purchase_us (converted
    users only)."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_type", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        uid = t["user_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        # vectorized per-batch conditional min/max per user
        uniq, inv = np.unique(uid, return_inverse=True)
        big = np.iinfo(np.int64).max
        small = np.iinfo(np.int64).min
        amin = np.full(len(uniq), big, np.int64)
        bmax = np.full(len(uniq), small, np.int64)
        m1 = et == first
        np.minimum.at(amin, inv[m1], us[m1])
        m2 = et == then
        np.maximum.at(bmax, inv[m2], us[m2])
        return pa.table(
            {
                "user_id": pa.array(uniq, pa.int64()),
                "a": pa.array(amin, pa.int64()),
                "b": pa.array(bmax, pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Min("a", alias_name="a"), Max("b", alias_name="b"))
    )

    def finish(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        keep = (a != np.iinfo(np.int64).max) & (b != np.iinfo(np.int64).min) & (a < b)
        t = t.filter(pa.array(keep))
        return pa.table(
            {
                "user_id": t["user_id"],
                "first_click_us": t["a"],
                "last_purchase_us": t["b"],
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def part_pair_counts(sf_dir: str, min_orders: int = 2):
    """Market-basket co-occurrence: pairs of distinct parts appearing
    in the same order, counted across orders, kept when they co-occur
    in >= min_orders orders (the classic association-mining primitive).

    Shape: ONE hash-bucket shuffle on orderkey co-locates each order's
    lines; within a partition pair generation is pure index arithmetic
    (sorted groups -> repeat/cumsum, no Python per order) with a
    per-partition np.unique pre-count, so the second (pair-key) shuffle
    moves one row per distinct pair per partition. Fan-out is bounded:
    lines-per-order is small and fixed by the schema, so pairs/order
    is O(g^2) of a BOUNDED g at any corpus scale.

    Output: part_a < part_b, n_orders."""
    n_parts = _n_partitions()
    ds = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def bucket(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "ok": pa.array(ok, pa.int64()),
                "pk": t["l_partkey"].cast(pa.int64()),
                "__bucket": pa.array(_hash_bucket(ok, n_parts), pa.int64()),
            }
        )

    def pairs_bucket(t: pa.Table) -> pa.Table:
        ok = t["ok"].to_numpy(zero_copy_only=False)
        pk = t["pk"].to_numpy(zero_copy_only=False)
        # distinct (order, part), sorted by (order, part)
        order = np.lexsort((pk, ok))
        ok, pk = ok[order], pk[order]
        if len(ok):
            dup = np.concatenate(([False], (ok[1:] == ok[:-1]) & (pk[1:] == pk[:-1])))
            ok, pk = ok[~dup], pk[~dup]
        n = len(ok)
        empty = pa.table(
            {
                "part_a": pa.array([], pa.int64()),
                "part_b": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            }
        )
        if n == 0:
            return empty
        starts = np.concatenate(([0], np.flatnonzero(ok[1:] != ok[:-1]) + 1))
        ends = np.concatenate((starts[1:], [n]))
        ends_of = np.repeat(ends, ends - starts)
        pos = np.arange(n, dtype=np.int64)
        reps = ends_of - pos - 1  # partners after each element in its group
        total = int(reps.sum())
        if total == 0:
            return empty
        a_idx = np.repeat(pos, reps)
        run0 = np.concatenate(([0], np.cumsum(reps)[:-1]))
        b_idx = np.arange(total, dtype=np.int64) - np.repeat(run0, reps) + a_idx + 1
        a, b = pk[a_idx], pk[b_idx]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        # per-partition pre-count so the pair shuffle moves one row per
        # distinct pair, not one per occurrence
        # pack the pair into ONE int64 key (a << 32 | b): the final
        # pair-count shuffle then groups a single fixed-width column
        # instead of a two-key composite — measurably cheaper at sf0.1
        # (15.6 s -> see BASELINE) and the dominant cost here. Valid
        # while partkeys < 2^31; guarded below.
        if len(hi) and int(max(lo.max(), hi.max())) >= (1 << 31):
            raise ValueError("part_pair_counts: partkey >= 2^31, widen the pack")
        pk64 = (lo << np.int64(32)) | hi
        pk64, cnts = np.unique(pk64, return_counts=True)
        return pa.table(
            {
                "pair": pa.array(pk64, pa.int64()),
                "n": pa.array(cnts.astype(np.int64), pa.int64()),
                # second-stage co-partition key: Ray's generic Aggregate
                # over millions of 1-row groups costs ~140us/row; a
                # bucketed vectorized reduce is ~100x cheaper
                "__bucket": pa.array(_hash_bucket(pk64, n_parts), pa.int64()),
            }
        )

    def sum_bucket(t: pa.Table) -> pa.Table:
        pair = t["pair"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False)
        order = np.argsort(pair)
        pair, n = pair[order], n[order]
        starts = (
            np.concatenate(([0], np.flatnonzero(pair[1:] != pair[:-1]) + 1))
            if len(pair)
            else np.array([], np.int64)
        )
        totals = np.add.reduceat(n, starts) if len(pair) else np.array([], np.int64)
        upair = pair[starts]
        keep = totals >= min_orders
        upair, totals = upair[keep], totals[keep]
        return pa.table(
            {
                "part_a": pa.array(upair >> np.int64(32), pa.int64()),
                "part_b": pa.array(upair & np.int64(0xFFFFFFFF), pa.int64()),
                "n_orders": pa.array(totals.astype(np.int64), pa.int64()),
            }
        )

    return (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(pairs_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(sum_bucket, batch_format="pyarrow")
    )


def user_event_zscores(sf_dir: str):
    """Per-user standardization of event values (the group-wise feature
    normalization op): z = (x - mean_u) / std_u over each user's
    events, population std; single-event users (std 0) -> null.

    Shape: user_event_deltas' shape — ONE shuffle on bucket =
    hash(user_id) % (4x cpus); inside a partition every user's
    mean/std computes in the same vectorized pass (lexsort by user,
    reduceat over group boundaries). z is micro-quantized so the
    DuckDB AVG/STDDEV_POP replay (different summation order, ~1e-16
    relative) lands on identical integers.

    Output: event_id, user_id, z_micro (null when std == 0)."""
    n_parts = _n_partitions()
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "value"])

    def bucket(t: pa.Table) -> pa.Table:
        uid = t["user_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": pa.array(uid, pa.int64()),
                "value": t["value"],
                "__bucket": pa.array(_hash_bucket(uid, n_parts), pa.int64()),
            }
        )

    def z_bucket(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        val = t["value"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, uid))
        uid, eid, val = uid[order], eid[order], val[order]
        n = len(uid)
        if n == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "z_micro": pa.array([], pa.int64()),
                }
            )
        starts = np.concatenate(([0], np.flatnonzero(uid[1:] != uid[:-1]) + 1))
        counts = np.diff(np.concatenate((starts, [n])))
        sums = np.add.reduceat(val, starts)
        means = sums / counts
        mean_of = np.repeat(means, counts)
        dev = val - mean_of
        var = np.add.reduceat(dev * dev, starts) / counts
        std_of = np.repeat(np.sqrt(var), counts)
        with np.errstate(divide="ignore", invalid="ignore"):
            z = dev / std_of
        micro = np.floor(z * 1e6 + 0.5)
        valid = pa.array(std_of > 0)
        return pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "user_id": pa.array(uid, pa.int64()),
                "z_micro": pc.if_else(
                    valid,
                    pa.array(
                        np.where(std_of > 0, micro, 0).astype(np.int64), pa.int64()
                    ),
                    pa.scalar(None, pa.int64()),
                ),
            }
        )

    return (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(z_bucket, batch_format="pyarrow")
    )


def asof_last_order(sf_dir: str):
    """AS-OF join (an operator Ray Data has no primitive for): each
    event joins the latest order of the same customer at-or-before the
    event time. Both sides are co-partitioned by key in ONE shuffle
    (tagged union -> groupby user), then the per-key merge is a sorted
    searchsorted — the partitioning assumption is only that one key's
    rows fit in one group, the standard as-of contract. Events with no
    prior order get last_order_us = -1 (not NULL, keeping the oracle
    hash well-defined)."""
    events = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])

    def ev(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"].cast(pa.int64()),
                "event_id": t["event_id"].cast(pa.int64()),
                "us": t["ts"].cast(pa.int64()),
                "side": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
            }
        )

    def od(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["o_custkey"].cast(pa.int64()),
                "event_id": pa.array(np.full(t.num_rows, -1, dtype=np.int64)),
                "us": t["o_orderdate"].cast(pa.int64()),
                "side": pa.array(np.ones(t.num_rows, dtype=np.int8)),
            }
        )

    n_parts = _n_partitions()

    def bucketed(f):
        def g(t: pa.Table) -> pa.Table:
            t = f(t)
            uid = t["user_id"].to_numpy(zero_copy_only=False)
            return t.append_column(
                "__bucket", pa.array(_hash_bucket(uid, n_parts), pa.int64())
            )

        return g

    both = events.map_batches(bucketed(ev), batch_format="pyarrow").union(
        orders.map_batches(bucketed(od), batch_format="pyarrow")
    )

    def merge_bucket(t: pa.Table) -> pa.Table:
        """All keys of one hash bucket in a single numpy pass: rows
        lex-sorted by (user, us, orders-before-events-on-tie); the
        as-of order timestamp is a running per-user max of order us
        (us ascending makes latest == max), computed with one
        maximum.accumulate — the cross-user leak is impossible because
        a user's rows are contiguous, so the max order INDEX at-or-
        before an event is same-user iff that user has a prior order,
        which the user-of-last-order check enforces."""
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        us = t["us"].to_numpy(zero_copy_only=False)
        side = t["side"].to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        n = len(uid)
        if n == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "last_order_us": pa.array([], pa.int64()),
                }
            )
        # orders (side=1) sort BEFORE events on equal us (at-or-before)
        order = np.lexsort((1 - side, us, uid))
        uid, us, side, eid = uid[order], us[order], side[order], eid[order]
        is_order = side == 1
        idx = np.arange(n, dtype=np.int64)
        last_order_idx = np.maximum.accumulate(np.where(is_order, idx, -1))
        ev_mask = ~is_order
        li = last_order_idx[ev_mask]
        safe = np.maximum(li, 0)
        ok = (li >= 0) & (uid[safe] == uid[ev_mask])
        last = np.where(ok, us[safe], -1)
        return pa.table(
            {
                "event_id": pa.array(eid[ev_mask], pa.int64()),
                "user_id": pa.array(uid[ev_mask], pa.int64()),
                "last_order_us": pa.array(last.astype(np.int64), pa.int64()),
            }
        )

    return both.groupby("__bucket").map_groups(merge_bucket, batch_format="pyarrow")


def event_session_assignment(
    sf_dir: str, gap_minutes: int = 30, broadcast: bool = False
):
    """RANGE (interval-containment) join: every event joins the session
    interval [start_us, end_us] that contains it, per user.

    Default shape is the co-partitioned range join (VERDICT r01 #4/#7):
    events and session intervals meet in ONE shuffle — tagged union ->
    groupby(user_id) -> per-group vectorized searchsorted — the same
    contract as asof_last_order (one key's rows fit one group). The
    interval side is O(users x sessions): never driver- or
    broadcast-sized at scale. `broadcast=True` keeps the
    broadcast-range-join shape as a small-side optimization."""
    if not broadcast:
        sessions = user_sessions(sf_dir, gap_minutes)
        events = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])

        def ev(t: pa.Table) -> pa.Table:
            n = t.num_rows
            return pa.table(
                {
                    "user_id": t["user_id"].cast(pa.int64()),
                    "a": t["ts"].cast(pa.int64()),
                    "b": pa.array(np.zeros(n, dtype=np.int64)),
                    "idx": t["event_id"].cast(pa.int64()),
                    "side": pa.array(np.zeros(n, dtype=np.int8)),
                }
            )

        def se(t: pa.Table) -> pa.Table:
            n = t.num_rows
            return pa.table(
                {
                    "user_id": t["user_id"].cast(pa.int64()),
                    "a": t["start_us"].cast(pa.int64()),
                    "b": t["end_us"].cast(pa.int64()),
                    "idx": t["session_idx"].cast(pa.int64()),
                    "side": pa.array(np.ones(n, dtype=np.int8)),
                }
            )

        n_parts = _n_partitions()

        def bucketed(f):
            def g(t: pa.Table) -> pa.Table:
                t = f(t)
                uid = t["user_id"].to_numpy(zero_copy_only=False)
                return t.append_column(
                    "__bucket", pa.array(_hash_bucket(uid, n_parts), pa.int64())
                )

            return g

        both = events.map_batches(bucketed(ev), batch_format="pyarrow").union(
            sessions.map_batches(bucketed(se), batch_format="pyarrow")
        )

        def assign_bucket(t: pa.Table) -> pa.Table:
            """All keys of one hash bucket in a single numpy pass:
            lex-sort by (user, time, intervals-before-events-on-tie),
            running per-user last interval row via maximum.accumulate,
            then the containment check ev_us <= end."""
            uid = t["user_id"].to_numpy(zero_copy_only=False)
            a = t["a"].to_numpy(zero_copy_only=False)
            b = t["b"].to_numpy(zero_copy_only=False)
            idx = t["idx"].to_numpy(zero_copy_only=False)
            side = t["side"].to_numpy(zero_copy_only=False)
            n = len(uid)
            if n == 0:
                return pa.table(
                    {
                        "event_id": pa.array([], pa.int64()),
                        "user_id": pa.array([], pa.int64()),
                        "session_idx": pa.array([], pa.int64()),
                    }
                )
            # sessions (side=1) sort BEFORE events on equal timestamp
            # (an event at a session's exact start belongs to it)
            order = np.lexsort((-side, a, uid))
            uid, a, b, idx, side = (
                uid[order],
                a[order],
                b[order],
                idx[order],
                side[order],
            )
            is_sess = side == 1
            rows = np.arange(n, dtype=np.int64)
            last_sess = np.maximum.accumulate(np.where(is_sess, rows, -1))
            em = ~is_sess
            li = last_sess[em]
            safe = np.maximum(li, 0)
            ok = (li >= 0) & (uid[safe] == uid[em]) & (a[em] <= b[safe])
            out = np.where(ok, idx[safe], -1)
            return pa.table(
                {
                    "event_id": pa.array(idx[em], pa.int64()),
                    "user_id": pa.array(uid[em], pa.int64()),
                    "session_idx": pa.array(out.astype(np.int64), pa.int64()),
                }
            )

        return both.groupby("__bucket").map_groups(assign_bucket, batch_format="pyarrow")

    sessions = user_sessions(sf_dir, gap_minutes).to_pandas()
    per_user: dict = {}
    for uid, g in sessions.groupby("user_id"):
        g = g.sort_values("start_us")
        per_user[int(uid)] = (
            g["start_us"].to_numpy(),
            g["end_us"].to_numpy(),
            g["session_idx"].to_numpy(),
        )
    ref = ray.put(per_user)

    events = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])

    def assign(t: pa.Table, per_user) -> pa.Table:
        uids = t["user_id"].to_numpy(zero_copy_only=False)
        us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eids = t["event_id"].to_numpy(zero_copy_only=False)
        out = np.full(len(uids), -1, dtype=np.int64)
        for uid in np.unique(uids):
            entry = per_user.get(int(uid))
            if entry is None:
                continue
            starts, ends, idxs = entry
            m = uids == uid
            pos = np.searchsorted(starts, us[m], side="right") - 1
            ok = (pos >= 0) & (us[m] <= ends[np.maximum(pos, 0)])
            vals = np.where(ok, idxs[np.maximum(pos, 0)], -1)
            out[m] = vals
        return pa.table(
            {
                "event_id": pa.array(eids, pa.int64()),
                "user_id": pa.array(uids.astype(np.int64), pa.int64()),
                "session_idx": pa.array(out, pa.int64()),
            }
        )

    return broadcast_map_batches(events, assign, ref)


def order_price_quantiles(sf_dir: str, qs=(0.5, 0.9)):
    """Exact grouped quantiles (DuckDB quantile_disc semantics: the
    element at rank ceil(q*n)-1 of the sorted group): per market
    segment, p50/p90 of order totals in exact cents. The broadcast
    customer->segment map rides ray.put; the groupby sees per-batch
    (segment, cents) rows and each of the few segment groups computes
    its quantiles from one sorted array. Partitioning contract: one
    group's values fit one worker (segments are low-cardinality); for
    high-cardinality keys or over-worker groups, use a quantile sketch
    instead of the exact path. Customer side via dim_side (broadcast
    map under the budget, bucketed hash join above it)."""
    mode, cust = dim_side(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    if mode == "broadcast":
        seg_ref = ray.put(
            BroadcastMap(cust["c_custkey"].to_numpy(), cust["c_mktsegment"].to_numpy())
        )

        def ToCents(t: pa.Table, seg) -> pa.Table:  # noqa: N802 — stage name
            cents = np.rint(
                t["o_totalprice"].to_numpy(zero_copy_only=False) * 100
            ).astype(np.int64)
            segs, _ = seg.lookup(t["o_custkey"].to_numpy(zero_copy_only=False))
            return pa.table(
                {
                    "c_mktsegment": pa.array(segs.tolist(), pa.string()),
                    "cents": pa.array(cents, pa.int64()),
                }
            )
    else:
        joined = bucket_hash_join(orders, cust, on="o_custkey", right_on="c_custkey")

        def ToCents(t: pa.Table) -> pa.Table:  # noqa: N802 — same stage, bucketed input
            cents = np.rint(
                t["o_totalprice"].to_numpy(zero_copy_only=False) * 100
            ).astype(np.int64)
            return pa.table(
                {
                    "c_mktsegment": t["c_mktsegment"].cast(pa.string()),
                    "cents": pa.array(cents, pa.int64()),
                }
            )

        orders = joined

    def quantiles(g: pa.Table) -> pa.Table:
        vals = np.sort(g["cents"].to_numpy(zero_copy_only=False))
        n = len(vals)
        row = {"c_mktsegment": [g["c_mktsegment"][0].as_py()], "n_orders": [n]}
        for q in qs:
            idx = max(0, int(np.ceil(q * n)) - 1)
            row[f"p{int(q * 100)}_cents"] = [int(vals[idx])]
        return pa.table(
            {
                "c_mktsegment": pa.array(row["c_mktsegment"], pa.string()),
                **{
                    f"p{int(q * 100)}_cents": pa.array(
                        row[f"p{int(q * 100)}_cents"], pa.int64()
                    )
                    for q in qs
                },
                "n_orders": pa.array(row["n_orders"], pa.int64()),
            }
        )

    if mode == "broadcast":
        partials = broadcast_map_batches(orders, ToCents, seg_ref)
    else:
        partials = orders.map_batches(ToCents, batch_format="pyarrow")
    return (
        partials.groupby("c_mktsegment")
        .map_groups(quantiles, batch_format="pyarrow")
        .sort("c_mktsegment")
    )


def rolling_time_sums(sf_dir: str, window_us: int = 600_000_000):
    """RANGE-window aggregate over a keyed stream: per user, the sum of
    event values within the trailing `window_us` microseconds
    (RANGE BETWEEN INTERVAL PRECEDING AND CURRENT ROW — the time-based
    sibling of rolling_event_sums' ROWS frame; the frame is defined by
    the ORDER-BY VALUE, so ts-tied rows share one frame and the result
    is deterministic without a tie-break).

    Shape: the usual ONE hash(user)-bucket shuffle; per partition a
    sorted two-searchsorted pass — window starts come from
    searchsorted(ts, ts - window) per user span, frame sums are prefix-
    sum differences, ties resolved by summing to each ts-group's END.
    Values in exact 1e-6 units so the hash is float-free.

    Output: event_id, user_id, win_sum_micro."""
    n_parts = _n_partitions()
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        uid = t["user_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": pa.array(uid, pa.int64()),
                "event_id": t["event_id"].cast(pa.int64()),
                "us": t["ts"].cast(pa.int64()),
                "v_micro": pa.array(
                    np.rint(
                        t["value"].to_numpy(zero_copy_only=False) * 1e6
                    ).astype(np.int64),
                    pa.int64(),
                ),
                "__bucket": pa.array(_hash_bucket(uid, n_parts), pa.int64()),
            }
        )

    def win_bucket(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        us = t["us"].to_numpy(zero_copy_only=False)
        v = t["v_micro"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, us, uid))
        uid, eid, us, v = uid[order], eid[order], us[order], v[order]
        n = len(uid)
        out = np.empty(n, dtype=np.int64)
        if n:
            csum = np.concatenate(([0], np.cumsum(v)))
            starts = np.concatenate(([0], np.flatnonzero(uid[1:] != uid[:-1]) + 1))
            ends = np.concatenate((starts[1:], [n]))
            for s, e in zip(starts, ends):  # per-user span, vectorized inside
                span = us[s:e]
                lo = s + np.searchsorted(span, span - window_us, side="left")
                # SQL RANGE frame ends at the last PEER (same ts), not
                # the current row: sum to each ts-group's end
                hi = s + np.searchsorted(span, span, side="right")
                out[s:e] = csum[hi] - csum[lo]
        return pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "user_id": pa.array(uid, pa.int64()),
                "win_sum_micro": pa.array(out, pa.int64()),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(win_bucket, batch_format="pyarrow")
    )


def attribution_join(sf_dir: str, window_us: int = 86_400_000_000):
    """Interval/range JOIN: each 'purchase' event joined to the same
    user's events in the trailing `window_us` microseconds STRICTLY
    before it (the marketing-attribution window: which touches
    preceded this conversion?). Unlike rolling_time_sums this is a
    two-relation non-equi join — the probe side is a filtered stream,
    matches exclude the row itself and its ts-peers, and the output is
    one row per PROBE row with join-side aggregates.

    Shape: ONE hash(user) bucket shuffle co-partitions both roles of
    the self-join (the build side is the full stream, the probe side a
    mask over the same rows — no second scan); per partition a lexsort
    + two searchsorteds per user span turn the interval predicate into
    prefix-sum differences. No driver materialization; at 100 TB the
    bucket count scales with cpus and a user's history is the only
    co-residency requirement (salt a pathological single user by
    sub-windowing if one ever exceeds a block).

    Values quantize to integer micro-units before summing (hash is
    float-free). Output: (event_id, n_prior, prior_sum_micro)."""
    n_parts = _n_partitions()
    ds = _read(
        sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type", "value"]
    )

    def prep(t: pa.Table) -> pa.Table:
        uid = t["user_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        is_probe = pc.equal(t["event_type"], "purchase")
        return pa.table(
            {
                "user_id": pa.array(uid, pa.int64()),
                "event_id": t["event_id"].cast(pa.int64()),
                "us": t["ts"].cast(pa.int64()),
                "v_micro": pa.array(
                    np.rint(
                        t["value"].to_numpy(zero_copy_only=False) * 1e6
                    ).astype(np.int64),
                    pa.int64(),
                ),
                "is_probe": is_probe,
                "__bucket": pa.array(_hash_bucket(uid, n_parts), pa.int64()),
            }
        )

    def join_bucket(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        us = t["us"].to_numpy(zero_copy_only=False)
        v = t["v_micro"].to_numpy(zero_copy_only=False)
        probe = t["is_probe"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, us, uid))
        uid, eid, us, v, probe = (
            uid[order],
            eid[order],
            us[order],
            v[order],
            probe[order],
        )
        n = len(uid)
        n_prior = np.zeros(n, dtype=np.int64)
        sum_prior = np.zeros(n, dtype=np.int64)
        if n:
            csum = np.concatenate(([0], np.cumsum(v)))
            starts = np.concatenate(([0], np.flatnonzero(uid[1:] != uid[:-1]) + 1))
            ends = np.concatenate((starts[1:], [n]))
            for s, e in zip(starts, ends):  # per-user span, vectorized inside
                span = us[s:e]
                lo = s + np.searchsorted(span, span - window_us, side="left")
                # strictly before: exclude the row and its ts-peers
                hi = s + np.searchsorted(span, span, side="left")
                n_prior[s:e] = hi - lo
                sum_prior[s:e] = csum[hi] - csum[lo]
        return pa.table(
            {
                "event_id": pa.array(eid[probe], pa.int64()),
                "n_prior": pa.array(n_prior[probe], pa.int64()),
                "prior_sum_micro": pa.array(sum_prior[probe], pa.int64()),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(join_bucket, batch_format="pyarrow")
    )


def rolling_event_sums(sf_dir: str, window: int = 3):
    """ROWS-window aggregate over a keyed stream: per user, the sum of
    the last `window` event values (current row + window-1 preceding,
    ordered by time then event id — the tie-break makes the window
    deterministic). Values in exact 1e-6 units. Same bucketed shape as
    the other per-key ops: hash(user) % (4x cpus) partitions, one
    lexsort + cumsum difference per partition."""
    n_parts = _n_partitions()
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        uid = t["user_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": pa.array(uid, pa.int64()),
                "event_id": t["event_id"].cast(pa.int64()),
                "us": t["ts"].cast(pa.int64()),
                "value_em6": pa.array(
                    np.rint(
                        t["value"].to_numpy(zero_copy_only=False) * 1e6
                    ).astype(np.int64),
                    pa.int64(),
                ),
                "__bucket": pa.array(_hash_bucket(uid, n_parts), pa.int64()),
            }
        )

    def window_bucket(g: pa.Table) -> pa.Table:
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        us = g["us"].to_numpy(zero_copy_only=False)
        val = g["value_em6"].to_numpy(zero_copy_only=False)
        n = len(uid)
        if n == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "w_sum_em6": pa.array([], pa.int64()),
                }
            )
        order = np.lexsort((eid, us, uid))
        uid, eid, us, val = uid[order], eid[order], us[order], val[order]
        csum = np.concatenate([[0], np.cumsum(val)])
        idx = np.arange(n, dtype=np.int64)
        # window start: max(row - window + 1, first row of this user)
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = uid[1:] != uid[:-1]
        user_start = np.maximum.accumulate(np.where(new_user, idx, 0))
        lo = np.maximum(idx - (window - 1), user_start)
        w = csum[idx + 1] - csum[lo]
        return pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "user_id": pa.array(uid, pa.int64()),
                "w_sum_em6": pa.array(w.astype(np.int64), pa.int64()),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(window_bucket, batch_format="pyarrow")
    )


def customers_without_urgent_orders(sf_dir: str):
    """ANTI-join: customers with no URGENT-priority order — the
    co-partitioned tagged-union shape (one groupby on the key; a
    vectorized post-filter keeps customer keys whose matching-order
    count is zero). Nothing key-cardinality-sized touches the driver."""
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"])
    cust = _read(sf_dir, "customer", columns=["c_custkey"])

    def o_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["o_orderpriority"], "1-URGENT"))
        keys = t["o_custkey"].to_numpy(zero_copy_only=False)
        uniq = np.unique(keys)
        return pa.table(
            {
                "key": pa.array(uniq, pa.int64()),
                "n": pa.array(np.ones(len(uniq), dtype=np.int64)),
                "left_flag": pa.array(np.zeros(len(uniq), dtype=np.int64)),
            }
        )

    def c_partial(t: pa.Table) -> pa.Table:
        keys = t["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "key": pa.array(keys, pa.int64()),
                "n": pa.array(np.zeros(len(keys), dtype=np.int64)),
                "left_flag": pa.array(np.ones(len(keys), dtype=np.int64)),
            }
        )

    both = cust.map_batches(c_partial, batch_format="pyarrow").union(
        orders.map_batches(o_partial, batch_format="pyarrow")
    )
    agged = both.groupby("key").aggregate(
        Sum("n", alias_name="n_urgent"), Sum("left_flag", alias_name="n_cust_rows")
    )

    def finish(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(pc.greater(t["n_cust_rows"], 0), pc.equal(t["n_urgent"], 0))
        )
        return pa.table({"c_custkey": t["key"].cast(pa.int64())})

    return agged.map_batches(finish, batch_format="pyarrow")


def event_transitions(sf_dir: str):
    """Markov transition counts over per-user event sequences: order
    each user's events by (ts, event_id), pair every event with that
    user's previous one, and count (prev_type, event_type) pairs
    globally — the session-path / behavioral-model fit primitive.

    Shape: ONE bucket shuffle on hash(user_id) % (4 x cpus) (the
    user_event_deltas shape); inside a partition every user's lag
    computes in one numpy pass (lexsort, shifted compare, user-change
    mask), and the pair stream is collapsed to (prev, next, n)
    partials via integer-packed np.unique BEFORE leaving the worker,
    so the final aggregate moves one row per (bucket, distinct pair).
    The type-pair key space is tiny, so the finish is a tiny_key_sum
    fan-in tree, not a sort-groupby shuffle."""
    n_parts = _n_partitions()
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        uid = t["user_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": pa.array(uid, pa.int64()),
                "us": t["ts"].cast(pa.int64()),
                "event_type": t["event_type"],
                "__bucket": pa.array(_hash_bucket(uid, n_parts), pa.int64()),
            }
        )

    def pairs_bucket(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        us = t["us"].to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, us, uid))
        uid, et = uid[order], et[order]
        empty = pa.table(
            {
                "prev_type": pa.array([], pa.string()),
                "event_type": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            }
        )
        if len(uid) < 2:
            return empty
        same = uid[1:] == uid[:-1]
        if not same.any():
            return empty
        # integer-pack the (prev, next) string pairs via a per-bucket
        # type dictionary so the count is one np.unique, not a string
        # groupby
        types, codes = np.unique(et, return_inverse=True)
        packed = codes[:-1][same] * len(types) + codes[1:][same]
        u, counts = np.unique(packed, return_counts=True)
        return pa.table(
            {
                "prev_type": pa.array(types[u // len(types)], pa.string()),
                "event_type": pa.array(types[u % len(types)], pa.string()),
                "n": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    partials = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(pairs_bucket, batch_format="pyarrow")
    )
    return tiny_key_sum(
        partials,
        group_cols=["prev_type", "event_type"],
        sum_cols=["n"],
        sort_cols=["prev_type", "event_type"],
    )


def mad_outliers(sf_dir: str):
    """Robust per-supplier price-outlier profile: per l_suppkey, the
    exact median and MAD (median absolute deviation) of
    l_extendedprice, and how many of the supplier's line items fall
    outside the Tukey-style robust fence |x - med| > 1.5*MAD — the
    heavy-tail-safe anomaly screen (z-scores break on skewed prices;
    the 1.5 multiplier is the IQR-fence convention, and unlike a
    3-sigma rule it is non-degenerate on bounded distributions).

    Exactness contract: prices quantize to integer cents; med2 = 2x
    median (always an integer: the sum of the two middle order
    statistics), mad4 = 4x MAD on the same trick, so both sides
    compare integers and the fence test |x-med| > 1.5*MAD becomes
    4*|2c - med2| > 3*mad4 with no float in sight.

    Shape: ONE bucket shuffle on hash(suppkey) % (4 x cpus); inside a
    bucket EVERY supplier's two order-statistic extractions run in the
    same two numpy passes (lexsort by (supp, cents) -> middle indices
    via group starts/counts; then lexsort the deviations within the
    still-contiguous groups). Per-group state never leaves the worker;
    the output is one row per supplier. Assumes a single supplier's
    rows fit one worker (the same contract as every map_groups op
    here); the 100-TB escape hatch for a pathological hot key is the
    histogram_quantile sketch."""
    n_parts = _n_partitions()
    ds = _read(sf_dir, "lineitem", columns=["l_suppkey", "l_extendedprice"])

    def prep(t: pa.Table) -> pa.Table:
        supp = t["l_suppkey"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        cents = np.rint(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        return pa.table(
            {
                "suppkey": pa.array(supp, pa.int64()),
                "cents": pa.array(cents, pa.int64()),
                "__bucket": pa.array(_hash_bucket(supp, n_parts), pa.int64()),
            }
        )

    def mad_bucket(t: pa.Table) -> pa.Table:
        supp = t["suppkey"].to_numpy(zero_copy_only=False)
        c = t["cents"].to_numpy(zero_copy_only=False)
        order = np.lexsort((c, supp))
        supp, c = supp[order], c[order]
        starts = np.r_[0, np.nonzero(np.diff(supp))[0] + 1]
        counts = np.diff(np.r_[starts, len(supp)])
        lo = starts + (counts - 1) // 2
        hi = starts + counts // 2
        med2 = c[lo] + c[hi]
        dev = np.abs(2 * c - np.repeat(med2, counts))
        # groups stay contiguous in the same order: in-group dev sort
        dev_s = dev[np.lexsort((dev, supp))]
        mad4 = dev_s[lo] + dev_s[hi]
        out = 4 * dev > 3 * np.repeat(mad4, counts)
        n_out = np.add.reduceat(out, starts) if len(supp) else np.empty(0, np.int64)
        return pa.table(
            {
                "suppkey": pa.array(supp[starts], pa.int64()),
                "n": pa.array(counts.astype(np.int64), pa.int64()),
                "med2_cents": pa.array(med2, pa.int64()),
                "mad4_cents": pa.array(mad4, pa.int64()),
                "n_outliers": pa.array(n_out.astype(np.int64), pa.int64()),
            }
        )

    partials = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(mad_bucket, batch_format="pyarrow")
    )
    # one row per supplier, each in exactly ONE bucket: the "sum" is an
    # identity fold, so tiny_key_sum's fan-in tree replaces a second
    # all-to-all sort barrier (~1.5 s fixed at 32 cpus) with an O(groups)
    # merge + driver-side order
    return tiny_key_sum(
        partials,
        group_cols=["suppkey"],
        sum_cols=["n", "med2_cents", "mad4_cents", "n_outliers"],
        sort_cols=["suppkey"],
    )


def _skyline_take(t: pa.Table) -> pa.Table:
    """2D Pareto frontier (minimize p_retailprice, maximize p_size) of
    one Arrow table, exact, fully vectorized: sort by (price asc, size
    desc); within a price group only the max-size rows survive (ties
    kept — equal points do not dominate each other); across groups a
    running max of group sizes kills any point some strictly-cheaper
    point matches or beats. Column types pass through untouched (the
    survivors are .take()n from the input)."""
    if t.num_rows == 0:
        return t
    price = t["p_retailprice"].to_numpy(zero_copy_only=False)
    size = t["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((-size, price))
    p2, s2 = price[order], size[order]
    new_g = np.r_[True, p2[1:] != p2[:-1]]
    gidx = np.cumsum(new_g) - 1
    gmax = s2[new_g]  # first row of each price group = its max size
    premax = np.r_[np.iinfo(np.int64).min, np.maximum.accumulate(gmax)[:-1]]
    keep = (s2 == gmax[gidx]) & (s2 > premax[gidx])
    return t.take(pa.array(order[keep], pa.int64()))


@ray.remote
def _skyline_merge(*tables):
    """Fan-in: skyline of a union of skylines (dominance is transitive,
    so local pruning never drops a global frontier point)."""
    live = [t for t in tables if t.num_rows]
    if not live:
        return tables[0]
    return _skyline_take(pa.concat_tables(live).combine_chunks())


def part_skyline(sf_dir: str):
    """Pareto-frontier (skyline) query over parts: all parts not
    dominated on (price low, size high) — q dominates p iff
    q.price <= p.price AND q.size >= p.size with at least one strict.

    The skyline operator is not an aggregate, but it IS distributive:
    every block computes its local frontier (vectorized sweep — the
    2D case needs one sort + running max, no pair loop), and a remote
    fan-in tree merges frontiers with the same kernel. The driver
    never sees a non-frontier row; expected frontier size on random
    data is O(log^(d-1) n), so the fan-in payloads are tiny even when
    the input is not."""
    from georay.textops import _tree_reduce

    ds = _read(sf_dir, "part", columns=["p_partkey", "p_size", "p_retailprice"])
    local = ds.map_batches(_skyline_take, batch_format="pyarrow").materialize()
    refs = local.to_arrow_refs()
    if not refs:
        return pa.table(
            {
                "p_partkey": pa.array([], pa.int64()),
                "p_size": pa.array([], pa.int32()),
                "p_retailprice": pa.array([], pa.float64()),
            }
        )
    return ray.get(_tree_reduce(refs, _skyline_merge))


# ------------------------------------------------- bloom-filtered semi-join
# The join-filter pushdown pattern for huge-fact x selective-dim at
# 100 TB: the dim key set may be too big to broadcast exactly, but a
# Bloom filter of it is FIXED-size (128 KiB here regardless of key
# count) and broadcastable, so the fact table is pruned to candidates
# BEFORE the only shuffle; false positives die in the co-partitioned
# confirm, which is also where the aggregation happens (one shuffle
# total, sized by true-match + FP rows, not the fact table).

BLOOM_M_LOG2 = 20  # 2^20 bits = 128 KiB broadcast payload
BLOOM_K = 5


def _bloom_positions(keys: np.ndarray, i: int) -> np.ndarray:
    """i-th double-hashing probe position for each key (Kirsch-
    Mitzenmacher: pos_i = h1 + i*h2 mod m), both halves from the
    splitmix64 finalizer."""
    from georay.sketch import hash64

    h = hash64(keys.astype(np.int64))
    h1 = h & np.uint64((1 << 32) - 1)
    h2 = (h >> np.uint64(32)) | np.uint64(1)  # odd -> full-period probe
    return ((h1 + np.uint64(i) * h2) % np.uint64(1 << BLOOM_M_LOG2)).astype(np.int64)


@ray.remote
def _bloom_partial(t: pa.Table, key_col: str) -> np.ndarray:
    bits = np.zeros(1 << (BLOOM_M_LOG2 - 3), dtype=np.uint8)
    keys = t[key_col].to_numpy(zero_copy_only=False)
    if len(keys):
        for i in range(BLOOM_K):
            pos = _bloom_positions(keys, i)
            np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
    return bits


@ray.remote
def _bloom_or(*parts: np.ndarray) -> np.ndarray:
    out = parts[0].copy()
    for p in parts[1:]:
        np.bitwise_or(out, p, out=out)
    return out


def bloom_semi_join(sf_dir: str, min_size: int = 48):
    """Lineitem rows whose part is in the selective build set
    (p_size >= min_size), aggregated per part: {part_key, n_items,
    sum_qty}. Exact result — the Bloom filter only prunes.

    Dataflow: build-side blocks each fill a 128 KiB Bloom bitmap
    (remote partials), a fan-in tree ORs them into ONE object-store
    ref, and the fact scan tests membership per batch via the
    per-worker broadcast cache (task mode, no actor-pool ramp).
    Survivors (true matches + ~0.1% FPs at 2^20 bits / 5 probes)
    union the build keys into one hash-bucketed groupby where a
    searchsorted membership check kills the FPs and reduceat folds
    the per-part counts/sums — the single shuffle moves only
    candidate rows."""
    from georay.textops import _tree_reduce

    n_parts = _n_partitions()
    build = (
        _read(sf_dir, "part", columns=["p_partkey", "p_size"])
        .map_batches(
            lambda t: t.filter(pc.greater_equal(t["p_size"], min_size)).select(
                ["p_partkey"]
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )
    refs = build.to_arrow_refs()
    bits_ref = _tree_reduce(
        [_bloom_partial.remote(r, "p_partkey") for r in refs], _bloom_or
    )

    def prune(t: pa.Table, bits: np.ndarray) -> pa.Table:
        keys = t["l_partkey"].to_numpy(zero_copy_only=False)
        ok = np.ones(len(keys), dtype=bool)
        for i in range(BLOOM_K):
            pos = _bloom_positions(keys, i)
            ok &= (bits[pos >> 3] & (np.uint8(1) << (pos & 7).astype(np.uint8))) != 0
        sel = np.flatnonzero(ok)
        qty = np.rint(
            t["l_quantity"].to_numpy(zero_copy_only=False)[sel]
        ).astype(np.int64)
        k = keys[sel].astype(np.int64)
        return pa.table(
            {
                "part_key": pa.array(k, pa.int64()),
                "qty": pa.array(qty, pa.int64()),
                "side": pa.array(np.zeros(len(k), np.int8), pa.int8()),
                "__bucket": pa.array(_hash_bucket(k, n_parts), pa.int64()),
            }
        )

    fact = _read(sf_dir, "lineitem", columns=["l_partkey", "l_quantity"])
    cands = broadcast_map_batches(fact, prune, bits_ref)

    def key_rows(t: pa.Table) -> pa.Table:
        k = t["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "part_key": pa.array(k, pa.int64()),
                "qty": pa.array(np.zeros(len(k), np.int64), pa.int64()),
                "side": pa.array(np.ones(len(k), np.int8), pa.int8()),
                "__bucket": pa.array(_hash_bucket(k, n_parts), pa.int64()),
            }
        )

    def confirm_agg(g: pa.Table) -> pa.Table:
        side = g["side"].to_numpy(zero_copy_only=False)
        key = g["part_key"].to_numpy(zero_copy_only=False)
        qty = g["qty"].to_numpy(zero_copy_only=False)
        bk = np.sort(key[side == 1])
        fk, fq = key[side == 0], qty[side == 0]
        empty = pa.table(
            {
                "part_key": pa.array([], pa.int64()),
                "n_items": pa.array([], pa.int64()),
                "sum_qty": pa.array([], pa.int64()),
            }
        )
        if len(bk) == 0 or len(fk) == 0:
            return empty
        pos = np.minimum(np.searchsorted(bk, fk), len(bk) - 1)
        hit = bk[pos] == fk  # exact membership: Bloom FPs die here
        fk, fq = fk[hit], fq[hit]
        if len(fk) == 0:
            return empty
        order = np.argsort(fk)
        fk, fq = fk[order], fq[order]
        starts = np.r_[0, np.flatnonzero(fk[1:] != fk[:-1]) + 1]
        return pa.table(
            {
                "part_key": pa.array(fk[starts], pa.int64()),
                "n_items": pa.array(
                    np.diff(np.r_[starts, len(fk)]).astype(np.int64), pa.int64()
                ),
                "sum_qty": pa.array(np.add.reduceat(fq, starts), pa.int64()),
            }
        )

    return (
        cands.union(build.map_batches(key_rows, batch_format="pyarrow"))
        .groupby("__bucket")
        .map_groups(confirm_agg, batch_format="pyarrow")
    )


def orders_pivot(sf_dir: str):
    """PIVOT / wide conditional aggregation: per order month, the
    order count broken out into one column per priority class. The
    wide shape comes from a per-batch packed-code bincount partial
    (month x priority folded into one int key — no string groupby),
    then ONE tiny-cardinality month fold through the remote fan-in
    tree (tiny_key_sum), so the shuffle moves O(months x 5) ints."""
    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_orderpriority"])
    names = ["n_urgent", "n_high", "n_medium", "n_notspec", "n_low"]

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        d = pd.to_datetime(df["o_orderdate"])
        month = (d.dt.year * 100 + d.dt.month).to_numpy(np.int64)
        pr = df["o_orderpriority"].str[0].astype(np.int64).to_numpy() - 1
        code = month * 8 + pr
        uc, cnt = np.unique(code, return_counts=True)
        um = uc // 8
        up = uc % 8
        months = np.unique(um)
        mat = np.zeros((len(months), 5), dtype=np.int64)
        mat[np.searchsorted(months, um), up] = cnt
        cols = {"month_key": pa.array(months, pa.int64())}
        for j, nme in enumerate(names):
            cols[nme] = pa.array(mat[:, j], pa.int64())
        return pa.table(cols)

    return tiny_key_sum(
        ds.map_batches(partial, batch_format="pyarrow"), ["month_key"], names
    )


def user_drawdown(sf_dir: str):
    """Per-user maximum drawdown of the event-value series — the
    sequential-scan window pattern (running max + peak-to-trough) that
    no plain aggregate expresses: drawdown_i = max(value_1..i) -
    value_i over (ts, event_id) order, reported as each user's max.
    Integer cents throughout.

    Shape: ONE hash-bucketed shuffle on user_id; inside a partition
    every user's scan runs in the same numpy pass — segmented
    running-max via the offset trick (add user_seq << 40 before
    maximum.accumulate, subtract after), no Python loop over users."""
    n_parts = _n_partitions()
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id", "value"])

    def bucket(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        cents = np.rint(t["value"].to_numpy(zero_copy_only=False) * 100).astype(
            np.int64
        )
        return pa.table(
            {
                "user_id": pa.array(u, pa.int64()),
                "ts_us": pa.array(ts, pa.int64()),
                "event_id": t["event_id"],
                "cents": pa.array(cents, pa.int64()),
                "__bucket": pa.array(_hash_bucket(u, n_parts), pa.int64()),
            }
        )

    def scan(g: pa.Table) -> pa.Table:
        u = g["user_id"].to_numpy(zero_copy_only=False)
        ts = g["ts_us"].to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        cents = g["cents"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        u, cents = u[order], cents[order]
        starts = np.r_[0, np.flatnonzero(u[1:] != u[:-1]) + 1]
        runlen = np.diff(np.r_[starts, len(u)])
        seg = np.repeat(np.arange(len(starts), dtype=np.int64), runlen)
        # segmented running max via the offset trick (cent values are
        # bounded far below 2^40)
        off = seg << np.int64(40)
        runmax = np.maximum.accumulate(cents + off) - off
        dd = runmax - cents
        max_dd = np.maximum.reduceat(dd, starts)
        return pa.table(
            {
                "user_id": pa.array(u[starts], pa.int64()),
                "n_events": pa.array(runlen.astype(np.int64), pa.int64()),
                "max_drawdown_cents": pa.array(max_dd.astype(np.int64), pa.int64()),
            }
        )

    return (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(scan, batch_format="pyarrow")
    )


def props_rollup(sf_dir: str):
    """Semi-structured property extraction + rollup: pull the integer
    `k` out of the events' JSON props column with ONE Arrow
    extract_regex kernel (no per-row json.loads, no Python loop) and
    aggregate {n_events, sum_k, min_k, max_k} per event_type. Rows
    without the key drop out on both engines (COUNT(k) semantics).

    Shape: per-batch partials collapse to O(types) rows before the
    groupby, so the shuffle carries a few dozen ints per block."""
    from ray.data.aggregate import Max, Min, Sum

    ds = _read(sf_dir, "events", columns=["event_type", "props"])

    def partial(t: pa.Table) -> pa.Table:
        ext = pc.extract_regex(t["props"], pattern=r'"k": (?P<v>\d+)')
        k = pc.cast(pc.struct_field(ext, "v"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        types = t["event_type"].to_numpy(zero_copy_only=False)
        ok = ~pd.isna(k)
        k = k[ok].astype(np.int64)
        types = types[ok]
        uniq, inv = np.unique(types, return_inverse=True)
        n = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        s = np.zeros(len(uniq), np.int64)
        np.add.at(s, inv, k)
        mn = np.full(len(uniq), np.iinfo(np.int64).max)
        mx = np.full(len(uniq), np.iinfo(np.int64).min)
        np.minimum.at(mn, inv, k)
        np.maximum.at(mx, inv, k)
        return pa.table(
            {
                "event_type": pa.array(uniq),
                "n": pa.array(n, pa.int64()),
                "s": pa.array(s, pa.int64()),
                "mn": pa.array(mn, pa.int64()),
                "mx": pa.array(mx, pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n_events"),
            Sum("s", alias_name="sum_k"),
            Min("mn", alias_name="min_k"),
            Max("mx", alias_name="max_k"),
        )
    )


def price_band_pairs(sf_dir: str, eps_micro: int = 2_000_000):
    """Cross-key BAND JOIN (non-equi self-join on a continuous value
    with no equality key): all order pairs whose total prices differ
    by strictly less than eps — the one non-equi join class the rest
    of the relational tier doesn't cover (attribution_join is an
    interval join WITH an equality key; this has none, so naive
    evaluation is the O(N^2) theta-join the reference could never
    run either).

    Shape (the classic replicate-to-adjacent-band plan): each row's
    value quantizes to exact micro units and lands in band
    b = v_micro // eps; a pair closer than eps must sit in the same
    or adjacent bands, so every row is emitted twice — HOME in band b
    and GHOST in band b+1 — and ONE hash(band) shuffle co-locates
    every candidate pair. Inside a partition a lexsort by (band,
    v, key) turns the band predicate into a searchsorted window, and
    each pair is generated exactly once by anchoring on HOME rows
    only and taking candidates strictly below the anchor in (v, key)
    order (the larger side of a pair is always home in its own band;
    the smaller side is home there or ghost from b-1). Pair emission
    is the vectorized repeat + offset-arange idiom — no Python loop.

    100-TB note: replication factor is exactly 2x regardless of eps;
    per-partition work is O(rows_in_band x window width). A value
    distribution concentrated in one band (all prices equal) makes
    that band hot — the mitigation is sub-bucketing a hot band by
    hash(key) and running the same window per sub-bucket pair, noted
    here but not needed for a price-like continuous value.

    Output: (key_lo, key_hi, diff_micro), key_lo < key_hi."""
    n_parts = _n_partitions()
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    eps = np.int64(eps_micro)

    def replicate(t: pa.Table) -> pa.Table:
        key = t["o_orderkey"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        v = np.rint(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 1e6
        ).astype(np.int64)
        band = v // eps
        key2 = np.concatenate([key, key])
        v2 = np.concatenate([v, v])
        band2 = np.concatenate([band, band + 1])
        home = np.concatenate(
            [np.ones(len(key), np.bool_), np.zeros(len(key), np.bool_)]
        )
        return pa.table(
            {
                "key": pa.array(key2, pa.int64()),
                "v": pa.array(v2, pa.int64()),
                "band": pa.array(band2, pa.int64()),
                "home": pa.array(home, pa.bool_()),
                "__b": pa.array(_hash_bucket(band2, n_parts), pa.int64()),
            }
        )

    def pairs(t: pa.Table) -> pa.Table:
        key = t["key"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        band = t["band"].to_numpy(zero_copy_only=False)
        home = t["home"].to_numpy(zero_copy_only=False)
        order = np.lexsort((key, v, band))
        key, v, band, home = key[order], v[order], band[order], home[order]
        n = len(key)
        empty = pa.table(
            {
                "key_lo": pa.array([], pa.int64()),
                "key_hi": pa.array([], pa.int64()),
                "diff_micro": pa.array([], pa.int64()),
            }
        )
        if n == 0:
            return empty
        # ONE vectorized searchsorted instead of a per-run loop: the
        # composite key z = band*M + (v - (band-1)*eps) is strictly
        # increasing across band runs (per-run offsets live in
        # [0, 2*eps) < M) and ordered by v inside a run, so the band
        # window "same run AND v > v_i - eps" is exactly z > z_i - eps.
        M = 2 * eps + 2
        z = band * M + (v - (band - 1) * eps)
        lo = np.searchsorted(z, z - eps, side="right")
        pos = np.arange(n)
        cnt = np.where(home, pos - lo, 0)
        total = int(cnt.sum())
        if total == 0:
            return empty
        anchors = np.repeat(pos, cnt)
        # offset-arange: for each anchor, candidates lo[i] .. pos[i]-1
        cand = np.arange(total) - np.repeat(np.cumsum(cnt) - cnt, cnt) + np.repeat(
            lo, cnt
        )
        a_key, c_key = key[anchors], key[cand]
        return pa.table(
            {
                "key_lo": pa.array(np.minimum(a_key, c_key), pa.int64()),
                "key_hi": pa.array(np.maximum(a_key, c_key), pa.int64()),
                "diff_micro": pa.array(v[anchors] - v[cand], pa.int64()),
            }
        )

    return (
        ds.map_batches(replicate, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(pairs, batch_format="pyarrow")
    )


def key_skew_profile(sf_dir: str, key_col: str = "user_id"):
    """Key-skew observability profile of the events stream: ONE row
    summarizing the per-key row-count distribution — key count, row
    total, max, the p50/p90 counts, and an EXACT integer Gini
    coefficient. This is the diagnostic a shuffle planner reads before
    choosing salting/bucketing for a key (the 100-TB design notes all
    over this repo say "salt a hot key" — this op is how a pipeline
    detects one), kept as a first-class oracle-checked operator.

    gini_micro = floor(1e6 * (2*S1 - (n+1)*S0) / (n*S0)) with
    S1 = sum(rank*cnt) over counts sorted (cnt ASC, key ASC) — the
    standard mean-difference form; ties make S1 invariant to their
    ordering, the key tiebreak just pins the oracle's ROW_NUMBER.

    Shape: per-batch unique partials -> one groupby(key) fold (key
    universe is dimension-bounded by contract, same as vocab_ids) ->
    rank_by's histogram-bucketed global rank (O(bins) driver state,
    no single-machine sort) -> tree-mergeable (S0, S1, max) partials
    + two rank-indexed point lookups. Nothing corpus-sized ever
    reaches the driver."""
    from georay.rank import rank_by

    ds = _read(sf_dir, "events", columns=[key_col])

    def partial(t: pa.Table) -> pa.Table:
        k = t[key_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        uniq, counts = np.unique(k, return_counts=True)
        return pa.table(
            {
                key_col: pa.array(uniq, pa.int64()),
                "cnt": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key_col)
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    ranked = rank_by(counts, key_col="cnt", tie_col=key_col).materialize()

    def sums(t: pa.Table) -> pa.Table:
        cnt = t["cnt"].to_numpy(zero_copy_only=False)
        rnk = t["rnk"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n": pa.array([len(cnt)], pa.int64()),
                "s0": pa.array([int(cnt.sum())], pa.int64()),
                "s1": pa.array([int((rnk * cnt).sum())], pa.int64()),
                "cmax": pa.array(
                    [int(cnt.max()) if len(cnt) else 0], pa.int64()
                ),
            }
        )

    agg = ranked.map_batches(sums, batch_format="pyarrow").aggregate(
        Sum("n", alias_name="n"),
        Sum("s0", alias_name="s0"),
        Sum("s1", alias_name="s1"),
        Max("cmax", alias_name="cmax"),
    )
    n, s0, s1, cmax = (
        int(agg["n"]),
        int(agg["s0"]),
        int(agg["s1"]),
        int(agg["cmax"]),
    )
    if n == 0 or s0 == 0:
        raise ValueError("key_skew_profile: empty key universe")

    r50 = (n - 1) * 50 // 100 + 1
    r90 = (n - 1) * 90 // 100 + 1
    picked = {
        int(r["rnk"]): int(r["cnt"])
        for r in ranked.filter(expr=f"rnk == {r50} or rnk == {r90}").take_all()
    }
    p50, p90 = picked[r50], picked[r90]
    gini = (1_000_000 * (2 * s1 - (n + 1) * s0)) // (n * s0)
    return pa.table(
        {
            "n_keys": pa.array([n], pa.int64()),
            "n_rows": pa.array([s0], pa.int64()),
            "cnt_max": pa.array([cmax], pa.int64()),
            "cnt_p50": pa.array([p50], pa.int64()),
            "cnt_p90": pa.array([p90], pa.int64()),
            "gini_micro": pa.array([gini], pa.int64()),
        }
    )


def join_size_estimate(sf_dir: str):
    """Join-cardinality profile for orders JOIN events ON custkey =
    user_id — the planner statistic read before choosing a join
    strategy (broadcast / bucket / salt): the EXACT join output size
    |A JOIN B| = sum over shared keys of cntA*cntB, plus per-side key
    counts, shared-key count, and the max per-key pair product (the
    single hottest key's contribution — the salting trigger).
    Companion to key_skew_profile: that op profiles ONE key column,
    this one profiles the interaction of two.

    Shape: both sides collapse to (key, cnt, side) partials inside
    map_batches (the shuffle carries one row per batch-distinct key),
    ONE groupby(key) co-locates the pair, a vectorized pass emits
    per-partition (sum, max, counts) partials, and a tree-mergeable
    global aggregate folds them to one row. The join itself is never
    materialized — at 100 TB this runs at dimension cost while the
    real join would be output-bound."""
    orders = _read(sf_dir, "orders", columns=["o_custkey"])
    events = _read(sf_dir, "events", columns=["user_id"])

    def side_partial(col, flag):
        def f(t: pa.Table) -> pa.Table:
            keys = t[col].cast(pa.int64()).to_numpy(zero_copy_only=False)
            uniq, counts = np.unique(keys, return_counts=True)
            z = np.zeros(len(uniq), np.int64)
            c = counts.astype(np.int64)
            return pa.table(
                {
                    "key": pa.array(uniq, pa.int64()),
                    "na": pa.array(c if flag == 0 else z, pa.int64()),
                    "nb": pa.array(z if flag == 0 else c, pa.int64()),
                }
            )

        return f

    both = orders.map_batches(
        side_partial("o_custkey", 0), batch_format="pyarrow"
    ).union(events.map_batches(side_partial("user_id", 1), batch_format="pyarrow"))
    per_key = both.groupby("key").aggregate(
        Sum("na", alias_name="na"), Sum("nb", alias_name="nb")
    )

    def fold(t: pa.Table) -> pa.Table:
        na = t["na"].to_numpy(zero_copy_only=False)
        nb = t["nb"].to_numpy(zero_copy_only=False)
        prod = na * nb
        shared = prod > 0
        return pa.table(
            {
                "n_keys_a": pa.array([int((na > 0).sum())], pa.int64()),
                "n_keys_b": pa.array([int((nb > 0).sum())], pa.int64()),
                "n_keys_shared": pa.array([int(shared.sum())], pa.int64()),
                "join_rows": pa.array([int(prod.sum())], pa.int64()),
                "max_key_rows": pa.array(
                    [int(prod.max()) if len(prod) else 0], pa.int64()
                ),
            }
        )

    agg = per_key.map_batches(fold, batch_format="pyarrow").aggregate(
        Sum("n_keys_a", alias_name="n_keys_a"),
        Sum("n_keys_b", alias_name="n_keys_b"),
        Sum("n_keys_shared", alias_name="n_keys_shared"),
        Sum("join_rows", alias_name="join_rows"),
        Max("max_key_rows", alias_name="max_key_rows"),
    )
    return pa.table(
        {
            k: pa.array([int(agg[k])], pa.int64())
            for k in (
                "n_keys_a",
                "n_keys_b",
                "n_keys_shared",
                "join_rows",
                "max_key_rows",
            )
        }
    )


def top_users_by_active_days(sf_dir: str, k: int = 5):
    """Per event type, the top-k users by DISTINCT active days with a
    dense rank — the combination of an exact distinct-count and a
    per-group top-k window (ROW_NUMBER() OVER (PARTITION BY type ORDER
    BY n_days DESC, user) <= k) that neither daily_active_users nor
    top_orders_per_segment alone expresses.

    Shape: ONE hash(user) bucket shuffle co-locates each user's whole
    history, so the (type, user) distinct-day count is EXACT inside the
    partition (lexsort (type, user, day), run-length over triple
    changes) and already collapses to one row per (type, user); the
    same pass keeps only its partition-local top-k rows per type, so
    the second shuffle moves <= k x types rows per partition. Final
    per-type fold re-ranks the partial top-ks. Ties break by user_id
    asc — deterministic and SQL-replayable.

    Output: event_type, rnk, user_id, n_days."""
    n_parts = _n_partitions()
    ds = _read(sf_dir, "events", columns=["event_type", "user_id", "ts"])

    def bucket(t: pa.Table) -> pa.Table:
        uid = t["user_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        micros = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": t["event_type"],
                "user_id": pa.array(uid, pa.int64()),
                "day": pa.array(micros // 86_400_000_000, pa.int64()),
                "__bucket": pa.array(_hash_bucket(uid, n_parts), pa.int64()),
            }
        )

    def local_topk(g: pa.Table) -> pa.Table:
        ty_codes, ty_vals = _dict_codes(g["event_type"])
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        day = g["day"].to_numpy(zero_copy_only=False)
        # exact distinct days per (type, user): run-length over the
        # distinct-triple markers of the sorted view
        order = np.lexsort((day, uid, ty_codes))
        ty, u, d = ty_codes[order], uid[order], day[order]
        new_pair = np.r_[True, (ty[1:] != ty[:-1]) | (u[1:] != u[:-1])]
        new_triple = new_pair.copy()
        new_triple[1:] |= d[1:] != d[:-1]
        cs = np.cumsum(new_triple)
        starts = np.flatnonzero(new_pair)
        ends = np.r_[starts[1:], len(ty)] - 1
        n_days = cs[ends] - cs[starts] + new_triple[starts]
        p_ty, p_u = ty[starts], u[starts]
        # partition-local top-k per type by (n_days desc, user asc)
        o2 = np.lexsort((p_u, -n_days, p_ty))
        t2 = p_ty[o2]
        s2 = np.r_[0, np.flatnonzero(t2[1:] != t2[:-1]) + 1]
        runlen = np.diff(np.r_[s2, len(t2)])
        pos = np.arange(len(t2), dtype=np.int64) - np.repeat(s2, runlen)
        keep = o2[pos < k]
        return pa.table(
            {
                "event_type": ty_vals.take(pa.array(p_ty[keep], pa.int64())).cast(
                    pa.string()
                ),
                "user_id": pa.array(p_u[keep], pa.int64()),
                "n_days": pa.array(n_days[keep], pa.int64()),
            }
        )

    def finish(g: pa.Table) -> pa.Table:
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        nd = g["n_days"].to_numpy(zero_copy_only=False)
        order = np.lexsort((uid, -nd))[:k]
        return pa.table(
            {
                "event_type": g["event_type"].take(pa.array(order, pa.int64())),
                "rnk": pa.array(np.arange(1, len(order) + 1, dtype=np.int64), pa.int64()),
                "user_id": pa.array(uid[order], pa.int64()),
                "n_days": pa.array(nd[order], pa.int64()),
            }
        )

    return (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(local_topk, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(finish, batch_format="pyarrow")
    )


def value_concentration(sf_dir: str, k: int = 10):
    """Per event type, how concentrated the value stream is: the share
    of total value contributed by the top-k users (the Lorenz / iceberg
    statistic a mixing or rate-limiting policy reads). Exact integer
    micro-units end to end; share_micro = floor(1e6 * topk / total).

    Shape: the same ONE hash(user) co-location as
    top_users_by_active_days — per-(type, user) sums are exact inside
    the partition, which then forwards only its local top-k rows AND
    one (type, partial-total) row; the per-type fold merges partial
    tops (correct because (type, user) rows are globally unique after
    the bucket pass) and sums the totals. The shuffle never moves more
    than (k+1) x types rows per partition.

    Output: event_type, total_micro, topk_micro, share_micro."""
    n_parts = _n_partitions()
    ds = _read(sf_dir, "events", columns=["event_type", "user_id", "value"])

    def bucket(t: pa.Table) -> pa.Table:
        uid = t["user_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        micro = np.rint(
            t["value"].to_numpy(zero_copy_only=False) * 1e6
        ).astype(np.int64)
        return pa.table(
            {
                "event_type": t["event_type"],
                "user_id": pa.array(uid, pa.int64()),
                "v": pa.array(micro, pa.int64()),
                "__bucket": pa.array(_hash_bucket(uid, n_parts), pa.int64()),
            }
        )

    def local_fold(g: pa.Table) -> pa.Table:
        ty_codes, ty_vals = _dict_codes(g["event_type"])
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        v = g["v"].to_numpy(zero_copy_only=False)
        order, starts = _group_runs(ty_codes, uid)
        ty, u = ty_codes[order][starts], uid[order][starts]
        sums = np.add.reduceat(v[order], starts)
        # per-type: keep the local top-k user rows plus one total row
        # (user_id = -1 marks the total partial, never a real user)
        o2 = np.lexsort((u, -sums, ty))
        t2 = ty[o2]
        s2 = np.r_[0, np.flatnonzero(t2[1:] != t2[:-1]) + 1]
        runlen = np.diff(np.r_[s2, len(t2)])
        pos = np.arange(len(t2), dtype=np.int64) - np.repeat(s2, runlen)
        keep = o2[pos < k]
        tot_ty = t2[s2]
        tot_v = np.add.reduceat(sums[o2], s2)
        return pa.table(
            {
                "event_type": ty_vals.take(
                    pa.array(np.r_[ty[keep], tot_ty], pa.int64())
                ).cast(pa.string()),
                "user_id": pa.array(
                    np.r_[u[keep], np.full(len(tot_ty), -1, np.int64)], pa.int64()
                ),
                "v": pa.array(np.r_[sums[keep], tot_v], pa.int64()),
            }
        )

    def finish(g: pa.Table) -> pa.Table:
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        v = g["v"].to_numpy(zero_copy_only=False)
        is_tot = uid == -1
        total = int(v[is_tot].sum())
        uv = v[~is_tot]
        uu = uid[~is_tot]
        order = np.lexsort((uu, -uv))[:k]
        topk = int(uv[order].sum())
        share = (1_000_000 * topk) // total if total else 0
        return pa.table(
            {
                "event_type": g["event_type"].take(pa.array([0], pa.int64())),
                "total_micro": pa.array([total], pa.int64()),
                "topk_micro": pa.array([topk], pa.int64()),
                "share_micro": pa.array([share], pa.int64()),
            }
        )

    return (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(local_fold, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(finish, batch_format="pyarrow")
    )


_SJS_A = 2654435761
_SJS_B = 40503
_SJS_MOD = 1000


def salted_join_sample(
    sf_dir: str,
    hot_threshold: int = 64,
    n_salts: int = 4,
    sample_permille: int = 125,
    chunk_cells: int = 1 << 22,
):
    """Deterministic pair-level audit sample of the skewed many-to-many
    events x orders join (user_id = o_custkey), WITHOUT materializing
    the join: per event type, the exact pair count plus the count and
    price mass of the hash-sampled pair subset
    ((event_id*A + o_orderkey*B) % 1000 < sample_permille). The sampled
    stat depends on PAIR IDENTITY, so no per-key pre-aggregation can
    collapse it — this is the shape where join skew actually bites and
    the operator exists to demonstrate the cure.

    Skew plan (the 'salt hot keys' pattern): pass 1 counts events per
    key (partials + one tiny key groupby; driver keeps only keys with
    cnt >= hot_threshold — at most N/hot_threshold of them, bounded by
    construction). Cold keys co-locate via hash(key) % P as usual; each
    hot key i gets its OWN n_salts partitions [P + i*S, P + (i+1)*S):
    its events scatter uniformly by hash(event_id) % S while its orders
    rows replicate S times — so the hottest key's pair work spreads
    over S tasks instead of serializing in one straggler. The hot list
    ships once via ray.put (broadcast_map_batches), never per batch.

    Per-partition pair enumeration is fully vectorized (searchsorted
    order ranges per event, repeat/offset index construction) and
    chunked at chunk_cells pairs so memory stays bounded no matter how
    hot a key is; price mass accumulates with np.add.at into int64 —
    exact, no float roundoff. Partials collapse to O(types) rows per
    partition and tree-reduce on the driver (tiny_key_sum).

    Output: event_type, n_pairs, n_sampled, sampled_price_micro."""
    n_parts = _n_partitions()
    if n_salts < 1:
        raise ValueError("n_salts must be >= 1")

    events = _read(sf_dir, "events", columns=["event_id", "user_id", "event_type"])
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])

    # ---- pass 1: bounded hot-key set from per-batch count partials
    def key_counts(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        keys, cnt = np.unique(uid, return_counts=True)
        return pa.table(
            {"user_id": pa.array(keys, pa.int64()), "cnt": pa.array(cnt, pa.int64())}
        )

    counts = tiny_key_sum(
        events.map_batches(key_counts, batch_format="pyarrow"), ["user_id"], ["cnt"]
    ).take_all()
    hot = np.sort(
        np.array(
            [r["user_id"] for r in counts if r["cnt"] >= hot_threshold], dtype=np.int64
        )
    )
    hot_ref = ray.put(hot)

    def _hot_idx(keys: np.ndarray, hot_arr: np.ndarray):
        idx = np.searchsorted(hot_arr, keys)
        idx = np.clip(idx, 0, max(len(hot_arr) - 1, 0))
        is_hot = (len(hot_arr) > 0) & (hot_arr[idx] == keys) if len(hot_arr) else np.zeros(len(keys), bool)
        return is_hot, idx

    def tag_events(t: pa.Table, hot_arr: np.ndarray) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        is_hot, idx = _hot_idx(uid, hot_arr)
        salt = (eid.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15) % np.uint64(n_salts)).astype(np.int64)
        bucket = np.where(
            is_hot, n_parts + idx * n_salts + salt, _hash_bucket(uid, n_parts)
        )
        return pa.table(
            {
                "user_id": pa.array(uid, pa.int64()),
                "event_id": pa.array(eid, pa.int64()),
                "event_type": t["event_type"].combine_chunks().cast(pa.string()),
                "o_orderkey": pa.nulls(len(t), pa.int64()),
                "pm": pa.nulls(len(t), pa.int64()),
                "__side": pa.array(np.zeros(len(t), np.int8), pa.int8()),
                "__bucket": pa.array(bucket, pa.int64()),
            }
        )

    def tag_orders(t: pa.Table, hot_arr: np.ndarray) -> pa.Table:
        key = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        okey = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pm = np.rint(t["o_totalprice"].to_numpy(zero_copy_only=False) * 1e6).astype(np.int64)
        is_hot, idx = _hot_idx(key, hot_arr)
        cold_bucket = _hash_bucket(key, n_parts)
        # cold rows once; hot rows replicated across their S partitions
        reps = np.where(is_hot, n_salts, 1).astype(np.int64)
        key_r = np.repeat(key, reps)
        okey_r = np.repeat(okey, reps)
        pm_r = np.repeat(pm, reps)
        base = np.repeat(np.where(is_hot, n_parts + idx * n_salts, cold_bucket), reps)
        starts = np.r_[0, np.cumsum(reps)[:-1]]
        offs = np.arange(len(key_r), dtype=np.int64) - np.repeat(starts, reps)
        bucket = base + offs * np.repeat(is_hot.astype(np.int64), reps)
        return pa.table(
            {
                "user_id": pa.array(key_r, pa.int64()),
                "event_id": pa.nulls(len(key_r), pa.int64()),
                "event_type": pa.nulls(len(key_r), pa.string()),
                "o_orderkey": pa.array(okey_r, pa.int64()),
                "pm": pa.array(pm_r, pa.int64()),
                "__side": pa.array(np.ones(len(key_r), np.int8), pa.int8()),
                "__bucket": pa.array(bucket, pa.int64()),
            }
        )

    tagged = broadcast_map_batches(events, tag_events, hot_ref).union(
        broadcast_map_batches(orders, tag_orders, hot_ref)
    )

    def pair_sample(g: pa.Table) -> pa.Table:
        side = g["__side"].to_numpy(zero_copy_only=False)
        ev = g.filter(pa.array(side == 0))
        od = g.filter(pa.array(side == 1))
        empty = pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n_pairs": pa.array([], pa.int64()),
                "n_sampled": pa.array([], pa.int64()),
                "sampled_price_micro": pa.array([], pa.int64()),
            }
        )
        if ev.num_rows == 0 or od.num_rows == 0:
            return empty
        euid = ev["user_id"].to_numpy(zero_copy_only=False)
        eid = ev["event_id"].to_numpy(zero_copy_only=False)
        ety_codes, ety_vals = _dict_codes(ev["event_type"])
        ouid = od["user_id"].to_numpy(zero_copy_only=False)
        okey = od["o_orderkey"].to_numpy(zero_copy_only=False)
        opm = od["pm"].to_numpy(zero_copy_only=False)
        if len(eid) and len(okey):
            if int(eid.max()) * _SJS_A + int(okey.max()) * _SJS_B >= 1 << 62:
                raise ValueError("salted_join_sample: id magnitude would overflow the pair hash")
        oorder = np.argsort(ouid, kind="stable")
        ouid_s, okey_s, opm_s = ouid[oorder], okey[oorder], opm[oorder]
        lo = np.searchsorted(ouid_s, euid, "left")
        hi = np.searchsorted(ouid_s, euid, "right")
        cnt = hi - lo
        keep = cnt > 0
        if not keep.any():
            return empty
        eid, ety, lo, cnt = eid[keep], ety_codes[keep], lo[keep], cnt[keep]
        n_types = len(ety_vals)
        n_pairs = np.zeros(n_types, np.int64)
        np.add.at(n_pairs, ety, cnt)
        n_sampled = np.zeros(n_types, np.int64)
        pm_sampled = np.zeros(n_types, np.int64)
        cum = np.r_[0, np.cumsum(cnt)]
        total = int(cum[-1])
        # chunk the pair enumeration by whole events so each slice
        # holds <= chunk_cells pairs regardless of key heat
        start_ev = 0
        while start_ev < len(eid):
            end_ev = int(np.searchsorted(cum, cum[start_ev] + chunk_cells, "right")) - 1
            end_ev = max(end_ev, start_ev + 1)
            sl = slice(start_ev, end_ev)
            c = cnt[sl]
            t_chunk = int(c.sum())
            if t_chunk:
                rep_ev = np.repeat(np.arange(start_ev, end_ev, dtype=np.int64), c)
                starts = np.r_[0, np.cumsum(c)[:-1]]
                offs = np.arange(t_chunk, dtype=np.int64) - np.repeat(starts, c)
                oidx = np.repeat(lo[sl], c) + offs
                h = eid[rep_ev] * np.int64(_SJS_A) + okey_s[oidx] * np.int64(_SJS_B)
                mask = (h % np.int64(_SJS_MOD)) < sample_permille
                ty_rep = ety[rep_ev[mask]]
                np.add.at(n_sampled, ty_rep, 1)
                np.add.at(pm_sampled, ty_rep, opm_s[oidx[mask]])
            start_ev = end_ev
        live = n_pairs > 0
        return pa.table(
            {
                "event_type": ety_vals.take(
                    pa.array(np.flatnonzero(live), pa.int64())
                ).cast(pa.string()),
                "n_pairs": pa.array(n_pairs[live], pa.int64()),
                "n_sampled": pa.array(n_sampled[live], pa.int64()),
                "sampled_price_micro": pa.array(pm_sampled[live], pa.int64()),
            }
        )

    partials = tagged.groupby("__bucket").map_groups(pair_sample, batch_format="pyarrow")
    return tiny_key_sum(
        partials,
        ["event_type"],
        ["n_pairs", "n_sampled", "sampled_price_micro"],
        sort_cols=["event_type"],
    )


def association_rules(sf_dir: str, min_support: int = 3, k: int = 50):
    """Association-rule mining over the order/part basket (Agrawal &
    Srikant 1994 shapes, single-consequent rules): for every directed
    rule A -> B whose pair co-occurs in >= min_support orders, the
    exact support / confidence / lift in integer micro-units —
    conf_micro = floor(1e6 * n_both / n_ante), lift_micro =
    floor(1e6 * n_both * N / (n_ante * n_cons)) — top-k by
    (lift DESC, antecedent, consequent).

    Scale shape: pair supports come from part_pair_counts (ONE
    orderkey co-location; per-partition distinct-pair pre-count, one
    pair-key shuffle — fan-out bounded by lines-per-order). Single-item
    supports and the order total fold in the SAME orderkey partitions
    (distinct-ness is exact in-partition because an order never
    splits), then tiny_key_sum — driver state is O(|part dimension|),
    the side the broadcast needs anyway, never O(corpus). Rules attach
    via ONE ray.put of the sorted (part, supp) arrays read per worker;
    int64 lift math is overflow-guarded."""
    n_parts = _n_partitions()
    from georay.relational import part_pair_counts  # self-import safe

    pairs = part_pair_counts(sf_dir, min_orders=min_support)

    ds = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def bucket(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "ok": pa.array(ok, pa.int64()),
                "pk": t["l_partkey"].cast(pa.int64()),
                "__bucket": pa.array(_hash_bucket(ok, n_parts), pa.int64()),
            }
        )

    def supp_partial(g: pa.Table) -> pa.Table:
        ok = g["ok"].to_numpy(zero_copy_only=False)
        pk = g["pk"].to_numpy(zero_copy_only=False)
        order = np.lexsort((pk, ok))
        ok, pk = ok[order], pk[order]
        if len(ok):
            dup = np.r_[False, (ok[1:] == ok[:-1]) & (pk[1:] == pk[:-1])]
            ok, pk = ok[~dup], pk[~dup]
        upk, cnt = np.unique(pk, return_counts=True)
        n_ok = int(len(np.unique(ok)))
        return pa.table(
            {
                # part -1 carries the distinct-order partial
                "part": pa.array(np.r_[upk, [-1]], pa.int64()),
                "supp": pa.array(np.r_[cnt.astype(np.int64), [n_ok]], pa.int64()),
            }
        )

    supports = tiny_key_sum(
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(supp_partial, batch_format="pyarrow"),
        ["part"],
        ["supp"],
    ).take_all()
    s_part = np.array([r["part"] for r in supports], dtype=np.int64)
    s_supp = np.array([r["supp"] for r in supports], dtype=np.int64)
    order = np.argsort(s_part)
    s_part, s_supp = s_part[order], s_supp[order]
    n_orders = int(s_supp[s_part == -1][0])
    keep = s_part >= 0
    s_part, s_supp = s_part[keep], s_supp[keep]
    supp_ref = ray.put((s_part, s_supp, n_orders))

    def rules(t: pa.Table, bc) -> pa.Table:
        parts, supp, n_tot = bc
        a = t["part_a"].to_numpy(zero_copy_only=False)
        b = t["part_b"].to_numpy(zero_copy_only=False)
        nb = t["n_orders"].to_numpy(zero_copy_only=False)
        ante = np.r_[a, b]
        cons = np.r_[b, a]
        n_both = np.r_[nb, nb]
        sa = supp[np.searchsorted(parts, ante)]
        sc = supp[np.searchsorted(parts, cons)]
        if len(n_both) and int(n_both.max()) * n_tot * 1_000_000 >= (1 << 62):
            raise ValueError("association_rules: lift numerator overflows int64")
        conf = (1_000_000 * n_both) // sa
        lift = (1_000_000 * n_both * np.int64(n_tot)) // (sa * sc)
        return pa.table(
            {
                "antecedent": pa.array(ante, pa.int64()),
                "consequent": pa.array(cons, pa.int64()),
                "n_both": pa.array(n_both, pa.int64()),
                "n_ante": pa.array(sa, pa.int64()),
                "conf_micro": pa.array(conf, pa.int64()),
                "lift_micro": pa.array(lift, pa.int64()),
            }
        )

    return (
        broadcast_map_batches(pairs, rules, supp_ref)
        .sort(["lift_micro", "antecedent", "consequent"], descending=[True, False, False])
        .limit(k)
    )
