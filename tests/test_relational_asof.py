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
