"""End-to-end parity of the flagship's auto-selected sharded polygon
index (VERDICT r02 #1/#4): with GEORAY_INDEX_BUDGET forced to 1 byte
the gate must route the PIP join through ShardedPolygonIndex, and the
joined + tile outputs must be identical to the broadcast-index run."""

import pandas as pd


def _run(pages, out, budget, monkeypatch):
    from georay.pipelines.flagship import geotag_pipeline

    monkeypatch.setenv("GEORAY_INDEX_BUDGET", str(budget))
    res = geotag_pipeline(pages, out_dir=out)
    joined = (
        res["joined"]
        .to_pandas()
        .sort_values(["page_key", "polygon_id"])
        .reset_index(drop=True)
    )
    tiles = res["tiles"].to_pandas().sort_values("tile").reset_index(drop=True)
    return res, joined, tiles


def test_sharded_gate_end_to_end(ray_session, tmp_path, monkeypatch):
    from georay.pages import pages_dir_for
    from georay.spatial.index import PolygonIndex, ShardedPolygonIndex

    pages = pages_dir_for("/root/testdata/sf0.001")

    res_b, joined_b, tiles_b = _run(pages, str(tmp_path / "bcast"), 1 << 40, monkeypatch)
    assert isinstance(res_b["index"], PolygonIndex)

    res_s, joined_s, tiles_s = _run(pages, str(tmp_path / "shard"), 1, monkeypatch)
    assert isinstance(res_s["index"], ShardedPolygonIndex)
    assert len(res_s["index"].shard_refs) >= 1

    pd.testing.assert_frame_equal(joined_b, joined_s)
    pd.testing.assert_frame_equal(tiles_b, tiles_s)


def test_sharded_knn_uses_bounded_centroid_index(ray_session, tmp_path, monkeypatch):
    """VERDICT r03 #3: sharded mode + kNN must NOT re-broadcast the
    full compiled index — it broadcasts a bounded CentroidIndex — and
    the kNN output must be byte-identical to the broadcast path."""
    from georay.pages import pages_dir_for
    from georay.pipelines.flagship import geotag_pipeline
    from georay.spatial.index import ShardedPolygonIndex

    pages = pages_dir_for("/root/testdata/sf0.001")

    def knn_run(out, budget):
        monkeypatch.setenv("GEORAY_INDEX_BUDGET", str(budget))
        res = geotag_pipeline(pages, out_dir=out, knn_k=3)
        knn = (
            res["knn"]
            .to_pandas()
            .sort_values(["page_key", "rank"])
            .reset_index(drop=True)
        )
        return res, knn

    res_b, knn_b = knn_run(str(tmp_path / "bcast"), 1 << 40)
    res_s, knn_s = knn_run(str(tmp_path / "shard"), 1)
    assert isinstance(res_s["index"], ShardedPolygonIndex)
    # the full-index broadcast handle must not exist in sharded mode
    assert res_s["index_ref"] is None
    assert len(knn_b) > 0
    pd.testing.assert_frame_equal(knn_b, knn_s)
