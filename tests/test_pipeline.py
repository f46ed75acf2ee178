"""End-to-end Ray Data pipeline tests over the synthetic pages corpus."""

import json

import pyarrow as pa
import pytest

import ray


@pytest.fixture(scope="module")
def pages_ds(ray_session):
    import ray.data

    from georay.pages import pages_batch

    return ray.data.from_arrow(pages_batch(0, 500))


def test_extract_text_byte_identical(pages_ds):
    from georay.pipeline import extract_batch

    out = pages_ds.map_batches(extract_batch, batch_format="pyarrow")
    for row in out.take_all():
        pass
    # byte-identical invariant: text column was generated as page_text(url)
    # and extract_batch must reproduce it from html alone
    tbl = pa.Table.from_pylist(out.take_all())
    src = pa.Table.from_pylist(pages_ds.take_all())
    by_url = {u: t for u, t in zip(src["url"].to_pylist(), src["text"].to_pylist())}
    for u, t in zip(tbl["url"].to_pylist(), tbl["text"].to_pylist()):
        assert t == by_url[u], "extracted text differs from the frozen invariant"


def test_decode_features_and_layers(pages_ds):
    from georay.fixtures import payload_polygon_ids
    from georay.pipeline import decode_features, layer_stats

    feats = decode_features(pages_ds)
    rows = feats.take_all()
    # 500 pages -> 5 payload blobs x 4 polygons each
    assert len(rows) == 20
    assert all(r["decode_error"] is None for r in rows)
    assert all(r["arity_ok"] for r in rows)

    layers = layer_stats(feats).take_all()
    assert len(layers) == 5  # one layer per blob (homogeneous schema)
    for l in layers:
        assert l["count"] == 4
        assert l["layer_name"] == "layer_0"
        names, ctypes = json.loads(l["cols_json"])
        assert names[0] == "the_geom"
        assert "polygon_id" in names
        # all four decode formats must agree on geometry bbox validity
        assert -122.5 <= l["bbox_minx"] <= l["bbox_maxx"] <= -122.2
        assert 47.4 <= l["bbox_miny"] <= l["bbox_maxy"] <= 47.8

    # polygon ids round-trip per blob
    for r in rows:
        k = int(r["url"].rsplit("/", 1)[1]) // 100
        expect_ids = payload_polygon_ids(k)
        props = json.loads(r["props_json"])
        names, _ = json.loads(r["cols_json"])
        pid = props[names.index("polygon_id") - 1]
        assert int(pid) in expect_ids


def test_layer_table_typed(pages_ds):
    from georay.pipeline import decode_features, layer_stats, layer_table

    feats = decode_features(pages_ds)
    layers = layer_stats(feats).take_all()
    sig = layers[0]["layer_sig"]
    tbl = layer_table(feats, sig)
    assert tbl.num_rows > 0
    assert tbl.schema.field("the_geom").type == pa.binary()
    assert tbl.schema.field("polygon_id").type == pa.float64()
    assert tbl.schema.field("name").type == pa.string()


def test_decode_error_quarantine(ray_session):
    import ray.data

    from georay.pages import pages_batch
    from georay.pipeline import decode_batch

    tbl = pages_batch(0, 101)
    # corrupt the payload page's html payload content
    htmls = tbl["html"].to_pylist()
    htmls[0] = htmls[0].replace(b'data-filename="grid.geojson">', b'data-filename="grid.geojson">!!notb64')
    tbl = tbl.set_column(2, "html", pa.array(htmls, pa.binary()))
    out = ray.data.from_arrow(tbl).map_batches(decode_batch, batch_format="pyarrow").take_all()
    bad = [r for r in out if r["decode_error"] is not None]
    good = [r for r in out if r["decode_error"] is None]
    assert len(bad) == 1 and bad[0]["decode_error"] in (
        "json_parse",
        "archive",
        "unknown_file_type",
        "decode_crash",
    )
    assert len(good) == 4  # page 100's payload still decodes


def test_extract_text_equivalence_golden():
    """The fast scanner must be byte-identical to the defining regex
    (<p>(.*?)</p> DOTALL, non-greedy) on every input shape."""
    from georay.pages import _extract_text_regex, extract_text, page_html, page_text, page_url

    cases = [
        b"",
        b"no tags at all",
        b"<p>one</p>",
        b"<p>a</p><p>b</p>",
        b"<p>multi\nline\ncontent</p>",
        b"<p>unclosed",
        b"<p>a</p><p>unclosed tail",
        b"<p>outer <p>inner</p> rest</p>",  # nested: regex stops at first close
        b"</p>orphan close<p>x</p>",
        b"<p></p>",
        b"<P>upper not matched</P>",
        b"prefix <p>a</p> middle <p>b</p> suffix",
        "<p>unicode é中文</p>".encode(),
    ]
    for i in range(50):
        url = page_url(i)
        cases.append(page_html(i, url, page_text(url)))
    for html in cases:
        assert extract_text(html) == _extract_text_regex(html), html[:60]


def test_metrics_actor_collects(ray_session):
    import ray

    from georay.metrics import get_metrics_actor

    actor = get_metrics_actor("test_metrics")
    ray.get(actor.record_stage.remote("decode", 1.5, rows=100))
    ray.get(actor.record_stage.remote("decode", 0.5, rows=50))
    ray.get(actor.incr.remote("pages", 10))
    snap = ray.get(actor.snapshot.remote())
    assert snap["stages"]["decode"] == {"wall_sec": 2.0, "rows": 150, "calls": 2}
    assert snap["counters"]["pages"] == 10
    # named handle: a second get returns the same actor
    again = get_metrics_actor("test_metrics")
    assert ray.get(again.snapshot.remote())["counters"]["pages"] == 10
    ray.kill(actor)


def test_extract_texts_column_equivalence():
    """The batch-buffer scanner must equal per-row extract_text on
    every input shape, including sliced and multi-chunk columns."""
    import pyarrow as pa

    from georay.pages import extract_text, extract_texts_column, page_html, page_text, page_url

    cases = [
        b"",
        b"no tags at all",
        b"<p>one</p>",
        b"<p>a</p><p>b</p>",
        b"<p>multi\nline\ncontent</p>",
        b"<p>unclosed",
        b"<p>a</p><p>unclosed tail",
        b"<p>outer <p>inner</p> rest</p>",
        b"</p>orphan close<p>x</p>",
        b"<p></p>",
    ] + [
        page_html(i, page_url(i), page_text(page_url(i))) for i in range(0, 300, 7)
    ]
    col = pa.array(cases, pa.binary())
    want = [extract_text(h) for h in cases]
    assert extract_texts_column(col) == want
    # sliced view (non-zero offset)
    assert extract_texts_column(col.slice(3, 20)) == want[3:23]
    # chunked column
    chunked = pa.chunked_array([col.slice(0, 5), col.slice(5)])
    assert extract_texts_column(chunked) == want
