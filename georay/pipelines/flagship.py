"""The flagship geotag pipeline (north star end-to-end):

  read pages parquet
    -> extract text (byte-identical invariant) + page coordinates
    -> decode embedded geo payloads (GeoJSON/KML/KMZ/SHP) with exact
       per-blob layer merging, normalize + reproject to EPSG:4326
    -> compile the polygon index (dedup + STRtree + cell cover),
       broadcast with ray.put
    -> cell-encode + ray-casting PIP join (actor pool)
    -> kNN (cell-ring expansion) and tile assignment + per-tile counts
    -> partitioned parquet outputs with manifest checkpoints

Everything before a sink is a lazy streaming Dataset; the only
materializations are the tiny polygon index and the aggregates.
"""

from __future__ import annotations

import time

import ray

from ..checkpoint import checkpoint_dataset
from ..metrics import StageTimer
from ..pages import pages_dir_for
from ..pipeline import decode_features, extract_batch, layer_stats
from ..spatial.index import build_polygon_index
from ..spatial.join import KNNJoiner, PIPJoiner
from ..spatial.tiles import assign_tiles_batch, tile_counts


def geotag_pipeline(
    pages_path: str,
    out_dir: str | None = None,
    knn_k: int = 0,
    pip_concurrency=(2, 8),
    checkpoint: bool = False,
    fingerprint: str = "",
):
    """Run the full pipeline. Returns a dict with the result handles:
    {joined, tiles, layers, features, index, timings, counts}.
    With out_dir set, joined/tiles/layers are written as parquet
    directories with manifests (resumable)."""
    import ray.data

    timings: dict = {}
    pages = ray.data.read_parquet(pages_path)

    # features branch (payload pages only; ~1% of rows survive decode).
    # Materialized exactly once — as a parquet checkpoint when out_dir is
    # set (resumable), else pinned in the object store (it is tiny) —
    # because three consumers need it (index build, layer rollup, sink).
    with StageTimer(timings, "decode_features"):
        feats = decode_features(pages)
        if out_dir:
            feats = checkpoint_dataset(feats, f"{out_dir}/features", fingerprint)
        else:
            feats = feats.materialize()

    with StageTimer(timings, "build_index"):
        index = build_polygon_index(feats)
        index_ref = ray.put(index)
    layers = layer_stats(feats)

    # points branch (all pages, one streaming pass):
    # extract -> PIP join -> tile assign -> sink; per-tile counts are a
    # two-phase aggregate over the (small) joined stream
    points = pages.map_batches(extract_batch, batch_format="pyarrow").drop_columns(["html"])
    joined = points.map_batches(
        PIPJoiner,
        fn_constructor_args=(index_ref,),
        batch_format="pyarrow",
        concurrency=pip_concurrency,
        num_cpus=1,
    )
    tiled = joined.map_batches(assign_tiles_batch, batch_format="pyarrow")

    results = {"features": feats, "index": index, "timings": timings}

    if out_dir:
        with StageTimer(timings, "join_and_write"):
            tiled = checkpoint_dataset(tiled, f"{out_dir}/joined", fingerprint)
        with StageTimer(timings, "tile_counts"):
            results["tiles"] = checkpoint_dataset(
                tile_counts(tiled), f"{out_dir}/tiles", fingerprint
            )
        with StageTimer(timings, "layer_rollup"):
            results["layers"] = checkpoint_dataset(layers, f"{out_dir}/layers", fingerprint)
    else:
        results["tiles"] = tile_counts(tiled)
        results["layers"] = layers
    results["joined"] = tiled

    knn = None
    if knn_k:
        knn = points.map_batches(
            KNNJoiner,
            fn_constructor_args=(index_ref, knn_k),
            batch_format="pyarrow",
            concurrency=pip_concurrency,
            num_cpus=1,
        )
        if out_dir:
            with StageTimer(timings, "knn"):
                knn = checkpoint_dataset(knn, f"{out_dir}/knn", fingerprint)
    results["knn"] = knn
    return results


def run_headline(sf_dir: str, out_dir: str | None = None, knn_k: int = 0):
    """Bench entrypoint: synthesize (cached) + run + return metrics.
    Writes to a fresh temp dir when out_dir is None so every stage runs
    exactly once (streamed to parquet sinks, the realistic shape).
    Returns (pages_per_sec, detail dict)."""
    import shutil
    import tempfile

    pages_path = pages_dir_for(sf_dir)
    from ..pages import sf_page_count

    cleanup = None
    if out_dir is None:
        out_dir = tempfile.mkdtemp(prefix="georay_run_")
        cleanup = out_dir

    n_pages = sf_page_count(sf_dir)
    t0 = time.perf_counter()
    res = geotag_pipeline(pages_path, out_dir=out_dir, knn_k=knn_k)
    # consume the streams
    n_joined = res["joined"].count()
    n_tiles = res["tiles"].count()
    n_layers = res["layers"].count()
    if res["knn"] is not None:
        res["knn"].count()
    wall = time.perf_counter() - t0
    if cleanup:
        shutil.rmtree(cleanup, ignore_errors=True)
    return n_pages / wall, {
        "wall_sec": round(wall, 3),
        "n_pages": n_pages,
        "n_joined": n_joined,
        "n_tiles": n_tiles,
        "n_layers": n_layers,
        "timings": res["timings"],
    }
