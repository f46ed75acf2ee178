"""The flagship geotag pipeline (north star end-to-end):

  read pages parquet  (ONE raw-html scan per run)
    -> extract text (byte-identical invariant) + page coordinates,
       payload subset split to an idempotent parquet sidecar
    -> decode the payload sidecar (GeoJSON/KML/KMZ/SHP) with exact
       per-blob layer merging, normalize + reproject to EPSG:4326
    -> compile the polygon index in a Ray task (dedup + STRtree +
       cell cover); the returned ObjectRef is the broadcast handle
    -> cell-encode + ray-casting PIP join (task mode, per-worker
       joiner cache) fused with tile assignment; tile counts fold
       into the write via an idempotent accumulator actor
    -> kNN (exact ring expansion) and per-layer rollups on
       concurrent driver-thread chains
    -> partitioned parquet outputs with manifest checkpoints
       (streaming writes; resume via committed manifests)

Everything before a sink is a lazy streaming Dataset; the only
materializations are the tiny polygon index and the aggregates.
"""

from __future__ import annotations

import time

import ray

from ..checkpoint import checkpoint_dataset
from ..metrics import StageTimer
from ..pages import pages_dir_for
from ..pipeline import (
    decode_features,
    extract_split_batch,
    extract_split_sidecar_batch,
    layer_stats,
)
from ..spatial.index import build_polygon_index_remote
from ..spatial.join import (
    KNNJoiner,
    PIPJoiner,
    knn_join_batch,
    pip_join_batch,
    sharded_pip_join_batch,
)
from ..spatial.tiles import (
    TileCountAccumulator,
    assign_tiles_and_count_batch,
    assign_tiles_batch,
    tile_counts,
    tile_counts_table,
)


def _cluster_cpus() -> int:
    try:
        return max(1, int(ray.cluster_resources().get("CPU", 8)))
    except Exception:
        return 8


def _polygon_wkb_bytes(ds) -> int:
    """Estimated polygon-side bytes: sum of wkb lengths over polygon
    rows (distributed partial sums; the driver sees one int)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def nb(t):
        if "wkb" not in t.column_names:
            return pa.table({"nbytes": pa.array([0], pa.int64())})
        mask = pc.and_(
            pc.is_valid(t["wkb"]),
            pc.is_in(t["geom_type"], value_set=pa.array(["polygon", "multipolygon"])),
        )
        s = pc.sum(pc.binary_length(t.filter(mask)["wkb"])).as_py() or 0
        return pa.table({"nbytes": pa.array([int(s)], pa.int64())})

    return int(ds.map_batches(nb, batch_format="pyarrow").sum("nbytes") or 0)


def geotag_pipeline(
    pages_path: str,
    out_dir: str | None = None,
    knn_k: int = 0,
    pip_concurrency=None,
    fingerprint: str = "",
):
    """Run the full pipeline. Returns a dict with the result handles:
    {joined, tiles, layers, features, index, timings, counts}.
    With out_dir set, joined/tiles/layers are written as parquet
    directories with manifests (resumable).

    Parallelism is sized from the cluster, not hard-coded: the pages
    read is oversplit to ~3 blocks/CPU (small corpora would otherwise
    produce fewer blocks than CPUs and cap every downstream stage), and
    the PIP/kNN actor pools autoscale up to the CPU count."""
    import ray.data

    import pyarrow as pa
    import pyarrow.compute as pc

    from ..checkpoint import _data_files, is_complete, read_checkpoint
    from ..pipeline import _LAYER_KEY
    from concurrent.futures import ThreadPoolExecutor

    ncpu = _cluster_cpus()

    timings: dict = {}
    # block count from DATA SIZE (~128 MB of raw input per block, Ray's
    # own target), floored at 2 blocks/CPU so small corpora still fan
    # out. CPU-count-based splitting (the old 6x cpus) gave the same
    # corpus 4x the per-task fixed overhead at 16 cpus vs 4 — a pure
    # anti-scaling term.
    import glob as _glob
    import os as _os

    in_bytes = sum(
        _os.path.getsize(f) for f in _glob.glob(f"{pages_path}/*.parquet")
    ) or (1 << 30)
    blocks = max(16, 2 * ncpu, in_bytes // (128 << 20))
    # Stage boundaries STREAM to parquet checkpoints and downstream
    # stages do pruned column re-reads. (A materialize-then-write-async
    # variant was measured 2x WORSE on this box: holding full blocks in
    # the object store doubles memory-bus traffic, which is the binding
    # resource — compressed parquet through the page cache is cheaper
    # than plasma round-trips.)
    def stage(ds_lazy, name: str):
        """Checkpoint a stage (streaming write) or resume it from a
        committed manifest; returns a re-read Dataset."""
        if out_dir:
            stage_dir = f"{out_dir}/{name}"
            if is_complete(stage_dir, fingerprint or None):
                return read_checkpoint(stage_dir)
            return checkpoint_dataset(ds_lazy, stage_dir, fingerprint)
        return ds_lazy.materialize()

    # THE one raw-html scan of the run (100-TB rule: the html read
    # dominates I/O; the old two-branch shape scanned it twice). One
    # pass extracts the points columns AND splits off the ~1% payload
    # subset as `payload_html`; later stages consume pruned projections.
    pages = ray.data.read_parquet(
        pages_path,
        # ONLY the columns the scan consumes: warc_ts/lang are never
        # re-read by a flagship stage, and at 10^12 rows every extra
        # column is read + store-write + memory-bus traffic
        columns=["url", "html"],
        override_num_blocks=blocks,
    )
    with StageTimer(timings, "scan_extract"):
        if out_dir:
            sidecar = f"{out_dir}/payload_sidecar"
            if not is_complete(f"{out_dir}/pages_store", fingerprint or None):
                import os
                import shutil

                shutil.rmtree(sidecar, ignore_errors=True)
                os.makedirs(sidecar, exist_ok=True)
            store = stage(
                pages.map_batches(
                    extract_split_sidecar_batch,
                    fn_kwargs={"sidecar_dir": sidecar},
                    batch_format="pyarrow",
                ),
                "pages_store",
            )
        else:
            store = stage(
                pages.map_batches(extract_split_batch, batch_format="pyarrow"),
                "pages_store",
            )

    # features branch decodes ONLY the payload subset projection
    with StageTimer(timings, "decode_features"):
        if out_dir:
            import glob

            sfiles = sorted(glob.glob(f"{out_dir}/payload_sidecar/payload-*.parquet"))
            if sfiles:
                payload_src = ray.data.read_parquet(sfiles)
            else:  # corpus with no payload pages at all
                payload_src = ray.data.from_arrow(
                    pa.table(
                        {
                            "url": pa.array([], pa.string()),
                            "payload_html": pa.array([], pa.binary()),
                        }
                    )
                )
        else:
            payload_src = store.select_columns(["url", "payload_html"])

        def payload_rows(t: pa.Table) -> pa.Table:
            t = t.filter(pc.is_valid(t["payload_html"]))
            return pa.table({"url": t["url"], "html": t["payload_html"]})

        feats = stage(
            decode_features(
                payload_src.map_batches(payload_rows, batch_format="pyarrow")
            ),
            "features",
        )

    with StageTimer(timings, "build_index"):
        # Auto-switch to the sharded index when the estimated compiled
        # footprint exceeds the single-object broadcast contract
        # (VERDICT r02 #1): the estimate is one pruned pass over the
        # (already checkpointed) polygon wkb bytes; x3 covers the
        # unpack-to-float64-rings + dict overhead of compilation.
        # Budget: GEORAY_INDEX_BUDGET env (bytes), default 2 GiB —
        # tests force the sharded path with a tiny budget.
        idx_cols = ["wkb", "geom_type", "props_json", "cols_json"]
        # feats is the checkpoint's re-read dataset (or the materialized
        # stream); select_columns prunes without a second read plan
        idx_src = feats.select_columns(idx_cols)
        if out_dir:
            # estimate from the checkpoint's on-disk footprint — file
            # metadata only, no extra Ray pass in the hot path (x2
            # conservative decompression factor; over-estimating only
            # routes to the sharded path, which is parity-tested)
            est = 2 * sum(
                _os.path.getsize(f) for f in _data_files(f"{out_dir}/features")
            )
        else:
            est = _polygon_wkb_bytes(idx_src)
        budget = int(_os.environ.get("GEORAY_INDEX_BUDGET", 2 << 30))
        sharded = None
        if est * 3 > budget:
            from ..spatial.index import build_sharded_polygon_index

            sharded = build_sharded_polygon_index(idx_src)
        # single-object index: the broadcast handle for the PIP join
        # (compiled OFF the driver in a Ray task; join tasks block on
        # the ObjectRef lazily). The sharded path NEVER compiles it —
        # kNN there broadcasts a bounded CentroidIndex instead:
        # (polygon_id, lon, lat) only, tiny even at 100x the polygon
        # universe (VERDICT r03 #3).
        index_ref = build_polygon_index_remote(idx_src) if sharded is None else None
        knn_ref = None
        if knn_k:
            if sharded is None:
                knn_ref = index_ref
            else:
                from ..spatial.index import build_centroid_index_remote

                knn_ref = build_centroid_index_remote(idx_src)
    layer_cols = _LAYER_KEY + ["minx", "miny", "maxx", "maxy", "decode_error"]
    if out_dir:
        layer_src = read_checkpoint(f"{out_dir}/features", columns=layer_cols)
    else:
        layer_src = feats.select_columns(layer_cols)
    layers = layer_stats(layer_src)

    # points branch: pruned projection of the pages store (url/lon/lat
    # only — never the html) -> PIP join -> tile assign -> sink.
    # PIP/kNN run TASK-mode (see spatial/join.py): the broadcast index
    # is immutable, so plain tasks + a per-worker joiner cache scale to
    # every CPU with work stealing and fuse with the read/join/write
    # ops — no actor-pool spawn latency or pool-size tuning. Passing
    # pip_concurrency switches back to the actor-pool classes.
    if out_dir:
        # the PERSISTED run never moves url strings through the join:
        # the int64 page_key (already in the store) is the fact-table
        # key, and the store holds the url <-> key mapping. The url
        # column stays in the in-memory (query) path below, whose
        # result shape the geo_pip_join oracle pins.
        points = read_checkpoint(
            f"{out_dir}/pages_store", columns=["page_key", "lon", "lat"]
        )
    else:
        points = store.select_columns(["url", "lon", "lat"])
    if sharded is not None:
        # task-mode sharded join: points route to their coarse shard
        # cell; workers fetch + cache only the shards they touch
        joined = points.map_batches(
            sharded_pip_join_batch, fn_kwargs={"sharded": sharded}, batch_format="pyarrow"
        )
    elif pip_concurrency is None:
        joined = points.map_batches(
            pip_join_batch, fn_kwargs={"index_ref": index_ref}, batch_format="pyarrow"
        )
    else:
        joined = points.map_batches(
            PIPJoiner,
            fn_constructor_args=(index_ref,),
            batch_format="pyarrow",
            concurrency=pip_concurrency,
            num_cpus=1,
        )
    # tile partial counts accumulate in an idempotent actor DURING the
    # join write (out_dir mode), so no separate read-back pass is needed
    tile_acc = None
    if out_dir and not is_complete(f"{out_dir}/joined", fingerprint or None):
        import ray as _r

        tile_acc = _r.remote(TileCountAccumulator).remote()
        tiled = joined.map_batches(
            assign_tiles_and_count_batch,
            fn_kwargs={"acc": tile_acc},
            batch_format="pyarrow",
        )
    else:
        tiled = joined.map_batches(assign_tiles_batch, batch_format="pyarrow")
    # The PERSISTED sink carries the NORMALIZED join product (int64
    # page key, polygon key, tile): at 10^12 rows, denormalizing
    # polygon attributes, the url string and the page's lon/lat/cell
    # into the fact table multiplies the write bytes ~4x for data
    # re-derivable by keyed lookup (polygon attrs live in the features
    # output; url <-> page_key lives in the pages store). The enriched
    # row shape remains the in-memory result and the geo_pip_join
    # query.
    # (only consumed in out_dir mode, where points carry page_key)
    tiled_sink = tiled.select_columns(["page_key", "polygon_id", "polygon_layer", "tile"])

    knn_lazy = None
    if knn_k:
        if pip_concurrency is None:
            knn_lazy = points.map_batches(
                knn_join_batch,
                fn_kwargs={"index_ref": knn_ref, "k": knn_k},
                batch_format="pyarrow",
            )
        else:
            knn_lazy = points.map_batches(
                KNNJoiner,
                fn_constructor_args=(knn_ref, knn_k),
                batch_format="pyarrow",
                concurrency=pip_concurrency,
                num_cpus=1,
            )

    results = {"features": feats, "index_ref": index_ref, "timings": timings}

    if out_dir:
        # Independent chains execute CONCURRENTLY (driver threads; Ray
        # pipelines the underlying tasks): layer rollup and kNN don't
        # depend on the joined stage, and the tile rollup consumes the
        # materialized join blocks while the joined parquet commit is
        # still landing in the background.
        def chain_join():
            # STREAMING write (not materialize-then-write): the joined
            # stream is the big output; one pass straight to parquet.
            with StageTimer(timings, "join_and_write"):
                t = checkpoint_dataset(tiled_sink, f"{out_dir}/joined", fingerprint)
            with StageTimer(timings, "tile_counts"):
                if tile_acc is not None:
                    # totals already accumulated during the write pass
                    tiles = checkpoint_dataset(
                        ray.data.from_arrow(tile_counts_table(tile_acc)),
                        f"{out_dir}/tiles",
                        fingerprint,
                    )
                else:  # resumed joined checkpoint: pruned re-read rollup
                    tile_src = read_checkpoint(f"{out_dir}/joined", columns=["tile"])
                    tiles = checkpoint_dataset(
                        tile_counts(tile_src), f"{out_dir}/tiles", fingerprint
                    )
            return t, tiles

        def chain_layers():
            with StageTimer(timings, "layer_rollup"):
                return checkpoint_dataset(layers, f"{out_dir}/layers", fingerprint)

        def chain_knn():
            if knn_lazy is None:
                return None
            with StageTimer(timings, "knn"):
                return checkpoint_dataset(knn_lazy, f"{out_dir}/knn", fingerprint)

        with ThreadPoolExecutor(max_workers=3) as ex:
            f_join = ex.submit(chain_join)
            f_layers = ex.submit(chain_layers)
            f_knn = ex.submit(chain_knn)
            results["joined"], results["tiles"] = f_join.result()
            results["layers"] = f_layers.result()
            results["knn"] = f_knn.result()
        results["index"] = ray.get(index_ref) if index_ref is not None else sharded
    else:
        results["tiles"] = tile_counts(tiled)
        results["layers"] = layers
        results["joined"] = tiled
        results["knn"] = knn_lazy
        results["index"] = ray.get(index_ref) if index_ref is not None else sharded
    return results


def run_headline(
    sf_dir: str,
    out_dir: str | None = None,
    knn_k: int = 0,
    n_pages: int | None = None,
    payload_cap: int | None = None,
):
    """Bench entrypoint: synthesize (cached) + run + return metrics.
    Writes to a fresh temp dir when out_dir is None so every stage runs
    exactly once (streamed to parquet sinks, the realistic shape).
    Returns (pages_per_sec, detail dict)."""
    import shutil
    import tempfile

    from ..pages import sf_page_count

    if n_pages is None:
        n_pages = sf_page_count(sf_dir)
    pages_path = pages_dir_for(sf_dir, n=n_pages, payload_cap=payload_cap)

    cleanup = None
    if out_dir is None:
        out_dir = tempfile.mkdtemp(prefix="georay_run_")
        cleanup = out_dir
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
