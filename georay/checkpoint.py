"""Stage checkpointing with per-partition lineage manifests.

"Resumable from checkpoint" for a batch pipeline (north rule): every
stage boundary that feeds a shuffle or an expensive recompute can be
materialized as a directory of parquet part files plus a _MANIFEST.json
recording the input fingerprint, row count, file list and wall time.
On rerun, a stage whose manifest matches its input fingerprint is
loaded with `read_parquet` instead of recomputed — a killed job resumes
mid-pipeline (between decode, join and tile phases) without redoing
finished work. Writes go to a temp dir and are renamed into place, so a
partial write never looks committed.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

try:
    # Ray's datasink lazily imports fsspec.implementations.http on
    # every write; without aiohttp that import fails — harmlessly
    # (ModuleNotFoundError is caught) when single-threaded, but two
    # sink chains starting on concurrent driver threads can observe the
    # partially-initialized module and crash with a plain ImportError
    # Ray does NOT catch. Register a benign stub once, at import time:
    # this engine only writes local filesystems, so the isinstance
    # check the real class feeds is always False anyway.
    import fsspec.implementations.http  # noqa: F401
except ImportError:  # pragma: no cover - aiohttp absent in this env
    try:
        import sys
        import types

        import fsspec.implementations  # noqa: F401

        _http_stub = types.ModuleType("fsspec.implementations.http")

        class _NeverHTTPFileSystem:
            pass

        _http_stub.HTTPFileSystem = _NeverHTTPFileSystem
        sys.modules["fsspec.implementations.http"] = _http_stub
    except ImportError:
        pass


def manifest_path(stage_dir: str) -> str:
    return os.path.join(stage_dir, "_MANIFEST.json")


def load_manifest(stage_dir: str):
    try:
        with open(manifest_path(stage_dir)) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def is_complete(stage_dir: str, fingerprint: str | None = None) -> bool:
    m = load_manifest(stage_dir)
    if not m or m.get("state") != "committed":
        return False
    if fingerprint is not None and m.get("fingerprint") != fingerprint:
        return False
    return all(os.path.exists(os.path.join(stage_dir, f)) for f in m.get("files", []))


def checkpoint_dataset(ds, stage_dir: str, fingerprint: str = "", metadata: dict | None = None):
    """Materialize `ds` at stage_dir (atomic) and return a re-read
    Dataset. If a committed manifest with the same fingerprint exists,
    skip the write entirely."""
    import ray.data

    if is_complete(stage_dir, fingerprint or None):
        return read_checkpoint(stage_dir)

    tmp = f"{stage_dir}.tmp-{uuid.uuid4().hex[:8]}"
    os.makedirs(tmp, exist_ok=True)
    t0 = time.perf_counter()
    ds.write_parquet(tmp)
    wall = time.perf_counter() - t0
    files = sorted(f for f in os.listdir(tmp) if f.endswith(".parquet"))
    manifest = {
        "state": "committed",
        "fingerprint": fingerprint,
        "files": files,
        "partitions": [{"file": f, "bytes": os.path.getsize(os.path.join(tmp, f))} for f in files],
        "write_wall_sec": round(wall, 3),
        "created_at": time.time(),
        **(metadata or {}),
    }
    with open(os.path.join(tmp, "_MANIFEST.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    if os.path.isdir(stage_dir):
        shutil.rmtree(stage_dir)
    os.replace(tmp, stage_dir)
    return read_checkpoint(stage_dir)


def _data_files(stage_dir: str):
    m = load_manifest(stage_dir) or {}
    return [os.path.join(stage_dir, f) for f in m.get("files", [])]


def read_checkpoint(stage_dir: str, columns=None):
    """Re-read a committed checkpoint with a DATA-sized block count.

    A checkpoint written by a 64-block stage holds 64 part files even
    when the stage produced 4k rows; the default one-block-per-file
    read then fans every downstream consumer into 64 near-empty tasks
    whose fixed scheduling cost dominates (measured: the flagship's
    layer rollup spent ~0.7 s of its 0.9 s isolated wall on 64+58
    micro-tasks over 280 KB of data). Sizing blocks from total BYTES
    (~64 MB/block, floor 8) keeps small checkpoints at 8 blocks and
    converges to the same count as the default for at-scale data."""
    import ray.data

    files = _data_files(stage_dir)
    nbytes = sum(os.path.getsize(f) for f in files)
    blocks = max(8, nbytes // (64 << 20))
    return ray.data.read_parquet(files, columns=columns, override_num_blocks=blocks)
