"""Checkpoint manifests: commit atomicity, fingerprint gating, and
corruption detection (the resume contract the flagship relies on)."""

import os

import pyarrow as pa
import pytest

from georay import checkpoint as cp


@pytest.fixture()
def ds(ray_session):
    import ray.data

    return ray.data.from_arrow(
        pa.table({"k": pa.array(range(100), pa.int64())})
    )


def test_commit_writes_manifest_and_rereads(ds, tmp_path):
    stage = str(tmp_path / "stage")
    out = cp.checkpoint_dataset(ds, stage, fingerprint="fp")
    assert out.count() == 100
    m = cp.load_manifest(stage)
    assert m["state"] == "committed"
    assert m["fingerprint"] == "fp"
    assert m["files"] and all(os.path.exists(os.path.join(stage, f)) for f in m["files"])
    assert m["partitions"][0]["bytes"] > 0
    assert cp.is_complete(stage, "fp")


def test_matching_fingerprint_skips_rewrite(ds, tmp_path):
    stage = str(tmp_path / "stage")
    cp.checkpoint_dataset(ds, stage, fingerprint="fp")
    before = cp.load_manifest(stage)["created_at"]
    cp.checkpoint_dataset(ds, stage, fingerprint="fp")
    assert cp.load_manifest(stage)["created_at"] == before  # untouched


def test_fingerprint_mismatch_forces_rewrite(ds, tmp_path):
    stage = str(tmp_path / "stage")
    cp.checkpoint_dataset(ds, stage, fingerprint="fp1")
    before = cp.load_manifest(stage)["created_at"]
    cp.checkpoint_dataset(ds, stage, fingerprint="fp2")
    m = cp.load_manifest(stage)
    assert m["fingerprint"] == "fp2"
    assert m["created_at"] >= before
    assert not cp.is_complete(stage, "fp1")
    assert cp.is_complete(stage, "fp2")


def test_missing_data_file_marks_incomplete(ds, tmp_path):
    stage = str(tmp_path / "stage")
    cp.checkpoint_dataset(ds, stage, fingerprint="fp")
    victim = os.path.join(stage, cp.load_manifest(stage)["files"][0])
    os.remove(victim)
    assert not cp.is_complete(stage, "fp")
    # recompute heals it
    out = cp.checkpoint_dataset(ds, stage, fingerprint="fp")
    assert out.count() == 100
    assert cp.is_complete(stage, "fp")


def test_partial_tmp_dir_never_looks_committed(ds, tmp_path):
    stage = str(tmp_path / "stage")
    os.makedirs(f"{stage}.tmp-deadbeef", exist_ok=True)  # simulated crash mid-write
    assert not cp.is_complete(stage)
    assert cp.load_manifest(stage) is None


def test_flagship_resume_end_to_end(ray_session, tmp_path):
    """Full flagship with out_dir: second run with the same fingerprint
    resumes every stage from committed manifests (no recompute, same
    results) — including the payload sidecar and the accumulator-based
    tile rollup vs the re-read rollup on resume."""
    from georay.pages import pages_dir_for
    from georay.pipelines.flagship import geotag_pipeline

    pages = pages_dir_for("/root/testdata/sf0.001")
    out = str(tmp_path / "run")

    r1 = geotag_pipeline(pages, out_dir=out, fingerprint="fp1")
    tiles1 = sorted(
        (row["tile"], row["n_pages"]) for row in r1["tiles"].take_all()
    )
    joined1 = r1["joined"].count()
    created = {
        name: cp.load_manifest(os.path.join(out, name))["created_at"]
        for name in ("pages_store", "features", "joined", "tiles", "layers")
    }

    r2 = geotag_pipeline(pages, out_dir=out, fingerprint="fp1")
    tiles2 = sorted(
        (row["tile"], row["n_pages"]) for row in r2["tiles"].take_all()
    )
    assert tiles2 == tiles1
    assert r2["joined"].count() == joined1
    for name, ts in created.items():
        assert cp.load_manifest(os.path.join(out, name))["created_at"] == ts, name
