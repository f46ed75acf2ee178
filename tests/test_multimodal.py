"""Multimodal stages: deterministic GRB codec round-trips, feature
values, and the real Ray actor-pool plumbing (schema, batch size,
fan-out layout). Real codec decode is stubbed (ExternalCodecDecoder);
these tests pin the stub's contract too."""

import numpy as np
import pyarrow as pa
import pytest

from georay import multimodal as mm


def test_image_roundtrip():
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, 8 * 6 * 3, dtype=np.int64).astype(np.uint8)
    blob = mm.encode_image(8, 6, 3, px)
    img = mm.decode_image_payload(blob)
    assert img.shape == (6, 8, 3)
    assert np.array_equal(img.reshape(-1), px)


def test_audio_roundtrip():
    samples = (np.sin(np.arange(4000) / 10.0) * 1000).astype(np.int16)
    sr, out = mm.decode_audio_payload(mm.encode_audio(8000, samples))
    assert sr == 8000
    assert np.array_equal(out, samples)


def test_video_roundtrip():
    frames = np.arange(3 * 4 * 5, dtype=np.uint8).reshape(3, 4, 5)
    fps, out = mm.decode_video_payload(mm.encode_video(5, 4, 10, frames))
    assert fps == 10
    assert np.array_equal(out, frames)


def test_bad_magic_raises():
    with pytest.raises(ValueError):
        mm.decode_image_payload(b"XXXX\x00\x00\x00\x00\x00")


def test_resize_nearest_identity_and_downscale():
    img = np.arange(16, dtype=np.uint8).reshape(4, 4)
    assert np.array_equal(mm.resize_nearest(img, 4, 4), img)
    half = mm.resize_nearest(img, 2, 2)
    assert half.shape == (2, 2)
    assert np.array_equal(half, img[[0, 2]][:, [0, 2]])


def test_synth_deterministic():
    k1, p1, m1 = mm.synth_payload(5)
    k2, p2, m2 = mm.synth_payload(5)
    assert (k1, p1, m1) == (k2, p2, m2)
    kinds = {mm.synth_payload(i)[0] for i in range(6)}
    assert kinds == {"image", "audio", "video"}


def test_media_batch_schema():
    t = mm.media_batch(0, 9)
    assert t.schema.equals(mm.MEDIA_SCHEMA)
    assert t.num_rows == 9
    # metadata matches the payload header
    img_rows = t.filter(pa.compute.equal(t["kind"], "image"))
    for i in range(img_rows.num_rows):
        img = mm.decode_image_payload(img_rows["payload"][i].as_py())
        assert img.shape[0] == img_rows["height"][i].as_py()
        assert img.shape[1] == img_rows["width"][i].as_py()


def test_external_codec_decoder_is_stubbed():
    dec = mm.ExternalCodecDecoder("jpeg")
    if dec._pil:  # pragma: no cover - PIL not in this container
        pytest.skip("PIL present")
    with pytest.raises(NotImplementedError):
        dec(mm.media_batch(0, 3))


@pytest.fixture(scope="module")
def media_ds(ray_session, tmp_path_factory):
    import ray.data

    out = str(tmp_path_factory.mktemp("media"))
    mm.synthesize_media_parquet(out, 60)
    return ray.data.read_parquet(out)


def test_image_features_pipeline(media_ds):
    rows = {r["media_id"]: r for r in mm.image_features(media_ds).take_all()}
    assert len(rows) == 20  # media_id % 3 == 0
    mid = sorted(rows)[0]
    r = rows[mid]
    img = mm.decode_image_payload(mm.synth_payload(mid)[1])
    np.testing.assert_allclose(
        r["chan_mean"], img.reshape(-1, 3).astype(np.float64).mean(axis=0)
    )
    thumb = mm.decode_image_payload(r["thumb"])
    assert thumb.shape == (mm.THUMB_SIZE, mm.THUMB_SIZE, 3)


def test_audio_features_pipeline(media_ds):
    rows = mm.audio_features(media_ds).take_all()
    assert len(rows) == 20
    r = rows[0]
    sr, samples = mm.decode_audio_payload(mm.synth_payload(r["media_id"])[1])
    assert r["sample_rate"] == sr
    assert r["n_samples"] == samples.size
    assert r["n_frames"] == samples.size // mm.AUDIO_FRAME
    assert len(r["rms"]) == r["n_frames"]
    x = samples[: r["n_frames"] * mm.AUDIO_FRAME].astype(np.float64)
    x = x.reshape(r["n_frames"], mm.AUDIO_FRAME)
    np.testing.assert_allclose(r["rms"], np.sqrt((x * x).mean(axis=1)))


def test_video_frame_sample_pipeline(media_ds):
    ds = mm.video_frame_sample(media_ds, every_k=4)
    rows = ds.take_all()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r)
    assert len(by_id) == 20
    mid, sampled = sorted(by_id.items())[0]
    _, frames = mm.decode_video_payload(mm.synth_payload(mid)[1])
    want_idx = list(range(0, frames.shape[0], 4))
    assert sorted(r["frame_idx"] for r in sampled) == want_idx
    r0 = min(sampled, key=lambda r: r["frame_idx"])
    f0 = mm.decode_image_payload(r0["frame"])
    assert np.array_equal(f0[:, :, 0], frames[0])
    assert r0["frame_mean"] == pytest.approx(frames[0].mean())


def test_image_stats_explode(media_ds):
    rows = mm.image_stats(media_ds).take_all()
    # one row per (image, channel); 20 images x 3 channels
    assert len(rows) == 60
    by_key = {(r["media_id"], r["channel"]): r for r in rows}
    mid = sorted(r["media_id"] for r in rows)[0]
    img = mm.decode_image_payload(mm.synth_payload(mid)[1])
    flat = img.reshape(-1, img.shape[2]).astype(np.float64)
    for c in range(3):
        r = by_key[(mid, c)]
        assert r["chan_mean"] == flat[:, c].mean()  # integer-exact, no approx
        assert r["chan_std"] == np.round(flat[:, c].std(), 6)
        assert r["width"] == img.shape[1] and r["height"] == img.shape[0]


def test_audio_stats_explode(media_ds):
    rows = mm.audio_stats(media_ds).take_all()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r)
    assert len(by_id) == 20
    mid, frames = sorted(by_id.items())[0]
    _, samples = mm.decode_audio_payload(mm.synth_payload(mid)[1])
    nf = samples.size // mm.AUDIO_FRAME
    assert sorted(r["frame_idx"] for r in frames) == list(range(nf))
    x = samples[: nf * mm.AUDIO_FRAME].astype(np.float64).reshape(nf, mm.AUDIO_FRAME)
    want_rms = np.sqrt((x * x).mean(axis=1))
    want_zcr = (np.diff(np.signbit(x), axis=1) != 0).sum(axis=1) / mm.AUDIO_FRAME
    for r in sorted(frames, key=lambda r: r["frame_idx"]):
        assert r["rms"] == want_rms[r["frame_idx"]]  # bit-exact by design
        assert r["zcr"] == want_zcr[r["frame_idx"]]


def test_image_ahash_known_pattern(ray_session):
    import ray.data

    # 8x8 single-channel image: top half 255, bottom half 0 -> the top
    # two block-rows exceed the global mean -> bits 0..7 set = 0x00FF
    px_light = np.full(8 * 8, 0, dtype=np.uint8)
    px_light[: 8 * 4] = 255
    payload = mm.encode_image(8, 8, 1, px_light)
    t = pa.table(
        {
            "media_id": pa.array([1, 2, 3], pa.int64()),
            "kind": pa.array(["image"] * 3),
            "payload": pa.array([payload, payload, bytes(mm.encode_image(8, 8, 1, px_light[::-1].copy()))]),
        }
    )
    out = (
        mm.image_ahash_dups(ray.data.from_arrow(t).repartition(2))
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    assert out["ahash"].tolist() == [0x00FF, 0x00FF, 0xFF00]
    assert out["n_same"].tolist() == [2, 2, 1]


def test_image_ahash_matches_reference(media_ds):
    out = {
        r["media_id"]: r["ahash"] for r in mm.image_ahash_dups(media_ds).take_all()
    }
    assert len(out) == 20
    for mid, got in out.items():
        img = mm.decode_image_payload(mm.synth_payload(mid)[1]).astype(np.int64)
        h, w, c = img.shape
        blocks = img.reshape(4, h // 4, 4, w // 4, c).sum(axis=(1, 3, 4))
        expect = int(
            ((blocks * 16 > blocks.sum()).reshape(-1) << np.arange(16)).sum()
        )
        assert got == expect, mid
