"""Multimodal (image / audio / video) columns as opaque ``binary``
payloads with typed metadata, processed by actor-pool ``map_batches``
stages.

Design (scale-first):
- Media lives in a ``binary`` column next to small typed metadata
  columns; Arrow keeps the bytes zero-copy through the object store.
- Decode / feature-extract / resize / frame-sample are callable CLASSES
  passed to ``map_batches(Cls, concurrency=N, batch_size=B)`` — any
  per-worker setup happens once in ``__init__``, per-batch work in
  ``__call__`` on numpy views of the payload bytes.
- Batch sizes are small (``MEDIA_BATCH_SIZE``) because a batch is
  ``batch_size x payload_bytes`` of heap: 32 x ~200 kB ≈ 6 MB/batch,
  so batch x concurrency stays far under a worker's heap at any scale.
- Real-world codec decode (JPEG/PNG/MP3/H.264) needs libraries not in
  this container; those stages are stubbed behind a clearly-marked
  ``NotImplementedError`` (see ``ExternalCodecDecoder``). The Ray-side
  plumbing — schema, batch size, actor signature, output layout — is
  real and tested against the deterministic GRB container format below.

GRB container (deterministic, library-free, fully decodable):
  image  = b"GRIM" + u16 width + u16 height + u8 channels + raw u8 pixels
  audio  = b"GRAU" + u32 sample_rate + u32 n_samples + s16le PCM
  video  = b"GRVD" + u16 width + u16 height + u16 n_frames + u8 fps
           + n_frames raw u8 grayscale frames

The reference has no media path; this extends the engine for
training-data pipelines (task brief) using the same actor-pool pattern
as the PIP join (georay/spatial/join.py).
"""

from __future__ import annotations

import hashlib
import re
import struct

import numpy as np
import pyarrow as pa

SEED = 42
# batch x payload bytes x concurrency bounds worker heap: 128 x ~200 kB
# x 8 ≈ 200 MB across the pool. Drop batch_size for MB-scale payloads.
MEDIA_BATCH_SIZE = 128
THUMB_SIZE = 16
AUDIO_FRAME = 1024

MAGIC_IMAGE = b"GRIM"
MAGIC_AUDIO = b"GRAU"
MAGIC_VIDEO = b"GRVD"

KINDS = ("image", "audio", "video")


def _h64(s: str) -> int:
    return int.from_bytes(hashlib.sha256(s.encode()).digest()[:8], "big")


# ----------------------------------------------------------- synthesis


def encode_image(width: int, height: int, channels: int, pixels: np.ndarray) -> bytes:
    assert pixels.dtype == np.uint8 and pixels.size == width * height * channels
    return MAGIC_IMAGE + struct.pack("<HHB", width, height, channels) + pixels.tobytes()


def encode_audio(sample_rate: int, samples: np.ndarray) -> bytes:
    assert samples.dtype == np.int16
    return MAGIC_AUDIO + struct.pack("<II", sample_rate, samples.size) + samples.tobytes()


def encode_video(width: int, height: int, fps: int, frames: np.ndarray) -> bytes:
    assert frames.dtype == np.uint8 and frames.ndim == 3
    n = frames.shape[0]
    return MAGIC_VIDEO + struct.pack("<HHHB", width, height, n, fps) + frames.tobytes()


def synth_payload(media_id: int, seed: int = SEED):
    """Deterministic payload for one media row -> (kind, payload, meta).
    meta = (width, height, channels, sample_rate, duration_ms)."""
    kind = KINDS[media_id % len(KINDS)]
    rng = np.random.default_rng(_h64(f"media:{seed}:{media_id}"))
    if kind == "image":
        w = 32 + int(rng.integers(0, 4)) * 16
        h = 32 + int(rng.integers(0, 4)) * 16
        c = 3
        px = rng.integers(0, 256, w * h * c, dtype=np.int64).astype(np.uint8)
        return kind, encode_image(w, h, c, px), (w, h, c, 0, 0)
    if kind == "audio":
        sr = 8000
        n = sr // 2 + int(rng.integers(0, sr))  # 0.5 - 1.5 s
        t = np.arange(n, dtype=np.float64)
        freq = 110.0 * (1 + int(rng.integers(0, 8)))
        wave = np.sin(2 * np.pi * freq * t / sr) * 12000
        wave += rng.normal(0, 500, n)
        samples = np.clip(wave, -32768, 32767).astype(np.int16)
        return kind, encode_audio(sr, samples), (0, 0, 0, sr, int(n * 1000 / sr))
    w, h, fps = 48, 32, 10
    nf = 8 + int(rng.integers(0, 17))
    frames = rng.integers(0, 256, (nf, h, w), dtype=np.int64).astype(np.uint8)
    return kind, encode_video(w, h, fps, frames), (w, h, 1, 0, int(nf * 1000 / fps))


MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("url", pa.string()),
        ("kind", pa.string()),
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("channels", pa.int32()),
        ("sample_rate", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def media_batch(start: int, count: int, seed: int = SEED) -> pa.Table:
    rows = {name: [] for name in MEDIA_SCHEMA.names}
    for mid in range(start, start + count):
        kind, payload, (w, h, c, sr, dur) = synth_payload(mid, seed)
        rows["media_id"].append(mid)
        rows["url"].append(f"https://media-{mid % 997}.example/{mid}")
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["width"].append(w)
        rows["height"].append(h)
        rows["channels"].append(c)
        rows["sample_rate"].append(sr)
        rows["duration_ms"].append(dur)
    return pa.Table.from_pydict(rows, schema=MEDIA_SCHEMA)


def synthesize_media_parquet(out_dir: str, n: int, seed: int = SEED, rows_per_file: int = 2000):
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    done = os.path.join(out_dir, f"_DONE_{n}_{seed}")
    if os.path.exists(done):
        return out_dir
    for start in range(0, n, rows_per_file):
        count = min(rows_per_file, n - start)
        pq.write_table(media_batch(start, count, seed), os.path.join(out_dir, f"media-{start:09d}.parquet"))
    with open(done, "w") as f:
        f.write("ok")
    return out_dir


def media_dir_for(sf_dir: str, base: str = "/tmp/georay_media") -> str:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.001
    n = max(300, int(sf * 300_000))
    out = f"{base}/n{n}_seed{SEED}"
    return synthesize_media_parquet(out, n)


# ------------------------------------------------------------ decoders


def decode_image_payload(payload: bytes):
    """GRB image -> (H, W, C) uint8 array (zero-copy view of payload)."""
    if payload[:4] != MAGIC_IMAGE:
        raise ValueError("not a GRIM image payload")
    w, h, c = struct.unpack_from("<HHB", payload, 4)
    px = np.frombuffer(payload, dtype=np.uint8, count=w * h * c, offset=9)
    return px.reshape(h, w, c)


def decode_audio_payload(payload: bytes):
    """GRB audio -> (sample_rate, int16 samples) (zero-copy view)."""
    if payload[:4] != MAGIC_AUDIO:
        raise ValueError("not a GRAU audio payload")
    sr, n = struct.unpack_from("<II", payload, 4)
    return sr, np.frombuffer(payload, dtype="<i2", count=n, offset=12)


def decode_video_payload(payload: bytes):
    """GRB video -> (fps, (N, H, W) uint8 frames) (zero-copy view)."""
    if payload[:4] != MAGIC_VIDEO:
        raise ValueError("not a GRVD video payload")
    w, h, nf, fps = struct.unpack_from("<HHHB", payload, 4)
    frames = np.frombuffer(payload, dtype=np.uint8, count=nf * h * w, offset=11)
    return fps, frames.reshape(nf, h, w)


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize, pure numpy (vectorized gather)."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[ys][:, xs]


class ExternalCodecDecoder:
    """STUB for real-world codecs (JPEG/PNG/WEBP/MP3/H.264).

    The container has no image/audio libraries; when one is present
    (PIL / soundfile / av), plug it in here. Until then calling this
    stage raises NotImplementedError — by design, per the task brief.
    The actor signature and output schema match ImageDecoder so a swap
    is a one-line pipeline change.
    """

    def __init__(self, codec: str = "jpeg"):
        self.codec = codec
        try:  # pragma: no cover - not installed in this container
            import PIL.Image  # noqa: F401

            self._pil = True
        except ImportError:
            self._pil = False

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self._pil:
            raise NotImplementedError(
                f"real {self.codec} decode requires PIL/soundfile/av, "
                "not available in this environment (stubbed by design; "
                "see georay/multimodal.py ExternalCodecDecoder)"
            )
        raise NotImplementedError("PIL path not wired yet")  # pragma: no cover


class ImageDecoder:
    """Actor-pool stage: GRB image payload -> per-channel mean/std
    features + a nearest-neighbor thumbnail (re-encoded GRB).

    Output columns: media_id, width, height, channels,
    chan_mean list<float>, chan_std list<float>, thumb binary.
    """

    def __init__(self, thumb_size: int = THUMB_SIZE):
        self.thumb = thumb_size

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, ws, hs, cs, means, stds, thumbs = [], [], [], [], [], [], []
        payloads = batch["payload"]
        mids = batch["media_id"].to_numpy(zero_copy_only=False)
        for i in range(batch.num_rows):
            img = decode_image_payload(payloads[i].as_py())
            h, w, c = img.shape
            flat = img.reshape(-1, c).astype(np.float64)
            ids.append(int(mids[i]))
            ws.append(w)
            hs.append(h)
            cs.append(c)
            means.append(flat.mean(axis=0).tolist())
            stds.append(flat.std(axis=0).tolist())
            tn = resize_nearest(img, self.thumb, self.thumb)
            thumbs.append(encode_image(self.thumb, self.thumb, c, tn.reshape(-1)))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "width": pa.array(ws, pa.int32()),
                "height": pa.array(hs, pa.int32()),
                "channels": pa.array(cs, pa.int32()),
                "chan_mean": pa.array(means, pa.list_(pa.float64())),
                "chan_std": pa.array(stds, pa.list_(pa.float64())),
                "thumb": pa.array(thumbs, pa.binary()),
            }
        )


class AudioFeaturizer:
    """Actor-pool stage: GRB audio payload -> framed RMS energy +
    zero-crossing-rate features.

    Output: media_id, sample_rate, n_samples, n_frames,
    rms list<float>, zcr list<float>.
    """

    def __init__(self, frame_len: int = AUDIO_FRAME):
        self.frame = frame_len

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, srs, ns, nfr, rmss, zcrs = [], [], [], [], [], []
        payloads = batch["payload"]
        mids = batch["media_id"].to_numpy(zero_copy_only=False)
        for i in range(batch.num_rows):
            sr, samples = decode_audio_payload(payloads[i].as_py())
            n = samples.size
            nf = n // self.frame
            x = samples[: nf * self.frame].astype(np.float64).reshape(nf, self.frame)
            rms = np.sqrt((x * x).mean(axis=1))
            zc = (np.diff(np.signbit(x), axis=1) != 0).sum(axis=1) / self.frame
            ids.append(int(mids[i]))
            srs.append(sr)
            ns.append(n)
            nfr.append(nf)
            rmss.append(rms.tolist())
            zcrs.append(zc.tolist())
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "sample_rate": pa.array(srs, pa.int32()),
                "n_samples": pa.array(ns, pa.int64()),
                "n_frames": pa.array(nfr, pa.int32()),
                "rms": pa.array(rmss, pa.list_(pa.float64())),
                "zcr": pa.array(zcrs, pa.list_(pa.float64())),
            }
        )


class VideoFrameSampler:
    """Actor-pool stage: GRB video payload -> one row per sampled frame
    (every k-th), flat-map style fan-out inside map_batches.

    Output: media_id, frame_idx, t_ms, frame_mean, frame binary
    (re-encoded single-frame GRB image, 1 channel).
    """

    def __init__(self, every_k: int = 4):
        self.k = every_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, ts, fmeans, fbins = [], [], [], [], []
        payloads = batch["payload"]
        mids = batch["media_id"].to_numpy(zero_copy_only=False)
        for i in range(batch.num_rows):
            fps, frames = decode_video_payload(payloads[i].as_py())
            nf, h, w = frames.shape
            for j in range(0, nf, self.k):
                ids.append(int(mids[i]))
                idxs.append(j)
                ts.append(int(j * 1000 / fps))
                fmeans.append(float(frames[j].mean()))
                fbins.append(encode_image(w, h, 1, frames[j].reshape(-1)))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(idxs, pa.int32()),
                "t_ms": pa.array(ts, pa.int32()),
                "frame_mean": pa.array(fmeans, pa.float64()),
                "frame": pa.array(fbins, pa.binary()),
            }
        )


# ------------------------------------------------------------ datasets


def _kind(ds, kind: str):
    import pyarrow.compute as pc

    return ds.map_batches(
        lambda t, k=kind: t.filter(pc.equal(t["kind"], k)),
        batch_format="pyarrow",
    )


# Task-mode decoders (the PIP-join pattern, VERDICT r03 Next #7): the
# decoder state is immutable, so plain tasks + a per-worker-process
# instance cache beat an actor pool — no pool spawn/ramp latency, every
# CPU participates with work stealing, and the stage fuses with the
# read. The actor classes above remain the explicit-concurrency path
# (pass concurrency=) and the documented shape for a REAL codec whose
# per-process init is heavyweight.
_WORKER_DECODERS: dict = {}


def _cached_decoder(cls, *args):
    key = (cls.__name__, args)
    obj = _WORKER_DECODERS.get(key)
    if obj is None:
        obj = cls(*args)
        _WORKER_DECODERS[key] = obj
    return obj


def _image_batch(batch: pa.Table, thumb_size: int) -> pa.Table:
    return _cached_decoder(ImageDecoder, thumb_size)(batch)


def _audio_batch(batch: pa.Table, frame_len: int) -> pa.Table:
    return _cached_decoder(AudioFeaturizer, frame_len)(batch)


def _video_batch(batch: pa.Table, every_k: int) -> pa.Table:
    return _cached_decoder(VideoFrameSampler, every_k)(batch)


def image_features(media, concurrency=None):
    """media Dataset -> image feature table (task mode by default;
    small batches: batch x payload bytes bounds worker heap)."""
    if concurrency is not None:
        return _kind(media, "image").map_batches(
            ImageDecoder,
            batch_format="pyarrow",
            batch_size=MEDIA_BATCH_SIZE,
            concurrency=concurrency,
            num_cpus=1,
        )
    return _kind(media, "image").map_batches(
        _image_batch,
        fn_kwargs={"thumb_size": THUMB_SIZE},
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE,
    )


def audio_features(media, concurrency=None):
    if concurrency is not None:
        return _kind(media, "audio").map_batches(
            AudioFeaturizer,
            batch_format="pyarrow",
            batch_size=MEDIA_BATCH_SIZE,
            concurrency=concurrency,
            num_cpus=1,
        )
    return _kind(media, "audio").map_batches(
        _audio_batch,
        fn_kwargs={"frame_len": AUDIO_FRAME},
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE,
    )


def video_frame_sample(media, every_k: int = 4, concurrency=None):
    if concurrency is not None:
        return _kind(media, "video").map_batches(
            VideoFrameSampler,
            fn_constructor_args=(every_k,),
            batch_format="pyarrow",
            batch_size=MEDIA_BATCH_SIZE,
            concurrency=concurrency,
            num_cpus=1,
        )
    return _kind(media, "video").map_batches(
        _video_batch,
        fn_kwargs={"every_k": every_k},
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE,
    )


def image_stats(media, concurrency=None):
    """Per-(image, channel) scalar stats: media_id, width, height,
    channel, chan_mean, chan_std (rounded to 6 dp so the DuckDB oracle's
    different float-summation order in the two-pass std agrees bit-for-
    bit after rounding; the mean is an exact integer-sum / count and
    needs no rounding). Vectorized explode of the ImageDecoder output —
    the list columns never cross an oracle hash (lists stringify
    differently numpy-vs-python), scalar rows do."""
    import pyarrow.compute as pc

    feats = image_features(media, concurrency=concurrency)

    def explode(t: pa.Table) -> pa.Table:
        n = t.num_rows
        nch = pc.list_value_length(t["chan_mean"]).to_numpy(zero_copy_only=False)
        rep = np.repeat(np.arange(n, dtype=np.int64), nch)
        chan = np.concatenate([np.arange(k, dtype=np.int32) for k in nch]) if n else np.array([], np.int32)
        return pa.table(
            {
                "media_id": pa.array(t["media_id"].to_numpy(zero_copy_only=False)[rep], pa.int64()),
                "width": pa.array(t["width"].to_numpy(zero_copy_only=False)[rep], pa.int32()),
                "height": pa.array(t["height"].to_numpy(zero_copy_only=False)[rep], pa.int32()),
                "channel": pa.array(chan, pa.int32()),
                "chan_mean": pc.list_flatten(t["chan_mean"]),
                "chan_std": pa.array(
                    np.round(pc.list_flatten(t["chan_std"]).to_numpy(zero_copy_only=False), 6),
                    pa.float64(),
                ),
            }
        )

    return feats.map_batches(explode, batch_format="pyarrow")


def audio_stats(media, concurrency=None):
    """Per-(audio, frame) scalar features: media_id, frame_idx, rms,
    zcr. Exact float parity with the DuckDB oracle without rounding:
    the frame RMS is sqrt(integer-exact mean of int16^2 / 1024) and the
    ZCR is an integer count / 1024 — both bit-identical across any
    summation order. Vectorized explode of the AudioFeaturizer output."""
    import pyarrow.compute as pc

    feats = audio_features(media, concurrency=concurrency)

    def explode(t: pa.Table) -> pa.Table:
        n = t.num_rows
        nfr = pc.list_value_length(t["rms"]).to_numpy(zero_copy_only=False)
        rep = np.repeat(np.arange(n, dtype=np.int64), nfr)
        idx = np.concatenate([np.arange(k, dtype=np.int32) for k in nfr]) if n else np.array([], np.int32)
        return pa.table(
            {
                "media_id": pa.array(t["media_id"].to_numpy(zero_copy_only=False)[rep], pa.int64()),
                "frame_idx": pa.array(idx, pa.int32()),
                "rms": pc.list_flatten(t["rms"]),
                "zcr": pc.list_flatten(t["zcr"]),
            }
        )

    return feats.map_batches(explode, batch_format="pyarrow")


def _ahash16_batch(batch: pa.Table) -> pa.Table:
    """GRB image payload -> 16-bit average-hash: split the image into a
    4x4 block grid (every synthesized dimension is divisible by 4),
    integer-sum all bytes per block, set bit r*4+c when the block sum
    strictly exceeds its equal share of the image total (block mean >
    global mean, cross-multiplied so it stays pure int64). The per-
    image loop is over ~128 images/batch, not pixels — each body is
    one numpy reshape+sum."""
    hashes = np.empty(batch.num_rows, dtype=np.int64)
    for i, payload in enumerate(batch["payload"].to_pylist()):
        h, w, c = decode_image_payload(payload).shape
        arr = np.frombuffer(payload, dtype=np.uint8, offset=9).reshape(h, w, c)
        blocks = (
            arr.reshape(4, h // 4, 4, w // 4, c)
            .sum(axis=(1, 3, 4), dtype=np.int64)
        )
        bits = (blocks * 16) > blocks.sum()
        hashes[i] = int((bits.reshape(-1) << np.arange(16, dtype=np.int64)).sum())
    return pa.table(
        {
            "media_id": batch["media_id"].cast(pa.int64()),
            "ahash": pa.array(hashes, pa.int64()),
        }
    )


_AHASH_REMOTES: list = []


def _ahash_remotes():
    """Lazily-built remote kernels (this module stays importable without
    ray for the plain decode utilities)."""
    if not _AHASH_REMOTES:
        import ray

        @ray.remote
        def count_partial(block: pa.Table) -> np.ndarray:
            if block.num_rows == 0:
                return np.zeros(1 << 16, dtype=np.int64)
            return np.bincount(
                block["ahash"].to_numpy(zero_copy_only=False), minlength=1 << 16
            )

        @ray.remote
        def count_merge(*parts):
            out = parts[0].copy()
            for p in parts[1:]:
                out += p
            return out

        _AHASH_REMOTES.extend([count_partial, count_merge])
    return _AHASH_REMOTES


def image_ahash_dups(media):
    """Perceptual-hash (aHash) near-duplicate detection over the image
    corpus — the multimodal counterpart of textops' text dedup tier:
    images whose 4x4 average-luma signature collides are near-dups
    (same coarse structure regardless of pixel noise / resolution,
    since blocks are resolution-relative).

    Scale shape: one task-mode decode pass emits the tiny (media_id,
    ahash) table; the collision count joins back via a BOUNDED
    broadcast — the hash domain is 2^16, so the count map is <= 65536
    entries at ANY corpus size (never a shuffle join). Output:
    media_id, ahash, n_same (group size; n_same > 1 == near-dup).
    """
    import ray

    from georay.textops import _tree_reduce

    hashed = (
        _kind(media, "image")
        .map_batches(_ahash16_batch, batch_format="pyarrow", batch_size=MEDIA_BATCH_SIZE)
        .materialize()
    )
    # collision counts as a remote fan-in over dense 2^16 bincounts —
    # the driver receives ONE bounded array, never the per-image rows
    count_partial, count_merge = _ahash_remotes()
    counts = ray.get(
        _tree_reduce(
            [count_partial.remote(b) for b in hashed.to_arrow_refs()],
            count_merge,
        )
    )
    cmap_ref = ray.put(counts)

    def add_count(t: pa.Table) -> pa.Table:
        cmap = ray.get(cmap_ref)
        n_same = cmap[t["ahash"].to_numpy(zero_copy_only=False)]
        return t.append_column("n_same", pa.array(n_same, pa.int64()))

    return hashed.map_batches(add_count, batch_format="pyarrow")
