"""bloom_semi_join building blocks: the Bloom bitmap must never drop a
true key (no false negatives), and the confirm stage must kill every
false positive."""

import numpy as np
import pyarrow as pa

from georay.relational import BLOOM_K, BLOOM_M_LOG2, _bloom_positions


def _fill(keys):
    bits = np.zeros(1 << (BLOOM_M_LOG2 - 3), dtype=np.uint8)
    for i in range(BLOOM_K):
        pos = _bloom_positions(keys, i)
        np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
    return bits


def _test_membership(bits, keys):
    ok = np.ones(len(keys), dtype=bool)
    for i in range(BLOOM_K):
        pos = _bloom_positions(keys, i)
        ok &= (bits[pos >> 3] & (np.uint8(1) << (pos & 7).astype(np.uint8))) != 0
    return ok


def test_bloom_no_false_negatives():
    rng = np.random.default_rng(1)
    keys = rng.integers(0, 1 << 40, size=5000).astype(np.int64)
    bits = _fill(keys)
    assert _test_membership(bits, keys).all()


def test_bloom_fp_rate_bounded():
    rng = np.random.default_rng(2)
    member = rng.integers(0, 1 << 40, size=5000).astype(np.int64)
    probe = rng.integers(1 << 41, 1 << 42, size=20000).astype(np.int64)
    bits = _fill(member)
    fp = _test_membership(bits, probe).mean()
    # 5k keys in 2^20 bits with 5 probes: theoretical FP ~ 2e-7;
    # anything under 1% means the filter actually prunes
    assert fp < 0.01


def test_bloom_partial_or_merge_equals_single_fill(ray_session):
    import ray

    from georay.relational import _bloom_or, _bloom_partial

    rng = np.random.default_rng(3)
    keys = rng.integers(0, 1 << 30, size=3000).astype(np.int64)
    whole = _fill(keys)
    parts = [
        _bloom_partial.remote(
            pa.table({"p_partkey": pa.array(keys[i::3], pa.int64())}), "p_partkey"
        )
        for i in range(3)
    ]
    merged = ray.get(_bloom_or.remote(*parts))
    assert np.array_equal(merged, whole)
