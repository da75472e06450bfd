"""simhash_hamming_pairs hot-bucket path: the chunked pair enumeration
(bounded slabs, LUT popcount) must emit EXACTLY the pairs the one-shot
triu_indices path emits — hot buckets bound memory, never drop pairs."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

import dedup_ray.stages.simhash as simhash_mod
from dedup_ray.config import DedupConfig


def _signatures(n_groups: int = 20, variants: int = 6, seed: int = 3) -> pa.Table:
    """n_groups x variants docs, ALL sharing the low 16-bit block (one
    hot bucket under max_hamming=3 banding); within a group each
    variant flips at most one distinct high bit of the group base, so
    intra-group pairs verify at hamming <= 2 and cross-group pairs
    fail — the kernel must enumerate the whole hot bucket to find
    them."""
    rng = np.random.default_rng(seed)
    bases = rng.integers(0, 2**47, size=n_groups, dtype=np.uint64)
    sh = []
    for b in bases:
        for v in range(variants):
            high = b if v == 0 else b ^ (np.uint64(1) << np.uint64(16 + v))
            sh.append((np.uint64(high) << np.uint64(16)) | np.uint64(0xBEEF))
    sh = np.array(sh, dtype=np.uint64)
    n = len(sh)
    return pa.table(
        {
            "url": pa.array([f"https://x/{i:04d}" for i in range(n)]),
            "simhash64": pa.array(sh.view(np.int64), type=pa.int64()),
            "n_shingles": pa.array([5] * n, type=pa.int64()),
        }
    )


def _run(tbl: pa.Table, **kw) -> list[tuple]:
    out = simhash_mod.simhash_hamming_pairs(
        ray.data.from_arrow(tbl), DedupConfig(), max_hamming=3, **kw
    ).to_pandas()
    return sorted(map(tuple, out.itertuples(index=False)))


def test_popcount64_matches_unpackbits():
    rng = np.random.default_rng(0)
    x = rng.integers(0, 2**63, size=4096, dtype=np.uint64)
    want = (
        np.unpackbits(np.ascontiguousarray(x).view(np.uint8).reshape(-1, 8), axis=1)
        .sum(axis=1)
        .astype(np.int64)
    )
    np.testing.assert_array_equal(simhash_mod._popcount64(x), want)


def test_hot_bucket_chunked_path_is_bit_identical(ray_session):
    tbl = _signatures()  # 120 docs -> 7140 pairs in one hot bucket
    want = _run(tbl)
    assert len(want) == 20 * (6 * 5) // 2  # every intra-group pair found
    # pair_chunk is closure-captured, so it reaches the worker tasks
    assert _run(tbl, pair_chunk=100) == want
