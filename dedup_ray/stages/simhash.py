"""SimHash near-dup detection with Hamming-distance banding —
the SimHash path named in the north rule (BASELINE.json:14), beyond
the exact-simhash-match grouping in neardup_queries.

Standard trick (Manku/Jain/Sarma, WWW'07 "Detecting Near-Duplicates
for Web Crawling"): to find pairs within Hamming distance <= d of a
64-bit simhash, split the hash into d+1 blocks — any pair within
distance d agrees EXACTLY on at least one block (pigeonhole), so
block-equality buckets are a complete candidate generator.  Exact
Hamming verification runs vectorized inside the bucket kernel.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from dedup_ray.config import DedupConfig
from dedup_ray.core import numeric_key_u64, partitioned_kernel, segments

_EMPTY = pa.table(
    {
        "u": pa.array([], type=pa.string()),
        "v": pa.array([], type=pa.string()),
        "hamming": pa.array([], type=pa.int64()),
    }
)

#: per-byte popcount lookup — 8 bytes of temporaries per pair vs the
#: 64 a per-pair unpackbits matrix costs
_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)

#: pair-enumeration slab: ~4M index pairs (~100 MB of temporaries)
_PAIR_CHUNK = 1 << 22


def _popcount64(x: np.ndarray) -> np.ndarray:
    return (
        _POP8[np.ascontiguousarray(x).view(np.uint8)]
        .reshape(-1, 8)
        .sum(axis=1)
        .astype(np.int64)
    )


def simhash_hamming_pairs(
    signatures: ray.data.Dataset,
    cfg: DedupConfig,
    *,
    max_hamming: int = 3,
    num_partitions: int | None = None,
    pair_chunk: int | None = None,
) -> ray.data.Dataset:
    """signatures (url, simhash64, n_shingles) -> pairs with
    popcount(simhash_u XOR simhash_v) <= max_hamming.

    Emits (d+1) block rows per doc; one groupby on (block_id,
    block_value); vectorized all-pairs Hamming check per bucket
    (buckets are tiny: 16-bit blocks over a mostly-unique corpus).
    """
    n_blocks = max_hamming + 1
    width = 64 // n_blocks
    # closure-captured (pickled by value into the worker tasks) so
    # tests can force the slab path on tiny buckets
    pair_chunk = _PAIR_CHUNK if pair_chunk is None else pair_chunk

    def to_blocks(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.greater(t["n_shingles"], 0))
        n = len(t)
        if n == 0:
            return pa.table(
                {
                    "block_id": pa.array([], type=pa.int32()),
                    "block_val": pa.array([], type=pa.int64()),
                    "url": pa.array([], type=pa.string()),
                    "simhash64": pa.array([], type=pa.int64()),
                }
            )
        sh = t["simhash64"].to_numpy(zero_copy_only=False).view(np.uint64)
        block_ids, block_vals, urls, shs = [], [], [], []
        url_np = t["url"].to_numpy(zero_copy_only=False)
        for b in range(n_blocks):
            shift = np.uint64(b * width)
            mask = np.uint64((1 << width) - 1)
            block_ids.append(np.full(n, b, dtype=np.int32))
            block_vals.append(((sh >> shift) & mask).astype(np.int64))
            urls.append(url_np)
            shs.append(sh.view(np.int64))
        return pa.table(
            {
                "block_id": pa.array(np.concatenate(block_ids), type=pa.int32()),
                "block_val": pa.array(np.concatenate(block_vals), type=pa.int64()),
                "url": pa.array(np.concatenate(urls), type=pa.string()),
                "simhash64": pa.array(np.concatenate(shs), type=pa.int64()),
            }
        )

    blocks = signatures.select_columns(["url", "simhash64", "n_shingles"]).map_batches(
        to_blocks, batch_format="pyarrow", zero_copy_batch=True
    )

    key_cols = ["block_id", "block_val"]

    def kernel(g: pa.Table) -> pa.Table:
        k = numeric_key_u64(g, key_cols)
        order = np.argsort(k, kind="stable")
        starts, lens = segments(k[order])
        multi = lens >= 2
        if not multi.any():
            return _EMPTY
        urls = np.array(g["url"].to_pylist(), dtype=object)[order]
        sh = g["simhash64"].to_numpy(zero_copy_only=False).view(np.uint64)[order]
        out_u, out_v, out_h = [], [], []

        def emit(seg_urls, seg_sh, iu, jv) -> None:
            x = seg_sh[iu] ^ seg_sh[jv]
            ham = _popcount64(x)
            keep = (ham <= max_hamming) & (seg_urls[iu] != seg_urls[jv])
            a, b = seg_urls[iu[keep]], seg_urls[jv[keep]]
            out_u.append(np.minimum(a, b))
            out_v.append(np.maximum(a, b))
            out_h.append(ham[keep])

        for s, L in zip(starts[multi].tolist(), lens[multi].tolist()):
            seg_urls = urls[s : s + L]
            seg_sh = sh[s : s + L]
            n_pairs = L * (L - 1) // 2
            if n_pairs <= pair_chunk:
                iu, jv = np.triu_indices(L, k=1)
                emit(seg_urls, seg_sh, iu, jv)
                continue
            # hot bucket (a boilerplate family sharing one block value):
            # enumerate the SAME pairs in the SAME row-major order in
            # bounded slabs — np.triu_indices materializes all L*(L-1)/2
            # index pairs at once and a single reduce task would OOM on
            # a 10k-doc bucket.  Output semantics are EXACT and
            # identical to the one-shot path (never capped: unlike the
            # LSH candidate generator, this kernel's output IS the
            # verified pair list, so dropping pairs here loses recall).
            import logging

            logging.getLogger(__name__).warning(
                "simhash_hamming_pairs: hot bucket of %d docs "
                "(%d pairs) — enumerating in %d-pair slabs",
                L, n_pairs, pair_chunk,
            )
            band = max(1, pair_chunk // (L - 1))
            for a0 in range(0, L - 1, band):
                ii = np.arange(a0, min(a0 + band, L - 1))
                cnt = (L - 1) - ii
                iu = np.repeat(ii, cnt)
                row_starts = np.concatenate(([0], np.cumsum(cnt)[:-1]))
                kk = np.arange(int(cnt.sum()))
                jv = iu + 1 + (kk - np.repeat(row_starts, cnt))
                emit(seg_urls, seg_sh, iu, jv)
        if not out_u:
            return _EMPTY
        return pa.table(
            {
                "u": pa.array(np.concatenate(out_u), type=pa.string()),
                "v": pa.array(np.concatenate(out_v), type=pa.string()),
                "hamming": pa.array(np.concatenate(out_h), type=pa.int64()),
            }
        )

    pairs = partitioned_kernel(
        blocks,
        lambda t: numeric_key_u64(t, key_cols),
        kernel,
        num_partitions=num_partitions or 64,
        empty_result=_EMPTY,
    )

    # dedupe across blocks (a close pair can agree on several blocks).
    # Pair keys are built with one Arrow binary_join_element_wise call
    # (u + "\x00" + v — identical bytes to the former per-row f-string
    # zip, so partition routing and dedup order are bit-identical);
    # only the blake2b per key remains per-row (hashlib has no batch
    # API).
    def _pair_combined(t: pa.Table) -> pa.ChunkedArray:
        import pyarrow.compute as pc

        return pc.binary_join_element_wise(t["u"], t["v"], "\x00")

    def uniq(g: pa.Table) -> pa.Table:
        combined = _pair_combined(g).to_numpy(zero_copy_only=False)
        _, idx = np.unique(combined, return_index=True)
        return g.take(pa.array(np.sort(idx)))

    from dedup_ray.core import hash_strings_u64

    return partitioned_kernel(
        pairs,
        lambda t: hash_strings_u64(_pair_combined(t).to_pylist()),
        uniq,
        num_partitions=cfg.num_partitions,
        empty_result=_EMPTY,
    )
