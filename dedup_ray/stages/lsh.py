"""LSH banding + bucket candidate generation with explicit skew
handling (SURVEY.md §2B B9, B10, B12; BASELINE.json:6,14).

Shape of the computation (all Ray Data, slim rows through every
shuffle, every grouped step a VECTORIZED partition kernel — see
core.partitioned_kernel for why per-group map_groups is avoided):

  signatures ──lsh_bands──▶ band_rows (band_id, band_hash, url)   [x bands]
      band_rows ──count kernel──▶ hot buckets (> bucket_cap)      [small]
      band_rows + broadcast hot set ──salt──▶ salted band rows
      (band_id, band_hash, salt) kernel ──▶ candidate pairs (u, v)
      (u, v) kernel ──▶ distinct pairs                            [dedup across bands]
      union + url kernel + (u, v) kernel ──▶ verified est-Jaccard edges

Design decisions, with the 100-TB rationale:
  - Band rows do NOT carry the 1-KB signature (32 bands would amplify
    shuffle volume 32x); verification re-attaches signatures via the
    union+groupby shuffle-join decomposition (same volume as a hash
    join; Ray 2.49's acero join breaks on lazy schemas + empty
    partitions and rejects fixed_size_list payloads).
  - Buckets bigger than ``bucket_cap`` (boilerplate shingles) are
    SALTED into sub-buckets by a stable url hash; every capped bucket
    is counted and logged — never silently truncated.
  - Pair topology is HYBRID: all-pairs for small buckets (size <=
    star_threshold, precise), star-to-min for larger ones — keeps
    pair volume O(n) per bucket.  Star relies on union-find
    transitivity + per-edge verification: a tight near-dup cluster
    verifies member-center edges; a boilerplate bucket wastes only
    n-1 verifications instead of n^2/2.
  - Pairs are canonicalized (u < v) and deduplicated across bands
    before the verification shuffle.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from dedup_ray.config import DedupConfig
from dedup_ray.core import (
    default_pool_size,
    hash_strings_u64,
    numeric_key_u64,
    partitioned_kernel,
    segments,
)
from dedup_ray.util import combine_rows_u64, u64_matrix_to_binary

#: buckets up to this size emit all pairs; larger ones a star to min
STAR_THRESHOLD = 8

_EMPTY_PAIRS = pa.table(
    {"u": pa.array([], type=pa.string()), "v": pa.array([], type=pa.string())}
)

_EMPTY_EDGES = pa.table(
    {
        "u": pa.array([], type=pa.string()),
        "v": pa.array([], type=pa.string()),
        "kind": pa.array([], type=pa.string()),
        "score": pa.array([], type=pa.float64()),
    }
)


def hash_url(u: str) -> int:
    """Stable (process-independent) 64-bit url hash for salting."""
    return int.from_bytes(hashlib.blake2b(u.encode(), digest_size=8).digest(), "little")


def lsh_bands(signatures: ray.data.Dataset, cfg: DedupConfig) -> ray.data.Dataset:
    """signatures -> band_rows: ``bands`` slim rows per doc.

    Docs with zero shingles are skipped (their sentinel signature would
    otherwise bucket all empties together — empties are handled by the
    exact layer).  Vectorized: the batch's signature matrix is reshaped
    to (n*bands, rows_per_band) and band-hashed in one pass.
    """
    bands, r = cfg.bands, cfg.rows_per_band

    def to_bands(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.greater(batch["n_shingles"], 0))
        n = len(batch)
        if n == 0:
            return pa.table(
                {
                    "band_id": pa.array([], type=pa.int32()),
                    "band_hash": pa.array([], type=pa.int64()),
                    "url": pa.array([], type=pa.string()),
                }
            )
        sig_col = batch["minhash"].combine_chunks()
        flat = sig_col.flatten().to_numpy(zero_copy_only=False).astype(np.uint64)
        mat = flat.reshape(n * bands, r)
        bh = combine_rows_u64(mat)
        band_ids = np.tile(np.arange(bands, dtype=np.int32), n)
        urls = np.repeat(batch["url"].to_numpy(zero_copy_only=False), bands)
        return pa.table(
            {
                "band_id": pa.array(band_ids, type=pa.int32()),
                # int64 REINTERPRET of the uint64 hash: uint64 groupby
                # keys overflow Ray's sort-boundary sampling into
                # pickled-object fallback; grouping only needs equality
                "band_hash": pa.array(bh.view(np.int64), type=pa.int64()),
                "url": pa.array(urls, type=pa.string()),
            }
        )

    return signatures.map_batches(to_bands, batch_format="pyarrow", zero_copy_batch=True)


_BUCKET_KEY_COLS = ["band_id", "band_hash"]


def find_hot_buckets(
    band_rows: ray.data.Dataset, cfg: DedupConfig, *, num_partitions: int | None = None
) -> tuple[dict[tuple[int, int], int], list[dict]]:
    """Count bucket sizes (vectorized partition kernel, not a Ray
    aggregate); return ({(band_id, band_hash): n_salts}, log).

    The hot set is small by definition (buckets above cap), so
    collecting it for broadcast is safe at any scale — the two-pass
    skew strategy of SURVEY.md §4.  Every capped bucket is logged:
    no silent truncation.
    """
    cap = cfg.bucket_cap
    empty = pa.table(
        {
            "band_id": pa.array([], type=pa.int32()),
            "band_hash": pa.array([], type=pa.int64()),
            "n": pa.array([], type=pa.int64()),
        }
    )

    def kernel(g: pa.Table) -> pa.Table:
        k = numeric_key_u64(g, _BUCKET_KEY_COLS)
        order = np.argsort(k, kind="stable")
        starts, lens = segments(k[order])
        hot = lens > cap
        if not hot.any():
            return empty
        idx = order[starts[hot]]
        return pa.table(
            {
                "band_id": g["band_id"].take(pa.array(idx)),
                "band_hash": g["band_hash"].take(pa.array(idx)),
                "n": pa.array(lens[hot], type=pa.int64()),
            }
        )

    hot_tbl = partitioned_kernel(
        band_rows,
        lambda t: numeric_key_u64(t, _BUCKET_KEY_COLS),
        kernel,
        num_partitions=num_partitions or 64,
        empty_result=empty,
    )
    hot: dict[tuple[int, int], int] = {}
    log: list[dict] = []
    for b in hot_tbl.iter_batches(batch_format="pyarrow", batch_size=65536):
        if "band_id" not in b.column_names:
            continue
        for band_id, band_hash, n in zip(
            b["band_id"].to_pylist(), b["band_hash"].to_pylist(), b["n"].to_pylist()
        ):
            n_salts = -(-n // cap)
            hot[(band_id, band_hash)] = n_salts
            log.append(
                {
                    "band_id": band_id,
                    "band_hash": band_hash,
                    "bucket_size": n,
                    "n_salts": n_salts,
                }
            )
    return hot, log


class _Salter:
    """Broadcast-hot-set salting stage (actor pool: the hot map and the
    vectorized membership arrays are built once per worker)."""

    def __init__(self, hot_ref) -> None:
        self.hot: dict[tuple[int, int], int] = ray.get(hot_ref)
        if self.hot:
            self._hot_keys = np.array(
                [
                    np.uint64(b) * np.uint64(0x9E3779B97F4A7C15)
                    ^ np.uint64(h & 0xFFFFFFFFFFFFFFFF)
                    for (b, h) in self.hot
                ],
                dtype=np.uint64,
            )
            self._hot_salts = np.array(list(self.hot.values()), dtype=np.uint64)
            order = np.argsort(self._hot_keys)
            self._hot_keys = self._hot_keys[order]
            self._hot_salts = self._hot_salts[order]
        else:
            self._hot_keys = np.empty(0, dtype=np.uint64)
            self._hot_salts = np.empty(0, dtype=np.uint64)

    def __call__(self, t: pa.Table) -> pa.Table:
        n = len(t)
        salts = np.zeros(n, dtype=np.int32)
        is_hot = np.zeros(n, dtype=bool)
        if len(self._hot_keys):
            band_ids = t["band_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
            band_hashes = t["band_hash"].to_numpy(zero_copy_only=False).view(np.uint64)
            with np.errstate(over="ignore"):
                keys = band_ids * np.uint64(0x9E3779B97F4A7C15) ^ band_hashes
            idx = np.searchsorted(self._hot_keys, keys)
            idx = np.minimum(idx, len(self._hot_keys) - 1)
            is_hot = self._hot_keys[idx] == keys
            if is_hot.any():
                rows = np.flatnonzero(is_hot)
                urls = t["url"].to_pylist()
                uh = np.array([hash_url(urls[i]) for i in rows], dtype=np.uint64)
                salts[rows] = (uh % self._hot_salts[idx[rows]]).astype(np.int32)
        t = t.append_column("salt", pa.array(salts, type=pa.int32()))
        return t.append_column("is_hot", pa.array(is_hot))


import functools


@functools.lru_cache(maxsize=8)
def _worker_pair_url_set(ref) -> set:
    return ray.get(ref)


@functools.lru_cache(maxsize=8)
def _worker_salter(hot_ref) -> _Salter:
    """Per-worker-process singleton keyed on the broadcast ObjectRef
    (see minhash._worker_hasher for the pattern rationale)."""
    return _Salter(hot_ref)


def _salt_batch(t: pa.Table, hot_ref) -> pa.Table:
    return _worker_salter(hot_ref)(t)


def salt_band_rows(
    band_rows: ray.data.Dataset,
    hot: dict[tuple[int, int], int],
    cfg: DedupConfig,
) -> ray.data.Dataset:
    """Append ``salt`` (0 for normal buckets; stable hash(url) %
    n_salts for hot ones) and ``is_hot``.  The hot map is broadcast
    once via ray.put and read per worker (zero-copy shm); stateless
    tasks, worker-singleton state."""
    hot_ref = ray.put(hot)
    return band_rows.map_batches(
        _salt_batch,
        fn_kwargs={"hot_ref": hot_ref},
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


_SALTED_KEY_COLS = ["band_id", "band_hash", "salt"]


def _pairs_from_sorted_urls(urls_sorted: np.ndarray, starts, lens, star_threshold: int):
    """Pair emission over pre-sorted segments: all-pairs for small
    segments, star-to-first for large ones.  Returns (us, vs) object
    arrays."""
    us_parts, vs_parts = [], []
    for s, L in zip(starts.tolist(), lens.tolist()):
        if L < 2:
            continue
        seg = urls_sorted[s : s + L]
        if L <= star_threshold:
            iu, jv = np.triu_indices(L, k=1)
            us_parts.append(seg[iu])
            vs_parts.append(seg[jv])
        else:
            us_parts.append(np.repeat(seg[:1], L - 1))
            vs_parts.append(seg[1:])
    if not us_parts:
        return np.empty(0, dtype=object), np.empty(0, dtype=object)
    return np.concatenate(us_parts), np.concatenate(vs_parts)


def bucket_candidate_pairs(
    salted: ray.data.Dataset, cfg: DedupConfig, *, num_partitions: int | None = None
) -> ray.data.Dataset:
    """(band_id, band_hash, salt) partition kernel -> candidate pairs,
    plus rep-star pairs reconnecting the salt groups of hot buckets."""

    def pair_kernel(g: pa.Table) -> pa.Table:
        # numeric-only global sort (C argsort on uint64); member urls
        # are sorted PER QUALIFYING SEGMENT only — a global object-array
        # lexsort costs ~1.5s per 260k-row partition and buckets with
        # >= 2 members are a tiny fraction
        k = numeric_key_u64(g, _SALTED_KEY_COLS)
        order = np.argsort(k, kind="stable")
        starts, lens = segments(k[order])
        multi = lens >= 2
        if not multi.any():
            return _EMPTY_PAIRS
        urls = np.array(g["url"].to_pylist(), dtype=object)[order]
        us_parts, vs_parts = [], []
        for s, L in zip(starts[multi].tolist(), lens[multi].tolist()):
            seg = np.sort(urls[s : s + L])
            if L <= STAR_THRESHOLD:
                iu, jv = np.triu_indices(L, k=1)
                us_parts.append(seg[iu])
                vs_parts.append(seg[jv])
            else:
                us_parts.append(np.repeat(seg[:1], L - 1))
                vs_parts.append(seg[1:])
        return pa.table(
            {
                "u": pa.array(np.concatenate(us_parts), type=pa.string()),
                "v": pa.array(np.concatenate(vs_parts), type=pa.string()),
            }
        )

    pairs = partitioned_kernel(
        salted,
        lambda t: numeric_key_u64(t, _SALTED_KEY_COLS),
        pair_kernel,
        num_partitions=num_partitions or 64,
        empty_result=_EMPTY_PAIRS,
    )

    # cross-salt reconnection: hot rows only (tiny).  Kernel 1 emits
    # the min-url representative per (band, hash, salt); kernel 2
    # stars the reps of each (band, hash).
    hot_empty = pa.table(
        {
            "band_id": pa.array([], type=pa.int32()),
            "band_hash": pa.array([], type=pa.int64()),
            "url": pa.array([], type=pa.string()),
            "salt": pa.array([], type=pa.int32()),
            "is_hot": pa.array([], type=pa.bool_()),
        }
    )
    hot_rows = salted.map_batches(
        lambda t: t.filter(t["is_hot"].combine_chunks())
        if "is_hot" in t.column_names
        else hot_empty,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    rep_empty = pa.table(
        {
            "band_id": pa.array([], type=pa.int32()),
            "band_hash": pa.array([], type=pa.int64()),
            "rep": pa.array([], type=pa.string()),
        }
    )

    def rep_kernel(g: pa.Table) -> pa.Table:
        k = numeric_key_u64(g, _SALTED_KEY_COLS)
        urls = np.array(g["url"].to_pylist(), dtype=object)
        order = np.lexsort((urls, k))
        starts, _lens = segments(k[order])
        idx = order[starts]
        return pa.table(
            {
                "band_id": g["band_id"].take(pa.array(idx)),
                "band_hash": g["band_hash"].take(pa.array(idx)),
                "rep": pa.array(urls[idx], type=pa.string()),
            }
        )

    reps = partitioned_kernel(
        hot_rows,
        lambda t: numeric_key_u64(t, _SALTED_KEY_COLS),
        rep_kernel,
        num_partitions=16,
        empty_result=rep_empty,
    )

    def star_kernel(g: pa.Table) -> pa.Table:
        k = numeric_key_u64(g, _BUCKET_KEY_COLS)
        urls = np.array(g["rep"].to_pylist(), dtype=object)
        order = np.lexsort((urls, k))
        starts, lens = segments(k[order])
        us, vs = _pairs_from_sorted_urls(urls[order], starts, lens, 1)
        return pa.table(
            {
                "u": pa.array(us, type=pa.string()),
                "v": pa.array(vs, type=pa.string()),
            }
        )

    rep_pairs = partitioned_kernel(
        reps,
        lambda t: numeric_key_u64(t, _BUCKET_KEY_COLS),
        star_kernel,
        num_partitions=16,
        empty_result=_EMPTY_PAIRS,
    )
    return pairs.union(rep_pairs)


def _pair_key_hash(t: pa.Table) -> np.ndarray:
    us = t["u"].to_pylist()
    vs = t["v"].to_pylist()
    return hash_strings_u64([f"{a}\x00{b}" for a, b in zip(us, vs)])


def dedupe_pairs(
    pairs: ray.data.Dataset, *, num_partitions: int | None = None
) -> ray.data.Dataset:
    """Distinct (u, v) via a vectorized unique kernel."""

    def kernel(g: pa.Table) -> pa.Table:
        us = np.array(g["u"].to_pylist(), dtype=object)
        vs = np.array(g["v"].to_pylist(), dtype=object)
        combined = np.array(
            [f"{a}\x00{b}" for a, b in zip(us.tolist(), vs.tolist())], dtype=object
        )
        _, first_idx = np.unique(combined, return_index=True)
        return pa.table(
            {
                "u": pa.array(us[first_idx], type=pa.string()),
                "v": pa.array(vs[first_idx], type=pa.string()),
            }
        )

    return partitioned_kernel(
        pairs,
        _pair_key_hash,
        kernel,
        num_partitions=num_partitions or 64,
        empty_result=_EMPTY_PAIRS,
    )


def verify_pairs(
    pairs: ray.data.Dataset,
    signatures: ray.data.Dataset,
    cfg: DedupConfig,
    *,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Attach both signatures to every candidate pair and keep pairs
    whose estimated Jaccard (fraction of agreeing components) >=
    cfg.verify_tau.

    UNION + two vectorized partition kernels (shuffle-join
    decomposition): phase 1 keys on url (sig row + member rows
    co-located), phase 2 reassembles per (u, v).  Signatures flow
    through the shuffle once per side — not once per band row.
    """
    P = num_partitions or 64
    num_perms = cfg.num_perms

    # broadcast-filter the signature side to urls that occur in a
    # candidate pair: the pair-url set is orders of magnitude smaller
    # than the corpus, so the 1KB-per-doc signature payload of
    # untouched docs never enters the exchange
    pair_url_set: set[str] = set()
    for b in pairs.iter_batches(batch_format="pyarrow", batch_size=65536):
        if "u" in b.column_names:
            pair_url_set.update(b["u"].to_pylist())
            pair_url_set.update(b["v"].to_pylist())
    purl_ref = ray.put(pair_url_set)

    def sig_rows(t: pa.Table) -> pa.Table:
        urls_needed = _worker_pair_url_set(purl_ref)
        keep = pa.array([u in urls_needed for u in t["url"].to_pylist()])
        t = t.filter(keep)
        sig = t["minhash"].combine_chunks()
        flat = sig.flatten().to_numpy(zero_copy_only=False).astype(np.uint64)
        mat = flat.reshape(len(t), num_perms)
        n = len(t)
        return pa.table(
            {
                "gkey": t["url"],
                "u": pa.array([""] * n, type=pa.string()),
                "v": pa.array([""] * n, type=pa.string()),
                "slot": pa.array(np.full(n, -1, dtype=np.int32)),
                "sig": u64_matrix_to_binary(mat),
            }
        )

    def pair_rows(t: pa.Table) -> pa.Table:
        u = t["u"].combine_chunks()
        v = t["v"].combine_chunks()
        n = len(t)
        return pa.table(
            {
                "gkey": pa.concat_arrays([u, v]),
                "u": pa.concat_arrays([u, u]),
                "v": pa.concat_arrays([v, v]),
                "slot": pa.array(
                    np.concatenate(
                        [np.zeros(n, dtype=np.int32), np.ones(n, dtype=np.int32)]
                    )
                ),
                "sig": pa.nulls(2 * n, type=pa.binary()),
            }
        )

    tall = signatures.select_columns(["url", "minhash"]).map_batches(
        sig_rows, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        pairs.select_columns(["u", "v"]).map_batches(
            pair_rows, batch_format="pyarrow", zero_copy_batch=True
        )
    )

    attach_empty = pa.table(
        {
            "u": pa.array([], type=pa.string()),
            "v": pa.array([], type=pa.string()),
            "slot": pa.array([], type=pa.int32()),
            "sig": pa.array([], type=pa.binary()),
        }
    )

    def attach_kernel(g: pa.Table) -> pa.Table:
        """Per url segment: copy the slot=-1 row's sig onto member
        rows — fully vectorized via segment-start gathers."""
        gkeys = np.array(g["gkey"].to_pylist(), dtype=object)
        slots = g["slot"].to_numpy(zero_copy_only=False)
        order = np.lexsort((slots, gkeys))  # sig row (-1) first per segment
        gs = gkeys[order]
        starts, lens = segments_obj(gs)
        slots_sorted = slots[order]
        has_sig = slots_sorted[starts] == -1
        # for each row: index (into sorted order) of its segment start
        seg_id = np.repeat(np.arange(len(starts)), lens)
        seg_start_sorted = starts[seg_id]
        member_mask = slots_sorted >= 0
        keep = member_mask & has_sig[seg_id]
        if not keep.any():
            return attach_empty
        take_rows = pa.array(order[keep])
        sig_src = pa.array(order[seg_start_sorted[keep]])
        return pa.table(
            {
                "u": g["u"].take(take_rows),
                "v": g["v"].take(take_rows),
                "slot": g["slot"].take(take_rows),
                "sig": g["sig"].take(sig_src),
            }
        )

    attached = partitioned_kernel(
        tall,
        lambda t: hash_strings_u64(t["gkey"].to_pylist()),
        attach_kernel,
        num_partitions=P,
        empty_result=attach_empty,
    )

    tau = cfg.verify_tau

    def verify_kernel(g: pa.Table) -> pa.Table:
        """Per (u, v) segment: expect slots {0, 1}; est Jaccard via a
        single vectorized signature comparison across all pairs."""
        us = np.array(g["u"].to_pylist(), dtype=object)
        vs = np.array(g["v"].to_pylist(), dtype=object)
        slots = g["slot"].to_numpy(zero_copy_only=False)
        combined = np.array(
            [f"{a}\x00{b}" for a, b in zip(us.tolist(), vs.tolist())], dtype=object
        )
        order = np.lexsort((slots, combined))
        starts, lens = segments_obj(combined[order])
        ok = lens == 2
        if not ok.any():
            return _EMPTY_EDGES
        s = starts[ok]
        slots_sorted = slots[order]
        ok2 = (slots_sorted[s] == 0) & (slots_sorted[s + 1] == 1)
        s = s[ok2]
        if len(s) == 0:
            return _EMPTY_EDGES
        from dedup_ray.util import binary_to_u64_matrix

        sig_sorted = g["sig"].take(pa.array(order))
        mats = binary_to_u64_matrix(sig_sorted, num_perms)
        est = (mats[s] == mats[s + 1]).mean(axis=1)
        keep = est >= tau
        if not keep.any():
            return _EMPTY_EDGES
        rows = order[s[keep]]
        return pa.table(
            {
                "u": g["u"].take(pa.array(rows)),
                "v": g["v"].take(pa.array(rows)),
                "kind": pa.array(["minhash"] * int(keep.sum()), type=pa.string()),
                "score": pa.array(est[keep], type=pa.float64()),
            }
        )

    return partitioned_kernel(
        attached,
        _pair_key_hash,
        verify_kernel,
        num_partitions=P,
        empty_result=_EMPTY_EDGES,
    )


def segments_obj(sorted_vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """segments() for object (string) arrays already in sorted order."""
    n = len(sorted_vals)
    if n == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    change = np.flatnonzero(sorted_vals[1:] != sorted_vals[:-1]) + 1
    starts = np.concatenate([[0], change]).astype(np.int64)
    lens = np.diff(np.concatenate([starts, [n]])).astype(np.int64)
    return starts, lens


def minhash_edges(
    signatures: ray.data.Dataset, cfg: DedupConfig
) -> tuple[ray.data.Dataset, list[dict]]:
    """Full near-dup candidate path: bands -> skew-salted buckets ->
    distinct pairs -> signature verification.  Returns (edges,
    hot-bucket log)."""
    bands = lsh_bands(signatures, cfg).materialize()  # consumed twice
    hot, log = find_hot_buckets(bands, cfg, num_partitions=cfg.num_partitions)
    salted = salt_band_rows(bands, hot, cfg)
    pairs = dedupe_pairs(
        bucket_candidate_pairs(salted, cfg, num_partitions=cfg.num_partitions),
        num_partitions=cfg.num_partitions,
    )
    edges = verify_pairs(pairs, signatures, cfg, num_partitions=cfg.num_partitions)
    return edges, log
