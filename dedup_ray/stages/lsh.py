"""LSH banding + bucket candidate generation with explicit skew
handling (SURVEY.md §2B B9, B10, B12; BASELINE.json:6,14).

Shape of the computation (all grouped steps are VECTORIZED partition
kernels over a custom hash exchange — see core.partitioned_kernel):

  signatures ──lsh_bands──▶ band_rows (band_id, band_hash, doc_id)  [x bands]
      band_rows ──count kernel──▶ hot buckets (> bucket_cap)        [small]
      band_rows + broadcast hot set ──salt──▶ salted band rows
      (band_id, band_hash, salt) kernel ──▶ candidate id pairs
      (u_id, v_id) kernel ──▶ distinct pairs                        [dedup across bands]
      union + doc_id kernel + pair kernel ──▶ verified edges (urls)

Design decisions, with the 100-TB rationale:
  - Band rows carry an 8-byte ``doc_id`` (stable url hash), NOT the
    url string and NOT the 1-KB signature: the banded exchange moves
    slim fixed-width rows (3x less traffic than strings; 32x less
    than carrying signatures).  Urls re-enter only on the verified
    edge output, supplied by the signature rows during verification.
    (64-bit ids collide at ~n^2/2^65; colliding CANDIDATES are killed
    by signature verification, so a collision can only mislabel an
    edge endpoint — switch to 128-bit ids beyond ~10^9 docs if that
    residual risk matters.)
  - Buckets bigger than ``bucket_cap`` (boilerplate shingles) are
    SALTED into sub-buckets by a stable doc-id hash; every capped
    bucket is counted and logged — never silently truncated.
  - Pair topology is HYBRID: all-pairs for small buckets (size <=
    STAR_THRESHOLD, precise), star-to-min for larger ones — keeps
    pair volume O(n) per bucket.  Star relies on union-find
    transitivity + per-edge verification: a tight near-dup cluster
    verifies member-center edges; a boilerplate bucket wastes only
    n-1 verifications instead of n^2/2.
  - Verification re-attaches signatures via the union + partition
    kernel shuffle-join decomposition (Ray 2.49's acero join breaks
    on lazy schemas + empty partitions and rejects fixed_size_list
    payloads), with the signature side broadcast-filtered to docs
    that actually occur in a candidate pair.
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from dedup_ray.config import DedupConfig
from dedup_ray.core import numeric_key_u64, partitioned_kernel, schema_names, segments
from dedup_ray.util import (
    combine_rows_u64,
    ensure_doc_ids,
    hash_url,  # noqa: F401 — re-export (doc_id hash lives in util now)
    splitmix64,
    u64_matrix_to_binary,
)

#: buckets up to this size emit all pairs; larger ones a star to min
STAR_THRESHOLD = 8

_EMPTY_PAIRS = pa.table(
    {"u_id": pa.array([], type=pa.int64()), "v_id": pa.array([], type=pa.int64())}
)

_EMPTY_EDGES = pa.table(
    {
        "u": pa.array([], type=pa.string()),
        "v": pa.array([], type=pa.string()),
        "u_id": pa.array([], type=pa.int64()),
        "v_id": pa.array([], type=pa.int64()),
        "kind": pa.array([], type=pa.string()),
        "score": pa.array([], type=pa.float64()),
    }
)


#: doc_id is computed ONCE at ingest (hashing.add_content_sha256) and
#: carried as a column; ensure_doc_ids is the fallback for tables built
#: outside the ingest path (tests / ad-hoc fixtures).
add_doc_ids = ensure_doc_ids


def lsh_bands(
    signatures: ray.data.Dataset,
    cfg: DedupConfig,
    *,
    passthrough: tuple[str, ...] = (),
) -> ray.data.Dataset:
    """signatures -> band_rows: ``bands`` slim fixed-width rows per doc.

    Docs with zero shingles are skipped (their sentinel signature would
    otherwise bucket all empties together — empties are handled by the
    exact layer).  Vectorized: the batch's signature matrix is reshaped
    to (n*bands, rows_per_band) and band-hashed in one pass.

    ``passthrough`` replicates the named int32-castable signature
    columns onto every band row (used by the incremental pipeline to
    carry the base/new ``side`` flag into the bucket kernel)."""
    bands, r = cfg.bands, cfg.rows_per_band

    def to_bands(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.greater(batch["n_shingles"], 0))
        n = len(batch)
        if n == 0:
            return pa.table(
                {
                    "band_id": pa.array([], type=pa.int32()),
                    "band_hash": pa.array([], type=pa.int64()),
                    "doc_id": pa.array([], type=pa.int64()),
                    **{c: pa.array([], type=pa.int32()) for c in passthrough},
                }
            )
        batch = add_doc_ids(batch)
        sig_col = batch["minhash"].combine_chunks()
        flat = sig_col.flatten().to_numpy(zero_copy_only=False).astype(np.uint64)
        mat = flat.reshape(n * bands, r)
        bh = combine_rows_u64(mat)
        band_ids = np.tile(np.arange(bands, dtype=np.int32), n)
        ids = np.repeat(batch["doc_id"].to_numpy(zero_copy_only=False), bands)
        return pa.table(
            {
                "band_id": pa.array(band_ids, type=pa.int32()),
                # int64 REINTERPRET of the uint64 hash: uint64 groupby
                # keys overflow Ray's sort-boundary sampling into
                # pickled-object fallback; grouping only needs equality
                "band_hash": pa.array(bh.view(np.int64), type=pa.int64()),
                "doc_id": pa.array(ids, type=pa.int64()),
                **{
                    c: pa.array(
                        np.repeat(
                            pc.cast(batch[c], pa.int32()).to_numpy(
                                zero_copy_only=False
                            ),
                            bands,
                        ),
                        type=pa.int32(),
                    )
                    for c in passthrough
                },
            }
        )

    return signatures.map_batches(to_bands, batch_format="pyarrow", zero_copy_batch=True)


_BUCKET_KEY_COLS = ["band_id", "band_hash"]
_SALTED_KEY_COLS = ["band_id", "band_hash", "salt"]


class _Salter:
    """Broadcast-hot-set salting (fully numeric/vectorized now that
    rows carry doc_id instead of url)."""

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
                ids = t["doc_id"].to_numpy(zero_copy_only=False).view(np.uint64)
                mixed = splitmix64(ids[is_hot])
                salts[is_hot] = (mixed % self._hot_salts[idx[is_hot]]).astype(np.int32)
        t = t.append_column("salt", pa.array(salts, type=pa.int32()))
        return t.append_column("is_hot", pa.array(is_hot))


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
    """Append ``salt`` (0 for normal buckets; stable mix(doc_id) %
    n_salts for hot ones) and ``is_hot``."""
    hot_ref = ray.put(hot)
    return band_rows.map_batches(
        _salt_batch,
        fn_kwargs={"hot_ref": hot_ref},
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _emit_pairs_sorted(ids_sorted: np.ndarray, starts, lens, star_threshold: int):
    """Pair emission over segments of a doc-id array sorted by
    (bucket, id): all-pairs for small segments, star-to-min otherwise."""
    us_parts, vs_parts = [], []
    for s, L in zip(starts.tolist(), lens.tolist()):
        if L < 2:
            continue
        seg = ids_sorted[s : s + L]
        if L <= star_threshold:
            iu, jv = np.triu_indices(L, k=1)
            us_parts.append(seg[iu])
            vs_parts.append(seg[jv])
        else:
            us_parts.append(np.repeat(seg[:1], L - 1))
            vs_parts.append(seg[1:])
    if not us_parts:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    return np.concatenate(us_parts), np.concatenate(vs_parts)


def bucket_candidate_pairs(
    salted: ray.data.Dataset, cfg: DedupConfig, *, num_partitions: int | None = None
) -> ray.data.Dataset:
    """(band_id, band_hash, salt) partition kernel -> candidate id
    pairs, plus rep-star pairs reconnecting the salt groups of hot
    buckets.  Fully numeric sorts."""

    def pair_kernel(g: pa.Table) -> pa.Table:
        k = numeric_key_u64(g, _SALTED_KEY_COLS)
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, k))
        starts, lens = segments(k[order])
        us, vs = _emit_pairs_sorted(ids[order], starts, lens, STAR_THRESHOLD)
        return pa.table(
            {
                "u_id": pa.array(us, type=pa.int64()),
                "v_id": pa.array(vs, type=pa.int64()),
            }
        )

    pairs = partitioned_kernel(
        salted,
        lambda t: numeric_key_u64(t, _SALTED_KEY_COLS),
        pair_kernel,
        num_partitions=num_partitions or 64,
        empty_result=_EMPTY_PAIRS,
    )

    # cross-salt reconnection: hot rows only (tiny)
    hot_empty = pa.table(
        {
            "band_id": pa.array([], type=pa.int32()),
            "band_hash": pa.array([], type=pa.int64()),
            "doc_id": pa.array([], type=pa.int64()),
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
            "rep": pa.array([], type=pa.int64()),
        }
    )

    def rep_kernel(g: pa.Table) -> pa.Table:
        k = numeric_key_u64(g, _SALTED_KEY_COLS)
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, k))
        starts, _lens = segments(k[order])
        idx = order[starts]
        return pa.table(
            {
                "band_id": g["band_id"].take(pa.array(idx)),
                "band_hash": g["band_hash"].take(pa.array(idx)),
                "rep": pa.array(ids[idx], type=pa.int64()),
            }
        )

    reps = partitioned_kernel(
        hot_rows,
        lambda t: numeric_key_u64(t, _SALTED_KEY_COLS),
        rep_kernel,
        num_partitions=num_partitions or cfg.num_partitions,
        empty_result=rep_empty,
    )

    def star_kernel(g: pa.Table) -> pa.Table:
        k = numeric_key_u64(g, _BUCKET_KEY_COLS)
        ids = g["rep"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, k))
        starts, lens = segments(k[order])
        us, vs = _emit_pairs_sorted(ids[order], starts, lens, 1)
        return pa.table(
            {
                "u_id": pa.array(us, type=pa.int64()),
                "v_id": pa.array(vs, type=pa.int64()),
            }
        )

    rep_pairs = partitioned_kernel(
        reps,
        lambda t: numeric_key_u64(t, _BUCKET_KEY_COLS),
        star_kernel,
        num_partitions=num_partitions or cfg.num_partitions,
        empty_result=_EMPTY_PAIRS,
    )
    return pairs.union(rep_pairs)


_PAIR_KEY_COLS = ["u_id", "v_id"]


def dedupe_pairs(
    pairs: ray.data.Dataset, *, num_partitions: int | None = None
) -> ray.data.Dataset:
    """Distinct (u_id, v_id) via a vectorized numeric unique kernel."""

    def kernel(g: pa.Table) -> pa.Table:
        k = numeric_key_u64(g, _PAIR_KEY_COLS)
        us = g["u_id"].to_numpy(zero_copy_only=False)
        vs = g["v_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((vs, us, k))
        ks, uss, vss = k[order], us[order], vs[order]
        first = np.ones(len(ks), dtype=bool)
        if len(ks) > 1:
            first[1:] = (ks[1:] != ks[:-1]) | (uss[1:] != uss[:-1]) | (vss[1:] != vss[:-1])
        return pa.table(
            {
                "u_id": pa.array(uss[first], type=pa.int64()),
                "v_id": pa.array(vss[first], type=pa.int64()),
            }
        )

    return partitioned_kernel(
        pairs,
        lambda t: numeric_key_u64(t, _PAIR_KEY_COLS),
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
    """Attach both signatures to every candidate pair; keep pairs whose
    estimated Jaccard (fraction of agreeing components) >=
    cfg.verify_tau; output edges carry the URLS (provided by the
    signature rows, so the banded path never shipped them).

    The attach step is a DISTRIBUTED SEMI-JOIN: signature rows and pair
    member rows ride the same hash exchange keyed on doc_id, and the
    attach kernel drops every signature whose doc appears in no pair.
    Nothing is collected on the driver (the r01 broadcast-filter variant
    np.unique'd every candidate id driver-side — OOM at 10^12 docs).
    Exchange volume: the signature table moves exactly once (~1 KB/doc),
    which is within a small factor of optimal because the candidate-
    incident doc set is itself a large fraction of the corpus at scale.
    """
    P = num_partitions or 64
    num_perms = cfg.num_perms

    def sig_rows(t: pa.Table) -> pa.Table:
        t = ensure_doc_ids(t)
        n = len(t)
        sig = t["minhash"].combine_chunks()
        flat = sig.flatten().to_numpy(zero_copy_only=False).astype(np.uint64)
        mat = flat.reshape(n, num_perms)
        return pa.table(
            {
                "gkey": t["doc_id"],
                "u_id": pa.array(np.zeros(n, dtype=np.int64)),
                "v_id": pa.array(np.zeros(n, dtype=np.int64)),
                "slot": pa.array(np.full(n, -1, dtype=np.int32)),
                "sig": u64_matrix_to_binary(mat),
                "url": t["url"],
            }
        )

    _tall_empty = pa.table(
        {
            "gkey": pa.array([], type=pa.int64()),
            "u_id": pa.array([], type=pa.int64()),
            "v_id": pa.array([], type=pa.int64()),
            "slot": pa.array([], type=pa.int32()),
            "sig": pa.array([], type=pa.binary()),
            "url": pa.array([], type=pa.string()),
        }
    )

    def pair_rows(t: pa.Table) -> pa.Table:
        if "u_id" not in t.column_names or len(t) == 0:
            return _tall_empty
        u = t["u_id"].combine_chunks()
        v = t["v_id"].combine_chunks()
        n = len(t)
        return pa.table(
            {
                "gkey": pa.concat_arrays([u, v]),
                "u_id": pa.concat_arrays([u, u]),
                "v_id": pa.concat_arrays([v, v]),
                "slot": pa.array(
                    np.concatenate(
                        [np.zeros(n, dtype=np.int32), np.ones(n, dtype=np.int32)]
                    )
                ),
                "sig": pa.nulls(2 * n, type=pa.binary()),
                "url": pa.nulls(2 * n, type=pa.string()),
            }
        )

    sig_cols = ["url", "minhash"] + (
        ["doc_id"] if "doc_id" in schema_names(signatures) else []
    )
    tall = signatures.select_columns(sig_cols).map_batches(
        sig_rows, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        pairs.map_batches(pair_rows, batch_format="pyarrow", zero_copy_batch=True)
    )

    attach_empty = pa.table(
        {
            "u_id": pa.array([], type=pa.int64()),
            "v_id": pa.array([], type=pa.int64()),
            "slot": pa.array([], type=pa.int32()),
            "sig": pa.array([], type=pa.binary()),
            "url": pa.array([], type=pa.string()),
        }
    )

    def attach_kernel(g: pa.Table) -> pa.Table:
        """Per doc-id segment: copy the slot=-1 row's sig+url onto
        member rows — vectorized segment-start gathers."""
        gkeys = g["gkey"].to_numpy(zero_copy_only=False)
        slots = g["slot"].to_numpy(zero_copy_only=False)
        order = np.lexsort((slots, gkeys))  # sig row (-1) first per segment
        gs = gkeys[order]
        starts, lens = segments(gs)
        slots_sorted = slots[order]
        has_sig = slots_sorted[starts] == -1
        seg_id = np.repeat(np.arange(len(starts)), lens)
        member = (slots_sorted >= 0) & has_sig[seg_id]
        if not member.any():
            return attach_empty
        take_rows = pa.array(order[member])
        src = pa.array(order[starts[seg_id][member]])
        return pa.table(
            {
                "u_id": g["u_id"].take(take_rows),
                "v_id": g["v_id"].take(take_rows),
                "slot": g["slot"].take(take_rows),
                "sig": g["sig"].take(src),
                "url": g["url"].take(src),
            }
        )

    attached = partitioned_kernel(
        tall,
        lambda t: t["gkey"].to_numpy(zero_copy_only=False).view(np.uint64),
        attach_kernel,
        num_partitions=P,
        empty_result=attach_empty,
    )

    tau = cfg.verify_tau

    def verify_kernel(g: pa.Table) -> pa.Table:
        """Per (u_id, v_id) segment: expect slots {0, 1}; vectorized
        signature comparison across all pairs at once."""
        from dedup_ray.util import binary_to_u64_matrix

        us = g["u_id"].to_numpy(zero_copy_only=False)
        vs = g["v_id"].to_numpy(zero_copy_only=False)
        slots = g["slot"].to_numpy(zero_copy_only=False)
        order = np.lexsort((slots, vs, us))
        us_s, vs_s, sl_s = us[order], vs[order], slots[order]
        # in-kernel dedupe: a pair colliding in several bands produced
        # several identical member rows — keep the first per
        # (u_id, v_id, slot) occurrence
        n_rows = len(us_s)
        keep1 = np.ones(n_rows, dtype=bool)
        if n_rows > 1:
            keep1[1:] = (
                (us_s[1:] != us_s[:-1])
                | (vs_s[1:] != vs_s[:-1])
                | (sl_s[1:] != sl_s[:-1])
            )
        order = order[keep1]
        us_s, vs_s = us_s[keep1], vs_s[keep1]
        # segment on the ACTUAL (u_id, v_id) values, not their mixed
        # hash (a hash collision must not merge two pairs)
        n_rows = len(us_s)
        firsts = np.ones(n_rows, dtype=bool)
        if n_rows > 1:
            firsts[1:] = (us_s[1:] != us_s[:-1]) | (vs_s[1:] != vs_s[:-1])
        starts = np.flatnonzero(firsts).astype(np.int64)
        lens = np.diff(np.concatenate([starts, [n_rows]])).astype(np.int64)
        ok = lens == 2
        if not ok.any():
            return _EMPTY_EDGES
        s = starts[ok]
        slots_sorted = slots[order]
        ok2 = (slots_sorted[s] == 0) & (slots_sorted[s + 1] == 1)
        s = s[ok2]
        if len(s) == 0:
            return _EMPTY_EDGES
        sig_sorted = g["sig"].take(pa.array(order))
        mats = binary_to_u64_matrix(sig_sorted, num_perms)
        est = (mats[s] == mats[s + 1]).mean(axis=1)
        keep = est >= tau
        if not keep.any():
            return _EMPTY_EDGES
        url_sorted = g["url"].take(pa.array(order))
        rows_u = pa.array(s[keep])
        rows_v = pa.array(s[keep] + 1)
        return pa.table(
            {
                "u": url_sorted.take(rows_u),
                "v": url_sorted.take(rows_v),
                # int ids ride along so downstream exchanges (node
                # kinds, union-find, assignment) key on int64 without
                # re-hashing the url strings per row
                "u_id": pa.array(us_s[s[keep]], type=pa.int64()),
                "v_id": pa.array(vs_s[s[keep]], type=pa.int64()),
                "kind": pa.array(["minhash"] * int(keep.sum()), type=pa.string()),
                "score": pa.array(est[keep], type=pa.float64()),
            }
        )

    return partitioned_kernel(
        attached,
        lambda t: numeric_key_u64(t, _PAIR_KEY_COLS),
        verify_kernel,
        num_partitions=P,
        empty_result=_EMPTY_EDGES,
    )


_FUSED_EMPTY = pa.table(
    {
        "u_id": pa.array([], type=pa.int64()),
        "v_id": pa.array([], type=pa.int64()),
        "meta": pa.array([], type=pa.int32()),
    }
)


def fused_candidate_pairs(
    bands: ray.data.Dataset, cfg: DedupConfig, *, num_partitions: int | None = None
) -> ray.data.Dataset:
    """ONE exchange from band rows to candidate id pairs, with skew
    handling fused into the kernel.

    The custom hash exchange co-locates every (band_id, band_hash)
    bucket in one partition, so hot-bucket detection and salting need
    no separate counting pass: the kernel sees each bucket whole,
    salts oversized ones locally (stable mix(doc_id) % n_salts
    sub-groups + rep star across them), and EMITS A LOG ROW per capped
    bucket (meta=1: u_id=bucket size, v_id=band_id) — skew is never
    silent.  Pair rows have meta=0.  Versus the two-pass variant this
    removes two full exchanges over the banded row set (the previous
    count + salt stages).
    """
    cap = cfg.bucket_cap

    def kernel(g: pa.Table) -> pa.Table:
        k = numeric_key_u64(g, _BUCKET_KEY_COLS)
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        band_ids = g["band_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, k))
        ks, ids_s = k[order], ids[order]
        starts, lens = segments(ks)
        us_parts, vs_parts = [], []
        log_sizes, log_bands = [], []
        for s, L in zip(starts.tolist(), lens.tolist()):
            if L < 2:
                continue
            seg = ids_s[s : s + L]
            if L <= cap:
                if L <= STAR_THRESHOLD:
                    iu, jv = np.triu_indices(L, k=1)
                    us_parts.append(seg[iu])
                    vs_parts.append(seg[jv])
                else:
                    us_parts.append(np.repeat(seg[:1], L - 1))
                    vs_parts.append(seg[1:])
                continue
            # hot bucket: salt into sub-groups, star within, rep star across
            n_salts = -(-L // cap)
            log_sizes.append(L)
            log_bands.append(int(band_ids[order[s]]))
            salts = (splitmix64(seg.view(np.uint64)) % np.uint64(n_salts)).astype(
                np.int64
            )
            sort2 = np.lexsort((seg, salts))
            seg2 = seg[sort2]
            s2, l2 = segments(salts[sort2])
            reps = []
            for ss, LL in zip(s2.tolist(), l2.tolist()):
                sub = seg2[ss : ss + LL]
                reps.append(sub[0])
                if LL >= 2:
                    us_parts.append(np.repeat(sub[:1], LL - 1))
                    vs_parts.append(sub[1:])
            reps = np.sort(np.array(reps, dtype=ids.dtype))
            if len(reps) >= 2:
                us_parts.append(np.repeat(reps[:1], len(reps) - 1))
                vs_parts.append(reps[1:])
        n_pairs = sum(len(p) for p in us_parts)
        n_logs = len(log_sizes)
        if n_pairs == 0 and n_logs == 0:
            return _FUSED_EMPTY
        u_out = np.concatenate(
            ([np.concatenate(us_parts)] if us_parts else [])
            + ([np.array(log_sizes, dtype=np.int64)] if n_logs else [])
        )
        v_out = np.concatenate(
            ([np.concatenate(vs_parts)] if vs_parts else [])
            + ([np.array(log_bands, dtype=np.int64)] if n_logs else [])
        )
        meta = np.concatenate(
            [np.zeros(n_pairs, dtype=np.int32), np.ones(n_logs, dtype=np.int32)]
        )
        return pa.table(
            {
                "u_id": pa.array(u_out, type=pa.int64()),
                "v_id": pa.array(v_out, type=pa.int64()),
                "meta": pa.array(meta, type=pa.int32()),
            }
        )

    return partitioned_kernel(
        bands,
        lambda t: numeric_key_u64(t, _BUCKET_KEY_COLS),
        kernel,
        num_partitions=num_partitions or 64,
        empty_result=_FUSED_EMPTY,
    )


def fused_candidate_pairs_incremental(
    bands: ray.data.Dataset, cfg: DedupConfig, *, num_partitions: int | None = None
) -> ray.data.Dataset:
    """ONE exchange from SIDE-TAGGED band rows (``side`` 0 = already
    ingested base corpus, 1 = new shard) to candidate id pairs that
    always touch >= 1 NEW doc — the incremental counterpart of
    ``fused_candidate_pairs``.

    Never emits base x base pairs: at 10^12 base docs those would
    re-dedup the already-ingested corpus (the waste an incremental
    operator exists to avoid), and they are provably verdict-neutral —
    the per-cluster "contains a base doc" bit is carried entirely by
    new-incident edges, and base-base connectivity can only merge
    components that each already contain a base doc (same verdict
    either way).  At 100 TB the base side's band rows come straight
    from the banded signature checkpoint (never re-shingled); only the
    new shard is hashed fresh.

    Bucket topology per (band_id, band_hash) segment (new/base ids
    each sorted ascending):
      - L <= STAR_THRESHOLD: new x new triangle + full new x base cross
      - L <= bucket_cap: star over new ids + (min new) x every base +
        every other new x (min base) — linear in L, every new doc keeps
        one direct base probe and the new block stays connected
      - L > bucket_cap (hot): salted subgroups (stable mix(doc_id) %
        n_salts) with the above applied per subgroup, plus a star over
        per-subgroup min NEW ids, and a log row (meta=1: u_id=size,
        v_id=band_id) per capped bucket — skew is never silent.
    """
    return partitioned_kernel(
        bands,
        lambda t: numeric_key_u64(t, _BUCKET_KEY_COLS),
        incremental_pair_kernel(cfg),
        num_partitions=num_partitions or 64,
        empty_result=_FUSED_EMPTY,
    )


def incremental_pair_kernel(cfg: DedupConfig):
    """The side-aware bucket kernel behind
    ``fused_candidate_pairs_incremental`` — exposed so the
    band-checkpoint exchange (pipelines/incremental.py) runs the
    LITERAL same kernel over disk-resident base partitions + exchanged
    new rows."""
    cap = cfg.bucket_cap

    def kernel(g: pa.Table) -> pa.Table:
        if "side" not in g.column_names or len(g) == 0:
            return _FUSED_EMPTY
        k = numeric_key_u64(g, _BUCKET_KEY_COLS)
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        sides = g["side"].to_numpy(zero_copy_only=False)
        band_ids = g["band_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, sides, k))
        ks, ids_s, sides_s = k[order], ids[order], sides[order]
        starts, lens = segments(ks)
        us_parts, vs_parts = [], []
        log_sizes, log_bands = [], []

        def emit_block(base: np.ndarray, new: np.ndarray) -> None:
            nb, nn = len(base), len(new)
            if nn == 0 or nb + nn < 2:
                return
            if nb + nn <= STAR_THRESHOLD:
                if nn >= 2:
                    iu, jv = np.triu_indices(nn, k=1)
                    us_parts.append(new[iu])
                    vs_parts.append(new[jv])
                if nb:
                    us_parts.append(np.repeat(new, nb))
                    vs_parts.append(np.tile(base, nn))
                return
            if nn >= 2:
                us_parts.append(np.repeat(new[:1], nn - 1))
                vs_parts.append(new[1:])
            if nb:
                us_parts.append(np.repeat(new[:1], nb))
                vs_parts.append(base)
                if nn >= 2:
                    us_parts.append(new[1:])
                    vs_parts.append(np.repeat(base[:1], nn - 1))

        for s, L in zip(starts.tolist(), lens.tolist()):
            seg_ids = ids_s[s : s + L]
            seg_sides = sides_s[s : s + L]
            # sides sorted within the segment: base block then new block
            split = int(np.searchsorted(seg_sides, 1))
            new = seg_ids[split:]
            if len(new) == 0:
                continue  # base-only bucket: the big incremental skip
            base = seg_ids[:split]
            if L <= cap:
                emit_block(base, new)
                continue
            n_salts = -(-L // cap)
            log_sizes.append(L)
            log_bands.append(int(band_ids[order[s]]))
            salts = (splitmix64(seg_ids.view(np.uint64)) % np.uint64(n_salts)).astype(
                np.int64
            )
            order2 = np.lexsort((seg_ids, seg_sides, salts))
            ids2, sides2 = seg_ids[order2], seg_sides[order2]
            s2, l2 = segments(salts[order2])
            reps_new = []
            for ss, LL in zip(s2.tolist(), l2.tolist()):
                sub_ids = ids2[ss : ss + LL]
                sub_sides = sides2[ss : ss + LL]
                sp = int(np.searchsorted(sub_sides, 1))
                sub_new = sub_ids[sp:]
                if len(sub_new) == 0:
                    continue
                reps_new.append(sub_new[0])
                emit_block(sub_ids[:sp], sub_new)
            if len(reps_new) >= 2:
                reps = np.sort(np.array(reps_new, dtype=ids.dtype))
                us_parts.append(np.repeat(reps[:1], len(reps) - 1))
                vs_parts.append(reps[1:])
        n_pairs = sum(len(p) for p in us_parts)
        n_logs = len(log_sizes)
        if n_pairs == 0 and n_logs == 0:
            return _FUSED_EMPTY
        u_out = np.concatenate(
            ([np.concatenate(us_parts)] if us_parts else [])
            + ([np.array(log_sizes, dtype=np.int64)] if n_logs else [])
        )
        v_out = np.concatenate(
            ([np.concatenate(vs_parts)] if vs_parts else [])
            + ([np.array(log_bands, dtype=np.int64)] if n_logs else [])
        )
        meta = np.concatenate(
            [np.zeros(n_pairs, dtype=np.int32), np.ones(n_logs, dtype=np.int32)]
        )
        return pa.table(
            {
                "u_id": pa.array(u_out, type=pa.int64()),
                "v_id": pa.array(v_out, type=pa.int64()),
                "meta": pa.array(meta, type=pa.int32()),
            }
        )

    return kernel


def minhash_edges(
    signatures: ray.data.Dataset, cfg: DedupConfig
) -> tuple[ray.data.Dataset, list[dict]]:
    """Full near-dup candidate path: bands -> fused salted-bucket pair
    kernel -> signature verification (pair dedupe fused into the verify
    kernel).  Returns (edges with urls, hot-bucket log)."""
    bands = lsh_bands(signatures, cfg)
    fused = fused_candidate_pairs(bands, cfg, num_partitions=cfg.num_partitions)
    # split off the log rows: filter DISTRIBUTEDLY first so only the
    # (tiny, by definition: one row per capped bucket) log stream ever
    # reaches the driver — the pair rows are never driver-iterated
    log: list[dict] = []
    log_rows = fused.map_batches(
        lambda t: t.filter(pc.equal(t["meta"], 1)).select(["u_id", "v_id"])
        if "meta" in t.column_names
        else _EMPTY_PAIRS,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    for b in log_rows.iter_batches(batch_format="pyarrow", batch_size=65536):
        if "u_id" not in b.column_names:
            continue
        for size, band in zip(b["u_id"].to_pylist(), b["v_id"].to_pylist()):
            log.append(
                {
                    "band_id": band,
                    "bucket_size": size,
                    "n_salts": -(-size // cfg.bucket_cap),
                }
            )
    pairs = fused.map_batches(
        lambda t: t.filter(pc.equal(t["meta"], 0)).select(["u_id", "v_id"])
        if "meta" in t.column_names
        else _EMPTY_PAIRS,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    # dedupe before verification: a pair colliding in b of 32 bands
    # appears b times; one slim 16-byte-row exchange here keeps b x
    # signature-attach volume out of the (much heavier) verify shuffle
    pairs = dedupe_pairs(pairs, num_partitions=cfg.num_partitions)
    edges = verify_pairs(pairs, signatures, cfg, num_partitions=cfg.num_partitions)
    return edges, log
