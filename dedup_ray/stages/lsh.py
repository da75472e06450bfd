"""LSH banding + bucket candidate generation with explicit skew
handling (SURVEY.md §2B B9, B10, B12; BASELINE.json:6,14).

Shape of the computation (all Ray Data, slim rows through every
shuffle):

  signatures ──lsh_bands──▶ band_rows (band_id, band_hash, url)   [x bands]
      band_rows ──count──▶ hot buckets (> bucket_cap)             [small]
      band_rows + broadcast hot set ──salt──▶ salted band rows
      groupby (band_id, band_hash, salt) ──▶ candidate pairs (u, v)
      groupby (u, v) ──▶ distinct pairs                           [dedup across bands]
      pairs ⨝ signatures (on u) ⨝ signatures (on v) ──▶ verify est-Jaccard

Design decisions, with the 100-TB rationale:
  - Band rows do NOT carry the 1-KB signature (32 bands would amplify
    shuffle volume 32x); verification instead re-joins the signatures
    table twice — two hash-partitioned joins of (pairs x 1KB sigs).
  - Buckets bigger than ``bucket_cap`` (boilerplate shingle buckets)
    are SALTED: members split into sub-buckets of <= cap by a stable
    hash of url; within-salt pairs are emitted all-pairs (bounded by
    cap^2) and cross-salt connectivity is restored by a star over the
    per-salt representatives (min url).  Every capped bucket is
    COUNTED and returned to the caller (logged, never silent).
  - Pair rows are canonicalized (u < v) and deduplicated across bands
    before the expensive verify joins.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count

from dedup_ray.config import DedupConfig
from dedup_ray.util import combine_rows_u64, u64_matrix_to_binary

_EMPTY_PAIRS = pa.table(
    {"u": pa.array([], type=pa.string()), "v": pa.array([], type=pa.string())}
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
                # int64 REINTERPRET of the uint64 hash: Ray 2.49's sort
                # boundary sampling overflows python-int uint64 values
                # into pickled-object arrays; grouping only needs
                # equality, which the bit view preserves
                "band_hash": pa.array(bh.view(np.int64), type=pa.int64()),
                "url": pa.array(urls, type=pa.string()),
            }
        )

    return signatures.map_batches(to_bands, batch_format="pyarrow", zero_copy_batch=True)


def find_hot_buckets(
    band_rows: ray.data.Dataset, cfg: DedupConfig
) -> tuple[dict[tuple[int, int], int], list[dict]]:
    """Count bucket sizes; return ({(band_id, band_hash): n_salts}, log).

    The hot set is by definition small (buckets above cap), so
    collecting it on the driver for broadcast is safe at any scale —
    this is the two-pass skew strategy from SURVEY.md §4.  Every capped
    bucket is logged (band, hash, size, salts): no silent truncation.
    """
    sizes = band_rows.groupby(["band_id", "band_hash"]).aggregate(
        Count(alias_name="n")
    )
    hot_tbl = sizes.map_batches(
        lambda t: t.filter(pc.greater(t["n"], cfg.bucket_cap)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    hot: dict[tuple[int, int], int] = {}
    log: list[dict] = []
    for b in hot_tbl.iter_batches(batch_format="pyarrow", batch_size=65536):
        for band_id, band_hash, n in zip(
            b["band_id"].to_pylist(), b["band_hash"].to_pylist(), b["n"].to_pylist()
        ):
            n_salts = -(-n // cfg.bucket_cap)
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
            # combined key: golden-ratio-mixed band_id XOR band_hash
            self._hot_keys = np.array(
                [np.uint64(b) * np.uint64(0x9E3779B97F4A7C15) ^ np.uint64(h) for (b, h) in self.hot],
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


def salt_band_rows(
    band_rows: ray.data.Dataset,
    hot: dict[tuple[int, int], int],
    cfg: DedupConfig,
) -> ray.data.Dataset:
    """Append a ``salt`` column: 0 for normal buckets; stable
    ``hash(url) % n_salts`` for hot buckets (broadcast via ray.put)."""
    hot_ref = ray.put(hot)
    return band_rows.map_batches(
        _Salter,
        fn_constructor_args=(hot_ref,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
    )


def bucket_candidate_pairs(
    salted: ray.data.Dataset, cfg: DedupConfig, *, num_partitions: int | None = None
) -> ray.data.Dataset:
    """groupby (band_id, band_hash, salt) -> candidate pair rows.

    Within a (post-salt, <= ~cap sized) bucket: all-pairs via
    ``np.triu_indices`` on the sorted member list (canonical u < v).
    For salted buckets a second tiny groupby star-connects the per-salt
    representatives (min url) of each original bucket.
    """

    def pairs_fn(group: pa.Table) -> pa.Table:
        urls = np.sort(group["url"].to_numpy(zero_copy_only=False))
        n = len(urls)
        if n < 2:
            return _EMPTY_PAIRS
        iu, jv = np.triu_indices(n, k=1)
        return pa.table(
            {
                "u": pa.array(urls[iu], type=pa.string()),
                "v": pa.array(urls[jv], type=pa.string()),
            }
        )

    pairs = salted.groupby(
        ["band_id", "band_hash", "salt"], num_partitions=num_partitions
    ).map_groups(pairs_fn, batch_format="pyarrow")

    # cross-salt star edges: only rows of HOT buckets participate (a
    # normal bucket has a single salt group, nothing to reconnect), so
    # this path is tiny.  Representative = min url per salt group, via
    # map_groups (NOT the Min aggregate: Ray's string Min yields a
    # pickled-object extension column that breaks downstream sorts).
    hot_rows = salted.map_batches(
        lambda t: t.filter(t["is_hot"].combine_chunks()),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def rep_row(group: pa.Table) -> pa.Table:
        rep = min(group["url"].to_pylist())
        return pa.table(
            {
                "band_id": group["band_id"][:1],
                "band_hash": group["band_hash"][:1],
                "rep": pa.array([rep], type=pa.string()),
            }
        )

    reps = hot_rows.groupby(["band_id", "band_hash", "salt"]).map_groups(
        rep_row, batch_format="pyarrow"
    )

    def rep_star(group: pa.Table) -> pa.Table:
        urls = np.sort(group["rep"].to_numpy(zero_copy_only=False))
        if len(urls) < 2:
            return _EMPTY_PAIRS
        return pa.table(
            {
                "u": pa.array([str(urls[0])] * (len(urls) - 1), type=pa.string()),
                "v": pa.array(urls[1:], type=pa.string()),
            }
        )

    rep_pairs = reps.groupby(["band_id", "band_hash"]).map_groups(
        rep_star, batch_format="pyarrow"
    )
    return pairs.union(rep_pairs)


def dedupe_pairs(pairs: ray.data.Dataset) -> ray.data.Dataset:
    """Distinct (u, v) with the number of supporting collisions."""
    return pairs.groupby(["u", "v"]).aggregate(Count(alias_name="n_bands"))


_EMPTY_EDGES = pa.table(
    {
        "u": pa.array([], type=pa.string()),
        "v": pa.array([], type=pa.string()),
        "kind": pa.array([], type=pa.string()),
        "score": pa.array([], type=pa.float64()),
    }
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

    Implemented as UNION + two GROUPBYs (the classic shuffle-join
    decomposition) rather than ``Dataset.join``: Ray 2.49's acero-based
    join breaks on empty hash partitions when the left schema is
    lazily unknown, and the groupby path handles that fine while
    shuffling the same volume.  Phase 1 routes each pair row to its
    member urls alongside the signature rows (shuffle key: url);
    phase 2 reassembles per pair (shuffle key: (u, v)).

    Scale note: signatures flow through the shuffle once per side
    (2x 1KB/doc touched by any candidate), NOT once per band row
    (32x) — same volume as a hash join would move.
    """
    num_perms = cfg.num_perms

    def sig_rows(t: pa.Table) -> pa.Table:
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
        none_sig = pa.nulls(2 * n, type=pa.binary())
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
                "sig": none_sig,
            }
        )

    tall = signatures.select_columns(["url", "minhash"]).map_batches(
        sig_rows, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        pairs.select_columns(["u", "v"]).map_batches(
            pair_rows, batch_format="pyarrow", zero_copy_batch=True
        )
    )

    def attach(group: pa.Table) -> pa.Table:
        slots = group["slot"].to_numpy(zero_copy_only=False)
        sig_idx = np.flatnonzero(slots == -1)
        member = np.flatnonzero(slots >= 0)
        if len(sig_idx) == 0 or len(member) == 0:
            return pa.table(
                {
                    "u": pa.array([], type=pa.string()),
                    "v": pa.array([], type=pa.string()),
                    "slot": pa.array([], type=pa.int32()),
                    "sig": pa.array([], type=pa.binary()),
                }
            )
        sig_val = group["sig"][int(sig_idx[0])].as_py()
        m = len(member)
        member_mask = pa.array(slots >= 0)
        return pa.table(
            {
                "u": group["u"].filter(member_mask),
                "v": group["v"].filter(member_mask),
                "slot": group["slot"].filter(member_mask),
                "sig": pa.array([sig_val] * m, type=pa.binary()),
            }
        )

    attached = tall.groupby("gkey", num_partitions=num_partitions).map_groups(
        attach, batch_format="pyarrow"
    )

    tau = cfg.verify_tau

    def verify(group: pa.Table) -> pa.Table:
        if len(group) != 2:
            return _EMPTY_EDGES
        slots = group["slot"].to_numpy(zero_copy_only=False)
        if set(slots.tolist()) != {0, 1}:
            return _EMPTY_EDGES
        su = np.frombuffer(group["sig"][0].as_py(), dtype=np.uint64)
        sv = np.frombuffer(group["sig"][1].as_py(), dtype=np.uint64)
        if slots[0] == 1:
            su, sv = sv, su
        est = float((su == sv).mean())
        if est < tau:
            return _EMPTY_EDGES
        return pa.table(
            {
                "u": group["u"][:1],
                "v": group["v"][:1],
                "kind": pa.array(["minhash"], type=pa.string()),
                "score": pa.array([est], type=pa.float64()),
            }
        )

    return attached.groupby(["u", "v"], num_partitions=num_partitions).map_groups(
        verify, batch_format="pyarrow"
    )


def minhash_edges(
    signatures: ray.data.Dataset, cfg: DedupConfig
) -> tuple[ray.data.Dataset, list[dict]]:
    """Full near-dup candidate path: bands -> skew-salted buckets ->
    distinct pairs -> signature verification.  Returns (edges,
    hot-bucket log)."""
    bands = lsh_bands(signatures, cfg).materialize()  # consumed twice
    hot, log = find_hot_buckets(bands, cfg)
    salted = salt_band_rows(bands, hot, cfg)
    pairs = dedupe_pairs(bucket_candidate_pairs(salted, cfg))
    edges = verify_pairs(pairs, signatures, cfg)
    return edges, log
