"""MinHash signature stage (SURVEY.md §2B B7) — k-shingles + 128-perm
MinHash as a stateful ACTOR-POOL map_batches stage.

Actor-pool pattern (BASELINE.json:15): permutation parameters and the
unique-token hash cache are built ONCE per worker in ``__init__`` from
the config seed; ``__call__`` does the per-batch work with NO
per-document or per-token Python loop on the hot path:

  1. tokenization: arrow kernels (utf8_lower + split_pattern_regex) —
     the canonical token definition for the whole engine (oracle
     included) is "non-empty runs of RE2 \\w";
  2. token hashing: the flat token array is DICTIONARY-ENCODED (one C
     pass); only UNIQUE tokens are blake2b-hashed (cached across
     batches — web text is Zipfian, so the cache hit rate approaches
     1), then a single numpy take maps hashes back to positions;
  3. shingling: the k-window polynomial is computed globally with k
     shifted multiply-adds and masked at document boundaries; only
     docs shorter than k tokens (rare) take a tiny Python loop;
  4. MinHash: one ``np.minimum.reduceat`` pass per permutation;
  5. SimHash: vectorized bit-count ``np.add.reduceat`` over the same
     shingle hashes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from dedup_ray.config import DedupConfig
from dedup_ray.core import default_pool_size
from dedup_ray.util import (
    _POLY_C,
    minhash_perms,
    minhash_signatures,
    splitmix64,
)

_SPLIT_PATTERN = r"[^\w]+"


def tokenize(text: str, normalize: bool = True) -> list[str]:
    """Canonical tokenization (single-string convenience wrapper around
    the same arrow kernels the batch path uses — MUST stay identical to
    MinHasher's tokenization for the brute-force oracle to define the
    same shingle sets)."""
    arr = pa.array([text or ""], type=pa.string())
    if normalize:
        arr = pc.utf8_lower(arr)
    toks = pc.split_pattern_regex(arr, pattern=_SPLIT_PATTERN)[0].as_py()
    return [t for t in toks if t]


class MinHasher:
    """Callable class for ``map_batches(MinHasher, concurrency=(1, N),
    fn_constructor_args=(cfg,))``.

    Output columns: url, n_shingles, minhash (list<uint64>[num_perms]),
    simhash64 (int64 reinterpret); passthrough: content_sha256,
    n_chars, priority, lang when present.
    """

    def __init__(self, cfg: DedupConfig) -> None:
        self.cfg = cfg
        self.a, self.b = minhash_perms(cfg.num_perms, cfg.seed + 1)
        # ONE token-hash definition repo-wide (util.TokenHasher is what
        # the brute-force oracle uses — sharing it keeps the recall
        # gate meaningful by construction)
        from dedup_ray.util import TokenHasher

        self._token_hasher = TokenHasher(seed=cfg.seed)
        self._bit_shifts = np.arange(64, dtype=np.uint64)

    # ---- vectorized sub-steps --------------------------------------
    def _token_hashes(self, texts) -> tuple[np.ndarray, np.ndarray]:
        """-> (flat token hashes uint64, tokens-per-doc int64)."""
        arr = pc.coalesce(texts, pa.scalar("", pa.string()))
        if self.cfg.normalize:
            arr = pc.utf8_lower(arr)
        toks = pc.split_pattern_regex(arr, pattern=_SPLIT_PATTERN)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        enc = flat.dictionary_encode()
        idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniq = enc.dictionary.to_pylist()
        # hash the batch's unique dictionary via the shared cached
        # TokenHasher; empty tokens (regex-split artifacts) are removed
        # below, so their hash value never reaches a shingle
        uh = self._token_hasher.hash_tokens(uniq)
        empty_code = uniq.index("") if "" in uniq else -1
        th_all = uh[idx]
        doc_id = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        if empty_code >= 0:
            keep = idx != empty_code
            th_all = th_all[keep]
            doc_id = doc_id[keep]
        counts = np.bincount(doc_id, minlength=len(lens)).astype(np.int64)
        return th_all, counts

    def _shingles(
        self, th: np.ndarray, counts: np.ndarray, k: int
    ) -> tuple[np.ndarray, np.ndarray]:
        """Global windowed polynomial with boundary masking.
        -> (all shingle hashes doc-major, shingles-per-doc)."""
        n_docs = len(counts)
        n_sh = np.where(counts == 0, 0, np.where(counts < k, 1, counts - k + 1))
        total = int(n_sh.sum())
        out = np.empty(total, dtype=np.uint64)
        if len(th) == 0:
            return out, n_sh
        doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
        m = len(th) - k + 1
        if m > 0:
            with np.errstate(over="ignore"):
                acc = np.zeros(m, dtype=np.uint64)
                for j in range(k):
                    acc = acc * _POLY_C + th[j : j + m]
            valid = doc_of[:m] == doc_of[k - 1 :]
            long_windows = splitmix64(acc[valid])
        else:
            long_windows = np.empty(0, dtype=np.uint64)
        out_starts = np.concatenate([[0], np.cumsum(n_sh)[:-1]]).astype(np.int64)
        is_short = (counts > 0) & (counts < k)
        slot_mask = np.ones(total, dtype=bool)
        short_slots = out_starts[is_short]
        slot_mask[short_slots] = False
        out[slot_mask] = long_windows
        if is_short.any():
            tok_starts = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
            with np.errstate(over="ignore"):
                for d in np.flatnonzero(is_short).tolist():
                    s, c = tok_starts[d], counts[d]
                    acc1 = np.zeros(1, dtype=np.uint64)
                    for j in range(c):
                        acc1 = acc1 * _POLY_C + th[s + j]
                    out[out_starts[d]] = splitmix64(acc1)[0]
        return out, n_sh

    def _simhash(
        self, all_sh: np.ndarray, offsets: np.ndarray, n_sh: np.ndarray
    ) -> np.ndarray:
        """Vectorized per-doc SimHash over the shingle hashes."""
        n_docs = len(n_sh)
        if len(all_sh) == 0:
            return np.zeros(n_docs, dtype=np.uint64)
        # unpackbits on the little-endian byte view: (n, 64) uint8 in one
        # C pass (a uint64 shift broadcast would materialize 8x the
        # memory and dominates the whole stage).  CHUNKED over shingles:
        # the int32 bit matrix for a full batch is ~0.8 GB of DRAM
        # traffic; per-chunk it stays cache-resident and per-doc counts
        # accumulate across chunk boundaries.
        # bit-major accumulator: reduceat along the LAST axis is the
        # contiguous fast path (~2x over axis=0 on the same data)
        counts_t = np.zeros((64, n_docs), dtype=np.int64)
        N = len(all_sh)
        CHUNK = 65536
        for start in range(0, N, CHUNK):
            end = min(start + CHUNK, N)
            bits = np.unpackbits(
                np.ascontiguousarray(all_sh[start:end]).view(np.uint8).reshape(-1, 8),
                axis=1,
                bitorder="little",
            )
            bits_t = np.ascontiguousarray(bits.T).astype(np.int32)
            lo = max(0, int(np.searchsorted(offsets, start, side="right")) - 1)
            hi = int(np.searchsorted(offsets, end, side="left"))
            local_off = np.maximum(offsets[lo:hi] - start, 0)
            counts_t[:, lo:hi] += np.add.reduceat(bits_t, local_off, axis=1)
        counts = counts_t.T
        counts[n_sh == 0] = 0
        majority = counts * 2 > n_sh[:, None]
        weights = np.uint64(1) << self._bit_shifts
        with np.errstate(over="ignore"):
            return (majority * weights).sum(axis=1, dtype=np.uint64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        th, counts = self._token_hashes(batch["text"])
        all_sh, n_sh = self._shingles(th, counts, self.cfg.shingle_k)
        offsets = np.concatenate([[0], np.cumsum(n_sh)[:-1]]).astype(np.int64)
        sigs = minhash_signatures(all_sh, offsets, self.a, self.b)
        simhashes = self._simhash(all_sh, offsets, n_sh)

        cols: dict[str, pa.Array] = {"url": batch["url"]}
        for passthrough in ("doc_id", "content_sha256", "n_chars", "priority", "lang", "side"):
            if passthrough in batch.column_names:
                cols[passthrough] = batch[passthrough]
        cols["n_shingles"] = pa.array(n_sh, type=pa.int64())
        cols["minhash"] = pa.FixedSizeListArray.from_arrays(
            pa.array(sigs.reshape(-1), type=pa.uint64()), self.cfg.num_perms
        )
        # int64 reinterpret: simhash64 is a groupby key downstream and
        # uint64 keys break Ray's sort-boundary sampling (see lsh.py)
        cols["simhash64"] = pa.array(simhashes.view(np.int64), type=pa.int64())
        return pa.table(cols)


import functools


@functools.lru_cache(maxsize=8)
def _worker_hasher(cfg: DedupConfig) -> MinHasher:
    """Per-WORKER-PROCESS singleton (DedupConfig is frozen/hashable).

    Ray worker processes persist across tasks within a session, so the
    MinHasher state (permutations + token cache) is built once per
    worker and reused by every task that lands there — the same
    amortization an actor pool gives, without the pool's spawn-up
    latency cliff (measured: the (1, N) autoscaling pool plateaued at
    ~10 actors on a 32-cpu node, capping the most CPU-bound stage).
    """
    return MinHasher(cfg)


def _minhash_batch(batch: pa.Table, cfg: DedupConfig) -> pa.Table:
    return _worker_hasher(cfg)(batch)


def minhash_signatures_stage(
    ds: ray.data.Dataset,
    cfg: DedupConfig,
    *,
    concurrency: int | None = None,
    use_actor_pool: bool = False,
) -> ray.data.Dataset:
    """hashed -> signatures.  Drops ``text`` (signatures are ~1KB/doc;
    text never travels past this stage on the near-dup path).

    Default execution: stateless TASKS with a per-worker MinHasher
    singleton (see _worker_hasher).  ``use_actor_pool=True`` switches
    to an explicit actor pool — the right mode when per-worker state is
    genuinely expensive (a model, a big vocabulary) or must be bounded
    to specific resources."""
    from dedup_ray.core import schema_names

    names = schema_names(ds)
    if "url" not in names:
        # zero-row corpus: every block upstream came out schema-less.
        # Emit the canonical empty signature table so downstream stages
        # (banding, verify, assignment) see their expected columns.
        return ray.data.from_arrow(
            pa.table(
                {
                    "url": pa.array([], type=pa.string()),
                    "n_shingles": pa.array([], type=pa.int64()),
                    "minhash": pa.array(
                        [], type=pa.list_(pa.uint64(), cfg.num_perms)
                    ),
                    "simhash64": pa.array([], type=pa.int64()),
                }
            )
        )
    keep = [
        c
        for c in ("url", "doc_id", "text", "content_sha256", "n_chars", "priority", "lang", "side")
        if c in names
    ]
    slim = ds.select_columns(keep)
    if use_actor_pool:
        return slim.map_batches(
            MinHasher,
            fn_constructor_args=(cfg,),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=cfg.batch_size,
            concurrency=(1, concurrency or default_pool_size()),
            num_cpus=1,
        )
    return slim.map_batches(
        _minhash_batch,
        fn_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=cfg.batch_size,
    )
