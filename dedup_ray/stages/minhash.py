"""MinHash signature stage (SURVEY.md §2B B7) — k-shingles + 128-perm
MinHash as a stateful ACTOR-POOL map_batches stage.

Actor-pool pattern (BASELINE.json:15): permutation parameters and the
token-hash cache are built ONCE per worker in ``__init__`` from the
config seed; ``__call__`` does the per-batch vectorized work.  The
signature math is fully vectorized: one ``np.minimum.reduceat`` pass
per permutation over the batch's concatenated shingle hashes — no
per-document Python loop in the reduction.

Also provides SimHash (64-bit) as the alternative signature named in
the north rule, computed from the same shingle hashes for free.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import ray.data

from dedup_ray.config import DedupConfig
from dedup_ray.util import TokenHasher, minhash_perms, minhash_signatures, shingle_hashes

_TOKEN_RE = re.compile(r"\w+", re.UNICODE)


def tokenize(text: str, normalize: bool = True) -> list[str]:
    if normalize:
        text = text.lower()
    return _TOKEN_RE.findall(text)


class MinHasher:
    """Callable class for ``map_batches(MinHasher, concurrency=N,
    fn_constructor_args=(cfg,))``.

    Output columns: url, n_shingles, minhash (list<uint64>[num_perms]),
    simhash64 (uint64); passthrough: content_sha256, n_chars, priority
    when present.
    """

    def __init__(self, cfg: DedupConfig) -> None:
        self.cfg = cfg
        self.hasher = TokenHasher(seed=cfg.seed)
        self.a, self.b = minhash_perms(cfg.num_perms, cfg.seed + 1)
        # per-bit weight vector for simhash: bit j of shingle hash
        self._bits = np.uint64(1) << np.arange(64, dtype=np.uint64)

    def _shingles(self, text: str) -> np.ndarray:
        toks = tokenize(text or "", self.cfg.normalize)
        th = self.hasher.hash_tokens(toks)
        return shingle_hashes(th, self.cfg.shingle_k)

    def _simhash(self, sh: np.ndarray) -> int:
        if len(sh) == 0:
            return 0
        # vectorized popcount-style accumulation: for each of 64 bits,
        # count shingles with the bit set; bit set in result iff count
        # exceeds half
        counts = np.zeros(64, dtype=np.int64)
        for j in range(64):
            counts[j] = int(((sh >> np.uint64(j)) & np.uint64(1)).sum())
        bits = counts * 2 > len(sh)
        return int(self._bits[bits].sum(dtype=np.uint64))

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        per_doc = [self._shingles(t) for t in texts]
        offsets = np.zeros(len(per_doc), dtype=np.int64)
        lengths = np.array([len(s) for s in per_doc], dtype=np.int64)
        if len(per_doc):
            offsets[1:] = np.cumsum(lengths)[:-1]
        all_sh = (
            np.concatenate(per_doc) if per_doc else np.empty(0, dtype=np.uint64)
        )
        sigs = minhash_signatures(all_sh, offsets, self.a, self.b)
        simhashes = np.array([self._simhash(s) for s in per_doc], dtype=np.uint64)

        cols: dict[str, pa.Array] = {"url": batch["url"]}
        for passthrough in ("content_sha256", "n_chars", "priority", "lang"):
            if passthrough in batch.column_names:
                cols[passthrough] = batch[passthrough]
        cols["n_shingles"] = pa.array(lengths, type=pa.int64())
        cols["minhash"] = pa.FixedSizeListArray.from_arrays(
            pa.array(sigs.reshape(-1), type=pa.uint64()), self.cfg.num_perms
        )
        # int64 reinterpret: simhash64 is a groupby key downstream and
        # uint64 keys break Ray's sort-boundary sampling (see lsh.py)
        cols["simhash64"] = pa.array(simhashes.view(np.int64), type=pa.int64())
        return pa.table(cols)


def minhash_signatures_stage(
    ds: ray.data.Dataset, cfg: DedupConfig, *, concurrency: int | None = None
) -> ray.data.Dataset:
    """hashed -> signatures.  Drops ``text`` (signatures are ~1KB/doc;
    text never travels past this stage on the near-dup path)."""
    keep = [
        c
        for c in ("url", "text", "content_sha256", "n_chars", "priority", "lang")
        if c in ds.schema().names
    ]
    return ds.select_columns(keep).map_batches(
        MinHasher,
        fn_constructor_args=(cfg,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=cfg.batch_size,
        # autoscaling pool: min 1 so small runs / small test sessions
        # never wait on actors that can't get a CPU, max sized to the
        # node for throughput runs
        concurrency=(1, concurrency or cfg.minhash_concurrency),
        num_cpus=1,
    )
