"""content_sha256 (SURVEY.md §2B B5) — exact content hash.

Reference analog: ``FileObj.hash()`` (lazy chunked MD5 of file bytes,
SURVEY.md §2A A3); upgraded to SHA-256 per BASELINE.json:6.  The hash
is over the UTF-8 bytes of ``text`` — identical to DuckDB's
``sha256(text)`` on the same column, which is what makes the exact
layer SQL-oracle-checkable.

Implementation note: SHA-256 is inherently per-row, so the "vectorized"
rule here means: one zero-copy Arrow batch in, a single Python loop
whose body is one C hashlib call per row (no per-row Arrow scalar
boxing — ``to_pylist`` converts the column once), plus
``pyarrow.compute`` for the char-length column.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from dedup_ray.util import hash_urls_u64


def _sha256_batch(batch: pa.Table) -> pa.Table:
    texts = batch["text"].to_pylist()
    sha = hashlib.sha256
    digests = []
    sha_u64 = []
    for t in texts:
        d = sha((t or "").encode("utf-8")).digest()
        digests.append(d.hex())
        # int64 view of the first 8 digest bytes: the free, stable
        # partition-hash used by downstream groupbys (core.py kernels)
        sha_u64.append(int.from_bytes(d[:8], "little", signed=True))
    n_chars = pc.cast(
        pc.utf8_length(pc.coalesce(batch["text"], pa.scalar("", pa.string()))),
        pa.int64(),
    )
    batch = batch.append_column("content_sha256", pa.array(digests, type=pa.string()))
    batch = batch.append_column("sha_u64", pa.array(sha_u64, type=pa.int64()))
    batch = batch.append_column("n_chars", n_chars)
    if "doc_id" not in batch.column_names:
        # hash urls ONCE here; every downstream stage (bands, verify,
        # union-find, assignment lookup) keys on this int64 instead of
        # re-hashing strings on its hot path
        ids = hash_urls_u64(batch["url"].to_pylist())
        batch = batch.append_column(
            "doc_id", pa.array(ids.view(np.int64), type=pa.int64())
        )
    return batch


def add_content_sha256(ds: ray.data.Dataset) -> ray.data.Dataset:
    """pages -> hashed: append ``content_sha256`` (hex), ``n_chars`` and
    the ingest-computed ``doc_id`` (int64 view of blake2b-64 of url)."""
    return ds.map_batches(_sha256_batch, batch_format="pyarrow", zero_copy_batch=True)
