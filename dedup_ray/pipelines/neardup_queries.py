"""Near-dup / sketch / text-analysis queries over the driver tables —
the non-SQL-expressible layer (driver records rows-only checks; full
semantics are pytest-verified against the brute-force oracle in
tests/test_recall.py and tests/test_winnow.py).

Each callable takes sf_dir and returns a Dataset / pyarrow Table.
Everything is seeded and deterministic — rows-only checks still
require stable row counts across runs.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from dedup_ray.config import DEFAULT_CONFIG
from dedup_ray.pipelines.flagship import flagship_assignments
from dedup_ray.sources.pages import documents_as_pages
from dedup_ray.stages.exact import exact_members
from dedup_ray.stages.hashing import add_content_sha256
from dedup_ray.stages.lsh import lsh_bands, minhash_edges
from dedup_ray.stages.minhash import minhash_signatures_stage
from dedup_ray.stages.winnow import substring_edges


def _winners(sf_dir: str) -> ray.data.Dataset:
    hashed = add_content_sha256(documents_as_pages(sf_dir))
    members = exact_members(hashed)
    return members.map_batches(
        lambda t: t.filter(t["is_exact_winner"].combine_chunks()),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def minhash_lsh_dedup(sf_dir: str) -> ray.data.Dataset:
    """Full flagship assignments (exact + MinHash/LSH + union-find)."""
    return flagship_assignments(sf_dir, DEFAULT_CONFIG)


def dedup_full(sf_dir: str) -> ray.data.Dataset:
    """Flagship including the substring pass."""
    return flagship_assignments(sf_dir, DEFAULT_CONFIG, substring_pass=True)


def minhash_signatures(sf_dir: str) -> ray.data.Dataset:
    """Signature table: url, n_shingles, simhash64 (minhash itself is a
    list column; project the scalar parts for a stable rows-only
    check)."""
    sigs = minhash_signatures_stage(_winners(sf_dir), DEFAULT_CONFIG)
    return sigs.map_batches(
        lambda t: pa.table(
            {
                "url": t["url"],
                "n_shingles": t["n_shingles"],
                "simhash64": pc.cast(t["simhash64"], pa.string()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def lsh_band_rows(sf_dir: str) -> ray.data.Dataset:
    """Exploded LSH band rows (band_id, band_hash, url)."""
    bands = lsh_bands(minhash_signatures_stage(_winners(sf_dir), DEFAULT_CONFIG), DEFAULT_CONFIG)
    return bands.map_batches(
        lambda t: pa.table(
            {
                "band_id": t["band_id"],
                "band_hash": pc.cast(t["band_hash"], pa.string()),
                "url": t["url"],
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def minhash_edge_list(sf_dir: str) -> ray.data.Dataset:
    """Verified near-dup edges (u, v, kind, score)."""
    sigs = minhash_signatures_stage(_winners(sf_dir), DEFAULT_CONFIG).materialize()
    edges, _ = minhash_edges(sigs, DEFAULT_CONFIG)
    return edges


def substring_edge_list(sf_dir: str) -> ray.data.Dataset:
    """Verified long-shared-substring edges."""
    return substring_edges(_winners(sf_dir), DEFAULT_CONFIG)


def simhash_dedup(sf_dir: str) -> ray.data.Dataset:
    """SimHash near-dup grouping: exact 64-bit simhash match (the
    cheap variant; hamming-ball probing is the banded extension).
    Groups of >= 2 get a cluster labeled by min url."""
    sigs = minhash_signatures_stage(_winners(sf_dir), DEFAULT_CONFIG)

    def label(group: pa.Table) -> pa.Table:
        if "url" not in group.column_names:
            return pa.table(
                {
                    "url": pa.array([], type=pa.string()),
                    "simhash_cluster": pa.array([], type=pa.string()),
                }
            )
        urls = sorted(group["url"].to_pylist())
        return pa.table(
            {
                "url": pa.array(urls, type=pa.string()),
                "simhash_cluster": pa.array([urls[0]] * len(urls), type=pa.string()),
            }
        )

    nonempty = sigs.map_batches(
        lambda t: t.filter(pc.greater(t["n_shingles"], 0)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return nonempty.groupby("simhash64").map_groups(label, batch_format="pyarrow")


QUERIES = {
    "dedup_full": dedup_full,
    "minhash_signatures": minhash_signatures,
    "lsh_band_rows": lsh_band_rows,
    "minhash_edge_list": minhash_edge_list,
    "substring_edge_list": substring_edge_list,
    "simhash_dedup": simhash_dedup,
}

ORACLE_SQL: dict[str, str] = {}
