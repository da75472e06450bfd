"""Exact-layer dedup queries over the driver's ``documents`` table —
the reference tool's core semantics (A3+A6+A7+A10+A11) as
oracle-checkable pipelines.  Each takes ``sf_dir``; the matching DuckDB
SQL lives next to it (the driver compares row count + schema +
order-insensitive value hash)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count

from dedup_ray.sources.pages import documents_as_pages
from dedup_ray.stages.exact import dup_stats, exact_dedup_groups, topk_largest_groups
from dedup_ray.stages.hashing import add_content_sha256


def _hashed_documents(sf_dir: str) -> ray.data.Dataset:
    return add_content_sha256(documents_as_pages(sf_dir))


def exact_dedup(sf_dir: str) -> ray.data.Dataset:
    """Winner/loser verdict per document — ref A6+A7: group by SHA-256,
    exactly one canonical row per group by min (priority, url)."""
    out = exact_dedup_groups(_hashed_documents(sf_dir))
    return out.map_batches(
        lambda t: pa.table(
            {
                "url": t["url"],
                "content_sha256": t["content_sha256"],
                "is_canonical": t["is_canonical"],
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


EXACT_DEDUP_SQL = """
SELECT cast(doc_id AS varchar)                                   AS url,
       sha256(coalesce(text, ''))                                              AS content_sha256,
       (row_number() OVER (PARTITION BY sha256(coalesce(text, ''))
                           ORDER BY cast(doc_id AS varchar)) = 1) AS is_canonical
FROM documents
"""


def exact_dup_stats(sf_dir: str) -> ray.data.Dataset:
    """Global stats (ref A11): pages, distinct hashes, dup pages,
    reclaimable chars."""
    return dup_stats(exact_dedup_groups(_hashed_documents(sf_dir)))


EXACT_DUP_STATS_SQL = """
WITH h AS (
  SELECT cast(doc_id AS varchar) AS url, sha256(coalesce(text, '')) AS sha,
         length(coalesce(text, '')) AS n_chars
  FROM documents
), w AS (
  SELECT *, row_number() OVER (PARTITION BY sha ORDER BY url) AS rn FROM h
)
SELECT cast(count(*) AS bigint)                                  AS n_pages,
       cast(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS bigint)   AS n_distinct_hashes,
       cast(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS bigint)   AS n_dup_pages,
       cast(sum(CASE WHEN rn > 1 THEN n_chars ELSE 0 END) AS bigint) AS reclaimable_chars
FROM w
"""


def count_by_lang(sf_dir: str) -> ray.data.Dataset:
    """Grouped count per language (ref A11 breakdown; SURVEY B18)."""
    ds = documents_as_pages(sf_dir)
    agg = ds.groupby("lang").aggregate(Count(alias_name="n"))
    return agg.map_batches(
        lambda t: pa.table({"lang": t["lang"], "n": pc.cast(t["n"], pa.int64())}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


COUNT_BY_LANG_SQL = "SELECT lang, count(*) AS n FROM documents GROUP BY lang"


def topk_largest_clusters(sf_dir: str) -> ray.data.Dataset:
    """Top-10 exact-hash groups by size (SURVEY B19), deterministic."""
    out = topk_largest_groups(_hashed_documents(sf_dir), k=10)
    return out.map_batches(
        lambda t: pa.table(
            {"content_sha256": t["content_sha256"], "n": pc.cast(t["n"], pa.int64())}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


TOPK_LARGEST_CLUSTERS_SQL = """
SELECT sha256(coalesce(text, '')) AS content_sha256, count(*) AS n
FROM documents
GROUP BY sha256(coalesce(text, ''))
ORDER BY n DESC, content_sha256
LIMIT 10
"""
