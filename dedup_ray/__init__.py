"""dedup_ray — a Ray-Data-native near-duplicate detection & clustering engine.

A brand-new engine (NOT a port) with the data-processing capabilities of
the reference tool ``boblaublaw/dedup`` (content-hash duplicate grouping
with deterministic winner selection), re-expressed as a web-scale batch
job over Parquet tables of Common-Crawl-style pages
``(url, warc_ts, html, text, lang)`` per ``BASELINE.json``.

Layer map (see SURVEY.md §2):
  - exact layer:   SHA-256 content hash -> groupby -> deterministic winner
  - near layer:    k-shingle MinHash (128 perms) -> banded LSH -> verify
  - substring:     winnowing fingerprints -> anchor buckets -> extend/verify
  - clustering:    union-find connected components (tree reduce)
  - output:        assignments table (url, cluster_id, is_canonical, kind)

Library code NEVER calls ray.init()/ray.shutdown(); only bench.py, CLI
entry points and the pytest session fixture own a Ray session.
"""

from dedup_ray.config import DedupConfig

__all__ = ["DedupConfig"]
__version__ = "0.1.0"
