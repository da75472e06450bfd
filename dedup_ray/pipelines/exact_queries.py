"""Exact-layer dedup queries over the driver's ``documents`` table —
the reference tool's core semantics (A3+A6+A7+A10+A11) as
oracle-checkable pipelines.  Each takes ``sf_dir``; the matching DuckDB
SQL lives next to it (the driver compares row count + schema +
order-insensitive value hash)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from dedup_ray.config import DEFAULT_CONFIG
from dedup_ray.sources.pages import documents_as_pages
from dedup_ray.stages.exact import dup_stats, exact_dedup_groups, topk_largest_groups
from dedup_ray.stages.hashing import add_content_sha256


def _hashed_documents(sf_dir: str) -> ray.data.Dataset:
    return add_content_sha256(documents_as_pages(sf_dir))


_EXACT_DEDUP_EMPTY = pa.table(
    {
        "url": pa.array([], pa.string()),
        "content_sha256": pa.array([], pa.string()),
        "is_canonical": pa.array([], pa.bool_()),
    }
)


def _documents_empty(sf_dir: str) -> bool:
    from dedup_ray.core import parquet_num_rows

    return parquet_num_rows(f"{sf_dir}/documents.parquet") == 0


def exact_dedup(sf_dir: str) -> ray.data.Dataset:
    """Winner/loser verdict per document — ref A6+A7: group by SHA-256,
    exactly one canonical row per group by min (priority, url)."""
    if _documents_empty(sf_dir):
        # 0-row blocks bypass the final projection map and would strip
        # the typed-empty schema the exchange preserved
        return ray.data.from_arrow(_EXACT_DEDUP_EMPTY)
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
       cast(coalesce(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END), 0) AS bigint)   AS n_distinct_hashes,
       cast(coalesce(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END), 0) AS bigint)   AS n_dup_pages,
       cast(coalesce(sum(CASE WHEN rn > 1 THEN n_chars ELSE 0 END), 0) AS bigint) AS reclaimable_chars
-- the coalesce states the empty-corpus semantics: a stats report over
-- zero pages is all-zero counts, not NULLs (SQL sum over no rows)
FROM w
"""


def count_by_lang(sf_dir: str) -> ray.data.Dataset:
    """Grouped count per language (ref A11 breakdown; SURVEY B18):
    per-batch group_by partials, tiny global combine in one typed
    block (|langs| x block-count rows — no sort shuffle over docs)."""
    from dedup_ray.core import global_kernel

    ds = documents_as_pages(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("lang").aggregate([([], "count_all")])
        return pa.table(
            {"lang": g["lang"], "n_part": pc.cast(g["count_all"], pa.int64())}
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    empty = pa.table({"lang": pa.array([], pa.string()), "n": pa.array([], pa.int64())})

    def combine(g: pa.Table) -> pa.Table:
        m = g.group_by("lang").aggregate([("n_part", "sum")])
        return pa.table({"lang": m["lang"], "n": pc.cast(m["n_part_sum"], pa.int64())})

    return global_kernel(partials, combine, empty_result=empty)


COUNT_BY_LANG_SQL = "SELECT lang, count(*) AS n FROM documents GROUP BY lang"


def topk_largest_clusters(sf_dir: str) -> ray.data.Dataset:
    """Top-10 exact-hash groups by size (SURVEY B19), deterministic."""
    if _documents_empty(sf_dir):
        return ray.data.from_arrow(
            pa.table(
                {
                    "content_sha256": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        )
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


# ---- incremental dedup against an existing corpus -------------------------


def incremental_exact_dedup(sf_dir: str) -> ray.data.Dataset:
    """Dedup a NEW shard against an already-ingested corpus — the
    web-scale analog of the reference's persistent hash cache (A5,
    ``HashDbObj``): a recrawl must not re-admit content the corpus
    already holds, and must still dedupe within itself.

    Scenario (deterministic, mirrored exactly in SQL): the base corpus
    is every source except ``src1``; the incoming batch is
      - the fresh ``src1`` shard                      -> 'new'
      - a recrawl of ``src0`` (urls 'recrawl-…')      -> 'dup_of_base'
      - a second copy of ``src1`` (urls 'second-…')   -> 'dup_in_batch'
        (its first copy, with the smaller url, stays 'new')

    Scale shape: NO broadcast of the base hash set (at 10^12 docs it
    is not broadcastable) — base sha rows and new-batch rows ride ONE
    sha-keyed hash exchange (the same semi-join shape as the flagship
    verify stages), and the verdict kernel is a single vectorized
    segment sweep per partition.  Per new row the verdict is:
    sha seen in base -> 'dup_of_base'; else the min-url new row of the
    sha group -> 'new', the rest -> 'dup_in_batch'."""
    import hashlib

    import numpy as np

    from dedup_ray.core import partitioned_kernel

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )

    def tall(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        sha = hashlib.sha256
        hexes = np.empty(len(texts), dtype="<U64")
        keys = np.empty(len(texts), dtype=np.int64)
        for i, x in enumerate(texts):
            d = sha((x or "").encode("utf-8")).digest()
            hexes[i] = d.hex()
            keys[i] = int.from_bytes(d[:8], "little", signed=True)
        src = np.array(t["source"].to_pylist(), dtype=object)
        urls = pc.cast(t["doc_id"], pa.string()).to_pylist()
        is_base = src != "src1"
        is_s0 = src == "src0"
        is_s1 = ~is_base
        out_key, out_hex, out_slot, out_url = [], [], [], []

        def emit(mask: np.ndarray, slot: int, prefix: str) -> None:
            idx = np.flatnonzero(mask)
            out_key.append(keys[idx])
            out_hex.append(hexes[idx])
            out_slot.append(np.full(len(idx), slot, dtype=np.int32))
            out_url.extend(
                prefix + urls[i] if slot == 1 else "" for i in idx.tolist()
            )

        emit(is_base, 0, "")
        emit(is_s1, 1, "")
        emit(is_s0, 1, "recrawl-")
        emit(is_s1, 1, "second-")
        return pa.table(
            {
                "sha_key": pa.array(np.concatenate(out_key), pa.int64()),
                "content_sha256": pa.array(np.concatenate(out_hex), pa.string()),
                "slot": pa.array(np.concatenate(out_slot), pa.int32()),
                "url": pa.array(out_url, pa.string()),
            }
        )

    empty = pa.table(
        {"url": pa.array([], pa.string()), "verdict": pa.array([], pa.string())}
    )

    def kernel(g: pa.Table) -> pa.Table:
        shas = np.asarray(g["content_sha256"].to_pylist(), dtype="<U64")
        slots = g["slot"].to_numpy(zero_copy_only=False)
        urls = np.asarray(g["url"].to_pylist(), dtype=object)
        order = np.lexsort((urls, slots, shas))
        sh, sl = shas[order], slots[order]
        n = len(sh)
        firsts = np.ones(n, dtype=bool)
        firsts[1:] = sh[1:] != sh[:-1]
        seg_id = np.cumsum(firsts) - 1
        starts = np.flatnonzero(firsts)
        has_base = sl[starts] == 0  # base rows sort before new rows
        is_new = sl == 1
        # first NEW row per segment (min url: slot+url sorted)
        first_new = is_new.copy()
        first_new[1:] &= ~is_new[:-1] | (seg_id[1:] != seg_id[:-1])
        base_hit = has_base[seg_id]
        verdict = np.where(
            base_hit, "dup_of_base", np.where(first_new, "new", "dup_in_batch")
        )
        keep = np.flatnonzero(is_new)
        if len(keep) == 0:
            return empty
        return pa.table(
            {
                "url": pa.array(urls[order][keep].tolist(), pa.string()),
                "verdict": pa.array(verdict[keep], pa.string()),
            }
        )

    tall_ds = ds.map_batches(tall, batch_format="pyarrow", zero_copy_batch=True)
    return partitioned_kernel(
        tall_ds,
        lambda t: t["sha_key"].to_numpy(zero_copy_only=False).view(np.uint64),
        kernel,
        num_partitions=DEFAULT_CONFIG.num_partitions,
        empty_result=empty,
    )


INCREMENTAL_EXACT_DEDUP_SQL = """
WITH newd AS (
  SELECT cast(doc_id AS varchar) AS url,
         sha256(coalesce(text, '')) AS h
  FROM documents WHERE source = 'src1'
  UNION ALL
  SELECT 'recrawl-' || cast(doc_id AS varchar),
         sha256(coalesce(text, ''))
  FROM documents WHERE source = 'src0'
  UNION ALL
  SELECT 'second-' || cast(doc_id AS varchar),
         sha256(coalesce(text, ''))
  FROM documents WHERE source = 'src1'
), base AS (
  SELECT DISTINCT sha256(coalesce(text, '')) AS h
  FROM documents WHERE source <> 'src1'
)
SELECT url,
       CASE WHEN h IN (SELECT h FROM base)         THEN 'dup_of_base'
            WHEN url <> min(url) OVER (PARTITION BY h) THEN 'dup_in_batch'
            ELSE 'new' END AS verdict
FROM newd
"""


# ---- corpus length distribution --------------------------------------------


#: histogram bucket width in chars — single source of truth for BOTH
#: the Ray kernel and LENGTH_HISTOGRAM_SQL (ADVICE r03: a caller-passed
#: width that the SQL didn't see silently broke oracle parity)
LENGTH_BUCKET_WIDTH = 100


def length_histogram(
    sf_dir: str, bucket_width: int = LENGTH_BUCKET_WIDTH
) -> ray.data.Dataset:
    """Document-length histogram (fixed-width char buckets) — the
    corpus-profiling step that sizes length filters before a training
    run.  Scale shape: per-batch partials (one row per occupied bucket
    per block), then a tiny global groupby — raw rows never reach the
    exchange.  NOTE: LENGTH_HISTOGRAM_SQL is generated from
    LENGTH_BUCKET_WIDTH; a non-default ``bucket_width`` is fine for ad
    hoc use but is NOT what the registered oracle checks."""
    import numpy as np

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["n_chars"]
    )

    def partial(t: pa.Table) -> pa.Table:
        col = t["n_chars"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        # null n_chars forms SQL's single NULL bucket (count(*) rows,
        # NULL sum/min/max) — without the mask the int64-with-null
        # column NaN-degrades and NaN // width is platform-UB garbage
        # (the repo's documented nullable-int trap; caught by the
        # control-chars sweep's nulled n_chars)
        n_null = 0
        if col.null_count:
            n_null = col.null_count
            nulls = pc.is_null(col).to_numpy(zero_copy_only=False)
            nc = col.to_numpy(zero_copy_only=False)[~nulls].astype(np.int64)
        else:
            nc = col.to_numpy(zero_copy_only=False).astype(np.int64)
        b = nc // bucket_width
        ub, inv = np.unique(b, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        tot = np.zeros(len(ub), dtype=np.int64)
        np.add.at(tot, inv, nc)
        mn = np.full(len(ub), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(mn, inv, nc)
        mx = np.full(len(ub), np.iinfo(np.int64).min, np.int64)
        np.maximum.at(mx, inv, nc)
        out = pa.table(
            {
                "bucket": pa.array(ub, pa.int64()),
                "n_docs": pa.array(n, pa.int64()),
                "total_chars": pa.array(tot, pa.int64()),
                "min_chars": pa.array(mn, pa.int64()),
                "max_chars": pa.array(mx, pa.int64()),
            }
        )
        if n_null:
            null_row = pa.table(
                {
                    "bucket": pa.array([None], pa.int64()),
                    "n_docs": pa.array([n_null], pa.int64()),
                    "total_chars": pa.array([None], pa.int64()),
                    "min_chars": pa.array([None], pa.int64()),
                    "max_chars": pa.array([None], pa.int64()),
                }
            )
            out = pa.concat_tables([out, null_row])
        return out

    from dedup_ray.core import global_kernel

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    empty = pa.table(
        {
            "bucket": pa.array([], pa.int64()),
            "n_docs": pa.array([], pa.int64()),
            "total_chars": pa.array([], pa.int64()),
            "min_chars": pa.array([], pa.int64()),
            "max_chars": pa.array([], pa.int64()),
        }
    )

    def combine(g: pa.Table) -> pa.Table:
        m = g.group_by("bucket").aggregate(
            [
                ("n_docs", "sum"),
                ("total_chars", "sum"),
                ("min_chars", "min"),
                ("max_chars", "max"),
            ]
        )
        return pa.table(
            {
                "bucket": pc.cast(m["bucket"], pa.int64()),
                "n_docs": pc.cast(m["n_docs_sum"], pa.int64()),
                "total_chars": pc.cast(m["total_chars_sum"], pa.int64()),
                "min_chars": pc.cast(m["min_chars_min"], pa.int64()),
                "max_chars": pc.cast(m["max_chars_max"], pa.int64()),
            }
        )

    return global_kernel(partials, combine, empty_result=empty)


LENGTH_HISTOGRAM_SQL = f"""
SELECT cast(n_chars // {LENGTH_BUCKET_WIDTH} AS bigint)  AS bucket,
       cast(count(*) AS bigint)        AS n_docs,
       cast(sum(n_chars) AS bigint)    AS total_chars,
       cast(min(n_chars) AS bigint)    AS min_chars,
       cast(max(n_chars) AS bigint)    AS max_chars
FROM documents
GROUP BY 1
"""


# ---- dup-rate health metric per source -------------------------------------


def dedup_rate_by_source(sf_dir: str) -> ray.data.Dataset:
    """Exact-duplicate rate per source shard — the pipeline-health
    metric a crawl operator watches (which feeds are mostly mirrors?).

    Scale shape: the per-source aggregate is FUSED into the sha
    exchange — the winner-selection kernel emits (source, n_docs,
    n_dup_docs) partials directly, so the only shuffle is the one the
    dedup itself already needs, and the global groupby moves a handful
    of rows per partition."""
    import numpy as np

    from dedup_ray.core import partitioned_kernel

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )

    def to_pages(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": pc.cast(t["doc_id"], pa.string()),
                "text": t["text"],
                "source": t["source"],
                "priority": pa.array([0] * len(t), pa.int64()),
            }
        )

    # slim the exchange rows: the kernel reads only sha/url/source —
    # without the select the full document text (the dominant byte
    # volume) would ride the hash exchange untouched
    hashed = add_content_sha256(
        ds.map_batches(to_pages, batch_format="pyarrow", zero_copy_batch=True)
    ).select_columns(["url", "source", "content_sha256", "sha_u64"])

    empty = pa.table(
        {
            "source": pa.array([], pa.string()),
            "n_part": pa.array([], pa.int64()),
            "dup_part": pa.array([], pa.int64()),
        }
    )

    def kernel(g: pa.Table) -> pa.Table:
        # winner = min url per sha.  ``to_pages`` above pins priority=0
        # for every row, so url order IS the full winner rule here and
        # matches DEDUP_RATE_BY_SOURCE_SQL's ORDER BY doc_id exactly
        # (ADVICE r03: a nonzero-priority pages source would need the
        # (priority, url) rule AND a priority-aware oracle)
        shas = np.array(g["content_sha256"].to_pylist(), dtype=object)
        urls = np.array(g["url"].to_pylist(), dtype=object)
        _, inv = np.unique(shas, return_inverse=True)
        order = np.lexsort((urls, inv))
        is_dup_sorted = np.ones(len(g), dtype=bool)
        first = np.ones(len(g), dtype=bool)
        first[1:] = inv[order][1:] != inv[order][:-1]
        is_dup_sorted[first] = False
        is_dup = np.empty(len(g), dtype=bool)
        is_dup[order] = is_dup_sorted
        src = np.array(g["source"].to_pylist(), dtype=object)
        usrc, sinv = np.unique(src, return_inverse=True)
        n = np.bincount(sinv).astype(np.int64)
        d = np.bincount(sinv, weights=is_dup).astype(np.int64)
        return pa.table(
            {
                "source": pa.array(usrc.tolist(), pa.string()),
                "n_part": pa.array(n, pa.int64()),
                "dup_part": pa.array(d, pa.int64()),
            }
        )

    from dedup_ray.config import DEFAULT_CONFIG

    partials = partitioned_kernel(
        hashed,
        lambda t: t["sha_u64"].to_numpy(zero_copy_only=False).view(np.uint64),
        kernel,
        num_partitions=DEFAULT_CONFIG.num_partitions,
        empty_result=empty,
    )
    from dedup_ray.core import global_kernel

    out_empty = pa.table(
        {
            "source": pa.array([], pa.string()),
            "n_docs": pa.array([], pa.int64()),
            "n_dup_docs": pa.array([], pa.int64()),
            "dup_rate": pa.array([], pa.float64()),
        }
    )

    def combine(g: pa.Table) -> pa.Table:
        from dedup_ray.functions.scalar import sql_round

        m = g.group_by("source").aggregate([("n_part", "sum"), ("dup_part", "sum")])
        n = pc.cast(m["n_part_sum"], pa.int64())
        d = pc.cast(m["dup_part_sum"], pa.int64())
        rate = pc.divide(pc.cast(d, pa.float64()), pc.cast(n, pa.float64()))
        return pa.table(
            {
                "source": m["source"],
                "n_docs": n,
                "n_dup_docs": d,
                "dup_rate": sql_round(rate, 4),
            }
        )

    return global_kernel(partials, combine, empty_result=out_empty)


DEDUP_RATE_BY_SOURCE_SQL = """
WITH w AS (
  SELECT source,
         (row_number() OVER (PARTITION BY sha256(coalesce(text, ''))
                             ORDER BY cast(doc_id AS varchar)) > 1) AS is_dup
  FROM documents
)
SELECT source,
       cast(count(*) AS bigint)                                AS n_docs,
       cast(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS bigint) AS n_dup_docs,
       round(sum(CASE WHEN is_dup THEN 1 ELSE 0 END)
             / cast(count(*) AS double), 4)                    AS dup_rate
FROM w
GROUP BY source
"""
