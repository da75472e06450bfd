"""Benchmark decontamination — flag corpus documents that share any
k-token n-gram with a (small) benchmark/eval set, the standard
training-data hygiene pass (the n-gram-overlap rule used by public
LM training pipelines).

Scale shape: the benchmark side is SMALL by definition (eval sets are
thousands of docs, the corpus is 10^12) — its unique shingle-hash set
is built once, broadcast via ``ray.put``, and every corpus batch
probes it with one sorted ``searchsorted`` pass inside ``map_batches``.
ONE streaming pass over the corpus, zero shuffles, nothing unbounded
on the driver (a loud gate rejects a benchmark too large to
broadcast).  Shingling reuses the engine's one token/shingle
definition (stages/minhash.MinHasher -> util.TokenHasher /
polynomial windows), so "shares an n-gram" means exactly what the
near-dup layer means by it.
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa
import ray
import ray.data

from dedup_ray.config import DEFAULT_CONFIG, DedupConfig

#: loud ceiling on the broadcast benchmark shingle set (8 B each ->
#: ~800 MB at the cap, far past any real eval suite; a "benchmark"
#: bigger than this is a corpus and needs the near-dup pipeline)
BENCHMARK_MAX_SHINGLES = 100_000_000

_VERDICTS_EMPTY = pa.table(
    {
        "url": pa.array([], type=pa.string()),
        "contaminated": pa.array([], type=pa.bool_()),
        "n_hits": pa.array([], type=pa.int64()),
        "n_shingles": pa.array([], type=pa.int64()),
    }
)


def _doc_shingles(texts, cfg: DedupConfig) -> tuple[np.ndarray, np.ndarray]:
    """(flat shingle hashes doc-major, shingles-per-doc) for a batch of
    texts, via the per-worker MinHasher singleton (the ONE shingle
    definition repo-wide; docs shorter than k tokens get a single
    whole-doc shingle, so tiny docs still participate)."""
    from dedup_ray.stages.minhash import _worker_hasher

    h = _worker_hasher(cfg)
    th, counts = h._token_hashes(texts)
    return h._shingles(th, counts, cfg.shingle_k)


def benchmark_shingle_set(
    benchmark: ray.data.Dataset, cfg: DedupConfig, *, text_col: str = "text"
) -> np.ndarray:
    """Sorted unique shingle-hash array of the benchmark set.  Streams
    batch partials to the driver (each batch is reduced to its unique
    hashes first) and fails loudly past ``BENCHMARK_MAX_SHINGLES``."""
    parts: list[np.ndarray] = []
    total = 0
    for b in benchmark.iter_batches(batch_format="pyarrow", batch_size=4096):
        if text_col not in b.column_names or len(b) == 0:
            continue
        sh, _ = _doc_shingles(b[text_col], cfg)
        u = np.unique(sh)
        total += len(u)
        if total > BENCHMARK_MAX_SHINGLES:
            raise ValueError(
                f"benchmark shingle set exceeds {BENCHMARK_MAX_SHINGLES:,} "
                "hashes — that is a corpus, not an eval set; dedup it "
                "against the corpus with the near-dup pipeline instead"
            )
        parts.append(u)
    if not parts:
        return np.empty(0, dtype=np.uint64)
    return np.unique(np.concatenate(parts))


@functools.lru_cache(maxsize=8)
def _worker_bench(ref) -> np.ndarray:
    """Per-worker singleton keyed on the broadcast ObjectRef."""
    return ray.get(ref)


def _flag_batch(t: pa.Table, bench_ref, cfg: DedupConfig, url_col: str, text_col: str):
    if url_col not in t.column_names or len(t) == 0:
        return _VERDICTS_EMPTY
    bench = _worker_bench(bench_ref)
    sh, n_sh = _doc_shingles(t[text_col], cfg)
    if len(bench) and len(sh):
        pos = np.minimum(np.searchsorted(bench, sh), len(bench) - 1)
        hit = (bench[pos] == sh).astype(np.int64)
    else:
        hit = np.zeros(len(sh), dtype=np.int64)
    # per-doc hit counts via cumsum differences (reduceat mishandles
    # zero-length segments: it returns the element AT the start index)
    starts = np.concatenate([[0], np.cumsum(n_sh)[:-1]]).astype(np.int64)
    cs = np.concatenate([[0], np.cumsum(hit)])
    n_hits = cs[starts + n_sh] - cs[starts]
    return pa.table(
        {
            "url": t[url_col],
            "contaminated": pa.array(n_hits > 0),
            "n_hits": pa.array(n_hits, type=pa.int64()),
            "n_shingles": pa.array(n_sh, type=pa.int64()),
        }
    )


def decontaminate(
    docs: ray.data.Dataset,
    benchmark: ray.data.Dataset,
    cfg: DedupConfig = DEFAULT_CONFIG,
    *,
    url_col: str = "url",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Per corpus doc: (url, contaminated, n_hits, n_shingles) —
    contaminated iff the doc shares >= 1 k-token shingle with any
    benchmark doc (k = ``cfg.shingle_k``)."""
    bench_ref = ray.put(benchmark_shingle_set(benchmark, cfg, text_col=text_col))
    return docs.map_batches(
        _flag_batch,
        fn_kwargs={
            "bench_ref": bench_ref,
            "cfg": cfg,
            "url_col": url_col,
            "text_col": text_col,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def decontaminate_docs(sf_dir: str) -> ray.data.Dataset:
    """Driver query: treat the ``src2`` shard of ``documents`` as the
    benchmark/eval set and flag every OTHER document that shares a
    k-token n-gram with it.  Deterministic; rows-only + content
    anchor (n-gram overlap is not SQL-expressible at DuckDB's level)."""
    import pyarrow.compute as pc

    from dedup_ray.core import parquet_num_rows

    if parquet_num_rows(f"{sf_dir}/documents.parquet") == 0:
        return ray.data.from_arrow(_VERDICTS_EMPTY)
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )

    def to_pages(mask_src2: bool):
        def f(t: pa.Table) -> pa.Table:
            if len(t) == 0 or "doc_id" not in t.column_names:
                return pa.table(
                    {
                        "url": pa.array([], pa.string()),
                        "text": pa.array([], pa.string()),
                    }
                )
            is2 = pc.fill_null(pc.equal(t["source"], "src2"), False)
            keep = is2 if mask_src2 else pc.invert(is2)
            return pa.table(
                {
                    "url": pc.cast(t["doc_id"], pa.string()).filter(keep),
                    "text": pc.fill_null(t["text"], "").filter(keep),
                }
            )

        return f

    bench = docs.map_batches(to_pages(True), batch_format="pyarrow", zero_copy_batch=True)
    corpus = docs.map_batches(to_pages(False), batch_format="pyarrow", zero_copy_batch=True)
    return decontaminate(corpus, bench, DEFAULT_CONFIG)
