"""Deterministic synthetic ``pages`` fixture with planted duplicate
structure (FIXTURES.md §1) — the ground-truth corpus for recall
measurement and benchmarking.

Schema exactly per BASELINE.json:15:
    url: string, warc_ts: timestamp[us], html: binary, text: string,
    lang: string
plus a side table ``pages_truth`` (url, true_cluster_id, dup_class)
never read by the pipeline.

Design for parallel generation: the id space is organised in BLOCKS of
100 ids with a fixed class layout, and every row is generated purely
from (seed, id) — a member of a duplicate group re-derives its group
base text from the base id.  So generation is embarrassingly parallel:
tests call ``gen_batch(np.arange(n))`` in-process; the benchmark runs
``ray.data.range(n).map_batches(gen_batch)`` and writes Parquet shards.

Block layout (ids b*100 + offset):
    00-54  unique      fresh text, singleton cluster
    55-69  exact       groups of [2,3,2,3,5]; byte-identical text
    70-84  near        groups of [2,3,2,3,5]; ~1% token edits vs base
                       (k=5 shingle Jaccard lands in ~[0.85, 0.97])
    85-89  substring   5 pages sharing one >=300-char block, unique
                       filler (overall Jaccard << tau)
    90-97  boilerplate ONE GLOBAL 30-token template prefix + unique
                       body — creates the hot LSH bucket the skew path
                       must salt; pages are NOT duplicates
    98-99  empty       text == ""; all empties are mutually exact dups
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

BLOCK = 100
_EXACT_GROUPS = [(55, 2), (57, 3), (60, 2), (62, 3), (65, 5)]
_NEAR_GROUPS = [(70, 2), (72, 3), (75, 2), (77, 3), (80, 5)]
_SS_START, _SS_N = 85, 5
_BP_START, _BP_N = 90, 8
_EMPTY_START = 98

EMPTY_CLUSTER_ID = -2

_LANGS = ["en", "de", "fr", "es"]
_LANG_P = [0.90, 0.04, 0.03, 0.03]


def _rng(seed: int, *parts) -> np.random.Generator:
    key = [seed] + [p if isinstance(p, int) else hash_str(p) for p in parts]
    return np.random.Generator(np.random.PCG64(key))


def hash_str(s: str) -> int:
    """Alias of util.hash_url — ONE definition of the string hash
    (CLAUDE.md: all hashing via dedup_ray/util.py); the value is
    already an unsigned 64-bit int."""
    from dedup_ray.util import hash_url

    return hash_url(s)


def make_vocab(seed: int, size: int = 10_000) -> np.ndarray:
    rng = _rng(seed, "vocab")
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    words = []
    lens = rng.integers(3, 10, size=size)
    for L in lens:
        words.append("".join(letters[rng.integers(0, 26, size=L)]))
    return np.array(words, dtype=object)


class PageGen:
    """Callable batch generator: dict{'id': ndarray} -> pyarrow table
    with pages + truth columns.  Stateless w.r.t. ids (pure function of
    (seed, id)); vocab built once per instance (actor-pool friendly)."""

    def __init__(self, seed: int = 1234, max_tokens: int = 800) -> None:
        self.seed = seed
        self.max_tokens = max_tokens
        self.vocab = make_vocab(seed)
        rng = _rng(seed, "bp")
        # 20 tokens ~= 140 chars: long enough to make a hot LSH shingle
        # bucket, short enough to stay below substring_min_len=200 (a
        # 30-token template would itself be a >=200-char shared
        # substring, contradicting "boilerplate pages are NOT dups")
        self.bp_template = self.vocab[rng.integers(0, len(self.vocab), size=20)]

    # ---- per-id primitives -----------------------------------------
    def _length(self, rng: np.random.Generator) -> int:
        # Zipf-ish: many short docs, few long, in [50, max_tokens]
        L = int(50 * (1.0 + rng.pareto(1.6)))
        return min(max(L, 50), self.max_tokens)

    def _base_tokens(self, base_id: int) -> np.ndarray:
        rng = _rng(self.seed, "txt", int(base_id))
        n = self._length(rng)
        return self.vocab[rng.integers(0, len(self.vocab), size=n)]

    def _shared_block(self, block_idx: int) -> np.ndarray:
        rng = _rng(self.seed, "ss", int(block_idx))
        return self.vocab[rng.integers(0, len(self.vocab), size=60)]

    def _tokens_for(self, i: int) -> tuple[np.ndarray, str, int]:
        """-> (tokens, dup_class, true_cluster_id)"""
        off = i % BLOCK
        block = i // BLOCK
        b0 = block * BLOCK
        if off >= _EMPTY_START:
            return np.empty(0, dtype=object), "empty", EMPTY_CLUSTER_ID
        if off >= _BP_START:
            body = self._base_tokens(i)
            return np.concatenate([self.bp_template, body]), "boilerplate", i
        if off >= _SS_START:
            filler = self._base_tokens(i)
            shared = self._shared_block(block)
            rng = _rng(self.seed, "sspos", i)
            pos = int(rng.integers(0, len(filler) + 1))
            toks = np.concatenate([filler[:pos], shared, filler[pos:]])
            return toks, "substring", b0 + _SS_START
        for start, size in _NEAR_GROUPS:
            if start <= off < start + size:
                base_id = b0 + start
                toks = self._base_tokens(base_id).copy()
                if i != base_id:
                    rng = _rng(self.seed, "edit", i)
                    m = max(1, int(round(0.01 * len(toks))))
                    idx = rng.choice(len(toks), size=min(m, len(toks)), replace=False)
                    toks[idx] = self.vocab[
                        rng.integers(0, len(self.vocab), size=len(idx))
                    ]
                return toks, "near", base_id
        for start, size in _EXACT_GROUPS:
            if start <= off < start + size:
                base_id = b0 + start
                return self._base_tokens(base_id), "exact", base_id
        return self._base_tokens(i), "unique", i

    # ---- batch interface -------------------------------------------
    def __call__(self, batch: dict) -> pa.Table:
        ids = np.asarray(batch["id"], dtype=np.int64)
        urls, texts, htmls, langs, classes, clusters, tss = [], [], [], [], [], [], []
        epoch = np.datetime64("2025-01-01T00:00:00", "us")
        for i in ids.tolist():
            toks, cls, cluster = self._tokens_for(i)
            text = " ".join(toks.tolist())
            site = i % 200
            urls.append(f"https://site{site}.example/p/{i:08d}")
            texts.append(text)
            htmls.append(b"<html><body>" + text.encode() + b"</body></html>")
            lrng = _rng(self.seed, "lang", i)
            langs.append(_LANGS[int(lrng.choice(len(_LANGS), p=_LANG_P))])
            classes.append(cls)
            clusters.append(cluster)
            tss.append(epoch + np.timedelta64(i, "s"))
        return pa.table(
            {
                "url": pa.array(urls, type=pa.string()),
                "warc_ts": pa.array(np.array(tss), type=pa.timestamp("us")),
                "html": pa.array(htmls, type=pa.binary()),
                "text": pa.array(texts, type=pa.string()),
                "lang": pa.array(langs, type=pa.string()),
                "dup_class": pa.array(classes, type=pa.string()),
                "true_cluster_id": pa.array(clusters, type=pa.int64()),
            }
        )


def generate_pages(
    n: int, seed: int = 1234, max_tokens: int = 800
) -> tuple[pa.Table, pa.Table]:
    """In-process generation (tests): -> (pages, pages_truth)."""
    gen = PageGen(seed, max_tokens)
    full = gen({"id": np.arange(n, dtype=np.int64)})
    pages = full.select(["url", "warc_ts", "html", "text", "lang"])
    truth = full.select(["url", "true_cluster_id", "dup_class"])
    return pages, truth


def write_pages_parquet_ray(
    n: int,
    out_dir: str,
    seed: int = 1234,
    max_tokens: int = 800,
    *,
    num_blocks: int = 64,
) -> None:
    """Parallel generation for bench inputs: ray.data.range ->
    map_batches(PageGen actor pool) -> partitioned parquet."""
    import ray.data

    ds = ray.data.range(n, override_num_blocks=num_blocks)
    pages = ds.map_batches(
        PageGen,
        fn_constructor_args=(seed, max_tokens),
        batch_format="numpy",
        batch_size=4096,
        concurrency=(1, 16),
        num_cpus=1,
    )
    pages = pages.map_batches(
        lambda t: t.select(["url", "warc_ts", "html", "text", "lang"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    pages.write_parquet(out_dir)
