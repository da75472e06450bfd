"""Brute-force ground-truth oracle for the near-dup layer (SURVEY.md
§5.4, FIXTURES.md §1) — NOT part of the pipeline; used by pytest and
recall reporting.

True duplicate pairs at the configured thresholds, computed exactly:
  - exact:     byte-identical text (hash buckets -> all pairs)
  - near:      exact k-shingle Jaccard >= tau, computed with an
               inverted shingle index (only pairs sharing >= 1 shingle
               can have J > 0, so this is exhaustive), using the SAME
               shingle definition as the engine ("same
               shingle/signature config", BASELINE.json:14)
  - substring: exact longest-common-substring >= L chars via
               difflib.SequenceMatcher over candidate pairs that share
               a winnowing fingerprint (the winnowing guarantee makes
               that candidate set exhaustive for >= L-char shares)
"""

from __future__ import annotations

from collections import defaultdict
from itertools import combinations

import numpy as np
import pyarrow as pa

from dedup_ray.config import DedupConfig
from dedup_ray.stages.minhash import tokenize
from dedup_ray.util import TokenHasher, char_rolling_hashes, shingle_hashes, winnow_select

Pair = tuple[str, str]


def _pair(a: str, b: str) -> Pair:
    return (a, b) if a < b else (b, a)


def exact_pairs(urls: list[str], texts: list[str]) -> set[Pair]:
    buckets: dict[str, list[str]] = defaultdict(list)
    for u, t in zip(urls, texts):
        buckets[t].append(u)
    out: set[Pair] = set()
    for members in buckets.values():
        for a, b in combinations(sorted(members), 2):
            out.add(_pair(a, b))
    return out


def jaccard_pairs(
    urls: list[str], texts: list[str], cfg: DedupConfig
) -> dict[Pair, float]:
    """Exact shingle-set Jaccard for every pair with J > 0 (inverted
    index over shingle hashes); caller filters by tau."""
    hasher = TokenHasher(seed=cfg.seed)
    sets: list[np.ndarray] = []
    for t in texts:
        sh = shingle_hashes(hasher.hash_tokens(tokenize(t, cfg.normalize)), cfg.shingle_k)
        sets.append(np.unique(sh))
    index: dict[int, list[int]] = defaultdict(list)
    for i, sh in enumerate(sets):
        for h in sh.tolist():
            index[h].append(i)
    inter: dict[tuple[int, int], int] = defaultdict(int)
    for members in index.values():
        if len(members) < 2:
            continue
        for a, b in combinations(members, 2):
            inter[(a, b)] += 1
    out: dict[Pair, float] = {}
    for (a, b), m in inter.items():
        union = len(sets[a]) + len(sets[b]) - m
        if union > 0:
            out[_pair(urls[a], urls[b])] = m / union
    return out


def substring_pairs(
    urls: list[str], texts: list[str], cfg: DedupConfig
) -> set[Pair]:
    """Pairs sharing an exact common substring >= cfg.substring_min_len
    chars.  Candidates via winnowing fingerprints (exhaustive for the
    configured length by the winnowing guarantee), verified with
    difflib's longest matching block."""
    import difflib

    g, w = cfg.winnow_gram, cfg.winnow_window
    index: dict[int, list[int]] = defaultdict(list)
    for i, t in enumerate(texts):
        hs = char_rolling_hashes(t, g)
        if len(hs) == 0:
            continue
        for p in winnow_select(hs, w):
            index[int(hs[p])].append(i)
    cand: set[tuple[int, int]] = set()
    for members in index.values():
        ms = sorted(set(members))
        if len(ms) < 2:
            continue
        for a, b in combinations(ms, 2):
            cand.add((a, b))
    out: set[Pair] = set()
    for a, b in cand:
        sm = difflib.SequenceMatcher(None, texts[a], texts[b], autojunk=False)
        m = sm.find_longest_match(0, len(texts[a]), 0, len(texts[b]))
        if m.size >= cfg.substring_min_len:
            out.add(_pair(urls[a], urls[b]))
    return out


def true_dup_pairs(
    pages: pa.Table,
    cfg: DedupConfig,
    *,
    include_substring: bool = False,
) -> dict[str, set[Pair]]:
    """-> {'exact': pairs, 'near': pairs (J >= tau, excluding exact),
    'substring': pairs (excluding exact/near)} computed brute-force."""
    urls = pages["url"].to_pylist()
    texts = [t or "" for t in pages["text"].to_pylist()]
    ex = exact_pairs(urls, texts)
    jac = jaccard_pairs(urls, texts, cfg)
    near = {p for p, j in jac.items() if j >= cfg.jaccard_tau} - ex
    result = {"exact": ex, "near": near}
    if include_substring:
        ss = substring_pairs(urls, texts, cfg) - ex - near
        result["substring"] = ss
    return result


def predicted_pairs(assignments) -> set[Pair]:
    """Within-cluster pairs from an assignments table/DataFrame."""
    import pandas as pd

    if not isinstance(assignments, pd.DataFrame):
        assignments = assignments.to_pandas()
    out: set[Pair] = set()
    for _, grp in assignments.groupby("cluster_id"):
        urls = sorted(grp["url"].tolist())
        for a, b in combinations(urls, 2):
            out.add((a, b))
    return out


def recall_precision(
    true: set[Pair], pred: set[Pair]
) -> tuple[float, float, int, int]:
    hit = len(true & pred)
    # no true pairs: recall is vacuously 1.0, but precision must still
    # charge every predicted pair as a false positive — returning 1.0
    # here would let a no-dup fixture pass while the engine emits
    # garbage edges
    recall = hit / len(true) if true else 1.0
    precision = hit / len(pred) if pred else 1.0
    return recall, precision, len(true), len(pred)
