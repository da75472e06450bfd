"""Long-shared-substring pass (SURVEY.md §2B B11; BASELINE.json:6
"suffix-array pass for long substring dups") — implemented with
WINNOWING FINGERPRINTS (Schleimer, Wilkerson, Aiken: "Winnowing: Local
Algorithms for Document Fingerprinting", SIGMOD 2003) instead of a
distributed generalized suffix array.

Why winnowing and not a literal suffix array: the winnowing guarantee
is exactly the detection contract this stage needs — any substring of
length >= gram + window - 1 (= cfg.substring_min_len) shared by two
docs yields at least one shared selected fingerprint — and it maps to
plain Ray Data primitives (map_batches -> groupby -> verify) with slim
shuffle rows, no partition-local character budget, no cross-partition
miss modes.  A distributed SA gets the same answer only within a
routed partition; winnowing is global by construction.

Stages:
  winners ──fingerprint──▶ anchors (anchor_hash, url, pos)   [actor pool]
    groupby(anchor_hash) ──▶ candidate pairs (u, v, pu, pv)
        (star topology per bucket: shared-block buckets of n docs emit
        n-1 edges, never O(n^2); connectivity via union-find)
    groupby(u, v) ──▶ up to MAX_TRIES anchor pairs per doc pair
    union + groupby(url) ──▶ attach texts (broadcast-filtered to pair
        members only, so corpus text is NOT reshuffled)
    groupby(u, v) ──▶ extend the anchor match left/right, keep pairs
        with a verified common substring >= substring_min_len
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from dedup_ray.config import DedupConfig
from dedup_ray.core import default_pool_size
from dedup_ray.util import char_rolling_hashes, winnow_select

MAX_ANCHOR_TRIES = 3

_EMPTY_ANCHORS = pa.table(
    {
        "anchor_hash": pa.array([], type=pa.int64()),
        "url": pa.array([], type=pa.string()),
        "pos": pa.array([], type=pa.int64()),
    }
)

_EMPTY_PAIRS = pa.table(
    {
        "u": pa.array([], type=pa.string()),
        "v": pa.array([], type=pa.string()),
        "pu": pa.array([], type=pa.int64()),
        "pv": pa.array([], type=pa.int64()),
    }
)

_EMPTY_EDGES = pa.table(
    {
        "u": pa.array([], type=pa.string()),
        "v": pa.array([], type=pa.string()),
        "kind": pa.array([], type=pa.string()),
        "score": pa.array([], type=pa.float64()),
    }
)


class Fingerprinter:
    """Actor-pool stage: winnowing fingerprints per doc (vectorized
    rolling hash + sliding-window argmin)."""

    def __init__(self, cfg: DedupConfig) -> None:
        self.g = cfg.winnow_gram
        self.w = cfg.winnow_window

    def __call__(self, batch: pa.Table) -> pa.Table:
        hashes, urls, poss = [], [], []
        for url, text in zip(batch["url"].to_pylist(), batch["text"].to_pylist()):
            t = text or ""
            hs = char_rolling_hashes(t, self.g)
            if len(hs) == 0:
                continue
            sel = winnow_select(hs, self.w)
            hashes.append(hs[sel])
            urls.extend([url] * len(sel))
            poss.append(sel)
        if not hashes:
            return _EMPTY_ANCHORS
        return pa.table(
            {
                # int64 reinterpret: uint64 groupby keys break Ray's
                # sort-boundary sampling (see lsh.py)
                "anchor_hash": pa.array(
                    np.concatenate(hashes).view(np.int64), type=pa.int64()
                ),
                "url": pa.array(urls, type=pa.string()),
                "pos": pa.array(np.concatenate(poss), type=pa.int64()),
            }
        )


import functools


@functools.lru_cache(maxsize=8)
def _worker_fingerprinter(cfg: DedupConfig) -> Fingerprinter:
    return Fingerprinter(cfg)


def _fingerprint_batch(batch: pa.Table, cfg: DedupConfig) -> pa.Table:
    return _worker_fingerprinter(cfg)(batch)


@functools.lru_cache(maxsize=8)
def _worker_pair_urls(urls_ref) -> set:
    return ray.get(urls_ref)


def _tall_text_batch(t: pa.Table, urls_ref) -> pa.Table:
    urls = _worker_pair_urls(urls_ref)
    keep = pa.array([u in urls for u in t["url"].to_pylist()])
    t = t.filter(keep)
    n = len(t)
    return pa.table(
        {
            "gkey": t["url"],
            "u": pa.array([""] * n, type=pa.string()),
            "v": pa.array([""] * n, type=pa.string()),
            "slot": pa.array(np.full(n, -1, dtype=np.int32)),
            "pu": pa.array(np.zeros(n, dtype=np.int64)),
            "pv": pa.array(np.zeros(n, dtype=np.int64)),
            "text": t["text"],
        }
    )


def anchor_candidate_pairs(
    anchors: ray.data.Dataset, *, num_partitions: int | None = None
) -> ray.data.Dataset:
    """anchor_hash partition kernel -> star-topology candidate pairs
    carrying both anchor positions (vectorized; millions of singleton
    anchor buckets cost one sort, not one UDF call each)."""
    from dedup_ray.core import partitioned_kernel, segments

    def star_kernel(g: pa.Table) -> pa.Table:
        k = g["anchor_hash"].to_numpy(zero_copy_only=False)
        urls = np.array(g["url"].to_pylist(), dtype=object)
        pos = g["pos"].to_numpy(zero_copy_only=False)
        order = np.lexsort((pos, urls, k))
        ks, us, ps = k[order], urls[order], pos[order]
        # first occurrence of each (k, url): one anchor per doc per hash
        first = np.ones(len(ks), dtype=bool)
        if len(ks) > 1:
            first[1:] = (ks[1:] != ks[:-1]) | (us[1:] != us[:-1])
        ks_f, us_f, ps_f = ks[first], us[first], ps[first]
        starts, lens = segments(ks_f)
        multi = lens >= 2
        if not multi.any():
            return _EMPTY_PAIRS
        out_u, out_v, out_pu, out_pv = [], [], [], []
        for s, L in zip(starts[multi].tolist(), lens[multi].tolist()):
            head_u, head_p = us_f[s], ps_f[s]
            out_u.append(np.repeat(np.array([head_u], dtype=object), L - 1))
            out_v.append(us_f[s + 1 : s + L])
            out_pu.append(np.full(L - 1, head_p, dtype=np.int64))
            out_pv.append(ps_f[s + 1 : s + L])
        return pa.table(
            {
                "u": pa.array(np.concatenate(out_u), type=pa.string()),
                "v": pa.array(np.concatenate(out_v), type=pa.string()),
                "pu": pa.array(np.concatenate(out_pu), type=pa.int64()),
                "pv": pa.array(np.concatenate(out_pv), type=pa.int64()),
            }
        )

    return partitioned_kernel(
        anchors,
        lambda t: t["anchor_hash"].to_numpy(zero_copy_only=False).view(np.uint64),
        star_kernel,
        num_partitions=num_partitions or 64,
        empty_result=_EMPTY_PAIRS,
    )


def dedupe_anchor_pairs(
    pairs: ray.data.Dataset, *, num_partitions: int | None = None
) -> ray.data.Dataset:
    """Keep at most MAX_ANCHOR_TRIES anchor pairs per (u, v) so the
    verify stage never attaches a text more than a few times
    (vectorized rank-within-segment)."""
    from dedup_ray.core import hash_strings_u64, partitioned_kernel

    def kernel(g: pa.Table) -> pa.Table:
        us = np.array(g["u"].to_pylist(), dtype=object)
        vs = np.array(g["v"].to_pylist(), dtype=object)
        pu = g["pu"].to_numpy(zero_copy_only=False)
        pv = g["pv"].to_numpy(zero_copy_only=False)
        combined = np.array(
            [f"{a}\x00{b}" for a, b in zip(us.tolist(), vs.tolist())], dtype=object
        )
        order = np.lexsort((pv, pu, combined))
        cs = combined[order]
        from dedup_ray.stages.lsh import segments_obj

        starts, lens = segments_obj(cs)
        seg_id = np.repeat(np.arange(len(starts)), lens)
        rank = np.arange(len(cs)) - starts[seg_id]
        keep = order[rank < MAX_ANCHOR_TRIES]
        return g.take(pa.array(np.sort(keep)))

    return partitioned_kernel(
        pairs,
        lambda t: hash_strings_u64(
            [f"{a}\x00{b}" for a, b in zip(t["u"].to_pylist(), t["v"].to_pylist())]
        ),
        kernel,
        num_partitions=num_partitions or 64,
        empty_result=_EMPTY_PAIRS,
    )


def verify_substring_pairs(
    pairs: ray.data.Dataset,
    winners: ray.data.Dataset,
    cfg: DedupConfig,
) -> ray.data.Dataset:
    """Attach both texts per candidate pair (union + groupby — see
    lsh.verify_pairs for why not Dataset.join) and extend the anchor
    match to its maximal run; keep runs >= substring_min_len.

    The text side is BROADCAST-FILTERED to urls that appear in a pair
    (collected on the driver — candidate doc pairs are orders of
    magnitude fewer than docs), so the corpus never reshuffles here.
    """
    pair_urls: set[str] = set()
    pair_rows_tbls: list[pa.Table] = []
    for b in pairs.iter_batches(batch_format="pyarrow", batch_size=65536):
        if "u" not in b.column_names or len(b) == 0:
            continue
        pair_urls.update(b["u"].to_pylist())
        pair_urls.update(b["v"].to_pylist())
        pair_rows_tbls.append(b.select(["u", "v", "pu", "pv"]))
    if not pair_rows_tbls:
        return ray.data.from_arrow(_EMPTY_EDGES)
    pair_tbl = pa.concat_tables(pair_rows_tbls)
    urls_ref = ray.put(pair_urls)

    text_rows = winners.select_columns(["url", "text"]).map_batches(
        _tall_text_batch,
        fn_kwargs={"urls_ref": urls_ref},
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    n = len(pair_tbl)
    u_arr = pair_tbl["u"].combine_chunks()
    v_arr = pair_tbl["v"].combine_chunks()
    pu = pair_tbl["pu"].combine_chunks()
    pv = pair_tbl["pv"].combine_chunks()
    pair_rows = pa.table(
        {
            "gkey": pa.concat_arrays([u_arr, v_arr]),
            "u": pa.concat_arrays([u_arr, u_arr]),
            "v": pa.concat_arrays([v_arr, v_arr]),
            "slot": pa.array(
                np.concatenate([np.zeros(n, dtype=np.int32), np.ones(n, dtype=np.int32)])
            ),
            "pu": pa.concat_arrays([pu, pu]),
            "pv": pa.concat_arrays([pv, pv]),
            "text": pa.nulls(2 * n, type=pa.string()),
        }
    )
    tall = text_rows.union(ray.data.from_arrow(pair_rows))

    def attach(group: pa.Table) -> pa.Table:
        if "slot" not in group.column_names:
            return pa.table(
                {
                    "u": pa.array([], type=pa.string()),
                    "v": pa.array([], type=pa.string()),
                    "slot": pa.array([], type=pa.int32()),
                    "pu": pa.array([], type=pa.int64()),
                    "pv": pa.array([], type=pa.int64()),
                    "text": pa.array([], type=pa.string()),
                }
            )
        slots = group["slot"].to_numpy(zero_copy_only=False)
        sig_idx = np.flatnonzero(slots == -1)
        member_mask = pa.array(slots >= 0)
        m = int((slots >= 0).sum())
        if len(sig_idx) == 0 or m == 0:
            return pa.table(
                {
                    "u": pa.array([], type=pa.string()),
                    "v": pa.array([], type=pa.string()),
                    "slot": pa.array([], type=pa.int32()),
                    "pu": pa.array([], type=pa.int64()),
                    "pv": pa.array([], type=pa.int64()),
                    "text": pa.array([], type=pa.string()),
                }
            )
        text = group["text"][int(sig_idx[0])].as_py()
        return pa.table(
            {
                "u": group["u"].filter(member_mask),
                "v": group["v"].filter(member_mask),
                "slot": group["slot"].filter(member_mask),
                "pu": group["pu"].filter(member_mask),
                "pv": group["pv"].filter(member_mask),
                "text": pa.array([text] * m, type=pa.string()),
            }
        )

    attached = tall.groupby("gkey").map_groups(attach, batch_format="pyarrow")

    min_len = cfg.substring_min_len
    gram = cfg.winnow_gram

    def extend(group: pa.Table) -> pa.Table:
        if "slot" not in group.column_names or len(group) < 2:
            return _EMPTY_EDGES
        slots = group["slot"].to_numpy(zero_copy_only=False)
        texts = group["text"].to_pylist()
        pus = group["pu"].to_numpy(zero_copy_only=False)
        pvs = group["pv"].to_numpy(zero_copy_only=False)
        t_u = t_v = None
        for i, s in enumerate(slots):
            if s == 0 and t_u is None:
                t_u = texts[i]
            elif s == 1 and t_v is None:
                t_v = texts[i]
        if t_u is None or t_v is None:
            return _EMPTY_EDGES
        # distinct anchor attempts for this pair
        tried = set()
        best = 0
        for a, b in zip(pus.tolist(), pvs.tolist()):
            if (a, b) in tried:
                continue
            tried.add((a, b))
            if t_u[a : a + gram] != t_v[b : b + gram]:
                continue  # rolling-hash collision
            left = 0
            while a - left - 1 >= 0 and b - left - 1 >= 0 and t_u[a - left - 1] == t_v[b - left - 1]:
                left += 1
            right = 0
            while (
                a + gram + right < len(t_u)
                and b + gram + right < len(t_v)
                and t_u[a + gram + right] == t_v[b + gram + right]
            ):
                right += 1
            best = max(best, left + gram + right)
            if best >= min_len:
                break
        if best < min_len:
            return _EMPTY_EDGES
        uu = group["u"][0].as_py()
        vv = group["v"][0].as_py()
        return pa.table(
            {
                "u": pa.array([uu], type=pa.string()),
                "v": pa.array([vv], type=pa.string()),
                "kind": pa.array(["substring"], type=pa.string()),
                "score": pa.array([float(best)], type=pa.float64()),
            }
        )

    return attached.groupby(["u", "v"]).map_groups(extend, batch_format="pyarrow")


def substring_edges(
    winners: ray.data.Dataset, cfg: DedupConfig
) -> ray.data.Dataset:
    """winners (url, text) -> verified substring edges.  Fingerprinting
    runs as tasks with a per-worker singleton (see
    minhash._worker_hasher for the pattern)."""
    anchors = winners.select_columns(["url", "text"]).map_batches(
        _fingerprint_batch,
        fn_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=cfg.batch_size,
    )
    pairs = dedupe_anchor_pairs(anchor_candidate_pairs(anchors))
    return verify_substring_pairs(pairs, winners, cfg)
