"""Exact n-gram (shingle-set) Jaccard verification — the precise
variant of the near-dup layer: LSH proposes candidates, this stage
computes TRUE set Jaccard from the texts (not the signature estimate).

Used where exactness matters more than the extra text attach (e.g.
final-pass auditing, small high-value corpora); the flagship uses the
128-perm estimate (sigma ~= 0.035) instead.

Shape (r02): identical to winnow.verify_substring_pairs — candidate id
pairs (u_id, v_id) and text rows ride one hash exchange keyed on
doc_id (distributed semi-join: non-candidate texts are dropped in the
attach kernel, nothing reaches the driver), then a (u_id, v_id)-keyed
kernel computes exact shingle-set Jaccard per pair.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from dedup_ray.config import DedupConfig
from dedup_ray.core import numeric_key_u64, partitioned_kernel, schema_names, segments
from dedup_ray.util import ensure_doc_ids

_EMPTY_EDGES = pa.table(
    {
        "u": pa.array([], type=pa.string()),
        "v": pa.array([], type=pa.string()),
        "kind": pa.array([], type=pa.string()),
        "score": pa.array([], type=pa.float64()),
    }
)

_TALL_EMPTY = pa.table(
    {
        "gkey": pa.array([], type=pa.int64()),
        "u_id": pa.array([], type=pa.int64()),
        "v_id": pa.array([], type=pa.int64()),
        "slot": pa.array([], type=pa.int32()),
        "text": pa.array([], type=pa.string()),
        "url": pa.array([], type=pa.string()),
    }
)

_ATTACH_EMPTY = pa.table(
    {
        "u_id": pa.array([], type=pa.int64()),
        "v_id": pa.array([], type=pa.int64()),
        "slot": pa.array([], type=pa.int32()),
        "text": pa.array([], type=pa.string()),
        "url": pa.array([], type=pa.string()),
    }
)

_PAIR_KEY_COLS = ["u_id", "v_id"]


def _text_rows(t: pa.Table) -> pa.Table:
    if "url" not in t.column_names or len(t) == 0:
        return _TALL_EMPTY
    t = ensure_doc_ids(t)
    n = len(t)
    z = pa.array(np.zeros(n, dtype=np.int64))
    return pa.table(
        {
            "gkey": t["doc_id"],
            "u_id": z,
            "v_id": z,
            "slot": pa.array(np.full(n, -1, dtype=np.int32)),
            "text": t["text"],
            "url": t["url"],
        }
    )


def _pair_member_rows(t: pa.Table) -> pa.Table:
    if "u_id" not in t.column_names or len(t) == 0:
        return _TALL_EMPTY
    u = t["u_id"].combine_chunks()
    v = t["v_id"].combine_chunks()
    n = len(t)
    return pa.table(
        {
            "gkey": pa.concat_arrays([u, v]),
            "u_id": pa.concat_arrays([u, u]),
            "v_id": pa.concat_arrays([v, v]),
            "slot": pa.array(
                np.concatenate([np.zeros(n, dtype=np.int32), np.ones(n, dtype=np.int32)])
            ),
            "text": pa.nulls(2 * n, type=pa.string()),
            "url": pa.nulls(2 * n, type=pa.string()),
        }
    )


def _attach_kernel(g: pa.Table) -> pa.Table:
    gkeys = g["gkey"].to_numpy(zero_copy_only=False)
    slots = g["slot"].to_numpy(zero_copy_only=False)
    order = np.lexsort((slots, gkeys))
    gs = gkeys[order]
    starts, lens = segments(gs)
    slots_sorted = slots[order]
    has_text = slots_sorted[starts] == -1
    seg_id = np.repeat(np.arange(len(starts)), lens)
    member = (slots_sorted >= 0) & has_text[seg_id]
    if not member.any():
        return _ATTACH_EMPTY
    take_rows = pa.array(order[member])
    src = pa.array(order[starts[seg_id][member]])
    return pa.table(
        {
            "u_id": g["u_id"].take(take_rows),
            "v_id": g["v_id"].take(take_rows),
            "slot": g["slot"].take(take_rows),
            "text": g["text"].take(src),
            "url": g["url"].take(src),
        }
    )


def exact_jaccard_edges(
    pairs: ray.data.Dataset,
    winners: ray.data.Dataset,
    cfg: DedupConfig,
    *,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """candidate id pairs (u_id, v_id) + winners (url, text[, doc_id])
    -> edges with score = EXACT shingle-set Jaccard, kept when >=
    cfg.jaccard_tau.  Fully distributed; urls come back attached from
    the text rows."""
    P = num_partitions or 64
    text_cols = ["url", "text"] + (
        ["doc_id"] if "doc_id" in schema_names(winners) else []
    )
    tall = winners.select_columns(text_cols).map_batches(
        _text_rows, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        pairs.map_batches(_pair_member_rows, batch_format="pyarrow", zero_copy_batch=True)
    )

    attached = partitioned_kernel(
        tall,
        lambda t: t["gkey"].to_numpy(zero_copy_only=False).view(np.uint64),
        _attach_kernel,
        num_partitions=P,
        empty_result=_ATTACH_EMPTY,
    )

    tau = cfg.jaccard_tau

    def verify_kernel(g: pa.Table) -> pa.Table:
        from dedup_ray.stages.minhash import _worker_hasher

        mh = _worker_hasher(cfg)
        us = g["u_id"].to_numpy(zero_copy_only=False)
        vs = g["v_id"].to_numpy(zero_copy_only=False)
        slots = g["slot"].to_numpy(zero_copy_only=False)
        order = np.lexsort((slots, vs, us))
        us_s, vs_s, sl_s = us[order], vs[order], slots[order]
        n = len(us_s)
        # dedupe identical (u, v, slot) rows (a pair proposed by
        # several anchors/bands attaches each side once)
        keep1 = np.ones(n, dtype=bool)
        if n > 1:
            keep1[1:] = (
                (us_s[1:] != us_s[:-1])
                | (vs_s[1:] != vs_s[:-1])
                | (sl_s[1:] != sl_s[:-1])
            )
        order = order[keep1]
        us_s, vs_s = us_s[keep1], vs_s[keep1]
        n = len(us_s)
        firsts = np.ones(n, dtype=bool)
        if n > 1:
            firsts[1:] = (us_s[1:] != us_s[:-1]) | (vs_s[1:] != vs_s[:-1])
        starts = np.flatnonzero(firsts).astype(np.int64)
        lens = np.diff(np.concatenate([starts, [n]])).astype(np.int64)
        ok = lens == 2
        if not ok.any():
            return _EMPTY_EDGES
        texts = g["text"].to_pylist()
        urls = g["url"].to_pylist()
        slots_sorted = slots[order]
        out_u, out_v, out_s = [], [], []
        # a doc proposed in many candidate pairs attaches its text once
        # per pair — tokenize+shingle it once per DISTINCT doc in this
        # partition, not once per pair occurrence (the expensive work
        # scales with pair degree otherwise)
        shingle_cache: dict[int, np.ndarray] = {}

        def uniq_shingles(doc_id: int, row: int) -> np.ndarray:
            arr = shingle_cache.get(doc_id)
            if arr is None:
                # exact shingle sets via the SAME vectorized kernel the
                # signatures use (identical token/shingle definition)
                th, c = mh._token_hashes(pa.array([texts[row] or ""]))
                sset, _ = mh._shingles(th, c, cfg.shingle_k)
                arr = np.unique(sset)
                shingle_cache[doc_id] = arr
            return arr

        for s in starts[ok].tolist():
            if slots_sorted[s] != 0 or slots_sorted[s + 1] != 1:
                continue
            i0, i1 = order[s], order[s + 1]
            a = uniq_shingles(int(us_s[s]), i0)
            b = uniq_shingles(int(vs_s[s]), i1)
            inter = len(np.intersect1d(a, b, assume_unique=True))
            union = len(a) + len(b) - inter
            if union == 0:
                continue
            j = inter / union
            if j >= tau:
                out_u.append(urls[i0])
                out_v.append(urls[i1])
                out_s.append(j)
        if not out_u:
            return _EMPTY_EDGES
        return pa.table(
            {
                "u": pa.array(out_u, type=pa.string()),
                "v": pa.array(out_v, type=pa.string()),
                "kind": pa.array(["ngram_jaccard"] * len(out_u), type=pa.string()),
                "score": pa.array(out_s, type=pa.float64()),
            }
        )

    return partitioned_kernel(
        attached,
        lambda t: numeric_key_u64(t, _PAIR_KEY_COLS),
        verify_kernel,
        num_partitions=P,
        empty_result=_EMPTY_EDGES,
    )
