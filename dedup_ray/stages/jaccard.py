"""Exact n-gram (shingle-set) Jaccard verification — the precise
variant of the near-dup layer: LSH proposes candidates, this stage
computes TRUE set Jaccard from the texts (not the signature estimate).

Used where exactness matters more than the extra text attach (e.g.
final-pass auditing, small high-value corpora); the flagship uses the
128-perm estimate (sigma ~= 0.035) instead.
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa
import ray
import ray.data

from dedup_ray.config import DedupConfig
from dedup_ray.core import hash_strings_u64, partitioned_kernel
from dedup_ray.stages.lsh import segments_obj

_EMPTY_EDGES = pa.table(
    {
        "u": pa.array([], type=pa.string()),
        "v": pa.array([], type=pa.string()),
        "kind": pa.array([], type=pa.string()),
        "score": pa.array([], type=pa.float64()),
    }
)


@functools.lru_cache(maxsize=8)
def _worker_url_set(ref) -> set:
    return ray.get(ref)


def exact_jaccard_edges(
    pairs: ray.data.Dataset,
    winners: ray.data.Dataset,
    cfg: DedupConfig,
    *,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """candidate pairs (u, v) + winners (url, text) -> edges with
    score = EXACT shingle-set Jaccard, kept when >= cfg.jaccard_tau.

    Same union + url-kernel + pair-kernel shape as lsh.verify_pairs,
    but attaching TEXT (broadcast-filtered to pair members) and
    computing np.intersect1d over the unique shingle sets.
    """
    pair_urls: set[str] = set()
    pair_tbls = []
    for b in pairs.iter_batches(batch_format="pyarrow", batch_size=65536):
        if "u" not in b.column_names or len(b) == 0:
            continue
        pair_urls.update(b["u"].to_pylist())
        pair_urls.update(b["v"].to_pylist())
        pair_tbls.append(b.select(["u", "v"]))
    if not pair_tbls:
        return ray.data.from_arrow(_EMPTY_EDGES)
    pair_tbl = pa.concat_tables(pair_tbls)
    urls_ref = ray.put(pair_urls)

    def text_rows(t: pa.Table) -> pa.Table:
        keep_urls = _worker_url_set(urls_ref)
        keep = pa.array([u in keep_urls for u in t["url"].to_pylist()])
        t = t.filter(keep)
        n = len(t)
        return pa.table(
            {
                "gkey": t["url"],
                "u": pa.array([""] * n, type=pa.string()),
                "v": pa.array([""] * n, type=pa.string()),
                "slot": pa.array(np.full(n, -1, dtype=np.int32)),
                "text": t["text"],
            }
        )

    n = len(pair_tbl)
    u_arr = pair_tbl["u"].combine_chunks()
    v_arr = pair_tbl["v"].combine_chunks()
    pair_rows = pa.table(
        {
            "gkey": pa.concat_arrays([u_arr, v_arr]),
            "u": pa.concat_arrays([u_arr, u_arr]),
            "v": pa.concat_arrays([v_arr, v_arr]),
            "slot": pa.array(
                np.concatenate([np.zeros(n, dtype=np.int32), np.ones(n, dtype=np.int32)])
            ),
            "text": pa.nulls(2 * n, type=pa.string()),
        }
    )
    tall = winners.select_columns(["url", "text"]).map_batches(
        text_rows, batch_format="pyarrow", zero_copy_batch=True
    ).union(ray.data.from_arrow(pair_rows))

    attach_empty = pa.table(
        {
            "u": pa.array([], type=pa.string()),
            "v": pa.array([], type=pa.string()),
            "slot": pa.array([], type=pa.int32()),
            "text": pa.array([], type=pa.string()),
        }
    )

    def attach(g: pa.Table) -> pa.Table:
        gkeys = np.array(g["gkey"].to_pylist(), dtype=object)
        slots = g["slot"].to_numpy(zero_copy_only=False)
        order = np.lexsort((slots, gkeys))
        gs = gkeys[order]
        starts, lens = segments_obj(gs)
        slots_sorted = slots[order]
        has_text = slots_sorted[starts] == -1
        seg_id = np.repeat(np.arange(len(starts)), lens)
        member = (slots_sorted >= 0) & has_text[seg_id]
        if not member.any():
            return attach_empty
        take_rows = pa.array(order[member])
        src = pa.array(order[starts[seg_id][member]])
        return pa.table(
            {
                "u": g["u"].take(take_rows),
                "v": g["v"].take(take_rows),
                "slot": g["slot"].take(take_rows),
                "text": g["text"].take(src),
            }
        )

    attached = partitioned_kernel(
        tall,
        lambda t: hash_strings_u64(t["gkey"].to_pylist()),
        attach,
        num_partitions=num_partitions or 64,
        empty_result=attach_empty,
    )

    tau = cfg.jaccard_tau

    def verify(g: pa.Table) -> pa.Table:
        from dedup_ray.stages.minhash import _worker_hasher

        mh = _worker_hasher(cfg)
        us = np.array(g["u"].to_pylist(), dtype=object)
        vs = np.array(g["v"].to_pylist(), dtype=object)
        slots = g["slot"].to_numpy(zero_copy_only=False)
        combined = np.array(
            [f"{a}\x00{b}" for a, b in zip(us.tolist(), vs.tolist())], dtype=object
        )
        order = np.lexsort((slots, combined))
        starts, lens = segments_obj(combined[order])
        ok = lens == 2
        if not ok.any():
            return _EMPTY_EDGES
        texts = g["text"].to_pylist()
        out_u, out_v, out_s = [], [], []
        for s in starts[ok].tolist():
            i0, i1 = order[s], order[s + 1]
            if slots[i0] != 0 or slots[i1] != 1:
                continue
            # exact shingle sets via the SAME vectorized kernel the
            # signatures use (identical token/shingle definition)
            th0, c0 = mh._token_hashes(pa.array([texts[i0] or ""]))
            th1, c1 = mh._token_hashes(pa.array([texts[i1] or ""]))
            s0, _ = mh._shingles(th0, c0, cfg.shingle_k)
            s1, _ = mh._shingles(th1, c1, cfg.shingle_k)
            a = np.unique(s0)
            b = np.unique(s1)
            inter = len(np.intersect1d(a, b, assume_unique=True))
            union = len(a) + len(b) - inter
            if union == 0:
                continue
            j = inter / union
            if j >= tau:
                out_u.append(us[i0])
                out_v.append(vs[i0])
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
        lambda t: hash_strings_u64(
            [f"{a}\x00{b}" for a, b in zip(t["u"].to_pylist(), t["v"].to_pylist())]
        ),
        verify,
        num_partitions=num_partitions or 64,
        empty_result=_EMPTY_EDGES,
    )
