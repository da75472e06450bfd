"""IVF (inverted-file) approximate nearest-neighbor search over the
``embeddings`` table — the coarse-quantizer counterpart to the
hyperplane-LSH variant in ``stages/embedding.py`` (SURVEY.md §2C "ANN"
row; the standard IVF-Flat layout from the FAISS / Jégou et al. 2011
lineage, re-expressed as Ray Data stages).

Pipeline shape:

  1. TRAIN (driver-side, tiny): deterministic k-means on a seeded
     hash-sample of the corpus (the sample, not the corpus, is
     collected — a few thousand rows regardless of scale).  Lloyd
     iterations are pure numpy; empty clusters re-seed from the
     farthest points so the codebook is always full rank.
  2. ASSIGN (map-only): broadcast the (k, dim) codebook via ray.put;
     each batch computes its nearest / ``n_probe`` nearest centroids
     with one matmul and emits slim (list_id, vec_id[, vec]) rows.
  3. SEARCH (exchange + vectorized kernel): queries fan out to their
     ``n_probe`` closest lists; corpus rows ride the same list_id hash
     exchange ONCE; a partition kernel computes exact cosine within
     each list and emits per-(query, list) partial top-k; a final
     tiny top-k merge per query runs on the (k x n_queries)-row result.

Scale notes: the codebook is O(k*dim) — broadcast, never reshuffled.
The corpus moves through exactly one exchange keyed on list_id
(same volume argument as lsh.verify_pairs).  ``n_lists`` should grow
~sqrt(corpus) and ``n_probe`` controls the recall/cost trade-off.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from dedup_ray.core import partitioned_kernel, segments
from dedup_ray.stages.embedding import (
    _batch_matrix,
    _read_embeddings,
    _worker_obj,
)

_TOPK_EMPTY = pa.table(
    {
        "query_id": pa.array([], type=pa.int64()),
        "neighbor_id": pa.array([], type=pa.int64()),
        "cos": pa.array([], type=pa.float64()),
    }
)

_TOPK_OUT_EMPTY = pa.table(
    {
        "query_id": pa.array([], type=pa.int64()),
        "neighbor_id": pa.array([], type=pa.int64()),
        "rank": pa.array([], type=pa.int64()),
    }
)


def train_codebook(
    sf_dir: str,
    *,
    n_lists: int = 16,
    sample_mod: int = 4,
    iters: int = 10,
    seed: int = 13,
) -> np.ndarray:
    """Deterministic k-means codebook from a hash-sampled subset.

    The sample predicate (vec_id % sample_mod == 0) is layout-invariant
    and applied batch-side right after the column-pruned read (arrow
    dataset expressions lack %); at web scale sample_mod grows so the
    driver-side sample stays ~10^4 rows."""
    import pyarrow.compute as pc

    if sample_mod & (sample_mod - 1):
        raise ValueError("sample_mod must be a power of two (bitmask sampling)")
    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(
        lambda t: t.filter(
            pc.equal(pc.bit_wise_and(t["vec_id"], sample_mod - 1), 0)
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    mats, id_chunks = [], []
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=65536):
        ids, m = _batch_matrix(b)
        mats.append(m)
        id_chunks.append(ids)
    if not mats or sum(len(m) for m in mats) == 0:
        # the bitmask sample can be empty for STRUCTURED id spaces
        # (all-odd ids, hashed ids with fixed low bits) even when the
        # corpus is not — fall back to sampling every row rather than
        # crashing the k-means on an empty matrix; structured-id users
        # should raise sample_mod only as far as their id layout allows
        full = ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        for b in full.iter_batches(batch_format="pyarrow", batch_size=65536):
            ids, m = _batch_matrix(b)
            mats.append(m)
            id_chunks.append(ids)
    if not mats or sum(len(m) for m in mats) == 0:
        # no valid vectors at all (empty or all-null table): there are
        # no lists and no neighbors — callers early-return their typed
        # empty results on a zero-row codebook instead of crashing a
        # pipeline over a degenerate shard
        return np.empty((0, 1), dtype=np.float64)
    x = np.vstack([m for m in mats if len(m)])
    id_chunks = [i for i in id_chunks if len(i)]
    # batches arrive in block order, which varies with session
    # parallelism — canonicalize by vec_id or the k-means init (and so
    # the whole codebook) would depend on CPU count
    x = x[np.argsort(np.concatenate(id_chunks))]
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    x = x / norms
    rng = np.random.Generator(np.random.PCG64(seed))
    k = min(n_lists, len(x))
    cent = x[rng.choice(len(x), size=k, replace=False)]
    for _ in range(iters):
        sims = x @ cent.T
        assign = sims.argmax(axis=1)
        for c in range(k):
            members = x[assign == c]
            if len(members) == 0:
                # re-seed an empty list from the worst-served point
                worst = sims.max(axis=1).argmin()
                cent[c] = x[worst]
                continue
            v = members.sum(axis=0)
            n = np.linalg.norm(v)
            cent[c] = v / n if n > 0 else cent[c]
    return cent


def ivf_topk(
    sf_dir: str,
    *,
    n_queries: int = 3,
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 4,
    seed: int = 13,
) -> ray.data.Dataset:
    """IVF-Flat cosine top-k for each query vec_id < n_queries.

    Same output contract as ``embedding.cosine_topk`` (query_id,
    neighbor_id, rank) so recall is directly measurable against the
    exact oracle; with n_probe == n_lists the result is exact."""
    import pyarrow.compute as pc

    cent = train_codebook(sf_dir, n_lists=n_lists, seed=seed)
    if len(cent) == 0:
        # empty / all-null embeddings table: no vectors, no neighbors
        return ray.data.from_arrow(_TOPK_OUT_EMPTY)
    c_ref = ray.put(cent)

    # queries: predicate pushed into the read; tiny
    q_rows = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filter=pc.field("vec_id") < n_queries,
    ).take_all()
    # NULL embeddings drop from the query set as well as the corpus
    # (the oracle's q CTE selects from the null-filtered nn)
    q_rows = [r for r in q_rows if r["embedding"] is not None]
    if not q_rows:
        # no vec_id < n_queries in this corpus: the SQL contract's
        # query set is empty, so the result is too
        return ray.data.from_arrow(_TOPK_OUT_EMPTY)
    q_ids = np.array([r["vec_id"] for r in q_rows], dtype=np.int64)
    qm = np.vstack([np.asarray(r["embedding"], dtype=np.float64) for r in q_rows])
    qn = np.linalg.norm(qm, axis=1, keepdims=True)
    qn[qn == 0] = 1.0
    qm = qm / qn
    # each query probes its n_probe nearest lists; kind="stable" keeps
    # the lower centroid index on cosine ties (zero-vector queries,
    # duplicate centroids) — introsort tie order varies across numpy
    # builds, against the determinism-everywhere rule
    q_lists = np.argsort(-(qm @ cent.T), axis=1, kind="stable")[:, :n_probe]
    q_ref = ray.put((q_ids, qm, q_lists))

    dim = qm.shape[1]

    def corpus_rows(t: pa.Table) -> pa.Table:
        """Slim (gkey=list_id, vec_id, vec, is_query=0) rows — one row
        per corpus vector, assigned to its single nearest list."""
        from dedup_ray.util import u64_matrix_to_binary

        ids, m = _batch_matrix(t)
        if len(ids) == 0:
            # all-null batch: (0, 1) matrix cannot meet the codebook width
            return pa.table(
                {
                    "gkey": pa.array([], type=pa.int64()),
                    "vec_id": pa.array([], type=pa.int64()),
                    "is_query": pa.array([], type=pa.int32()),
                    "vec": pa.array([], type=pa.binary()),
                }
            )
        nn = np.linalg.norm(m, axis=1, keepdims=True)
        nn[nn == 0] = 1.0
        m = np.ascontiguousarray(m / nn)
        cb = _worker_obj(c_ref)
        assign = (m @ cb.T).argmax(axis=1).astype(np.int64)
        n = len(ids)
        return pa.table(
            {
                "gkey": pa.array(assign, type=pa.int64()),
                "vec_id": pa.array(ids, type=pa.int64()),
                "is_query": pa.array(np.zeros(n, dtype=np.int32)),
                "vec": u64_matrix_to_binary(m.view(np.uint64)),
            }
        )

    # query rows replicated to each probed list (tiny: n_queries x n_probe)
    from dedup_ray.util import u64_matrix_to_binary

    qi, ql = [], []
    for i in range(len(q_ids)):
        for L in q_lists[i]:
            qi.append(i)
            ql.append(int(L))
    q_tall = pa.table(
        {
            "gkey": pa.array(ql, type=pa.int64()),
            "vec_id": pa.array(q_ids[qi], type=pa.int64()),
            "is_query": pa.array(np.ones(len(qi), dtype=np.int32)),
            "vec": u64_matrix_to_binary(
                np.ascontiguousarray(qm[qi]).view(np.uint64)
            ),
        }
    )

    tall = (
        _read_embeddings(sf_dir)
        .map_batches(corpus_rows, batch_format="pyarrow", zero_copy_batch=True)
        .union(ray.data.from_arrow(q_tall))
    )

    def list_kernel(g: pa.Table) -> pa.Table:
        """All lists of this partition at once: per-list exact cosine of
        the probing queries vs the list members, partial top-k each."""
        from dedup_ray.util import binary_to_u64_matrix

        keys = g["gkey"].to_numpy(zero_copy_only=False)
        isq = g["is_query"].to_numpy(zero_copy_only=False)
        ids = g["vec_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, isq, keys))
        ks = keys[order]
        starts, lens = segments(ks)
        mat = binary_to_u64_matrix(g["vec"].take(pa.array(order)), dim).view(
            np.float64
        )
        isq_s, ids_s = isq[order], ids[order]
        out_q, out_n, out_c = [], [], []
        for s, L in zip(starts.tolist(), lens.tolist()):
            qmask = isq_s[s : s + L] == 1
            nq = int(qmask.sum())
            if nq == 0 or nq == L:
                continue
            qs = mat[s : s + L][qmask]
            cs = mat[s : s + L][~qmask]
            qid = ids_s[s : s + L][qmask]
            cid = ids_s[s : s + L][~qmask]
            cos = cs @ qs.T  # (members, queries)
            # pre-normalized vectors: all-zero row == zero-norm
            # original -> -1.0 against anything (oracle convention,
            # matches DuckDB list_cosine_similarity on zero vectors)
            cz = ~cs.any(axis=1)
            qz = ~qs.any(axis=1)
            if cz.any():
                cos[cz, :] = -1.0
            if qz.any():
                cos[:, qz] = -1.0
            for j in range(nq):
                col = cos[:, j]
                mask = cid != qid[j]
                cand_i, cand_c = cid[mask], col[mask]
                if len(cand_i) > k:
                    top = np.lexsort((cand_i, -cand_c))[:k]
                else:
                    top = np.argsort(-cand_c)
                out_q.extend([int(qid[j])] * len(top))
                out_n.extend(cand_i[top].tolist())
                out_c.extend(cand_c[top].tolist())
        if not out_q:
            return _TOPK_EMPTY
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "neighbor_id": pa.array(out_n, type=pa.int64()),
                "cos": pa.array(out_c, type=pa.float64()),
            }
        )

    partials = partitioned_kernel(
        tall,
        lambda t: t["gkey"].to_numpy(zero_copy_only=False).view(np.uint64),
        list_kernel,
        num_partitions=min(32, n_lists),
        empty_result=_TOPK_EMPTY,
    )

    final_empty = _TOPK_OUT_EMPTY

    def final_kernel(g: pa.Table) -> pa.Table:
        """Merge partial top-k per query (vectorized multi-query).  No
        (query, neighbor) dedupe is needed: each corpus vector lives in
        exactly ONE list (corpus_rows argmax assignment), so a neighbor
        meets a query in at most one probed list."""
        if "query_id" not in g.column_names or len(g) == 0:
            return final_empty
        q = g["query_id"].to_numpy(zero_copy_only=False)
        nid = g["neighbor_id"].to_numpy(zero_copy_only=False)
        cos = g["cos"].to_numpy(zero_copy_only=False)
        order = np.lexsort((nid, -cos, q))
        qs = q[order]
        starts, lens = segments(qs)
        seg_id = np.repeat(np.arange(len(starts)), lens)
        rank = np.arange(len(qs)) - starts[seg_id]
        keep = rank < k
        return pa.table(
            {
                "query_id": pa.array(qs[keep], type=pa.int64()),
                "neighbor_id": pa.array(nid[order][keep], type=pa.int64()),
                "rank": pa.array(rank[keep] + 1, type=pa.int64()),
            }
        )

    return partitioned_kernel(
        partials,
        lambda t: t["query_id"].to_numpy(zero_copy_only=False).view(np.uint64),
        final_kernel,
        num_partitions=4,
        empty_result=final_empty,
    )


# _worker_obj (per-worker broadcast fetch) is shared with the
# embedding stage — one cache per worker process, one docstring


_PAIRS_META_EMPTY = pa.table(
    {
        "id_a": pa.array([], type=pa.int64()),
        "id_b": pa.array([], type=pa.int64()),
        "meta": pa.array([], type=pa.int32()),
    }
)

_PAIRS_EMPTY = pa.table(
    {
        "id_a": pa.array([], type=pa.int64()),
        "id_b": pa.array([], type=pa.int64()),
    }
)


def ivf_near_pairs(
    sf_dir: str,
    *,
    threshold: float = 0.35,
    n_lists: int = 16,
    n_probe: int = 2,
    seed: int = 13,
    bucket_cap: int = 4096,
    hot_log: list | None = None,
) -> ray.data.Dataset:
    """IVF-sourced near-pair generation — the coarse-quantizer
    counterpart to ``embedding.ann_lsh_pairs``, used as the ``"ivf"``
    pair source of ``embedding_dedup``.

    Each vector fans out to its ``n_probe`` nearest lists (stable
    argsort, ties to the lowest list id), so a pair is found iff the
    two vectors SHARE at least one probed list — multi-probe is the
    recall knob (n_probe=1 misses pairs straddling a Voronoi boundary).
    Recall scales with threshold: at tight near-dup thresholds (~0.9)
    the two vectors of a pair almost always share their nearest cell
    and small n_probe suffices; at loose thresholds (0.35) n_probe must
    be a sizable fraction of n_lists (measured at sf0.001/16 lists:
    n_probe 4 -> 0.92 pair recall, 6 -> 1.0) — prefer the ann_lsh
    source when the threshold is loose.
    Slim (list_id, vec_id, vec) rows ride ONE list_id hash exchange;
    exact cosine runs within each list via the shared capped/salted
    segment kernel (``embedding._segment_pairs_capped``) so a skewed
    list (duplicated embeddings piling into one cell) is salted and
    LOGGED, never silently quadratic.  Pairs found in several shared
    lists are deduped by a vectorized hash aggregate.

    Volume note: the exchange moves n_probe x vector volume — the IVF
    analog of the n_tables x volume of the LSH source, typically much
    cheaper since n_probe << n_tables."""
    import pyarrow.compute as pc

    from dedup_ray.stages.embedding import _segment_pairs_capped

    cent = train_codebook(sf_dir, n_lists=n_lists, seed=seed)
    if len(cent) == 0:
        # empty / all-null embeddings table: no vectors, no pairs
        return ray.data.from_arrow(_PAIRS_EMPTY)
    n_probe = min(n_probe, len(cent))
    dim = cent.shape[1]
    c_ref = ray.put(cent)

    def assign_rows(t: pa.Table) -> pa.Table:
        from dedup_ray.util import u64_matrix_to_binary

        ids, m = _batch_matrix(t)
        if len(ids) == 0:
            # all-null batch: (0, 1) matrix cannot meet the codebook width
            return pa.table(
                {
                    "gkey": pa.array([], type=pa.int64()),
                    "vec_id": pa.array([], type=pa.int64()),
                    "vec": pa.array([], type=pa.binary()),
                }
            )
        nn = np.linalg.norm(m, axis=1, keepdims=True)
        nn[nn == 0] = 1.0
        m = np.ascontiguousarray(m / nn)
        cb = _worker_obj(c_ref)
        sims = m @ cb.T
        lists = np.argsort(-sims, axis=1, kind="stable")[:, :n_probe]
        n = len(ids)
        vec_bin = u64_matrix_to_binary(m.view(np.uint64))
        rep_idx = np.repeat(np.arange(n, dtype=np.int64), n_probe)
        return pa.table(
            {
                "gkey": pa.array(lists.reshape(-1), type=pa.int64()),
                "vec_id": pa.array(ids[rep_idx], type=pa.int64()),
                "vec": vec_bin.take(pa.array(rep_idx)),
            }
        )

    tall = _read_embeddings(sf_dir).map_batches(
        assign_rows, batch_format="pyarrow", zero_copy_batch=True
    )

    def list_pair_kernel(g: pa.Table) -> pa.Table:
        """All lists of this partition at once: per-list capped/salted
        all-pairs cosine.  Salted lists emit a meta=1 log row
        (id_a=list size, id_b=list_id)."""
        from dedup_ray.util import binary_to_u64_matrix

        keys = g["gkey"].to_numpy(zero_copy_only=False)
        ids = g["vec_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, keys))
        ks, ids_s = keys[order], ids[order]
        starts, lens = segments(ks)
        mats = binary_to_u64_matrix(g["vec"].take(pa.array(order)), dim).view(
            np.float64
        )
        out_a, out_b = [], []
        log_sizes, log_lists = [], []
        for s, L in zip(starts.tolist(), lens.tolist()):
            if L < 2:
                continue
            salted = _segment_pairs_capped(
                mats[s : s + L], ids_s[s : s + L], threshold, bucket_cap, out_a, out_b
            )
            if salted:
                log_sizes.append(L)
                log_lists.append(int(ks[s]))
        n_pairs = sum(len(p) for p in out_a)
        n_logs = len(log_sizes)
        if n_pairs == 0 and n_logs == 0:
            return _PAIRS_META_EMPTY
        a_out = np.concatenate(
            (out_a if out_a else [])
            + ([np.array(log_sizes, dtype=np.int64)] if n_logs else [])
        )
        b_out = np.concatenate(
            (out_b if out_b else [])
            + ([np.array(log_lists, dtype=np.int64)] if n_logs else [])
        )
        meta = np.concatenate(
            [np.zeros(n_pairs, dtype=np.int32), np.ones(n_logs, dtype=np.int32)]
        )
        return pa.table(
            {
                "id_a": pa.array(a_out, type=pa.int64()),
                "id_b": pa.array(b_out, type=pa.int64()),
                "meta": pa.array(meta, type=pa.int32()),
            }
        )

    fused = partitioned_kernel(
        tall,
        lambda t: t["gkey"].to_numpy(zero_copy_only=False).view(np.uint64),
        list_pair_kernel,
        num_partitions=min(32, n_lists),
        empty_result=_PAIRS_META_EMPTY,
    )

    # log stream: filtered distributedly, only the tiny per-salted-list
    # log reaches the driver
    import logging

    logger = logging.getLogger(__name__)
    log_rows = fused.map_batches(
        lambda t: t.filter(pc.equal(t["meta"], 1)).select(["id_a", "id_b"])
        if "meta" in t.column_names
        else _PAIRS_EMPTY,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    for b in log_rows.iter_batches(batch_format="pyarrow", batch_size=65536):
        if "id_a" not in b.column_names:
            continue
        for size, lid in zip(b["id_a"].to_pylist(), b["id_b"].to_pylist()):
            entry = {
                "list_id": lid,
                "list_size": size,
                "n_salts": -(-size // bucket_cap),
            }
            if hot_log is not None:
                hot_log.append(entry)
            logger.warning(
                "ivf hot list salted: list=%d size=%d cap=%d "
                "(raise n_lists to shrink cells)",
                lid,
                size,
                bucket_cap,
            )
    pairs = fused.map_batches(
        lambda t: t.filter(pc.equal(t["meta"], 0)).select(["id_a", "id_b"])
        if "meta" in t.column_names
        else _PAIRS_EMPTY,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    # dedupe across probed lists: hash-partition on the pair key + one
    # vectorized per-partition distinct (same shape as ann_lsh_pairs)
    from dedup_ray.core import numeric_key_u64

    return partitioned_kernel(
        pairs,
        lambda t: numeric_key_u64(t, ["id_a", "id_b"]),
        lambda g: g.group_by(["id_a", "id_b"]).aggregate([]),
        num_partitions=64,
        empty_result=_PAIRS_EMPTY,
    )
