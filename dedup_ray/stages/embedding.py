"""Embedding similarity operators over the ``embeddings`` table
(vec_id:int64, embedding:list<float>[64], label:int32) — the
similarity-search component of a training-data pipeline.

Three operators:
  - brute-force cosine top-k vs a small broadcast query set (the
    exact baseline: one numpy matmul per batch against the broadcast
    query matrix; scales as map-only over the corpus);
  - all-pairs near-dup above a cosine threshold via broadcast of the
    full (small) matrix — at 100-TB scale the matrix no longer
    broadcasts and the LSH variant below is the path;
  - random-hyperplane (SimHash-for-vectors) LSH buckets -> within-
    bucket exact cosine — the scale path: slim (bucket, id) rows,
    groupby shuffle, no O(n^2).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from dedup_ray.core import segments


import functools


@functools.lru_cache(maxsize=8)
def _worker_obj(ref):
    """Per-worker broadcast fetch (ray.put once on the driver, one
    ray.get per worker process).  Plain task functions + this cache
    replace actor pools for cheap broadcast state: an autoscaling
    actor pool pays seconds of ramp/startup per stage (CLAUDE.md),
    while tasks reuse the session's warm workers."""
    return ray.get(ref)


def _read_embeddings(sf_dir: str) -> ray.data.Dataset:
    return ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )


def _embedding_dim(sf_dir: str) -> int:
    """Embedding width from the parquet FOOTER (no scan) — the
    hyperplane matrix must match the corpus dimension, not assume the
    test fixture's 64.  Plain (non-fixed-size) list columns fall back
    to reading a single value."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
    typ = pf.schema_arrow.field("embedding").type
    if pa.types.is_fixed_size_list(typ):
        return typ.list_size
    if pf.metadata.num_rows == 0:
        # empty plain-list table: no vectors will flow, any width works
        return 1
    head = next(pf.iter_batches(batch_size=1, columns=["embedding"]))
    first = head.column(0)[0]
    if not first.is_valid:
        raise ValueError(
            "cannot infer embedding dimension: first embedding is null "
            "(plain list column carries no static width)"
        )
    return len(first)


def _batch_matrix(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(vec_ids, row-aligned float64 matrix) for a batch.  NULL
    embedding rows are DROPPED with their ids: Arrow's flatten() skips
    null slots, so inferring dim as len(flat)//len(t) with a null
    present either crashes the reshape or — when the counts happen to
    divide — silently misassociates every following vector with the
    wrong vec_id.  Dropping matches the SQL oracles, where
    list_cosine_similarity(NULL, q) is NULL and never ranks."""
    import pyarrow.compute as pc

    ids = t["vec_id"].to_numpy(zero_copy_only=False)
    emb = t["embedding"].combine_chunks()
    if emb.null_count:
        valid = pc.is_valid(emb)
        emb = emb.filter(valid)
        ids = ids[valid.to_numpy(zero_copy_only=False)]
    n = len(emb)
    flat = emb.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    if n == 0:
        return ids, np.empty((0, 1), dtype=np.float64)
    # Inferring dim as len(flat)//n would SILENTLY misalign every
    # following vector when a batch mixes lengths that happen to sum
    # to a multiple of n (one short + one long vector cancel out) —
    # validate per-row lengths and fail loudly with the offenders.
    lens = pc.list_value_length(emb).to_numpy(zero_copy_only=False)
    if (lens != lens[0]).any():
        bad = ids[lens != lens[0]][:5]
        raise ValueError(
            "embedding column has inconsistent dimensions: expected "
            f"{lens[0]}, found lengths {sorted(set(lens.tolist()))[:6]} "
            f"(first offending vec_ids: {bad.tolist()})"
        )
    return ids, flat.reshape(n, lens[0])


def _collect_matrix(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """Driver-side collection of the full embedding matrix — ONLY valid
    while the table is small (it is broadcast afterwards); the LSH
    variant is the path when it is not."""
    ids_list, mats = [], []
    for b in _read_embeddings(sf_dir).iter_batches(
        batch_format="pyarrow", batch_size=65536
    ):
        i, m = _batch_matrix(b)
        if len(m) == 0:
            # an all-null batch yields a width-1 empty whose width
            # would poison the vstack against real (n, dim) blocks
            continue
        ids_list.append(i)
        mats.append(m)
    if not mats:
        # zero-row (or all-null) table: np.vstack([]) would raise
        return np.empty(0, dtype=np.int64), np.empty((0, 1), dtype=np.float64)
    return np.concatenate(ids_list), np.vstack(mats)


def cosine_topk(
    sf_dir: str, *, n_queries: int = 3, k: int = 5
) -> ray.data.Dataset:
    """For each query vec_id < n_queries: top-k neighbors by cosine
    (excluding self), deterministic tie-break on neighbor_id.

    Pattern: the query rows are selected by a PREDICATE PUSHED INTO THE
    READ (row groups never leave storage); broadcast the tiny query
    matrix via ray.put; each batch computes a (batch x queries) cosine
    block (numpy matmul); per-batch partial top-k rows shuffle to a
    final per-query selection.
    """
    import pyarrow.compute as _pc

    q_tbl = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filter=_pc.field("vec_id") < n_queries,
    ).take_all()
    # a NULL embedding carries no vector: drop it from the query set
    # too (the oracle's q CTE selects from the null-filtered nn) — a
    # None row would otherwise vstack as a width-1 NaN and crash
    q_tbl = [r for r in q_tbl if r["embedding"] is not None]
    if not q_tbl:
        # no vec_id < n_queries in this corpus (ids can start anywhere)
        # — the query set, and so the result, is empty
        return ray.data.from_arrow(
            pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "neighbor_id": pa.array([], pa.int64()),
                    "rank": pa.array([], pa.int64()),
                }
            )
        )
    q_ids = np.array([r["vec_id"] for r in q_tbl], dtype=np.int64)
    qm = np.vstack([np.asarray(r["embedding"], dtype=np.float64) for r in q_tbl])
    qnrm = np.linalg.norm(qm, axis=1, keepdims=True)
    qzero = (qnrm == 0).ravel()
    qnrm[qzero] = 1.0
    qm = qm / qnrm
    q_ref = ray.put((q_ids, qm, qzero))

    def partial_topk(t: pa.Table, *, ref, k: int) -> pa.Table:
        q_ids, qmat, qz = _worker_obj(ref)
        ids, m = _batch_matrix(t)
        if len(ids) == 0:
            # all-null batch: its (0, 1) matrix cannot meet qmat's width
            return pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "neighbor_id": pa.array([], type=pa.int64()),
                    "cos": pa.array([], type=pa.float64()),
                }
            )
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        bzero = (norms == 0).ravel()
        norms[bzero] = 1.0
        m = m / norms
        cos = m @ qmat.T  # (batch, n_queries)
        # ORACLE convention: DuckDB's list_cosine_similarity scores a
        # zero vector (failed/padded embedding) at -1.0 against
        # anything — rank it last, never as a neighbor
        cos[bzero, :] = -1.0
        cos[:, qz] = -1.0
        out_q, out_n, out_c = [], [], []
        for j, qid in enumerate(q_ids.tolist()):
            col = cos[:, j]
            mask = ids != qid
            cand_ids = ids[mask]
            cand_cos = col[mask]
            if len(cand_ids) > k:
                # top-k by (cos desc, id asc)
                order = np.lexsort((cand_ids, -cand_cos))[:k]
            else:
                order = np.argsort(-cand_cos)
            out_q.extend([qid] * len(order))
            out_n.extend(cand_ids[order].tolist())
            out_c.extend(cand_cos[order].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "neighbor_id": pa.array(out_n, type=pa.int64()),
                "cos": pa.array(out_c, type=pa.float64()),
            }
        )

    partials = _read_embeddings(sf_dir).map_batches(
        partial_topk,
        fn_kwargs={"ref": q_ref, "k": k},
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    empty = pa.table(
        {
            "query_id": pa.array([], type=pa.int64()),
            "neighbor_id": pa.array([], type=pa.int64()),
            "rank": pa.array([], type=pa.int64()),
        }
    )

    def final(group: pa.Table) -> pa.Table:
        # multi-group kernel over ALL candidate rows (n_queries x
        # batches x k — bounded by construction): one lexsort segments
        # the candidates by query, then per-query top-k slices
        qid = group["query_id"].to_numpy(zero_copy_only=False)
        nid = group["neighbor_id"].to_numpy(zero_copy_only=False)
        cos = group["cos"].to_numpy(zero_copy_only=False)
        order = np.lexsort((nid, -cos, qid))
        qs = qid[order]
        starts = np.flatnonzero(np.r_[True, qs[1:] != qs[:-1]])
        ends = np.r_[starts[1:], len(qs)]
        keep = np.concatenate(
            [order[s : min(s + k, e)] for s, e in zip(starts, ends)]
        ) if len(qs) else np.empty(0, dtype=np.int64)
        ranks = np.concatenate(
            [np.arange(1, min(s + k, e) - s + 1) for s, e in zip(starts, ends)]
        ) if len(qs) else np.empty(0, dtype=np.int64)
        return pa.table(
            {
                "query_id": pa.array(qid[keep], type=pa.int64()),
                "neighbor_id": pa.array(nid[keep], type=pa.int64()),
                "rank": pa.array(ranks, type=pa.int64()),
            }
        )

    from dedup_ray.core import global_kernel

    return global_kernel(partials, final, empty_result=empty)


COSINE_TOPK_SQL = """
-- null semantics STATED: rows with a NULL embedding carry no vector
-- and are excluded on both sides (the engine drops null rows
-- identically).  MATERIALIZED is required: DuckDB otherwise inlines
-- the CTE and evaluates list_cosine_similarity (which ERRORS on NULL
-- lists) before the null filter.
WITH nn AS MATERIALIZED (
  SELECT vec_id, embedding FROM embeddings WHERE embedding IS NOT NULL
),
q AS (SELECT vec_id, embedding FROM nn WHERE vec_id < 3),
scored AS (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(e.embedding, q.embedding) AS c
  FROM nn e, q WHERE e.vec_id <> q.vec_id
), ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank FROM ranked WHERE rank <= 5
"""


def cosine_near_pairs(sf_dir: str, *, threshold: float = 0.35) -> ray.data.Dataset:
    """All pairs (a < b) with cosine >= threshold — broadcast full
    matrix, per-batch matmul row-block vs everything."""
    all_ids, all_m = _collect_matrix(sf_dir)
    if len(all_ids) == 0:
        # empty / all-null embeddings table: no vectors, no pairs —
        # and 0-row blocks would bypass pair_finder, losing its schema
        return ray.data.from_arrow(
            pa.table(
                {
                    "id_a": pa.array([], type=pa.int64()),
                    "id_b": pa.array([], type=pa.int64()),
                }
            )
        )
    norms = np.linalg.norm(all_m, axis=1, keepdims=True)
    all_zero = (norms == 0).ravel()
    norms[all_zero] = 1.0
    all_n = all_m / norms
    ref = ray.put((all_ids, all_n, all_zero))

    def pair_finder(t: pa.Table, *, r, th: float) -> pa.Table:
        all_ids2, all_m2, az = _worker_obj(r)
        ids, m = _batch_matrix(t)
        if len(ids) == 0:
            # all-null batch: (0, 1) matrix cannot meet the corpus width
            return pa.table(
                {
                    "id_a": pa.array([], type=pa.int64()),
                    "id_b": pa.array([], type=pa.int64()),
                }
            )
        nn = np.linalg.norm(m, axis=1, keepdims=True)
        bzero = (nn == 0).ravel()
        nn[bzero] = 1.0
        m = m / nn
        cos = m @ all_m2.T
        # zero vectors score -1.0 against anything (oracle convention)
        cos[bzero, :] = -1.0
        cos[:, az] = -1.0
        rows, cols = np.nonzero(cos >= th)
        a = ids[rows]
        b = all_ids2[cols]
        keep = a < b
        return pa.table(
            {
                "id_a": pa.array(a[keep], type=pa.int64()),
                "id_b": pa.array(b[keep], type=pa.int64()),
            }
        )

    return _read_embeddings(sf_dir).map_batches(
        pair_finder,
        fn_kwargs={"r": ref, "th": threshold},
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


COSINE_NEAR_PAIRS_SQL = """
-- null embeddings carry no vector: excluded on both sides (stated
-- null semantics; engine drops null rows identically).  MATERIALIZED:
-- see COSINE_TOPK_SQL.
WITH nn AS MATERIALIZED (
  SELECT vec_id, embedding FROM embeddings WHERE embedding IS NOT NULL
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b
FROM nn a, nn b
WHERE a.vec_id < b.vec_id
  AND list_cosine_similarity(a.embedding, b.embedding) >= 0.35
"""


def _allpairs_into(
    m: np.ndarray,
    seg_ids: np.ndarray,
    threshold: float,
    out_a: list,
    out_b: list,
) -> None:
    """Exact cosine all-pairs >= threshold over one co-located segment
    (one matmul); appends canonical (min, max) id pairs."""
    L = len(seg_ids)
    if L < 2:
        return
    cos = m @ m.T
    # stored vectors are pre-normalized; an all-zero row is a
    # zero-norm original -> -1.0 against anything (oracle convention)
    z = ~m.any(axis=1)
    if z.any():
        cos[z, :] = -1.0
        cos[:, z] = -1.0
    iu, jv = np.triu_indices(L, k=1)
    keep = cos[iu, jv] >= threshold
    if not keep.any():
        return
    a, b = seg_ids[iu[keep]], seg_ids[jv[keep]]
    out_a.append(np.minimum(a, b))
    out_b.append(np.maximum(a, b))


def _segment_pairs_capped(
    m: np.ndarray,
    seg_ids: np.ndarray,
    threshold: float,
    bucket_cap: int,
    out_a: list,
    out_b: list,
) -> bool:
    """One bucket/list segment -> near pairs, with the skew guard
    shared by the hyperplane-LSH and IVF pair sources (same shape as
    the text path, lsh.fused_candidate_pairs): a segment above
    ``bucket_cap`` is SALTED into sub-groups of <= cap rows by a stable
    mix(vec_id), all-pairs runs within each sub-group, and cross-salt
    connectivity is recovered through all-pairs over the per-salt
    representatives.  Returns True when the segment was salted (the
    caller emits a log row — skew is never silent)."""
    L = len(seg_ids)
    if L <= bucket_cap:
        _allpairs_into(m, seg_ids, threshold, out_a, out_b)
        return False
    from dedup_ray.util import splitmix64

    n_salts = -(-L // bucket_cap)
    salts = (splitmix64(seg_ids.view(np.uint64)) % np.uint64(n_salts)).astype(
        np.int64
    )
    order2 = np.lexsort((seg_ids, salts))
    seg_ids2, m2 = seg_ids[order2], m[order2]
    s2, l2 = segments(salts[order2])
    rep_rows = []
    for ss, LL in zip(s2.tolist(), l2.tolist()):
        _allpairs_into(m2[ss : ss + LL], seg_ids2[ss : ss + LL], threshold, out_a, out_b)
        rep_rows.append(ss)
    rep_rows = np.array(rep_rows, dtype=np.int64)
    _allpairs_into(m2[rep_rows], seg_ids2[rep_rows], threshold, out_a, out_b)
    return True


def ann_lsh_pairs(
    sf_dir: str,
    *,
    threshold: float = 0.35,
    n_bits: int | None = 4,
    n_tables: int = 32,
    seed: int = 7,
    bucket_cap: int = 1024,
    hot_log: list | None = None,
) -> ray.data.Dataset:
    """Scale-path approximate near-pair search: random-hyperplane LSH.

    Each of ``n_tables`` hash tables buckets vectors by the sign
    pattern of ``n_bits`` random projections; exact cosine is computed
    only within buckets.  Recall for cos >= t pairs per table is
    (1 - acos(t)/pi)^n_bits, boosted across tables to
    1 - (1 - r)^n_tables — at the default (t=0.35, 4 bits, 32 tables)
    ~0.99.  For a high threshold like 0.9 the per-table recall is much
    higher, so fewer/wider tables suffice.  ``n_bits=None`` derives the
    width from the corpus row count (parquet-metadata count, no scan)
    so buckets stay ~256 rows in expectation; raising n_bits lowers
    per-table recall, so n_tables should grow with it.
    Slim shuffle rows (table, bucket, id, vector); no broadcast of the
    corpus.

    Skew guard (same shape as the text path, lsh.fused_candidate_pairs):
    a bucket larger than ``bucket_cap`` (duplicated embeddings, zero
    vectors, a degenerate hyperplane draw) would cost O(L^2) exact
    cosines; instead it is SALTED into sub-buckets of at most cap rows
    by a stable mix(vec_id), all-pairs runs within each sub-bucket,
    cross-salt connectivity is recovered through all-pairs over the
    per-salt representatives, and a LOG ROW per capped bucket is
    emitted (collected into ``hot_log`` and warned — never silent).
    Within a hot bucket the non-rep cross-salt pairs are dropped; the
    other n_tables-1 tables re-offer them, and for the clustering
    consumer (embedding_dedup) the rep edges preserve connectivity
    exactly like the text-LSH star topology.
    """
    if n_bits is None:
        n_rows = _read_embeddings(sf_dir).count()
        n_bits = max(4, int(np.ceil(np.log2(max(1, n_rows / 256)))))
    rng = np.random.Generator(np.random.PCG64(seed))
    # dim from the footer: for the 64-wide fixtures the draw sequence
    # is identical to the old hardcoded shape, so anchors are unchanged
    planes = rng.standard_normal((n_tables, n_bits, _embedding_dim(sf_dir)))
    p_ref = ray.put(planes)

    def bucketer(t: pa.Table, *, r) -> pa.Table:
        """Emits SLIM (tbl, bucket, vec_id) rows — the 4-KB embedding
        payload never rides the n_tables-amplified shuffle."""
        planes_w = _worker_obj(r)
        ids, m = _batch_matrix(t)
        if len(ids) == 0:
            # all-null batch: (0, 1) matrix cannot meet the plane width
            return pa.table(
                {
                    "tbl": pa.array([], type=pa.int64()),
                    "bucket": pa.array([], type=pa.int64()),
                    "vec_id": pa.array([], type=pa.int64()),
                }
            )
        tbls, bks, oids = [], [], []
        weights = (1 << np.arange(n_bits)).astype(np.int64)
        for ti in range(n_tables):
            proj = m @ planes_w[ti].T  # (n, bits)
            bits = (proj >= 0).astype(np.int64)
            bucket = bits @ weights
            tbls.append(np.full(len(ids), ti, dtype=np.int64))
            bks.append(bucket)
            oids.append(ids)
        return pa.table(
            {
                "tbl": pa.array(np.concatenate(tbls), type=pa.int64()),
                "bucket": pa.array(np.concatenate(bks), type=pa.int64()),
                "vec_id": pa.array(np.concatenate(oids), type=pa.int64()),
            }
        )

    bucketed = _read_embeddings(sf_dir).map_batches(
        bucketer,
        fn_kwargs={"r": p_ref},
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    # vectors come back to the buckets via the union + doc-id partition
    # kernel semi-join (same shape as lsh.verify_pairs): NO driver
    # collect, NO broadcast of the corpus matrix.  Honest volume note:
    # a vector appears in one bucket per table, so the bucket-keyed
    # exchange moves n_tables x vector volume — inherent to multi-table
    # LSH, but fully distributed.
    from dedup_ray.core import numeric_key_u64, partitioned_kernel, segments
    from dedup_ray.util import binary_to_u64_matrix, u64_matrix_to_binary

    tall_empty = pa.table(
        {
            "gkey": pa.array([], type=pa.int64()),
            "tbl": pa.array([], type=pa.int64()),
            "bucket": pa.array([], type=pa.int64()),
            "slot": pa.array([], type=pa.int32()),
            "vec": pa.array([], type=pa.binary()),
        }
    )

    def vec_rows(t: pa.Table) -> pa.Table:
        if "vec_id" not in t.column_names or len(t) == 0:
            return tall_empty
        ids, m = _batch_matrix(t)
        if len(ids) == 0:
            # all-null batch: (0, 1) binary rows would mis-advertise the
            # vector width to the partition kernel's decoder
            return tall_empty
        nrm = np.linalg.norm(m, axis=1, keepdims=True)
        nrm[nrm == 0] = 1.0
        m = np.ascontiguousarray(m / nrm)
        n = len(ids)
        return pa.table(
            {
                "gkey": pa.array(ids, type=pa.int64()),
                "tbl": pa.array(np.zeros(n, dtype=np.int64)),
                "bucket": pa.array(np.zeros(n, dtype=np.int64)),
                "slot": pa.array(np.full(n, -1, dtype=np.int32)),
                "vec": u64_matrix_to_binary(m.view(np.uint64)),
            }
        )

    def member_rows(t: pa.Table) -> pa.Table:
        if "tbl" not in t.column_names or len(t) == 0:
            return tall_empty
        n = len(t)
        return pa.table(
            {
                "gkey": t["vec_id"],
                "tbl": t["tbl"],
                "bucket": t["bucket"],
                "slot": pa.array(np.zeros(n, dtype=np.int32)),
                "vec": pa.nulls(n, type=pa.binary()),
            }
        )

    tall = _read_embeddings(sf_dir).map_batches(
        vec_rows, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        bucketed.map_batches(member_rows, batch_format="pyarrow", zero_copy_batch=True)
    )

    attach_empty = pa.table(
        {
            "tbl": pa.array([], type=pa.int64()),
            "bucket": pa.array([], type=pa.int64()),
            "vec_id": pa.array([], type=pa.int64()),
            "vec": pa.array([], type=pa.binary()),
        }
    )

    def attach_kernel(g: pa.Table) -> pa.Table:
        gkeys = g["gkey"].to_numpy(zero_copy_only=False)
        slots = g["slot"].to_numpy(zero_copy_only=False)
        order = np.lexsort((slots, gkeys))
        gs = gkeys[order]
        starts, lens = segments(gs)
        slots_sorted = slots[order]
        has_vec = slots_sorted[starts] == -1
        seg_id = np.repeat(np.arange(len(starts)), lens)
        member = (slots_sorted >= 0) & has_vec[seg_id]
        if not member.any():
            return attach_empty
        take_rows = pa.array(order[member])
        src = pa.array(order[starts[seg_id][member]])
        return pa.table(
            {
                "tbl": g["tbl"].take(take_rows),
                "bucket": g["bucket"].take(take_rows),
                "vec_id": g["gkey"].take(take_rows),
                "vec": g["vec"].take(src),
            }
        )

    attached = partitioned_kernel(
        tall,
        lambda t: t["gkey"].to_numpy(zero_copy_only=False).view(np.uint64),
        attach_kernel,
        num_partitions=32,
        empty_result=attach_empty,
    )

    kernel_empty = pa.table(
        {
            "id_a": pa.array([], type=pa.int64()),
            "id_b": pa.array([], type=pa.int64()),
            "meta": pa.array([], type=pa.int32()),
        }
    )

    def within_kernel(g: pa.Table) -> pa.Table:
        """All buckets of this partition at once: segment by (tbl,
        bucket), per-segment exact cosine via one matmul.  Buckets
        larger than bucket_cap are salted (see docstring); each emits
        a meta=1 log row (id_a=bucket size, id_b=table)."""
        k = numeric_key_u64(g, ["tbl", "bucket"])
        ids = g["vec_id"].to_numpy(zero_copy_only=False)
        tbl_col = g["tbl"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, k))
        starts, lens = segments(k[order])
        vec_sorted = g["vec"].take(pa.array(order))
        dim_bytes = len(vec_sorted[0].as_py()) if len(vec_sorted) else 0
        dim = dim_bytes // 8
        mats = binary_to_u64_matrix(vec_sorted, dim).view(np.float64)
        ids_s = ids[order]
        tbls_s = tbl_col[order]
        out_a, out_b = [], []
        log_sizes, log_tbls = [], []

        for s, L in zip(starts.tolist(), lens.tolist()):
            if L < 2:
                continue
            salted = _segment_pairs_capped(
                mats[s : s + L], ids_s[s : s + L], threshold, bucket_cap, out_a, out_b
            )
            if salted:
                log_sizes.append(L)
                log_tbls.append(int(tbls_s[s]))
        n_pairs = sum(len(p) for p in out_a)
        n_logs = len(log_sizes)
        if n_pairs == 0 and n_logs == 0:
            return kernel_empty
        a_out = np.concatenate(
            (out_a if out_a else [])
            + ([np.array(log_sizes, dtype=np.int64)] if n_logs else [])
        )
        b_out = np.concatenate(
            (out_b if out_b else [])
            + ([np.array(log_tbls, dtype=np.int64)] if n_logs else [])
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
        attached,
        lambda t: numeric_key_u64(t, ["tbl", "bucket"]),
        within_kernel,
        num_partitions=32,
        empty_result=kernel_empty,
    )

    pairs_empty = pa.table(
        {
            "id_a": pa.array([], type=pa.int64()),
            "id_b": pa.array([], type=pa.int64()),
        }
    )
    import pyarrow.compute as _pc

    # log stream: filtered DISTRIBUTEDLY first, so only the (tiny: one
    # row per capped bucket) log ever reaches the driver
    log_rows = fused.map_batches(
        lambda t: t.filter(_pc.equal(t["meta"], 1)).select(["id_a", "id_b"])
        if "meta" in t.column_names
        else pairs_empty,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    import logging

    logger = logging.getLogger(__name__)
    for b in log_rows.iter_batches(batch_format="pyarrow", batch_size=65536):
        if "id_a" not in b.column_names:
            continue
        for size, tbl in zip(b["id_a"].to_pylist(), b["id_b"].to_pylist()):
            entry = {
                "table": tbl,
                "bucket_size": size,
                "n_salts": -(-size // bucket_cap),
            }
            if hot_log is not None:
                hot_log.append(entry)
            logger.warning(
                "ann_lsh hot bucket salted: table=%d size=%d cap=%d "
                "(raise n_bits to shrink buckets)",
                tbl,
                size,
                bucket_cap,
            )
    pairs = fused.map_batches(
        lambda t: t.filter(_pc.equal(t["meta"], 0)).select(["id_a", "id_b"])
        if "meta" in t.column_names
        else pairs_empty,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    # dedupe across tables: hash-partition on the pair key + one
    # vectorized per-partition distinct — no sort shuffle, no
    # schema-less empty output blocks
    from dedup_ray.core import numeric_key_u64, partitioned_kernel

    return partitioned_kernel(
        pairs,
        lambda t: numeric_key_u64(t, ["id_a", "id_b"]),
        lambda g: g.group_by(["id_a", "id_b"]).aggregate([]),
        num_partitions=64,
        empty_result=pairs_empty,
    )


def embedding_dedup(
    sf_dir: str,
    *,
    threshold: float = 0.35,
    pairs_source: str = "exact",
    **source_kwargs,
) -> ray.data.Dataset:
    """Embedding-cosine near-dup CLUSTERING (the dedup variant of the
    similarity layer): near pairs above ``threshold`` -> union-find
    connected components -> every vector labeled with its component's
    MIN vec_id (singletons label themselves).

    ``pairs_source`` picks the near-pair generator:

    - ``"exact"`` (default, the ORACLE contract): broadcast all-pairs
      cosine — exact but collects the full matrix on the driver, so
      valid only while the table is small;
    - ``"ann_lsh"``: hyperplane-LSH buckets (``ann_lsh_pairs``) — the
      100-TB path: no driver collect, no corpus broadcast, capped +
      salted + logged buckets; recall tuned by n_bits/n_tables;
    - ``"ivf"``: IVF coarse-quantizer lists (``ivf.ivf_near_pairs``) —
      the other scale path; recall tuned by n_lists/n_probe.

    ``source_kwargs`` pass through to the chosen source.  Clustering is
    identical across sources; only pair RECALL differs (tested >= 0.98
    agreement on the fixtures, tests/test_embedding_dedup_sources.py).

    Scale shape (ALL sources — r3 VERDICT item 1): the cluster map
    stays a Dataset (``components_dataset``) and label attach is ONE
    vec_id-keyed hash exchange over slim int64 rows — same composition
    as ``jaccard_dedup``/the flagship tail.  Zero ``ray.get`` of a
    cluster map anywhere: at 10^12 vectors with a high dup rate the
    pair-incident node set is a large fraction of the corpus, so a
    driver dict + ray.put broadcast is a driver materialization."""
    import pyarrow.compute as _pc

    from dedup_ray.core import partitioned_kernel, segments as _segments
    from dedup_ray.state.unionfind import components_dataset

    if pairs_source == "exact":
        pairs = cosine_near_pairs(sf_dir, threshold=threshold, **source_kwargs)
    elif pairs_source == "ann_lsh":
        pairs = ann_lsh_pairs(sf_dir, threshold=threshold, **source_kwargs)
    elif pairs_source == "ivf":
        from dedup_ray.stages.ivf import ivf_near_pairs

        pairs = ivf_near_pairs(sf_dir, threshold=threshold, **source_kwargs)
    else:
        raise ValueError(f"unknown pairs_source: {pairs_source!r}")

    comp = components_dataset(pairs, u_col="id_a", v_col="id_b")

    tall_empty = pa.table(
        {
            "node": pa.array([], type=pa.int64()),
            "cluster_id": pa.array([], type=pa.int64()),
        }
    )

    def member_rows(t: pa.Table) -> pa.Table:
        if "vec_id" not in t.column_names or len(t) == 0:
            return tall_empty
        return pa.table(
            {
                "node": t["vec_id"],
                "cluster_id": pa.nulls(len(t), type=pa.int64()),
            }
        )

    def comp_rows(t: pa.Table) -> pa.Table:
        if "node" not in t.column_names or len(t) == 0:
            return tall_empty
        return pa.table(
            {
                "node": _pc.cast(t["node"], pa.int64()),
                "cluster_id": _pc.cast(t["cluster_id"], pa.int64()),
            }
        )

    tall = (
        ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id"])
        .map_batches(member_rows, batch_format="pyarrow", zero_copy_batch=True)
        .union(comp.map_batches(comp_rows, batch_format="pyarrow", zero_copy_batch=True))
    )

    out_empty = pa.table(
        {
            "vec_id": pa.array([], type=pa.int64()),
            "cluster_id": pa.array([], type=pa.int64()),
        }
    )

    def relabel_kernel(g: pa.Table) -> pa.Table:
        """Per node (<= 2 rows: the member row with null cluster, plus
        at most one component row): emit one row per MEMBER node with
        the component label when present, else self.  Null masks come
        from the Arrow validity bitmap — no per-row Python."""
        nodes = g["node"].to_numpy(zero_copy_only=False)
        cl = g["cluster_id"].combine_chunks()
        isnull = _pc.is_null(cl).to_numpy(zero_copy_only=False)
        clv = _pc.fill_null(cl, 0).to_numpy(zero_copy_only=False)
        order = np.lexsort((isnull, nodes))  # labeled row sorts first
        n_s, null_s, cl_s = nodes[order], isnull[order], clv[order]
        starts, lens = _segments(n_s)
        # a segment is a member iff its LAST row is the null member row
        last = starts + lens - 1
        has_member = null_s[last]
        firsts = starts[has_member]
        node_out = n_s[firsts]
        lab = np.where(null_s[firsts], node_out, cl_s[firsts])
        return pa.table(
            {
                "vec_id": pa.array(node_out, type=pa.int64()),
                "cluster_id": pa.array(lab, type=pa.int64()),
            }
        )

    return partitioned_kernel(
        tall,
        lambda t: t["node"].to_numpy(zero_copy_only=False).view(np.uint64),
        relabel_kernel,
        num_partitions=32,
        empty_result=out_empty,
    )


#: connected components in ANSI SQL: recursive transitive closure over
#: the thresholded similarity graph, then min reachable id per node
EMBEDDING_DEDUP_SQL = """
-- null embeddings form no edges (stated null semantics; engine drops
-- them from the pair matrix identically) but still seed themselves as
-- singleton clusters below, like the engine's vec_id member scan.
-- MATERIALIZED: see COSINE_TOPK_SQL.
WITH RECURSIVE nn AS MATERIALIZED (
  SELECT vec_id, embedding FROM embeddings WHERE embedding IS NOT NULL
), e AS (
  SELECT a.vec_id AS a, b.vec_id AS b
  FROM nn a, nn b
  WHERE a.vec_id < b.vec_id
    AND list_cosine_similarity(a.embedding, b.embedding) >= 0.35
), reach(a, b) AS (
  SELECT vec_id, vec_id FROM embeddings
  UNION
  SELECT r.a, CASE WHEN e.a = r.b THEN e.b ELSE e.a END
  FROM reach r JOIN e ON e.a = r.b OR e.b = r.b
)
SELECT a AS vec_id, cast(min(b) AS bigint) AS cluster_id
FROM reach GROUP BY a
"""
