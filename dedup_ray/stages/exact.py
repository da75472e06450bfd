"""Exact-duplicate layer (SURVEY.md §2B B8, B14, B17).

Reference semantics being preserved (SURVEY.md §2A):
  - A6 ``HashMap.add``: digest -> entries multimap; every bucket with
    >= 2 live entries is a duplicate group.
  - A7 ``HashMap.resolve``: exactly ONE winner per group by a
    deterministic total order — here ``min((priority, url))``
    (priority is the analog of the reference's weight-adjusted depth
    preference; url the stable tie-break).
  - A11 summary stats: group counts / deletable entries / reclaimable
    bytes.

Ray-Data shape: the digest multimap IS a hash shuffle —
``groupby("content_sha256")`` — and winner selection is a vectorized
per-group kernel in ``map_groups``.  No driver-side iteration.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def exact_dedup_groups(
    hashed: ray.data.Dataset, *, num_partitions: int | None = None
) -> ray.data.Dataset:
    """hashed (with text) -> assignments(url, content_sha256, n_chars,
    priority, is_canonical).  One shuffle on the sha partition hash;
    winner selection via the vectorized members kernel."""
    members = exact_members(hashed, num_partitions=num_partitions)
    return members.map_batches(
        lambda t: pa.table(
            {
                "url": t["url"],
                "content_sha256": t["content_sha256"],
                "n_chars": t["n_chars"],
                "priority": t["priority"],
                "is_canonical": t["is_exact_winner"],
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _members_kernel(g: pa.Table) -> pa.Table:
    """Vectorized multi-group winner selection over one hash
    partition (all rows of any sha are co-located; see core.py).

    Per sha group: winner = min((priority, url)); every row gets
    winner_url + group size; ``text`` survives ONLY on winner rows
    (losers' text is byte-identical, so the duplicated payload is
    dropped at the earliest boundary — the web-scale 'dedupe before
    you minhash' move)."""
    from dedup_ray.util import ensure_doc_ids

    g = ensure_doc_ids(g)
    shas = np.array(g["content_sha256"].to_pylist(), dtype=object)
    urls = np.array(g["url"].to_pylist(), dtype=object)
    prio = g["priority"].to_numpy(zero_copy_only=False)
    ids = g["doc_id"].to_numpy(zero_copy_only=False)
    _, inv = np.unique(shas, return_inverse=True)
    order = np.lexsort((urls, prio, inv))
    from dedup_ray.core import segments

    starts, lens = segments(inv[order])
    n = len(g)
    is_winner_sorted = np.zeros(n, dtype=bool)
    is_winner_sorted[starts] = True
    winner_urls_sorted = np.repeat(urls[order][starts], lens)
    winner_ids_sorted = np.repeat(ids[order][starts], lens)
    group_n_sorted = np.repeat(lens, lens)

    gt = g.take(pa.array(order))
    mask = pa.array(is_winner_sorted)
    import pyarrow.compute as pc

    cols = {
        "url": gt["url"],
        "doc_id": gt["doc_id"],
        "content_sha256": gt["content_sha256"],
        "n_chars": gt["n_chars"],
        "priority": gt["priority"],
        "winner_url": pa.array(winner_urls_sorted, type=pa.string()),
        "winner_id": pa.array(winner_ids_sorted, type=pa.int64()),
        "group_n": pa.array(group_n_sorted, type=pa.int64()),
        "is_exact_winner": mask,
        "text": pc.if_else(mask, gt["text"], pa.scalar(None, pa.string())),
    }
    if "lang" in g.column_names:
        cols["lang"] = gt["lang"]
    return pa.table(cols)


_MEMBERS_EMPTY = pa.table(
    {
        "url": pa.array([], type=pa.string()),
        "doc_id": pa.array([], type=pa.int64()),
        "content_sha256": pa.array([], type=pa.string()),
        "n_chars": pa.array([], type=pa.int64()),
        "priority": pa.array([], type=pa.int64()),
        "winner_url": pa.array([], type=pa.string()),
        "winner_id": pa.array([], type=pa.int64()),
        "group_n": pa.array([], type=pa.int64()),
        "is_exact_winner": pa.array([], type=pa.bool_()),
        "text": pa.array([], type=pa.string()),
    }
)


def exact_members(
    hashed: ray.data.Dataset, *, num_partitions: int | None = None
) -> ray.data.Dataset:
    """hashed (WITH text) -> members: url, content_sha256, n_chars,
    priority, winner_url, group_n, is_exact_winner, text (winner only).

    One full-corpus shuffle keyed by the precomputed ``sha_u64``
    partition hash; winner selection runs as a vectorized kernel per
    hash partition (NOT per sha group — see core.partitioned_kernel)."""
    from dedup_ray.core import partitioned_kernel, schema_names

    def key_hash(t: pa.Table) -> np.ndarray:
        return t["sha_u64"].to_numpy(zero_copy_only=False).view(np.uint64)

    # mirror the kernel's conditional lang column in the empty result:
    # on dup-heavy corpora with fewer shas than partitions, zero-row
    # reduce partitions otherwise emit 10-column blocks beside the
    # populated 11-column ones — Ray 2.49 warns "RefBundle with a
    # different schema" through every downstream stage
    empty = _MEMBERS_EMPTY
    if "lang" in (schema_names(hashed) or ()):
        empty = empty.append_column("lang", pa.array([], type=pa.string()))

    return partitioned_kernel(
        hashed,
        key_hash,
        _members_kernel,
        num_partitions=num_partitions or 64,
        empty_result=empty,
    )


def _stats_partial(batch: pa.Table) -> pa.Table:
    """Per-batch partial aggregate (combiner) so the global groupby
    shuffles one row per block, not one per page (SURVEY.md §4)."""
    canon = batch["is_canonical"]
    loser = pc.invert(canon)
    return pa.table(
        {
            "n_pages": pa.array([len(batch)], type=pa.int64()),
            "n_distinct_hashes": pa.array(
                [pc.sum(pc.cast(canon, pa.int64())).as_py() or 0], type=pa.int64()
            ),
            "n_dup_pages": pa.array(
                [pc.sum(pc.cast(loser, pa.int64())).as_py() or 0], type=pa.int64()
            ),
            "reclaimable_chars": pa.array(
                [
                    pc.sum(
                        pc.if_else(loser, batch["n_chars"], pa.scalar(0, pa.int64()))
                    ).as_py()
                    or 0
                ],
                type=pa.int64(),
            ),
        }
    )


_STATS_COLS = ("n_pages", "n_distinct_hashes", "n_dup_pages", "reclaimable_chars")


def dup_stats(assignments: ray.data.Dataset) -> ray.data.Dataset:
    """Global duplicate statistics (reference A11) as a 1-row table.

    One partial row per block -> one typed global combine
    (core.global_kernel; a ``groupby(None).aggregate`` here would pay a
    sort shuffle and return an EMPTY table on a zero-row corpus — the
    typed zeroed row matches what SQL's ungrouped aggregate returns)."""
    from dedup_ray.core import global_kernel

    partials = assignments.map_batches(
        _stats_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    zero_row = pa.table(
        {c: pa.array([0], type=pa.int64()) for c in _STATS_COLS}
    )

    def combine(g: pa.Table) -> pa.Table:
        return pa.table(
            {
                c: pa.array([pc.sum(g[c]).as_py() or 0], type=pa.int64())
                for c in _STATS_COLS
            }
        )

    return global_kernel(partials, combine, empty_result=zero_row)


def topk_largest_groups(hashed: ray.data.Dataset, k: int = 10) -> ray.data.Dataset:
    """Top-k exact-hash groups by size, deterministic order
    (n desc, content_sha256 asc) — reference A11's 'biggest offenders'
    view.

    Shape: per-batch sha partials -> sha_u64-keyed hash exchange with
    a per-partition top-k (each partition holds COMPLETE counts for
    its shas, so its top-k under the final ordering is a valid
    candidate superset) -> one P x k global selection.  The full group
    census never reaches a sort."""
    import numpy as np

    from dedup_ray.core import global_kernel, partitioned_kernel

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["content_sha256", "sha_u64"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "content_sha256": g["content_sha256"],
                "sha_u64": g["sha_u64"],
                "n_part": pc.cast(g["count_all"], pa.int64()),
            }
        )

    partials = hashed.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    empty = pa.table(
        {
            "content_sha256": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
        }
    )

    def combine_topk(g: pa.Table) -> pa.Table:
        m = g.group_by(["content_sha256"]).aggregate([("n_part", "sum")])
        out = pa.table(
            {"content_sha256": m["content_sha256"], "n": pc.cast(m["n_part_sum"], pa.int64())}
        )
        return out.sort_by(
            [("n", "descending"), ("content_sha256", "ascending")]
        ).slice(0, k)

    candidates = partitioned_kernel(
        partials,
        lambda t: t["sha_u64"].to_numpy(zero_copy_only=False).view(np.uint64),
        combine_topk,
        num_partitions=64,
        empty_result=empty,
    )

    def final_topk(g: pa.Table) -> pa.Table:
        return g.sort_by(
            [("n", "descending"), ("content_sha256", "ascending")]
        ).slice(0, k)

    return global_kernel(candidates, final_topk, empty_result=empty)
