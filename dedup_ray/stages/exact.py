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
from ray.data.aggregate import Count, Sum


def _pick_winner(group: pa.Table) -> pa.Table:
    """Mark exactly one row per group canonical: min (priority, url)."""
    n = len(group)
    if n == 1:
        return group.append_column("is_canonical", pa.array([True]))
    prio = group["priority"].to_numpy(zero_copy_only=False)
    urls = group["url"].to_pylist()
    best = min(range(n), key=lambda i: (prio[i], urls[i]))
    mask = np.zeros(n, dtype=bool)
    mask[best] = True
    return group.append_column("is_canonical", pa.array(mask))


def exact_dedup_groups(
    hashed: ray.data.Dataset, *, num_partitions: int | None = None
) -> ray.data.Dataset:
    """hashed -> assignments(url, content_sha256, n_chars, priority,
    is_canonical).  One shuffle on content_sha256."""
    cols = ["url", "content_sha256", "n_chars", "priority"]
    ds = hashed.select_columns([c for c in cols if c in hashed.schema().names])
    return ds.groupby("content_sha256", num_partitions=num_partitions).map_groups(
        _pick_winner, batch_format="pyarrow"
    )


def _members_fn(group: pa.Table) -> pa.Table:
    """Per-sha group kernel for the flagship path: mark the winner
    (min (priority, url)), record winner_url + group size on every
    row, and keep ``text`` ONLY on the winner row (losers' text is
    byte-identical to the winner's, so dropping it here removes the
    duplicated payload from everything downstream — the web-scale
    'dedupe before you minhash' move)."""
    n = len(group)
    prio = group["priority"].to_numpy(zero_copy_only=False)
    urls = group["url"].to_pylist()
    best = min(range(n), key=lambda i: (prio[i], urls[i]))
    mask = np.zeros(n, dtype=bool)
    mask[best] = True
    winner = urls[best]
    texts = [group["text"][best].as_py() if m else None for m in mask]
    cols = {
        "url": group["url"],
        "content_sha256": group["content_sha256"],
        "n_chars": group["n_chars"],
        "priority": group["priority"],
        "winner_url": pa.array([winner] * n, type=pa.string()),
        "group_n": pa.array([n] * n, type=pa.int64()),
        "is_exact_winner": pa.array(mask),
        "text": pa.array(texts, type=pa.string()),
    }
    if "lang" in group.column_names:
        cols["lang"] = group["lang"]
    return pa.table(cols)


def exact_members(
    hashed: ray.data.Dataset, *, num_partitions: int | None = None
) -> ray.data.Dataset:
    """hashed (WITH text) -> members: url, content_sha256, n_chars,
    priority, winner_url, group_n, is_exact_winner, text (winner only).

    One full-corpus shuffle keyed by content_sha256 — the same shuffle
    the exact layer needs anyway; the near-dup layers run on winners
    only, so duplicated text is dropped at the earliest possible
    boundary."""
    return hashed.groupby("content_sha256", num_partitions=num_partitions).map_groups(
        _members_fn, batch_format="pyarrow"
    )


def exact_edges(assignments: ray.data.Dataset) -> ray.data.Dataset:
    """Star-topology exact-duplicate edges: (winner, loser) per group.

    Star instead of all-pairs keeps edge count linear in group size —
    union-find only needs connectivity, and the reference's
    container-first subsumption (A8) is likewise transitive.
    """

    def to_edges(group: pa.Table) -> pa.Table:
        if len(group) < 2:
            return pa.table(
                {
                    "u": pa.array([], type=pa.string()),
                    "v": pa.array([], type=pa.string()),
                    "kind": pa.array([], type=pa.string()),
                    "score": pa.array([], type=pa.float64()),
                }
            )
        urls = group["url"].to_pylist()
        canon = group["is_canonical"].to_numpy(zero_copy_only=False)
        w = urls[int(np.flatnonzero(canon)[0])]
        losers = [u for u in urls if u != w]
        return pa.table(
            {
                "u": pa.array([w] * len(losers), type=pa.string()),
                "v": pa.array(losers, type=pa.string()),
                "kind": pa.array(["exact"] * len(losers), type=pa.string()),
                "score": pa.array([1.0] * len(losers), type=pa.float64()),
            }
        )

    return assignments.groupby("content_sha256").map_groups(
        to_edges, batch_format="pyarrow"
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


def dup_stats(assignments: ray.data.Dataset) -> ray.data.Dataset:
    """Global duplicate statistics (reference A11) as a 1-row table."""
    partials = assignments.map_batches(
        _stats_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    out = partials.groupby(None).aggregate(
        Sum("n_pages", alias_name="n_pages"),
        Sum("n_distinct_hashes", alias_name="n_distinct_hashes"),
        Sum("n_dup_pages", alias_name="n_dup_pages"),
        Sum("reclaimable_chars", alias_name="reclaimable_chars"),
    )
    return out


def topk_largest_groups(hashed: ray.data.Dataset, k: int = 10) -> ray.data.Dataset:
    """Top-k exact-hash groups by size, deterministic order
    (n desc, content_sha256 asc) — reference A11's 'biggest offenders'
    view.  Pre-aggregation happens inside Ray's hash aggregate."""
    sizes = hashed.groupby("content_sha256").aggregate(Count(alias_name="n"))
    return sizes.sort(["n", "content_sha256"], descending=[True, False]).limit(k)
