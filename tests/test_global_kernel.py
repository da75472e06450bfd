"""core.global_kernel — the tiny-global-combine tail used by every
partial-aggregate query (one typed block, no sort shuffle, no
schema-less empties), plus the query-level edges it introduced."""

import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from dedup_ray.core import global_kernel  # noqa: E402


def _empty(schema: dict) -> pa.Table:
    return pa.table({k: pa.array([], t) for k, t in schema.items()})


def test_global_kernel_combines_all_blocks_in_one_typed_block(ray_session):
    import ray.data as rd

    blocks = [
        pa.table({"k": ["a", "b"], "n": [1, 2]}),
        pa.table({"k": ["b", "c"], "n": [3, 4]}),
        pa.table({"k": ["a"], "n": [5]}),
    ]
    ds = rd.from_arrow(blocks)

    def combine(g: pa.Table) -> pa.Table:
        m = g.group_by("k").aggregate([("n", "sum")])
        return pa.table({"k": m["k"], "n": m["n_sum"]})

    out = global_kernel(
        ds, combine, empty_result=_empty({"k": pa.string(), "n": pa.int64()})
    )
    got = {r["k"]: r["n"] for r in out.take_all()}
    assert got == {"a": 6, "b": 5, "c": 4}
    # ONE output block — the whole point (no empty partitions to warn on)
    assert len(out.to_arrow_refs()) == 1


def test_global_kernel_zero_rows_returns_fallback(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(_empty({"k": pa.string(), "n": pa.int64()}))
    fallback = pa.table({"k": pa.array(["ALL"]), "n": pa.array([0], pa.int64())})
    out = global_kernel(ds, lambda g: g, empty_result=fallback)
    # zero-row input short-circuits to the fallback VALUE (for plain
    # aggregates that is the typed empty table; for SQL-ROLLUP-style
    # tails it is the grand-total row)
    assert out.take_all() == [{"k": "ALL", "n": 0}]


def test_orders_rollup_empty_corpus_emits_grand_total(ray_session, tmp_path):
    """SQL `GROUP BY ROLLUP(...)` on an EMPTY table still yields the
    ('ALL','ALL',0,NULL) grand-total row — pinned since the rollup
    finalize moved into global_kernel (whose fallback IS that row)."""
    from dedup_ray.pipelines.relational import orders_rollup

    pq.write_table(
        pa.table(
            {
                "o_orderstatus": pa.array([], pa.string()),
                "o_orderpriority": pa.array([], pa.string()),
                "o_totalprice": pa.array([], pa.float64()),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    rows = orders_rollup(str(tmp_path)).take_all()
    assert rows == [
        {
            "o_orderstatus": "ALL",
            "o_orderpriority": "ALL",
            "n": 0,
            "sum_price": None,
        }
    ]


def test_topk_largest_groups_ties_across_partitions(ray_session):
    """Per-partition top-k candidates must keep the GLOBAL ordering
    (n desc, sha asc) exact under heavy ties: many groups share the
    top count, scattered across hash partitions, and only the k
    lexicographically-smallest shas may win."""
    import ray.data as rd

    from dedup_ray.stages.exact import topk_largest_groups

    rng = np.random.default_rng(7)
    shas = [f"{i:064x}" for i in range(40)]
    rows_sha, rows_key = [], []
    for i, s in enumerate(shas):
        n = 3 if i < 25 else 1 + int(rng.integers(0, 2))  # 25-way tie at 3
        rows_sha += [s] * n
        rows_key += [i * 2654435761 % (2**63)] * n
    order = rng.permutation(len(rows_sha))
    tbl = pa.table(
        {
            "content_sha256": pa.array(np.array(rows_sha, dtype=object)[order]),
            "sha_u64": pa.array(np.array(rows_key)[order], pa.int64()),
        }
    )
    # many small blocks so candidates really come from many partitions
    blocks = [tbl.slice(i, 7) for i in range(0, len(tbl), 7)]
    out = topk_largest_groups(rd.from_arrow(blocks), k=10).take_all()
    assert [r["n"] for r in out] == [3] * 10
    assert [r["content_sha256"] for r in out] == sorted(shas[:25])[:10]


def test_exact_members_empty_partitions_keep_lang_schema(ray_session):
    """On dup-heavy corpora with fewer distinct shas than partitions,
    zero-row reduce partitions must emit the SAME schema as populated
    ones (incl. the conditional lang column) — mixed schemas trigger
    Ray 2.49's 'RefBundle with a different schema' warning through
    every downstream stage."""
    import ray
    import ray.data as rd

    from dedup_ray.stages.exact import exact_members
    from dedup_ray.util import hash_urls_u64

    urls = [f"https://x/{i}" for i in range(12)]
    tbl = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "doc_id": pa.array(
                hash_urls_u64(urls).view(np.int64), pa.int64()
            ),
            "content_sha256": pa.array(["a" * 64] * 12, pa.string()),
            "sha_u64": pa.array([123] * 12, pa.int64()),
            "n_chars": pa.array([5] * 12, pa.int64()),
            "priority": pa.array([0] * 12, pa.int64()),
            "text": pa.array(["hello"] * 12, pa.string()),
            "lang": pa.array(["en"] * 12, pa.string()),
        }
    )
    out = exact_members(rd.from_arrow(tbl), num_partitions=8).materialize()
    schemas = {
        tuple(ray.get(ref).column_names) for ref in out.to_arrow_refs()
    }
    assert len(schemas) == 1, schemas
    assert "lang" in next(iter(schemas))
