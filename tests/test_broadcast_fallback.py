"""The broadcast-vs-exchange join gate (r3 VERDICT item 3): forcing
the above-cap exchange fallback (broadcast_max_rows=0) must reproduce
the broadcast plan's output BIT-EXACTLY on the same input — the gate
changes the physical plan, never the result.
"""

import pandas as pd
import pyarrow as pa
import pytest

from dedup_ray.pipelines.relational import (
    join_orders_customer,
    part_revenue_by_brand,
    tpch_q3_shipping,
    tpch_q5_region_revenue,
)


def _norm(ds) -> pd.DataFrame:
    df = ds.to_pandas()
    cols = sorted(df.columns)
    return df[cols].sort_values(by=cols, ignore_index=True)


@pytest.mark.parametrize(
    "fn",
    [
        join_orders_customer,
        tpch_q3_shipping,
        tpch_q5_region_revenue,
        part_revenue_by_brand,
    ],
    ids=[
        "join_orders_customer",
        "tpch_q3_shipping",
        "tpch_q5_region_revenue",
        "part_revenue_by_brand",
    ],
)
def test_exchange_fallback_matches_broadcast(fn, sf_oracle):
    broadcast = _norm(fn(sf_oracle))
    exchange = _norm(fn(sf_oracle, broadcast_max_rows=0))
    pd.testing.assert_frame_equal(broadcast, exchange)


def test_exchange_join_unique_dim_empty_dim(ray_session):
    """No dim rows -> inner join drops every fact row (no crash on the
    empty-probe edge)."""
    import ray.data

    from dedup_ray.core import exchange_join_unique_dim

    fact = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 2], pa.int64()), "x": pa.array([10.0, 20.0])})
    )
    dim = ray.data.from_arrow(
        pa.table({"k": pa.array([], pa.int64()), "p": pa.array([], pa.string())})
    )
    out = exchange_join_unique_dim(
        fact,
        dim,
        fact_key="k",
        dim_key="k",
        fact_fields=[("x", pa.float64())],
        dim_fields=[("p", pa.string())],
        num_partitions=4,
    )
    assert out.count() == 0


def test_exchange_join_matches_pandas_merge_random(ray_session):
    """exchange_join_unique_dim vs pandas inner merge over random
    shapes: dense/sparse key overlap, empty fact, empty dim, no-match,
    semi-join (dim_fields=[])."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from dedup_ray.core import exchange_join_unique_dim

    rng = np.random.Generator(np.random.PCG64(77))
    shapes = [(200, 30), (50, 50), (0, 10), (10, 0), (300, 5)]
    for n_fact, n_dim in shapes:
        fkeys = rng.integers(0, 60, n_fact).astype(np.int64)
        fval = rng.integers(0, 1000, n_fact).astype(np.int64)
        dkeys = rng.permutation(60)[:n_dim].astype(np.int64)  # unique
        dval = rng.integers(0, 9, n_dim).astype(np.int64)
        fact = ray.data.from_arrow(pa.table({
            "k": pa.array(fkeys), "v": pa.array(fval)}))
        dim = ray.data.from_arrow(pa.table({
            "dk": pa.array(dkeys), "dv": pa.array(dval)}))

        got = exchange_join_unique_dim(
            fact, dim, fact_key="k", dim_key="dk",
            fact_fields=[("k", pa.int64()), ("v", pa.int64())],
            dim_fields=[("dv", pa.int64())],
            num_partitions=8,
        ).to_pandas()
        want = pd.DataFrame({"k": fkeys, "v": fval}).merge(
            pd.DataFrame({"k": dkeys, "dv": dval}), on="k", how="inner")
        cols = ["k", "v", "dv"]
        if len(want) == 0:
            assert len(got) == 0, (n_fact, n_dim)
        else:
            got_s = got[cols].sort_values(cols, ignore_index=True)
            want_s = want[cols].sort_values(cols, ignore_index=True)
            pd.testing.assert_frame_equal(got_s, want_s, check_dtype=False)

        # semi-join variant
        semi = exchange_join_unique_dim(
            fact, dim, fact_key="k", dim_key="dk",
            fact_fields=[("k", pa.int64()), ("v", pa.int64())],
            dim_fields=[], num_partitions=8,
        ).to_pandas()
        want_semi = pd.DataFrame({"k": fkeys, "v": fval})
        want_semi = want_semi[want_semi["k"].isin(set(dkeys.tolist()))]
        assert len(semi) == len(want_semi), (n_fact, n_dim)


def test_unique_key_order_contract():
    """The broadcast-side mirror of the exchange guard: duplicate dim
    keys raise loudly; NaN (null) keys are excluded, never matched,
    and never false-positive the duplicate check."""
    import numpy as np

    from dedup_ray.core import unique_key_order

    keys = np.array([30, 10, 20], dtype=np.int64)
    order = unique_key_order(keys, name="k")
    assert keys[order].tolist() == [10, 20, 30]

    with pytest.raises(ValueError, match="'k' is not unique"):
        unique_key_order(np.array([1, 2, 2, 3], dtype=np.int64), name="k")

    fkeys = np.array([np.nan, 5.0, np.nan, 1.0])
    order = unique_key_order(fkeys, name="k")
    assert fkeys[order].tolist() == [1.0, 5.0]

    with pytest.raises(ValueError, match="is not unique"):
        unique_key_order(np.array([np.nan, 5.0, 5.0]), name="k")


def test_broadcast_join_dup_dim_key_raises(ray_session, tmp_path):
    """A dup-keyed customer dimension must fail LOUDLY on the broadcast
    plan (SQL fans out; a silent first-match would under-count)."""
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "o_custkey": pa.array([1, 2], pa.int64()),
                "o_totalprice": pa.array([10.0, 20.0]),
            }
        ),
        tmp_path / "orders.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([1, 1, 2], pa.int64()),
                "c_mktsegment": pa.array(["A", "B", "C"]),
            }
        ),
        tmp_path / "customer.parquet",
    )
    with pytest.raises(ValueError, match="c_custkey.* is not unique"):
        join_orders_customer(str(tmp_path))
