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
