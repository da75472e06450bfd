"""NaN/inf VALUES (not nulls) in float columns vs DuckDB — the other
way a web-scale float column goes bad (failed parses, bad telemetry).

DuckDB orders NaN above every number (so NaN >= 0 is TRUE and NaN
sorts FIRST under ORDER BY ... DESC) while numpy comparisons are false
and numpy/Arrow sorts place NaN last; DuckDB's round(NaN) is NaN where
sql_round's from_pandas path used to null it; and nan_to_num in the
rollup zeroed genuine NaN sums and clamped inf to DBL_MAX.  Every
divergence these corpora caught is fixed and pinned here.
"""

import os
import shutil

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __ray_entry__ as m

EVENTS_FAMILY = [
    "events_value_quantiles", "union_shards", "sort_limit_orders",
    "top2_orders_per_customer", "orders_rollup", "events_hourly_window",
    "asof_last_click", "events_sessionize", "events_interarrival",
    "events_daily_top_type", "distinct_users_by_type",
    "distinct_event_types",
]
LINEITEM_FAMILY = [
    "grouped_agg_q1", "filter_lineitem", "scalar_functions",
    "part_revenue_by_brand", "tpch_q3_shipping", "tpch_q5_region_revenue",
    "customers_per_region", "join_orders_customer",
    "customers_without_orders",
]


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return df[sorted(df.columns)].sort_values(
        by=sorted(df.columns), ignore_index=True
    )


def _gen(d: str) -> None:
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    rng = np.random.default_rng(3)
    n_ev = 200
    vals = np.round(rng.normal(50, 20, n_ev), 2)
    vals[rng.random(n_ev) < 0.05] = np.nan
    vals[rng.random(n_ev) < 0.03] = np.inf
    vals[rng.random(n_ev) < 0.03] = -np.inf
    ts = (np.sort(rng.integers(0, 50, n_ev)) * 3_600_000_000
          + rng.integers(0, 5, n_ev) * 1_000_000)
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": pa.array(ts.astype("datetime64[us]")),
        "user_id": pa.array(rng.integers(1, 8, n_ev), pa.int64()),
        "event_type": pa.array(rng.choice(["click", "view", "buy"], n_ev)),
        "value": pa.array(vals, pa.float64()),
        "props": pa.array(["{}"] * n_ev),
    }), f"{d}/events.parquet")
    n_o = 200
    price = rng.integers(1, 20, n_o).astype(np.float64) * 100.0
    price[rng.random(n_o) < 0.06] = np.nan
    price[rng.random(n_o) < 0.04] = np.inf
    od = (rng.integers(8500, 10000, n_o) * 86_400_000_000).astype(
        "datetime64[us]")
    pq.write_table(pa.table({
        "o_orderkey": pa.array(np.arange(1, n_o + 1), pa.int64()),
        "o_custkey": pa.array(rng.integers(1, 31, n_o), pa.int64()),
        "o_orderstatus": pa.array(rng.choice(["O", "F"], n_o)),
        "o_totalprice": pa.array(price, pa.float64()),
        "o_orderdate": pa.array(od),
        "o_orderpriority": pa.array(
            rng.choice(["1-URGENT", "3-MEDIUM"], n_o)),
    }), f"{d}/orders.parquet")
    pq.write_table(pa.table({
        "r_regionkey": pa.array(np.arange(5, dtype=np.int32)),
        "r_name": pa.array(
            ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]),
    }), f"{d}/region.parquet")
    pq.write_table(pa.table({
        "n_nationkey": pa.array(np.arange(6, dtype=np.int32)),
        "n_name": pa.array([f"N{i}" for i in range(6)]),
        "n_regionkey": pa.array(np.array([0, 1, 2, 2, 3, 4], np.int32)),
    }), f"{d}/nation.parquet")
    n_c = 30
    bal = np.round(rng.normal(0, 1000, n_c), 2)
    bal[rng.random(n_c) < 0.1] = np.nan
    bal[rng.random(n_c) < 0.05] = np.inf
    pq.write_table(pa.table({
        "c_custkey": pa.array(np.arange(1, n_c + 1), pa.int64()),
        "c_name": pa.array([f"C{i}" for i in range(n_c)]),
        "c_nationkey": pa.array(rng.integers(0, 6, n_c).astype(np.int32)),
        "c_acctbal": pa.array(bal, pa.float64()),
        "c_mktsegment": pa.array(rng.choice(["BUILDING", "AUTO"], n_c)),
    }), f"{d}/customer.parquet")
    n_s = 10
    pq.write_table(pa.table({
        "s_suppkey": pa.array(np.arange(1, n_s + 1), pa.int64()),
        "s_name": pa.array([f"S{i}" for i in range(n_s)]),
        "s_nationkey": pa.array(rng.integers(0, 6, n_s).astype(np.int32)),
        "s_acctbal": pa.array(np.zeros(n_s), pa.float64()),
    }), f"{d}/supplier.parquet")
    n_p = 20
    pq.write_table(pa.table({
        "p_partkey": pa.array(np.arange(1, n_p + 1), pa.int64()),
        "p_name": pa.array([f"p{i}" for i in range(n_p)]),
        "p_brand": pa.array(rng.choice(["Brand#11", "Brand#12"], n_p)),
        "p_type": pa.array(["T"] * n_p),
        "p_size": pa.array(np.ones(n_p, dtype=np.int32)),
        "p_retailprice": pa.array(np.ones(n_p), pa.float64()),
    }), f"{d}/part.parquet")
    n_l = 800
    ep = np.round(rng.uniform(100, 50000, n_l), 2)
    ep[rng.random(n_l) < 0.06] = np.nan
    ep[rng.random(n_l) < 0.04] = np.inf
    disc = np.round(rng.choice([0.0, 0.05, 0.1], n_l), 2)
    disc[rng.random(n_l) < 0.05] = np.nan
    sd = (rng.integers(8500, 10500, n_l) * 86_400_000_000).astype(
        "datetime64[us]")
    pq.write_table(pa.table({
        "l_orderkey": pa.array(rng.integers(1, n_o + 1, n_l), pa.int64()),
        "l_partkey": pa.array(rng.integers(1, n_p + 1, n_l), pa.int64()),
        "l_suppkey": pa.array(rng.integers(1, n_s + 1, n_l), pa.int64()),
        "l_linenumber": pa.array(np.ones(n_l, dtype=np.int32)),
        "l_quantity": pa.array(
            rng.integers(1, 50, n_l).astype(np.float64), pa.float64()),
        "l_extendedprice": pa.array(ep, pa.float64()),
        "l_discount": pa.array(disc, pa.float64()),
        "l_tax": pa.array(np.zeros(n_l)),
        "l_returnflag": pa.array(rng.choice(["A", "N"], n_l)),
        "l_linestatus": pa.array(rng.choice(["O", "F"], n_l)),
        "l_shipdate": pa.array(sd),
    }), f"{d}/lineitem.parquet")


@pytest.mark.parametrize("family", [EVENTS_FAMILY, LINEITEM_FAMILY],
                         ids=["events_orders", "lineitem_joins"])
def test_nan_inf_value_parity(ray_session, tmp_path, family):
    d = str(tmp_path / "nansf")
    _gen(d)
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events"]:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')"
        )
    qs, osql = m.queries(), m.oracle_sql()
    bad = []
    for name in family:
        try:
            got = qs[name](d).to_pandas()
            want = con.sql(osql[name]).df()
            pd.testing.assert_frame_equal(
                _norm(got), _norm(want), check_dtype=False
            )
        except Exception as e:  # noqa: BLE001
            bad.append((name, f"{type(e).__name__}: {str(e)[:200]}"))
    con.close()
    assert not bad, bad
