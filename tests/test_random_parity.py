"""Randomized oracle parity (slow): random tables with dense
TIES (coarse timestamps, duplicate prices, repeated texts) in the
testdata layout; every applicable oracled query must match DuckDB
bit-exactly on data the fixed fixtures never cover.  This is the
tie-break / null-handling stressor — 4 ad-hoc seeds ran clean before
this was committed (seed 0 pinned here).
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

QUERIES = [
    "events_sessionize", "asof_last_click", "events_interarrival",
    "events_daily_top_type", "events_value_quantiles", "events_hourly_window",
    "distinct_users_by_type", "distinct_event_types",
    "top2_orders_per_customer", "sort_limit_orders", "orders_rollup",
    "join_orders_customer", "customers_without_orders",
    "word_topk", "length_histogram", "dedup_rate_by_source",
    "count_by_lang", "exact_dedup", "exact_dup_stats", "topk_largest_clusters",
    "token_count", "quality_score", "redact_text", "repetition_stats",
    "quality_filter_verdicts", "incremental_exact_dedup",
]


def _gen(d: str, seed: int) -> None:
    rng = np.random.Generator(np.random.PCG64(1000 + seed))
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    n_ev = int(rng.integers(50, 3000))
    ts = (np.sort(rng.integers(0, 50, n_ev)) * 3_600_000_000
          + rng.integers(0, 5, n_ev) * 1_000_000)
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": pa.array(ts.astype("datetime64[us]")),
        "user_id": pa.array(rng.integers(1, 8, n_ev), pa.int64()),
        "event_type": pa.array(rng.choice(["click", "view", "buy"], n_ev)),
        "value": pa.array(np.round(rng.normal(50, 20, n_ev), 2)),
        "props": pa.array(["{}"] * n_ev),
    }), f"{d}/events.parquet")
    n_c = int(rng.integers(5, 60))
    pq.write_table(pa.table({
        "c_custkey": pa.array(np.arange(1, n_c + 1), pa.int64()),
        "c_name": pa.array([f"Customer{i}" for i in range(n_c)]),
        "c_nationkey": pa.array(rng.integers(0, 5, n_c), pa.int32()),
        "c_acctbal": pa.array(np.round(rng.normal(0, 1000, n_c), 2)),
        "c_mktsegment": pa.array(rng.choice(["A", "B"], n_c)),
    }), f"{d}/customer.parquet")
    n_o = int(rng.integers(20, 2000))
    pq.write_table(pa.table({
        "o_orderkey": pa.array(np.arange(1, n_o + 1), pa.int64()),
        "o_custkey": pa.array(rng.integers(1, n_c + 1, n_o), pa.int64()),
        "o_orderstatus": pa.array(rng.choice(["O", "F", "P"], n_o)),
        "o_totalprice": pa.array(rng.integers(1, 20, n_o).astype(np.float64) * 100.0),
        "o_orderdate": pa.array(
            (rng.integers(0, 1000, n_o) * 86_400_000_000).astype("datetime64[us]")),
        "o_orderpriority": pa.array(rng.choice(["1-URGENT", "3-MEDIUM"], n_o)),
    }), f"{d}/orders.parquet")
    n_d = int(rng.integers(20, 300))
    texts = rng.choice(["", "   ", "alpha beta gamma", "alpha beta gamma",
                        "delta " * 30, "unique " + "x" * 50], n_d)
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(n_d), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(rng.choice(["en", "de", "fr"], n_d)),
        "source": pa.array(rng.choice([f"src{i}" for i in range(4)], n_d)),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), f"{d}/documents.parquet")


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return df[sorted(df.columns)].sort_values(by=sorted(df.columns),
                                              ignore_index=True)


@pytest.mark.slow
def test_randomized_oracle_parity(ray_session, tmp_path):
    d = str(tmp_path / "randsf")
    _gen(d, seed=0)
    con = duckdb.connect()
    for t in ("events", "orders", "customer", "documents"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')")
    qs, osql = m.queries(), m.oracle_sql()
    bad = []
    for name in QUERIES:
        assert name in osql, f"{name} lost its oracle"
        got = qs[name](d)
        got = got.to_pandas() if hasattr(got, "to_pandas") else got
        want = con.sql(osql[name]).df()
        try:
            pd.testing.assert_frame_equal(_norm(got), _norm(want), check_dtype=False)
        except AssertionError as e:
            bad.append((name, str(e)[:200]))
    con.close()
    assert not bad, bad


def _nullify(d: str, rng) -> None:
    """Inject ~8% nulls into every nullable column of the generated
    tables — the adversarial class behind the round-5 parity fixes
    (null sort keys, null group keys, null aggregates)."""
    for fname, cols in [
        ("events.parquet", ["event_type", "user_id", "value", "ts"]),
        ("orders.parquet", ["o_orderstatus", "o_totalprice", "o_orderpriority"]),
        ("customer.parquet", ["c_mktsegment"]),
        ("documents.parquet", ["text", "lang"]),
    ]:
        t = pq.read_table(f"{d}/{fname}")
        arrs = {}
        for name in t.column_names:
            col = t[name]
            if name in cols and len(t):
                mask = rng.random(len(t)) < 0.08
                vals = col.to_pylist()
                for i in np.flatnonzero(mask):
                    vals[i] = None
                col = pa.array(vals, type=t.schema.field(name).type)
            arrs[name] = col
        pq.write_table(pa.table(arrs), f"{d}/{fname}")


@pytest.mark.slow
def test_null_fuzzed_oracle_parity(ray_session, tmp_path):
    """Seed 12 caught sort_limit_orders diverging on null o_totalprice
    (Ray's sort vs DuckDB's NULLS LAST); seeds 11-18 ran clean after
    the fix.  Seed 12 pinned."""
    d = str(tmp_path / "nullsf")
    _gen(d, seed=12)
    _nullify(d, np.random.default_rng(12))
    con = duckdb.connect()
    for t in ("events", "orders", "customer", "documents"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')")
    qs, osql = m.queries(), m.oracle_sql()
    bad = []
    for name in QUERIES:
        got = qs[name](d)
        got = got.to_pandas() if hasattr(got, "to_pandas") else got
        want = con.sql(osql[name]).df()
        try:
            pd.testing.assert_frame_equal(_norm(got), _norm(want), check_dtype=False)
        except AssertionError as e:
            bad.append((name, str(e)[:200]))
    con.close()
    assert not bad, bad
