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
def _null(rng, vals, p, typ):
    out = list(vals)
    for i in np.flatnonzero(rng.random(len(out)) < p):
        out[i] = None
    return pa.array(out, typ)


def _gen_full(d, seed):
    rng = np.random.Generator(np.random.PCG64(7000 + seed))
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)

    # region / nation: tiny dims, include the required 'ASIA'
    rnames = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
    pq.write_table(pa.table({
        "r_regionkey": pa.array(np.arange(5, dtype=np.int32)),
        "r_name": pa.array(rnames),
    }), f"{d}/region.parquet")
    n_n = int(rng.integers(5, 12))
    pq.write_table(pa.table({
        "n_nationkey": pa.array(np.arange(n_n, dtype=np.int32)),
        "n_name": pa.array([f"NATION{i}" for i in range(n_n)]),
        # some nations point at no region (key 9 unmatched)
        "n_regionkey": pa.array(
            rng.choice([0, 1, 2, 2, 3, 4, 9], n_n).astype(np.int32)),
    }), f"{d}/nation.parquet")

    n_c = int(rng.integers(10, 80))
    pq.write_table(pa.table({
        "c_custkey": pa.array(np.arange(1, n_c + 1), pa.int64()),
        "c_name": pa.array([f"Customer{i}" for i in range(n_c)]),
        # nationkey 50 matches no nation
        "c_nationkey": pa.array(
            rng.choice(list(range(n_n)) + [50], n_c).astype(np.int32)),
        "c_acctbal": _null(rng, np.round(rng.normal(0, 1000, n_c), 2),
                           0.08, pa.float64()),
        "c_mktsegment": _null(
            rng, rng.choice(["BUILDING", "AUTOMOBILE", "MACHINERY"], n_c),
            0.08, pa.string()),
    }), f"{d}/customer.parquet")

    n_s = int(rng.integers(5, 40))
    pq.write_table(pa.table({
        "s_suppkey": pa.array(np.arange(1, n_s + 1), pa.int64()),
        "s_name": pa.array([f"Supplier{i}" for i in range(n_s)]),
        "s_nationkey": pa.array(
            rng.choice(list(range(n_n)) + [50], n_s).astype(np.int32)),
        "s_acctbal": _null(rng, np.round(rng.normal(0, 500, n_s), 2),
                           0.08, pa.float64()),
    }), f"{d}/supplier.parquet")

    n_p = int(rng.integers(10, 120))
    pq.write_table(pa.table({
        "p_partkey": pa.array(np.arange(1, n_p + 1), pa.int64()),
        "p_name": pa.array([f"part {i}" for i in range(n_p)]),
        "p_brand": _null(rng, rng.choice(
            [f"Brand#{b}" for b in (11, 12, 21, 22)], n_p), 0.08, pa.string()),
        "p_type": pa.array(rng.choice(["STANDARD", "SMALL"], n_p)),
        "p_size": pa.array(rng.integers(1, 50, n_p).astype(np.int32)),
        "p_retailprice": _null(rng, np.round(rng.uniform(100, 2000, n_p), 2),
                               0.08, pa.float64()),
    }), f"{d}/part.parquet")

    n_o = int(rng.integers(30, 1500))
    odate = (rng.integers(8000, 10500, n_o) * 86_400_000_000).astype(
        "datetime64[us]")  # ~1991-1998
    pq.write_table(pa.table({
        "o_orderkey": pa.array(np.arange(1, n_o + 1), pa.int64()),
        # some orders from unknown customers
        "o_custkey": _null(rng, rng.integers(1, n_c + 20, n_o),
                           0.05, pa.int64()),
        "o_orderstatus": _null(rng, rng.choice(["O", "F", "P"], n_o),
                               0.08, pa.string()),
        "o_totalprice": _null(
            rng, rng.integers(1, 20, n_o).astype(np.float64)
            * rng.choice([100.0, 20000.0], n_o),
            0.08, pa.float64()),
        "o_orderdate": _null(rng, list(odate), 0.08, pa.timestamp("us")),
        "o_orderpriority": _null(
            rng, rng.choice(["1-URGENT", "3-MEDIUM", "5-LOW"], n_o),
            0.08, pa.string()),
    }), f"{d}/orders.parquet")

    n_l = int(rng.integers(50, 4000))
    sdate = (rng.integers(8000, 10800, n_l) * 86_400_000_000).astype(
        "datetime64[us]")
    pq.write_table(pa.table({
        "l_orderkey": _null(rng, rng.integers(1, n_o + 5, n_l),
                            0.03, pa.int64()),
        "l_partkey": _null(rng, rng.integers(1, n_p + 5, n_l),
                           0.03, pa.int64()),
        "l_suppkey": _null(rng, rng.integers(1, n_s + 5, n_l),
                           0.03, pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 7, n_l).astype(np.int32)),
        "l_quantity": _null(rng, rng.integers(1, 50, n_l).astype(np.float64),
                            0.08, pa.float64()),
        "l_extendedprice": _null(
            rng, np.round(rng.uniform(100, 50000, n_l), 2), 0.08,
            pa.float64()),
        "l_discount": _null(rng, np.round(rng.choice(
            [0.0, 0.02, 0.05, 0.1], n_l), 2), 0.08, pa.float64()),
        "l_tax": pa.array(np.round(rng.uniform(0, 0.08, n_l), 2)),
        "l_returnflag": _null(rng, rng.choice(["A", "N", "R"], n_l),
                              0.08, pa.string()),
        "l_linestatus": _null(rng, rng.choice(["O", "F"], n_l),
                              0.08, pa.string()),
        "l_shipdate": _null(rng, list(sdate), 0.08, pa.timestamp("us")),
    }), f"{d}/lineitem.parquet")

    n_ev = int(rng.integers(50, 2000))
    ts = (np.sort(rng.integers(0, 50, n_ev)) * 3_600_000_000
          + rng.integers(0, 5, n_ev) * 1_000_000)
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": _null(rng, list(ts.astype("datetime64[us]")), 0.06,
                    pa.timestamp("us")),
        "user_id": _null(rng, rng.integers(1, 8, n_ev), 0.05, pa.int64()),
        "event_type": _null(rng, rng.choice(["click", "view", "buy"], n_ev),
                            0.08, pa.string()),
        "value": _null(rng, np.round(rng.normal(50, 20, n_ev), 2), 0.08,
                       pa.float64()),
        "props": pa.array(["{}"] * n_ev),
    }), f"{d}/events.parquet")

    n_d = int(rng.integers(20, 300))
    texts = rng.choice(["", "   ", "alpha beta gamma", "alpha beta gamma",
                        "delta " * 30, "unique " + "x" * 50], n_d)
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(n_d), pa.int64()),
        "text": _null(rng, list(texts), 0.08, pa.string()),
        "lang": _null(rng, rng.choice(["en", "de", "fr"], n_d), 0.08,
                      pa.string()),
        "source": pa.array(rng.choice([f"src{i}" for i in range(4)], n_d)),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), f"{d}/documents.parquet")

    n_v = int(rng.integers(10, 200))
    dim = int(rng.choice([8, 16, 64]))
    vecs = [np.round(rng.normal(size=dim), 4).astype(np.float32).tolist()
            for _ in range(n_v)]
    for i in np.flatnonzero(rng.random(n_v) < 0.06):
        vecs[i] = None
    if vecs and vecs[0] is None:
        vecs[0] = np.zeros(dim, np.float32).tolist()
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(n_v), pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 5, n_v).astype(np.int32)),
    }), f"{d}/embeddings.parquet")

_FULL_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _as_df(res):
    got = res.to_pandas() if hasattr(res, "to_pandas") else res
    if got.shape[1] == 0 and hasattr(res, "schema"):
        # Ray 2.49 trap: Dataset.to_pandas() drops columns on a
        # zero-row dataset even though ds.schema() is typed
        sch = res.schema()
        if sch is not None:
            got = pd.DataFrame({n: pd.Series(dtype="object")
                                for n in sch.names})
    return got


@pytest.mark.slow
@pytest.mark.parametrize("seed", [2, 6])
def test_full_table_null_fuzzed_parity(ray_session, tmp_path, seed):
    """Full 10-table null-fuzz over EVERY oracled query: nulls in join
    keys, group keys, measures, dates and embeddings, plus unmatched
    foreign keys.  Seed 2 caught grouped_agg_q1 (count(*) vs
    count(col)), top2_orders_per_customer (NaN custkeys segmenting
    per-row instead of one NULL partition), tpch_q3/q5 (null-measure
    revenue NaN-poisoning) and a tpch_q5 IndexError on out-of-table
    nation keys; seed 6 caught the null-query-embedding vstack crash
    in cosine/IVF top-k.  15 ad-hoc seeds ran clean after the fixes."""
    d = str(tmp_path / "fullnull")
    _gen_full(d, seed)
    con = duckdb.connect()
    for t in _FULL_TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')"
        )
    qs, osql = m.queries(), m.oracle_sql()
    bad = []
    for name in sorted(set(qs) & set(osql)):
        try:
            got = _as_df(qs[name](d))
            want = con.sql(osql[name]).df()
            pd.testing.assert_frame_equal(
                _norm(got), _norm(want), check_dtype=False
            )
        except Exception as e:  # noqa: BLE001
            bad.append((name, f"{type(e).__name__}: {str(e)[:200]}"))
    con.close()
    assert not bad, bad
