"""Extreme-VALUE adversarial parity (slow): INT64-extreme keys,
boundary timestamps, and huge/denormal float magnitudes through every
oracled query vs DuckDB.

Probed no-contract class (mirrors the quantile_cont-over-NaN probe):
DuckDB's SUM(double) is INPUT-ORDER-DEPENDENT under transient
overflow — summing permutations of [1e308, 1e308, -1e308, -1e308,
655.77] returns {655.77, 0.0, inf, -inf} depending on row order
(probed on 1.0.0), and its ROLLUP levels each re-sum the raw rows
independently so subtotal and grand total can disagree about
finiteness on the SAME data.  No distributed re-aggregation can match
that bit-for-bit, so the generator below stays in the STABLE regime:
at most ONE +-1e308 per float column (a single huge value plus any
number of small ones can never transiently overflow in any order),
with the rest +-1e303 / denormals.  What IS deterministic — DuckDB's
round() returning the input unchanged when the scale step overflows
(round(1e308, 2) == 1e308) — is pinned here and implemented in
functions/scalar.sql_round; before that fix seven queries rounded
huge finite aggregates to +-inf.
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __ray_entry__ as m
from dedup_ray.functions.scalar import sql_round

from test_random_parity import _FULL_TABLES, _as_df, _gen_full, _norm


def test_sql_round_extremes_match_duckdb():
    vals = [
        1e308, -1e308, 1.7976931348623157e308, 9.8e307, -9.5e307,
        5e-324, -5e-324, 1e-300, float("inf"), float("-inf"),
        float("nan"), None, 123.455, -123.455, 0.0,
    ]
    got = sql_round(pa.array(vals, pa.float64()), 2).to_pylist()
    con = duckdb.connect()
    want = [
        con.sql("select round(?::double, 2)", params=[v]).fetchone()[0]
        for v in vals
    ]
    con.close()
    for v, g, w in zip(vals, got, want):
        if w is None or g is None:
            assert g is None and w is None, (v, g, w)
        elif isinstance(w, float) and np.isnan(w):
            assert np.isnan(g), (v, g, w)
        else:
            assert g == w, (v, g, w)


def _set_col(t, name, arr):
    return t.set_column(t.column_names.index(name), name, arr)


def _poke(d, fname, col, values, typ, rng):
    path = f"{d}/{fname}"
    t = pq.read_table(path)
    if col not in t.column_names or len(t) == 0:
        return
    v = t[col].to_pylist()
    idx = rng.choice(len(v), size=min(len(v), len(values)), replace=False)
    for j, i in enumerate(idx):
        v[i] = values[j]
    pq.write_table(_set_col(t, col, pa.array(v, typ)), path)


def _mut_extreme_ints(d, rng):
    vals = [-(2**62), -1, 0, 2**62 + 12345, 2**63 - 1, -(2**63) + 1]
    for fname, col in [
        ("events.parquet", "user_id"),
        ("orders.parquet", "o_custkey"),
        ("lineitem.parquet", "l_orderkey"),
        ("lineitem.parquet", "l_partkey"),
        ("documents.parquet", "doc_id"),
    ]:
        _poke(d, fname, col, vals, pa.int64(), rng)


def _mut_extreme_ts(d, rng):
    lo = np.datetime64("1678-01-02T03:04:05.000006", "us").item()
    hi = np.datetime64("2260-12-30T23:59:59.999999", "us").item()
    for fname, col in [
        ("events.parquet", "ts"),
        ("orders.parquet", "o_orderdate"),
        ("lineitem.parquet", "l_shipdate"),
    ]:
        _poke(d, fname, col, [lo, hi, lo, hi], pa.timestamp("us"), rng)


def _mut_extreme_floats(d, rng):
    # STABLE regime: exactly one +-1e308 per column (see module
    # docstring), the rest large-but-unoverflowable / denormal.
    for fname, col, huge in [
        ("events.parquet", "value", 1e308),
        ("orders.parquet", "o_totalprice", -1e308),
        ("lineitem.parquet", "l_extendedprice", 1e308),
        ("lineitem.parquet", "l_quantity", -1e308),
        ("customer.parquet", "c_acctbal", 1e308),
    ]:
        vals = [huge, 1e303, -1e303, 5e-324, -5e-324, 1e-300]
        _poke(d, fname, col, vals, pa.float64(), rng)


def _mut_one_row(d, rng):
    # every table exactly one row: sort/window/quantile boundary
    for t in _FULL_TABLES:
        p = f"{d}/{t}.parquet"
        tb = pq.read_table(p)
        pq.write_table(tb.slice(0, min(1, len(tb))), p)


def _mut_const_events(d, rng):
    # all events identical (one user, one instant, one type, one
    # value): sessionize/interarrival/argmax full-tie boundary
    p = f"{d}/events.parquet"
    t = pq.read_table(p)
    n = len(t)
    consts = [
        ("user_id", 7, pa.int64()),
        ("ts", np.datetime64("2020-01-01T00:00:00", "us").item(),
         pa.timestamp("us")),
        ("event_type", "click", pa.string()),
        ("value", 42.5, pa.float64()),
    ]
    for col, val, typ in consts:
        t = _set_col(t, col, pa.array([val] * n, typ))
    pq.write_table(t, p)


def _mut_unicode_keys(d, rng):
    # unicode / empty-string / zero-width GROUP KEYS (text VALUES are
    # covered by the unicode-corpus sweep; grouping keys were not):
    # byte-order-vs-codepoint sort and ""-vs-null grouping
    weird = ["", " ", "é", "Z̈urich", "日本語", "🦊fox", "​", "Ａ"]

    def poke(path, col):
        t = pq.read_table(path)
        if col not in t.column_names or len(t) == 0:
            return
        v = t[col].to_pylist()
        idx = rng.choice(len(v), size=min(len(v), 24), replace=False)
        for j, i in enumerate(idx):
            v[i] = weird[j % len(weird)]
        pq.write_table(_set_col(t, col, pa.array(v, pa.string())), path)

    for path, col in [
        ("events.parquet", "event_type"),
        ("documents.parquet", "lang"),
        ("documents.parquet", "source"),
        ("orders.parquet", "o_orderstatus"),
        ("orders.parquet", "o_orderpriority"),
        ("lineitem.parquet", "l_returnflag"),
        ("customer.parquet", "c_mktsegment"),
        ("part.parquet", "p_brand"),
    ]:
        poke(f"{d}/{path}", col)


def _mut_highcard_keys(d, rng):
    # every group key distinct: the one-row-per-group boundary of
    # grouped kernels and partial combiners
    def poke(path, col, fmt):
        t = pq.read_table(path)
        if col not in t.column_names or len(t) == 0:
            return
        n = len(t)
        pq.write_table(
            _set_col(t, col, pa.array([fmt(i) for i in range(n)])), path
        )

    poke(f"{d}/events.parquet", "event_type", lambda i: f"type_{i:07d}")
    poke(f"{d}/documents.parquet", "lang", lambda i: f"l{i:05d}")
    poke(f"{d}/documents.parquet", "source", lambda i: f"s{i:05d}")
    poke(f"{d}/orders.parquet", "o_orderstatus", lambda i: f"st{i:06d}")


def _mut_nan_embeddings(d, rng):
    # NaN COMPONENTS inside live embeddings (failed encoders emit
    # these): cosine scores involving them are NaN on both sides
    p = f"{d}/embeddings.parquet"
    t = pq.read_table(p)
    vecs = t["embedding"].to_pylist()
    for i in rng.choice(len(vecs), size=min(6, len(vecs)), replace=False):
        if vecs[i]:
            v = list(vecs[i])
            v[0] = float("nan")
            vecs[i] = v
    pq.write_table(
        _set_col(t, "embedding", pa.array(vecs, pa.list_(pa.float32()))), p
    )


def _mut_control_chars(d, rng):
    # NUL / DEL / CR / tab / control chars in text, and — the part
    # that caught a real bug — NULL n_chars rows: the histogram kernel
    # NaN-degraded the int64-with-null column and NaN // width is
    # platform-UB garbage where SQL forms a single NULL bucket
    p = f"{d}/documents.parquet"
    t = pq.read_table(p)
    if len(t) == 0:
        return
    v = t["text"].to_pylist()
    weird = [
        "a\x00b null byte", "tab\tsep\ttext words here",
        "cr\rlf\ncrlf\r\nmix", "del\x7fchar", "\x01\x02\x03ctl",
        "bell\x07 and esc\x1b[0m codes", "\x00", "mixed \x00 \t \r all",
    ]
    idx = rng.choice(len(v), size=min(len(v), 16), replace=False)
    for j, i in enumerate(idx):
        v[i] = weird[j % len(weird)] + f" doc{i}"
    t = _set_col(t, "text", pa.array(v, pa.string()))
    t = _set_col(
        t,
        "n_chars",
        pa.array(
            [len(x) if x is not None else None for x in v], pa.int64()
        ),
    )
    pq.write_table(t, p)


_MUTATORS = {
    "extreme_ints": _mut_extreme_ints,
    "extreme_ts": _mut_extreme_ts,
    "extreme_floats": _mut_extreme_floats,
    "one_row": _mut_one_row,
    "const_events": _mut_const_events,
    "unicode_keys": _mut_unicode_keys,
    "highcard_keys": _mut_highcard_keys,
    "nan_embeddings": _mut_nan_embeddings,
    "control_chars": _mut_control_chars,
}


def test_mixed_dim_embeddings_raise_diagnostically():
    """A batch mixing embedding lengths that happen to SUM to a
    multiple of the row count (one short + one long cancel out) used
    to reshape cleanly into a silently misaligned matrix; now every
    consumer of _batch_matrix fails loudly naming the offenders."""
    import pytest as _pytest

    from dedup_ray.stages.embedding import _batch_matrix

    vecs = [[1.0] * 64, [1.0] * 61, [1.0] * 67, [1.0] * 64]
    t = pa.table(
        {
            "vec_id": pa.array([0, 1, 2, 3], pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
        }
    )
    with _pytest.raises(ValueError, match="inconsistent dimensions"):
        _batch_matrix(t)


@pytest.mark.slow
@pytest.mark.parametrize("table", ["customer", "lineitem", "events"])
def test_single_empty_table_parity(ray_session, tmp_path, table):
    """Exactly ONE table empty, the rest populated (the all-empty
    corpus is covered by test_empty_corpus_parity; this is the other
    half of the class).  empty-customer caught _enrich_mktsegment's
    empty-build guard building a 0-length idx for a batch-length
    boolean mask (IndexError on every batch); all ten
    single-empty-table corpora ran clean after the fix (2 seeds)."""
    d = str(tmp_path / "oneempty")
    _gen_full(d, 3)
    p = f"{d}/{table}.parquet"
    pq.write_table(pq.read_table(p).slice(0, 0), p)
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


@pytest.mark.slow
@pytest.mark.parametrize("mutation", sorted(_MUTATORS))
def test_extreme_value_parity(ray_session, tmp_path, mutation):
    """extreme_floats caught sql_round blowing huge finite aggregates
    to +-inf in seven queries (customers_per_region, grouped_agg_q1,
    join_orders_customer, orders_rollup, part_revenue_by_brand,
    scalar_functions, events_hourly_window); extreme_ints and
    extreme_ts ran clean on first contact (2 seeds each)."""
    d = str(tmp_path / "extreme")
    _gen_full(d, 3)
    _MUTATORS[mutation](d, np.random.default_rng(3 * 97 + 5))
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
