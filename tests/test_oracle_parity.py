"""Driver-mimic: run every SQL-oracled ``queries()`` entry and compare
against its ``oracle_sql()`` via DuckDB — row count + schema + exact
(order-insensitive) values, like the driver's CORRECTNESS check.
"""

import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

import __ray_entry__ as entrymod  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def to_pandas(result) -> pd.DataFrame:
    if hasattr(result, "to_pandas"):
        df = result.to_pandas()
    else:
        df = pd.DataFrame(result)
    return df


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


ORACLED = sorted(set(entrymod.queries()) & set(entrymod.oracle_sql()))


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(name, sf_oracle):
    ray_fn = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]

    got = normalize(to_pandas(ray_fn(sf_oracle)))
    con = duck_con(sf_oracle)
    want = normalize(con.sql(sql).df())
    con.close()

    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


def test_entry_smoke():
    res = entrymod.entry()
    df = to_pandas(res)
    assert len(df) >= 0
    assert "url" in df.columns and "cluster_id" in df.columns


def test_redact_text_on_planted_pii(tmp_path):
    """redact_text vs DuckDB on text that actually CONTAINS emails,
    IPv4s and phone runs (the sf tables may have none, which would make
    the generic parity test above vacuous for the regex paths)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "lang": pa.array(["en"] * 5, pa.string()),
            "text": pa.array(
                [
                    "contact bob.smith+spam@mail.example.org or jo@ex.io now",
                    "server at 10.0.255.3 then call +1 555-123 4567 after",
                    "no pii here, just words and 3 little digits",
                    None,
                    "edge: a@b.cc 1.2.3.4 999999999 trailing",
                ],
                pa.string(),
            ),
        }
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(docs, str(sf / "documents.parquet"))

    got = normalize(to_pandas(entrymod.queries()["redact_text"](str(sf))))
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = normalize(con.sql(entrymod.oracle_sql()["redact_text"]).df())
    con.close()

    assert int(got["n_emails"].sum()) == 3
    assert int(got["n_ips"].sum()) == 2
    assert int(got["n_phones"].sum()) >= 2
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_asof_last_click_edge_cases(tmp_path):
    """asof_last_click vs DuckDB ASOF JOIN on planted edge cases: a
    user with no clicks, an event before any click, consecutive
    clicks chaining to each other, and cross-user isolation."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    def ts(s):
        return np.datetime64(f"2024-01-01T00:00:{s:02d}", "us")

    import numpy as np

    events = pa.table(
        {
            "event_id": pa.array(list(range(9)), pa.int64()),
            "ts": pa.array(
                [ts(i) for i in [1, 2, 3, 4, 5, 1, 2, 3, 4]], pa.timestamp("us")
            ),
            "user_id": pa.array([7, 7, 7, 7, 7, 9, 9, 9, 9], pa.int64()),
            "event_type": pa.array(
                ["view", "click", "view", "click", "purchase",  # user 7
                 "view", "view", "purchase",                    # user 9: no clicks
                 None],  # NULL event_type must read as non-click, not crash
                pa.string(),
            ),
            "value": pa.array([0.0] * 9, pa.float64()),
            "props": pa.array(["{}"] * 9, pa.string()),
        }
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(events, str(sf / "events.parquet"))

    got = normalize(to_pandas(entrymod.queries()["asof_last_click"](str(sf))))
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    want = normalize(con.sql(entrymod.oracle_sql()["asof_last_click"]).df())
    con.close()

    by_id = got.set_index("event_id")
    assert pd.isna(by_id.loc[0, "last_click_id"])      # before any click
    assert by_id.loc[2, "last_click_id"] == 1          # view -> prior click
    assert by_id.loc[3, "last_click_id"] == 1          # click -> PRIOR click (strict <)
    assert by_id.loc[4, "last_click_id"] == 3          # purchase -> latest click
    assert got[got.user_id == 9]["last_click_id"].isna().all()  # isolation
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_events_daily_top_type_null_ts(tmp_path):
    """NULL timestamps: both sides define "per day" over non-null ts
    (stated in the SQL's WHERE) — without it DuckDB's window PARTITION
    BY makes every NULL day its own partition while the kernel's int64
    cast NaN-poisons the day keys."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.Generator(np.random.PCG64(4))
    n = 400
    ts = (rng.integers(0, 8, n) * 86_400_000_000).astype("datetime64[us]")
    mask = rng.random(n) < 0.08
    ts_col = pa.array(
        [None if mk else t for t, mk in zip(ts.tolist(), mask.tolist())],
        pa.timestamp("us"),
    )
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(np.arange(n), pa.int64()),
                "ts": ts_col,
                "user_id": pa.array(rng.integers(1, 5, n), pa.int64()),
                "event_type": pa.array(rng.choice(["click", "view", "buy"], n)),
                "value": pa.array(rng.normal(size=n)),
                "props": pa.array(["{}"] * n),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp_path}/events.parquet')"
    )
    name = "events_daily_top_type"
    got = normalize(to_pandas(entrymod.queries()[name](str(tmp_path))))
    want = normalize(con.sql(entrymod.oracle_sql()[name]).df())
    con.close()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert not got["day"].isna().any()


NULL_EVENTS_QUERIES = [
    "events_daily_top_type", "events_value_quantiles",
    "distinct_users_by_type", "asof_last_click", "events_interarrival",
    "events_sessionize", "events_hourly_window", "distinct_event_types",
    "union_shards",
]


@pytest.fixture(scope="module")
def null_events_dir(tmp_path_factory):
    """Events with nulls seeded in EVERY column the family keys on —
    the input class the fixed sf tables never produce.  All null
    semantics are stated explicitly in the oracle SQL (WHERE clauses),
    so both sides stay bit-exact."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("nullev")
    rng = np.random.Generator(np.random.PCG64(6))
    n = 600
    ts = rng.integers(0, 6, n) * 86_400_000_000 + rng.integers(0, 3_600_000_000, n)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(np.arange(n), pa.int64()),
                "ts": pa.array(
                    [None if rng.random() < 0.06 else int(t) for t in ts],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array(
                    [None if rng.random() < 0.05 else int(u)
                     for u in rng.integers(1, 6, n)], pa.int64()),
                "event_type": pa.array(
                    [None if rng.random() < 0.05 else t
                     for t in rng.choice(["click", "view", "buy"], n)],
                    pa.string()),
                "value": pa.array(
                    [None if rng.random() < 0.3 else float(v)
                     for v in np.round(rng.normal(10, 5, n), 3)], pa.float64()),
                "props": pa.array(["{}"] * n),
            }
        ),
        str(d / "events.parquet"),
    )
    return str(d)


@pytest.mark.parametrize("name", NULL_EVENTS_QUERIES)
def test_events_family_null_columns_parity(name, null_events_dir, ray_session):
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{null_events_dir}/events.parquet')"
    )
    got = normalize(to_pandas(entrymod.queries()[name](null_events_dir)))
    want = normalize(con.sql(entrymod.oracle_sql()[name]).df())
    con.close()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
