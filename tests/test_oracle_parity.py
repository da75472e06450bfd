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
