"""Every registered query over a corpus whose 10 tables all exist but
hold ZERO rows: oracled queries must match DuckDB (typed empty or the
SQL's aggregate-over-nothing row), rows-only queries must run clean.

This pinned three defect classes found by the round-5 empty sweep:
0-row blocks bypassing a final projection map_batches and stripping
the typed-empty schema (exact_dedup, scalar_functions, text queries,
...), Ray's sort dropping the schema of an all-empty sorted dataset
(tpch_q3's old tail), and the IVF codebook raising on a vector-less
table instead of returning empty results.
"""

import os
import shutil

import duckdb
import pandas as pd
import pyarrow.parquet as pq
import pytest
import ray.data

import __ray_entry__ as m

TABLES = [
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
            got = pd.DataFrame({n: pd.Series(dtype="object") for n in sch.names})
    return got


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return df[sorted(df.columns)].sort_values(
        by=sorted(df.columns), ignore_index=True
    )


@pytest.mark.slow
def test_every_query_on_all_empty_tables(ray_session, tmp_path):
    d = str(tmp_path / "emptysf")
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    for t in TABLES:
        s = pq.read_schema(f"/root/testdata/sf0.001/{t}.parquet")
        pq.write_table(s.empty_table(), f"{d}/{t}.parquet")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')"
        )
    qs, osql = m.queries(), m.oracle_sql()
    bad = []
    for name in sorted(qs):
        try:
            res = qs[name](d)
            if name in osql:
                got = _as_df(res)
                want = con.sql(osql[name]).df()
                pd.testing.assert_frame_equal(
                    _norm(got), _norm(want), check_dtype=False
                )
            else:
                n = res.count() if isinstance(res, ray.data.Dataset) else len(res)
                assert n == 0, f"{name}: {n} rows from an empty corpus"
        except Exception as e:  # noqa: BLE001
            bad.append((name, f"{type(e).__name__}: {str(e)[:200]}"))
    con.close()
    assert not bad, bad
