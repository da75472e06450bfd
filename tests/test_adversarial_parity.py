"""Crafted-adversarial oracle parity: nulls, negative/hash-sized keys,
and unmatched join keys that the fixed fixtures and the randomized
harness never generate — each case reproduces a bug found by the
round-5 review passes and pins the fix against DuckDB bit-exactly."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import __ray_entry__ as m


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return df[sorted(df.columns)].sort_values(
        by=sorted(df.columns), ignore_index=True
    )


def _check(name: str, d: str, con) -> None:
    got = m.queries()[name](d)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    want = con.sql(m.oracle_sql()[name]).df()
    pd.testing.assert_frame_equal(_norm(got), _norm(want), check_dtype=False)


def test_negative_and_hash_sized_user_ids(ray_session, tmp_path):
    """distinct_users_by_type's old arithmetic pair key collided for
    negative user_ids and wrapped int64 for hash-sized ones."""
    d = str(tmp_path)
    uid = [5, -2, -2, 2**62, 2**62 - 1, -(2**61), 5, 7]
    et = ["A", "B", "B", "A", "A", "B", "A", None]
    n = len(uid)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(np.arange(n), pa.int64()),
                "ts": pa.array(
                    (np.arange(n) * 1_000_000).astype("datetime64[us]")
                ),
                "user_id": pa.array(uid, pa.int64()),
                "event_type": pa.array(et, pa.string()),
                "value": pa.array([1.0] * n),
                "props": pa.array(["{}"] * n),
            }
        ),
        f"{d}/events.parquet",
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')")
    _check("distinct_users_by_type", d, con)
    con.close()


def test_null_status_and_price_rollup(ray_session, tmp_path):
    """orders_rollup crashed on a null o_orderstatus (unsortable) and
    undercounted n on null o_totalprice (count vs count(*))."""
    d = str(tmp_path)
    status = ["O", "F", None, None, "O", "F"]
    prio = ["1-URGENT", "3-MEDIUM", "1-URGENT", None, "1-URGENT", "3-MEDIUM"]
    price = [100.0, None, 300.0, None, 500.0, 600.0]
    n = len(status)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(1, n + 1), pa.int64()),
                "o_custkey": pa.array([1] * n, pa.int64()),
                "o_orderstatus": pa.array(status, pa.string()),
                "o_totalprice": pa.array(price, pa.float64()),
                "o_orderdate": pa.array(
                    (np.arange(n) * 86_400_000_000).astype("datetime64[us]")
                ),
                "o_orderpriority": pa.array(prio, pa.string()),
            }
        ),
        f"{d}/orders.parquet",
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW orders AS SELECT * FROM read_parquet('{d}/orders.parquet')")
    _check("orders_rollup", d, con)
    con.close()


def test_unmatched_nationkey_inner_join(ray_session, tmp_path):
    """customers_per_region kept customers whose c_nationkey matches no
    nation as an r_name=NULL group; the oracle's inner join drops
    them."""
    d = str(tmp_path)
    pq.write_table(
        pa.table(
            {
                "r_regionkey": pa.array([0, 1], pa.int32()),
                "r_name": pa.array(["AMERICA", "ASIA"], pa.string()),
            }
        ),
        f"{d}/region.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array([0, 1, 2], pa.int32()),
                "n_regionkey": pa.array([0, 0, 1], pa.int32()),
            }
        ),
        f"{d}/nation.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(np.arange(1, 7), pa.int64()),
                "c_name": pa.array([f"C{i}" for i in range(6)]),
                # 99 matches no nation -> inner join drops those rows
                "c_nationkey": pa.array([0, 1, 2, 99, 99, 2], pa.int32()),
                "c_acctbal": pa.array([10.0, 20.0, 30.0, 40.0, 50.0, 60.0]),
                "c_mktsegment": pa.array(["A"] * 6),
            }
        ),
        f"{d}/customer.parquet",
    )
    con = duckdb.connect()
    for t in ("region", "nation", "customer"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')")
    _check("customers_per_region", d, con)
    con.close()


def test_null_embedding_row_dropped(ray_session, tmp_path):
    """A null embedding mid-table used to crash the reshape (or, when
    the counts divided, silently misalign every following vector with
    the wrong vec_id).  Null rows must drop, matching the oracle where
    list_cosine_similarity(NULL, q) is NULL and never ranks."""
    d = str(tmp_path)
    rng = np.random.default_rng(5)
    vecs = [rng.normal(size=8).tolist() for _ in range(20)]
    vecs[7] = None  # mid-table null (row 0 must stay valid for dim inference)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(20), pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
                "label": pa.array([f"v{i}" for i in range(20)], pa.string()),
            }
        ),
        f"{d}/embeddings.parquet",
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{d}/embeddings.parquet')"
    )
    _check("embedding_cosine_topk", d, con)
    _check("embedding_near_pairs", d, con)
    _check("embedding_dedup", d, con)  # null rows stay singleton clusters
    con.close()


def test_null_custkey_anti_join(ray_session, tmp_path):
    """A null o_custkey inside the exclusion subquery made SQL's bare
    NOT IN return UNKNOWN for every customer (zero rows) while the
    engine ignored the null — semantics now STATED in the SQL
    (o_custkey IS NOT NULL) and pushed into the engine's scan."""
    d = str(tmp_path)
    n = 3
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([1, 2, 3], pa.int64()),
                "o_custkey": pa.array([1, None, 2], pa.int64()),
                "o_orderstatus": pa.array(["O"] * n, pa.string()),
                "o_totalprice": pa.array([300000.0] * n, pa.float64()),
                "o_orderdate": pa.array(
                    (np.arange(n) * 86_400_000_000).astype("datetime64[us]")
                ),
                "o_orderpriority": pa.array(["1-URGENT"] * n, pa.string()),
            }
        ),
        f"{d}/orders.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
                "c_name": pa.array([f"C{i}" for i in range(4)], pa.string()),
                "c_nationkey": pa.array([0] * 4, pa.int32()),
                "c_acctbal": pa.array([0.0] * 4, pa.float64()),
                "c_mktsegment": pa.array(["A"] * 4, pa.string()),
            }
        ),
        f"{d}/customer.parquet",
    )
    con = duckdb.connect()
    for t in ("orders", "customer"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')")
    _check("customers_without_orders", d, con)
    con.close()


def test_hash_sized_custkeys_with_nulls_top2(ray_session, tmp_path):
    """Null custkeys used to degrade the column to float64, collapsing
    hash-sized keys that differ only below 2^53 into one window
    partition; the kernel now stays integer-exact (fill_null + the
    validity flag) and segments on (is_null, custkey) so real custkey
    0 never merges with the NULL partition."""
    d = str(tmp_path)
    big = 2**62
    ck = [big, big + 1, big, big + 1, None, None, None, 0, 0, 5]
    n = len(ck)
    price = [100.0, 200.0, 300.0, 400.0, 50.0, 60.0, 70.0, 10.0, 20.0, 5.0]
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(1, n + 1), pa.int64()),
                "o_custkey": pa.array(ck, pa.int64()),
                "o_orderstatus": pa.array(["O"] * n, pa.string()),
                "o_totalprice": pa.array(price, pa.float64()),
                "o_orderdate": pa.array(
                    (np.arange(n) * 86_400_000_000).astype("datetime64[us]")
                ),
                "o_orderpriority": pa.array(["1-URGENT"] * n, pa.string()),
            }
        ),
        f"{d}/orders.parquet",
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW orders AS SELECT * FROM read_parquet('{d}/orders.parquet')")
    _check("top2_orders_per_customer", d, con)
    con.close()
