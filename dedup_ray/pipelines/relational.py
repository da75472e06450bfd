"""Generic relational operators (SURVEY.md §2B B17–B22) expressed
Ray-Data-first over the driver's TPC-H-ish tables (TESTDATA.md).

Every function takes ``sf_dir`` and returns a ``ray.data.Dataset``;
each has a DuckDB oracle registered in ``__ray_entry__.oracle_sql``.
Column names are chosen to match the oracle SQL exactly (the driver
hash-compares values after sorting columns by name).

Scale notes applied throughout:
  - column pruning at the read (``columns=[...]``),
  - vectorized pyarrow.compute predicates inside map_batches (B22),
  - grouped aggregates use a per-batch PARTIAL aggregate (combiner)
    before the global shuffle where the reduction is algebraic
    (sum/count), so the all-to-all exchange moves one row per
    (block, key) instead of one per input row (SURVEY.md §4),
  - joins: hash-partitioned ``Dataset.join`` when both sides are
    large; broadcast (ray.put + in-batch lookup) when one side is
    provably small (anti-join below).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from dedup_ray.config import DEFAULT_CONFIG as _CFG
from dedup_ray.core import unique_key_order
from dedup_ray.functions.scalar import sql_round

#: fact-table exchange width — the multi-node scale lever (r3 VERDICT
#: item 3: a 16 literal on a user_id/sha-keyed FACT exchange is a
#: multi-node ceiling; the adaptive cap still shrinks small inputs)
_DEFAULT_NUM_PARTITIONS = _CFG.num_partitions


# ---------------------------------------------------------------- B4/B22
def filter_lineitem(sf_dir: str) -> ray.data.Dataset:
    """Predicate pushed INTO the parquet scan (row-group statistics
    prune whole groups; matching rows are filtered by Arrow inside the
    read task) — nothing but qualifying rows ever leaves storage."""
    return ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_shipdate"],
        filter=(
            (pc.field("l_shipdate") < pa.scalar(np.datetime64("1996-01-01", "us")))
            & (pc.field("l_quantity") < 24.0)
        ),
    )


# ---------------------------------------------------------------- B18
def grouped_agg_q1(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q1-shaped grouped aggregate with an explicit map-side
    combiner: per-batch pyarrow ``Table.group_by`` partials, then a
    small global shuffle over (flag, status) partial rows."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_shipdate",
        ],
        # pushed into the scan: row-group stats prune, Arrow filters
        # in the read task — the combiner only ever sees live rows
        filter=pc.field("l_shipdate")
        <= pa.scalar(np.datetime64("1998-09-02", "us")),
    )

    def partial(t: pa.Table) -> pa.Table:
        disc_price = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        )
        t = t.append_column("disc_price", disc_price)
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [
                ("l_quantity", "sum"),
                ("l_extendedprice", "sum"),
                ("disc_price", "sum"),
                # count(*) semantics: a null l_quantity row still counts
                # toward count_order / the avg_qty denominator
                ([], "count_all"),
            ]
        )
        # select by the names pyarrow assigns ("<col>_<agg>"), not by
        # position (aggregate output column order is an implementation
        # detail)
        return pa.table(
            {
                "l_returnflag": g["l_returnflag"],
                "l_linestatus": g["l_linestatus"],
                "l_quantity_sum": g["l_quantity_sum"],
                "l_extendedprice_sum": g["l_extendedprice_sum"],
                "disc_price_sum": g["disc_price_sum"],
                "n": g["count_all"],
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    empty = pa.table(
        {
            "l_returnflag": pa.array([], pa.string()),
            "l_linestatus": pa.array([], pa.string()),
            "sum_qty": pa.array([], pa.float64()),
            "sum_base_price": pa.array([], pa.float64()),
            "sum_disc_price": pa.array([], pa.float64()),
            "avg_qty": pa.array([], pa.float64()),
            "count_order": pa.array([], pa.int64()),
        }
    )

    def combine(g: pa.Table) -> pa.Table:
        # global combine over |groups| x block-count partial rows —
        # bounded by construction, so one typed block (global_kernel)
        # beats a sort shuffle that would emit schema-less empties
        m = g.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [
                ("l_quantity_sum", "sum"),
                ("l_extendedprice_sum", "sum"),
                ("disc_price_sum", "sum"),
                ("n", "sum"),
            ]
        )
        return pa.table(
            {
                "l_returnflag": m["l_returnflag"],
                "l_linestatus": m["l_linestatus"],
                "sum_qty": sql_round(m["l_quantity_sum_sum"], 2),
                "sum_base_price": sql_round(m["l_extendedprice_sum_sum"], 2),
                "sum_disc_price": sql_round(m["disc_price_sum_sum"], 2),
                "avg_qty": sql_round(
                    pc.divide(m["l_quantity_sum_sum"], pc.cast(m["n_sum"], pa.float64())),
                    4,
                ),
                "count_order": pc.cast(m["n_sum"], pa.int64()),
            }
        )

    from dedup_ray.core import global_kernel

    return global_kernel(partials, combine, empty_result=empty)


GROUPED_AGG_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                          AS sum_qty,
       round(sum(l_extendedprice), 2)                     AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)  AS sum_disc_price,
       round(sum(l_quantity) / count(*), 4)               AS avg_qty,
       count(*)                                           AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------- B15/B21 join
import functools


@functools.lru_cache(maxsize=8)
def _worker_broadcast(ref):
    """Per-worker-process singleton for a ray.put broadcast value."""
    return ray.get(ref)


def _enrich_mktsegment(t: pa.Table, ref) -> pa.Table:
    """Vectorized broadcast inner-join probe: sorted-custkey
    searchsorted lookup; unmatched orders dropped (inner semantics)."""
    keys, segs = _worker_broadcast(ref)
    ck = t["o_custkey"].to_numpy(zero_copy_only=False)
    if len(keys) == 0:
        # an empty build side drops every row; idx must stay
        # batch-length so idx[found] (a boolean index) is legal, and
        # found all-False then selects nothing from it
        idx = np.zeros(len(ck), dtype=np.int64)
        found = np.zeros(len(ck), dtype=bool)
    else:
        idx = np.minimum(np.searchsorted(keys, ck), len(keys) - 1)
        found = keys[idx] == ck
    return pa.table(
        {
            "c_mktsegment": pa.array(segs[idx[found]], type=pa.string()),
            "o_totalprice": t["o_totalprice"].filter(pa.array(found)),
        }
    )


#: broadcast-vs-exchange gate for dimension build sides: below this
#: row count the dimension is collected + ray.put as a sorted probe
#: array (one footer read decides — no scan); above it, the probe
#: rides a key-hash exchange instead (core.exchange_join_unique_dim) —
#: at 100x fact scale dimensions grow linearly too, and a multi-GB
#: driver collect + per-worker broadcast copy is the wrong plan.
BROADCAST_BUILD_MAX_ROWS = 4_000_000


def join_orders_customer(
    sf_dir: str, *, broadcast_max_rows: int | None = None
) -> ray.data.Dataset:
    """Inner join orders ⨝ customer, then grouped agg per market
    segment.  When customer is provably small (parquet-metadata row
    count <= BROADCAST_BUILD_MAX_ROWS) it is BROADCAST (ray.put of a
    sorted key array + searchsorted probe per batch) and the orders
    side streams map-only; above the cap the join falls back to one
    custkey-hash exchange (same output bit-exactly — pinned by
    tests/test_broadcast_fallback.py)."""
    from dedup_ray.core import (
        exchange_join_unique_dim,
        parquet_num_rows,
        read_small_table,
    )

    cap = BROADCAST_BUILD_MAX_ROWS if broadcast_max_rows is None else broadcast_max_rows
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    if parquet_num_rows(f"{sf_dir}/customer.parquet") <= cap:
        customer = read_small_table(
            f"{sf_dir}/customer.parquet", ["c_custkey", "c_mktsegment"]
        ).to_pandas()
        keys = customer["c_custkey"].to_numpy()
        order = unique_key_order(keys, name="c_custkey")
        ref = ray.put(
            (keys[order], customer["c_mktsegment"].to_numpy(dtype=object)[order])
        )
        joined = orders.map_batches(
            _enrich_mktsegment, fn_kwargs={"ref": ref}, batch_format="pyarrow",
            zero_copy_batch=True,
        )
    else:
        dim = ray.data.read_parquet(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
        )
        joined = exchange_join_unique_dim(
            orders,
            dim,
            fact_key="o_custkey",
            dim_key="c_custkey",
            fact_fields=[("o_totalprice", pa.float64())],
            dim_fields=[("c_mktsegment", pa.string())],
            num_partitions=_DEFAULT_NUM_PARTITIONS,
        )
    def partial(t: pa.Table) -> pa.Table:
        # map-side combiner: only ~|segments| rows per batch reach the
        # global shuffle, not the full joined fact table
        if "c_mktsegment" not in t.column_names or len(t) == 0:
            return pa.table(
                {
                    "c_mktsegment": pa.array([], pa.string()),
                    "n_part": pa.array([], pa.int64()),
                    "sum_part": pa.array([], pa.float64()),
                }
            )
        g = t.group_by("c_mktsegment").aggregate(
            [("o_totalprice", "sum"), ([], "count_all")]
        )
        return pa.table(
            {
                "c_mktsegment": g["c_mktsegment"],
                "n_part": pc.cast(g["count_all"], pa.int64()),
                "sum_part": g["o_totalprice_sum"],
            }
        )

    partials = joined.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    empty = pa.table(
        {
            "c_mktsegment": pa.array([], pa.string()),
            "n_orders": pa.array([], pa.int64()),
            "total_price": pa.array([], pa.float64()),
        }
    )

    def combine(g: pa.Table) -> pa.Table:
        m = g.group_by("c_mktsegment").aggregate(
            [("n_part", "sum"), ("sum_part", "sum")]
        )
        return pa.table(
            {
                "c_mktsegment": m["c_mktsegment"],
                "n_orders": pc.cast(m["n_part_sum"], pa.int64()),
                "total_price": sql_round(m["sum_part_sum"], 2),
            }
        )

    from dedup_ray.core import global_kernel

    return global_kernel(partials, combine, empty_result=empty)


JOIN_ORDERS_CUSTOMER_SQL = """
SELECT c_mktsegment,
       count(*)                   AS n_orders,
       round(sum(o_totalprice), 2) AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


# ---------------------------------------------------------------- B19
def sort_limit_orders(sf_dir: str) -> ray.data.Dataset:
    """Top-10 orders by totalprice (desc), deterministic tie-break on
    o_orderkey.  Distributed sort + limit (Ray range-partitions).

    Null/NaN semantics STATED in the SQL: rows whose o_totalprice is
    null or non-finite are excluded (Ray's sort and DuckDB's ORDER BY
    ... DESC place nulls differently, and DuckDB ranks NaN above every
    number where numpy sorts it differently — both found by parity
    sweeps; a top-k over a poisoned key is meaningless anyway).  The
    filter rides the scan as a row-group predicate; the double bound
    is the dataset-expression spelling of isfinite (NaN comparisons
    are null and drop)."""
    import pyarrow.dataset as pads

    _DBL_MAX = 1.7976931348623157e308
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_totalprice"],
        filter=(
            (pads.field("o_totalprice") >= -_DBL_MAX)
            & (pads.field("o_totalprice") <= _DBL_MAX)
        ),
    )
    return ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(10)


SORT_LIMIT_ORDERS_SQL = """
SELECT o_orderkey, o_totalprice
FROM orders
WHERE o_totalprice IS NOT NULL AND isfinite(o_totalprice)
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
"""


# ---------------------------------------------------------------- B21
def distinct_event_types(sf_dir: str) -> ray.data.Dataset:
    """Distinct values via per-batch dedup (combiner) + global groupby —
    equivalent to ds.unique() but stays a Dataset with a named column."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type"])
    partial = ds.map_batches(
        # distinct over non-null types (stated in the SQL's WHERE)
        lambda t: t.filter(pc.is_valid(t["event_type"]))
        .group_by("event_type")
        .aggregate([]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    from dedup_ray.core import global_kernel

    return global_kernel(
        partial,
        lambda g: g.group_by("event_type").aggregate([]),
        empty_result=pa.table({"event_type": pa.array([], pa.string())}),
    )


DISTINCT_EVENT_TYPES_SQL = (
    "SELECT DISTINCT event_type FROM events WHERE event_type IS NOT NULL"
)


# ---------------------------------------------------------------- B22
def scalar_functions(sf_dir: str) -> ray.data.Dataset:
    """Scalar-function layer: string / timestamp / arithmetic kernels,
    all pyarrow.compute (vectorized, zero-copy)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_returnflag", "l_shipdate",
                 "l_extendedprice", "l_discount"],
    )

    def fns(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_linenumber": pc.cast(t["l_linenumber"], pa.int64()),
                "ship_year": pc.cast(pc.year(t["l_shipdate"]), pa.int64()),
                "ship_month": pc.cast(pc.month(t["l_shipdate"]), pa.int64()),
                "rf_lower": pc.utf8_lower(t["l_returnflag"]),
                "disc_price": sql_round(
                    pc.multiply(
                        t["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), t["l_discount"]),
                    ),
                    2,
                ),
            }
        )

    from dedup_ray.core import parquet_num_rows

    if parquet_num_rows(f"{sf_dir}/lineitem.parquet") == 0:
        # empty-corpus short-circuit: 0-row blocks bypass map_batches,
        # so the typed output schema must come from applying the UDF to
        # a typed empty input locally
        return ray.data.from_arrow(
            fns(
                pa.table(
                    {
                        "l_orderkey": pa.array([], pa.int64()),
                        "l_linenumber": pa.array([], pa.int32()),
                        "l_returnflag": pa.array([], pa.string()),
                        "l_shipdate": pa.array([], pa.timestamp("us")),
                        "l_extendedprice": pa.array([], pa.float64()),
                        "l_discount": pa.array([], pa.float64()),
                    }
                )
            )
        )
    return ds.map_batches(fns, batch_format="pyarrow", zero_copy_batch=True)


SCALAR_FUNCTIONS_SQL = """
SELECT l_orderkey,
       cast(l_linenumber AS bigint)       AS l_linenumber,
       cast(year(l_shipdate) AS bigint)   AS ship_year,
       cast(month(l_shipdate) AS bigint)  AS ship_month,
       lower(l_returnflag)                AS rf_lower,
       round(l_extendedprice * (1 - l_discount), 2) AS disc_price
FROM lineitem
"""


# ---------------------------------------------------------------- B21 anti-join
def customers_without_orders(sf_dir: str) -> ray.data.Dataset:
    """Anti-join via BROADCAST key set: the distinct o_custkey set is
    small relative to the fact table, so it is ray.put() once and read
    inside each filter task — no shuffle join (SURVEY.md §4 'broadcast
    small sides')."""
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_totalprice"],
        # price predicate pushed into the scan (row-group pruning).
        # Null semantics STATED in the oracle SQL: the exclusion set is
        # the NON-NULL custkeys — a bare SQL NOT IN over a null-bearing
        # subquery returns UNKNOWN for every row (zero customers),
        # which is never the verdict a droplist pipeline wants
        filter=(
            (pc.field("o_totalprice") > 250000.0)
            & pc.field("o_custkey").is_valid()
        ),
    ).map_batches(
        lambda t: t.select(["o_custkey"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    # distinct keys shrink on the cluster first (per-batch unique), THEN
    # stream to the driver — the driver only ever sees the small key set
    chunks = [
        np.unique(b["o_custkey"].to_numpy(zero_copy_only=False))
        for b in orders.map_batches(
            lambda t: t.group_by("o_custkey").aggregate([]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).iter_batches(batch_format="pyarrow", batch_size=65536)
    ]
    keys = (
        np.unique(np.concatenate(chunks)) if chunks else np.empty(0, dtype=np.int64)
    )
    keys_ref = ray.put(keys)

    customer = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    )

    def anti_join(t: pa.Table) -> pa.Table:
        have = np.isin(
            t["c_custkey"].to_numpy(zero_copy_only=False),
            _worker_broadcast(keys_ref),
        )
        return t.filter(pa.array(~have))

    from dedup_ray.core import parquet_num_rows

    if parquet_num_rows(f"{sf_dir}/customer.parquet") == 0:
        # empty-corpus short-circuit (0-row blocks bypass map_batches)
        return ray.data.from_arrow(
            pa.table(
                {
                    "c_custkey": pa.array([], pa.int64()),
                    "c_name": pa.array([], pa.string()),
                }
            )
        )
    return customer.map_batches(
        anti_join,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


CUSTOMERS_WITHOUT_ORDERS_SQL = """
-- stated semantics: the exclusion set is non-null custkeys of orders
-- with a REAL price above the bar — DuckDB's NaN-above-everything
-- would otherwise admit NaN-priced orders the engine's Arrow
-- comparison (NaN > x = false) never matches
SELECT c_custkey, c_name
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                        WHERE o_totalprice > 250000
                          AND NOT isnan(o_totalprice)
                          AND o_custkey IS NOT NULL)
"""


# ---------------------------------------------------------------- stream-shaped
def events_hourly_window(sf_dir: str) -> ray.data.Dataset:
    """Tumbling-window aggregate (stream-shaped workload on a batch
    engine): per (user_id, hour) count + sum(value).  The window key is
    computed vectorized (floor_temporal); the aggregate is a hash
    exchange on hash(user_id, hour) + one arrow group_by per partition
    (``partitioned_kernel``) — the window cardinality here is ~rows
    (most (user, hour) pairs are unique), so map-side partials can't
    shrink anything and Ray's sort-shuffle groupby would pay a full
    sample+sort for nothing."""
    from dedup_ray.core import partitioned_kernel
    from dedup_ray.util import splitmix64

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"]
    )

    def add_window(t: pa.Table) -> pa.Table:
        # windows over timestamped, attributed events (stated in the
        # SQL's WHERE)
        t = t.filter(
            pc.and_(pc.is_valid(t["ts"]), pc.is_valid(t["user_id"]))
        )
        hour = pc.floor_temporal(t["ts"], unit="hour")
        return pa.table(
            {"user_id": t["user_id"], "hour": hour, "value": t["value"]}
        )

    windowed = ds.map_batches(add_window, batch_format="pyarrow", zero_copy_batch=True)

    empty = pa.table(
        {
            "user_id": pa.array([], pa.int64()),
            "hour": pa.array([], pa.timestamp("us")),
            "n_events": pa.array([], pa.int64()),
            "sum_value": pa.array([], pa.float64()),
        }
    )

    def key_hash(t: pa.Table) -> np.ndarray:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype("uint64")
        h = (
            pc.cast(t["hour"], pa.int64())
            .to_numpy(zero_copy_only=False)
            .astype("uint64")
        )
        return splitmix64(u ^ splitmix64(h))

    def kernel(g: pa.Table) -> pa.Table:
        # count(*) per group = count of the (non-null post-filter) hour
        # column; arrow sum skips nulls like SQL, all-null -> null
        agg = g.group_by(["user_id", "hour"]).aggregate(
            [("value", "sum"), ("hour", "count")]
        )
        return pa.table(
            {
                "user_id": agg["user_id"],
                "hour": agg["hour"],
                "n_events": pc.cast(agg["hour_count"], pa.int64()),
                "sum_value": sql_round(agg["value_sum"], 3),
            }
        )

    return partitioned_kernel(
        windowed, key_hash, kernel, num_partitions=64, empty_result=empty
    )


EVENTS_HOURLY_WINDOW_SQL = """
SELECT user_id,
       date_trunc('hour', ts)     AS hour,
       count(*)                   AS n_events,
       round(sum(value), 3)       AS sum_value
FROM events
WHERE ts IS NOT NULL AND user_id IS NOT NULL
GROUP BY user_id, date_trunc('hour', ts)
"""


# ---------------------------------------------------------------- B21 union
def union_shards(sf_dir: str) -> ray.data.Dataset:
    """ds.union of two disjoint filtered shards, then distinct count by
    type — exercises set-union plus dedup-after-union."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def shard_partial(t: pa.Table, *, negative: bool) -> pa.Table:
        # filter + per-shard partial count FUSED in one UDF: union is
        # then the LAST lazy op before the global combine — Ray 2.49's
        # UnionOperator drops the schema of empty bundles, so a map
        # stage AFTER a union of filterable shards would emit
        # schema-less blocks (measured; the combine's kernel layer
        # absorbs them, but the executor warning is noise)
        t = t.filter(pc.is_valid(t["event_type"]))
        if negative:
            pred = pc.less(t["value"], 0.0)
        else:
            # DuckDB orders NaN above every number, so NaN >= 0 is TRUE
            # there while Arrow's comparison is false — NaN rows belong
            # to the non-negative shard (NaN/inf parity probe)
            pred = pc.or_(
                pc.greater_equal(t["value"], 0.0), pc.is_nan(t["value"])
            )
        g = t.filter(pred).group_by("event_type").aggregate([([], "count_all")])
        return pa.table(
            {"event_type": g["event_type"], "n_part": pc.cast(g["count_all"], pa.int64())}
        )

    lo = ds.map_batches(
        shard_partial, fn_kwargs={"negative": True},
        batch_format="pyarrow", zero_copy_batch=True,
    )
    hi = ds.map_batches(
        shard_partial, fn_kwargs={"negative": False},
        batch_format="pyarrow", zero_copy_batch=True,
    )
    both = lo.union(hi)

    from dedup_ray.core import global_kernel

    def combine(g: pa.Table) -> pa.Table:
        m = g.group_by("event_type").aggregate([("n_part", "sum")])
        return pa.table(
            {"event_type": m["event_type"], "n": pc.cast(m["n_part_sum"], pa.int64())}
        )

    return global_kernel(
        both,
        combine,
        empty_result=pa.table(
            {"event_type": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
        ),
    )


UNION_SHARDS_SQL = """
SELECT event_type, count(*) AS n
FROM (SELECT * FROM events WHERE value < 0 AND event_type IS NOT NULL
      UNION ALL
      SELECT * FROM events WHERE value >= 0 AND event_type IS NOT NULL)
GROUP BY event_type
"""


# ---------------------------------------------------------------- B21 3-way
def _enrich_region(t: pa.Table, ref) -> pa.Table:
    # vectorized sorted-key probe (same pattern as _enrich_mktsegment);
    # unmatched nation keys are DROPPED — the oracle is an inner join,
    # so keeping them as r_name=NULL rows would emit an extra group
    keys_s, names = _worker_broadcast(ref)
    nk = t["c_nationkey"].to_numpy(zero_copy_only=False)
    idx = np.minimum(np.searchsorted(keys_s, nk), max(len(keys_s) - 1, 0))
    hit = (keys_s[idx] == nk) if len(keys_s) else np.zeros(len(nk), bool)
    return pa.table(
        {
            "r_name": pa.array(names[idx[hit]], type=pa.string()),
            "c_acctbal": t["c_acctbal"].filter(pa.array(hit)),
        }
    )


def customers_per_region(sf_dir: str) -> ray.data.Dataset:
    """3-way dimension join customer ⨝ nation ⨝ region via BROADCAST
    (both dimension tables are small): build the custkey->region-name
    mapping once on the driver, ray.put it, and enrich per batch — the
    canonical star-schema pattern that avoids chained shuffle joins
    entirely (and Ray 2.49's chained-join defect, see stages/lsh.py)."""
    from dedup_ray.core import global_kernel, read_small_table

    nation = read_small_table(
        f"{sf_dir}/nation.parquet", ["n_nationkey", "n_regionkey"]
    ).to_pandas()
    region = read_small_table(
        f"{sf_dir}/region.parquet", ["r_regionkey", "r_name"]
    ).to_pandas()
    n2r = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")
    keys = n2r["n_nationkey"].to_numpy()
    # a duplicated r_regionkey would fan the merge out and duplicate
    # nation keys here — the guard catches both malformations at once
    order = unique_key_order(keys, name="n_nationkey")
    ref = ray.put((keys[order], n2r["r_name"].to_numpy(dtype=object)[order]))

    customer = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_nationkey", "c_acctbal"]
    )
    enriched = customer.map_batches(
        _enrich_region, fn_kwargs={"ref": ref}, batch_format="pyarrow", zero_copy_batch=True
    )

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("r_name").aggregate([("c_acctbal", "sum"), ([], "count_all")])
        return pa.table(
            {
                "r_name": g["r_name"],
                "n_part": pc.cast(g["count_all"], pa.int64()),
                "bal_part": g["c_acctbal_sum"],
            }
        )

    partials = enriched.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    empty = pa.table(
        {
            "r_name": pa.array([], pa.string()),
            "n_customers": pa.array([], pa.int64()),
            "total_acctbal": pa.array([], pa.float64()),
        }
    )

    def combine(g: pa.Table) -> pa.Table:
        m = g.group_by("r_name").aggregate([("n_part", "sum"), ("bal_part", "sum")])
        return pa.table(
            {
                "r_name": m["r_name"],
                "n_customers": pc.cast(m["n_part_sum"], pa.int64()),
                "total_acctbal": sql_round(m["bal_part_sum"], 2),
            }
        )

    return global_kernel(partials, combine, empty_result=empty)


CUSTOMERS_PER_REGION_SQL = """
SELECT r_name,
       count(*)                  AS n_customers,
       round(sum(c_acctbal), 2)  AS total_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


# ---------------------------------------------------------------- window fn
def top2_orders_per_customer(sf_dir: str) -> ray.data.Dataset:
    """Window function (row_number over partition): top-2 orders per
    customer by (totalprice desc, orderkey) — a vectorized partition
    kernel (rank-within-segment), not per-group python."""
    import numpy as np

    from dedup_ray.core import partitioned_kernel

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderkey", "o_totalprice"]
    )
    empty = pa.table(
        {
            "o_custkey": pa.array([], pa.int64()),
            "o_orderkey": pa.array([], pa.int64()),
            "o_totalprice": pa.array([], pa.float64()),
            "rn": pa.array([], pa.int64()),
        }
    )

    def kernel(g: pa.Table) -> pa.Table:
        # SQL's PARTITION BY puts every NULL custkey in ONE partition.
        # Integer-exact: to_numpy on a null-bearing int64 degrades to
        # float64 (keys past 2^53 would silently collapse), so take
        # the values through fill_null and the null flag separately.
        ck_arr = g["o_custkey"]
        cnull = (
            pc.is_null(ck_arr).to_numpy(zero_copy_only=False)
            if ck_arr.null_count
            else np.zeros(len(g), dtype=bool)
        )
        cust = pc.fill_null(ck_arr, 0).to_numpy(zero_copy_only=False)
        okey = g["o_orderkey"].to_numpy(zero_copy_only=False)
        price_arr = g["o_totalprice"]
        price = price_arr.to_numpy(zero_copy_only=False)
        # DuckDB's ORDER BY o_totalprice DESC ranks three classes:
        # NaN VALUES first (NaN orders above every number), then real
        # numbers descending (+inf ... -inf), then NULLs last (default
        # NULLS LAST).  to_numpy renders null as NaN too, so the class
        # split needs the Arrow validity bitmap.
        nullmask = (
            pc.is_null(price_arr).to_numpy(zero_copy_only=False)
            if price_arr.null_count
            else np.zeros(len(price), dtype=bool)
        )
        with np.errstate(invalid="ignore"):
            nanmask = np.isnan(price) & ~nullmask
        lvl = np.where(nullmask, 2, np.where(nanmask, 0, 1)).astype(np.int8)
        sortval = np.where(lvl == 1, -price, 0.0)
        order = np.lexsort((okey, sortval, lvl, cust, cnull))
        # a window partition boundary is a change in (is_null, custkey)
        # — fill_null(0) must not merge real custkey 0 with the nulls
        cs, cn = cust[order], cnull[order]
        firsts = np.ones(len(cs), dtype=bool)
        firsts[1:] = (cs[1:] != cs[:-1]) | (cn[1:] != cn[:-1])
        starts = np.flatnonzero(firsts)
        lens = np.diff(np.concatenate([starts, [len(cs)]]))
        seg_id = np.repeat(np.arange(len(starts)), lens)
        rank = np.arange(len(cs)) - starts[seg_id]
        keep = rank < 2
        idx = pa.array(order[keep])
        return pa.table(
            {
                "o_custkey": g["o_custkey"].take(idx),
                "o_orderkey": g["o_orderkey"].take(idx),
                "o_totalprice": g["o_totalprice"].take(idx),
                "rn": pa.array(rank[keep] + 1, type=pa.int64()),
            }
        )

    def key_hash(t: pa.Table) -> np.ndarray:
        # integer-exact (no float degrade for hash-sized keys); all
        # NULL custkeys land in ONE partition via a fixed sentinel —
        # real custkey 0 stays separate because the kernel segments on
        # (is_null, custkey), and hash collisions only co-locate
        arr = t["o_custkey"]
        out = pc.fill_null(arr, 0).to_numpy(zero_copy_only=False)
        out = out.astype(np.int64, copy=True).view(np.uint64)
        if arr.null_count:
            nulls = pc.is_null(arr).to_numpy(zero_copy_only=False)
            out[nulls] = np.uint64(0x517CC1B727220A95)
        return out

    return partitioned_kernel(
        ds,
        key_hash,
        kernel,
        num_partitions=64,
        empty_result=empty,
    )


TOP2_ORDERS_PER_CUSTOMER_SQL = """
WITH ranked AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
)
SELECT o_custkey, o_orderkey, o_totalprice, cast(rn AS bigint) AS rn
FROM ranked WHERE rn <= 2
"""


# ---------------------------------------------------------------- asof join
def asof_last_click(sf_dir: str) -> ray.data.Dataset:
    """AS-OF join (an operator Ray Data lacks natively): attribute every
    event to the SAME user's most recent STRICTLY-PRIOR 'click' event.

    Shape: one hash exchange on user_id co-locates each user's events,
    then a globally vectorized kernel — dense-code users AND dense-rank
    timestamps (r = index of ts among the partition's unique ts), build
    a combined sort key u * span + r with span = n_unique_ts + 1, and
    one np.searchsorted finds each event's predecessor click;
    side='left' gives the strict ts < semantics of the oracle's
    `e.ts > c.ts`.  Rank-coding bounds the key by n_users * (rows + 1)
    <= rows^2 < 2^62 for any partition that fits memory — the raw
    microsecond-span key could silently wrap int64 at scale (user count
    2^16+ x multi-year us span ~ 2^48 exceeds 2^63).  No per-group
    Python, no sort-merge per user.

    Partitioning assumption (documented per SURVEY §2): all rows of a
    user fit one partition — user event counts are Zipf-bounded, and
    the same skew-salting used for LSH buckets would apply if a single
    user ever exceeded a partition."""
    from dedup_ray.core import partitioned_kernel

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    ).map_batches(
        # as-of is defined for timestamped, attributed events — stated
        # in the oracle SQL's CTE (WHERE ts/user_id IS NOT NULL).  A
        # null ts would otherwise NaN-degrade the int64 cast and rank
        # the row AFTER every real click (silently attributing it)
        lambda t: t.filter(
            pc.and_(pc.is_valid(t["ts"]), pc.is_valid(t["user_id"]))
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    empty = pa.table(
        {
            "event_id": pa.array([], pa.int64()),
            "user_id": pa.array([], pa.int64()),
            "ts": pa.array([], pa.timestamp("us")),
            "event_type": pa.array([], pa.string()),
            "last_click_id": pa.array([], pa.int64()),
            "last_click_ts": pa.array([], pa.timestamp("us")),
        }
    )

    def kernel(g: pa.Table) -> pa.Table:
        users = g["user_id"].to_numpy(zero_copy_only=False)
        ts = g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        # NULL event_type must read as non-click (the oracle's WHERE
        # drops it); a null-propagating equal() would poison the mask
        is_click = pc.fill_null(
            pc.equal(g["event_type"], "click"), False
        ).to_numpy(zero_copy_only=False)
        _, u = np.unique(users, return_inverse=True)
        ts_uniq = np.unique(ts)
        span = np.int64(len(ts_uniq) + 1)
        r = np.searchsorted(ts_uniq, ts)
        # rank-coded composite key: strictly monotone in (user, ts) and
        # bounded by n_users * span <= rows * (rows + 1) — cannot wrap
        assert int(u.max(initial=0) + 1) * int(span) < 2**62
        key = u.astype(np.int64) * span + r
        ck, ce, cu, cts = key[is_click], eid[is_click], u[is_click], ts[is_click]
        # secondary sort on event_id: deterministic predecessor choice
        # even if duplicate (user, ts) click rows exist (input-order
        # independence — CLAUDE.md determinism rule)
        order = np.lexsort((ce, ck))
        ck, ce, cu, cts = ck[order], ce[order], cu[order], cts[order]
        pos = np.searchsorted(ck, key, side="left") - 1
        valid = pos >= 0
        same_user = np.zeros(len(key), dtype=bool)
        same_user[valid] = cu[pos[valid]] == u[valid]
        lc_id = np.full(len(key), -1, dtype=np.int64)
        lc_ts = np.full(len(key), 0, dtype=np.int64)
        lc_id[same_user] = ce[pos[same_user]]
        lc_ts[same_user] = cts[pos[same_user]]
        mask = pa.array(same_user)
        return pa.table(
            {
                "event_id": g["event_id"],
                "user_id": g["user_id"],
                "ts": g["ts"],
                "event_type": g["event_type"],
                "last_click_id": pc.if_else(mask, pa.array(lc_id), pa.scalar(None, pa.int64())),
                "last_click_ts": pc.if_else(
                    mask,
                    pa.array(lc_ts).cast(pa.timestamp("us")),
                    pa.scalar(None, pa.timestamp("us")),
                ),
            }
        )

    from dedup_ray.core import numeric_key_u64

    return partitioned_kernel(
        ds,
        lambda t: numeric_key_u64(t, ["user_id"]),
        kernel,
        num_partitions=64,
        empty_result=empty,
    )


ASOF_LAST_CLICK_SQL = """
WITH ev AS (
  SELECT * FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
)
SELECT e.event_id, e.user_id, e.ts, e.event_type,
       c.event_id AS last_click_id,
       c.ts       AS last_click_ts
FROM ev e
ASOF LEFT JOIN (SELECT * FROM ev WHERE event_type = 'click') c
  ON e.user_id = c.user_id AND e.ts > c.ts
"""


# ---------------------------------------------------------------- sessionize
#: gap that closes a session (microseconds) — 30 minutes
SESSION_GAP_US = 30 * 60 * 1_000_000


def events_sessionize(sf_dir: str) -> ray.data.Dataset:
    """Gap-based sessionization: per user, a new session starts at the
    first event and whenever the gap to the previous event exceeds 30
    minutes; emits the per-user session sequence number.

    The canonical training-data / clickstream windowing op (neither the
    reference nor Ray Data has it natively).  Shape: one hash exchange
    on user_id, then a single globally-vectorized kernel per partition
    — lexsort by (user, ts, event_id), boundary mask = user-change OR
    gap, cumsum, per-user rebase via maximum.accumulate.  No per-group
    Python.  Same partitioning assumption as asof_last_click (a user's
    rows fit one partition; Zipf-bounded, saltable)."""
    from dedup_ray.core import numeric_key_u64, partitioned_kernel

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    ).map_batches(
        # sessions are defined over timestamped, attributed events —
        # stated in the SQL's CTE WHERE; null ts NaN-degrades the
        # int64 cast and silently mis-sequences that user's sessions
        lambda t: t.filter(
            pc.and_(pc.is_valid(t["ts"]), pc.is_valid(t["user_id"]))
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    empty = pa.table(
        {
            "event_id": pa.array([], pa.int64()),
            "user_id": pa.array([], pa.int64()),
            "ts": pa.array([], pa.timestamp("us")),
            "session_seq": pa.array([], pa.int64()),
        }
    )

    def kernel(g: pa.Table) -> pa.Table:
        users = g["user_id"].to_numpy(zero_copy_only=False)
        ts = g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, users))
        u, t = users[order], ts[order]
        user_change = np.ones(len(u), dtype=bool)
        user_change[1:] = u[1:] != u[:-1]
        new_sess = user_change.copy()
        new_sess[1:] |= (t[1:] - t[:-1]) > SESSION_GAP_US
        cs = np.cumsum(new_sess)  # strictly increases at user starts
        base = np.maximum.accumulate(np.where(user_change, cs, 0))
        seq = cs - base + 1
        idx = pa.array(order)
        return pa.table(
            {
                "event_id": g["event_id"].take(idx),
                "user_id": g["user_id"].take(idx),
                "ts": g["ts"].take(idx),
                "session_seq": pa.array(seq, type=pa.int64()),
            }
        )

    return partitioned_kernel(
        ds,
        lambda t: numeric_key_u64(t, ["user_id"]),
        kernel,
        num_partitions=64,
        empty_result=empty,
    )


EVENTS_SESSIONIZE_SQL = """
WITH seq AS (
  SELECT event_id, user_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
  WHERE ts IS NOT NULL AND user_id IS NOT NULL
)
SELECT event_id, user_id, ts,
       CAST(sum(CASE WHEN prev_ts IS NULL
                       OR ts - prev_ts > INTERVAL 30 MINUTE
                     THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS session_seq
FROM seq
"""


# ---------------------------------------------------------------- quantiles
def events_value_quantiles(sf_dir: str) -> ray.data.Dataset:
    """Exact grouped quantiles (p50/p95 of value per event_type) —
    the aggregate family (median/percentile) Ray Data has no built-in
    for.  Shape: one hash exchange on the group key, then a vectorized
    multi-group kernel (one lexsort + per-segment linear-interpolation
    quantile, the ANSI PERCENTILE_CONT definition DuckDB's
    quantile_cont implements).  Exact because a group's rows are
    co-located; at web scale with huge groups the same pipeline takes
    a t-digest/KLL partial instead of the exact kernel — the exchange
    and kernel shape stay identical.

    NULL values are dropped (SQL aggregate semantics)."""
    from dedup_ray.core import partitioned_kernel

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )
    empty = pa.table(
        {
            "event_type": pa.array([], pa.string()),
            "p50": pa.array([], pa.float64()),
            "p95": pa.array([], pa.float64()),
            "n": pa.array([], pa.int64()),
        }
    )

    def kernel(g: pa.Table) -> pa.Table:
        # keep groups whose values are ALL null: SQL's GROUP BY still
        # emits them with p50/p95 NULL and count(value) = 0
        et = g["event_type"].to_numpy(zero_copy_only=False)
        invalid = pc.is_null(g["value"]).to_numpy(zero_copy_only=False)
        val = pc.fill_null(g["value"], 0.0).to_numpy(zero_copy_only=False)
        # NaN VALUES are excluded from the quantile itself — STATED in
        # the oracle SQL's FILTER (WHERE NOT isnan(value)).  DuckDB's
        # bare quantile_cont over a NaN-carrying group was probed to
        # return results that vary with INPUT ROW ORDER (NaN poisons
        # its selection comparisons), so there is no stable contract
        # to match; n still counts NaN rows (count(value) semantics).
        with np.errstate(invalid="ignore"):
            q_excl = invalid | (np.isnan(val) & ~invalid)
        codes, inv = np.unique(et, return_inverse=True)
        # per group: quantile-eligible values first (sorted), then rest
        order = np.lexsort((val, q_excl, inv))
        vs, gs = val[order], inv[order]
        from dedup_ray.core import segments

        starts, lens = segments(gs)
        n_valid = np.add.reduceat((~invalid[order]).astype(np.int64), starts)
        n_q = np.add.reduceat((~q_excl[order]).astype(np.int64), starts)
        has = n_q > 0

        def q_at(p: float) -> np.ndarray:
            # PERCENTILE_CONT: linear interpolation at rank p*(n-1)
            # over the quantile-eligible prefix of each segment.  At an
            # integer rank take the element itself — the interpolation
            # formula would compute vs[hi] * 0, which is NaN when
            # vs[hi] is +/-inf (DuckDB returns the exact element there)
            nv = np.maximum(n_q, 1)
            pos = starts + p * (nv - 1)
            lo = np.floor(pos).astype(np.int64)
            hi = np.minimum(lo + 1, starts + nv - 1)
            frac = pos - lo
            with np.errstate(invalid="ignore"):
                interp = vs[lo] * (1 - frac) + vs[hi] * frac
            return np.where(frac > 0, interp, vs[lo])

        def masked(vals: np.ndarray) -> pa.Array:
            return pa.array(
                [float(v) if h else None for v, h in zip(vals, has)],
                type=pa.float64(),
            )

        return pa.table(
            {
                "event_type": pa.array(codes[gs[starts]], type=pa.string()),
                "p50": sql_round(masked(q_at(0.5)), 6),
                "p95": sql_round(masked(q_at(0.95)), 6),
                "n": pa.array(n_valid, type=pa.int64()),
            }
        )

    from dedup_ray.core import hash_strings_u64

    def type_key(t: pa.Table) -> np.ndarray:
        # low-cardinality string key: hash the dictionary once per
        # batch, gather — not one blake2b per row
        d = pc.dictionary_encode(t["event_type"]).combine_chunks()
        uh = hash_strings_u64(d.dictionary.to_pylist())
        return uh[d.indices.to_numpy(zero_copy_only=False)]

    # "per type" is defined over non-null event_type — stated in the
    # oracle SQL's WHERE; a null type would NaN-poison the dictionary
    # indices in type_key and np.unique cannot sort None among strings
    typed = ds.map_batches(
        lambda t: t.filter(pc.is_valid(t["event_type"])),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return partitioned_kernel(
        typed,
        type_key,
        kernel,
        num_partitions=8,
        empty_result=empty,
    )


EVENTS_VALUE_QUANTILES_SQL = """
-- NaN semantics STATED: quantiles are computed over non-NaN values
-- (DuckDB's bare quantile_cont over a NaN-carrying group returns
-- input-order-dependent results — probed on DuckDB 1.0.0 — so the
-- FILTER pins a deterministic contract); n keeps count(value).
SELECT event_type,
       round(quantile_cont(value, 0.50)
               FILTER (WHERE NOT isnan(value)), 6) AS p50,
       round(quantile_cont(value, 0.95)
               FILTER (WHERE NOT isnan(value)), 6) AS p95,
       CAST(count(value) AS BIGINT)         AS n
FROM events
WHERE event_type IS NOT NULL
GROUP BY event_type
"""


def distinct_users_by_type(sf_dir: str) -> ray.data.Dataset:
    """Exact grouped COUNT(DISTINCT): two-stage — per-batch
    (event_type, user_id) dedup (combiner shrinks the exchange to
    unique pairs), global pair dedup + count per type.  At web scale
    the same shape degrades gracefully to a HyperLogLog partial with
    identical exchange volume per unique pair."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    )
    from dedup_ray.core import numeric_key_u64, partitioned_kernel

    # non-null semantics stated in the SQL: types over non-null
    # event_type (WHERE), and count(DISTINCT user_id) ignores null
    # users by SQL rule — both filtered here so the pair math below
    # never sees a NaN-degraded column
    pairs = ds.map_batches(
        lambda t: t.filter(
            pc.and_(pc.is_valid(t["event_type"]), pc.is_valid(t["user_id"]))
        )
        .group_by(["event_type", "user_id"])
        .aggregate([]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    part_empty = pa.table(
        {
            "event_type": pa.array([], pa.string()),
            "partial": pa.array([], pa.int64()),
        }
    )

    def kernel(g: pa.Table) -> pa.Table:
        """A user's pairs all land here (user-keyed exchange), so a
        partition-local pair-unique gives globally unique pairs; the
        per-type partial counts then sum in a tiny global groupby —
        never a per-group UDF over many groups (CLAUDE.md map_groups
        trap)."""
        et = g["event_type"].to_numpy(zero_copy_only=False)
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        codes, inv = np.unique(et, return_inverse=True)
        # pair-distinct via lexsorted boundary detection — an
        # arithmetic composite (inv * (max_uid+2) + uid) collides for
        # negative user_ids and wraps int64 for hash-sized ones,
        # silently dropping distinct (type, user) pairs
        order = np.lexsort((uid, inv))
        inv_s, uid_s = inv[order], uid[order]
        first = np.ones(len(inv_s), dtype=bool)
        if len(inv_s) > 1:
            first[1:] = (inv_s[1:] != inv_s[:-1]) | (uid_s[1:] != uid_s[:-1])
        types_u, counts = np.unique(inv_s[first], return_counts=True)
        return pa.table(
            {
                "event_type": pa.array(codes[types_u], type=pa.string()),
                "partial": pa.array(counts, type=pa.int64()),
            }
        )

    partials = partitioned_kernel(
        pairs,
        lambda t: numeric_key_u64(t, ["user_id"]),
        kernel,
        num_partitions=_DEFAULT_NUM_PARTITIONS,
        empty_result=part_empty,
    )
    out_empty = pa.table(
        {
            "event_type": pa.array([], pa.string()),
            "n_users": pa.array([], pa.int64()),
        }
    )

    def combine(g: pa.Table) -> pa.Table:
        # |event_types| x P partial rows — bounded by construction, so
        # one typed block (global_kernel) beats a sort shuffle that
        # would emit schema-less empties (CLAUDE.md trap)
        m = g.group_by("event_type").aggregate([("partial", "sum")])
        return pa.table(
            {
                "event_type": m["event_type"],
                "n_users": pc.cast(m["partial_sum"], pa.int64()),
            }
        )

    from dedup_ray.core import global_kernel

    return global_kernel(partials, combine, empty_result=out_empty)


DISTINCT_USERS_BY_TYPE_SQL = """
SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
WHERE event_type IS NOT NULL AND user_id IS NOT NULL
GROUP BY event_type
"""


# ---------------------------------------------------------------- Q3 shape
def tpch_q3_shipping(
    sf_dir: str, *, broadcast_max_rows: int | None = None
) -> ray.data.Dataset:
    """TPC-H Q3 shape: customer ⨝ orders ⨝ lineitem with selective
    filters, revenue per order, top 10.

    Scale shape: orders-after-filter and lineitem-after-filter are
    both fact-sized, so their join is ONE hash exchange on orderkey —
    both sides union into the same partitioned kernel (the repo's
    shuffle-join decomposition; Dataset.join is avoided per the Ray
    2.49 chained-join defect).  Inside a partition the join + group-by
    is one searchsorted + bincount — and because an orderkey lives in
    exactly one partition, per-key revenue sums are final with no
    second exchange; only the tiny per-partition top candidates reach
    the global sort.  The BUILDING customer key set is broadcast only
    while customer's metadata row count is under the gate; above it
    the semi-join rides a custkey exchange
    (core.exchange_join_unique_dim with no payload)."""
    from dedup_ray.core import (
        exchange_join_unique_dim,
        numeric_key_u64,
        parquet_num_rows,
        partitioned_kernel,
    )

    cutoff = np.datetime64("1995-03-15", "us")
    cap = BROADCAST_BUILD_MAX_ROWS if broadcast_max_rows is None else broadcast_max_rows
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment"],
        # segment predicate pushed into the scan
        filter=pc.field("c_mktsegment") == "BUILDING",
    ).map_batches(
        lambda t: t.select(["c_custkey"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    orders_raw = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        # date predicate pushed into the scan (row-group pruning)
        filter=pc.field("o_orderdate") < pa.scalar(cutoff),
    )

    def to_order_union(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.table(
            {
                "okey": t["o_orderkey"],
                "o_orderdate": t["o_orderdate"],
                "revenue_part": pa.nulls(n, pa.float64()),
                "is_order": pa.array(np.ones(n, dtype=bool)),
            }
        )

    if parquet_num_rows(f"{sf_dir}/customer.parquet") <= cap:
        bkeys = np.sort(
            np.concatenate(
                [
                    b["c_custkey"].to_numpy(zero_copy_only=False)
                    for b in cust.iter_batches(batch_format="pyarrow", batch_size=65536)
                ]
                or [np.empty(0, np.int64)]
            )
        )
        bkeys_ref = ray.put(bkeys)

        def orders_side(t: pa.Table) -> pa.Table:
            keys = _worker_broadcast(bkeys_ref)  # lru-cached ray.get per worker
            ck = t["o_custkey"].to_numpy(zero_copy_only=False)
            if len(keys):
                pos = np.searchsorted(keys, ck)
                pos[pos >= len(keys)] = 0  # ck > max(keys) can't match keys[0]
                mask = keys[pos] == ck
            else:
                mask = np.zeros(len(ck), dtype=bool)
            t = t.filter(pa.array(mask))
            return to_order_union(t)

        orders = orders_raw.map_batches(
            orders_side, batch_format="pyarrow", zero_copy_batch=True
        )
    else:
        orders = exchange_join_unique_dim(
            orders_raw,
            cust,
            fact_key="o_custkey",
            dim_key="c_custkey",
            fact_fields=[
                ("o_orderkey", pa.int64()),
                ("o_orderdate", pa.timestamp("us")),
            ],
            dim_fields=[],
            num_partitions=_DEFAULT_NUM_PARTITIONS,
        ).map_batches(to_order_union, batch_format="pyarrow", zero_copy_batch=True)

    def lineitem_side(t: pa.Table) -> pa.Table:
        rev = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        )
        n = len(t)
        return pa.table(
            {
                "okey": t["l_orderkey"],
                "o_orderdate": pa.nulls(n, pa.timestamp("us")),
                "revenue_part": rev,
                "is_order": pa.array(np.zeros(n, dtype=bool)),
            }
        )

    lines = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
        # null semantics STATED in the oracle SQL: revenue is defined
        # over fully-valued (price, discount) lines — a null measure
        # would NaN-poison the partition bincount where SQL's sum just
        # skips it; excluding them at the scan keeps the sums exact
        # and prunes dead rows before the exchange
        filter=(
            (pc.field("l_shipdate") > pa.scalar(cutoff))
            & pc.field("l_extendedprice").is_valid()
            & pc.field("l_discount").is_valid()
        ),
    ).map_batches(lineitem_side, batch_format="pyarrow", zero_copy_batch=True)

    empty = pa.table(
        {
            "l_orderkey": pa.array([], pa.int64()),
            "revenue": pa.array([], pa.float64()),
            "o_orderdate": pa.array([], pa.timestamp("us")),
        }
    )

    def kernel(g: pa.Table) -> pa.Table:
        is_ord = g["is_order"].to_numpy(zero_copy_only=False)
        okey = g["okey"].to_numpy(zero_copy_only=False)
        o_keys = okey[is_ord]
        # the union column is null on lineitem rows — fill before the
        # int64 cast or to_numpy degrades the whole column to float64
        o_dates = (
            pc.fill_null(g["o_orderdate"], pa.scalar(0, pa.timestamp("us")))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)[is_ord]
        )
        oo = unique_key_order(o_keys, name="o_orderkey")
        o_keys, o_dates = o_keys[oo], o_dates[oo]
        l_keys = okey[~is_ord]
        l_rev = g["revenue_part"].to_numpy(zero_copy_only=False)[~is_ord]
        pos = np.searchsorted(o_keys, l_keys)
        pos_c = np.minimum(pos, max(len(o_keys) - 1, 0))
        hit = (
            (o_keys[pos_c] == l_keys)
            if len(o_keys)
            else np.zeros(len(l_keys), bool)
        )
        lk, lr, ld = l_keys[hit], l_rev[hit], o_dates[pos_c[hit]]
        uk, inv = np.unique(lk, return_inverse=True)
        sums = np.bincount(inv, weights=lr, minlength=len(uk))
        first = np.zeros(len(uk), dtype=np.int64)
        first[inv[::-1]] = np.arange(len(lk) - 1, -1, -1)
        rev = sql_round(pa.array(sums, type=pa.float64()), 2)
        dates = ld[first]
        # an orderkey lives in exactly ONE partition, so this
        # partition's top-10 under the query's total order (rounded
        # revenue desc, date, key) is a complete candidate set — only
        # <= 10 rows per partition reach the global merge, replacing a
        # full Ray range-sort of every qualifying order (and Ray 2.49's
        # sort strips the schema off an all-empty sorted dataset).
        # DuckDB orders NaN revenue ABOVE every number in DESC (numpy
        # and Arrow both sort it last) — the nan level key matches it.
        rv = rev.to_numpy(zero_copy_only=False)
        with np.errstate(invalid="ignore"):
            nanlvl = np.where(np.isnan(rv), 0, 1).astype(np.int8)
            top = np.lexsort((uk, dates, -rv, nanlvl))[:10]
        idx = pa.array(top)
        return pa.table(
            {
                "l_orderkey": pa.array(uk, type=pa.int64()).take(idx),
                "revenue": rev.take(idx),
                "o_orderdate": pa.array(dates).cast(pa.timestamp("us")).take(idx),
            }
        )

    candidates = partitioned_kernel(
        orders.union(lines),
        lambda t: numeric_key_u64(t, ["okey"]),
        kernel,
        num_partitions=64,
        empty_result=empty,
    )

    def final_top10(g: pa.Table) -> pa.Table:
        # same NaN-first-under-DESC convention as the candidate kernel
        nanlvl = pc.if_else(
            pc.is_nan(g["revenue"]), pa.scalar(0, pa.int8()), pa.scalar(1, pa.int8())
        )
        return (
            g.append_column("_nanlvl", nanlvl)
            .sort_by(
                [
                    ("_nanlvl", "ascending"),
                    ("revenue", "descending"),
                    ("o_orderdate", "ascending"),
                    ("l_orderkey", "ascending"),
                ]
            )
            .slice(0, 10)
            .drop(["_nanlvl"])
        )

    from dedup_ray.core import global_kernel

    return global_kernel(candidates, final_top10, empty_result=empty)


TPCH_Q3_SHIPPING_SQL = """
SELECT l_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       o_orderdate
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15'
  AND l_shipdate  > TIMESTAMP '1995-03-15'
  AND l_extendedprice IS NOT NULL AND l_discount IS NOT NULL
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


# ---------------------------------------------------------------- B21 multi-way join
def tpch_q5_region_revenue(
    sf_dir: str, *, broadcast_max_rows: int | None = None
) -> ray.data.Dataset:
    """TPC-H Q5 shape: region ⨝ nation ⨝ customer ⨝ orders ⨝ lineitem
    ⨝ supplier, revenue per nation for orders whose customer and
    supplier share an in-region nation.

    Scale shape: region/nation are always tiny; customer/supplier are
    folded into TWO broadcast probe tables (custkey→nation for
    in-region customers, suppkey→nation for in-region suppliers) while
    their metadata row counts are under BROADCAST_BUILD_MAX_ROWS, so
    the two fact tables stream map-only into ONE orderkey hash
    exchange.  Above the cap each probe rides its own key-hash
    exchange instead (core.exchange_join_unique_dim) — same output
    bit-exactly (tests/test_broadcast_fallback.py).  Inside a
    partition the orders⨝lineitem join is a searchsorted probe
    (orderkey unique on the build side) and the c_nationkey ==
    s_nationkey predicate plus the per-nation revenue sum collapse to
    a masked bincount over nation codes — partials of at most
    n_nations rows per partition reach the tiny global aggregate."""
    from dedup_ray.core import (
        numeric_key_u64,
        parquet_num_rows,
        partitioned_kernel,
        read_small_table,
    )

    lo = np.datetime64("1995-01-01", "us")
    hi = np.datetime64("1997-01-01", "us")
    region = read_small_table(
        f"{sf_dir}/region.parquet", ["r_regionkey", "r_name"]
    ).to_pandas()
    nation = read_small_table(
        f"{sf_dir}/nation.parquet", ["n_nationkey", "n_name", "n_regionkey"]
    ).to_pandas()
    asia = set(region.loc[region["r_name"] == "ASIA", "r_regionkey"])
    nat = nation[nation["n_regionkey"].isin(asia)]
    nat_keys = nat["n_nationkey"].to_numpy(dtype=np.int64)
    nat_names = {int(k): str(v) for k, v in zip(nat_keys, nat["n_name"])}
    in_region = np.zeros(
        (int(nation["n_nationkey"].max()) + 1) if len(nation) else 1, dtype=bool
    )
    in_region[nat_keys] = True

    def _region_keep(nats: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Inner-join semantics for the nation lookup: a null or
        unknown (out-of-table) nationkey matches no nation — mask it
        out instead of indexing past the dense lookup's bounds."""
        if nats.dtype.kind == "f":
            valid = np.isfinite(nats)
            nats_i = np.where(valid, nats, 0).astype(np.int64)
        else:
            valid = np.ones(len(nats), dtype=bool)
            nats_i = nats.astype(np.int64, copy=False)
        inb = valid & (nats_i >= 0) & (nats_i < len(in_region))
        keep = np.zeros(len(nats), dtype=bool)
        keep[inb] = in_region[nats_i[inb]]
        return keep, nats_i

    cap = BROADCAST_BUILD_MAX_ROWS if broadcast_max_rows is None else broadcast_max_rows
    small_build = (
        parquet_num_rows(f"{sf_dir}/customer.parquet") <= cap
        and parquet_num_rows(f"{sf_dir}/supplier.parquet") <= cap
    )

    orders_raw = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        # year-range predicate pushed into the scan (row-group pruning)
        filter=(
            (pc.field("o_orderdate") >= pa.scalar(lo))
            & (pc.field("o_orderdate") < pa.scalar(hi))
        ),
    )
    lines_raw = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
        # null semantics STATED in the oracle SQL: revenue is defined
        # over fully-valued (price, discount) lines (see tpch_q3)
        filter=(
            pc.field("l_extendedprice").is_valid()
            & pc.field("l_discount").is_valid()
        ),
    )

    def _line_rev(t: pa.Table) -> pa.Table:
        rev = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        )
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_suppkey": t["l_suppkey"],
                "revenue_part": rev,
            }
        )

    if small_build:

        def _probe(keys_col, nats_col, df):
            df = df.dropna(subset=[keys_col, nats_col])
            keys = df[keys_col].to_numpy(dtype=np.int64)
            keep, nats = _region_keep(df[nats_col].to_numpy())
            keys, nats = keys[keep], nats[keep]
            order = unique_key_order(keys, name=keys_col)
            return keys[order], nats[order]

        cust = read_small_table(
            f"{sf_dir}/customer.parquet", ["c_custkey", "c_nationkey"]
        ).to_pandas()
        supp = read_small_table(
            f"{sf_dir}/supplier.parquet", ["s_suppkey", "s_nationkey"]
        ).to_pandas()
        probes_ref = ray.put(
            (_probe("c_custkey", "c_nationkey", cust), _probe("s_suppkey", "s_nationkey", supp))
        )

        def orders_side(t: pa.Table) -> pa.Table:
            (ck, cn), _ = _worker_broadcast(probes_ref)
            keys = t["o_custkey"].to_numpy(zero_copy_only=False)
            idx = np.minimum(np.searchsorted(ck, keys), max(len(ck) - 1, 0))
            hit = (ck[idx] == keys) if len(ck) else np.zeros(len(keys), bool)
            t = t.filter(pa.array(hit))
            n = len(t)
            return pa.table(
                {
                    "okey": t["o_orderkey"],
                    "nat": pa.array(cn[idx[hit]], type=pa.int64()),
                    "revenue_part": pa.nulls(n, pa.float64()),
                    "is_order": pa.array(np.ones(n, dtype=bool)),
                }
            )

        def lineitem_side(t: pa.Table) -> pa.Table:
            _, (sk, sn) = _worker_broadcast(probes_ref)
            keys = t["l_suppkey"].to_numpy(zero_copy_only=False)
            idx = np.minimum(np.searchsorted(sk, keys), max(len(sk) - 1, 0))
            hit = (sk[idx] == keys) if len(sk) else np.zeros(len(keys), bool)
            t = t.filter(pa.array(hit))
            rev = pc.multiply(
                t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
            )
            n = len(t)
            return pa.table(
                {
                    "okey": t["l_orderkey"],
                    "nat": pa.array(sn[idx[hit]], type=pa.int64()),
                    "revenue_part": rev,
                    "is_order": pa.array(np.zeros(n, dtype=bool)),
                }
            )

        orders = orders_raw.map_batches(
            orders_side, batch_format="pyarrow", zero_copy_batch=True
        )
        lines = lines_raw.map_batches(
            lineitem_side, batch_format="pyarrow", zero_copy_batch=True
        )
    else:
        # above-cap fallback: the customer and supplier probes each ride
        # their own key-hash exchange (exchange_join_unique_dim); the
        # in-region nation filter stays a tiny closure-captured array.
        from dedup_ray.core import exchange_join_unique_dim

        def _dim_nat(key_col, nat_col):
            def f(t: pa.Table) -> pa.Table:
                t = t.filter(pc.is_valid(t[key_col]))
                keep, nats = _region_keep(
                    t[nat_col].to_numpy(zero_copy_only=False)
                )
                return pa.table(
                    {
                        key_col: t[key_col].filter(pa.array(keep)),
                        "nat": pa.array(nats[keep], type=pa.int64()),
                    }
                )

            return f

        cust_dim = ray.data.read_parquet(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
        ).map_batches(
            _dim_nat("c_custkey", "c_nationkey"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        supp_dim = ray.data.read_parquet(
            f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
        ).map_batches(
            _dim_nat("s_suppkey", "s_nationkey"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        orders_j = exchange_join_unique_dim(
            orders_raw,
            cust_dim,
            fact_key="o_custkey",
            dim_key="c_custkey",
            fact_fields=[("o_orderkey", pa.int64())],
            dim_fields=[("nat", pa.int64())],
            num_partitions=_DEFAULT_NUM_PARTITIONS,
        )
        lines_j = exchange_join_unique_dim(
            lines_raw.map_batches(
                _line_rev, batch_format="pyarrow", zero_copy_batch=True
            ),
            supp_dim,
            fact_key="l_suppkey",
            dim_key="s_suppkey",
            fact_fields=[("l_orderkey", pa.int64()), ("revenue_part", pa.float64())],
            dim_fields=[("nat", pa.int64())],
            num_partitions=_DEFAULT_NUM_PARTITIONS,
        )
        orders = orders_j.map_batches(
            lambda t: pa.table(
                {
                    "okey": t["o_orderkey"],
                    "nat": t["nat"],
                    "revenue_part": pa.nulls(len(t), pa.float64()),
                    "is_order": pa.array(np.ones(len(t), dtype=bool)),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        lines = lines_j.map_batches(
            lambda t: pa.table(
                {
                    "okey": t["l_orderkey"],
                    "nat": t["nat"],
                    "revenue_part": t["revenue_part"],
                    "is_order": pa.array(np.zeros(len(t), dtype=bool)),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    partial_empty = pa.table(
        {
            "nat": pa.array([], pa.int64()),
            "revenue_raw": pa.array([], pa.float64()),
        }
    )

    def kernel(g: pa.Table) -> pa.Table:
        is_ord = g["is_order"].to_numpy(zero_copy_only=False)
        okey = g["okey"].to_numpy(zero_copy_only=False)
        nat = g["nat"].to_numpy(zero_copy_only=False)
        o_keys, o_nat = okey[is_ord], nat[is_ord]
        oo = unique_key_order(o_keys, name="o_orderkey")
        o_keys, o_nat = o_keys[oo], o_nat[oo]
        l_keys, l_nat = okey[~is_ord], nat[~is_ord]
        l_rev = g["revenue_part"].to_numpy(zero_copy_only=False)[~is_ord]
        pos = np.minimum(np.searchsorted(o_keys, l_keys), max(len(o_keys) - 1, 0))
        hit = (
            (o_keys[pos] == l_keys) & (o_nat[pos] == l_nat)
            if len(o_keys)
            else np.zeros(len(l_keys), bool)
        )
        if not hit.any():
            return partial_empty
        sums = np.bincount(l_nat[hit], weights=l_rev[hit])
        # emit every nation WITH MATCHES, not every nation with nonzero
        # revenue — a nation whose matched revenue sums to exactly 0.0
        # (all discounts 1.0) must still appear, as the SQL's inner
        # join keeps it with revenue 0.00
        hits_per_nat = np.bincount(l_nat[hit])
        nz = np.flatnonzero(hits_per_nat)
        return pa.table(
            {
                "nat": pa.array(nz, type=pa.int64()),
                "revenue_raw": pa.array(sums[nz], type=pa.float64()),
            }
        )

    partials = partitioned_kernel(
        orders.union(lines),
        lambda t: numeric_key_u64(t, ["okey"]),
        kernel,
        num_partitions=64,
        empty_result=partial_empty,
    )
    empty = pa.table(
        {"n_name": pa.array([], pa.string()), "revenue": pa.array([], pa.float64())}
    )

    def combine(g: pa.Table) -> pa.Table:
        # |nations| x P partial rows -> one typed, globally sorted block
        m = g.group_by("nat").aggregate([("revenue_raw", "sum")])
        names = [nat_names[int(k)] for k in m["nat"].to_pylist()]
        out = pa.table(
            {
                "n_name": pa.array(names, pa.string()),
                "revenue": sql_round(m["revenue_raw_sum"], 2),
            }
        )
        return out.sort_by([("revenue", "descending"), ("n_name", "ascending")])

    from dedup_ray.core import global_kernel

    return global_kernel(partials, combine, empty_result=empty)


TPCH_Q5_REGION_REVENUE_SQL = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1995-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
  AND l_extendedprice IS NOT NULL AND l_discount IS NOT NULL
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


# ---------------------------------------------------------------- B22 window (LAG)
def events_interarrival(sf_dir: str) -> ray.data.Dataset:
    """Per-user inter-arrival statistics: the LAG-window family.  Gaps
    between consecutive events (ordered by ts, event_id) in integer
    microseconds; users with a single event have no gaps and are
    dropped (matching the SQL's WHERE gap IS NOT NULL).

    Scale shape: one user_id hash exchange, then a single globally
    vectorized kernel per partition — lexsort (user, ts, event_id),
    np.diff within user segments, segment-reduced count/sum/max via
    reduceat.  Integer-µs arithmetic keeps both sides bit-exact."""
    from dedup_ray.core import numeric_key_u64, partitioned_kernel

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id"]
    ).map_batches(
        # gaps are defined over timestamped, attributed events — stated
        # in the SQL's CTE WHERE.  A null ts would NaN-degrade the
        # int64 cast and the NaN diff silently casts to INT64_MIN in
        # the preallocated gaps array (garbage stats, no error)
        lambda t: t.filter(
            pc.and_(pc.is_valid(t["ts"]), pc.is_valid(t["user_id"]))
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    empty = pa.table(
        {
            "user_id": pa.array([], pa.int64()),
            "n_gaps": pa.array([], pa.int64()),
            "avg_gap_us": pa.array([], pa.float64()),
            "max_gap_us": pa.array([], pa.int64()),
        }
    )

    def kernel(g: pa.Table) -> pa.Table:
        users = g["user_id"].to_numpy(zero_copy_only=False)
        ts = g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, users))
        u_s, t_s = users[order], ts[order]
        n = len(u_s)
        if n == 0:
            return empty
        same_user = np.zeros(n, dtype=bool)
        same_user[1:] = u_s[1:] == u_s[:-1]
        gaps = np.empty(n, dtype=np.int64)
        gaps[1:] = t_s[1:] - t_s[:-1]
        gap_idx = np.flatnonzero(same_user)
        if len(gap_idx) == 0:
            return empty
        gu = u_s[gap_idx]
        gv = gaps[gap_idx]
        firsts = np.ones(len(gu), dtype=bool)
        firsts[1:] = gu[1:] != gu[:-1]
        starts = np.flatnonzero(firsts)
        counts = np.diff(np.concatenate([starts, [len(gu)]]))
        sums = np.add.reduceat(gv, starts)
        maxs = np.maximum.reduceat(gv, starts)
        avg = sums.astype(np.float64) / counts.astype(np.float64)
        return pa.table(
            {
                "user_id": pa.array(gu[starts], pa.int64()),
                "n_gaps": pa.array(counts, pa.int64()),
                "avg_gap_us": sql_round(pa.array(avg, pa.float64()), 4),
                "max_gap_us": pa.array(maxs, pa.int64()),
            }
        )

    return partitioned_kernel(
        ds,
        lambda t: numeric_key_u64(t, ["user_id"]),
        kernel,
        num_partitions=_DEFAULT_NUM_PARTITIONS,
        empty_result=empty,
    )


EVENTS_INTERARRIVAL_SQL = """
WITH g AS (
  SELECT user_id,
         date_diff('microseconds',
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                   ts) AS gap_us
  FROM events
  WHERE ts IS NOT NULL AND user_id IS NOT NULL
)
SELECT user_id,
       cast(count(gap_us) AS bigint) AS n_gaps,
       round(avg(gap_us), 4)         AS avg_gap_us,
       cast(max(gap_us) AS bigint)   AS max_gap_us
FROM g
WHERE gap_us IS NOT NULL
GROUP BY user_id
"""


# ---------------------------------------------------------------- B18 rollup
def orders_rollup(sf_dir: str) -> ray.data.Dataset:
    """Multi-level aggregate (GROUP BY ROLLUP shape): per (status,
    priority), per status subtotal, and grand total, with 'ALL'
    sentinels for the rolled-up levels.

    Scale shape: the fine-grained (status, priority) aggregate is the
    only thing computed from the fact table (map-side partials →
    small global groupby); the rollup levels are derived from the
    ≤ |status|×|priority| fine rows in a single-partition finalize —
    no second pass over the data."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderstatus", "o_orderpriority", "o_totalprice"],
    )

    def partial(t: pa.Table) -> pa.Table:
        # n must be count(*) (the SQL counts null-price rows too), and
        # the non-null price count rides along so an all-null-price
        # group can emit sum_price NULL like SQL's sum()
        g = t.group_by(["o_orderstatus", "o_orderpriority"]).aggregate(
            [("o_totalprice", "sum"), ("o_totalprice", "count"), ([], "count_all")]
        )
        return pa.table(
            {
                "o_orderstatus": g["o_orderstatus"],
                "o_orderpriority": g["o_orderpriority"],
                "price_sum": g["o_totalprice_sum"],
                "np_part": g["o_totalprice_count"],
                "n_part": g["count_all"],
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    #: SQL ROLLUP on a fully empty table still yields the
    #: ('ALL','ALL',0,NULL) grand-total row — global_kernel's fallback
    #: value IS that row, so the empty-corpus edge now matches the
    #: oracle exactly instead of emitting nothing.
    rollup_fallback = pa.table(
        {
            "o_orderstatus": pa.array(["ALL"], pa.string()),
            "o_orderpriority": pa.array(["ALL"], pa.string()),
            "n": pa.array([0], pa.int64()),
            "sum_price": pa.array([None], pa.float64()),
        }
    )

    def rollup(g: pa.Table) -> pa.Table:
        # combine the per-batch partials, then derive the rollup levels
        # from the <= |status| x |priority| fine rows — one typed block.
        # Null keys form their own group (like SQL's GROUP BY) and
        # every level's labels go through the same coalesce(x, 'ALL')
        # the oracle applies; an all-null-price group emits sum NULL.
        fine = g.group_by(["o_orderstatus", "o_orderpriority"]).aggregate(
            [("price_sum", "sum"), ("np_part", "sum"), ("n_part", "sum")]
        )
        status = np.array(fine["o_orderstatus"].to_pylist(), dtype=object)
        prio = np.array(fine["o_orderpriority"].to_pylist(), dtype=object)
        sums = fine["price_sum_sum"].to_numpy(zero_copy_only=False).astype(np.float64)
        nps = fine["np_part_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        # zero ONLY the SQL-NULL slots (no non-null price in the fine
        # group, nps == 0) so they contribute 0 to subtotals like SQL's
        # null-skipping sum.  nan_to_num here would also zero a GENUINE
        # NaN sum and clamp +/-inf to DBL_MAX, where SQL propagates
        # both through every rollup level (NaN/inf parity probe).
        sums = np.where(nps == 0, 0.0, sums)
        ns = fine["n_part_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        coal = lambda x: "ALL" if x is None else x

        out_s = [coal(s) for s in status]
        out_p = [coal(p) for p in prio]
        out_sum = [float(v) if k else None for v, k in zip(sums, nps)]
        out_n = list(ns)
        for s in sorted(set(status), key=lambda x: (x is None, x)):
            m = np.array([x == s for x in status], dtype=bool)
            out_s.append(coal(s))
            out_p.append("ALL")
            out_sum.append(float(sums[m].sum()) if nps[m].sum() else None)
            out_n.append(int(ns[m].sum()))
        out_s.append("ALL")
        out_p.append("ALL")
        out_sum.append(float(sums.sum()) if nps.sum() else None)
        out_n.append(int(ns.sum()))
        return pa.table(
            {
                "o_orderstatus": pa.array(out_s, pa.string()),
                "o_orderpriority": pa.array(out_p, pa.string()),
                "n": pa.array(out_n, pa.int64()),
                "sum_price": sql_round(pa.array(out_sum, pa.float64()), 2),
            }
        )

    from dedup_ray.core import global_kernel

    return global_kernel(partials, rollup, empty_result=rollup_fallback)


ORDERS_ROLLUP_SQL = """
SELECT coalesce(o_orderstatus, 'ALL')   AS o_orderstatus,
       coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
       cast(count(*) AS bigint)         AS n,
       round(sum(o_totalprice), 2)      AS sum_price
FROM orders
GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
"""


# ---------------------------------------------------------------- B21 part join
def part_revenue_by_brand(
    sf_dir: str, *, broadcast_max_rows: int | None = None
) -> ray.data.Dataset:
    """Revenue + item count per part brand: lineitem ⨝ part on
    partkey, grouped by p_brand — the classic fact ⨝ product-dimension
    rollup (TPC-H Q14's join shape with a per-brand breakdown).

    Scale shape: part is the unique-key dimension — broadcast probe
    under the gate, key-hash exchange (core.exchange_join_unique_dim)
    above it; either plan streams lineitem map-only / one exchange and
    pre-aggregates per batch before the tiny per-brand groupby."""
    from dedup_ray.core import (
        exchange_join_unique_dim,
        parquet_num_rows,
        read_small_table,
    )

    cap = BROADCAST_BUILD_MAX_ROWS if broadcast_max_rows is None else broadcast_max_rows
    lines = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"],
    )

    def rev_cols(t: pa.Table) -> pa.Table:
        rev = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        )
        return pa.table({"l_partkey": t["l_partkey"], "rev": rev})

    lines = lines.map_batches(rev_cols, batch_format="pyarrow", zero_copy_batch=True)

    if parquet_num_rows(f"{sf_dir}/part.parquet") <= cap:
        part = read_small_table(
            f"{sf_dir}/part.parquet", ["p_partkey", "p_brand"]
        ).to_pandas()
        keys = part["p_partkey"].to_numpy()
        order = unique_key_order(keys, name="p_partkey")
        ref = ray.put((keys[order], part["p_brand"].to_numpy(dtype=object)[order]))

        def probe(t: pa.Table) -> pa.Table:
            keys_s, brands = _worker_broadcast(ref)
            pk = t["l_partkey"].to_numpy(zero_copy_only=False)
            idx = np.minimum(np.searchsorted(keys_s, pk), max(len(keys_s) - 1, 0))
            hit = (keys_s[idx] == pk) if len(keys_s) else np.zeros(len(pk), bool)
            return pa.table(
                {
                    "p_brand": pa.array(brands[idx[hit]], type=pa.string()),
                    "rev": t["rev"].filter(pa.array(hit)),
                }
            )

        joined = lines.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)
    else:
        dim = ray.data.read_parquet(
            f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
        )
        joined = exchange_join_unique_dim(
            lines,
            dim,
            fact_key="l_partkey",
            dim_key="p_partkey",
            fact_fields=[("rev", pa.float64())],
            dim_fields=[("p_brand", pa.string())],
            num_partitions=_DEFAULT_NUM_PARTITIONS,
        )

    def partial(t: pa.Table) -> pa.Table:
        # map-side combiner: the full joined fact table never reaches a
        # shuffle — only ~|brands| rows per batch do
        if "p_brand" not in t.column_names or len(t) == 0:
            return pa.table(
                {
                    "p_brand": pa.array([], pa.string()),
                    "n_part": pa.array([], pa.int64()),
                    "rev_part": pa.array([], pa.float64()),
                }
            )
        g = t.group_by("p_brand").aggregate([("rev", "sum"), ([], "count_all")])
        return pa.table(
            {
                "p_brand": g["p_brand"],
                "n_part": pc.cast(g["count_all"], pa.int64()),
                "rev_part": g["rev_sum"],
            }
        )

    partials = joined.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    empty = pa.table(
        {
            "p_brand": pa.array([], pa.string()),
            "n_items": pa.array([], pa.int64()),
            "revenue": pa.array([], pa.float64()),
        }
    )

    def combine(g: pa.Table) -> pa.Table:
        m = g.group_by("p_brand").aggregate([("n_part", "sum"), ("rev_part", "sum")])
        return pa.table(
            {
                "p_brand": m["p_brand"],
                "n_items": pc.cast(m["n_part_sum"], pa.int64()),
                "revenue": sql_round(m["rev_part_sum"], 2),
            }
        )

    from dedup_ray.core import global_kernel

    return global_kernel(partials, combine, empty_result=empty)


PART_REVENUE_BY_BRAND_SQL = """
SELECT p_brand,
       cast(count(*) AS bigint)                          AS n_items,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


# ---------------------------------------------------------------- argmax/group
def events_daily_top_type(sf_dir: str) -> ray.data.Dataset:
    """Per calendar day, THE most frequent event type (argmax per
    group, deterministic tie-break on event_type) — the grouped-argmax
    window shape (row_number() = 1 over count DESC).

    Scale shape: per-batch (day, type) count partials, then ONE
    day-keyed hash exchange whose kernel both merges the partials and
    picks each day's winner vectorized — raw events never reach the
    exchange, and no per-day Python dispatch."""
    from dedup_ray.core import numeric_key_u64, partitioned_kernel

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])
    part_empty = pa.table(
        {
            "day": pa.array([], pa.timestamp("us")),
            "event_type": pa.array([], pa.string()),
            "n_part": pa.array([], pa.int64()),
        }
    )

    def partial(t: pa.Table) -> pa.Table:
        # non-null semantics stated in the oracle SQL's WHERE: "per
        # day" over non-null ts (DuckDB's window PARTITION BY treats
        # every NULL day as a DISTINCT partition — one rn=1 row per
        # (null, type) group — while the kernel's int64 cast would
        # NaN-poison the day keys), and competing types over non-null
        # event_type (np.unique cannot sort None among strings).
        t = t.filter(
            pc.and_(pc.is_valid(t["ts"]), pc.is_valid(t["event_type"]))
        )
        day = pc.floor_temporal(t["ts"], unit="day")
        g = (
            pa.table({"day": day, "event_type": t["event_type"]})
            .group_by(["day", "event_type"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                "day": g["day"],
                "event_type": g["event_type"],
                "n_part": pc.cast(g["count_all"], pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    out_empty = pa.table(
        {
            "day": pa.array([], pa.timestamp("us")),
            "event_type": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
        }
    )

    def argmax_kernel(g: pa.Table) -> pa.Table:
        from dedup_ray.core import segments

        days = g["day"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        etypes = np.array(g["event_type"].to_pylist(), dtype=object)
        n_part = g["n_part"].to_numpy(zero_copy_only=False)
        # merge partials per (day, type): dictionary-encode types, sum
        # by composite segment
        _, codes = np.unique(etypes, return_inverse=True)
        order = np.lexsort((codes, days))
        d_s, c_s, n_s = days[order], codes[order], n_part[order]
        change = np.ones(len(d_s), dtype=bool)
        change[1:] = (d_s[1:] != d_s[:-1]) | (c_s[1:] != c_s[:-1])
        starts = np.flatnonzero(change)
        sums = np.add.reduceat(n_s, starts)
        day_g, code_g = d_s[starts], c_s[starts]
        type_g = etypes[order][starts]
        # argmax per day: (count desc, type asc)
        order2 = np.lexsort((type_g, -sums, day_g))
        dd = day_g[order2]
        first = np.ones(len(dd), dtype=bool)
        first[1:] = dd[1:] != dd[:-1]
        win = order2[first]
        return pa.table(
            {
                "day": pa.array(day_g[win]).cast(pa.timestamp("us")),
                "event_type": pa.array(type_g[win], pa.string()),
                "n": pa.array(sums[win], pa.int64()),
            }
        )

    return partitioned_kernel(
        partials,
        lambda t: numeric_key_u64(
            pa.table({"d": t["day"].cast(pa.int64())}), ["d"]
        ),
        argmax_kernel,
        num_partitions=_DEFAULT_NUM_PARTITIONS,
        empty_result=out_empty,
    )


EVENTS_DAILY_TOP_TYPE_SQL = """
WITH c AS (
  SELECT date_trunc('day', ts) AS day, event_type,
         cast(count(*) AS bigint) AS n
  FROM events
  WHERE ts IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1, 2
), r AS (
  SELECT day, event_type, n,
         row_number() OVER (PARTITION BY day ORDER BY n DESC, event_type) AS rn
  FROM c
)
SELECT cast(day AS timestamp) AS day, event_type, n FROM r WHERE rn = 1
"""
