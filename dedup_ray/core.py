"""Partitioned-kernel execution helper — the engine's answer to Ray
Data's per-group ``map_groups`` overhead.

``GroupedData.map_groups`` calls the UDF once per key group.  With
millions of tiny groups (LSH buckets, sha groups, candidate pairs)
that per-group Python dispatch dominates wall time and—worse—does not
parallelize beyond the sort.  The scalable shape is:

  1. append an int64 ``_pkey = stable_hash(key) % P`` column
     (vectorized for numeric keys; one cheap C hash call per row for
     string keys),
  2. ``groupby("_pkey").map_groups`` — exactly P groups, so P UDF
     calls total, each receiving EVERY row of its hash partition
     (co-location guarantee: all rows of one logical key share a
     partition),
  3. the kernel segments its partition vectorized (np.lexsort /
     np.unique) and processes all groups in numpy at once.

P (``num_partitions``) is the multi-node lever: pick ~2-4x total
cores; each partition must fit a worker's heap.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa
import ray.data

from dedup_ray.util import splitmix64

PKEY = "_pkey"


def schema_names(ds: ray.data.Dataset) -> list[str]:
    """Column names of a Dataset, `[]` when the schema is unknowable.

    ``Dataset.schema()`` returns None for a pipeline whose blocks all
    came out empty/schema-less (zero-row corpus, an exchange over an
    empty shard) — every ``"col" in ds.schema().names`` guard must go
    through this or it crashes on exactly the degenerate input it
    guards against."""
    s = ds.schema(fetch_if_missing=True)
    return list(s.names) if s is not None else []


def default_pool_size(cap: int = 64) -> int:
    """Actor-pool max = the session's CPU count (pools autoscale from
    1, so a small test session never deadlocks waiting for actors)."""
    import ray

    try:
        return max(1, min(cap, int(ray.cluster_resources().get("CPU", 8))))
    except Exception:
        return 8


def hash_strings_u64(values: list) -> np.ndarray:
    """Stable per-row 64-bit hash of a string column.  Alias of
    ``util.hash_urls_u64`` (the designated hashing home — CLAUDE.md):
    a single definition keeps every doc_id / partition key derived
    from one function that cannot drift."""
    from dedup_ray.util import hash_urls_u64

    return hash_urls_u64(values)


def numeric_key_u64(table: pa.Table, cols: list[str]) -> np.ndarray:
    """Vectorized combined hash of numeric key columns.  Null keys get
    a fixed sentinel code: a null-bearing int column degrades to
    float64+NaN under to_numpy, and NaN.astype(uint64) is platform-UB
    garbage — tolerable for rows a later join drops anyway, but the
    sentinel keeps partition placement well-defined everywhere."""
    import pyarrow.compute as pc

    acc = np.zeros(len(table), dtype=np.uint64)
    with np.errstate(over="ignore", invalid="ignore"):
        for c in cols:
            arr = table[c]
            nulls = None
            if isinstance(arr, (pa.Array, pa.ChunkedArray)) and arr.null_count:
                nulls = pc.is_null(arr).to_numpy(zero_copy_only=False)
                arr = pc.fill_null(arr, 0)
            col = arr.to_numpy(zero_copy_only=False)
            if col.dtype == np.int64 or col.dtype == np.int32:
                col = col.astype(np.int64).view(np.uint64)
            else:
                col = col.astype(np.uint64)
            if nulls is not None:
                col = col.copy()
                col[nulls] = np.uint64(0x9E6A5E4D3C2B1A09)
            acc = acc * np.uint64(0x9E3779B97F4A7C15) + col
    return splitmix64(acc)


def _split_block(
    key_hash_fn, num_partitions: int, *tbls: pa.Table
) -> list[pa.Table | None]:
    """Map side of the exchange: split a GROUP of input blocks into
    per-partition sub-tables (vectorized argsort + slice).  Taking many
    blocks per task is the plasma-op lever: the object store serializes
    create/seal/get through one server thread, so the exchange cost is
    dominated by the G x P object count, not bytes (measured: ~19k
    small objects per exchange at B=293 blocks made the 3-exchange LSH
    stage SLOWER at 8 cpus than at 2)."""
    live = [t for t in tbls if t is not None and len(t) > 0 and t.num_columns > 0]
    if not live:
        return [None] * num_partitions
    tbl = live[0] if len(live) == 1 else pa.concat_tables(live, promote_options="default")
    h = key_hash_fn(tbl)
    pk = (h % np.uint64(num_partitions)).astype(np.int64)
    order = np.argsort(pk, kind="stable")
    sorted_tbl = tbl.take(pa.array(order))
    pk_sorted = pk[order]
    out: list[pa.Table | None] = [None] * num_partitions
    starts, lens = segments(pk_sorted)
    for s, L in zip(starts.tolist(), lens.tolist()):
        out[int(pk_sorted[s])] = sorted_tbl.slice(s, L)
    return out


def _reduce_partition(kernel, empty_result: pa.Table, *parts) -> pa.Table:
    tbls = [t for t in parts if t is not None and len(t) > 0]
    if not tbls:
        return empty_result
    g = pa.concat_tables(tbls, promote_options="default")
    out = kernel(g)
    return out if len(out) else empty_result


def partitioned_kernel(
    ds: ray.data.Dataset,
    key_hash_fn: Callable[[pa.Table], np.ndarray],
    kernel: Callable[[pa.Table], pa.Table],
    *,
    num_partitions: int = 64,
    empty_result: pa.Table,
    target_rows_per_partition: int = 8192,
) -> ray.data.Dataset:
    """Run ``kernel`` once per hash partition with all rows of any
    logical key co-located.

    The exchange is a CUSTOM map/reduce over raw Ray tasks — the one
    place this engine drops below the Dataset API: Ray 2.49's groupby
    is a sample+range SORT shuffle (wasted work and a scaling
    bottleneck when only hash co-location is needed; measured 2-3x
    slower at 32 cpus on the 600k-row corpus), and its HASH_SHUFFLE
    strategy spawns per-partition aggregator actors that thrash a
    single node.  Here: each input block is split into P sub-tables
    vectorized (one task per block, ``num_returns=P``), then P gather
    tasks concat their slices and run the kernel — all zero-copy
    through the object store, no sort, no sampling, O(B x P) small
    objects.  P is the multi-node lever: ~2-4x total cores, each
    partition must fit a worker heap.

    ``key_hash_fn(batch) -> uint64 ndarray`` must be a pure function of
    the key columns.  ``kernel`` receives a partition table (multiple
    keys, unsorted) and must tolerate any subset of keys.  Schema-less
    empty blocks are absorbed here so kernels never see them.

    ``num_partitions`` is an UPPER BOUND: the effective P adapts down to
    ``ceil(rows / target_rows_per_partition)`` so small inputs (tests,
    sf0.01 tables, the tail of a skewed stage) don't pay 64 reduce
    tasks of scheduling overhead per exchange.  Kernel outputs are
    P-invariant (each logical key is processed whole wherever it
    lands), so adaptivity never changes results — golden tests pin
    this.  The row count is free: the dataset is materialized for
    ``to_arrow_refs`` anyway, making ``count()`` metadata-only.
    """
    mat = ds.materialize()
    block_refs = list(mat.to_arrow_refs())
    total_rows = mat.count()
    if not block_refs or total_rows == 0:
        # Short-circuit BEFORE spawning the reduce: zero-row inputs
        # surface as schema-less blocks (they bypass map_batches), and
        # Ray 2.49's from_arrow_refs drops the schema of an empty
        # result block — from_arrow(empty_result) keeps ds.schema()
        # intact for downstream `schema_names` guards.
        return ray.data.from_arrow(empty_result)
    # NOTE: adapt DOWN only on row count, never on session CPU count.
    # Measured (2.4M-page corpus, signature-verify exchange): halving P
    # below the configured 64 DOUBLES wall time — the reduce kernel's
    # chunked concat+take over a 4x-larger partition loses cache
    # locality — while P larger than configured also loses (P=128 was
    # 1.8x slower than 64).  Small inputs still collapse to few
    # partitions via the rows target, which is what makes the test
    # suite fast.
    num_partitions = max(
        1, min(num_partitions, -(-total_rows // target_rows_per_partition))
    )

    reduce = ray.remote(_reduce_partition)
    if num_partitions == 1:
        # no exchange needed: blocks ARE the single partition
        return ray.data.from_arrow_refs(
            [reduce.remote(kernel, empty_result, *block_refs)]
        )
    # Coalesce input blocks into at most 64 split tasks: the exchange
    # creates G x P plasma objects and each reduce resolves G refs, so
    # G (not B) must stay bounded — a map stage at batch_size 2048
    # yields hundreds of blocks, and B x P small objects bottleneck on
    # the single-threaded object store (anti-scaling measured at 8+
    # cpus).  G is derived DETERMINISTICALLY from the block count, NOT
    # from the session CPU count: the grouping fixes the row order each
    # reduce kernel sees, and a CPU-dependent G would make any
    # tie-sensitive kernel's output vary with host core count (against
    # the determinism-everywhere rule).  64 preserves split parallelism
    # up to 32 cores / multi-node while keeping G x P bounded.
    n_split = min(64, len(block_refs))
    groups = [block_refs[i::n_split] for i in range(min(n_split, len(block_refs)))]
    split = ray.remote(num_returns=num_partitions)(_split_block)
    split_refs = [
        split.remote(key_hash_fn, num_partitions, *grp) for grp in groups
    ]
    out_refs = []
    for p in range(num_partitions):
        parts = [s[p] for s in split_refs]
        out_refs.append(reduce.remote(kernel, empty_result, *parts))
    return ray.data.from_arrow_refs(out_refs)


def global_kernel(
    ds: ray.data.Dataset,
    kernel: Callable[[pa.Table], pa.Table],
    *,
    empty_result: pa.Table,
) -> ray.data.Dataset:
    """Run ``kernel`` ONCE over all rows of ``ds`` as a single typed
    block — the tiny-global-combine tail of a partial-aggregate
    pipeline (merge per-batch partials, final top-k over per-partition
    candidates, a rollup finalize).

    Only for inputs bounded BY CONSTRUCTION (|groups| x block-count
    partial rows, P x k candidates), never raw data: everything funnels
    into one reduce task.  Compared to ``Dataset.groupby`` for the same
    tail this avoids a full sort shuffle AND the schema-less empty
    blocks Ray 2.49's aggregate emits for empty output partitions
    (CLAUDE.md trap) — the output is exactly one block with
    ``empty_result``'s schema even on zero rows."""
    return partitioned_kernel(
        ds,
        lambda t: np.zeros(len(t), dtype=np.uint64),
        kernel,
        num_partitions=1,
        empty_result=empty_result,
    )


def parquet_num_rows(path: str) -> int:
    """Row count from parquet FILE METADATA — no column scan.  The
    broadcast-vs-exchange join gate reads this so deciding the plan
    costs one footer read."""
    import pyarrow.parquet as pq

    return pq.ParquetFile(path).metadata.num_rows


def read_small_table(path: str, columns: list[str]) -> pa.Table:
    """Driver-side read of a GATE-CHECKED small dimension (caller has
    already proven row count <= the broadcast cap via
    ``parquet_num_rows``): one local pyarrow read.  A
    ``ray.data.read_parquet(...).to_pandas()`` here would spin up a
    full streaming-executor job per dimension — fixed cost that
    dominates a 5-row region table — to produce a driver-side copy
    anyway."""
    import pyarrow.parquet as pq

    return pq.read_table(path, columns=columns)


def unique_key_order(keys: np.ndarray, *, name: str) -> np.ndarray:
    """Argsort ``keys`` for a searchsorted join probe, enforcing the
    UNIQUE-key dimension contract LOUDLY (the broadcast-side mirror of
    ``exchange_join_unique_dim``'s in-kernel guard): a duplicate
    dimension key would silently enrich each fact row with one
    arbitrary match where SQL fans out to all of them.  Null (NaN)
    keys are excluded from the returned order — SQL inner-join
    semantics never match them, and NaN's self-inequality would
    otherwise both break the probe (NaN == key is always False) and
    false-positive the duplicate check (NaN > NaN is False).

    Returns integer positions into the ORIGINAL array; indexing the
    key and payload arrays with it yields the sorted, null-free probe
    side."""
    keys = np.asarray(keys)
    if keys.dtype.kind == "f":
        valid = np.flatnonzero(~np.isnan(keys))
    else:
        valid = np.arange(len(keys))
    order = valid[np.argsort(keys[valid], kind="stable")]
    ks = keys[order]
    if len(ks) > 1 and not np.all(ks[1:] > ks[:-1]):
        dup = np.unique(ks[1:][ks[1:] == ks[:-1]])
        raise ValueError(
            f"broadcast join probe: dimension key {name!r} is not "
            f"unique — duplicate keys {dup[:10].tolist()}"
        )
    return order


_JKEY = "_jkey"
_JSLOT = "_jslot"


def exchange_join_unique_dim(
    fact: ray.data.Dataset,
    dim: ray.data.Dataset,
    *,
    fact_key: str,
    dim_key: str,
    fact_fields: list[tuple[str, pa.DataType]],
    dim_fields: list[tuple[str, pa.DataType]],
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Distributed inner join fact ⨝ dim on a UNIQUE-key dimension via
    ONE key-hash exchange — the above-cap fallback when the dimension
    no longer fits a ray.put broadcast probe (r3 VERDICT item 3).

    Both sides union into the same partitioned kernel as slim tall rows
    (int64 join key + their payload columns, the other side's columns
    null); inside a partition the join is a vectorized searchsorted
    probe against the partition's dim keys (all rows of one key are
    co-located by the exchange).  Output columns: ``fact_fields`` +
    ``dim_fields`` for matched fact rows (inner semantics; with
    ``dim_fields=[]`` this is a semi-join filter).  ``Dataset.join`` is
    avoided per the Ray 2.49 chained-join defect (CLAUDE.md)."""
    fact_names = [n for n, _ in fact_fields]
    dim_names = [n for n, _ in dim_fields]
    tall_empty = pa.table(
        {
            _JKEY: pa.array([], type=pa.int64()),
            _JSLOT: pa.array([], type=pa.int32()),
            **{n: pa.array([], type=ty) for n, ty in fact_fields},
            **{n: pa.array([], type=ty) for n, ty in dim_fields},
        }
    )

    def fact_rows(t: pa.Table) -> pa.Table:
        if fact_key not in t.column_names or len(t) == 0:
            return tall_empty
        import pyarrow.compute as pc

        n = len(t)
        cols = {
            _JKEY: pc.cast(t[fact_key], pa.int64()),
            _JSLOT: pa.array(np.ones(n, dtype=np.int32)),
        }
        for name, _ty in fact_fields:
            cols[name] = t[name]
        for name, ty in dim_fields:
            cols[name] = pa.nulls(n, type=ty)
        return pa.table(cols)

    def dim_rows(t: pa.Table) -> pa.Table:
        if dim_key not in t.column_names or len(t) == 0:
            return tall_empty
        import pyarrow.compute as pc

        n = len(t)
        cols = {
            _JKEY: pc.cast(t[dim_key], pa.int64()),
            _JSLOT: pa.array(np.zeros(n, dtype=np.int32)),
        }
        for name, ty in fact_fields:
            cols[name] = pa.nulls(n, type=ty)
        for name, _ty in dim_fields:
            cols[name] = t[name]
        return pa.table(cols)

    tall = fact.map_batches(
        fact_rows, batch_format="pyarrow", zero_copy_batch=True
    ).union(dim.map_batches(dim_rows, batch_format="pyarrow", zero_copy_batch=True))
    out_empty = pa.table(
        {
            **{n: pa.array([], type=ty) for n, ty in fact_fields},
            **{n: pa.array([], type=ty) for n, ty in dim_fields},
        }
    )

    def join_kernel(g: pa.Table) -> pa.Table:
        slot = g[_JSLOT].to_numpy(zero_copy_only=False)
        key = g[_JKEY].to_numpy(zero_copy_only=False)
        is_dim = slot == 0
        dim_idx = np.flatnonzero(is_dim)
        dkeys = key[dim_idx]
        dorder = np.argsort(dkeys, kind="stable")
        dkeys_s = dkeys[dorder]
        if len(dkeys_s) > 1 and not np.all(dkeys_s[1:] > dkeys_s[:-1]):
            # UNIQUE-key contract (mirrors joinA_kernel's loud guard):
            # a dup-keyed dimension would silently join each fact row
            # to one arbitrary dim row — fail with the offending keys
            dup = np.unique(dkeys_s[1:][dkeys_s[1:] == dkeys_s[:-1]])
            raise ValueError(
                "exchange_join_unique_dim: dimension key "
                f"{dim_key!r} is not unique — duplicate keys "
                f"{dup[:10].tolist()}"
            )
        fact_idx = np.flatnonzero(~is_dim)
        fkeys = key[fact_idx]
        if len(dkeys_s):
            pos = np.minimum(np.searchsorted(dkeys_s, fkeys), len(dkeys_s) - 1)
            hit = dkeys_s[pos] == fkeys
        else:
            pos = np.zeros(len(fkeys), dtype=np.int64)
            hit = np.zeros(len(fkeys), dtype=bool)
        frows = fact_idx[hit]
        take_f = pa.array(frows)
        cols = {n: g[n].take(take_f) for n in fact_names}
        if dim_names:
            drows = dim_idx[dorder][pos[hit]]
            take_d = pa.array(drows)
            for n in dim_names:
                cols[n] = g[n].take(take_d)
        if not cols:  # pure-filter degenerate call (no payload at all)
            return out_empty
        return pa.table(cols)

    return partitioned_kernel(
        tall,
        lambda t: numeric_key_u64(t, [_JKEY]),
        join_kernel,
        num_partitions=num_partitions,
        empty_result=out_empty,
    )


def segments(sort_codes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Given group codes ALREADY IN SORTED-GROUP ORDER, return
    (segment_starts, segment_lengths)."""
    n = len(sort_codes)
    if n == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    change = np.flatnonzero(sort_codes[1:] != sort_codes[:-1]) + 1
    starts = np.concatenate([[0], change]).astype(np.int64)
    lengths = np.diff(np.concatenate([starts, [n]])).astype(np.int64)
    return starts, lengths
