"""Flagship pipeline — the full near-duplicate detection + clustering
job (SURVEY.md §3.2 stage graph; BASELINE.json north star).

    read ─▶ filter/extract ─▶ sha256 ─▶ exact groupby (winner/member)
        winners ─▶ MinHash actor pool ─▶ LSH bands ─▶ salted buckets
        ─▶ distinct pairs ─▶ verify (sig joins) ─▶ minhash edges
        winners ─▶ winnowing fingerprints ─▶ substring edges  [optional]
        edges ─▶ union-find tree-reduce ─▶ cluster map (min-url labels)
        members + cluster map ─▶ assignments (url, cluster_id,
            is_canonical, kind, content_sha256)

Semantics preserved from the reference (SURVEY.md §2A): identity is
content (sha / signature), winner per group is the deterministic
min((priority, url)), output is a verdict table (a report — never a
mutation), empties form their own exact class.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from dedup_ray.config import DEFAULT_CONFIG, DedupConfig
from dedup_ray.sources.pages import documents_as_pages
from dedup_ray.stages.exact import exact_members
from dedup_ray.stages.hashing import add_content_sha256
from dedup_ray.stages.lsh import minhash_edges
from dedup_ray.stages.minhash import minhash_signatures_stage

_KIND_RANK = {"exact": 0, "minhash": 1, "substring": 2}
_RANK_KIND_ARR = np.array(["exact", "minhash", "substring"], dtype=object)

_NK_EMPTY = pa.table(
    {
        "node": pa.array([], type=pa.int64()),
        "rank": pa.array([], type=pa.int32()),
    }
)


def _nk_rows(t: pa.Table) -> pa.Table:
    """edges batch -> exploded (node_id, rank) rows, kind mapped to its
    rank via one dictionary-encode pass (no per-row Python).  Nodes are
    the edges' int64 ids (hashed once at ingest) — the whole node-kind
    reduction is numeric."""
    if "u_id" not in t.column_names or len(t) == 0:
        return _NK_EMPTY
    enc = t["kind"].combine_chunks().dictionary_encode()
    rank_of = np.array(
        [_KIND_RANK[k] for k in enc.dictionary.to_pylist()], dtype=np.int32
    )
    ranks = rank_of[enc.indices.to_numpy(zero_copy_only=False)]
    u = t["u_id"].combine_chunks()
    v = t["v_id"].combine_chunks()
    return pa.table(
        {
            "node": pa.concat_arrays([u, v]),
            "rank": pa.array(np.concatenate([ranks, ranks]), type=pa.int32()),
        }
    )


def _nk_kernel(g: pa.Table) -> pa.Table:
    """Min rank per node — vectorized segment reduction (int64 keys)."""
    from dedup_ray.core import segments

    nodes = g["node"].to_numpy(zero_copy_only=False)
    ranks = g["rank"].to_numpy(zero_copy_only=False)
    order = np.lexsort((ranks, nodes))
    starts, _lens = segments(nodes[order])
    idx = pa.array(order[starts])
    return pa.table({"node": g["node"].take(idx), "rank": g["rank"].take(idx)})


def _node_kinds_ds(
    edges: ray.data.Dataset, *, num_partitions: int = 64
) -> ray.data.Dataset:
    """Best (lowest-rank) incident edge kind per node, as a DATASET —
    reduced by a vectorized partition kernel over a hash exchange and
    consumed by the assignment exchange below; never collected."""
    from dedup_ray.core import partitioned_kernel

    rows = edges.map_batches(_nk_rows, batch_format="pyarrow", zero_copy_batch=True)
    return partitioned_kernel(
        rows,
        lambda t: t["node"].to_numpy(zero_copy_only=False).view(np.uint64),
        _nk_kernel,
        num_partitions=num_partitions,
        empty_result=_NK_EMPTY,
    )


_ASSIGN_TALL_EMPTY = pa.table(
    {
        "gkey": pa.array([], type=pa.int64()),
        "slot": pa.array([], type=pa.int32()),
        "url": pa.array([], type=pa.string()),
        "winner_url": pa.array([], type=pa.string()),
        "content_sha256": pa.array([], type=pa.string()),
        "n_chars": pa.array([], type=pa.int64()),
        "priority": pa.array([], type=pa.int64()),
        "group_n": pa.array([], type=pa.int64()),
        "cluster": pa.array([], type=pa.string()),
        "rank": pa.array([], type=pa.int32()),
    }
)

_ASSIGNED_EMPTY = pa.table(
    {
        "url": pa.array([], type=pa.string()),
        "cluster_id": pa.array([], type=pa.string()),
        "kind": pa.array([], type=pa.string()),
        "content_sha256": pa.array([], type=pa.string()),
        "n_chars": pa.array([], type=pa.int64()),
        "priority": pa.array([], type=pa.int64()),
        "is_canonical": pa.array([], type=pa.bool_()),
    }
)


def _member_tall(t: pa.Table) -> pa.Table:
    if "winner_id" not in t.column_names or len(t) == 0:
        return _ASSIGN_TALL_EMPTY
    n = len(t)
    return pa.table(
        {
            "gkey": t["winner_id"],
            "slot": pa.array(np.zeros(n, dtype=np.int32)),
            "url": t["url"],
            "winner_url": t["winner_url"],
            "content_sha256": t["content_sha256"],
            "n_chars": t["n_chars"],
            "priority": t["priority"],
            "group_n": t["group_n"],
            "cluster": pa.nulls(n, type=pa.string()),
            "rank": pa.array(np.zeros(n, dtype=np.int32)),
        }
    )


def _map_tall(t: pa.Table) -> pa.Table:
    """cluster-map rows: node is ALREADY the int64 ingest doc_id (the
    labeled union-find path) — no string hashing here."""
    if "node" not in t.column_names or len(t) == 0:
        return _ASSIGN_TALL_EMPTY
    n = len(t)
    nulls = pa.nulls(n, type=pa.string())
    z = pa.array(np.zeros(n, dtype=np.int64))
    return pa.table(
        {
            "gkey": t["node"],
            "slot": pa.array(np.full(n, -1, dtype=np.int32)),
            "url": nulls,
            "winner_url": nulls,
            "content_sha256": nulls,
            "n_chars": z,
            "priority": z,
            "group_n": z,
            "cluster": t["cluster_id"],
            "rank": pa.array(np.zeros(n, dtype=np.int32)),
        }
    )


def _kind_tall(t: pa.Table) -> pa.Table:
    """node-kind rows: node is the int64 id from the edge columns."""
    if "node" not in t.column_names or len(t) == 0:
        return _ASSIGN_TALL_EMPTY
    n = len(t)
    nulls = pa.nulls(n, type=pa.string())
    z = pa.array(np.zeros(n, dtype=np.int64))
    return pa.table(
        {
            "gkey": t["node"],
            "slot": pa.array(np.full(n, -2, dtype=np.int32)),
            "url": nulls,
            "winner_url": nulls,
            "content_sha256": nulls,
            "n_chars": z,
            "priority": z,
            "group_n": z,
            "cluster": nulls,
            "rank": pc.cast(t["rank"], pa.int32()),
        }
    )


def _assign_kernel_factory(uniform: bool):
    def assign_kernel(g: pa.Table) -> pa.Table:
        """Per winner_id segment: rows sorted (kind -2, map -1, members
        0); per-segment cluster/kind values gathered vectorized and
        applied to the member rows — the same relabel semantics the
        broadcast variant had, now fully inside the exchange."""
        gkeys = g["gkey"].to_numpy(zero_copy_only=False)
        slots = g["slot"].to_numpy(zero_copy_only=False)
        order = np.lexsort((slots, gkeys))
        gs = gkeys[order]
        from dedup_ray.core import segments

        starts, lens = segments(gs)
        slots_sorted = slots[order]
        n_seg = len(starts)
        seg_id = np.repeat(np.arange(n_seg), lens)

        first = slots_sorted[starts]
        second_pos = np.minimum(starts + 1, len(gs) - 1)
        second = slots_sorted[second_pos]
        # per-segment source row for kind (-2) and map (-1) rows
        kind_src = np.where(first == -2, starts, -1)
        map_src = np.where(
            first == -1, starts, np.where((first == -2) & (second == -1), second_pos, -1)
        )
        member = slots_sorted == 0
        if not member.any():
            return _ASSIGNED_EMPTY
        m_rows = order[member]
        m_seg = seg_id[member]

        ranks = g["rank"].to_numpy(zero_copy_only=False)
        kindrank = np.full(len(m_rows), -1, dtype=np.int32)
        has_kind = kind_src[m_seg] >= 0
        kindrank[has_kind] = ranks[order[kind_src[m_seg][has_kind]]]

        # Arrow-native gathers (r3 VERDICT item 8): the url / winner /
        # cluster string columns are taken + compared as Arrow arrays —
        # no to_pylist object materialization on the widest exchange.
        take = pa.array(m_rows)
        urls_a = g["url"].take(take).combine_chunks()
        winners_a = g["winner_url"].take(take).combine_chunks()
        has_map = map_src[m_seg] >= 0
        map_rows_safe = np.where(has_map, order[np.maximum(map_src[m_seg], 0)], 0)
        cluster_a = pc.if_else(
            pa.array(has_map),
            g["cluster"].take(pa.array(map_rows_safe)).combine_chunks(),
            winners_a,
        )

        is_loser = pc.invert(pc.equal(urls_a, winners_a)).to_numpy(
            zero_copy_only=False
        )
        group_n = g["group_n"].to_numpy(zero_copy_only=False)[m_rows]
        kind = np.where(
            is_loser,
            "exact",
            np.where(
                kindrank >= 0,
                _RANK_KIND_ARR[np.maximum(kindrank, 0)],
                np.where(group_n > 1, "exact", "unique"),
            ),
        ).astype(object)
        cols = {
            "url": urls_a,
            "cluster_id": cluster_a,
            "kind": pa.array(kind, type=pa.string()),
            "content_sha256": g["content_sha256"].take(take),
            "n_chars": g["n_chars"].take(take),
            "priority": g["priority"].take(take),
        }
        if uniform:
            cols["is_canonical"] = pc.equal(urls_a, cluster_a)
        else:
            cols["is_canonical"] = pa.array(np.zeros(len(m_rows), dtype=bool))
        return pa.table(cols)

    return assign_kernel


def cluster_and_assign(
    members: ray.data.Dataset,
    edges: ray.data.Dataset,
    cfg: DedupConfig,
    *,
    assume_uniform_priority: bool = True,
) -> ray.data.Dataset:
    """members (exact layer) + verified near-dup edges -> assignments.

    FULLY DISTRIBUTED relabel: the union-find cluster map and per-node
    best-kind table stay Datasets and ride ONE hash exchange together
    with the slim member rows (keyed on winner doc_id) — no driver
    dict, no ray.put broadcast.  At 10^12 docs the dup-incident node
    set is a large fraction of the corpus, so a broadcast map is
    driver-OOM; the exchange is the scale path AND removes the
    CPU-count-independent driver work that capped scaling efficiency.
    Canonical selection:

    - uniform priority (default): canonical member of a cluster is by
      construction the min url == cluster_id — computed in-kernel;
    - otherwise a cluster_id-keyed kernel picks min((priority, url)).
    """
    from dedup_ray.core import partitioned_kernel
    from dedup_ray.state.unionfind import components_dataset

    edges = edges.materialize()  # consumed twice (components + kinds)
    # int-keyed labeled path: union-find over int64 edge ids with urls
    # riding as labels -> (node:int64, cluster_id:min-url); both this
    # and the kinds table key the assignment exchange on int64 columns
    # (urls were hashed ONCE at ingest; no per-row string hashing here)
    cc = components_dataset(
        edges,
        u_col="u_id",
        v_col="v_id",
        label_u_col="u",
        label_v_col="v",
        method=cfg.cc_method,
        num_partitions=cfg.num_partitions,
    )
    kinds = _node_kinds_ds(edges, num_partitions=cfg.num_partitions)

    slim_cols = [
        "url",
        "winner_id",
        "winner_url",
        "content_sha256",
        "n_chars",
        "priority",
        "group_n",
    ]
    tall = (
        members.select_columns(slim_cols)
        .map_batches(_member_tall, batch_format="pyarrow", zero_copy_batch=True)
        .union(cc.map_batches(_map_tall, batch_format="pyarrow", zero_copy_batch=True))
        .union(
            kinds.map_batches(_kind_tall, batch_format="pyarrow", zero_copy_batch=True)
        )
    )
    assigned = partitioned_kernel(
        tall,
        lambda t: t["gkey"].to_numpy(zero_copy_only=False).view(np.uint64),
        _assign_kernel_factory(assume_uniform_priority),
        num_partitions=cfg.num_partitions,
        empty_result=_ASSIGNED_EMPTY,
    )
    if assume_uniform_priority:
        return assigned
    return _pick_canonical_by_priority(assigned, num_partitions=cfg.num_partitions)


_PICK_EMPTY = pa.table(
    {
        "url": pa.array([], type=pa.string()),
        "cluster_id": pa.array([], type=pa.string()),
        "kind": pa.array([], type=pa.string()),
        "content_sha256": pa.array([], type=pa.string()),
        "n_chars": pa.array([], type=pa.int64()),
        "priority": pa.array([], type=pa.int64()),
        "is_canonical": pa.array([], type=pa.bool_()),
    }
)


def _pick_canonical_by_priority(
    assigned: ray.data.Dataset, *, num_partitions: int = 64
) -> ray.data.Dataset:
    """Non-uniform priority winner rule: canonical member per cluster is
    min((priority, url)) — a vectorized multi-cluster partition kernel
    (never one Python UDF per cluster; CLAUDE.md hard rule)."""
    from dedup_ray.core import hash_strings_u64, partitioned_kernel

    def pick_kernel(g: pa.Table) -> pa.Table:
        if "cluster_id" not in g.column_names or len(g) == 0:
            return _PICK_EMPTY
        from dedup_ray.core import segments as _segments

        cl = np.array(g["cluster_id"].to_pylist(), dtype=object)
        urls = np.array(g["url"].to_pylist(), dtype=object)
        prio = g["priority"].to_numpy(zero_copy_only=False)
        order = np.lexsort((urls, prio, cl))
        starts, _lens = _segments(cl[order])
        mask = np.zeros(len(g), dtype=bool)
        mask[order[starts]] = True
        if "is_canonical" in g.column_names:  # placeholder from assign
            g = g.drop_columns(["is_canonical"])
        return g.append_column("is_canonical", pa.array(mask))

    return partitioned_kernel(
        assigned,
        lambda t: hash_strings_u64(t["cluster_id"].to_pylist()),
        pick_kernel,
        num_partitions=num_partitions,
        empty_result=_PICK_EMPTY,
    )


def flagship_assignments_from_pages(
    pages: ray.data.Dataset,
    cfg: DedupConfig = DEFAULT_CONFIG,
    *,
    substring_pass: bool = False,
) -> ray.data.Dataset:
    """pages (url, text, lang, priority) -> assignments.

    PRECONDITION: urls are unique — url is the engine's identity key
    (doc_id = hash(url)), so duplicate urls share one union-find node
    and different-content recrawls can alias unrelated clusters under
    one label.  Set ``cfg.dedupe_recrawls`` (or run
    ``sources.pages.dedupe_recrawls`` yourself) when the input may
    contain recrawls."""
    if cfg.dedupe_recrawls:
        from dedup_ray.sources.pages import dedupe_recrawls

        pages = dedupe_recrawls(pages, num_partitions=cfg.num_partitions)
    hashed = add_content_sha256(pages)
    # members is consumed twice (winners branch + final assign) and
    # signatures four times (hot-bucket count, salting, verify x2):
    # pin each ONCE instead of re-executing the upstream DAG per
    # consumer.  In the checkpointed job (run_flagship_checkpointed)
    # these same boundaries are Parquet stage outputs instead of
    # object-store pins — that is the 100-TB path; materialize() here
    # is the in-memory small-run equivalent.
    members = exact_members(hashed, num_partitions=cfg.num_partitions).materialize()
    winners = members.map_batches(
        lambda t: t.filter(t["is_exact_winner"].combine_chunks()),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    sigs = minhash_signatures_stage(winners, cfg).materialize()
    edges, _hot_log = minhash_edges(sigs, cfg)
    if substring_pass:
        from dedup_ray.stages.winnow import substring_edges

        edges = edges.union(substring_edges(winners, cfg))
    # assume_uniform_priority derives from cfg exactly like the
    # checkpointed entry: with a configured priority_col the canonical
    # member is min-(priority, url), not min-url
    return cluster_and_assign(
        members, edges, cfg, assume_uniform_priority=cfg.uniform_priority
    )


def flagship_assignments(
    sf_dir: str, cfg: DedupConfig = DEFAULT_CONFIG, *, substring_pass: bool = False
) -> ray.data.Dataset:
    """Flagship over the driver's ``documents`` table (doc_id as url)."""
    return flagship_assignments_from_pages(
        documents_as_pages(sf_dir), cfg, substring_pass=substring_pass
    )


def run_flagship_checkpointed(
    input_path: str,
    out_dir: str,
    cfg: DedupConfig = DEFAULT_CONFIG,
    *,
    substring_pass: bool = True,
    pages_loader=None,
    uniform_priority: bool | None = None,
):
    """The resumable production entry point (BASELINE.json:6,14): the
    flagship stage graph with a Parquet checkpoint + manifest at every
    ✓-boundary (SURVEY.md §3.2).  Re-running after a crash (or with an
    unchanged input+config) skips completed stages via manifest match.

    Returns (assignments Dataset, {stage: StageResult}).
    ``pages_loader(input_path)`` defaults to reading a pages Parquet
    directory (url/text/lang/priority after extract).
    """
    import pyarrow as pa

    from dedup_ray.sources.pages import read_pages_parquet
    from dedup_ray.stages.extract import extract_text
    from dedup_ray.state.checkpoint import CheckpointedRun, fingerprint_paths

    if uniform_priority is None:
        # derived from the SEMANTIC config (cfg.priority_col is part of
        # config_hash, so a priority change invalidates checkpoints)
        uniform_priority = cfg.uniform_priority
    run = CheckpointedRun(out_dir, cfg)
    input_fp = fingerprint_paths(input_path)

    def build_members():
        if pages_loader is not None:
            pages = pages_loader(input_path)
        else:
            pages = extract_text(read_pages_parquet(input_path))
        if cfg.dedupe_recrawls:
            # semantic config field -> a flip invalidates this stage's
            # manifest and everything downstream
            from dedup_ray.sources.pages import dedupe_recrawls

            pages = dedupe_recrawls(pages, num_partitions=cfg.num_partitions)
        return exact_members(
            add_content_sha256(pages), num_partitions=cfg.num_partitions
        )

    members, fp_members = run.run_stage("members", [input_fp], build_members)

    def build_signatures():
        winners = members.map_batches(
            lambda t: t.filter(t["is_exact_winner"].combine_chunks()),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        sigs = minhash_signatures_stage(winners, cfg)
        # fixed_size_list doesn't round-trip write_parquet+read cleanly
        # through all paths; store the signature as binary
        from dedup_ray.util import u64_matrix_to_binary

        def sig_to_bin(t: pa.Table) -> pa.Table:
            import numpy as np

            sig = t["minhash"].combine_chunks()
            flat = sig.flatten().to_numpy(zero_copy_only=False).astype(np.uint64)
            mat = flat.reshape(len(t), cfg.num_perms)
            cols = {n: t[n] for n in t.column_names if n != "minhash"}
            cols["minhash_bin"] = u64_matrix_to_binary(mat)
            return pa.table(cols)

        return sigs.map_batches(sig_to_bin, batch_format="pyarrow", zero_copy_batch=True)

    sigs_bin, fp_sigs = run.run_stage("signatures", [fp_members], build_signatures)

    def bin_to_sig(t: pa.Table):
        import numpy as np

        from dedup_ray.util import binary_to_u64_matrix

        mat = binary_to_u64_matrix(t["minhash_bin"], cfg.num_perms)
        cols = {n: t[n] for n in t.column_names if n != "minhash_bin"}
        cols["minhash"] = pa.FixedSizeListArray.from_arrays(
            pa.array(mat.reshape(-1), type=pa.uint64()), cfg.num_perms
        )
        return pa.table(cols)

    hot_log_holder: dict = {}

    def build_mh_edges():
        sigs = sigs_bin.map_batches(
            bin_to_sig, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()
        edges, hot_log = minhash_edges(sigs, cfg)
        hot_log_holder["salted_buckets"] = hot_log
        return edges

    mh_edges, fp_mh = run.run_stage(
        "edges_minhash",
        [fp_sigs],
        build_mh_edges,
        counters=hot_log_holder,
    )
    edge_fps = [fp_mh]
    edges = mh_edges
    if run.report["edges_minhash"].rows == 0:
        edges = ray.data.from_arrow(_empty_edges_table())

    if substring_pass:
        def build_ss_edges():
            from dedup_ray.stages.winnow import substring_edges

            winners = members.map_batches(
                lambda t: t.filter(t["is_exact_winner"].combine_chunks()),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            return substring_edges(winners, cfg)

        ss_edges, fp_ss = run.run_stage("edges_substring", [fp_members], build_ss_edges)
        edge_fps.append(fp_ss)
        if run.report["edges_substring"].rows > 0:
            edges = edges.union(ss_edges)

    def build_assignments():
        return cluster_and_assign(
            members, edges, cfg, assume_uniform_priority=uniform_priority
        )

    assignments, _fp = run.run_stage(
        "assignments", [fp_members, *edge_fps], build_assignments
    )
    return assignments, run.report


def _empty_edges_table():
    import pyarrow as pa

    return pa.table(
        {
            "u": pa.array([], type=pa.string()),
            "v": pa.array([], type=pa.string()),
            "u_id": pa.array([], type=pa.int64()),
            "v_id": pa.array([], type=pa.int64()),
            "kind": pa.array([], type=pa.string()),
            "score": pa.array([], type=pa.float64()),
        }
    )
