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
import ray
import ray.data

from dedup_ray.config import DEFAULT_CONFIG, DedupConfig
from dedup_ray.core import default_pool_size
from dedup_ray.sources.pages import documents_as_pages
from dedup_ray.stages.exact import exact_members
from dedup_ray.stages.hashing import add_content_sha256
from dedup_ray.stages.lsh import minhash_edges
from dedup_ray.stages.minhash import minhash_signatures_stage
from dedup_ray.state.unionfind import connected_components

_KIND_RANK = {"exact": 0, "minhash": 1, "substring": 2}
_RANK_KIND = {v: k for k, v in _KIND_RANK.items()}


def _node_kinds(edges: ray.data.Dataset) -> dict[str, int]:
    """Best (lowest-rank) incident edge kind per node — small result
    (nodes incident to near-dup edges only), reduced per batch before
    reaching the driver."""
    kinds: dict[str, int] = {}
    for b in edges.iter_batches(batch_format="pyarrow", batch_size=65536):
        if "u" not in b.column_names:  # schema-less empty block
            continue
        ks = [_KIND_RANK[k] for k in b["kind"].to_pylist()]
        for col in ("u", "v"):
            for node, rank in zip(b[col].to_pylist(), ks):
                cur = kinds.get(node)
                if cur is None or rank < cur:
                    kinds[node] = rank
    return kinds


import functools


@functools.lru_cache(maxsize=8)
def _worker_cluster_map(map_ref):
    return ray.get(map_ref)


def _assign_batch(t: pa.Table, map_ref, uniform: bool) -> pa.Table:
    mapping, kinds = _worker_cluster_map(map_ref)
    urls = t["url"].to_pylist()
    winners = t["winner_url"].to_pylist()
    group_n = t["group_n"].to_numpy(zero_copy_only=False)
    n = len(t)
    cluster = [mapping.get(w, w) for w in winners]
    kind = []
    for i in range(n):
        if urls[i] != winners[i]:
            kind.append("exact")
        elif winners[i] in kinds:
            kind.append(_RANK_KIND[kinds[winners[i]]])
        elif group_n[i] > 1:
            kind.append("exact")
        else:
            kind.append("unique")
    cols = {
        "url": t["url"],
        "cluster_id": pa.array(cluster, type=pa.string()),
        "kind": pa.array(kind, type=pa.string()),
        "content_sha256": t["content_sha256"],
        "n_chars": t["n_chars"],
        "priority": t["priority"],
    }
    if uniform:
        cols["is_canonical"] = pa.array([u == c for u, c in zip(urls, cluster)])
    return pa.table(cols)


def cluster_and_assign(
    members: ray.data.Dataset,
    edges: ray.data.Dataset,
    cfg: DedupConfig,
    *,
    assume_uniform_priority: bool = True,
) -> ray.data.Dataset:
    """members (exact layer) + verified near-dup edges -> assignments.

    The union-find mapping covers only nodes incident to an edge (tiny
    vs corpus) and is BROADCAST (ray.put) into a stateless relabel
    stage — no join shuffle.  Canonical selection:

    - uniform priority (default): canonical member of a cluster is by
      construction the min url == cluster_id, so no extra shuffle;
    - otherwise a groupby(cluster_id) picks min((priority, url)).
    """
    edges = edges.materialize()  # consumed twice (components + kinds)
    mapping = connected_components(edges)
    kinds = _node_kinds(edges)
    # broadcast ONCE via ray.put; tasks fetch the shared copy through
    # the worker-singleton below (never re-shipped per task)
    map_ref = ray.put((mapping, kinds))

    assigned = members.map_batches(
        _assign_batch,
        fn_kwargs={"map_ref": map_ref, "uniform": assume_uniform_priority},
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    if assume_uniform_priority:
        return assigned

    def pick(group: pa.Table) -> pa.Table:
        n = len(group)
        prio = group["priority"].to_numpy(zero_copy_only=False)
        urls = group["url"].to_pylist()
        best = min(range(n), key=lambda i: (prio[i], urls[i]))
        mask = np.zeros(n, dtype=bool)
        mask[best] = True
        return group.append_column("is_canonical", pa.array(mask))

    return assigned.groupby("cluster_id").map_groups(pick, batch_format="pyarrow")


def flagship_assignments_from_pages(
    pages: ray.data.Dataset,
    cfg: DedupConfig = DEFAULT_CONFIG,
    *,
    substring_pass: bool = False,
) -> ray.data.Dataset:
    """pages (url, text, lang, priority) -> assignments."""
    hashed = add_content_sha256(pages)
    # members is consumed twice (winners branch + final assign) and
    # signatures four times (hot-bucket count, salting, verify x2):
    # pin each ONCE instead of re-executing the upstream DAG per
    # consumer.  In the checkpointed job (run_flagship_checkpointed)
    # these same boundaries are Parquet stage outputs instead of
    # object-store pins — that is the 100-TB path; materialize() here
    # is the in-memory small-run equivalent.
    members = exact_members(hashed).materialize()
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
    return cluster_and_assign(members, edges, cfg)


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
    uniform_priority: bool = True,
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

    run = CheckpointedRun(out_dir, cfg)
    input_fp = fingerprint_paths(input_path)

    def build_members():
        if pages_loader is not None:
            pages = pages_loader(input_path)
        else:
            pages = extract_text(read_pages_parquet(input_path))
        return exact_members(add_content_sha256(pages))

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
            "kind": pa.array([], type=pa.string()),
            "score": pa.array([], type=pa.float64()),
        }
    )
