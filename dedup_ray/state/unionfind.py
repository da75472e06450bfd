"""Distributed connected components via union-find tree-reduce
(SURVEY.md §2B B13; BASELINE.json:6 "union-find connected components
via tree-reduce on actor pools"; cf. BTS load-balanced DSU,
PAPERS.md:9).

Shape:
  edges Dataset ──map_batches──▶ per-block DSU forests, serialized as
      (node, root) Arrow tables                              [parallel]
  forests ──pairwise @ray.remote merges, binary tree──▶ one forest
  final forest ──▶ relabel roots to the deterministic MIN URL member
      per component (the reference's stable winner tie-break, A7)

Why this shape at 100 TB: after LSH + verification the edge set is
orders of magnitude smaller than the corpus (only near-dup members
appear).  Each leaf task compresses its block to one row per distinct
node; merges are log2(B) deep and each merge is linear in the smaller
forest.  The final forest holds only nodes incident to an edge — the
corpus itself never flows through this stage.  (If the dup-graph ever
approached corpus size, swap in alternating hash-min label propagation
rounds — pure Ray Data groupbys — at the cost of more shuffles.)

Execution detail (r02): node strings are FACTORIZED once per task
(np.unique) and the union-find runs over dense int codes with
list-backed parent/size arrays — the per-edge work is integer index
chasing, not string hashing/dict probes; root resolution afterwards is
fully vectorized pointer doubling.

Determinism: merge order affects only intermediate parent pointers,
never the component partition; final labels are canonical min-url, so
the output is independent of scheduling order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

_EMPTY_FOREST = pa.table(
    {
        "node": pa.array([], type=pa.string()),
        "root": pa.array([], type=pa.string()),
    }
)


class DSU:
    """Classic dict-based union-find (path halving + union by size).

    The REFERENCE implementation: kept for the property-test suite's
    law checks; the distributed path below runs on factorized int
    codes (`_union_codes`) instead."""

    __slots__ = ("parent", "size")

    def __init__(self) -> None:
        self.parent: dict[str, str] = {}
        self.size: dict[str, int] = {}

    def find(self, x: str) -> str:
        parent = self.parent
        if x not in parent:
            parent[x] = x
            self.size[x] = 1
            return x
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        if self.size[ra] < self.size[rb]:
            ra, rb = rb, ra
        self.parent[rb] = ra
        self.size[ra] += self.size[rb]

    def to_table(self) -> pa.Table:
        nodes = list(self.parent)
        roots = [self.find(n) for n in nodes]
        return pa.table(
            {
                "node": pa.array(nodes, type=pa.string()),
                "root": pa.array(roots, type=pa.string()),
            }
        )

    @staticmethod
    def from_table(t: pa.Table) -> "DSU":
        d = DSU()
        if "node" not in t.column_names:
            return d
        for n, r in zip(t["node"].to_pylist(), t["root"].to_pylist()):
            d.union(n, r)
        return d


def _union_codes(n: int, us: np.ndarray, vs: np.ndarray) -> np.ndarray:
    """Union-find over dense int codes [0, n); returns the fully
    path-compressed parent array (parent[i] is i's root).

    The union loop is Python-over-ints (DSU is inherently sequential)
    with path halving + union by size on plain lists (faster indexing
    than ndarray for scalar access); the final root resolution is
    vectorized pointer doubling.
    """
    parent = list(range(n))
    size = [1] * n
    for a, b in zip(us.tolist(), vs.tolist()):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        while parent[b] != b:
            parent[b] = parent[parent[b]]
            b = parent[b]
        if a == b:
            continue
        if size[a] < size[b]:
            a, b = b, a
        parent[b] = a
        size[a] += size[b]
    p = np.array(parent, dtype=np.int64)
    while True:  # pointer doubling to full compression (log depth)
        p2 = p[p]
        if np.array_equal(p2, p):
            return p
        p = p2


_EMPTY_FOREST_LABELED = pa.table(
    {
        "node": pa.array([], type=pa.int64()),
        "root": pa.array([], type=pa.int64()),
        "label": pa.array([], type=pa.string()),
    }
)


def _label_of_uniq(
    uniq: np.ndarray, nodes: np.ndarray, labels: np.ndarray
) -> np.ndarray:
    """Per-unique-node label, gathered from the (node, label) pairs.
    Vectorized: unique(nodes) + searchsorted; values of ``uniq`` absent
    from ``nodes`` (possible only on non-invariant input) get None."""
    un, first_idx = np.unique(nodes, return_index=True)
    out = np.full(len(uniq), None, dtype=object)
    if len(un):
        pos = np.minimum(np.searchsorted(un, uniq), len(un) - 1)
        have = un[pos] == uniq
        out[have] = labels[first_idx[pos[have]]]
    return out


def _forest_from_pairs(
    us_obj: np.ndarray,
    vs_obj: np.ndarray,
    labels_u: np.ndarray | None = None,
    labels_v: np.ndarray | None = None,
) -> pa.Table:
    """(u, v) arrays -> (node, root[, label]) table over their union.
    Node type is inferred (string urls OR int64 ids — min-label
    semantics follow the natural ordering of the type).  With labels
    (the flagship's INT-KEYED path: node = int64 doc_id, label = url)
    every output row additionally carries the node's label; final
    cluster ids are the component MIN LABEL instead of min node."""
    allv = np.concatenate([us_obj, vs_obj])
    if len(allv) == 0:
        return _EMPTY_FOREST if labels_u is None else _EMPTY_FOREST_LABELED
    uniq, codes = np.unique(allv, return_inverse=True)
    m = len(us_obj)
    roots = _union_codes(len(uniq), codes[:m], codes[m:])
    cols = {
        "node": pa.array(uniq.tolist()),
        "root": pa.array(uniq[roots].tolist()),
    }
    if labels_u is not None:
        lab = _label_of_uniq(
            uniq, allv, np.concatenate([labels_u, labels_v])
        )
        cols["label"] = pa.array(lab.tolist(), type=pa.string())
    return pa.table(cols)


def _block_forest(
    batch: pa.Table,
    u_col: str = "u",
    v_col: str = "v",
    label_u_col: str | None = None,
    label_v_col: str | None = None,
) -> pa.Table:
    if u_col not in batch.column_names:  # schema-less empty blocks pass through
        return _EMPTY_FOREST if label_u_col is None else _EMPTY_FOREST_LABELED
    if label_u_col is not None:
        return _forest_from_pairs(
            batch[u_col].to_numpy(zero_copy_only=False),
            batch[v_col].to_numpy(zero_copy_only=False),
            np.array(batch[label_u_col].to_pylist(), dtype=object),
            np.array(batch[label_v_col].to_pylist(), dtype=object),
        )
    return _forest_from_pairs(
        np.array(batch[u_col].to_pylist(), dtype=object),
        np.array(batch[v_col].to_pylist(), dtype=object),
    )


@ray.remote
class ForestMergeActor:
    """One slot of the union-find merge POOL (BASELINE.json:6
    "tree-reduce on actor pools"): holds a mutable factorized-int DSU
    and absorbs (node, root) forests incrementally.

    Why an actor and not a task chain: the DSU state persists across
    absorbs, so K actors reduce B leaf forests with ZERO intermediate
    re-factorization — each (node, root) row is unioned into existing
    state instead of rebuilding an np.unique codebook per merge level.
    The merge order never changes the component partition, so the
    result is scheduling-independent."""

    def __init__(self) -> None:
        self._code: dict = {}
        self._parent: list[int] = []
        self._size: list[int] = []
        self._label: list = []  # per-code payload (url) on the labeled path

    def absorb(self, t: pa.Table) -> int:
        """Union every (node, root) pair of a forest into the state.

        FACTORIZED, not row-at-a-time (r2 VERDICT item 3): the incoming
        forest is np.unique'd once, the (small) unique set is resolved
        against the actor codebook with one dict probe per NEW value,
        and the per-edge work is the same int-code union loop as
        ``_union_codes`` — no string/dict work inside the union."""
        if t is None or "node" not in t.column_names or len(t) == 0:
            return len(self._parent)
        code, parent, size = self._code, self._parent, self._size
        label = self._label
        if t["node"].type == pa.int64():
            nodes = t["node"].to_numpy(zero_copy_only=False)
            roots = t["root"].to_numpy(zero_copy_only=False)
        else:
            nodes = np.array(t["node"].to_pylist(), dtype=object)
            roots = np.array(t["root"].to_pylist(), dtype=object)
        uniq, inv = np.unique(np.concatenate([nodes, roots]), return_inverse=True)
        if "label" in t.column_names:
            lab_of_uniq = _label_of_uniq(
                uniq, nodes, np.array(t["label"].to_pylist(), dtype=object)
            )
        else:
            lab_of_uniq = None
        local = np.empty(len(uniq), dtype=np.int64)
        get = code.get
        for i, val in enumerate(uniq.tolist()):
            c = get(val)
            if c is None:
                c = code[val] = len(parent)
                parent.append(c)
                size.append(1)
                label.append(lab_of_uniq[i] if lab_of_uniq is not None else None)
            elif lab_of_uniq is not None and label[c] is None:
                label[c] = lab_of_uniq[i]
            local[i] = c
        m = len(nodes)
        us, vs = local[inv[:m]], local[inv[m:]]
        for a, b in zip(us.tolist(), vs.tolist()):
            while parent[a] != a:
                parent[a] = parent[parent[a]]
                a = parent[a]
            while parent[b] != b:
                parent[b] = parent[parent[b]]
                b = parent[b]
            if a == b:
                continue
            if size[a] < size[b]:
                a, b = b, a
            parent[b] = a
            size[a] += size[b]
        return len(parent)

    def forest(self) -> pa.Table:
        """Serialize state as a fully-resolved (node, root[, label])
        table."""
        labeled = any(v is not None for v in self._label)
        if not self._code:
            return _EMPTY_FOREST_LABELED if labeled else _EMPTY_FOREST
        nodes = list(self._code)
        codes = np.fromiter(self._code.values(), dtype=np.int64, count=len(nodes))
        p = np.array(self._parent, dtype=np.int64)
        while True:
            p2 = p[p]
            if np.array_equal(p2, p):
                break
            p = p2
        inv = {c: n for n, c in self._code.items()}
        roots = [inv[int(c)] for c in p[codes]]
        cols = {"node": pa.array(nodes), "root": pa.array(roots)}
        if labeled:
            cols["label"] = pa.array(
                [self._label[c] for c in codes.tolist()], type=pa.string()
            )
        return pa.table(cols)


def _finalize_components(final: pa.Table) -> pa.Table:
    """Merged forest -> (node, cluster_id) with cluster_id = component
    MIN node — or, on the labeled (int-keyed) path, the component MIN
    LABEL (min url; node stays the int64 doc_id the assignment exchange
    keys on).  One factorize+compress: the forest's (node, root) pairs
    are edges of a (possibly still multi-level) forest."""
    empty = pa.table(
        {
            "node": pa.array([], type=pa.string()),
            "cluster_id": pa.array([], type=pa.string()),
        }
    )
    if final is None or len(final) == 0 or "node" not in final.column_names:
        return empty
    labeled = "label" in final.column_names if final is not None else False
    if labeled:
        nodes = final["node"].to_numpy(zero_copy_only=False)
        roots_s = final["root"].to_numpy(zero_copy_only=False)
    else:
        nodes = np.array(final["node"].to_pylist(), dtype=object)
        roots_s = np.array(final["root"].to_pylist(), dtype=object)
    uniq, codes = np.unique(np.concatenate([nodes, roots_s]), return_inverse=True)
    m = len(nodes)
    roots = _union_codes(len(uniq), codes[:m], codes[m:])
    if labeled:
        node_labels = _label_of_uniq(
            uniq, nodes, np.array(final["label"].to_pylist(), dtype=object)
        )
        # min LABEL per component: sort (root, label), take each root
        # segment's first label
        order = np.lexsort((node_labels, roots))
        rs = roots[order]
        firsts = np.ones(len(rs), dtype=bool)
        firsts[1:] = rs[1:] != rs[:-1]
        seg_id = np.cumsum(firsts) - 1
        labels_sorted = node_labels[order[firsts]][seg_id]
        labels = np.empty(len(uniq), dtype=object)
        labels[order] = labels_sorted
        return pa.table(
            {
                "node": pa.array(uniq, type=pa.int64()),
                "cluster_id": pa.array(labels.tolist(), type=pa.string()),
            }
        )
    # canonical min label per component: uniq is SORTED, so the first
    # member index per root group is the component minimum
    order = np.argsort(roots, kind="stable")
    rs = roots[order]
    firsts = np.ones(len(rs), dtype=bool)
    firsts[1:] = rs[1:] != rs[:-1]
    seg_id = np.cumsum(firsts) - 1
    min_idx_per_seg = order[firsts]  # stable sort: first = smallest index
    labels_sorted = uniq[min_idx_per_seg][seg_id]
    labels = np.empty(len(uniq), dtype=object)
    labels[order] = labels_sorted
    return pa.table({"node": pa.array(uniq.tolist()), "cluster_id": pa.array(labels.tolist())})


def _components_ref(
    edges: ray.data.Dataset,
    *,
    num_merge_actors: int | None = None,
    u_col: str = "u",
    v_col: str = "v",
    label_u_col: str | None = None,
    label_v_col: str | None = None,
):
    """Shared tree-reduce; returns an ObjectRef of the finalized
    (node, cluster_id) table, or None when there are no edge blocks.

    Tree-reduce on an actor pool: leaf forests (one per edge block,
    built in parallel by Ray Data) are absorbed round-robin into K
    merge actors (parallel partial reduce with persistent DSU state),
    then the K actor forests tree-merge pairwise (log2 K actor-to-actor
    handoffs through the object store); the final factorize + min-label
    runs in ONE remote task — never on the driver."""
    refs = [
        r
        for r in edges.map_batches(
            _block_forest,
            fn_kwargs={
                "u_col": u_col,
                "v_col": v_col,
                "label_u_col": label_u_col,
                "label_v_col": label_v_col,
            },
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).to_arrow_refs()
    ]
    if not refs:
        return None
    from dedup_ray.core import default_pool_size

    K = min(num_merge_actors or default_pool_size(cap=8), len(refs))
    actors = [ForestMergeActor.remote() for _ in range(K)]
    ray.get([actors[i % K].absorb.remote(r) for i, r in enumerate(refs)])
    alive = actors
    while len(alive) > 1:
        futs = []
        nxt = []
        for i in range(0, len(alive) - 1, 2):
            futs.append(alive[i].absorb.remote(alive[i + 1].forest.remote()))
            nxt.append(alive[i])
        if len(alive) % 2:
            nxt.append(alive[-1])
        ray.get(futs)
        alive = nxt
    out = ray.remote(_finalize_components).remote(alive[0].forest.remote())
    # pin the finalize output before killing the producing actor (an
    # actor's objects die with it unless already materialized)
    ray.wait([out])
    for a in actors:
        ray.kill(a)
    return out


def components_dataset(
    edges: ray.data.Dataset,
    *,
    num_merge_actors: int | None = None,
    u_col: str = "u",
    v_col: str = "v",
    label_u_col: str | None = None,
    label_v_col: str | None = None,
) -> ray.data.Dataset:
    """edges -> Dataset[(node, cluster_id)] — nothing on the driver.
    The 100-TB path: at web scale the dup-incident node set is NOT
    broadcastable, so consumers join against this dataset through the
    hash exchange instead of a ray.put dict.

    INT-KEYED variant (label_u_col/label_v_col set): u_col/v_col are
    int64 ids (ingest-hashed doc ids) and the label columns their urls;
    the DSU then unions int64 arrays (vectorized np.unique instead of
    object-array factorization) and the output is (node:int64,
    cluster_id:min-url string) — ready to key a hash exchange without
    re-hashing strings per row."""
    ref = _components_ref(
        edges,
        num_merge_actors=num_merge_actors,
        u_col=u_col,
        v_col=v_col,
        label_u_col=label_u_col,
        label_v_col=label_v_col,
    )
    if ref is None:
        if label_u_col is not None:
            return ray.data.from_arrow(
                pa.table(
                    {
                        "node": pa.array([], type=pa.int64()),
                        "cluster_id": pa.array([], type=pa.string()),
                    }
                )
            )
        return ray.data.from_arrow(_finalize_components(None))
    return ray.data.from_arrow_refs([ref])


def connected_components(
    edges: ray.data.Dataset,
    *,
    num_merge_actors: int | None = None,
    u_col: str = "u",
    v_col: str = "v",
) -> dict:
    """edges(u, v) -> {node: cluster_id} (component MIN label; node
    type — string url or int64 vec id — preserved).  Driver-side dict
    variant for SMALL maps (tests, embedding_dedup); the flagship uses
    components_dataset."""
    ref = _components_ref(
        edges, num_merge_actors=num_merge_actors, u_col=u_col, v_col=v_col
    )
    if ref is None:
        return {}
    t = ray.get(ref)
    return dict(zip(t["node"].to_pylist(), t["cluster_id"].to_pylist()))


def components_table(mapping: dict[str, str]) -> pa.Table:
    return pa.table(
        {
            "node": pa.array(list(mapping.keys()), type=pa.string()),
            "cluster_id": pa.array(list(mapping.values()), type=pa.string()),
        }
    )
