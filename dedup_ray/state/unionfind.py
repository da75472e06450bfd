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

Determinism: merge order affects only intermediate parent pointers,
never the component partition; final labels are canonical min-url, so
the output is independent of scheduling order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


class DSU:
    """Classic union-find with path halving + union by size."""

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
        # Ray Data can emit schema-less empty blocks (empty groupby
        # partitions bypass the UDF); treat them as empty forests.
        if "node" not in t.column_names:
            return d
        for n, r in zip(t["node"].to_pylist(), t["root"].to_pylist()):
            d.union(n, r)
        return d


def _block_forest(batch: pa.Table) -> pa.Table:
    d = DSU()
    if "u" in batch.column_names:  # schema-less empty blocks pass through
        for u, v in zip(batch["u"].to_pylist(), batch["v"].to_pylist()):
            d.union(u, v)
    return d.to_table()


@ray.remote
def _merge_forests(a: pa.Table, b: pa.Table) -> pa.Table:
    d = DSU.from_table(a)
    if "node" in b.column_names:
        for n, r in zip(b["node"].to_pylist(), b["root"].to_pylist()):
            d.union(n, r)
    return d.to_table()


def connected_components(edges: ray.data.Dataset) -> dict[str, str]:
    """edges(u, v) -> {node: cluster_id} where cluster_id is the MIN
    node string in the component (deterministic canonical label).

    Nodes with no edges are absent (callers treat them as singletons).
    """
    # leaf forests: one (node, root) table per edge block, built in
    # parallel by Ray Data, left in the object store via to_arrow_refs
    refs = [
        r
        for r in edges.map_batches(
            _block_forest, batch_format="pyarrow", zero_copy_batch=True
        ).to_arrow_refs()
    ]
    if not refs:
        return {}
    # binary tree-reduce of forests (log depth, merges run in parallel)
    while len(refs) > 1:
        nxt = []
        for i in range(0, len(refs) - 1, 2):
            nxt.append(_merge_forests.remote(refs[i], refs[i + 1]))
        if len(refs) % 2:
            nxt.append(refs[-1])
        refs = nxt
    final = ray.get(refs[0])
    if len(final) == 0:
        return {}
    d = DSU.from_table(final)
    # canonical min-url label per component
    root_min: dict[str, str] = {}
    for n in list(d.parent):
        r = d.find(n)
        m = root_min.get(r)
        if m is None or n < m:
            root_min[r] = n
    return {n: root_min[d.find(n)] for n in d.parent}


def components_table(mapping: dict[str, str]) -> pa.Table:
    return pa.table(
        {
            "node": pa.array(list(mapping.keys()), type=pa.string()),
            "cluster_id": pa.array(list(mapping.values()), type=pa.string()),
        }
    )
