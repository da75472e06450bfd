"""Label-propagation connected components (the tree-reduce fallback,
r3 VERDICT item 5): identical output to the tree-reduce path on string
nodes, int nodes, the labeled flagship path, and a crafted
large-dup-fraction corpus; plus the forest-budget warning guard.
"""

import logging

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from dedup_ray.state.unionfind import (
    components_dataset,
    components_dataset_label_prop,
)


def _as_sorted_pairs(ds):
    df = ds.to_pandas()
    return sorted(map(tuple, df[["node", "cluster_id"]].itertuples(index=False)))


def _edges_table(pairs, typ=pa.string()):
    us, vs = zip(*pairs) if pairs else ((), ())
    return pa.table({"u": pa.array(list(us), typ), "v": pa.array(list(vs), typ)})


CASES = {
    "two_components": [("b", "a"), ("c", "a"), ("e", "d")],
    "chain_diameter_9": [(f"n{i}", f"n{i+1}") for i in range(9)],
    "star": [("hub", f"leaf{i}") for i in range(20)],
    "self_loop_and_dup_edges": [("a", "a"), ("a", "b"), ("b", "a"), ("a", "b")],
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_label_prop_agrees_with_tree_reduce_strings(name, ray_session):
    edges = ray.data.from_arrow(_edges_table(CASES[name]))
    tr = components_dataset(edges, method="tree_reduce")
    lp = components_dataset(edges, method="label_prop", num_partitions=4)
    assert _as_sorted_pairs(tr) == _as_sorted_pairs(lp)


def test_label_prop_int_nodes_random_graph(ray_session):
    rng = np.random.Generator(np.random.PCG64(42))
    n = 400
    us = rng.integers(0, n, 600).astype(np.int64)
    vs = rng.integers(0, n, 600).astype(np.int64)
    edges = ray.data.from_arrow(
        pa.table({"u": pa.array(us, pa.int64()), "v": pa.array(vs, pa.int64())})
    )
    tr = components_dataset(edges, method="tree_reduce")
    lp = components_dataset(edges, method="label_prop", num_partitions=8)
    assert _as_sorted_pairs(tr) == _as_sorted_pairs(lp)


def test_label_prop_labeled_path(ray_session):
    """Flagship's int-keyed labeled variant: cluster_id must be the
    component MIN URL, node stays the int64 id."""
    from dedup_ray.util import hash_url

    urls = [f"https://x.test/{i:03d}" for i in range(6)]
    ids = [np.int64(np.uint64(hash_url(u)).astype(np.int64)) for u in urls]
    pairs = [(0, 1), (1, 2), (3, 4)]
    edges = ray.data.from_arrow(
        pa.table(
            {
                "u_id": pa.array([ids[a] for a, _ in pairs], pa.int64()),
                "v_id": pa.array([ids[b] for _, b in pairs], pa.int64()),
                "u": pa.array([urls[a] for a, _ in pairs], pa.string()),
                "v": pa.array([urls[b] for _, b in pairs], pa.string()),
            }
        )
    )
    kw = dict(u_col="u_id", v_col="v_id", label_u_col="u", label_v_col="v")
    tr = components_dataset(edges, method="tree_reduce", **kw)
    lp = components_dataset(edges, method="label_prop", num_partitions=4, **kw)
    assert _as_sorted_pairs(tr) == _as_sorted_pairs(lp)
    labels = {c for _, c in _as_sorted_pairs(lp)}
    assert labels == {urls[0], urls[3]}


@pytest.mark.slow
def test_flagship_label_prop_matches_default_on_dup_heavy_corpus(ray_session):
    """Crafted LARGE-DUP-FRACTION corpus (every doc near-duplicates one
    of 3 templates -> dup-incident nodes == whole corpus, the regime
    the tree-reduce guard warns about): flagship output with
    cc_method='label_prop' is bit-identical to the default."""
    import pandas as pd

    from dedup_ray.config import DedupConfig
    from dedup_ray.pipelines.flagship import flagship_assignments_from_pages

    rng = np.random.Generator(np.random.PCG64(7))
    words = [f"w{i}" for i in range(300)]
    templates = [
        " ".join(rng.choice(words, 120).tolist()) for _ in range(3)
    ]
    rows = []
    for i in range(120):
        base = templates[i % 3].split()
        # light token jitter keeps them near-dups, not exact dups
        j = rng.integers(0, len(base))
        base[j] = f"jit{i}"
        rows.append((f"https://d.test/{i:04d}", " ".join(base)))
    pages = pa.table(
        {
            "url": pa.array([u for u, _ in rows], pa.string()),
            "text": pa.array([t for _, t in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "priority": pa.array([0] * len(rows), pa.int64()),
        }
    )

    def run(cfg):
        out = flagship_assignments_from_pages(
            ray.data.from_arrow(pages), cfg
        ).to_pandas()
        cols = sorted(out.columns)
        return out[cols].sort_values(by=cols, ignore_index=True)

    a = run(DedupConfig())
    b = run(DedupConfig(cc_method="label_prop"))
    pd.testing.assert_frame_equal(a, b)
    # the corpus really is dup-heavy: far fewer clusters than docs
    assert a["cluster_id"].nunique() <= 10


def test_forest_budget_warning(ray_session, caplog):
    """Forced tree_reduce past the budget keeps the legacy
    warn-and-continue behavior."""
    edges = ray.data.from_arrow(_edges_table(CASES["star"]))
    with caplog.at_level(logging.WARNING, logger="dedup_ray.state.unionfind"):
        components_dataset(
            edges, method="tree_reduce", forest_node_budget=3
        ).materialize()
    assert any("label_prop" in r.message for r in caplog.records)


@pytest.mark.parametrize("name", sorted(CASES))
def test_auto_engages_label_prop_past_budget(name, ray_session, caplog):
    """method='auto' (the default) aborts the tree-reduce pre-merge
    when the forest bound crosses the budget and degrades to label
    propagation — with NO flag set, and bit-identical output."""
    edges = ray.data.from_arrow(_edges_table(CASES[name]))
    want = _as_sorted_pairs(components_dataset(edges, method="tree_reduce"))
    with caplog.at_level(logging.WARNING, logger="dedup_ray.state.unionfind"):
        got = _as_sorted_pairs(
            components_dataset(edges, forest_node_budget=1, num_partitions=4)
        )
    assert got == want
    assert any("auto-engaging" in r.message for r in caplog.records)


def test_auto_under_budget_stays_tree_reduce(ray_session, caplog):
    """Under the budget, auto takes the tree-reduce path silently."""
    edges = ray.data.from_arrow(_edges_table(CASES["two_components"]))
    with caplog.at_level(logging.WARNING, logger="dedup_ray.state.unionfind"):
        got = _as_sorted_pairs(components_dataset(edges))
    assert got == _as_sorted_pairs(
        components_dataset(edges, method="tree_reduce")
    )
    assert not any("auto-engaging" in r.message for r in caplog.records)


def test_flagship_auto_fallback_bit_identical(ray_session, caplog, monkeypatch):
    """Full flagship over a crafted over-budget corpus (tiny module
    budget, DEFAULT config — no cc_method flag): the fallback engages
    and the assignments are bit-identical to forced tree_reduce."""
    import pandas as pd

    from dedup_ray.config import DedupConfig
    from dedup_ray.pipelines.flagship import flagship_assignments_from_pages
    from dedup_ray.state import unionfind

    rng = np.random.Generator(np.random.PCG64(11))
    words = [f"w{i}" for i in range(200)]
    template = " ".join(rng.choice(words, 100).tolist())
    rows = []
    for i in range(40):
        base = template.split()
        base[int(rng.integers(0, len(base)))] = f"jit{i}"
        rows.append((f"https://a.test/{i:03d}", " ".join(base)))
    pages = pa.table(
        {
            "url": pa.array([u for u, _ in rows], pa.string()),
            "text": pa.array([t for _, t in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "priority": pa.array([0] * len(rows), pa.int64()),
        }
    )

    def run():
        out = flagship_assignments_from_pages(
            ray.data.from_arrow(pages), DedupConfig()
        ).to_pandas()
        cols = sorted(out.columns)
        return out[cols].sort_values(by=cols, ignore_index=True)

    want = run()  # default budget: tree-reduce path
    monkeypatch.setattr(unionfind, "FOREST_NODE_BUDGET", 5)
    with caplog.at_level(logging.WARNING, logger="dedup_ray.state.unionfind"):
        got = run()
    assert any("auto-engaging" in r.message for r in caplog.records)
    pd.testing.assert_frame_equal(got, want)


def test_label_prop_empty_edges(ray_session):
    edges = ray.data.from_arrow(
        pa.table({"u": pa.array([], pa.string()), "v": pa.array([], pa.string())})
    )
    out = components_dataset_label_prop(edges)
    assert out.count() == 0


@pytest.mark.parametrize("seed,n,m", [(7, 300, 60), (8, 300, 300), (9, 300, 1200)])
def test_both_methods_match_pure_python_ground_truth(seed, n, m, ray_session):
    """tree_reduce AND label_prop vs an independent driver-side DSU:
    min-node component labels on random graphs across densities
    (sparse / ~critical / dense-high-dup)."""
    rng = np.random.Generator(np.random.PCG64(seed))
    us = rng.integers(0, n, m).astype(np.int64)
    vs = rng.integers(0, n, m).astype(np.int64)

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in zip(us.tolist(), vs.tolist()):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    touched = sorted(set(us.tolist()) | set(vs.tolist()))
    want = sorted((x, find(x)) for x in touched)

    edges = ray.data.from_arrow(
        pa.table({"u": pa.array(us, pa.int64()), "v": pa.array(vs, pa.int64())})
    )
    for method in ("tree_reduce", "label_prop"):
        got = _as_sorted_pairs(components_dataset(edges, method=method))
        assert got == want, f"{method} diverged from the pure-python DSU"
