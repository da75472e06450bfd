"""Property-based / law tests (SURVEY.md §5.2)."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dedup_ray.config import DedupConfig
from dedup_ray.state.unionfind import DSU


# ---------------------------------------------------------------- DSU laws
@settings(max_examples=50, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)), max_size=60
    )
)
def test_dsu_merge_order_invariant(edges):
    """Component partition is independent of union order (the property
    tree-reduce relies on)."""

    def components(edge_list):
        d = DSU()
        for a, b in edge_list:
            d.union(str(a), str(b))
        groups = {}
        for n in d.parent:
            groups.setdefault(d.find(n), set()).add(n)
        return frozenset(frozenset(g) for g in groups.values())

    assert components(edges) == components(list(reversed(edges)))


@settings(max_examples=30, deadline=None)
@given(
    a=st.lists(st.tuples(st.integers(0, 20), st.integers(0, 20)), max_size=30),
    b=st.lists(st.tuples(st.integers(0, 20), st.integers(0, 20)), max_size=30),
)
def test_dsu_table_merge_associative(a, b):
    """Merging serialized forests == building one DSU over all edges."""

    def build(edges):
        d = DSU()
        for x, y in edges:
            d.union(str(x), str(y))
        return d

    merged = DSU.from_table(build(a).to_table())
    for n, r in zip(
        build(b).to_table()["node"].to_pylist(),
        build(b).to_table()["root"].to_pylist(),
    ):
        merged.union(n, r)

    direct = build(a + b)

    def parts(d):
        groups = {}
        for n in d.parent:
            groups.setdefault(d.find(n), set()).add(n)
        return frozenset(frozenset(g) for g in groups.values())

    assert parts(merged) == parts(direct)


def test_dsu_idempotent():
    d = DSU()
    d.union("a", "b")
    d.union("a", "b")
    d.union("b", "a")
    assert d.find("a") == d.find("b")
    assert d.size[d.find("a")] == 2


# ------------------------------------------------------------- config laws
def test_config_banding_validation():
    with pytest.raises(ValueError):
        DedupConfig(bands=10, rows_per_band=10)
    with pytest.raises(ValueError):
        DedupConfig(winnow_gram=300, substring_min_len=200)


def test_config_hash_stability_and_sensitivity():
    assert DedupConfig().config_hash() == DedupConfig().config_hash()
    assert (
        DedupConfig(jaccard_tau=0.7).config_hash() != DedupConfig().config_hash()
    )
    # execution hints don't change semantics
    assert (
        DedupConfig(batch_size=1).config_hash() == DedupConfig().config_hash()
    )


# ------------------------------------------------------ salting preserves CC
def test_salt_split_preserves_connectivity(ray_session):
    """A crafted hot bucket: salted pair generation (within-salt
    all-pairs + rep star) must keep the bucket one connected component."""
    import ray.data

    from dedup_ray.stages.lsh import bucket_candidate_pairs, salt_band_rows

    cfg = DedupConfig(bucket_cap=8)
    n = 40
    ids = list(range(1000, 1000 + n))
    band = pa.table(
        {
            "band_id": pa.array([0] * n, pa.int32()),
            "band_hash": pa.array([12345] * n, pa.int64()),
            "doc_id": pa.array(ids, pa.int64()),
        }
    )
    hot = {(0, 12345): 5}
    salted = salt_band_rows(ray.data.from_arrow(band), hot, cfg)
    pairs = bucket_candidate_pairs(salted, cfg).to_pandas()
    d = DSU()
    for u, v in zip(pairs["u_id"], pairs["v_id"]):
        d.union(str(u), str(v))
    roots = {d.find(str(i)) for i in ids}
    assert len(roots) == 1, f"salting split the bucket into {len(roots)} components"
    # and the pair count stayed near-linear, NOT O(n^2)
    assert len(pairs) < n * cfg.bucket_cap


# ------------------------------------------------------------ minhash law
@settings(max_examples=20, deadline=None)
@given(seed=st.integers(0, 10_000))
def test_minhash_signature_deterministic_across_instances(seed):
    from dedup_ray.stages.minhash import MinHasher

    cfg = DedupConfig(num_perms=16, bands=4, rows_per_band=4)
    batch = pa.table({"url": ["x"], "text": [f"some tokens {seed} here repeated {seed}"]})
    s1 = MinHasher(cfg)(batch)["minhash"].to_pylist()
    s2 = MinHasher(cfg)(batch)["minhash"].to_pylist()
    assert s1 == s2
