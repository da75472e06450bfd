"""embedding_dedup pair-source pluggability: the scale paths (ann_lsh /
ivf) must (a) produce clusterings that agree with the exact broadcast
source at high recall, and (b) never collect the corpus matrix on the
driver (`_collect_matrix` must be unreachable from them)."""

import itertools

import pytest

import __ray_entry__ as m
from dedup_ray.stages import embedding as emb


def _same_cluster_pairs(df) -> set:
    """(vec_id, cluster_id) frame -> set of unordered same-cluster
    vec_id pairs (non-singleton clusters only)."""
    pairs = set()
    for _, grp in df.groupby("cluster_id"):
        ids = sorted(grp["vec_id"].tolist())
        if len(ids) < 2:
            continue
        pairs.update(itertools.combinations(ids, 2))
    return pairs


@pytest.fixture(scope="module")
def exact_pairs(sf_smoke):
    df = emb.embedding_dedup(sf_smoke).to_pandas()
    return _same_cluster_pairs(df)


def test_ann_lsh_sourced_agrees_with_exact(sf_smoke, exact_pairs):
    ann = emb.embedding_dedup(sf_smoke, pairs_source="ann_lsh").to_pandas()
    ann_pairs = _same_cluster_pairs(ann)
    assert exact_pairs, "fixture must contain near-dup clusters"
    recall = len(exact_pairs & ann_pairs) / len(exact_pairs)
    assert recall >= 0.98
    # every LSH-sourced edge is an exact cosine >= threshold, so the
    # approximate clustering can only MISS merges, never invent them
    assert ann_pairs <= exact_pairs


def test_ivf_sourced_agrees_with_exact(sf_smoke, exact_pairs):
    # the fixture threshold (0.35) is LOOSE, so pairs often straddle
    # Voronoi cells and n_probe must be a sizable fraction of n_lists
    # (measured on this fixture: 4/16 -> 0.92 pair recall, 6/16 -> 1.0);
    # at real near-dup thresholds (~0.9) small n_probe suffices
    ivf = emb.embedding_dedup(
        sf_smoke, pairs_source="ivf", n_probe=6
    ).to_pandas()
    ivf_pairs = _same_cluster_pairs(ivf)
    recall = len(exact_pairs & ivf_pairs) / len(exact_pairs)
    assert recall >= 0.98
    assert ivf_pairs <= exact_pairs


def test_scale_paths_never_collect_corpus(sf_smoke, monkeypatch):
    """The VERDICT r2 scale defect: the default source reaches
    `_collect_matrix` (full-corpus driver collect).  The scale sources
    must not — poison it and run both."""

    def boom(*a, **k):  # pragma: no cover - failure path
        raise AssertionError("_collect_matrix reached from a scale path")

    monkeypatch.setattr(emb, "_collect_matrix", boom)
    out = emb.embedding_dedup(sf_smoke, pairs_source="ann_lsh")
    assert out.count() > 0
    out = emb.embedding_dedup(sf_smoke, pairs_source="ivf")
    assert out.count() > 0


def test_unknown_source_raises(sf_smoke):
    with pytest.raises(ValueError, match="pairs_source"):
        emb.embedding_dedup(sf_smoke, pairs_source="bogus")


def test_registered_ann_query_runs(sf_smoke):
    q = m.queries()["embedding_dedup_ann"]
    df = q(sf_smoke).to_pandas()
    assert set(df.columns) == {"vec_id", "cluster_id"}
    assert len(df) > 0


def test_ann_and_ivf_handle_any_dim_and_zero_vectors(ray_session, tmp_path):
    """The hyperplane matrix must derive its width from the corpus
    (embedding.py:_embedding_dim — it was hardcoded to the fixture's
    64), and zero vectors (failed/padded embeddings) must not produce
    NaNs or crashes on either scale path."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dedup_ray.stages.embedding import embedding_dedup

    rng = np.random.Generator(np.random.PCG64(5))
    n, d = 40, 16
    M = rng.normal(size=(n, d)).astype(np.float32)
    M[7] = 0.0
    M[13] = 0.0
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(M.reshape(-1), pa.float32()), d
            ),
        }
    )
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))

    exact = embedding_dedup(str(tmp_path), pairs_source="exact").to_pandas()
    assert len(exact) == n and not exact.isna().any().any()
    for src, kw in (("ann_lsh", {}), ("ivf", {"n_lists": 4})):
        got = embedding_dedup(str(tmp_path), pairs_source=src, **kw).to_pandas()
        assert len(got) == n and not got.isna().any().any(), src
        # zero vectors normalize to zero similarity: never clustered
        z = got.set_index("vec_id").loc[[7, 13], "cluster_id"]
        assert list(z) == [7, 13], f"{src}: zero vectors joined a cluster"


def test_zero_vector_scores_minus_one_like_duckdb(ray_session, tmp_path):
    """DuckDB's list_cosine_similarity scores a zero vector at -1.0
    against anything; the engine's topk/near-pairs kernels must use
    the same convention so the oracles agree even on corpora with
    failed/padded embeddings (zero vectors never rank as neighbors)."""
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as m

    rng = np.random.Generator(np.random.PCG64(21))
    n, d = 20, 8
    M = rng.normal(size=(n, d)).astype(np.float32)
    M[1] = 0.0      # a zero-vector QUERY (vec_id < 3 are queries)
    M[9] = 0.0      # a zero-vector corpus row
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n), pa.int64()),
                "embedding": pa.array([r.tolist() for r in M], pa.list_(pa.float32())),
                "label": pa.array(np.zeros(n, dtype=np.int32), pa.int32()),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{tmp_path}/embeddings.parquet')"
    )
    norm = lambda df: df[sorted(df.columns)].sort_values(
        by=sorted(df.columns), ignore_index=True
    )
    for name in ("embedding_cosine_topk", "embedding_ivf_topk_exhaustive"):
        got = m.queries()[name](str(tmp_path)).to_pandas()
        want = con.sql(m.oracle_sql()[name]).df()
        pd.testing.assert_frame_equal(norm(got), norm(want), check_dtype=False)
        assert 9 not in set(got["neighbor_id"]), f"{name} ranked a zero vector"
    con.close()
