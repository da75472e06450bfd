"""Rows-only queries: smoke + determinism (stable row counts across
runs, which is what the driver's weaker check observes)."""

import sys

import pytest

sys.path.insert(0, "/root/repo")
import __ray_entry__ as entrymod  # noqa: E402

ROWS_ONLY = sorted(set(entrymod.queries()) - set(entrymod.oracle_sql()))

EXPECT_COLS = {
    "dedup_full": {"url", "cluster_id", "kind", "is_canonical"},
    "simhash_hamming": {"u", "v", "hamming"},
    "ngram_jaccard_pairs": {"u", "v", "kind", "score"},
    "sample_pages": {"url", "text", "lang"},
    "minhash_signatures": {"url", "n_shingles", "simhash64"},
    "lsh_band_rows": {"band_id", "band_hash", "doc_id"},
    "minhash_edge_list": {"u", "v", "kind", "score"},
    "substring_edge_list": {"u", "v", "kind", "score"},
    "simhash_dedup": {"url", "simhash_cluster"},
    "jaccard_dedup": {"url", "jaccard_cluster"},
    # in depth: tests/test_incremental_minhash.py (crafted verdicts)
    "incremental_minhash_dedup": {"url", "verdict"},
    "lang_id": {"url", "lang_pred"},
    "doc_fingerprint": {"url", "n_fingerprints", "min_fingerprint"},
    "embedding_ann_lsh": {"id_a", "id_b"},
    "embedding_ivf_topk": {"query_id", "neighbor_id", "rank"},
    # scale-path clustering (LSH pair source): covered in depth by
    # tests/test_embedding_dedup_sources.py
    "embedding_dedup_ann": {"vec_id", "cluster_id"},
    "embedding_dedup_ivf": {"vec_id", "cluster_id"},
    # in depth: tests/test_decontam.py (planted n-gram overlap)
    "decontaminate_docs": {"url", "contaminated", "n_hits", "n_shingles"},
    "image_decode_stats": {"url", "width", "height", "channels", "lum_mean"},
    "audio_decode_stats": {"url", "sample_rate", "n_samples", "spectral_centroid"},
}

# heavy pipelines (full flagship / edge lists) are exercised by
# tests/test_recall.py, tests/test_winnow.py and the entry() smoke —
# smoke only the light single-stage queries here to keep the suite fast
LIGHT = [
    "minhash_signatures",
    "simhash_dedup",
    "lang_id",
    "doc_fingerprint",
    "embedding_ann_lsh",
    "sample_pages",
    "simhash_hamming",
    "ngram_jaccard_pairs",
]


def test_registry_covers_expectations():
    assert set(ROWS_ONLY) == set(EXPECT_COLS)


@pytest.mark.parametrize("name", LIGHT)
def test_rows_only_query_runs(name, sf_smoke):
    fn = entrymod.queries()[name]
    df = fn(sf_smoke).to_pandas()
    assert set(EXPECT_COLS[name]) <= set(df.columns), (name, df.columns)
    if name not in ("embedding_ann_lsh", "simhash_hamming", "ngram_jaccard_pairs"):
        assert len(df) > 0


def test_ann_lsh_subset_of_bruteforce(sf_smoke):
    """ANN pairs must be a subset of the exact near pairs (no false
    positives; recall is approximate by design)."""
    import __ray_entry__ as m

    exact = m.queries()["embedding_near_pairs"](sf_smoke).to_pandas()
    ann = m.queries()["embedding_ann_lsh"](sf_smoke).to_pandas()
    exact_set = set(zip(exact["id_a"], exact["id_b"]))
    ann_set = set(zip(ann["id_a"], ann["id_b"]))
    assert ann_set <= exact_set
    if exact_set:
        recall = len(ann_set) / len(exact_set)
        print(f"\nANN recall vs brute force: {recall:.3f} ({len(ann_set)}/{len(exact_set)})")
        assert recall >= 0.9


def test_ivf_exhaustive_matches_exact_topk(sf_smoke):
    """IVF with n_probe == n_lists searches every list -> must equal
    the exact brute-force top-k (same output contract)."""
    import __ray_entry__ as m

    exact = m.queries()["embedding_cosine_topk"](sf_smoke).to_pandas()
    ivf = m.queries()["embedding_ivf_topk_exhaustive"](sf_smoke).to_pandas()
    key = ["query_id", "rank"]
    e = exact.sort_values(key, ignore_index=True)
    v = ivf.sort_values(key, ignore_index=True)
    assert e[["query_id", "neighbor_id", "rank"]].equals(
        v[["query_id", "neighbor_id", "rank"]]
    )


def test_ivf_probed_recall(sf_smoke):
    """Default probed IVF (n_probe=4 of 16 lists) must keep high top-k
    recall vs the exact result."""
    import __ray_entry__ as m

    exact = m.queries()["embedding_cosine_topk"](sf_smoke).to_pandas()
    ivf = m.queries()["embedding_ivf_topk"](sf_smoke).to_pandas()
    exact_set = set(zip(exact["query_id"], exact["neighbor_id"]))
    ivf_set = set(zip(ivf["query_id"], ivf["neighbor_id"]))
    recall = len(ivf_set & exact_set) / len(exact_set)
    print(f"\nIVF top-k recall vs exact: {recall:.3f}")
    assert recall >= 0.8


def _write_embeddings(tmp_path, vectors, ids=None):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    vectors = np.asarray(vectors, dtype=np.float32)
    n = len(vectors)
    ids = list(range(n)) if ids is None else ids
    tbl = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in vectors], pa.list_(pa.float32())
            ),
            "label": pa.array([0] * n, pa.int32()),
        }
    )
    sf = tmp_path / "sf"
    sf.mkdir(exist_ok=True)
    pq.write_table(tbl, str(sf / "embeddings.parquet"))
    return str(sf)


def test_ann_lsh_hot_bucket_salted_logged_and_connected(tmp_path):
    """A bucket above bucket_cap (40 identical embeddings) must be
    salted — logged in hot_log, never silent — while the emitted pairs
    still connect every member of the duplicate group (within-salt
    all-pairs + cross-salt representative pairs, the text-LSH star
    shape)."""
    import numpy as np

    from dedup_ray.stages.embedding import ann_lsh_pairs
    from dedup_ray.state.unionfind import connected_components

    rng = np.random.Generator(np.random.PCG64(42))
    dup = np.tile(rng.standard_normal(64), (40, 1))  # one hot group
    others = rng.standard_normal((10, 64))
    sf = _write_embeddings(tmp_path, np.vstack([dup, others]))

    log: list = []
    pairs = ann_lsh_pairs(sf, threshold=0.9, bucket_cap=8, hot_log=log)
    assert log, "hot bucket was not logged"
    assert all(e["bucket_size"] > 8 and e["n_salts"] >= 2 for e in log)

    mapping = connected_components(pairs, u_col="id_a", v_col="id_b")
    clusters = {mapping[i] for i in range(40)}
    assert clusters == {0}, f"dup group fragmented: {clusters}"


def test_ann_lsh_auto_n_bits(tmp_path):
    """n_bits=None derives the table width from the corpus row count
    (>= 4 always; grows with log2(n))."""
    import numpy as np

    from dedup_ray.stages.embedding import ann_lsh_pairs

    rng = np.random.Generator(np.random.PCG64(7))
    sf = _write_embeddings(tmp_path, rng.standard_normal((50, 64)))
    # must run clean and produce only valid subset pairs at tiny n
    df = ann_lsh_pairs(sf, n_bits=None).to_pandas()
    assert ((df["id_a"] < df["id_b"]) | df.empty).all()
