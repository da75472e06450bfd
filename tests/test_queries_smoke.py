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
    "lang_id": {"url", "lang_pred"},
    "doc_fingerprint": {"url", "n_fingerprints", "min_fingerprint"},
    "embedding_ann_lsh": {"id_a", "id_b"},
    "embedding_ivf_topk": {"query_id", "neighbor_id", "rank"},
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
