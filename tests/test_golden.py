"""Golden-file regression tests (FIXTURES.md §3): the signature math
and substring detection are pinned to committed expected outputs —
any semantic change to hashing/shingling/winnowing fails here first."""

import json
import os

import pyarrow as pa

from dedup_ray.config import DedupConfig
from dedup_ray.stages.minhash import MinHasher, tokenize

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def test_minhash_vectors_golden():
    g = json.load(open(os.path.join(GOLDEN, "minhash_vectors.json")))
    cfg = DedupConfig(
        num_perms=g["config"]["num_perms"],
        bands=g["config"]["bands"],
        rows_per_band=g["config"]["rows_per_band"],
        shingle_k=g["config"]["shingle_k"],
        seed=g["config"]["seed"],
    )
    urls = list(g["tokens"].keys())
    texts = {
        "tiny1": "the cat sat on the mat",
        "tiny2": "the cat sat on the hat",
        "tiny3": "completely different words entirely here now",
    }
    for u in urls:
        assert tokenize(texts[u]) == g["tokens"][u]
    out = MinHasher(cfg)(pa.table({"url": urls, "text": [texts[u] for u in urls]}))
    for u, sig, sim, nsh in zip(
        urls,
        out["minhash"].to_pylist(),
        out["simhash64"].to_pylist(),
        out["n_shingles"].to_pylist(),
    ):
        assert [str(x) for x in sig] == g["minhash"][u], u
        assert str(sim) == g["simhash64"][u], u
        assert nsh == g["n_shingles"][u], u
    # tiny1/tiny2 differ by one token -> share some minhash components
    s1 = g["minhash"]["tiny1"]
    s2 = g["minhash"]["tiny2"]
    s3 = g["minhash"]["tiny3"]
    assert sum(a == b for a, b in zip(s1, s2)) > sum(
        a == b for a, b in zip(s1, s3)
    )


def test_substring_pair_golden(ray_session):
    import ray.data

    from dedup_ray.stages.winnow import substring_edges

    g = json.load(open(os.path.join(GOLDEN, "substring_pair.json")))
    winners = ray.data.from_arrow(
        pa.table({"url": ["a", "b"], "text": [g["text_a"], g["text_b"]]})
    )
    edges = substring_edges(winners, DedupConfig()).to_pandas()
    assert len(edges) == 1
    row = edges.iloc[0]
    assert {row["u"], row["v"]} == {"a", "b"}
    assert row["kind"] == g["expected_edge"]["kind"]
    assert row["score"] >= g["expected_edge"]["min_score"]
