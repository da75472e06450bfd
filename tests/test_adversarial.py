"""Adversarial corpus shapes through the FULL flagship.

Two worst cases a web crawl actually produces:

- a mirror farm: one document exactly replicated N times (one sha
  group of size N; after exact dedupe a single winner reaches the
  near-dup layer);
- a boilerplate family: N near-identical documents (distinct shas,
  ~identical shingle sets) with N far above ``bucket_cap``, so EVERY
  LSH band bucket is hot and must be salted — connectivity across
  salts (rep star) is what keeps the family one cluster.

These pin end-to-end behavior the unit tests
(test_properties.test_salt_split_preserves_connectivity) only cover at
the pair-kernel level.
"""

import pyarrow as pa
import ray.data

from dedup_ray.config import DedupConfig
from dedup_ray.pipelines.flagship import flagship_assignments_from_pages


def _pages(urls, texts):
    t = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(urls), pa.string()),
            "priority": pa.array([0] * len(urls), pa.int64()),
        }
    )
    return ray.data.from_arrow(t)


def test_all_identical_corpus_one_exact_cluster(ray_session):
    n = 120
    text = "the same mirrored page content " * 40
    urls = [f"https://m{i:04d}.example/page" for i in range(n)]
    out = flagship_assignments_from_pages(
        _pages(urls, [text] * n), DedupConfig()
    ).to_pandas()
    assert len(out) == n
    assert out["cluster_id"].nunique() == 1
    assert int(out["is_canonical"].sum()) == 1
    # canonical = min url (uniform priority), everyone else exact-dup
    canon = out[out["is_canonical"]]["url"].iloc[0]
    assert canon == min(urls)
    # kind is CLUSTER-level: every member of an exact-dup group
    # (winner included) is "exact"; "unique" is reserved for
    # singleton shas (flagship.py assign_kernel: group_n > 1)
    kinds = out.groupby("kind")["url"].count().to_dict()
    assert kinds == {"exact": n}


def test_boilerplate_family_above_bucket_cap_single_cluster(ray_session):
    """150 near-identical docs >> bucket_cap=64: every band bucket is
    salted; the family must still resolve to ONE minhash cluster."""
    cfg = DedupConfig()
    n = 150
    # 300 DISTINCT tokens: a repetitive base would collapse the
    # unique-shingle set (~10 5-grams for a period-10 text) and make
    # the docs genuinely dissimilar (J ~ 0.33) — with distinct tokens
    # one tweak invalidates only ~k windows, J ~ 0.97 >> tau
    base = [f"tok{j:03d}" for j in range(300)]
    urls, texts = [], []
    for i in range(n):
        toks = list(base)
        toks[i * 2] = f"tweak{i}"
        urls.append(f"https://site{i:04d}.example/")
        texts.append(" ".join(toks))
    assert n > cfg.bucket_cap
    out = flagship_assignments_from_pages(_pages(urls, texts), cfg).to_pandas()
    assert len(out) == n
    assert out["cluster_id"].nunique() == 1, (
        f"boilerplate family split into {out['cluster_id'].nunique()} clusters"
    )
    assert int(out["is_canonical"].sum()) == 1
    # cluster-level kind: every member of the near-dup cluster,
    # canonical included, is "minhash"
    assert set(out["kind"]) == {"minhash"}


def test_unicode_corpus_flagship(ray_session):
    """CJK / emoji / RTL / astral-plane text through the FULL flagship
    (substring pass on): exercises utf-8 surrogatepass token hashing
    (util.blake2b_u64 path), utf-32 char rolling hashes (winnowing)
    and sha-256 over non-ascii text.  Near-dup pair: two long CJK docs
    differing by one token must cluster; the emoji/RTL singletons must
    not."""
    from dedup_ray.config import DedupConfig

    base_cjk = "汉字 深度 学习 数据 管道 去重 引擎 分布式 计算 存储 " * 40
    pages = _pages(
        [
            "https://cn.example/a",
            "https://cn.example/b",
            "https://emoji.example/",
            "https://ar.example/",
            "https://astral.example/",
        ],
        [
            base_cjk,
            base_cjk[:-3] + " 变体",       # one-token tail tweak: near-dup
            "🎉🎊 emoji only page 🚀🌟 " * 30,
            "النص العربي من اليمين إلى اليسار " * 30,
            "𝔘𝔫𝔦𝔠𝔬𝔡𝔢 𝕞𝕒𝕥𝕙 𝖘𝖙𝖞𝖑𝖊𝖉 text " * 30,
        ],
    )
    out = flagship_assignments_from_pages(
        pages, DedupConfig(), substring_pass=True
    ).to_pandas()
    assert len(out) == 5
    by_url = out.set_index("url")
    assert (
        by_url.loc["https://cn.example/a", "cluster_id"]
        == by_url.loc["https://cn.example/b", "cluster_id"]
    )
    assert out["cluster_id"].nunique() == 4
    for u in ("https://emoji.example/", "https://ar.example/",
              "https://astral.example/"):
        assert by_url.loc[u, "kind"] == "unique"


def test_zero_row_corpus_flagship(ray_session):
    """A zero-row corpus (empty shard / empty input dir) must produce
    an empty assignments table, not crash: 0-row blocks BYPASS
    map_batches and arrive schema-less, which used to break the
    ``ds.schema().names`` guards (fixed via core.schema_names + the
    partitioned_kernel zero-row short-circuit)."""
    import ray.data as rd

    empty = rd.from_arrow(
        pa.table(
            {
                "url": pa.array([], pa.string()),
                "text": pa.array([], pa.string()),
                "lang": pa.array([], pa.string()),
                "priority": pa.array([], pa.int64()),
            }
        )
    )
    out = flagship_assignments_from_pages(
        empty, DedupConfig(), substring_pass=True
    )
    assert out.count() == 0


def test_cc_method_typo_caught_at_construction():
    import pytest as _pytest

    from dedup_ray.config import DedupConfig

    with _pytest.raises(ValueError, match="cc_method"):
        DedupConfig(cc_method="labelprop")


def test_embedding_dim_degenerate_plain_list(ray_session, tmp_path):
    """Empty plain-list embeddings must not crash the dim probe; a
    null first embedding gets a clean error."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pytest

    from dedup_ray.stages.embedding import _embedding_dim, embedding_dedup

    pq.write_table(
        pa.table({"vec_id": pa.array([], pa.int64()),
                  "embedding": pa.array([], pa.list_(pa.float32()))}),
        str(tmp_path / "embeddings.parquet"),
    )
    assert _embedding_dim(str(tmp_path)) == 1
    out = embedding_dedup(str(tmp_path), pairs_source="ann_lsh")
    assert out.count() == 0

    pq.write_table(
        pa.table({"vec_id": pa.array([0, 1], pa.int64()),
                  "embedding": pa.array([None, [1.0, 2.0]], pa.list_(pa.float32()))}),
        str(tmp_path / "embeddings.parquet"),
    )
    with _pytest.raises(ValueError, match="null"):
        _embedding_dim(str(tmp_path))
