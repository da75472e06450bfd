"""incremental_minhash_dedup verdict semantics on a crafted corpus
with planted NEAR-duplicate structure (every verdict class + the
transitive within-batch case + the zero-shingle carve-out), plus the
side-aware pair kernel's base x base skip."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dedup_ray.config import DEFAULT_CONFIG
from dedup_ray.pipelines.neardup_queries import incremental_minhash_dedup


def _text(seed: str, n_tokens: int = 120) -> str:
    return " ".join(f"{seed}w{j}" for j in range(n_tokens))


@pytest.fixture(scope="module")
def crafted_sf(tmp_path_factory):
    root = tmp_path_factory.mktemp("incminhash")
    t3 = _text("shared")
    t22 = _text("pairA")
    # one token swapped: still ~0.92 true Jaccard vs t22
    t23 = " ".join(
        tok if j != 60 else "SWAPPED" for j, tok in enumerate(t22.split(" "))
    )
    rows = [
        # doc_id, text, source
        (1, _text("base1"), "src0"),   # recrawl-1 -> near-dup of base
        (2, "tiny doc", "src0"),       # < k tokens: recrawl-2 has no shingles
        (3, t3, "src2"),               # base partner for doc 21
        (20, _text("fresh"), "src1"),  # unique: new-20 'new', second-20 in-batch
        (21, t3, "src1"),              # identical to base doc 3
        (22, t22, "src1"),             # near-dup pair inside the batch
        (23, t23, "src1"),
    ]
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "source": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    pq.write_table(t, root / "documents.parquet")
    return str(root)


def test_incremental_minhash_verdicts(ray_session, crafted_sf):
    out = incremental_minhash_dedup(crafted_sf).to_pandas()
    got = dict(zip(out["url"], out["verdict"]))
    assert got == {
        # recrawl of src0: light rewrite of base content
        "recrawl-1": "dup_of_base",
        # zero-shingle short text: no minhash signal -> singleton
        "recrawl-2": "new",
        # fresh unique src1 doc + its in-batch rewrite
        "new-20": "new",
        "second-20": "dup_in_batch",
        # src1 doc identical to a base doc: the whole component
        # (incl. its 'second-' rewrite) joins the corpus cluster
        "new-21": "dup_of_base",
        "second-21": "dup_of_base",
        # near-dup pair unseen in base: min-url member stays 'new',
        # the rest (incl. both 'second-' rewrites) are in-batch dups —
        # transitive over verified edges like the flagship
        "new-22": "new",
        "new-23": "dup_in_batch",
        "second-22": "dup_in_batch",
        "second-23": "dup_in_batch",
    }
    # row count contract: 2 x |src1| + |src0|
    assert len(out) == 2 * 4 + 2


def test_incremental_pair_kernel_skips_base_pairs(ray_session):
    """The side-aware kernel never emits base x base candidate pairs,
    including inside salted hot buckets."""
    import ray.data

    from dedup_ray.stages.lsh import (
        fused_candidate_pairs_incremental,
        lsh_bands,
    )
    from dedup_ray.stages.minhash import minhash_signatures_stage
    from dedup_ray.util import hash_urls_u64

    cfg = DEFAULT_CONFIG
    # one boilerplate family far above bucket_cap (hot-bucket path) +
    # a small bucket: mixed base/new membership in both
    n_fam = cfg.bucket_cap * 2 + 10
    urls, texts, sides = [], [], []
    fam = _text("fam", 80)
    for i in range(n_fam):
        urls.append(f"{'n' if i % 3 == 0 else 'b'}-fam-{i:04d}")
        texts.append(fam)
        sides.append(1 if i % 3 == 0 else 0)
    small = _text("small", 80)
    for i in range(4):
        urls.append(f"{'n' if i % 2 == 0 else 'b'}-small-{i}")
        texts.append(small)
        sides.append(1 if i % 2 == 0 else 0)
    pages = ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "text": pa.array(texts, pa.string()),
                "side": pa.array(sides, pa.int32()),
            }
        )
    )
    sigs = minhash_signatures_stage(pages, cfg)
    bands = lsh_bands(sigs, cfg, passthrough=("side",))
    fused = fused_candidate_pairs_incremental(bands, cfg).to_pandas()
    pairs = fused[fused["meta"] == 0]
    assert len(pairs), "expected candidate pairs"
    # hot bucket was logged, not silently truncated
    assert (fused["meta"] == 1).any()
    ids = hash_urls_u64(urls).view(np.int64)
    new_ids = {int(i) for i, s in zip(ids, sides) if s == 1}
    touched_new = pairs["u_id"].isin(new_ids) | pairs["v_id"].isin(new_ids)
    assert touched_new.all(), "base x base pair emitted"
    # every NEW doc in the hot family still reaches the bucket: it
    # appears in at least one candidate pair
    seen = set(pairs["u_id"]) | set(pairs["v_id"])
    for i, (u, s) in enumerate(zip(urls, sides)):
        if s == 1 and "fam" in u:
            assert int(ids[i]) in seen


def test_incremental_neardup_two_dataset_api(ray_session):
    """The general library API takes arbitrary base/new page Datasets
    (no scenario synthesis, no url-prefix assumption)."""
    import ray.data

    from dedup_ray.pipelines.incremental import incremental_neardup

    base = ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array(["b/corpus-1", "b/corpus-2"], pa.string()),
                "text": pa.array([_text("one"), _text("two")], pa.string()),
            }
        )
    )
    new = ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array(["a/rewrite-1", "a/fresh", "z/fresh-copy"], pa.string()),
                "text": pa.array(
                    [_text("one") + " light rewrite", _text("unique"), _text("unique")],
                    pa.string(),
                ),
            }
        )
    )
    out = incremental_neardup(new_pages=new, base_pages=base, cfg=DEFAULT_CONFIG)
    got = dict(zip(*(lambda d: (d["url"], d["verdict"]))(out.to_pandas())))
    assert got == {
        "a/rewrite-1": "dup_of_base",
        "a/fresh": "new",           # min url of the identical pair
        "z/fresh-copy": "dup_in_batch",
    }


def test_incremental_neardup_empty_base_first_crawl(ray_session):
    """Empty base corpus (first crawl): pure within-batch near-dedup."""
    import ray.data

    from dedup_ray.pipelines.incremental import incremental_neardup

    base = ray.data.from_arrow(
        pa.table(
            {"url": pa.array([], pa.string()), "text": pa.array([], pa.string())}
        )
    )
    new = ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array(["n1", "n2", "n3"], pa.string()),
                "text": pa.array(
                    [_text("dup"), _text("dup") + " tail", _text("solo")],
                    pa.string(),
                ),
            }
        )
    )
    out = incremental_neardup(base, new, DEFAULT_CONFIG).to_pandas()
    got = dict(zip(out["url"], out["verdict"]))
    assert got == {"n1": "new", "n2": "dup_in_batch", "n3": "new"}


def test_incremental_neardup_from_signature_checkpoint(ray_session, tmp_path):
    """The production base side: a parquet-roundtripped signature
    table (never re-shingled) must yield verdicts identical to
    recomputing from base pages."""
    import ray.data

    from dedup_ray.pipelines.incremental import incremental_neardup
    from dedup_ray.stages.minhash import minhash_signatures_stage

    base = ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array(["b1", "b2"], pa.string()),
                "text": pa.array([_text("one"), _text("two")], pa.string()),
            }
        )
    )
    new = ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array(["n1", "n2"], pa.string()),
                "text": pa.array(
                    [_text("one") + " rewrite", _text("three")], pa.string()
                ),
            }
        )
    )
    from_pages = incremental_neardup(base, new, DEFAULT_CONFIG).to_pandas()
    # checkpoint the base signatures through parquet (the flagship's
    # signatures/ stage shape) and feed them back
    sig_dir = str(tmp_path / "signatures")
    minhash_signatures_stage(base, DEFAULT_CONFIG).write_parquet(sig_dir)
    base_sigs = ray.data.read_parquet(sig_dir)
    from_ckpt = incremental_neardup(
        None, new, DEFAULT_CONFIG, base_signatures=base_sigs
    ).to_pandas()
    a = dict(zip(from_pages["url"], from_pages["verdict"]))
    b = dict(zip(from_ckpt["url"], from_ckpt["verdict"]))
    assert a == b == {"n1": "dup_of_base", "n2": "new"}
    with pytest.raises(ValueError, match="exactly one"):
        incremental_neardup(base, new, DEFAULT_CONFIG, base_signatures=base_sigs)
    with pytest.raises(ValueError, match="exactly one"):
        incremental_neardup(None, new, DEFAULT_CONFIG)


def test_incremental_neardup_from_band_checkpoint(ray_session, tmp_path):
    """Disk-partitioned base band rows (only new rows move through the
    candidate exchange) must yield verdicts identical to the in-memory
    path; a checkpoint built under a different signature config must be
    rejected."""
    import dataclasses

    import ray.data

    from dedup_ray.pipelines.incremental import (
        incremental_neardup,
        write_band_checkpoint,
    )
    from dedup_ray.stages.minhash import minhash_signatures_stage

    base = ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array([f"b{i}" for i in range(20)], pa.string()),
                "text": pa.array([_text(f"b{i % 5}") for i in range(20)], pa.string()),
            }
        )
    )
    new = ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array(["n0", "n1", "n2"], pa.string()),
                "text": pa.array(
                    [_text("b0") + " tail", _text("x"), _text("x") + " tail"],
                    pa.string(),
                ),
            }
        )
    )
    sig_dir = str(tmp_path / "sigs")
    band_dir = str(tmp_path / "bands_ckpt")
    minhash_signatures_stage(base, DEFAULT_CONFIG).write_parquet(sig_dir)
    base_sigs = ray.data.read_parquet(sig_dir)
    write_band_checkpoint(base_sigs, DEFAULT_CONFIG, band_dir, num_partitions=4)

    plain = incremental_neardup(
        None, new, DEFAULT_CONFIG, base_signatures=base_sigs
    ).to_pandas()
    ckpt = incremental_neardup(
        None,
        new,
        DEFAULT_CONFIG,
        base_signatures=ray.data.read_parquet(sig_dir),
        base_bands=band_dir,
    ).to_pandas()
    a = sorted(zip(plain["url"], plain["verdict"]))
    b = sorted(zip(ckpt["url"], ckpt["verdict"]))
    assert a == b
    assert dict(b) == {"n0": "dup_of_base", "n1": "new", "n2": "dup_in_batch"}

    other = dataclasses.replace(DEFAULT_CONFIG, seed=DEFAULT_CONFIG.seed + 1)
    with pytest.raises(Exception, match="different\\s+signature config"):
        incremental_neardup(
            None,
            new,
            other,
            base_signatures=ray.data.read_parquet(sig_dir),
            base_bands=band_dir,
        ).to_pandas()


def test_incremental_incident_gate_fallback_parity(ray_session, monkeypatch):
    """The size-gated incident broadcast (filter signatures map-side
    before the verify exchange) must be bit-identical to the ungated
    exchange semi-join."""
    import ray.data

    from dedup_ray.pipelines import incremental as inc

    base = ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array([f"b{i}" for i in range(30)], pa.string()),
                "text": pa.array([_text(f"b{i % 7}") for i in range(30)], pa.string()),
            }
        )
    )
    new = ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array([f"n{i}" for i in range(12)], pa.string()),
                "text": pa.array(
                    [
                        _text(f"b{i % 7}") + " tail"
                        if i % 2 == 0
                        # i=1,3: a base-free near-dup pair (one 'new',
                        # one 'dup_in_batch'); other odds: singletons
                        else (_text("batchdup") if i in (1, 3) else _text(f"n{i}"))
                        for i in range(12)
                    ],
                    pa.string(),
                ),
            }
        )
    )
    gated = inc.incremental_neardup(base, new, DEFAULT_CONFIG).to_pandas()
    monkeypatch.setattr(inc, "INCIDENT_BROADCAST_MAX_PAIRS", 0)
    ungated = inc.incremental_neardup(base, new, DEFAULT_CONFIG).to_pandas()
    a = sorted(zip(gated["url"], gated["verdict"]))
    b = sorted(zip(ungated["url"], ungated["verdict"]))
    assert a == b
    assert {v for _, v in a} == {"new", "dup_of_base", "dup_in_batch"}


def test_incremental_neardup_rejects_duplicate_urls(ray_session):
    """urls are the identity key; a url present on both sides (or
    twice on one side) must fail loudly, not drop its verdict."""
    import ray.data

    from dedup_ray.pipelines.incremental import incremental_neardup

    t = pa.table(
        {
            "url": pa.array(["same-url"], pa.string()),
            "text": pa.array([_text("x")], pa.string()),
        }
    )
    with pytest.raises(Exception, match="duplicate urls"):
        incremental_neardup(
            ray.data.from_arrow(t), ray.data.from_arrow(t), DEFAULT_CONFIG
        ).to_pandas()


def test_incremental_minhash_empty_corpus(ray_session, tmp_path):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "text": pa.array([], pa.string()),
                "source": pa.array([], pa.string()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    out = incremental_minhash_dedup(str(tmp_path)).to_pandas()
    assert len(out) == 0
    assert set(out.columns) == {"url", "verdict"} or out.empty
