"""End-to-end recall gate (SURVEY.md §5.4; BASELINE.json:2,14):
flagship pipeline over the planted-duplicate fixture must reach
dup-pair recall >= 0.99 against the brute-force oracle at the same
shingle/signature config.  Also checks the skew path: the boilerplate
hot bucket must NOT produce false clusters."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from dedup_ray.config import DedupConfig
from dedup_ray.fixtures import generate_pages
from dedup_ray.oracle import predicted_pairs, recall_precision, true_dup_pairs
from dedup_ray.pipelines.flagship import flagship_assignments_from_pages
from dedup_ray.stages.extract import extract_text

N = 5000
CFG = DedupConfig()


@pytest.fixture(scope="module")
def fixture_pages():
    pages, truth = generate_pages(N, seed=1234)
    return pages, truth


@pytest.fixture(scope="module")
def assignments(fixture_pages):
    pages, _ = fixture_pages
    ds = ray.data.from_arrow(pages).map_batches(
        lambda t: t.append_column("priority", pa.array([0] * len(t), pa.int64())),
        batch_format="pyarrow",
    )
    # pipeline consumes extracted text; html must reproduce text
    ds = extract_text(ds)
    return flagship_assignments_from_pages(ds, CFG).to_pandas()


def test_extract_text_byte_identical(fixture_pages):
    """BASELINE.json:15 invariant: extract_text(html) == text, bytes."""
    pages, _ = fixture_pages
    from dedup_ray.stages.extract import extract_text_bytes

    for h, t in zip(pages["html"].to_pylist(), pages["text"].to_pylist()):
        assert extract_text_bytes(h) == t


def test_recall_exact_and_near(fixture_pages, assignments):
    pages, _ = fixture_pages
    truth = true_dup_pairs(pages, CFG, include_substring=False)
    true_pairs = truth["exact"] | truth["near"]
    pred = predicted_pairs(assignments)
    recall, precision, n_true, n_pred = recall_precision(true_pairs, pred)
    print(
        f"\nrecall={recall:.4f} precision={precision:.4f} "
        f"true={n_true} predicted={n_pred}"
    )
    assert recall >= 0.99, f"dup-pair recall {recall:.4f} < 0.99 (n_true={n_true})"
    assert precision >= 0.95, f"precision {precision:.4f} unexpectedly low"


def test_boilerplate_not_clustered(fixture_pages, assignments):
    """Boilerplate pages share a 30-token prefix (hot LSH bucket) but
    unique bodies — they must stay singleton clusters."""
    _, truth = fixture_pages
    tr = truth.to_pandas().set_index("url")
    a = assignments.set_index("url")
    bp = tr[tr["dup_class"] == "boilerplate"].index
    sizes = a.loc[bp].groupby("cluster_id").size()
    assert (sizes == 1).all(), "boilerplate pages were falsely merged"


def test_empty_pages_one_cluster(fixture_pages, assignments):
    _, truth = fixture_pages
    tr = truth.to_pandas().set_index("url")
    a = assignments.set_index("url")
    empt = tr[tr["dup_class"] == "empty"].index
    assert a.loc[empt, "cluster_id"].nunique() == 1
    assert (a.loc[empt, "kind"] == "exact").all()


def test_permutation_invariance():
    """Shuffling input rows leaves assignments identical (SURVEY §5.2)."""
    pages, _ = generate_pages(400, seed=77)
    idx = np.random.Generator(np.random.PCG64(5)).permutation(len(pages))
    shuffled = pages.take(pa.array(idx))

    def run(tbl):
        ds = ray.data.from_arrow(tbl).map_batches(
            lambda t: t.append_column("priority", pa.array([0] * len(t), pa.int64())),
            batch_format="pyarrow",
        )
        ds = extract_text(ds)
        return (
            flagship_assignments_from_pages(ds, CFG)
            .to_pandas()
            .sort_values("url", ignore_index=True)
        )

    a, b = run(pages), run(shuffled)
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)


@pytest.mark.slow
@pytest.mark.parametrize(
    "kw",
    [
        {"bands": 16, "rows_per_band": 8},
        {"jaccard_tau": 0.5},
    ],
    ids=["banding-16x8", "tau-0.5"],
)
def test_recall_holds_at_nondefault_config(kw):
    """The recall gate is not special to the default 32x4/tau-0.8
    config: banding and threshold variants must clear it against the
    brute-force oracle AT THAT CONFIG (a latent default-config
    assumption in banding/verify would surface here)."""
    cfg = DedupConfig(**kw)
    pages, _ = generate_pages(1500, seed=42)
    ds = ray.data.from_arrow(pages).map_batches(
        lambda t: t.append_column("priority", pa.array([0] * len(t), pa.int64())),
        batch_format="pyarrow",
    )
    out = flagship_assignments_from_pages(extract_text(ds), cfg).to_pandas()
    truth = true_dup_pairs(pages, cfg, include_substring=False)
    true_pairs = truth["exact"] | truth["near"]
    recall, _, n_true, _ = recall_precision(true_pairs, predicted_pairs(out))
    assert n_true > 300
    assert recall >= 0.99, f"{kw}: recall {recall:.4f} < 0.99"
