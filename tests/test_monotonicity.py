"""Threshold-monotonicity and duplicate-injection closure properties
(SURVEY.md §5.2)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from dedup_ray.config import DedupConfig
from dedup_ray.fixtures import generate_pages
from dedup_ray.pipelines.flagship import flagship_assignments_from_pages


def _run(pages: pa.Table, cfg: DedupConfig):
    ds = ray.data.from_arrow(pages.select(["url", "text", "lang"])).map_batches(
        lambda t: t.append_column("priority", pa.array([0] * len(t), pa.int64())),
        batch_format="pyarrow",
    )
    return flagship_assignments_from_pages(ds, cfg).to_pandas()


@pytest.mark.slow
def test_lower_tau_coarser_clustering():
    pages, _ = generate_pages(1200, seed=55)
    strict = _run(pages, DedupConfig(jaccard_tau=0.9))
    loose = _run(pages, DedupConfig(jaccard_tau=0.6))
    assert loose["cluster_id"].nunique() <= strict["cluster_id"].nunique()


def test_duplicate_injection_closure():
    """Duplicating any row maps the copy into the same cluster."""
    pages, _ = generate_pages(300, seed=66)
    cfg = DedupConfig()
    base = _run(pages, cfg).set_index("url")
    # duplicate three arbitrary pages under fresh urls
    take = pages.slice(10, 3)
    dup = pa.table(
        {
            "url": pa.array([f"copy{i}" for i in range(3)], pa.string()),
            "warc_ts": take["warc_ts"],
            "html": take["html"],
            "text": take["text"],
            "lang": take["lang"],
        }
    )
    combined = pa.concat_tables([pages, dup])
    out = _run(combined, cfg).set_index("url")
    for i, orig_url in enumerate(take["url"].to_pylist()):
        assert out.loc[f"copy{i}", "cluster_id"] == out.loc[orig_url, "cluster_id"]
        assert not out.loc[f"copy{i}", "is_canonical"] or out.loc[
            f"copy{i}", "cluster_id"
        ] == f"copy{i}"
    # pre-existing clustering unchanged up to possible new min-url labels
    joined = base.join(out, rsuffix="_new")
    grp_old = joined.groupby("cluster_id")["cluster_id_new"].nunique()
    assert (grp_old == 1).all(), "injection must not split existing clusters"
