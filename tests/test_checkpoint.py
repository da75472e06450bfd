"""Checkpoint/resume tests (SURVEY.md §5.6; BASELINE.json:6,14)."""

import json
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dedup_ray.config import DedupConfig
from dedup_ray.fixtures import generate_pages
from dedup_ray.pipelines.flagship import run_flagship_checkpointed

CFG = DedupConfig()


@pytest.fixture(scope="module")
def pages_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pages_in")
    pages, _ = generate_pages(600, seed=21)
    pq.write_table(pages, str(d / "pages.parquet"))
    return str(d)


def _run(pages_dir, out_dir):
    assigns, report = run_flagship_checkpointed(
        pages_dir, out_dir, CFG, substring_pass=True
    )
    return assigns.to_pandas().sort_values("url", ignore_index=True), report


def test_checkpoint_then_resume(pages_dir, tmp_path):
    out = str(tmp_path / "out")
    a1, r1 = _run(pages_dir, out)
    assert all(not s.skipped for s in r1.values())
    # manifests written with lineage
    m = json.load(open(os.path.join(out, "members", "manifest.json")))
    assert m["completed"] and m["config_hash"] == CFG.config_hash()
    assert "counters" in json.load(
        open(os.path.join(out, "edges_minhash", "manifest.json"))
    )

    # full re-run: every stage skipped, byte-identical output
    a2, r2 = _run(pages_dir, out)
    assert all(s.skipped for s in r2.values())
    import pandas as pd

    pd.testing.assert_frame_equal(a1, a2)


def test_resume_after_partial_failure(pages_dir, tmp_path):
    """Kill-after-stage-k simulation: delete downstream checkpoints;
    rerun must skip the earlier stages and recompute only the rest."""
    out = str(tmp_path / "out2")
    a1, _ = _run(pages_dir, out)
    shutil.rmtree(os.path.join(out, "assignments"))
    shutil.rmtree(os.path.join(out, "edges_substring"))
    a2, r2 = _run(pages_dir, out)
    assert r2["members"].skipped and r2["signatures"].skipped
    assert r2["edges_minhash"].skipped
    assert not r2["edges_substring"].skipped
    assert not r2["assignments"].skipped
    import pandas as pd

    pd.testing.assert_frame_equal(a1, a2)


def test_config_change_invalidates(pages_dir, tmp_path):
    out = str(tmp_path / "out3")
    _run(pages_dir, out)
    other = DedupConfig(jaccard_tau=0.7)
    assigns, report = run_flagship_checkpointed(
        pages_dir, out, other, substring_pass=True
    )
    assigns.to_pandas()
    assert all(not s.skipped for s in report.values())
