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


def test_extractor_version_participates_in_config_hash(monkeypatch):
    """stages/extract.py's contract: EXTRACTOR_VERSION is hashed into
    lineage, so changing the extractor invalidates checkpoints instead
    of silently resuming text computed under the old rule."""
    import dedup_ray.stages.extract as extract_mod

    cfg = DedupConfig()
    assert cfg.semantic_dict()["extractor_version"] == extract_mod.EXTRACTOR_VERSION
    before = cfg.config_hash()
    monkeypatch.setattr(extract_mod, "EXTRACTOR_VERSION", "body-utf8-v2-test")
    assert cfg.config_hash() != before


def test_corrupt_manifest_recomputes_instead_of_crashing(ray_session, tmp_path):
    """External damage to a stage manifest (truncation, disk fault)
    must be treated as 'stage absent' — recompute, don't crash.  The
    .tmp + os.replace write protocol never produces one itself."""
    import os

    import pyarrow as pa
    import ray.data

    from dedup_ray.config import DedupConfig
    from dedup_ray.state.checkpoint import CheckpointedRun

    cfg = DedupConfig()
    out = str(tmp_path / "run")

    def build():
        return ray.data.from_arrow(
            pa.table({"x": pa.array([1, 2, 3], pa.int64())})
        )

    run = CheckpointedRun(out, cfg)
    ds, fp = run.run_stage("s1", [], build)
    assert ds.count() == 3 and not run.report["s1"].skipped

    # normal resume: skipped
    run2 = CheckpointedRun(out, cfg)
    ds2, _ = run2.run_stage("s1", [], build)
    assert run2.report["s1"].skipped

    # corrupt the manifest -> recompute cleanly
    mpath = os.path.join(out, "s1", "manifest.json")
    with open(mpath, "w") as f:
        f.write('{"stage": "s1", "finge')  # truncated json
    run3 = CheckpointedRun(out, cfg)
    ds3, _ = run3.run_stage("s1", [], build)
    assert ds3.count() == 3 and not run3.report["s1"].skipped
    # and the rewritten manifest resumes again
    run4 = CheckpointedRun(out, cfg)
    run4.run_stage("s1", [], build)
    assert run4.report["s1"].skipped


def test_binary_garbage_and_nondict_manifest_recompute(ray_session, tmp_path):
    """Binary garbage (UnicodeDecodeError is a ValueError, not a
    JSONDecodeError) and a valid-JSON-but-not-an-object manifest must
    both be treated as absent."""
    import os

    import pyarrow as pa
    import ray.data

    from dedup_ray.config import DedupConfig
    from dedup_ray.state.checkpoint import CheckpointedRun

    cfg = DedupConfig()
    out = str(tmp_path / "run")

    def build():
        return ray.data.from_arrow(pa.table({"x": pa.array([1, 2], pa.int64())}))

    CheckpointedRun(out, cfg).run_stage("s1", [], build)
    mpath = os.path.join(out, "s1", "manifest.json")
    for damage in (b"\xff\xfe\x00garbage", b"[1, 2, 3]"):
        with open(mpath, "wb") as f:
            f.write(damage)
        run = CheckpointedRun(out, cfg)
        ds, _ = run.run_stage("s1", [], build)
        assert ds.count() == 2 and not run.report["s1"].skipped, damage
