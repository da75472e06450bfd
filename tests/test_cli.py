"""CLI end-to-end test (subprocess — the CLI owns its own Ray
session, so it must not run in the pytest session's Ray)."""

import json
import os
import subprocess
import sys

import pyarrow.parquet as pq
import pytest

from dedup_ray.fixtures import generate_pages


@pytest.mark.slow
def test_cli_run_and_resume(tmp_path):
    indir = tmp_path / "in"
    indir.mkdir()
    pages, _ = generate_pages(300, seed=9)
    pq.write_table(pages, str(indir / "pages.parquet"))
    out = tmp_path / "out"

    def run():
        proc = subprocess.run(
            [
                sys.executable,
                "-m",
                "dedup_ray",
                "--input",
                str(indir),
                "--out",
                str(out),
                "--cpus",
                "4",
                "--no-substring",
            ],
            capture_output=True,
            text=True,
            cwd="/root/repo",
            timeout=300,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        return json.loads(proc.stdout)

    s1 = run()
    assert s1["n_pages"] == 300
    assert s1["n_clusters"] < 300  # fixture plants duplicates
    assert os.path.exists(s1["report"])
    assert any(d.startswith("kind=") for d in os.listdir(s1["assignments"]))

    s2 = run()
    assert all(v == "skipped" for v in s2["stages"].values())
    assert s2["n_clusters"] == s1["n_clusters"]
    # the re-run must OVERWRITE assignments_by_kind, not append a
    # second write_uuid's worth of duplicate files beside the first
    assert s2["n_pages"] == 300
    written = pq.read_table(s2["assignments"])
    assert len(written) == 300


def test_write_assignments_overwrites_previous_run(ray_session, tmp_path):
    """Ray names parquet output with a fresh per-run write_uuid, so a
    bare write_parquet into an existing directory APPENDS a duplicate
    copy — the sink must replace the directory atomically instead."""
    import pyarrow as pa
    import ray.data

    from dedup_ray.sources.sinks import write_assignments_parquet

    t = pa.table(
        {
            "url": pa.array([f"u{i}" for i in range(10)], pa.string()),
            "kind": pa.array(["exact" if i % 2 else "unique" for i in range(10)]),
        }
    )
    out = str(tmp_path / "assignments_by_kind")
    for _ in range(2):
        write_assignments_parquet(ray.data.from_arrow(t), out)
    assert len(pq.read_table(out)) == 10


@pytest.mark.slow
def test_cli_priority_col(tmp_path):
    """--priority-col flips the winner inside duplicate groups."""
    import pyarrow as pa

    indir = tmp_path / "in2"
    indir.mkdir()
    tbl = pa.table(
        {
            "url": pa.array(["a", "b"], pa.string()),
            "warc_ts": pa.array([0, 0], pa.timestamp("us")),
            "html": pa.array(
                [b"<html><body>dup text</body></html>"] * 2, pa.binary()
            ),
            "text": pa.array(["dup text"] * 2),
            "lang": pa.array(["en", "en"]),
            "rank": pa.array([9, 1], pa.int64()),  # b should win
        }
    )
    pq.write_table(tbl, str(indir / "pages.parquet"))
    out = tmp_path / "out2"
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "dedup_ray",
            "--input",
            str(indir),
            "--out",
            str(out),
            "--cpus",
            "4",
            "--no-substring",
            "--priority-col",
            "rank",
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    import pandas as pd

    import glob

    files = glob.glob(str(out / "assignments_by_kind" / "**" / "*.parquet"), recursive=True)
    df = pd.concat([pq.read_table(f).to_pandas() for f in files])
    # kind is a hive partition column; recover membership from files
    assert set(df["url"]) == {"a", "b"}
    assert bool(df.set_index("url").loc["b", "is_canonical"])
    assert not bool(df.set_index("url").loc["a", "is_canonical"])


def test_ray_init_kwargs_address_selection(monkeypatch):
    """The CLI attaches to $RAY_ADDRESS (ray job submit exports it)
    and only owns/sizes a session when the address is local."""
    from dedup_ray.__main__ import ray_init_kwargs

    monkeypatch.delenv("RAY_ADDRESS", raising=False)
    kw = ray_init_kwargs(4)
    assert kw["address"] == "local" and kw["num_cpus"] == 4

    monkeypatch.setenv("RAY_ADDRESS", "local")
    kw = ray_init_kwargs(None)
    assert kw["address"] == "local" and kw["num_cpus"] is None

    monkeypatch.setenv("RAY_ADDRESS", "192.0.2.7:6379")
    kw = ray_init_kwargs(8)
    assert kw["address"] == "192.0.2.7:6379"
    # an existing cluster rejects per-driver resource overrides
    assert "num_cpus" not in kw and "include_dashboard" not in kw


def test_cli_empty_input(tmp_path):
    """An empty-but-valid pages parquet must produce a clean all-zero
    summary and an empty assignments sink, not crash (zero-row blocks
    are schema-less; see core.schema_names)."""
    import pyarrow as pa

    inp = tmp_path / "pages"
    inp.mkdir()
    pq.write_table(
        pa.table(
            {
                "url": pa.array([], pa.string()),
                "warc_ts": pa.array([], pa.timestamp("us")),
                "html": pa.array([], pa.binary()),
                "text": pa.array([], pa.string()),
                "lang": pa.array([], pa.string()),
            }
        ),
        str(inp / "part0.parquet"),
    )
    out = tmp_path / "out"
    proc = subprocess.run(
        [sys.executable, "-m", "dedup_ray", "--input", str(inp),
         "--out", str(out), "--cpus", "2"],
        capture_output=True, text=True, timeout=240,
        cwd="/root/repo",
        env={**os.environ, "RAY_ADDRESS": "local"},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    summary = json.loads(proc.stdout[proc.stdout.index("{"):])
    assert summary["n_pages"] == 0
    assert summary["n_clusters"] == 0
    assert summary["n_duplicate_pages"] == 0


@pytest.mark.slow
def test_cli_incremental_mode(tmp_path):
    """--incremental-base: near-dedup a new shard against a base
    corpus; verdict partitions + summary counts line up."""
    import pyarrow as pa

    base_dir = tmp_path / "base"
    new_dir = tmp_path / "new"
    base_dir.mkdir()
    new_dir.mkdir()
    pages, _ = generate_pages(80, seed=4)
    pq.write_table(pages, str(base_dir / "pages.parquet"))

    base_texts = pages["text"].to_pylist()
    long_base = next(t for t in base_texts if t and len(t.split()) > 60)
    fresh = " ".join(f"fresh{i}" for i in range(120))
    ts = pages["warc_ts"][0]
    new_rows = pa.table(
        {
            "url": pa.array(
                ["shard/rewrite", "shard/a-fresh", "shard/b-fresh-copy"],
                pa.string(),
            ),
            "warc_ts": pa.array([ts.as_py()] * 3, pa.timestamp("us")),
            "html": pa.array([None] * 3, pa.binary()),
            "text": pa.array(
                [long_base + " light rewrite", fresh, fresh + " tail"],
                pa.string(),
            ),
            "lang": pa.array(["en"] * 3, pa.string()),
        }
    )
    pq.write_table(new_rows, str(new_dir / "pages.parquet"))
    out = tmp_path / "out"

    proc = subprocess.run(
        [
            sys.executable, "-m", "dedup_ray",
            "--input", str(new_dir),
            "--out", str(out),
            "--incremental-base", str(base_dir),
            "--cpus", "4",
        ],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    s = json.loads(proc.stdout)
    assert s["mode"] == "incremental"
    assert s["n_new_pages"] == 3
    assert s["verdicts"] == {"new": 1, "dup_of_base": 1, "dup_in_batch": 1}
    vt = pq.read_table(s["output"])
    got = dict(zip(vt["url"].to_pylist(), vt["verdict"].to_pylist()))
    assert got == {
        "shard/rewrite": "dup_of_base",
        "shard/a-fresh": "new",
        "shard/b-fresh-copy": "dup_in_batch",
    }


@pytest.mark.slow
def test_cli_incremental_from_flagship_checkpoint(ray_session, tmp_path):
    """Production recipe: a flagship run's signatures/data checkpoint
    (minhash_bin encoding) + a band checkpoint feed the incremental
    CLI directly — the base corpus is never re-shingled or re-banded."""
    import pyarrow as pa

    base_dir = tmp_path / "base"
    new_dir = tmp_path / "new"
    base_dir.mkdir()
    new_dir.mkdir()
    pages, _ = generate_pages(80, seed=4)
    pq.write_table(pages, str(base_dir / "pages.parquet"))

    base_out = tmp_path / "base_run"
    proc = subprocess.run(
        [
            sys.executable, "-m", "dedup_ray",
            "--input", str(base_dir),
            "--out", str(base_out),
            "--cpus", "4",
            "--no-substring",
        ],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    sig_data = base_out / "signatures" / "data"
    assert sig_data.is_dir()

    # band checkpoint from the flagship's binary-encoded signatures
    # (uses the pytest session's Ray — library code owns no session)
    import ray.data

    from dedup_ray.config import DedupConfig
    from dedup_ray.pipelines.incremental import write_band_checkpoint

    band_dir = tmp_path / "band_ckpt"
    write_band_checkpoint(
        ray.data.read_parquet(str(sig_data)), DedupConfig(), str(band_dir),
        num_partitions=8,
    )

    base_texts = pages["text"].to_pylist()
    long_base = next(t for t in base_texts if t and len(t.split()) > 60)
    fresh = " ".join(f"fresh{i}" for i in range(120))
    ts = pages["warc_ts"][0]
    new_rows = pa.table(
        {
            "url": pa.array(
                ["shard/rewrite", "shard/a-fresh", "shard/b-fresh-copy"],
                pa.string(),
            ),
            "warc_ts": pa.array([ts.as_py()] * 3, pa.timestamp("us")),
            "html": pa.array([None] * 3, pa.binary()),
            "text": pa.array(
                [long_base + " light rewrite", fresh, fresh + " tail"],
                pa.string(),
            ),
            "lang": pa.array(["en"] * 3, pa.string()),
        }
    )
    pq.write_table(new_rows, str(new_dir / "pages.parquet"))
    out = tmp_path / "out"

    proc = subprocess.run(
        [
            sys.executable, "-m", "dedup_ray",
            "--input", str(new_dir),
            "--out", str(out),
            "--incremental-base-signatures", str(sig_data),
            "--incremental-base-bands", str(band_dir),
            "--cpus", "4",
        ],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    s = json.loads(proc.stdout)
    assert s["verdicts"] == {"new": 1, "dup_of_base": 1, "dup_in_batch": 1}
    vt = pq.read_table(s["output"])
    got = dict(zip(vt["url"].to_pylist(), vt["verdict"].to_pylist()))
    assert got == {
        "shard/rewrite": "dup_of_base",
        "shard/a-fresh": "new",
        "shard/b-fresh-copy": "dup_in_batch",
    }
