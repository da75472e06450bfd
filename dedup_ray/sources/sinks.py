"""Sinks (SURVEY.md §2B B2/B3) — the reference's command-emission
analog: a partitioned Parquet verdict table instead of an ``rm``
script (the output is a REPORT; the engine never mutates inputs)."""

from __future__ import annotations

import json
import os
import shutil

import ray.data


def write_assignments_parquet(
    assignments: ray.data.Dataset,
    out_dir: str,
    *,
    partition_cols: list[str] | None = None,
    min_rows_per_file: int | None = 100_000,
) -> None:
    """Write the assignments verdict table partitioned by ``kind``
    (default) so consumers can read just the drop-list (kind !=
    unique, is_canonical == false) without scanning everything, and so
    a failed run can resume per partition directory.

    Writes to a ``.tmp`` sibling and renames into place (the
    checkpoint manifests' protocol): Ray names output files with a
    fresh per-run write_uuid, so writing straight into an existing
    directory would APPEND a full duplicate copy beside the previous
    run's files — a re-run with the same --out must overwrite, and a
    crash mid-write must never leave a mixed stale/new directory."""
    tmp_dir = out_dir.rstrip("/") + ".tmp"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    assignments.write_parquet(
        tmp_dir,
        partition_cols=partition_cols if partition_cols is not None else ["kind"],
        min_rows_per_file=min_rows_per_file,
    )
    # a zero-row dataset writes no files at all — the sink must still
    # yield an (empty) directory for consumers to read
    os.makedirs(tmp_dir, exist_ok=True)
    shutil.rmtree(out_dir, ignore_errors=True)
    os.rename(tmp_dir, out_dir)


def write_run_report(report: dict, out_dir: str) -> str:
    """Persist the per-stage StageResult report (rows, wall, skipped)
    next to the checkpoints — the run's lineage summary."""
    path = os.path.join(out_dir, "run_report.json")
    payload = {
        name: {
            "skipped": r.skipped,
            "rows": r.rows,
            "wall_s": round(r.wall_s, 3),
            "fingerprint": r.fingerprint,
        }
        for name, r in report.items()
    }
    with open(path, "w") as f:
        json.dump(payload, f, indent=1)
    return path
