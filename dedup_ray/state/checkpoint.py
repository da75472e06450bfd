"""Stage checkpointing, lineage and resume (SURVEY.md §2B B3/B16, §3.2
✓-boundaries; BASELINE.json:6,14 "resumes from checkpointed stage
outputs with per-partition lineage + counters").

Reference analog: ``HashDbObj`` (SURVEY.md §2A A5) — the (path, mtime)
digest cache that lets reruns skip rehashing.  The web-scale analog is
a Parquet directory per stage plus a ``manifest.json`` carrying:
  - the semantic config hash (DedupConfig.config_hash),
  - the chained input fingerprint (sha256 over parent manifests +
    source file identity), and
  - counters (rows, wall seconds, stage-specific logs such as the
    salted-bucket list — skew handling is never silent).

Resume rule: a stage whose manifest matches (stage name, config hash,
input fingerprint) is SKIPPED — its Parquet output is read back
instead of recomputed.  Writes are atomic (tmp dir + rename), so a
killed run leaves either a complete checkpoint or none.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from dataclasses import dataclass, field
from typing import Callable

import ray.data

from dedup_ray.config import DedupConfig

MANIFEST = "manifest.json"


def fingerprint_paths(paths: list[str] | str) -> str:
    """Source-data identity: path + size + mtime per file, walked
    RECURSIVELY — an in-place edit of a file in a nested subdirectory
    changes neither the parent's mtime nor its listing, so a top-level
    stat would silently resume checkpoints of changed input."""
    if isinstance(paths, str):
        paths = [paths]
    h = hashlib.sha256()
    for p in sorted(paths):
        if os.path.isdir(p):
            files = []
            for root, dirs, names in os.walk(p):
                dirs[:] = sorted(d for d in dirs if not d.startswith("."))
                files.extend(
                    os.path.join(root, f) for f in names if not f.startswith(".")
                )
            files.sort()
        else:
            files = [p]
        for f in files:
            st = os.stat(f)
            h.update(f"{f}:{st.st_size}:{st.st_mtime_ns}".encode())
    return h.hexdigest()[:16]


@dataclass
class StageResult:
    name: str
    skipped: bool
    rows: int
    wall_s: float
    fingerprint: str


@dataclass
class CheckpointedRun:
    """Orchestrates one pipeline run rooted at ``out_dir``."""

    out_dir: str
    cfg: DedupConfig
    report: dict[str, StageResult] = field(default_factory=dict)

    def _stage_dir(self, name: str) -> str:
        return os.path.join(self.out_dir, name)

    def _fingerprint(self, name: str, parents: list[str]) -> str:
        h = hashlib.sha256()
        h.update(self.cfg.config_hash().encode())
        h.update(name.encode())
        for p in parents:
            h.update(p.encode())
        return h.hexdigest()[:16]

    def run_stage(
        self,
        name: str,
        parent_fps: list[str],
        build: Callable[[], ray.data.Dataset],
        *,
        counters: dict | None = None,
    ) -> tuple[ray.data.Dataset, str]:
        """Execute-or-skip one stage; returns (Dataset read from the
        checkpoint, this stage's fingerprint)."""
        fp = self._fingerprint(name, parent_fps)
        sdir = self._stage_dir(name)
        mpath = os.path.join(sdir, MANIFEST)
        if os.path.exists(mpath):
            # tolerate a corrupt/truncated manifest (external damage —
            # the .tmp + os.replace protocol never renames a partial
            # one in): treat as absent and recompute the stage.
            # ValueError covers JSONDecodeError AND UnicodeDecodeError
            # (binary garbage); a non-object JSON payload is equally
            # not a manifest.
            try:
                with open(mpath) as f:
                    m = json.load(f)
            except (ValueError, OSError):
                m = {}
            if not isinstance(m, dict):
                m = {}
            if m.get("fingerprint") == fp and m.get("completed"):
                self.report[name] = StageResult(
                    name, True, m.get("rows", -1), 0.0, fp
                )
                return ray.data.read_parquet(os.path.join(sdir, "data")), fp

        t0 = time.perf_counter()
        ds = build()
        tmp = sdir + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(os.path.join(tmp, "data"), exist_ok=True)
        ds.write_parquet(os.path.join(tmp, "data"))
        rows = _parquet_rows(os.path.join(tmp, "data"))
        wall = time.perf_counter() - t0
        manifest = {
            "stage": name,
            "fingerprint": fp,
            "config_hash": self.cfg.config_hash(),
            "config": self.cfg.semantic_dict(),
            "parents": parent_fps,
            "rows": rows,
            "wall_s": round(wall, 3),
            "counters": counters or {},
            "completed": True,
        }
        with open(os.path.join(tmp, MANIFEST), "w") as f:
            json.dump(manifest, f, indent=1)
        shutil.rmtree(sdir, ignore_errors=True)
        os.replace(tmp, sdir)
        self.report[name] = StageResult(name, False, rows, wall, fp)
        return ray.data.read_parquet(os.path.join(sdir, "data")), fp


def _parquet_rows(d: str) -> int:
    import pyarrow.parquet as pq

    total = 0
    for root, _dirs, files in os.walk(d):
        for f in files:
            if f.endswith(".parquet"):
                total += pq.read_metadata(os.path.join(root, f)).num_rows
    return total
