"""Output must be bit-identical across session CPU counts.

The engine's determinism rules (no builtin hash, no wall-clock,
deterministic split-group derivation in core.partitioned_kernel) exist
precisely so parallelism never changes results — the IVF codebook
order-dependence bug (fixed round 3) is the class of defect this
pins.  Runs the flagship in two FRESH subprocesses at different
num_cpus and compares sha256 of the sorted output.
"""

import hashlib
import subprocess
import sys

import pytest

_CHILD = r"""
import sys, hashlib
sys.path.insert(0, "/root/repo")
import ray, ray.data
ray.init(address="local", num_cpus=int(sys.argv[1]),
         include_dashboard=False, logging_level="ERROR")
ray.data.DataContext.get_current().enable_progress_bars = False
import __ray_entry__ as m
df = m.queries()[sys.argv[2]]("/root/testdata/sf0.001").to_pandas()
df = df[sorted(df.columns)].sort_values(by=sorted(df.columns), ignore_index=True)
print(hashlib.sha256(df.to_csv(index=False).encode()).hexdigest())
ray.shutdown()
"""


def _hash_at(ncpu: int, query: str) -> str:
    proc = subprocess.run(
        [sys.executable, "-c", _CHILD, str(ncpu), query],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return proc.stdout.strip().splitlines()[-1]


@pytest.mark.slow
def test_flagship_bit_identical_across_cpu_counts():
    hashes = {ncpu: _hash_at(ncpu, "dedup_full") for ncpu in (3, 9)}
    assert hashes[3] == hashes[9], f"CPU-count-dependent output: {hashes}"


@pytest.mark.slow
def test_incremental_minhash_bit_identical_across_cpu_counts():
    """The incremental near-dup pipeline stacks four exchanges (bands,
    pair dedupe, verify, verdict merge) — each kernel must be
    partition-placement-invariant."""
    hashes = {ncpu: _hash_at(ncpu, "incremental_minhash_dedup") for ncpu in (3, 9)}
    assert hashes[3] == hashes[9], f"CPU-count-dependent output: {hashes}"
