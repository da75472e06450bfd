"""bench.py — headline benchmark runner.

Default mode: run the headline pipelines over ``$GRAFT_SF_DIR``
(default /root/testdata/sf0.1) under
``ray.init(address="local", num_cpus=$RAY_GRAFT_CPUS or 32)`` and print
ONE JSON line:
    {"metric": ..., "value": total_sec, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
     "pages_per_sec": ...}

``--scaling``: run the flagship dedup job twice in FRESH processes at
num_cpus=8 and num_cpus=32 over the same synthetic pages corpus
(generated once, cached under /tmp), print both throughputs plus
scaling efficiency = (t8/t32)/4, and append the result to
BENCH/BASELINE.md.  This is the sandbox protocol for the N->4N-node
criterion (BASELINE.md): same job, 4x parallelism spread, fresh Ray
session each, page cache warmed by generation/first read.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
#: large enough that per-stage compute dominates Ray's fixed
#: orchestration costs (~1 min of setup noise would otherwise swamp
#: the 8-vs-32 comparison)
SCALING_ROWS = int(os.environ.get("BENCH_PAGES_ROWS", "600000"))
SCALING_DIR = f"/tmp/bench_pages_{SCALING_ROWS}"


def _init_ray(num_cpus: int):
    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data

    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    return ray


def _consume(ds) -> int:
    """Stream-consume a Dataset without materializing on the driver."""
    n = 0
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=65536):
        n += len(b)
    return n


def run_default() -> None:
    ray = _init_ray(NUM_CPUS)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as entrymod

    headline = [
        "dedup_full",            # flagship: exact + minhash/LSH + substring + CC
        "exact_dedup",
        "grouped_agg_q1",
        "join_orders_customer",
        "sort_limit_orders",
        "events_hourly_window",
        "token_count",
        "quality_score",
        "embedding_cosine_topk",
        "embedding_ann_lsh",
    ]
    queries = entrymod.queries()
    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    total = 0.0
    for name in headline:
        t0 = time.perf_counter()
        rows[name] = _consume(queries[name](SF_DIR))
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        total += dt

    n_docs = rows.get("exact_dedup", 0)
    dedup_sec = timings.get("dedup_full", 1.0)
    out = {
        "metric": "headline pipelines wall time (sf documents + tpch tables)",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "pages_per_sec": round(n_docs / dedup_sec, 1) if dedup_sec else None,
    }
    ray.shutdown()
    print(json.dumps(out))


def run_scaling_child() -> None:
    """Fresh-process flagship run over the cached synthetic corpus."""
    ray = _init_ray(NUM_CPUS)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import ray.data

    from dedup_ray.config import DedupConfig
    from dedup_ray.pipelines.flagship import flagship_assignments_from_pages
    from dedup_ray.sources.pages import read_pages_parquet
    from dedup_ray.stages.extract import extract_text

    cfg = DedupConfig()
    pages = extract_text(read_pages_parquet(SCALING_DIR))
    t0 = time.perf_counter()
    assigns = flagship_assignments_from_pages(pages, cfg)
    n = _consume(assigns)
    dt = time.perf_counter() - t0
    ray.shutdown()
    print(json.dumps({"rows": n, "sec": round(dt, 3), "num_cpus": NUM_CPUS}))


def _ensure_corpus() -> None:
    if os.path.isdir(SCALING_DIR) and os.listdir(SCALING_DIR):
        return
    print(f"generating {SCALING_ROWS}-row pages corpus at {SCALING_DIR}...",
          file=sys.stderr)
    ray = _init_ray(NUM_CPUS)
    from dedup_ray.fixtures import write_pages_parquet_ray

    write_pages_parquet_ray(SCALING_ROWS, SCALING_DIR, seed=1234, max_tokens=400)
    ray.shutdown()


def run_scaling() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    _ensure_corpus()
    results = {}
    for ncpu in (8, 32):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), BENCH_MODE="scaling_child")
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        )
        results[ncpu] = json.loads(proc.stdout.strip().splitlines()[-1])
    t8, t32 = results[8]["sec"], results[32]["sec"]
    rows = results[32]["rows"]
    eff = (t8 / t32) / (32 / 8)
    out = {
        "metric": "flagship dedup scaling (8 vs 32 cpus, fresh processes)",
        "rows": rows,
        "sec_8": t8,
        "sec_32": t32,
        "pages_per_sec_8": round(rows / t8, 1),
        "pages_per_sec_32": round(rows / t32, 1),
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(out))
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "a") as f:
        f.write(
            f"\n## scaling run ({time.strftime('%Y-%m-%d %H:%M:%S')})\n\n"
            f"- corpus: {rows} synthetic pages ({SCALING_DIR})\n"
            f"- 8 cpus: {t8:.1f}s ({rows/t8:.0f} pages/s)\n"
            f"- 32 cpus: {t32:.1f}s ({rows/t32:.0f} pages/s)\n"
            f"- scaling efficiency (8->32): {eff:.3f}\n"
        )


if __name__ == "__main__":
    mode = os.environ.get("BENCH_MODE", "")
    if mode == "scaling_child":
        run_scaling_child()
    elif "--scaling" in sys.argv:
        run_scaling()
    else:
        run_default()
