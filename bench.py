"""bench.py — headline benchmark runner.

Default mode: run the headline pipelines over ``$GRAFT_SF_DIR``
(default /root/testdata/sf0.1) under
``ray.init(address="local", num_cpus=$RAY_GRAFT_CPUS or 32)`` and print
ONE JSON line:
    {"metric": ..., "value": total_sec, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
     "pages_per_sec": ...}

``--scaling``: run the flagship dedup job at num_cpus = 2, 8 and 32
in FRESH processes over the same synthetic pages corpus (generated
once, cached under /tmp), interleaved median-of-3 per level, print
throughputs plus both 4x-spread efficiencies (2->8 and 8->32), and
append the result to BENCH/BASELINE.md.  This is the sandbox protocol
for the N->4N-node criterion (BASELINE.md): same job, 4x parallelism
spread, fresh Ray session each, page cache warmed by generation.
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
#: the 8-vs-32 comparison), small enough that the 5-repeat interleaved
#: protocol fits a session: at 1600 tokens/page the 2-cpu flagship runs
#: ~11 min over 600k pages (~23 min over the earlier 1.2M default, which
#: made 5 repeats a >3 h job without changing any ratio).
SCALING_ROWS = int(os.environ.get("BENCH_PAGES_ROWS", "600000"))
#: ~1600 tokens/page matches real Common-Crawl text length; the short
#: 400-token corpus under-weights per-page compute vs exchange bytes
SCALING_TOKENS = int(os.environ.get("BENCH_PAGES_TOKENS", "1600"))
SCALING_DIR = f"/tmp/bench_pages_{SCALING_ROWS}_t{SCALING_TOKENS}"


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
        "embedding_ivf_topk",
        "embedding_dedup",
    ]
    queries = entrymod.queries()
    # untimed warm-up: spawn the worker pool + import the library in
    # every worker once, so the first timed query measures the pipeline
    # rather than ~9 s of process cold-start (same treatment for every
    # query; recorded timings are all warm-pool)
    _consume(queries["exact_dedup"](SF_DIR))
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
    # untimed warm-up: spawn the worker pool + per-worker imports once.
    # A long-running cluster job amortizes process start; timing it
    # would charge the 32-cpu level ~16x the spawn cost of the 2-cpu
    # level and corrupt the efficiency ratio.
    _consume(read_pages_parquet(SCALING_DIR).map_batches(
        lambda t: t.select(["url"]).slice(0, 1), batch_format="pyarrow"
    ))
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

    write_pages_parquet_ray(
        SCALING_ROWS, SCALING_DIR, seed=1234, max_tokens=SCALING_TOKENS
    )
    ray.shutdown()


SCALING_LEVELS = (2, 8, 32)
SCALING_REPEATS = int(os.environ.get("BENCH_REPEATS", "5"))


def run_scaling() -> None:
    """Measure the flagship at 2, 8 and 32 CPUs (fresh process per run,
    levels interleaved within each repeat so host noise — measured at
    +/-50% on this sandbox — hits all levels alike; median + IQR of N
    repeats reported).  The N->4N criterion is evidenced by BOTH
    spreads: 2->8 captures the CPU-bound regime (the honest proxy for
    adding nodes, since each added node brings its own memory bus and
    object store); 8->32 exposes the single-box limit where the SHARED
    plasma store / memory bandwidth saturates — a resource a real
    multi-node cluster scales with node count."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    _ensure_corpus()
    import statistics

    samples: dict[int, list[float]] = {n: [] for n in SCALING_LEVELS}
    rows = 0
    for rep in range(SCALING_REPEATS):
        for ncpu in SCALING_LEVELS:  # interleave levels so host noise
            # affects all levels alike within a repeat
            env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), BENCH_MODE="scaling_child")
            # HARD-PIN the whole child process tree (driver + raylet +
            # workers inherit the affinity mask) to exactly N cores:
            # this is the honest emulation of an N-core node.  An
            # unpinned ray.init(num_cpus=2) session leaks WAY past its
            # budget — arrow/parquet threads, the raylet and the driver
            # all run on extra host cores (measured: unpinned "2-cpu"
            # flagship beat the 8-cpu one; pinned, the same job is
            # 4.4x slower at 2 cores than 8) — which silently deflates
            # the measured N->4N ratio.
            cores = f"0-{ncpu - 1}" if ncpu > 1 else "0"
            proc = subprocess.run(
                ["taskset", "-c", cores, sys.executable, os.path.abspath(__file__)],
                env=env,
                capture_output=True,
                text=True,
                check=True,
            )
            r = json.loads(proc.stdout.strip().splitlines()[-1])
            rows = r["rows"]
            samples[ncpu].append(r["sec"])
            print(
                json.dumps({"rep": rep, "num_cpus": ncpu, "sec": r["sec"]}),
                file=sys.stderr,
            )

    def iqr(v):
        q = statistics.quantiles(v, n=4) if len(v) >= 2 else [v[0]] * 3
        return q[0], q[2]

    med = {n: statistics.median(v) for n, v in samples.items()}
    eff_2_8 = (med[2] / med[8]) / 4
    eff_8_32 = (med[8] / med[32]) / 4
    # PAIRED estimator: levels are interleaved within a repeat, so the
    # per-repeat ratio cancels slow host-noise drifts that the ratio of
    # medians cannot; report the median paired ratio alongside.
    paired_2_8 = statistics.median(
        [a / b / 4 for a, b in zip(samples[2], samples[8])]
    )
    paired_8_32 = statistics.median(
        [a / b / 4 for a, b in zip(samples[8], samples[32])]
    )
    out = {
        "metric": f"flagship dedup scaling (fresh processes, median of {SCALING_REPEATS})",
        "samples_sec": {str(n): [round(x, 1) for x in samples[n]] for n in SCALING_LEVELS},
        "rows": rows,
        "sec": {str(n): round(med[n], 1) for n in SCALING_LEVELS},
        "iqr_sec": {str(n): [round(x, 1) for x in iqr(samples[n])] for n in SCALING_LEVELS},
        "pages_per_sec": {str(n): round(rows / med[n], 1) for n in SCALING_LEVELS},
        "scaling_efficiency_2_to_8": round(eff_2_8, 3),
        "scaling_efficiency_8_to_32": round(eff_8_32, 3),
        "paired_efficiency_2_to_8": round(paired_2_8, 3),
        "paired_efficiency_8_to_32": round(paired_8_32, 3),
    }
    print(json.dumps(out))
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "a") as f:
        f.write(
            f"\n## scaling run ({time.strftime('%Y-%m-%d %H:%M:%S')})\n\n"
            f"- corpus: {rows} synthetic pages ({SCALING_DIR}); median of "
            f"{SCALING_REPEATS} interleaved fresh-process runs per level\n"
            + "".join(
                f"- {n} cpus: median {med[n]:.1f}s (IQR {iqr(samples[n])[0]:.1f}-"
                f"{iqr(samples[n])[1]:.1f}s, {rows/med[n]:.0f} pages/s; samples "
                f"{[round(x,1) for x in samples[n]]})\n"
                for n in SCALING_LEVELS
            )
            + f"- scaling efficiency 2->8 (N->4N, CPU-bound regime): {eff_2_8:.3f} "
            f"(median of paired per-repeat ratios: {paired_2_8:.3f})\n"
            f"- scaling efficiency 8->32 (single-box object-store/bandwidth limit): "
            f"{eff_8_32:.3f} (paired: {paired_8_32:.3f})\n"
        )


if __name__ == "__main__":
    mode = os.environ.get("BENCH_MODE", "")
    if mode == "scaling_child":
        run_scaling_child()
    elif "--scaling" in sys.argv:
        run_scaling()
    else:
        run_default()
