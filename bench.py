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
        "word_topk",             # skewed-vocab aggregate (map-side combine)
        "tpch_q5_region_revenue",  # 6-table join: 2 broadcasts + 1 exchange
        "quality_filter_verdicts",  # C4-style keep/drop filter chain
        "part_revenue_by_brand",   # product-dimension join (gated broadcast)
        "events_daily_top_type",   # grouped argmax via one day-keyed exchange
    ]
    queries = entrymod.queries()
    # untimed warm-up: spawn the worker pool + import the library in
    # every worker once, so the first timed query measures the pipeline
    # rather than ~9 s of process cold-start (same treatment for every
    # query; recorded timings are all warm-pool)
    _consume(queries["exact_dedup"](SF_DIR))
    # per-query MIN over two passes: this host shares its hypervisor
    # with co-tenants and identical runs minutes apart differ 2-3x, so
    # a single sample mostly measures the neighbor; the min is the
    # closest observable to the engine's true cost.
    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    for _pass in range(2):
        for name in headline:
            t0 = time.perf_counter()
            rows[name] = _consume(queries[name](SF_DIR))
            dt = time.perf_counter() - t0
            timings[name] = round(min(dt, timings.get(name, dt)), 3)
    total = sum(timings.values())

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
    """Fresh-process flagship run over the cached synthetic corpus.
    ``$BENCH_RUNS`` > 1 repeats the timed job back-to-back in the same
    session (used by the concurrent-pair protocol so the short level's
    timed window spans the long level's)."""
    ray = _init_ray(NUM_CPUS)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import ray.data

    from dedup_ray.config import DedupConfig
    from dedup_ray.pipelines.flagship import flagship_assignments_from_pages
    from dedup_ray.sources.pages import read_pages_parquet
    from dedup_ray.stages.extract import extract_text

    cfg = DedupConfig()
    # untimed warm-up: run the REAL pipeline over a small slice so every
    # worker process faults in its working set (numpy temporaries, the
    # plasma arena) before timing starts.  A long-running cluster job
    # amortizes this; timing it would charge each level its worker-count
    # multiple of the cost and corrupt the efficiency ratio.  It matters
    # a lot on this sandbox: the hypervisor charges ~200us per
    # first-touch page fault (measured: writing a fresh 16MB numpy
    # buffer costs ~1s once, then ~5ms), so a fresh worker pays ~9s
    # faulting its workspace on its first real batch.
    warm = extract_text(read_pages_parquet(SCALING_DIR).limit(30000))
    _consume(flagship_assignments_from_pages(warm, cfg))
    runs = int(os.environ.get("BENCH_RUNS", "1"))
    secs = []
    n = 0
    for _ in range(runs):
        pages = extract_text(read_pages_parquet(SCALING_DIR))
        t0 = time.perf_counter()
        assigns = flagship_assignments_from_pages(pages, cfg)
        n = _consume(assigns)
        secs.append(round(time.perf_counter() - t0, 3))
    ray.shutdown()
    print(json.dumps({"rows": n, "secs": secs, "num_cpus": NUM_CPUS}))


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


SCALING_REPEATS = int(os.environ.get("BENCH_REPEATS", "5"))


def _spawn_child(ncpu: int, cores: str, runs: int) -> subprocess.Popen:
    """Launch one pinned fresh-process flagship child.

    HARD-PIN the whole child process tree (driver + raylet + workers
    inherit the affinity mask) to exactly the given cores: this is the
    honest emulation of an N-core node.  An unpinned
    ray.init(num_cpus=2) session leaks WAY past its budget — arrow /
    parquet threads, the raylet and the driver all run on extra host
    cores (measured: an unpinned "2-cpu" flagship beat the 8-cpu one;
    pinned, the same job is ~4x slower at 2 cores than 8) — which
    silently deflates the measured N->4N ratio."""
    env = dict(
        os.environ,
        RAY_GRAFT_CPUS=str(ncpu),
        BENCH_MODE="scaling_child",
        BENCH_RUNS=str(runs),
    )
    errlog = open(f"/tmp/bench_child_{ncpu}cpu.err", "w")
    proc = subprocess.Popen(
        ["taskset", "-c", cores, sys.executable, os.path.abspath(__file__)],
        env=env,
        stdout=subprocess.PIPE,
        stderr=errlog,
        text=True,
    )
    proc._errlog_path = errlog.name  # type: ignore[attr-defined]
    return proc


def _child_result(proc: subprocess.Popen) -> dict:
    out, _ = proc.communicate()
    if proc.returncode != 0:
        path = getattr(proc, "_errlog_path", "?")
        tail = ""
        try:
            with open(path) as f:
                tail = "".join(f.readlines()[-15:])
        except OSError:
            pass
        raise RuntimeError(
            f"scaling child failed rc={proc.returncode} (stderr: {path})\n{tail}"
        )
    return json.loads(out.strip().splitlines()[-1])


def run_scaling() -> None:
    """N->4N scaling evidence: the flagship at 2 pinned cores vs 8
    pinned cores, both children running SIMULTANEOUSLY on disjoint core
    sets (2-core on cores 0-1, 8-core on cores 8-15).

    Why concurrent: this sandbox is a shared VM with 2-3x time-varying
    interference from co-tenants (identical runs minutes apart differ
    2x), so time-separated levels are incomparable — but two jobs
    running at the same instant see the same ambient interference,
    which cancels in the per-repeat ratio.  The 8-core child repeats
    its timed job back-to-back so its timed window spans the 2-core
    child's single long run; its per-rep time is the median of those
    runs.  22 of 32 host cores stay idle as a buffer against
    self-contention between the two children.

    8->32 is measured separately (time-interleaved, pinned, alone on
    the box): it exposes the single-box limit where the SHARED memory
    bandwidth / object store saturate — resources a real multi-node
    cluster scales with node count (each added node brings its own)."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    _ensure_corpus()
    import statistics

    # STEADY-STATE timing: each child's first full-corpus run is a
    # discarded warm-up.  The hypervisor charges ~200us per first-touch
    # page fault, so the first run through a fresh plasma arena pays a
    # large one-off tax (measured at 8 cores: 95s first run, 38s every
    # run after) that a long-running 10^12-doc job amortizes to zero —
    # the steady-state number is the honest basis for the N->4N ratio.
    # TWO estimators per repeat (emitted side by side so future runs
    # stay comparable to every recorded BASELINE.md entry):
    #   cold-inclusive: first full run of each child (includes the
    #     hypervisor first-touch page-fault tax) — the conservative
    #     number, and the one the r02 "criterion MET" headline used;
    #   steady-state: 2-core child's second run vs median of the
    #     8-core child's runs 2..N — the long-running-job number.
    #     Steady-state can exceed 1.0 here because the 2-core child's
    #     single steady run retains relatively more warm state (page
    #     tables, plasma arena) than the 8-core median over 7 runs
    #     whose arena keeps growing; treat >1.0 as "saturated", not as
    #     superlinear hardware.
    t2s: list[float] = []
    t8s: list[float] = []
    effs: list[float] = []
    effs_cold: list[float] = []
    rows = 0
    for rep in range(SCALING_REPEATS):
        p2 = _spawn_child(2, "0-1", runs=2)
        p8 = _spawn_child(8, "8-15", runs=8)
        r2, r8 = _child_result(p2), _child_result(p8)
        rows = r2["rows"]
        t2 = r2["secs"][-1]
        t8 = statistics.median(r8["secs"][1:])
        t2s.append(t2)
        t8s.append(t8)
        effs.append((t2 / t8) / 4)
        effs_cold.append((r2["secs"][0] / r8["secs"][0]) / 4)
        print(
            json.dumps(
                {
                    "rep": rep,
                    "t2_runs": r2["secs"],
                    "t8_runs": r8["secs"],
                    "eff_steady": round(effs[-1], 3),
                    "eff_cold": round(effs_cold[-1], 3),
                }
            ),
            file=sys.stderr,
        )

    # saturation datapoints: 8 vs 32 cores, alone on the box, interleaved
    sat: dict[int, list[float]] = {8: [], 32: []}
    for _ in range(2):
        for ncpu, cores in ((8, "0-7"), (32, "0-31")):
            r = _child_result(_spawn_child(ncpu, cores, runs=2))
            sat[ncpu].append(r["secs"][-1])

    def iqr(v):
        q = statistics.quantiles(v, n=4) if len(v) >= 2 else [v[0]] * 3
        return q[0], q[2]

    med2, med8 = statistics.median(t2s), statistics.median(t8s)
    eff_med = statistics.median(effs)
    eff_cold_med = statistics.median(effs_cold)
    sat8, sat32 = statistics.median(sat[8]), statistics.median(sat[32])
    eff_8_32 = (sat8 / sat32) / 4
    out = {
        "metric": (
            f"flagship dedup scaling (concurrent pinned 2-core vs 8-core pairs, "
            f"median of {SCALING_REPEATS})"
        ),
        "rows": rows,
        "t2_samples": t2s,
        "t8_samples": t8s,
        "sec": {"2": round(med2, 1), "8": round(med8, 1)},
        "pages_per_sec": {"2": round(rows / med2, 1), "8": round(rows / med8, 1)},
        "per_rep_efficiency_2_to_8_steady": [round(e, 3) for e in effs],
        "per_rep_efficiency_2_to_8_cold": [round(e, 3) for e in effs_cold],
        "scaling_efficiency_2_to_8_steady": round(eff_med, 3),
        "scaling_efficiency_2_to_8_cold": round(eff_cold_med, 3),
        "sat_8_samples": sat[8],
        "sat_32_samples": sat[32],
        "scaling_efficiency_8_to_32": round(eff_8_32, 3),
    }
    print(json.dumps(out))
    os.makedirs("BENCH", exist_ok=True)
    lo, hi = iqr(effs)
    lo_c, hi_c = iqr(effs_cold)
    with open("BENCH/BASELINE.md", "a") as f:
        f.write(
            f"\n## scaling run ({time.strftime('%Y-%m-%d %H:%M:%S')})\n\n"
            f"- corpus: {rows} synthetic pages ({SCALING_DIR}); protocol:\n"
            f"  2-core and 8-core children PINNED (taskset, whole process\n"
            f"  tree) to disjoint core sets and run CONCURRENTLY so the\n"
            f"  shared-VM interference (2-3x, time-varying) hits both\n"
            f"  levels at the same instant and cancels in the ratio;\n"
            f"  {SCALING_REPEATS} repeats; BOTH estimators reported:\n"
            f"  cold-inclusive (first full run of each child, includes the\n"
            f"  hypervisor's ~200us first-touch page-fault tax) and\n"
            f"  steady-state (2-core second run vs 8-core median of runs\n"
            f"  2..8 — the long-running-job number; can exceed 1.0 when\n"
            f"  warm-state retention favors the single steady 2-core run)\n"
            f"- 2 cores: median steady {med2:.1f}s ({rows/med2:.0f} pages/s; "
            f"samples {[round(x,1) for x in t2s]})\n"
            f"- 8 cores: median steady {med8:.1f}s ({rows/med8:.0f} pages/s; "
            f"samples {[round(x,1) for x in t8s]})\n"
            f"- per-repeat efficiency 2->8 cold-inclusive: "
            f"{[round(e,3) for e in effs_cold]}\n"
            f"- per-repeat efficiency 2->8 steady-state: "
            f"{[round(e,3) for e in effs]}\n"
            f"- **scaling efficiency 2->8 (N->4N): cold-inclusive median "
            f"{eff_cold_med:.3f} (IQR {lo_c:.3f}-{hi_c:.3f}); steady-state "
            f"median {eff_med:.3f} (IQR {lo:.3f}-{hi:.3f})**\n"
            f"- 8->32 (pinned, alone, interleaved): 8-core {sat8:.1f}s vs 32-core "
            f"{sat32:.1f}s -> {eff_8_32:.3f} (single-box memory-bandwidth/object-"
            f"store saturation; a real N->4N-node cluster scales these per node)\n"
        )


if __name__ == "__main__":
    mode = os.environ.get("BENCH_MODE", "")
    if mode == "scaling_child":
        run_scaling_child()
    elif "--scaling" in sys.argv:
        run_scaling()
    else:
        run_default()
