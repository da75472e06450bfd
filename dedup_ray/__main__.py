"""CLI entry point — the reference tool's main path (SURVEY.md §2A
A12/A10) re-expressed: analyze a pages Parquet directory, emit a
verdict table + summary statistics.  Like the reference, this is a
REPORT-ONLY tool: it never mutates its input.

    python -m dedup_ray --input /data/pages --out /tmp/run1 \
        [--no-substring] [--tau 0.8] [--seed N] [--cpus 32]

Owns the Ray session (the only places allowed to: CLI, bench.py,
pytest fixture — never library code).
"""

from __future__ import annotations

import argparse
import json
import sys


def ray_init_kwargs(cpus: int | None = None) -> dict:
    """ray.init kwargs for the CLI's session, honoring ``$RAY_ADDRESS``.

    Under ``ray job submit`` the job runtime exports RAY_ADDRESS with
    the cluster address; attaching to it (rather than forcing a fresh
    local instance) is what makes the SAME command line work on a
    multi-node cluster (DEPLOY.md §1).  An existing cluster rejects
    per-driver resource overrides, so ``--cpus`` only applies to a
    locally-owned session.  Unset or "local" keeps the previous
    behavior: a private local instance sized by ``--cpus``.
    """
    import os

    addr = os.environ.get("RAY_ADDRESS", "local") or "local"
    if addr == "local":
        return {
            "address": "local",
            "num_cpus": cpus,
            "include_dashboard": False,
            "logging_level": "ERROR",
        }
    return {"address": addr, "logging_level": "ERROR"}


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="dedup_ray",
        description="Ray-Data-native near-duplicate detection over Parquet pages",
    )
    p.add_argument("--input", required=True, help="pages Parquet file/dir")
    p.add_argument("--out", required=True, help="output/checkpoint directory")
    p.add_argument("--tau", type=float, default=0.8, help="Jaccard threshold")
    p.add_argument("--seed", type=int, default=None, help="hash seed override")
    p.add_argument("--no-substring", action="store_true", help="skip substring pass")
    p.add_argument("--cpus", type=int, default=None, help="ray num_cpus")
    p.add_argument(
        "--priority-col",
        default=None,
        help="optional pages column used as keep-priority (lower wins)",
    )
    p.add_argument(
        "--input-format",
        choices=("parquet", "jsonl", "csv"),
        default="parquet",
        help="pages input format (jsonl/csv are normalized to the "
        "canonical pages schema at the read; parquet is the "
        "production path — it alone supports column pruning)",
    )
    p.add_argument(
        "--dedupe-recrawls",
        action="store_true",
        help="collapse duplicate urls (recrawls) to one row per url "
        "before hashing: latest warc_ts wins, deterministic tie-break. "
        "url is the engine's identity key, so inputs with recrawls "
        "need this (semantic: flipping it invalidates checkpoints)",
    )
    p.add_argument(
        "--incremental-base",
        default=None,
        metavar="PATH",
        help="incremental mode: treat --input as a NEW crawl shard and "
        "near-dedup it against the already-ingested base corpus at "
        "PATH (same format as --input).  Emits per-new-page verdicts "
        "(new / dup_of_base / dup_in_batch, cluster semantics) under "
        "OUT/incremental_verdicts instead of running the flagship — "
        "base x base pairs are never generated (the corpus is not "
        "re-deduped).  Report-only, like every mode",
    )
    p.add_argument(
        "--incremental-base-signatures",
        default=None,
        metavar="PATH",
        help="incremental mode, production base side: a signature "
        "table Parquet dir (e.g. the flagship checkpoint's "
        "signatures/data — minhash_bin accepted) built under the SAME "
        "shingle/signature config; the base corpus is never "
        "re-shingled.  Mutually exclusive with --incremental-base",
    )
    p.add_argument(
        "--incremental-base-bands",
        default=None,
        metavar="PATH",
        help="incremental mode: a band checkpoint dir written by "
        "pipelines.incremental.write_band_checkpoint — only the new "
        "shard's band rows move through the candidate exchange.  "
        "Requires --incremental-base-signatures",
    )
    p.add_argument(
        "--on-bad-lines",
        choices=("error", "skip"),
        default="error",
        help="jsonl/csv only: 'error' fails loudly on a malformed "
        "line; 'skip' drops + counts them (warning per batch) so one "
        "torn line can't kill a large ingest",
    )
    args = p.parse_args(argv)
    if args.input_format != "parquet" and args.priority_col not in (None, "priority"):
        p.error(
            "--priority-col with jsonl/csv input requires the column to "
            "be named 'priority' (the normalizer keeps only canonical "
            "pages columns)"
        )

    import os

    if not os.path.exists(args.input):
        p.error(f"--input path does not exist: {args.input}")

    import ray

    if not ray.is_initialized():
        ray.init(**ray_init_kwargs(args.cpus))
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from dedup_ray.config import DedupConfig
    from dedup_ray.pipelines.flagship import run_flagship_checkpointed
    from dedup_ray.sources.sinks import write_assignments_parquet, write_run_report
    from dedup_ray.stages.exact import dup_stats

    kw = {"jaccard_tau": args.tau, "priority_col": args.priority_col or None}
    if args.dedupe_recrawls:
        kw["dedupe_recrawls"] = True
    if args.seed is not None:
        kw["seed"] = args.seed
    # priority_col is a SEMANTIC config field: it participates in
    # config_hash, so resuming an --out dir after changing it re-runs
    # the winner-dependent stages instead of silently reusing them
    cfg = DedupConfig(**kw)

    pages_loader = None
    if cfg.priority_col or args.input_format != "parquet":
        import pyarrow as pa
        import pyarrow.compute as pc

        from dedup_ray.sources.pages import (
            PAGES_COLUMNS,
            read_pages_csv,
            read_pages_jsonl,
            read_pages_parquet,
        )
        from dedup_ray.stages.extract import extract_text

        prio_col = cfg.priority_col
        fmt = args.input_format

        bad_lines = args.on_bad_lines

        def pages_loader(path):  # noqa: F811 — intentional closure
            if fmt == "jsonl":
                ds = read_pages_jsonl(path, on_bad_lines=bad_lines)
            elif fmt == "csv":
                ds = read_pages_csv(path, on_bad_lines=bad_lines)
            else:
                cols = list(
                    dict.fromkeys(PAGES_COLUMNS + ([prio_col] if prio_col else []))
                )
                ds = read_pages_parquet(path, columns=cols)
            ds = extract_text(ds)
            # jsonl/csv normalization already yields an int64 priority
            if not prio_col or fmt != "parquet":
                return ds

            def set_priority(t: pa.Table) -> pa.Table:
                # null user-priority competes at the default 0 (a null
                # would NaN-degrade the winner kernel's lexsort)
                prio = pc.fill_null(pc.cast(t[prio_col], pa.int64()), 0)
                if "priority" in t.column_names:
                    t = t.drop_columns(["priority"])
                return t.append_column("priority", prio)

            return ds.map_batches(
                set_priority, batch_format="pyarrow", zero_copy_batch=True
            )

    if args.incremental_base and args.incremental_base_signatures:
        p.error(
            "--incremental-base and --incremental-base-signatures are "
            "mutually exclusive (pages vs checkpointed-signatures base)"
        )
    if args.incremental_base_bands and not args.incremental_base_signatures:
        p.error("--incremental-base-bands requires --incremental-base-signatures")
    if args.incremental_base or args.incremental_base_signatures:
        for flag, path in (
            ("--incremental-base", args.incremental_base),
            ("--incremental-base-signatures", args.incremental_base_signatures),
            ("--incremental-base-bands", args.incremental_base_bands),
        ):
            if path and not os.path.exists(path):
                p.error(f"{flag} path does not exist: {path}")
        from dedup_ray.pipelines.incremental import incremental_neardup
        from dedup_ray.sources.pages import read_pages_parquet
        from dedup_ray.stages.extract import extract_text

        def _load(path):
            if pages_loader is not None:
                return pages_loader(path)
            return extract_text(read_pages_parquet(path))

        if args.incremental_base_signatures:
            verdicts = incremental_neardup(
                None,
                _load(args.input),
                cfg,
                base_signatures=ray.data.read_parquet(
                    args.incremental_base_signatures
                ),
                base_bands=args.incremental_base_bands,
            )
        else:
            verdicts = incremental_neardup(
                _load(args.incremental_base), _load(args.input), cfg
            )
        out_dir = f"{args.out}/incremental_verdicts"
        os.makedirs(args.out, exist_ok=True)
        write_assignments_parquet(verdicts, out_dir, partition_cols=["verdict"])
        # per-verdict counts from the written footers (metadata-only;
        # the verdict table itself is never collected on the driver)
        import pyarrow.parquet as pq

        counts: dict[str, int] = {}
        for root, _dirs, files in os.walk(out_dir):
            part = os.path.basename(root)
            if not part.startswith("verdict="):
                continue
            v = part.split("=", 1)[1]
            counts[v] = counts.get(v, 0) + sum(
                pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
                for f in files
                if f.endswith(".parquet")
            )
        summary = {
            "mode": "incremental",
            "config_hash": cfg.config_hash(),
            "base": args.incremental_base or args.incremental_base_signatures,
            "n_new_pages": sum(counts.values()),
            "verdicts": {
                k: counts.get(k, 0) for k in ("new", "dup_of_base", "dup_in_batch")
            },
            "output": out_dir,
        }
        print(json.dumps(summary, indent=1))
        ray.shutdown()
        return 0

    assignments, report = run_flagship_checkpointed(
        args.input,
        args.out,
        cfg,
        substring_pass=not args.no_substring,
        pages_loader=pages_loader,
        # a custom priority column invalidates the min-url == canonical
        # shortcut for MERGED near-dup clusters; derived from cfg
        uniform_priority=None,
    )
    write_assignments_parquet(assignments, f"{args.out}/assignments_by_kind")
    report_path = write_run_report(report, args.out)

    # summary statistics — the reference's stdout report (A11);
    # n_distinct_hashes == canonical-row count == cluster count here.
    # A zero-row corpus yields an EMPTY stats table (no partials reach
    # the global aggregate): report zeros instead of crashing.
    stats_df = dup_stats(assignments).to_pandas()
    if len(stats_df):
        stats = stats_df.iloc[0].to_dict()
    else:
        stats = {
            "n_pages": 0,
            "n_distinct_hashes": 0,
            "n_dup_pages": 0,
            "reclaimable_chars": 0,
        }
    summary = {
        "config_hash": cfg.config_hash(),
        "stages": {k: ("skipped" if v.skipped else f"{v.wall_s:.1f}s") for k, v in report.items()},
        "n_pages": int(stats["n_pages"]),
        "n_clusters": int(stats["n_distinct_hashes"]),
        "n_duplicate_pages": int(stats["n_dup_pages"]),
        "reclaimable_chars": int(stats["reclaimable_chars"]),
        "report": report_path,
        "assignments": f"{args.out}/assignments_by_kind",
    }
    print(json.dumps(summary, indent=1))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
