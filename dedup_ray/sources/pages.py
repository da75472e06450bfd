"""Sources — the engine's "tree walk" (SURVEY.md §2A A1 -> §2B B1).

The reference walks filesystem trees into a node forest; here the
"walk" is a Parquet scan with column pruning, producing the canonical
``pages`` table (BASELINE.json:15):

    url: string, warc_ts: timestamp[us], html: binary,
    text: string, lang: string

plus a ``priority: int64`` column — the analog of the reference's
per-argument weight adjustment (lower priority wins canonical
selection; default 0 for all rows).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

PAGES_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]


def _canon_warc_ts(ts: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """Canonicalize a timestamp-typed ``warc_ts`` to the schema contract
    ``timestamp[us]`` (naive UTC).  Real crawl shards carry tz-aware
    columns (WARC dates are UTC) and assorted units; Arrow stores
    tz-aware timestamps as UTC epoch and the tz-aware -> naive cast
    reinterprets that storage (probed: epoch 07:00Z labeled +05:00
    casts to naive 07:00), so one cast is instant-preserving — without
    it a tz-aware or ms-unit shard violates the pages schema and a
    union with a canonical shard emits mixed-schema blocks."""
    return ts.cast(pa.timestamp("us"))


def _add_priority(batch: pa.Table) -> pa.Table:
    if "warc_ts" in batch.column_names and pa.types.is_timestamp(
        batch["warc_ts"].type
    ):
        i = batch.column_names.index("warc_ts")
        batch = batch.set_column(i, "warc_ts", _canon_warc_ts(batch["warc_ts"]))
    if "priority" in batch.column_names:
        col = batch["priority"]
        if col.null_count:
            # null priority competes at the documented default 0 (a
            # null would NaN-degrade the winner kernel's lexsort)
            i = batch.column_names.index("priority")
            batch = batch.set_column(
                i, "priority", pc.fill_null(pc.cast(col, pa.int64()), 0)
            )
        return batch
    return batch.append_column(
        "priority", pa.array([0] * len(batch), type=pa.int64())
    )


def read_pages_parquet(
    path: str | list[str],
    *,
    columns: list[str] | None = None,
    drop_html: bool = False,
) -> ray.data.Dataset:
    """Read a pages table.  ``drop_html=True`` prunes the heavy binary
    column AT THE READ (row groups never leave storage) — pass it for
    every pipeline that starts from pre-extracted ``text``."""
    if columns is None:
        columns = [c for c in PAGES_COLUMNS if not (drop_html and c == "html")]
    ds = ray.data.read_parquet(path, columns=columns)
    return ds.map_batches(_add_priority, batch_format="pyarrow", zero_copy_batch=True)


def documents_as_pages(sf_dir: str) -> ray.data.Dataset:
    """Adapt the driver's ``documents`` table (doc_id, text, lang,
    source, n_chars — TESTDATA.md) to the pages schema: url =
    str(doc_id), no html/warc_ts (downstream of extract only ``text``
    is needed).  Column pruning at the read."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )

    def to_pages(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": pc.cast(batch["doc_id"], pa.string()),
                "text": batch["text"],
                "lang": batch["lang"],
                "priority": pa.array([0] * len(batch), type=pa.int64()),
            }
        )

    return ds.map_batches(to_pages, batch_format="pyarrow", zero_copy_batch=True)


#: expected scalar types per canonical key — a line whose value fails
#: its type is SCHEMA-malformed and dropped like a syntax-malformed one
_JSONL_TYPES = {
    "url": str,
    "warc_ts": str,
    "html": (str, bytes),
    "text": str,
    "lang": str,
    "priority": int,
}


def _parse_jsonl_lines(batch: pa.Table) -> pa.Table:
    """Line-tolerant JSONL parse: malformed lines are DROPPED and
    counted in a warning (per batch) — the opt-in degraded-input path
    for raw crawl shards; per-line json.loads is its honest cost.
    Malformed covers BOTH syntax damage (torn json) and schema damage
    (a wrong-typed value, e.g. text carrying a list) — either would
    otherwise fail the whole read task at the Arrow conversion."""
    import json
    import logging

    rows = []
    bad = 0
    for line in batch["text"].to_pylist():
        if not line or not line.strip():
            continue
        try:
            obj = json.loads(line)
        except (json.JSONDecodeError, TypeError):
            bad += 1
            continue
        if not isinstance(obj, dict):
            bad += 1
            continue
        ok = True
        for k, ty in _JSONL_TYPES.items():
            v = obj.get(k)
            # bool is an int subclass; a json true/false priority is
            # schema damage, not a priority
            if v is not None and (
                not isinstance(v, ty) or isinstance(v, bool)
            ):
                ok = False
                break
        if ok:
            rows.append(obj)
        else:
            bad += 1
    if bad:
        logging.getLogger(__name__).warning(
            "read_pages_jsonl(on_bad_lines='skip'): dropped %d malformed "
            "line(s) in one batch", bad,
        )
    keys = tuple(_JSONL_TYPES)
    return pa.table(
        {k: pa.array([r.get(k) for r in rows]) for k in keys if any(k in r for r in rows)}
        or {"url": pa.array([], pa.string())}
    )


def read_pages_jsonl(
    path: str | list[str],
    *,
    drop_html: bool = False,
    on_bad_lines: str = "error",
) -> ray.data.Dataset:
    """Read a pages table from JSON-Lines shards (the raw form many
    crawl dumps arrive in before Parquet conversion).  Normalizes to
    the same schema ``read_pages_parquet`` yields: missing columns are
    filled (html -> null binary, warc_ts -> parsed from an ISO-8601
    string or null, lang -> null), extras are dropped, and the output
    feeds every downstream stage unchanged.

    ``on_bad_lines``: ``"error"`` (default) fails loudly on a malformed
    line — the right posture for data whose loss must not be silent;
    ``"skip"`` switches to a line-tolerant parser that drops and COUNTS
    malformed lines (warning per affected batch) — for raw crawl
    shards where a torn line must not kill a 10^12-doc ingest.

    Scale note: JSONL has no column pruning or row-group statistics —
    the honest cost of the format.  Conversion to Parquet is a one-off
    ``read_pages_jsonl(...).write_parquet(...)`` pipeline; production
    runs should read the Parquet."""
    if on_bad_lines not in ("error", "skip"):
        raise ValueError(f"on_bad_lines must be 'error' or 'skip', got {on_bad_lines!r}")
    if on_bad_lines == "skip":
        ds = ray.data.read_text(path).map_batches(
            _parse_jsonl_lines, batch_format="pyarrow", zero_copy_batch=True
        )
    else:
        ds = ray.data.read_json(path)
    lenient = on_bad_lines == "skip"
    return ds.map_batches(
        lambda t: _normalize_pages(t, drop_html=drop_html, lenient=lenient),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _skip_invalid_row(row) -> str:
    return "skip"


def read_pages_csv(
    path: str | list[str],
    *,
    drop_html: bool = False,
    on_bad_lines: str = "error",
) -> ray.data.Dataset:
    """Read a pages table from CSV shards.  CSV cannot carry binary
    html; the column is filled with nulls.  Same normalization
    contract as ``read_pages_jsonl``; ``on_bad_lines="skip"`` drops
    rows with the wrong column count via Arrow's invalid_row_handler
    (Arrow reports each skip through its own warning machinery)."""
    if on_bad_lines not in ("error", "skip"):
        raise ValueError(f"on_bad_lines must be 'error' or 'skip', got {on_bad_lines!r}")
    if on_bad_lines == "skip":
        from pyarrow import csv as pacsv

        ds = ray.data.read_csv(
            path,
            parse_options=pacsv.ParseOptions(invalid_row_handler=_skip_invalid_row),
        )
    else:
        ds = ray.data.read_csv(path)
    lenient = on_bad_lines == "skip"
    return ds.map_batches(
        lambda t: _normalize_pages(t, drop_html=drop_html, lenient=lenient),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _parse_warc_ts(ts: pa.Array | pa.ChunkedArray, *, lenient: bool) -> pa.Array:
    """String -> timestamp[us].  Fast path: one vectorized strptime of
    the canonical ``%Y-%m-%dT%H:%M:%S``.  Any batch containing a value
    that diverges (``Z`` suffix, fractional seconds, space separator —
    all common crawl variants, all valid ISO-8601 per this module's
    documented contract) takes a per-value salvage parse; values even
    ``fromisoformat`` rejects raise in strict mode and become null
    (counted, warned) in lenient mode — ``on_bad_lines="skip"`` must
    not let one torn timestamp kill a 10^12-doc ingest.  Canonical
    values parse identically on both paths, so per-value output never
    depends on batch composition."""
    s = pc.cast(ts, pa.string())
    try:
        return pc.strptime(s, format="%Y-%m-%dT%H:%M:%S", unit="us")
    except pa.ArrowInvalid:
        pass
    from datetime import datetime, timezone

    out: list = []
    bad = 0
    for v in s.to_pylist():
        if v is None:
            out.append(None)
            continue
        try:
            dt = datetime.fromisoformat(v.replace("Z", "+00:00"))
        except ValueError:
            if not lenient:
                raise ValueError(
                    f"unparseable warc_ts {v!r} (on_bad_lines='error')"
                ) from None
            out.append(None)
            bad += 1
            continue
        if dt.tzinfo is not None:
            dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
        out.append(dt)
    if bad:
        import logging

        logging.getLogger(__name__).warning(
            "pages ingest: nulled %d unparseable warc_ts value(s) in one batch",
            bad,
        )
    return pa.array(out, type=pa.timestamp("us"))


def _normalize_pages(
    batch: pa.Table, *, drop_html: bool, lenient: bool = False
) -> pa.Table:
    """Coerce an arbitrary-schema batch to the canonical pages schema
    (url/warc_ts/html/text/lang + priority), vectorized."""
    n = len(batch)
    cols: dict[str, pa.Array | pa.ChunkedArray] = {}
    names = set(batch.column_names)

    cols["url"] = (
        pc.cast(batch["url"], pa.string()) if "url" in names else pa.nulls(n, pa.string())
    )
    if "warc_ts" in names:
        ts = batch["warc_ts"]
        if pa.types.is_timestamp(ts.type):
            cols["warc_ts"] = _canon_warc_ts(ts)
        else:
            # ISO-8601 strings (JSONL/CSV carry timestamps as text)
            cols["warc_ts"] = _parse_warc_ts(ts, lenient=lenient)
    else:
        cols["warc_ts"] = pa.nulls(n, pa.timestamp("us"))
    if not drop_html:
        if "html" in names:
            h = batch["html"]
            cols["html"] = (
                h if pa.types.is_binary(h.type) else pc.cast(h, pa.binary())
            )
        else:
            cols["html"] = pa.nulls(n, pa.binary())
    cols["text"] = (
        pc.cast(batch["text"], pa.string())
        if "text" in names
        else pa.nulls(n, pa.string())
    )
    cols["lang"] = (
        pc.cast(batch["lang"], pa.string())
        if "lang" in names
        else pa.nulls(n, pa.string())
    )
    # a row whose priority key is merely OMITTED must compete at the
    # documented default 0, not sort as NaN behind every real value
    # (int64-with-null -> float64 NaN in the winner kernel's lexsort,
    # batch-boundary-dependent canonical selection)
    cols["priority"] = (
        pc.fill_null(pc.cast(batch["priority"], pa.int64()), 0)
        if "priority" in names
        else pa.array([0] * n, type=pa.int64())
    )
    return pa.table(cols)


#: deterministic tie-break column order for dedupe_recrawls (only the
#: columns present in the input participate): latest warc_ts wins,
#: then descending text / html bytes / lang, then ASCENDING priority
#: (lower priority is "better" everywhere else in the engine)
_RECRAWL_TIEBREAK = ["warc_ts", "text", "html", "lang"]


def dedupe_recrawls(
    pages: ray.data.Dataset, *, num_partitions: int = 64
) -> ray.data.Dataset:
    """Collapse duplicate urls (recrawls) to exactly one row per url.

    The engine's identity key is ``url`` (``doc_id = hash(url)`` at
    ingest), so a corpus with the same url crawled twice violates the
    pipeline's precondition: both rows share one union-find node, and
    two different-content rows can smuggle unrelated clusters into one
    label (or transitively merge their neighborhoods).  Real crawl
    deliveries contain recrawls, so this stage makes the precondition
    cheap to establish: ONE url-keyed hash exchange keeping, per url,
    the row with the latest ``warc_ts`` (null timestamps lose), ties
    broken deterministically on descending text/html/lang bytes then
    ascending priority — the kept row is a pure function of the row
    SET, never of block layout or CPU count.

    Enable via ``DedupConfig.dedupe_recrawls`` (semantic: participates
    in config_hash) or the CLI's ``--dedupe-recrawls``.
    """
    from dedup_ray.core import partitioned_kernel, schema_names
    from dedup_ray.util import hash_urls_u64

    import numpy as np

    names = schema_names(pages)
    if "url" not in names:
        # zero-row/schema-less input: nothing to collapse
        return pages
    s = pages.schema(fetch_if_missing=True)
    empty = pa.table(
        {n: pa.array([], type=t) for n, t in zip(s.names, s.types)}
    )
    sort_keys = [("url", "ascending")] + [
        (c, "descending") for c in _RECRAWL_TIEBREAK if c in names
    ]
    if "priority" in names:
        sort_keys.append(("priority", "ascending"))

    def key_hash(t: pa.Table) -> np.ndarray:
        return hash_urls_u64(t["url"].to_pylist())

    def kernel(t: pa.Table) -> pa.Table:
        if "url" not in t.column_names or len(t) == 0:
            return empty
        # null_placement="at_end" puts null warc_ts last within a url
        # group under the descending key — a null timestamp loses to
        # any real one
        idx = pc.sort_indices(
            t, sort_keys=sort_keys, null_placement="at_end"
        )
        t2 = t.take(idx)
        u = np.asarray(t2["url"].to_pylist(), dtype=object)
        first = np.empty(len(u), dtype=bool)
        first[0] = True
        np.not_equal(u[1:], u[:-1], out=first[1:])
        return t2.filter(pa.array(first))

    return partitioned_kernel(
        pages,
        key_hash,
        kernel,
        num_partitions=num_partitions,
        empty_result=empty,
    )
