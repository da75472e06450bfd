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


def _add_priority(batch: pa.Table) -> pa.Table:
    if "priority" in batch.column_names:
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
