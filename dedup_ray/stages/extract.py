"""extract_text (SURVEY.md §2B B6) — html(binary) -> text.

Contract (BASELINE.json:15): extracted text must be BYTE-IDENTICAL per
url versus the reference extraction.  The default extractor is
therefore a pure, frozen function (EXTRACTOR_VERSION is hashed into
lineage); swapping it is an intentional semantic change.

Default rule: decode UTF-8 and take the contents between the first
``<body>`` and the last ``</body>`` tag, stripping nothing else; if no
body tags are present, the whole decoded payload is the text.  This is
exactly the inverse of the fixture generator (FIXTURES.md §1:
``html = b"<html><body>" + text + b"</body></html>"``), making the
byte-identity invariant testable end to end.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

EXTRACTOR_VERSION = "body-utf8-v1"

_OPEN = b"<body>"
_CLOSE = b"</body>"


def extract_text_bytes(html: bytes) -> str:
    i = html.find(_OPEN)
    j = html.rfind(_CLOSE)
    if i < 0 or j < 0 or j < i:
        return html.decode("utf-8")
    return html[i + len(_OPEN) : j].decode("utf-8")


def _extract_batch(batch: pa.Table) -> pa.Table:
    if "html" not in batch.column_names:
        # corpus arrived pre-extracted (e.g. text-only JSONL/CSV or a
        # drop_html read) — nothing to do
        return batch
    htmls = batch["html"].to_pylist()
    prior = (
        batch["text"].to_pylist()
        if "text" in batch.column_names
        else [None] * len(htmls)
    )
    # null html (a source without raw markup) keeps the pre-extracted
    # text column untouched — byte-identity only binds where html exists
    texts = [
        extract_text_bytes(h) if h is not None else p
        for h, p in zip(htmls, prior)
    ]
    cols = {name: batch[name] for name in batch.column_names if name != "html"}
    cols["text"] = pa.array(texts, type=pa.string())
    # html is intentionally DROPPED here: the heavy binary column never
    # travels past the extract stage (memory-pressure rule, SURVEY §4).
    return pa.table(cols)


def extract_text(ds: ray.data.Dataset) -> ray.data.Dataset:
    """pages(html) -> pages(text); drops the html column."""
    return ds.map_batches(_extract_batch, batch_format="pyarrow", zero_copy_batch=True)
