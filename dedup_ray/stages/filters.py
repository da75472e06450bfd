"""Page filters (SURVEY.md §2B B4; reference A2 ignore-filter + A9
empty-entry handling).

All predicates are vectorized pyarrow.compute expressions applied
inside ``map_batches`` (faster than row-wise ``ds.filter``).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def _batch_filter(expr_fn):
    def apply(batch: pa.Table) -> pa.Table:
        mask = expr_fn(batch)
        return batch.filter(mask)

    return apply


def drop_empty(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Drop pages with null/empty text (reference A9 'ignore empties')."""
    # coalesce maps null text to "" whose utf8_length is 0 — one
    # expression covers both the null and the empty case
    return ds.map_batches(
        _batch_filter(
            lambda t: pc.greater(pc.utf8_length(pc.coalesce(t["text"], "")), 0)
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def lang_filter(ds: ray.data.Dataset, langs: list[str]) -> ray.data.Dataset:
    """Keep only pages whose lang is in ``langs``."""
    langs_arr = pa.array(langs, type=pa.string())
    return ds.map_batches(
        _batch_filter(lambda t: pc.is_in(t["lang"], value_set=langs_arr)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def length_filter(
    ds: ray.data.Dataset, min_chars: int = 0, max_chars: int | None = None
) -> ray.data.Dataset:
    """Keep pages with min_chars <= len(text) (< max_chars if given)."""

    def expr(t: pa.Table):
        n = pc.utf8_length(pc.coalesce(t["text"], ""))
        mask = pc.greater_equal(n, min_chars)
        if max_chars is not None:
            mask = pc.and_(mask, pc.less(n, max_chars))
        return mask

    return ds.map_batches(
        _batch_filter(expr), batch_format="pyarrow", zero_copy_batch=True
    )
