"""dedupe_recrawls: duplicate urls (recrawls) collapse to one row per
url BEFORE hashing.  url is the engine's identity key (doc_id =
hash(url)); the duplicate-url probe showed a same-url pair with
different text sharing one union-find node — two unrelated clusters
under one label — so inputs with recrawls must run this stage (or set
cfg.dedupe_recrawls)."""

import pyarrow as pa
import ray.data

from dedup_ray.config import DedupConfig
from dedup_ray.pipelines.flagship import flagship_assignments_from_pages
from dedup_ray.sources.pages import dedupe_recrawls


def _ts(s):
    import numpy as np

    return np.datetime64(s, "us").item()


def _pages_table(rows):
    # rows: (url, warc_ts | None, text, priority)
    return pa.table(
        {
            "url": pa.array([r[0] for r in rows]),
            "warc_ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "text": pa.array([r[2] for r in rows]),
            "lang": pa.array(["en"] * len(rows)),
            "priority": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


ROWS = [
    ("u1", _ts("2024-01-01"), "old body", 0),
    ("u1", _ts("2024-06-01"), "new body", 0),        # latest wins
    ("u2", None, "null ts", 0),
    ("u2", _ts("2023-01-01"), "real ts", 0),         # null ts loses
    ("u3", _ts("2024-01-01"), "alpha", 0),
    ("u3", _ts("2024-01-01"), "beta", 0),            # ts tie -> text desc
    ("u4", _ts("2024-01-01"), "only", 5),            # unique url untouched
]


def test_keeps_latest_recrawl_deterministically(ray_session):
    out = (
        dedupe_recrawls(ray.data.from_arrow(_pages_table(ROWS)))
        .to_pandas()
        .sort_values("url", ignore_index=True)
    )
    assert list(out["url"]) == ["u1", "u2", "u3", "u4"]
    assert list(out["text"]) == ["new body", "real ts", "beta", "only"]


def test_partition_count_invariant(ray_session):
    base = None
    for p in (1, 2, 8):
        got = (
            dedupe_recrawls(
                ray.data.from_arrow(_pages_table(ROWS)), num_partitions=p
            )
            .to_pandas()
            .sort_values("url", ignore_index=True)
        )
        if base is None:
            base = got
        else:
            import pandas as pd

            pd.testing.assert_frame_equal(got, base)


def test_flagship_with_recrawls_yields_unique_urls(ray_session):
    base = "the quick brown fox jumps over the lazy dog " * 30
    rows = [
        ("http://a.com/1", _ts("2024-01-01"), base, 0),
        ("http://a.com/1", _ts("2024-02-01"), base, 0),
        ("http://a.com/2", _ts("2024-01-01"), base + " tail", 0),
        ("http://b.com/x", _ts("2024-01-01"), "completely different " * 30, 0),
        ("http://b.com/x", _ts("2024-03-01"), "another body entirely " * 30, 0),
    ]
    pages = ray.data.from_arrow(_pages_table(rows))
    cfg = DedupConfig(dedupe_recrawls=True)
    out = flagship_assignments_from_pages(pages, cfg).to_pandas()
    assert len(out) == out["url"].nunique() == 3
    # the near-dup pair still clusters; b.com/x kept its LATEST body
    # (so it is unique, not near-dup of the older body)
    a = out[out.url.str.startswith("http://a")]
    assert a["cluster_id"].nunique() == 1
    assert set(out[out.url == "http://b.com/x"]["kind"]) == {"unique"}


def test_flag_is_semantic_in_config_hash():
    assert (
        DedupConfig().config_hash()
        != DedupConfig(dedupe_recrawls=True).config_hash()
    )
