"""Filter-stage tests (SURVEY §2B B4; reference A2/A9)."""

import pyarrow as pa
import ray.data

from dedup_ray.stages.filters import drop_empty, lang_filter, length_filter


def _pages():
    return ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array(["a", "b", "c", "d", "e"], pa.string()),
                "text": pa.array(["hello world", "", None, "xy", "longer text here"]),
                "lang": pa.array(["en", "en", "de", "fr", "de"]),
            }
        )
    )


def test_drop_empty():
    out = drop_empty(_pages()).to_pandas()
    assert sorted(out["url"]) == ["a", "d", "e"]


def test_lang_filter():
    out = lang_filter(_pages(), ["de", "fr"]).to_pandas()
    assert sorted(out["url"]) == ["c", "d", "e"]


def test_length_filter():
    out = length_filter(_pages(), min_chars=3, max_chars=12).to_pandas()
    assert sorted(out["url"]) == ["a"]
