"""Benchmark decontamination: planted n-gram overlap ground truth."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from dedup_ray.config import DEFAULT_CONFIG
from dedup_ray.functions.decontam import (
    BENCHMARK_MAX_SHINGLES,
    benchmark_shingle_set,
    decontaminate,
    decontaminate_docs,
)

K = DEFAULT_CONFIG.shingle_k  # 5


def _toks(seed: str, n: int) -> str:
    return " ".join(f"{seed}{i}" for i in range(n))


SENTENCE = "the quick brown fox jumps over the lazy dog tonight"  # 10 tokens


def _ds(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array([r[0] for r in rows], pa.string()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


def test_decontaminate_planted(ray_session):
    bench = _ds([("eval/1", SENTENCE), ("eval/2", "tiny doc")])
    corpus = _ds(
        [
            # contains the benchmark sentence verbatim mid-doc
            ("c/quote", _toks("pre", 20) + " " + SENTENCE + " " + _toks("post", 20)),
            # exact copy of a benchmark doc
            ("c/copy", SENTENCE),
            # disjoint vocabulary
            ("c/clean", _toks("clean", 40)),
            # short (< k tokens) and equal to the short benchmark doc:
            # whole-doc shingle matches
            ("c/tinydup", "tiny doc"),
            # short and different
            ("c/tinyother", "other doc"),
            # empty text: no shingles, never contaminated
            ("c/empty", ""),
        ]
    )
    out = decontaminate(corpus, bench, DEFAULT_CONFIG).to_pandas().set_index("url")
    assert bool(out.loc["c/quote", "contaminated"])
    # the quote shares exactly the sentence's shingles (10 tokens -> 6)
    assert out.loc["c/quote", "n_hits"] == 10 - K + 1
    assert bool(out.loc["c/copy", "contaminated"])
    assert out.loc["c/copy", "n_hits"] == out.loc["c/copy", "n_shingles"]
    assert not bool(out.loc["c/clean", "contaminated"])
    assert bool(out.loc["c/tinydup", "contaminated"])
    assert not bool(out.loc["c/tinyother", "contaminated"])
    assert not bool(out.loc["c/empty", "contaminated"])
    assert out.loc["c/empty", "n_shingles"] == 0


def test_decontaminate_empty_benchmark(ray_session):
    corpus = _ds([("c/1", SENTENCE)])
    bench = _ds([])
    out = decontaminate(corpus, bench, DEFAULT_CONFIG).to_pandas()
    assert not out["contaminated"].any()


def test_benchmark_shingle_set_gate(ray_session, monkeypatch):
    import dedup_ray.functions.decontam as d

    monkeypatch.setattr(d, "BENCHMARK_MAX_SHINGLES", 3)
    with pytest.raises(ValueError, match="corpus, not an eval set"):
        benchmark_shingle_set(_ds([("e/1", _toks("x", 50))]), DEFAULT_CONFIG)
    assert BENCHMARK_MAX_SHINGLES > 3  # module constant untouched elsewhere


def test_decontaminate_docs_query(ray_session, tmp_path):
    """The driver query flags cross-source duplicate content: a src0
    doc that copies a src2 (benchmark) doc's text is contaminated."""
    rows = [
        (1, _toks("benchtext", 30), "src2"),
        (2, _toks("benchtext", 30), "src0"),   # copy of the benchmark doc
        (3, _toks("cleantext", 30), "src0"),
        (4, None, "src1"),                      # null text -> 0 shingles
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "source": pa.array([r[2] for r in rows], pa.string()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    out = decontaminate_docs(str(tmp_path)).to_pandas().set_index("url")
    assert set(out.index) == {"2", "3", "4"}  # src2 rows are the benchmark
    assert bool(out.loc["2", "contaminated"])
    assert not bool(out.loc["3", "contaminated"])
    assert not bool(out.loc["4", "contaminated"])
