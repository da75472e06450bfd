"""incremental_exact_dedup verdict semantics on a crafted corpus with
REAL duplicate structure (the sf documents tables have no exact text
dups, so the oracle-parity run only exercises the trivially-distinct
path; this fixture plants every verdict class and cross-verdict
interaction)."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dedup_ray.pipelines.exact_queries import incremental_exact_dedup


@pytest.fixture(scope="module")
def crafted_sf(tmp_path_factory):
    root = tmp_path_factory.mktemp("incdedup")
    # base corpus: src0 + src2; new shard: src1 (plus the recrawl of
    # src0 and a second copy of src1 that the operator itself derives)
    rows = [
        # doc_id, text, source
        (1, "alpha", "src0"),     # base; recrawled -> dup_of_base
        (2, "beta", "src0"),      # base; recrawled -> dup_of_base
        (3, "gamma", "src2"),     # base only
        (10, "alpha", "src1"),    # new, text already in base -> dup_of_base
        (11, "delta", "src1"),    # new, fresh text -> 'new' + its 'second-' copy dup_in_batch
        (12, "delta", "src1"),    # new, same text as 11 -> within-batch dup
    ]
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "source": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    pq.write_table(t, root / "documents.parquet")
    return str(root)


def test_incremental_verdicts(ray_session, crafted_sf):
    out = incremental_exact_dedup(crafted_sf).to_pandas()
    got = dict(zip(out["url"], out["verdict"]))
    assert got == {
        # fresh src1 shard
        "10": "dup_of_base",      # 'alpha' already in base (doc 1)
        "11": "new",              # min-url holder of the 'delta' group
        "12": "dup_in_batch",     # same text as 11, larger url
        # recrawl of src0: everything already in base
        "recrawl-1": "dup_of_base",
        "recrawl-2": "dup_of_base",
        # second copy of src1: 'alpha' hits base; 'delta' copies lose
        # to url '11' within the batch
        "second-10": "dup_of_base",
        "second-11": "dup_in_batch",
        "second-12": "dup_in_batch",
    }
    # exactly one 'new' per sha group absent from base
    assert list(out["verdict"]).count("new") == 1
