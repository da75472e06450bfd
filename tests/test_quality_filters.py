"""Edge cases for the repetition / quality-filter operators: null and
empty text, null lang, single-token docs — checked BIT-EXACTLY against
the same DuckDB SQL the driver runs, over a crafted corpus (the sf
tables have no nulls, so parity there never exercises these paths)."""

import os

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __ray_entry__ as entrymod

CRAFTED = [
    # (doc_id, text, lang)
    (1, "the cat sat on the mat the cat", "en"),  # repeats
    (2, "", "en"),  # empty -> one '' token
    (3, None, "de"),  # null text
    (4, "word", None),  # null lang, single token
    (5, "a a a a a a a a a a a a a a a a a a a a a a", "fr"),  # pure repeat
    (6, " ".join(f"tok{i}" for i in range(30)), "en"),  # all distinct, kept
    (7, "x  y", "zh"),  # double space -> empty middle token
    # 24 tokens, 2 distinct, avg token len 4.5 -> repetitive fires
    (8, " ".join(["alpha", "beta"] * 12), "en"),
]


@pytest.fixture(scope="module")
def crafted_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("crafted_docs")
    ids, texts, langs = zip(*CRAFTED)
    t = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(["srcA"] * len(ids), pa.string()),
            "n_chars": pa.array(
                [len(x or "") for x in texts], pa.int64()
            ),
        }
    )
    pq.write_table(t, os.path.join(str(d), "documents.parquet"))
    return str(d)


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), ignore_index=True)


@pytest.mark.parametrize(
    "name", ["repetition_stats", "quality_filter_verdicts", "length_histogram"]
)
def test_crafted_corpus_matches_oracle(name, crafted_dir, ray_session):
    got = _norm(entrymod.queries()[name](crafted_dir).to_pandas())
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{crafted_dir}/documents.parquet')"
    )
    want = _norm(con.sql(entrymod.oracle_sql()[name]).df())
    con.close()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_verdict_classes_fire(crafted_dir, ray_session):
    df = entrymod.queries()["quality_filter_verdicts"](crafted_dir).to_pandas()
    by_url = dict(zip(df["url"], df["reason"]))
    assert by_url["2"] == "too_short"  # empty text
    assert by_url["3"] == "too_short"  # null text
    # single-char tokens: avg_tok = 1.0, so bad_token_len OUTRANKS
    # repetitive in the precedence chain
    assert by_url["5"] == "bad_token_len"
    assert by_url["6"] == "kept"
    assert by_url["7"] == "too_short"  # 3 tokens
    assert by_url["8"] == "repetitive"  # dup_frac 22/24, avg_tok 4.5 in band
    assert bool(df.set_index("url").loc["6", "keep"]) is True


def test_repetition_counts_exact(crafted_dir, ray_session):
    df = (
        entrymod.queries()["repetition_stats"](crafted_dir)
        .to_pandas()
        .set_index("url")
    )
    # 'the cat sat on the mat the cat' -> {the, cat, sat, on, mat}
    assert df.loc["1", "n_tokens"] == 8 and df.loc["1", "n_distinct_tokens"] == 5
    assert df.loc["2", "n_tokens"] == 1 and df.loc["2", "n_distinct_tokens"] == 1
    assert df.loc["5", "n_tokens"] == 22 and df.loc["5", "n_distinct_tokens"] == 1
    # double space: ['x', '', 'y'] -> 3 tokens, 3 distinct
    assert df.loc["7", "n_tokens"] == 3 and df.loc["7", "n_distinct_tokens"] == 3
