"""Source-format parity: the JSONL and CSV page readers must yield the
same canonical pages schema as the Parquet reader, and the flagship
must produce identical assignments regardless of which format the
corpus arrived in."""

import json

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dedup_ray.sources.pages import (
    read_pages_csv,
    read_pages_jsonl,
    read_pages_parquet,
)

ROWS = [
    {
        "url": f"https://site{i % 3}.example/p/{i:04d}",
        "warc_ts": f"2025-01-01T00:00:{i:02d}",
        "text": ["alpha beta gamma", "alpha beta gamma", "delta epsilon"][i % 3],
        "lang": "en",
    }
    for i in range(12)
]


@pytest.fixture(scope="module")
def corpus_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("sources")
    (root / "jsonl").mkdir()
    (root / "csv").mkdir()
    (root / "parquet").mkdir()
    with open(root / "jsonl" / "part0.jsonl", "w") as f:
        for r in ROWS:
            f.write(json.dumps(r) + "\n")
    with open(root / "csv" / "part0.csv", "w") as f:
        f.write("url,warc_ts,text,lang\n")
        for r in ROWS:
            f.write(f"{r['url']},{r['warc_ts']},\"{r['text']}\",{r['lang']}\n")
    t = pa.table(
        {
            "url": pa.array([r["url"] for r in ROWS], pa.string()),
            "warc_ts": pa.array(
                [r["warc_ts"] for r in ROWS], pa.string()
            ).cast(pa.timestamp("us")),
            "html": pa.nulls(len(ROWS), pa.binary()),
            "text": pa.array([r["text"] for r in ROWS], pa.string()),
            "lang": pa.array([r["lang"] for r in ROWS], pa.string()),
        }
    )
    pq.write_table(t, root / "parquet" / "part0.parquet")
    return root


def _normalized(ds):
    df = ds.to_pandas().sort_values("url", ignore_index=True)
    return df


def test_jsonl_csv_match_parquet(ray_session, corpus_dirs):
    want = _normalized(read_pages_parquet(str(corpus_dirs / "parquet")))
    got_j = _normalized(read_pages_jsonl(str(corpus_dirs / "jsonl")))
    got_c = _normalized(read_pages_csv(str(corpus_dirs / "csv")))
    for got in (got_j, got_c):
        assert list(got.columns) == list(want.columns)
        for col in ("url", "text", "lang", "priority", "warc_ts"):
            assert got[col].tolist() == want[col].tolist(), col


def test_flagship_identical_across_formats(ray_session, corpus_dirs):
    from dedup_ray.config import DEFAULT_CONFIG
    from dedup_ray.pipelines.flagship import flagship_assignments_from_pages

    outs = {}
    for name, reader, path in (
        ("parquet", read_pages_parquet, "parquet"),
        ("jsonl", read_pages_jsonl, "jsonl"),
    ):
        pages = reader(str(corpus_dirs / path), drop_html=True)
        a = flagship_assignments_from_pages(pages, DEFAULT_CONFIG).to_pandas()
        outs[name] = a.sort_values("url", ignore_index=True)[
            ["url", "cluster_id", "is_canonical", "kind"]
        ]
    assert outs["parquet"].equals(outs["jsonl"])
    # the triplicated text forms exact clusters
    assert (~outs["parquet"]["is_canonical"]).sum() > 0


def test_on_bad_lines_skip_matches_error_on_clean_shards(ray_session, corpus_dirs):
    """skip mode must be a superset-safe drop-in: identical output on
    clean shards (only malformed lines differ)."""
    for reader, sub in ((read_pages_jsonl, "jsonl"), (read_pages_csv, "csv")):
        want = _normalized(reader(str(corpus_dirs / sub)))
        got = _normalized(reader(str(corpus_dirs / sub), on_bad_lines="skip"))
        for col in ("url", "text", "lang", "priority", "warc_ts"):
            assert got[col].tolist() == want[col].tolist(), (sub, col)


def test_on_bad_lines_skip_drops_malformed(ray_session, tmp_path):
    bad = tmp_path / "bad.jsonl"
    with open(bad, "w") as f:
        f.write('{"url": "https://a/", "text": "good", "lang": "en"}\n')
        f.write('{"url": "https://b/", "text": "torn\n')      # malformed
        f.write("not json at all\n")                          # malformed
        f.write('{"url": "https://c/", "text": "good", "lang": "en"}\n')
    df = read_pages_jsonl(str(bad), on_bad_lines="skip").to_pandas()
    assert sorted(df["url"]) == ["https://a/", "https://c/"]

    import pytest as _pytest

    with _pytest.raises(Exception):
        read_pages_jsonl(str(bad)).to_pandas()  # default: fail loudly
    with _pytest.raises(ValueError):
        read_pages_jsonl(str(bad), on_bad_lines="maybe")

    badcsv = tmp_path / "bad.csv"
    with open(badcsv, "w") as f:
        f.write("url,text,lang\n")
        f.write("https://a/,good,en\n")
        f.write("https://b/,too,many,columns,here\n")
        f.write("https://c/,good,en\n")
    df = read_pages_csv(str(badcsv), on_bad_lines="skip").to_pandas()
    assert sorted(df["url"]) == ["https://a/", "https://c/"]


def test_warc_ts_iso_variants_parse_and_garbage_is_mode_dependent(
    ray_session, tmp_path
):
    """Common crawl timestamp variants (Z suffix, fractional seconds,
    space separator) are valid ISO-8601 per the reader contract and
    must parse in BOTH modes; a garbage warc_ts nulls (and counts) in
    skip mode instead of killing the read task, and still fails loudly
    in error mode."""
    ok = tmp_path / "ts_variants.jsonl"
    with open(ok, "w") as f:
        f.write('{"url": "a", "text": "x", "warc_ts": "2025-01-01T00:00:01"}\n')
        f.write('{"url": "b", "text": "x", "warc_ts": "2025-01-01T00:00:02Z"}\n')
        f.write('{"url": "c", "text": "x", "warc_ts": "2025-01-01T00:00:03.500000"}\n')
        f.write('{"url": "d", "text": "x", "warc_ts": "2025-01-01 00:00:04"}\n')
    for mode in ("error", "skip"):
        df = (
            read_pages_jsonl(str(ok), on_bad_lines=mode)
            .to_pandas()
            .sort_values("url", ignore_index=True)
        )
        import pandas as pd

        got = df["warc_ts"].tolist()
        assert got == [
            pd.Timestamp("2025-01-01 00:00:01"),
            pd.Timestamp("2025-01-01 00:00:02"),
            pd.Timestamp("2025-01-01 00:00:03.500000"),
            pd.Timestamp("2025-01-01 00:00:04"),
        ], (mode, got)

    bad = tmp_path / "ts_garbage.jsonl"
    with open(bad, "w") as f:
        f.write('{"url": "a", "text": "x", "warc_ts": "2025-01-01T00:00:01"}\n')
        f.write('{"url": "b", "text": "x", "warc_ts": "not a timestamp"}\n')
    df = (
        read_pages_jsonl(str(bad), on_bad_lines="skip")
        .to_pandas()
        .sort_values("url", ignore_index=True)
    )
    assert df["url"].tolist() == ["a", "b"]
    assert df["warc_ts"].notna().tolist() == [True, False]
    with pytest.raises(Exception):
        read_pages_jsonl(str(bad)).to_pandas()


def test_omitted_priority_competes_at_default_zero(ray_session, tmp_path):
    """A row whose priority key is merely omitted gets the documented
    int64 default 0 — never a null that NaN-degrades the winner
    kernel's lexsort batch-dependently."""
    p = tmp_path / "prio.jsonl"
    with open(p, "w") as f:
        f.write('{"url": "a", "text": "x", "priority": 5}\n')
        f.write('{"url": "b", "text": "x"}\n')
    df = (
        read_pages_jsonl(str(p))
        .to_pandas()
        .sort_values("url", ignore_index=True)
    )
    assert df["priority"].tolist() == [5, 0]
    assert df["priority"].notna().all()

    # parquet path: an explicit null priority also normalizes to 0
    t = pa.table(
        {
            "url": pa.array(["a", "b"], pa.string()),
            "text": pa.array(["x", "x"], pa.string()),
            "lang": pa.array(["en", "en"], pa.string()),
            "priority": pa.array([7, None], pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "prio.parquet")
    df = (
        read_pages_parquet(
            str(tmp_path / "prio.parquet"),
            columns=["url", "text", "lang", "priority"],
        )
        .to_pandas()
        .sort_values("url", ignore_index=True)
    )
    assert df["priority"].tolist() == [7, 0]


def test_on_bad_lines_skip_drops_schema_malformed(ray_session, tmp_path):
    """Valid-JSON lines with wrong-TYPED values (text as a list,
    priority as a string/bool) are schema damage and must be dropped
    + counted like syntax damage — not crash the Arrow conversion."""
    bad = tmp_path / "schema_bad.jsonl"
    with open(bad, "w") as f:
        f.write('{"url": "https://a/", "text": "good", "lang": "en"}\n')
        f.write('{"url": "https://b/", "text": ["a", "b"], "lang": "en"}\n')
        f.write('{"url": "https://c/", "text": "good", "priority": "high"}\n')
        f.write('{"url": "https://d/", "text": "good", "priority": true}\n')
        f.write('{"url": "https://e/", "text": "good", "priority": 2}\n')
    df = read_pages_jsonl(str(bad), on_bad_lines="skip").to_pandas()
    assert sorted(df["url"]) == ["https://a/", "https://e/"]


def test_tz_aware_warc_ts_normalized_to_naive_utc(ray_session, tmp_path):
    """Real crawl shards carry tz-aware warc_ts (WARC dates are UTC);
    the canonical pages schema is naive timestamp[us].  The ingest must
    convert INSTANT-preserving (pyarrow's bare tz-aware -> naive cast
    yields local wall time, which would shift a +05:00 shard by 5 h
    against a UTC one) and fold any unit to us."""
    import datetime as dt

    import pandas as pd

    utc = dt.timezone.utc
    # same INSTANT written from two zones plus one ms-unit shard
    pq.write_table(
        pa.table(
            {
                "url": ["u1"],
                "warc_ts": pa.array(
                    [dt.datetime(2024, 1, 1, 7, 0, tzinfo=utc)],
                    type=pa.timestamp("us", tz="UTC"),
                ),
                "html": pa.array([None], pa.binary()),
                "text": ["t1"],
                "lang": ["en"],
            }
        ),
        tmp_path / "utc.parquet",
    )
    # NOTE: build the +05:00 shard from epoch micros — pa.array IGNORES
    # a python datetime's tzinfo when an explicit tz-typed target is
    # given (probed: 12:00+05:00 stores epoch 12:00Z), which would pin
    # the wrong instant into the fixture
    epoch_7utc = int(dt.datetime(2024, 1, 1, 7, 0, tzinfo=utc).timestamp() * 1_000_000)
    pq.write_table(
        pa.table(
            {
                "url": ["u2"],
                "warc_ts": pa.array([epoch_7utc], pa.int64()).cast(
                    pa.timestamp("us", tz="+05:00")
                ),
                "html": pa.array([None], pa.binary()),
                "text": ["t2"],
                "lang": ["en"],
            }
        ),
        tmp_path / "plus5.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "url": ["u3"],
                "warc_ts": pa.array(
                    [dt.datetime(2024, 1, 1, 7, 0)], type=pa.timestamp("ms")
                ),
                "html": pa.array([None], pa.binary()),
                "text": ["t3"],
                "lang": ["en"],
            }
        ),
        tmp_path / "naive_ms.parquet",
    )
    ds = read_pages_parquet(
        [str(tmp_path / n) for n in ("utc.parquet", "plus5.parquet", "naive_ms.parquet")]
    )
    assert str(ds.schema().base_schema.field("warc_ts").type) == "timestamp[us]"
    df = ds.to_pandas().sort_values("url", ignore_index=True)
    # 12:00+05:00 IS 07:00 UTC — all three rows land on the same naive
    # UTC instant
    want = pd.Timestamp("2024-01-01 07:00:00")
    assert list(df["warc_ts"]) == [want, want, want]
