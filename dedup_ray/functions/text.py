"""Text-analysis operators over the documents/pages text column —
the quality/filtering components of a training-data pipeline:
token counting, quality scoring, language-ID heuristic, document
fingerprinting.  All vectorized (pyarrow.compute) or actor-pool."""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from dedup_ray.config import DEFAULT_CONFIG
from dedup_ray.functions.scalar import sql_round
from dedup_ray.sources.pages import documents_as_pages
from dedup_ray.util import char_rolling_hashes, winnow_select

#: typed empty in the documents_as_pages schema.  Applying a map-only
#: query's pure-arrow batch UDF to this yields the query's typed empty
#: OUTPUT — the empty-corpus short-circuit, because Ray 2.49's 0-row
#: blocks bypass map_batches and would return a schema-less dataset.
_EMPTY_PAGES = pa.table(
    {
        "url": pa.array([], pa.string()),
        "text": pa.array([], pa.string()),
        "lang": pa.array([], pa.string()),
        "priority": pa.array([], pa.int64()),
    }
)


def _documents_empty(sf_dir: str) -> bool:
    from dedup_ray.core import parquet_num_rows

    return parquet_num_rows(f"{sf_dir}/documents.parquet") == 0


def token_count(sf_dir: str) -> ray.data.Dataset:
    """Whitespace token count per doc.  Definition chosen to equal
    DuckDB's length(string_split(coalesce(text, ''), ' ')) exactly: for ANY string,
    that equals count(' ') + 1."""
    ds = documents_as_pages(sf_dir)

    def f(t: pa.Table) -> pa.Table:
        spaces = pc.count_substring(pc.coalesce(t["text"], ""), pattern=" ")
        return pa.table(
            {
                "url": t["url"],
                "n_tokens": pc.add(pc.cast(spaces, pa.int64()), 1),
            }
        )

    if _documents_empty(sf_dir):
        return ray.data.from_arrow(f(_EMPTY_PAGES))
    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


TOKEN_COUNT_SQL = """
SELECT cast(doc_id AS varchar) AS url,
       cast(length(string_split(coalesce(text, ''), ' ')) AS bigint) AS n_tokens
FROM documents
"""


def quality_score(sf_dir: str) -> ray.data.Dataset:
    """Cheap quality signals: char length, token count, mean token
    length, punctuation count — the length/punct-ratio family of
    filters."""
    ds = documents_as_pages(sf_dir)

    def f(t: pa.Table) -> pa.Table:
        text = pc.coalesce(t["text"], "")
        n_chars = pc.cast(pc.utf8_length(text), pa.int64())
        n_tokens = pc.add(
            pc.cast(pc.count_substring(text, pattern=" "), pa.int64()), 1
        )
        n_punct = pc.cast(
            pc.count_substring_regex(text, pattern=r"[.,;:!?]"), pa.int64()
        )
        avg_tok = sql_round(
            pc.divide(
                pc.cast(pc.subtract(n_chars, pc.subtract(n_tokens, 1)), pa.float64()),
                pc.cast(n_tokens, pa.float64()),
            ),
            4,
        )
        return pa.table(
            {
                "url": t["url"],
                "n_chars": n_chars,
                "n_tokens": n_tokens,
                "n_punct": n_punct,
                "avg_token_len": avg_tok,
            }
        )

    if _documents_empty(sf_dir):
        return ray.data.from_arrow(f(_EMPTY_PAGES))
    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


QUALITY_SCORE_SQL = """
SELECT cast(doc_id AS varchar) AS url,
       cast(length(coalesce(text, '')) AS bigint)                                   AS n_chars,
       cast(length(string_split(coalesce(text, ''), ' ')) AS bigint)                AS n_tokens,
       cast(length(coalesce(text, '')) - length(regexp_replace(coalesce(text, ''), '[.,;:!?]', '', 'g')) AS bigint) AS n_punct,
       round((length(coalesce(text, '')) - (length(string_split(coalesce(text, ''), ' ')) - 1))
             / cast(length(string_split(coalesce(text, ''), ' ')) AS double), 4)    AS avg_token_len
FROM documents
"""

# tiny per-language stopword profiles for the heuristic language id
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "it", "for", "with"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"},
    "fr": {"le", "la", "les", "et", "est", "une", "des", "dans", "pour", "que"},
    "es": {"el", "la", "los", "y", "es", "una", "de", "en", "por", "que"},
}


class LangId:
    """Heuristic language id (stopword-profile scoring) — profiles
    built once per worker (lru_cache singleton; task stage).

    Fully vectorized with semantics identical to the original per-row
    loop (tokens = maximal [a-z]+ runs of the lowercased text; score =
    number of tokens in the profile, duplicates counted; winner = the
    first strictly-max language in profile order, 'unknown' on zero):
    one regex split per batch, one ``is_in`` per language over the
    flattened token column, per-row scores via bincount on the list
    parent indices."""

    def __init__(self) -> None:
        self.langs = list(_STOPWORDS)
        self.value_sets = [
            pa.array(sorted(_STOPWORDS[lang]), pa.string()) for lang in self.langs
        ]
        # row label lookup: langs + trailing 'unknown' sentinel
        self.labels = np.array(self.langs + ["unknown"])

    def __call__(self, t: pa.Table) -> pa.Table:
        n = len(t)
        lower = pc.utf8_lower(pc.coalesce(t["text"], ""))
        toks = pc.split_pattern_regex(lower, pattern="[^a-z]+")
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        scores = np.zeros((len(self.langs), n), dtype=np.int64)
        for i, vs in enumerate(self.value_sets):
            hit = pc.is_in(flat, value_set=vs).to_numpy(zero_copy_only=False)
            if hit.any():
                scores[i] = np.bincount(parents[hit], minlength=n)
        best = scores.argmax(axis=0)  # first max wins == profile order
        idx = np.where(scores.max(axis=0) > 0, best, len(self.langs))
        return pa.table(
            {"url": t["url"], "lang_pred": pa.array(self.labels[idx], pa.string())}
        )


@functools.lru_cache(maxsize=1)
def _lang_id_singleton() -> LangId:
    return LangId()


def lang_id(sf_dir: str) -> ray.data.Dataset:
    ds = documents_as_pages(sf_dir)
    return ds.map_batches(
        lambda t: _lang_id_singleton()(t),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


class Fingerprint:
    """Document fingerprint: count + min/max of winnowing-selected
    rolling hashes (the compact content sketch used by the substring
    pass, exposed as its own operator)."""

    def __init__(self) -> None:
        self.g = DEFAULT_CONFIG.winnow_gram
        self.w = DEFAULT_CONFIG.winnow_window

    def __call__(self, t: pa.Table) -> pa.Table:
        counts, mins = [], []
        for text in t["text"].to_pylist():
            hs = char_rolling_hashes(text or "", self.g)
            if len(hs) == 0:
                counts.append(0)
                mins.append("")
                continue
            sel = winnow_select(hs, self.w)
            counts.append(len(sel))
            mins.append(format(int(hs[sel].min()), "016x"))
        return pa.table(
            {
                "url": t["url"],
                "n_fingerprints": pa.array(counts, pa.int64()),
                "min_fingerprint": pa.array(mins, pa.string()),
            }
        )


@functools.lru_cache(maxsize=1)
def _fingerprint_singleton() -> Fingerprint:
    return Fingerprint()


def doc_fingerprint(sf_dir: str) -> ray.data.Dataset:
    ds = documents_as_pages(sf_dir)
    return ds.map_batches(
        lambda t: _fingerprint_singleton()(t),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


# ---- PII-style redaction ------------------------------------------------

#: RE2 syntax (both pyarrow.compute and DuckDB run RE2, so the Ray and
#: SQL sides share match semantics exactly).  No lookarounds — RE2 has
#: none.  Order of application matters and is fixed: email -> ipv4 ->
#: phone; counts are taken on the ORIGINAL text for all three.
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_PHONE_RE = r"\+?\d[\d\- ]{7,}\d"


def redact_text(sf_dir: str) -> ray.data.Dataset:
    """Scrub email addresses, IPv4 addresses and phone-like digit runs
    from the text column — the PII-redaction stage of a training-data
    pipeline.  Emits the redacted text plus per-doc match counts so a
    downstream filter can drop high-PII documents.  Fully vectorized
    (one RE2 pass per pattern per batch); map-only, so it streams."""
    ds = documents_as_pages(sf_dir)

    def f(t: pa.Table) -> pa.Table:
        text = pc.coalesce(t["text"], "")
        n_emails = pc.cast(pc.count_substring_regex(text, pattern=_EMAIL_RE), pa.int64())
        n_ips = pc.cast(pc.count_substring_regex(text, pattern=_IPV4_RE), pa.int64())
        n_phones = pc.cast(pc.count_substring_regex(text, pattern=_PHONE_RE), pa.int64())
        red = pc.replace_substring_regex(text, pattern=_EMAIL_RE, replacement="<EMAIL>")
        red = pc.replace_substring_regex(red, pattern=_IPV4_RE, replacement="<IP>")
        red = pc.replace_substring_regex(red, pattern=_PHONE_RE, replacement="<PHONE>")
        return pa.table(
            {
                "url": t["url"],
                "redacted": red,
                "n_emails": n_emails,
                "n_ips": n_ips,
                "n_phones": n_phones,
            }
        )

    if _documents_empty(sf_dir):
        return ray.data.from_arrow(f(_EMPTY_PAGES))
    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


REDACT_TEXT_SQL = r"""
SELECT cast(doc_id AS varchar) AS url,
       regexp_replace(
         regexp_replace(
           regexp_replace(coalesce(text, ''),
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
         '\+?\d[\d\- ]{7,}\d', '<PHONE>', 'g')                        AS redacted,
       cast(length(regexp_extract_all(coalesce(text, ''),
         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS bigint) AS n_emails,
       cast(length(regexp_extract_all(coalesce(text, ''),
         '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS bigint)         AS n_ips,
       cast(length(regexp_extract_all(coalesce(text, ''),
         '\+?\d[\d\- ]{7,}\d')) AS bigint)                             AS n_phones
FROM documents
"""


# ---- vocabulary / token-frequency analysis --------------------------------


def word_topk(sf_dir: str, k: int = 50) -> ray.data.Dataset:
    """Global top-k token frequencies over the corpus — the
    vocabulary-building / stopword-discovery primitive of a
    training-data pipeline.

    Scale shape: the vocabulary key is maximally skewed ('the' appears
    in almost every document), so the exchange NEVER sees raw tokens —
    each batch pre-aggregates to (word, count) partials (per-batch
    pyarrow group_by), the global groupby moves at most |vocab| rows
    per block, and only the tiny merged vocabulary reaches the sort.
    Token definition matches ``token_count`` (split on single spaces,
    empties kept) so both sides agree exactly."""
    ds = documents_as_pages(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.coalesce(t["text"], ""), pattern=" ")
        flat = pc.list_flatten(toks)
        g = pa.table({"word": flat}).group_by(["word"]).aggregate([([], "count_all")])
        return pa.table(
            {"word": g["word"], "n_part": pc.cast(g["count_all"], pa.int64())}
        )

    from dedup_ray.core import global_kernel, hash_strings_u64, partitioned_kernel

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    empty = pa.table(
        {"word": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
    )

    def combine_topk(g: pa.Table) -> pa.Table:
        # each partition holds COMPLETE counts for its words (hash
        # co-location), so the per-partition top-k under the final
        # ordering (n desc, word asc) is a valid candidate superset —
        # the full merged vocabulary never reaches a global sort
        m = g.group_by("word").aggregate([("n_part", "sum")])
        out = pa.table(
            {"word": m["word"], "n": pc.cast(m["n_part_sum"], pa.int64())}
        )
        return out.sort_by([("n", "descending"), ("word", "ascending")]).slice(0, k)

    candidates = partitioned_kernel(
        partials,
        lambda t: hash_strings_u64(t["word"].to_pylist()),
        combine_topk,
        num_partitions=64,
        empty_result=empty,
    )

    def final_topk(g: pa.Table) -> pa.Table:
        # <= P x k candidate rows
        return g.sort_by([("n", "descending"), ("word", "ascending")]).slice(0, k)

    return global_kernel(candidates, final_topk, empty_result=empty)


WORD_TOPK_SQL = """
SELECT w AS word, cast(count(*) AS bigint) AS n
FROM (SELECT unnest(string_split(coalesce(text, ''), ' ')) AS w FROM documents)
GROUP BY w
ORDER BY n DESC, word
LIMIT 50
"""


# ---- repetition / lexical-diversity filter ---------------------------------


def _distinct_per_row(toks, lens: np.ndarray, n: int) -> np.ndarray:
    """Distinct tokens per document over a list<string> token column:
    dictionary-encode once (exact string identity — no hashing, no
    collision risk), then distinct counts per document fall out of one
    ``np.unique`` over a (row, code) composite key.  SHARED by
    ``repetition_stats`` and ``quality_filter_verdicts`` (ADVICE r03:
    dup_frac feeds the keep verdict, so a single kernel keeps both
    bit-exactly aligned with their DuckDB oracles)."""
    flat = pc.list_flatten(toks)
    if len(flat) == 0:
        return np.zeros(n, dtype=np.int64)
    codes = pc.dictionary_encode(flat).indices.to_numpy().astype(np.int64)
    rows = np.repeat(np.arange(n, dtype=np.int64), lens)
    span = np.int64(codes.max()) + 1
    uniq = np.unique(rows * span + codes)
    return np.bincount(uniq // span, minlength=n)


def repetition_stats(sf_dir: str) -> ray.data.Dataset:
    """Per-document duplicate-token fraction — the lexical-diversity
    (type/token-ratio) member of the Gopher-style repetition-filter
    family.  Documents whose token stream is dominated by repeats are
    boilerplate/spam candidates a training-data pipeline drops.

    Vectorized distinct-per-list kernel: tokens are dictionary-encoded
    once per batch (exact string identity — no hashing, no collision
    risk), then distinct counts per document fall out of one
    ``np.unique`` over a (row, code) composite key.  Embarrassingly
    parallel — no exchange."""
    ds = documents_as_pages(sf_dir)

    def f(t: pa.Table) -> pa.Table:
        text = pc.coalesce(t["text"], "").combine_chunks()
        toks = pc.split_pattern(text, pattern=" ")
        n = len(t)
        lens = pc.list_value_length(toks).to_numpy().astype(np.int64)
        n_distinct = _distinct_per_row(toks, lens, n)
        # split('') -> [''] so lens >= 1 always; no div-by-zero
        frac = (lens - n_distinct) / lens
        return pa.table(
            {
                "url": t["url"],
                "n_tokens": pa.array(lens, pa.int64()),
                "n_distinct_tokens": pa.array(n_distinct, pa.int64()),
                "dup_token_frac": sql_round(pa.array(frac, pa.float64()), 4),
            }
        )

    if _documents_empty(sf_dir):
        return ray.data.from_arrow(f(_EMPTY_PAGES))
    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


REPETITION_STATS_SQL = """
SELECT cast(doc_id AS varchar) AS url,
       cast(length(toks) AS bigint)                AS n_tokens,
       cast(length(list_distinct(toks)) AS bigint) AS n_distinct_tokens,
       round((length(toks) - length(list_distinct(toks)))
             / cast(length(toks) AS double), 4)    AS dup_token_frac
FROM (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS toks FROM documents)
"""


# ---- composite keep/drop quality filter ------------------------------------


def quality_filter_verdicts(sf_dir: str) -> ray.data.Dataset:
    """The C4/Gopher-style filter chain a training-data pipeline runs
    end-to-end: per document, a keep/drop verdict plus the FIRST rule
    that fired (precedence: too_short -> bad_token_len -> repetitive ->
    bad_lang).  All signals reuse the vectorized kernels of
    ``quality_score`` / ``repetition_stats``; embarrassingly parallel.

    Thresholds (the user-extension surface a real pipeline tunes):
    >= 20 tokens, mean token length in [3.0, 5.2], duplicate-token
    fraction <= 0.6, lang in {en, de, fr}."""
    ds = documents_as_pages(sf_dir)

    def f(t: pa.Table) -> pa.Table:
        text = pc.coalesce(t["text"], "").combine_chunks()
        toks = pc.split_pattern(text, pattern=" ")
        n = len(t)
        lens = pc.list_value_length(toks).to_numpy().astype(np.int64)
        n_distinct = _distinct_per_row(toks, lens, n)
        n_chars = pc.cast(pc.utf8_length(text), pa.int64()).to_numpy()
        # identical operand order to the SQL so float compares agree
        avg_tok = (n_chars - (lens - 1)) / lens
        dup_frac = (lens - n_distinct) / lens
        lang = pc.coalesce(t["lang"], "").to_numpy(zero_copy_only=False)
        lang_ok = np.isin(lang, np.array(["en", "de", "fr"], dtype=object))

        too_short = lens < 20
        bad_tok = (avg_tok < 3.0) | (avg_tok > 5.2)
        repetitive = dup_frac > 0.6
        reason = np.full(n, "kept", dtype=object)
        reason[~lang_ok] = "bad_lang"
        reason[repetitive] = "repetitive"
        reason[bad_tok] = "bad_token_len"
        reason[too_short] = "too_short"
        keep = ~(too_short | bad_tok | repetitive | ~lang_ok)
        return pa.table(
            {
                "url": t["url"],
                "keep": pa.array(keep),
                "reason": pa.array(reason.tolist(), pa.string()),
            }
        )

    if _documents_empty(sf_dir):
        return ray.data.from_arrow(f(_EMPTY_PAGES))
    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


QUALITY_FILTER_VERDICTS_SQL = """
WITH q AS (
  SELECT cast(doc_id AS varchar) AS url,
         coalesce(lang, '') AS lng,
         length(string_split(coalesce(text, ''), ' ')) AS n_tokens,
         (length(coalesce(text, '')) - (length(string_split(coalesce(text, ''), ' ')) - 1))
             / cast(length(string_split(coalesce(text, ''), ' ')) AS double) AS avg_tok,
         (length(string_split(coalesce(text, ''), ' '))
             - length(list_distinct(string_split(coalesce(text, ''), ' '))))
             / cast(length(string_split(coalesce(text, ''), ' ')) AS double) AS dup_frac
  FROM documents
)
SELECT url,
       (n_tokens >= 20 AND avg_tok >= 3.0 AND avg_tok <= 5.2
        AND dup_frac <= 0.6 AND lng IN ('en', 'de', 'fr'))    AS keep,
       CASE WHEN n_tokens < 20                  THEN 'too_short'
            WHEN avg_tok < 3.0 OR avg_tok > 5.2 THEN 'bad_token_len'
            WHEN dup_frac > 0.6                 THEN 'repetitive'
            WHEN lng NOT IN ('en', 'de', 'fr')  THEN 'bad_lang'
            ELSE 'kept' END                                    AS reason
FROM q
"""
