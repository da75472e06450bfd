"""DedupConfig — the single knob surface of the engine.

The reference tool's extension surface was CLI flags only (SURVEY.md
§2A A12: keep-preference direction, weights, empty handling, hash-db
path).  Here the analogous surface is one frozen dataclass whose hash is
recorded in every stage manifest (lineage), so "same shingle/signature
config" (BASELINE.json:14) is a checkable byte string.

Everything that could make two runs differ lives here: seeds, shingle
size, permutation count, banding, thresholds, skew caps.  No UDF may
consult wall-clock or unseeded randomness.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field


@dataclass(frozen=True)
class DedupConfig:
    # --- exact layer -------------------------------------------------
    #: include empty documents (text == "") in exact dedup; when False
    #: they are dropped before hashing (reference A9 analog: all empty
    #: files are mutually content-identical).
    keep_empty: bool = True

    # --- shingling / MinHash (BASELINE.json:6: 128 perms) ------------
    shingle_k: int = 5
    num_perms: int = 128
    #: lowercase + \w+ tokenization before shingling
    normalize: bool = True

    # --- LSH banding  (bands * rows_per_band == num_perms) -----------
    bands: int = 32
    rows_per_band: int = 4

    # --- candidate verification --------------------------------------
    #: target Jaccard similarity for "near duplicate"
    jaccard_tau: float = 0.8
    #: verification threshold applied to the *estimated* Jaccard
    #: (fraction of agreeing signature components).  Set below tau to
    #: absorb estimator variance (sigma ~ sqrt(tau(1-tau)/num_perms)
    #: ~= 0.035 at tau=0.8, 128 perms) so that recall on true-J >= tau
    #: pairs stays >= 0.99.
    verify_margin: float = 0.07

    # --- skew handling (BASELINE.json:6,14) --------------------------
    #: LSH buckets larger than this are salted into sub-buckets of at
    #: most this size; cross-salt connectivity recovered via per-salt
    #: representatives.  Every capped bucket is logged in counters —
    #: never silently truncated.
    bucket_cap: int = 64

    # --- substring pass (BASELINE.json:6) ----------------------------
    #: minimum shared-substring length (characters) that makes an edge
    substring_min_len: int = 200
    #: winnowing gram size g: fingerprint every g-char window's hash.
    #: Guarantee (winnowing theorem): any shared substring of length
    #: >= g + w - 1 shares at least one selected fingerprint, with
    #: window w = substring_min_len - winnow_gram + 1.
    winnow_gram: int = 64
    #: when anchor extension fails to reach substring_min_len, run the
    #: exact pair-local suffix-automaton LCS (util.lcs_length) as the
    #: verifier of record.  This closes the adversarial repetition gap:
    #: a doc whose shared block's content ALSO occurs earlier as a
    #: shorter decoy makes first-occurrence anchors extend at the decoy
    #: and under-measure the true shared run.  SEMANTIC (changes edge
    #: sets), so it participates in config_hash.
    exact_substring_fallback: bool = True

    # --- canonical-selection priority ---------------------------------
    #: optional pages column used as keep-priority (lower wins; None =
    #: uniform priority, canonical member == min-url cluster label).
    #: SEMANTIC: changes winner selection in members AND assignments,
    #: so it participates in config_hash — resuming a checkpoint dir
    #: after changing it re-runs those stages instead of silently
    #: reusing winners picked under the old priority.
    priority_col: str | None = None

    # --- ingest -------------------------------------------------------
    #: collapse duplicate urls (recrawls) to one row per url before
    #: hashing — keeps the latest warc_ts, deterministic tie-break
    #: (sources/pages.dedupe_recrawls).  SEMANTIC: changes the row set
    #: every stage sees, so it participates in config_hash.  Off by
    #: default: the url-unique precondition is the caller's contract,
    #: and the extra url-keyed exchange shouldn't tax inputs that
    #: already satisfy it.
    dedupe_recrawls: bool = False

    # --- determinism --------------------------------------------------
    seed: int = 0x5EED_D00D

    # --- execution hints (not semantics; excluded from config_hash) --
    num_partitions: int = field(default=64, compare=False)
    #: 2048 keeps the minhash/simhash per-batch temporaries (~75MB)
    #: cache-friendly; 4096 measurably regresses
    batch_size: int = field(default=2048, compare=False)
    #: connected-components strategy: "auto" (default; tree-reduce —
    #: fastest while the dup-incident forest fits one merge actor —
    #: degrading to label propagation automatically when the merged
    #: forest would cross FOREST_NODE_BUDGET, before any single actor
    #: concentrates it), "tree_reduce" (forced; warn-and-continue past
    #: the budget) or "label_prop" (forced hash-min label propagation —
    #: no single-task forest; for pathological dup rates).  Identical
    #: output every way, so it is an execution hint, not semantics.
    cc_method: str = field(default="auto", compare=False)

    _SEMANTIC_EXCLUDE = (
        "num_partitions",
        "batch_size",
        "cc_method",
    )

    def __post_init__(self) -> None:
        if self.bands * self.rows_per_band != self.num_perms:
            raise ValueError(
                f"bands({self.bands}) * rows_per_band({self.rows_per_band}) "
                f"must equal num_perms({self.num_perms})"
            )
        if self.winnow_gram >= self.substring_min_len:
            raise ValueError("winnow_gram must be < substring_min_len")
        if not (0.0 < self.jaccard_tau <= 1.0):
            raise ValueError(f"jaccard_tau must be in (0, 1], got {self.jaccard_tau}")
        if not (0.0 <= self.verify_margin < self.jaccard_tau):
            raise ValueError(
                "verify_margin must satisfy 0 <= margin < jaccard_tau "
                f"(got margin={self.verify_margin}, tau={self.jaccard_tau}); "
                "a non-positive verify threshold would pass every candidate"
            )
        if self.cc_method not in ("auto", "tree_reduce", "label_prop"):
            # catch the typo at construction, not hours later in the
            # final clustering stage of a long job
            raise ValueError(
                f"cc_method must be 'auto', 'tree_reduce' or "
                f"'label_prop', got {self.cc_method!r}"
            )

    @property
    def uniform_priority(self) -> bool:
        """True when no priority column is configured — the canonical
        member of every cluster is then by construction the min url."""
        return self.priority_col is None

    @property
    def verify_tau(self) -> float:
        return self.jaccard_tau - self.verify_margin

    @property
    def winnow_window(self) -> int:
        """Winnowing window w so detection of >= substring_min_len shared
        substrings is guaranteed: g + w - 1 == substring_min_len."""
        return self.substring_min_len - self.winnow_gram + 1

    def semantic_dict(self) -> dict:
        d = asdict(self)
        for k in self._SEMANTIC_EXCLUDE:
            d.pop(k, None)
        # the frozen extractor's identity IS semantics: every stage
        # hashes the text it produces, so an extractor change must
        # invalidate checkpoints (stages/extract.py's documented
        # contract — previously claimed but not actually hashed)
        from dedup_ray.stages.extract import EXTRACTOR_VERSION

        d["extractor_version"] = EXTRACTOR_VERSION
        return d

    def config_hash(self) -> str:
        """Stable hash of the semantic config — stamped into every stage
        manifest (lineage) and compared on resume."""
        blob = json.dumps(self.semantic_dict(), sort_keys=True).encode()
        return hashlib.sha256(blob).hexdigest()[:16]


DEFAULT_CONFIG = DedupConfig()
