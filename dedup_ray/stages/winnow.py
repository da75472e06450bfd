"""Long-shared-substring pass (SURVEY.md §2B B11; BASELINE.json:6
"suffix-array pass for long substring dups") — implemented with
WINNOWING FINGERPRINTS (Schleimer, Wilkerson, Aiken: "Winnowing: Local
Algorithms for Document Fingerprinting", SIGMOD 2003) instead of a
distributed generalized suffix array.

Why winnowing and not a literal suffix array: the winnowing guarantee
is exactly the detection contract this stage needs — any substring of
length >= gram + window - 1 (= cfg.substring_min_len) shared by two
docs yields at least one shared selected fingerprint — and it maps to
plain Ray Data primitives (map_batches -> hash exchange -> verify) with
slim shuffle rows, no partition-local character budget, no
cross-partition miss modes.  A distributed SA gets the same answer only
within a routed partition; winnowing is global by construction.
(Ratified in SURVEY.md §2B B11; the verification step IS exact — the
anchor is extended character-by-character to the maximal common run, so
every emitted edge is a true >= substring_min_len shared substring.)

Stages (ALL grouped steps are vectorized partition kernels over the
custom hash exchange — core.partitioned_kernel; nothing is collected on
the driver):

  winners ──fingerprint──▶ anchors (anchor_hash, doc_id, pos)  [tasks]
    anchor_hash kernel ──▶ candidate id pairs (u_id, v_id, pu, pv)
        (hybrid per bucket, like lsh.fused_candidate_pairs: ALL pairs
        up to STAR_THRESHOLD docs — per-edge verification is not
        transitive, so a star through a decoy center that shares only
        the gram would kill real pairs — then a linear star above it;
        an oversized bucket is a boilerplate gram, and a true long run
        selects ~len/window fingerprints = that many more buckets)
    (u_id, v_id) kernel ──▶ at most MAX_ANCHOR_TRIES anchor pairs/pair
    union(text rows, pair member rows) + doc_id kernel ──▶ texts+urls
        attached to member rows (distributed semi-join: text rows whose
        doc appears in no pair are dropped IN the kernel — the corpus
        text moves through one exchange, never to the driver)
    (u_id, v_id) kernel ──▶ extend the anchor match left/right, keep
        pairs with a verified common substring >= substring_min_len
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa
import ray.data

from dedup_ray.config import DedupConfig
from dedup_ray.core import numeric_key_u64, partitioned_kernel, schema_names, segments
from dedup_ray.stages.lsh import STAR_THRESHOLD
from dedup_ray.util import char_rolling_hashes, ensure_doc_ids, winnow_select

MAX_ANCHOR_TRIES = 3

_EMPTY_ANCHORS = pa.table(
    {
        "anchor_hash": pa.array([], type=pa.int64()),
        "doc_id": pa.array([], type=pa.int64()),
        "pos": pa.array([], type=pa.int64()),
    }
)

_EMPTY_PAIRS = pa.table(
    {
        "u_id": pa.array([], type=pa.int64()),
        "v_id": pa.array([], type=pa.int64()),
        "pu": pa.array([], type=pa.int64()),
        "pv": pa.array([], type=pa.int64()),
    }
)

_EMPTY_EDGES = pa.table(
    {
        "u": pa.array([], type=pa.string()),
        "v": pa.array([], type=pa.string()),
        "u_id": pa.array([], type=pa.int64()),
        "v_id": pa.array([], type=pa.int64()),
        "kind": pa.array([], type=pa.string()),
        "score": pa.array([], type=pa.float64()),
    }
)

_PAIR_KEY_COLS = ["u_id", "v_id"]


class Fingerprinter:
    """Winnowing fingerprints per doc (vectorized rolling hash +
    sliding-window argmin); emits slim (anchor_hash, doc_id, pos) rows."""

    def __init__(self, cfg: DedupConfig) -> None:
        self.g = cfg.winnow_gram
        self.w = cfg.winnow_window

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = ensure_doc_ids(batch)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        hashes, out_ids, poss = [], [], []
        for did, text in zip(ids.tolist(), batch["text"].to_pylist()):
            t = text or ""
            hs = char_rolling_hashes(t, self.g)
            if len(hs) == 0:
                continue
            sel = winnow_select(hs, self.w)
            hashes.append(hs[sel])
            out_ids.append(np.full(len(sel), did, dtype=np.int64))
            poss.append(sel)
        if not hashes:
            return _EMPTY_ANCHORS
        return pa.table(
            {
                # int64 reinterpret: uint64 groupby keys break Ray's
                # sort-boundary sampling (see lsh.py)
                "anchor_hash": pa.array(
                    np.concatenate(hashes).view(np.int64), type=pa.int64()
                ),
                "doc_id": pa.array(np.concatenate(out_ids), type=pa.int64()),
                "pos": pa.array(np.concatenate(poss), type=pa.int64()),
            }
        )


@functools.lru_cache(maxsize=8)
def _worker_fingerprinter(cfg: DedupConfig) -> Fingerprinter:
    return Fingerprinter(cfg)


def _fingerprint_batch(batch: pa.Table, cfg: DedupConfig) -> pa.Table:
    return _worker_fingerprinter(cfg)(batch)


def anchor_candidate_pairs(
    anchors: ray.data.Dataset, *, num_partitions: int | None = None
) -> ray.data.Dataset:
    """anchor_hash partition kernel -> star-topology candidate id pairs
    carrying both anchor positions (fully numeric lexsorts; millions of
    singleton anchor buckets cost one sort, not one UDF call each)."""

    def star_kernel(g: pa.Table) -> pa.Table:
        k = g["anchor_hash"].to_numpy(zero_copy_only=False)
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        pos = g["pos"].to_numpy(zero_copy_only=False)
        order = np.lexsort((pos, ids, k))
        ks, is_, ps = k[order], ids[order], pos[order]
        # first occurrence of each (k, doc): one anchor per doc per hash
        first = np.ones(len(ks), dtype=bool)
        if len(ks) > 1:
            first[1:] = (ks[1:] != ks[:-1]) | (is_[1:] != is_[:-1])
        ks_f, is_f, ps_f = ks[first], is_[first], ps[first]
        starts, lens = segments(ks_f)
        multi = lens >= 2
        if not multi.any():
            return _EMPTY_PAIRS
        out_u, out_v, out_pu, out_pv = [], [], [], []
        for s, L in zip(starts[multi].tolist(), lens[multi].tolist()):
            if L <= STAR_THRESHOLD:
                # ALL pairs: substring verification is per-edge and NOT
                # transitive, so a pure star through the min-id doc is
                # lossy — a "decoy" center that shares only the GRAM
                # (not a >= substring_min_len run) would kill every
                # real pair routed through it.  Same hybrid as
                # lsh.fused_candidate_pairs.
                iu, jv = np.triu_indices(L, k=1)
                out_u.append(is_f[s + iu])
                out_v.append(is_f[s + jv])
                out_pu.append(ps_f[s + iu])
                out_pv.append(ps_f[s + jv])
                continue
            # oversized bucket = a boilerplate gram.  Verification is
            # per-edge and NOT transitive, so a pure star misses a true
            # pair whenever the min-id center shares only the gram (a
            # decoy): keep the linear star AND add all-pairs within
            # deterministic id-rank slices of STAR_THRESHOLD docs —
            # bounded ~L*(S+1)/2 candidates total, catching same-slice
            # true pairs directly.  A long TRUE run still selects
            # ~len/winnow_window fingerprints (independent buckets as
            # further chances); residual worst case (every selected
            # gram boilerplate-hot AND the pair split across slices) is
            # the price of a linear candidate bound, and it is LOGGED,
            # never silent.
            import logging

            logging.getLogger(__name__).warning(
                "substring anchor bucket of %d docs above STAR_THRESHOLD "
                "%d: star + sliced all-pairs candidates", L, STAR_THRESHOLD,
            )
            out_u.append(np.full(L - 1, is_f[s], dtype=np.int64))
            out_v.append(is_f[s + 1 : s + L])
            out_pu.append(np.full(L - 1, ps_f[s], dtype=np.int64))
            out_pv.append(ps_f[s + 1 : s + L])
            for a0 in range(0, L - 1, STAR_THRESHOLD):
                Lc = min(STAR_THRESHOLD, L - a0)
                if Lc < 2:
                    break
                iu, jv = np.triu_indices(Lc, k=1)
                out_u.append(is_f[s + a0 + iu])
                out_v.append(is_f[s + a0 + jv])
                out_pu.append(ps_f[s + a0 + iu])
                out_pv.append(ps_f[s + a0 + jv])
        return pa.table(
            {
                "u_id": pa.array(np.concatenate(out_u), type=pa.int64()),
                "v_id": pa.array(np.concatenate(out_v), type=pa.int64()),
                "pu": pa.array(np.concatenate(out_pu), type=pa.int64()),
                "pv": pa.array(np.concatenate(out_pv), type=pa.int64()),
            }
        )

    return partitioned_kernel(
        anchors,
        lambda t: t["anchor_hash"].to_numpy(zero_copy_only=False).view(np.uint64),
        star_kernel,
        num_partitions=num_partitions or 64,
        empty_result=_EMPTY_PAIRS,
    )


def dedupe_anchor_pairs(
    pairs: ray.data.Dataset, *, num_partitions: int | None = None
) -> ray.data.Dataset:
    """Keep at most MAX_ANCHOR_TRIES anchor pairs per (u_id, v_id) so
    the verify stage never attaches a text more than a few times
    (vectorized rank-within-segment, numeric keys)."""

    def kernel(g: pa.Table) -> pa.Table:
        us = g["u_id"].to_numpy(zero_copy_only=False)
        vs = g["v_id"].to_numpy(zero_copy_only=False)
        pu = g["pu"].to_numpy(zero_copy_only=False)
        pv = g["pv"].to_numpy(zero_copy_only=False)
        order = np.lexsort((pv, pu, vs, us))
        us_s, vs_s = us[order], vs[order]
        n = len(us_s)
        firsts = np.ones(n, dtype=bool)
        if n > 1:
            firsts[1:] = (us_s[1:] != us_s[:-1]) | (vs_s[1:] != vs_s[:-1])
        starts = np.flatnonzero(firsts).astype(np.int64)
        seg_id = np.cumsum(firsts) - 1
        rank = np.arange(n) - starts[seg_id]
        keep = order[rank < MAX_ANCHOR_TRIES]
        return g.take(pa.array(np.sort(keep)))

    return partitioned_kernel(
        pairs,
        lambda t: numeric_key_u64(t, _PAIR_KEY_COLS),
        kernel,
        num_partitions=num_partitions or 64,
        empty_result=_EMPTY_PAIRS,
    )


_TALL_EMPTY = pa.table(
    {
        "gkey": pa.array([], type=pa.int64()),
        "u_id": pa.array([], type=pa.int64()),
        "v_id": pa.array([], type=pa.int64()),
        "slot": pa.array([], type=pa.int32()),
        "pu": pa.array([], type=pa.int64()),
        "pv": pa.array([], type=pa.int64()),
        "text": pa.array([], type=pa.string()),
        "url": pa.array([], type=pa.string()),
    }
)

_ATTACH_EMPTY = pa.table(
    {
        "u_id": pa.array([], type=pa.int64()),
        "v_id": pa.array([], type=pa.int64()),
        "slot": pa.array([], type=pa.int32()),
        "pu": pa.array([], type=pa.int64()),
        "pv": pa.array([], type=pa.int64()),
        "text": pa.array([], type=pa.string()),
        "url": pa.array([], type=pa.string()),
    }
)


def _text_rows(t: pa.Table) -> pa.Table:
    if "url" not in t.column_names or len(t) == 0:
        return _TALL_EMPTY
    t = ensure_doc_ids(t)
    n = len(t)
    z = pa.array(np.zeros(n, dtype=np.int64))
    return pa.table(
        {
            "gkey": t["doc_id"],
            "u_id": z,
            "v_id": z,
            "slot": pa.array(np.full(n, -1, dtype=np.int32)),
            "pu": z,
            "pv": z,
            "text": t["text"],
            "url": t["url"],
        }
    )


def _pair_member_rows(t: pa.Table) -> pa.Table:
    if "u_id" not in t.column_names or len(t) == 0:
        return _TALL_EMPTY
    u = t["u_id"].combine_chunks()
    v = t["v_id"].combine_chunks()
    pu = t["pu"].combine_chunks()
    pv = t["pv"].combine_chunks()
    n = len(t)
    return pa.table(
        {
            "gkey": pa.concat_arrays([u, v]),
            "u_id": pa.concat_arrays([u, u]),
            "v_id": pa.concat_arrays([v, v]),
            "slot": pa.array(
                np.concatenate([np.zeros(n, dtype=np.int32), np.ones(n, dtype=np.int32)])
            ),
            "pu": pa.concat_arrays([pu, pu]),
            "pv": pa.concat_arrays([pv, pv]),
            "text": pa.nulls(2 * n, type=pa.string()),
            "url": pa.nulls(2 * n, type=pa.string()),
        }
    )


def _attach_kernel(g: pa.Table) -> pa.Table:
    """Per doc-id segment: copy the slot=-1 row's text+url onto member
    rows — vectorized segment-start gathers (same shape as
    lsh.verify_pairs' attach).  Text rows with no member rows (docs in
    no candidate pair) are dropped here: the distributed semi-join."""
    gkeys = g["gkey"].to_numpy(zero_copy_only=False)
    slots = g["slot"].to_numpy(zero_copy_only=False)
    order = np.lexsort((slots, gkeys))  # text row (-1) first per segment
    gs = gkeys[order]
    starts, lens = segments(gs)
    slots_sorted = slots[order]
    has_text = slots_sorted[starts] == -1
    seg_id = np.repeat(np.arange(len(starts)), lens)
    member = (slots_sorted >= 0) & has_text[seg_id]
    if not member.any():
        return _ATTACH_EMPTY
    take_rows = pa.array(order[member])
    src = pa.array(order[starts[seg_id][member]])
    return pa.table(
        {
            "u_id": g["u_id"].take(take_rows),
            "v_id": g["v_id"].take(take_rows),
            "slot": g["slot"].take(take_rows),
            "pu": g["pu"].take(take_rows),
            "pv": g["pv"].take(take_rows),
            "text": g["text"].take(src),
            "url": g["url"].take(src),
        }
    )


def verify_substring_pairs(
    pairs: ray.data.Dataset,
    winners: ray.data.Dataset,
    cfg: DedupConfig,
    *,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Attach both texts per candidate pair via the union + doc_id
    partition-kernel semi-join (texts never reach the driver; docs in
    no pair are dropped in the attach kernel), then extend each anchor
    match to its maximal run; keep pairs with a verified common
    substring >= substring_min_len."""
    P = num_partitions or 64
    text_cols = ["url", "text"] + (
        ["doc_id"] if "doc_id" in schema_names(winners) else []
    )
    tall = winners.select_columns(text_cols).map_batches(
        _text_rows, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        pairs.map_batches(_pair_member_rows, batch_format="pyarrow", zero_copy_batch=True)
    )

    attached = partitioned_kernel(
        tall,
        lambda t: t["gkey"].to_numpy(zero_copy_only=False).view(np.uint64),
        _attach_kernel,
        num_partitions=P,
        empty_result=_ATTACH_EMPTY,
    )

    min_len = cfg.substring_min_len
    gram = cfg.winnow_gram
    exact_fallback = cfg.exact_substring_fallback

    def extend_kernel(g: pa.Table) -> pa.Table:
        """Per (u_id, v_id) segment — vectorized segmentation; the
        character extension itself is the per-pair verification work
        (bounded by MAX_ANCHOR_TRIES attempts per pair)."""
        us = g["u_id"].to_numpy(zero_copy_only=False)
        vs = g["v_id"].to_numpy(zero_copy_only=False)
        slots = g["slot"].to_numpy(zero_copy_only=False)
        pus = g["pu"].to_numpy(zero_copy_only=False)
        pvs = g["pv"].to_numpy(zero_copy_only=False)
        order = np.lexsort((slots, pvs, pus, vs, us))
        us_s, vs_s = us[order], vs[order]
        n = len(us_s)
        firsts = np.ones(n, dtype=bool)
        if n > 1:
            firsts[1:] = (us_s[1:] != us_s[:-1]) | (vs_s[1:] != vs_s[:-1])
        starts = np.flatnonzero(firsts).astype(np.int64)
        lens = np.diff(np.concatenate([starts, [n]])).astype(np.int64)
        texts = g["text"].to_pylist()
        urls = g["url"].to_pylist()
        out_u, out_v, out_s = [], [], []
        out_uid, out_vid = [], []
        for s, L in zip(starts.tolist(), lens.tolist()):
            rows = order[s : s + L]
            t_u = t_v = url_u = url_v = None
            tried = set()
            attempts = []
            for r in rows.tolist():
                sl = slots[r]
                if sl == 0:
                    if t_u is None:
                        t_u, url_u = texts[r], urls[r]
                elif sl == 1 and t_v is None:
                    t_v, url_v = texts[r], urls[r]
                key = (int(pus[r]), int(pvs[r]))
                if key not in tried:
                    tried.add(key)
                    attempts.append(key)
            if t_u is None or t_v is None:
                continue
            best = 0
            for a, b in attempts:
                if t_u[a : a + gram] != t_v[b : b + gram]:
                    continue  # rolling-hash collision
                left = 0
                while (
                    a - left - 1 >= 0
                    and b - left - 1 >= 0
                    and t_u[a - left - 1] == t_v[b - left - 1]
                ):
                    left += 1
                right = 0
                while (
                    a + gram + right < len(t_u)
                    and b + gram + right < len(t_v)
                    and t_u[a + gram + right] == t_v[b + gram + right]
                ):
                    right += 1
                best = max(best, left + gram + right)
                if best >= min_len:
                    break
            if 0 < best < min_len and exact_fallback:
                # (best == 0 means no anchor gram actually matched —
                # a 64-bit hash collision; nothing worth settling)
                # anchor extension under-measures when the anchor's
                # first occurrence is a decoy (shared content repeated
                # elsewhere in one doc); settle exactly with the
                # pair-local suffix-automaton LCS — the suffix-array-
                # equivalent verifier of record (BASELINE.json:6)
                from dedup_ray.util import lcs_length

                best = lcs_length(t_u, t_v)
            if best >= min_len:
                out_u.append(url_u)
                out_v.append(url_v)
                out_uid.append(int(us_s[s]))
                out_vid.append(int(vs_s[s]))
                out_s.append(float(best))
        if not out_u:
            return _EMPTY_EDGES
        return pa.table(
            {
                "u": pa.array(out_u, type=pa.string()),
                "v": pa.array(out_v, type=pa.string()),
                "u_id": pa.array(out_uid, type=pa.int64()),
                "v_id": pa.array(out_vid, type=pa.int64()),
                "kind": pa.array(["substring"] * len(out_u), type=pa.string()),
                "score": pa.array(out_s, type=pa.float64()),
            }
        )

    return partitioned_kernel(
        attached,
        lambda t: numeric_key_u64(t, _PAIR_KEY_COLS),
        extend_kernel,
        num_partitions=P,
        empty_result=_EMPTY_EDGES,
    )


def substring_edges(
    winners: ray.data.Dataset, cfg: DedupConfig
) -> ray.data.Dataset:
    """winners (url, text[, doc_id]) -> verified substring edges.
    Fingerprinting runs as tasks with a per-worker singleton (see
    minhash._worker_hasher for the pattern)."""
    fp_cols = ["url", "text"] + (
        ["doc_id"] if "doc_id" in schema_names(winners) else []
    )
    anchors = winners.select_columns(fp_cols).map_batches(
        _fingerprint_batch,
        fn_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=cfg.batch_size,
    )
    pairs = dedupe_anchor_pairs(
        anchor_candidate_pairs(anchors, num_partitions=cfg.num_partitions),
        num_partitions=cfg.num_partitions,
    )
    return verify_substring_pairs(
        pairs, winners, cfg, num_partitions=cfg.num_partitions
    )
