"""Deterministic, vectorized 64-bit hashing primitives.

Python's builtin ``hash()`` is salted per process (PYTHONHASHSEED), so
it must never be used in UDFs: Ray retries / multi-process execution
would produce different hashes for the same input.  Everything here is
pure, seedable and numpy-vectorized.

All uint64 arithmetic deliberately wraps (mod 2^64).  The per-shingle
and per-band combiners are polynomial hashes with odd multipliers; the
MinHash permutation family is multiply-add over uint64
(Dietzfelbinger-style multiply-shift universal hashing) — a standard,
fast substitute for (a*x+b) mod Mersenne-prime at this signature width.
"""

from __future__ import annotations

import hashlib

import numpy as np

# odd 64-bit constants (from splitmix64 / golden-ratio families)
_POLY_C = np.uint64(0x9E3779B97F4A7C15)
_MIX_M1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX_M2 = np.uint64(0x94D049BB133111EB)

_U64 = np.uint64
_MASK64 = (1 << 64) - 1

# numpy >= 1.24 warns/errors on uint64 overflow in some paths; we want
# silent wraparound semantics everywhere in this module.
_ERRSTATE = np.errstate(over="ignore")


def blake2b_u64(data: bytes, *, seed: int = 0) -> int:
    """Stable 64-bit hash of bytes (blake2b/8, little-endian)."""
    h = hashlib.blake2b(data, digest_size=8, key=seed.to_bytes(8, "little"))
    return int.from_bytes(h.digest(), "little")


def hash_url(u: str) -> int:
    """Stable (process-independent) 64-bit url hash — the doc_id.
    Computed ONCE at ingest (stages/hashing.add_content_sha256) and
    carried as a column so hot band/exchange paths never re-hash
    strings (VERDICT r01 item 9)."""
    h = hashlib.blake2b((u or "").encode(), digest_size=8)
    return int.from_bytes(h.digest(), "little")


def hash_urls_u64(urls: list) -> np.ndarray:
    """Vectorized-loop hash_url over a list of strings -> uint64."""
    out = np.empty(len(urls), dtype=np.uint64)
    b2 = hashlib.blake2b
    for i, u in enumerate(urls):
        out[i] = int.from_bytes(b2((u or "").encode(), digest_size=8).digest(), "little")
    return out


def ensure_doc_ids(t, url_col: str = "url"):
    """Append ``doc_id`` (int64 reinterpret of hash_url) if absent.
    Fallback for tables built outside the ingest path (tests, ad-hoc
    fixtures); pipeline tables carry doc_id from add_content_sha256."""
    import pyarrow as pa

    if "doc_id" in t.column_names:
        return t
    ids = hash_urls_u64(t[url_col].to_pylist())
    return t.append_column("doc_id", pa.array(ids.view(np.int64), type=pa.int64()))


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer — decorrelates polynomial hashes."""
    with _ERRSTATE:
        x = x.astype(_U64, copy=True)
        x += _POLY_C
        x ^= x >> _U64(30)
        x *= _MIX_M1
        x ^= x >> _U64(27)
        x *= _MIX_M2
        x ^= x >> _U64(31)
    return x


class TokenHasher:
    """token string -> stable uint64, with a per-instance cache.

    Designed to live inside a map_batches ACTOR (state built once per
    worker, reused across batches — SURVEY.md §2B B7).  The cache makes
    repeated tokens (web text is Zipfian) nearly free; cold tokens cost
    one blake2b call.
    """

    __slots__ = ("_cache", "_seed")

    #: cache reset threshold: the hasher lives in per-worker singletons
    #: on long-lived workers streaming web-scale corpora, where distinct
    #: tokens run to hundreds of millions — unbounded, the dict would
    #: OOM the worker.  Zipf's law means the hot tokens repopulate
    #: within a batch or two after a clear, keeping the hit rate; the
    #: hash value itself never depends on cache state (determinism).
    CACHE_MAX = 2_000_000

    def __init__(self, seed: int = 0) -> None:
        self._cache: dict[str, int] = {}
        self._seed = seed

    def hash_tokens(self, tokens: list[str]) -> np.ndarray:
        cache = self._cache
        if len(cache) > self.CACHE_MAX:
            cache.clear()
        seed = self._seed
        out = np.empty(len(tokens), dtype=np.uint64)
        for i, t in enumerate(tokens):
            v = cache.get(t)
            if v is None:
                v = blake2b_u64(t.encode("utf-8", "surrogatepass"), seed=seed)
                cache[t] = v
            out[i] = v
        return out


def shingle_hashes(token_hashes: np.ndarray, k: int) -> np.ndarray:
    """Rolling polynomial hash over k consecutive token hashes.

    h[i] = finalize( sum_j C^(k-1-j) * t[i+j] )  (uint64 wraparound),
    vectorized as k shifted-array multiply-adds.  Returns an array of
    length max(0, n-k+1); a doc shorter than k tokens gets a single
    whole-doc shingle so tiny docs still participate.
    """
    n = len(token_hashes)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    if n < k:
        k = n
    m = n - k + 1
    with _ERRSTATE:
        acc = np.zeros(m, dtype=np.uint64)
        for j in range(k):
            acc = acc * _POLY_C + token_hashes[j : j + m]
    return splitmix64(acc)


def combine_rows_u64(mat: np.ndarray) -> np.ndarray:
    """Polynomial-combine each row of a (n, r) uint64 matrix to one
    uint64 — used to hash an LSH band (r signature components) into a
    single bucket key."""
    with _ERRSTATE:
        acc = np.zeros(len(mat), dtype=np.uint64)
        for j in range(mat.shape[1]):
            acc = acc * _POLY_C + mat[:, j]
    return splitmix64(acc)


def minhash_perms(num_perms: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (a, b) multiply-add parameters; a is odd."""
    rng = np.random.Generator(np.random.PCG64(seed))
    a = rng.integers(1, _MASK64, size=num_perms, dtype=np.uint64) | _U64(1)
    b = rng.integers(0, _MASK64, size=num_perms, dtype=np.uint64)
    return a, b


def minhash_signatures(
    all_shingles: np.ndarray,
    offsets: np.ndarray,
    a: np.ndarray,
    b: np.ndarray,
) -> np.ndarray:
    """MinHash signatures for a whole batch in one vectorized pass.

    ``all_shingles`` is the concatenation of every doc's shingle-hash
    array; ``offsets[i]`` is the start of doc i (len == n_docs, first
    element 0).  For each permutation p: min over each doc's slice of
    a[p]*x + b[p]  (uint64 wraparound) via ``np.minimum.reduceat`` —
    no per-doc Python loop.  Empty docs (zero shingles) get signature
    UINT64_MAX so they never collide in LSH buckets.

    Returns (n_docs, num_perms) uint64.
    """
    n_docs = len(offsets)
    num_perms = len(a)
    if len(all_shingles) == 0:
        return np.full((n_docs, num_perms), np.iinfo(np.uint64).max, dtype=np.uint64)
    # CACHE-BLOCKED: the naive loop streams the full shingle array from
    # DRAM once per permutation (~128 x 3 passes => tens of GB per task
    # batch), which saturates memory bandwidth and destroys multi-core
    # scaling.  Instead iterate L2-sized shingle chunks and apply ALL
    # permutations while the chunk is cache-resident; per-doc mins for
    # slices spanning chunks combine via np.minimum accumulation.
    # DRAM traffic drops to ~one read of the shingle array total.
    lengths = np.diff(np.append(offsets, len(all_shingles)))
    empty = lengths == 0
    # perm-major accumulator: out[p, lo:hi] writes are contiguous
    out = np.full((num_perms, n_docs), np.iinfo(np.uint64).max, dtype=np.uint64)
    N = len(all_shingles)
    CHUNK = 65536
    v = np.empty(CHUNK, dtype=np.uint64)
    with _ERRSTATE:
        for start in range(0, N, CHUNK):
            end = min(start + CHUNK, N)
            sh = all_shingles[start:end]
            # docs whose slices intersect [start, end)
            lo = max(0, int(np.searchsorted(offsets, start, side="right")) - 1)
            hi = int(np.searchsorted(offsets, end, side="left"))
            local_off = np.maximum(offsets[lo:hi] - start, 0)
            vv = v[: end - start]
            for p in range(num_perms):
                np.multiply(sh, a[p], out=vv)
                vv += b[p]
                # duplicate indices (empty docs) yield a bogus element
                # value here; masked wholesale after the loop
                mins = np.minimum.reduceat(vv, local_off)
                np.minimum(out[p, lo:hi], mins, out=out[p, lo:hi])
    out = np.ascontiguousarray(out.T)
    if empty.any():
        out[empty, :] = np.iinfo(np.uint64).max
    return out


def u64_matrix_to_binary(mat: np.ndarray) -> "pa.Array":
    """(n, k) uint64 matrix -> Arrow binary array, one k*8-byte value
    per row, built from a single data buffer (no per-row Python
    objects).  Used to carry MinHash signatures through joins — acero
    joins reject fixed_size_list payload columns."""
    import pyarrow as pa

    n, k = mat.shape
    width = k * 8
    data = pa.py_buffer(np.ascontiguousarray(mat, dtype=np.uint64).tobytes())
    offsets = pa.py_buffer((np.arange(n + 1, dtype=np.int32) * width).tobytes())
    return pa.Array.from_buffers(pa.binary(), n, [None, offsets, data])


def binary_to_u64_matrix(col, k: int) -> np.ndarray:
    """Arrow binary column (each value k*8 bytes) -> (n, k) uint64
    matrix, vectorized via the offsets + data buffers."""
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, k), dtype=np.uint64)
    buffers = col.buffers()
    offsets = np.frombuffer(buffers[1], dtype=np.int32, count=n + 1, offset=col.offset * 4)
    values = np.frombuffer(buffers[2], dtype=np.uint8)
    starts = offsets[:-1].astype(np.int64)
    idx = starts[:, None] + np.arange(k * 8, dtype=np.int64)[None, :]
    flat = values[idx.reshape(-1)].reshape(n, k * 8)
    return flat.view(np.uint64).reshape(n, k) if flat.flags.c_contiguous else np.ascontiguousarray(flat).view(np.uint64).reshape(n, k)


def char_rolling_hashes(text: str, gram: int) -> np.ndarray:
    """Stable hash of every ``gram``-char window of ``text`` (vectorized).

    Used by the winnowing substring pass.  Characters are mapped to
    uint64 codepoints and combined with the same polynomial family as
    shingle_hashes.  Returns length max(0, n-gram+1).
    """
    n = len(text)
    if n < gram:
        return np.empty(0, dtype=np.uint64)
    codes = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    m = n - gram + 1
    with _ERRSTATE:
        acc = np.zeros(m, dtype=np.uint64)
        # gram is ~64: 64 vector ops per doc, still far cheaper than a
        # Python loop over n windows.
        for j in range(gram):
            acc = acc * _POLY_C + codes[j : j + m]
    return splitmix64(acc)


def winnow_select(hashes: np.ndarray, window: int) -> np.ndarray:
    """Winnowing (Schleimer et al., SIGMOD 2003): positions of the
    minimum hash in every sliding window of ``window`` consecutive
    hashes; duplicates collapsed.  Guarantees every substring of length
    >= gram + window - 1 contributes at least one selected position.

    Returns sorted unique positions (int64).
    """
    n = len(hashes)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    if n <= window:
        return np.array([int(np.argmin(hashes))], dtype=np.int64)
    # van Herk / Gil-Werman sliding-window argmin, O(n) in ~10
    # vectorized passes.  The previous sliding_window_view argmin is
    # O(n*w) over a strided view (non-contiguous reads) and cost ~18 s
    # on a single 2.3M-char document at w~137; this runs in ~0.1 s and
    # reproduces its LEFTMOST-min-per-window tie rule bit-exactly
    # (numpy argmin picks the first occurrence), so fingerprints —
    # and the golden substring anchors — are unchanged.
    #
    # Blocks of size w: every window [i, i+w) is a block suffix [i, c)
    # plus (when i % w != 0, c = (i//w+1)*w) a next-block prefix
    # [c, i+w).  Per-block prefix/suffix running (min, leftmost-argmin)
    # come from 2D accumulates over the (nblocks, w) reshape; the
    # window argmin is the suffix one on ties (more-left positions).
    w = window
    m = n - w + 1
    nb = -(-n // w)
    pad = nb * w - n
    maxv = np.iinfo(np.uint64).max
    v = np.concatenate([hashes, np.full(pad, maxv, dtype=np.uint64)]).reshape(nb, w)
    idx2 = np.broadcast_to(np.arange(w, dtype=np.int64), (nb, w))

    # prefix: leftmost argmin over [block_start, j] — update only on
    # strictly-smaller (keeps the earlier position on ties)
    pfx_min = np.minimum.accumulate(v, axis=1)
    upd = np.ones((nb, w), dtype=bool)
    upd[:, 1:] = v[:, 1:] < pfx_min[:, :-1]
    pfx_arg = np.maximum.accumulate(np.where(upd, idx2, 0), axis=1)

    # suffix: leftmost argmin over [j, block_end) — scan reversed,
    # update on <= so the leftmost original position wins ties
    u = v[:, ::-1]
    sfx_min_r = np.minimum.accumulate(u, axis=1)
    updr = np.ones((nb, w), dtype=bool)
    updr[:, 1:] = u[:, 1:] <= sfx_min_r[:, :-1]
    sam_r = np.maximum.accumulate(np.where(updr, idx2, 0), axis=1)
    sfx_min = sfx_min_r[:, ::-1]
    sfx_arg = (w - 1) - sam_r[:, ::-1]

    base = (np.arange(nb, dtype=np.int64) * w)[:, None]
    pfx_min_f = pfx_min.reshape(-1)
    pfx_arg_f = (pfx_arg + base).reshape(-1)
    sfx_min_f = sfx_min.reshape(-1)
    sfx_arg_f = (sfx_arg + base).reshape(-1)

    i = np.arange(m, dtype=np.int64)
    j = i + w - 1  # last window position; in block i//w + 1 unless i%w==0
    aligned = (i % w) == 0
    right_min = np.where(aligned, np.uint64(maxv), pfx_min_f[j])
    left_min = sfx_min_f[i]
    mins = np.where(left_min <= right_min, sfx_arg_f[i], pfx_arg_f[j])
    return np.unique(mins).astype(np.int64)


def lcs_length(a: str, b: str) -> int:
    """Exact longest-common-substring length via a suffix automaton of
    ``a`` (Blumer et al. 1985 construction; the textbook online O(|a|)
    algorithm) traversed with ``b``.  This is the pair-local equivalent
    of a suffix-array pass (BASELINE.json:6): deterministic, exact, no
    hashing — used as the fallback verifier when anchor extension
    fails (stages/winnow.py) and as the test oracle for the winnowing
    guarantee.  O(|a| + |b|) time, O(|a|) states."""
    if not a or not b:
        return 0
    # suffix automaton of a
    link = [-1]
    length = [0]
    trans: list[dict] = [{}]
    last = 0
    for ch in a:
        cur = len(length)
        length.append(length[last] + 1)
        link.append(-1)
        trans.append({})
        p = last
        while p != -1 and ch not in trans[p]:
            trans[p][ch] = cur
            p = link[p]
        if p == -1:
            link[cur] = 0
        else:
            q = trans[p][ch]
            if length[p] + 1 == length[q]:
                link[cur] = q
            else:
                clone = len(length)
                length.append(length[p] + 1)
                link.append(link[q])
                trans.append(dict(trans[q]))
                while p != -1 and trans[p].get(ch) == q:
                    trans[p][ch] = clone
                    p = link[p]
                link[q] = clone
                link[cur] = clone
        last = cur
    # walk b
    v, cur_len, best = 0, 0, 0
    for ch in b:
        while v != 0 and ch not in trans[v]:
            v = link[v]
            cur_len = length[v]
        if ch in trans[v]:
            v = trans[v][ch]
            cur_len += 1
            if cur_len > best:
                best = cur_len
        else:
            v, cur_len = 0, 0
    return best
