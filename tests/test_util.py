"""Unit tests for the deterministic hashing primitives (SURVEY.md §5.1)."""

import numpy as np

from dedup_ray.util import (
    TokenHasher,
    blake2b_u64,
    char_rolling_hashes,
    combine_rows_u64,
    minhash_perms,
    minhash_signatures,
    shingle_hashes,
    winnow_select,
)


def test_blake2b_u64_deterministic():
    assert blake2b_u64(b"hello") == blake2b_u64(b"hello")
    assert blake2b_u64(b"hello") != blake2b_u64(b"hellp")
    assert blake2b_u64(b"x", seed=1) != blake2b_u64(b"x", seed=2)


def test_token_hasher_cache_consistent():
    h1, h2 = TokenHasher(seed=7), TokenHasher(seed=7)
    a = h1.hash_tokens(["a", "b", "a"])
    b = h2.hash_tokens(["a", "b", "a"])
    np.testing.assert_array_equal(a, b)
    assert a[0] == a[2]
    assert a[0] != a[1]


def test_shingle_hashes_window_semantics():
    th = TokenHasher()
    t = th.hash_tokens(["w1", "w2", "w3", "w4", "w5"])
    s = shingle_hashes(t, 3)
    assert len(s) == 3
    # identical windows hash identically regardless of position
    t2 = th.hash_tokens(["w2", "w3", "w4"])
    s2 = shingle_hashes(t2, 3)
    assert s[1] == s2[0]
    # short doc -> one whole-doc shingle
    assert len(shingle_hashes(t[:2], 3)) == 1
    assert len(shingle_hashes(np.empty(0, dtype=np.uint64), 3)) == 0


def test_minhash_exact_equal_inputs():
    a, b = minhash_perms(16, seed=42)
    th = TokenHasher()
    s1 = shingle_hashes(th.hash_tokens("the quick brown fox jumps".split()), 3)
    all_sh = np.concatenate([s1, s1])
    offsets = np.array([0, len(s1)])
    sigs = minhash_signatures(all_sh, offsets, a, b)
    np.testing.assert_array_equal(sigs[0], sigs[1])


def test_minhash_matches_bruteforce():
    """Signature component p must equal min over shingles of a[p]*x+b[p]."""
    a, b = minhash_perms(8, seed=1)
    rng = np.random.Generator(np.random.PCG64(3))
    sh = rng.integers(0, 2**63, size=50, dtype=np.uint64)
    sigs = minhash_signatures(sh, np.array([0]), a, b)
    with np.errstate(over="ignore"):
        for p in range(8):
            assert sigs[0, p] == (a[p] * sh + b[p]).min()


def test_minhash_jaccard_estimate():
    """Est Jaccard from 256 perms within ~0.1 of true Jaccard."""
    a, b = minhash_perms(256, seed=5)
    rng = np.random.Generator(np.random.PCG64(11))
    base = rng.integers(0, 2**63, size=200, dtype=np.uint64)
    s1, s2 = base[:150], base[50:]  # |∩|=100, |∪|=200 → J=0.5
    allsh = np.concatenate([s1, s2])
    sigs = minhash_signatures(allsh, np.array([0, 150]), a, b)
    est = (sigs[0] == sigs[1]).mean()
    assert abs(est - 0.5) < 0.1


def test_minhash_empty_doc_sentinel():
    a, b = minhash_perms(4, seed=0)
    sh = np.array([123], dtype=np.uint64)
    sigs = minhash_signatures(sh, np.array([0, 1]), a, b)  # doc1 empty
    assert (sigs[1] == np.iinfo(np.uint64).max).all()
    assert not (sigs[0] == np.iinfo(np.uint64).max).all()


def test_combine_rows_u64():
    m = np.array([[1, 2], [1, 2], [2, 1]], dtype=np.uint64)
    out = combine_rows_u64(m)
    assert out[0] == out[1]
    assert out[0] != out[2]


def test_char_rolling_and_winnow_guarantee():
    """Winnowing guarantee: two strings sharing a substring of length
    >= gram + window - 1 share at least one selected fingerprint."""
    gram, window = 8, 13  # guarantee length 20
    shared = "abcdefghijklmnopqrstuvwxyz"  # 26 >= 20
    t1 = "PREFIX_ONE_" + shared + "_SUFFIX_A"
    t2 = "zzz" + shared + "_DIFFERENT_TAIL_HERE"
    h1, h2 = char_rolling_hashes(t1, gram), char_rolling_hashes(t2, gram)
    f1 = set(h1[winnow_select(h1, window)].tolist())
    f2 = set(h2[winnow_select(h2, window)].tolist())
    assert f1 & f2


def test_winnow_select_matches_naive_sliding_argmin():
    """The O(n) van Herk/Gil-Werman winnow_select must reproduce the
    naive sliding-window LEFTMOST argmin bit-exactly, including heavy
    ties and all-max windows (the tie rule decides which fingerprints
    anchor the substring pass — a drift would silently change edges)."""
    import numpy as np

    from dedup_ray.util import winnow_select

    def naive(hashes, window):
        n = len(hashes)
        if n == 0:
            return np.empty(0, dtype=np.int64)
        if n <= window:
            return np.array([int(np.argmin(hashes))], dtype=np.int64)
        sw = np.lib.stride_tricks.sliding_window_view(hashes, window)
        return np.unique(sw.argmin(axis=1) + np.arange(len(sw))).astype(np.int64)

    rng = np.random.Generator(np.random.PCG64(11))
    for _ in range(400):
        n = int(rng.integers(1, 500))
        w = int(rng.integers(1, 250))
        hi = int(rng.integers(2, 16))  # tiny range -> dense ties
        vals = rng.integers(0, hi, n).astype(np.uint64)
        assert np.array_equal(winnow_select(vals, w), naive(vals, w)), (n, w)
    allmax = np.full(300, np.iinfo(np.uint64).max, dtype=np.uint64)
    assert np.array_equal(winnow_select(allmax, 137), naive(allmax, 137))
