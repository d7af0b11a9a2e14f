"""Levenshtein vs a brute-force reference implementation and the J4
threshold boundary (LOCDB-V3/imgProcessing.py:771-798, :420)."""

import numpy as np

from automatic_reference_extractor_ray.functions.editdist import (
    _banded_lt, levenshtein, levenshtein_lt)


def _brute(a: str, b: str) -> int:
    m = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
    for i in range(len(a) + 1):
        m[i][0] = i
    for j in range(len(b) + 1):
        m[0][j] = j
    for i in range(1, len(a) + 1):
        for j in range(1, len(b) + 1):
            m[i][j] = min(m[i - 1][j] + 1, m[i][j - 1] + 1,
                          m[i - 1][j - 1] + (a[i - 1] != b[j - 1]))
    return m[len(a)][len(b)]


def test_known_pairs():
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein("", "abc") == 3
    assert levenshtein("abc", "") == 3
    assert levenshtein("same", "same") == 0
    assert levenshtein("flaw", "lawn") == 2


def test_random_vs_brute():
    rng = np.random.default_rng(42)
    alphabet = "abcde"
    for _ in range(60):
        a = "".join(rng.choice(list(alphabet), rng.integers(0, 12)))
        b = "".join(rng.choice(list(alphabet), rng.integers(0, 12)))
        assert levenshtein(a, b) == _brute(a, b), (a, b)


def test_threshold_boundary():
    base = "abcdefghijklmnopqrst"
    nine = "XXXXXXXXX" + base[9:]        # distance 9
    ten = "XXXXXXXXXX" + base[10:]       # distance 10
    assert levenshtein(base, nine) == 9
    assert levenshtein(base, ten) == 10
    assert levenshtein_lt(base, nine, 10)        # suppressed by J4
    assert not levenshtein_lt(base, ten, 10)     # kept by J4


def test_length_shortcut():
    assert not levenshtein_lt("a" * 5, "a" * 30, 10)


def test_bitparallel_vs_banded_vs_exact():
    """Property cross-check of all three implementations: the Myers
    bit-parallel bound test, the banded scalar DP, and the exact
    vectorized distance, over random strings straddling the bound."""
    rng = np.random.default_rng(7)
    alphabet = list("abcd")
    for _ in range(400):
        a = "".join(rng.choice(alphabet, rng.integers(0, 40)))
        b = "".join(rng.choice(alphabet, rng.integers(0, 40)))
        bound = int(rng.integers(1, 16))
        want = levenshtein(a, b) < bound
        assert levenshtein_lt(a, b, bound) == want, (a, b, bound)
        assert _banded_lt(a, b, bound) == want, (a, b, bound)
