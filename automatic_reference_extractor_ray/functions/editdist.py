"""Levenshtein distance — the reference's near-duplicate suppression
metric (LOCDB-V3/imgProcessing.py:771-798; applied space-stripped with
threshold < 10 at :414-448).

The reference computes the standard unit-cost edit distance with a full
O(n*m) Python DP matrix (its ``min(del+1, diag, ins+1)`` branch on equal
chars is the standard recurrence).  We implement the exact same distance
with a vectorized two-row DP: deletions/substitutions are elementwise;
the left-to-right insertion dependency is closed exactly by
``min-accumulate(row[j] - j) + j`` (min over k<=j of row[k] + (j-k)).
"""

from __future__ import annotations

from collections import Counter

import numpy as np


def levenshtein(a: str, b: str) -> int:
    """Standard unit-cost edit distance, vectorized along ``b``."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    bb = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    m = len(b)
    j = np.arange(m + 1, dtype=np.int64)
    prev = j.copy()
    for i, ca in enumerate(a, 1):
        row = np.empty(m + 1, dtype=np.int64)
        row[0] = i
        row[1:] = np.minimum(prev[1:] + 1, prev[:-1] + (bb != ord(ca)))
        # close under insertions: row[j] = min_{k<=j}(row[k] + (j-k))
        row = np.minimum.accumulate(row - j) + j
        prev = row
    return int(prev[-1])


def levenshtein_lt(a: str, b: str, bound: int) -> bool:
    """True iff ``levenshtein(a, b) < bound`` — the form the fuzzy
    anti-join J4 uses per candidate pair.

    Myers' bit-parallel DP (Myers 1999): the pattern's DP column lives
    in two bignum bitmasks, so each text character costs ~10 bitwise
    ops on ``m``-bit integers instead of a band of Python cell updates
    — measured ~4x over the banded scalar DP at bound=10 on ~150-char
    strings (which itself beat the full-row numpy DP; this loop was
    43% of ExtractUnits wall time).  ``score`` tracks D[m][j] exactly,
    and since the remaining suffix can lower it by at most one per
    character, ``score - remaining >= bound`` aborts hopeless pairs
    mid-text.  The banded DP survives below as ``_banded_lt`` — the
    property tests cross-check all three implementations."""
    n, m = len(a), len(b)
    if abs(n - m) >= bound:
        return False
    if a == b:
        return True
    if not n or not m:
        return max(n, m) < bound
    if m > n:                                # shorter string = pattern
        a, b, n, m = b, a, m, n
    mask = (1 << m) - 1
    peq: dict[str, int] = {}
    bit = 1
    for c in b:                              # pattern bits over the SHORT string
        peq[c] = peq.get(c, 0) | bit
        bit <<= 1
    pv, mv, score = mask, 0, m
    high = 1 << (m - 1)
    last = n - 1
    for j, c in enumerate(a):                # text = the LONG string
        eq = peq.get(c, 0)
        xv = eq | mv
        xh = (((eq & pv) + pv) ^ pv) | eq
        ph = mv | (~(xh | pv) & mask)
        mh = pv & xh
        if ph & high:
            score += 1
        elif mh & high:
            score -= 1
        ph = ((ph << 1) | 1) & mask
        mh = (mh << 1) & mask
        pv = mh | (~(xv | ph) & mask)
        mv = ph & xv
        if score - (last - j) >= bound:
            return False
    return score < bound


def _banded_lt(a: str, b: str, bound: int) -> bool:
    """Banded (Ukkonen) DP reference for ``levenshtein_lt``: any cell
    with ``|i-j| >= bound`` has true distance >= bound, so only the
    ``2*bound-1``-wide diagonal band is computed, with values SATURATED
    at ``bound`` (sound: a saturated input can only produce cells >=
    bound).  Early exit when a whole band row saturates."""
    n, m = len(a), len(b)
    if abs(n - m) >= bound:
        return False
    if a == b:
        return True
    if not n or not m:
        return max(n, m) < bound
    prev = [j if j < bound else bound for j in range(m + 1)]
    for i in range(1, n + 1):
        lo = max(1, i - bound + 1)
        hi = min(m, i + bound - 1)
        row = [bound] * (m + 1)
        if i < bound:
            row[0] = i
        ca = a[i - 1]
        best = bound
        for jj in range(lo, hi + 1):
            if ca == b[jj - 1]:
                c = prev[jj - 1]
            else:
                c = prev[jj - 1]
                pj = prev[jj]
                if pj < c:
                    c = pj
                rj = row[jj - 1]
                if rj < c:
                    c = rj
                c += 1
            if c > bound:
                c = bound
            row[jj] = c
            if c < best:
                best = c
        if best >= bound:
            return False
        prev = row
    return prev[m] < bound


def near_any(x: str, snapshot: list[tuple[str, Counter]], bound: int) -> bool:
    """True iff ``levenshtein(x, s) < bound`` for ANY (s, Counter(s)) in
    ``snapshot`` — the J4 anti-join inner loop with two sound pre-filters
    before the DP: the length gate, and the character-count lower bound
    (one unit edit changes the char multiset by at most one removal plus
    one insertion, so distance >= L1(count_a, count_b) / 2).  Counts are
    precomputed once per snapshot string, so comparing one candidate
    against N primaries does N cheap multiset diffs and almost never a
    DP."""
    cx = Counter(x)
    lx = len(x)
    for s, cs in snapshot:
        if abs(lx - len(s)) >= bound:
            continue
        l1 = sum((cx - cs).values()) + sum((cs - cx).values())
        if l1 >= 2 * bound:
            continue
        if levenshtein_lt(x, s, bound):
            return True
    return False


def snapshot_counts(strings: list[str]) -> list[tuple[str, Counter]]:
    return [(s, Counter(s)) for s in strings]
