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

    Banded (Ukkonen) DP: any cell with ``|i-j| >= bound`` has true
    distance >= bound, so only the ``2*bound-1``-wide diagonal band is
    computed, with values SATURATED at ``bound`` (sound: a saturated
    input can only produce cells >= bound — the equal-char diagonal
    copies it unchanged, every other move adds 1 — so "< bound" cells
    are always exact).  Early exit when a whole band row saturates.
    Pure-python cells beat the previous full-row numpy DP ~6x at
    bound=10 on ~150-char strings: 19 cells/row in scalar code vs five
    vectorized ops on 150-wide arrays whose per-call overhead dominated
    the extraction profile (65% of ExtractUnits wall time)."""
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
