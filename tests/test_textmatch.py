"""Aho-Corasick automaton properties (operators/textmatch.py).

count_matches counts ALL occurrences; the q337 oracle's
replace-length trick counts non-overlapping ones — they coincide only
for border-free patterns, so that property is asserted here too.
"""

from __future__ import annotations

import random
import re

from distcpplus_spark.operators.textmatch import (
    build_automaton,
    count_matches,
)

Q337_PATTERNS = ["data", "model", "spark", "table scan", "row batch"]


def _ref_counts(text: str, patterns: list[str]) -> dict[int, int]:
    out = {}
    for i, p in enumerate(patterns):
        n = len(re.findall(f"(?={re.escape(p)})", text))
        if n:
            out[i] = n
    return out


def test_matches_regex_on_random_soup():
    rng = random.Random(42)
    pats = ["ab", "abc", "bca", "aa", "table scan"]
    auto = build_automaton(pats)
    alphabet = "abct "
    for _ in range(200):
        text = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 80)))
        assert count_matches(text, auto) == _ref_counts(text, pats)


def test_overlapping_occurrences_counted():
    # 'aa' occurs 3 times in 'aaaa' (positions 0,1,2) — ALL occurrences
    auto = build_automaton(["aa"])
    assert count_matches("aaaa", auto) == {0: 3}


def test_pattern_inside_another_pattern_both_fire():
    auto = build_automaton(["he", "she", "hers"])
    c = count_matches("ushers", auto)
    assert c == {0: 1, 1: 1, 2: 1}


def test_q337_patterns_are_border_free():
    # border-free: no proper prefix equals a suffix, which makes
    # all-occurrence counts equal non-overlapping counts (the oracle's
    # replace trick). Guard the fixture property itself.
    for p in Q337_PATTERNS:
        for k in range(1, len(p)):
            assert p[:k] != p[-k:], f"{p!r} has border of length {k}"


def test_cross_token_phrase_matches():
    auto = build_automaton(Q337_PATTERNS)
    c = count_matches("a table scan beats a row batch table scan", auto)
    pats = {Q337_PATTERNS[i]: n for i, n in c.items()}
    assert pats == {"table scan": 2, "row batch": 1}


# --- q400's pigeonhole pre-filter: provably non-losing -------------
def _pigeonhole_passes(a: str, b: str) -> bool:
    """Python mirror of q400's pre-filter column expressions
    (Spark `x div 3` == Python floor division for non-negatives):
    length gate + one-of-three-pieces-verbatim-in-b."""
    if abs(len(a) - len(b)) > 2:
        return False
    t = len(a) // 3
    pieces = [a[:t], a[t : 2 * t], a[2 * t :]]
    return any(p in b for p in pieces)  # '' in b is True — safe


def _edit_dist(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_q400_prefilter_never_drops_a_true_match():
    """≤2 edit ops touch at most 2 of 3 contiguous pieces, so one
    piece survives verbatim — the intermediate-partitioning theorem
    the q400 pre-filter relies on. Randomized sweep: every pair at
    true edit distance ≤ 2 must pass the pre-filter."""
    rng = random.Random(42)
    alpha = "abcdefgh "
    checked = 0
    for _ in range(3000):
        n = rng.randint(0, 24)
        a = "".join(rng.choice(alpha) for _ in range(n))
        b = list(a)
        for _ in range(rng.randint(0, 2)):
            op = rng.choice(("sub", "ins", "del"))
            if op == "sub" and b:
                i = rng.randrange(len(b))
                b[i] = rng.choice(alpha)
            elif op == "ins":
                i = rng.randint(0, len(b))
                b.insert(i, rng.choice(alpha))
            elif op == "del" and b:
                del b[rng.randrange(len(b))]
        bs = "".join(b)
        if _edit_dist(a, bs) <= 2:
            checked += 1
            assert _pigeonhole_passes(a, bs), (a, bs)
    assert checked > 2500  # the sweep really exercised the theorem
