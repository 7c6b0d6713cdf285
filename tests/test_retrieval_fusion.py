"""Properties of the retrieval-fusion tier helpers (q325-q327).

mmr_select is pure driver-side math over a bounded candidate list —
these tests pin the greedy semantics the SQL oracle replays.
"""

from __future__ import annotations

import math

from distcpplus_spark.operators.similarity import mmr_select


def _unit(*xs):
    n = math.sqrt(sum(x * x for x in xs))
    return [x / n for x in xs]


def test_mmr_first_pick_is_max_relevance():
    cands = [(1, _unit(1, 0), 0.9), (2, _unit(0, 1), 0.95), (3, _unit(1, 1), 0.5)]
    out = mmr_select(cands, k=3, lam=0.7)
    assert out[0][1] == 2  # highest rel first, regardless of geometry


def test_mmr_lambda_one_is_pure_relevance_ranking():
    cands = [(i, _unit(1.0, float(i)), 1.0 - i * 0.1) for i in range(5)]
    out = mmr_select(cands, k=5, lam=1.0)
    assert [r[1] for r in out] == [0, 1, 2, 3, 4]


def test_mmr_penalizes_redundant_candidate():
    # v1 and v2 point the SAME direction (cos=1); v3 is orthogonal with
    # lower relevance. After v1 is taken, v2's diversity penalty is
    # 0.3*1.0, so v3 (0.7*0.6=0.42 > 0.7*0.9-0.3=0.33) must win round 1.
    cands = [
        (1, _unit(1, 0), 0.95),
        (2, _unit(2, 0), 0.90),
        (3, _unit(0, 1), 0.60),
    ]
    out = mmr_select(cands, k=2, lam=0.7)
    assert [r[1] for r in out] == [1, 3]


def test_mmr_tie_breaks_on_min_id_after_rounding():
    v = _unit(1, 0)
    cands = [(7, v, 0.5), (3, v, 0.5)]
    out = mmr_select(cands, k=1, lam=0.7)
    assert out[0][1] == 3


def test_mmr_returns_all_when_k_exceeds_candidates():
    cands = [(1, _unit(1, 0), 0.5), (2, _unit(0, 1), 0.4)]
    out = mmr_select(cands, k=10, lam=0.7)
    assert len(out) == 2
    assert [r[0] for r in out] == [0, 1]
