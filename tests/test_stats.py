"""Property tests for operators/stats.py (q323 gates cross-engine
parity; these pin the statistic itself on hand-computed cases)."""

import math

import pytest

from distcpplus_spark.operators.stats import ks_two_sample


def _run(spark, a, b):
    rows = [(float(v), "A") for v in a] + [(float(v), "B") for v in b]
    df = spark.createDataFrame(rows, "value double, grp string")
    return ks_two_sample(df, "value", "grp", "A", "B").collect()[0]


def test_ks_hand_computed_with_ties(spark):
    r = _run(spark, [1, 2, 3], [2, 3, 4])
    assert r["d_stat"] == pytest.approx(1 / 3)
    # the three mathematically-equal diffs are NOT IEEE-equal:
    # 1 - 2/3 (= 0.33333333333333337) > 1/3 > 2/3 - 1/3, so the sup
    # is attained only at v=3 — at_value is defined over the computed
    # doubles, and the oracle computes the same expression tree
    assert r["at_value"] == 3.0
    assert (r["n_a"], r["n_b"]) == (3, 3)
    assert r["p_approx"] == 1.0  # capped


def test_ks_disjoint_supports(spark):
    r = _run(spark, [1, 2], [10, 20])
    assert r["d_stat"] == 1.0
    assert r["at_value"] == 2.0
    assert r["p_approx"] == pytest.approx(2 * math.exp(-2.0))


def test_ks_identical_samples_and_dup_scaling(spark):
    r = _run(spark, [5, 6, 7], [5, 6, 7])
    assert r["d_stat"] == 0.0
    # duplicating both samples rescales counts but not the statistic
    r2 = _run(spark, [1, 2, 1, 2], [10, 20, 10, 20])
    assert r2["d_stat"] == 1.0 and (r2["n_a"], r2["n_b"]) == (4, 4)
