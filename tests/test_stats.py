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


def _pava(rates, weights):
    """Reference pool-adjacent-violators (sequential pooling).

    Returns the fitted value per ORIGINAL bin (one entry per input)."""
    blocks = [[r * w, w, 1] for r, w in zip(rates, weights)]  # sum, w, nbins
    i = 0
    while i < len(blocks) - 1:
        if blocks[i][0] / blocks[i][1] > blocks[i + 1][0] / blocks[i + 1][1]:
            blocks[i][0] += blocks[i + 1][0]
            blocks[i][1] += blocks[i + 1][1]
            blocks[i][2] += blocks[i + 1][2]
            del blocks[i + 1]
            if i > 0:
                i -= 1
        else:
            i += 1
    out = []
    for s, w, nb in blocks:
        out.extend([s / w] * nb)
    return out


def test_isotonic_minimax_equals_pava():
    """The q375 closed form max_{l<=i} min_{j>=i} mean(y[l..j]) must
    equal sequential pool-adjacent-violators on weighted bins."""
    import itertools
    import random

    rng = random.Random(7)
    for trial in range(50):
        n = rng.randint(1, 9)
        rates = [rng.randint(0, 10) / 10.0 for _ in range(n)]
        weights = [rng.randint(1, 5) for _ in range(n)]
        # minimax closed form on weighted means
        pos = [r * w for r, w in zip(rates, weights)]
        def wmean(l, j):
            return sum(pos[l : j + 1]) / sum(weights[l : j + 1])
        minimax = [
            max(min(wmean(l, j) for j in range(i, n)) for l in range(i + 1))
            for i in range(n)
        ]
        per_bin = _pava(rates, weights)
        assert all(
            abs(a - b) < 1e-12 for a, b in zip(minimax, per_bin)
        ), (rates, weights, minimax, per_bin)
        # monotone non-decreasing
        assert all(
            minimax[i] <= minimax[i + 1] + 1e-12 for i in range(n - 1)
        )


def test_skyline_partitioning_independent(spark):
    from distcpplus_spark.operators.stats import skyline_2d
    from pyspark.sql import functions as F

    pts = [
        (1, 0.0, 5.0),   # skyline
        (2, 0.0, 5.0),   # exact duplicate of a skyline point: kept
        (3, 1.0, 5.0),   # dominated by 1 (same y, larger x)
        (4, 1.0, 7.0),   # skyline
        (5, 2.0, 9.0),   # skyline
        (6, 2.0, 8.0),   # dominated by 5
        (7, 3.0, 9.0),   # dominated by 5 (same y, larger x)
        (8, 0.5, 4.0),   # dominated by 1
    ]
    df = spark.createDataFrame(pts, "vec_id long, x double, y double")
    want = {1, 2, 4, 5}
    for nparts in (1, 3, 8):
        got = {
            r["vec_id"]
            for r in skyline_2d(
                df.repartition(nparts), "x", "y", "vec_id"
            ).collect()
        }
        assert got == want, (nparts, got)


def test_skyline_matches_bruteforce_random(spark):
    import random

    from distcpplus_spark.operators.stats import skyline_2d

    rng = random.Random(13)
    pts = [
        (i, round(rng.uniform(0, 1), 3), round(rng.uniform(0, 1), 3))
        for i in range(300)
    ]
    brute = {
        i
        for i, x, y in pts
        if not any(
            (qx <= x and qy >= y and (qx < x or qy > y))
            for _, qx, qy in pts
        )
    }
    df = spark.createDataFrame(pts, "vec_id long, x double, y double")
    got = {
        r["vec_id"]
        for r in skyline_2d(df.repartition(5), "x", "y", "vec_id").collect()
    }
    assert got == brute


def test_skyline_multibatch_fold(spark):
    """Force multiple Arrow batches per partition: per-batch skyline
    passes would leak cross-batch-dominated points (the sf0.1 sweep
    regression); the incremental fold must not."""
    import random

    from distcpplus_spark.operators.stats import skyline_2d

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "16")
    try:
        rng = random.Random(29)
        pts = [
            (i, round(rng.uniform(0, 1), 3), round(rng.uniform(0, 1), 3))
            for i in range(400)
        ]
        brute = {
            i
            for i, x, y in pts
            if not any(
                (qx <= x and qy >= y and (qx < x or qy > y))
                for _, qx, qy in pts
            )
        }
        df = spark.createDataFrame(pts, "vec_id long, x double, y double")
        got = {
            r["vec_id"]
            for r in skyline_2d(
                df.repartition(4), "x", "y", "vec_id"
            ).collect()
        }
        assert got == brute
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", old
        )
