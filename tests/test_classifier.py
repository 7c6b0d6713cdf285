"""Distributed logistic regression (operators/classifier.py) against
an independent numpy gradient-descent reference."""

import numpy as np
import pytest

from distcpplus_spark.operators.classifier import (
    logreg_score,
    logreg_train,
    standardize,
)


def _numpy_reference(X, y, iters, lr):
    """Same algorithm written independently with numpy: standardize,
    zero init, batch GD."""
    mu = X.mean(axis=0)
    sd = X.std(axis=0)
    sd[sd == 0] = 1.0
    Xs = (X - mu) / sd
    n, d = Xs.shape
    w = np.zeros(d)
    b = 0.0
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(Xs @ w + b)))
        err = p - y
        w -= lr * (Xs.T @ err / n)
        b -= lr * err.mean()
    return w, b


def _toy(spark, n=400, seed=9):
    rng = np.random.default_rng(seed)
    X = rng.normal(0, 1, (n, 3))
    X[:, 1] = X[:, 1] * 10 + 50  # unscaled feature exercises standardize
    logits = 1.8 * X[:, 0] - 0.15 * (X[:, 1] - 50) + 0.0 * X[:, 2] - 0.3
    y = (logits + rng.logistic(0, 1, n) > 0).astype(int)
    rows = [
        (float(a), float(b), float(c), int(t))
        for (a, b, c), t in zip(X, y)
    ]
    df = spark.createDataFrame(
        rows, "f1 DOUBLE, f2 DOUBLE, f3 DOUBLE, label INT"
    )
    return df.repartition(8), X, y


def test_matches_numpy_reference(spark):
    df, X, y = _toy(spark)
    model = logreg_train(df, ["f1", "f2", "f3"], "label", iters=15, lr=0.5)
    w_ref, b_ref = _numpy_reference(X, y.astype(float), iters=15, lr=0.5)
    assert np.allclose(model["weights"], w_ref, atol=1e-8)
    assert abs(model["bias"] - b_ref) < 1e-8


def test_learns_the_signal(spark):
    """Accuracy on the generating distribution beats the majority
    baseline and the true-signal feature gets the dominant weight."""
    df, X, y = _toy(spark, n=800)
    cols = ["f1", "f2", "f3"]
    model = logreg_train(df, cols, "label", iters=40, lr=0.5)
    scored = logreg_score(df, model, cols)
    from pyspark.sql import functions as F

    acc = scored.select(
        F.avg(
            ((F.col("quality_prob") > 0.5).cast("int") == F.col("label"))
            .cast("double")
        ).alias("acc")
    ).collect()[0]["acc"]
    majority = max(y.mean(), 1 - y.mean())
    assert acc > majority + 0.05
    w = model["weights"]
    assert abs(w[0]) > abs(w[2]) + 0.2  # real signal beats noise feature


def test_standardize_stats(spark):
    df, X, _ = _toy(spark)
    _, stats = standardize(df, ["f1", "f2", "f3"])
    assert abs(stats["f2"][0] - X[:, 1].mean()) < 1e-9
    assert abs(stats["f2"][1] - X[:, 1].std()) < 1e-9


def test_deterministic_across_runs(spark):
    df, _, _ = _toy(spark)
    cols = ["f1", "f2", "f3"]
    m1 = logreg_train(df, cols, "label", iters=10, lr=0.5)
    m2 = logreg_train(df, cols, "label", iters=10, lr=0.5)
    assert np.allclose(m1["weights"], m2["weights"], atol=1e-12)
    assert abs(m1["bias"] - m2["bias"]) < 1e-12
