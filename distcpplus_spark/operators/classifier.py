"""Distributed logistic-regression training — the quality-classifier
stage of a training-data pipeline (the role fasttext/linear filters
play in public LLM data recipes), as a pure DataFrame driver-fold.

Why hand-rolled: the container has no MLlib-free dependency worth
adding for a d≈6 linear model, and the driver-fold pattern (one
aggregation job per iteration, model coefficients as plan literals)
is exactly the k-means/PageRank/BPE shape this engine already uses —
the model is KBs on the driver, the DATA never leaves executors.

Scale shape per iteration: ONE hash-aggregation over the corpus
computing the d+1 gradient sums (whole-stage codegen — the sigmoid
is column arithmetic, no UDF); the d+1 result doubles fold through
the driver into the next iteration's literals. Features are
standardized once up front (one stats aggregation) so a fixed
learning rate behaves across feature scales.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sigmoid(z):
    return 1.0 / (1.0 + F.exp(-z))


def standardize(df: DataFrame, feature_cols: list[str]):
    """One aggregation for per-feature mean/std; returns (df with
    _f0.._fk standardized columns, stats dict)."""
    stats_row = df.agg(
        *[F.avg(c).alias(f"_mu_{c}") for c in feature_cols],
        *[F.stddev_pop(c).alias(f"_sd_{c}") for c in feature_cols],
    ).collect()[0]
    out = df
    stats = {}
    for i, c in enumerate(feature_cols):
        mu = float(stats_row[f"_mu_{c}"])
        sd = float(stats_row[f"_sd_{c}"]) or 1.0
        stats[c] = (mu, sd)
        out = out.withColumn(f"_f{i}", (F.col(c) - mu) / sd)
    return out, stats


def logreg_train(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iters: int = 25,
    lr: float = 0.5,
    l2: float = 0.0,
) -> dict:
    """Batch gradient descent for binary logistic regression.

    Returns {"weights": [w0..wk], "bias": b, "stats": {col: (mu, sd)},
    "n": row_count} — weights are in STANDARDIZED feature space (use
    ``logreg_score`` which replays the same standardization).
    Deterministic given the input (fixed init, fixed iteration count;
    floating-point sums vary only at machine epsilon)."""
    d = len(feature_cols)
    sdf, stats = standardize(df, feature_cols)
    y = F.col(label_col).cast("double")
    sdf = sdf.select(*[f"_f{i}" for i in range(d)], y.alias("_y"))
    sdf = sdf.persist()
    n = sdf.count()  # materialize once; every iteration reuses the cache
    w = [0.0] * d
    b = 0.0
    try:
        for _ in range(iters):
            z = F.lit(b)
            for i in range(d):
                z = z + F.lit(w[i]) * F.col(f"_f{i}")
            err = _sigmoid(z) - F.col("_y")
            grad_row = sdf.agg(
                *[F.sum(err * F.col(f"_f{i}")).alias(f"_g{i}") for i in range(d)],
                F.sum(err).alias("_gb"),
            ).collect()[0]
            for i in range(d):
                g = grad_row[f"_g{i}"] / n + l2 * w[i]
                w[i] -= lr * g
            b -= lr * (grad_row["_gb"] / n)
    finally:
        sdf.unpersist()
    return {"weights": w, "bias": b, "stats": stats, "n": n}


def logreg_score(
    df: DataFrame, model: dict, feature_cols: list[str],
    out_col: str = "quality_prob",
) -> DataFrame:
    """Score rows with a trained model — pure column arithmetic (the
    standardization constants and weights are plan literals), so the
    classifier runs inside the scan at any scale."""
    z = F.lit(model["bias"])
    for i, c in enumerate(feature_cols):
        mu, sd = model["stats"][c]
        z = z + F.lit(model["weights"][i]) * ((F.col(c) - mu) / sd)
    return df.withColumn(out_col, _sigmoid(z))
