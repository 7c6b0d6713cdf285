"""Distributed PCA over an embedding column.

The 100 TB shape: covariance estimation is a single pass of per-batch
partial sums — each Arrow batch contributes one (n, sum_vec,
sum_outer) row, so the driver sees O(num_partitions) rows of
O(d + d^2) doubles (d=64 -> ~33 KB each), never the data. That is
exactly `RDD.treeAggregate`'s communication pattern expressed through
`mapInPandas`. The d x d eigensolve happens once on the driver
(numpy.linalg.eigh — d is the MODEL dimension, not the data size),
and projection back over the corpus is a broadcast-literal dot
product, fully JVM-side (zip_with + aggregate), no shuffle at all.

Reference parity: the reference engine (turn/DistCPPlus) has no
vector-analytics surface; this extends the repo's LLM-pipeline tier
(SURVEY.md §2b north-star) alongside operators/similarity.py.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _moment_partials(df: DataFrame, col: str, dim: int) -> list:
    """One row of (n, sum_vec, sum_outer) per Arrow batch; collect is
    bounded by batch count, not row count."""

    schema = T.StructType(
        [
            T.StructField("n", T.LongType(), False),
            T.StructField("s", T.ArrayType(T.DoubleType()), False),
            T.StructField("so", T.ArrayType(T.DoubleType()), False),
        ]
    )

    def part(batches):
        import pandas as pd

        for pdf in batches:
            mat = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[col]],
                dtype=np.float64,
            )
            if mat.size == 0:
                continue
            yield pd.DataFrame(
                {
                    "n": [mat.shape[0]],
                    "s": [mat.sum(axis=0).tolist()],
                    "so": [(mat.T @ mat).ravel().tolist()],
                }
            )

    return df.select(F.col(col).alias(col)).mapInPandas(part, schema).collect()


def fit_pca(df: DataFrame, col: str, k: int):
    """Fit PCA on an array<float|double> column. Returns
    (n, mean[d], components[k][d], eigvals_desc[d], cov[d][d])."""
    dim = len(df.select(col).first()[0])
    rows = _moment_partials(df, col, dim)
    n = sum(r["n"] for r in rows)
    s = np.zeros(dim)
    so = np.zeros((dim, dim))
    for r in rows:
        s += np.asarray(r["s"])
        so += np.asarray(r["so"]).reshape(dim, dim)
    mean = s / n
    cov = so / n - np.outer(mean, mean)
    # Population covariance; symmetrize against accumulation noise.
    cov = (cov + cov.T) / 2.0
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1]
    w = w[order]
    v = v[:, order]
    return n, mean, v[:, :k].T, w, cov


def project(df: DataFrame, col: str, components: np.ndarray) -> DataFrame:
    """Append proj_0..proj_{k-1}: dot products against broadcast
    component literals — pure zip_with/aggregate, no UDF, no shuffle."""
    out = df
    for i, comp in enumerate(np.asarray(components)):
        lit = F.array(*[F.lit(float(c)) for c in comp])
        out = out.withColumn(
            f"proj_{i}",
            F.aggregate(
                F.zip_with(
                    F.col(col).cast("array<double>"),
                    lit,
                    lambda a, b: a * b,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
    return out
