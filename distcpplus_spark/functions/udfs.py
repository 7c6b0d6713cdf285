"""The Python UDF surface (SURVEY.md §2b): scalar pandas UDF, grouped
applyInPandas UDAF, and a plain row UDF registration helper.

Rules of the slow path (pyspark_guide): built-in expressions beat any
UDF — everything in functions/vectors.py and functions/text.py stays
JVM-side for exactly that reason. When Python is unavoidable, use
Arrow-batched pandas UDFs (columnar transfer, numpy vectorization),
never row-at-a-time ``F.udf`` in a hot path. The row-UDF helper exists
for API completeness and for logic too irregular to vectorize.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


@pandas_udf(T.DoubleType())
def cosine_pandas(a: pd.Series, b: pd.Series) -> pd.Series:
    """Vectorized cosine over array columns via numpy — the Arrow slow
    path. Crossover vs the JVM zip_with/aggregate expression is around
    ~4k dims; below that prefer functions.vectors.cosine_similarity.
    """
    import numpy as np

    av = np.stack(a.to_numpy())
    bv = np.stack(b.to_numpy())
    num = (av * bv).sum(axis=1)
    den = np.sqrt((av * av).sum(axis=1)) * np.sqrt((bv * bv).sum(axis=1))
    return pd.Series(num / den)


OLS_SCHEMA = T.StructType(
    [
        T.StructField("grp", T.StringType(), False),
        T.StructField("n", T.LongType(), False),
        T.StructField("slope", T.DoubleType(), True),
        T.StructField("intercept", T.DoubleType(), True),
    ]
)


def ols_per_group(df: DataFrame, key: str, x: str, y: str) -> DataFrame:
    """Per-group least-squares fit y ~ x via applyInPandas — the
    grouped-map UDAF shape: each group's rows arrive as one pandas
    DataFrame, the return rows are the aggregate.

    Scale: shuffle on ``key`` distributes groups across executors;
    each group must fit in one worker's memory (fine for statistical
    fits; for billion-row groups switch to the algebraic form
    slope = (n·Σxy − ΣxΣy)/(n·Σx² − (Σx)²) with built-in aggregates).
    """

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        xs = pdf[x].to_numpy(dtype=float)
        ys = pdf[y].to_numpy(dtype=float)
        n = len(pdf)
        denom = n * (xs * xs).sum() - xs.sum() ** 2
        if n < 2 or denom == 0:
            slope, intercept = None, None
        else:
            slope = (n * (xs * ys).sum() - xs.sum() * ys.sum()) / denom
            intercept = (ys.sum() - slope * xs.sum()) / n
        return pd.DataFrame(
            [(str(pdf[key].iloc[0]), n, slope, intercept)],
            columns=["grp", "n", "slope", "intercept"],
        )

    return df.select(key, x, y).groupBy(key).applyInPandas(fit, OLS_SCHEMA)


def register_row_udf(
    spark: SparkSession, name: str, fn, returnType: str = "string"
):
    """Register a plain row-at-a-time Python UDF for SQL use
    (``spark.sql("SELECT my_fn(col) ...")``). Deliberately thin: exists
    so user logic can plug into the SQL surface; performance guidance
    is to prefer pandas UDFs (Arrow) for anything per-row numeric."""
    return spark.udf.register(name, fn, returnType)
