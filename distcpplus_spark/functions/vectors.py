"""Vector math over array<float>/array<double> columns — JVM-side.

Built on zip_with/aggregate higher-order functions: no Python UDF, no
Arrow transfer, stays in codegen. For very wide vectors (>4k dims) a
Pandas UDF over numpy becomes competitive; at 64-1024 dims these win.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic accumulation order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def l2_norm(v: Column) -> Column:
    return F.sqrt(dot(v, v))


def cosine_similarity(a: Column, b: Column) -> Column:
    """cos(a,b) = a·b / (|a||b|); inputs assumed already double arrays."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def l2_distance(a: Column, b: Column) -> Column:
    diff2 = F.zip_with(a, b, lambda x, y: (x - y) * (x - y))
    return F.sqrt(
        F.aggregate(diff2, F.lit(0.0).cast("double"), lambda acc, x: acc + x)
    )


def hyperplane_signs(v: Column, planes: list[list[float]]) -> Column:
    """LSH bucket key: sign bits of projections onto fixed random
    hyperplanes, packed into a string like '1011...'. Deterministic
    given the plane list (seeded by the caller)."""
    bits = [F.when(dot(v, F.array(*[F.lit(p) for p in plane])) >= 0, "1").otherwise("0") for plane in planes]
    return F.concat(*bits)
