"""Edge-case regressions for the round-13 vectorized similarity
kernels (round-14 advisor findings):

* duplicate ids inside one LSH bucket must not emit (id, id) pairs —
  the grouped kernel's positional upper-triangle needs the id-VALUE
  mask to match the old ``a._id < b._id`` join predicate;
* the kernels' EMPTY result frames must inherit the real id dtype
  (hardcoded int64 empties broke string-id corpora at the Arrow cast);
* ``_assign_lists`` with an empty centroid table must yield the fold's
  ``-1`` sentinel instead of raising on an unpackable (0,) shape.
"""
import pytest
from pyspark.sql import functions as F

from distcpplus_spark.operators.similarity import (
    _assign_lists,
    ann_cell_join,
    pairwise_above_threshold,
    to_double_array,
)


def _unit(axis, dim=8):
    v = [0.0] * dim
    v[axis] = 1.0
    return [float(x) for x in v]


def test_duplicate_ids_in_bucket_emit_no_self_pair(spark):
    # three rows, two sharing id=7 with IDENTICAL vectors (cos=1.0):
    # they land in the same LSH bucket and the positional triangle
    # alone would pair them as (7, 7)
    rows = [
        (7, _unit(0)),
        (7, _unit(0)),
        (9, _unit(0)),
    ]
    df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    got = {
        (r["id_a"], r["id_b"])
        for r in pairwise_above_threshold(
            df, "embedding", "vec_id", 0.9, n_planes=4
        ).collect()
    }
    assert (7, 7) not in got
    # the genuine cross-id pair survives (possibly twice via the dup row,
    # but always with distinct ids)
    assert all(a != b for a, b in got)
    assert (7, 9) in got


def test_pairwise_string_ids_empty_and_nonempty_paths(spark):
    rows = [("doc-a", _unit(0)), ("doc-b", _unit(0)), ("doc-c", _unit(1))]
    df = spark.createDataFrame(rows, "doc_id STRING, embedding ARRAY<DOUBLE>")
    # empty path: impossible threshold -> every bucket returns the
    # EMPTY frame, which must carry string dtype, not int64
    assert (
        pairwise_above_threshold(df, "embedding", "doc_id", 1.5, n_planes=4).count()
        == 0
    )
    # non-empty path round-trips string ids
    got = {
        (r["id_a"], r["id_b"])
        for r in pairwise_above_threshold(
            df, "embedding", "doc_id", 0.9, n_planes=4
        ).collect()
    }
    assert got == {("doc-a", "doc-b")}


def test_ann_cell_join_string_ids_with_empty_cells(spark):
    # left covers only ONE of the right's two cell directions, so the
    # cogroup kernel sees cells where a side is empty and must build
    # the dtype-correct empty frame for string ids
    left = spark.createDataFrame(
        [("L1", _unit(0)), ("L2", _unit(0))],
        "doc_id STRING, embedding ARRAY<DOUBLE>",
    )
    right = spark.createDataFrame(
        [("R1", _unit(0)), ("R2", _unit(1)), ("R3", _unit(1))],
        "doc_id STRING, embedding ARRAY<DOUBLE>",
    )
    out = ann_cell_join(
        left, right, "embedding", "doc_id", n_lists=2, iters=1, k=1
    ).collect()
    by_left = {r["left_id"]: r["right_id"] for r in out}
    assert set(by_left) <= {"L1", "L2"}
    assert all(isinstance(v, str) for v in by_left.values())


def test_assign_lists_empty_centroids_yields_sentinel(spark):
    c = spark.createDataFrame(
        [(1, _unit(0)), (2, _unit(1))],
        "vec_id BIGINT, embedding ARRAY<DOUBLE>",
    ).select(
        F.col("vec_id").alias("corpus_id"),
        to_double_array(F.col("embedding")).alias("_cv"),
    )
    centroids = spark.createDataFrame(
        [], "list_id BIGINT, _centroid ARRAY<DOUBLE>"
    )
    got = _assign_lists(c, centroids).collect()
    assert len(got) == 2
    assert all(r["list_id"] == -1 for r in got)
