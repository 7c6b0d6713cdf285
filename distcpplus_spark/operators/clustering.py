"""Density clustering and diversity selection for corpus curation.

Two operators a training-data pipeline runs over embedding spaces:

- ``grid_dbscan`` — DBSCAN (Ester et al., KDD'96) with grid-cell
  blocking: candidate neighbor pairs come from an equi-join on
  eps-sized grid cells (each point probes its 3x3 cell neighborhood),
  never from the O(n^2) pair space. Exact — any pair within eps is
  within one cell of each other by construction.
- ``greedy_k_center`` — Gonzalez (1985) farthest-point traversal:
  k diverse exemplars with the 2-approximation guarantee for the
  k-center objective. The iterative driver-fold shape shared by
  k-means/PageRank/BPE here: per round ONE distributed pass
  (update running min-distance, take the global argmax); the model
  state on the driver is k vectors, KBs.

Scale design: grid_dbscan's shuffle carries (cell, id, x, y) — the
grid join is the 2D analogue of the LSH band join; density in
high-dim spaces goes through IVF/LSH blocking instead (see
operators/similarity.py). greedy_k_center is one narrow projection
per round with a TakeOrderedAndProject argmax — no shuffle of
vectors at all; localCheckpoint truncates the per-round lineage.

Reference parity: the reference engine (turn/DistCPPlus) has no
clustering surface — these belong to the LLM-pipeline tier the
north star adds on top (SURVEY.md §2c).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from distcpplus_spark.operators.dedup import union_find_components

_NEIGHBOR_OFFSETS = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]


def grid_dbscan(
    df: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    eps: float,
    min_pts: int,
) -> DataFrame:
    """DBSCAN over 2D points with grid-cell candidate blocking.

    Returns (id, role, cluster): role in {'core','border','noise'};
    cluster is the smallest core id of the density-connected
    component (NULL for noise). Semantics follow the original paper:
    the eps-neighborhood INCLUDES the point itself, core points have
    >= min_pts neighbors, clusters are connected components of
    core-core pairs within eps, border points attach to the min
    cluster among their core neighbors (deterministic tie-break —
    plain DBSCAN leaves border assignment order-dependent, which
    would be ungateable).

    All arithmetic stays in float64 with a fixed expression shape
    ((ax-bx)^2 + (ay-by)^2 <= eps^2), so any engine computing the
    same expression gets bit-identical comparisons.

    Scale: the candidate join is an equi-join on cell ids after a
    9-way explode of the probe side — each point meets only points
    in its 3x3 cell block, so candidate volume tracks true local
    density (the quantity DBSCAN measures anyway), never n^2. The
    component step is pointer-doubling label propagation.
    """
    pts = df.select(
        F.col(id_col).alias("_id"),
        F.col(x_col).cast("double").alias("_x"),
        F.col(y_col).cast("double").alias("_y"),
    )
    cell = lambda c: F.floor(c / F.lit(float(eps)))  # noqa: E731
    right = pts.select(
        F.col("_id").alias("_rid"),
        F.col("_x").alias("_rx"),
        F.col("_y").alias("_ry"),
        cell(F.col("_x")).alias("_rcx"),
        cell(F.col("_y")).alias("_rcy"),
    )
    offsets = F.array(
        *[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
          for dx, dy in _NEIGHBOR_OFFSETS]
    )
    probes = (
        pts.withColumn("_o", F.explode(offsets))
        .select(
            "_id", "_x", "_y",
            (cell(F.col("_x")) + F.col("_o.dx")).alias("_pcx"),
            (cell(F.col("_y")) + F.col("_o.dy")).alias("_pcy"),
        )
    )
    eps2 = float(eps) * float(eps)
    d2 = (F.col("_x") - F.col("_rx")) * (F.col("_x") - F.col("_rx")) + (
        F.col("_y") - F.col("_ry")
    ) * (F.col("_y") - F.col("_ry"))
    nbrs = (
        probes.join(
            right,
            (probes._pcx == right._rcx) & (probes._pcy == right._rcy),
        )
        .filter(d2 <= F.lit(eps2))
        .select("_id", "_rid")
    )
    counts = nbrs.groupBy("_id").agg(F.count("*").alias("_n"))
    core = counts.filter(F.col("_n") >= F.lit(int(min_pts))).select("_id")
    core_edges = (
        nbrs.join(core.withColumnRenamed("_id", "_ca"), nbrs._id == F.col("_ca"))
        .join(core.withColumnRenamed("_id", "_cb"), nbrs._rid == F.col("_cb"))
        .filter(F.col("_id") < F.col("_rid"))
        .select(F.col("_id").alias("id_a"), F.col("_rid").alias("id_b"))
    )
    labels = union_find_components(core_edges)
    # singleton-core fallback: a core point with no core neighbor is
    # its own cluster (it appears in no edge, so no label row exists)
    core_lbl = (
        core.join(labels, core._id == labels.node, "left")
        .select(
            "_id", F.coalesce("component", F.col("_id")).alias("_cluster")
        )
    )
    border_lbl = (
        nbrs.join(core_lbl.withColumnRenamed("_id", "_cid"), nbrs._rid == F.col("_cid"))
        .join(core_lbl.select(F.col("_id").alias("_self")), nbrs._id == F.col("_self"), "left_anti")
        .groupBy("_id")
        .agg(F.min("_cluster").alias("_cluster"))
    )
    return (
        pts.join(core_lbl.select(F.col("_id").alias("_k1"), F.col("_cluster").alias("_c1")), pts._id == F.col("_k1"), "left")
        .join(border_lbl.select(F.col("_id").alias("_k2"), F.col("_cluster").alias("_c2")), pts._id == F.col("_k2"), "left")
        .select(
            F.col("_id").alias(id_col),
            F.when(F.col("_c1").isNotNull(), F.lit("core"))
            .when(F.col("_c2").isNotNull(), F.lit("border"))
            .otherwise(F.lit("noise"))
            .alias("role"),
            F.coalesce("_c1", "_c2").cast("bigint").alias("cluster"),
        )
    )


def greedy_k_center(
    df: DataFrame, id_col: str, vec_col: str, k: int
) -> list[tuple[int, int, float | None]]:
    """Gonzalez farthest-point traversal: pick k diverse exemplars.

    Seed = the min-id point (deterministic); each round adds the
    point maximizing its min squared distance to the selected set
    (rounded to 6 decimals BEFORE the argmax, ties broken by min id
    — rounding-then-ranking is what keeps the trajectory identical
    across engines whose float folds differ in the last bits).

    Returns [(sel_round, id, min_d2_6)] with None for the seed's
    distance. 2-approximation for the k-center radius (Gonzalez 85).

    Scale: the frame keeps one running min-d2 column; each round is
    one map over the vectors (JVM zip_with/aggregate fold — strictly
    sequential, engine-portable order) plus a TakeOrderedAndProject
    argmax of ONE row. Selected vectors ride into the plan as
    literals (k * dim doubles — KBs); localCheckpoint truncates the
    per-round lineage like every driver-fold operator here.
    """
    pts = df.select(
        F.col(id_col).alias("_id"),
        F.transform(F.col(vec_col), lambda v: v.cast("double")).alias("_v"),
    ).localCheckpoint(eager=True)

    seed = pts.orderBy("_id").limit(1).collect()[0]
    out: list[tuple[int, int, float | None]] = [(0, seed["_id"], None)]
    cur = pts.withColumn("_md2", F.lit(None).cast("double"))
    center = seed["_v"]
    for rnd in range(1, k):
        lit_c = F.array(*[F.lit(float(x)) for x in center])
        d2 = F.aggregate(
            F.zip_with(F.col("_v"), lit_c, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        cur = cur.withColumn(
            "_md2",
            F.least(
                F.coalesce(F.col("_md2"), F.lit(float("inf"))),
                F.round(d2, 6),
            ),
        ).localCheckpoint(eager=True)
        top = (
            cur.filter(~F.col("_id").isin([r[1] for r in out]))
            .orderBy(F.desc("_md2"), F.asc("_id"))
            .limit(1)
            .collect()[0]
        )
        out.append((rnd, top["_id"], float(top["_md2"])))
        center = top["_v"]
    return out
