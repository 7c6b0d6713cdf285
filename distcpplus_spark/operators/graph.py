"""Distributed graph primitives: PageRank power iteration and
degree-oriented triangle counting.

Reference parity: the reference engine (turn/DistCPPlus, a file
copier) has no graph surface; these belong to the corpus-analysis
tier the north star adds (link-graph quality signals for web-scale
training data — PageRank as a document-quality prior, triangle
density as a spam/link-farm signal).

Scale design:
- ``pagerank`` is the canonical driver-fold iteration shape this
  engine already uses for k-means/BPE (operators/classifier.py,
  bpe.py): each round is ONE distributed contribution join + ONE
  aggregate shuffle keyed on the destination node; only loop control
  sits on the driver. Edges are hash-partitioned by ``src`` once and
  reused every round (the rank join re-keys on the same column, so
  AQE reuses the exchange); lineage is truncated by a lazy
  localCheckpoint every 4 rounds — on a real cluster use
  ``checkpoint`` to HDFS so a 50-iteration run doesn't replay the
  whole DAG on executor loss.
- ``count_triangles`` uses the degree-orientation trick (Cohen 2009;
  Suri & Vassilvitskii WWW'11 "Counting triangles and the curse of
  the last reducer"): orient every undirected edge from the
  (degree, id)-smaller endpoint to the larger, enumerate wedges only
  between OUT-neighbors, and close them with an equi-join back on
  the oriented edge list. Out-degree under this orientation is
  O(sqrt(m)) for any graph, so wedge volume is O(m^1.5) worst-case
  instead of sum(deg^2) — the hub node that makes the naive
  wedge join explode (the "last reducer") contributes almost no
  wedges because nearly all its edges point INTO it. Every step is
  an equi-join or hash agg; nothing is ever all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iters: int = 8,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list.

    Returns (node, rank) for every node that appears as a source.
    Uses the classic uniform-teleport recurrence
    ``rank = (1-d) + d * sum(rank_in / out_deg)`` with rank mass
    initialized to 1 per node (the un-normalized form — ranks are
    comparable, not a distribution; dangling mass is NOT
    redistributed, matching the fixed-point of engines that drop it).
    Fixed ``iters`` keeps the result deterministic for the oracle
    gate; production convergence looping adds a delta aggregate per
    round without changing the per-round plan.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    out_deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    # round-14 (guide §2.4): out_deg is loop-invariant — attach it to
    # the cached edge frame ONCE instead of re-joining it every
    # round (one fewer join operator per iteration; the per-row
    # expression rank/deg is unchanged, so ranks stay bit-identical)
    e = e.join(out_deg, "src").repartition("src").cache()
    nodes = e.select(F.col("src").alias("node")).distinct()
    ranks = nodes.withColumn("rank", F.lit(1.0))
    for i in range(iters):
        contribs = (
            e.join(ranks, e["src"] == ranks["node"])
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("deg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        ranks = nodes.join(contribs, "node", "left").select(
            "node",
            (
                F.lit(1.0 - damping)
                + damping * F.coalesce(F.col("s"), F.lit(0.0))
            ).alias("rank"),
        )
        if i % 4 == 3:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def count_triangles(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle counts for an undirected graph given as an
    edge list (either or both directions; self-loops and duplicate
    edges are dropped).

    Returns (node, n_triangles) for every node in >= 1 triangle.
    Each triangle {u, v, w} is enumerated exactly once (at its
    (degree, id)-minimal vertex) and credited to all three corners.

    The orientation comparator is the lexicographic (degree, id)
    pair — a TOTAL order, which is what makes "wedge + closing edge"
    exact: for a wedge u->v, u->w emitted with (deg_v, v) <
    (deg_w, w), the closing undirected edge {v, w}, if present, is
    stored oriented exactly as v->w, so one equi-join finds it.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("n"))
        .unionAll(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("deg"))
    )
    with_deg = (
        e.join(deg.withColumnRenamed("n", "a"), "a")
        .withColumnRenamed("deg", "deg_a")
        .join(
            deg.withColumnRenamed("n", "b").withColumnRenamed("deg", "deg_b"),
            "b",
        )
    )
    a_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    oriented = with_deg.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(a_first, F.col("deg_b")).otherwise(F.col("deg_a")).alias(
            "dv"
        ),
    )
    x = oriented.alias("x")
    y = oriented.alias("y")
    wedges = x.join(
        y,
        (F.col("x.u") == F.col("y.u"))
        & (
            (F.col("x.dv") < F.col("y.dv"))
            | (
                (F.col("x.dv") == F.col("y.dv"))
                & (F.col("x.v") < F.col("y.v"))
            )
        ),
    ).select(
        F.col("x.u").alias("t_u"),
        F.col("x.v").alias("t_v"),
        F.col("y.v").alias("t_w"),
    )
    closed = wedges.join(
        oriented.select(F.col("u").alias("t_v"), F.col("v").alias("t_w")),
        ["t_v", "t_w"],
    )
    corners = (
        closed.select(F.col("t_u").alias("node"))
        .unionAll(closed.select(F.col("t_v").alias("node")))
        .unionAll(closed.select(F.col("t_w").alias("node")))
    )
    return corners.groupBy("node").agg(F.count("*").alias("n_triangles"))


def bfs_distances(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int = 6,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
) -> DataFrame:
    """Multi-source BFS: hop distance from the nearest source node,
    over a directed edge list (pass both directions for undirected
    graphs). Returns (node, dist) for every node reached within
    ``max_hops``.

    Level-synchronous relaxation: each round joins the current
    distance frame to the edge list and keeps the per-node min of
    (old dist, neighbor dist + 1) — one equi-join + one min-agg
    shuffle per round, the same driver-fold shape as pagerank above.
    Convergence early-stops: a round that changes no distance ends the loop
    (one scalar count per round — driver sees ONE number, never
    rows), so a graph whose eccentricity from the sources is k costs
    k+1 rounds regardless of max_hops. Distances are monotone
    non-increasing per node, so early stop returns exactly the
    max_hops fixpoint.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    e = e.repartition("src").cache()
    dist = sources.select(F.col(node).alias("node")).distinct().withColumn(
        "dist", F.lit(0)
    )
    for i in range(max_hops):
        relaxed = (
            e.join(dist, e["src"] == dist["node"])
            .select(F.col("dst").alias("node"), (F.col("dist") + 1).alias("d"))
            .groupBy("node")
            .agg(F.min("d").alias("d"))
        )
        nxt = (
            dist.join(relaxed, "node", "full")
            .select(
                "node",
                F.least(
                    F.coalesce(F.col("dist"), F.lit(max_hops + 1)),
                    F.coalesce(F.col("d"), F.lit(max_hops + 1)),
                ).alias("dist"),
            )
            .localCheckpoint(eager=False)
        )
        changed = (
            nxt.join(dist.withColumnRenamed("dist", "_old"), "node", "left")
            .filter(
                F.col("_old").isNull() | (F.col("dist") != F.col("_old"))
            )
            .count()
        )
        dist = nxt
        if changed == 0:
            break
    return dist.filter(F.col("dist") <= max_hops)


def random_walks(
    edges: DataFrame,
    starts: DataFrame,
    walk_len: int = 4,
    walks_per_node: int = 2,
    seed: int = 7,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
) -> DataFrame:
    """Seeded DETERMINISTIC random walks (the DeepWalk/node2vec
    p=q=1 sampling stage): ``walks_per_node`` walks of ``walk_len``
    steps from each start node, where step i of walk w from node s
    picks out-neighbor index ``mix(s, w, i, seed) % out_deg`` among
    the destination-sorted neighbors. Returns
    (start, walk, step, node) with step 0 = the start itself.

    Determinism is the point: the walk is a pure function of
    (start, walk, step, seed), so re-execution after task retries,
    resumes, or engine swaps reproduces the corpus bit-for-bit — the
    same integer-mixer discipline as every sampler here (no RNG
    state). The mixer is two-round (affine mod 1000003, then
    squared mod 1000003): one affine round on dense consecutive ids
    steps by a constant residue and biases the choice — the q311
    lesson. Start ids must fit ``id * 2654435761`` in int64
    (id < ~3.4e9).

    Dead ends (no out-edges) freeze the walk in place — the walk
    still emits walk_len+1 rows, tail pinned at the dead end.

    Scale: per step ONE equi-join on the current node against the
    indexed adjacency (neighbor index = a per-src partitioned
    window, built once) — walk state is (start, walk, cur), never
    the path; the emitted corpus streams out as a union of per-step
    frames. Hot nodes skew the adjacency join like any equi-join —
    salt or split upstream if a super-hub dominates.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    e = e.distinct()
    from pyspark.sql.window import Window as W

    nbrs = e.withColumn(
        "idx",
        F.row_number().over(W.partitionBy("src").orderBy("dst")) - 1,
    )
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    cur = (
        starts.select(F.col(node).alias("start"))
        .distinct()
        .select(
            "start",
            F.explode(
                F.sequence(F.lit(0), F.lit(int(walks_per_node) - 1))
            ).alias("walk"),
        )
        .withColumn("cur", F.col("start"))
    )
    frames = [cur.withColumn("step", F.lit(0))]
    for i in range(walk_len):
        m = (
            F.col("start") * F.lit(2654435761)
            + F.col("walk") * F.lit(97003)
            + F.lit(i * 57 + seed)
        ) % F.lit(1000003)
        stepped = (
            cur.join(deg, deg["src"] == cur["cur"], "left")
            .withColumn("_pick", (m * m) % F.lit(1000003) % F.col("deg"))
            .join(
                nbrs.select(
                    F.col("src").alias("_ns"),
                    F.col("dst").alias("_nd"),
                    F.col("idx").alias("_ni"),
                ),
                (F.col("_ns") == F.col("cur"))
                & (F.col("_ni") == F.col("_pick")),
                "left",
            )
            .select(
                "start",
                "walk",
                F.coalesce(F.col("_nd"), F.col("cur")).alias("cur"),
            )
        )
        cur = stepped
        frames.append(cur.withColumn("step", F.lit(i + 1)))
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.select(
        "start", "walk", "step", F.col("cur").alias(node)
    )


def k_core(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 60,
) -> DataFrame:
    """Iterative peeling to the k-core: the maximal subgraph in which
    every node has degree >= k. Input is an undirected graph given as
    a directed edge list containing BOTH directions (dedup'd); each
    round computes per-node degrees and drops every node below k —
    the fixpoint is reached when no node drops, and convergence is
    checked exactly (a round that removes nothing terminates).

    Returns (node, core_degree) for the surviving nodes, with
    core_degree the degree INSIDE the core.

    Scale: each round is one hash agg (degrees) + two semi-joins
    (filter both endpoints); only the converged/not-converged scalar
    reaches the driver. Lineage is truncated every round with an
    eager localCheckpoint — peeling depth is data-dependent, and an
    unbounded DAG would replay all prior rounds. Raises RuntimeError
    if ``max_rounds`` is hit without a fixpoint rather than silently
    returning a partial peel (the union_find_components discipline).
    """
    cur = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(max_rounds):
        deg = cur.groupBy("src").agg(F.count("*").alias("deg"))
        keep = deg.filter(F.col("deg") >= k)
        n_nodes, n_keep = deg.count(), keep.count()
        if n_keep == n_nodes:
            return keep.select(
                F.col("src").alias("node"), F.col("deg").alias("core_degree")
            )
        if n_keep == 0:
            return keep.select(
                F.col("src").alias("node"), F.col("deg").alias("core_degree")
            )
        kn = keep.select("src")
        cur = (
            cur.join(kn, "src", "left_semi")
            .join(
                kn.withColumnRenamed("src", "dst"), "dst", "left_semi"
            )
            .localCheckpoint(eager=True)
        )
    raise RuntimeError(
        f"k_core: no fixpoint after {max_rounds} peeling rounds"
    )


def textrank_scores(
    edges: DataFrame,
    damping: float = 0.85,
    iters: int = 4,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
) -> DataFrame:
    """Weighted PageRank over a symmetric weighted edge list — the
    TextRank recurrence (Mihalcea & Tarau, EMNLP'04):
    ``S(i) = (1-d) + d * sum_j (w_ji / wdeg_j) * S(j)`` with S0 = 1.
    Fixed ``iters`` keeps the result deterministic for the oracle
    gate (same contract as :func:`pagerank`).

    Scale: identical shape to ``pagerank`` — one contribution
    equi-join + one destination-keyed aggregate per round; the edge
    list is partitioned by source once and reused."""
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"), F.col(weight).alias("w")
    )
    wdeg = e.groupBy("src").agg(F.sum("w").alias("wdeg"))
    # round-14 (guide §2.4): wdeg is loop-invariant — attach it to the
    # cached edge frame ONCE instead of re-joining it every round
    # (one fewer join per iteration; the per-row expression
    # w*s/wdeg is unchanged). Bit-identical scores rely on wdeg
    # itself being exact: sum(w) over an INTEGER/exact weight column
    # (the sole in-repo caller sums bigint co-occurrence counts) is
    # order-free; a float weight column would make this partial-sum
    # order-sensitive and the claim only round-stable.
    e = e.join(wdeg, "src").repartition("src").cache()
    nodes = e.select(F.col("src").alias("node")).distinct()
    scores = nodes.withColumn("s", F.lit(1.0))
    for i in range(iters):
        contribs = (
            e.join(scores, e["src"] == scores["node"])
            .select(
                F.col("dst").alias("node"),
                (F.col("w") * F.col("s") / F.col("wdeg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("cs"))
        )
        scores = nodes.join(contribs, "node", "left").select(
            "node",
            (
                F.lit(1.0 - damping)
                + damping * F.coalesce(F.col("cs"), F.lit(0.0))
            ).alias("s"),
        )
        if i % 4 == 3:
            scores = scores.localCheckpoint(eager=False)
    return scores
