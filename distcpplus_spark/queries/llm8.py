"""Round-8 continuation queries: corpus-curation operators — leakage
-safe splitting, density clustering, random projection, diversity
selection.

Reference parity notes cite turn/DistCPPlus files as provenance
(what to compute), never as implementation source — the execution
design here is Spark-first (see SURVEY.md §2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from distcpplus_spark.catalog import load_table
from distcpplus_spark.queries import local_rows, query


@query(
    "q309_leakage_safe_split",
    oracle="""
    SELECT doc_id,
           CAST(min(doc_id) OVER (PARTITION BY lang, source) AS BIGINT)
             AS split_group,
           CAST(count(*) OVER (PARTITION BY lang, source) AS BIGINT)
             AS group_docs,
           CASE WHEN (min(doc_id) OVER (PARTITION BY lang, source)
                      * 2654435761 + 1013904223) % 10 = 0
                THEN 'test' ELSE 'train' END AS split
    FROM documents
    ORDER BY doc_id
    """,
)
def q309_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-aware train/test split (plans/pipeline.py::
    leakage_safe_split) under the driver hash gate: documents linked
    by a duplicate relation must land in the SAME split — assigning
    near-dups across train and held-out is the classic
    eval-contamination bug. The link graph here is consecutive-id
    CHAINS within each (lang, source) slice, chosen deliberately:
    (a) its transitive closure is a plain window in SQL (components
    = the slice, representative = min doc_id), so the oracle is
    exact WITHOUT a recursive CTE, and (b) chain diameter grows
    linearly with SF — at sf0.1 the longest chain is ~600 nodes,
    which one-hop label propagation cannot close in any sane
    iteration cap. This query therefore regression-gates the
    pointer-doubling fix in union_find_components (O(log diameter)
    rounds) at every scale the sweep runs.

    Scale: component rounds touch only the edge set; the assignment
    is one left join + one hash agg; singletons never iterate. The
    split stays a pure function of the representative id, so
    ingesting new documents can never flip an old assignment."""
    from distcpplus_spark.plans.pipeline import leakage_safe_split

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source"
    )
    w = W.partitionBy("lang", "source").orderBy("doc_id")
    edges = (
        docs.withColumn("_prev", F.lag("doc_id").over(w))
        .filter(F.col("_prev").isNotNull())
        .select(F.col("_prev").alias("id_a"), F.col("doc_id").alias("id_b"))
    )
    out = leakage_safe_split(docs, "doc_id", edges, mod=10)
    return out.select(
        "doc_id",
        F.col("split_group").cast("bigint").alias("split_group"),
        F.col("group_docs").cast("bigint").alias("group_docs"),
        "split",
    ).orderBy("doc_id")


@query(
    "q310_grid_dbscan",
    oracle="""
    WITH RECURSIVE pts AS (
      SELECT vec_id AS id, CAST(embedding[1] AS DOUBLE) AS x,
             CAST(embedding[2] AS DOUBLE) AS y
      FROM embeddings WHERE vec_id < 500
    ),
    nbr AS (
      SELECT a.id AS ia, b.id AS ib FROM pts a JOIN pts b
        ON (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= 0.0004
    ),
    cnt AS (SELECT ia, count(*) AS n FROM nbr GROUP BY 1),
    core AS (SELECT ia AS id FROM cnt WHERE n >= 4),
    ce AS (
      SELECT n.ia AS src, n.ib AS dst FROM nbr n
      JOIN core a ON a.id = n.ia JOIN core b ON b.id = n.ib
      WHERE n.ia <> n.ib
    ),
    reach(a, b) AS (
      SELECT src, dst FROM ce
      UNION
      SELECT r.a, s.dst FROM reach r JOIN ce s ON r.b = s.src
    ),
    comp AS (
      SELECT c.id, least(c.id, coalesce(min(r.b), c.id)) AS comp_id
      FROM core c LEFT JOIN reach r ON r.a = c.id GROUP BY c.id
    ),
    bord AS (
      SELECT n.ia AS id, min(comp.comp_id) AS comp_id
      FROM nbr n JOIN comp ON comp.id = n.ib
      WHERE n.ia NOT IN (SELECT id FROM core) AND n.ia <> n.ib
      GROUP BY n.ia
    )
    SELECT p.id AS vec_id,
           CASE WHEN comp.id IS NOT NULL THEN 'core'
                WHEN bord.id IS NOT NULL THEN 'border'
                ELSE 'noise' END AS role,
           CAST(coalesce(comp.comp_id, bord.comp_id) AS BIGINT)
             AS cluster_id
    FROM pts p
    LEFT JOIN comp ON comp.id = p.id
    LEFT JOIN bord ON bord.id = p.id
    ORDER BY vec_id
    """,
)
def q310_grid_dbscan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN with grid-cell blocking (operators/clustering.py::
    grid_dbscan) under the driver hash gate, on the first two
    embedding dims (eps=0.02, min_pts=4 — 15-19 clusters, all three
    roles populated at every SF; fixed 500-point subset, the q280
    bounded-subset device, because the quadratic oracle join is the
    single-node-only part). Roles, components of core-core pairs,
    and the min-cluster border tie-break are all deterministic, so
    every label is value-checked against the brute-force O(n^2)
    definition — including the density-connectivity closure, which
    the oracle replays as a recursive CTE.

    Scale: the engine side never enumerates n^2 — candidates come
    from the 3x3 grid-cell equi-join (the 2D analogue of an LSH band
    join), exact by construction since eps-neighbors differ by at
    most one eps-cell per axis. Components run through the pointer
    -doubling propagation. distance comparisons share one float64
    expression shape with the oracle, so borderline pairs cannot
    diverge across engines."""
    from distcpplus_spark.operators.clustering import grid_dbscan

    pts = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 500)
        .select(
            "vec_id",
            F.col("embedding")[0].alias("x"),
            F.col("embedding")[1].alias("y"),
        )
    )
    out = grid_dbscan(pts, "vec_id", "x", "y", eps=0.02, min_pts=4)
    return out.select(
        "vec_id", "role", F.col("cluster").alias("cluster_id")
    ).orderBy("vec_id")


@query(
    "q311_jl_random_projection",
    oracle="""
    WITH e AS (
      SELECT vec_id,
             list_transform(embedding, v -> CAST(v AS DOUBLE)) AS emb
      FROM embeddings
    ),
    m1 AS (
      SELECT vec_id, j.j, i.i, emb,
             ((i.i * 8 + j.j) * 2654435761 + 1013904223) % 1000003 AS m1
      FROM e, range(0, 64) i(i), range(0, 8) j(j)
    ),
    terms AS (
      SELECT vec_id, j, i,
             CASE WHEN (m1 * m1) % 1000003 % 2 = 0
                  THEN 1.0 ELSE -1.0 END
               * emb[CAST(i AS INTEGER) + 1] AS t
      FROM m1
    )
    SELECT vec_id, CAST(j AS INTEGER) AS j,
           CAST(round(sum(t) / sqrt(8.0), 6) AS DOUBLE) AS y6
    FROM terms GROUP BY vec_id, j
    ORDER BY vec_id, j
    """,
)
def q311_jl_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss random projection (operators/
    similarity.py::random_project) under the driver hash gate:
    64-dim embeddings drop to 8 dims through the seeded ±1 sign
    matrix, and every projected coordinate is value-checked against
    the oracle's term-by-term reconstruction — the sign matrix is a
    pure function of (i, j, seed) through the engine-portable mixer,
    so DuckDB regenerates the identical matrix from the same four
    integers. Coordinates round to 6 decimals on both sides (numpy's
    pairwise matmul sum and the SQL aggregate may differ in the last
    float bits; round-then-hash is the repo's standing discipline).

    Scale: ZERO shuffle — one Arrow-batched numpy matmul per input
    batch, the matrix regenerated per executor (never broadcast,
    never in the plan). This is the cheap front-end that makes
    downstream LSH/IVF/clustering run on short vectors with JL's
    (1±eps) distance-preservation guarantee."""
    from distcpplus_spark.operators.similarity import random_project

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    proj = random_project(emb, "vec_id", "embedding", out_dim=8, seed=0)
    return (
        proj.select("vec_id", F.posexplode("proj").alias("j", "y"))
        .select(
            "vec_id",
            F.col("j").cast("int").alias("j"),
            F.round("y", 6).alias("y6"),
        )
        .orderBy("vec_id", "j")
    )


@query(
    "q312_srp_hamming_pairs",
    oracle="""
    WITH e AS (
      SELECT vec_id,
             list_transform(embedding, v -> CAST(v AS DOUBLE)) AS emb
      FROM embeddings WHERE vec_id < 300
    ),
    m1 AS (
      SELECT vec_id, j.j, i.i, emb,
             ((i.i * 8 + j.j) * 2654435761 + 1013904223) % 1000003 AS m1
      FROM e, range(0, 64) i(i), range(0, 8) j(j)
    ),
    terms AS (
      SELECT vec_id, j, i,
             CASE WHEN (m1 * m1) % 1000003 % 2 = 0
                  THEN 1.0 ELSE -1.0 END
               * emb[CAST(i AS INTEGER) + 1] AS t
      FROM m1
    ),
    y AS (
      SELECT vec_id, j, round(sum(t) / sqrt(8.0), 6) AS y6
      FROM terms GROUP BY vec_id, j
    ),
    sig AS (
      SELECT vec_id,
             CAST(sum(CASE WHEN y6 >= 0 THEN power(2, j) ELSE 0 END)
                  AS BIGINT) AS sig
      FROM y GROUP BY vec_id
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
    FROM sig a JOIN sig b
      ON a.vec_id < b.vec_id AND bit_count(xor(a.sig, b.sig)) <= 1
    ORDER BY id_a, id_b
    """,
)
def q312_srp_hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signed-random-projection LSH composed from the JL front-end
    (q311's random_project): each embedding drops to 8 dims, the
    SIGN of each rounded coordinate becomes one bit of an 8-bit SRP
    code, and near-duplicate candidates are pairs within Hamming
    distance 1 — all value-checked because the sign matrix, the
    rounding, and the bit packing are pure integer/float64 functions
    both engines replay exactly. The oracle joins signatures brute
    -force (bounded vec_id < 300 subset, the q280/q310 device);
    the engine NEVER enumerates pairs: it explodes each code into
    itself plus its 8 one-bit flips and equi-joins on the variant
    (the FastSS deletion-variant trick lifted to Hamming space), so
    candidate volume tracks bucket occupancy, not n². The variant
    join admits some Hamming-2 pairs (flip-on-both-sides collisions)
    — the exact bit_count(XOR) <= 1 verify filters them, the
    standing LSH candidates-then-verify shape.

    Scale: one zero-shuffle projection, a 9-way explode, one
    equi-join on an 8-bit key, exact verify on candidates only —
    the same plan at any corpus size, with out_dim grown as log(n)
    to keep buckets sparse."""
    from distcpplus_spark.operators.similarity import random_project

    emb = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 300)
        .select("vec_id", "embedding")
    )
    proj = random_project(emb, "vec_id", "embedding", out_dim=8, seed=0)
    bit = lambda j: F.when(  # noqa: E731
        F.round(F.col("proj")[j], 6) >= 0, F.lit(1 << j)
    ).otherwise(F.lit(0))
    sig = proj.select(
        "vec_id",
        sum([bit(j) for j in range(1, 8)], bit(0)).cast("long").alias("sig"),
    )
    variants = sig.select(
        "vec_id",
        "sig",
        F.explode(
            F.array(
                F.col("sig"),
                *[
                    F.col("sig").bitwiseXOR(F.lit(1 << b))
                    for b in range(8)
                ],
            )
        ).alias("variant"),
    )
    a = variants.select(
        F.col("vec_id").alias("id_a"),
        F.col("sig").alias("_sa"),
        "variant",
    )
    b = variants.select(
        F.col("vec_id").alias("id_b"),
        F.col("sig").alias("_sb"),
        "variant",
    )
    pairs = (
        a.join(b, "variant")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(
                F.col("_sa").bitwiseXOR(F.col("_sb"))
            ).cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= 1)
        .distinct()
    )
    return pairs.orderBy("id_a", "id_b")


_KC_DIST = """round(list_reduce(
          list_transform(range(1, 65),
            i -> (p.v[CAST(i AS INTEGER)] - c.v[CAST(i AS INTEGER)])
                 * (p.v[CAST(i AS INTEGER)] - c.v[CAST(i AS INTEGER)])),
          (a, b) -> a + b), 6)"""

_KC_ORACLE = f"""
    WITH e AS (
      SELECT vec_id AS id,
             list_transform(embedding, v -> CAST(v AS DOUBLE)) AS v
      FROM embeddings
    ),
    c0 AS (SELECT id, v FROM e ORDER BY id LIMIT 1),
    d1 AS (
      SELECT p.id, p.v, {_KC_DIST} AS md
      FROM e p, c0 c
    ),
    c1 AS (
      SELECT id, v, md FROM d1 WHERE id NOT IN (SELECT id FROM c0)
      ORDER BY md DESC, id LIMIT 1
    ),
    d2 AS (
      SELECT p.id, p.v, least(p.md, {_KC_DIST}) AS md
      FROM d1 p, c1 c
    ),
    c2 AS (
      SELECT id, v, md FROM d2
      WHERE id NOT IN (SELECT id FROM c0 UNION SELECT id FROM c1)
      ORDER BY md DESC, id LIMIT 1
    ),
    d3 AS (
      SELECT p.id, p.v, least(p.md, {_KC_DIST}) AS md
      FROM d2 p, c2 c
    ),
    c3 AS (
      SELECT id, v, md FROM d3
      WHERE id NOT IN (SELECT id FROM c0 UNION SELECT id FROM c1
                       UNION SELECT id FROM c2)
      ORDER BY md DESC, id LIMIT 1
    )
    SELECT CAST(sel_round AS INTEGER) AS sel_round,
           CAST(vec_id AS BIGINT) AS vec_id, min_d2_6
    FROM (
      SELECT 0 AS sel_round, (SELECT id FROM c0) AS vec_id,
             CAST(NULL AS DOUBLE) AS min_d2_6
      UNION ALL SELECT 1, id, md FROM c1
      UNION ALL SELECT 2, id, md FROM c2
      UNION ALL SELECT 3, id, md FROM c3
    )
    ORDER BY sel_round
    """


@query("q313_greedy_k_center", oracle=_KC_ORACLE)
def q313_greedy_k_center(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gonzalez farthest-point traversal (operators/clustering.py::
    greedy_k_center) under the driver hash gate: 4 diverse exemplars
    from the full embeddings table, the oracle replaying the same 4
    rounds as unrolled CTEs (the q236/q237/q238 device for iterative
    driver-folds). Both engines fold squared distances STRICTLY
    sequentially (Spark zip_with + aggregate from 0.0; DuckDB
    list_reduce — IEEE 0.0+x==x for x>=0 makes the folds
    bit-identical), round to 6 decimals BEFORE each argmax, and
    break ties by min id, so the selection trajectory is exact, not
    merely close.

    Scale: one narrow map per round (distance to the single new
    center) + a 1-row TakeOrderedAndProject argmax; the selected-set
    state on the driver is k vectors. The input grows with SF and
    the per-round cost stays O(n * dim) with zero shuffle — the
    2-approximation coreset selector for diversity-aware sampling."""
    from pyspark.sql import types as T

    from distcpplus_spark.operators.clustering import greedy_k_center

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    rows = greedy_k_center(emb, "vec_id", "embedding", k=4)
    schema = T.StructType(
        [
            T.StructField("sel_round", T.IntegerType(), False),
            T.StructField("vec_id", T.LongType(), False),
            T.StructField("min_d2_6", T.DoubleType(), True),
        ]
    )
    return local_rows(spark, rows, schema).orderBy("sel_round")


@query(
    "q314_cross_doc_longest_match",
    oracle="""
    WITH d AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 1000
    ),
    s AS (
      SELECT doc_id, i,
             substr(text, CAST(i AS INTEGER), 64) AS sfx
      FROM (SELECT doc_id, text,
                   unnest(range(1, length(text) + 1)) AS i
            FROM d)
    ),
    o AS (
      SELECT doc_id, sfx,
             lag(doc_id) OVER w AS pdoc,
             lag(sfx) OVER w AS psfx
      FROM s WINDOW w AS (ORDER BY sfx, doc_id, i)
    ),
    p AS (
      SELECT doc_id, pdoc,
             least(length(list_filter(range(1, 65),
                     l -> substr(sfx, 1, CAST(l AS INTEGER))
                        = substr(psfx, 1, CAST(l AS INTEGER)))),
                   length(sfx), length(psfx)) AS lcp
      FROM o WHERE pdoc IS NOT NULL AND pdoc <> doc_id
    ),
    bo AS (
      SELECT doc_id, pdoc AS partner, lcp FROM p
      UNION ALL
      SELECT pdoc AS doc_id, doc_id AS partner, lcp FROM p
    ),
    best AS (
      SELECT doc_id, max(lcp) AS best_len FROM bo GROUP BY doc_id
    )
    SELECT b.doc_id,
           CAST(b.best_len AS INTEGER) AS best_len,
           CAST(min(t.partner) AS BIGINT) AS partner
    FROM best b
    JOIN bo t ON t.doc_id = b.doc_id AND t.lcp = b.best_len
    WHERE b.best_len >= 20
    GROUP BY b.doc_id, b.best_len
    ORDER BY b.doc_id
    """,
)
def q314_cross_doc_longest_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary-length cross-document duplicate detection (operators/
    dedup.py::cross_doc_longest_match) under the driver hash gate:
    for each document, the longest substring (capped at 64 chars)
    shared with any OTHER document, plus the deterministic min
    partner achieving it. This is the suffix-array measure of Lee et
    al. 2021 (arXiv 2107.06499) re-expressed WITHOUT a corpus-wide
    sort: suffixes hash-partition by their 4-char prefix and only
    lexicographically ADJACENT suffixes from different docs are
    LCP-compared — adjacency attains every per-document maximum
    (walking a distant pair toward adjacency never lowers the LCP
    and must cross a doc boundary), and prefix buckets preserve
    adjacency for every pair sharing >= 4 chars, which covers all
    pairs at min_len 20. The oracle replays the identical adjacency
    semantics relationally (one global window + a monotone
    list_filter LCP), so the bucketed scan, the truncation cap, the
    length clamps, and both tie-breaks are value-checked; the
    adjacency theorem itself is brute-force-verified in
    tests/test_clustering.py on arbitrary strings. Bounded to
    doc_id < 1000 because the ORACLE's global window is single-node
    — the engine side has no such bound.

    Scale: suffix rows carry <= 64 chars (the explicit 64x
    memory/length trade); one shuffle keyed on the prefix bucket;
    per-bucket work is a local sort + one vectorized numpy pass.
    Hot prefix skew -> lengthen the prefix/min_len or split top
    buckets (docstring lever)."""
    from distcpplus_spark.operators.dedup import cross_doc_longest_match

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 1000)
        .select("doc_id", "text")
    )
    out = cross_doc_longest_match(
        docs, "text", "doc_id", min_len=20, cap=64, prefix=4
    )
    return out.orderBy("doc_id")


@query(
    "q315_shingle_containment",
    oracle="""
    WITH base AS (SELECT doc_id, text FROM documents
                  WHERE doc_id < 10000),
    der AS (
      SELECT doc_id + 1000000 AS doc_id,
             array_to_string(
               (string_split(text, ' '))
                 [1:CAST(floor(2 * len(string_split(text, ' ')) / 3)
                         AS INTEGER)],
               ' ') AS text
      FROM documents
      WHERE doc_id < 10000
        AND doc_id % 7 = 0 AND len(string_split(text, ' ')) >= 9
    ),
    ad AS (SELECT * FROM base UNION ALL SELECT * FROM der),
    tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM ad),
    sh AS (
      SELECT DISTINCT doc_id,
             t[CAST(i AS INTEGER)] || ' ' || t[CAST(i AS INTEGER) + 1]
               || ' ' || t[CAST(i AS INTEGER) + 2] AS s
      FROM (SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i
            FROM tok WHERE len(t) >= 3)
    ),
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id <> b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, CAST(inter AS BIGINT) AS inter,
           CAST(round(inter * 1.0 / z.n, 6) AS DOUBLE) AS containment
    FROM inter JOIN sz z ON z.doc_id = id_a
    WHERE inter * 1.0 / z.n >= 0.5
    ORDER BY id_a, id_b
    """,
)
def q315_shingle_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment dedup (operators/dedup.py::
    containment_join) under the driver hash gate: C(A,B) =
    |S(A)∩S(B)| / |S(A)| over 3-token shingles — the Broder-1997
    companion to Jaccard that catches a document CONTAINED in
    another (quote reprints, boilerplate wrappers), which every
    symmetric dedup tier here (MinHash q57-q59, prefix-filter q302)
    structurally misses. The fixture plants containment: every 7th
    document spawns a derived doc holding its first 2/3 tokens —
    built identically in both engines from the registered table, so
    derived→original rows gate C = 1.0 exactly and original→derived
    rows gate the ≈2/3 reverse ratio. Thresholding at 0.5 is an
    exact small-integer comparison; word-salad cross-pairs sit near
    0.0025 and can't flicker across it.

    Scale: candidates come only from the shingle inverted-index
    equi-join (Σ df² volume; the documented df-cap lever drops
    boilerplate shingles at corpus scale), sizes and ratios are one
    hash agg + one key join — never n²."""
    from distcpplus_spark.operators.dedup import containment_join

    # doc_id < 10000: a no-op at the driver-gate SFs (sf0.01/sf0.1
    # hold <= 6k docs) that bounds the oracle at sf1+ — the synthetic
    # 31-word vocabulary makes every doc share shingles with every
    # other (ambient-similarity FIXTURE artifact, the q104/q252
    # class), so the oracle's unblocked shingle self-join inflates
    # ~quadratically with SF (71 GB RSS at sf3). The operator itself
    # carries the documented df-cap lever for real corpora.
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 10000)
        .select("doc_id", "text")
    )
    toks = F.split("text", " ")
    derived = (
        docs.filter((F.col("doc_id") % 7 == 0) & (F.size(toks) >= 9))
        .select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.concat_ws(
                " ",
                F.slice(
                    toks, F.lit(1), F.floor(2 * F.size(toks) / 3).cast("int")
                ),
            ).alias("text"),
        )
    )
    out = containment_join(
        docs.unionByName(derived), "text", "doc_id",
        shingle=3, threshold=0.5,
    )
    return out.orderBy("id_a", "id_b")


@query(
    "q316_field_id_schema_evolution",
    oracle="""
    SELECT CAST(n_nationkey AS INTEGER) AS id,
           n_name AS nation_name,
           CAST(CASE WHEN n_nationkey >= 13 THEN n_regionkey END
                AS INTEGER) AS region_key
    FROM nation
    ORDER BY id
    """,
)
def q316_field_id_schema_evolution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Field-id schema evolution (sources/schema_evo.py) under the
    driver hash gate: a parquet file written at schema v1
    (id:1, name:2), then a v2 file after `name RENAME TO
    nation_name` (same field id 2) plus `ADD COLUMN region_key`
    (new id 3). Reading both through the id-mapped unified schema
    must serve the RENAMED column from the v1 file and NULL-fill
    the added column for v1 rows — the Iceberg column-mapping
    semantics that name-based mergeSchema cannot express (it would
    return both a null-padded `name` AND `nation_name`). Ids ride
    in the files' own footers (PARQUET:field_id), round-tripping
    through pyarrow exactly as an Iceberg writer stores them; the
    fixture derives from the registered nation table so the oracle
    replays the expected unified read relationally.

    Scale: resolution is one footer read per file (manifest-level,
    like every lakehouse planner); the per-file projection is an
    alias-only plan node and each scan stays a pushdown-capable
    parquet scan."""
    import shutil as _sh
    import tempfile as _tf

    from distcpplus_spark.sources.schema_evo import (
        read_by_field_id,
        write_with_field_ids,
    )

    nation = load_table(spark, sf_dir, "nation")
    root = _tf.mkdtemp(prefix="q316_evo_")
    try:
        v1 = nation.filter(F.col("n_nationkey") < 13).select(
            F.col("n_nationkey").cast("int").alias("id"),
            F.col("n_name").alias("name"),
        )
        write_with_field_ids(v1, f"{root}/v1.parquet", {"id": 1, "name": 2})
        v2 = nation.filter(F.col("n_nationkey") >= 13).select(
            F.col("n_nationkey").cast("int").alias("id"),
            F.col("n_name").alias("nation_name"),
            F.col("n_regionkey").cast("int").alias("region_key"),
        )
        write_with_field_ids(
            v2, f"{root}/v2.parquet",
            {"id": 1, "nation_name": 2, "region_key": 3},
        )
        rows = (
            read_by_field_id(
                spark,
                [f"{root}/v1.parquet", f"{root}/v2.parquet"],
                [(1, "id", "int"), (2, "nation_name", "string"),
                 (3, "region_key", "int")],
            )
            .orderBy("id")
            .collect()
        )
    finally:
        _sh.rmtree(root, ignore_errors=True)
    return local_rows(spark,
        rows, "id INT, nation_name STRING, region_key INT"
    ).orderBy("id")


def _pagerank_oracle() -> str:
    """Unrolled 8-iteration power-iteration oracle (the q236-style
    unrolled-CTE pattern — recursive CTEs can't aggregate in the
    recursive term, so fixed iterations unroll)."""
    iters = "".join(
        f""",
    r{i} AS (
      SELECT n.node, 0.15 + 0.85 * coalesce(s.s, 0) AS rank
      FROM nodes n LEFT JOIN (
        SELECT e.dst AS node, sum(r.rank / d.deg) AS s
        FROM edges e
        JOIN r{i - 1} r ON r.node = e.src
        JOIN deg d ON d.src = e.src
        GROUP BY e.dst
      ) s ON s.node = n.node
    )"""
        for i in range(1, 9)
    )
    return f"""
    WITH fwd AS (
      SELECT DISTINCT l_partkey AS src, l_suppkey + 1000000 AS dst
      FROM lineitem WHERE l_partkey < 200
    ),
    edges AS (
      SELECT src, dst FROM fwd
      UNION ALL SELECT dst AS src, src AS dst FROM fwd
    ),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
    r0 AS (SELECT node, 1.0 AS rank FROM nodes){iters}
    SELECT CAST(node AS BIGINT) AS node,
           CAST(round(rank, 6) AS DOUBLE) AS rank
    FROM r8 ORDER BY node
    """


@query("q318_pagerank_gated", oracle=_pagerank_oracle())
def q318_pagerank_gated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (operators/graph.py::pagerank) under the driver hash
    gate — the hash-gated twin of rows-only x18: 8 power iterations
    at damping 0.85 over the undirected part<->supplier bipartite
    graph from lineitem (parts < 200), EVERY node's rank value-
    checked against an unrolled-CTE oracle replaying the recurrence
    relationally (no LIMIT cutoff, so no float-tie selection risk).
    PageRank here is the link-graph document-quality prior of
    web-corpus curation (the Common-Crawl-style seed-quality
    signal), not a toy: the per-round plan IS the cluster plan.

    Scale: each round is one contribution equi-join + one aggregate
    shuffle keyed on dst; edges are hash-partitioned by src once and
    cached; lineage truncates via localCheckpoint every 4 rounds
    (HDFS checkpoint on a real cluster). Only loop control touches
    the driver — the same driver-fold shape as k-means/BPE."""
    from distcpplus_spark.operators.graph import pagerank

    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_partkey") < 200
    )
    fwd = li.select(
        F.col("l_partkey").alias("src"),
        (F.col("l_suppkey") + 1_000_000).alias("dst"),
    ).distinct()
    edges = fwd.unionAll(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    out = pagerank(edges, damping=0.85, iters=8)
    return out.select(
        F.col("node").cast("long").alias("node"),
        F.round("rank", 6).alias("rank"),
    ).orderBy("node")


@query(
    "q319_triangle_counts",
    oracle="""
    WITH li AS (
      SELECT l_orderkey, l_partkey FROM lineitem WHERE l_orderkey % 17 = 0
    ),
    e AS (
      SELECT DISTINCT a.l_partkey AS x, b.l_partkey AS y
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    t AS (
      SELECT e1.x AS a, e1.y AS b, e2.y AS c
      FROM e e1
      JOIN e e2 ON e2.x = e1.y
      JOIN e e3 ON e3.x = e1.x AND e3.y = e2.y
    ),
    corners AS (
      SELECT a AS node FROM t
      UNION ALL SELECT b FROM t
      UNION ALL SELECT c FROM t
    )
    SELECT CAST(node AS BIGINT) AS node,
           CAST(count(*) AS BIGINT) AS n_triangles
    FROM corners GROUP BY node ORDER BY node
    """,
)
def q319_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree-oriented triangle counting (operators/graph.py::
    count_triangles) under the driver hash gate: per-node triangle
    participation in the part co-occurrence graph (parts sharing an
    order, orders sampled by orderkey % 17) — triangle density is
    the classic link-farm/spam signal in web-graph curation. The
    ORACLE is algorithm-independent: it enumerates each triangle
    once as an ordered triple (a<b<c) via a plain triple self-join
    on the canonical edge list, so the engine's orientation trick
    (wedges only between (degree,id)-ordered OUT-neighbors, closed
    by one equi-join) is value-checked against the semantic spec,
    not against itself.

    Scale: orientation bounds out-degree by O(sqrt(m)) on ANY graph,
    so wedge volume is O(m^1.5) instead of sum(deg^2) — the hub that
    wrecks the naive wedge join ("curse of the last reducer", Suri &
    Vassilvitskii WWW'11) emits ~no wedges because its edges point
    INTO it. Every step is an equi-join or hash agg."""
    from distcpplus_spark.operators.graph import count_triangles

    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 17 == 0)
        .select("l_orderkey", "l_partkey")
    )
    a, b = li.alias("a"), li.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
    )
    out = count_triangles(pairs)
    return out.select(
        F.col("node").cast("long").alias("node"),
        F.col("n_triangles").cast("long").alias("n_triangles"),
    ).orderBy("node")


@query(
    "q320_timeseries_gapfill",
    # EXACT-RATIONAL interpolation + floor-rounding (sf1 lesson, see
    # gapfill_interpolate's exact mode): pv + (nv-pv)*frac builds
    # engine-specific ULPs over long gaps, and even for the SAME
    # double the two engines' round(x, 6) implementations disagree at
    # near-ties (Spark rounds the shortest decimal repr HALF_UP;
    # DuckDB multiplies by 1e6 and rints). The interpolated value is
    # therefore ONE double division of exact BIGINTs, and the output
    # gate is floor(x*1e6 + 0.5)/1e6 — the identical op sequence on
    # identical bits in both engines.
    oracle="""
    WITH obs AS (
      SELECT user_id, date_trunc('hour', ts) AS h,
             sum(CAST(round(value * 100) AS BIGINT)) AS vn,
             CAST(100 * count(*) AS BIGINT) AS vd
      FROM events WHERE user_id < 8 GROUP BY 1, 2
    ),
    sparse AS (
      SELECT * FROM obs
      WHERE CAST(floor(epoch(h) / 3600) AS BIGINT) % 3 <> 0
    ),
    b AS (
      SELECT user_id, min(h) AS t0, max(h) AS t1 FROM sparse GROUP BY 1
    ),
    grid AS (
      SELECT user_id,
             unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS h
      FROM b
    ),
    j AS (
      SELECT g.user_id, g.h, s.vn, s.vd
      FROM grid g LEFT JOIN sparse s
        ON s.user_id = g.user_id AND s.h = g.h
    ),
    w AS (
      SELECT user_id, h, vn, vd,
        last_value(vn IGNORE NULLS) OVER
          (PARTITION BY user_id ORDER BY h
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pn,
        last_value(vd IGNORE NULLS) OVER
          (PARTITION BY user_id ORDER BY h
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
        last_value(CASE WHEN vn IS NOT NULL THEN h END IGNORE NULLS) OVER
          (PARTITION BY user_id ORDER BY h
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
        first_value(vn IGNORE NULLS) OVER
          (PARTITION BY user_id ORDER BY h
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nn,
        first_value(vd IGNORE NULLS) OVER
          (PARTITION BY user_id ORDER BY h
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd,
        first_value(CASE WHEN vn IS NOT NULL THEN h END IGNORE NULLS) OVER
          (PARTITION BY user_id ORDER BY h
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
      FROM j
    ),
    x AS (
      SELECT user_id, h, vn, vd, pn, nn,
        CAST((epoch(h) - epoch(pt)) / 3600 AS BIGINT) AS k,
        CAST((epoch(nt) - epoch(pt)) / 3600 AS BIGINT) AS n_steps,
        pd, nd
      FROM w
    )
    SELECT user_id, h AS ts,
      CAST(floor(coalesce(
        vn / (1.0 * vd),
        (pn * nd * (n_steps - k) + nn * pd * k) / (1.0 * pd * nd * n_steps),
        pn / (1.0 * pd), nn / (1.0 * nd)) * 1000000 + 0.5)
        / 1000000.0 AS DOUBLE) AS value,
      CASE WHEN vn IS NOT NULL THEN 'observed'
           WHEN pn IS NOT NULL AND nn IS NOT NULL THEN 'interpolated'
           WHEN pn IS NOT NULL THEN 'ffill'
           ELSE 'bfill' END AS src
    FROM x ORDER BY user_id, ts
    """,
)
def q320_timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap-fill + linear interpolation (operators/
    asof.py::gapfill_interpolate) under the driver hash gate: hourly
    per-user event averages, thinned to hours with epoch-hour % 3
    != 0 (guaranteed gaps at every SF), regularized back onto the
    full hourly grid — observed values pass through, interior gaps
    interpolate linearly between bracketing observations, and the
    src tag is value-checked too. The observed hourly value is
    computed as EXACT integer cents / (100 * n) — round(avg, 2)
    looked equivalent but hit a real tie (avg 39.785 rounds
    half-differently across engines); integer-cents inputs are
    bit-identical, the interpolation is then the same IEEE
    expression tree in both engines, and the round-6 output gate is
    noise-free.

    Scale: the grid explodes from ONE min/max row per key (size =
    span/step, explicit, never data-dependent), fills run under
    key-PARTITIONED windows, and the whole operator is one shuffle
    on the key."""
    from distcpplus_spark.operators.asof import gapfill_interpolate

    obs = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 8)
        .groupBy(
            "user_id", F.date_trunc("hour", "ts").alias("ts")
        )
        .agg(
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)))
            .alias("vn"),
            (100 * F.count("*")).cast("long").alias("vd"),
        )
        .withColumn("v", F.col("vn") / F.col("vd").cast("double"))
        .filter(
            F.floor(F.unix_timestamp("ts") / 3600).cast("long") % 3 != 0
        )
    )
    out = gapfill_interpolate(
        obs, "user_id", "ts", "v", step="1 hour",
        num_col="vn", den_col="vd",
    )
    return out.select(
        "user_id",
        "ts",
        # floor-round: identical op sequence on identical bits in
        # both engines (see the oracle comment)
        (F.floor(F.col("value") * 1000000 + F.lit(0.5)) / 1000000.0)
        .alias("value"),
        "src",
    ).orderBy("user_id", "ts")


def _bfs_oracle() -> str:
    """Unrolled min-relaxation oracle for 4-hop multi-source BFS."""
    iters = "".join(
        f""",
    d{i} AS (
      SELECT node, min(dist) AS dist FROM (
        SELECT node, dist FROM d{i - 1}
        UNION ALL
        SELECT e.dst AS node, d.dist + 1 AS dist
        FROM edges e JOIN d{i - 1} d ON d.node = e.src
      ) u GROUP BY node
    )"""
        for i in range(1, 5)
    )
    return f"""
    WITH li AS MATERIALIZED (
      SELECT l_orderkey, l_partkey FROM lineitem WHERE l_orderkey % 17 = 0
    ),
    e0 AS MATERIALIZED (
      SELECT DISTINCT a.l_partkey AS x, b.l_partkey AS y
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    edges AS (
      SELECT x AS src, y AS dst FROM e0
      UNION ALL SELECT y AS src, x AS dst FROM e0
    ),
    d0 AS (
      SELECT DISTINCT src AS node, 0 AS dist FROM edges WHERE src % 20 = 0
    ){iters}
    SELECT CAST(node AS BIGINT) AS node, CAST(dist AS INT) AS dist
    FROM d4 ORDER BY node
    """


@query("q321_multi_source_bfs", oracle=_bfs_oracle())
def q321_multi_source_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS hop distances (operators/graph.py::
    bfs_distances) under the driver hash gate: distance from the
    nearest seed part (partkey % 20 = 0) in the part co-occurrence
    graph — the "hops from trusted seeds" signal of link-graph
    curation (TrustRank-style seed propagation, discretized). The
    oracle unrolls the same min-relaxation recurrence relationally,
    so every node's distance is value-checked; the engine's
    convergence EARLY-STOP must land on the identical fixpoint
    (monotone distances make the stopped and the fully-unrolled
    results provably equal — the gate tests that argument).

    Scale: one equi-join + one min-agg shuffle per round, edges
    cached and partitioned by src; the per-round driver signal is a
    single changed-rows scalar, never rows."""
    from distcpplus_spark.operators.graph import bfs_distances

    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 17 == 0)
        .select("l_orderkey", "l_partkey")
    )
    a, b = li.alias("a"), li.alias("b")
    fwd = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
        .distinct()
    )
    edges = fwd.unionAll(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    sources = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .filter(F.col("node") % 20 == 0)
    )
    out = bfs_distances(edges, sources, max_hops=4)
    return out.select(
        F.col("node").cast("long").alias("node"),
        F.col("dist").cast("int").alias("dist"),
    ).orderBy("node")


@query(
    "q322_association_rules",
    oracle="""
    WITH b AS (
      SELECT DISTINCT l.l_orderkey AS bk, p.p_brand AS it
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE l.l_orderkey % 7 = 0
    ),
    n AS (SELECT count(DISTINCT bk) AS nt FROM b),
    ic AS (SELECT it, count(*) AS ni FROM b GROUP BY it),
    pc AS (
      SELECT x.it AS ia, y.it AS ib, count(*) AS np
      FROM b x JOIN b y ON x.bk = y.bk AND x.it < y.it
      GROUP BY 1, 2
    ),
    d AS (
      SELECT ia AS a, ib AS c, np FROM pc
      UNION ALL SELECT ib AS a, ia AS c, np FROM pc
    )
    SELECT d.a AS antecedent, d.c AS consequent,
           CAST(d.np AS BIGINT) AS pair_count,
           CAST(round(d.np * 1.0 / n.nt, 6) AS DOUBLE) AS support,
           CAST(round(d.np * 1.0 / ca.ni, 6) AS DOUBLE) AS confidence,
           CAST(round((d.np * 1.0 / ca.ni) / (cc.ni * 1.0 / n.nt), 6)
                AS DOUBLE) AS lift
    FROM d
    JOIN ic ca ON ca.it = d.a
    JOIN ic cc ON cc.it = d.c
    CROSS JOIN n
    WHERE d.np * 1.0 / n.nt >= 0.005 AND d.np * 1.0 / ca.ni >= 0.1
    ORDER BY antecedent, consequent
    """,
)
def q322_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pair-level association rules (operators/basket.py::
    association_rules) under the driver hash gate: baskets = sampled
    orders, items = part brands; directed rules with support,
    confidence, and lift all value-checked. Thresholds compare
    EXACT integer-ratio doubles (identical IEEE ops in both
    engines), so boundary rows can't flicker across the gate.

    Scale: pair candidates come from a self-equi-join ON THE BASKET
    KEY (volume = sum of basket-size², bounded by TPC-H's <= 7
    lineitems per order — the mega-basket cap is the documented
    lever); counts are hash aggs; the basket total joins in as a
    broadcast scalar, keeping the operator one lazy plan."""
    from distcpplus_spark.operators.basket import association_rules

    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 7 == 0)
        .select("l_orderkey", "l_partkey")
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    baskets = li.join(
        part, li["l_partkey"] == part["p_partkey"]
    ).select("l_orderkey", "p_brand")
    out = association_rules(
        baskets, "l_orderkey", "p_brand",
        min_support=0.005, min_confidence=0.1,
    )
    return out.select(
        F.col("antecedent"),
        F.col("consequent"),
        F.col("pair_count").cast("long").alias("pair_count"),
        F.round("support", 6).alias("support"),
        F.round("confidence", 6).alias("confidence"),
        F.round("lift", 6).alias("lift"),
    ).orderBy("antecedent", "consequent")


@query(
    "q323_ks_two_sample",
    oracle="""
    WITH two AS (
      SELECT value AS v,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS isa
      FROM events WHERE event_type IN ('click', 'error')
    ),
    pv AS (SELECT v, sum(isa) AS ca, sum(1 - isa) AS cb FROM two GROUP BY v),
    n AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM pv),
    c AS (
      SELECT v,
        sum(ca) OVER (ORDER BY v
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_a,
        sum(cb) OVER (ORDER BY v
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_b
      FROM pv
    ),
    d AS (
      SELECT v, abs(cum_a * 1.0 / n.na - cum_b * 1.0 / n.nb) AS d
      FROM c CROSS JOIN n
    ),
    m AS (SELECT max(d) AS ds FROM d)
    SELECT CAST(round(m.ds, 6) AS DOUBLE) AS d_stat,
           CAST(round(min(d.v), 6) AS DOUBLE) AS at_value,
           CAST(n.na AS BIGINT) AS n_a,
           CAST(n.nb AS BIGINT) AS n_b,
           CAST(round(least(1.0,
                2 * exp(-2 * m.ds * m.ds * n.na * n.nb / (n.na + n.nb))),
                6) AS DOUBLE) AS p_approx
    FROM d CROSS JOIN m CROSS JOIN n
    WHERE d.d = m.ds
    GROUP BY m.ds, n.na, n.nb
    """,
)
def q323_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov (operators/stats.py::
    ks_two_sample) under the driver hash gate: click vs error value
    distributions in events — the bin-free companion to the PSI
    drift report (PSI needs chosen bins and misses shifts inside a
    bin; KS is exact). d_stat, its argmin-value, both sample sizes,
    and the Smirnov asymptotic p are all value-checked; the argmax
    equality filter compares doubles both engines computed through
    the identical integer-ratio expression, so it cannot flicker.

    Scale: the ECDF is the textbook partition-less-window trap — it
    runs here as the two-phase parallel prefix sum over monotone
    floor(value) buckets (per-bucket windows parallel, one total row
    per bucket to the driver), the same discipline as q291/q293.
    The oracle, being single-node DuckDB, uses the plain global
    window — the point of the gate is that the distributed prefix
    sum equals it."""
    from distcpplus_spark.operators.stats import ks_two_sample

    ev = load_table(spark, sf_dir, "events")
    out = ks_two_sample(ev, "value", "event_type", "click", "error")
    return out.select(
        F.round("d_stat", 6).alias("d_stat"),
        F.round("at_value", 6).alias("at_value"),
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round("p_approx", 6).alias("p_approx"),
    )


def _walks_oracle() -> str:
    """Unrolled 4-step deterministic-walk oracle; step i's neighbor
    pick replays the engine's two-round integer mixer exactly."""
    steps = "".join(
        f""",
    s{i} AS (
      SELECT t.start, t.walk, coalesce(n.dst, t.cur) AS cur
      FROM (
        SELECT s.start, s.walk, s.cur, d.deg,
               ((s.start * 2654435761 + s.walk * 97003 + {(i - 1) * 57 + 7})
                % 1000003) AS m
        FROM s{i - 1} s LEFT JOIN deg d ON d.src = s.cur
      ) t LEFT JOIN nbrs n
        ON n.src = t.cur AND n.idx = (t.m * t.m) % 1000003 % t.deg
    )"""
        for i in range(1, 5)
    )
    emits = "\n      UNION ALL ".join(
        f"SELECT start, walk, {i} AS step, cur AS node FROM s{i}"
        for i in range(5)
    )
    return f"""
    WITH li AS MATERIALIZED (
      SELECT l_orderkey, l_partkey FROM lineitem WHERE l_orderkey % 17 = 0
    ),
    e0 AS MATERIALIZED (
      SELECT DISTINCT a.l_partkey AS x, b.l_partkey AS y
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    edges AS (
      SELECT x AS src, y AS dst FROM e0
      UNION ALL SELECT y AS src, x AS dst FROM e0
    ),
    nbrs AS (
      SELECT src, dst,
             row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS idx
      FROM edges
    ),
    deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
    starts AS (
      SELECT DISTINCT src AS start FROM edges WHERE src % 20 = 0
    ),
    s0 AS (
      SELECT start, CAST(w.w AS INTEGER) AS walk, start AS cur
      FROM starts, range(0, 2) w(w)
    ){steps}
    SELECT CAST(start AS BIGINT) AS start,
           CAST(walk AS INTEGER) AS walk,
           CAST(step AS INTEGER) AS step,
           CAST(node AS BIGINT) AS node
    FROM ({emits}) u
    ORDER BY start, walk, step
    """


@query("q324_random_walks", oracle=_walks_oracle())
def q324_random_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded deterministic random walks (operators/graph.py::
    random_walks) under the driver hash gate: 2 walks x 4 steps from
    every seed part (partkey % 20 = 0) of the co-occurrence graph —
    the DeepWalk/node2vec sampling stage that turns a graph into a
    sequence corpus for embedding training. EVERY visited node is
    value-checked: the oracle unrolls the walk and replays the
    two-round integer mixer (affine then squared mod 1000003 — one
    affine round biases the choice on dense ids, the q311 lesson)
    plus the destination-sorted neighbor indexing, so neighbor
    ranking, modulo choice, and the dead-end freeze are all gated.

    Scale: walk state is (start, walk, cur) — never the path; each
    step is ONE equi-join against the indexed adjacency; the corpus
    streams out as per-step frames. Determinism under retries is the
    operator's contract: walks are pure functions of
    (start, walk, step, seed)."""
    from distcpplus_spark.operators.graph import random_walks

    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 17 == 0)
        .select("l_orderkey", "l_partkey")
    )
    a, b = li.alias("a"), li.alias("b")
    fwd = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
        .distinct()
    )
    edges = fwd.unionAll(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    starts = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .filter(F.col("node") % 20 == 0)
    )
    out = random_walks(
        edges, starts, walk_len=4, walks_per_node=2, seed=7
    )
    return out.select(
        F.col("start").cast("long").alias("start"),
        F.col("walk").cast("int").alias("walk"),
        F.col("step").cast("int").alias("step"),
        F.col("node").cast("long").alias("node"),
    ).orderBy("start", "walk", "step")
