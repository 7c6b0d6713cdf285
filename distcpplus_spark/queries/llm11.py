"""Round-11 hash-gated twins — closing the last rows-only gaps.

Every x-query whose engine-native form can't be oracle-checked gets a
twin here that runs the SAME operator code under parameters a SQL
engine can reproduce exactly (the q259 literal-plane / q281
fixed-tree devices), so the driver hash gate value-checks the full
pipeline structure; the engine-native delta (xxhash64, default
heuristics) keeps its quantitative pytest contract.

* q416 — x03's single-probe LSH top-k, literal-plane oracle.
* q417 — x09's probed IVF search over the iters=0 seed quantizer
  (Lloyd refinement is gated separately by q239).
* q418 — x02's simhash operator in portable-md5 mode (same function,
  same explode/vote/pack code path).
* q419 — x08's cost-bucket assignment on the q281 fixed tree with a
  pinned bytes_per_task, through the REAL engine.plan on a real
  filesystem (q282 gates actions; this pins the bucket column q282
  documented as ungated).

Reference parity: the LSH/IVF tiers generalize the reference's
size-balanced partitioning idea (CopyInputFormat.java:33-79) to
similarity workloads; q419 gates the direct mapping of that exact
Java logic (setMapCount, DistCPPlus.java:442-451).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distcpplus_spark.catalog import load_table
from distcpplus_spark.queries import local_rows, query


def _sql_cos(a: str, b: str) -> str:
    return (
        f"list_dot_product({a}, {b}) / "
        f"(sqrt(list_dot_product({a}, {a})) * "
        f"sqrt(list_dot_product({b}, {b})))"
    )


def _lsh_topk_oracle() -> str:
    """x03-mirror oracle: the SAME seeded hyperplanes the engine uses
    (make_hyperplanes is pure python — shared source of truth),
    embedded as SQL literals via repr() (shortest-round-trip floats
    parse back to the identical double). Single-probe: each query
    scores ONLY its own sign-signature bucket."""
    from distcpplus_spark.operators.similarity import make_hyperplanes

    planes = make_hyperplanes(64, 4, 42)
    bits = " || ".join(
        "(CASE WHEN list_dot_product(v, ["
        + ", ".join(repr(c) for c in plane)
        + "]) >= 0 THEN '1' ELSE '0' END)"
        for plane in planes
    )
    return f"""
    WITH vecs AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings WHERE vec_id < 300
    ),
    sig AS (
      SELECT vec_id, v, {bits} AS s FROM vecs
    ),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
             {_sql_cos('q.v', 'c.v')} AS raw
      FROM sig q JOIN sig c ON q.s = c.s AND q.vec_id <> c.vec_id
      WHERE q.vec_id < 5
    ),
    ranked AS (
      SELECT query_id, corpus_id, raw,
             row_number() OVER (
               PARTITION BY query_id ORDER BY raw DESC, corpus_id
             ) AS rank
      FROM scored
    )
    SELECT query_id, corpus_id,
           CAST(round(raw, 6) AS DOUBLE) AS cos_sim,
           CAST(rank AS INTEGER) AS rank
    FROM ranked WHERE rank <= 5
    ORDER BY query_id, rank
    """


@query("q416_lsh_topk_gated", oracle=_lsh_topk_oracle())
def q416_lsh_topk_gated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x03's single-probe hyperplane-LSH top-k under the FULL driver
    hash gate: the oracle re-derives the seeded hyperplanes from the
    same make_hyperplanes source the engine uses, recomputes every
    sign signature, restricts scoring to exact-bucket collisions, and
    ranks by the same raw cosine with the same corpus_id tiebreak —
    bucket membership, candidate set, cosine values, AND ranks are
    all value-checked. x03 stays the engine-native run (n_planes=8,
    full corpus). Scale shape identical: bucket equi-join, per-query
    WindowGroupLimit top-k."""
    from distcpplus_spark.operators.similarity import lsh_topk

    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < 300
    )
    out = lsh_topk(
        emb,
        emb.filter(F.col("vec_id") < 5),
        "embedding",
        "vec_id",
        k=5,
        n_planes=4,
    )
    return out.select(
        "query_id",
        "corpus_id",
        F.round("cos_sim", 6).alias("cos_sim"),
        F.col("rank").cast("int").alias("rank"),
    ).orderBy("query_id", "rank")


_IVF_PROBED_ORACLE = f"""
    WITH vecs AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings WHERE vec_id < 300
    ),
    cents AS MATERIALIZED (
      SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER)
               AS list_id,
             v AS cvec
      FROM vecs ORDER BY vec_id LIMIT 8
    ),
    asn AS MATERIALIZED (
      SELECT vec_id, v, list_id FROM (
        SELECT a.vec_id, a.v, c.list_id,
               row_number() OVER (
                 PARTITION BY a.vec_id
                 ORDER BY {_sql_cos('a.v', 'c.cvec')} DESC, c.list_id
               ) AS rn
        FROM vecs a, cents c
      ) WHERE rn = 1
    ),
    probes AS (
      SELECT query_id, qv, list_id FROM (
        SELECT q.vec_id AS query_id, q.v AS qv, c.list_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {_sql_cos('q.v', 'c.cvec')} DESC, c.list_id
               ) AS rn
        FROM vecs q, cents c WHERE q.vec_id < 5
      ) WHERE rn <= 2
    ),
    scored AS (
      SELECT p.query_id, a.vec_id AS corpus_id,
             {_sql_cos('p.qv', 'a.v')} AS raw
      FROM probes p JOIN asn a USING (list_id)
      WHERE a.vec_id <> p.query_id
    ),
    ranked AS (
      SELECT query_id, corpus_id, raw,
             row_number() OVER (
               PARTITION BY query_id ORDER BY raw DESC, corpus_id
             ) AS rank
      FROM scored
    )
    SELECT query_id, corpus_id,
           CAST(round(raw, 6) AS DOUBLE) AS cos_sim,
           CAST(rank AS INTEGER) AS rank
    FROM ranked WHERE rank <= 5
    ORDER BY query_id, rank
    """


@query("q417_ivf_probed_gated", oracle=_IVF_PROBED_ORACLE)
def q417_ivf_probed_gated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x09's PROBED IVF search under the full driver hash gate. The
    build uses the iters=0 seed quantizer (centroid i = the i-th
    lowest-id vector — no RNG, no Lloyd step), which the oracle
    reproduces with a LIMIT-8 rank; the Lloyd refinement x09 layers
    on top is hash-gated separately by q239's unrolled assign/means
    CTEs. What THIS query value-checks that nothing else did: the
    nearest-centroid assignment fold (strictly-greater displacement =
    ties to the lowest list_id — mirrored by the rn=1 rank with the
    list_id tiebreak), the nprobe=2 centroid ranking per query, the
    probe-restricted scan, and the final exact-cosine top-5. Scale
    shape identical to x09: KB centroid broadcast, shuffle-free
    assignment fold, probes scan nprobe/n_lists of the corpus."""
    from distcpplus_spark.operators.similarity import ivf_build, ivf_search

    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < 300
    )
    assigned, centroids = ivf_build(
        emb, "embedding", "vec_id", n_lists=8, iters=0, persist=False
    )
    out = ivf_search(
        assigned,
        centroids,
        emb.filter(F.col("vec_id") < 5),
        "embedding",
        "vec_id",
        k=5,
        nprobe=2,
    )
    return out.select(
        "query_id",
        "corpus_id",
        F.round("cos_sim", 6).alias("cos_sim"),
        F.col("rank").cast("int").alias("rank"),
    ).orderBy("query_id", "rank")


@query(
    "q418_simhash_gated",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      FROM documents WHERE doc_id < 200
    ),
    bits AS (
      SELECT doc_id, b.i AS i,
             CASE WHEN substr(md5(tok), CAST(b.i + 1 AS INTEGER), 1)
                       >= '8'
                  THEN 1 ELSE -1 END AS sign
      FROM toks, range(0, 32) b(i)
    ),
    votes AS (
      SELECT doc_id, i, sum(sign) AS v FROM bits GROUP BY doc_id, i
    )
    SELECT doc_id,
           CAST(sum(CASE WHEN v >= 0
                    THEN CAST(1 AS BIGINT) << CAST(i AS INTEGER)
                    ELSE 0 END) AS BIGINT) AS simhash
    FROM votes GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def q418_simhash_gated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x02's simhash OPERATOR (operators.dedup.simhash_fingerprints)
    under the driver hash gate: the SAME function runs in
    portable=True mode — identical explode/per-bit-vote/bit-pack code
    path, only the token-hash source differs (md5 hex high bits
    instead of xxhash64 bit extraction) — and the oracle recomputes
    all 32 vote sums and the packed fingerprint relationally. The
    xxhash64 fast path x02 exercises keeps its quantitative near-dup
    contract in tests/test_simhash_contract.py (planted-duplicate
    Hamming separation with the REAL hash)."""
    from distcpplus_spark.operators.dedup import simhash_fingerprints

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 200
    )
    return (
        simhash_fingerprints(docs, "text", "doc_id", portable=True)
        .select(F.col("_id").alias("doc_id"), "simhash")
        .orderBy("doc_id")
    )


@query(
    "q419_copy_bucket_gated",
    oracle="""
    SELECT * FROM (VALUES
      ('', CAST(0 AS BIGINT), true, 'mkdir', CAST(0 AS INTEGER)),
      ('a', 0, true, 'mkdir', 0),
      ('a/b', 0, true, 'mkdir', 0),
      ('a/b/f2.bin', 2500, false, 'copy_new', 0),
      ('a/f1.txt', 100, false, 'copy_new', 2),
      ('c', 0, true, 'mkdir', 2),
      ('c/f3.txt', 7, false, 'copy_new', 2),
      ('empty.dat', 0, false, 'copy_new', 2),
      ('root.txt', 42, false, 'copy_new', 2)
    ) t(relative_dst, length, is_dir, action, bucket)
    ORDER BY relative_dst
    """,
)
def q419_copy_bucket_gated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cost-bucket column of the REAL copy plan under the driver
    hash gate — the one column q282 documented as ungated. With
    bytes_per_task PINNED (1000 B) the map-count heuristic and the
    greedy size-balanced packing are fully deterministic: total cost
    2649 B → n = 3 buckets, target = ceil(2649/3) = 883; bucket =
    floor(exclusive_prefix_cost / target) in global path order, so
    f2.bin's 2500 B lands in bucket 0 and pushes everything after it
    to bucket 2 (bucket 1 is legitimately empty — the greedy quirk
    the reference shares, CopyInputFormat.java:33-79). The oracle
    pins every bucket id from that hand computation; the prefix sum
    itself is the distributed two-phase machinery (scale.py), so this
    also value-checks its carry logic on a real plan."""
    import shutil as _sh
    import tempfile as _tf

    from distcpplus_spark.engine import CopyOptions, DistCpPlusEngine
    from distcpplus_spark.queries.llm5 import _build_fixture_tree

    root = _tf.mkdtemp(prefix="q419_tree_")
    dst = _tf.mkdtemp(prefix="q419_dst_")
    try:
        _build_fixture_tree(root)
        plan = DistCpPlusEngine(spark).plan(
            [root],
            dst,
            CopyOptions(update=True, skip_ts_check=True, bytes_per_task=1000),
        )
        rows = (
            plan.copies.select(
                "relative_dst", "length", "is_dir", "action",
                F.col("bucket").cast("int").alias("bucket"),
            )
            .orderBy("relative_dst")
            .collect()
        )
    finally:
        _sh.rmtree(root, ignore_errors=True)
        _sh.rmtree(dst, ignore_errors=True)
    return local_rows(spark,
        rows,
        "relative_dst STRING, length BIGINT, is_dir BOOLEAN, "
        "action STRING, bucket INT",
    ).orderBy("relative_dst")


@query(
    "q420_quality_decile_stats",
    oracle="""
    WITH r AS (
      SELECT doc_id, n_chars,
             ntile(10) OVER (ORDER BY n_chars, doc_id) AS decile
      FROM documents
    )
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(n_chars) AS BIGINT) AS min_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars,
           CAST(round(sum(CAST(n_chars AS BIGINT))
                      / CAST(count(*) AS DOUBLE), 6) AS DOUBLE)
               AS avg_chars_6
    FROM r GROUP BY decile ORDER BY decile
    """,
)
def q420_quality_decile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile-based curation cut — the standard LLM-pipeline move of
    bucketing a corpus by a quality metric and reading per-decile
    stats before choosing a keep threshold. The decile assignment is
    a GLOBAL ntile over the whole SF-scaled corpus, computed
    distributed (operators.scale.distributed_ranks: range
    repartition + two-phase prefix sum + one scalar count — no
    partition-less Window), and the output is 10 rows at any SF, so
    the oracle compare stays O(1) while the ranking frame scales.
    The (n_chars, doc_id) order is total, so the unique_order fast
    path applies. avg is an exact integer sum divided once."""
    from distcpplus_spark.operators.scale import distributed_ranks

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars"
    )
    ranked = distributed_ranks(
        docs,
        order=[("n_chars", True), ("doc_id", True)],
        unique_order=True,
        ntile=(10, "_decile"),
    )
    return (
        ranked.groupBy(F.col("_decile").cast("bigint").alias("decile"))
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.min("n_chars").cast("bigint").alias("min_chars"),
            F.max("n_chars").cast("bigint").alias("max_chars"),
            F.round(
                F.sum(F.col("n_chars").cast("long"))
                / F.count("*").cast("double"),
                6,
            ).alias("avg_chars_6"),
        )
        .orderBy("decile")
    )


@query(
    "q421_ols_moments_scale_path",
    oracle="""
    WITH m AS (
      SELECT l_returnflag AS grp,
             count(*) AS n,
             sum(CAST(l_quantity AS BIGINT)) AS sx,
             sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS sy,
             sum(CAST(l_quantity AS BIGINT)
                 * CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                 AS sxy,
             sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
                 AS sxx
      FROM lineitem
      GROUP BY l_returnflag
    ),
    d AS (
      SELECT grp, n,
             CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS num,
             CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS den,
             CAST(sx AS DOUBLE) AS sx_d, CAST(sy AS DOUBLE) AS sy_d,
             CAST(n AS DOUBLE) AS n_d
      FROM m
    )
    SELECT grp, CAST(n AS BIGINT) AS n,
           CAST(round(num / den / 100.0, 6) AS DOUBLE) AS slope,
           CAST(round((sy_d - (num / den) * sx_d) / n_d / 100.0, 6)
                AS DOUBLE) AS intercept
    FROM d
    ORDER BY grp
    """,
)
def q421_ols_moments_scale_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB path for q74's per-group OLS fit: ALGEBRAIC moments
    via built-in integer aggregates instead of a grouped-map UDAF.

    q74 demonstrates the applyInPandas API shape; its cost model is
    the documented grouped-map caveat — each group's rows materialize
    as ONE pandas frame in ONE task, and lineitem has only three
    l_returnflag groups, so parallelism is 3 and the per-task frame is
    |table|/3 rows (54 s of the sf10 headline wall, the one
    superlinear query in the sf10 audit). This twin computes the SAME
    fit as one partial-aggregated shuffle of five moment columns —
    map-side combine does |table|/|tasks| of the work per task, the
    reduce sees |groups| rows, and no Python worker touches data.

    Exactness device (new in round 13): both inputs live on integer
    lattices (l_quantity is an integral double; l_extendedprice is on
    the cent lattice), so the moments Σx, Σy, Σxy, Σx² are EXACT
    BIGINTs in both engines — order-independent, any SF. The final
    slope/intercept combination is a TEXTUALLY IDENTICAL double
    expression over those identical integers in both engines (IEEE
    ops on equal inputs give equal bits), so the round-6 compare
    carries no accumulated float-sum risk — unlike naive
    regr_slope-style streaming accumulation, whose partial-sum order
    diverges across engines and runs. Σxy ≈ 1e16 cents·units at sf10
    stays ~600× under the BIGINT cap; the double CONVERSION of equal
    integers rounds identically (IEEE nearest) in both engines.

    Cites turn/DistCPPlus provenance: no analogue (the reference
    copies bytes, DefaultCopyFilesMapper.java); this extends SURVEY
    §2b's UDF-surface family with the built-in escape hatch its
    docstrings promise."""
    from distcpplus_spark.queries import small_sort

    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("long")
    y = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    m = (
        li.select(F.col("l_returnflag").alias("grp"), x.alias("x"), y.alias("y"))
        .groupBy("grp")
        .agg(
            F.count("*").alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
        )
    )
    n_d = F.col("n").cast("double")
    sx_d = F.col("sx").cast("double")
    sy_d = F.col("sy").cast("double")
    num = n_d * F.col("sxy").cast("double") - sx_d * sy_d
    den = n_d * F.col("sxx").cast("double") - sx_d * sx_d
    return (
        m.select(
            "grp",
            F.col("n").cast("bigint").alias("n"),
            F.round(num / den / F.lit(100.0), 6).alias("slope"),
            F.round(
                (sy_d - (num / den) * sx_d) / n_d / F.lit(100.0), 6
            ).alias("intercept"),
        )
        .transform(small_sort, "grp")
    )


@query(
    "q422_skewed_shj_guard",
    oracle="""
    WITH fact AS (
      SELECT least(greatest(
               1000000 // (((event_id * 2654435761 + 1013904223)
                            % 1000003) + 1), 1), 1000) AS k,
             event_type,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_cents
      FROM events
    )
    SELECT f.event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(f.value_cents) AS BIGINT) AS value_cents
    FROM fact f JOIN supplier s ON f.k = s.s_suppkey
    GROUP BY f.event_type
    ORDER BY f.event_type
    """,
)
def q422_skewed_shj_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standing regression guard for the session-wide
    ``spark.sql.join.preferSortMergeJoin=false`` default
    (session.py): a shuffled-hash join whose PROBE side is
    deliberately Zipf-skewed, oracle-checked at every sweep SF and a
    member of the sf10 spot set — if the global SHJ preference ever
    regresses on a skewed shuffle join (build-side OOM class, wrong
    results under AQE skew split), this query fails the gate rather
    than the regression shipping silently.

    Skew device: events.user_id is UNIFORM in the fixture, so the
    hot key is derived deterministically from event_id with a pure
    INTEGER mixer — h = (event_id*2654435761 + 1013904223) mod
    1000003, k = clamp(1000000 div (h+1), 1, 1000) — putting ~50% of
    all fact rows on k=1 (P[k>=j] ~ 1/j, the Zipf tail). Integer
    arithmetic end-to-end: unlike the pow()-based key in
    tests/test_aqe_skew.py (Spark-side only), both engines compute
    identical bits with no transcendental-floor boundary risk, so
    the DuckDB oracle stays in lockstep at any SF. The join lands on
    supplier.s_suppkey; the ``shuffle_hash`` hint pins the SHJ shape
    at EVERY data scale (below the broadcast threshold a small dim
    would otherwise broadcast and the guard would test nothing) —
    tests/test_aqe_skew.py::test_q422_plan_is_shj pins the plan.

    Money device: value is on the cent lattice, so
    floor(value*100 + 0.5) sums are exact BIGINTs in both engines.

    Cites turn/DistCPPlus provenance: no analogue (the reference's
    one join-free shuffle is the size-balanced bucket partition,
    CopyInputFormat.java:33-79); this guards the engine-tier join
    default declared in SURVEY.md §2b's scale levers."""
    from distcpplus_spark.queries import small_sort

    ev = load_table(spark, sf_dir, "events")
    sup = load_table(spark, sf_dir, "supplier")
    fact = ev.selectExpr(
        "least(greatest(1000000 div (((event_id * 2654435761 "
        "+ 1013904223) % 1000003) + 1), 1), 1000) AS k",
        "event_type",
        "CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_cents",
    )
    dim = sup.select(F.col("s_suppkey").alias("k"))
    return (
        fact.join(dim.hint("shuffle_hash"), "k")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum("value_cents").cast("bigint").alias("value_cents"),
        )
        .transform(small_sort, "event_type")
    )
