"""Round-8 continuation queries (session 7): survival analysis,
experiment variance reduction, winnowing fingerprints, sorted-
neighborhood entity blocking, ranking-quality metrics, sequential
pattern mining.

Reference parity notes cite turn/DistCPPlus files as provenance
(what to compute), never as implementation source — the execution
design here is Spark-first (see SURVEY.md §2).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from distcpplus_spark.catalog import load_table
from distcpplus_spark.operators.scale import (
    partitioned_running_agg,
    partitioned_running_aggs,
)
from distcpplus_spark.queries import local_rows, money_sum, query, small_sort


@query(
    "q367_kaplan_meier",
    oracle="""
    WITH mx AS (SELECT max(ts) AS m FROM events),
    u AS (
      SELECT user_id,
             date_diff('day', CAST(min(ts) AS DATE), CAST(max(ts) AS DATE))
               AS dur,
             CASE WHEN max(ts) >= (SELECT m FROM mx) - INTERVAL 2 DAY
                  THEN 1 ELSE 0 END AS censored
      FROM events GROUP BY user_id
    ),
    g AS (
      SELECT dur,
             CAST(sum(1 - censored) AS BIGINT) AS d,
             CAST(sum(censored) AS BIGINT) AS c
      FROM u GROUP BY dur
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS total FROM u),
    r AS (
      SELECT dur, d, c,
             (SELECT total FROM n)
               - (sum(d + c) OVER (ORDER BY dur) - (d + c)) AS at_risk
      FROM g
    )
    SELECT dur, d, c, CAST(at_risk AS BIGINT) AS at_risk,
           -- d == at_risk => ln(0): DuckDB ERRORS on ln(0), so the
           -- terminal all-deaths group is emitted as -infinity
           -- explicitly (exp => exact 0), mirroring the operator
           CAST(round(exp(sum(CASE WHEN d >= at_risk
                                   THEN CAST('-infinity' AS DOUBLE)
                                   ELSE ln(1.0 - CAST(d AS DOUBLE) / at_risk)
                              END)
                          OVER (ORDER BY dur)), 6) AS DOUBLE) AS survival_6
    FROM r ORDER BY dur
    """,
)
def q367_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier product-limit survival estimate of user lifetime
    (days between first and last event), right-censoring users still
    active within 2 days of the corpus end — the churn/retention
    curve a lifecycle analysis starts from. S(t) = prod_{t_i<=t}
    (1 - d_i/n_i) computed as exp(running sum of ln terms).

    Scale: one per-user hash agg, then a per-duration hash agg whose
    cardinality is bounded by the OBSERVATION WINDOW (days), not the
    data; both running sums (at-risk depletion, log-survival) go
    through the two-phase distributed prefix sum — no partition-less
    window even though the life table is small, keeping the registry
    window gate clean."""
    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("m")).collect()[0]["m"]
    import datetime

    cutoff = mx - datetime.timedelta(days=2)
    u = ev.groupBy("user_id").agg(
        F.datediff(F.to_date(F.max("ts")), F.to_date(F.min("ts"))).alias(
            "dur"
        ),
        F.when(F.max("ts") >= F.lit(cutoff), F.lit(1))
        .otherwise(F.lit(0))
        .alias("censored"),
    )
    total = u.count()
    g = u.groupBy("dur").agg(
        F.sum(1 - F.col("censored")).cast("long").alias("d"),
        F.sum("censored").cast("long").alias("c"),
    )
    g = partitioned_running_agg(
        g.withColumn("dc", F.col("d") + F.col("c")),
        order_cols=["dur"],
        value_col="dc",
        out_col="cum_dc",
        bucket=(F.col("dur") / 8).cast("bigint"),
    )
    g = g.withColumn(
        "at_risk", (F.lit(total) - (F.col("cum_dc") - F.col("dc"))).cast("long")
    ).withColumn(
        # d == at_risk (everyone left dies at this duration) makes the
        # term ln(0): Spark F.log(0) returns NULL — which a running
        # SUM silently drops, freezing survival at its previous value
        # — while DuckDB's ln(0) is -inf, giving the mathematically
        # right S(t)=0 tail. Emit -inf explicitly so both engines
        # agree and the curve really hits zero.
        "lnterm",
        F.when(
            F.col("d") >= F.col("at_risk"), F.lit(float("-inf"))
        ).otherwise(
            F.log(F.lit(1.0) - F.col("d").cast("double") / F.col("at_risk"))
        ),
    )
    g = partitioned_running_agg(
        g,
        order_cols=["dur"],
        value_col="lnterm",
        out_col="cum_ln",
        bucket=(F.col("dur") / 8).cast("bigint"),
    )
    return small_sort(
        g.select(
            "dur",
            "d",
            "c",
            "at_risk",
            F.round(F.exp("cum_ln"), 6).alias("survival_6"),
        ),
        "dur",
    )


@query(
    "q368_cuped_adjustment",
    oracle="""
    WITH u AS (
      SELECT user_id, user_id % 2 AS variant,
             sum(CASE WHEN date_part('day', ts) <= 15
                      THEN CAST(round(value * 100) AS BIGINT)
                      ELSE 0 END) / 100.0 AS x,
             sum(CASE WHEN date_part('day', ts) > 15
                      THEN CAST(round(value * 100) AS BIGINT)
                      ELSE 0 END) / 100.0 AS y
      FROM events GROUP BY user_id
    ),
    s AS (
      SELECT covar_pop(x, y) / var_pop(x) AS theta, avg(x) AS mean_x
      FROM u
    )
    SELECT variant,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(avg(y), 6) AS DOUBLE) AS mean_y_6,
           CAST(round(avg(y - s.theta * (x - s.mean_x)), 6) AS DOUBLE)
             AS mean_cuped_6,
           CAST(round(1.0 - var_pop(y - s.theta * (x - s.mean_x))
                            / var_pop(y), 6) AS DOUBLE) AS var_reduction_6
    FROM u CROSS JOIN s
    GROUP BY variant, s.theta, s.mean_x
    ORDER BY variant
    """,
)
def q368_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction for an A/B readout: pre-period
    covariate X (first half of the month) adjusts the post-period
    metric Y via theta = cov(X,Y)/var(X), shrinking the per-variant
    variance without biasing the mean — the standard experimentation
    trick for faster significance at fixed traffic.

    Determinism: per-user X/Y are rounded to exact cents BEFORE the
    covariance pass so both engines aggregate identical inputs (the
    q320 round-sum device); outputs are O(1)-magnitude ratios and
    means, round-6 safe.

    Scale: one per-user hash agg over the fact table, one scalar
    (theta, mean_x) aggregate broadcast back, one per-variant agg.
    No window, no driver data."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        money_sum(
            F.when(F.dayofmonth("ts") <= 15, F.col("value")).otherwise(0.0)
        ).alias("x"),
        money_sum(
            F.when(F.dayofmonth("ts") > 15, F.col("value")).otherwise(0.0)
        ).alias("y"),
    ).withColumn("variant", (F.col("user_id") % 2).cast("long"))
    s = u.agg(
        (F.covar_pop("x", "y") / F.var_pop("x")).alias("theta"),
        F.avg("x").alias("mean_x"),
    )
    adj = u.crossJoin(F.broadcast(s)).withColumn(
        "y_adj", F.col("y") - F.col("theta") * (F.col("x") - F.col("mean_x"))
    )
    return small_sort(
        adj.groupBy("variant").agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.avg("y"), 6).alias("mean_y_6"),
            F.round(F.avg("y_adj"), 6).alias("mean_cuped_6"),
            F.round(
                F.lit(1.0) - F.var_pop("y_adj") / F.var_pop("y"), 6
            ).alias("var_reduction_6"),
        ),
        "variant",
    )


_WINNOW_TOKS = "list_filter(string_split(lower(text), ' '), t -> t <> '')"

@query(
    "q369_winnowing_fingerprints",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, {_WINNOW_TOKS} AS toks FROM documents
      WHERE len({_WINNOW_TOKS}) BETWEEN 6 AND 128
    ),
    sh AS (
      SELECT doc_id, CAST(u.i AS INTEGER) - 1 AS pos,
             concat_ws(' ', toks[CAST(u.i AS INTEGER)],
                            toks[CAST(u.i AS INTEGER) + 1],
                            toks[CAST(u.i AS INTEGER) + 2]) AS shingle
      FROM d, LATERAL unnest(range(1, len(toks) - 1)) u(i)
    ),
    h AS (
      SELECT doc_id, pos,
             CAST(('0x' || substr(md5(shingle), 1, 13)) AS BIGINT) * 128
               + (127 - pos) AS key
      FROM sh
    ),
    sel AS (
      SELECT doc_id,
             min(key) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
               AS picked,
             pos
      FROM h
    )
    SELECT DISTINCT doc_id,
           CAST(127 - picked % 128 AS BIGINT) AS sel_pos,
           CAST(picked // 128 AS BIGINT) AS fingerprint
    FROM sel WHERE pos >= 3
    ORDER BY doc_id, sel_pos
    """,
)
def q369_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the MOSS algorithm): hash every 3-token shingle, then
    in each window of 4 consecutive hashes keep the minimum, rightmost
    on ties; the distinct (position, hash) picks are the fingerprint
    set, guaranteeing any shared run of >= w+k-1 tokens shares a
    fingerprint. The local-min device: pack hash and position into one
    BIGINT (52-bit md5-prefix hash * 128 + (127 - pos)) so a single
    MIN implements "min hash, rightmost position" identically in both
    engines — docs here are <= 128 tokens (filtered; longer docs would
    fingerprint per 128-token chunk).

    Scale: shingling explodes per-doc (docs are bounded); the
    selection window is PARTITIONED by doc_id — embarrassingly
    parallel, no global window, one distinct-agg shuffle."""
    d = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.filter(
                F.split(F.lower("text"), " ", -1), lambda t: t != ""
            ).alias("toks"),
        )
        .filter((F.size("toks") >= 6) & (F.size("toks") <= 128))
    )
    sh = d.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.size("toks") - 3),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at("toks", i + 1),
                    F.element_at("toks", i + 2),
                    F.element_at("toks", i + 3),
                ),
            )
        ).alias("pos", "shingle"),
    )
    h = sh.select(
        "doc_id",
        "pos",
        (
            F.conv(F.substring(F.md5("shingle"), 1, 13), 16, 10).cast("long")
            * 128
            + (F.lit(127) - F.col("pos"))
        ).alias("key"),
    )
    win = W.partitionBy("doc_id").orderBy("pos").rowsBetween(-3, 0)
    sel = (
        h.withColumn("picked", F.min("key").over(win))
        .filter(F.col("pos") >= 3)
        .select(
            "doc_id",
            (F.lit(127) - F.col("picked") % 128).cast("long").alias("sel_pos"),
            F.expr("picked div 128").cast("long").alias("fingerprint"),
        )
        .distinct()
    )
    return sel.orderBy("doc_id", "sel_pos")


@query(
    "q370_sorted_neighborhood_blocking",
    oracle="""
    WITH k AS (
      SELECT doc_id, lower(substr(text, 1, 24)) AS key FROM documents
    ),
    r AS (
      SELECT doc_id, key,
             row_number() OVER (ORDER BY key, doc_id) AS rk
      FROM k
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(levenshtein(a.key, b.key) AS BIGINT) AS lev
    FROM r a JOIN r b
      ON b.rk BETWEEN a.rk + 1 AND a.rk + 4
    WHERE levenshtein(a.key, b.key) <= 6
    ORDER BY doc_a, doc_b
    """,
)
def q370_sorted_neighborhood_blocking(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Sorted-neighborhood entity-resolution blocking (Hernandez &
    Stolfo, SIGMOD'95): sort records by a blocking key (first 24
    chars), slide a window of w=5 over the sorted order, and emit
    candidate pairs within the window that pass the cheap verify
    (edit distance <= 6 on the key) — the classic alternative to
    hash blocking when near-misses differ by typos that change the
    hash. The global sort RANK comes from the two-phase distributed
    prefix sum over a key-prefix bucket (no partition-less window);
    windowed pairing is an equi-join on rank+offset, so candidates
    are exactly (w-1)·n, never quadratic.

    Scale: rank via prefix sum; the offset explode is 4 rows per
    record; one equi-join on integer rank. At 100 TB the sort key
    bucket (2-char prefix) gives ~1k-way parallelism; skewed prefixes
    can widen the bucket expression without changing semantics."""
    k = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.lower(F.substring("text", 1, 24)).alias("key")
    )
    r = partitioned_running_agg(
        k.withColumn("one", F.lit(1)),
        order_cols=["key", "doc_id"],
        value_col="one",
        out_col="rk",
        bucket=F.substring("key", 1, 2),
    )
    left = r.select(
        F.col("doc_id").alias("doc_a"),
        F.col("key").alias("key_a"),
        F.explode(F.sequence(F.lit(1), F.lit(4))).alias("off"),
        F.col("rk").alias("rk_a"),
    ).withColumn("rk_b", F.col("rk_a") + F.col("off"))
    right = r.select(
        F.col("doc_id").alias("doc_b"),
        F.col("key").alias("key_b"),
        F.col("rk").alias("rk_b"),
    )
    return (
        left.join(right, "rk_b")
        .withColumn("lev", F.levenshtein("key_a", "key_b").cast("long"))
        .filter(F.col("lev") <= 6)
        .select("doc_a", "doc_b", "lev")
        .orderBy("doc_a", "doc_b")
    )


@query(
    "q371_average_precision",
    oracle="""
    WITH s AS (
      SELECT vec_id,
             round(CAST(embedding[1] AS DOUBLE), 6) AS score,
             CASE WHEN label = 1 THEN 1 ELSE 0 END AS rel
      FROM embeddings
    ),
    r AS (
      SELECT rel,
             row_number() OVER (ORDER BY score DESC, vec_id) AS rk,
             sum(rel) OVER (ORDER BY score DESC, vec_id) AS cum_rel
      FROM s
    )
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(rel) AS BIGINT) AS n_pos,
           CAST(round(sum(CAST(floor(CASE WHEN rel = 1
                               THEN CAST(cum_rel AS DOUBLE) / rk
                               ELSE 0 END * 1e9 + 0.5) AS BIGINT))
                      / 1e9 / sum(rel), 6) AS DOUBLE)
             AS avg_precision_6,
           CAST(round(sum(CASE WHEN rk <= 10 THEN CAST(rel AS BIGINT) ELSE 0 END)
                      / 10.0, 6) AS DOUBLE) AS p_at_10_6
    FROM r
    """,
)
def q371_average_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision (the area under the precision-recall curve's
    step function) plus precision@10 for a scored binary ranking —
    the retrieval/classifier eval beside q202's ROC-AUC: AP weights
    early precision, the metric that matters when only the top of the
    ranking is consumed. Scoring rule: first embedding dimension,
    relevance = (label == 1); ranking ties broken by vec_id after
    round-6 score canonicalization so both engines rank identically.

    Scale: rank and cumulative-relevant come from ONE two-phase
    distributed prefix-sum pass (two specs, one local window per
    score bucket) — no partition-less window; the finale is a scalar
    aggregate.

    Exactness (round 12, de-allowlisted): each precision term
    cum_rel/rk is quantized to integer 1e-9 units with
    floor(x*1e9 + 0.5) — TEXTUALLY the same floor expression in both
    engines, and every input op (integer prefix sums, double divide,
    multiply, floor) is IEEE-pinned, so the per-term integers are
    bit-identical cross-engine and the BIGINT sum is
    order-independent. The /n_pos normalization self-bounds the
    quantization bias at 0.5e-9 regardless of scale; the unit sum
    stays within BIGINT for n_pos up to ~9e9 rows."""
    s = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.round(F.col("embedding").getItem(0).cast("double"), 6).alias(
            "score"
        ),
        F.when(F.col("label") == 1, 1).otherwise(0).alias("rel"),
        F.lit(1).alias("one"),
    ).withColumn("neg", -F.col("score"))
    r = partitioned_running_aggs(
        s,
        order_cols=["neg", "vec_id"],
        specs=[("one", "rk", "sum"), ("rel", "cum_rel", "sum")],
        bucket=F.floor(F.col("neg") * 4).cast("bigint"),
    )
    return r.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("rel").cast("long").alias("n_pos"),
        F.round(
            F.sum(
                F.floor(
                    F.when(
                        F.col("rel") == 1,
                        F.col("cum_rel").cast("double") / F.col("rk"),
                    ).otherwise(0.0)
                    * 1e9
                    + F.lit(0.5)
                )
            )
            / 1e9
            / F.sum("rel"),
            6,
        ).alias("avg_precision_6"),
        F.round(
            F.sum(F.when(F.col("rk") <= 10, F.col("rel")).otherwise(0))
            / 10.0,
            6,
        ).alias("p_at_10_6"),
    )


@query(
    "q372_sequential_bigrams",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events
    ),
    tot AS (SELECT count(DISTINCT user_id) AS nu FROM events)
    SELECT prev AS from_event, event_type AS to_event,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(round(count(DISTINCT user_id)
                      / CAST((SELECT nu FROM tot) AS DOUBLE), 6)
                AS DOUBLE) AS support_6
    FROM seq WHERE prev IS NOT NULL
    GROUP BY prev, event_type
    ORDER BY from_event, to_event
    """,
)
def q372_sequential_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent sequential patterns of length 2 (adjacent event-type
    transitions per user, the PrefixSpan L2 pass) with per-pair user
    support — the sequence-mining counterpart of q322's basket rules
    and the input a next-event recommender or funnel designer ranks.

    Scale: the lag window is PARTITIONED by user (per-user history,
    the sessionization precedent); one (pair) hash agg with a
    distinct-user count; the user total is a scalar. Output
    cardinality is |event_type|^2 — bounded."""
    ev = load_table(spark, sf_dir, "events")
    nu = ev.select("user_id").distinct().count()
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("prev", F.lag("event_type").over(w)).filter(
        F.col("prev").isNotNull()
    )
    return small_sort(
        seq.groupBy(
            F.col("prev").alias("from_event"),
            F.col("event_type").alias("to_event"),
        ).agg(
            F.count("*").cast("long").alias("n"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
            F.round(
                F.countDistinct("user_id") / F.lit(float(nu)), 6
            ).alias("support_6"),
        ),
        "from_event",
        "to_event",
    )


def _kcore_oracle(rounds: int = 6, k: int = 3) -> str:
    """Unrolled peeling oracle: each round keeps nodes with degree
    >= k and restricts edges to kept endpoints. Measured fixpoint
    depth on the %17-sampled part co-occurrence graph is 1/2/3
    rounds at sf0.001/0.01/0.1 (peel depth SHRINKS as the graph
    densifies); 6 unrolled rounds leave 2x headroom and extra
    rounds past the fixpoint are no-ops. The Spark side iterates to
    the TRUE fixpoint and raises on its cap, so an under-unrolled
    oracle can only FAIL the gate, never silently agree.

    Every CTE is AS MATERIALIZED: each round references the previous
    edge set THREE times (directly + via both endpoint filters), so
    an inlining planner re-expands the whole subtree 3^rounds times -
    at sf1 the un-hinted oracle spilled >70 GB of DuckDB temp before
    dying. Materialization keeps the oracle linear in rounds."""
    parts = [
        """e0 AS MATERIALIZED (
      SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
      WHERE a.l_orderkey % 17 = 0
    )"""
    ]
    for r in range(rounds):
        parts.append(
            f"""n{r} AS MATERIALIZED (
      SELECT src FROM e{r} GROUP BY src HAVING count(*) >= {k}
    )"""
        )
        parts.append(
            f"""e{r + 1} AS MATERIALIZED (
      SELECT e.src, e.dst FROM e{r} e
      JOIN n{r} s ON e.src = s.src
      JOIN n{r} d ON e.dst = d.src
    )"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
    SELECT src AS node, CAST(count(*) AS BIGINT) AS core_degree
    FROM e{rounds} GROUP BY src ORDER BY node"""
    )


@query("q373_kcore_decomposition", oracle=_kcore_oracle())
def q373_kcore_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core of the part co-occurrence graph (operators/graph.py::
    k_core): the maximal subgraph where every part co-occurs with
    >= 3 core peers — the density tier used to separate organic
    cross-sell structure (beside q319's triangle spam signal) from
    pendant noise. The oracle unrolls the peeling recurrence as
    plain CTE rounds (see _kcore_oracle), so the engine's
    fixpoint-checked iteration is value-checked against the
    semantic spec, not against itself.

    Scale: each peel round is one degree hash agg + two semi-joins,
    lineage cut per round by localCheckpoint; peel depth shrinks as
    graphs densify, and a cap-hit raises instead of returning a
    partial core."""
    from distcpplus_spark.operators.graph import k_core

    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 17 == 0)
        .select("l_orderkey", "l_partkey")
    )
    a, b = li.alias("a"), li.alias("b")
    edges = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") != F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
    )
    core = k_core(edges, k=3)
    return core.select(
        F.col("node").cast("long").alias("node"),
        F.col("core_degree").cast("long").alias("core_degree"),
    ).orderBy("node")


@query(
    "q374_hash_kfold_split",
    oracle="""
    WITH f AS (
      SELECT lang,
             ((doc_id * 2654435761 + 1013904223) % 1000003) % 5 AS fold
      FROM documents
    ),
    t AS (SELECT lang, count(*) AS tot FROM f GROUP BY lang)
    SELECT f.lang AS lang, CAST(f.fold AS BIGINT) AS fold,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(count(*) / CAST(t.tot AS DOUBLE), 6) AS DOUBLE)
             AS share_6
    FROM f JOIN t ON f.lang = t.lang
    GROUP BY f.lang, f.fold, t.tot
    ORDER BY lang, fold
    """,
)
def q374_hash_kfold_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5-fold cross-validation assignment via the
    portable integer mixer (no RNG, restartable, identical on any
    cluster size) with a per-stratum balance audit: fold shares per
    language expose any stratum where hash assignment drifted from
    1/5 — the split audit run before k-fold training or eval. Exact
    per-(lang, fold) counts are the gate because the mixer is pure
    integer arithmetic both engines compute identically.

    Scale: one hash agg on (lang, fold) + one broadcast join of the
    per-lang totals; assignment is a map-side expression."""
    d = load_table(spark, sf_dir, "documents").select(
        "lang",
        (
            ((F.col("doc_id") * 2654435761 + 1013904223) % 1000003) % 5
        ).alias("fold"),
    )
    t = d.groupBy("lang").agg(F.count("*").alias("tot"))
    return small_sort(
        d.groupBy("lang", "fold")
        .agg(F.count("*").alias("n"))
        .join(F.broadcast(t), "lang")
        .select(
            "lang",
            F.col("fold").cast("long").alias("fold"),
            F.col("n").cast("long").alias("n"),
            F.round(F.col("n") / F.col("tot").cast("double"), 6).alias(
                "share_6"
            ),
        ),
        "lang",
        "fold",
    )


@query(
    "q375_isotonic_calibration",
    oracle="""
    WITH s AS MATERIALIZED (
      SELECT round(CAST(embedding[1] AS DOUBLE), 6) AS score,
             CASE WHEN label = 1 THEN 1 ELSE 0 END AS pos
      FROM embeddings
    ),
    m AS MATERIALIZED (SELECT min(score) AS mn, max(score) AS mx FROM s),
    bb AS (
      SELECT least(CAST(floor((score - m.mn) / (m.mx - m.mn) * 20)
                        AS BIGINT), 19) AS bin, pos
      FROM s CROSS JOIN m
    ),
    g AS (SELECT bin, count(*) AS n, sum(pos) AS np FROM bb GROUP BY bin),
    p AS (
      SELECT bin, n, np,
             sum(n) OVER (ORDER BY bin) AS cn,
             sum(np) OVER (ORDER BY bin) AS cp
      FROM g
    ),
    a AS (
      SELECT l.bin AS lb, j.bin AS jb,
             CAST(j.cp - (l.cp - l.np) AS DOUBLE)
               / (j.cn - (l.cn - l.n)) AS avg_lj
      FROM p l JOIN p j ON l.bin <= j.bin
    ),
    mi AS (
      SELECT i.bin, a.lb, min(a.avg_lj) AS mn_j
      FROM g i JOIN a ON a.lb <= i.bin AND a.jb >= i.bin
      GROUP BY i.bin, a.lb
    ),
    fit AS (SELECT bin, max(mn_j) AS fitted FROM mi GROUP BY bin)
    SELECT g.bin AS bin, CAST(g.n AS BIGINT) AS n,
           CAST(g.np AS BIGINT) AS n_pos,
           CAST(round(CAST(g.np AS DOUBLE) / g.n, 6) AS DOUBLE) AS rate_6,
           CAST(round(fit.fitted, 6) AS DOUBLE) AS fitted_6
    FROM g JOIN fit USING (bin) ORDER BY bin
    """,
)
def q375_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (monotone non-decreasing) calibration of a score's
    positive rate over 20 equal-width score bins — the calibration
    map a probability-consuming ranker applies after q349's ECE
    diagnosis says the raw scores are miscalibrated. Uses the exact
    minimax closed form of L2 isotonic regression, fitted(i) =
    max_{l<=i} min_{j>=i} weightedMean(rate[l..j]) — equivalent to
    pool-adjacent-violators (pinned by the PAVA property test in
    tests/test_stats.py) but expressible as joins over the BIN
    table, no sequential pooling loop.

    Determinism: interval means are single divisions of exact
    integer sums — identical doubles in both engines. Scale: the
    data-sized work is one binning hash agg; everything after runs
    on a 20-row frame (prefix sums via the two-phase helper to keep
    the window gate clean; the l<=j interval join is 210 rows)."""
    s = load_table(spark, sf_dir, "embeddings").select(
        F.round(F.col("embedding").getItem(0).cast("double"), 6).alias(
            "score"
        ),
        F.when(F.col("label") == 1, 1).otherwise(0).alias("pos"),
    )
    row = s.agg(F.min("score").alias("mn"), F.max("score").alias("mx")).collect()[0]
    mn, mx = float(row["mn"]), float(row["mx"])
    g = (
        s.select(
            F.least(
                F.floor(
                    (F.col("score") - F.lit(mn)) / F.lit(mx - mn) * 20
                ).cast("bigint"),
                F.lit(19).cast("bigint"),
            ).alias("bin"),
            "pos",
        )
        .groupBy("bin")
        .agg(F.count("*").alias("n"), F.sum("pos").alias("np"))
    )
    p = partitioned_running_aggs(
        g,
        order_cols=["bin"],
        specs=[("n", "cn", "sum"), ("np", "cp", "sum")],
        bucket=(F.col("bin") / 8).cast("bigint"),
    )
    l = p.select(
        F.col("bin").alias("lb"),
        F.col("n").alias("ln"),
        F.col("np").alias("lnp"),
        F.col("cn").alias("lcn"),
        F.col("cp").alias("lcp"),
    )
    j = p.select(
        F.col("bin").alias("jb"),
        F.col("cn").alias("jcn"),
        F.col("cp").alias("jcp"),
    )
    a = l.join(F.broadcast(j), F.col("lb") <= F.col("jb")).select(
        "lb",
        "jb",
        (
            (F.col("jcp") - (F.col("lcp") - F.col("lnp"))).cast("double")
            / (F.col("jcn") - (F.col("lcn") - F.col("ln")))
        ).alias("avg_lj"),
    )
    i = g.select(F.col("bin").alias("ib"))
    mi = (
        i.join(
            F.broadcast(a),
            (F.col("lb") <= F.col("ib")) & (F.col("jb") >= F.col("ib")),
        )
        .groupBy("ib", "lb")
        .agg(F.min("avg_lj").alias("mn_j"))
    )
    fit = mi.groupBy("ib").agg(F.max("mn_j").alias("fitted"))
    return small_sort(
        g.join(fit, g["bin"] == fit["ib"])
        .select(
            "bin",
            F.col("n").cast("long").alias("n"),
            F.col("np").cast("long").alias("n_pos"),
            F.round(F.col("np").cast("double") / F.col("n"), 6).alias(
                "rate_6"
            ),
            F.round("fitted", 6).alias("fitted_6"),
        ),
        "bin",
    )


@query(
    "q376_f1_threshold_sweep",
    oracle="""
    WITH s AS MATERIALIZED (
      SELECT round(CAST(embedding[1] AS DOUBLE), 6) AS score,
             CASE WHEN label = 1 THEN 1 ELSE 0 END AS rel
      FROM embeddings
    ),
    tot AS (SELECT sum(rel) AS n_pos FROM s),
    g AS (SELECT score, count(*) AS cnt, sum(rel) AS np FROM s GROUP BY score),
    c AS (
      SELECT score,
             sum(cnt) OVER (ORDER BY score DESC) AS pred_pos,
             sum(np) OVER (ORDER BY score DESC) AS tp
      FROM g
    ),
    f AS (
      SELECT score AS threshold,
             CAST(tp AS BIGINT) AS tp,
             CAST(pred_pos - tp AS BIGINT) AS fp,
             CAST((SELECT n_pos FROM tot) - tp AS BIGINT) AS fn,
             2.0 * tp / (pred_pos + (SELECT n_pos FROM tot)) AS f1
      FROM c
    )
    SELECT threshold, tp, fp, fn,
           CAST(round(CAST(tp AS DOUBLE) / (tp + fp), 6) AS DOUBLE)
             AS precision_6,
           CAST(round(CAST(tp AS DOUBLE) / (tp + fn), 6) AS DOUBLE)
             AS recall_6,
           CAST(round(f1, 6) AS DOUBLE) AS f1_6
    FROM f ORDER BY f1 DESC, threshold ASC LIMIT 1
    """,
)
def q376_f1_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimal decision threshold by F1 sweep: evaluate precision/
    recall/F1 at EVERY distinct score cut in one pass and return the
    argmax — the operating-point selection that turns q202's AUC or
    q375's calibrated scores into a deployable classifier. tp/fp at
    each cut come from cumulative counts over score-descending order;
    F1 ties break toward the lower threshold, and F1 itself is a
    single division of exact integers so both engines order
    identically.

    Scale: one (score, count) hash agg at DISTINCT-VALUE cardinality,
    the cumulative counts via the two-phase distributed prefix sum
    (no partition-less window), one TakeOrderedAndProject(1)."""
    s = load_table(spark, sf_dir, "embeddings").select(
        F.round(F.col("embedding").getItem(0).cast("double"), 6).alias(
            "score"
        ),
        F.when(F.col("label") == 1, 1).otherwise(0).alias("rel"),
    )
    n_pos = s.agg(F.sum("rel")).collect()[0][0]
    g = (
        s.groupBy("score")
        .agg(F.count("*").alias("cnt"), F.sum("rel").alias("np"))
        .withColumn("neg", -F.col("score"))
    )
    c = partitioned_running_aggs(
        g,
        order_cols=["neg"],
        specs=[("cnt", "pred_pos", "sum"), ("np", "tp", "sum")],
        bucket=F.floor(F.col("neg") * 4).cast("bigint"),
    )
    f = c.select(
        F.col("score").alias("threshold"),
        F.col("tp").cast("long").alias("tp"),
        (F.col("pred_pos") - F.col("tp")).cast("long").alias("fp"),
        (F.lit(n_pos) - F.col("tp")).cast("long").alias("fn"),
        (
            F.lit(2.0) * F.col("tp") / (F.col("pred_pos") + F.lit(n_pos))
        ).alias("f1"),
    )
    return (
        f.orderBy(F.desc("f1"), F.asc("threshold"))
        .limit(1)
        .select(
            "threshold",
            "tp",
            "fp",
            "fn",
            F.round(
                F.col("tp").cast("double") / (F.col("tp") + F.col("fp")), 6
            ).alias("precision_6"),
            F.round(
                F.col("tp").cast("double") / (F.col("tp") + F.col("fn")), 6
            ).alias("recall_6"),
            F.round("f1", 6).alias("f1_6"),
        )
    )


@query(
    "q377_class_balanced_downsample",
    oracle="""
    WITH p AS (
      SELECT vec_id, label,
             (vec_id * 2654435761 + 1013904223) % 1000003 AS pri
      FROM embeddings
    ),
    m AS (SELECT min(cnt) AS cap FROM
            (SELECT count(*) AS cnt FROM p GROUP BY label)),
    r AS (
      SELECT vec_id, label,
             row_number() OVER (PARTITION BY label
                                ORDER BY pri, vec_id) AS rk
      FROM p
    )
    SELECT label, CAST(count(*) AS BIGINT) AS n_selected,
           CAST(bit_xor(vec_id) AS BIGINT) AS id_xor
    FROM r WHERE rk <= (SELECT cap FROM m)
    GROUP BY label ORDER BY label
    """,
)
def q377_class_balanced_downsample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Class-balanced downsampling: cap every label at the MINORITY
    class size, choosing survivors by the portable integer-mixer
    priority (deterministic, restartable, no RNG) — the rebalancing
    step before training a classifier on skewed labels. The xor of
    selected ids gates the EXACT selection set, not just the counts.

    Scale: the per-label rank is a PARTITIONED window whose
    rank-filter pushes down to WindowGroupLimit (a cap-row heap per
    partition, never a full sort); the cap is one scalar aggregate.
    Labels are the stratification key, so skew equals class skew —
    the salting lever applies if one class dominates."""
    p = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        ((F.col("vec_id") * 2654435761 + 1013904223) % 1000003).alias("pri"),
    )
    cap = (
        p.groupBy("label")
        .agg(F.count("*").alias("cnt"))
        .agg(F.min("cnt"))
        .collect()[0][0]
    )
    w = W.partitionBy("label").orderBy("pri", "vec_id")
    sel = p.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= F.lit(int(cap))
    )
    return small_sort(
        sel.groupBy("label").agg(
            F.count("*").cast("long").alias("n_selected"),
            F.bit_xor("vec_id").cast("long").alias("id_xor"),
        ),
        "label",
    )


_NOVELTY_TOKS = "list_filter(string_split(lower(text), ' '), t -> t <> '')"

@query(
    "q378_ngram_novelty",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, {_NOVELTY_TOKS} AS toks FROM documents
      WHERE len({_NOVELTY_TOKS}) >= 3
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             concat_ws(' ', toks[CAST(u.i AS INTEGER)],
                            toks[CAST(u.i AS INTEGER) + 1],
                            toks[CAST(u.i AS INTEGER) + 2]) AS shingle
      FROM d, LATERAL unnest(range(1, len(toks) - 1)) u(i)
    ),
    ref AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 2 = 0),
    cand AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 2 = 1),
    j AS (
      SELECT c.doc_id,
             count(*) AS n_shingles,
             sum(CASE WHEN r.shingle IS NULL THEN 1 ELSE 0 END) AS n_novel
      FROM cand c LEFT JOIN ref r ON c.shingle = r.shingle
      GROUP BY c.doc_id
    )
    SELECT doc_id, CAST(n_shingles AS BIGINT) AS n_shingles,
           CAST(n_novel AS BIGINT) AS n_novel,
           CAST(round(CAST(n_novel AS DOUBLE) / n_shingles, 6) AS DOUBLE)
             AS novelty_6
    FROM j ORDER BY doc_id
    """,
)
def q378_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty against a reference corpus (even
    doc_ids as the "already trained on" set, odd as candidates):
    the fraction of a candidate's distinct 3-token shingles absent
    from the reference — the inverse of q261's contamination scan,
    used to prioritize genuinely NEW data when extending a training
    mix. Matching is an anti-join-shaped left join on the shingle
    key; novelty = unmatched / total.

    Scale: shingle sets are distinct-deduped per side before the
    join (set semantics, bounds the shuffle at repeated-phrase
    corpora); the join is term-keyed like the inverted index — a
    power-law head term can be salted without changing semantics."""
    d = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.filter(
                F.split(F.lower("text"), " ", -1), lambda t: t != ""
            ).alias("toks"),
        )
        .filter(F.size("toks") >= 3)
    )
    sh = d.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("toks") - 3),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at("toks", i + 1),
                    F.element_at("toks", i + 2),
                    F.element_at("toks", i + 3),
                ),
            )
        ).alias("shingle"),
    ).distinct()
    ref = (
        sh.filter(F.col("doc_id") % 2 == 0).select("shingle").distinct()
    ).withColumn("hit", F.lit(1))
    cand = sh.filter(F.col("doc_id") % 2 == 1)
    j = (
        cand.join(ref, "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_shingles"),
            F.sum(
                F.when(F.col("hit").isNull(), 1).otherwise(0)
            ).cast("long").alias("n_novel"),
        )
    )
    return j.select(
        "doc_id",
        "n_shingles",
        "n_novel",
        F.round(
            F.col("n_novel").cast("double") / F.col("n_shingles"), 6
        ).alias("novelty_6"),
    ).orderBy("doc_id")


def _textrank_oracle(iters: int = 4) -> str:
    """Unrolled weighted-PageRank (TextRank) oracle over the adjacent-
    token co-occurrence graph (symmetric counts >= 3, no self-loops).
    The vocabulary of the fixture corpus is CLOSED (~31 recurring
    tokens at every SF), so the unrolled relational recurrence stays
    tiny while the engine side exercises the full distributed loop."""
    toks = "list_filter(string_split(lower(text), ' '), t -> t <> '')"
    rounds = "".join(
        f""",
    tr{i} AS (
      SELECT n.t AS t,
             0.15 + 0.85 * coalesce(sum(e.w * p.s / d.wdeg), 0) AS s
      FROM nodes n
      LEFT JOIN edges e ON e.dst = n.t
      LEFT JOIN tr{i - 1} p ON p.t = e.src
      LEFT JOIN deg d ON d.src = e.src
      GROUP BY n.t
    )"""
        for i in range(1, iters + 1)
    )
    return f"""
    WITH dd AS (SELECT doc_id, {toks} AS toks FROM documents),
    p AS (
      SELECT toks[CAST(u.i AS INTEGER)] AS a,
             toks[CAST(u.i AS INTEGER) + 1] AS b
      FROM dd, LATERAL unnest(range(1, len(toks))) u(i)
      WHERE toks[CAST(u.i AS INTEGER)] <> toks[CAST(u.i AS INTEGER) + 1]
    ),
    sym AS (SELECT a AS src, b AS dst FROM p
            UNION ALL SELECT b, a FROM p),
    edges AS (
      SELECT src, dst, count(*) AS w FROM sym
      GROUP BY src, dst HAVING count(*) >= 3
    ),
    nodes AS (SELECT DISTINCT src AS t FROM edges),
    deg AS (SELECT src, sum(w) AS wdeg FROM edges GROUP BY src),
    tr0 AS (SELECT t, 1.0 AS s FROM nodes){rounds}
    SELECT t AS token, CAST(round(s, 6) AS DOUBLE) AS score_6
    FROM tr{iters} ORDER BY token
    """


@query("q379_textrank_keywords", oracle=_textrank_oracle())
def q379_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword scoring (operators/graph.py::textrank_scores):
    weighted PageRank over the corpus-level adjacent-token
    co-occurrence graph (symmetric counts, floor 3, no self-loops) —
    the unsupervised keyword/keyphrase extractor that complements
    q144's tf-idf and q366's PMI collocations with a GRAPH notion of
    term centrality. Fixed 4 iterations, damping 0.85; the oracle
    unrolls the recurrence relationally (q235's device) on the same
    data-derived graph.

    Scale: the co-occurrence edge build is one hash agg over
    adjacent-pair explosion; the count>=3 floor is the frequency cap
    that keeps a power-law vocabulary's edge list sparse. Each
    iteration is a contribution equi-join + destination hash agg —
    the pagerank shape, weights riding along."""
    from distcpplus_spark.operators.graph import textrank_scores

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.filter(
            F.split(F.lower("text"), " ", -1), lambda t: t != ""
        ).alias("toks"),
    )
    pairs = d.select(
        F.posexplode(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.size("toks") - 2, F.lit(0)),
                ),
                lambda i: F.struct(
                    F.element_at("toks", i + 1).alias("a"),
                    F.element_at("toks", i + 2).alias("b"),
                ),
            )
        ).alias("pos", "pr"),
    ).filter(
        F.col("pr.b").isNotNull() & (F.col("pr.a") != F.col("pr.b"))
    ).select(F.col("pr.a").alias("a"), F.col("pr.b").alias("b"))
    sym = pairs.unionAll(
        pairs.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    edges = (
        sym.groupBy(F.col("a").alias("src"), F.col("b").alias("dst"))
        .agg(F.count("*").alias("w"))
        .filter(F.col("w") >= 3)
    )
    scores = textrank_scores(edges, damping=0.85, iters=4)
    return scores.select(
        F.col("node").alias("token"),
        F.round("s", 6).alias("score_6"),
    ).orderBy("token")


@query(
    "q380_journey_paths",
    oracle="""
    WITH r AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rk
      FROM events
    ),
    p AS (
      SELECT user_id,
             string_agg(event_type, '>' ORDER BY rk) AS path
      FROM r WHERE rk <= 5
      GROUP BY user_id
      HAVING count(*) = 5
    )
    SELECT path, CAST(count(*) AS BIGINT) AS n_users
    FROM p GROUP BY path ORDER BY path
    """,
)
def q380_journey_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-journey path mining: each user's first five events (by
    time, event_id tie-break) collapse to an ordered 'a>b>c>d>e'
    path string, counted across users — the onboarding-funnel
    fingerprint a product analytics engine surfaces (ordered
    aggregation, the classic LISTAGG-WITHIN-GROUP shape).

    Scale: the per-user rank is a PARTITIONED window with rank<=5
    pushed down to WindowGroupLimit (5-row heap per user, no full
    per-user sort); path assembly sorts a bounded 5-element array
    per user; one (path) hash agg follows."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    first5 = (
        ev.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .groupBy("user_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("rk", "event_type"))
            ).alias("evs")
        )
        .filter(F.size("evs") == 5)
        .select(
            F.concat_ws(
                ">",
                F.transform(F.col("evs"), lambda x: x["event_type"]),
            ).alias("path")
        )
    )
    return (
        first5.groupBy("path")
        .agg(F.count("*").cast("long").alias("n_users"))
        .orderBy("path")
    )


@query(
    "q381_diff_in_diff",
    oracle="""
    WITH cell AS (
      SELECT user_id % 2 AS variant,
             CASE WHEN date_part('day', ts) <= 15 THEN 0 ELSE 1 END
               AS period,
             avg(value) AS m, count(*) AS n
      FROM events
      GROUP BY 1, 2
    )
    SELECT
      CAST(round(max(CASE WHEN variant=0 AND period=0 THEN m END), 6)
           AS DOUBLE) AS ctl_pre_6,
      CAST(round(max(CASE WHEN variant=0 AND period=1 THEN m END), 6)
           AS DOUBLE) AS ctl_post_6,
      CAST(round(max(CASE WHEN variant=1 AND period=0 THEN m END), 6)
           AS DOUBLE) AS trt_pre_6,
      CAST(round(max(CASE WHEN variant=1 AND period=1 THEN m END), 6)
           AS DOUBLE) AS trt_post_6,
      CAST(round(
        (max(CASE WHEN variant=1 AND period=1 THEN m END)
         - max(CASE WHEN variant=1 AND period=0 THEN m END))
        - (max(CASE WHEN variant=0 AND period=1 THEN m END)
           - max(CASE WHEN variant=0 AND period=0 THEN m END)), 6)
        AS DOUBLE) AS did_6,
      CAST(sum(n) AS BIGINT) AS n_events
    FROM cell
    """,
)
def q381_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences treatment-effect estimate: the
    2x2 (variant x pre/post) cell means and the interaction term
    (trt_post - trt_pre) - (ctl_post - ctl_pre) — the quasi-
    experimental companion to q368's CUPED and q354's Welch test in
    the experimentation tier.

    Scale: ONE hash agg to four cells, then a 4-row pivot — nothing
    else touches the data. Cell means are O(100) magnitudes,
    round-6 safe."""
    ev = load_table(spark, sf_dir, "events")
    cell = ev.groupBy(
        (F.col("user_id") % 2).alias("variant"),
        F.when(F.dayofmonth("ts") <= 15, 0).otherwise(1).alias("period"),
    ).agg(F.avg("value").alias("m"), F.count("*").alias("n"))

    def pick(v, p):
        return F.max(
            F.when(
                (F.col("variant") == v) & (F.col("period") == p), F.col("m")
            )
        )

    return cell.agg(
        F.round(pick(0, 0), 6).alias("ctl_pre_6"),
        F.round(pick(0, 1), 6).alias("ctl_post_6"),
        F.round(pick(1, 0), 6).alias("trt_pre_6"),
        F.round(pick(1, 1), 6).alias("trt_post_6"),
        F.round(
            (pick(1, 1) - pick(1, 0)) - (pick(0, 1) - pick(0, 0)), 6
        ).alias("did_6"),
        F.sum("n").cast("long").alias("n_events"),
    )


def _harmonic_oracle(hops: int = 4) -> str:
    """Per-seed unrolled min-relaxation (q321's device keyed by
    (seed, node)) then the harmonic-centrality aggregate."""
    rounds = "".join(
        f""",
    d{i} AS (
      SELECT seed, node, min(dist) AS dist FROM (
        SELECT seed, node, dist FROM d{i - 1}
        UNION ALL
        SELECT d.seed, e.dst AS node, d.dist + 1 AS dist
        FROM edges e JOIN d{i - 1} d ON d.node = e.src
      ) u GROUP BY seed, node
    )"""
        for i in range(1, hops + 1)
    )
    # Build the 1/dist terms from hops so hops>4 can never silently
    # drop 1/5... from the oracle (first term keeps the BIGINT cast
    # so the expression starts exact-integer before the divisions).
    harmonic_terms = "\n                 + ".join(
        "sum(CASE WHEN dist = 1 THEN CAST(1 AS BIGINT) ELSE 0 END)"
        if d == 1
        else f"sum(CASE WHEN dist = {d} THEN 1 ELSE 0 END) / {d}.0"
        for d in range(1, hops + 1)
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
      SELECT DISTINCT src AS seed, src AS node, 0 AS dist
      FROM edges WHERE src % 200 = 0
    ){rounds}
    SELECT seed, CAST(count(*) AS BIGINT) AS n_reached,
           CAST(round({harmonic_terms}, 6) AS DOUBLE) AS harmonic_6
    FROM d{hops} WHERE dist >= 1
    GROUP BY seed ORDER BY seed
    """


@query("q382_harmonic_centrality", oracle=_harmonic_oracle())
def q382_harmonic_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-hop-truncated harmonic centrality of seed parts (partkey %
    200 = 0) in the co-occurrence graph: sum of 1/dist to every node
    reachable within 4 hops — the disconnected-graph-safe centrality
    (Boldi & Vigna's preferred closeness variant), per-seed rather
    than q321's nearest-seed min. Truncation makes the measure
    deterministic AND is how web-scale implementations bound it
    (full closeness needs all-pairs).

    Scale: state is (seed, node) pairs — seeds are a 1/200 sample so
    the state is a constant factor of the node set, never all-pairs;
    each hop is one equi-join + one min hash agg keyed (seed, node);
    lineage cut per hop."""
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
    ).localCheckpoint(eager=True)
    d = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .filter(F.col("node") % 200 == 0)
        .select(
            F.col("node").alias("seed"),
            F.col("node"),
            F.lit(0).alias("dist"),
        )
    )
    for _ in range(4):
        stepped = (
            edges.join(d, edges["src"] == d["node"])
            .select("seed", F.col("dst").alias("node"), (F.col("dist") + 1).alias("dist"))
        )
        d = (
            d.unionByName(stepped)
            .groupBy("seed", "node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
    return (
        d.filter(F.col("dist") >= 1)
        .groupBy("seed")
        .agg(
            F.count("*").cast("long").alias("n_reached"),
            # 1/dist takes only 4 values (hop-truncated BFS), so the
            # harmonic sum decomposes into 4 EXACT integer counts
            # combined in one fixed-order expression — bit-identical
            # across engines at any graph size, where a raw double
            # sum of 1/3's depends on partial-sum order.
            F.round(
                F.sum(F.when(F.col("dist") == 1, 1).otherwise(0))
                .cast("long")
                + F.sum(F.when(F.col("dist") == 2, 1).otherwise(0)) / 2.0
                + F.sum(F.when(F.col("dist") == 3, 1).otherwise(0)) / 3.0
                + F.sum(F.when(F.col("dist") == 4, 1).otherwise(0)) / 4.0,
                6,
            ).alias("harmonic_6"),
        )
        .orderBy("seed")
    )


@query(
    "q383_point_in_time_features",
    oracle="""
    WITH labels AS (
      SELECT event_id, user_id, ts
      FROM events WHERE event_type = 'purchase'
    ),
    daily AS (
      SELECT user_id,
             date_trunc('day', ts) + INTERVAL 1 DAY AS eff_ts,
             count(*) AS d_events,
             sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS d_value
      FROM events GROUP BY user_id, date_trunc('day', ts)
    ),
    weekly AS (
      SELECT user_id,
             date_trunc('week', ts) + INTERVAL 7 DAY AS eff_ts,
             count(DISTINCT event_type) AS w_types
      FROM events GROUP BY user_id, date_trunc('week', ts)
    )
    SELECT l.event_id, l.user_id, l.ts AS label_ts,
           CAST(coalesce(d.d_events, 0) AS BIGINT) AS d_events,
           CAST(coalesce(d.d_value, 0.0) AS DOUBLE) AS d_value,
           CAST(coalesce(w.w_types, 0) AS BIGINT) AS w_types
    FROM labels l
    ASOF LEFT JOIN daily d
      ON d.user_id = l.user_id AND d.eff_ts <= l.ts
    ASOF LEFT JOIN weekly w
      ON w.user_id = l.user_id AND w.eff_ts <= l.ts
    ORDER BY event_id
    """,
)
def q383_point_in_time_features(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Feature-store point-in-time training-set materialization:
    label events (purchases) enriched with the LATEST COMPLETED
    feature snapshots — a daily (events count, value sum) table
    effective at day end and a weekly (distinct-type) table
    effective at week end — via two backward as-of joins. The
    effective-timestamp offset is the leakage guard: a label can
    only see features computed from fully closed windows (the
    feature-store correctness rule; q363's train-fitted scaling is
    the batch sibling). Oracle = DuckDB's native ASOF joins, an
    independent implementation (q351's device, composed twice).

    Scale: snapshot tables are per-(user, period) aggregates — far
    smaller than the fact table; each as-of join is the union-tag
    single-shuffle plan keyed on user."""
    from distcpplus_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    labels = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.count("*").alias("d_events"),
        money_sum(F.col("value")).alias("d_value"),
    ).select(
        "user_id",
        (F.col("day") + F.expr("INTERVAL 1 DAY")).alias("eff_ts"),
        "d_events",
        "d_value",
    )
    weekly = ev.groupBy(
        "user_id", F.date_trunc("week", "ts").alias("wk")
    ).agg(F.countDistinct("event_type").alias("w_types")).select(
        "user_id",
        (F.col("wk") + F.expr("INTERVAL 7 DAY")).alias("eff_ts"),
        "w_types",
    )
    j1 = asof_join(labels, daily, on="user_id", left_ts="ts", right_ts="eff_ts")
    j2 = asof_join(
        j1.select(
            "event_id", "user_id", "ts",
            F.col("d_events_asof").alias("d_events"),
            F.col("d_value_asof").alias("d_value"),
        ),
        weekly,
        on="user_id",
        left_ts="ts",
        right_ts="eff_ts",
    )
    return j2.select(
        "event_id",
        "user_id",
        F.col("ts").alias("label_ts"),
        F.coalesce(F.col("d_events"), F.lit(0)).cast("long").alias("d_events"),
        F.coalesce(F.col("d_value"), F.lit(0.0)).alias("d_value"),
        F.coalesce(F.col("w_types_asof"), F.lit(0)).cast("long").alias("w_types"),
    ).orderBy("event_id")


@query(
    "q384_best_split_infogain",
    oracle="""
    WITH s AS (
      SELECT round(CAST(embedding[3] AS DOUBLE), 6) AS x,
             CASE WHEN label = 1 THEN 1 ELSE 0 END AS y
      FROM embeddings
    ),
    tot AS (SELECT count(*) AS n, sum(y) AS np FROM s),
    g AS (SELECT x, count(*) AS cnt, sum(y) AS yp FROM s GROUP BY x),
    c AS (
      SELECT x,
             sum(cnt) OVER (ORDER BY x) AS nl,
             sum(yp) OVER (ORDER BY x) AS npl
      FROM g
    ),
    e AS (
      SELECT x AS threshold, nl, npl,
             t.n - nl AS nr, t.np - npl AS npr, t.n AS n, t.np AS np
      FROM c CROSS JOIN tot t
      WHERE nl < t.n
    ),
    ig AS (
      SELECT threshold,
        (CASE WHEN np = 0 OR np = n THEN 0 ELSE
          -(CAST(np AS DOUBLE)/n) * ln(CAST(np AS DOUBLE)/n)
          - (1.0 - CAST(np AS DOUBLE)/n) * ln(1.0 - CAST(np AS DOUBLE)/n)
         END)
        - (CAST(nl AS DOUBLE)/n) * (CASE WHEN npl = 0 OR npl = nl THEN 0 ELSE
          -(CAST(npl AS DOUBLE)/nl) * ln(CAST(npl AS DOUBLE)/nl)
          - (1.0 - CAST(npl AS DOUBLE)/nl) * ln(1.0 - CAST(npl AS DOUBLE)/nl)
         END)
        - (CAST(nr AS DOUBLE)/n) * (CASE WHEN npr = 0 OR npr = nr THEN 0 ELSE
          -(CAST(npr AS DOUBLE)/nr) * ln(CAST(npr AS DOUBLE)/nr)
          - (1.0 - CAST(npr AS DOUBLE)/nr) * ln(1.0 - CAST(npr AS DOUBLE)/nr)
         END) AS ig,
        nl, npl, nr, npr
      FROM e
    )
    SELECT threshold, CAST(nl AS BIGINT) AS n_left,
           CAST(npl AS BIGINT) AS pos_left,
           CAST(nr AS BIGINT) AS n_right,
           CAST(npr AS BIGINT) AS pos_right,
           CAST(round(ig, 6) AS DOUBLE) AS infogain_6
    FROM ig ORDER BY round(ig, 9) DESC, threshold ASC LIMIT 1
    """,
)
def q384_best_split_infogain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best decision-stump split by information gain: evaluate the
    entropy reduction of (x <= t) at EVERY distinct feature cut in
    one pass and return the argmax — the node-splitting primitive of
    distributed decision-tree training (each tree node at scale IS
    this query over its instance subset). Left/right class counts at
    all cuts come from ONE cumulative pass; the argmax compares IG
    rounded to 9 (mirror-symmetric splits produce IG values equal in
    exact arithmetic but differing in last-bit float across engines'
    libm; round-then-rank with the threshold tie-break is the q170
    discipline).

    Scale: one (value, class-count) hash agg at distinct-value
    cardinality, the two-phase prefix sum, one
    TakeOrderedAndProject(1)."""
    s = load_table(spark, sf_dir, "embeddings").select(
        F.round(F.col("embedding").getItem(2).cast("double"), 6).alias("x"),
        F.when(F.col("label") == 1, 1).otherwise(0).alias("y"),
    )
    row = s.agg(F.count("*").alias("n"), F.sum("y").alias("np")).collect()[0]
    n, np_ = int(row["n"]), int(row["np"])
    g = s.groupBy("x").agg(
        F.count("*").alias("cnt"), F.sum("y").alias("yp")
    )
    c = partitioned_running_aggs(
        g,
        order_cols=["x"],
        specs=[("cnt", "nl", "sum"), ("yp", "npl", "sum")],
        bucket=F.floor(F.col("x") * 4).cast("bigint"),
    ).filter(F.col("nl") < n)

    def ent(pos, tot):
        p = pos.cast("double") / tot
        return F.when(
            (pos == 0) | (pos == tot), F.lit(0.0)
        ).otherwise(-p * F.log(p) - (1.0 - p) * F.log(1.0 - p))

    e = c.select(
        F.col("x").alias("threshold"),
        "nl",
        "npl",
        (F.lit(n) - F.col("nl")).alias("nr"),
        (F.lit(np_) - F.col("npl")).alias("npr"),
    )
    ig = e.withColumn(
        "ig",
        ent(F.lit(np_), F.lit(n).cast("double"))
        - (F.col("nl").cast("double") / n) * ent(F.col("npl"), F.col("nl"))
        - (F.col("nr").cast("double") / n) * ent(F.col("npr"), F.col("nr")),
    )
    return (
        ig.orderBy(F.desc(F.round("ig", 9)), F.asc("threshold"))
        .limit(1)
        .select(
            "threshold",
            F.col("nl").cast("long").alias("n_left"),
            F.col("npl").cast("long").alias("pos_left"),
            F.col("nr").cast("long").alias("n_right"),
            F.col("npr").cast("long").alias("pos_right"),
            F.round("ig", 6).alias("infogain_6"),
        )
    )


@query(
    "q385_conformal_coverage",
    oracle="""
    WITH pred AS (
      SELECT event_type, round(avg(value), 4) AS yhat
      FROM events WHERE event_id % 2 = 0
      GROUP BY event_type
    ),
    calib AS (
      SELECT round(abs(e.value - p.yhat), 6) AS r
      FROM events e JOIN pred p ON p.event_type = e.event_type
      WHERE e.event_id % 2 = 0
    ),
    k AS (
      SELECT count(*) AS n_calib,
             CAST(ceil((count(*) + 1) * 0.9) AS BIGINT) AS kth
      FROM calib
    ),
    rc AS (SELECT r, count(*) AS cnt FROM calib GROUP BY r),
    cum AS (
      SELECT r, sum(cnt) OVER (ORDER BY r) AS c FROM rc
    ),
    qh AS (
      SELECT min(r) AS q_hat FROM cum, k WHERE c >= k.kth
    ),
    test AS (
      SELECT CASE WHEN round(abs(e.value - p.yhat), 6) <= q.q_hat
                  THEN 1 ELSE 0 END AS covered
      FROM events e
      JOIN pred p ON p.event_type = e.event_type
      CROSS JOIN qh q
      WHERE e.event_id % 2 = 1
    )
    SELECT k.n_calib AS n_calib, k.kth AS kth,
           CAST(round(q.q_hat, 6) AS DOUBLE) AS q_hat_6,
           CAST(count(*) AS BIGINT) AS n_test,
           CAST(round(avg(CAST(covered AS DOUBLE)), 6) AS DOUBLE)
             AS coverage_6
    FROM test CROSS JOIN k CROSS JOIN qh q
    GROUP BY k.n_calib, k.kth, q.q_hat
    """,
)
def q385_conformal_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split conformal prediction: calibrate a 90% interval radius as
    the ceil((n+1)*0.9)-th smallest nonconformity score (|y - per-
    type-mean|) on the even-id calibration half, then measure
    empirical coverage on the odd-id test half — the distribution-
    free uncertainty wrapper around any point predictor, and the
    finite-sample guarantee (coverage >= 90%) a model-serving gate
    checks. The order statistic is EXACT (a rank selection, never an
    interpolated percentile), computed via value-grouped counts +
    the two-phase prefix sum.

    Scale: predictor fit and calibration are hash aggs; the quantile
    is distinct-value-cardinality work; coverage is one more scan
    with the scalar radius broadcast."""
    ev = load_table(spark, sf_dir, "events")
    pred = (
        ev.filter(F.col("event_id") % 2 == 0)
        .groupBy("event_type")
        .agg(F.round(F.avg("value"), 4).alias("yhat"))
    )
    calib = (
        ev.filter(F.col("event_id") % 2 == 0)
        .join(F.broadcast(pred), "event_type")
        .select(
            F.round(F.abs(F.col("value") - F.col("yhat")), 6).alias("r")
        )
    )
    n_calib = calib.count()
    import math

    kth = math.ceil((n_calib + 1) * 0.9)
    rc = calib.groupBy("r").agg(F.count("*").alias("cnt"))
    cum = partitioned_running_agg(
        rc,
        order_cols=["r"],
        value_col="cnt",
        out_col="c",
        bucket=F.floor(F.col("r") / 16).cast("bigint"),
    )
    q_hat = float(
        cum.filter(F.col("c") >= kth).agg(F.min("r")).collect()[0][0]
    )
    test = (
        ev.filter(F.col("event_id") % 2 == 1)
        .join(F.broadcast(pred), "event_type")
        .select(
            F.when(
                F.round(F.abs(F.col("value") - F.col("yhat")), 6)
                <= F.lit(q_hat),
                1,
            )
            .otherwise(0)
            .alias("covered")
        )
    )
    return test.agg(
        F.lit(n_calib).cast("long").alias("n_calib"),
        F.lit(kth).cast("long").alias("kth"),
        F.lit(round(q_hat, 6)).alias("q_hat_6"),
        F.count("*").cast("long").alias("n_test"),
        F.round(F.avg(F.col("covered").cast("double")), 6).alias(
            "coverage_6"
        ),
    )


@query(
    "q386_k_anonymity_audit",
    oracle="""
    WITH q AS (
      SELECT lang, source, CAST(n_chars // 100 AS BIGINT) AS size_band,
             count(*) AS group_n
      FROM documents GROUP BY 1, 2, 3
    )
    SELECT lang, source, size_band, CAST(group_n AS BIGINT) AS group_n,
           CASE WHEN group_n < 5 THEN 1 ELSE 0 END AS at_risk
    FROM q ORDER BY lang, source, size_band
    """,
)
def q386_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier tuple (lang,
    source, 100-char size band): every equivalence class with its
    size and a k<5 re-identification-risk flag — the privacy
    pre-release check beside q253's DP release and q107's PII
    redaction in the governance tier (a group of 1 means those
    attributes alone single out a document/user).

    Scale: ONE hash agg at quasi-identifier-space cardinality; the
    generalization ladder (coarser bands) is a re-run with a wider
    band expression."""
    d = load_table(spark, sf_dir, "documents").select(
        "lang",
        "source",
        F.floor(F.col("n_chars") / 100).cast("long").alias("size_band"),
    )
    g = d.groupBy("lang", "source", "size_band").agg(
        F.count("*").cast("long").alias("group_n")
    )
    return small_sort(
        g.withColumn(
            "at_risk",
            F.when(F.col("group_n") < 5, 1).otherwise(0),
        ),
        "lang",
        "source",
        "size_band",
    )


@query(
    "q387_woe_iv",
    oracle="""
    WITH s AS MATERIALIZED (
      SELECT round(CAST(embedding[5] AS DOUBLE), 6) AS x,
             CASE WHEN label = 1 THEN 1 ELSE 0 END AS y
      FROM embeddings
    ),
    m AS MATERIALIZED (SELECT min(x) AS mn, max(x) AS mx FROM s),
    bb AS (
      SELECT least(CAST(floor((x - m.mn) / (m.mx - m.mn) * 10)
                        AS BIGINT), 9) AS bin, y
      FROM s CROSS JOIN m
    ),
    g AS (
      SELECT bin, count(*) AS n, sum(y) AS np,
             count(*) - sum(y) AS nn
      FROM bb GROUP BY bin
    ),
    t AS (SELECT sum(np) AS tp, sum(nn) AS tn FROM g),
    w AS (
      SELECT bin, n, np, nn,
             ln(((np + 0.5) / t.tp) / ((nn + 0.5) / t.tn)) AS woe,
             ((np + 0.5) / t.tp - (nn + 0.5) / t.tn)
               * ln(((np + 0.5) / t.tp) / ((nn + 0.5) / t.tn)) AS ivt
      FROM g CROSS JOIN t
    ),
    iv AS (SELECT sum(ivt) AS iv FROM w)
    SELECT w.bin AS bin, CAST(w.n AS BIGINT) AS n,
           CAST(w.np AS BIGINT) AS n_pos,
           CAST(round(w.woe, 6) AS DOUBLE) AS woe_6,
           CAST(round(iv.iv, 6) AS DOUBLE) AS iv_6
    FROM w CROSS JOIN iv ORDER BY bin
    """,
)
def q387_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence / information-value feature strength: per
    equal-width bin, WOE = ln(smoothed positive share / smoothed
    negative share), and IV = sum of share-difference x WOE — the
    monotone-binning feature-screening standard (credit-scoring
    lineage) complementing q330's chi2 and q384's information gain.
    Laplace +0.5 smoothing keeps empty-class bins finite and is
    applied identically in both engines.

    Scale: one binning hash agg to <= 10 rows; totals broadcast;
    WOE/IV are exact-integer-ratio logs, round-6 safe."""
    s = load_table(spark, sf_dir, "embeddings").select(
        F.round(F.col("embedding").getItem(4).cast("double"), 6).alias("x"),
        F.when(F.col("label") == 1, 1).otherwise(0).alias("y"),
    )
    row = s.agg(F.min("x").alias("mn"), F.max("x").alias("mx")).collect()[0]
    mn, mx = float(row["mn"]), float(row["mx"])
    g = (
        s.select(
            F.least(
                F.floor(
                    (F.col("x") - F.lit(mn)) / F.lit(mx - mn) * 10
                ).cast("bigint"),
                F.lit(9).cast("bigint"),
            ).alias("bin"),
            "y",
        )
        .groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            F.sum("y").alias("np"),
            (F.count("*") - F.sum("y")).alias("nn"),
        )
    )
    t = g.agg(F.sum("np").alias("tp"), F.sum("nn").alias("tn"))
    w = g.crossJoin(F.broadcast(t)).withColumn(
        "woe",
        F.log(
            ((F.col("np") + 0.5) / F.col("tp"))
            / ((F.col("nn") + 0.5) / F.col("tn"))
        ),
    ).withColumn(
        "ivt",
        (
            (F.col("np") + 0.5) / F.col("tp")
            - (F.col("nn") + 0.5) / F.col("tn")
        )
        * F.col("woe"),
    )
    iv = float(w.agg(F.sum("ivt")).collect()[0][0])
    return small_sort(
        w.select(
            "bin",
            F.col("n").cast("long").alias("n"),
            F.col("np").cast("long").alias("n_pos"),
            F.round("woe", 6).alias("woe_6"),
            F.lit(round(iv, 6)).alias("iv_6"),
        ),
        "bin",
    )


@query(
    "q388_readability_score",
    oracle="""
    SELECT doc_id,
      CAST(len(list_filter(string_split(lower(text), ' '),
                           t -> t <> '')) AS BIGINT) AS n_words,
      CAST(greatest(length(text) - length(replace(text, '.', '')), 1)
           AS BIGINT) AS n_sentences,
      CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
           AS BIGINT) AS n_syllables,
      CAST(round(
        206.835
        - 1.015 * (CAST(len(list_filter(string_split(lower(text), ' '),
                                        t -> t <> '')) AS DOUBLE)
                   / greatest(length(text)
                              - length(replace(text, '.', '')), 1))
        - 84.6 * (CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                       AS DOUBLE)
                  / len(list_filter(string_split(lower(text), ' '),
                                    t -> t <> ''))), 6)
        AS DOUBLE) AS flesch_6
    FROM documents
    WHERE len(list_filter(string_split(lower(text), ' '), t -> t <> '')) > 0
    ORDER BY doc_id
    """,
)
def q388_readability_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per document with its three ingredients
    (words, sentences, vowel-group syllable estimate) — the classic
    readability feature beside q55's quality score and q346's
    lexical diversity in a quality-classifier feature set. The
    syllable heuristic (maximal [aeiouy]+ runs) is the standard
    dictionary-free approximation, and the char-class regex sits in
    the RE2-and-Java-compatible subset (the q187 rule).

    Scale: pure map-side expressions (split/replace/regexp count),
    no shuffle but the output sort."""
    d = load_table(spark, sf_dir, "documents")
    words = F.size(
        F.filter(F.split(F.lower("text"), " ", -1), lambda t: t != "")
    )
    sentences = F.greatest(
        F.length("text") - F.length(F.regexp_replace("text", "\\.", "")),
        F.lit(1),
    )
    syllables = F.size(
        F.regexp_extract_all(F.lower("text"), F.lit("[aeiouy]+"), F.lit(0))
    )
    return (
        d.select(
            "doc_id",
            words.cast("long").alias("n_words"),
            sentences.cast("long").alias("n_sentences"),
            syllables.cast("long").alias("n_syllables"),
            F.round(
                F.lit(206.835)
                - 1.015
                * (words.cast("double") / sentences)
                - 84.6 * (syllables.cast("double") / words),
                6,
            ).alias("flesch_6"),
        )
        .filter(F.col("n_words") > 0)
        .orderBy("doc_id")
    )


@query(
    "q389_txlog_occ_table",
    oracle="""
    SELECT c_mktsegment AS segment,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
               AS bal_cents,
           CAST(6 AS BIGINT) AS final_version
    FROM customer
    WHERE NOT (c_mktsegment = 'BUILDING' AND c_acctbal < 0)
    GROUP BY c_mktsegment
    ORDER BY segment
    """,
)
def q389_txlog_occ_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimistic-concurrency table commits (operators/txlog.py)
    hash-gated end to end: five per-segment appends, a REWRITE of the
    BUILDING partition that drops negative balances, and a
    deliberately STALE append that must abort with CommitConflict
    (asserted in-query — a silently-accepted conflicting commit would
    corrupt the gate's counts). The final fold of the log (adds minus
    removes, version order) must reproduce the declarative predicate
    the oracle applies — proving the log protocol, the conflict rule,
    and the fold agree with the semantic spec.

    Scale: the log holds file-level metadata (KBs per commit); only
    the atomic link of one fully-written entry needs atomicity (a
    conditional PUT on an object store); data files are immutable and staged
    before the commit, so readers never see a half commit."""
    import shutil as _sh
    import tempfile as _tf

    from distcpplus_spark.operators import txlog

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    segs = [
        r["c_mktsegment"]
        for r in cust.select("c_mktsegment").distinct().collect()
    ]
    root = _tf.mkdtemp(prefix="txlog_q389_") + "/tbl"
    try:
        for seg in sorted(segs):
            txlog.append_df(
                cust.filter(F.col("c_mktsegment") == seg), root, [seg]
            )
        stale_v = txlog.current_version(root) - 1  # pre-last-append
        txlog.rewrite_partition(
            cust.filter(
                (F.col("c_mktsegment") == "BUILDING")
                & (F.col("c_acctbal") >= 0)
            ),
            root,
            "BUILDING",
        )
        # a stale append to BUILDING must NOT be accepted
        txn = "stalewriter1"
        adds = txlog._stage(
            cust.filter(F.col("c_mktsegment") == "BUILDING").limit(1),
            root,
            txn,
        )
        try:
            txlog.commit(
                root,
                op_type="append",
                partitions=["BUILDING"],
                adds=adds,
                removes=[],
                read_version=stale_v,
                txn_id=txn,
            )
            raise AssertionError("stale conflicting commit was accepted")
        except txlog.CommitConflict:
            pass
        final_v = txlog.current_version(root)
        agg = (
            txlog.read_table(spark, root)
            .groupBy(F.col("c_mktsegment").alias("segment"))
            .agg(
                F.count("*").cast("long").alias("n"),
                F.sum(F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)))
                .alias("bal_cents"),
            )
            .withColumn("final_version", F.lit(final_v).cast("long"))
        )
        rows = agg.collect()
        return local_rows(spark, rows, agg.schema).transform(
            small_sort, "segment"
        )
    finally:
        _sh.rmtree(os.path.dirname(root), ignore_errors=True)


@query(
    "q390_bloom_file_index_lookup",
    oracle="""
    SELECT doc_id, lang, source FROM documents
    WHERE doc_id IN (3, 77, 123, 999999999)
    ORDER BY doc_id
    """,
)
def q390_bloom_file_index_lookup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Point lookup through a Bloom SIDECAR file index
    (operators/layout.py::write_bloom_indexed / read_bloom_pruned)
    under the driver hash gate: the documents table is written as
    hash-scattered files with a per-file Bloom bitmap over doc_id,
    and the lookup scans only candidate files — the membership
    complement of q248's zone maps (min/max prunes ranges; a point
    key uniform across files prunes NOTHING without a membership
    index). The in-query assert pins that pruning actually happened;
    the exact IN residual carries correctness, so Bloom false
    positives can only cost I/O, never rows. One probed key is
    deliberately absent.

    Scale: bitmaps build distributed (one task per file), the driver
    holds KBs of index; at 100 TB this is the Delta/Iceberg
    bloom-index pattern for needle-in-haystack id lookups."""
    import shutil as _sh
    import tempfile as _tf

    from distcpplus_spark.operators.layout import (
        bloom_index_candidates,
        read_bloom_pruned,
        write_bloom_indexed,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source"
    )
    base = _tf.mkdtemp(prefix="bloomidx_q390_")
    path = base + "/docs"
    keys = [3, 77, 123, 999999999]
    try:
        write_bloom_indexed(docs, path, "doc_id", num_files=8)
        cands, total = bloom_index_candidates(spark, path, keys)
        if not (0 < len(cands) < total):
            raise AssertionError(
                f"bloom index did not prune: {len(cands)}/{total}"
            )
        out = read_bloom_pruned(spark, path, "doc_id", keys).select(
            "doc_id", "lang", "source"
        )
        rows = out.collect()
        return local_rows(spark, rows, out.schema).transform(
            small_sort, "doc_id"
        )
    finally:
        _sh.rmtree(base, ignore_errors=True)


@query(
    "q391_pareto_skyline",
    oracle="""
    WITH s AS (
      SELECT vec_id,
             round(CAST(embedding[1] AS DOUBLE), 6) AS x_6,
             round(CAST(embedding[2] AS DOUBLE), 6) AS y_6
      FROM embeddings
    )
    SELECT p.vec_id, p.x_6, p.y_6 FROM s p
    WHERE NOT EXISTS (
      SELECT 1 FROM s q
      WHERE q.x_6 <= p.x_6 AND q.y_6 >= p.y_6
        AND (q.x_6 < p.x_6 OR q.y_6 > p.y_6)
    )
    ORDER BY vec_id
    """,
)
def q391_pareto_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto skyline (operators/stats.py::skyline_2d): embeddings
    minimizing dim-0 while maximizing dim-1 that no other point
    dominates — the multi-objective shortlist query (cost-vs-quality
    tradeoff curves, model selection frontiers). The ORACLE is the
    semantic definition itself (a NOT EXISTS dominance anti-join,
    O(n^2) — fine as an oracle, which is exactly why the engine runs
    the two-phase algorithm instead): local sort-based skylines per
    partition, then one exact pass over the tiny candidate union;
    the result is provably partitioning-independent.

    Scale: phase 1 is map-only and prunes each partition to its own
    frontier (O(log n) points on non-degenerate data); only
    frontiers ever move."""
    from distcpplus_spark.operators.stats import skyline_2d

    s = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.round(F.col("embedding").getItem(0).cast("double"), 6).alias(
            "x_6"
        ),
        F.round(F.col("embedding").getItem(1).cast("double"), 6).alias(
            "y_6"
        ),
    )
    return skyline_2d(s, "x_6", "y_6", "vec_id").orderBy("vec_id")


@query(
    "q392_peak_concurrency",
    oracle="""
    WITH o AS (
      SELECT user_id, ts, event_id,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev
      FROM events
    ),
    brk AS (
      SELECT user_id, ts, event_id,
             CASE WHEN prev IS NULL
                       OR ts - prev > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS is_new
      FROM o
    ),
    isl AS (
      SELECT user_id, ts,
             sum(is_new) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING)
               AS sid
      FROM brk
    ),
    sess AS (
      SELECT user_id, sid, min(ts) AS s,
             max(ts) + INTERVAL 30 MINUTE AS e
      FROM isl GROUP BY user_id, sid
    ),
    deltas AS (
      SELECT s AS t, 1 AS sign, count(*) AS d FROM sess GROUP BY s
      UNION ALL
      SELECT e AS t, -1 AS sign, -count(*) AS d FROM sess GROUP BY e
    ),
    run AS (
      SELECT t, sign,
             sum(d) OVER (ORDER BY t, sign ROWS UNBOUNDED PRECEDING)
               AS conc
      FROM deltas
    ),
    mx AS (SELECT max(conc) AS peak FROM run)
    SELECT CAST(mx.peak AS BIGINT) AS peak,
           min(run.t) AS at_ts
    FROM run, mx WHERE run.conc = mx.peak
    GROUP BY mx.peak
    """,
)
def q392_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions via the interval sweep: sessionize
    per user (30-minute inactivity timeout, session active until
    timeout after its last event), then sweep +1/-1 boundary deltas
    in time order — the capacity-planning maximum-overlap query
    (meeting-rooms / concurrent-connections). Half-open [start, end)
    semantics: ends sort BEFORE starts at the same instant (sign
    ascending); deltas are pre-aggregated per (t, sign) so the
    running sum's order is unique and the max is order-independent.

    Scale: sessionization is a user-PARTITIONED window; the sweep's
    running sum goes through the two-phase distributed prefix sum
    over an hour bucket (monotone in the (t, sign) order) — the
    whole query never funnels."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    brk = ev.withColumn("prev", F.lag("ts").over(w)).withColumn(
        "is_new",
        F.when(
            F.col("prev").isNull()
            | (
                # exact integer microseconds (q266 lesson):
                # unix_timestamp() truncates to seconds and diverges
                # from the oracle's interval math on 1800.xxx s gaps
                F.unix_micros("ts") - F.unix_micros("prev")
                > 1800 * 1_000_000
            ),
            1,
        ).otherwise(0),
    )
    isl = brk.withColumn(
        "sid",
        F.sum("is_new").over(
            w.rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    sess = isl.groupBy("user_id", "sid").agg(
        F.min("ts").alias("s"),
        (F.max("ts") + F.expr("INTERVAL 30 MINUTE")).alias("e"),
    )
    starts = sess.groupBy(F.col("s").alias("t")).agg(
        F.count("*").alias("d")
    ).withColumn("sign", F.lit(1))
    ends = sess.groupBy(F.col("e").alias("t")).agg(
        (-F.count("*")).alias("d")
    ).withColumn("sign", F.lit(-1))
    deltas = starts.unionByName(ends)
    run = partitioned_running_agg(
        deltas,
        order_cols=["t", "sign"],
        value_col="d",
        out_col="conc",
        bucket=F.date_trunc("hour", "t"),
    )
    peak = int(run.agg(F.max("conc")).collect()[0][0])
    return run.filter(F.col("conc") == peak).agg(
        F.lit(peak).cast("long").alias("peak"),
        F.min("t").alias("at_ts"),
    )


@query(
    "q394_ivm_join_delta",
    oracle="""
    SELECT c.c_mktsegment AS segment,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS price_cents
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY c.c_mktsegment
    ORDER BY segment
    """,
)
def q394_ivm_join_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance for a JOIN view (the delta rule
    d(A JOIN B) = dA⋈B ∪ A⋈dB ∪ dA⋈dB): the orders-customer join
    view is materialized from BASE partitions only, then maintained
    with insert deltas (orderkey%10==7 orders; custkey%20==3
    customers) WITHOUT re-running the base join — and the maintained
    view must equal the oracle's full recompute over the complete
    tables. The join sibling of q189's incremental aggregate
    maintenance; at 100 TB the three delta joins touch |dA|+|dB|
    driven work while the recompute touches |A|+|B|.

    Scale: base view materializes once (localCheckpoint stands in
    for the table write); each maintenance tick is two
    broadcast-able delta joins plus the tiny dA⋈dB term."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    o_base = o.filter(F.col("o_orderkey") % 10 != 7)
    d_o = o.filter(F.col("o_orderkey") % 10 == 7)
    c_base = c.filter(F.col("c_custkey") % 20 != 3)
    d_c = c.filter(F.col("c_custkey") % 20 == 3)

    def j(left, right):
        return left.join(right, left["o_custkey"] == right["c_custkey"])

    v0 = j(o_base, c_base).localCheckpoint(eager=True)  # materialized view
    delta = (
        j(d_o, c_base)
        .unionByName(j(o_base, d_c))
        .unionByName(j(d_o, d_c))
    )
    maintained = v0.unionByName(delta)
    return small_sort(
        maintained.groupBy(F.col("c_mktsegment").alias("segment")).agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)))
            .alias("price_cents"),
        ),
        "segment",
    )


@query(
    "q395_hampel_filter",
    oracle="""
    WITH h AS (
      SELECT user_id, date_trunc('hour', ts) AS hr,
             sum(CAST(round(value * 100) AS BIGINT)) / (100.0 * count(*)) AS v
      FROM events WHERE user_id < 12
      GROUP BY 1, 2
    ),
    w AS (
      SELECT user_id, hr, v,
             list_sort(list(v) OVER (
               PARTITION BY user_id ORDER BY hr
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)) AS arr
      FROM h
    ),
    m AS (
      SELECT user_id, hr, v, arr,
             (arr[(len(arr) + 1) // 2]
              + arr[(len(arr) + 2) // 2]) / 2.0 AS med
      FROM w
    ),
    d AS (
      SELECT user_id, hr, v, med,
             list_sort(list_transform(arr, x -> abs(x - med))) AS devs
      FROM m
    ),
    f AS (
      SELECT user_id, hr, v, med,
             (devs[(len(devs) + 1) // 2]
              + devs[(len(devs) + 2) // 2]) / 2.0 AS madv
      FROM d
    )
    SELECT user_id, hr AS ts,
           CAST(round(v, 6) AS DOUBLE) AS v_6,
           CAST(round(med, 6) AS DOUBLE) AS med_6,
           CAST(round(madv, 6) AS DOUBLE) AS mad_6,
           CASE WHEN abs(v - med) > 3 * 1.4826 * madv
                THEN 1 ELSE 0 END AS is_outlier
    FROM f ORDER BY user_id, ts
    """,
)
def q395_hampel_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hampel outlier filter: each point of an hourly per-user series
    is flagged when it deviates from the ROLLING MEDIAN of its
    +-3-point window by more than 3 scaled rolling MADs — the robust
    despiking standard (a spike poisons a rolling MEAN filter's own
    threshold; median/MAD ignore it; q274 is the per-series global-
    MAD sibling). Both the median and the MAD come from
    higher-order ARRAY expressions over the frame's collected list
    (sort + middle-element formula) — expressible without UDFs in
    both engines, exact rationals throughout, so even the boolean
    flag is deterministic.

    Scale: the frame list is bounded (7 elements) and the window is
    PARTITIONED per user; series length is bounded by the
    observation window, not data volume."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 12)
    h = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("hr")
    ).agg(
        (
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)))
            / (100.0 * F.count("*"))
        ).alias("v")
    )
    w = W.partitionBy("user_id").orderBy("hr").rowsBetween(-3, 3)
    out = h.withColumn("arr", F.array_sort(F.collect_list("v").over(w)))
    L = F.size("arr")
    lo = ((L + 1) / 2).cast("int")
    hi = ((L + 2) / 2).cast("int")
    out = out.withColumn(
        "med",
        (F.element_at("arr", lo) + F.element_at("arr", hi)) / 2.0,
    )
    out = out.withColumn(
        "devs",
        F.array_sort(
            F.transform(
                F.col("arr"), lambda x: F.abs(x - F.col("med"))
            )
        ),
    )
    Ld = F.size("devs")
    out = out.withColumn(
        "madv",
        (
            F.element_at("devs", ((Ld + 1) / 2).cast("int"))
            + F.element_at("devs", ((Ld + 2) / 2).cast("int"))
        )
        / 2.0,
    )
    return out.select(
        "user_id",
        F.col("hr").alias("ts"),
        F.round("v", 6).alias("v_6"),
        F.round("med", 6).alias("med_6"),
        F.round("madv", 6).alias("mad_6"),
        F.when(
            F.abs(F.col("v") - F.col("med"))
            > 3 * 1.4826 * F.col("madv"),
            1,
        )
        .otherwise(0)
        .alias("is_outlier"),
    ).orderBy("user_id", "ts")


@query(
    "q396_seqfile_roundtrip",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(doc_id) AS BIGINT) AS id_sum,
           CAST(bit_xor(CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT))
                AS BIGINT) AS text_fp
    FROM documents
    GROUP BY lang ORDER BY lang
    """,
)
def q396_seqfile_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hadoop SequenceFile sink + SPLITTABLE source
    (sources/seqfile.py, hand-rolled from the public SequenceFile /
    WritableUtils spec) under the driver hash gate: documents write
    as LongWritable/Text shards (one per partition, tmp+rename), read
    back through byte-range SPLITS delimited by the format's own
    16-byte sync markers — the original splittable-container design
    this repo's WARC/gzip sources imitate — and the round trip must
    preserve every id and text byte (md5-prefix xor fingerprint, the
    q262 device). Reference parity: SequenceFile is the reference
    engine's NATIVE ecosystem container (turn/DistCPPlus copies them
    as opaque bytes; this engine reads them).

    Scale: each split task seeks to its sync anchor — a 100 GB file
    becomes thousands of independent tasks with no central index;
    writes are shard-per-partition."""
    import shutil as _sh
    import tempfile as _tf

    from distcpplus_spark.sources.seqfile import (
        read_seqfile_spark,
        write_seqfile_shards,
    )

    docs = load_table(spark, sf_dir, "documents")
    base = _tf.mkdtemp(prefix="seqfile_q396_")
    path = base + "/shards"
    try:
        write_seqfile_shards(
            docs.select("doc_id", "text").repartition(4), path
        )
        back = read_seqfile_spark(spark, path, split_bytes=64 * 1024)
        joined = back.join(
            docs.select("doc_id", "lang"), "doc_id"
        )
        agg = joined.groupBy("lang").agg(
            F.count("*").cast("long").alias("n"),
            F.sum("doc_id").cast("long").alias("id_sum"),
            F.bit_xor(
                F.conv(F.substring(F.md5("text"), 1, 15), 16, 10).cast(
                    "long"
                )
            ).alias("text_fp"),
        )
        rows = agg.collect()
        return local_rows(spark, rows, agg.schema).transform(
            small_sort, "lang"
        )
    finally:
        _sh.rmtree(base, ignore_errors=True)


@query(
    "q397_seqfile_indexed_get",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (1, 7, 64, 65, 500, 999999999)
    ORDER BY c_custkey
    """,
)
def q397_seqfile_indexed_get(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapFile-style indexed point get (sources/seqfile.py::
    write_seqfile_sorted_indexed / seqfile_get): customers sort by
    key into a SequenceFile with a sparse key->offset index, and each
    lookup binary-searches the index then scans at most index_every
    records — Hadoop's MapFile serving pattern (the sorted
    complement of q390's Bloom index: Bloom answers "which files
    might hold this key", the sparse index answers "where in the
    sorted file it IS"). One probed key is absent and must return no
    row, exercising the sorted-scan early exit.

    Scale: gets are O(log index + index_every) driver-side seeks —
    the SERVING path, not a scan; the sorted write is one range
    repartition at table scale."""
    import shutil as _sh
    import tempfile as _tf

    from distcpplus_spark.sources.seqfile import (
        seqfile_get,
        write_seqfile_sorted_indexed,
    )

    cust = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )
    base = _tf.mkdtemp(prefix="mapfile_q397_")
    d = base + "/map"
    keys = [1, 7, 64, 65, 500, 999999999]
    try:
        rows_sorted = [
            (int(r["c_custkey"]), r["c_name"]) for r in cust.collect()
        ]
        write_seqfile_sorted_indexed(rows_sorted, d, index_every=64)
        hits = [
            (k, seqfile_get(d, k))
            for k in keys
        ]
        found = [(k, v) for k, v in hits if v is not None]
        return local_rows(spark,
            found, "c_custkey long, c_name string"
        ).transform(small_sort, "c_custkey")
    finally:
        _sh.rmtree(base, ignore_errors=True)


@query(
    "q398_multiformat_union",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n,
           CAST(bit_xor(doc_id) AS BIGINT) AS id_xor,
           CAST(sum(n_chars) AS BIGINT) AS chars_sum
    FROM documents
    GROUP BY lang ORDER BY lang
    """,
)
def q398_multiformat_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Federated multi-format scan: the documents table split three
    ways by id residue and persisted as PARQUET, CSV and AVRO (the
    pure-Python OCF writer), then read back through each format's own
    source and UNIONed — the heterogeneous-lake reality where one
    logical table spans formats during a migration. The union must
    reproduce the original table exactly (count + id xor + chars sum
    per language), gating all three round trips and the
    schema-alignment of the union in one query.

    Scale: each leg is that format's ordinary distributed read; the
    union is plan-level (no data movement beyond the legs)."""
    import shutil as _sh
    import tempfile as _tf

    from distcpplus_spark.sources.formats import (
        read_avro,
        read_csv,
        write_avro,
        write_csv,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    base = _tf.mkdtemp(prefix="multifmt_q398_")
    try:
        docs.filter(F.col("doc_id") % 3 == 0).write.parquet(
            base + "/pq"
        )
        write_csv(docs.filter(F.col("doc_id") % 3 == 1), base + "/csv")
        write_avro(docs.filter(F.col("doc_id") % 3 == 2), base + "/avro")
        pq = spark.read.parquet(base + "/pq")
        csv = read_csv(
            spark,
            base + "/csv",
            schema="doc_id BIGINT, lang STRING, n_chars BIGINT",
        ).select("doc_id", "lang", "n_chars")
        av = read_avro(spark, base + "/avro").select(
            F.col("doc_id").cast("long").alias("doc_id"),
            "lang",
            F.col("n_chars").cast("long").alias("n_chars"),
        )
        union = pq.unionByName(csv).unionByName(av)
        agg = union.groupBy("lang").agg(
            F.count("*").cast("long").alias("n"),
            F.bit_xor("doc_id").cast("long").alias("id_xor"),
            F.sum("n_chars").cast("long").alias("chars_sum"),
        )
        rows = agg.collect()
        return local_rows(spark, rows, agg.schema).transform(
            small_sort, "lang"
        )
    finally:
        _sh.rmtree(base, ignore_errors=True)


@query(
    "q399_trimmed_mean",
    oracle="""
    WITH c AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    g AS (
      SELECT event_type, cents, count(*) AS cnt
      FROM c GROUP BY event_type, cents
    ),
    t AS (
      SELECT event_type, sum(cnt) AS n,
             CAST(floor(0.1 * sum(cnt)) AS BIGINT) AS k,
             sum(cents * cnt) AS total
      FROM g GROUP BY event_type
    ),
    w AS (
      SELECT g.event_type, g.cents, g.cnt, t.n, t.k, t.total,
             sum(g.cnt) OVER (PARTITION BY g.event_type
                              ORDER BY g.cents) AS cum
      FROM g JOIN t USING (event_type)
    ),
    parts AS (
      SELECT event_type, n, k, total,
             sum(cents * least(cnt, greatest(k - (cum - cnt), 0)))
               AS low_sum,
             sum(cents * least(cnt, greatest(k - (n - cum), 0)))
               AS high_sum
      FROM w GROUP BY event_type, n, k, total
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n,
           CAST(k AS BIGINT) AS k_trimmed_each_side,
           CAST(round((total - low_sum - high_sum)
                      / (100.0 * (n - 2 * k)), 6) AS DOUBLE)
             AS trimmed_mean_6
    FROM parts ORDER BY event_type
    """,
)
def q399_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT 10% two-sided trimmed mean per event type — the robust
    location estimate between q229's winsorize (clips) and q274's
    MAD (flags): drop the k lowest and k highest OBSERVATIONS
    exactly, with the boundary value fractionally included by count
    arithmetic, never an approximate percentile. Values canonicalize
    to integer cents so every intermediate is exact and both engines
    divide identical integers once at the end.

    Scale: the heavy input reduces to (type, cents, count) rows
    first — the running sum's cardinality is bounded by the VALUE
    DOMAIN (<= 100k distinct cents), not row count, which is what
    makes the per-type partitioned window safe at any data scale."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    g = ev.groupBy("event_type", "cents").agg(F.count("*").alias("cnt"))
    t = g.groupBy("event_type").agg(
        F.sum("cnt").alias("n"),
        F.floor(0.1 * F.sum("cnt")).cast("long").alias("k"),
        F.sum(F.col("cents") * F.col("cnt")).alias("total"),
    )
    w = g.join(F.broadcast(t), "event_type").withColumn(
        "cum",
        F.sum("cnt").over(
            W.partitionBy("event_type").orderBy("cents")
        ),
    )
    parts = w.groupBy("event_type", "n", "k", "total").agg(
        F.sum(
            F.col("cents")
            * F.least(
                F.col("cnt"),
                F.greatest(
                    F.col("k") - (F.col("cum") - F.col("cnt")), F.lit(0)
                ),
            )
        ).alias("low_sum"),
        F.sum(
            F.col("cents")
            * F.least(
                F.col("cnt"),
                F.greatest(F.col("k") - (F.col("n") - F.col("cum")), F.lit(0)),
            )
        ).alias("high_sum"),
    )
    return small_sort(
        parts.select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            F.col("k").cast("long").alias("k_trimmed_each_side"),
            F.round(
                (F.col("total") - F.col("low_sum") - F.col("high_sum"))
                / (100.0 * (F.col("n") - 2 * F.col("k"))),
                6,
            ).alias("trimmed_mean_6"),
        ),
        "event_type",
    )


@query(
    "q400_entity_resolution_e2e",
    oracle="""
    WITH RECURSIVE k AS (
      SELECT doc_id, lower(substr(text, 1, 24)) AS key FROM documents
    ),
    r AS (
      SELECT doc_id, key,
             row_number() OVER (ORDER BY key, doc_id) AS rk
      FROM k
    ),
    e0 AS (
      SELECT a.doc_id AS src, b.doc_id AS dst
      FROM r a JOIN r b ON b.rk BETWEEN a.rk + 1 AND a.rk + 4
      WHERE levenshtein(a.key, b.key) <= 2
    ),
    sym AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
    reach(a, b) AS (
      SELECT src, dst FROM sym
      UNION
      SELECT r2.a, s.dst FROM reach r2 JOIN sym s ON r2.b = s.src
    )
    SELECT CAST(a AS BIGINT) AS doc_id,
           CAST(least(a, min(b)) AS BIGINT) AS entity_id,
           CASE WHEN least(a, min(b)) = a THEN 1 ELSE 0 END
             AS is_representative
    FROM reach GROUP BY a ORDER BY doc_id
    """,
)
def q400_entity_resolution_e2e(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Entity resolution END TO END under one hash gate: sorted-
    neighborhood blocking (q370's distributed-rank window, w=5) ->
    cheap verify (key edit distance <= 2) -> transitive clustering
    (operators/dedup.py::union_find_components with pointer doubling)
    -> min-id canonical representative — the full dedup/mastering
    pipeline a record-linkage system runs, composed from operators
    that are each individually gated. The oracle replays blocking
    relationally and closes the match graph with a recursive CTE
    (q234's device), so the distributed propagation is value-checked
    against the semantic closure.

    Scale: candidates are (w-1)·n from the rank join (never
    quadratic); the closure is O(E log diameter) label propagation;
    the quadratic recursive-CTE closure exists only oracle-side.

    Verify cost (round-10, the round-9 verdict's ask — edit distance
    dominated the sf3 wall at 829 s): candidates now pass a PROVABLY
    NON-LOSING pre-filter before the dynamic program — (a) length
    difference ≤ 2 (each edit changes length by ≤ 1) and (b) the
    pigeonhole partition filter: split key_a into 3 contiguous
    pieces; ≤ 2 edit ops can touch at most 2 pieces, so at least one
    piece must occur VERBATIM as a substring of key_b (the classic
    intermediate-partitioning filter of approximate string joins).
    Both are cheap JVM column expressions, so the O(L^2/band) DP runs
    only on survivors; the DP itself is the banded
    levenshtein(a, b, threshold=2) (returns -1 past the band). The
    oracle is unchanged — the pre-filter admits every true match by
    construction, hash-identical output."""
    from distcpplus_spark.operators.dedup import union_find_components

    k = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.lower(F.substring("text", 1, 24)).alias("key")
    )
    r = partitioned_running_agg(
        k.withColumn("one", F.lit(1)),
        order_cols=["key", "doc_id"],
        value_col="one",
        out_col="rk",
        bucket=F.substring("key", 1, 2),
    )
    left = r.select(
        F.col("doc_id").alias("id_a"),
        F.col("key").alias("key_a"),
        F.explode(F.sequence(F.lit(1), F.lit(4))).alias("off"),
        F.col("rk").alias("rk_a"),
    ).withColumn("rk_b", F.col("rk_a") + F.col("off"))
    right = r.select(
        F.col("doc_id").alias("id_b"),
        F.col("key").alias("key_b"),
        F.col("rk").alias("rk_b"),
    )
    # necessary conditions for ed <= 2 (never drop a true match):
    # substr len-0 pieces yield '' and contains(b, '') is true, so
    # degenerate short keys pass through to the exact DP unharmed
    pigeonhole = F.expr(
        "contains(key_b, substr(key_a, 1, length(key_a) div 3)) OR "
        "contains(key_b, substr(key_a, length(key_a) div 3 + 1, "
        "length(key_a) div 3)) OR "
        "contains(key_b, substr(key_a, 2 * (length(key_a) div 3) + 1, "
        "length(key_a) - 2 * (length(key_a) div 3)))"
    )
    edges = (
        left.join(right, "rk_b")
        .filter(F.abs(F.length("key_a") - F.length("key_b")) <= 2)
        .filter(pigeonhole)
        .filter(
            F.levenshtein(F.col("key_a"), F.col("key_b"), 2)
            .between(0, 2)
        )
        .select("id_a", "id_b")
    )
    comps = union_find_components(edges)
    return comps.select(
        F.col("node").cast("long").alias("doc_id"),
        F.col("component").cast("long").alias("entity_id"),
        F.when(F.col("node") == F.col("component"), 1)
        .otherwise(0)
        .alias("is_representative"),
    ).orderBy("doc_id")


@query(
    "q401_kth_element_bisect",
    oracle="""
    WITH c AS (
      SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem
    ),
    n AS (SELECT count(*) AS n FROM c),
    k AS (SELECT CAST(floor(n * 0.37) AS BIGINT) AS k FROM n)
    SELECT (SELECT n FROM n) AS n,
           (SELECT k FROM k) AS k,
           (SELECT cents FROM c ORDER BY cents
            LIMIT 1 OFFSET (SELECT k - 1 FROM k)) AS kth_cents
    """,
)
def q401_kth_element_bisect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT k-th smallest element (the 37th percentile order
    statistic of price cents) WITHOUT any sort or shuffle: binary
    search on the VALUE RANGE, each round one count(<= mid) scan of
    a cached single-column frame — the classic distributed selection
    algorithm for continuous domains where the value-grouped
    prefix-sum device (q385) would face unbounded distinct values.
    O(log range) ~ 24 rounds; the only cross-node traffic is one
    scalar per round. The oracle is the order statistic itself
    (ORDER BY/OFFSET).

    Scale trade stated honestly: log(range) cheap scans of one
    cached column vs one total sort of the table — selection wins
    when the column is narrow and the table is 100 TB."""
    c = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.round(F.col("l_extendedprice") * 100)
            .cast("long")
            .alias("cents")
        )
        .cache()
    )
    row = c.agg(
        F.count("*").alias("n"),
        F.min("cents").alias("lo"),
        F.max("cents").alias("hi"),
    ).collect()[0]
    n, lo, hi = int(row["n"]), int(row["lo"]), int(row["hi"])
    k = int(n * 37 // 100)
    while lo < hi:
        mid = (lo + hi) // 2
        cnt = c.filter(F.col("cents") <= mid).count()
        if cnt >= k:
            hi = mid
        else:
            lo = mid + 1
    c.unpersist()
    return spark.createDataFrame(
        [(n, k, lo)], "n long, k long, kth_cents long"
    )


@query(
    "q402_topn_with_other",
    oracle="""
    WITH u AS (
      SELECT user_id,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY user_id
    ),
    top AS (
      SELECT user_id, cents FROM u
      ORDER BY cents DESC, user_id LIMIT 10
    )
    SELECT CAST(user_id AS VARCHAR) AS who,
           CAST(1 AS BIGINT) AS n_users, cents
    FROM top
    UNION ALL
    SELECT 'other' AS who,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(cents) AS BIGINT) AS cents
    FROM u WHERE user_id NOT IN (SELECT user_id FROM top)
    ORDER BY who
    """,
)
def q402_topn_with_other(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 users by total value with the LONG TAIL rolled into one
    'other' row — the reporting idiom every dashboard needs (bounded
    legend, nothing dropped: the rows still sum to the table total).
    Determinism at the rank-10 boundary: exact integer cents with a
    user_id tie-break.

    Scale: the top-10 is TakeOrderedAndProject over the per-user
    agg (a 10-row heap per partition, no global sort); the tail
    aggregates via a broadcast anti-join against the 10 winners."""
    u = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)))
            .alias("cents")
        )
    )
    top = u.orderBy(F.desc("cents"), F.asc("user_id")).limit(10)
    top_rows = top.select(
        F.col("user_id").cast("string").alias("who"),
        F.lit(1).cast("long").alias("n_users"),
        "cents",
    )
    other = (
        u.join(F.broadcast(top.select("user_id")), "user_id", "left_anti")
        .agg(
            F.lit("other").alias("who"),
            F.count("*").cast("long").alias("n_users"),
            F.sum("cents").cast("long").alias("cents"),
        )
    )
    return small_sort(top_rows.unionByName(other), "who")


@query(
    "q403_cogroup_align",
    oracle="""
    WITH e AS (
      SELECT user_id,
             CAST(round(value * 100) AS BIGINT) AS ec,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rk
      FROM events WHERE event_type = 'purchase'
    ),
    o AS (
      SELECT o_custkey - 1 AS user_id,
             CAST(round(o_totalprice * 100) AS BIGINT) AS oc,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS rk
      FROM orders
    )
    SELECT e.user_id AS user_id,
           CAST(count(*) AS BIGINT) AS n_aligned,
           CAST(sum(e.ec * o.oc) AS BIGINT) AS dot_cents
    FROM e JOIN o ON o.user_id = e.user_id AND o.rk = e.rk
    GROUP BY e.user_id
    ORDER BY e.user_id
    """,
)
def q403_cogroup_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided per-key custom merge through Spark's COGROUP API
    (groupBy().cogroup().applyInPandas — the one structured-API
    surface the registry had not yet exercised): per user, align the
    i-th purchase event (time order) with the user's i-th order
    (date order) and fold the aligned pairs — the positional
    sequence-alignment shape (compare parallel histories, reconcile
    ledgers) that relational form needs two rank windows + a join to
    express, and cogroup expresses as one co-partitioned pandas
    function per key. Exact integer cents keep the dot product
    hash-stable.

    Scale: cogroup shuffles BOTH sides once on the key and streams
    each key's two frames to one task — the same exchange the
    two-window oracle plan pays, minus one join.

    Round-14 optimization (guide §4.2 — one Python call per TASK, not
    per tiny group): cogrouping directly on user_id dispatched one
    pandas function call per user (~15k calls of ~10-row frames at
    sf0.1 — 51.8 s, >95% interpreter/serialization overhead). The
    cogroup key is now a BUCKET of users (pmod over a
    parallelism-derived count, conf `distcpplus.cogroup.buckets`), and
    the kernel aligns every user in the bucket vectorized: sort once,
    groupby-cumcount for the per-user rank, one merge on
    (user_id, rank) — the inner merge reproduces the old per-user
    min(len_e, len_o) truncation exactly, and users present on only
    one side drop out just as the old empty-frame early-return did.
    Same cogroup API surface, same exchange, 128 Python calls instead
    of 15k. Result-identical (oracle-checked; probe cross-check at
    sf0.1): 51.8 → ~1.5 s."""
    import pandas as pd

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "ts",
            "event_id",
            F.round(F.col("value") * 100).cast("long").alias("ec"),
        )
    )
    orders = load_table(spark, sf_dir, "orders").select(
        (F.col("o_custkey") - 1).alias("user_id"),
        "o_orderdate",
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("oc"),
    )
    # Bucket count scales with cluster parallelism (×4 for per-bucket
    # size variance); raise distcpplus.cogroup.buckets at 100 TB so a
    # bucket's two frames stay comfortably in a task's memory.
    n_buckets = int(
        spark.conf.get(
            "distcpplus.cogroup.buckets",
            str(max(64, spark.sparkContext.defaultParallelism * 4)),
        )
    )
    bucket = F.pmod(F.col("user_id"), F.lit(n_buckets)).alias("_bkt")

    def align(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "user_id": pd.Series(dtype="int64"),
                "n_aligned": pd.Series(dtype="int64"),
                "dot_cents": pd.Series(dtype="int64"),
            }
        )
        if len(left) == 0 or len(right) == 0:
            return empty
        ls = left.sort_values(["user_id", "ts", "event_id"])
        rs = right.sort_values(["user_id", "o_orderdate", "o_orderkey"])
        ls = ls.assign(_rk=ls.groupby("user_id", sort=False).cumcount())
        rs = rs.assign(_rk=rs.groupby("user_id", sort=False).cumcount())
        m = ls[["user_id", "_rk", "ec"]].merge(
            rs[["user_id", "_rk", "oc"]], on=["user_id", "_rk"]
        )
        if len(m) == 0:
            return empty
        prod = m["ec"].to_numpy() * m["oc"].to_numpy()
        out = (
            m.assign(_p=prod)
            .groupby("user_id", sort=False, as_index=False)
            .agg(n_aligned=("_p", "size"), dot_cents=("_p", "sum"))
        )
        return out.astype("int64")

    out = (
        ev.groupBy(bucket)
        .cogroup(orders.groupBy(bucket))
        .applyInPandas(
            align, "user_id long, n_aligned long, dot_cents long"
        )
    )
    return out.orderBy("user_id")


@query(
    "q404_lsh_param_tuner",
    oracle="""
    WITH grid AS (
      SELECT r, 128 // r AS b FROM (
        SELECT unnest([1, 2, 4, 8, 16, 32, 64, 128]) AS r)
    ),
    c AS (
      SELECT b, r,
             1 - power(1 - power(0.85, r), b) AS p_hi,
             1 - power(1 - power(0.55, r), b) AS p_lo,
             (power(1 - power(0.85, r), b)
              + (1 - power(1 - power(0.55, r), b))) AS cost
      FROM grid
    ),
    best AS (
      SELECT r AS best_r FROM c
      ORDER BY round(cost, 9), r LIMIT 1
    )
    SELECT CAST(b AS BIGINT) AS b, CAST(r AS BIGINT) AS r,
           CAST(round(p_hi, 6) AS DOUBLE) AS p_match_6,
           CAST(round(p_lo, 6) AS DOUBLE) AS p_noise_6,
           CAST(round(cost, 6) AS DOUBLE) AS cost_6,
           CASE WHEN r = (SELECT best_r FROM best) THEN 1 ELSE 0 END
             AS is_chosen
    FROM c ORDER BY r
    """,
)
def q404_lsh_param_tuner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH banding parameter advisor: sweep every (bands,
    rows) factorization of a 128-hash signature and score the
    collision S-curve P(s) = 1-(1-s^r)^b at the design points —
    catch probability for true near-dups (s=0.85) vs leakage for
    noise pairs (s=0.55) — choosing the factorization that minimizes
    miss+leak (round-9 argmin, r tie-break: the q384 libm
    discipline). The ergonomics layer over the q57-q59/q252 LSH
    tier: the curve math that picks b and r is itself under the
    hash gate, so a regression in the tuner can't silently deform
    every downstream dedup threshold.

    Scale: pure closed-form arithmetic on an 8-row grid — the
    advisor runs before any data is touched (q301's advisor
    precedent)."""
    rows = [(128 // r, r) for r in [1, 2, 4, 8, 16, 32, 64, 128]]
    g = local_rows(spark, rows, "b long, r long")
    c = g.select(
        "b",
        "r",
        (
            F.lit(1.0)
            - F.pow(F.lit(1.0) - F.pow(F.lit(0.85), F.col("r")), F.col("b"))
        ).alias("p_hi"),
        (
            F.lit(1.0)
            - F.pow(F.lit(1.0) - F.pow(F.lit(0.55), F.col("r")), F.col("b"))
        ).alias("p_lo"),
    ).withColumn(
        "cost", (F.lit(1.0) - F.col("p_hi")) + F.col("p_lo")
    )
    best_r = (
        c.orderBy(F.round("cost", 9), "r").limit(1).collect()[0]["r"]
    )
    return small_sort(
        c.select(
            "b",
            "r",
            F.round("p_hi", 6).alias("p_match_6"),
            F.round("p_lo", 6).alias("p_noise_6"),
            F.round("cost", 6).alias("cost_6"),
            F.when(F.col("r") == int(best_r), 1).otherwise(0).alias(
                "is_chosen"
            ),
        ),
        "r",
    )


@query(
    "q405_neyman_allocation",
    oracle="""
    WITH s AS (
      SELECT event_type, event_id,
             CAST(round(value * 100) AS BIGINT) AS cents,
             (event_id * 2654435761 + 1013904223) % 1000003 AS pri
      FROM events
    ),
    st AS (
      SELECT event_type, count(*) AS nh,
             stddev_pop(cents) AS sh
      FROM s GROUP BY event_type
    ),
    w AS (
      SELECT event_type, nh, nh * sh AS wh,
             sum(nh * sh) OVER () AS wtot
      FROM st
    ),
    alloc0 AS (
      SELECT event_type, nh,
             CAST(floor(500 * wh / wtot) AS BIGINT) AS base,
             500 * wh / wtot - floor(500 * wh / wtot) AS rem
      FROM w
    ),
    leftover AS (SELECT 500 - sum(base) AS k FROM alloc0),
    alloc AS (
      SELECT event_type, nh,
             base + CASE WHEN row_number() OVER
                           (ORDER BY rem DESC, event_type)
                         <= (SELECT k FROM leftover)
                    THEN 1 ELSE 0 END AS n_alloc
      FROM alloc0
    ),
    r AS (
      SELECT s.event_type, s.event_id,
             row_number() OVER (PARTITION BY s.event_type
                                ORDER BY s.pri, s.event_id) AS rk
      FROM s
    )
    SELECT r.event_type AS event_type,
           CAST(a.n_alloc AS BIGINT) AS n_alloc,
           CAST(count(*) AS BIGINT) AS n_selected,
           CAST(bit_xor(r.event_id) AS BIGINT) AS id_xor
    FROM r JOIN alloc a ON a.event_type = r.event_type
    WHERE r.rk <= a.n_alloc
    GROUP BY r.event_type, a.n_alloc
    ORDER BY event_type
    """,
)
def q405_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-allocated stratified sample: a 500-row budget split
    across event-type strata proportional to N_h * S_h (stratum size
    x stratum spread — the variance-minimizing allocation of survey
    sampling, the principled upgrade over q146's proportional
    stratification), integerized by largest-remainder rounding
    (exact floor + ranked remainders, so the counts are
    deterministic), then selected per stratum by the portable
    integer-mixer priority. The xor of selected ids gates the EXACT
    sample, not just the sizes.

    Scale: stratum stats are one hash agg; the allocation is a
    bounded driver fold (|strata| rows); selection is a per-stratum
    PARTITIONED rank filtered against the broadcast allocation (the
    cap is per-stratum data, so no WindowGroupLimit literal — the
    rank window itself stays stratum-parallel)."""
    s = load_table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        (
            (F.col("event_id") * 2654435761 + 1013904223) % 1000003
        ).alias("pri"),
    )
    st = s.groupBy("event_type").agg(
        F.count("*").alias("nh"), F.stddev_pop("cents").alias("sh")
    )
    rows = st.collect()
    wh = {r["event_type"]: r["nh"] * r["sh"] for r in rows}
    wtot = sum(wh.values())
    base = {t: int(500 * w / wtot) for t, w in wh.items()}
    rem = {t: 500 * w / wtot - base[t] for t, w in wh.items()}
    k = 500 - sum(base.values())
    order = sorted(rem, key=lambda t: (-rem[t], t))
    n_alloc = {
        t: base[t] + (1 if i < k else 0) for i, t in enumerate(order)
    }
    alloc = local_rows(spark,
        [(t, n) for t, n in n_alloc.items()],
        "event_type string, n_alloc long",
    )
    w = W.partitionBy("event_type").orderBy("pri", "event_id")
    sel = (
        s.withColumn("rk", F.row_number().over(w))
        .join(F.broadcast(alloc), "event_type")
        .filter(F.col("rk") <= F.col("n_alloc"))
    )
    return small_sort(
        sel.groupBy("event_type", "n_alloc").agg(
            F.count("*").cast("long").alias("n_selected"),
            F.bit_xor("event_id").cast("long").alias("id_xor"),
        ).select("event_type", "n_alloc", "n_selected", "id_xor"),
        "event_type",
    )


@query(
    "q407_seqfile_block_compressed",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(doc_id) AS BIGINT) AS id_sum,
           CAST(bit_xor(CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT))
                AS BIGINT) AS text_fp
    FROM documents
    GROUP BY lang ORDER BY lang
    """,
)
def q407_seqfile_block_compressed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q396's round trip through BLOCK-COMPRESSED SequenceFiles
    (DefaultCodec = zlib — codec layer grounded on stdlib zlib, so
    writer/reader bugs cannot cancel; layout hand-fixture-pinned in
    tests/test_seqfile.py): sync-anchored blocks of four zlib buffers
    are the Hadoop ecosystem's canonical SPLITTABLE compressed
    container, and the byte-range read here crosses many block seams
    (2 KB blocks, 16 KB splits). Round trip must preserve every id
    and text byte per language (md5-prefix xor fingerprint).

    Scale: identical to q396 — split tasks seek to sync anchors and
    decompress only their own blocks; writes are shard-per-partition
    mapInArrow."""
    import shutil as _sh
    import tempfile as _tf

    from distcpplus_spark.sources.seqfile import (
        read_seqfile_spark,
        write_seqfile_shards,
    )

    docs = load_table(spark, sf_dir, "documents")
    base = _tf.mkdtemp(prefix="seqfile_q407_")
    path = base + "/shards"
    try:
        write_seqfile_shards(
            docs.select("doc_id", "text").repartition(4),
            path,
            compression="block",
            sync_interval=2048,
        )
        back = read_seqfile_spark(spark, path, split_bytes=16 * 1024)
        joined = back.join(docs.select("doc_id", "lang"), "doc_id")
        agg = joined.groupBy("lang").agg(
            F.count("*").cast("long").alias("n"),
            F.sum("doc_id").cast("long").alias("id_sum"),
            F.bit_xor(
                F.conv(F.substring(F.md5("text"), 1, 15), 16, 10).cast(
                    "long"
                )
            ).alias("text_fp"),
        )
        rows = agg.collect()
        return local_rows(spark, rows, agg.schema).transform(
            small_sort, "lang"
        )
    finally:
        _sh.rmtree(base, ignore_errors=True)


@query(
    "q408_lz4text_datasource",
    oracle="""
    WITH lines AS (
      SELECT doc_id || CHR(9) ||
             replace(replace(text, CHR(13), ' '), CHR(10), ' ') AS line
      FROM documents WHERE doc_id < 500
    )
    SELECT CAST(count(*) AS BIGINT) AS n_lines,
           CAST(bit_xor(CAST('0x' || substr(md5(line), 1, 15) AS BIGINT))
                AS BIGINT) AS lines_fp,
           true AS multi_partition
    FROM lines
    """,
)
def q408_lz4text_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DSv2 integration twin of q406: the same splittable
    LZ4-frame corpus read through ``spark.read.format('lz4text')``
    (sources/pyds.py — the Python DataSource API plans MULTIPLE
    byte-range partitions per file, q267's tier for tfrecord) under
    the driver hash gate. The fingerprint must match the relational
    recomputation and the scan must really have split
    (multi_partition contract, 2 KB blocks / 4 KB splits on a
    bounded 500-doc fixture)."""
    import os
    import tempfile

    from distcpplus_spark.sources.lz4frame import write_lz4_lines
    from distcpplus_spark.sources.pyds import register_python_sources

    register_python_sources(spark)
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 500)
        .select("doc_id", "text")
        .orderBy("doc_id")
    )
    root = tempfile.mkdtemp(prefix="lz4ds_")
    path = os.path.join(root, "corpus.lz4")
    write_lz4_lines(
        (
            f"{r['doc_id']}\t"
            + r["text"].replace("\r", " ").replace("\n", " ")
            for r in docs.collect()
        ),
        path,
        block_bytes=2048,
    )
    df = (
        spark.read.format("lz4text")
        .option("path", path)
        .option("split_bytes", 4096)
        .load()
    )
    n_parts = df.rdd.getNumPartitions()
    return df.agg(
        F.count("*").cast("bigint").alias("n_lines"),
        F.bit_xor(
            F.conv(F.substring(F.md5("line"), 1, 15), 16, 10).cast("long")
        ).alias("lines_fp"),
        F.lit(n_parts > 1).alias("multi_partition"),
    )


@query(
    "q409_seqfile_record_compressed",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(doc_id) AS BIGINT) AS id_sum,
           CAST(bit_xor(CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT))
                AS BIGINT) AS text_fp
    FROM documents
    GROUP BY lang ORDER BY lang
    """,
)
def q409_seqfile_record_compressed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q407's sibling for RECORD-compressed SequenceFiles (each
    serialized value zlib-deflated, keys plain — the Hadoop
    RecordCompressWriter layout, hand-fixture-pinned in
    tests/test_seqfile.py). Record mode stays sync-splittable because
    records are individually compressed, so the byte-range read path
    is identical to plain mode."""
    import shutil as _sh
    import tempfile as _tf

    from distcpplus_spark.sources.seqfile import (
        read_seqfile_spark,
        write_seqfile_shards,
    )

    docs = load_table(spark, sf_dir, "documents")
    base = _tf.mkdtemp(prefix="seqfile_q409_")
    path = base + "/shards"
    try:
        write_seqfile_shards(
            docs.select("doc_id", "text").repartition(4),
            path,
            compression="record",
            sync_interval=2048,
        )
        back = read_seqfile_spark(spark, path, split_bytes=16 * 1024)
        joined = back.join(docs.select("doc_id", "lang"), "doc_id")
        agg = joined.groupBy("lang").agg(
            F.count("*").cast("long").alias("n"),
            F.sum("doc_id").cast("long").alias("id_sum"),
            F.bit_xor(
                F.conv(F.substring(F.md5("text"), 1, 15), 16, 10).cast(
                    "long"
                )
            ).alias("text_fp"),
        )
        rows = agg.collect()
        return local_rows(spark, rows, agg.schema).transform(
            small_sort, "lang"
        )
    finally:
        _sh.rmtree(base, ignore_errors=True)


@query(
    "q410_bloom_batch_probe",
    oracle="""
    SELECT d.lang,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(d.doc_id) AS BIGINT) AS id_sum
    FROM documents d
    WHERE d.doc_id IN (
      SELECT doc_id * 3 FROM documents WHERE doc_id % 7 = 0
    )
    GROUP BY d.lang ORDER BY d.lang
    """,
)
def q410_bloom_batch_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BATCH probe through the Bloom sidecar file index
    (operators/layout.py::bloom_index_mark / read_bloom_pruned_batch)
    — q390's point-get scaled to a probe SET: keys hash JVM-side, the
    sidecar bitmaps ride one broadcast, membership marks run
    vectorized in the probe partitions, and only the DISTINCT
    candidate-file list crosses the driver (bounded by the table's
    file count, independent of probe cardinality). The probe batch is
    3x the doc_ids divisible by 7, so roughly two thirds of probes
    are provably absent (empty candidate array — asserted) and the
    hits are exactly the doc_ids divisible by 21 still in range.
    Correctness is always the exact semi-join's; the index only buys
    the skip."""
    import shutil as _sh
    import tempfile as _tf

    from distcpplus_spark.operators.layout import (
        bloom_index_mark,
        read_bloom_pruned_batch,
        write_bloom_indexed,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    base = _tf.mkdtemp(prefix="bloomidx_q410_")
    path = base + "/docs"
    probes = (
        docs.filter(F.col("doc_id") % 7 == 0)
        .select((F.col("doc_id") * 3).alias("doc_id"))
        .distinct()
    )
    try:
        write_bloom_indexed(docs, path, "doc_id", num_files=8)
        marked = bloom_index_mark(spark, path, probes)
        n_miss = marked.filter(F.size("_candidate_files") == 0).count()
        if n_miss == 0:
            raise AssertionError(
                "batch probe produced no provable misses on a probe "
                "set that is mostly absent keys"
            )
        out = read_bloom_pruned_batch(spark, path, probes)
        agg = out.groupBy("lang").agg(
            F.count("*").cast("long").alias("n"),
            F.sum("doc_id").cast("long").alias("id_sum"),
        )
        rows = agg.collect()
        return local_rows(spark, rows, agg.schema).transform(
            small_sort, "lang"
        )
    finally:
        _sh.rmtree(base, ignore_errors=True)


@query(
    "q411_fellegi_sunter_linkage",
    oracle="""
    WITH a AS (
      SELECT c_custkey AS id_a, c_name AS name_a,
             c_nationkey AS nat, c_mktsegment AS seg_a,
             CAST(round(c_acctbal * 100) AS BIGINT) AS bal_a
      FROM customer
    ),
    b AS (
      SELECT c_custkey AS id_b, c_name AS name_b, c_nationkey AS nat,
             CASE WHEN c_custkey % 5 = 0 THEN 'SHIFTED'
                  ELSE c_mktsegment END AS seg_b,
             CAST(round(c_acctbal * 100) AS BIGINT)
               + CASE WHEN c_custkey % 7 = 0 THEN 13700 ELSE 200 END
               AS bal_b
      FROM customer
    ),
    pairs AS (
      SELECT a.*, b.id_b, b.name_b, b.seg_b, b.bal_b
      FROM a JOIN b
        ON a.nat = b.nat AND (a.bal_a // 50000) = (b.bal_b // 50000)
    ),
    scored AS (
      SELECT nat, id_a, id_b,
             (CASE WHEN name_a = name_b THEN 6 ELSE -5 END
              + CASE WHEN seg_a = seg_b THEN 3 ELSE -2 END
              + CASE WHEN abs(bal_a - bal_b) <= 500 THEN 4 ELSE -3 END)
               AS fs_weight
      FROM pairs
    )
    SELECT CAST(nat AS INT) AS nat,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(CASE WHEN fs_weight >= 8 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_matches,
           CAST(sum(CASE WHEN fs_weight >= 8 AND id_a = id_b
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
           CAST(sum(fs_weight) AS BIGINT) AS weight_sum
    FROM scored GROUP BY nat ORDER BY nat
    """,
)
def q411_fellegi_sunter_linkage(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Fellegi-Sunter probabilistic record linkage
    (operators/dedup.py::linkage_score): a deterministically
    perturbed copy of the customer table (every 5th segment
    scrambled, balances shifted +2.00, every 7th +137.00) is linked
    back against the original — blocked equi-join on (nation,
    balance 500-bucket), then per-field agreement weights (name
    +6/−5, segment +3/−2, balance-within-5.00 +4/−3; integer
    log-odds, the exact-arithmetic practice once m/u are estimated)
    summed into the pair score, match band at ≥8. n_true counts
    matched pairs that ARE the same record — the oracle pins the
    whole confusion surface per nation.

    Scale: candidates come from the blocked equi-join (never
    quadratic — the bucket width is a blocking choice), scoring is
    map-only column arithmetic; this composes with q370/q400's
    blocking tiers for the 100 TB mastering pipeline."""
    cust = load_table(spark, sf_dir, "customer")
    a = cust.select(
        F.col("c_custkey").alias("id_a"),
        F.col("c_name").alias("name_a"),
        F.col("c_nationkey").alias("nat"),
        F.col("c_mktsegment").alias("seg_a"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_a"),
    )
    b = cust.select(
        F.col("c_custkey").alias("id_b"),
        F.col("c_name").alias("name_b"),
        F.col("c_nationkey").alias("nat"),
        F.when(F.col("c_custkey") % 5 == 0, F.lit("SHIFTED"))
        .otherwise(F.col("c_mktsegment"))
        .alias("seg_b"),
        (
            F.round(F.col("c_acctbal") * 100).cast("long")
            + F.when(F.col("c_custkey") % 7 == 0, F.lit(13700)).otherwise(
                F.lit(200)
            )
        ).alias("bal_b"),
    )
    # Round-15 (guide §2.3 taken to its conclusion; §3.3 exploding
    # joins): the blocked self-join emits ~385 M scored pairs at sf3
    # (~857 rows/side/block × ~525 blocks) — 86 s — yet every output
    # column decomposes EXACTLY into per-field sufficient statistics,
    # with NO data assumptions. The pair weight is
    #   w = -10 + 11·[name_eq] + 5·[seg_eq] + 7·[bal_close]
    # (6/-5, 3/-2, 4/-3 rewritten through w = Σ(hit·m + (1-hit)·u)),
    # so w >= 8  ⇔  11n + 5s + 7c >= 18  ⇔  n=1 AND c=1 (n=0 maxes at
    # 12; n=1,c=0 maxes at 16): matches are EXACTLY the name-equal,
    # balance-close pairs — pure weight algebra. Therefore:
    #   n_pairs     = Σ_blk |A_blk|·|B_blk|      (count products)
    #   weight_sum  = -10·n_pairs + 11·N + 5·S + 7·C  (linear)
    #   n_matches   = #(name-equal ∧ bal_close)  (on the tiny
    #                 name-equal join output — names are near-unique)
    #   n_true      = the same rows with id_a = id_b
    # with N/S from per-block (name / segment) count products and C
    # from a ±500-cent band join on 500-cent sub-buckets (|Δbal|<=500
    # ⇒ sub-buckets differ by at most 1, incl. the truncation bucket
    # around zero: buckets two apart are separated by a full >=500-
    # wide bucket). The old formulation is pinned result-identical in
    # tests/test_r15_optimizations.py; linkage_score (the reusable
    # operator) is unchanged. sf3: 86 s → see OPTIMIZATION_r15.md.
    blk_a = a.withColumn("blk", F.expr("bal_a div 50000"))
    blk_b = b.withColumn("blk", F.expr("bal_b div 50000"))

    ca = blk_a.groupBy("nat", "blk").agg(F.count("*").alias("na"))
    cb = blk_b.groupBy("nat", "blk").agg(F.count("*").alias("nb"))
    p_nat = (
        ca.join(cb, ["nat", "blk"])
        .groupBy("nat")
        .agg(F.sum(F.col("na") * F.col("nb")).alias("n_pairs"))
    )

    sa = blk_a.groupBy("nat", "blk", F.col("seg_a").alias("seg")).agg(
        F.count("*").alias("na")
    )
    sb = blk_b.groupBy("nat", "blk", F.col("seg_b").alias("seg")).agg(
        F.count("*").alias("nb")
    )
    s_nat = (
        sa.join(sb, ["nat", "blk", "seg"])
        .groupBy("nat")
        .agg(F.sum(F.col("na") * F.col("nb")).alias("n_seg_eq"))
    )

    bal_close = F.abs(F.col("bal_a") - F.col("bal_b")) <= 500
    name_pairs = blk_a.select(
        "nat", "blk", F.col("name_a").alias("nm"), "id_a", "bal_a"
    ).join(
        blk_b.select(
            "nat", "blk", F.col("name_b").alias("nm"), "id_b", "bal_b"
        ),
        ["nat", "blk", "nm"],
    )
    n_nat = name_pairs.groupBy("nat").agg(
        F.count("*").alias("n_name_eq"),
        F.sum(bal_close.cast("long")).alias("n_matches"),
        F.sum(
            (bal_close & (F.col("id_a") == F.col("id_b"))).cast("long")
        ).alias("n_true"),
    )

    ba = blk_a.select(
        "nat", "blk", "bal_a", F.expr("bal_a div 500").alias("sb")
    )
    bb3 = (
        blk_b.select(
            "nat", "blk", "bal_b", F.expr("bal_b div 500").alias("sb0")
        )
        .withColumn("_d", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .select("nat", "blk", "bal_b", (F.col("sb0") + F.col("_d")).alias("sb"))
    )
    c_nat = (
        ba.join(bb3, ["nat", "blk", "sb"])
        .filter(bal_close)
        .groupBy("nat")
        .agg(F.count("*").alias("n_bal_close"))
    )

    agg = (
        p_nat.join(n_nat, "nat", "left")
        .join(s_nat, "nat", "left")
        .join(c_nat, "nat", "left")
        .select(
            "nat",
            F.col("n_pairs").cast("long").alias("n_pairs"),
            F.coalesce("n_matches", F.lit(0)).cast("long").alias("n_matches"),
            F.coalesce("n_true", F.lit(0)).cast("long").alias("n_true"),
            (
                F.lit(-10) * F.col("n_pairs")
                + F.lit(11) * F.coalesce("n_name_eq", F.lit(0))
                + F.lit(5) * F.coalesce("n_seg_eq", F.lit(0))
                + F.lit(7) * F.coalesce("n_bal_close", F.lit(0))
            ).cast("long").alias("weight_sum"),
        )
    )
    return small_sort(agg.withColumn("nat", F.col("nat").cast("int")), "nat")


@query(
    "q412_temperature_mixture",
    oracle="""
    WITH c AS MATERIALIZED (
      SELECT source AS g, CAST(count(*) AS BIGINT) AS n
      FROM documents GROUP BY source
    ),
    w AS MATERIALIZED (
      SELECT g, n,
             CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1000000 + 0.5)
                  AS BIGINT) AS w
      FROM c
    ),
    tot AS MATERIALIZED (
      SELECT sum(w) AS s,
             CAST((SELECT count(*) FROM documents) // 10 AS BIGINT)
               AS budget
      FROM w
    ),
    base AS MATERIALIZED (
      SELECT g, n, w, (tot.budget * w) // tot.s AS alloc0,
             tot.budget * w - ((tot.budget * w) // tot.s) * tot.s AS rem,
             tot.budget AS budget
      FROM w, tot
    ),
    ranked AS MATERIALIZED (
      SELECT b.*,
             (SELECT count(*) FROM base o
              WHERE o.rem > b.rem OR (o.rem = b.rem AND o.g < b.g))
               AS n_before,
             (SELECT sum(alloc0) FROM base) AS tb
      FROM base b
    ),
    alloc AS (
      SELECT g, n,
             alloc0 + CASE WHEN n_before < budget - tb
                           THEN 1 ELSE 0 END AS alloc
      FROM ranked
    ),
    pri AS (
      SELECT doc_id, source AS g,
             (doc_id * 2654435761 + 1013904223) % 1000000 AS pri
      FROM documents
    ),
    rk AS (
      SELECT g, doc_id,
             row_number() OVER (
               PARTITION BY g ORDER BY pri, doc_id
             ) AS rn
      FROM pri
    ),
    picked AS (
      SELECT rk.g, rk.doc_id
      FROM rk JOIN alloc ON rk.g = alloc.g
      WHERE rk.rn <= alloc.alloc
    )
    SELECT a.g AS source,
           CAST(a.n AS BIGINT) AS n,
           CAST(a.alloc AS BIGINT) AS alloc,
           CAST(coalesce(count(p.doc_id), 0) AS BIGINT) AS n_sampled,
           CAST(coalesce(sum(p.doc_id), 0) AS BIGINT) AS id_sum
    FROM alloc a LEFT JOIN picked p ON a.g = p.g
    GROUP BY a.g, a.n, a.alloc ORDER BY a.g
    """,
)
def q412_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened corpus mixing (the mC4/ROOTS move,
    plans/pipeline.py::temperature_allocation): per-source budgets
    ∝ n^(1/2) integerized by largest remainder to sum EXACTLY to a
    10%-of-corpus budget, then each source contributes its alloc
    lowest-mixer-priority docs (q250's portable integer mixer — no
    RNG). Exactness: sqrt is IEEE-correctly-rounded in both engines,
    so the 1e-6-quantized micro-weights are identical BIGINTs and
    everything downstream is integer arithmetic; the remainder rank
    is a self-join count over the per-source aggregate, never a
    global window.

    Scale: allocation touches #sources rows; selection is one
    partitioned window over the docs — a single shuffle on
    source."""
    from distcpplus_spark.plans.pipeline import temperature_allocation
    from pyspark.sql.window import Window as W

    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy(F.col("source").alias("g")).agg(
        F.count("*").alias("n")
    )
    total = docs.count()
    alloc = temperature_allocation(
        counts, "g", "n", budget=total // 10, temperature=2.0
    )
    pri = docs.select(
        "doc_id",
        F.col("source").alias("g"),
        ((F.col("doc_id") * 2654435761 + 1013904223) % 1000000).alias(
            "pri"
        ),
    )
    rk = pri.withColumn(
        "rn",
        F.row_number().over(W.partitionBy("g").orderBy("pri", "doc_id")),
    )
    picked = rk.join(F.broadcast(alloc), "g").filter(
        F.col("rn") <= F.col("alloc")
    )
    agg = (
        alloc.join(
            picked.groupBy("g").agg(
                F.count("*").alias("n_sampled"),
                F.sum("doc_id").alias("id_sum"),
            ),
            "g",
            "left",
        )
        .select(
            F.col("g").alias("source"),
            F.col("n").cast("long").alias("n"),
            F.col("alloc").cast("long").alias("alloc"),
            F.coalesce("n_sampled", F.lit(0)).cast("long").alias(
                "n_sampled"
            ),
            F.coalesce("id_sum", F.lit(0)).cast("long").alias("id_sum"),
        )
    )
    return small_sort(agg, "source")


@query(
    "q413_bloom_index_lifecycle",
    oracle="""
    SELECT d.lang,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(d.doc_id) AS BIGINT) AS id_sum
    FROM documents d
    WHERE d.doc_id IN (
      SELECT doc_id * 2 FROM documents WHERE doc_id % 11 = 0
    )
    GROUP BY d.lang ORDER BY d.lang
    """,
)
def q413_bloom_index_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bloom file index LIFECYCLE under one hash gate: build the
    sidecar index over the EVEN doc_ids, land the odd doc_ids later
    as bare parquet appends, bloom_index_refresh picks up exactly the
    new files (cost proportional to the append — asserted in-query),
    and the batch probe then answers over the WHOLE table. The
    oracle is the plain semi-join over all documents, so a refresh
    that missed a file, double-indexed one, or mixed hash params
    would lose or phantom rows.

    Scale: this is the lakehouse index append path — refresh scans
    only the new files' keys (one distributed pass over the delta),
    manifest merge is metadata-scale, and the probe stays the q410
    broadcast-mark shape."""
    import os as _os
    import shutil as _sh
    import tempfile as _tf

    from distcpplus_spark.operators.layout import (
        bloom_index_refresh,
        read_bloom_pruned_batch,
        write_bloom_indexed,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    base = _tf.mkdtemp(prefix="bloomidx_q413_")
    path = base + "/docs"
    side = base + "/side"
    probes = (
        docs.filter(F.col("doc_id") % 11 == 0)
        .select((F.col("doc_id") * 2).alias("doc_id"))
        .distinct()
    )
    try:
        write_bloom_indexed(
            docs.filter(F.col("doc_id") % 2 == 0), path, "doc_id",
            num_files=8,
        )
        docs.filter(F.col("doc_id") % 2 == 1).repartition(3).write.parquet(
            side
        )
        moved = 0
        for f in _os.listdir(side):
            if f.endswith(".parquet"):
                _sh.move(_os.path.join(side, f), _os.path.join(path, f))
                moved += 1
        n_new, n_total = bloom_index_refresh(spark, path)
        if not (n_new == moved and n_total == 8 + moved):
            raise AssertionError(
                f"refresh indexed {n_new}/{moved} appended files "
                f"(total {n_total})"
            )
        # out is the table rows (doc_id, lang) matching the probes
        out = read_bloom_pruned_batch(spark, path, probes)
        agg = out.groupBy("lang").agg(
            F.count("*").cast("long").alias("n"),
            F.sum("doc_id").cast("long").alias("id_sum"),
        )
        rows = agg.collect()
        return local_rows(spark, rows, agg.schema).transform(
            small_sort, "lang"
        )
    finally:
        _sh.rmtree(base, ignore_errors=True)


@query(
    "q414_schema_drift_report",
    oracle="""
    SELECT 'c_acctbal' AS col_name, 'retyped' AS change,
           'double' AS type_a, CAST('decimal(12,2)' AS VARCHAR) AS type_b,
           CAST(0.0 AS DOUBLE) AS null_rate_a,
           CAST(0.0 AS DOUBLE) AS null_rate_b
    UNION ALL
    SELECT 'c_custkey', 'unchanged', 'bigint', 'bigint', 0.0, 0.0
    UNION ALL
    SELECT 'c_mktsegment', 'unchanged', 'string', 'string', 0.0, 0.0
    UNION ALL
    SELECT 'c_name', 'dropped', 'string', NULL, 0.0, NULL
    UNION ALL
    SELECT 'c_tier', 'added', NULL, 'string', NULL,
           (SELECT CAST(floor(sum(CASE WHEN c_acctbal < 0 THEN 1
                                       ELSE 0 END) * 1000000.0
                              / count(*) + 0.5) / 1000000.0 AS DOUBLE)
            FROM customer)
    ORDER BY col_name
    """,
)
def q414_schema_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-acceptance schema drift audit
    (sources/schema_evo.py::schema_drift_report): customer v2 drops
    c_name, retypes c_acctbal double→decimal(12,2), and adds a
    c_tier column that is NULL for negative balances — the report
    must classify every column of the schema union
    (added/dropped/retyped/unchanged) and carry per-side null rates
    from ONE fused aggregation pass per snapshot. The oracle states
    the expected report row by row, with c_tier's null rate computed
    from the fixture (the floor-gate keeps the ratio portable).

    Scale: schemas are footer metadata; the null profile is one agg
    per side regardless of column count — two scans total."""
    import shutil as _sh
    import tempfile as _tf

    from distcpplus_spark.sources.schema_evo import schema_drift_report

    cust = load_table(spark, sf_dir, "customer")
    base = _tf.mkdtemp(prefix="drift_q414_")
    pa_, pb = base + "/v1", base + "/v2"
    try:
        cust.select(
            "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
        ).write.parquet(pa_)
        cust.select(
            "c_custkey",
            F.col("c_acctbal").cast("decimal(12,2)").alias("c_acctbal"),
            "c_mktsegment",
            F.when(F.col("c_acctbal") >= 0, F.lit("std")).alias("c_tier"),
        ).write.parquet(pb)
        rep = schema_drift_report(spark, pa_, pb)
        rows = rep.collect()
    finally:
        _sh.rmtree(base, ignore_errors=True)
    out = local_rows(spark, rows, rep.schema).withColumnRenamed(
        "column", "col_name"
    )
    return small_sort(out, "col_name")


@query(
    "q415_association_rules",
    oracle="""
    WITH li AS MATERIALIZED (
      SELECT DISTINCT user_id, event_type FROM events
    ),
    n_users AS (
      SELECT count(DISTINCT user_id) AS n FROM events
    ),
    item AS MATERIALIZED (
      SELECT event_type, count(*) AS cnt FROM li GROUP BY event_type
    ),
    pair AS (
      SELECT a.event_type AS ante, b.event_type AS cons,
             count(*) AS both_cnt
      FROM li a JOIN li b ON a.user_id = b.user_id
       AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT ante, cons,
           CAST(both_cnt AS BIGINT) AS support_cnt,
           CAST(floor(both_cnt * 1000000.0 / ia.cnt + 0.5) / 1000000.0
                AS DOUBLE) AS confidence_6,
           CAST(floor(both_cnt * (SELECT n FROM n_users) * 1000000.0
                      / (ia.cnt * ic.cnt) + 0.5) / 1000000.0
                AS DOUBLE) AS lift_6
    FROM pair
    JOIN item ia ON ia.event_type = ante
    JOIN item ic ON ic.event_type = cons
    WHERE both_cnt >= 3
    ORDER BY ante, cons
    """,
)
def q415_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over per-user event-type
    baskets: support / confidence / lift for every type pair
    co-occurring for >= 3 users (antecedent = lexicographically
    smaller type). The statistics are exact integer-count ratios
    with the floor(x*1e6+0.5) output gate; the item DOMAIN is the
    fixed event-type vocabulary, so supports GROW with SF and the
    >= 3 floor is scale-free (the first draft bound l_partkey < 200
    and emptied at sf3 — the part domain grows with SF, diluting
    any fixed vocab: the q164 lesson, again).

    Scale: baskets come from one DISTINCT (user, type) projection;
    pair volume per user is C(|types|, 2) with a FIXED type
    vocabulary, so the self-join is linear in users; item counts are
    one hash agg; enrichment joins broadcast the |types|-row side."""
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
    )
    n_users = (
        load_table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .count()
    )
    item = ev.groupBy("event_type").agg(F.count("*").alias("cnt"))
    a = ev.select(
        F.col("user_id"), F.col("event_type").alias("ante")
    )
    b = ev.select(
        F.col("user_id"), F.col("event_type").alias("cons")
    )
    pair = (
        a.join(b, "user_id")
        .filter(F.col("ante") < F.col("cons"))
        .groupBy("ante", "cons")
        .agg(F.count("*").alias("both_cnt"))
        .filter(F.col("both_cnt") >= 3)
    )
    ia = item.select(
        F.col("event_type").alias("ante"), F.col("cnt").alias("cnt_a")
    )
    ic = item.select(
        F.col("event_type").alias("cons"), F.col("cnt").alias("cnt_c")
    )
    out = (
        pair.join(F.broadcast(ia), "ante")
        .join(F.broadcast(ic), "cons")
        .select(
            "ante",
            "cons",
            F.col("both_cnt").cast("long").alias("support_cnt"),
            (
                F.floor(
                    F.col("both_cnt") * 1000000.0 / F.col("cnt_a")
                    + F.lit(0.5)
                ) / 1000000.0
            ).alias("confidence_6"),
            (
                F.floor(
                    F.col("both_cnt") * F.lit(n_users) * 1000000.0
                    / (F.col("cnt_a") * F.col("cnt_c"))
                    + F.lit(0.5)
                ) / 1000000.0
            ).alias("lift_6"),
        )
    )
    return out.orderBy("ante", "cons")
