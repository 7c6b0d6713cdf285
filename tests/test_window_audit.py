"""Registry-wide global-window regression gate.

Every registered query's executed plan is scanned for Window nodes
with no partition spec — the shape that funnels the full input
through ONE task at cluster scale (the q197/q161/q291 defect class).
A new query that sneaks in an unbounded global window fails here,
turning a per-round review item into a standing gate.

Known-bounded global windows are whitelisted EXPLICITLY, each with
the reason its frame cannot grow with data scale.
"""

from __future__ import annotations

from tools.audit_windows import global_window_lines

SF = "/root/testdata/sf0.001"

# name -> (max allowed global windows, why the frame is bounded)
# EMPTY since round 12: every global rank in the registry — including
# the two formerly-whitelisted post-limit bounded ones (q111, q325) —
# runs through operators.scale.distributed_ranks' two-phase prefix
# sums. The audit is now absolute: ANY partition-less Window in any
# registered query's plan fails, no boundedness judgment call exists.
# (History: q21/q75/q83 de-whitelisted round 11; q111/q325 round 12.)
KNOWN_BOUNDED: dict[str, tuple[int, str]] = {}


# Confs other tests legitimately toggle (with restore guards) but
# whose LEAKED values would change plans under audit; the audit runs
# against Spark defaults for these, then restores whatever was set.
_PLAN_CONFS = [
    "spark.sql.autoBroadcastJoinThreshold",
    "spark.sql.adaptive.enabled",
    "spark.sql.optimizer.runtime.bloomFilter.enabled",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
    "spark.sql.optimizer.dynamicPartitionPruning.useStats",
    "spark.sql.files.maxPartitionBytes",
    "spark.sql.execution.arrow.maxRecordsPerBatch",
]


# One registry walk serves BOTH audits (each builds all 442 plans,
# ~8 min — doing it twice would double the suite's dominant cost):
# filled on first access by _walk_registry, keyed by query name.
_AUDIT_CACHE: dict[str, dict] = {}


def _walk_registry(spark) -> dict[str, dict]:
    if _AUDIT_CACHE:
        return _AUDIT_CACHE
    from pyspark.sql import SparkSession

    from distcpplus_spark.queries import load_all_queries

    snapshot = {}
    for k in _PLAN_CONFS:
        try:
            snapshot[k] = spark.conf.get(k)
        except Exception:  # noqa: BLE001 — unset / internal conf
            snapshot[k] = None
        try:
            spark.conf.unset(k)
        except Exception:  # noqa: BLE001
            pass

    # spy on createDataFrame(list): the round-14 pathology is a
    # multi-slice Python-evaluated local relation that a downstream
    # coalesce(1) then evaluates SERIALLY — local_rows (1-slice
    # parallelize) is the sanctioned path, and it does NOT pass a
    # bare list here, so list calls are exactly the suspect sites
    list_calls: list[int] = []
    orig_cdf = SparkSession.createDataFrame

    def spy(self, data, *a, **kw):
        if isinstance(data, list):
            list_calls.append(len(data))
        return orig_cdf(self, data, *a, **kw)

    queries, _ = load_all_queries()
    errors: list[str] = []
    SparkSession.createDataFrame = spy
    try:
        for name, fn in sorted(queries.items()):
            n0 = len(list_calls)
            try:
                df = fn(spark, SF)
                plan = df._jdf.queryExecution().executedPlan().toString()
            except Exception as e:  # noqa: BLE001 — collect, don't abort
                errors.append(f"{name}: {type(e).__name__}: {e}")
                continue
            _AUDIT_CACHE[name] = {
                "plan": plan,
                "n_list_cdf": len(list_calls) - n0,
            }
    finally:
        SparkSession.createDataFrame = orig_cdf
        for k, v in snapshot.items():
            if v is not None:
                spark.conf.set(k, v)
    assert not errors, "queries failed to build:\n" + "\n".join(errors)
    return _AUDIT_CACHE


def test_registry_has_no_unbounded_global_windows(spark):
    failures: list[str] = []
    for name, info in _walk_registry(spark).items():
        hits = global_window_lines(info["plan"])
        if not hits:
            continue
        allowed, _why = KNOWN_BOUNDED.get(name, (0, ""))
        if len(hits) > allowed:
            failures.append(
                f"{name}: {len(hits)} global window(s), "
                f"{allowed} allowed:\n"
                + "\n".join(f"    {h[:160]}" for h in hits)
            )
    assert not failures, (
        "unbounded global Window nodes found (add a distributed "
        "prefix-sum rank via operators.scale.partitioned_running_agg, "
        "or whitelist with a boundedness argument):\n"
        + "\n".join(failures)
    )


# name -> why a createDataFrame(list) in this query is NOT under a
# coalesce(1) (parallel-evaluated, or the Coalesce belongs to another
# subtree). Empty = the r14 conversion covered every serial site.
LOCAL_RELATION_ALLOWED: dict[str, str] = {}


def test_registry_local_relations_not_serialized_under_coalesce(spark):
    """The round-14 'coalesce(1) over a 32-slice local relation' lint
    (round-14 VERDICT item 5 → round-15): a query that builds a local
    relation from a bare Python list (defaultParallelism slices, one
    Python-worker round trip EACH) and whose plan also coalesces to
    one partition would evaluate every slice serially in that one
    task (~5-7 s measured). queries.local_rows is the sanctioned
    1-slice path; any new offender must convert or be whitelisted
    with a parallel-evaluation argument."""
    failures = []
    for name, info in _walk_registry(spark).items():
        if name in LOCAL_RELATION_ALLOWED:
            continue
        if info["n_list_cdf"] > 0 and "Coalesce 1" in info["plan"]:
            failures.append(
                f"{name}: {info['n_list_cdf']} createDataFrame(list) "
                "call(s) + a Coalesce 1 in the plan — use "
                "queries.local_rows or whitelist with rationale"
            )
    assert not failures, "\n".join(failures)


def test_q291_zipf_rank_is_distributed(spark):
    """q291's vocabulary rank must be the two-phase prefix sum (a
    web-corpus whitespace vocabulary reaches 1e8-1e9 terms)."""
    from distcpplus_spark.queries.llm6 import q291_zipf_slope_fit

    plan = (
        q291_zipf_slope_fit(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert not global_window_lines(plan), plan


def test_q202_auc_rank_is_distributed(spark):
    """q202's Mann-Whitney rank must be the two-phase prefix sum (the
    eval set is corpus-sized)."""
    from distcpplus_spark.queries.llm4 import q202_classifier_eval_metrics

    plan = (
        q202_classifier_eval_metrics(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert not global_window_lines(plan), plan


def test_detector_sees_all_four_window_shapes(spark):
    """The detector itself: global-ordered and global-unordered must
    flag; partitioned ordered/unordered must pass. Pinned on live
    plans so a Spark toString format change breaks THIS test, not
    the audit's silence."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    df = spark.range(100).withColumn("g", F.col("id") % 5)
    cases = [
        (F.row_number().over(W.orderBy("id")), True),
        (F.sum("id").over(W.partitionBy("g")), False),
        (F.row_number().over(W.partitionBy("g").orderBy("id")), False),
    ]
    for expr, should_flag in cases:
        plan = (
            df.withColumn("v", expr)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        hits = global_window_lines(plan)
        assert bool(hits) == should_flag, f"{expr}: {plan}"
