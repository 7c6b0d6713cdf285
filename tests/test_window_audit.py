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


def test_registry_has_no_unbounded_global_windows(spark):
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

    queries, _ = load_all_queries()
    failures: list[str] = []
    errors: list[str] = []
    try:
        for name, fn in sorted(queries.items()):
            try:
                df = fn(spark, SF)
                plan = df._jdf.queryExecution().executedPlan().toString()
            except Exception as e:  # noqa: BLE001 — collect, don't abort
                errors.append(f"{name}: {type(e).__name__}: {e}")
                continue
            hits = global_window_lines(plan)
            if not hits:
                continue
            allowed, _why = KNOWN_BOUNDED.get(name, (0, ""))
            if len(hits) > allowed:
                failures.append(
                    f"{name}: {len(hits)} global window(s), "
                    f"{allowed} allowed:\n"
                    + "\n".join(f"    {h[:160]}" for h in hits)
                )
    finally:
        for k, v in snapshot.items():
            if v is not None:
                spark.conf.set(k, v)
    assert not errors, "queries failed to build:\n" + "\n".join(errors)
    assert not failures, (
        "unbounded global Window nodes found (add a distributed "
        "prefix-sum rank via operators.scale.partitioned_running_agg, "
        "or whitelist with a boundedness argument):\n"
        + "\n".join(failures)
    )


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
