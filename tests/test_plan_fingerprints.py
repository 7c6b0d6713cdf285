"""Plan-fingerprint regression gate for the 15 headline queries.

Bench walls vary ±40% with host co-tenancy (BASELINE.md round-3
calibration), so a slow round can't be told from a plan regression by
timing alone. This pins what timing can't: each headline query's
physical-plan SHAPE — join-type counts, shuffle count, pushed-filter
scans, window-group-limits, Python stages — via the same extractor
that writes PLANS.md (tools/dump_plans.py::plan_features). A real
plan regression (a lost broadcast, an extra exchange, a filter that
stopped pushing, a window that lost its group-limit) fails HERE,
deterministically, instead of being argued from noisy walls.

When a plan changes INTENTIONALLY, update the fingerprint in the same
commit as the change — the diff then documents the new shape.

Fingerprints were recorded at sf0.001 with the test session
(shuffle_partitions=8); counts are initial-plan node counts (pre-AQE),
which do not depend on data volume at fixture scales.
"""

from __future__ import annotations

import pytest

from distcpplus_spark.queries import load_all_queries
from tools.dump_plans import plan_features

SF = "/root/testdata/sf0.001"

# fmt: off
FINGERPRINTS = {
    "q01_scan_count": {"hash_aggregates": 2},
    "q05_join_inner_q3": {"broadcast_joins": 2, "shuffles": 1,
                          "hash_aggregates": 2, "pushed_filter_scans": 3,
                          "top_k": 1},
    "q06_join_multiway_q5": {"broadcast_joins": 5, "shuffles": 1,
                             "hash_aggregates": 2,
                             "pushed_filter_scans": 6},
    # round 14 (optimization): self-join + groupBy -> range-frame
    # window over one user_id exchange (join's 2 shuffled sides + agg
    # exchange removed; the remaining range exchange is the final sort)
    "q11_range_join": {"shuffles": 1, "range_exchanges": 1},
    "q12_agg_q1": {"shuffles": 1, "hash_aggregates": 2,
                   "pushed_filter_scans": 1},
    # round 14 (optimization): distinct-pair passes -> bit_or flag
    # masks per key (5 shuffles -> 3; the two distinct scans no longer
    # carry the IsNotNull(l_returnflag) pushdown because they scan keys)
    "q13_agg_distinct_stats": {"broadcast_joins": 2, "shuffles": 3,
                               "hash_aggregates": 10,
                               "pushed_filter_scans": 1},
    "q18_window_topk_per_group": {"broadcast_joins": 1, "shuffles": 1,
                                  "range_exchanges": 1,
                                  "pushed_filter_scans": 2,
                                  "window_group_limits": 2},
    "q22_topk_global": {"top_k": 1},
    # round 14 (optimization): F.window().start -> arithmetic epoch
    # bucket (TimeWindow's implicit isnotnull(ts) pushdown disappears;
    # fixtures have no NULL ts, and the arithmetic NULL-group behavior
    # matches the DuckDB oracle's time_bucket(NULL) exactly)
    "q33_tumbling_window": {"shuffles": 1, "hash_aggregates": 2},
    # round 14 (optimization): range-partition the dedup hash FIRST —
    # RangePartitioning satisfies the agg's clustering, so the old
    # hash exchange + range exchange collapsed into one range exchange
    "q50_exact_dedup_groups": {"range_exchanges": 1,
                               "hash_aggregates": 2},
    "q59_minhash_candidates": {"broadcast_joins": 1, "shuffles": 1,
                               "range_exchanges": 1,
                               "hash_aggregates": 2},
    # round 13: inline BNLJ + fold scorer -> shared brute_force_topk
    # Arrow kernel (queries ride the closure; corpus crosses Arrow once)
    "q61_cosine_topk": {"shuffles": 1, "window_group_limits": 2,
                        "python_stages": 1},
    # round 14: q74 (grouped-map UDAF demo: shuffles 1, python_stages 1)
    # left the headline for the demo tier; its scale twin q421 is pure
    # partial-aggregated built-ins — ONE shuffle, ZERO Python stages
    "q421_ols_moments_scale_path": {"shuffles": 1, "hash_aggregates": 2},
    # round 14 (optimization): defer_assignment fuses the IVF
    # assignment argmax into the scoring kernel — 2 chained
    # MapInPandas stages became 1 (corpus crosses Arrow once)
    "q75_ivf_exhaustive_topk": {"shuffles": 1, "window_group_limits": 2,
                                "python_stages": 1},
    "q79_training_data_pipeline": {"shuffles": 2, "hash_aggregates": 2,
                                   "pushed_filter_scans": 1,
                                   "window_group_limits": 2},
}
# fmt: on


@pytest.fixture(scope="module")
def registry():
    queries, _ = load_all_queries()
    return queries


def test_fingerprint_set_matches_headline_set():
    from bench import HEADLINE

    assert sorted(FINGERPRINTS) == sorted(HEADLINE), (
        "bench.py HEADLINE changed — record fingerprints for the new set"
    )


@pytest.mark.parametrize("name", sorted(FINGERPRINTS))
def test_headline_plan_fingerprint(spark, registry, name):
    df = registry[name](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    got = plan_features(plan)
    want = dict.fromkeys(got, 0) | FINGERPRINTS[name]
    assert got == want, (
        f"{name} physical-plan shape drifted.\n"
        f"  expected: { {k: v for k, v in want.items() if v} }\n"
        f"  got:      { {k: v for k, v in got.items() if v} }\n"
        "If the change is intentional, update FINGERPRINTS in this file "
        "in the same commit."
    )
