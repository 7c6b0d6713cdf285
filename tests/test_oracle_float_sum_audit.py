"""Registry-wide float-sum audit — makes the q163 lesson mechanical.

The hazard class (found by the round-9 sf1 campaign): an oracle (and
its Spark twin) computing ``round(sum(<float expr>), k)`` over an
SF-scaled table. Double addition is not associative, so the two
engines' partial-sum orders accumulate different last bits; once the
sum's magnitude is large enough (~1.6e8 over millions of rows at
sf1 for q163), the divergence crosses the round-k boundary and the
driver hash splits. The fix discipline: sum EXACT INTEGER UNITS
(1e-4 units for money — associative-exact, order-independent) and
divide ONCE at the end, or prove the magnitude bounded.

This gate scans every registered oracle for ``round(sum(arg), k)``
sites and requires each to be one of:

1. **exact by construction** — the summand is integer/decimal typed
   (``CAST(... AS BIGINT/INT/DECIMAL)``) or an exact-units column by
   the naming convention (``*_e2``/``*_e4``/``*_cents``/``*_units``),
   so partial-sum order cannot matter; or
2. **explicitly justified** — the query name carries a
   bounded-magnitude justification in ALLOWLIST below. Every current
   entry ran green at sf3 (30x bench data) in the round-9
   float-margin audit (NOTES.md "Float-sum margin measurement");
   margins shrink linearly with SF, which is exactly why NEW money
   aggregates must use exact integer units from day one.

A new ``round(sum(<float>))`` oracle not covered by either rule
fails this test with instructions. Self-checks pin the pre-fix q163
shape (must flag) and the fixed exact-units shape (must pass).
"""

from __future__ import annotations

import re

from distcpplus_spark.queries import load_all_queries

_SITE = re.compile(r"round\s*\(\s*sum\s*\(", re.IGNORECASE)

# summand is exact by type: integer/decimal cast anywhere in the
# expression tree makes the per-term contribution exact (DECIMAL and
# BIGINT sums are associative in both engines)
_EXACT_CAST = re.compile(r"AS\s+(BIGINT|INTEGER|INT\b|DECIMAL)", re.IGNORECASE)
# ... or exact by the repo's exact-units column naming convention
# (q163's amount_e4: integer 1e-4 currency units summed as BIGINT in
# a prior CTE)
_EXACT_NAME = re.compile(r"^[\w.]*(_e\d|_cents|_units)$")

# Justified float sums. Keys are query names; values say WHY the
# magnitude is bounded. The gate exists so the NEXT float sum is an
# explicit decision, not a default.
#
# NOTE (round 10): the former _TPCH_MONEY group (22 queries summing
# TPC-H money columns as raw doubles) is GONE — q118 flipped a cent
# at sf3 in the round-10 full sweep (partial-sum order is
# nondeterministic run to run in BOTH engines, so the round-9
# "measured green at sf3" justification was a lottery ticket, not a
# bound). All 22 now sum exact integer units (queries.money_sum /
# money_sum_2dec) or DECIMAL and auto-pass the exactness rules.
_EVENT_VALUE = (
    "events.value sum within per-key/window groups — group sums are "
    "MEASURED at sf3: max per-user 1.7e3, max per-hour 2.3e5 "
    "(double spacing ~3e-11 vs the 5e-3 cent boundary: flip "
    "probability ~1e-8/group). Coarser shapes in this group are "
    "ratios (self-normalizing), integer-valued products, or "
    "ORDER-DEFINED running windows (sequential, same order both "
    "engines). Global unbounded sums of value (1.5e8 at sf3) would "
    "NOT qualify — use money_sum-style quantization for those."
)
_CENTS_SCALED = (
    "summand is value*100 on a cents-quantized column: every addend "
    "is an integer-valued double, so addition is EXACT until 2^53 "
    "(~9e15); sf3 totals ~1e9 leave >6 orders of headroom"
)
_BOUNDED_TERM = (
    "per-row terms are O(1) (probabilities, shares, reciprocal "
    "distances, unit-norm components): totals grow only linearly in "
    "rows with tiny magnitude; sf3-measured"
)

ALLOWLIST: dict[str, str] = {
    # events.value sums under windows/sessions/keys
    "q133_streaming_batch_parity": _EVENT_VALUE,
    "q231_hidden_partitioning": _EVENT_VALUE,
    "q305_stream_dedup_within_watermark": _EVENT_VALUE,
    "q317_stream_session_windows": _EVENT_VALUE,
    "q33_tumbling_window": _EVENT_VALUE,
    "q34_sliding_window": _EVENT_VALUE,
    "q350_stream_static_enrichment": _EVENT_VALUE,
    "q35_session_window": _EVENT_VALUE,
    "q352_theil_sen_slope": _EVENT_VALUE,
    "q359_rfm_segmentation": _EVENT_VALUE,
    "q368_cuped_adjustment": _EVENT_VALUE,
    "q78_time_spine_gapfill": _EVENT_VALUE,
    "q93_gap_sessionization": _EVENT_VALUE,
    "q332_cusum_changepoint": _EVENT_VALUE,
    "q336_poisson_bootstrap": _EVENT_VALUE,
    "q383_point_in_time_features": _EVENT_VALUE,
    # cents-scaled integer-valued doubles (exact below 2^53)
    "q320_timeseries_gapfill": _CENTS_SCALED,
    "q389_txlog_occ_table": _CENTS_SCALED,
    "q394_ivm_join_delta": _CENTS_SCALED,
    "q395_hampel_filter": _CENTS_SCALED,
    "q402_topn_with_other": _CENTS_SCALED,
    # O(1)-magnitude per-row terms
    "q288_pca_embeddings": _BOUNDED_TERM,
    "q294_maxsim_late_interaction": _BOUNDED_TERM,
    "q311_jl_random_projection": _BOUNDED_TERM,
    "q312_srp_hamming_pairs": _BOUNDED_TERM,
    "q335_benford_digit_test": _BOUNDED_TERM,
    "q340_jsd_language_drift": _BOUNDED_TERM,
    "q343_linear_attribution": _BOUNDED_TERM,
    "q349_calibration_ece": _BOUNDED_TERM,
    "q364_silhouette_centroid": _BOUNDED_TERM,
    "q371_average_precision": _BOUNDED_TERM,
    "q382_harmonic_centrality": _BOUNDED_TERM,
}


def _sum_args(sql: str) -> list[str]:
    """The argument text of every round(sum(...)) site in sql."""
    out = []
    for m in _SITE.finditer(sql):
        depth = 1
        j = m.end()
        while j < len(sql) and depth:
            if sql[j] == "(":
                depth += 1
            elif sql[j] == ")":
                depth -= 1
            j += 1
        out.append(" ".join(sql[m.end() : j - 1].split()))
    return out


_EXACT_CASE = re.compile(
    r"^CASE WHEN .+ THEN [\w.]*(_e\d|_cents|_units)\s+ELSE 0 END$",
    re.IGNORECASE,
)


def _is_exact(arg: str) -> bool:
    arg = arg.strip()
    return bool(
        _EXACT_CAST.search(arg)
        or _EXACT_NAME.fullmatch(arg)
        # conditional sum over an exact-units column (q162's shape)
        or _EXACT_CASE.fullmatch(arg)
    )


def float_sum_offenders(oracles: dict[str, str]) -> list[tuple[str, str]]:
    """(qname, summand) for every rounded float sum that is neither
    exact-by-construction nor justified in ALLOWLIST."""
    offenders = []
    for qname, sql in sorted(oracles.items()):
        for arg in _sum_args(sql):
            if _is_exact(arg):
                continue
            if qname in ALLOWLIST:
                continue
            offenders.append((qname, arg[:80]))
    return offenders


def test_no_unjustified_rounded_float_sums():
    _queries, oracles = load_all_queries()
    offenders = float_sum_offenders(oracles)
    assert not offenders, (
        "round(sum(<float expr>)) over an SF-scaled table diverges "
        "across engines once the sum magnitude crosses the round-k "
        "boundary (the q163 sf1 failure). Either sum EXACT INTEGER "
        "UNITS (CAST per-term to BIGINT, e.g. amount_e4 = 1e-4 "
        "currency units; divide once at the end) or add a "
        "bounded-magnitude justification to ALLOWLIST in this file: "
        f"{offenders}"
    )


def test_allowlist_entries_are_live():
    """Stale allowlist entries hide future regressions: every entry
    must still correspond to at least one non-exact float-sum site."""
    _queries, oracles = load_all_queries()
    live = set()
    for qname, sql in oracles.items():
        for arg in _sum_args(sql):
            if not _is_exact(arg):
                live.add(qname)
    stale = sorted(set(ALLOWLIST) - live)
    assert not stale, f"ALLOWLIST entries with no float-sum site left: {stale}"


def test_audit_detects_the_prefix_q163_shape():
    """The detector must flag the exact SQL shape that failed at sf1
    (pre-fix q163: raw double product summed then rounded) and must
    pass the fixed exact-units shape (git 86ed268)."""
    prefix = """
    SELECT n_name, year, round(sum(l_extendedprice * (1 - l_discount)
      - ps_supplycost * l_quantity), 2) AS sum_profit
    FROM lineitem GROUP BY n_name, year
    """
    assert float_sum_offenders({"synthetic_prefix_q163": prefix}) == [
        (
            "synthetic_prefix_q163",
            "l_extendedprice * (1 - l_discount) - ps_supplycost * l_quantity",
        )
    ]
    fixed = """
    WITH t AS (
      SELECT n_name, year,
             CAST(round(l_extendedprice * 10000) AS BIGINT) AS amount_e4
      FROM lineitem
    )
    SELECT n_name, year, round(sum(amount_e4) / 10000.0, 2) AS sum_profit
    FROM t GROUP BY n_name, year
    """
    assert float_sum_offenders({"synthetic_fixed_q163": fixed}) == []
    # per-term BIGINT cast inside the sum is equally exact
    cast_inline = """
    SELECT round(sum(CAST(round(v * 100) AS BIGINT)) / 100.0, 2) AS s
    FROM t
    """
    assert float_sum_offenders({"synthetic_cast": cast_inline}) == []
