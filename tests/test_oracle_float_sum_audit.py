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
# margin is SCALE-FREE (SF-invariant), not merely measured-safe at
# some SF. The gate exists so the NEXT float sum is an explicit
# decision, not a default.
#
# NOTE (round 10): the former _TPCH_MONEY group (22 queries summing
# TPC-H money columns as raw doubles) is GONE — q118 flipped a cent
# at sf3 in the round-10 full sweep (partial-sum order is
# nondeterministic run to run in BOTH engines, so the round-9
# "measured green at sf3" justification was a lottery ticket, not a
# bound). All 22 now sum exact integer units (queries.money_sum /
# money_sum_2dec) or DECIMAL and auto-pass the exactness rules.
#
# NOTE (round 11): the _EVENT_VALUE and _CENTS_SCALED groups (21
# queries, sf3-measured magnitudes — margins that shrank linearly
# with SF) are ALSO gone: events.value sits on a cent lattice, so
# every one now sums exact integer cents (money_sum / per-term
# BIGINT casts) and auto-passes. q343 quantizes its 1/k credit
# shares to integer 1e-6 units (the q412 micro-weight device);
# q382 decomposes 1/dist over the 4 truncated hop distances into
# exact integer counts combined in one fixed-order expression.
# Every remaining entry below has an SF-INVARIANT reason: the sum
# frame is a fixed dimensionality/calendar/cell set, or the output
# is self-normalizing with value-bounded terms.
_FIXED_DIM = (
    "the sum frame is the FIXED embedding dimensionality (64 "
    "components / per-dim variances / per-dim squared deviations), "
    "not a data-scaled row set — term count AND magnitudes are "
    "SF-invariant, so the round-k margin is scale-free by "
    "construction"
)
_FIXED_FRAME = (
    "fixed small frame: term count is pinned by the fixture's "
    "structure (per-query token count / the 31-day calendar of "
    "daily means / the 9 Benford digit cells), independent of SF; "
    "with n terms error is <= n*2^-52 of the running magnitude. "
    "q335 goes further: its flagged sums are PIVOTED single-cell "
    "sums (at most one non-zero addend each — exact), combined in "
    "one fixed-order 9-term expression — bit-identical across "
    "engines at ANY statistic magnitude (the q382 device applied "
    "to chi-square cells)"
)
_SELF_NORMALIZED = (
    "output is self-normalizing with value-bounded terms: ECE "
    "divides a fixed-bin-count sum by the total n, so the error "
    "RATIO stays at ulp level as n grows. Error grows only as "
    "n_terms*2^-52 against an O(1) output — round-6 safe to "
    "~1e9-term frames, far past the declared envelope. (q340 JSD "
    "and q371 AP left this group in round 12: both now sum integer "
    "micro-units via floor(x*scale + 0.5) — identical IEEE "
    "expressions in both engines, order-independent BIGINT sums — "
    "and auto-pass the exactness rule.)"
)

ALLOWLIST: dict[str, str] = {
    # fixed 64-dim frames
    "q288_pca_embeddings": _FIXED_DIM,
    "q311_jl_random_projection": _FIXED_DIM,
    "q312_srp_hamming_pairs": _FIXED_DIM,
    "q364_silhouette_centroid": _FIXED_DIM,
    # fixture-pinned small frames
    "q294_maxsim_late_interaction": _FIXED_FRAME,
    "q332_cusum_changepoint": _FIXED_FRAME,
    "q335_benford_digit_test": _FIXED_FRAME,
    # self-normalizing bounded output
    "q349_calibration_ece": _SELF_NORMALIZED,
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
