"""Registry-wide oracle CTE audit — makes the q373 lesson mechanical.

The hazard class: an oracle whose CTE is REFERENCED MANY TIMES
downstream (unrolled fixpoint rounds reference the previous round
once directly + once per endpoint filter). If the SQL engine inlines
CTEs, the referenced subtree re-expands MULTIPLICATIVELY per round —
q373's 6 peel rounds at 3 references each re-ran the base self-join
3^6 = 729 times and spilled 70+ GB at sf1 before dying. `AS
MATERIALIZED` caps it at one evaluation.

This gate parses every registered oracle, builds the CTE reference
graph, and computes the worst-case INLINE EXPANSION COUNT of each
CTE (product of reference counts along downstream chains). Any CTE
whose expansion exceeds the threshold must be declared MATERIALIZED.
The threshold tolerates the benign diamond shapes (a CTE referenced
2-3 times with no chaining) while catching every exponential unroll.
"""

from __future__ import annotations

import re

from distcpplus_spark.queries import load_all_queries

# worst-case re-evaluations of a single CTE before we demand
# MATERIALIZED. The band below (up to ~64: q237's GD weight chain,
# q274's hourly MAD, q321's 4-round BFS) is audited-acceptable —
# every member ran green at sf1 on a bounded base and re-evaluates a
# one-row or bounded-fixture CTE; the gate exists to catch the
# EXPONENTIAL unroll shapes (pre-fix q373 = 729, pre-fix q238 = 253)
# whose cost grows multiplicatively with rounds.
MAX_EXPANSION = 100

_CTE_DEF = re.compile(
    r"(\w+)\s+AS\s+(MATERIALIZED\s+)?\(", re.IGNORECASE
)


def _cte_expansions(sql: str) -> dict[str, tuple[int, bool]]:
    """{cte: (worst-case evaluation count, materialized?)} under a
    pure-inlining planner. Evaluations of X = sum over each reference
    of X in CTE Y (or the final select) of evaluations of Y;
    materialized CTEs count once and stop propagation."""
    # find definitions in order with their body spans
    defs = []  # (name, materialized, body_start)
    for m in _CTE_DEF.finditer(sql):
        defs.append((m.group(1), bool(m.group(2)), m.end()))
    if not defs:
        return {}

    def body_of(i: int) -> str:
        start = defs[i][2] - 1  # the '('
        depth = 0
        for j in range(start, len(sql)):
            if sql[j] == "(":
                depth += 1
            elif sql[j] == ")":
                depth -= 1
                if depth == 0:
                    return sql[start + 1 : j]
        return sql[start + 1 :]

    names = [d[0] for d in defs]
    bodies = {d[0]: body_of(i) for i, d in enumerate(defs)}
    last_end = None
    # final select = text after the last CTE's closing paren
    i_last = len(defs) - 1
    start = defs[i_last][2] - 1
    depth = 0
    for j in range(start, len(sql)):
        if sql[j] == "(":
            depth += 1
        elif sql[j] == ")":
            depth -= 1
            if depth == 0:
                last_end = j + 1
                break
    final = sql[last_end:] if last_end else ""

    mat = {d[0]: d[1] for d in defs}

    def refs(text: str, name: str) -> int:
        return len(re.findall(rf"\b{re.escape(name)}\b", text))

    # evaluations, computed in REVERSE topological order: a WITH
    # chain's later CTEs reference earlier ones, so each consumer's
    # own evaluation count must be known before its producers'
    evals: dict[str, int] = {}
    for i in range(len(names) - 1, -1, -1):
        name = names[i]
        total = refs(final, name)
        for later in names[i + 1 :]:
            r = refs(bodies[later], name)
            if r:
                # references from a materialized consumer count once
                src = 1 if mat[later] else max(evals.get(later, 1), 1)
                total += r * src
        evals[name] = max(total, 1)
    return {n: (evals[n], mat[n]) for n in names}


def test_no_exponential_cte_inlining():
    _queries, oracles = load_all_queries()
    offenders = []
    for qname, sql in sorted(oracles.items()):
        if "WITH" not in sql.upper():
            continue
        for cte, (n_eval, is_mat) in _cte_expansions(sql).items():
            if n_eval > MAX_EXPANSION and not is_mat:
                offenders.append((qname, cte, n_eval))
    assert not offenders, (
        "oracle CTEs with worst-case inline expansion > "
        f"{MAX_EXPANSION} must be AS MATERIALIZED (the q373 lesson): "
        f"{offenders}"
    )


def test_audit_detects_the_q373_shape():
    """The audit must actually catch the pre-fix q373 pattern."""
    sql = """
    WITH e0 AS (SELECT a, b FROM t),
    n0 AS (SELECT a FROM e0 GROUP BY a HAVING count(*) >= 3),
    e1 AS (SELECT e.a, e.b FROM e0 e JOIN n0 s ON e.a = s.a
           JOIN n0 d ON e.b = d.a),
    n1 AS (SELECT a FROM e1 GROUP BY a HAVING count(*) >= 3),
    e2 AS (SELECT e.a, e.b FROM e1 e JOIN n1 s ON e.a = s.a
           JOIN n1 d ON e.b = d.a),
    n2 AS (SELECT a FROM e2 GROUP BY a HAVING count(*) >= 3),
    e3 AS (SELECT e.a, e.b FROM e2 e JOIN n2 s ON e.a = s.a
           JOIN n2 d ON e.b = d.a),
    n3 AS (SELECT a FROM e3 GROUP BY a HAVING count(*) >= 3),
    e4 AS (SELECT e.a, e.b FROM e3 e JOIN n3 s ON e.a = s.a
           JOIN n3 d ON e.b = d.a),
    n4 AS (SELECT a FROM e4 GROUP BY a HAVING count(*) >= 3),
    e5 AS (SELECT e.a, e.b FROM e4 e JOIN n4 s ON e.a = s.a
           JOIN n4 d ON e.b = d.a),
    n5 AS (SELECT a FROM e5 GROUP BY a HAVING count(*) >= 3),
    e6 AS (SELECT e.a, e.b FROM e5 e JOIN n5 s ON e.a = s.a
           JOIN n5 d ON e.b = d.a)
    SELECT a, count(*) FROM e6 GROUP BY a
    """
    ex = _cte_expansions(sql)
    assert ex["e0"][0] > MAX_EXPANSION  # 3^6 = 729 evaluations
    # and the fixed shape passes
    fixed = sql.replace(" AS (", " AS MATERIALIZED (")
    ex2 = _cte_expansions(fixed)
    assert all(
        n_eval <= MAX_EXPANSION or is_mat
        for n_eval, is_mat in ex2.values()
    )
