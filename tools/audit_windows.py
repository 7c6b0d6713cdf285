"""Registry-wide global-window audit: build every registered query's
DataFrame at a small SF, render its executed plan, and report every
Window node that has NO partition spec (the single-task funnel shape).

A partitioned Window prints three top-level bracket groups
'[exprs], [partition], [order]'; a partition-less one prints two.
The last two groups of a partitioned node never contain brackets,
so an end-anchored match distinguishes the shapes robustly.

Usage: python tools/audit_windows.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import os
import re
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from distcpplus_spark.queries import load_all_queries
from distcpplus_spark.session import get_spark

_WINDOW_RE = re.compile(r"\b(Window|WindowInPandas) \[")
_PARTITIONED_TAIL = re.compile(r"\], \[[^\[\]]*\], \[[^\[\]]*\]\s*$")
_LAST_GROUP = re.compile(r"\], \[([^\[\]]*)\]\s*$")
_ORDER_TOKEN = re.compile(r"\b(ASC|DESC) NULLS")


def global_window_lines(plan: str) -> list[str]:
    """Window-node lines with NO partition spec.

    Shapes (node toString): partitioned+ordered prints THREE groups
    '[exprs], [part], [order]'; partitioned-unordered prints TWO
    '[exprs], [part]'; global-ordered prints TWO '[exprs], [order]';
    global-unordered prints ONE '[exprs]'. The two-group shapes are
    told apart by the last group's content: a sort order always
    renders 'expr ASC|DESC NULLS ...', a partition spec never does.
    """
    out = []
    for line in plan.splitlines():
        if not _WINDOW_RE.search(line):
            continue
        if _PARTITIONED_TAIL.search(line):
            continue
        m = _LAST_GROUP.search(line)
        if m is None or _ORDER_TOKEN.search(m.group(1)):
            out.append(line.strip())
    return out


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])
    queries, _ = load_all_queries()
    spark = get_spark()
    hits: dict[str, list[str]] = {}
    errors: dict[str, str] = {}
    t0 = time.time()
    for name, fn in sorted(queries.items()):
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            g = global_window_lines(plan)
            if g:
                hits[name] = g
                print(f"GLOBAL {name}: {len(g)} window(s)", flush=True)
                for line in g:
                    print(f"    {line[:200]}", flush=True)
        except Exception:
            errors[name] = traceback.format_exc(limit=3)
            print(f"ERROR {name}", flush=True)
    print(f"\n=== {len(hits)} queries with global windows, "
          f"{len(errors)} errors, {time.time()-t0:.0f}s ===")
    for name in sorted(hits):
        print(f"  {name}")
    for name, tb in errors.items():
        print(f"--- {name} ---\n{tb}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
