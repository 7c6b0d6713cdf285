"""Dump .explain("formatted") for headline queries into plans/r15/.

Usage: python tools/dump_r15_plans.py before|after [sf_dir] [only...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from distcpplus_spark.queries import load_all_queries  # noqa: E402
from distcpplus_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    only = sys.argv[3:] or HEADLINE
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r15",
    )
    os.makedirs(out_dir, exist_ok=True)
    queries, _ = load_all_queries()
    spark = get_spark("dump_r15_plans", shuffle_partitions=8)
    for name in only:
        df = queries[name](spark, sf_dir)
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")


if __name__ == "__main__":
    main()
