"""Time a named set of registered queries: warm at sf0.001, then
median of N timed collect() runs each at <sf_dir>.

Usage: python tools/time_set.py <sf_dir> q1,q2,... [reps]

Same-session medians — use for before/after records on a focused set
(bench.py stays the headline harness; probe_r15.py the A/B decider).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from distcpplus_spark.queries import load_all_queries
from distcpplus_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2].split(",")
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    queries, _ = load_all_queries()
    spark = get_spark("time_set")
    warm = "/root/testdata/sf0.001"
    out: dict[str, float] = {}
    for name in names:
        if os.path.isdir(warm):
            queries[name](spark, warm).collect()
        samples = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(name)
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).collect()
            samples.append(time.perf_counter() - t0)
        out[name] = round(sorted(samples)[len(samples) // 2], 3)
        print(f"{name}: {out[name]}s  all={[round(t, 3) for t in samples]}",
              flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
