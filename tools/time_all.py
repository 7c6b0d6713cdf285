"""Time every registered query once at a given SF (round-14 triage).

Usage: python tools/time_all.py <sf_dir> [out.json]

One warm pass at sf0.001 (codegen/JIT), then one timed collect() per
query at <sf_dir>. Prints the slowest 40 and writes the full map to
out.json. This is a TRIAGE tool (one sample per query, shared session),
not the bench — use bench.py / probe_r14.py for decisions.
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
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/time_all.json"
    queries, _ = load_all_queries()
    spark = get_spark("time_all")
    warm_dir = "/root/testdata/sf0.001"
    times: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in sorted(queries):
        try:
            if os.path.isdir(warm_dir):
                queries[name](spark, warm_dir).collect()
            spark.sparkContext.setJobDescription(f"time_all:{name}")
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).collect()
            times[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # noqa: BLE001
            errors[name] = f"{type(e).__name__}: {e}"[:200]
        finally:
            spark.sparkContext.setJobDescription(None)
    with open(out_path, "w") as f:
        json.dump({"sf_dir": sf_dir, "times": times, "errors": errors}, f, indent=1)
    for name, t in sorted(times.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{t:8.3f}  {name}")
    print(f"total {sum(times.values()):.1f}s over {len(times)} queries; "
          f"{len(errors)} errors -> {out_path}")


if __name__ == "__main__":
    main()
