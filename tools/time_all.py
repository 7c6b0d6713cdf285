"""Time every registered query once at a given SF (round-14 triage).

Usage: python tools/time_all.py <sf_dir> [out.json] [--no-warm] [--resume]

Optionally one warm pass at sf0.001 (codegen/JIT), then one timed
collect() per query at <sf_dir>. Streams one "name seconds" line per
query (so a killed run is still useful), checkpoints the JSON every 10
queries, and --resume skips queries already present in out.json.
Prints the slowest 40 at the end. This is a TRIAGE tool (one sample
per query, shared session), not the bench — use bench.py /
probe_r14.py for decisions.
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
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    sf_dir = args[0]
    out_path = args[1] if len(args) > 1 else "/tmp/time_all.json"
    queries, _ = load_all_queries()
    spark = get_spark("time_all")
    warm_dir = None if "--no-warm" in flags else "/root/testdata/sf0.001"
    times: dict[str, float] = {}
    errors: dict[str, str] = {}
    if "--resume" in flags and os.path.exists(out_path):
        with open(out_path) as f:
            prev = json.load(f)
        if prev.get("sf_dir") == sf_dir:
            times, errors = prev.get("times", {}), prev.get("errors", {})
            print(f"resuming: {len(times)} timed, {len(errors)} errors")

    def checkpoint() -> None:
        with open(out_path, "w") as f:
            json.dump(
                {"sf_dir": sf_dir, "times": times, "errors": errors}, f, indent=1
            )

    pending = [n for n in sorted(queries) if n not in times and n not in errors]
    for i, name in enumerate(pending):
        try:
            if warm_dir and os.path.isdir(warm_dir):
                queries[name](spark, warm_dir).collect()
            spark.sparkContext.setJobDescription(f"time_all:{name}")
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).collect()
            times[name] = round(time.perf_counter() - t0, 3)
            print(f"TIMED {name} {times[name]}", flush=True)
        except Exception as e:  # noqa: BLE001
            errors[name] = f"{type(e).__name__}: {e}"[:200]
            print(f"ERROR {name} {errors[name][:80]}", flush=True)
        finally:
            spark.sparkContext.setJobDescription(None)
            if i % 10 == 9:
                checkpoint()
    checkpoint()
    for name, t in sorted(times.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{t:8.3f}  {name}")
    print(f"total {sum(times.values()):.1f}s over {len(times)} queries; "
          f"{len(errors)} errors -> {out_path}")


if __name__ == "__main__":
    main()
