"""One-command exit-gate runner (round-11 verdict ask #5).

The round exit gates were previously 8+ manual steps (five full
oracle sweeps, full pytest, double bench, driver simulation, and an
absolute-final re-sweep) — each a chance to silently skip one. This
tool encodes them all and emits ONE JSON verdict, so "absolute-final
state" is the tool's output, not a checklist kept in a human head.

Usage:
    python tools/exit_gates.py                    # everything
    python tools/exit_gates.py --only sweep_sf001 # absolute-final re-sweep
    python tools/exit_gates.py --skip sweep_sf3,pytest
    python tools/exit_gates.py --sf3-slices 3     # sf3 in 3 sequential slices

Stages (each timed, each with its own ok flag):
    registry      load the registry, record query/oracle counts
    pytest        python -m pytest tests/ -q (full suite)
    sweep_sf001   full oracle sweep at /root/testdata/sf0.01
    sweep_sf01    full oracle sweep at /root/testdata/sf0.1
    sweep_vanilla full sweep at sf0.01 with a stock SparkSession
    sweep_sf1     full sweep at fixtures/sf1 (regenerate first:
                  python tools/gen_fixture.py 1 fixtures/sf1)
    sweep_sf3     full sweep at fixtures/sf3, run in --sf3-slices
                  sequential slices with the union-vs-registry
                  completion check (0 missing, 0 extra — the check
                  that caught the round-10 half-sweep)
    sweep_sf10_spot  the 42 scale-sensitive queries at fixtures/sf10
                  (100× bench data; regenerate with
                  python tools/gen_fixture.py 10 fixtures/sf10)
    bench         bench.py TWICE (quiet-host double-bench discipline);
                  GATES on the q01-normalized best-of-two staying
                  within 2× of the BASELINE.md total
    driver_sim    vanilla SparkSession from /tmp cwd importing
                  __spark_entry__ (exact driver conditions)

Verdict JSON (also written to EXITGATES.json at the repo root):
    {"ok": bool, "git_head": sha, "git_dirty": bool,
     "stages": {name: {"ok": bool, "secs": float, ...detail}}}

A sweep stage is ok iff: its tally line reports 0 fail / 0 error,
every oracle-backed query PASSed, every rows-only query ran, and the
set of names seen equals the registry exactly (completion check).
The tool exits 0 iff every non-skipped stage is ok.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PY = sys.executable

SWEEPS = {
    "sweep_sf001": ("/root/testdata/sf0.01", [], 1),
    "sweep_sf01": ("/root/testdata/sf0.1", [], 1),
    "sweep_vanilla": ("/root/testdata/sf0.01", ["--vanilla"], 1),
    "sweep_sf1": (os.path.join(REPO, "fixtures/sf1"), [], 1),
    "sweep_sf3": (os.path.join(REPO, "fixtures/sf3"), [], None),  # sliced
}
STAGES = (
    ["registry", "pytest"]
    + list(SWEEPS)
    + ["sweep_sf10_spot", "bench", "driver_sim"]
)

# The sf10 spot set (round 13): the scale-sensitive queries — dedup,
# ANN, layout/bloom, graph, ranks, streaming state, txlog, and the
# heaviest relational shapes — verified at 100× bench data. A FULL
# sf10 sweep would take ~5 h (mostly DuckDB oracle time); this subset
# is where scale bugs actually surfaced (q410's saturated bloom, the
# q103 fold wall, the q05 broadcast→shuffle transition all came out
# of it). Keep names in registry spelling.
SF10_SPOT = [
    "q13_agg_distinct_stats", "q21_window_rank_ntile",
    "q50_exact_dedup_groups", "q51_exact_dedup_survivors",
    "q58_minhash_signatures", "q59_minhash_candidates",
    "q61_cosine_topk", "q62_embedding_neardup",
    "q75_ivf_exhaustive_topk", "q79_training_data_pipeline",
    "q83_percent_rank_cume_dist", "q103_lsh_neardup_pairs",
    "q108_contamination_check", "q131_dedup_best_representative",
    "q134_recursive_cte_closure", "q180_semantic_dedup",
    "q183_zorder_layout_stats", "q204_c4_line_dedup",
    "q220_bm25_ranking", "q231_hidden_partitioning",
    "q234_connected_components", "q235_pagerank_fixed_iters",
    "q239_kmeans_quantizer", "q240_pq_contract",
    "q248_zonemap_file_skipping", "q252_incremental_lsh_dedup",
    "q258_lsh_multiprobe_recall_bound",
    "q261_substring_contamination_scan", "q279_ann_cell_join_recall",
    "q312_srp_hamming_pairs", "q317_stream_session_windows",
    "q318_pagerank_gated", "q321_multi_source_bfs",
    "q344_rowgroup_pruning", "q373_kcore_decomposition",
    "q389_txlog_occ_table", "q410_bloom_batch_probe",
    "q413_bloom_index_lifecycle", "q416_lsh_topk_gated",
    "q417_ivf_probed_gated", "q420_quality_decile_stats",
    "q421_ols_moments_scale_path", "q422_skewed_shj_guard",
]

_LINE = re.compile(r"^(PASS|FAIL|ERR|----)\s+(\w+)", re.MULTILINE)
_TALLY = re.compile(r"(\d+) pass, (\d+) fail, (\d+) error")


def _run(cmd, cwd=REPO):
    p = subprocess.run(
        cmd, cwd=cwd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True,
    )
    return p.returncode, p.stdout


def registry_counts():
    sys.path.insert(0, REPO)
    from distcpplus_spark.queries import load_all_queries

    queries, oracles = load_all_queries()
    return set(queries), set(oracles)


def stage_registry(ctx):
    q, o = ctx["queries"], ctx["oracles"]
    return {"ok": len(q) > 0 and o <= q, "n_queries": len(q),
            "n_oracles": len(o)}


def stage_pytest(ctx):
    rc, out = _run([PY, "-m", "pytest", "tests/", "-q"])
    tail = out.strip().splitlines()[-1] if out.strip() else ""
    m = re.search(r"(\d+) passed", tail)
    failed = re.search(r"(\d+) failed", tail)
    errs = re.search(r"(\d+) error", tail)
    return {
        "ok": rc == 0 and not failed and not errs,
        "passed": int(m.group(1)) if m else 0,
        "skipped": int((re.search(r"(\d+) skipped", tail) or [0, 0])[1]),
        "tail": tail,
    }


def run_sweep(ctx, sf_dir, extra, slices):
    """One logical sweep = `slices` sequential verify_oracle runs,
    names unioned, completion-checked against the registry."""
    if not os.path.isdir(sf_dir):
        return {"ok": False, "error": f"fixture dir missing: {sf_dir} "
                "(python tools/gen_fixture.py <sf> <dir>)"}
    queries, oracles = ctx["queries"], ctx["oracles"]
    seen, statuses = set(), {}
    n_pass = n_fail = n_err = 0
    fails = []
    for i in range(slices):
        cmd = [PY, "tools/verify_oracle.py", sf_dir, *extra]
        if slices > 1:
            cmd += ["--slice", f"{i}/{slices}"]
        rc, out = _run(cmd)
        for status, name in _LINE.findall(out):
            seen.add(name)
            statuses[name] = status
        m = list(_TALLY.finditer(out))
        if not m:
            return {"ok": False, "error": "no tally line (crashed?)",
                    "tail": out[-2000:]}
        p, f, e = (int(x) for x in m[-1].groups())
        n_pass += p
        n_fail += f
        n_err += e
        fails += [
            ln for ln in out.splitlines()
            if ln.startswith(("FAIL", "ERR"))
        ]
    missing = sorted(queries - seen)
    extra_names = sorted(seen - queries)
    rows_only_ran = sorted(
        n for n in (queries - oracles) if statuses.get(n) == "----"
    )
    ok = (
        n_fail == 0
        and n_err == 0
        and not missing
        and not extra_names
        and n_pass == len(oracles)
        and len(rows_only_ran) == len(queries - oracles)
    )
    return {
        "ok": ok, "pass": n_pass, "fail": n_fail, "err": n_err,
        "expected_oracles": len(oracles),
        "rows_only_ran": len(rows_only_ran),
        "missing": missing, "extra": extra_names,
        "failures": fails[:20],
    }


# Round 14: q74 (grouped-map UDAF demo) left the headline for the demo
# tier; q421 (its scale twin) replaced it. New baseline = old 7.90
# - q74's 0.953 + q421's ~0.30 (round-14 measurement q01-normalized to
# the baseline host); derivation + raw runs in BASELINE.md.
BASELINE_TOTAL_SF01 = 7.25  # BASELINE.md 15-query engine total, sf0.1
BASELINE_Q01_SF01 = 0.074  # q01 canary on the baseline host


def stage_bench(ctx):
    """Double bench run, GATED: the best run must land within 2× of
    the BASELINE.md total (the brief's bar) after q01-canary host
    normalization — q01 is a bare count(*) whose plan never changes,
    so total/(q01_ratio) cancels host speed. Raw walls vary ±40%
    with VM co-tenancy (BASELINE.md round-3 calibration); a gate on
    the NORMALIZED best-of-two fails only on genuine plan
    regressions, which is what the stage is for. Totals and per-query
    walls are still recorded for the trend record."""
    runs = []
    for _ in range(2):
        rc, out = _run([PY, "bench.py"])
        line = next(
            (ln for ln in reversed(out.strip().splitlines())
             if ln.startswith("{")), None,
        )
        if rc != 0 or line is None:
            return {"ok": False, "error": "bench produced no JSON line",
                    "tail": out[-2000:]}
        runs.append(json.loads(line))
    totals = [r.get("value") for r in runs]
    canaries = [r.get("queries", {}).get("q01_scan_count") for r in runs]
    normalized = [
        t / max(c / BASELINE_Q01_SF01, 0.25)
        for t, c in zip(totals, canaries)
        if t is not None and c
    ]
    best_norm = min(normalized) if normalized else None
    return {
        "ok": best_norm is not None
        and best_norm <= 2.0 * BASELINE_TOTAL_SF01,
        "totals": totals,
        "q01_canary": canaries,
        "best_normalized_total": best_norm,
        "gate": f"normalized best-of-2 <= {2.0 * BASELINE_TOTAL_SF01}",
        "runs": runs,
    }


def stage_sf10_spot(ctx):
    """The 42-query scale-sensitive subset at fixtures/sf10 (100×
    bench data). ok iff every named query PASSes (all 42 are
    oracle-backed). Subset — no registry completion check."""
    sf_dir = os.path.join(REPO, "fixtures/sf10")
    if not os.path.isdir(sf_dir):
        return {"ok": False, "error": f"fixture dir missing: {sf_dir} "
                "(python tools/gen_fixture.py 10 fixtures/sf10)"}
    bad_names = sorted(set(SF10_SPOT) - ctx["queries"])
    if bad_names:
        return {"ok": False, "error": f"spot names not in registry: "
                f"{bad_names}"}
    rc, out = _run([PY, "tools/verify_oracle.py", sf_dir, *SF10_SPOT])
    statuses = dict(
        (name, status) for status, name in _LINE.findall(out)
    )
    m = list(_TALLY.finditer(out))
    if not m:
        return {"ok": False, "error": "no tally line (crashed?)",
                "tail": out[-2000:]}
    p, f, e = (int(x) for x in m[-1].groups())
    missing = sorted(n for n in SF10_SPOT if n not in statuses)
    return {
        "ok": f == 0 and e == 0 and p == len(SF10_SPOT) and not missing,
        "pass": p, "fail": f, "err": e, "expected": len(SF10_SPOT),
        "missing": missing,
        "failures": [ln for ln in out.splitlines()
                     if ln.startswith(("FAIL", "ERR"))][:20],
    }


def stage_driver_sim(ctx):
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "from pyspark.sql import SparkSession\n"
        "spark = SparkSession.builder.master('local[16]').getOrCreate()\n"
        "import __spark_entry__ as e\n"
        "rows = e.entry(spark).collect()\n"
        "q, o = e.queries(), e.oracle_sql()\n"
        "print('DRIVER_SIM', len(rows), len(q), len(o))\n" % REPO
    )
    rc, out = _run([PY, "-c", code], cwd="/tmp")
    m = re.search(r"DRIVER_SIM (\d+) (\d+) (\d+)", out)
    if rc != 0 or not m:
        return {"ok": False, "tail": out[-2000:]}
    rows, nq, no = (int(x) for x in m.groups())
    return {
        "ok": nq == len(ctx["queries"]) and no == len(ctx["oracles"]),
        "entry_rows": rows, "n_queries": nq, "n_oracles": no,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="")
    ap.add_argument("--skip", default="")
    ap.add_argument("--sf3-slices", type=int, default=2)
    ap.add_argument("--out", default=os.path.join(REPO, "EXITGATES.json"))
    args = ap.parse_args()
    only = {s for s in args.only.split(",") if s}
    skip = {s for s in args.skip.split(",") if s}
    unknown = (only | skip) - set(STAGES)
    if unknown:
        ap.error(f"unknown stages: {sorted(unknown)} (valid: {STAGES})")
    selected = [
        s for s in STAGES
        if (not only or s in only or s == "registry") and s not in skip
    ]

    queries, oracles = registry_counts()
    ctx = {"queries": queries, "oracles": oracles}
    head = subprocess.run(
        ["git", "rev-parse", "HEAD"], cwd=REPO, capture_output=True,
        text=True,
    ).stdout.strip()
    dirty = bool(subprocess.run(
        ["git", "status", "--porcelain"], cwd=REPO, capture_output=True,
        text=True,
    ).stdout.strip())

    verdict = {"git_head": head, "git_dirty": dirty, "stages": {}}
    for name in selected:
        t0 = time.time()
        print(f"== {name} ==", flush=True)
        if name == "registry":
            res = stage_registry(ctx)
        elif name == "pytest":
            res = stage_pytest(ctx)
        elif name in SWEEPS:
            sf_dir, extra, slices = SWEEPS[name]
            res = run_sweep(
                ctx, sf_dir, extra, slices or args.sf3_slices
            )
        elif name == "sweep_sf10_spot":
            res = stage_sf10_spot(ctx)
        elif name == "bench":
            res = stage_bench(ctx)
        else:
            res = stage_driver_sim(ctx)
        res["secs"] = round(time.time() - t0, 1)
        verdict["stages"][name] = res
        print(f"   {'OK' if res['ok'] else 'FAIL'} "
              f"({res['secs']}s) {json.dumps({k: v for k, v in res.items() if k not in ('runs', 'failures', 'tail')})[:300]}",
              flush=True)

    verdict["ok"] = all(s["ok"] for s in verdict["stages"].values())
    with open(args.out, "w") as f:
        json.dump(verdict, f, indent=1)
    print(json.dumps({"ok": verdict["ok"], "git_head": head,
                      "git_dirty": dirty,
                      "stages": {k: v["ok"] for k, v in
                                 verdict["stages"].items()}}))
    return 0 if verdict["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
