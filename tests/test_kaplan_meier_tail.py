"""q367 Kaplan-Meier terminal-group regression: when the largest
duration group is FULLY uncensored (d == at_risk), the ln term is
ln(0). Spark's F.log(0) returns NULL — a running SUM silently drops
it and survival freezes at the previous value — while DuckDB's
ln(0) = -inf gives the mathematically correct S(t) = 0. The operator
must emit -inf explicitly; this fixture forces the case (the driver
fixtures happen never to hit it)."""

from __future__ import annotations

import json

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

from distcpplus_spark.queries import load_all_queries


def _events_fixture(tmp_path):
    """Corpus max = day 20 (user 3, censored, dur 0). Users 0-2 live
    day 0 -> day 5 (dur 5, uncensored: day 5 < cutoff day 18). Life
    table: dur 0 -> d=0 c=1 at_risk=4; dur 5 -> d=3 c=0 at_risk=3,
    i.e. d == at_risk => survival must be exactly 0."""
    ts = pa.timestamp("us")
    rows = [
        (0, "2024-01-01T00:00:00", 0), (1, "2024-01-06T00:00:00", 0),
        (2, "2024-01-01T00:00:00", 1), (3, "2024-01-06T00:00:00", 1),
        (4, "2024-01-01T00:00:00", 2), (5, "2024-01-06T00:00:00", 2),
        (6, "2024-01-21T00:00:00", 3),
    ]
    import numpy as np

    tbl = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(
            np.array([r[1] for r in rows], dtype="datetime64[us]"), ts
        ),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": ["view"] * len(rows),
        "value": [1.0] * len(rows),
        "props": [json.dumps({"k": 1})] * len(rows),
    })
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_km_survival_reaches_zero_and_matches_oracle(spark, tmp_path):
    sf_dir = _events_fixture(tmp_path)
    queries, oracles = load_all_queries()
    got = {
        r["dur"]: r
        for r in queries["q367_kaplan_meier"](spark, sf_dir).collect()
    }
    assert got[5]["d"] == got[5]["at_risk"] == 3  # the ln(0) group
    assert got[5]["survival_6"] == 0.0  # NOT frozen at the prior value
    assert got[0]["survival_6"] == 1.0

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    want = {
        r[0]: r
        for r in con.execute(oracles["q367_kaplan_meier"]).fetchall()
    }
    assert set(got) == set(want)
    for dur, row in want.items():
        g = got[dur]
        assert (g["d"], g["c"], g["at_risk"]) == (row[1], row[2], row[3])
        assert abs((g["survival_6"] or 0) - (row[4] or 0)) < 1e-9, dur
