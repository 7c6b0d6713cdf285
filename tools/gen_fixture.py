"""Deterministic synthetic fixture generator, sf-parameterized.

Reproduces the driver-generated table family at /root/testdata/sf*
(TESTDATA.md / FIXTURES.md) at arbitrary scale factors, so the full
oracle sweep and the headline bench can run at sf >= 1 (the driver
only materializes sf0.001/0.01/0.1, and /root/testdata is read-only).

Everything here was measured from the three driver SFs, not guessed:

  scaling laws (rows):
    region 5, nation 25 (fixed)
    customer  = sf * 150_000        supplier = sf * 10_000
    part      = sf * 200_000        orders   = sf * 1_500_000
    lineitem  = sf * 6_000_000      events   = sf * 1_000_000
    documents = max(500, sf*50_000) embeddings = max(500, sf*20_000)

  value domains (verified identical across driver SFs):
    region names AFRICA/AMERICA/ASIA/EUROPE/MIDDLE EAST;
    nation NATION_i with n_regionkey = i % 5;
    c_mktsegment 5 TPC-H segments; o_orderstatus {P,O,F};
    o_orderpriority the 5 TPC-H strings; l_returnflag {N,R,A};
    l_linestatus {F,O}; l_discount 0..0.10 step .01; l_tax 0..0.08;
    p_brand Brand#1..25; p_type 6 classes; p_size 1..50;
    p_retailprice = 900 + 0.1*(p_partkey % 1000) (exact lattice);
    event_type 5 classes; props = {"k": 0..99};
    documents: 31-word vocab (lang-independent), 10..100 words,
    lang weights en .41 / others ~.1475, source = src{doc_id % 20},
    ~0.16% exact-duplicate texts; embeddings 64-dim unit-norm float32,
    label 0..9.

  physical schema quirks preserved: o_orderdate / l_shipdate /
  events.ts are parquet timestamp[us] (untagged -> Spark reads NTZ,
  catalog.load_table normalizes); dates are midnight-normalized;
  l_quantity is an integral double.

This generator is NOT byte-identical to the driver's (its source is
not available); it is schema- and domain-identical, which is what the
sweep needs: Spark and DuckDB read the SAME files, so parity checking
is self-contained per fixture set.

Usage: python tools/gen_fixture.py SF OUT_DIR   (e.g. 1 fixtures/sf1)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PART_ADJ = ["large", "hot", "blue", "cold", "new", "old", "red", "small"]
PART_NOUN = ["ring", "bolt", "anvil", "gear", "gizmo", "plate", "rod", "widget"]
PART_TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
DOC_VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_W = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]

TS_US = pa.timestamp("us")


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    # Row-group layout IS scan parallelism (guide §6; the round-14
    # finding: a single-row-group documents.parquet made every sf10
    # scan ONE task, and the hand-rewritten fixtures regressed the
    # moment this generator re-ran with pyarrow's 1Mi-row default).
    # Split into ~16 groups so byte-range splits can actually claim
    # work. Values are identical — layout only.
    rg_rows = max(8192, len(table) // 16)
    pq.write_table(
        table, os.path.join(out_dir, f"{name}.parquet"),
        row_group_size=rg_rows,
    )


def _dates_us(rng, n, start, end):
    """Midnight-normalized timestamp[us] array uniform on [start, end]."""
    s = np.datetime64(start, "D").astype("int64")
    e = np.datetime64(end, "D").astype("int64")
    days = rng.integers(s, e + 1, size=n)
    us = days.astype("datetime64[D]").astype("datetime64[us]")
    return pa.array(us, type=TS_US)


def gen(sf: float, out_dir: str) -> None:
    rng = np.random.default_rng(SEED)
    os.makedirs(out_dir, exist_ok=True)

    n_cust = max(1, int(round(sf * 150_000)))
    n_supp = max(1, int(round(sf * 10_000)))
    n_part = max(1, int(round(sf * 200_000)))
    n_ord = max(1, int(round(sf * 1_500_000)))
    n_li = max(1, int(round(sf * 6_000_000)))
    n_ev = max(1, int(round(sf * 1_000_000)))
    n_doc = max(500, int(round(sf * 50_000)))
    n_emb = max(500, int(round(sf * 20_000)))

    _write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    _write(out_dir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    _write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000.0, 10000.0, n_cust), 2),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]),
    }))

    _write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000.0, 10000.0, n_supp), 2),
    }))

    adj = np.array(PART_ADJ)[rng.integers(0, len(PART_ADJ), n_part)]
    noun = np.array(PART_NOUN)[rng.integers(0, len(PART_NOUN), n_part)]
    keys = np.arange(n_part)
    _write(out_dir, "part", pa.table({
        "p_partkey": pa.array(keys, pa.int64()),
        "p_name": pa.array(np.char.add(np.char.add(adj, " "), noun)),
        "p_brand": pa.array([f"Brand#{b}" for b in rng.integers(1, 26, n_part)]),
        "p_type": pa.array(np.array(PART_TYPES)[rng.integers(0, 6, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(900.0 + 0.1 * (keys % 1000), 1),
    }))

    _write(out_dir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(np.array(["P", "O", "F"])[rng.integers(0, 3, n_ord)]),
        "o_totalprice": np.round(rng.uniform(1000.0, 500000.0, n_ord), 2),
        "o_orderdate": _dates_us(rng, n_ord, "1995-01-01", "2001-08-01"),
        "o_orderpriority": pa.array(np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]),
    }))

    _write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(rng.integers(0, n_ord, n_li), pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype("float64"),
        "l_extendedprice": np.round(rng.uniform(900.0, 105000.0, n_li), 2),
        "l_discount": rng.integers(0, 11, n_li) / 100.0,
        "l_tax": rng.integers(0, 9, n_li) / 100.0,
        "l_returnflag": pa.array(np.array(["N", "R", "A"])[rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(np.array(["F", "O"])[rng.integers(0, 2, n_li)]),
        "l_shipdate": _dates_us(rng, n_li, "1995-01-02", "2001-11-04"),
    }))

    # events: ts strictly sorted over 30 days of Jan 2024, microsecond grain
    span_us = 30 * 86400 * 1_000_000
    offs = np.sort(rng.integers(0, span_us, n_ev))
    base = np.datetime64("2024-01-01T00:00:00", "us")
    _write(out_dir, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": pa.array(base + offs.astype("timedelta64[us]"), TS_US),
        "user_id": pa.array(rng.integers(0, n_cust, n_ev), pa.int64()),
        "event_type": pa.array(np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)]),
        "value": np.round(rng.exponential(50.0, n_ev), 2),
        "props": pa.array([json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n_ev)]),
    }))

    # documents: 10..100 words from the 31-word vocab; ~0.16% exact dups
    vocab = np.array(DOC_VOCAB)
    wc = rng.integers(10, 101, n_doc)
    texts = [" ".join(vocab[rng.integers(0, len(vocab), k)]) for k in wc]
    n_dup = int(round(0.0016 * n_doc))
    if n_dup:
        srcs = rng.integers(0, n_doc, n_dup)
        dsts = rng.integers(0, n_doc, n_dup)
        for s, t in zip(srcs, dsts):
            if s != t:
                texts[int(t)] = texts[int(s)]
    _write(out_dir, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": texts,
        "lang": pa.array(rng.choice(LANGS, size=n_doc, p=LANG_W)),
        "source": [f"src{i % 20}" for i in range(n_doc)],
        "n_chars": pa.array(np.array([len(t) for t in texts]), pa.int64()),
    }))

    vecs = rng.standard_normal((n_emb, 64)).astype("float32")
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    _write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_emb), pa.int32()),
    }))

    print(f"wrote sf={sf} -> {out_dir}: "
          f"lineitem={n_li} orders={n_ord} events={n_ev} docs={n_doc}")


if __name__ == "__main__":
    sf = float(sys.argv[1])
    out = sys.argv[2]
    gen(sf, out)
