"""Edge-input tests for the corpus-hygiene queries: single-token and
empty-ish documents must not abort the job or diverge from the oracle."""

from __future__ import annotations

import duckdb
import pytest


@pytest.fixture(scope="module")
def edge_sf_dir(spark, tmp_path_factory):
    """A fixture dir whose documents table contains 1-token and tiny
    docs — the shapes the real fixtures never exercise."""
    d = tmp_path_factory.mktemp("edge_sf")
    rows = [
        (0, "single", "web", "en", 6),            # 1 token (bench set: 0 % 41 == 0)
        (1, "one two one two", "web", "en", 15),
        (2, "x", "books", "en", 1),               # 1 token, 1 char
        (41, "two tokens", "web", "en", 10),      # another bench doc
        (43, "one two three", "web", "en", 13),
    ]
    spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, source STRING, lang STRING, n_chars INT"
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


def _oracle(sf_dir, sql):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet/*.parquet'"
    )
    return con.execute(sql).fetchall()


def test_q108_survives_single_token_docs(spark, edge_sf_dir):
    from distcpplus_spark.queries import load_all_queries

    queries, oracle = load_all_queries()
    got = queries["q108_contamination_check"](spark, edge_sf_dir).collect()
    exp = _oracle(edge_sf_dir, oracle["q108_contamination_check"])
    assert [(r["doc_id"], r["n_contaminated"]) for r in got] == [
        (e[0], e[1]) for e in exp
    ]
    # the 1-token non-bench doc is absent on both engines (no bigrams)
    assert 2 not in {r["doc_id"] for r in got}


def test_q106_survives_single_token_docs(spark, edge_sf_dir):
    from distcpplus_spark.queries import load_all_queries

    queries, oracle = load_all_queries()
    got = queries["q106_repeated_ngram_filter"](spark, edge_sf_dir).collect()
    exp = _oracle(edge_sf_dir, oracle["q106_repeated_ngram_filter"])
    assert len(got) == len(exp)
