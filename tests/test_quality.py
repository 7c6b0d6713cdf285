"""Data-quality constraint checking (operators/quality.py) against
hand-built dirty data where every violation count is known."""

from pyspark.sql import functions as F

from distcpplus_spark.operators import quality as Q


def test_all_check_kinds_count_exactly(spark):
    df = spark.createDataFrame(
        [
            (1, 10, "A"),
            (2, 20, "B"),
            (2, -5, "A"),      # dup id, range violation
            (None, 300, "C"),  # null id, range + value violation
            (2, None, "B"),    # dup id again, null amount
        ],
        "id BIGINT, amount BIGINT, cat STRING",
    )
    dim = spark.createDataFrame([(1,), (2,)], "id BIGINT")
    report = {
        r["check_name"]: (r["n_violations"], r["passed"])
        for r in Q.run_checks(
            df,
            [
                Q.not_null("id"),
                Q.unique("id"),
                Q.accepted_range("amount", 0, 100),
                Q.accepted_values("cat", ["A", "B"]),
                Q.referential("id", dim, "id"),
                Q.custom("amount_gt_id", F.col("amount") > F.col("id")),
            ],
        ).collect()
    }
    assert report["not_null(id)"] == (1, False)
    # id=2 appears 3x -> 2 extra rows; NULL ids exempt
    assert report["unique(id)"] == (2, False)
    # -5 out of range, 300 out of range, NULL amount counts
    assert report["range(amount)"] == (3, False)
    assert report["values(cat)"] == (1, False)
    # every non-null id (1,2,2,2) matches the dim -> 0 orphans
    assert report["fk(id)"] == (0, True)
    # amount>id: rows (10>1 ok), (20>2 ok), (-5>2 no), (NULL no),
    # (NULL amount no) -> 3 violations
    assert report["amount_gt_id"] == (3, False)


def test_clean_table_passes_everything(spark):
    df = spark.createDataFrame(
        [(i, i * 10, "A") for i in range(1, 6)],
        "id BIGINT, amount BIGINT, cat STRING",
    )
    report = Q.run_checks(
        df,
        [
            Q.not_null("id"),
            Q.unique("id"),
            Q.accepted_range("amount", 0, 100),
            Q.accepted_values("cat", ["A"]),
        ],
    ).collect()
    assert all(r["passed"] and r["n_violations"] == 0 for r in report)
    # declaration order preserved
    assert [r["check_name"] for r in report] == [
        "not_null(id)", "unique(id)", "range(amount)", "values(cat)",
    ]
