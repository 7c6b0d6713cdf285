"""The declared, oracle-checked query surface (SURVEY.md §2b).

Each module registers queries into a shared registry: a Spark
implementation ``(spark, sf_dir) -> DataFrame`` and (where SQL can
express it) an equivalent DuckDB oracle SQL string. ``__spark_entry__``
exposes the merged registry to the driver.

Canonicalization rules (FIXTURES.md): every query has an explicit
ORDER BY on a deterministic key; floats are rounded (monetary sums to 2,
ratios/scores to 6) in BOTH implementations so driver-side hashing
cannot diverge on last-bit float noise; every computed column is aliased
identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, SparkQuery] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[SparkQuery], SparkQuery]:
    """Register a named query and (optionally) its DuckDB oracle SQL."""

    def deco(fn: SparkQuery) -> SparkQuery:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def small_sort(df: DataFrame, *cols) -> DataFrame:
    """Total-order sort for results that are provably small at ANY data
    scale (low-cardinality aggregates: group-by flag/status/nation,
    time-bounded windows, top-k output). Collapsing to one partition
    first lets Catalyst satisfy the sort's distribution requirement
    without the range-exchange sampling job a global ``orderBy`` runs —
    one task sorting hundreds of rows replaces a sample pass + shuffle.
    Never use on unbounded results (per-key rows that grow with data)."""
    return df.coalesce(1).sortWithinPartitions(*cols)


def local_rows(spark: SparkSession, rows, schema) -> DataFrame:
    """One-slice local-relation DataFrame from driver-side rows.

    ``spark.createDataFrame(list, schema)`` parallelizes the list into
    ``defaultParallelism`` Python-evaluated slices; every scan of the
    result then pays one Python-worker round trip PER SLICE (~150 ms
    each), and a downstream ``coalesce(1)`` — ``small_sort`` — makes
    one task evaluate all slices SERIALLY (~5-7 s at 32 slices,
    measured). Parallelizing into ONE slice keeps the identical row
    conversion/verification path but makes any scan a single round
    trip. Use for the fixture/materialization pattern (collected rows
    re-wrapped as a DataFrame); results are tiny by construction, so
    one partition is also the right parallelism."""
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, numSlices=1), schema
    )


def money_sum(expr, scale: int = 100):
    """Order-independent money aggregate.

    CONTRACT — LATTICE INPUTS ONLY: ``expr`` must be on the
    ``1/scale`` lattice, i.e. ``expr*scale`` is within float-ulp of an
    integer for EVERY row. On off-lattice inputs (averages, divided
    values, arbitrary floats) the floor(x*scale+0.5) quantization here
    diverges from a SQL mirror's ``round()`` on negative exact halves
    (floor(-234.5+0.5) = -234 vs DuckDB round = -235). Do not pass
    computed non-lattice expressions; quantize them to an explicit
    integer lattice first (q343/q382 device).

    The q163/q118 discipline,
    registry-wide in round 10): quantize each term to exact integer
    units (2-decimal columns are on a cent lattice, price*(1-disc)
    products on a 1e-4 lattice — round() recovers the exact integer
    from the double), sum as BIGINT (associative — partial-sum order
    CANNOT matter), divide once at the end. A raw double sum's
    partial-sum order differs between engines AND between runs of the
    same engine (thread scheduling), flipping the rounded cent once
    the magnitude crosses ~1e8 (q118 at sf3). SQL mirror:
    ``sum(CAST(round(expr * scale) AS BIGINT)) / scale.0``.

    Quantization is ``floor(x*scale + 0.5)``, not ``round()``: Spark's
    Round on a double allocates a BigDecimal per row inside the
    map-side partial agg (+72% on the pure-agg q12 spine, round-10
    judge A/B), while floor is one primitive instruction. On a lattice
    input (x*scale within float-ulp of an integer k) both yield
    exactly k for either sign — floor(k±eps+0.5)=k; a bare
    double->long CAST would NOT (it truncates toward zero, breaking
    negative lattice values). Verified 0-mismatch over all of sf0.1
    lineitem for both the cent and 1e-4 lattices."""
    from pyspark.sql import functions as F

    return F.sum(F.floor(expr * scale + F.lit(0.5))) / float(scale)


def money_sum_2dec(expr, scale: int = 10000):
    """money_sum for lattices finer than cents (revenue =
    price*(1-disc) sits on 1e-4), rounded HALF-UP to 2 decimals IN
    INTEGER ARITHMETIC before the one division: ``round(sum/1e4, 2)``
    on a float would genuinely tie at .xx50 (the units are exact!)
    and Spark's HALF_UP disagrees with DuckDB's rint there. SQL
    mirror: ``((sum(CAST(round(expr*10000) AS BIGINT)) + 50) // 100)
    / 100.0``.

    NON-NEGATIVE SUMS ONLY: the integer half-up uses ``x - x % step``
    which equals DuckDB's floor-division ``//`` only for
    non-negative x (Spark's ``%`` sign follows the dividend). Every
    current call site is a revenue/price sum; a signed aggregate
    (profit) should use the q163 amount_e4 pattern instead."""
    from pyspark.sql import functions as F

    if scale % 100:
        raise ValueError("scale must be a multiple of 100")
    step = scale // 100
    units = F.sum(F.floor(expr * scale + F.lit(0.5)))
    shifted = units + F.lit(step // 2)
    cents = (shifted - shifted % F.lit(step)) / F.lit(step)
    return cents / 100.0


def load_all_queries() -> tuple[dict[str, SparkQuery], dict[str, str]]:
    """Import every query module (side-effect: registration) and return maps."""
    from distcpplus_spark.queries import (  # noqa: F401
        etl,
        llm,
        llm2,
        llm3,
        llm4,
        llm5,
        llm6,
        llm7,
        llm8,
        llm9,
        llm10,
        llm11,
        nonsql,
        relational,
        relational2,
        relational3,
        relational4,
        sketches,
        streaming,
    )

    return dict(QUERIES), dict(ORACLE)
