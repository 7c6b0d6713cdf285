"""Count-min sketch and Bloom filter builders.

PySpark 4 exposes the DataSketches family (hll/kll/theta) as SQL
functions but dropped the Python wrappers for the two classic
spark.util.sketch types; these helpers reach the JVM builders through
the DataFrame's Java handle, so the BUILD is still the distributed
two-phase aggregate (partial sketch per partition, merge on the
driver) — only the point queries run driver-side.

Scale roles:
- count-min: heavy-hitter frequencies over an unbounded key domain in
  O(eps^-1 · log(1/conf)) memory — 'how often did THIS url/token
  appear in 100 TB' without a groupBy materializing every key.
- bloom: membership prefilter. Build on the small/selective side,
  ship to the fact scan, drop non-joining rows BEFORE the shuffle.
  Spark's AQE does this automatically when
  spark.sql.optimizer.runtime.bloomFilter.enabled is on (see
  tests/test_sketches.py::test_runtime_bloom_filter_join); the manual
  builder covers cross-job reuse (build once, filter many jobs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _jdf(df: DataFrame):
    """The underlying JVM DataFrame — classic (py4j) mode only. Spark
    Connect DataFrames have no JVM handle; fail with a clear message
    instead of an AttributeError deep in py4j."""
    jdf = getattr(df, "_jdf", None)
    if jdf is None:
        raise NotImplementedError(
            "count_min/bloom need the JVM sketch builders "
            "(DataFrameStatFunctions), which are unavailable under "
            "Spark Connect — run on a classic (py4j) session"
        )
    return jdf


def count_min(
    df: DataFrame,
    col: str,
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 42,
):
    """Distributed count-min build → JVM CountMinSketch.

    The returned sketch guarantees ``estimateCount(k) >= true`` and
    ``<= true + eps * N`` with the given confidence. Mergeable via
    ``mergeInPlace`` (per-partition/per-day sketches roll up)."""
    return _jdf(df).stat().countMinSketch(
        col, float(eps), float(confidence), int(seed)
    )


def bloom(
    df: DataFrame, col: str, expected_items: int, fpp: float = 0.01
):
    """Distributed Bloom-filter build → JVM BloomFilter.

    No false negatives; false-positive rate ≈ ``fpp`` at the expected
    cardinality. ``mightContain`` answers driver-side membership;
    ``mergeInPlace`` unions filters built on disjoint slices."""
    return _jdf(df).stat().bloomFilter(col, int(expected_items), float(fpp))


def space_saving_topk(df: DataFrame, col: str, k: int = 64) -> DataFrame:
    """Distributed SpaceSaving heavy hitters (Metwally et al. 2005;
    mergeable per Agarwal et al. "Mergeable Summaries" — public
    literature): one pass, k counters per partition, O(k) state.

    GUARANTEES (the q303 contract), n = total items, P = partitions:
    (a) every item of true count > 2n/k appears in the returned
        top-k: by pigeonhole it is present in some partition's
        summary with est >= true_p - n_p/k, the merged est(x)
        >= true(x) - n/k > n/k, and since per-partition counters sum
        to n_p the merged ests sum to <= n, so at most k keys can
        have est > n/k — x cannot be pushed out.
    (b) every reported estimate is within n/k of truth TWO-SIDED:
        over-count <= sum of per-partition min-counter evictions
        <= n/k; under-count <= sum of n_p/k over partitions whose
        summary dropped the key <= n/k. (Single-partition
        SpaceSaving never under-counts; the merge is what buys the
        lower side, per the mergeable-summaries analysis.)

    Scale shape: one mapInPandas pass emits <= k rows per partition
    (metadata-sized), a key-wise hash aggregate folds them, and the
    final top-k is TakeOrderedAndProject. Contrast with count-min
    (functions.count_min): CMS answers point queries with additive
    error but cannot ENUMERATE the heavy hitters; SpaceSaving is the
    enumeration sketch."""
    import pandas as pd
    from pyspark.sql import functions as F

    def summarize(batches):
        counters: dict = {}
        for pdf in batches:
            for v in pdf[col]:
                if v is None:
                    continue
                if v in counters:
                    counters[v] += 1
                elif len(counters) < k:
                    counters[v] = 1
                else:
                    mn_key = min(counters, key=counters.get)
                    mn = counters.pop(mn_key)
                    counters[v] = mn + 1
        yield pd.DataFrame(
            {
                "_key": pd.Series(list(counters.keys()), dtype=object),
                "_est": pd.Series(list(counters.values()), dtype=object),
            }
        )

    key_type = df.schema[col].dataType.simpleString()
    partials = df.select(col).mapInPandas(
        summarize, f"_key {key_type}, _est bigint"
    )
    merged = partials.groupBy("_key").agg(F.sum("_est").alias("est"))
    return (
        merged.orderBy(F.desc("est"), "_key")
        .limit(k)
        .select(F.col("_key").alias("key"), "est")
    )
