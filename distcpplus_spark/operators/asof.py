"""As-of join: attach to each left row the most recent right row at or
before its timestamp, per key — the point-in-time join behind feature
stores, trade/quote matching, and session attribution.

Spark has no native ASOF JOIN (DuckDB does; the oracle uses it). The
distributed implementation is the union-tag pattern:

  1. tag right rows 0 and left rows 1, union them;
  2. per key, ordered by (ts, tag), `last(payload, ignorenulls)` over
     an unbounded-preceding frame carries the latest right payload
     forward to every subsequent row — at equal timestamps the right
     row sorts first, giving >= ("at or before") semantics;
  3. keep only left rows.

Cost: ONE shuffle on the key (the union sorts within partitions) —
never the range-join explosion of `l.ts BETWEEN r.ts AND ...`, and no
per-key collect. Skewed keys can be salted upstream like any window.

Determinism: rows are totally ordered by (ts, tag); if the RIGHT side
can carry duplicate (key, ts) pairs, pre-aggregate it (e.g. max_by per
(key, ts)) or the carried payload among those ties is undefined — same
contract as DuckDB's ASOF on duplicate match keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    suffix: str = "_asof",
    tolerance_seconds: float | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join. Right payload columns (everything except the
    key and timestamp) are appended with ``suffix``; the matched right
    timestamp comes back as ``<right_ts><suffix>``. Left rows with no
    matching right row keep NULL payloads. ``tolerance_seconds`` voids
    matches further away than the window (feature-staleness cutoffs).

    ``direction``: 'backward' (default) matches the most recent right
    row at-or-before the left timestamp; 'forward' matches the
    EARLIEST right row at-or-after it (next-quote / next-event
    attribution) — same union-tag plan with the frame flipped to
    (currentRow, unboundedFollowing) and ``first`` instead of
    ``last``; at equal timestamps the right row still matches (the
    tag sorts it after the left row in forward mode)."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    keys = [on] if isinstance(on, str) else list(on)
    payload_cols = [c for c in right.columns if c not in keys]
    if right_ts not in payload_cols:
        payload_cols.append(right_ts)

    back = direction == "backward"
    r = right.select(
        *keys,
        F.col(right_ts).alias("_ats"),
        F.struct(*payload_cols).alias("_payload"),
        F.lit(0 if back else 1).alias("_tag"),
    )
    left_tag = 1 if back else 0
    l = (
        left.withColumn("_ats", F.col(left_ts))
        .withColumn("_payload", F.lit(None).cast(r.schema["_payload"].dataType))
        .withColumn("_tag", F.lit(left_tag))
    )
    u = l.unionByName(r, allowMissingColumns=True)

    base = W.partitionBy(*keys).orderBy("_ats", "_tag")
    if back:
        w = base.rowsBetween(W.unboundedPreceding, W.currentRow)
        carried = F.last("_payload", ignorenulls=True).over(w)
    else:
        w = base.rowsBetween(W.currentRow, W.unboundedFollowing)
        carried = F.first("_payload", ignorenulls=True).over(w)
    filled = u.withColumn("_last", carried).filter(F.col("_tag") == left_tag)

    matched = F.col("_last")
    if tolerance_seconds is not None:
        gap = F.col(left_ts).cast("double") - F.col(
            f"_last.{right_ts}"
        ).cast("double")
        fresh = (gap if back else -gap) <= tolerance_seconds
        matched = F.when(fresh, F.col("_last"))

    out = filled.withColumn("_m", matched)
    for c in payload_cols:
        out = out.withColumn(f"{c}{suffix}", F.col(f"_m.{c}"))
    return out.drop("_ats", "_payload", "_tag", "_last", "_m")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket_seconds: int,
) -> DataFrame:
    """Interval-overlap join as an EQUI-join: explode each interval
    into the coarse time buckets it touches, equi-join on the
    bucket, then verify the exact half-open overlap predicate
    (l.start < r.end AND r.start < l.end) and dedupe pairs that met
    in several buckets.

    Why: Spark plans a raw non-equi overlap join as a (broadcast)
    nested loop — quadratic per partition pair. Bucketizing turns it
    into one shuffle keyed on ~interval_len/bucket_seconds small
    integers per row; candidates are only same-bucket pairs. Pick
    ``bucket_seconds`` near the TYPICAL interval length: too fine
    explodes rows, too coarse degenerates toward all-pairs per
    bucket (the standard tuning rule for this rewrite, as used by
    range-join optimizers). Columns from both sides are kept; the
    timestamps must be TIMESTAMP type."""
    g = F.lit(bucket_seconds).cast("long")

    def buckets(s, e):
        lo = (F.unix_timestamp(F.col(s)) / g).cast("long")
        # half-open end: an interval ending exactly on a boundary
        # does not touch the next bucket
        hi = (
            (F.unix_timestamp(F.col(e)) - F.lit(1)) / g
        ).cast("long")
        return F.sequence(lo, F.greatest(hi, lo))

    lb = left.withColumn("_bkt", F.explode(buckets(l_start, l_end)))
    rb = right.withColumn("_bkt", F.explode(buckets(r_start, r_end)))
    joined = lb.alias("l").join(
        rb.alias("r"),
        (F.col("l._bkt") == F.col("r._bkt"))
        & (F.col(f"l.{l_start}") < F.col(f"r.{r_end}"))
        & (F.col(f"r.{r_start}") < F.col(f"l.{l_end}")),
    )
    return joined.drop("_bkt").dropDuplicates(
        [c for c in left.columns if c != "_bkt"]
        + [c for c in right.columns if c != "_bkt"]
    )


def gapfill_interpolate(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    step: str = "1 hour",
    num_col: str | None = None,
    den_col: str | None = None,
) -> DataFrame:
    """Regularize a per-key time series onto a fixed grid: emit one
    row per ``step`` between each key's min and max timestamp,
    carrying observed values through and LINEARLY INTERPOLATING the
    gaps (forward-/back-fill at the edges) — the resample/gap-fill
    operator behind dashboard downsampling and feature-store
    regularization. Observed timestamps must already lie ON the grid
    (pre-bucket with date_trunc; this operator does not snap).

    Returns (key, ts, value, src) where src tags each row
    'observed' / 'interpolated' / 'ffill' / 'bfill'.

    Scale: the grid explodes from ONE aggregate row per key
    (min/max), so grid size is explicit and bounded by span/step per
    key — never data-dependent blowup; the fill windows are
    PARTITIONED by key (no global window), so the whole operator is
    one shuffle on the key. A key whose span/step is pathological
    (years at 1s) is visible in the bounds aggregate before the
    explode — cap there if the domain needs it.

    EXACT mode (``num_col``/``den_col``): when the value is an exact
    rational num/den (e.g. integer cents over a count), pass the two
    BIGINT columns and the interpolation is computed entirely in
    integer arithmetic with ONE final double division:
    (pn*nd*(N-k) + nn*pd*k) / (pd*nd*N), where k and N are gap
    positions in STEP COUNTS. Rationale (the sf1 q320 lesson):
    pv + (nv-pv)*frac accumulates engine-specific ULPs, and a
    round(x, 6) of two doubles one ULP apart lands on different
    cents — cross-engine determinism needs a single shared float
    operation, not a float expression tree.
    """
    bounds = df.groupBy(key_col).agg(
        F.min(ts_col).alias("_t0"), F.max(ts_col).alias("_t1")
    )
    grid = bounds.select(
        key_col,
        F.explode(
            F.expr(f"sequence(_t0, _t1, interval {step})")
        ).alias(ts_col),
    )
    exact = num_col is not None and den_col is not None
    carry = [key_col, ts_col, val_col] + (
        [num_col, den_col] if exact else []
    )
    j = grid.join(df.select(*carry), [key_col, ts_col], "left")
    wp = (
        W.partitionBy(key_col)
        .orderBy(ts_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wn = (
        W.partitionBy(key_col)
        .orderBy(ts_col)
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    v = F.col(val_col)
    obs_ts = F.when(v.isNotNull(), F.col(ts_col))
    pv = F.last(v, ignorenulls=True).over(wp)
    pt = F.last(obs_ts, ignorenulls=True).over(wp)
    nv = F.first(v, ignorenulls=True).over(wn)
    nt = F.first(obs_ts, ignorenulls=True).over(wn)
    if exact:
        # step length in exact microseconds (constant-folded scalar).
        # Computed as a DIFFERENCE of two unix_micros so the session
        # timezone's epoch offset cancels — a bare
        # unix_micros(epoch + interval) equals the step length only
        # under UTC sessions (ADVICE r9: general library operator,
        # no session guard).
        step_us = F.expr(
            f"unix_micros(cast('2000-01-01 00:00:00' as timestamp)"
            f" + interval {step})"
            f" - unix_micros(cast('2000-01-01 00:00:00' as timestamp))"
        )
        pn = F.last(F.col(num_col), ignorenulls=True).over(wp)
        pd_ = F.last(F.col(den_col), ignorenulls=True).over(wp)
        nn = F.first(F.col(num_col), ignorenulls=True).over(wn)
        nd = F.first(F.col(den_col), ignorenulls=True).over(wn)
        k = (
            (F.unix_micros(F.col(ts_col)) - F.unix_micros(pt)) / step_us
        ).cast("long")
        n_steps = (
            (F.unix_micros(nt) - F.unix_micros(pt)) / step_us
        ).cast("long")
        interp = (
            pn * nd * (n_steps - k) + nn * pd_ * k
        ) / (pd_ * nd * n_steps).cast("double")
        pv_x = pn / pd_.cast("double")
        nv_x = nn / nd.cast("double")
        v_x = F.col(num_col) / F.col(den_col).cast("double")
        return j.select(
            key_col,
            ts_col,
            F.coalesce(v_x, interp, pv_x, nv_x).alias("value"),
            F.when(v.isNotNull(), F.lit("observed"))
            .when(pv.isNotNull() & nv.isNotNull(), F.lit("interpolated"))
            .when(pv.isNotNull(), F.lit("ffill"))
            .otherwise(F.lit("bfill"))
            .alias("src"),
        )
    frac = (
        F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(pt)
    ) / (F.unix_timestamp(nt) - F.unix_timestamp(pt))
    interp = pv + (nv - pv) * frac
    return j.select(
        key_col,
        ts_col,
        F.coalesce(v, interp, pv, nv).alias("value"),
        F.when(v.isNotNull(), F.lit("observed"))
        .when(pv.isNotNull() & nv.isNotNull(), F.lit("interpolated"))
        .when(pv.isNotNull(), F.lit("ffill"))
        .otherwise(F.lit("bfill"))
        .alias("src"),
    )
