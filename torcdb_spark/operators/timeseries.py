"""Hypertable-style time-series rollup + gap-fill — extension operators the
reference (a graph store) lacks entirely; modeled on TimescaleDB's
``time_bucket`` / ``time_bucket_gapfill`` / ``locf`` surface, re-expressed
as pure Catalyst plans.

Scale shape:
- ``time_bucket`` is a stateless projection (integer floor on exact
  microseconds) — pushes through scans, costs nothing.
- ``rollup`` is a single partial-aggregated groupBy on (bucket, *keys):
  one shuffle, map-side combine, the canonical OLAP downsample. At 100 TB
  this is the same plan as TPC-H Q1.
- ``gap_fill`` densifies per-key series WITHOUT a driver-side calendar:
  the bucket spine is ``sequence(min_bucket, max_bucket, step)`` exploded
  per key — generated distributively from each key's own aggregated
  bounds (2-row-per-key intermediate), then a left join back. Fill is
  LOCF (last-observation-carried-forward) via ``last(ignorenulls)`` over
  an UNBOUNDED PRECEDING running window — per-key sort, no self-join,
  no driver collect. Spine size is bounded by span/width per key; choose
  the width so per-key spines stay in the thousands, exactly as a
  hypertable chooses its chunk interval.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def time_bucket(col: Column, width_seconds: int) -> Column:
    """Floor a timestamp column to a fixed-width bucket (TimescaleDB
    ``time_bucket``). Exact integer arithmetic on microseconds — no
    float rounding at any scale."""
    w = int(width_seconds) * 1_000_000
    return F.timestamp_micros((F.floor(F.unix_micros(col) / w) * w).cast("long"))


def rollup(
    df: DataFrame,
    ts_col: str,
    width_seconds: int,
    keys: list[str],
    aggs: list[Column],
    bucket_name: str = "bucket",
) -> DataFrame:
    """Downsample to fixed windows: groupBy(time_bucket, *keys).agg(*aggs)."""
    return (
        df.withColumn(bucket_name, time_bucket(F.col(ts_col), width_seconds))
        .groupBy(bucket_name, *keys)
        .agg(*aggs)
    )


def gap_fill(
    rolled: DataFrame,
    bucket_col: str,
    width_seconds: int,
    keys: list[str],
    value_cols: list[str],
    method: str = "locf",
) -> DataFrame:
    """Densify a rolled-up series: emit one row per key per bucket between
    that key's first and last observed bucket, filling missing buckets.

    ``method``: 'null' leaves gaps as NULL; 'locf' carries the last
    observed value forward (leading gap before a key's first observation
    cannot exist because the spine starts at the key's own min bucket).
    """
    if method not in ("null", "locf"):
        raise ValueError(f"gap_fill supports method='null'|'locf', got {method!r}")
    w = int(width_seconds) * 1_000_000

    spine = (
        rolled.groupBy(*keys)
        .agg(
            F.min(F.unix_micros(F.col(bucket_col))).alias("_lo"),
            F.max(F.unix_micros(F.col(bucket_col))).alias("_hi"),
        )
        .select(
            *keys,
            F.explode(
                F.sequence(F.col("_lo"), F.col("_hi"), F.lit(w))
            ).alias("_bm"),
        )
        .select(*keys, F.timestamp_micros(F.col("_bm")).alias(bucket_col))
    )
    dense = spine.join(rolled, on=[*keys, bucket_col], how="left")
    if method == "locf":
        win = (
            Window.partitionBy(*keys)
            .orderBy(bucket_col)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        for c in value_cols:
            dense = dense.withColumn(c, F.last(F.col(c), ignorenulls=True).over(win))
    return dense


def trailing_zscore(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    window_days: int = 7,
    z_threshold: float = 2.0,
) -> DataFrame:
    """Trailing-window anomaly detection over a daily series →
    (key…, day, total, z, is_anomaly).

    Per key: daily totals (rounded to 2 so the aggregation is
    float-stable), then for each day a z-score against the TRAILING
    ``window_days`` days (exclusive of the current day — the detector must
    not see the point it scores). Days without a full trailing window get
    z NULL / is_anomaly false rather than a noisy early estimate.

    One shuffle to the daily grain, one window sort per key — the window
    state is ``window_days`` floats per key, so the operator streams at
    100 TB (and is exactly the shape Structured Streaming's
    ``applyInPandasWithState`` version would hold as state)."""
    daily = (
        df.groupBy(
            *key_cols, F.to_date(F.col(ts_col)).alias("day")
        )
        .agg(F.round(F.sum(value_col), 2).alias("total"))
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("day")
        .rowsBetween(-window_days, -1)
    )
    mu = F.avg("total").over(w)
    sd = F.stddev_samp("total").over(w)
    n = F.count("total").over(w)
    z = F.when(
        (n == window_days) & (sd > 0),
        F.round((F.col("total") - mu) / sd, 4),
    )
    return daily.select(
        *key_cols,
        "day",
        "total",
        z.alias("z"),
        F.coalesce(F.abs(z) > z_threshold, F.lit(False)).alias("is_anomaly"),
    )


def ewma(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    alpha: float = 0.25,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Per-key exponentially-weighted moving average (the classic
    time-series smoother: y_1 = x_1, y_t = α·x_t + (1−α)·y_{t−1}) →
    one row per key with the series tail:
    (keys…, n_points, last_raw, last_ewma, max_abs_dev) where
    max_abs_dev = max_t |x_t − y_t| (the smoothing-residual anomaly
    signal trailing_zscore approximates windowed).

    Execution: the recursion is inherently sequential PER KEY, so the
    only dataflow shape that works is collect the key's ordered values
    into an array (one shuffle — the same groupBy every per-key rollup
    pays) and fold it with ``F.aggregate`` — a sequential JVM lambda
    per row, no Python, deterministic evaluation order by construction.
    Per-key arrays are session-sized; at 100 TB keys are users/devices
    with bounded history, the same boundedness contract as gap_fill's
    spine. A closed-form window formulation exists (y_t = αΣ(1−α)^{t−i}
    x_i) but needs (1−α)^{−i} factors that overflow doubles beyond a
    few hundred points — the fold is the numerically-stable form.

    Determinism: ordering is (ts, tiebreak) with an explicit tiebreak
    column (pass event_id); the fold then fixes the float evaluation
    order bit-for-bit, so an external engine folding the same array
    reproduces the exact doubles (DuckDB ``list_reduce``)."""
    order = [F.col(ts_col)] + (
        [F.col(order_tiebreak)] if order_tiebreak else []
    )
    a = float(alpha)
    packed = (
        df.groupBy(*[F.col(k) for k in key_cols])
        .agg(
            F.array_sort(
                F.collect_list(F.struct(*order, F.col(value_col).alias("_v")))
            ).alias("_pts")
        )
        .select(
            *key_cols,
            F.transform(F.col("_pts"), lambda s: s["_v"]).alias("_xs"),
        )
    )
    xs = F.col("_xs")
    folded = F.aggregate(
        F.slice(xs, 2, F.greatest(F.size(xs) - 1, F.lit(0))),
        F.struct(
            F.element_at(xs, 1).alias("y"),
            F.lit(0.0).alias("dev"),
        ),
        lambda acc, x: F.struct(
            (F.lit(a) * x + F.lit(1.0 - a) * acc["y"]).alias("y"),
            F.greatest(
                acc["dev"],
                F.abs(x - (F.lit(a) * x + F.lit(1.0 - a) * acc["y"])),
            ).alias("dev"),
        ),
    )
    def _r6(c: Column) -> Column:
        # portable round-half-up (see text.quality_score's rounding note)
        return F.floor(c * 1_000_000 + F.lit(0.5)) / F.lit(1_000_000.0)

    return packed.select(
        *key_cols,
        F.size(xs).cast("long").alias("n_points"),
        _r6(F.element_at(xs, -1)).alias("last_raw"),
        _r6(folded["y"]).alias("last_ewma"),
        _r6(folded["dev"]).alias("max_abs_dev"),
    )
