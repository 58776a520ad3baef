"""Bin-bucketed range (interval-containment) join — an operator the
reference lacks (TorcDB's traversal joins are pure equi-joins on edge keys,
TorcHelper.java:407-646) and Spark has no built-in for in batch mode
(Structured Streaming's interval join covers only the stream-stream case,
streaming/jobs.py).

Semantics: for every *point* row and every *interval* row with
``start <= point <= end`` (bounds configurable), emit the joined pair —
optionally also requiring equality on ``on`` key columns.

Scale shape — the reason this exists as an operator: the naive formulation
``points JOIN intervals ON point BETWEEN start AND end`` has no equi-join
key, so Spark plans it as BroadcastNestedLoopJoin (or a cartesian product
when neither side fits in memory) — O(N·M) comparisons, a guaranteed
scale-killer at 100 TB. The binned formulation turns it into an EQUI-join:

  1. pick a bin width W (ideally ≈ the p95 interval length);
  2. each point lands in exactly ONE bin: ``floor(point / W)``;
  3. each interval is replicated into EVERY bin it overlaps:
     ``sequence(floor(start/W), floor(end/W))`` + explode;
  4. equi-join on bin id (+ any ``on`` keys), then apply the exact
     range predicate as a post-join filter.

Because a point has exactly one bin, each qualifying (point, interval)
pair is produced exactly once — no dedup pass needed. Cost is one shuffle
on (bin, *on) for both sides plus an interval replication factor of
``len/W + 1`` (≈2 at the recommended W). Skew: a single hot bin (e.g. a
flash-traffic minute) is ordinary equi-join skew, handled by AQE's skew
split — unlike the nested-loop plan, which has no mitigation at all.

Timestamps are binned on exact integer microseconds (``unix_micros``), so
no precision is lost for sub-second data; numeric columns bin by
``floor(col / W)`` directly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType, TimestampType


def _bin_expr(col: Column, dtype, width) -> Column:
    """Integer bin id for a point value (timestamp → exact micros)."""
    if isinstance(dtype, (TimestampType, TimestampNTZType)):
        return F.floor(F.unix_micros(col) / F.lit(int(width * 1_000_000)))
    return F.floor(col.cast("double") / F.lit(float(width))).cast("long")


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: float,
    on: list[str] | None = None,
    include_start: bool = True,
    include_end: bool = True,
    how: str = "inner",
) -> DataFrame:
    """Join point rows into containing intervals via bin-bucketed equi-join.

    ``bin_width`` is in SECONDS for timestamp columns, else in the column's
    own units. Choose it near the typical interval length: replication
    factor per interval is ``ceil(len/W) + 1``; a too-small W explodes the
    interval side, a too-huge W degrades toward a 1-bucket nested loop.
    Intervals with ``end < start`` are dropped (never match by definition).

    ``how``: 'inner' (default) or 'left' — left keeps unmatched POINT rows
    with nulls on the interval side (attribution-style "event with no
    containing window").

    Column-name collisions between the two inputs are the caller's to
    resolve (same contract as DataFrame.join).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"range_join supports how='inner'|'left', got {how!r}")
    on = list(on or [])

    p_dt = points.schema[point_col].dataType
    s_dt = intervals.schema[start_col].dataType

    pt = points.withColumn("_rj_bin", _bin_expr(F.col(point_col), p_dt, bin_width))

    lo = _bin_expr(F.col(start_col), s_dt, bin_width)
    hi = _bin_expr(F.col(end_col), s_dt, bin_width)
    iv = (
        intervals.where(F.col(end_col) >= F.col(start_col))
        .withColumn("_rj_bin", F.explode(F.sequence(lo, hi)))
        .withColumnRenamed(start_col, f"_rj_{start_col}")
        .withColumnRenamed(end_col, f"_rj_{end_col}")
    )
    # Rename interval-side key columns so the equi-join condition is explicit
    # and the output keeps the point side's key columns only once.
    for k in on:
        iv = iv.withColumnRenamed(k, f"_rj_{k}")

    cond = pt["_rj_bin"] == iv["_rj_bin"]
    for k in on:
        cond = cond & (pt[k] == iv[f"_rj_{k}"])
    ge = (
        (F.col(point_col) >= F.col(f"_rj_{start_col}"))
        if include_start
        else (F.col(point_col) > F.col(f"_rj_{start_col}"))
    )
    le = (
        (F.col(point_col) <= F.col(f"_rj_{end_col}"))
        if include_end
        else (F.col(point_col) < F.col(f"_rj_{end_col}"))
    )

    joined = pt.join(iv, cond & ge & le, how)
    drop = ["_rj_bin"] + [f"_rj_{k}" for k in on]
    out = joined.drop(*drop)
    return (
        out.withColumnRenamed(f"_rj_{start_col}", start_col).withColumnRenamed(
            f"_rj_{end_col}", end_col
        )
    )
