"""Snapshot diff (CDC-style): classify rows between two table versions.

A 100 TB training-data pipeline re-lands sources repeatedly; knowing WHAT
changed between snapshots drives incremental downstream work (re-embed only
updated docs, re-run dedup only on inserts). ``table_diff`` classifies every
key as inserted / deleted / updated / unchanged in ONE full-outer equi-join
on the key — no row-by-row compare, no driver state; change detection on
wide rows hashes the non-key columns (xxhash64) so the join carries two
longs per side instead of the full payload.

This is the batch analogue of the streaming CDC feed ``streaming/jobs.py``
consumes; the reference has no equivalent (RAMCloud overwrites in place) —
it is part of the pipeline surface the Spark engine adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """(key_cols..., change) where change ∈ {inserted, deleted, updated
    [, unchanged]}.

    ``compare_cols`` defaults to all shared non-key columns. Each side is
    reduced to (key, fingerprint) BEFORE the join — the shuffle moves
    16 bytes + key per row regardless of row width. Fingerprint collisions
    (two different payloads hashing equal) are possible at 2^-64 per pair;
    callers needing certainty pass explicit narrow compare_cols."""
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in set(key_cols)]

    def fp(df: DataFrame) -> DataFrame:
        return df.select(
            *key_cols,
            F.xxhash64(*[F.col(c) for c in compare_cols]).alias("_fp"),
        )

    o = fp(old).withColumnRenamed("_fp", "_fp_old")
    n = fp(new).withColumnRenamed("_fp", "_fp_new")
    joined = o.join(n, key_cols, "full_outer")
    change = (
        F.when(F.col("_fp_old").isNull(), F.lit("inserted"))
        .when(F.col("_fp_new").isNull(), F.lit("deleted"))
        .when(F.col("_fp_old") != F.col("_fp_new"), F.lit("updated"))
        .otherwise(F.lit("unchanged"))
    )
    out = joined.select(*key_cols, change.alias("change"))
    if not include_unchanged:
        out = out.where(F.col("change") != "unchanged")
    return out


def diff_summary(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """(change, n) counts — the one-line health signal an incremental
    scheduler alerts on (a 90%-deleted diff is a landing bug, not a
    delta)."""
    d = table_diff(old, new, key_cols, compare_cols, include_unchanged=True)
    return d.groupBy("change").agg(F.count("*").cast("long").alias("n"))
