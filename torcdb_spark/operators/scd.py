"""Slowly-changing-dimension (SCD Type 2) history build from a change
feed — the standard lakehouse pattern for keeping full attribute history
with validity intervals instead of overwriting in place.

Pure window algebra (lag to collapse no-op changes, lead to close
intervals): one shuffle on the business key, deterministic, and exactly
replicable by a SQL oracle. At 100 TB the key-partitioned window is the
whole cost; there is no state beyond one partition's sort.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_build(
    changes: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    ts_col: str = "ts",
) -> DataFrame:
    """Build the Type-2 dimension → (key…, attr…, valid_from, valid_to,
    is_current).

    Semantics: order each key's change feed by (ts, attr…) — the attr
    tie-break makes simultaneous changes deterministic — drop records
    whose attributes equal the previous surviving record's (no-op
    changes), then each surviving version is valid from its own timestamp
    until the NEXT version's timestamp (NULL valid_to = current row).

    The no-op collapse compares against the previous RAW record, not the
    previous survivor — for a feed like A,A,B,A that keeps A,B,A (runs
    collapse; alternations survive), which is the standard
    change-data-capture reading of 'no-op'."""
    w = Window.partitionBy(*key_cols).orderBy(ts_col, *attr_cols)
    prev_same = [
        F.lag(F.col(c)).over(w).eqNullSafe(F.col(c)) for c in attr_cols
    ]
    changed = changes.select(*key_cols, *attr_cols, ts_col).withColumn(
        "_noop",
        # explicit first-row guard: eqNullSafe(lag=NULL, attr=NULL) would
        # read as 'same' and wrongly drop a key's first version when its
        # attributes are NULL
        (F.row_number().over(w) > 1)
        & reduce(lambda a, b: a & b, prev_same),
    ).where(~F.col("_noop"))
    w2 = Window.partitionBy(*key_cols).orderBy(ts_col, *attr_cols)
    return changed.select(
        *key_cols,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(F.col(ts_col)).over(w2).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())
