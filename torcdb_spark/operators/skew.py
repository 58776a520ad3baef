"""Skew-handling join: salted replication for hot keys.

At 100 TB a shuffle join on a key with heavy hitters (one customer with
10^8 orders, one document duplicated everywhere) stalls on a single
reducer. AQE's skew-join splitting (enabled in session.py) handles most
cases at runtime; this operator is the explicit form for when the skew is
known ahead of time or the join sits under an aggregation AQE can't split.

Mechanics: the big (skewed) side gets a deterministic salt in [0, S);
the small side is replicated S times via an inline explode. The join key
becomes (key, salt), spreading each hot key over S reducers. Join output
is IDENTICAL to the unsalted join — salting only changes partitioning —
which is exactly what the oracle-checked query asserts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_buckets: int = 8,
    how: str = "inner",
    salt_source: Column | None = None,
) -> DataFrame:
    """Join ``big ⋈ small`` on column ``on`` with the big side salted over
    ``salt_buckets`` partitions-per-key and the small side replicated.

    ``salt_source`` (default: a deterministic hash of the whole big row's
    key column + monotonically varying bits) controls salt assignment; pass
    a column for reproducible tests. The small side is replicated with
    ``explode(sequence(...))`` — S× its size, so keep it the genuinely
    smaller side (the same constraint a broadcast join has, relaxed by S
    being small).

    Only ``inner``/``left``/``left_semi``/``left_anti`` are supported: for
    right/full outer joins a small-side key with no big-side match would
    surface once per salt bucket (its replicas all fail to match), breaking
    the output-identical-to-unsalted contract."""
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, got {how!r}: "
            "right/full outer would emit unmatched small-side rows once per "
            "salt bucket"
        )
    if salt_source is None:
        # spread rows of the same key: hash the partition-local row id so
        # the salt is cheap, deterministic per task layout, and needs no
        # extra column from the caller
        salt_source = F.monotonically_increasing_id()
    b = big.withColumn("_salt", F.pmod(F.xxhash64(salt_source), F.lit(salt_buckets)))
    s = small.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)).cast("array<bigint>")),
    )
    # SHUFFLE_HASH on the replicated small side (guide §3.1), SCOPED: after
    # salting, each (key, salt) partition of the small side is small by
    # construction — the shuffled-hash build-side condition — and hashing
    # skips the sort of BOTH sides that sort-merge would pay on the
    # deliberately oversized salted big side. But a join-strategy hint
    # overrides size-based broadcast selection, so an unconditional hint
    # would displace a broadcast join whenever the REPLICATED small side
    # still fits the threshold — adding two exchanges where the big side
    # previously never shuffled at all (r13 plan evidence). Apply the hint
    # only when the salted small side's estimated size exceeds
    # autoBroadcastJoinThreshold; when the estimate is unavailable, leave
    # the planner alone (broadcast/AQE decide from sizes).
    if _salted_exceeds_broadcast(small, salt_buckets):
        s = s.hint("shuffle_hash")
    return b.join(s, [on, "_salt"], how).drop("_salt")


def _salted_exceeds_broadcast(small: DataFrame, salt_buckets: int) -> bool:
    """True when ``small`` replicated ``salt_buckets``× is estimated to
    exceed ``spark.sql.autoBroadcastJoinThreshold`` — the only regime where
    forcing a shuffled-hash join cannot displace a (strictly better)
    broadcast join. Uses Catalyst's own compile-time size estimate, the
    same statistic the broadcast decision reads."""
    try:
        thresh = _parse_bytes(
            small.sparkSession.conf.get(
                "spark.sql.autoBroadcastJoinThreshold", "10485760"
            )
        )
        if thresh <= 0:  # auto-broadcast disabled: hint can't displace it
            return True
        est = int(
            small._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
        return est * salt_buckets > thresh
    except Exception:  # pragma: no cover — internal API moved; stay neutral
        return False


def _parse_bytes(v: str) -> int:
    """Parse a Spark byte-size conf value ('67108864', '10MB', '-1')."""
    s = str(v).strip().lower()
    mult = 1
    for suffix, m in (
        ("kb", 1024), ("mb", 1024**2), ("gb", 1024**3), ("tb", 1024**4),
        ("k", 1024), ("m", 1024**2), ("g", 1024**3), ("t", 1024**4),
        ("b", 1),
    ):
        if s.endswith(suffix):
            s = s[: -len(suffix)]
            mult = m
            break
    return int(float(s)) * mult
