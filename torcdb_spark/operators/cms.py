"""Count-Min sketch: mergeable frequency summaries with md5 bucketing.

Third member of the mergeable-sketch family (HLL for distinct counts,
histogram for distributions, CMS for per-key frequencies): a d×w counter
grid where every key increments one counter per row and reads back the MIN
across rows — overestimates only, with the classic (ε=e/w, δ=e^-d)
guarantee. Counters ADD across partial sketches, so a 100 TB pipeline keeps
a per-partition/day sketch and answers "how often did key k appear" without
rescanning, at d*w integers of state regardless of key cardinality.

Bucketing uses md5 (like operators/sampling.py) rather than xxhash64:
identical everywhere, so the whole sketch — build, merge, estimate — is
deterministic and exactly reproducible in a SQL oracle; approximation here
means bounded OVERcount, not nondeterminism.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _digest(key: Column, group: int, seed: int) -> Column:
    """One md5 digest covers FOUR sketch rows: 32 hex chars slice into
    4×8-char chunks (32 bits each — plenty for w ≤ 2^20 grids). Hashing
    is the sketch's only per-row CPU, so amortizing the digest 4× is a
    4× cut in the scan's hot loop; rows beyond 4 re-salt with the group
    index."""
    return F.md5(F.concat(key.cast("string"), F.lit(f":{group}:{seed}")))


def _bucket_from_digest(digest: Column, row: int, w: int) -> Column:
    """Bucket for sketch row ``row``: hex chunk row%4 of its group's
    digest → int % w."""
    off = (row % 4) * 8
    return F.conv(F.substring(digest, 1 + off, 8), 16, 10).cast("long") % w


def _bucket(key: Column, row: int, w: int, seed: int) -> Column:
    """Deterministic bucket for (key, row) — the one-off form used by
    probes (d columns per probe row, so the digest CSE happens in the
    oracle/probe plan anyway)."""
    return _bucket_from_digest(_digest(key, row // 4, seed), row, w)


def cms_sketch(
    df: DataFrame,
    key_col: str,
    d: int = 4,
    w: int = 1024,
    seed: int = 0,
) -> DataFrame:
    """Build the sketch: (row, bucket, n) — at most d*w rows out, one
    partial-aggregated shuffle in, key cardinality irrelevant. Union any
    number of sketches and ``cms_merge`` to combine."""
    n_groups = (d + 3) // 4
    staged = df.select(
        *[
            _digest(F.col(key_col), g, seed).alias(f"_dg{g}")
            for g in range(n_groups)
        ]
    )
    rows = F.explode(
        F.array(*[
            F.struct(
                F.lit(i).alias("row"),
                _bucket_from_digest(
                    F.col(f"_dg{i // 4}"), i, w
                ).alias("bucket"),
            )
            for i in range(d)
        ])
    ).alias("_rb")
    return (
        staged.select(rows)
        .select(F.col("_rb.row").alias("row"), F.col("_rb.bucket").alias("bucket"))
        .groupBy("row", "bucket")
        .agg(F.count("*").cast("long").alias("n"))
    )


def cms_merge(sketches: DataFrame) -> DataFrame:
    """Merge a union of sketches: counters add per (row, bucket)."""
    return sketches.groupBy("row", "bucket").agg(
        F.sum("n").cast("long").alias("n")
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    d: int = 4,
    w: int = 1024,
    seed: int = 0,
) -> DataFrame:
    """Point estimates for a key set: min over the d counters each key
    hashes to → (key_col, est). The sketch side is ≤ d*w rows — broadcast;
    the keys side streams. Guarantees est >= true count, with
    P[est > true + εN] ≤ δ for ε=e/w, δ=e^-d."""
    probes = keys.select(
        F.col(key_col),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("row"),
                    _bucket(F.col(key_col), i, w, seed).alias("bucket"),
                )
                for i in range(d)
            ])
        ).alias("_rb"),
    ).select(
        key_col, F.col("_rb.row").alias("row"), F.col("_rb.bucket").alias("bucket")
    )
    joined = probes.join(F.broadcast(sketch), ["row", "bucket"], "left").select(
        key_col, F.coalesce(F.col("n"), F.lit(0)).alias("_c")
    )
    return joined.groupBy(key_col).agg(F.min("_c").cast("long").alias("est"))


def cms_oracle_sql(
    table: str,
    key_expr: str,
    probe_sql: str,
    d: int = 4,
    w: int = 1024,
    seed: int = 0,
) -> str:
    """The identical build+estimate spelled in SQL (DuckDB md5/conv via
    from_hex is awkward — use a manual hex-to-int on the first 8 chars),
    so the sketch's exact values — not just its bounds — are verifiable."""
    def bucket(col: str, i: int) -> str:
        # hex chunk i%4 of the group digest -> BIGINT, portably
        # (mirrors _bucket_from_digest: one digest covers 4 rows)
        h = f"md5(CAST({col} AS VARCHAR) || ':{i // 4}:{seed}')"
        off = (i % 4) * 8
        return (
            f"(CAST(('0x' || substring({h}, {1 + off}, 8)) AS BIGINT) % {w})"
        )

    build_rows = " UNION ALL ".join(
        f"SELECT {i} AS row, {bucket(key_expr, i)} AS bucket FROM {table}"
        for i in range(d)
    )
    probe_rows = " UNION ALL ".join(
        f"SELECT k, {i} AS row, {bucket('k', i)} AS bucket FROM probe_keys"
        for i in range(d)
    )
    return f"""WITH cells AS ({build_rows}),
       sketch AS (
         SELECT row, bucket, CAST(COUNT(*) AS BIGINT) AS n
         FROM cells GROUP BY 1, 2
       ),
       probe_keys AS ({probe_sql}),
       probes AS ({probe_rows}),
       est AS (
         SELECT p.k, MIN(COALESCE(s.n, 0)) AS est
         FROM probes p LEFT JOIN sketch s USING (row, bucket)
         GROUP BY p.k
       )
       SELECT k, CAST(est AS BIGINT) AS est FROM est"""
