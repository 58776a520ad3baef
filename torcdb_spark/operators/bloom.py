"""Bloom-filter sketch: mergeable set-membership summaries with md5
bucketing — fourth member of the mergeable-sketch family (HLL distinct
counts, histogram distributions, CMS frequencies, Bloom membership).

The filter is a DataFrame of (word, bits) rows — a 32-bit word per row,
``m_bits/32`` rows at most, regardless of key cardinality — so it
broadcasts, merges with a ``bit_or`` groupBy, and probes with an equi-join.
The classic use at 100 TB is the bloom-pruned semi-join: build the filter
over the small side's keys, probe the big side map-side (broadcast join +
bitwise AND), and only survivors reach the real join's shuffle — false
positives cost a little extra shuffle, never correctness.

md5 bucketing (like operators/cms.py) keeps every bit position
deterministic, so build, merge, and probe are exactly reproducible in a
SQL oracle; approximation means bounded false-POSITIVE rate only
(``(1 - e^{-dn/m})^d``), never false negatives — pytest-proven.

32-bit words (not 64): ``1 << 63`` overflows signed arithmetic in common
SQL engines, while every 32-bit word value stays positive in a BIGINT, so
the oracle's bit arithmetic is portable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WORD_BITS = 32


def _position(key: Column, row: int, m_bits: int, seed: int) -> Column:
    """Deterministic bit position for (key, hash-row): first 8 md5 hex
    chars → int % m_bits (same md5 scheme as operators/cms.py)."""
    h = F.md5(F.concat(key.cast("string"), F.lit(f":{row}:{seed}")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % m_bits


def bloom_build(
    df: DataFrame,
    key_col: str,
    m_bits: int = 4096,
    d: int = 3,
    seed: int = 0,
) -> DataFrame:
    """Build the filter → (word, bits): d bit positions per key, packed
    into 32-bit words via a ``bit_or`` aggregate. One partial-aggregated
    shuffle over ≤ m_bits/32 groups; key cardinality irrelevant. Union any
    number of filters and ``bloom_merge`` to combine."""
    pos = F.explode(
        F.array(*[
            _position(F.col(key_col), i, m_bits, seed) for i in range(d)
        ])
    ).alias("_p")
    return (
        df.select(pos)
        .select(
            F.floor(F.col("_p") / WORD_BITS).cast("long").alias("word"),
            # F.shiftleft only takes a literal shift — the SQL form accepts
            # a column-valued one
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(_p % {WORD_BITS} AS INT))"
            ).alias("_b"),
        )
        .groupBy("word")
        .agg(F.bit_or("_b").alias("bits"))
    )


def bloom_merge(filters: DataFrame) -> DataFrame:
    """Merge a union of same-shaped filters: words OR together."""
    return filters.groupBy("word").agg(F.bit_or("bits").alias("bits"))


def bloom_might_contain(
    bloom: DataFrame,
    probes: DataFrame,
    key_col: str,
    m_bits: int = 4096,
    d: int = 3,
    seed: int = 0,
) -> DataFrame:
    """Probe → probes + ``might_contain`` boolean. The filter side is ≤
    m_bits/32 rows — broadcast equi-join on the word id; a probe passes iff
    ALL d of its bits are set. Guaranteed no false negatives."""
    probe_bits = probes.select(
        F.col(key_col),
        F.posexplode(
            F.array(*[
                _position(F.col(key_col), i, m_bits, seed) for i in range(d)
            ])
        ).alias("_i", "_p"),
    ).select(
        key_col,
        F.floor(F.col("_p") / WORD_BITS).cast("long").alias("word"),
        F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST(_p % {WORD_BITS} AS INT))"
        ).alias("_b"),
    )
    checked = (
        probe_bits.join(F.broadcast(bloom), "word", "left")
        .select(
            key_col,
            (
                F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("_b"))
                == F.col("_b")
            ).cast("int").alias("_hit"),
        )
        .groupBy(key_col)
        .agg((F.sum("_hit") == d).alias("might_contain"))
    )
    return probes.join(checked, key_col, "left")


def bloom_oracle_sql(
    build_sql: str,
    build_key: str,
    probe_sql: str,
    probe_key: str,
    m_bits: int = 4096,
    d: int = 3,
    seed: int = 0,
) -> str:
    """The identical build+probe spelled in SQL (md5 positions, 32-bit
    words, bit_or packing), summarized as (n_probed, n_pass, n_true,
    n_false_pos) so the oracle verifies the filter's exact contents AND
    its no-false-negative contract in one row."""
    def position(col: str, i: int) -> str:
        h = f"md5(CAST({col} AS VARCHAR) || ':{i}:{seed}')"
        return f"(CAST(('0x' || substring({h}, 1, 8)) AS BIGINT) % {m_bits})"

    build_pos = " UNION ALL ".join(
        f"SELECT {position(build_key, i)} AS p FROM build_side"
        for i in range(d)
    )
    probe_pos = " UNION ALL ".join(
        f"SELECT k, {position('k', i)} AS p FROM probe_keys"
        for i in range(d)
    )
    return f"""WITH build_side AS ({build_sql}),
       probe_keys AS (SELECT {probe_key} AS k FROM ({probe_sql}) _pq),
       bpos AS ({build_pos}),
       bloom AS (
         SELECT (p // {WORD_BITS}) AS word,
                bit_or(CAST(1 AS BIGINT) << CAST(p % {WORD_BITS} AS INTEGER)) AS bits
         FROM bpos GROUP BY 1
       ),
       ppos AS ({probe_pos}),
       pbits AS (
         SELECT k, (p // {WORD_BITS}) AS word,
                CAST(1 AS BIGINT) << CAST(p % {WORD_BITS} AS INTEGER) AS b
         FROM ppos
       ),
       checked AS (
         SELECT pb.k,
                CASE WHEN (COALESCE(bl.bits, 0) & pb.b) = pb.b THEN 1 ELSE 0 END AS hit
         FROM pbits pb LEFT JOIN bloom bl USING (word)
       ),
       verdicts AS (
         SELECT k, (SUM(hit) = {d}) AS might FROM checked GROUP BY k
       ),
       truth AS (
         SELECT v.k, v.might, (b.{build_key} IS NOT NULL) AS actual
         FROM verdicts v
         LEFT JOIN (SELECT DISTINCT {build_key} FROM build_side) b
           ON v.k = b.{build_key}
       )
       SELECT CAST(COUNT(*) AS BIGINT) AS n_probed,
              CAST(SUM(CASE WHEN might THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
              CAST(SUM(CASE WHEN actual THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
              CAST(SUM(CASE WHEN might AND NOT actual THEN 1 ELSE 0 END) AS BIGINT)
                AS n_false_pos
       FROM truth"""
