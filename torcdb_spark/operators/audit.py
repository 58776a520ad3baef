"""Declarative data-quality constraint auditing — the validation gate a
training-data pipeline runs before a corpus snapshot is blessed (the
Deequ/Great-Expectations role, re-expressed as plain Catalyst
aggregates).

Scale shape: every ROW-LEVEL rule (not-null, set membership, range,
regex, arbitrary boolean expression) folds into ONE conditional-sum
aggregate over ONE scan of the table — auditing 40 rules costs the same
single pass as auditing one. Uniqueness rules ride the same aggregate via
``count_distinct``. Referential rules are the only ones that need a
second relation, and they run as a broadcast-able left-anti join on the
key. Nothing collects to the driver; the audit result IS a DataFrame
(one row per rule), so it composes with thresholds, history tables, and
alerting downstream.

Null semantics: a row VIOLATES a rule when the rule's predicate does not
evaluate to TRUE (SQL three-valued logic folded with ``coalesce(pred,
false)``) — a NULL in a range check is a violation, matching the
fail-closed stance a data gate needs.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class RowRule:
    """A per-row predicate; violation = predicate is not TRUE."""

    name: str
    predicate: Column


@dataclass(frozen=True)
class UniqueRule:
    """Key-uniqueness; violations = rows beyond the first per key."""

    name: str
    cols: tuple[str, ...]


@dataclass(frozen=True)
class ForeignKeyRule:
    """Referential integrity; violations = rows whose key misses ``ref``.

    ``ref`` is joined left-anti on the key pair — broadcast when small.
    """

    name: str
    col: str
    ref: DataFrame
    ref_col: str


def not_null(col: str) -> RowRule:
    return RowRule(f"not_null({col})", F.col(col).isNotNull())


def in_set(col: str, values: list) -> RowRule:
    return RowRule(
        f"in_set({col})", F.col(col).isin(values)
    )


def in_range(col: str, lo, hi) -> RowRule:
    return RowRule(
        f"in_range({col})",
        (F.col(col) >= F.lit(lo)) & (F.col(col) <= F.lit(hi)),
    )


def matches(col: str, regex: str) -> RowRule:
    return RowRule(f"matches({col})", F.col(col).rlike(regex))


def satisfies(name: str, predicate: Column) -> RowRule:
    return RowRule(name, predicate)


def unique(*cols: str) -> UniqueRule:
    return UniqueRule(f"unique({','.join(cols)})", tuple(cols))


def foreign_key(col: str, ref: DataFrame, ref_col: str) -> ForeignKeyRule:
    return ForeignKeyRule(f"foreign_key({col})", col, ref, ref_col)


def constraint_audit(df: DataFrame, rules: list) -> DataFrame:
    """Audit ``df`` against ``rules`` → (rule, n_checked, n_violations,
    passed), one output row per rule in a deterministic order.

    All RowRules and UniqueRules share ONE aggregate over ONE scan;
    each ForeignKeyRule adds one anti-join count. The per-rule rows
    unpivot from the single 1-row aggregate with an in-plan explode —
    NOT a union of per-rule selects, which Catalyst would execute as one
    scan per branch (no common-subplan reuse across union arms; verified
    in tests/test_plans.py). No driver collect anywhere."""
    aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
    for r in rules:
        if isinstance(r, RowRule):
            aggs.append(
                F.sum(
                    F.when(F.coalesce(r.predicate, F.lit(False)), 0).otherwise(1)
                ).cast("long").alias(r.name)
            )
        elif isinstance(r, UniqueRule):
            aggs.append(
                (F.count(F.lit(1)) - F.count_distinct(*[F.col(c) for c in r.cols]))
                .cast("long").alias(r.name)
            )
    stats = df.agg(*aggs)

    scan_entries = [
        F.struct(
            F.lit(r.name).alias("rule"),
            F.col("__n").alias("n_checked"),
            F.col(r.name).alias("n_violations"),
        )
        for r in rules
        if isinstance(r, (RowRule, UniqueRule))
    ]
    fk_rules = [r for r in rules if isinstance(r, ForeignKeyRule)]
    bad = [
        r for r in rules
        if not isinstance(r, (RowRule, UniqueRule, ForeignKeyRule))
    ]
    if bad:
        raise TypeError(f"unknown rule type: {type(bad[0]).__name__}")

    parts = []
    if scan_entries:
        parts.append(
            stats.select(F.explode(F.array(*scan_entries)).alias("r"))
            .select("r.*")
        )
    for r in fk_rules:
        # one LEFT join + conditional count yields n_checked AND the
        # dangling count in a single pass over df (an anti-join would
        # need a second scan just for the denominator). No broadcast
        # hint: the reference table may be arbitrarily large — AQE
        # picks broadcast on its own when the deduped key set is small.
        # NULL fk values are NOT violations (SQL `NOT IN` semantics —
        # a NULL key asserts nothing; a RowRule isNotNull predicate
        # covers presence separately).
        parts.append(
            df.join(
                r.ref.select(F.col(r.ref_col).alias("__k")).distinct(),
                F.col(r.col) == F.col("__k"),
                "left",
            )
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_checked"),
                F.sum(
                    F.when(
                        F.col("__k").isNull() & F.col(r.col).isNotNull(), 1
                    ).otherwise(0)
                )
                .cast("long").alias("n_violations"),
            )
            .select(
                F.lit(r.name).alias("rule"), "n_checked", "n_violations"
            )
        )

    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.withColumn("passed", F.col("n_violations") == 0)
