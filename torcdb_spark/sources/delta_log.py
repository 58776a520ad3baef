"""Delta-Lake transaction-log replay — pure DataFrame ops.

A Delta table's state is its ``_delta_log/*.json`` action stream (the
public Delta protocol spec: one JSON object per line, ``add`` /
``remove`` / ``metaData`` / ``commitInfo`` actions); every reader
reconstructs the active-file snapshot by replaying adds against later
removes.  This module does that reconciliation as DataFrame
expressions — ``from_json`` under the action schema, a window over
per-path action history, and a latest-action filter — so the replay is
whole-stage-codegen JVM work that scales to the multi-million-file
logs of a 100 TB lakehouse table with one shuffle on the file path.
Time travel falls out for free: cap the replay at ``version``.

No Delta runtime is required or used — this reads the open on-disk
protocol, the same way sources/warc.py reads ISO 28500.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# The action fields the snapshot replay needs (the protocol allows —
# and readers must tolerate — unknown sibling fields; from_json under a
# partial schema gives exactly that tolerance)
ACTION_SCHEMA = T.StructType([
    T.StructField("add", T.StructType([
        T.StructField("path", T.StringType()),
        T.StructField("size", T.LongType()),
        T.StructField("partitionValues",
                      T.MapType(T.StringType(), T.StringType())),
        T.StructField("dataChange", T.BooleanType()),
    ])),
    T.StructField("remove", T.StructType([
        T.StructField("path", T.StringType()),
        T.StructField("dataChange", T.BooleanType()),
    ])),
    T.StructField("metaData", T.StructType([
        T.StructField("id", T.StringType()),
        T.StructField("schemaString", T.StringType()),
    ])),
])


def delta_active_files(
    log: DataFrame,
    version: Column | int | None = None,
    version_col: str = "version",
    line_col: str = "line",
    pos_col: str | None = None,
) -> DataFrame:
    """(version, json-line) action rows → the table's ACTIVE file
    snapshot: ``path, size, partition_values, added_version`` — one
    row per data file whose latest action at or below ``version``
    (None = latest) is an ``add``.  The replay is the Delta protocol's
    snapshot rule: per path, the LAST action in log order wins.  Log
    order within a commit is the JSON line order; pass ``pos_col``
    (a line-position column, e.g. from a per-file line index) to
    tie-break exactly.  Without it, a remove is assumed to supersede an
    add of the same path within one commit — correct for every writer
    that compacts self-cancelling actions per the protocol's
    recommendation, but an intra-commit remove-then-re-add
    (resurrection in one commit) would be dropped; supply ``pos_col``
    if the source can produce one.  One hash shuffle on path; no
    driver-side state, so a multi-million-file log replays
    distributed."""
    pos = (F.col(pos_col).cast("long") if pos_col is not None
           else F.lit(None).cast("long"))
    acts = log.select(
        F.col(version_col).cast("long").alias("_v"),
        pos.alias("_pos"),
        F.from_json(F.col(line_col), ACTION_SCHEMA).alias("a"),
    )
    if version is not None:
        acts = acts.where(F.col("_v") <= F.lit(version))
    # normalize to (path, is_add, payload); _ord is the no-pos fallback
    # tie-break (remove supersedes add within a commit)
    adds = acts.where(F.col("a.add.path").isNotNull()).select(
        F.col("a.add.path").alias("path"),
        F.lit(1).alias("_is_add"),
        F.lit(0).alias("_ord"),
        F.col("_v"),
        F.col("_pos"),
        F.col("a.add.size").alias("size"),
        F.col("a.add.partitionValues").alias("partition_values"),
    )
    removes = acts.where(F.col("a.remove.path").isNotNull()).select(
        F.col("a.remove.path").alias("path"),
        F.lit(0).alias("_is_add"),
        F.lit(1).alias("_ord"),
        F.col("_v"),
        F.col("_pos"),
        F.lit(None).cast("long").alias("size"),
        F.lit(None).cast("map<string,string>").alias("partition_values"),
    )
    w = Window.partitionBy("path").orderBy(
        F.col("_v").desc(), F.col("_pos").desc_nulls_last(),
        F.col("_ord").desc()
    )
    return (
        adds.unionByName(removes)
        .withColumn("_rn", F.row_number().over(w))
        .where((F.col("_rn") == 1) & (F.col("_is_add") == 1))
        .select(
            "path",
            "size",
            "partition_values",
            F.col("_v").alias("added_version"),
        )
    )


def delta_log_lines(spark, commits, with_pos: bool = False) -> DataFrame:
    """Fixture synthesis: ``[(version, [action_dict, ...]), ...]`` →
    a (version, line) DataFrame of protocol-shaped JSON lines (driver-
    side json.dumps — fixtures only; real logs arrive as files).
    ``with_pos=True`` adds the within-commit line index as ``pos`` for
    the exact intra-commit tie-break in :func:`delta_active_files`."""
    import json

    rows = [
        (int(v), int(i), json.dumps(a, sort_keys=True))
        for v, actions in commits
        for i, a in enumerate(actions)
    ]
    df = spark.createDataFrame(rows, "version long, pos long, line string")
    return df if with_pos else df.drop("pos")
