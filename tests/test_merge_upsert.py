"""merge_upsert: partition-scoped MERGE semantics — updates win on key,
new keys append, untouched partitions' files are left physically alone."""

import glob
import os

import pyspark.sql.functions as F

from torcdb_spark.sources.maintenance import merge_upsert


def _mk_base(spark, path):
    spark.createDataFrame(
        [(1, "2024-01-01", 10.0), (2, "2024-01-01", 20.0),
         (3, "2024-01-02", 30.0), (4, "2024-01-03", 40.0)],
        "k long, day string, v double",
    ).write.partitionBy("day").parquet(path)


def test_merge_upsert_updates_and_inserts(spark, tmp_path):
    path = str(tmp_path / "tbl")
    _mk_base(spark, path)
    updates = spark.createDataFrame(
        [(2, "2024-01-01", 99.0),   # update existing key
         (5, "2024-01-02", 50.0)],  # new key in existing partition
        "k long, day string, v double",
    )
    stats = merge_upsert(spark, path, updates, ["k"], "day")
    assert stats["touched_partitions"] == ["2024-01-01", "2024-01-02"]
    got = {
        # partition-column type inference reads day= back as DATE;
        # stringify for a layout-independent compare
        r["k"]: (str(r["day"]), r["v"])
        for r in spark.read.parquet(path).collect()
    }
    assert got == {
        1: ("2024-01-01", 10.0),
        2: ("2024-01-01", 99.0),
        3: ("2024-01-02", 30.0),
        4: ("2024-01-03", 40.0),
        5: ("2024-01-02", 50.0),
    }


def test_merge_upsert_leaves_untouched_partitions_alone(spark, tmp_path):
    path = str(tmp_path / "tbl2")
    _mk_base(spark, path)
    before = set(glob.glob(f"{path}/day=2024-01-03/*.parquet"))
    mtimes = {f: os.path.getmtime(f) for f in before}
    updates = spark.createDataFrame(
        [(1, "2024-01-01", 11.0)], "k long, day string, v double"
    )
    merge_upsert(spark, path, updates, ["k"], "day")
    after = set(glob.glob(f"{path}/day=2024-01-03/*.parquet"))
    assert after == before
    for f in after:
        assert os.path.getmtime(f) == mtimes[f]
    # and the overwrite-mode conf is restored
    assert spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode", "static"
    ) != "dynamic"
