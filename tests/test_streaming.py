"""Structured Streaming tests: file source over the events fixture, memory
sink, asserting batch/stream equivalence for the windowed aggregation and
plumbing for sessionization + streaming dedup."""

import pyspark.sql.functions as F
import pytest

from torcdb_spark.sources.tables import load_table
from torcdb_spark.streaming import (
    events_stream,
    sessionized_stream,
    streaming_dedup,
    windowed_counts,
)
from torcdb_spark.streaming.jobs import run_to_memory


@pytest.fixture(scope="module")
def events_dir(sf_dir, tmp_path_factory):
    # the file-stream source lists a DIRECTORY; expose the fixture file
    # through a symlinked dir
    d = tmp_path_factory.mktemp("events_stream")
    (d / "events.parquet").symlink_to(f"{sf_dir}/events.parquet")
    return str(d)


@pytest.fixture(scope="module")
def stream(spark, events_dir):
    return events_stream(spark, events_dir)


def test_windowed_counts_stream_equals_batch(spark, sf_dir, stream):
    run_to_memory(windowed_counts(stream), "wc", output_mode="complete")
    got = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in spark.table("wc").collect()
    }
    ev = load_table(spark, sf_dir, "events")
    exp_df = (
        ev.groupBy(F.window("ts", "15 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("s"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("ws"),
            "event_type",
            "n",
            "s",
        )
    )
    exp = {(r.ws, r.event_type): (r.n, r.s) for r in exp_df.collect()}
    assert got == exp


def test_sessionized_stream_runs(spark, stream):
    run_to_memory(sessionized_stream(stream), "sess", output_mode="complete")
    rows = spark.table("sess").collect()
    assert len(rows) > 0
    for r in rows:
        assert r.n_events >= 1
        assert r.session_start <= r.session_end


def test_streaming_dedup_append(spark, stream, sf_dir):
    run_to_memory(streaming_dedup(stream), "dd", output_mode="append")
    n = spark.table("dd").count()
    total = load_table(spark, sf_dir, "events").count()
    # event_id is unique in the fixture → dedup is a no-op pass-through
    assert n == total


def test_stateful_user_totals_across_batches(spark, sf_dir, tmp_path_factory):
    """State must accumulate ACROSS micro-batches: split the fixture into
    two files (two maxFilesPerTrigger=1 batches) and check the final
    per-user state equals the batch aggregate over the union."""
    from torcdb_spark.streaming.jobs import stateful_user_totals

    d = tmp_path_factory.mktemp("events_split")
    ev = load_table(spark, sf_dir, "events")
    # load_table already normalized ts to TIMESTAMP; writing it back out
    # produces micros parquet that events_stream's TimestampType schema
    # reads with identical values (session TZ is UTC)
    half = ev.where(F.col("event_id") % 2 == 0)
    other = ev.where(F.col("event_id") % 2 == 1)
    half.coalesce(1).write.parquet(str(d / "a"))
    other.coalesce(1).write.parquet(str(d / "b"))
    import glob
    import shutil

    files = sorted(glob.glob(str(d / "*" / "part-*.parquet")))
    stream_dir = tmp_path_factory.mktemp("events_two_files")
    for i, f in enumerate(files):
        shutil.copy(f, stream_dir / f"{i}.parquet")

    from torcdb_spark.streaming import events_stream

    stream = events_stream(spark, str(stream_dir))
    run_to_memory(stateful_user_totals(stream), "sut", output_mode="update")
    # update mode emits one row per (user, batch); the LAST emission per
    # user is the final state
    rows = spark.table("sut").collect()
    final = {}
    for r in rows:
        final[r.user_id] = (r.n_events, r.sum_value)  # later rows overwrite
    exp = {
        r.user_id: (r.n, r.s)
        for r in ev.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("s"))
        .collect()
    }
    assert set(final) == set(exp)
    for u in exp:
        assert final[u][0] == exp[u][0], (u, final[u], exp[u])
        assert abs(final[u][1] - exp[u][1]) < 0.05


def test_interval_join_stream_equals_batch(spark, sf_dir, stream):
    """Stream-stream interval join result == the identical batch join."""
    from torcdb_spark.streaming.jobs import purchase_click_interval_join

    run_to_memory(
        purchase_click_interval_join(stream), "pcij", output_mode="append"
    )
    got = {(r.purchase_id, r.click_id) for r in spark.table("pcij").collect()}
    ev = load_table(spark, sf_dir, "events")
    from torcdb_spark.streaming.jobs import purchase_click_interval_join as j

    exp = {(r.purchase_id, r.click_id) for r in j(ev).collect()}
    assert got == exp
    assert len(exp) > 0


def test_maintain_rollup_matches_batch_and_is_idempotent(spark, tmp_path):
    """Continuous-aggregate maintenance: two micro-batches refresh the
    daily rollup partitions; the final table equals the batch rollup, and
    a re-drain over the same checkpoint changes nothing."""
    import pyspark.sql.functions as F
    from torcdb_spark.operators.timeseries import rollup
    from torcdb_spark.sources.tables import load_table
    from torcdb_spark.streaming.jobs import EVENT_SCHEMA, maintain_rollup

    sf_dir = "/root/testdata/sf0.001"
    ev = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "src")
    # two files -> two micro-batches with maxFilesPerTrigger=1
    ev.where(F.col("event_id") % 2 == 0).write.parquet(src)
    ev.where(F.col("event_id") % 2 == 1).write.mode("append").parquet(src)

    out = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")
    q = maintain_rollup(
        spark, src, EVENT_SCHEMA, out, ckpt,
        width_seconds=86400, keys=["event_type"],
    )
    q.awaitTermination()

    got = {
        (str(r.bucket), r.event_type): (r.n, r.s)
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (str(r.bucket), r.event_type): (r.n, r.s)
        for r in rollup(
            ev, "ts", 86400, ["event_type"],
            [F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("s")],
        ).collect()
    }
    assert got == want
    # idempotent restart: same checkpoint, no new files -> no change
    q2 = maintain_rollup(
        spark, src, EVENT_SCHEMA, out, ckpt,
        width_seconds=86400, keys=["event_type"],
    )
    q2.awaitTermination()
    got2 = {
        (str(r.bucket), r.event_type): (r.n, r.s)
        for r in spark.read.parquet(out).collect()
    }
    assert got2 == want


def test_kafka_decode_json_events(spark):
    """The kafka decode transform on a static wire-schema frame: JSON
    values become typed columns, corrupt rows drop, metadata rides along."""
    import json

    from pyspark.sql import Row, types as T

    from torcdb_spark.streaming.connectors import (
        KAFKA_WIRE_SCHEMA,
        decode_json_events,
        dedup_by_offset,
    )
    import datetime

    def wire(key, value, offset):
        return Row(
            key=key.encode(), value=value.encode(), topic="events",
            partition=0, offset=offset,
            timestamp=datetime.datetime(2024, 1, 1, 0, 0, offset % 60),
            timestampType=0,
        )

    rows = [
        wire("u1", json.dumps({"user_id": 1, "value": 10.0}), 0),
        wire("u1", json.dumps({"user_id": 1, "value": 10.0}), 1),  # replay
        wire("u2", json.dumps({"user_id": 2, "value": 5.0}), 2),
        wire("u3", "NOT JSON {", 3),  # poison pill
    ]
    df = spark.createDataFrame(rows, KAFKA_WIRE_SCHEMA)
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    decoded = decode_json_events(df, schema)
    got = decoded.orderBy("_offset").collect()
    assert [r["user_id"] for r in got] == [1, 1, 2]  # corrupt row dropped
    assert got[0]["_topic"] == "events" and got[0]["_offset"] == 0

    once = dedup_by_offset(decoded, ["user_id"])
    assert once.count() == 2
    u1 = once.where("user_id = 1").first()
    assert u1["_offset"] == 0  # first delivery wins


def test_apply_cdc_stream_merges_into_partitioned_table(spark, tmp_path):
    """End-to-end streaming CDC apply: change files land in a source dir,
    the stream drains them (availableNow) and merge-upserts into the
    partitioned base table; within-batch multiple changes per key collapse
    latest-wins by _seq."""
    from pyspark.sql import types as T

    from torcdb_spark.streaming.jobs import apply_cdc_stream

    base = str(tmp_path / "base")
    src = str(tmp_path / "cdc")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(
        [(1, "p1", 10.0), (2, "p1", 20.0), (3, "p2", 30.0)],
        "k long, part string, v double",
    ).write.partitionBy("part").parquet(base)

    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("part", T.StringType()),
        T.StructField("v", T.DoubleType()),
        T.StructField("_seq", T.LongType()),
    ])
    spark.createDataFrame(
        [(2, "p1", 21.0, 1), (2, "p1", 22.0, 2),   # two updates: seq 2 wins
         (4, "p2", 40.0, 3)],                       # insert
        schema,
    ).write.parquet(src)

    q = apply_cdc_stream(
        spark, src, schema, base, ckpt, key_cols=["k"], partition_col="part"
    )
    q.awaitTermination(120)
    got = {r["k"]: r["v"] for r in spark.read.parquet(base).collect()}
    assert got == {1: 10.0, 2: 22.0, 3: 30.0, 4: 40.0}


def test_history_dedup_across_batches(spark, sf_dir, tmp_path_factory):
    """The stream-static anti-join must drop history hits in EVERY
    micro-batch: split the documents fixture into two files and check
    the appended survivors equal the batch anti-join over the union."""
    from torcdb_spark.operators.text import fingerprint
    from torcdb_spark.streaming.jobs import (
        dedup_against_history,
        docs_stream,
        run_to_memory,
    )

    docs = load_table(spark, sf_dir, "documents")
    d = tmp_path_factory.mktemp("docs_split")
    docs.where(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(str(d / "a"))
    docs.where(F.col("doc_id") % 2 == 1).coalesce(1).write.parquet(str(d / "b"))
    import glob
    import shutil

    stream_dir = tmp_path_factory.mktemp("docs_two_files")
    for i, f in enumerate(sorted(glob.glob(str(d / "*" / "part-*.parquet")))):
        shutil.copy(f, stream_dir / f"{i}.parquet")

    history = (
        docs.where(F.col("doc_id") % 3 == 0)
        .select(fingerprint(F.col("text")).alias("fp"))
        .distinct()
    )
    stream = docs_stream(spark, str(stream_dir)).withColumn(
        "fp", fingerprint(F.col("text"))
    )
    kept = dedup_against_history(stream, history, "fp").select("doc_id")
    run_to_memory(kept, "hist_dedup_2b", output_mode="append")
    got = sorted(r.doc_id for r in spark.table("hist_dedup_2b").collect())

    hist_nt = docs.where(F.col("doc_id") % 3 == 0).select(
        fingerprint(F.col("text")).alias("fp")
    )
    exp = sorted(
        r.doc_id
        for r in docs.withColumn("fp", fingerprint(F.col("text")))
        .join(hist_nt, "fp", "left_anti")
        .select("doc_id")
        .collect()
    )
    assert got == exp and len(got) > 0


def test_streaming_cms_equals_batch_sketch(spark, sf_dir, tmp_path):
    """CMS is linear: the streaming-maintained counters must EQUAL the
    batch sketch of the same rows, cell for cell, across micro-batches."""
    import os

    import pyspark.sql.functions as F

    from torcdb_spark.operators.cms import cms_sketch
    from torcdb_spark.sources.tables import load_table
    from torcdb_spark.streaming import events_stream
    from torcdb_spark.streaming.jobs import run_to_memory, streaming_cms

    ev = load_table(spark, sf_dir, "events")
    # two files → two micro-batches (maxFilesPerTrigger=1)
    d = str(tmp_path / "src")
    os.makedirs(d)
    ev.where("event_id % 2 = 0").coalesce(1).write.parquet(
        d, mode="append"
    )
    ev.where("event_id % 2 = 1").coalesce(1).write.parquet(
        d, mode="append"
    )
    stream = events_stream(spark, d)
    run_to_memory(
        streaming_cms(stream, "user_id", d=4, w=256, seed=3),
        "st_cms_test", output_mode="complete",
    )
    got = sorted(
        map(tuple, spark.table("st_cms_test").collect())
    )
    want = sorted(
        map(tuple, cms_sketch(ev, "user_id", d=4, w=256, seed=3).collect())
    )
    assert got == want
