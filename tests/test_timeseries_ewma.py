"""EWMA fold (operators/timeseries.ewma) vs a sequential python replay."""

from datetime import datetime, timedelta

from torcdb_spark.operators.timeseries import ewma


def _r6(x):
    import math
    return math.floor(x * 1_000_000 + 0.5) / 1_000_000


def _replay(xs, a=0.25):
    y, dev = xs[0], 0.0
    for x in xs[1:]:
        yn = a * x + (1 - a) * y
        dev = max(dev, abs(x - yn))
        y = yn
    return y, dev


def test_ewma_matches_python_replay(spark):
    base = datetime(2024, 1, 1)
    series = {1: [10.0, 20.0, 0.0, 5.0, 40.0], 2: [3.0], 3: [7.0, 7.0]}
    rows = [
        (k, base + timedelta(seconds=i), i, x)
        for k, xs in series.items()
        for i, x in enumerate(xs)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, value double"
    )
    got = {
        r["user_id"]: r
        for r in ewma(
            df, ["user_id"], "ts", "value", 0.25, "event_id"
        ).collect()
    }
    for k, xs in series.items():
        y, dev = _replay(xs)
        r = got[k]
        assert r["n_points"] == len(xs)
        assert r["last_raw"] == _r6(xs[-1])
        assert r["last_ewma"] == _r6(y)
        assert r["max_abs_dev"] == _r6(dev)


def test_ewma_order_is_by_ts_then_tiebreak(spark):
    base = datetime(2024, 1, 1)
    # same ts for two points: event_id must break the tie
    rows = [(1, base, 2, 100.0), (1, base, 1, 0.0)]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, value double"
    )
    r = ewma(df, ["user_id"], "ts", "value", 0.25, "event_id").collect()[0]
    # order: 0.0 then 100.0 -> ewma = 25.0
    assert r["last_ewma"] == 25.0
