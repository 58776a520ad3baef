"""Unit tests for the round-4 operator families: funnel/cohort/anomaly
behavioral analytics, Bloom + KMV sketches, blocked entity resolution,
repetition signals, and HITS — small in-memory inputs with hand-computed
answers plus the operators' structural guarantees (no false negatives,
merge == union, estimate error bounds)."""

import datetime as dt
import math

import pyspark.sql.functions as F
import pytest

from torcdb_spark.operators.bloom import (
    bloom_build,
    bloom_merge,
    bloom_might_contain,
)
from torcdb_spark.operators.er import blocked_levenshtein_pairs
from torcdb_spark.operators.funnel import cohort_retention, funnel_stages
from torcdb_spark.operators.text import repetition_signals
from torcdb_spark.operators.theta import (
    kmv_estimate,
    kmv_intersect_estimate,
    kmv_sketch,
)
from torcdb_spark.operators.timeseries import trailing_zscore


def _ts(day, hour=0, minute=0):
    return dt.datetime(2024, 1, day, hour, minute)


# ---------------------------------------------------------------------------
# funnel
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def funnel_events(spark):
    rows = [
        # u1 converts fully within a day
        (1, _ts(1, 0), "view"), (1, _ts(1, 1), "click"), (1, _ts(1, 2), "purchase"),
        # u2: clicks but purchase comes BEFORE the click -> no stage 3
        (2, _ts(1, 0), "view"), (2, _ts(1, 5), "click"), (2, _ts(1, 3), "purchase"),
        # u3: click outside the 1-day window of the first view
        (3, _ts(1, 0), "view"), (3, _ts(3, 0), "click"),
        # u4: click with no prior view -> never enters the funnel
        (4, _ts(1, 0), "click"), (4, _ts(1, 1), "purchase"),
        # u5: two views; funnel anchors at the FIRST view; click after 2nd
        (5, _ts(1, 0), "view"), (5, _ts(1, 10), "view"), (5, _ts(1, 11), "click"),
    ]
    return spark.createDataFrame(rows, ["user_id", "ts", "event_type"])


def test_funnel_hand_computed(funnel_events):
    out = {
        r.stage: (r.stage_idx, r.users)
        for r in funnel_stages(
            funnel_events, ["view", "click", "purchase"]
        ).collect()
    }
    # views: u1,u2,u3,u5 ; clicks within window after view: u1,u2,u5 ;
    # purchase after the click: u1 only
    assert out == {"view": (1, 4), "click": (2, 3), "purchase": (3, 1)}


def test_funnel_requires_two_steps(funnel_events):
    with pytest.raises(ValueError):
        funnel_stages(funnel_events, ["view"])


# ---------------------------------------------------------------------------
# cohort retention
# ---------------------------------------------------------------------------


def test_cohort_retention_hand_computed(spark):
    # 2024-01-01 is a Monday. u1 first in week0, active weeks 0 and 2;
    # u2 first in week1, active weeks 1,2; u3 only week0.
    rows = [
        (1, _ts(1)), (1, _ts(2)), (1, _ts(15)),
        (2, _ts(8)), (2, _ts(16)),
        (3, _ts(3)),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts"])
    out = {
        (str(r.cohort_week), r.week_offset): r.users
        for r in cohort_retention(ev).collect()
    }
    assert out == {
        ("2024-01-01", 0): 2,  # u1, u3
        ("2024-01-01", 2): 1,  # u1
        ("2024-01-08", 0): 1,  # u2
        ("2024-01-08", 1): 1,  # u2
    }


# ---------------------------------------------------------------------------
# trailing z-score
# ---------------------------------------------------------------------------


def test_trailing_zscore_hand_computed(spark):
    # key 'a': 9 days; days 1..7 all total=10, day 8 total=10 (z=NULL, sd=0),
    # day 9 vs trailing {10x6, 20} -> mean/std hand-computed
    rows = []
    for d in range(1, 8):
        rows.append(("a", _ts(d), 10.0))
    rows.append(("a", _ts(8), 20.0))
    rows.append(("a", _ts(9), 50.0))
    df = spark.createDataFrame(rows, ["event_type", "ts", "value"])
    out = {str(r.day): r for r in trailing_zscore(df, ["event_type"]).collect()}
    # first 7 days: no full window
    for d in range(1, 8):
        assert out[f"2024-01-0{d}"].z is None
        assert out[f"2024-01-0{d}"].is_anomaly is False
    # day 8: window = 7x10.0, sd = 0 -> z NULL
    assert out["2024-01-08"].z is None
    # day 9: window = {10x6, 20}: mean=80/7, sd=sqrt(sum((x-mu)^2)/6)
    mu = 80.0 / 7
    sd = math.sqrt((6 * (10 - mu) ** 2 + (20 - mu) ** 2) / 6)
    assert out["2024-01-09"].z == pytest.approx(round((50 - mu) / sd, 4))
    assert out["2024-01-09"].is_anomaly is True


# ---------------------------------------------------------------------------
# bloom filter
# ---------------------------------------------------------------------------


def test_bloom_no_false_negatives_and_fp_bounded(spark):
    build = spark.range(0, 500).select(F.col("id").alias("k"))
    probes = spark.range(0, 5000).select(F.col("id").alias("k"))
    bloom = bloom_build(build, "k", m_bits=16384, d=3)
    out = bloom_might_contain(bloom, probes, "k", m_bits=16384, d=3)
    rows = out.collect()
    members = {r.k for r in rows if r.might_contain}
    # every built key passes (no false negatives)
    assert set(range(500)) <= members
    # false-positive rate bounded: fill = 1-e^(-1500/16384) ~ 0.0876,
    # fp ~ fill^3 ~ 6.7e-4; allow 10x headroom on 4500 non-members
    assert len(members - set(range(500))) <= 30


def test_bloom_merge_equals_union_build(spark):
    a = spark.range(0, 100).select(F.col("id").alias("k"))
    b = spark.range(100, 200).select(F.col("id").alias("k"))
    both = a.unionByName(b)
    merged = bloom_merge(
        bloom_build(a, "k", m_bits=2048, d=3).unionByName(
            bloom_build(b, "k", m_bits=2048, d=3)
        )
    )
    direct = bloom_build(both, "k", m_bits=2048, d=3)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


# ---------------------------------------------------------------------------
# KMV / theta sketch
# ---------------------------------------------------------------------------


def test_kmv_exact_when_unsaturated(spark):
    df = spark.range(0, 50).select(F.col("id").alias("k"))
    sk = kmv_sketch(df, "k", k=128)
    est = kmv_estimate(sk, k=128).collect()[0].est_distinct
    assert est == 50.0


def test_kmv_estimate_within_error_when_saturated(spark):
    n = 20000
    df = spark.range(0, n).select(F.col("id").alias("k"))
    sk = kmv_sketch(df, "k", k=256)
    est = kmv_estimate(sk, k=256).collect()[0].est_distinct
    # standard error ~ n/sqrt(k-2) ; allow 4 sigma
    assert abs(est - n) < 4 * n / math.sqrt(254)


def test_kmv_intersection_estimate(spark):
    a = spark.range(0, 3000).select(F.col("id").alias("k"))
    b = spark.range(2000, 5000).select(F.col("id").alias("k"))  # overlap 1000
    sa = kmv_sketch(a, "k", k=256)
    sb = kmv_sketch(b, "k", k=256)
    est = kmv_intersect_estimate(sa, sb, k=256).collect()[0].est_intersection
    assert abs(est - 1000) < 600  # coarse: intersection error compounds


def test_kmv_deterministic(spark):
    df = spark.range(0, 1000).select(F.col("id").alias("k"))
    e1 = kmv_estimate(kmv_sketch(df, "k", k=64), k=64).collect()[0].est_distinct
    e2 = kmv_estimate(
        kmv_sketch(df.repartition(7), "k", k=64), k=64
    ).collect()[0].est_distinct
    assert e1 == e2


# ---------------------------------------------------------------------------
# blocked entity resolution
# ---------------------------------------------------------------------------


def test_blocked_levenshtein_pairs(spark):
    rows = [
        (1, "cold plate"), (2, "old plate"), (3, "bold plate"),
        (4, "steel ring"), (5, "steel king"), (6, "cold bolt"),
    ]
    df = spark.createDataFrame(rows, ["id", "name"])
    out = blocked_levenshtein_pairs(
        df, "id", "name", F.split(F.col("name"), " ")[1], max_distance=2
    ).collect()
    pairs = {(r.id_a, r.id_b): r.dist for r in out}
    # within 'plate' block: cold~old 1, cold~bold 1, old~bold 1;
    # within 'ring'/'king': different blocks -> steel ring/king NOT paired
    assert pairs == {(1, 2): 1, (1, 3): 1, (2, 3): 1}


# ---------------------------------------------------------------------------
# repetition signals
# ---------------------------------------------------------------------------


def test_repetition_signals_hand_computed(spark):
    rows = [
        (1, "a b a b a b"),          # heavy 2-gram repetition
        (2, "one two three four"),   # no repetition
        (3, ""),                     # empty
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in repetition_signals(df).collect()}
    r1 = out[1]
    assert r1.n_words == 6
    assert r1.word_rep_ratio == pytest.approx(round(4 / 6, 6))
    # 2-grams: 'a b' x3, 'b a' x2 -> top is 'a b' covering 3*2=6 of 6 chars
    assert r1.top2_gram == "a b"
    assert r1.top2_frac == 1.0
    # 5-grams: 'a b a b a' x1, 'b a b a b' x1 -> no duplicates
    assert r1.dup5_frac == 0.0
    r2 = out[2]
    assert r2.n_words == 4 and r2.word_rep_ratio == 0.0 and r2.dup5_frac == 0.0
    r3 = out[3]
    assert r3.n_words == 0 and r3.top2_gram is None and r3.top2_frac == 0.0


def test_repetition_signals_dup5(spark):
    # 12 identical words -> every 5-gram identical (8 occurrences)
    df = spark.createDataFrame([(1, " ".join(["x"] * 12))], ["doc_id", "text"])
    r = repetition_signals(df).collect()[0]
    assert r.dup5_frac == 1.0
    assert r.word_rep_ratio == pytest.approx(round(11 / 12, 6))


# ---------------------------------------------------------------------------
# SCD Type 2
# ---------------------------------------------------------------------------


def test_scd2_build_hand_computed(spark):
    from torcdb_spark.operators.scd import scd2_build

    rows = [
        (1, "A", _ts(1)), (1, "A", _ts(2)), (1, "B", _ts(3)), (1, "A", _ts(4)),
    ]
    df = spark.createDataFrame(rows, ["k", "attr", "ts"])
    out = sorted(
        (r.attr, str(r.valid_from), str(r.valid_to), r.is_current)
        for r in scd2_build(df, ["k"], ["attr"]).collect()
    )
    assert out == [
        ("A", "2024-01-01 00:00:00", "2024-01-03 00:00:00", False),
        ("A", "2024-01-04 00:00:00", "None", True),
        ("B", "2024-01-03 00:00:00", "2024-01-04 00:00:00", False),
    ]


def test_scd2_build_null_attr_first_row_survives(spark):
    from pyspark.sql.types import (
        StringType, StructField, StructType, TimestampType, LongType,
    )

    from torcdb_spark.operators.scd import scd2_build

    schema = StructType([
        StructField("k", LongType()), StructField("attr", StringType()),
        StructField("ts", TimestampType()),
    ])
    rows = [(2, None, _ts(1)), (2, None, _ts(2)), (2, "X", _ts(3))]
    df = spark.createDataFrame(rows, schema)
    out = sorted(
        (
            (r.attr, str(r.valid_from), r.is_current)
            for r in scd2_build(df, ["k"], ["attr"]).collect()
        ),
        key=lambda t: (t[0] is not None, t),
    )
    # the NULL first version must survive; the second NULL is a no-op
    assert out == [
        (None, "2024-01-01 00:00:00", False),
        ("X", "2024-01-03 00:00:00", True),
    ]


# ---------------------------------------------------------------------------
# sessionize
# ---------------------------------------------------------------------------


def test_sessionize_hand_computed(spark):
    from torcdb_spark.operators.funnel import sessionize

    rows = [
        (1, _ts(1, 0, 0)), (1, _ts(1, 0, 10)), (1, _ts(1, 0, 50)),
        (1, _ts(1, 2, 0)),
        (2, _ts(1, 0, 0)),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    out = {
        (r.user_id, r.session_id): (str(r.session_start), str(r.session_end), r.n_events)
        for r in sessionize(df, gap_minutes=30).collect()
    }
    assert out == {
        (1, 1): ("2024-01-01 00:00:00", "2024-01-01 00:10:00", 2),
        (1, 2): ("2024-01-01 00:50:00", "2024-01-01 00:50:00", 1),
        (1, 3): ("2024-01-01 02:00:00", "2024-01-01 02:00:00", 1),
        (2, 1): ("2024-01-01 00:00:00", "2024-01-01 00:00:00", 1),
    }


def test_sessionize_gap_boundary_exclusive(spark):
    from torcdb_spark.operators.funnel import sessionize

    # exactly 30:00 gap does NOT break (strict >)
    rows = [(1, _ts(1, 0, 0)), (1, _ts(1, 0, 30))]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    assert sessionize(df, gap_minutes=30).count() == 1


# ---------------------------------------------------------------------------
# BPE training / encoding
# ---------------------------------------------------------------------------


def _reference_bpe(word_counts, num_merges):
    """Plain-Python Sennrich-style BPE on a word-count dict."""
    state = {tuple(w): n for w, n in word_counts.items()}
    merges = []
    for _ in range(num_merges):
        pairs = {}
        for syms, n in state.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] = pairs.get(
                    (syms[i], syms[i + 1]), 0
                ) + n
        if not pairs:
            break
        # deterministic tie-break: highest count, then lexicographically
        # smallest (a, b)
        top = max(pairs.values())
        best = min(p for p, c in pairs.items() if c == top)
        merges.append((best[0], best[1], pairs[best]))
        new_state = {}
        for syms, n in state.items():
            out = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_state[tuple(out)] = new_state.get(tuple(out), 0) + n
        state = new_state
    return merges, state


def test_bpe_train_matches_reference(spark):
    from torcdb_spark.operators.bpe import bpe_train

    corpus = (
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    docs = spark.createDataFrame(
        [(i, w) for i, w in enumerate(corpus)], ["doc_id", "text"]
    )
    got = [
        (r.left, r.right, r.pair_count)
        for r in bpe_train(docs, num_merges=6).orderBy("merge_rank").collect()
    ]
    counts = {}
    for w in corpus:
        counts[w] = counts.get(w, 0) + 1
    expected, _ = _reference_bpe(counts, 6)
    assert got == expected


def test_bpe_adjacent_merge_left_to_right(spark):
    # 'aaa' with best pair (a,a): left-to-right non-overlap -> ['aa','a']
    from torcdb_spark.operators.bpe import bpe_encode, bpe_train

    docs = spark.createDataFrame([(1, "aaa aaa")], ["doc_id", "text"])
    merges = bpe_train(docs, num_merges=1)
    m = merges.collect()
    assert [(r.left, r.right) for r in m] == [("a", "a")]
    enc = bpe_encode(docs, merges).collect()[0]
    assert enc.tokens == ["aa", "a", "aa", "a"]
    assert enc.n_bpe_tokens == 4


def test_bpe_encode_roundtrip_concat(spark):
    from torcdb_spark.operators.bpe import bpe_encode, bpe_train

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(
            ["spark line column", "sort fast value", "spark sort spark"]
        )],
        ["doc_id", "text"],
    )
    merges = bpe_train(docs, num_merges=5)
    enc = bpe_encode(docs, merges)
    # concatenating a word's tokens must reproduce the word
    rows = enc.join(docs, "doc_id").collect()
    for r in rows:
        assert "".join(r.tokens) == r.text.replace(" ", "")


def test_vocab_oov_hand_computed(spark):
    from torcdb_spark.operators.text import vocab_oov

    docs = spark.createDataFrame(
        [
            (1, "a a a b"),   # a x3, b x1
            (2, "a c"),       # c is OOV with vocab_size=2 (vocab = a, b)
            (3, ""),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in vocab_oov(docs, vocab_size=2).collect()}
    # counts: a=4, b=1, c=1 -> vocab (count desc, term asc) = {a, b}
    assert out[1].n_tokens == 4 and out[1].oov_frac == 0.0
    assert out[2].n_tokens == 2 and out[2].oov_frac == 0.5
    assert 3 not in out  # blank doc contributes no tokens


# ---------------------------------------------------------------------------
# property tests: funnel / sessionize vs pure-Python references
# ---------------------------------------------------------------------------


def test_funnel_matches_python_reference_property(spark):
    """Property: for arbitrary event streams, funnel_stages equals a
    brute-force per-user simulation of the earliest-qualifying-event
    semantics (anchor at first step-0, each stage strictly after the
    previous, all within the window of the anchor)."""
    from hypothesis import given, settings, strategies as st

    steps = ["view", "click", "purchase"]
    window_s = 3600

    def reference(events):
        per_user = {}
        for u, t, e in events:
            per_user.setdefault(u, []).append((t, e))
        counts = [0, 0, 0]
        for u, evs in per_user.items():
            evs.sort()
            t0 = min((t for t, e in evs if e == steps[0]), default=None)
            if t0 is None:
                continue
            counts[0] += 1
            prev = t0
            horizon = t0 + window_s
            for i in (1, 2):
                nxt = min(
                    (t for t, e in evs
                     if e == steps[i] and prev < t <= horizon),
                    default=None,
                )
                if nxt is None:
                    break
                counts[i] += 1
                prev = nxt
        return counts

    @settings(max_examples=8, deadline=None)
    @given(
        events=st.lists(
            st.tuples(
                st.integers(1, 4),          # user
                st.integers(0, 7200),        # seconds offset
                st.sampled_from(steps),
            ),
            min_size=1, max_size=30,
        )
    )
    def check(events):
        rows = [
            (u, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=t), e)
            for u, t, e in events
        ]
        df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
        got = {
            r.stage_idx: r.users
            for r in funnel_stages(
                df, steps, max_span="INTERVAL 1 HOUR"
            ).collect()
        }
        expected = reference(events)
        assert [got[1], got[2], got[3]] == expected, (events, got, expected)

    check()


def test_sessionize_matches_python_reference_property(spark):
    """Property: session boundaries/aggregates equal a linear scan with
    the same strict-gap rule, for arbitrary (possibly duplicate-ts)
    per-user event sequences."""
    from hypothesis import given, settings, strategies as st

    from torcdb_spark.operators.funnel import sessionize

    gap_s = 600

    def reference(events):
        per_user = {}
        for u, t in events:
            per_user.setdefault(u, []).append(t)
        out = {}
        for u, ts in per_user.items():
            ts.sort()
            sid = 0
            prev = None
            for t in ts:
                if prev is None or (t - prev) > gap_s:
                    sid += 1
                    out[(u, sid)] = [t, t, 1]
                else:
                    out[(u, sid)][1] = t
                    out[(u, sid)][2] += 1
                prev = t
        return {
            k: (v[0], v[1], v[2]) for k, v in out.items()
        }

    @settings(max_examples=8, deadline=None)
    @given(
        events=st.lists(
            st.tuples(st.integers(1, 3), st.integers(0, 4000)),
            min_size=1, max_size=30, unique=True,
        )
    )
    def check(events):
        base = dt.datetime(2024, 1, 1)
        rows = [
            (u, base + dt.timedelta(seconds=t)) for u, t in events
        ]
        df = spark.createDataFrame(rows, ["user_id", "ts"])
        got = {
            (r.user_id, r.session_id): (
                int((r.session_start - base).total_seconds()),
                int((r.session_end - base).total_seconds()),
                r.n_events,
            )
            for r in sessionize(df, gap_minutes=10).collect()
        }
        assert got == reference(events), (events, got)

    check()


def test_word_shingles_and_decontam_edges(spark):
    from torcdb_spark.operators.text import (
        benchmark_overlap,
        cross_doc_span_stats,
        word_shingles,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [
            (1, "a b c d"),          # shingles: "a b c", "b c d"
            (2, "a b c"),            # shingle:  "a b c" (owned by doc 1)
            (3, "x y"),              # too short: no shingles
            (4, "  A  b   C e "),    # whitespace/case noise -> "a b c", "b c e"
        ],
        ["doc_id", "text"],
    )
    sh = {
        r.doc_id: sorted(r.sh)
        for r in docs.select("doc_id", word_shingles(F.col("text")).alias("sh")).collect()
    }
    assert sh[1] == ["a b c", "b c d"]
    assert sh[3] == []
    assert sh[4] == ["a b c", "b c e"]

    # bench = doc 2 only: doc 1 is 50% contaminated, doc 4 50%, doc 3 absent
    out = {
        r.doc_id: (r.n_shingles, r.n_matched, float(r.contamination))
        for r in benchmark_overlap(
            docs.where("doc_id <> 2"), docs.where("doc_id = 2")
        ).collect()
    }
    assert out == {1: (2, 1, 0.5), 4: (2, 1, 0.5)}

    # span ownership: "a b c" owned by doc 1 -> foreign dup in docs 2 and 4
    stats = {
        r.doc_id: (r.n_spans, r.n_foreign_dups)
        for r in cross_doc_span_stats(docs).collect()
    }
    assert stats == {1: (2, 0), 2: (1, 1), 4: (2, 1)}


def test_span_hygiene_matches_python_reference_property(spark):
    """Property: for arbitrary small corpora (random words, duplicate
    texts, sub-n-token docs), benchmark_overlap and cross_doc_span_stats
    both equal brute-force set computations over distinct word trigrams."""
    from hypothesis import given, settings, strategies as st

    from torcdb_spark.operators.text import benchmark_overlap, cross_doc_span_stats

    words = ["aa", "bb", "cc", "dd"]

    def spans_of(text):
        toks = text.lower().split()
        return {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}

    @settings(max_examples=6, deadline=None)
    @given(
        texts=st.lists(
            st.lists(st.sampled_from(words), min_size=0, max_size=8).map(" ".join),
            min_size=2, max_size=8,
        )
    )
    def check(texts):
        docs = [(i, t) for i, t in enumerate(texts)]
        df = spark.createDataFrame(docs, ["doc_id", "text"])

        # --- decontamination: even ids = corpus, odd ids = benchmark ---
        bench_spans = set().union(
            *(spans_of(t) for i, t in docs if i % 2 == 1), set()
        )
        exp_overlap = {}
        for i, t in docs:
            if i % 2 == 1:
                continue
            sp = spans_of(t)
            if sp:
                m = len(sp & bench_spans)
                exp_overlap[i] = (len(sp), m, round(m / len(sp), 4))
        got_overlap = {
            r.doc_id: (r.n_shingles, r.n_matched, float(r.contamination))
            for r in benchmark_overlap(
                df.where("doc_id % 2 = 0"), df.where("doc_id % 2 = 1")
            ).collect()
        }
        assert got_overlap == exp_overlap, (texts, got_overlap, exp_overlap)

        # --- cross-doc span ownership over the whole corpus -------------
        owner = {}
        for i, t in docs:
            for s in spans_of(t):
                owner[s] = min(owner.get(s, i), i)
        exp_stats = {}
        for i, t in docs:
            sp = spans_of(t)
            if sp:
                nf = sum(1 for s in sp if owner[s] < i)
                exp_stats[i] = (len(sp), nf, round(nf / len(sp), 4))
        got_stats = {
            r.doc_id: (r.n_spans, r.n_foreign_dups, float(r.dup_frac))
            for r in cross_doc_span_stats(df).collect()
        }
        assert got_stats == exp_stats, (texts, got_stats, exp_stats)

    check()


def test_pack_sequences_straddle_semantics(spark):
    from pyspark.sql import functions as F

    from torcdb_spark.operators.text import pack_sequences, packing_stats

    # one shard, capacity 10: docs of 4/4/4 tokens -> offsets 0,4,8;
    # doc 2 STARTS inside seq 0 (offset 8 < 10) so it belongs to seq 0
    # even though it straddles into seq 1; doc 3 (offset 12) opens seq 1
    docs = spark.createDataFrame(
        [(i, "t " * 4) for i in range(4)], ["doc_id", "text"]
    )
    packed = pack_sequences(
        docs, capacity=10, n_shards=1, shard=F.lit(0)
    )
    got = {r.doc_id: (r.seq_id, r.offset) for r in packed.collect()}
    assert got == {0: (0, 0), 1: (0, 4), 2: (0, 8), 3: (1, 12)}
    stats = {
        r.seq_id: (r.n_docs, r.n_tokens, float(r.fill_rate))
        for r in packing_stats(packed, capacity=10).collect()
    }
    assert stats == {0: (3, 12, 1.2), 1: (1, 4, 0.4)}
    # empty docs occupy zero tokens and never advance the offset
    docs2 = spark.createDataFrame(
        [(0, "a b c"), (1, "   "), (2, "d e")], ["doc_id", "text"]
    )
    got2 = {
        r.doc_id: (r.offset, r.n_tokens)
        for r in pack_sequences(
            docs2, capacity=4, n_shards=1, shard=F.lit(0)
        ).collect()
    }
    assert got2 == {0: (0, 3), 1: (3, 0), 2: (3, 2)}


def test_bigram_perplexity_hand_model(spark):
    from torcdb_spark.operators.text import bigram_perplexity

    ref = spark.createDataFrame([(100, "a b a b")], ["doc_id", "text"])
    docs = spark.createDataFrame(
        [(0, "a b"), (1, "z z")], ["doc_id", "text"]
    )
    got = {
        r.doc_id: (r.n_bigrams, float(r.ppl))
        for r in bigram_perplexity(docs, ref).collect()
    }
    # vocab {a, b}, V=3; counts: (<s>,a)=1,(a,b)=2,(b,a)=1; ctx <s>=1,a=2,b=1
    # "a b": P(<s>→a)=1.5/2.5, P(a→b)=2.5/3.5 → ppl = (3/7)^-0.5
    assert got[0] == (2, round((7 / 3) ** 0.5, 4))
    # "z z" → unk unk: P(<s>→unk)=0.5/2.5, P(unk→unk)=0.5/1.5 → ppl=sqrt(15)
    assert got[1] == (2, round(15 ** 0.5, 4))
    # in-distribution text scores lower perplexity than noise
    assert got[0][1] < got[1][1]


def test_html_to_text_extraction(spark):
    from pyspark.sql import functions as F

    from torcdb_spark.operators.text import html_to_text

    cases = [
        # script containing '<' and '</' lookalikes must vanish whole
        ("<p>a</p><script>if (x<1) { s='</scr'+'ipt>'; }</script><p>b</p>",
         "a b"),
        ("<style>p { content: '<q>'; }</style>hello", "hello"),
        ("<!-- c1 --><b>bold</b><!-- c2 -->", "bold"),
        ("x &amp;amp; y", "x &amp; y"),  # double-escape decodes ONCE
        ("&lt;tag&gt; &quot;q&quot; &#39;a&#39;", "<tag> \"q\" 'a'"),
        ("  lots\n\n of\twhitespace  ", "lots of whitespace"),
        ("<div\nclass='x'>multi\nline tag</div>", "multi line tag"),
    ]
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(cases)], ["i", "html"]
    )
    got = {r.i: r.t for r in df.select("i", html_to_text(F.col("html")).alias("t")).collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i], want)


def test_url_parts_and_domain_filter(spark):
    from pyspark.sql import functions as F

    from torcdb_spark.operators.text import domain_filter, url_parts

    urls = [
        (0, "https://A.News.Example.com:8443/a/b?q=1#f"),
        (1, "http://example.org/"),
        (2, "https://spam.bad.net/x"),
        (3, "ftp://files.example.com/pub"),
    ]
    df = spark.createDataFrame(urls, ["doc_id", "url"])
    got = {r.doc_id: r.u for r in df.select("doc_id", url_parts(F.col("url")).alias("u")).collect()}
    assert got[0].scheme == "https"
    assert got[0].host == "a.news.example.com"          # lowercased, port gone
    assert got[0].registered_domain == "example.com"
    assert got[0].path == "/a/b"                        # no query/fragment
    assert got[1].registered_domain == "example.org" and got[1].path == "/"
    assert got[3].scheme == "ftp"

    block = spark.createDataFrame([("bad.net",)], ["domain"])
    kept = sorted(r.doc_id for r in domain_filter(df, block).collect())
    assert kept == [0, 1, 3]


def test_assemble_conversations_boundaries_and_order(spark):
    import datetime as dt

    from torcdb_spark.operators.funnel import assemble_conversations

    t0 = dt.datetime(2024, 1, 1)

    def at(minutes, eid, etype, user=1):
        return (eid, t0 + dt.timedelta(minutes=minutes), user, etype)

    rows = [
        at(0, 1, "q"), at(5, 2, "a"), at(10, 3, "q"),       # session 1
        at(60, 4, "q"), at(61, 5, "a"),                      # gap>30 -> session 2
        at(61, 6, "z"),                                      # ts tie: id orders it after 5
        at(0, 7, "x", user=2),                               # other user
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    got = {
        (r.user_id, r.session_id): (r.n_turns, r.turns)
        for r in assemble_conversations(df, gap_minutes=30).collect()
    }
    assert got == {
        (1, 1): (3, "q>a>q"),
        (1, 2): (3, "q>a>z"),
        (2, 1): (1, "x"),
    }


def test_extract_links_cases(spark):
    from pyspark.sql import functions as F

    from torcdb_spark.operators.text import extract_links

    cases = [
        ('<a href="https://a.com/x">t</a><a HREF="http://b.org">u</a>',
         ["https://a.com/x", "http://b.org"]),
        ('<a href = "spaced.html">v</a>', ["spaced.html"]),
        ("no links here", []),
        ('<link href="style.css"><a href="/rel?q=1#f">w</a>',
         ["style.css", "/rel?q=1#f"]),
    ]
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(cases)], ["i", "html"]
    )
    got = {
        r.i: list(r.l)
        for r in df.select("i", extract_links(F.col("html")).alias("l")).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i], want)


def test_hash_embed_dense_matches_sparse_and_feeds_similarity(spark):
    from pyspark.sql import functions as F

    from torcdb_spark.operators.similarity import cosine_topk_bruteforce
    from torcdb_spark.operators.text import hash_embed, hash_embed_sparse

    docs = spark.createDataFrame(
        [(0, "alpha beta beta"), (1, "alpha beta beta"), (2, "gamma delta"),
         (3, "")],
        ["doc_id", "text"],
    )
    dim = 16
    sparse = {
        (r.doc_id, r.bucket): r.weight
        for r in hash_embed_sparse(docs, dim=dim).collect()
    }
    dense = {r.doc_id: list(r.vec) for r in hash_embed(docs, dim=dim).collect()}
    for (d, b), w in sparse.items():
        assert dense[d][b] == float(w)
    for d, v in dense.items():
        assert len(v) == dim
        assert sum(abs(x) for x in v) == sum(
            abs(w) for (dd, _), w in sparse.items() if dd == d
        )
    # identical texts -> identical vectors; the dense form drops straight
    # into the similarity operators
    assert dense[0] == dense[1] != dense[2]
    emb = hash_embed(docs.where("doc_id <> 3"), dim=dim).select(
        F.col("doc_id").alias("vec_id"), F.col("vec").alias("embedding")
    )
    top = {
        r.query_id: r.neighbor_id
        for r in cosine_topk_bruteforce(emb, emb.where("vec_id = 0"), k=1).collect()
    }
    assert top == {0: 1}  # the exact duplicate wins


def test_content_defined_chunks_shift_resilience(spark):
    """The defining CDC property: inserting a prefix re-chunks only the
    neighborhood — chunk boundaries derived from content k-grams
    reappear at shifted positions, so chunk LENGTH multisets beyond the
    first chunk coincide."""
    from torcdb_spark.operators.text import content_defined_chunks

    base = "the quick brown fox jumps over the lazy dog " * 20
    shifted = "INSERTED PREFIX " + base
    df = spark.createDataFrame(
        [(0, base), (1, shifted)], ["doc_id", "text"]
    )
    out = {}
    for r in content_defined_chunks(df, k=8, divisor=32).collect():
        out.setdefault(r.doc_id, {})[r.chunk_id] = r.chunk_len
    # lengths partition the documents exactly
    assert sum(out[0].values()) == len(base)
    assert sum(out[1].values()) == len(shifted)
    assert len(out[0]) > 3  # boundaries actually fire
    # all but the leading chunk(s) realign after the insertion: compare
    # chunk-length MULTISETS excluding each doc's first chunk
    from collections import Counter

    def tail_lengths(d):
        ordered = [d[cid] for cid in sorted(d)]
        return Counter(ordered[1:])

    c0, c1 = tail_lengths(out[0]), tail_lengths(out[1])
    shared = sum((c0 & c1).values())
    assert shared >= sum(c0.values()) - 2


def test_kmv_anotb_exact_when_unsaturated(spark):
    from torcdb_spark.operators.theta import kmv_anotb_estimate

    a = spark.range(0, 100).withColumnRenamed("id", "k")
    b = spark.range(60, 160).withColumnRenamed("id", "k")
    sa = kmv_sketch(a, "k", k=128)
    sb = kmv_sketch(b, "k", k=128)
    est = kmv_anotb_estimate(sa, sb, k=128).collect()
    # both sketches unsaturated → θ = 1.0 and the sample is the EXACT
    # difference: |{0..99} \ {60..159}| = 60
    assert len(est) == 1
    assert est[0].est_anotb == pytest.approx(60.0)


def test_kmv_anotb_empty_difference_yields_zero_row(spark):
    from torcdb_spark.operators.theta import kmv_anotb_estimate

    a = spark.range(0, 50).withColumnRenamed("id", "k")
    b = spark.range(0, 100).withColumnRenamed("id", "k")
    est = kmv_anotb_estimate(
        kmv_sketch(a, "k", k=128), kmv_sketch(b, "k", k=128), k=128
    ).collect()
    assert len(est) == 1  # one row even when A ⊆ B
    assert est[0].est_anotb == 0.0


def test_kmv_anotb_saturated_within_error(spark):
    from torcdb_spark.operators.theta import kmv_anotb_estimate

    a = spark.range(0, 4000).withColumnRenamed("id", "k")
    b = spark.range(2000, 6000).withColumnRenamed("id", "k")
    est = kmv_anotb_estimate(
        kmv_sketch(a, "k", k=256), kmv_sketch(b, "k", k=256), k=256
    ).collect()[0].est_anotb
    # true |A\B| = 2000; KMV k=256 relative error ~1/sqrt(k) ≈ 6%
    assert 1400 <= est <= 2600
