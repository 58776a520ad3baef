"""Text-analysis operators over a document table — all JVM-side expressions
(no Python UDFs in the hot path), so they vectorize inside whole-stage
codegen and scale linearly with partitions: per-row transforms with zero
shuffle.

These extend the reference surface (TorcDB has no text ops) toward the
training-data-pipeline workload: token counting, quality scoring,
fingerprinting, n-gram shingling (feeds dedup.py's MinHash).
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf resolves stringified type hints
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# BPE-ish word/punct tokenizer: words, numbers, or single punctuation marks.
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_count(text: Column) -> Column:
    """Whitespace token count (0 for empty/blank strings)."""
    trimmed = F.trim(text)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def bpe_token_count(text: Column) -> Column:
    """Token count under the BPE-ish regex (words / numbers / punct marks)."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_REGEX), 0))


def text_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document statistics: characters, whitespace tokens, regex tokens,
    alpha ratio, punctuation count."""
    t = F.col(text_col)
    return docs.select(
        F.col(id_col),
        F.length(t).cast("long").alias("n_chars"),
        token_count(t).cast("long").alias("n_tokens"),
        bpe_token_count(t).cast("long").alias("n_bpe_tokens"),
        F.length(F.regexp_replace(t, r"[^A-Za-z]", "")).cast("long").alias("n_alpha"),
        F.length(F.regexp_replace(t, r"[A-Za-z0-9\s]", "")).cast("long").alias("n_punct"),
    )


def quality_score(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality score in [0,1]: blend of length band, alpha ratio
    and mean token length band — the usual cheap pre-filters before
    expensive dedup/classification stages. Deterministic integer/ratio
    arithmetic so an external SQL oracle can replicate it exactly."""
    s = text_stats(docs, text_col, id_col)
    n_chars = F.col("n_chars")
    alpha_ratio = F.when(n_chars > 0, F.col("n_alpha") / n_chars).otherwise(F.lit(0.0))
    len_ok = (n_chars >= 100) & (n_chars <= 20000)
    mean_tok = F.when(F.col("n_tokens") > 0, n_chars / F.col("n_tokens")).otherwise(F.lit(0.0))
    tok_ok = (mean_tok >= 3.0) & (mean_tok <= 12.0)
    score = (
        F.when(len_ok, 0.4).otherwise(0.0)
        + F.when(tok_ok, 0.3).otherwise(0.0)
        + alpha_ratio * 0.3
    )
    # Portable round-half-up: floor(x·10⁴ + 0.5)/10⁴ in pure IEEE double
    # ops, bit-identical in any engine. Built-in round() is NOT portable
    # within 1 ulp of the .5 boundary: Java (BigDecimal on the shortest
    # decimal repr) and DuckDB disagree on e.g. 0.9462499999999999 —
    # observed as real sf0.1 fixture docs flipping the 4th decimal.
    quality = F.floor(score * 10000 + F.lit(0.5)) / F.lit(10000.0)
    return s.select(id_col, quality.alias("quality"))


def normalize_text(text: Column) -> Column:
    """Whitespace-collapsed, lowercased text — the canonical form for
    shingling and fingerprinting."""
    return F.lower(F.regexp_replace(text, r"\s+", " "))


def shingles(text: Column, n: int = 5, distinct: bool = True) -> Column:
    """Character n-gram shingle array over an ALREADY-NORMALIZED string
    column, the MinHash input.

    IMPORTANT: pass a plain attribute column (materialize
    ``normalize_text`` in its own select first). The transform lambda
    references ``text`` once per array element — handing it a nested
    regexp/lower expression would re-evaluate that chain per shingle
    (measured 6× slowdown on the fixture corpus).

    ``distinct=False`` skips the O(n²) array_distinct — correct for
    min/majority consumers (MinHash minima and SimHash votes are unaffected
    by or deliberately weighted with duplicates); keep True for exact
    set-Jaccard."""
    idx = F.sequence(F.lit(1), F.greatest(F.length(text) - (n - 1), F.lit(1)))
    out = F.transform(idx, lambda i: text.substr(i, F.lit(n)))
    return F.array_distinct(out) if distinct else out


# Marker-word tables for the n-gram/stopword language-ID heuristic. Priority
# order (dict order) breaks score ties deterministically.
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " a "],
    "es": [" el ", " la "],
    "de": [" der ", " und "],
    "fr": [" le ", " et "],
}


def _occurrences(padded: Column, marker: str) -> Column:
    """Non-overlapping occurrence count of ``marker`` via length delta —
    pure string built-ins, replicable verbatim in an external SQL oracle."""
    removed = F.replace(padded, F.lit(marker), F.lit(""))
    return ((F.length(padded) - F.length(removed)) / len(marker)).cast("long")


def lang_id(text: Column, markers: dict[str, list[str]] | None = None) -> Column:
    """Heuristic language ID: marker-stopword counting with a fixed-priority
    argmax; 'und' (undetermined) when no marker fires. Deterministic integer
    arithmetic end-to-end so the declared heuristic — not a model — is the
    verifiable contract. Zero shuffle: per-row expressions only."""
    markers = markers or LANG_MARKERS
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    # Argmax as array_max over (score, priority, lang) structs: structs
    # compare lexicographically, so doubling real scores and seeding an
    # "und" entry at score 1 gives exactly the CASE-chain semantics
    # (earliest lang wins ties; und iff every marker count is 0) while
    # evaluating each marker-count expression ONCE. A when()-chain
    # formulation inlines every score subtree into every branch — O(n²)
    # full-string replace() scans per row.
    entries = []
    for i, (lang, ms) in enumerate(markers.items()):
        score = sum(
            (_occurrences(padded, m) for m in ms), start=F.lit(0).cast("long")
        )
        entries.append(
            F.struct(
                (score * 2).alias("s"),
                F.lit(-i).cast("long").alias("p"),
                F.lit(lang).alias("lang"),
            )
        )
    entries.append(
        F.struct(
            F.lit(1).cast("long").alias("s"),
            F.lit(-len(markers)).cast("long").alias("p"),
            F.lit("und").alias("lang"),
        )
    )
    return F.array_max(F.array(*entries))["lang"]


def fingerprint(text: Column) -> Column:
    """64-bit document fingerprint: xxhash64 of the whitespace-normalized,
    lowercased, trimmed text — the exact-dup key."""
    return F.xxhash64(normalize_text(F.trim(text)))


def winnowing_fingerprints(
    docs: "DataFrame",
    k: int = 5,
    window: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "xxhash64",
) -> "DataFrame":
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken):
    k-gram rolling hashes → per-window minimum → distinct selected
    fingerprints, exploded to (doc_id, fp) rows.

    Guarantees at least one shared fingerprint for any match of length
    ≥ window + k - 1, with fingerprint density ~2/(window+1) of the k-gram
    count — the standard plagiarism/overlap-detection sketch. k-gram
    hashing stays JVM-side (xxhash64 over the shingle array); the
    window-min selection is one vectorized sliding-window pass per row.
    Zero shuffle before the final distinct."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<long>")
    def select_mins(hashes: pd.Series) -> pd.Series:
        out = []
        for hs in hashes:
            if hs is None or len(hs) == 0:
                out.append([])
                continue
            h = np.asarray(hs, dtype=np.int64)
            if len(h) <= window:
                out.append([int(h.min())])
                continue
            wins = np.lib.stride_tricks.sliding_window_view(h, window)
            out.append(np.unique(wins.min(axis=1)).tolist())
        return pd.Series(out)

    if hash_fn == "xxhash64":
        # fastest JVM hash — the production default (wrapped: transform
        # rejects varargs callables like F.xxhash64 itself)
        def _gram_hash(s):
            return F.xxhash64(s)
    elif hash_fn == "md5":
        # portable 52-bit md5 prefix: ~2x the hash cost, but identical in
        # any engine, so the WHOLE sketch is SQL-oracle-replayable (d29)
        def _gram_hash(s):
            return F.conv(F.substring(F.md5(s), 1, 13), 16, 10).cast("long")
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    normed = docs.select(F.col(id_col), normalize_text(F.col(text_col)).alias("_nt"))
    hashed = normed.select(
        F.col(id_col),
        F.transform(
            shingles(F.col("_nt"), k, distinct=False), _gram_hash
        ).alias("_hs"),
    )
    return (
        hashed.select(F.col(id_col), F.explode(select_mins(F.col("_hs"))).alias("fp"))
        .dropDuplicates([id_col, "fp"])
    )


def tfidf(
    docs: "DataFrame",
    text_col: str = "text",
    id_col: str = "doc_id",
    top_terms: int | None = None,
) -> "DataFrame":
    """TF-IDF scores per (document, term) → (id, term, tf, tfidf).

    tf = raw term count in the document; idf = ln(N / df) with N the corpus
    document count and df the term's document frequency. Tokenization is
    whitespace splitting of the lowercased, trimmed text (the same
    convention as the other text operators).

    Plan shape — ONE linear chain, two shuffles on bounded key spaces:
    explode → groupBy(doc, term) for tf (map-side combined), then df as a
    COUNT OVER (PARTITION BY term) window on that same tf frame. Deriving
    df from the tf frame (each (doc, term) row is exactly one document
    containing the term) means the corpus is tokenized and shuffled ONCE —
    no second aggregation subtree, no tf⋈df join, and no persisted
    intermediate to manage across calls (an earlier revision cached tf to
    feed two subtrees; the window form makes the cache unnecessary). N
    arrives as a broadcast scalar via a 1-row cross join, never a driver
    collect."""
    from pyspark.sql import Window

    toks = docs.where(F.trim(F.col(text_col)) != "").select(
        F.col(id_col),
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("term"),
    )
    tf = toks.groupBy(id_col, "term").agg(
        F.count("*").cast("long").alias("tf")
    )
    wdf = Window.partitionBy("term")
    n_docs = docs.groupBy().agg(F.count("*").alias("_n"))
    scored = (
        tf.withColumn("df", F.count("*").over(wdf))
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            "term",
            "tf",
            (F.col("tf") * F.log(F.col("_n") / F.col("df"))).alias("_score"),
        )
    )
    if top_terms is not None:
        w = Window.partitionBy(id_col).orderBy(
            F.desc("_score"), F.asc("term")
        )
        scored = scored.withColumn(
            "_rk", F.row_number().over(w)
        ).where(F.col("_rk") <= top_terms).drop("_rk")
    return scored.select(
        id_col, "term", "tf", F.round("_score", 4).alias("tfidf")
    )


def chunk_documents(
    docs: "DataFrame",
    chunk_chars: int = 512,
    overlap: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "DataFrame":
    """Split documents into fixed-width overlapping character chunks →
    (id, chunk_idx, chunk) — the standard pre-embedding segmentation of a
    training/RAG corpus.

    Pure JVM: a ``sequence`` of chunk starts exploded per document, then a
    ``substring`` per chunk — no UDF, so chunking stays inside codegen and
    scales linearly. Stride = chunk_chars - overlap; the last chunk may be
    short; empty documents produce no chunks."""
    if overlap >= chunk_chars:
        raise ValueError("overlap must be < chunk_chars")
    stride = chunk_chars - overlap
    n = F.length(F.col(text_col))
    starts = F.sequence(
        F.lit(1),
        F.greatest(n - F.lit(overlap), F.lit(1)),
        F.lit(stride),
    )
    return (
        docs.where(n > 0)
        .select(
            F.col(id_col),
            F.posexplode(starts).alias("chunk_idx", "_start"),
            F.col(text_col),
        )
        .select(
            id_col,
            "chunk_idx",
            F.substring(F.col(text_col), F.col("_start"), chunk_chars).alias(
                "chunk"
            ),
        )
    )


def redact_pii(
    docs: "DataFrame",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "DataFrame":
    """Regex-scrub common PII shapes from text → (id, clean_text,
    n_redactions): email addresses and long digit runs (phone/account
    numbers) are replaced with typed placeholder tokens — the cheap
    deterministic scrub stage of a corpus pipeline (a production deployment
    layers an NER model behind the same column contract).

    JVM regexp_replace only; the redaction count is computed from the
    pre/post length delta of the matches, not a second scan."""
    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    digits = r"\d{7,}"
    step1 = F.regexp_replace(F.col(text_col), email, "<EMAIL>")
    clean = F.regexp_replace(step1, digits, "<NUMBER>")
    n_red = (
        F.size(F.split(F.col(text_col), email)) - 1
        + F.size(F.split(step1, digits)) - 1
    )
    return docs.select(
        F.col(id_col),
        clean.alias("clean_text"),
        n_red.cast("long").alias("n_redactions"),
    )


def srt_timestamp(ms: Column) -> Column:
    """Milliseconds → ``HH:MM:SS,mmm`` SubRip timestamp, pure JVM."""

    def two(c: Column) -> Column:
        return F.lpad(c.cast("long").cast("string"), 2, "0")

    # hours can exceed two digits (SubRip permits it; parse_srt reads
    # \d{2,}) and Spark's lpad TRUNCATES longer strings — pad without
    # truncating
    hs = F.floor(ms / 3600000).cast("long").cast("string")
    hours = F.when(F.length(hs) < 2, F.concat(F.lit("0"), hs)).otherwise(hs)
    return F.concat(
        hours,
        F.lit(":"),
        two(F.floor(ms / 60000) % 60),
        F.lit(":"),
        two(F.floor(ms / 1000) % 60),
        F.lit(","),
        F.lpad((ms % 1000).cast("long").cast("string"), 3, "0"),
    )


def parse_srt(cues_df: "DataFrame", srt_col: str = "srt") -> "DataFrame":
    """SubRip (.srt) parser, zero Python: split the document on blank
    lines, split each block into index / timestamp line / text, and
    convert ``HH:MM:SS,mmm`` (or VTT's dot-millisecond) timestamps to
    milliseconds — one exploded row per cue with (cue_idx, start_ms,
    end_ms, cue_text). Blocks that don't match the cue shape (a WEBVTT
    header, NOTE comments) drop.

    Each block is decomposed ONCE (a 3-way line split + a ``-->`` split
    + numeric field splits) rather than re-running one large cue regex
    per extracted field — Spark does not common-subexpression-eliminate
    regexp_extract calls that differ only in group index, and at 100 TB
    of caption files that would be ~10× redundant regex work. The whole
    chain is per-row expressions: whole-stage codegen, no shuffle until
    the caller aggregates."""
    ts_re = r"^\d{2,}:\d{2}:\d{2}[,.]\d{3} --> \d{2,}:\d{2}:\d{2}[,.]\d{3}\s*$"

    def ts_ms(s: Column) -> Column:
        seg = F.split(F.trim(s), "[:,.]")
        return (
            seg[0].cast("long") * 3600000
            + seg[1].cast("long") * 60000
            + seg[2].cast("long") * 1000
            + seg[3].cast("long")
        )

    blocks = (
        cues_df.withColumn(
            "_block", F.explode(F.split(F.col(srt_col), r"\n\s*\n"))
        )
        .withColumn("_parts", F.split("_block", "\n", 3))
        .withColumn("_idx", F.trim(F.element_at("_parts", 1)))
        .withColumn("_ts", F.element_at("_parts", 2))
    )
    arrow = F.split("_ts", " --> ")
    return (
        blocks.where(
            (F.size("_parts") >= 3)
            & F.col("_idx").rlike(r"^\d+$")
            & F.col("_ts").rlike(ts_re)
        )
        .select(
            *[c for c in cues_df.columns if c != srt_col],
            F.col("_idx").cast("long").alias("cue_idx"),
            ts_ms(arrow[0]).alias("start_ms"),
            ts_ms(arrow[1]).alias("end_ms"),
            F.trim(
                F.regexp_replace(F.element_at("_parts", 3), r"\s+", " ")
            ).alias("cue_text"),
        )
    )


def unicode_nfc(
    docs: "DataFrame",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "DataFrame":
    """Unicode NFC normalization census → (id, nfc_text, n_chars_in,
    n_chars_nfc, changed): canonical composition of combining sequences
    (e + U+0301 → é), the normalization pass a multilingual corpus runs
    before dedup/tokenization so that canonically-equivalent strings
    hash identically. Kernel is stdlib ``unicodedata`` inside one
    Arrow-batched mapInPandas (no JVM builtin covers normalization);
    lengths count code points, matching SQL ``length()`` semantics.

    At 100 TB: embarrassingly parallel over partitions, no shuffle."""
    import pandas as pd

    def kernel(batches):
        import unicodedata

        for pdf in batches:
            src = pdf[text_col]
            nfc = src.map(
                lambda s: None
                if s is None
                else unicodedata.normalize("NFC", str(s))
            )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "nfc_text": nfc,
                    "n_chars_in": src.str.len().astype("Int64"),
                    "n_chars_nfc": nfc.str.len().astype("Int64"),
                    "changed": (src != nfc).where(src.notna(), None),
                }
            )

    return docs.select(id_col, text_col).mapInPandas(
        kernel,
        f"{id_col} long, nfc_text string, n_chars_in long, "
        "n_chars_nfc long, changed boolean",
    )


def hash_sample(
    docs: "DataFrame",
    rate_pct: int = 10,
    id_col: str = "doc_id",
    strata_col: str | None = None,
    hash_fn: str = "xxhash64",
) -> "DataFrame":
    """Deterministic hash-mod sampling: keep rows whose xxhash64(id) mod
    100 falls under ``rate_pct`` — reproducible across runs, partitionings
    and cluster sizes (unlike ``sample()``, whose output depends on
    physical partition layout). With ``strata_col``, the hash keys on
    (stratum, id) so each stratum is sampled at the same rate
    independently — stratified sampling without a shuffle."""
    cols = [F.col(strata_col), F.col(id_col)] if strata_col else [F.col(id_col)]
    if hash_fn == "xxhash64":
        bucket = F.pmod(F.xxhash64(*cols), F.lit(100))
    elif hash_fn == "md5":
        # portable: md5 over ':'-joined key parts — identical in any
        # engine, so the kept set is SQL-replayable (d32)
        key = F.concat_ws(":", *[c.cast("string") for c in cols])
        bucket = F.pmod(
            F.conv(F.substring(F.md5(key), 1, 13), 16, 10).cast("long"),
            F.lit(100),
        )
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    return docs.where(bucket < rate_pct)


def bm25_rank(
    docs: "DataFrame",
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "DataFrame":
    """BM25 ranked retrieval → (id, bm25, rnk): the standard IR scoring
    the reference has no analogue for, completing the text family beyond
    raw TF-IDF.

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
    idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1)  (the Robertson/Lucene
    non-negative form). Tokenization matches tfidf (lowercased
    whitespace split).

    Plan shape: the term filter pushes into the exploded token stream so
    tf is aggregated over QUERY terms only (a |terms|-bounded frame, not
    the vocabulary); dl is one groupBy over the token stream; N/avgdl
    arrive as a broadcast 1-row aggregate — no driver collect. Scoring is
    then a broadcast join of per-term df onto the tiny tf frame; the only
    corpus-sized shuffles are the two token aggregations. Top-k is a
    window over per-doc sums with id tie-break for determinism."""
    from pyspark.sql import Window

    if not query_terms:
        raise ValueError("bm25_rank requires at least one query term")
    toks = docs.where(F.trim(F.col(text_col)) != "").select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("term"),
    )
    # doc length + corpus stats from the SAME pass shape as tfidf
    dl = toks.groupBy(id_col).agg(F.count("*").cast("double").alias("dl"))
    stats = F.broadcast(
        dl.agg(
            F.count("*").cast("double").alias("n_docs"),
            F.avg("dl").alias("avgdl"),
        )
    )
    tf = (
        toks.where(F.col("term").isin(list(query_terms)))
        .groupBy(id_col, "term")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    df_t = F.broadcast(
        tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    denom = F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    contrib = idf * (F.col("tf") * (k1 + 1.0)) / denom
    scored = (
        tf.join(df_t, "term")
        .join(dl, id_col)
        .crossJoin(stats)
        .groupBy(id_col)
        .agg(F.round(F.sum(contrib), 4).alias("bm25"))
    )
    w = Window.orderBy(F.desc("bm25"), F.asc(id_col))
    return (
        scored.orderBy(F.desc("bm25"), F.asc(id_col))
        .limit(int(top_k))
        .withColumn("rnk", F.row_number().over(w).cast("long"))
    )


def _bind_once(expr: Column, fn) -> Column:
    """Evaluate ``expr`` exactly once and hand it to ``fn`` as a bound
    higher-order-function lambda variable.

    Why: staged Project columns protect multi-referenced expensive
    expressions only until an optimizer rewrite collapses the projection
    into a consumer — and HOF lambdas always run on the INTERPRETED
    expression path, where every reference re-evaluates its subtree. A
    lambda VARIABLE, by contrast, is bound once per element under any
    plan shape. ``transform(array(e), x -> fn(x))[1]`` is that binder:
    one element, one evaluation, arbitrarily many cheap references."""
    return F.element_at(F.transform(F.array(expr), fn), 1)


def repetition_signals(
    docs: "DataFrame", text_col: str = "text", id_col: str = "doc_id"
) -> "DataFrame":
    """Gopher-style repetition/quality signals per document — the standard
    pre-training corpus filters for boilerplate and degenerate text (Rae et
    al. 2021 §A1.1 "repetition" heuristics), defined over whitespace word
    tokens so every measure is deterministic integer arithmetic an external
    SQL oracle replicates exactly:

    - ``word_rep_ratio``  = 1 − distinct_words/words (token-level repetition)
    - ``top2_gram``/``top2_frac``: the most frequent word 2-gram (ties →
      lexicographically greatest) and the fraction of non-space characters
      its occurrences cover
    - ``dup5_frac``: fraction of 5-gram character mass (non-space chars,
      every occurrence counted) held by 5-grams that occur more than once

    Zero shuffle: per-row array expressions only (n-gram counting is an
    O(distinct·total) in-row scan over ~100-word documents), so the
    operator scales embarrassingly with partitions at 100 TB — there is no
    corpus-wide state, unlike tfidf/bm25.

    Every derived array (the split, both gram lists, the 5-gram stats) is
    bound through ``_bind_once`` rather than a projected column: staged
    Projects protect multi-referenced expressions only until an optimizer
    rewrite collapses them into a consumer (observed when this operator's
    output joins other frames), and higher-order functions always run
    INTERPRETED — an inlined split then re-evaluates per gram reference,
    turning a 0.7 s pass into minutes. Lambda variables are bound exactly
    once per element under any plan shape, so the cost stays O(grams)
    no matter what the caller fuses around it."""
    t = F.trim(F.col(text_col))
    nsc = F.length(F.regexp_replace(t, r"\s", "")).cast("long")
    raw_w = F.when(nsc > 0, F.split(t, r"\s+")).otherwise(
        F.array().cast("array<string>")
    )

    def grams(words, k: int):
        return F.when(
            F.size(words) >= k,
            F.transform(
                F.sequence(F.lit(1), F.size(words) - (k - 1)),
                lambda i: F.concat_ws(" ", F.slice(words, i, k)),
            ),
        ).otherwise(F.array().cast("array<string>"))

    def compute(env):
        return _bind_once(
            grams(env["w"], 2),
            lambda g2: _bind_once(
                grams(env["w"], 5), lambda g5: _measures(env, g2, g5)
            ),
        )

    def _measures(env, g2, g5):
        w = env["w"]
        cnt2 = lambda g: F.size(F.filter(g2, lambda x: x == g))
        cnt5 = lambda g: F.size(F.filter(g5, lambda x: x == g))
        # non-space char count of a k-gram is length − (k−1): grams are
        # single-space joined, so no per-gram string rewrite is needed
        top2 = F.array_max(
            F.transform(
                F.array_distinct(g2),
                lambda g: F.struct(
                    cnt2(g).cast("long").alias("c"), g.alias("gram")
                ),
            )
        )
        # one count pass per distinct 5-gram: (c, chars) structs, both
        # aggregates fold over the bound stats array
        stats5 = F.transform(
            F.array_distinct(g5),
            lambda g: F.struct(
                cnt5(g).cast("long").alias("c"),
                (F.length(g) - 4).cast("long").alias("l"),
            ),
        )
        n_words = F.size(w).cast("long")
        n_distinct = F.size(F.array_distinct(w)).cast("long")
        return _bind_once(
            F.struct(top2.alias("t2"), stats5.alias("s5")),
            lambda b: F.struct(
                n_words.alias("n_words"),
                F.when(
                    n_words > 0,
                    F.round((n_words - n_distinct) / n_words.cast("double"), 6),
                ).otherwise(F.lit(0.0)).alias("word_rep_ratio"),
                b["t2"]["gram"].alias("top2_gram"),
                F.when(
                    (env["nsc"] > 0) & b["t2"]["gram"].isNotNull(),
                    F.round(
                        b["t2"]["c"] * (F.length(b["t2"]["gram"]) - 1)
                        / env["nsc"].cast("double"),
                        6,
                    ),
                ).otherwise(F.lit(0.0)).alias("top2_frac"),
                _dup5_frac(b["s5"]).alias("dup5_frac"),
            ),
        )

    def _dup5_frac(stats5):
        tot5 = F.aggregate(
            stats5, F.lit(0).cast("long"),
            lambda acc, s: acc + s["c"] * s["l"],
        )
        dup5 = F.aggregate(
            stats5,
            F.lit(0).cast("long"),
            lambda acc, s: acc
            + F.when(s["c"] > 1, s["c"] * s["l"]).otherwise(
                F.lit(0).cast("long")
            ),
        )
        return F.when(
            tot5 > 0, F.round(dup5 / tot5.cast("double"), 6)
        ).otherwise(F.lit(0.0))

    out = _bind_once(
        F.struct(raw_w.alias("w"), nsc.alias("nsc")), compute
    )
    # inline() is a GENERATOR: the struct is evaluated exactly once per
    # row and its fields become columns — extracting five GetStructFields
    # from a projected column would instead re-run the whole expression
    # five times under interpreted eval
    return docs.select(F.col(id_col), F.inline(F.array(out)))


def vocab_oov(
    docs: "DataFrame",
    vocab_size: int = 1000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "DataFrame":
    """Corpus vocabulary coverage → (id, n_tokens, oov_frac): build the
    top-``vocab_size`` term vocabulary (count desc, term asc tie-break)
    over lowercased whitespace tokens, then score every document's
    out-of-vocabulary token fraction — the coverage diagnostic run before
    committing to a tokenizer/vocab on a new corpus.

    Two passes, both scale-shaped: term counts are one partial-aggregated
    shuffle; the vocabulary is a distributed TakeOrdered (top-V never
    sorts the full term table) and rides a broadcast into the per-document
    scoring join. OOV aggregation is keyed on the document id — map-side
    combinable, skew-free."""
    toks = docs.where(F.trim(F.col(text_col)) != "").select(
        F.col(id_col),
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("term"),
    )
    vocab = (
        toks.groupBy("term")
        .agg(F.count("*").alias("_n"))
        .orderBy(F.desc("_n"), F.asc("term"))
        .limit(int(vocab_size))
        .select("term", F.lit(True).alias("_in_vocab"))
    )
    scored = toks.join(F.broadcast(vocab), "term", "left")
    return scored.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.round(
            F.sum(F.when(F.col("_in_vocab").isNull(), 1).otherwise(0))
            / F.count("*"),
            6,
        ).alias("oov_frac"),
    )


def word_shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram array over an ALREADY-MATERIALIZED token-array
    column: slide an n-token window, join each window with a single
    space. Rows with fewer than ``n`` tokens yield an EMPTY array (no
    short-shingle fallback — decontamination and span-dedup consumers
    must not match partial windows).

    Same staging rule as ``shingles``: pass a plain attribute column.
    The transform lambda references ``toks`` once per window, so handing
    it the nested split(lower(trim(...))) chain re-evaluates the regexp
    split PER SPAN — measured 14 s → 1.5 s at sf0.1 on the span-dedup
    query from staging the tokenization into its own select first.

    Stays entirely inside codegen: sequence/transform/slice/array_join
    are all JVM expressions, so shingling 100 TB of text is a map-only
    pass with zero Python."""
    k = F.size(toks) - (n - 1)
    spans = F.when(
        k >= 1,
        F.transform(
            F.sequence(F.lit(1), F.greatest(k, F.lit(1))),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(spans)


def word_tokens(text: Column) -> Column:
    """Lowercased whitespace tokenization — materialize this in its own
    select, then shingle the resulting attribute column with
    ``word_shingles_from_tokens``."""
    return F.split(F.lower(F.trim(text)), r"\s+")


def word_shingles(text: Column, n: int = 3) -> Column:
    """Single-expression convenience over ``word_shingles_from_tokens``
    for interactive use on small frames. In operators, ALWAYS stage:
    select the token array first (``word_tokens``), then shingle the
    attribute column — this inline form re-evaluates the regexp split
    once per window (see word_shingles_from_tokens)."""
    return word_shingles_from_tokens(word_tokens(text), n)


def word_span_frame(
    docs: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, span): the DISTINCT word n-gram spans of every document, as an
    exploded frame — the candidate-generation input shared by
    decontamination and cross-document span dedup.

    Formulation matters 9× here: building the span ARRAY with a
    ``transform`` lambda and exploding it leaves a higher-order function
    in the Generate operator's collapsed input, which knocks the whole
    stage out of codegen (measured 3.3 s/pass at sf0.1 for a 260k-span
    frame; the HOF itself is 0.36 s — the cost is the codegen fallback,
    not the work). Instead: explode the window START POSITIONS
    (sequence(1, len-n+1) of ints), then build each span with
    slice/array_join per exploded row — ordinary expressions, one
    codegen stage, 0.5 s for the same frame. Distinctness is a
    (id, span) dropDuplicates, map-side combinable.

    Documents with fewer than ``n`` tokens contribute nothing (the size
    filter runs on the token count only, so no span expression is
    inlined into a filter condition)."""
    toks = docs.select(
        F.col(id_col), word_tokens(F.col(text_col)).alias("_tk")
    ).where(F.size("_tk") >= n)
    pos = toks.select(
        F.col(id_col),
        "_tk",
        F.explode(F.sequence(F.lit(1), F.size("_tk") - (n - 1))).alias("_i"),
    )
    return pos.select(
        F.col(id_col),
        F.array_join(F.slice("_tk", F.col("_i"), n), " ").alias("span"),
    ).dropDuplicates([id_col, "span"])


def benchmark_overlap(
    corpus: DataFrame,
    bench: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination (the pre-training hygiene pass: drop
    training documents that leak evaluation data): for every corpus
    document, the fraction of its distinct word n-gram shingles that also
    appear anywhere in the benchmark set.

    Returns (id, n_shingles, n_matched, contamination) for every corpus
    document with >= n tokens, including zero-overlap rows.

    Scale shape: the benchmark shingle set is DISTINCT-ed and broadcast
    (benchmarks are MBs against a 100 TB corpus), so the match is a
    map-side hash probe — the corpus is never shuffled at all; the only
    exchange is the per-document count aggregation, keyed on the document
    id (map-side combinable, skew-free). Production note: at 13-gram/
    100 TB scale the join key would be xxhash64(shingle) to shrink the
    broadcast; the raw string key here keeps the operator exactly
    SQL-reproducible."""
    c = word_span_frame(corpus, n, text_col=text_col, id_col=id_col).select(
        F.col(id_col), F.col("span").alias("shingle")
    )
    b = (
        word_span_frame(bench, n, text_col=text_col, id_col=id_col)
        .select(F.col("span").alias("shingle"))
        .distinct()
        .select("shingle", F.lit(True).alias("_hit"))
    )
    probe = c.join(F.broadcast(b), "shingle", "left")
    return probe.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_shingles"),
        F.sum(F.when(F.col("_hit"), 1).otherwise(0)).cast("long").alias("n_matched"),
        F.round(
            F.sum(F.when(F.col("_hit"), 1).otherwise(0)) / F.count("*"), 4
        ).alias("contamination"),
    )


def cross_doc_span_stats(
    docs: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document exact span duplication (the inter-document
    counterpart of ``repetition_signals``; C4/ExactSubstr-style hygiene):
    a distinct word n-gram span is OWNED by the lowest document id that
    contains it; every other document carrying it holds a foreign
    duplicate. Returns (id, n_spans, n_foreign_dups, dup_frac) — the
    keep-first-occurrence retention signal.

    Scale shape: one groupBy on the span string computes the global
    min-owner (map-side combinable; the span table is vocabulary-bounded,
    not corpus-bounded), joined back to the exploded spans on the same
    key — Catalyst reuses the exchange — then one id-keyed aggregate.
    No window over the full corpus, no driver state."""
    spans = word_span_frame(docs, n, text_col=text_col, id_col=id_col)
    owners = spans.groupBy("span").agg(F.min(id_col).alias("_owner"))
    joined = spans.join(owners, "span")
    return joined.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_spans"),
        F.sum(F.when(F.col("_owner") < F.col(id_col), 1).otherwise(0))
        .cast("long")
        .alias("n_foreign_dups"),
        F.round(
            F.sum(F.when(F.col("_owner") < F.col(id_col), 1).otherwise(0))
            / F.count("*"),
            4,
        ).alias("dup_frac"),
    )


def pack_sequences(
    docs: DataFrame,
    capacity: int = 512,
    n_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    shard: Column | None = None,
) -> DataFrame:
    """Sequence-packing plan for pre-training batch assembly → (id,
    shard, seq_id, offset, n_tokens): documents are concatenated in
    deterministic id order and split into fixed-``capacity`` token
    sequences; a document whose tokens START inside sequence k belongs to
    sequence k (greedy contiguous packing — the GPT-style concatenate-
    and-slice layout, where a straddling document spills into the next
    sequence rather than opening a fresh one).

    Distributed shape: a corpus-wide running sum would be ONE serial
    window — instead documents are hash-sharded (deterministic
    pmod(xxhash64(id))) and packed independently per shard, so the
    running-sum window partitions by shard and parallelizes. Sequences
    never span shards; with thousands of shards per 100 TB corpus each
    window partition is executor-sized and the per-shard tail waste
    (< capacity tokens) is negligible. Fully deterministic → exactly
    SQL-replayable (window + integer arithmetic, no RNG)."""
    from pyspark.sql.window import Window as W

    shard_expr = (
        shard
        if shard is not None
        else F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards))
    )
    toks = docs.select(
        F.col(id_col),
        shard_expr.cast("long").alias("shard"),
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
    )
    w = W.partitionBy("shard").orderBy(id_col)
    return toks.select(
        F.col(id_col),
        "shard",
        "n_tokens",
        (
            F.coalesce(
                F.sum("n_tokens").over(
                    w.rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0),
            )
        ).alias("offset"),
    ).select(
        F.col(id_col),
        "shard",
        F.floor(F.col("offset") / capacity).cast("long").alias("seq_id"),
        "offset",
        "n_tokens",
    )


def packing_stats(
    packed: DataFrame, capacity: int = 512
) -> DataFrame:
    """Per-sequence fill statistics over a ``pack_sequences`` plan →
    (shard, seq_id, n_docs, n_tokens, fill_rate): one (shard, seq_id)
    keyed aggregate, map-side combinable. fill_rate may exceed 1.0 on
    sequences whose last document straddles the boundary (its tail slice
    spills into the next sequence at materialization time)."""
    return packed.groupBy("shard", "seq_id").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.round(F.sum("n_tokens") / capacity, 4).alias("fill_rate"),
    )


def bigram_perplexity(
    docs: DataFrame,
    reference: DataFrame,
    alpha: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style LM-perplexity quality signal → (id, n_bigrams, ppl):
    train an add-α-smoothed bigram language model on a clean REFERENCE
    corpus, then score every document's perplexity under it — low ppl ≈
    looks like the reference distribution, high ppl ≈ noise/boilerplate.
    The cheap, fully-auditable stand-in for the neural-LM filter every
    production corpus pipeline runs (CCNet uses a wiki-trained LM the
    same way).

    Model: P(cur|prev) = (c(prev,cur) + α) / (c(prev) + α·V), with a
    beginning-of-document pseudo-token as the first context, corpus
    tokens outside the reference vocabulary mapped to '<unk>', and
    V = |reference vocab| + 1 (the unk slot).
    ppl = exp(-Σ ln P / n_bigrams), rounded.

    Scale shape: bigram/context counts are two map-side-combinable
    aggregates over the REFERENCE (small by definition); the model rides
    two broadcast joins into the corpus scan — the corpus itself is
    touched once and shuffled only by the final per-document aggregate.
    The per-document window (lag over token position) partitions by
    document id, so partitions are document-sized. Deterministic
    integer counts + IEEE log arithmetic → exactly SQL-replayable."""
    from pyspark.sql.window import Window as W

    bos = "<s>"
    unk = "<unk>"

    def bigrams(frame: DataFrame) -> DataFrame:
        toks = frame.select(
            F.col(id_col), word_tokens(F.col(text_col)).alias("_tk")
        ).where(F.size("_tk") >= 1)
        pos = toks.select(
            F.col(id_col),
            F.posexplode("_tk").alias("_i", "cur"),
        )
        w = W.partitionBy(id_col).orderBy("_i")
        return pos.select(
            F.col(id_col),
            F.coalesce(F.lag("cur").over(w), F.lit(bos)).alias("prev"),
            "cur",
        )

    vocab = (
        reference.select(
            F.explode(word_tokens(F.col(text_col))).alias("term")
        )
        .distinct()
    )
    v_size = vocab.count() + 1  # + the unk slot

    ref_bi = bigrams(reference)
    big_c = ref_bi.groupBy("prev", "cur").agg(F.count("*").alias("c_bi"))
    ctx_c = ref_bi.groupBy("prev").agg(F.count("*").alias("c_ctx"))

    def unkify(frame: DataFrame, col: str) -> DataFrame:
        return (
            frame.join(
                F.broadcast(vocab.withColumn("_iv", F.lit(True))),
                frame[col] == vocab["term"],
                "left",
            )
            .withColumn(
                col + "_m",
                F.when(
                    (F.col(col) == bos) | F.col("_iv").isNotNull(), F.col(col)
                ).otherwise(F.lit(unk)),
            )
            .drop("term", "_iv")
        )

    corpus_bi = unkify(unkify(bigrams(docs), "prev"), "cur")
    scored = (
        corpus_bi.join(
            F.broadcast(big_c),
            (F.col("prev_m") == big_c["prev"]) & (F.col("cur_m") == big_c["cur"]),
            "left",
        )
        .drop(big_c["prev"])
        .drop(big_c["cur"])
        .join(
            F.broadcast(ctx_c), F.col("prev_m") == ctx_c["prev"], "left"
        )
        .drop(ctx_c["prev"])
        .select(
            F.col(id_col),
            F.log(
                (F.coalesce(F.col("c_bi"), F.lit(0)) + F.lit(alpha))
                / (F.coalesce(F.col("c_ctx"), F.lit(0)) + F.lit(alpha * v_size))
            ).alias("_lp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.round(F.exp(-F.sum("_lp") / F.count("*")), 4).alias("ppl"),
    )


def html_to_text(html: Column) -> Column:
    """Crawl-pipeline HTML→text extraction (trafilatura-lite), as a chain
    of JVM regex passes: drop <script>/<style> blocks and comments, strip
    the remaining tags, decode the five predefined entities, collapse
    whitespace. Zero Python, zero shuffle — a per-row expression chain
    over 100 TB of crawl HTML.

    Every pattern uses only syntax with identical semantics in Java regex
    and RE2 ((?is) flags + non-greedy + character classes), so an
    external SQL oracle replays the extraction byte-for-byte — the same
    engine-exactness contract as the md5 samplers."""
    t = F.regexp_replace(html, r"(?is)<script[^>]*>.*?</script>", " ")
    t = F.regexp_replace(t, r"(?is)<style[^>]*>.*?</style>", " ")
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    t = F.regexp_replace(t, r"(?s)<[^>]+>", " ")
    for ent, ch in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", "\""),
        ("&#39;", "'"), ("&amp;", "&"),  # &amp; LAST (double-escape rule)
    ):
        t = F.replace(t, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def docx_text(document_xml: Column) -> Column:
    """WordprocessingML (a DOCX's ``word/document.xml``) → plain text,
    as a chain of JVM regex passes — the Office-document sibling of
    :func:`html_to_text` for an enterprise/crawl corpus: ``<w:tab/>`` /
    ``<w:br/>`` / ``<w:cr/>`` run children become whitespace, each
    paragraph (``</w:p>``) is a whitespace boundary, the ``<w:t>`` text
    runs inside a paragraph concatenate in document order with NO
    separator (the spec splits runs mid-word on any formatting change;
    ``xml:space="preserve"`` and other attributes are tolerated), every
    other element — ``<w:pPr>``, ``<w:rPr>``, ``<w:instrText>`` field
    codes, proofing marks — is structurally ignored, the five
    predefined XML entities decode, and whitespace collapses.  Zero
    Python, zero shuffle; every pattern is Java/RE2-identical so an
    external SQL oracle can replay it byte-for-byte."""
    # whitespace-significant empty run children become literal runs so
    # they survive the <w:t>-only extraction below
    x = F.regexp_replace(
        document_xml, r"<w:(?:tab|br|cr)\s*/>", "<w:t> </w:t>"
    )
    paras = F.split(x, "</w:p>")
    para_text = F.transform(
        paras,
        lambda p: F.array_join(
            F.regexp_extract_all(
                p, F.lit(r"(?s)<w:t(?:\s[^>]*)?>([^<]*)</w:t>"), F.lit(1)
            ),
            "",
        ),
    )
    t = F.array_join(para_text, " ")
    for ent, ch in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", "\""),
        ("&apos;", "'"), ("&#39;", "'"), ("&amp;", "&"),  # &amp; LAST
    ):
        t = F.replace(t, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def markdown_to_text(md: Column) -> Column:
    """Markdown → plain text as a chain of JVM regex passes — the
    README/docs-corpus sibling of :func:`html_to_text` (code-heavy
    crawls are full of .md): fenced code blocks keep their content and
    drop the fences, images reduce to their alt text and links to
    their anchor text, ATX headers / blockquote markers / list bullets
    / horizontal rules strip at line starts, bold/italic/inline-code
    delimiters unwrap (bold before italic so ``**`` never half-matches
    as two ``*``), backslash escapes unescape LAST (so literal ``\\*``
    survives the emphasis passes), and whitespace collapses.  Zero
    Python, zero shuffle; Java/RE2-compatible patterns throughout."""
    t = F.regexp_replace(md, r"(?s)```[A-Za-z0-9]*\n?(.*?)```", " $1 ")
    t = F.regexp_replace(t, r"!\[([^\]]*)\]\([^)]*\)", "$1")  # images
    t = F.regexp_replace(t, r"\[([^\]]*)\]\([^)]*\)", "$1")  # links
    t = F.regexp_replace(t, r"(?m)^#{1,6}\s+", " ")  # ATX headers
    t = F.regexp_replace(t, r"(?m)^\s*>\s?", " ")  # blockquotes
    t = F.regexp_replace(t, r"(?m)^\s*(?:[-*+]|\d+\.)\s+", " ")  # bullets
    t = F.regexp_replace(t, r"(?m)^\s*(?:-{3,}|\*{3,}|_{3,})\s*$", " ")
    t = F.regexp_replace(t, r"(\*\*|__)(.*?)\1", "$2")  # bold first
    t = F.regexp_replace(t, r"(\*|_)([^*_]+)\1", "$2")  # then italic
    t = F.regexp_replace(t, r"`([^`]+)`", "$1")  # inline code
    t = F.regexp_replace(t, r"\\([\\`*_{}\[\]()#+.!>-])", "$1")  # escapes
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def url_parts(url: Column) -> Column:
    """Parse a URL into a (scheme, host, registered_domain, path) struct
    with pure JVM regexes (RE2-identical syntax, so SQL oracles replay it
    exactly): host is lowercased, a trailing :port is dropped, the
    registered domain is the last two host labels (the public-suffix-list
    refinement is a deployment swap-in), and the path excludes query and
    fragment. The crawl-curation primitive behind per-domain stats,
    blocklist filtering, and URL-keyed dedup."""
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = F.lower(
        F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)
    )
    host = F.regexp_replace(host, r":[0-9]+$", "")
    reg_dom = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    path = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    return F.struct(
        scheme.alias("scheme"),
        host.alias("host"),
        reg_dom.alias("registered_domain"),
        path.alias("path"),
    )


def domain_filter(
    docs: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Blocklist filtering by registered domain: parse once, LEFT ANTI
    join against the (broadcast) blocked-domain set — the shape of every
    crawl-hygiene domain gate. Blocklists are small by nature; at
    millions of entries swap the broadcast for the Bloom-pruned
    semi-join (operators/bloom.py)."""
    parts = docs.withColumn("_u", url_parts(F.col(url_col)))
    b = blocklist.select(F.col(blocklist.columns[0]).alias("_blocked"))
    return (
        parts.join(
            F.broadcast(b),
            parts["_u"]["registered_domain"] == F.col("_blocked"),
            "left_anti",
        )
        .drop("_u")
    )


def extract_links(html: Column) -> Column:
    """All double-quoted href values in a page, in document order — the
    crawl-frontier / web-graph-construction primitive. One
    regexp_extract_all pass with RE2-identical syntax (same
    engine-exactness contract as html_to_text); single-quoted and bare
    attributes are a deployment extension, kept out so the declared
    pattern IS the verifiable contract."""
    return F.regexp_extract_all(html, F.lit(r'(?i)href\s*=\s*"([^"]*)"'), 1)


def hash_embed_sparse(
    docs: DataFrame,
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Feature-hashing document embeddings (Weinberger et al. 2009 — the
    hashing trick), SPARSE form → (id, bucket, weight): each token lands
    in bucket md5[:8] % dim with sign md5[8] parity, weights are signed
    token counts. The cheap, model-free text vectorizer: deterministic,
    vocabulary-free, streamable — and md5-derived, so an external SQL
    oracle reproduces every weight exactly (the engine-exactness contract
    of the sampling family, applied to vectorization).

    One explode + one (id, bucket)-keyed aggregate, map-side combinable;
    no vocabulary state, no broadcast — the property that lets it run on
    the first pass over a 100 TB corpus."""
    toks = docs.select(
        F.col(id_col),
        F.explode(word_tokens(F.col(text_col))).alias("term"),
    )
    h = F.md5(F.col("term"))
    bucket = F.pmod(
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long"), F.lit(dim)
    )
    sign = F.when(
        F.conv(F.substring(h, 9, 1), 16, 10).cast("long") % 2 == 0, F.lit(1)
    ).otherwise(F.lit(-1))
    return toks.select(F.col(id_col), bucket.alias("bucket"), sign.alias("_s")).groupBy(
        id_col, "bucket"
    ).agg(F.sum("_s").cast("long").alias("weight"))


def hash_embed(
    docs: DataFrame,
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Dense form of ``hash_embed_sparse`` → (id, vec array<float>):
    the sparse weights scattered into a dim-length array (JVM
    map_from_entries + sequence transform — no UDF), ready for the
    similarity operators (cosine top-k, semantic dedup, ANN indexes) as
    a drop-in embedding column."""
    sparse = hash_embed_sparse(docs, dim=dim, text_col=text_col, id_col=id_col)
    mapped = sparse.groupBy(id_col).agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("bucket"), F.col("weight")))
        ).alias("_m")
    )
    return mapped.select(
        F.col(id_col),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: F.coalesce(
                F.element_at(F.col("_m"), i.cast("long")), F.lit(0)
            ).cast("float"),
        ).alias("vec"),
    )


def content_defined_chunks(
    docs: DataFrame,
    k: int = 8,
    divisor: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Content-defined chunking (the rolling-boundary scheme behind
    storage/transfer dedup, FastCDC-family) → (id, chunk_id, chunk_len):
    a chunk boundary falls AFTER character position i whenever the
    k-gram ending at i hashes to 0 mod ``divisor`` — so boundaries move
    WITH the content, and an insertion only re-chunks its neighborhood
    (fixed-size chunking would shift every downstream chunk, defeating
    chunk-level dedup). Expected chunk length ≈ divisor.

    The rolling hash is md5 of the k-gram — all JVM expressions, exactly
    SQL-replayable. Positions before the first full k-gram cannot host a
    boundary (no partial windows).

    Execution (r13, guide §2.4 "remove shuffles outright"): boundary
    positions are computed per ROW with array higher-order functions —
    ``filter(sequence(k, len), i -> md5(gram(i)) % divisor = 0)`` — and
    chunk lengths fall out as differences of consecutive boundary
    positions, so the operator is ZERO-shuffle: no position explode, no
    (id, position) window, no aggregation exchange. The previous form
    exploded every character position and shuffled |corpus characters|
    rows through a window + groupBy (2 Exchanges); at 100 TB that shuffle
    was the whole cost. Chunk ids/lengths are identical by construction:
    chunk j spans (b_j, b_{j+1}] over boundary positions b (with b_0 = 0
    and a final synthetic end at len when the text does not end on a
    boundary), which is exactly "chunk of position i = boundaries
    strictly before i" aggregated to counts."""
    base = docs.select(F.col(id_col), F.col(text_col).alias("_t")).where(
        F.length("_t") >= 1
    )

    def _is_boundary(i: Column) -> Column:
        gram = F.substring(F.col("_t"), i - (k - 1), k)
        return (
            F.pmod(
                F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast("long"),
                F.lit(divisor),
            )
            == 0
        )

    # boundary positions, ascending (sequence(k, n) would DESCEND for
    # n < k — guard those rows to an empty array instead)
    withb = base.select(
        F.col(id_col),
        F.length("_t").alias("_n"),
        F.when(
            F.length("_t") >= k,
            F.filter(F.sequence(F.lit(k), F.length("_t")), _is_boundary),
        )
        .otherwise(F.array().cast("array<int>"))
        .alias("_b"),
    )
    # chunk END positions: the boundaries, plus len when the last chunk
    # is open (text does not end exactly on a boundary)
    last_is_len = F.coalesce(
        F.try_element_at(F.col("_b"), F.lit(-1)) == F.col("_n"), F.lit(False)
    )
    withe = withb.select(
        F.col(id_col),
        F.when(last_is_len, F.col("_b"))
        .otherwise(F.concat(F.col("_b"), F.array(F.col("_n"))))
        .alias("_e"),
    )
    # chunk_id = 0-based index of the end position; chunk_len = distance
    # to the previous end (F.get is 0-indexed and NULL-safe at j-1 = -1)
    out = withe.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.col("_e"),
                lambda x, j: x
                - F.coalesce(F.get(F.col("_e"), j - 1), F.lit(0)),
            )
        ).alias("chunk_id", "chunk_len"),
    )
    return out.select(
        F.col(id_col),
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.col("chunk_len").cast("long").alias("chunk_len"),
    )


def kneser_ney_bigram(
    docs: DataFrame,
    discount: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Interpolated Kneser-Ney bigram model over the corpus → one row per
    observed bigram: (context, next_word, c_bi, c_ctx, n_follow_types,
    n_prec_types, p_kn). THE n-gram smoothing that made count-based LMs
    competitive (Kneser & Ney 1995; Chen & Goodman 1998), and the piece
    add-α models (bigram_perplexity above) lack: absolute discounting
    plus a CONTINUATION-count backoff — "how many distinct contexts does
    w follow" rather than "how often does w occur", which is what keeps
    'Francisco' from getting high unigram mass.

        P_KN(w|v) = max(c(v,w) − D, 0)/c(v·)
                    + D·N1+(v·)/c(v·) · N1+(·w)/N1+(··)

    Scale shape: one corpus tokenize pass → the bigram count table
    (vocabulary², but Zipf-sparse — corpus-scans dominate, the model
    table is joinable); every other statistic (context totals, follow
    types, preceding types, total types) is an aggregate or window OVER
    that table, never over the corpus again. All counts are BIGINT; the
    only doubles are the final per-row probability expression, so an
    external SQL oracle replays every value exactly."""
    from pyspark.sql.window import Window as W

    toks = docs.select(
        F.col(id_col), word_tokens(F.col(text_col)).alias("_tk")
    ).where(F.size("_tk") >= 2)
    pos = toks.select(F.col(id_col), F.posexplode("_tk").alias("_i", "cur"))
    w = W.partitionBy(id_col).orderBy("_i")
    bi = (
        pos.select(F.lag("cur").over(w).alias("context"), F.col("cur"))
        .where(F.col("context").isNotNull() & (F.col("context") != "")
               & (F.col("cur") != ""))
    )
    c_bi = bi.groupBy("context", "cur").agg(
        F.count("*").cast("long").alias("c_bi")
    )
    wv = W.partitionBy("context")
    ww = W.partitionBy("cur")
    d = float(discount)
    model = (
        c_bi.withColumn("c_ctx", F.sum("c_bi").over(wv).cast("long"))
        .withColumn("n_follow_types", F.count("*").over(wv).cast("long"))
        .withColumn("n_prec_types", F.count("*").over(ww).cast("long"))
    )
    total_types = c_bi.count()
    p = (
        F.greatest(F.col("c_bi") - F.lit(d), F.lit(0.0)) / F.col("c_ctx")
        + F.lit(d) * F.col("n_follow_types") / F.col("c_ctx")
        * (F.col("n_prec_types") / F.lit(float(total_types)))
    )
    return model.select(
        "context",
        F.col("cur").alias("next_word"),
        "c_bi",
        "c_ctx",
        "n_follow_types",
        "n_prec_types",
        (F.floor(p * 1_000_000 + F.lit(0.5)) / F.lit(1_000_000.0)).alias(
            "p_kn"
        ),
    )


def scrub_duplicate_spans(
    docs: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document duplicate-span REMOVAL (the transform behind
    ``cross_doc_span_stats``' signal; ExactSubstr-style, Lee et al.
    2022 "Deduplicating Training Data Makes Language Models Better"):
    every word n-gram span is owned by the lowest doc id carrying it;
    in every OTHER document, all token positions covered by that span
    are cut. → (id, n_tokens, n_removed, n_kept, kept_md5) where
    kept_md5 fingerprints the reconstructed post-scrub text (tokens in
    original order), so an oracle verifies the actual rewrite, not just
    its size.

    Scale shape: span ownership is one span-keyed min aggregate
    (vocabulary-bounded); coverage is a bounded n× explode of the
    foreign spans; the rewrite is an anti-join on (id, position) + one
    id-keyed ordered fold — no corpus-wide window, no driver state.
    Same codegen discipline as word_span_frame: explode START POSITIONS
    and slice per row, never a transform-lambda under the Generate."""
    toks = docs.select(
        F.col(id_col), word_tokens(F.col(text_col)).alias("_tk")
    )
    pos = toks.select(
        F.col(id_col), F.posexplode("_tk").alias("_p0", "_t")
    ).select(id_col, (F.col("_p0") + 1).alias("_p"), "_t")
    starts = toks.where(F.size("_tk") >= n).select(
        F.col(id_col),
        F.col("_tk"),
        F.explode(
            F.sequence(F.lit(1), F.size("_tk") - (n - 1))
        ).alias("_i"),
    )
    spans = starts.select(
        F.col(id_col),
        "_i",
        F.array_join(F.slice(F.col("_tk"), F.col("_i"), n), " ").alias(
            "span"
        ),
    )
    owners = spans.groupBy("span").agg(F.min(id_col).alias("_owner"))
    foreign = (
        spans.join(owners, "span")
        .where(F.col("_owner") < F.col(id_col))
        .select(id_col, "_i")
        .distinct()
    )
    covered = foreign.select(
        F.col(id_col),
        F.explode(
            F.sequence(F.col("_i"), F.col("_i") + (n - 1))
        ).alias("_p"),
    ).distinct()
    kept = pos.join(covered, [id_col, "_p"], "left_anti")
    agg = kept.groupBy(id_col).agg(
        F.count("*").cast("long").alias("_n_kept"),
        F.md5(
            F.encode(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("_p", "_t"))
                        ),
                        lambda s: s["_t"],
                    ),
                    " ",
                ),
                "utf-8",
            )
        ).alias("_kept_md5"),
    )
    census = toks.select(
        F.col(id_col), F.size("_tk").cast("long").alias("n_tokens")
    )
    empty_md5 = "d41d8cd98f00b204e9800998ecf8427e"  # md5("")
    return census.join(agg, id_col, "left").select(
        F.col(id_col),
        "n_tokens",
        (F.col("n_tokens") - F.coalesce(F.col("_n_kept"), F.lit(0)))
        .cast("long")
        .alias("n_removed"),
        F.coalesce(F.col("_n_kept"), F.lit(0)).cast("long").alias("n_kept"),
        F.coalesce(F.col("_kept_md5"), F.lit(empty_md5)).alias("kept_md5"),
    )


GOPHER_STOPWORDS = ("the", "a", "value", "table", "data")


def gopher_rules(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    stopwords: tuple[str, ...] = GOPHER_STOPWORDS,
) -> DataFrame:
    """Gopher-style quality-rule verdicts (Rae 2021 §A1.1), one boolean
    per rule plus the conjunction: word-count band [25, 100000],
    mean word length in [3, 10], ≥ 0.8 of words containing an alphabetic
    character, stop-word fraction ≥ 0.05. Every threshold is evaluated in
    cross-multiplied INTEGER arithmetic (sum_len ≥ 3·n_words, not
    sum_len/n_words ≥ 3.0) so the verdicts are bit-exact in any engine.
    One projection of higher-order array expressions over the word split
    — whole-stage-codegen JVM, zero shuffle, zero Python."""
    t = F.trim(F.col(text_col))
    ws = F.split(t, r"\s+")
    stop_arr = F.array(*[F.lit(s) for s in stopwords])
    n_words = F.size(ws)
    sum_len = F.aggregate(
        F.transform(ws, lambda x: F.length(x).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    n_alpha_w = F.size(F.filter(ws, lambda x: x.rlike("[A-Za-z]")))
    n_stop = F.size(
        F.filter(ws, lambda x: F.array_contains(stop_arr, x))
    )
    r_wc = (n_words >= 25) & (n_words <= 100000)
    r_mwl = (sum_len >= 3 * n_words) & (sum_len <= 10 * n_words)
    r_alpha = n_alpha_w * 5 >= n_words * 4
    r_stop = n_stop * 20 >= n_words
    return docs.where(F.length(t) > 0).select(
        F.col(id_col),
        r_wc.alias("r_word_count"),
        r_mwl.alias("r_mean_word_len"),
        r_alpha.alias("r_alpha_words"),
        r_stop.alias("r_stop_words"),
        (r_wc & r_mwl & r_alpha & r_stop).alias("passes_all"),
    )


def ipynb_cells(
    notebooks: DataFrame,
    json_col: str = "notebook",
    id_col: str = "doc_id",
) -> DataFrame:
    """Jupyter-notebook cell extraction — code corpora (The-Stack-style)
    ship .ipynb files, and the training-data pass pulls their markdown
    prose and code sources out of the nbformat-4 JSON: ``from_json``
    under a partial cells schema (unknown notebook fields tolerated,
    the same contract as the Delta action schema), ``posexplode`` to
    one row per cell, sources joined line-array → text.  JVM
    expressions end to end — a notebook corpus parses inside
    whole-stage codegen with zero Python.  Output: (id, cell_idx,
    cell_type, n_lines, source).  Notebooks whose JSON fails to parse
    yield NULL cells and are dropped (count them upstream via
    ``from_json`` null checks if the pipeline needs an error census).
    """
    schema = T.StructType([
        T.StructField("nbformat", T.LongType()),
        T.StructField("cells", T.ArrayType(T.StructType([
            T.StructField("cell_type", T.StringType()),
            T.StructField("source", T.ArrayType(T.StringType())),
        ]))),
    ])
    parsed = notebooks.select(
        F.col(id_col),
        F.from_json(F.col(json_col), schema).alias("_nb"),
    )
    return parsed.select(
        F.col(id_col),
        F.posexplode("_nb.cells").alias("cell_idx", "_c"),
    ).select(
        F.col(id_col),
        F.col("cell_idx").cast("long").alias("cell_idx"),
        F.col("_c.cell_type").alias("cell_type"),
        F.size("_c.source").cast("long").alias("n_lines"),
        F.concat_ws("", F.col("_c.source")).alias("source"),
    )


def robots_directives(
    docs: DataFrame,
    robots_col: str = "robots",
    id_col: str = "doc_id",
) -> DataFrame:
    """robots.txt parsing — the politeness layer every crawl pipeline
    evaluates before fetching (REP, RFC 9309): lines split and
    posexploded, comments (#) and blanks dropped, ``directive: value``
    pairs extracted by regex, and directives assigned to their
    governing User-agent GROUP per the spec's stacking rule —
    consecutive User-agent lines open ONE group that every following
    non-UA directive belongs to, and a UA line after a directive line
    starts a new group.  The group walk is a lag + running-sum window
    partitioned by document (one shuffle on the id, scales to a
    billion-host robots corpus).  Output: (id, group_idx, agents
    [comma-joined, sorted], directive [lowercased], value); directives
    before any User-agent line are invalid per the RFC and dropped.
    JVM expressions end to end."""
    from pyspark.sql import Window

    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(robots_col), "\n")).alias(
            "_pos", "_line"
        ),
    ).select(
        F.col(id_col),
        "_pos",
        F.trim(F.regexp_replace("_line", "#.*$", "")).alias("_line"),
    ).where(F.col("_line") != "")
    parsed = lines.select(
        F.col(id_col),
        "_pos",
        F.lower(
            F.regexp_extract("_line", r"^([A-Za-z][A-Za-z-]*)\s*:", 1)
        ).alias("directive"),
        F.trim(F.regexp_extract("_line", r":(.*)$", 1)).alias("value"),
    ).where(F.col("directive") != "")
    w = Window.partitionBy(id_col).orderBy("_pos")
    grouped = parsed.withColumn(
        "_is_ua", (F.col("directive") == "user-agent").cast("int")
    ).withColumn(
        "_new_group",
        (
            (F.col("_is_ua") == 1)
            & (F.coalesce(F.lag("_is_ua").over(w), F.lit(0)) == 0)
        ).cast("int"),
    ).withColumn(
        "group_idx",
        F.sum("_new_group").over(w).cast("long") - 1,
    ).where(F.col("group_idx") >= 0)
    agents = (
        grouped.where(F.col("_is_ua") == 1)
        .groupBy(id_col, "group_idx")
        .agg(
            F.concat_ws(
                ",", F.array_sort(F.collect_list("value"))
            ).alias("agents")
        )
    )
    return (
        grouped.where(F.col("_is_ua") == 0)
        .join(agents, [id_col, "group_idx"])
        .select(id_col, "group_idx", "agents", "directive", "value")
    )


def sitemap_entries(
    docs: DataFrame,
    sitemap_col: str = "sitemap",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sitemap-protocol parsing (sitemaps.org XML) — the discovery
    half of the crawl-politeness layer next to
    :func:`robots_directives`: ``<url>`` blocks split and posexploded,
    per-block ``<loc>`` / ``<lastmod>`` / ``<changefreq>`` /
    ``<priority>`` extracted by regex (missing optional fields yield
    NULLs, XML comments and the urlset namespace scaffolding are
    structurally ignored, the five predefined entities decode in loc).
    Output: (id, url_idx, loc, lastmod, changefreq, priority) — pure
    JVM expressions, one narrow explode, no shuffle."""
    blocks = F.filter(
        F.split(F.col(sitemap_col), "</url>"),
        lambda b: b.contains("<loc>"),
    )
    ex = docs.select(
        F.col(id_col),
        F.posexplode(blocks).alias("url_idx", "_b"),
    )

    def tag(name):
        return F.regexp_extract(
            F.col("_b"), f"(?s)<{name}>\\s*(.*?)\\s*</{name}>", 1
        )

    loc = tag("loc")
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", "\""),
                    ("&apos;", "'"), ("&amp;", "&")):
        loc = F.replace(loc, F.lit(ent), F.lit(ch))
    opt = lambda c: F.when(c != "", c)  # noqa: E731
    return ex.select(
        F.col(id_col),
        F.col("url_idx").cast("long").alias("url_idx"),
        loc.alias("loc"),
        opt(tag("lastmod")).alias("lastmod"),
        opt(tag("changefreq")).alias("changefreq"),
        opt(tag("priority")).cast("double").alias("priority"),
    )


def eml_message(
    docs: DataFrame,
    eml_col: str = "eml",
    id_col: str = "doc_id",
    extra_cols: tuple = (),
) -> DataFrame:
    """RFC 5322 message parsing — the enterprise/mailing-list-archive
    ingestion pass (mbox splitting is one regexp upstream of this):
    the header block ends at the first blank line, folded headers
    unfold per §2.2.3 (CRLF followed by WSP joins with one space),
    standard headers extract case-insensitively with an
    angle-bracketed addr-spec preferred over the bare form, and the
    body is everything after the blank line.  Output: (id, subject,
    from_addr, to_addr, date, body) — pure JVM regex, zero shuffle."""
    raw = F.col(eml_col)
    hdr = F.regexp_extract(raw, r"(?s)^(.*?)\r?\n\r?\n", 1)
    body = F.regexp_replace(raw, r"(?s)^.*?\r?\n\r?\n", "")
    unfolded = F.regexp_replace(hdr, r"\r?\n[ \t]+", " ")

    def header(name):
        v = F.regexp_extract(
            unfolded, f"(?im)^{name}:[ \\t]*([^\\r\\n]*)", 1
        )
        return F.when(F.trim(v) != "", F.trim(v))

    def addr(name):
        v = header(name)
        bracketed = F.regexp_extract(v, r"<([^>]*)>", 1)
        return F.when(bracketed != "", bracketed).otherwise(v)

    return docs.select(
        F.col(id_col),
        *[F.col(c) for c in extra_cols],
        header("Subject").alias("subject"),
        addr("From").alias("from_addr"),
        addr("To").alias("to_addr"),
        header("Date").alias("date"),
        body.alias("body"),
    )


def robots_path_allowed(
    rules: DataFrame,
    paths: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """RFC 9309 §2.2.2 path-rule evaluation — the decision half of the
    politeness layer (robots_directives parses the file; this answers
    "may I fetch this URL?"): ``rules`` is (id, directive
    ['allow'|'disallow'], value) for ONE applicable group, ``paths``
    is (id, path_idx, path).  Rule values follow the spec's matching
    syntax — prefix match, ``*`` wildcard, ``$`` end anchor — compiled
    per rule into an anchored Java regex (metachars escaped first, the
    two spec wildcards last).  The MOST SPECIFIC match wins (longest
    rule value in octets), and on a length tie allow beats disallow; a
    path matching no rule is allowed.  One bounded join
    (rules-per-host is small) + one window per path; output: (id,
    path_idx, path, allowed, winning_rule, rule_len)."""
    from pyspark.sql import Window

    # regex-escape everything EXCEPT the spec wildcards * and $
    esc = F.regexp_replace(
        F.col("value"), r"([.\\+?(){}^\[\]|])", r"\\$1"
    )
    compiled = rules.select(
        F.col(id_col),
        F.col("directive"),
        F.col("value"),
        F.length("value").cast("long").alias("rule_len"),
        esc.alias("_esc"),
    ).select(
        id_col,
        "directive",
        "value",
        "rule_len",
        F.concat(
            F.lit("^"),
            F.replace(
                # a trailing $ is the spec's end anchor and stays one;
                # any interior $ is literal
                F.when(
                    F.col("_esc").endswith("$"),
                    F.expr("substring(_esc, 1, length(_esc) - 1)"),
                ).otherwise(F.col("_esc")),
                F.lit("*"), F.lit(".*"),
            ),
            F.when(F.col("_esc").endswith("$"), F.lit("$"))
            .otherwise(F.lit("")),
        ).alias("_pat"),
    )
    matched = paths.join(compiled, id_col).where(
        F.expr("path rlike _pat")
    )
    w = Window.partitionBy(id_col, "path_idx").orderBy(
        F.col("rule_len").desc(),
        # tie: allow beats disallow (RFC 9309 §2.2.2 last paragraph)
        F.when(F.col("directive") == "allow", 0).otherwise(1),
    )
    best = (
        matched.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            F.col(id_col),
            "path_idx",
            (F.col("directive") == "allow").alias("allowed"),
            F.col("value").alias("winning_rule"),
            "rule_len",
        )
    )
    return (
        paths.join(best, [id_col, "path_idx"], "left")
        .select(
            F.col(id_col),
            "path_idx",
            "path",
            F.coalesce("allowed", F.lit(True)).alias("allowed"),
            "winning_rule",
            F.coalesce("rule_len", F.lit(0)).alias("rule_len"),
        )
    )


def mbox_messages(
    docs: DataFrame,
    mbox_col: str = "mbox",
    id_col: str = "doc_id",
) -> DataFrame:
    """mbox mailbox splitting — the archive framing upstream of
    :func:`eml_message` (mailing-list dumps, Takeout exports): messages
    are delimited by postmark lines (``From `` at line start, the
    classic mboxo/mboxrd convention), the postmark itself is metadata
    not message text, and ``>From `` quoting in bodies un-escapes per
    mboxrd.  Output: (id, msg_idx, eml) — one row per message, ready
    for eml_message.  Pure JVM split + posexplode."""
    msgs = F.filter(
        F.split(F.col(mbox_col), r"(?m)^From [^\n]*\r?\n"),
        lambda m: F.trim(m) != "",
    )
    return docs.select(
        F.col(id_col),
        F.posexplode(msgs).alias("msg_idx", "_m"),
    ).select(
        F.col(id_col),
        F.col("msg_idx").cast("long").alias("msg_idx"),
        # mboxrd body quoting: >From at line start un-escapes one level
        F.regexp_replace(F.col("_m"), r"(?m)^>From ", "From ")
        .alias("eml"),
    )


def canonicalize_url(url: Column) -> Column:
    """URL canonicalization — the crawl-dedup primitive that merges
    the dozens of spellings one page arrives under: scheme and host
    lowercase, default ports drop (:80 http / :443 https), the
    fragment drops, tracking parameters drop (utm_*, gclid, fbclid,
    msclkid, ref), surviving query parameters SORT (order never
    distinguishes resources in practice), and an empty residual query
    loses its '?'.  Pure JVM expressions; composes with url_parts and
    the exact/MinHash dedup family upstream."""
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = F.lower(F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    host = (
        F.when(scheme == "http", F.regexp_replace(host, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(host, ":443$", ""))
        .otherwise(host)
    )
    path = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(url, r"\?([^#]*)", 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(
                "^(utm_[^=]*|gclid|fbclid|msclkid|ref)="
            ),
        )
    )
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(
            F.size(params) > 0,
            F.concat(F.lit("?"), F.array_join(params, "&")),
        ).otherwise(F.lit("")),
    )


def html_tables(
    docs: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
) -> DataFrame:
    """HTML table mining — the structured-data half of crawl text
    extraction (:func:`html_to_text` flattens pages; this recovers the
    relational payloads embedded in them): tables split on
    ``</table>``, rows on ``</tr>``, cells extracted as ``<td>`` /
    ``<th>`` with attributes tolerated, inner markup stripped, the
    five predefined entities decoded, and whitespace collapsed.
    Output: one row per cell — (id, table_idx, row_idx, col_idx,
    cell, is_header) — via two nested posexplodes; pure JVM, no
    shuffle, so a billion-page crawl mines tables at scan speed."""
    tables = F.filter(
        F.split(F.col(html_col), "(?i)</table>"),
        lambda t: t.rlike("(?is)<tr[\\s>]"),
    )
    ex_t = docs.select(
        F.col(id_col),
        F.posexplode(tables).alias("table_idx", "_t"),
    )
    rows = F.filter(
        F.split(F.col("_t"), "(?i)</tr>"),
        lambda r: r.rlike("(?is)<t[dh][\\s>]"),
    )
    ex_r = ex_t.select(
        F.col(id_col),
        "table_idx",
        F.posexplode(rows).alias("row_idx", "_r"),
    )
    cells = F.regexp_extract_all(
        F.col("_r"), F.lit(r"(?is)<(t[dh])(?:\s[^>]*)?>(.*?)</t[dh]>"),
        F.lit(0),
    )
    ex_c = ex_r.select(
        F.col(id_col),
        "table_idx",
        "row_idx",
        F.posexplode(cells).alias("col_idx", "_c"),
    )
    text = F.regexp_replace(F.col("_c"), r"(?s)<[^>]+>", " ")
    for ent, ch in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", "\""),
        ("&#39;", "'"), ("&amp;", "&"),  # &amp; LAST
    ):
        text = F.replace(text, F.lit(ent), F.lit(ch))
    return ex_c.select(
        F.col(id_col),
        F.col("table_idx").cast("long").alias("table_idx"),
        F.col("row_idx").cast("long").alias("row_idx"),
        F.col("col_idx").cast("long").alias("col_idx"),
        F.trim(F.regexp_replace(text, r"\s+", " ")).alias("cell"),
        F.col("_c").rlike("(?is)^<th[\\s>]").alias("is_header"),
    )


def access_log_fields(line: Column) -> Column:
    """NCSA Combined Log Format parsing — the web-server access log
    every traffic/abuse/referrer analysis starts from (Apache/nginx
    default): ``host ident authuser [time] "method path proto" status
    bytes "referer" "user-agent"``.  One anchored JVM regex per field;
    '-' sentinels become NULLs, bytes '-' becomes 0 (a 304 sends no
    body), the request line splits into method/path/protocol.  Returns
    a struct; a line that fails the envelope yields NULL fields rather
    than poisoning the scan."""
    core = (
        r'^(\S+) (\S+) (\S+) \[([^\]]+)\] "(\S+) (\S+) ([^"]*)" '
        r'(\d{3}) (\S+)(?: "([^"]*)" "([^"]*)")?'
    )

    def grp(i):
        return F.regexp_extract(line, core, i)

    def opt(c):
        return F.when((c != "") & (c != "-"), c)

    return F.struct(
        opt(grp(1)).alias("host"),
        opt(grp(3)).alias("user"),
        opt(grp(4)).alias("ts"),
        opt(grp(5)).alias("method"),
        opt(grp(6)).alias("path"),
        opt(grp(7)).alias("protocol"),
        # opt() first: a malformed line extracts '' and an ANSI-mode
        # cast of '' to long throws instead of yielding NULL; bytes is
        # \S+ on the wire so garbage there try_casts to the 0 fallback
        opt(grp(8)).cast("long").alias("status"),
        F.coalesce(opt(grp(9)).try_cast("long"), F.lit(0)).alias("bytes"),
        opt(grp(10)).alias("referer"),
        opt(grp(11)).alias("user_agent"),
    )
