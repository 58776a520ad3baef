#!/usr/bin/env python
"""End-to-end LLM training-corpus preparation pipeline — the round-trip a
data-curation team runs before pre-training, composed entirely from this
engine's operators and kept as ONE lazy-per-stage Spark job chain. Runs
standalone on the sf0.001 fixtures in ~1 min:

    python examples/corpus_pipeline.py [sf_dir]

Stages (each prints one line; executed by tests/test_examples.py so it
cannot rot):

0. crawl entry      — WARC archives -> record fan-out -> HTML extraction
0b. snapshot QA     — one-scan constraint audit (not-null/unique/nonempty)
1. quality gating   — Gopher repetition signals + heuristic quality score
1b. perplexity gate — CCNet-style bigram-LM scoring vs a clean split
2. exact dedup      — xxhash64 fingerprint groups
3. near dedup       — MinHash-LSH candidate pairs → connected-component
                      cluster representatives
3b. drift monitor   — KS (distributed prefix-sum ECDF) + PSI, raw vs deduped
4. PII scrub        — regex redaction (emails/phones), zero-shuffle
5. tokenizer prep   — BPE merge training + vocab/OOV coverage check
6. packing stats    — token counts for batch/sequence planning
7. lineage sample   — deterministic md5 hash-sample for eval holdout
8. split assignment — hash-stable stratified 80/10/10 train/val/test

At 100 TB each stage is shuffle-partitionable exactly as written: the
gates are per-row expressions, dedup keys are hash buckets, BPE rounds
touch only the word dictionary, and the sample is data-lineage
deterministic (same rows on every rerun).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    t_start = time.time()

    def log(msg: str) -> None:
        print(f"[{time.time()-t_start:6.1f}s] {msg}", flush=True)
    import pyspark.sql.functions as F

    from torcdb_spark import get_spark
    from torcdb_spark.analytics import connected_components
    from torcdb_spark.operators.bpe import bpe_encode, bpe_train
    from torcdb_spark.operators.dedup import exact_dedup, minhash_lsh_dedup
    from torcdb_spark.operators.text import (
        hash_sample,
        quality_score,
        redact_pii,
        repetition_signals,
        vocab_oov,
    )

    spark = get_spark(app_name="corpus-pipeline-example")
    spark.sparkContext.setLogLevel("ERROR")
    raw = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # 0 — crawl entry: WARC archives (one .warc.gz per source, real
    # gzip-member codec) -> per-record fan-out -> HTML text extraction
    import pandas as pd

    from torcdb_spark.operators.text import html_to_text
    from torcdb_spark.sources.warc import warc_records, write_warc

    def build(pdf):
        recs = [
            (
                {"WARC-Target-URI": f"http://fixture/{int(r.doc_id)}"},
                (
                    f"<html><body><h1>{int(r.doc_id)}</h1>"
                    f"<p>{r.text}</p></body></html>"
                ).encode(),
            )
            for r in pdf.sort_values("doc_id").itertuples()
        ]
        return pd.DataFrame(
            {"path": [pdf["source"].iloc[0]], "content": [write_warc(recs)]}
        )

    archives = raw.select("doc_id", "source", "text").groupBy("source").applyInPandas(
        build, "path string, content binary"
    )
    docs = (
        warc_records(archives)
        .where(F.col("warc_type") == "response")
        .select(
            F.regexp_extract("target_uri", r"/(\d+)$", 1).cast("long").alias("doc_id"),
            html_to_text(F.decode("payload", "utf-8")).alias("text"),
        )
    )
    n0 = docs.count()
    log(f"warc ingest + html extract: {n0} docs from {archives.count()} archives")

    # 0b — snapshot QA gate: one-scan constraint audit blesses the batch
    # before any expensive stage runs (Deequ role, operators/audit.py)
    from torcdb_spark.operators import audit as A

    audit_rows = A.constraint_audit(docs, [
        A.not_null("doc_id"),
        A.unique("doc_id"),
        A.satisfies("text_nonempty", F.length(F.trim("text")) > 0),
    ]).collect()
    assert all(r.passed for r in audit_rows), audit_rows
    log(f"qa gate: {len(audit_rows)} constraints green on {n0} docs")

    # 1 — quality gating: drop highly repetitive or low-quality docs
    rep = repetition_signals(docs)
    q = quality_score(docs)
    gated = (
        docs.join(rep.select("doc_id", "dup5_frac", "word_rep_ratio"), "doc_id")
        .join(q, "doc_id")
        .where(
            (F.col("dup5_frac") < 0.6)
            & (F.col("word_rep_ratio") < 0.9)
            & (F.col("quality") > 0.2)
        )
        .select("doc_id", "text")
    )
    n1 = gated.count()
    log(f"quality gate: {n0} -> {n1} docs")

    # 1b — LM-perplexity gate (CCNet-style): score against a bigram LM
    # trained on a held-out clean split; keep the in-distribution half
    from torcdb_spark.operators.text import bigram_perplexity

    ppl = bigram_perplexity(gated, gated.where("doc_id % 29 = 0"))
    med = ppl.agg(F.expr("percentile_approx(ppl, 0.5)")).first()[0]
    gated = gated.join(
        ppl.where(F.col("ppl") <= F.lit(med) * 1.5).select("doc_id"), "doc_id"
    )
    log(f"perplexity gate: median ppl {med:.1f}, kept {gated.count()} docs")

    # 2 — exact dedup on normalized fingerprints (keep min-id survivor)
    survivors = exact_dedup(gated, text_col="text", id_col="doc_id")
    exact = gated.join(survivors.select("doc_id"), "doc_id", "left_semi")
    n2 = exact.count()
    log(f"exact dedup: {n1} -> {n2} docs")

    # 3 — near dedup: LSH candidate pairs -> connected-component clusters
    #     -> keep each cluster's min-id representative
    pairs = minhash_lsh_dedup(
        exact, num_perm=32, bands=8, jaccard_threshold=0.5
    )
    cluster_edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    cc = connected_components(cluster_edges)
    dupes = cc.where(F.col("id") != F.col("component")).select(
        F.col("id").alias("doc_id")
    )
    reps = exact.join(dupes, "doc_id", "left_anti")
    n3 = reps.count()
    log(f"near dedup: {n2} -> {n3} docs")

    # 3b — drift monitor: did the dedup stages shift the length
    # distribution? KS via the distributed prefix-sum ECDF + smoothed PSI
    # (operators/drift.py) — the check a pipeline runs snapshot-to-snapshot
    from torcdb_spark.operators.drift import ecdf_max_gap, psi

    two_pop = (
        docs.select(F.length("text").cast("double").alias("v"),
                    F.lit(True).alias("is_a"))
        .unionByName(
            reps.select(F.length("text").cast("double").alias("v"),
                        F.lit(False).alias("is_a"))
        )
    )
    ks_row = ecdf_max_gap(two_pop, "v", "is_a").first()
    psi_row = psi(two_pop, "v", "is_a", bin_width=200.0, num_bins=10).first()
    log(
        f"drift raw->dedup: KS D={ks_row.ks_d} PSI={psi_row.psi} "
        f"(n {ks_row.n_a} vs {ks_row.n_b})"
    )

    # 3c — span scrub: cut cross-document duplicated trigram spans from
    # the surviving docs (ExactSubstr rewrite; near-dedup removes whole
    # near-copies, this removes boilerplate SHARED by otherwise-distinct
    # docs). Census only here; the rewrite itself is oracle-verified in
    # the d24 gate query.
    from torcdb_spark.operators.text import scrub_duplicate_spans

    scrub = scrub_duplicate_spans(reps, n=3)
    srow = scrub.agg(
        F.sum("n_removed").alias("cut"), F.sum("n_tokens").alias("tot")
    ).first()
    log(f"span scrub: {srow.cut}/{srow.tot} tokens cut as foreign dup spans")

    # 4 — PII scrub (zero shuffle, per-row regexes)
    clean = redact_pii(reps, text_col="text", id_col="doc_id").select(
        "doc_id", F.col("clean_text").alias("text")
    )
    log(f"pii scrub: {n3} docs scrubbed")

    # 5 — tokenizer prep: learn merges, check vocabulary coverage
    merges = bpe_train(clean.select("doc_id", "text"), num_merges=8)
    top = merges.orderBy("merge_rank").first()
    oov = vocab_oov(clean, vocab_size=16)
    worst = oov.agg(F.round(F.max("oov_frac"), 4)).first()[0]
    log(f"bpe: first merge {top.left}+{top.right} (n={top.pair_count}); max OOV {worst}")

    # 6 — sequence packing: shard-parallel concatenate-and-slice plan
    from torcdb_spark.operators.text import pack_sequences, packing_stats

    enc = bpe_encode(clean.select("doc_id", "text"), merges)
    stats = enc.agg(
        F.sum("n_bpe_tokens").alias("total"),
        F.round(F.avg("n_bpe_tokens"), 1).alias("mean"),
    ).first()
    packed = packing_stats(
        pack_sequences(clean, capacity=256, n_shards=4), capacity=256
    )
    fill = packed.agg(F.round(F.avg("fill_rate"), 3)).first()[0]
    log(
        f"packing: {stats.total} BPE tokens, mean {stats.mean}/doc; "
        f"{packed.count()} sequences of 256, mean fill {fill}"
    )

    # 7 — deterministic eval holdout (reruns pick the SAME rows)
    holdout = hash_sample(clean, rate_pct=5, id_col="doc_id")
    log(f"holdout sample: {holdout.count()} docs (5% hash-deterministic)")

    # 8 — train/val/test assignment: hash-stable 80/10/10 split; a doc's
    # split never changes as the corpus grows (operators/sampling.py)
    from torcdb_spark.operators.sampling import stratified_split

    split_census = (
        stratified_split(clean, id_col="doc_id")
        .groupBy("split").count().orderBy("split").collect()
    )
    log("split census: " + ", ".join(f"{r.split}={r['count']}" for r in split_census))

    # 9 — reward-model pairs: best-vs-worst quality extremes per source
    # group, margin-gated — the RLHF data builder (operators/rank.py)
    from torcdb_spark.operators.rank import preference_pairs
    from torcdb_spark.operators.text import quality_score as qscore

    scored_docs = qscore(docs).join(raw.select("doc_id", "source"), "doc_id")
    prefs = preference_pairs(
        scored_docs, ["source"], "doc_id", "quality", k=2, min_margin=0.05
    )
    log(f"preference pairs: {prefs.count()} chosen/rejected pairs")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
