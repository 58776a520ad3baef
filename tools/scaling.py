#!/usr/bin/env python
"""Scaling-slope artifact generator (VERDICT r8 ask #3): times the N most
expensive queries of the latest bench record at ALL THREE fixture scale
factors (sf0.001 / sf0.01 / sf0.1 — 100× row growth end-to-end) and
reports the wall-time-vs-data log-log slope per query, converting the
"fixed superstep overhead dominates at sf0.1" claim into evidence.

slope = log(t_sf0.1 / t_sf0.001) / log(100): ~0 means the cost is fixed
overhead (bounded-core witnesses, iterative superstep scheduling), ~1
means linear in the data, >1 is super-linear and gets a root-cause note.

Usage: python tools/scaling.py [N | name ...]   (writes SCALING.md)
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SFS = ("0.001", "0.01", "0.1")


def main() -> None:
    from torcdb_spark.queries import queries
    from torcdb_spark.session import get_spark

    qs = queries()
    args = sys.argv[1:]
    if args and not args[0].isdigit():
        names = args
    else:
        n = int(args[0]) if args else 10
        with open(os.path.join(REPO, "bench_detail.json")) as f:
            timings = json.load(f)["queries"]
        names = [
            k
            for k, _ in sorted(timings.items(), key=lambda kv: -kv[1])
            if k in qs and not k.startswith("st_")
        ][:n]

    spark = get_spark(app_name="torcdb_spark-scaling")
    spark.sparkContext.setLogLevel("ERROR")

    from torcdb_spark.sources.tables import TABLE_NAMES, load_table

    rows_at: dict[str, int] = {}
    for sf in SFS:
        sf_dir = f"/root/testdata/sf{sf}"
        total = 0
        for t in TABLE_NAMES:
            total += spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
        rows_at[sf] = total

    import gc

    result: dict[str, dict[str, float]] = {k: {} for k in names}
    for sf in SFS:
        sf_dir = f"/root/testdata/sf{sf}"
        # per-SF warmup: pay footer reads / codegen outside the timings
        for t in TABLE_NAMES:
            load_table(spark, sf_dir, t).write.format("noop").mode(
                "overwrite"
            ).save()
        for name in names:
            best = None
            try:
                for _ in range(2):
                    t0 = time.perf_counter()
                    qs[name](spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    took = time.perf_counter() - t0
                    best = took if best is None else min(best, took)
            except Exception as exc:
                print(f"scaling: {name}@sf{sf} FAILED: {exc}",
                      file=sys.stderr)
                best = -1.0
            result[name][sf] = round(best, 3)
            spark.catalog.clearCache()
            gc.collect()
            print(f"scaling: {name}@sf{sf} {result[name][sf]}s",
                  file=sys.stderr)

    # Burst re-measurement (same mechanism as bench.py's recheck pass):
    # the shared host delivers multi-second CPU-steal bursts that land on
    # whichever cell is executing — observed ssj1@sf0.1 119 s vs 4.7 s in
    # the same hour, g_betweenness@sf0.1 95 s on the immediate re-run. A
    # cell is suspect when it exceeds 2× the same query's bench_detail
    # suite record (sf0.1 anchor) or sits non-monotonically above the
    # sf0.1 cell. Two sweeps, min kept — by the second sweep the burst
    # window has usually moved.
    bench: dict[str, float] = {}
    try:
        with open(os.path.join(REPO, "bench_detail.json")) as f:
            bench = {
                k: v for k, v in json.load(f)["queries"].items() if v > 0
            }
    except (OSError, ValueError, KeyError):
        pass

    def suspect(name: str, sf: str) -> bool:
        t = result[name][sf]
        if t < 0:
            return False
        if sf == "0.1" and bench.get(name, 0) > 0 and t > 2 * bench[name]:
            return True
        return sf != "0.1" and result[name]["0.1"] > 0 and (
            t > 1.5 * result[name]["0.1"]
        )

    for sweep in range(2):
        flagged = [
            (name, sf)
            for name in names
            for sf in SFS
            if suspect(name, sf)
        ]
        if not flagged:
            break
        for name, sf in flagged:
            sf_dir = f"/root/testdata/sf{sf}"
            try:
                for _ in range(2):
                    t0 = time.perf_counter()
                    qs[name](spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    result[name][sf] = round(
                        min(result[name][sf], time.perf_counter() - t0), 3
                    )
            except Exception as exc:
                print(f"scaling: recheck {name}@sf{sf} FAILED: {exc}",
                      file=sys.stderr)
            spark.catalog.clearCache()
            gc.collect()
            print(
                f"scaling: recheck[{sweep}] {name}@sf{sf} "
                f"{result[name][sf]}s",
                file=sys.stderr,
            )

    data_ratio = rows_at["0.1"] / rows_at["0.001"]
    out = [
        "# SCALING — wall-time slope of the most expensive queries across "
        "sf0.001 → sf0.1",
        "",
        f"Generated by tools/scaling.py (min-of-2 per cell, noop sink, "
        f"local[{spark.sparkContext.defaultParallelism}]). Fixture rows: "
        + ", ".join(f"sf{sf}={rows_at[sf]:,}" for sf in SFS)
        + f" ({data_ratio:.0f}× end-to-end).",
        "",
        "slope = log(t_sf0.1/t_sf0.001)/log(rows_sf0.1/rows_sf0.001): "
        "**~0** = fixed overhead dominates (bounded-core witness or "
        "superstep scheduling, NOT data volume); **~1** = linear in the "
        "data; **>1** = super-linear (root-cause note below).",
        "",
        "| query | sf0.001 s | sf0.01 s | sf0.1 s | slope |",
        "|---|---|---|---|---|",
    ]
    superlinear = []
    for name in names:
        r = result[name]
        if min(r.values()) < 0:
            out.append(f"| {name} | {r['0.001']} | {r['0.01']} | {r['0.1']} "
                       "| (failed) |")
            continue
        slope = (
            math.log(max(r["0.1"], 1e-3) / max(r["0.001"], 1e-3))
            / math.log(data_ratio)
        )
        out.append(
            f"| {name} | {r['0.001']} | {r['0.01']} | {r['0.1']} "
            f"| {slope:.2f} |"
        )
        if slope > 1.05:
            superlinear.append((name, slope))
    out.append("")
    if superlinear:
        out.append("## Super-linear queries (need a root-cause note)")
        out.append("")
        for name, slope in superlinear:
            out.append(f"- **{name}** (slope {slope:.2f})")
        out.append("")
    out.append(
        "## Why no sf1 column (VERDICT r9 ask #8)\n\n"
        "The driver provides fixtures only at sf0.001/0.01/0.1 — there "
        "is no sf1 parquet to extend the series with. Synthesizing one "
        "by replicating sf0.1 with shifted keys was considered and "
        "rejected: replicated document TEXT corrupts exactly the "
        "measurements that matter (the dedup/similarity family — d13, "
        "d26, ssj1, m7b — would see every row gain 10 near-identical "
        "twins, inflating candidate-pair counts quadratically inside "
        "LSH buckets and measuring the synthetic duplication, not the "
        "operator's scaling). For the families that DON'T share that "
        "objection (relational aggregates, graph algorithms over keyed "
        "edges) a key-shifted TEXT-FREE decade exists — see the "
        "'Synthetic text-free decade' section (tools/scaling.py "
        "--synth-decade).\n"
    )
    path = os.path.join(REPO, "SCALING.md")
    synth_block = _read_synth_block(path)
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")
        if synth_block:
            f.write(synth_block)
    print(f"wrote SCALING.md ({len(names)} queries)")


# ---------------------------------------------------------------------------
# Synthetic text-free scale decade (VERDICT r10 ask #6)
# ---------------------------------------------------------------------------

SYNTH_MARK = "## Synthetic text-free decade"

# Relational/graph queries whose inputs are the key-shifted fact tables
# (lineitem/orders) and the graph built over them — NO document text,
# embeddings, or similarity family (their replicated-text objection is
# documented in the 'Why no sf1 column' section: ssj1/d26/d13/m7b would
# measure the synthetic duplication, not the operator).
SYNTH_QUERIES = (
    "q1_pricing_summary",
    "q9_profit_by_nation_year",
    "q18_large_volume_customers",
    "g_pagerank_exact",
    "g_triangle_count",
    "g_connected_components",
    "g_mst",
    "g_betweenness",
    "scc1_navigation_core",
    "t1_traverse_both",
)


def _read_synth_block(path: str) -> str:
    """Return the marker-delimited synth-decade section of SCALING.md
    (so the main regeneration preserves it, and the synth mode replaces
    only its own block)."""
    try:
        with open(path) as f:
            txt = f.read()
    except OSError:
        return ""
    i = txt.find(SYNTH_MARK)
    return txt[i:] if i >= 0 else ""


def _build_synth_decade(spark, base_dir: str, out_dir: str) -> None:
    """Materialize the synthetic ~sf1 fixture: lineitem and orders
    replicated 10x with ORDER KEYS SHIFTED per replica (FK integrity
    kept — every replica references the ORIGINAL dims, the realistic
    shape of a fact table growing against slowly-changing dimensions);
    every other table copied as-is.  No text column is replicated: the
    dedup/similarity family is excluded by design (see SCALING.md)."""
    from pyspark.sql import functions as F

    from torcdb_spark.sources.tables import TABLE_NAMES

    os.makedirs(out_dir, exist_ok=True)
    orders = spark.read.parquet(f"{base_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{base_dir}/lineitem.parquet")
    offset = max(
        orders.agg(F.max("o_orderkey")).first()[0],
        lineitem.agg(F.max("l_orderkey")).first()[0],
    ) + 1
    reps = spark.range(10).select(F.col("id").alias("_rep"))
    (
        orders.crossJoin(F.broadcast(reps))
        .withColumn("o_orderkey",
                    F.col("o_orderkey") + F.col("_rep") * offset)
        .drop("_rep")
        .write.mode("overwrite")
        .parquet(f"{out_dir}/orders.parquet")
    )
    (
        lineitem.crossJoin(F.broadcast(reps))
        .withColumn("l_orderkey",
                    F.col("l_orderkey") + F.col("_rep") * offset)
        .drop("_rep")
        .write.mode("overwrite")
        .parquet(f"{out_dir}/lineitem.parquet")
    )
    for t in TABLE_NAMES:
        if t in ("orders", "lineitem"):
            continue
        spark.read.parquet(f"{base_dir}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/{t}.parquet")


def synth_decade_main() -> None:
    """--synth-decade: extend the scaling series one decade past sf0.1
    for the relational/graph subset only, against a key-shifted
    text-free 10x replication of lineitem/orders (VERDICT r10 ask #6).
    Rewrites ONLY the synth section of SCALING.md."""
    from torcdb_spark.queries import queries
    from torcdb_spark.session import get_spark
    from torcdb_spark.sources.tables import TABLE_NAMES, load_table

    base_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.environ.get(
        "SPARK_GRAFT_SYNTH_DIR", "/tmp/torcdb_synth_sf1"
    )
    spark = get_spark(app_name="torcdb_spark-synth-decade")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(f"{out_dir}/lineitem.parquet"):
        print(f"synth-decade: building {out_dir} from {base_dir}",
              file=sys.stderr)
        _build_synth_decade(spark, base_dir, out_dir)

    qs = queries()
    names = [n for n in SYNTH_QUERIES if n in qs]
    import gc

    fact_rows: dict[str, int] = {}
    result: dict[str, dict[str, float]] = {k: {} for k in names}
    for tag, sf_dir in (("sf0.1", base_dir), ("sf~1", out_dir)):
        fact_rows[tag] = sum(
            spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
            for t in ("lineitem", "orders")
        )
        for t in TABLE_NAMES:  # per-dir warmup (footers, page cache)
            load_table(spark, sf_dir, t).write.format("noop").mode(
                "overwrite"
            ).save()
        for name in names:
            best = None
            try:
                for _ in range(2):
                    t0 = time.perf_counter()
                    qs[name](spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    took = time.perf_counter() - t0
                    best = took if best is None else min(best, took)
            except Exception as exc:
                print(f"synth-decade: {name}@{tag} FAILED: {exc}",
                      file=sys.stderr)
                best = -1.0
            result[name][tag] = round(best, 3)
            spark.catalog.clearCache()
            gc.collect()
            print(f"synth-decade: {name}@{tag} {result[name][tag]}s",
                  file=sys.stderr)

    # burst re-measurement, same taxonomy as the main series: a sf~1
    # cell is suspect when it exceeds 3x its own sf0.1 cell (a 10x data
    # step with slope <=0.5 predicts <=3.2x) — two sweeps, min kept
    for sweep in range(2):
        flagged = [
            n for n in names
            if result[n]["sf~1"] > 0 and result[n]["sf0.1"] > 0
            and result[n]["sf~1"] > 3 * result[n]["sf0.1"]
        ]
        if not flagged:
            break
        for name in flagged:
            try:
                for _ in range(2):
                    t0 = time.perf_counter()
                    qs[name](spark, out_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    result[name]["sf~1"] = round(
                        min(result[name]["sf~1"],
                            time.perf_counter() - t0), 3
                    )
            except Exception as exc:
                print(f"synth-decade: recheck {name} FAILED: {exc}",
                      file=sys.stderr)
            spark.catalog.clearCache()
            gc.collect()
            print(f"synth-decade: recheck[{sweep}] {name} "
                  f"{result[name]['sf~1']}s", file=sys.stderr)

    ratio = fact_rows["sf~1"] / fact_rows["sf0.1"]
    lines = [
        SYNTH_MARK + " (sf0.1 → key-shifted sf~1, VERDICT r10 ask #6)",
        "",
        f"Generated by `tools/scaling.py --synth-decade`: lineitem + "
        f"orders replicated 10× with per-replica order-key shifts "
        f"(fact rows {fact_rows['sf0.1']:,} → {fact_rows['sf~1']:,}, "
        f"{ratio:.1f}×; dims/documents/embeddings unscaled), min-of-2 "
        f"per cell with burst re-measurement.  slope = "
        "log(t_sf1/t_sf0.1)/log(fact-row ratio), comparable to the main "
        "table's definition.  **Scope**: relational aggregates + graph "
        "algorithms only — the text/dedup/similarity family (ssj1, d26, "
        "d13, m7b, e-family) is excluded BY DESIGN because replicated "
        "text gives every row 10 near-identical twins and the "
        "measurement becomes the synthetic duplication, not the "
        "operator (see 'Why no sf1 column' above).",
        "",
        "| query | sf0.1 s | sf~1 s | slope (this decade) |",
        "|---|---|---|---|",
    ]
    for name in names:
        r = result[name]
        if min(r.values()) < 0:
            lines.append(f"| {name} | {r['sf0.1']} | {r['sf~1']} "
                         "| (failed) |")
            continue
        slope = (
            math.log(max(r["sf~1"], 1e-3) / max(r["sf0.1"], 1e-3))
            / math.log(ratio)
        )
        lines.append(
            f"| {name} | {r['sf0.1']} | {r['sf~1']} | {slope:.2f} |"
        )
    lines.append("")
    block = "\n".join(lines) + "\n"

    path = os.path.join(REPO, "SCALING.md")
    try:
        with open(path) as f:
            txt = f.read()
    except OSError:
        txt = ""
    i = txt.find(SYNTH_MARK)
    if i >= 0:  # replace only this block, preserve any later section
        j = txt.find("\n## ", i + 1)
        txt = txt[:i] + block + (txt[j + 1:] if j >= 0 else "")
    else:
        txt = txt.rstrip() + "\n\n" + block
    with open(path, "w") as f:
        f.write(txt)
    print(f"wrote SCALING.md synth-decade section ({len(names)} queries)")


# ---------------------------------------------------------------------------
# Dedup-family synthetic decade (VERDICT r11 ask #6)
# ---------------------------------------------------------------------------

DEDUP_MARK = "## Dedup-family synthetic decade"


def synth_documents(spark, n_docs: int):
    """A `documents` table of n_docs rows whose text is DISTINCT by
    construction — every token is hash-derived from (doc_id, position)
    over a 40k vocabulary, so no document has a replicated twin and no
    5-gram shingle is shared across documents (the property that made
    the key-shifted decade exclude the dedup family: replicated text
    inflates LSH buckets and the measurement becomes the synthetic
    duplication).  Pure JVM expressions — the generator itself scales.
    Twin-freedom is pytest-asserted (tests/test_operators.py
    test_synth_documents_twin_free)."""
    from pyspark.sql import functions as F

    did = F.col("id")
    n_tok = (F.lit(60) + F.pmod(F.xxhash64(did), F.lit(141))).cast("int")
    text = F.array_join(
        F.transform(
            F.sequence(F.lit(0), n_tok - 1),
            lambda i: F.concat(
                F.lit("w"),
                F.pmod(F.xxhash64(did, i), F.lit(40000)).cast("string"),
            ),
        ),
        " ",
    )
    langs = F.array(F.lit("en"), F.lit("de"), F.lit("fr"), F.lit("es"))
    return spark.range(n_docs).select(
        did.alias("doc_id"),
        text.alias("text"),
        F.element_at(
            langs, (F.pmod(F.xxhash64(did + 1), F.lit(4)) + 1).cast("int")
        ).alias("lang"),
        F.concat(
            F.lit("synth_"), F.pmod(did, F.lit(10)).cast("string")
        ).alias("source"),
    ).withColumn("n_chars", F.length("text").cast("long"))


def _dedup_decade_targets():
    """(name, callable) pairs for the dedup-family decade.  ssj1/d26/
    x_minhash are the declared queries verbatim (they scan the full
    documents table).  d3/d13 bound their fixture to doc_id<=30 for
    oracle tractability, so their PRODUCTION operator — the unbounded
    minhash_lsh_dedup pipeline they wrap — is timed directly instead,
    at both the d3 setting (64/16) and the x_minhash setting (32/8)."""
    from torcdb_spark.operators.dedup import minhash_lsh_dedup
    from torcdb_spark.queries import queries
    from torcdb_spark.sources.tables import load_table

    qs = queries()

    def minhash_full(perm, bands):
        def run(spark, sf_dir):
            docs = load_table(spark, sf_dir, "documents")
            return minhash_lsh_dedup(
                docs, num_perm=perm, bands=bands, jaccard_threshold=0.5
            )
        return run

    return [
        ("ssj1_jaccard_join", qs["ssj1_jaccard_join"]),
        ("d26_containment_join", qs["d26_containment_join"]),
        ("x_minhash_near_dups", qs["x_minhash_near_dups"]),
        ("minhash_lsh_64x16 (d3/d13 core, unbounded)",
         minhash_full(64, 16)),
    ]


def dedup_decade_main() -> None:
    """--dedup-decade: extend the scaling series one decade for the
    text/dedup family against hash-derived DISTINCT-text corpora
    (5k → 50k docs, the same 10× ratio as the key-shifted decade) —
    both cells from the same generator so the slope isolates data
    volume, not corpus shape.  Rewrites only its own SCALING.md block."""
    import gc

    from torcdb_spark.session import get_spark

    out_base = os.environ.get(
        "SPARK_GRAFT_SYNTH_DOCS_DIR", "/tmp/torcdb_synth_docs"
    )
    spark = get_spark(app_name="torcdb_spark-dedup-decade")
    spark.sparkContext.setLogLevel("ERROR")
    sizes = {"5k": 5_000, "50k": 50_000}
    dirs = {}
    for tag, n in sizes.items():
        d = os.path.join(out_base, tag)
        dirs[tag] = d
        if not os.path.exists(f"{d}/documents.parquet"):
            print(f"dedup-decade: building {d} ({n} docs)",
                  file=sys.stderr)
            synth_documents(spark, n).repartition(32).write.mode(
                "overwrite"
            ).parquet(f"{d}/documents.parquet")

    targets = _dedup_decade_targets()
    result: dict[str, dict[str, float]] = {n: {} for n, _ in targets}
    for tag in ("5k", "50k"):
        sf_dir = dirs[tag]
        spark.read.parquet(f"{sf_dir}/documents.parquet").write.format(
            "noop"
        ).mode("overwrite").save()  # warm footers/page cache
        for name, fn in targets:
            best = None
            try:
                for _ in range(2):
                    t0 = time.perf_counter()
                    fn(spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    took = time.perf_counter() - t0
                    best = took if best is None else min(best, took)
            except Exception as exc:
                print(f"dedup-decade: {name}@{tag} FAILED: {exc}",
                      file=sys.stderr)
                best = -1.0
            result[name][tag] = round(best, 3)
            spark.catalog.clearCache()
            gc.collect()
            print(f"dedup-decade: {name}@{tag} {result[name][tag]}s",
                  file=sys.stderr)

    # burst re-measurement, same taxonomy as the synth decade
    for sweep in range(2):
        flagged = [
            n for n, _ in targets
            if result[n]["50k"] > 0 and result[n]["5k"] > 0
            and result[n]["50k"] > 3 * result[n]["5k"] * 3.33
        ]
        if not flagged:
            break
        fmap = dict(targets)
        for name in flagged:
            try:
                for _ in range(2):
                    t0 = time.perf_counter()
                    fmap[name](spark, dirs["50k"]).write.format(
                        "noop"
                    ).mode("overwrite").save()
                    result[name]["50k"] = round(
                        min(result[name]["50k"],
                            time.perf_counter() - t0), 3
                    )
            except Exception as exc:
                print(f"dedup-decade: recheck {name} FAILED: {exc}",
                      file=sys.stderr)
            spark.catalog.clearCache()
            gc.collect()
            print(f"dedup-decade: recheck[{sweep}] {name} "
                  f"{result[name]['50k']}s", file=sys.stderr)

    lines = [
        DEDUP_MARK + " (5k → 50k distinct-text docs, VERDICT r11 ask #6)",
        "",
        "Generated by `tools/scaling.py --dedup-decade`: both cells use "
        "hash-derived DISTINCT text (every token = "
        "xxhash64(doc_id, pos) over a 40k vocab — no replicated twins, "
        "no shared 5-gram shingles; twin-freedom pytest-asserted), so "
        "LSH bucket sizes stay realistic and the slope measures the "
        "operator, not synthetic duplication.  10× docs per decade; "
        "slope = log(t_50k/t_5k)/log(10).  d3/d13 bound their fixture "
        "to doc_id<=30 (oracle tractability), so their unbounded "
        "production core (minhash_lsh_dedup) is timed directly.",
        "",
        "| target | 5k docs s | 50k docs s | slope (this decade) |",
        "|---|---|---|---|",
    ]
    for name, _ in targets:
        r = result[name]
        if min(r.values()) < 0:
            lines.append(f"| {name} | {r['5k']} | {r['50k']} | (failed) |")
            continue
        slope = (
            math.log(max(r["50k"], 1e-3) / max(r["5k"], 1e-3))
            / math.log(10.0)
        )
        lines.append(f"| {name} | {r['5k']} | {r['50k']} | {slope:.2f} |")
    lines.append("")
    block = "\n".join(lines) + "\n"

    path = os.path.join(REPO, "SCALING.md")
    try:
        with open(path) as f:
            txt = f.read()
    except OSError:
        txt = ""
    i = txt.find(DEDUP_MARK)
    if i >= 0:
        j = txt.find("\n## ", i + 1)
        txt = txt[:i] + block + (txt[j + 1:] if j >= 0 else "")
    else:
        txt = txt.rstrip() + "\n\n" + block
    with open(path, "w") as f:
        f.write(txt)
    print(f"wrote SCALING.md dedup-decade section ({len(targets)} targets)")


if __name__ == "__main__":
    if "--dedup-decade" in sys.argv:
        dedup_decade_main()
    elif "--synth-decade" in sys.argv:
        synth_decade_main()
    else:
        main()
