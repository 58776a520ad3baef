"""The examples/ tour must keep running end-to-end (it is the switchover
document for reference users; a rotted example is worse than none)."""

import importlib.util
import os


def test_tour_runs(spark, capsys):
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "examples", "tour.py",
    )
    spec = importlib.util.spec_from_file_location("tour", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main("/root/testdata/sf0.001")
    out = capsys.readouterr().out
    for marker in ("vertices:", "2-hop paths:", "match() bindings:",
                   "geo components:", "ANN top-3:", "zorder files:"):
        assert marker in out, f"missing section {marker!r}:\n{out}"


def test_corpus_pipeline_runs(spark, capsys):
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "examples", "corpus_pipeline.py",
    )
    spec = importlib.util.spec_from_file_location("corpus_pipeline", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main("/root/testdata/sf0.001")
    out = capsys.readouterr().out
    for marker in ("quality gate:", "exact dedup:", "near dedup:",
                   "pii scrub:", "bpe:", "packing:", "holdout sample:"):
        assert marker in out, f"missing stage {marker!r}:\n{out}"


def test_multimodal_curation_runs(spark, capsys):
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "examples", "multimodal_curation.py",
    )
    spec = importlib.util.spec_from_file_location("multimodal_curation", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main("/root/testdata/sf0.001")
    out = capsys.readouterr().out
    for marker in ("images decoded:",
                   "mixed-format re-encode/decode exact: 256/256",
                   "images in near-dup pairs:",
                   "audio clips with rms:", "video frames sampled:",
                   "embeddings kept after semantic dedup:",
                   "documents flagged contaminated:", "curated corpus size:"):
        assert marker in out, f"missing section {marker!r}:\n{out}"


def test_ldbc_validation_runs(spark, capsys):
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "examples", "ldbc_validation.py",
    )
    spec = importlib.util.spec_from_file_location("ldbc_validation", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main("/root/testdata/sf0.001")
    out = capsys.readouterr().out
    assert "complex reads: 14 IC analogues" in out
    assert "short reads: 7 IS analogues" in out
    assert "updates: wr1_upsert_census" in out


def test_webdataset_pipeline_runs(spark, capsys):
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "examples", "webdataset_pipeline.py",
    )
    spec = importlib.util.spec_from_file_location("webdataset_pipeline", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main("/root/testdata/sf0.001")
    out = capsys.readouterr().out
    for marker in ("shards packed:", "samples reassembled:",
                   "samples passing gopher gate:",
                   "samples after containment dedup:",
                   "thumbnails resized:",
                   "embedding vectors round-tripped:",
                   "epoch permutation spans",
                   "webdataset pipeline complete"):
        assert marker in out, f"missing section {marker!r}:\n{out}"
