"""Stage-manifest checkpoint/resume: skip-completed, invalidation, and
the kill-and-restart scenario (north rule)."""

import json
import os

from pyspark.sql import functions as F

from medtype_spark.plans.checkpoints import StageCheckpointer


def test_stage_computed_once_then_resumed(spark, tmp_path):
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(10).select(F.col("id"), (F.col("id") * 2).alias("x"))

    ck = StageCheckpointer(spark, str(tmp_path))
    a = ck.stage("010_a", build)
    assert a.count() == 10 and calls["n"] == 1

    # second checkpointer = restarted driver: stage must be skipped
    ck2 = StageCheckpointer(spark, str(tmp_path))
    a2 = ck2.stage("010_a", build)
    assert a2.count() == 10 and calls["n"] == 1
    assert ck2.completed_stages() == ["010_a"]


def test_downstream_invalidation(spark, tmp_path):
    ck = StageCheckpointer(spark, str(tmp_path))
    ck.stage("010_a", lambda: spark.range(5))
    calls = {"b": 0}

    def build_b():
        calls["b"] += 1
        return spark.range(3)

    ck.stage("020_b", build_b, upstream=["010_a"])
    assert calls["b"] == 1
    # same upstream: resumed
    ck.stage("020_b", build_b, upstream=["010_a"])
    assert calls["b"] == 1

    # upstream changes (different fingerprint) → downstream recomputes
    mpath = os.path.join(str(tmp_path), "010_a", "_MANIFEST.json")
    m = json.load(open(mpath))
    m["fingerprint"] = "deadbeef"
    json.dump(m, open(mpath, "w"))
    ck3 = StageCheckpointer(spark, str(tmp_path))
    ck3.stage("020_b", build_b, upstream=["010_a"])
    assert calls["b"] == 2


def test_params_change_invalidates(spark, tmp_path):
    """Re-running with different build params must NOT resume stale
    parquet (the fingerprint folds in a caller-supplied params dict)."""
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(4)

    ck = StageCheckpointer(spark, str(tmp_path))
    ck.stage("010_a", build, params={"score_threshold": 0.92})
    assert calls["n"] == 1
    ck.stage("010_a", build, params={"score_threshold": 0.92})
    assert calls["n"] == 1  # same params → resumed
    ck.stage("010_a", build, params={"score_threshold": 0.5})
    assert calls["n"] == 2  # changed params → recomputed


def test_content_change_invalidates_downstream(spark, tmp_path):
    """Same row count + schema but different DATA upstream must change
    the fingerprint (content digest), invalidating downstream."""
    ck = StageCheckpointer(spark, str(tmp_path))
    ck.stage("010_a", lambda: spark.range(5).select((F.col("id") * 1).alias("v")))
    fp1 = ck.fingerprint("010_a")

    import shutil

    shutil.rmtree(str(tmp_path / "010_a"))
    ck2 = StageCheckpointer(spark, str(tmp_path))
    ck2.stage("010_a", lambda: spark.range(5).select((F.col("id") * 7).alias("v")))
    fp2 = ck2.fingerprint("010_a")
    assert fp1 != fp2


def test_kill_and_restart_midway(spark, tmp_path):
    """Simulate a crash between stages: stage A committed, B not."""
    ck = StageCheckpointer(spark, str(tmp_path))
    ck.stage("010_a", lambda: spark.range(7))
    # "crash" — new checkpointer; B never ran
    ck2 = StageCheckpointer(spark, str(tmp_path))
    ran = {"a": 0, "b": 0}

    def build_a():
        ran["a"] += 1
        return spark.range(7)

    def build_b():
        ran["b"] += 1
        return spark.range(2)

    a = ck2.stage("010_a", build_a)
    b = ck2.stage("020_b", build_b, upstream=["010_a"])
    assert ran == {"a": 0, "b": 1}  # A resumed from manifest, B ran
    assert b.count() == 2
    # manifest carries per-partition metrics
    m = json.load(open(os.path.join(str(tmp_path), "020_b", "_MANIFEST.json")))
    assert m["rows"] == 2 and len(m["partitions"]) >= 1


def test_checkpointed_flagship_resume(spark, tmp_path):
    from medtype_spark.datagen.pages import (
        build_lexicon,
        entity_types_df,
        synth_pages,
    )
    from medtype_spark.pipeline import evaluate_linkage
    from medtype_spark.plans.checkpoints import run_linkage_checkpointed

    pages, gold = synth_pages(spark, 80, n_entities=20, seed=11)
    lex = build_lexicon(20)
    et = entity_types_df(spark, 20)
    wd = str(tmp_path / "wd")

    clusters = run_linkage_checkpointed(spark, pages, lex, et, wd)
    row = evaluate_linkage(clusters, gold).collect()[0]
    assert row["fscore"] >= 0.99

    ck = StageCheckpointer(spark, wd)
    assert ck.completed_stages() == ["010_mentions", "020_edges", "030_clusters"]

    # restart: everything resumes, same result
    clusters2 = run_linkage_checkpointed(spark, pages, lex, et, wd)
    c1 = {(r["mention_key"], r["entity_cluster"]) for r in clusters.collect()}
    c2 = {(r["mention_key"], r["entity_cluster"]) for r in clusters2.collect()}
    assert c1 == c2
