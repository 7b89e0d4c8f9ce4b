"""End-to-end flagship pipeline: the acceptance metric on planted data.

Gold clusters are the planted entity ids; the pipeline must recover
them at pairwise F1 ≥ 0.99 (BASELINE.json metric), including with a
planted hot surface form forcing the salted pair path, and results
must be invariant to input partitioning (the sandbox stand-in for
cluster-size invariance).
"""

import pytest
from pyspark.sql import functions as F

from medtype_spark.datagen.pages import (
    build_lexicon,
    entity_types_df,
    synth_pages,
)
from medtype_spark.pipeline import evaluate_linkage, run_linkage

N_PAGES = 300
N_ENTITIES = 40


@pytest.fixture(scope="module")
def corpus(spark):
    pages, gold = synth_pages(spark, N_PAGES, n_entities=N_ENTITIES, seed=42)
    lex = build_lexicon(N_ENTITIES)
    etypes = entity_types_df(spark, N_ENTITIES)
    return pages.cache(), gold.cache(), lex, etypes


def test_extraction_byte_identical(spark, corpus):
    pages, _, _, _ = corpus
    from medtype_spark.pipeline import extract_pages

    mismatches = (
        extract_pages(pages)
        .where(F.col("extracted_text") != F.col("text"))
        .count()
    )
    assert mismatches == 0


def test_extraction_multiline_both_paths(spark):
    """A <p>…</p> spanning newlines must extract identically on the
    modular (extract_text_udf) and fused (fused_mention_scan) paths —
    guards the shared EXTRACT_RE (re.S) against flag drift."""
    from medtype_spark.operators.mentions import fused_mention_scan
    from medtype_spark.pipeline import extract_pages

    text = "line one corp0 avalanche0 here\nline two follows"
    html = f"<html><body><p>{text}</p></body></html>".encode()
    pages = spark.createDataFrame(
        [("u1", None, html, text, "en")],
        "url:string, warc_ts:timestamp, html:binary, text:string, lang:string",
    )
    got = extract_pages(pages).select("extracted_text").collect()[0][0]
    assert got == text  # modular path sees across the newline

    lex = build_lexicon(5)
    fused = fused_mention_scan(pages, lex, {})
    surfaces = {r["mention"] for r in fused.collect()}
    assert "corp0 avalanche0" in surfaces  # fused path scanned same text


def test_gold_mentions_recovered(spark, corpus):
    pages, gold, lex, _ = corpus
    from medtype_spark.operators.mentions import detect_mentions
    from medtype_spark.pipeline import extract_pages

    mentions = detect_mentions(extract_pages(pages), lex, text_col="extracted_text")
    # every planted span must be detected exactly
    g = gold.select("url", "start_offset", "end_offset", "mention")
    m = mentions.select("url", "start_offset", "end_offset", "mention")
    missing = g.exceptAll(m).count()
    assert missing == 0


def test_flagship_f1(spark, corpus):
    pages, gold, lex, etypes = corpus
    result = run_linkage(pages, lex, etypes, hot_threshold=50, target_cell=25)
    row = evaluate_linkage(result["clusters"], gold).collect()[0]
    assert row["fscore"] >= 0.99, dict(row.asDict())


def test_alias_embedding_blend_links_dissimilar_strings(spark):
    """Two aliases of one entity whose surface strings are too far for
    JW alone must still link when their alias embeddings agree (the
    north star's JW + alias-embedding blended pair score)."""
    from medtype_spark.operators.pairs import jaro_winkler

    import pandas as pd

    a1, a2 = "corp9 alphaname", "corp9 zzguvwxyq"
    jw = jaro_winkler(
        "corp9 alphaname", "corp9 zzguvwxyq"
    )
    assert jw < 0.85  # JW alone is below the threshold we'll use

    text = f"intro {a1} middle {a2} end"
    html = f"<html><body><p>{text}</p></body></html>".encode()
    pages = spark.createDataFrame(
        [("u1", None, html, text, "en")],
        "url:string, warc_ts:timestamp, html:binary, text:string, lang:string",
    )
    lex = pd.DataFrame(
        [(a1, "E1", 1.0, "Anatomy"), (a2, "E1", 0.9, "Anatomy")],
        columns=["alias", "eid", "score", "type"],
    )
    etypes = spark.createDataFrame([("E1", ["Anatomy"])], "eid:string, types:array<string>")
    vec = [1.0, 0.0, 0.5]
    emb = spark.createDataFrame(
        [("corp9 alphaname", vec), ("corp9 zzguvwxyq", vec)],
        "norm_form:string, embedding:array<double>",
    )

    def clusters_of(**kw):
        r = run_linkage(pages, lex, etypes, score_threshold=0.85, **kw)
        return {row["mention_key"]: row["entity_cluster"] for row in r["clusters"].collect()}

    jw_only = clusters_of()
    assert len(set(jw_only.values())) == 2  # JW alone keeps them apart

    blended = clusters_of(alias_embeddings=emb, jw_weight=0.3)
    assert len(set(blended.values())) == 1  # embedding agreement links


def test_partitioning_invariance(spark, corpus):
    """Same clusters regardless of parallelism — the determinism
    prerequisite for the two-cluster-size scaling acceptance."""
    pages, gold, lex, etypes = corpus
    r1 = run_linkage(pages.repartition(2), lex, etypes)
    r2 = run_linkage(pages.repartition(16), lex, etypes)
    c1 = {(r["mention_key"], r["entity_cluster"]) for r in r1["clusters"].collect()}
    c2 = {(r["mention_key"], r["entity_cluster"]) for r in r2["clusters"].collect()}
    assert c1 == c2


def test_flagship_f1_batched_scorer(spark, corpus):
    """The flagship with the REAL learned transformer-seam scorer
    (type_scorer='batched': P4 window assembly → W5 length-sorted
    batches → S12 checkpoint load → P8/P9 threshold/decode) must hit
    the same F1 ≥ 0.99 acceptance bar as the dict scorer — the learned
    type predictions feed the pair-level type-agreement prune."""
    pages, gold, lex, etypes = corpus
    result = run_linkage(
        pages, lex, etypes, hot_threshold=50, target_cell=25,
        type_scorer="batched",
    )
    row = evaluate_linkage(result["clusters"], gold).collect()[0]
    assert row["fscore"] >= 0.99, dict(row.asDict())

    # and the learned model actually predicts the planted types: every
    # mention's prediction set contains its gold entity's type
    mentions = result["mentions"].select("mention", "pred_type")
    lex_types = {row_["alias"]: row_["type"] for _, row_ in lex.iterrows()}
    bad = [
        (r["mention"], r["pred_type"])
        for r in mentions.collect()
        if lex_types.get(r["mention"]) not in (r["pred_type"] or [])
    ]
    assert len(bad) <= 0.02 * mentions.count(), bad[:5]
