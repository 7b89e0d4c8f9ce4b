"""Measure-spec registry golden tests.

Fixtures are the reference's own sample annotation files
(medtype-trainer/neleval/sample/{gold,pred}.txt — data only).  The
golden numbers are hand-derived from the reference semantics
(annotation.py count_matches / count_overlap / intersect):

sample data: 10 gold and 10 system annotations; the only differences
are the DOC1 (43,75)→(43,76) and DOC2 (143,175)→(143,176) span ends,
and the gold kbid being multi-valued ('C0032581|C0032581') where the
system predicts the single 'C0032581'.

- strong_all_match (sets::span+kbid): the two end-shifted spans fail
  exact match → tp=8, |gold|=|sys|=10 → P=R=F=0.8.
- sets::kbid: keys deduplicate to 4 kbids per side; the multi-valued
  gold id OR-matches → P=R=F=1.0.
- overlap-maxmax::span+kbid: the two shifted sys spans cover their
  gold spans at 33/34 each (inclusive char grain) → ptp = 8 + 2·33/34
  = 169/17, p_den = 10 → P = 169/170; every gold span is fully covered
  by its best sys span → R = 1; F = 338/339.
"""

import os

import pytest
from pyspark.sql import functions as F

from medtype_spark.evaluation.annotations import read_annotation_tsv
from medtype_spark.evaluation.measures import (
    MEASURES,
    MeasureSpec,
    evaluate_measure,
    get_measure,
)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def test_spec_parsing():
    spec = get_measure("overlap-maxmax::span+kbid")
    assert spec == MeasureSpec(("span", "kbid"), None, "overlap-maxmax")
    assert get_measure("sets::kbid") == MeasureSpec(("kbid",), None, "sets")
    assert get_measure("strong_all_match") == MeasureSpec(("span", "kbid"))
    assert get_measure("strong_link_match").filter == "is_linked"
    assert str(get_measure("muc")) == "muc:None:span"
    with pytest.raises(KeyError):
        get_measure("no_such_measure")


@pytest.fixture(scope="module")
def sample(spark):
    gold = read_annotation_tsv(spark, os.path.join(FIXTURES, "neleval_sample_gold.txt"))
    pred = read_annotation_tsv(spark, os.path.join(FIXTURES, "neleval_sample_pred.txt"))
    return gold.cache(), pred.cache()


def _row(df):
    return df.collect()[0]


def test_strong_all_match_golden(spark, sample):
    gold, pred = sample
    r = _row(evaluate_measure(gold, pred, "strong_all_match"))
    assert (r["p_num"], r["p_den"], r["r_num"], r["r_den"]) == (8.0, 10.0, 8.0, 10.0)
    assert r["precision"] == r["recall"] == 0.8
    assert r["fscore"] == pytest.approx(0.8)


def test_sets_kbid_golden(spark, sample):
    gold, pred = sample
    r = _row(evaluate_measure(gold, pred, "sets::kbid"))
    assert (r["p_num"], r["p_den"], r["r_num"], r["r_den"]) == (4.0, 4.0, 4.0, 4.0)
    assert r["precision"] == r["recall"] == r["fscore"] == 1.0


def test_overlap_maxmax_golden(spark, sample):
    gold, pred = sample
    r = _row(evaluate_measure(gold, pred, "overlap-maxmax::span+kbid"))
    assert r["p_den"] == 10.0 and r["r_den"] == 10.0
    assert r["p_num"] == pytest.approx(8 + 2 * 33 / 34)
    assert r["r_num"] == pytest.approx(10.0)
    assert r["precision"] == pytest.approx(169 / 170)
    assert r["recall"] == pytest.approx(1.0)
    assert r["fscore"] == pytest.approx(338 / 339)


def test_strong_nil_and_linked_filters(spark):
    """is_nil / is_linked filters partition the annotations."""
    ann = "docid:string, start:long, end:long, candidates:array<struct<eid:string,score:double,type:string>>"
    gold = spark.createDataFrame(
        [("d", 0, 1, [("E1", 1.0, "O")]),
         ("d", 2, 3, [("NIL1", 1.0, "O")]),
         ("d", 4, 5, [])],
        ann,
    )
    sys = spark.createDataFrame(
        [("d", 0, 1, [("E1", 1.0, "O")]),
         ("d", 2, 3, [("NIL7", 1.0, "O")]),
         ("d", 4, 5, [])],
        ann,
    )
    linked = _row(evaluate_measure(gold, sys, "strong_link_match"))
    assert (linked["p_num"], linked["p_den"]) == (1.0, 1.0)
    # empty candidate list is nil (annotation.py:179-181); spans match
    nil = _row(evaluate_measure(gold, sys, "strong_nil_match"))
    assert (nil["p_num"], nil["p_den"], nil["r_den"]) == (2.0, 2.0, 2.0)


def test_clustering_measure_via_registry(spark, sample):
    gold, pred = sample
    for name in ("pairwise", "muc", "b_cubed", "mention_ceaf"):
        r = _row(evaluate_measure(gold, pred, name))
        assert 0.0 <= r["fscore"] <= 1.0, name
    # identical inputs → perfect clustering scores
    for name in ("pairwise", "mention_ceaf"):
        r = _row(evaluate_measure(gold, gold, name))
        assert r["fscore"] == pytest.approx(1.0), name


def test_registry_covers_reference_table():
    # configs.py:12-41 has 19 active entries
    assert len(MEASURES) == 19
    assert all(isinstance(v, MeasureSpec) for v in MEASURES.values())
