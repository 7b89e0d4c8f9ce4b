"""Golden-value tests for clustering metrics.

Expected values are the published examples the reference also tests
against: Vilain et al. (1995) Table 1 for MUC
(medtype-trainer/neleval/neleval/tests/test_coref_metrics.py:212-245)
and a pure-Python pairwise_slow oracle
(coref_metrics.py:605-611) on randomized clusterings.
"""

import itertools
import random

import pytest

from medtype_spark.metrics.clustering import b_cubed, muc, pairwise


def _to_df(spark, clustering):
    rows = [(m, str(c)) for c, ms in clustering.items() for m in ms]
    return spark.createDataFrame(rows, ["mention", "cluster"])


def _tri(n):
    return n * (n - 1) // 2


def _pairwise_slow(true, pred):
    p_den = sum(_tri(len(c)) for c in pred.values())
    r_den = sum(_tri(len(c)) for c in true.values())
    num = sum(
        _tri(len(t & p)) for t in true.values() for p in pred.values()
    )
    return num, p_den, num, r_den


def _prf(p_num, p_den, r_num, r_den):
    p = p_num / p_den if p_den else 0.0
    r = r_num / r_den if r_den else 0.0
    f = 2 * p * r / (p + r) if p + r else 0.0
    return p, r, f


VILAIN95 = [
    ({1: {"A", "B", "C", "D"}}, {1: {"A", "B"}, 2: {"C", "D"}}, (1.0, 0.667, 0.8)),
    ({1: {"A", "B"}, 2: {"C", "D"}}, {1: {"A", "B", "C", "D"}}, (0.667, 1.0, 0.8)),
    ({1: {"A", "B", "C", "D"}}, {1: {"A", "B", "C", "D"}}, (1.0, 1.0, 1.0)),
    ({1: {"A", "B", "C"}}, {1: {"A", "C"}}, (1.0, 0.5, 0.667)),
    (
        {1: {"B", "C", "D", "E", "G", "H", "J"}},
        {1: {"A", "B", "C"}, 2: {"D", "E", "F"}, 3: {"G", "H", "I"}},
        (0.5, 0.5, 0.5),
    ),
    (
        {1: {"A", "B", "C"}, 2: {"D", "E", "F", "G"}},
        {1: {"A", "B"}, 2: {"C", "D"}, 3: {"F", "G", "H"}},
        (0.5, 0.4, 0.444),
    ),
]


@pytest.mark.parametrize("true,pred,expected", VILAIN95)
def test_muc_vilain95(spark, true, pred, expected):
    row = muc(_to_df(spark, true), _to_df(spark, pred)).collect()[0]
    got = tuple(round(row[k], 3) for k in ("precision", "recall", "fscore"))
    assert got == expected


def _random_clustering(rng, mentions, max_clusters):
    out = {}
    for m in mentions:
        out.setdefault(rng.randrange(max_clusters), set()).add(m)
    return out


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_pairwise_vs_slow_oracle(spark, seed):
    rng = random.Random(seed)
    mentions = [f"m{i}" for i in range(60)]
    true = _random_clustering(rng, mentions, 8)
    # pred drops a few mentions and reshuffles others
    pred = _random_clustering(rng, [m for m in mentions if rng.random() > 0.1], 10)

    row = pairwise(_to_df(spark, true), _to_df(spark, pred)).collect()[0]
    num, p_den, _, r_den = _pairwise_slow(true, pred)
    assert row["p_num"] == num
    assert row["p_den"] == p_den
    assert row["r_den"] == r_den
    want = _prf(num, p_den, num, r_den)
    got = (row["precision"], row["recall"], row["fscore"])
    assert all(abs(a - b) < 1e-9 for a, b in zip(got, want))


def _b_cubed_slow(true, pred):
    def mapping(cl):
        return {m: k for k, ms in cl.items() for m in ms}

    def side(A, B):
        A_map, B_map = mapping(A), mapping(B)
        res = 0.0
        for m, k in A_map.items():
            a = A[k]
            b = B.get(B_map.get(m), set())
            res += len(a & b) / len(a)
        return res, len(A_map)

    p_num, p_den = side(pred, true)
    r_num, r_den = side(true, pred)
    return p_num, p_den, r_num, r_den


@pytest.mark.parametrize("seed", [5, 6])
def test_b_cubed_vs_slow_oracle(spark, seed):
    rng = random.Random(seed)
    mentions = [f"m{i}" for i in range(50)]
    true = _random_clustering(rng, mentions, 6)
    pred = _random_clustering(rng, [m for m in mentions if rng.random() > 0.15], 7)
    row = b_cubed(_to_df(spark, true), _to_df(spark, pred)).collect()[0]
    want = _b_cubed_slow(true, pred)
    got = (row["p_num"], row["p_den"], row["r_num"], row["r_den"])
    assert all(abs(a - b) < 1e-9 for a, b in zip(got, want))


def test_pairwise_identical_is_perfect(spark):
    cl = {1: {"a", "b", "c"}, 2: {"d", "e"}}
    row = pairwise(_to_df(spark, cl), _to_df(spark, cl)).collect()[0]
    assert row["fscore"] == 1.0


def test_pairwise_negative_reference_doctest(spark):
    """Exact values from the coref_metrics.py:579-582 doctest."""
    from medtype_spark.metrics.clustering import pairwise_negative

    true = {1: {"a", "b", "c"}, 2: {"d"}}
    pred = {1: {"b", "c"}, 2: {"d", "e"}}
    row = pairwise_negative(_to_df(spark, true), _to_df(spark, pred)).collect()[0]
    assert (row["p_num"], row["p_den"], row["r_num"], row["r_den"]) == (2, 4, 2, 3)


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_bundle_matches_individual_metrics(spark, seed):
    """cluster_metrics_bundle (r6, one shared contingency) must equal
    the four individual metric functions on mention-unique inputs —
    including sides with unaligned mentions on both ends."""
    from medtype_spark.metrics.clustering import (
        cluster_metrics_bundle,
        pairwise_negative,
    )

    rng = random.Random(seed)
    mentions = [f"m{i}" for i in range(70)]
    true = _random_clustering(rng, [m for m in mentions if rng.random() > 0.1], 9)
    pred = _random_clustering(rng, [m for m in mentions if rng.random() > 0.1], 6)
    t_df, p_df = _to_df(spark, true), _to_df(spark, pred)

    got = {
        r["metric"]: r
        for r in cluster_metrics_bundle(t_df, p_df).collect()
    }
    want = {
        "pairwise": pairwise(t_df, p_df).collect()[0],
        "bcubed": b_cubed(t_df, p_df).collect()[0],
        "muc": muc(t_df, p_df).collect()[0],
        "blanc_neg": pairwise_negative(t_df, p_df).collect()[0],
    }
    assert set(got) == set(want)
    cols = ("p_num", "p_den", "r_num", "r_den", "precision", "recall", "fscore")
    for name, w in want.items():
        g = got[name]
        for c in cols:
            assert abs(g[c] - w[c]) < 1e-9, (name, c, g[c], w[c])


def test_bundle_empty_pred(spark):
    """Zero-denominator path: empty pred side yields 0.0 P/R/F."""
    from medtype_spark.metrics.clustering import cluster_metrics_bundle

    true = {1: {"a", "b"}}
    t_df = _to_df(spark, true)
    p_df = t_df.where("mention = 'nope'")
    rows = {r["metric"]: r for r in cluster_metrics_bundle(t_df, p_df).collect()}
    assert len(rows) == 4
    assert rows["pairwise"]["precision"] == 0.0
    assert rows["pairwise"]["recall"] == 0.0
    assert rows["muc"]["fscore"] == 0.0
