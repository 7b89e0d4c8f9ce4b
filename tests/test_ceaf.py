"""CEAF golden tests: Luo (2005) examples — the same published values
the reference asserts (tests/test_coref_metrics.py:185-207).  Also
covers b_cubed and muc fscores on the same cases."""

import pytest

from medtype_spark.metrics.ceaf import entity_ceaf, mention_ceaf
from medtype_spark.metrics.clustering import b_cubed, muc

LUO05_GOLD = {"A": {1, 2, 3, 4, 5}, "B": {6, 7}, "C": {8, 9, 10, 11, 12}}
LUO05_RESPS = [
    ({"A": {1, 2, 3, 4, 5}, "B": {6, 7, 8, 9, 10, 11, 12}},
     {"muc": 0.947, "b_cubed": 0.865, "mention_ceaf": 0.833, "entity_ceaf": 0.733}),
    ({"A": {1, 2, 3, 4, 5, 8, 9, 10, 11, 12}, "B": {6, 7}},
     {"muc": 0.947, "b_cubed": 0.737, "mention_ceaf": 0.583, "entity_ceaf": 0.667}),
    ({"A": {1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12}},
     {"muc": 0.900, "b_cubed": 0.545, "mention_ceaf": 0.417, "entity_ceaf": 0.294}),
    ({i: {i} for i in range(1, 13)},
     {"muc": 0.0, "b_cubed": 0.400, "mention_ceaf": 0.250, "entity_ceaf": 0.178}),
]

METRICS = {
    "muc": muc,
    "b_cubed": b_cubed,
    "mention_ceaf": mention_ceaf,
    "entity_ceaf": entity_ceaf,
}


def _to_df(spark, clustering):
    rows = [(str(m), str(c)) for c, ms in clustering.items() for m in ms]
    return spark.createDataFrame(rows, ["mention", "cluster"])


@pytest.mark.parametrize("resp_idx", range(len(LUO05_RESPS)))
@pytest.mark.parametrize("metric", sorted(METRICS))
def test_luo05(spark, metric, resp_idx):
    response, expected = LUO05_RESPS[resp_idx]
    gold_df = _to_df(spark, LUO05_GOLD)
    resp_df = _to_df(spark, response)
    row = METRICS[metric](gold_df, resp_df).collect()[0]
    assert round(row["fscore"], 3) == expected[metric], (metric, dict(row.asDict()))
