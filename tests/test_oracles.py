"""Spark-vs-DuckDB differential checks for a representative subset of
the driver's queries()/oracle_sql() contract (sf0.001 for speed; the
driver runs the full set at sf0.01)."""

import duckdb
import pytest

import sys

sys.path.insert(0, "/root/repo")

from tools.check_oracles import TABLES, compare  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

SUBSET = [
    "q01_pricing_summary",
    "q05_order_fill_class",
    "q11_sliding_stats",
    "q12_micro_macro",
    "q13_clean_text",
    "q15_minhash",
    "q21_cluster_metrics",
    "q63_brat_scan",
    "q64_conll_scan",
    "q65_ceaf_fixture",
    "q25_cc_chains",
    "q26_salted_pair_counts",
    "q29_multi_id_match",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, duck, name):
    import __spark_entry__ as entry_mod

    fn = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    res = compare(name, fn(spark, SF_DIR), sql, duck, strict=True)
    assert res.startswith("OK"), res
