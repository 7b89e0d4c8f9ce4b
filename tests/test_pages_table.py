"""Iceberg-layout pages table: partition pruning + predicate pushdown +
column pruning actually reach the parquet scan."""

from pyspark.sql import functions as F

from medtype_spark.datagen.pages import synth_pages
from medtype_spark.sources.pages_table import (
    read_pages_table,
    scan_report,
    write_pages_table,
)


def test_roundtrip_and_pushdown(spark, tmp_path):
    pages, _ = synth_pages(spark, 200, n_entities=20, seed=5)
    path = str(tmp_path / "pages_tbl")
    write_pages_table(pages, path)

    tbl = read_pages_table(spark, path)
    assert tbl.count() == 200
    # hidden partition columns materialized
    assert "warc_day" in tbl.columns and "lang" in tbl.columns

    # partition pruning: the lang predicate must appear as a partition
    # filter (or prune paths), not a post-scan filter only
    q = tbl.where(F.col("lang") == "en").select("url", "text")
    rep = scan_report(q)
    assert "lang" in rep["partition_filters"] or "lang#" in rep["plan"]
    n_en = q.count()
    assert 0 < n_en < 200

    # column pruning: a 2-column projection must not read html
    assert "html" not in rep["read_schema"]
    assert "url" in rep["read_schema"] and "text" in rep["read_schema"]

    # predicate pushdown on a data column
    q2 = tbl.where(F.col("url") > "https://example.org/page/000000100").select("url")
    rep2 = scan_report(q2)
    assert "url" in rep2["pushed_filters"]


def test_partition_values_consistent(spark, tmp_path):
    pages, _ = synth_pages(spark, 60, n_entities=10, seed=6)
    path = str(tmp_path / "pages_tbl2")
    write_pages_table(pages, path)
    tbl = read_pages_table(spark, path)
    # warc_day is the Iceberg days() transform of warc_ts
    bad = tbl.where(F.to_date("warc_ts") != F.col("warc_day")).count()
    assert bad == 0
