"""dedup/lines.py — CCNet-style corpus-level duplicate-line removal."""

from __future__ import annotations

import hashlib
import random

from pyspark.sql import Row

from medtype_spark.dedup.lines import dedup_corpus_lines

BOILER = "accept cookies to continue reading this website"  # >= 20 chars


def test_planted_boilerplate_removed_once(spark):
    docs = [
        Row(doc_id=1, text=f"unique first line of doc one xx\n{BOILER}\ntail one zz"),
        Row(doc_id=2, text=f"{BOILER}\nunique middle line of doc two yy"),
        Row(doc_id=3, text=f"unique line of doc three qq\n{BOILER}"),
        Row(doc_id=4, text="short\nok"),  # < 20 chars: always kept
    ]
    out = {r.doc_id: r for r in
           dedup_corpus_lines(spark.createDataFrame(docs), "text", "doc_id").collect()}
    # globally-first occurrence is (doc 1, line 1); others removed
    assert BOILER in out[1].text_dedup
    assert BOILER not in out[2].text_dedup
    assert BOILER not in out[3].text_dedup
    assert out[1].n_dup_lines_removed == 0
    assert out[2].n_dup_lines_removed == 1
    assert out[3].n_dup_lines_removed == 1
    # non-duplicate content survives verbatim, order preserved
    assert out[1].text_dedup.splitlines() == [
        "unique first line of doc one xx", BOILER, "tail one zz"]
    assert out[2].text_dedup == "unique middle line of doc two yy"
    assert out[4].text_dedup == "short\nok"
    assert out[4].n_dup_lines_removed == 0


def _python_reference(docs, min_len=20):
    seen = set()
    result = {}
    for doc_id, text in sorted(docs):
        kept, removed = [], 0
        for ln in text.split("\n"):
            if len(ln) < min_len:
                kept.append(ln)
                continue
            h = hashlib.md5(ln.encode()).hexdigest()
            if h in seen:
                removed += 1
            else:
                seen.add(h)
                kept.append(ln)
        result[doc_id] = ("\n".join(kept), removed)
    return result


def test_differential_vs_python_reference_and_partition_invariance(spark):
    rnd = random.Random(5)
    vocab = [f"word{i:02d}" for i in range(12)]
    docs = []
    for doc_id in range(120):
        lines = [" ".join(rnd.choice(vocab) for _ in range(4))
                 for _ in range(rnd.randrange(1, 6))]
        docs.append((doc_id, "\n".join(lines)))
    want = _python_reference(docs)

    df = spark.createDataFrame([Row(doc_id=d, text=t) for d, t in docs])
    for reparted in (df, df.repartition(17)):
        got = {r.doc_id: (r.text_dedup, r.n_dup_lines_removed)
               for r in dedup_corpus_lines(reparted, "text", "doc_id").collect()}
        assert got == want
