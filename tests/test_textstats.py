"""Gopher-rule quality verdict: handcrafted rule-flip cases plus a
differential against an independent pure-python reimplementation of
the published thresholds (Rae et al. 2021, Appendix A)."""

import re

import pytest

from medtype_spark.textstats.quality import GOPHER_REQUIRED_WORDS, gopher_quality

PASSING = (
    "The quick brown fox jumps over the lazy dog and then runs to have "
    "a rest with friends near the old stone bridge that stands beside "
    "the river where many travellers stop to be amazed of the view and "
    "share stories about the long road behind them every single day."
)


def _py_gopher(text: str) -> dict:
    toks = [t for t in re.split(r"\s+", text.strip()) if t != ""]
    nt = len(toks)
    wc = sum(len(t) for t in toks)
    nsym = len(re.findall(r"#|…|\.\.\.", text))
    lines = text.split("\n")
    nl = len(lines)
    nbul = sum(1 for l in lines if re.match(r"^[•‣▪\-\*]", l.lstrip(" ")))
    nell = sum(1 for l in lines if re.search(r"(\.\.\.|…)$", l.rstrip(" ")))
    nalpha = sum(1 for t in toks if re.search(r"[A-Za-z]", t))
    low = [t.lower() for t in toks]
    nreq = sum(1 for w in GOPHER_REQUIRED_WORDS if w in low)
    distinct = list(dict.fromkeys(lines))
    ndup = nl - len(distinct)
    lchars = sum(len(l) for l in lines)
    dchars = lchars - sum(len(l) for l in distinct)
    return {
        "gopher_pass": (
            50 <= nt <= 100_000
            and 3 * nt <= wc <= 10 * nt
            and 10 * nsym <= nt
            and 10 * nbul <= 9 * nl
            and 10 * nell <= 3 * nl
            and 10 * nalpha >= 8 * nt
            and nreq >= 2
            and 10 * ndup <= 3 * nl
            and (lchars == 0 or 5 * dchars <= lchars)
        ),
        "n_req_stopwords": nreq,
    }


CASES = [
    ("pass", PASSING),
    ("too_short", "The cat sat on the mat to be with that dog."),
    ("symbols", PASSING + " " + "# " * 20),
    ("bullets", "\n".join("- item %d" % i for i in range(20)) + "\n" + PASSING),
    ("ellipses", "\n".join("to be continued..." for _ in range(9)) + "\n" + PASSING),
    ("non_alpha", PASSING + " " + "123 456 789 " * 20),
    ("no_stopwords", " ".join("alpha beta gamma delta".split() * 20)),
    ("empty", ""),
    ("long_words", " ".join(["antidisestablishmentarianism"] * 60)),
    ("dup_lines", "\n".join([PASSING] + ["repeat me now"] * 9)),
]


@pytest.mark.parametrize("name,text", CASES, ids=[c[0] for c in CASES])
def test_gopher_matches_python_reference(spark, name, text):
    df = spark.createDataFrame([(0, text)], "doc_id int, text string")
    row = gopher_quality(df).collect()[0]
    exp = _py_gopher(text)
    assert row["gopher_pass"] == int(exp["gopher_pass"]), name
    assert row["n_req_stopwords"] == exp["n_req_stopwords"], name


def test_gopher_rule_flips(spark):
    """Each adversarial case flips the verdict off the passing doc."""
    rows = spark.createDataFrame(
        [(i, t) for i, (_, t) in enumerate(CASES)], "doc_id int, text string"
    )
    got = {r["doc_id"]: r["gopher_pass"] for r in gopher_quality(rows).collect()}
    assert got[0] == 1
    for i in range(1, len(CASES)):
        assert got[i] == 0, CASES[i][0]
