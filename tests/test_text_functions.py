"""Differential tests: vectorized text ops vs literal reference semantics."""

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from medtype_spark.functions.text import (
    clean_text_pandas,
    clean_text_py,
    collapse_char_pandas,
    collapse_char_py,
)


def test_clean_text_known_cases():
    cases = [
        "hello world",
        "a|b'c\nd",
        "café ångström",  # non-ascii → '?'
        "",
        "|||",
        "naïve\n'quoted'|pipe",
    ]
    got = clean_text_pandas(pd.Series(cases)).tolist()
    want = [clean_text_py(c) for c in cases]
    assert got == want


def test_clean_text_length_preserving():
    s = "café ångström\nx|y'z"
    assert len(clean_text_py(s)) == len(s)
    assert clean_text_pandas(pd.Series([s]))[0] == clean_text_py(s)


@given(st.lists(st.text(max_size=40), min_size=1, max_size=20))
@settings(max_examples=200, deadline=None)
def test_clean_text_differential(texts):
    got = clean_text_pandas(pd.Series(texts)).tolist()
    want = [clean_text_py(t) for t in texts]
    assert got == want


@given(
    st.lists(st.text(alphabet='ab "x\n', max_size=30), min_size=1, max_size=20),
    st.sampled_from(['"', "a", "x", " "]),
)
@settings(max_examples=200, deadline=None)
def test_collapse_char_differential(texts, ch):
    got = collapse_char_pandas(pd.Series(texts), ch).tolist()
    want = [collapse_char_py(t, ch) for t in texts]
    assert got == want


def test_collapse_char_edges():
    for s, ch, want in [
        ("", '"', ""),
        ('"', '"', ""),
        ('""', '"', ""),
        ('a"', '"', "a"),
        ('a""', '"', 'a"'),
        ('"a', '"', "a"),
        ('a"b', '"', 'a"b'),
        ('a""b', '"', 'a"b'),
        ('a"""b', '"', 'a"b'),
    ]:
        assert collapse_char_py(s, ch) == want, (s, ch)
        assert collapse_char_pandas(pd.Series([s]), ch)[0] == want, (s, ch)
