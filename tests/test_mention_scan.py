"""Trie-compiled alias matcher: differential vs the flat longest-first
alternation it replaced, plus lexicon-scale viability."""

import re
import time

from hypothesis import given, settings
from hypothesis import strategies as st

from medtype_spark.operators.mentions import build_alias_pattern


def _flat_pattern(aliases):
    """The replaced construction: longest-first alternation."""
    return re.compile(
        r"(?<![0-9A-Za-z])("
        + "|".join(re.escape(a) for a in sorted(aliases, key=len, reverse=True))
        + r")(?![0-9A-Za-z])"
    )


def _matches(pat, text):
    return [(m.start(1), m.end(1), m.group(1)) for m in pat.finditer(text)]


def test_known_cases():
    aliases = ["corp a", "corp a tail", "corp", "b-x", "b"]
    pat = build_alias_pattern(aliases)
    # longest match wins at a shared prefix
    assert _matches(pat, "see corp a tail end") == [(4, 15, "corp a tail")]
    assert _matches(pat, "see corp a end") == [(4, 10, "corp a")]
    assert _matches(pat, "see corp end") == [(4, 8, "corp")]
    # boundary: embedded occurrences rejected
    assert _matches(pat, "xcorp corpx") == []
    # backtrack to shorter terminal when the long one fails the boundary
    assert _matches(pat, "b-xy") == [(0, 1, "b")]
    # punctuation boundary is fine
    assert _matches(pat, "(corp)") == [(1, 5, "corp")]


ALIAS = st.text(alphabet="ab c-", min_size=1, max_size=8).filter(
    lambda s: re.search(r"[a-z0-9]", s)
)


@given(
    st.lists(ALIAS, min_size=1, max_size=25, unique=True),
    st.text(alphabet="ab c-xy.", max_size=120),
)
@settings(max_examples=300, deadline=None)
def test_differential_vs_flat_alternation(aliases, text):
    assert _matches(build_alias_pattern(aliases), text) == _matches(
        _flat_pattern(aliases), text
    )


def test_scales_to_large_lexicon():
    """10k-alias trie must compile and scan at a per-position cost
    comparable to the 30-alias flat pattern (the VERDICT viability
    bar: within 2x)."""
    import random

    rng = random.Random(3)
    words = ["".join(rng.choice("abcdefghij") for _ in range(rng.randint(4, 12)))
             for _ in range(12000)]
    big = sorted(set(words))[:10000]
    small = big[:30]
    text = " ".join(rng.choice("klmnopqrst") + w[:3] for w in big[:5000]) + " " + big[7] + " end"

    flat_small = _flat_pattern(small)
    t0 = time.perf_counter()
    for _ in range(3):
        _matches(flat_small, text)
    t_small = time.perf_counter() - t0

    trie_big = build_alias_pattern(big)
    t0 = time.perf_counter()
    for _ in range(3):
        got = _matches(trie_big, text)
    t_big = time.perf_counter() - t0

    assert any(m[2] == big[7] for m in got)
    # 333x the lexicon for at most ~2x the scan time
    assert t_big < 2.0 * t_small + 0.05, (t_small, t_big)


def test_set_matcher_parity_on_token_aligned_text():
    """iter_set_matches must agree with the trie regex span-for-span on
    space-token-aligned text (the contract: aliases start/end on token
    boundaries — the shape clean_text-normalized corpora have)."""
    import random as _random

    from medtype_spark.operators.mentions import iter_set_matches

    aliases = ["corp a", "corp a tail", "corp", "corp  dbl", "b", "zz top"]
    alias_map = {a: None for a in aliases}
    max_n = max(len(a.split(" ")) for a in aliases)
    pat = build_alias_pattern(aliases)

    fillers = ["lorem", "ipsum", "dolor", "xcorp", "corpx", "amet"]
    rng = _random.Random(5)
    texts = [
        "see corp a tail end", "see corp a end", "see corp end",
        "corp  dbl here", "b", "", "zz top zz corp a", "corp corp corp",
    ]
    for _ in range(400):
        n = rng.randint(0, 10)
        words = [rng.choice(fillers + aliases) for _ in range(n)]
        texts.append(" ".join(words))
    for text in texts:
        want = _matches(pat, text)
        got = list(iter_set_matches(text, alias_map, max_n))
        assert got == want, (text, got, want)


def test_set_matcher_parity_through_fused_scan(spark):
    """Full-pipeline parity: fused_mention_scan(matcher='set') produces
    the identical mention table to the trie matcher on a synthetic
    corpus (same rows, offsets, candidates, keys)."""
    from medtype_spark.datagen.pages import build_lexicon, synth_pages
    from medtype_spark.operators.mentions import fused_mention_scan

    pages, _ = synth_pages(spark, 300, n_entities=40, seed=11,
                           mentions_per_page=5)
    lex = build_lexicon(40)
    a2t = {}
    trie_rows = sorted(
        fused_mention_scan(pages, lex, a2t, matcher="trie").collect(),
        key=lambda r: (r["url"], r["start_offset"]),
    )
    set_rows = sorted(
        fused_mention_scan(pages, lex, a2t, matcher="set").collect(),
        key=lambda r: (r["url"], r["start_offset"]),
    )
    assert len(trie_rows) == len(set_rows) > 0
    for a, b in zip(trie_rows, set_rows):
        assert a == b
