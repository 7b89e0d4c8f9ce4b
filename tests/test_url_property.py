"""Property test: functions/urls.py vs an independent urllib.parse
reference implementation of the same documented contract.

The Spark side is a regexp-expression pipeline; urlsplit is a
different parser (RFC 3986 state machine).  Agreement across random
structured URLs checks the contract, not the regexes."""

from __future__ import annotations

from urllib.parse import urlsplit

from hypothesis import given, settings, strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from medtype_spark.functions.urls import (
    TWO_LEVEL_SUFFIXES,
    canonicalize_url,
    registered_domain,
    url_host,
)

label = st.from_regex(r"[a-z0-9]([a-z0-9-]{0,6}[a-z0-9])?", fullmatch=True)
seg = st.from_regex(r"[A-Za-z0-9._~-]{1,8}", fullmatch=True)


@st.composite
def urls(draw):
    scheme = draw(st.sampled_from(["http", "https", "HTTP", "Https"]))
    userinfo = draw(st.sampled_from(["", "", "", "bob@", "a:pw@"]))
    labels = draw(st.lists(label, min_size=1, max_size=3))
    if draw(st.booleans()):
        labels = labels + [draw(st.sampled_from(
            ["com", "org", "co.uk", "com.au", "io"]))]
    host = ".".join(labels)
    if draw(st.booleans()):
        host = "WWW." + host if draw(st.booleans()) else "www." + host
    port = draw(st.sampled_from(["", "", ":80", ":443", ":8080", ":3000"]))
    path = "".join("/" + draw(seg) for _ in range(draw(st.integers(0, 3))))
    if path and draw(st.booleans()):
        path += "/"
    query = draw(st.sampled_from(["", "", "?", "?a=1", "?b=2&a=1", "?x"]))
    frag = draw(st.sampled_from(["", "", "#f", "#a/b?c"]))
    return f"{scheme}://{userinfo}{host}{port}{path}{query}{frag}"


def py_canon(u: str) -> str:
    """Independent reference: the module contract via urllib.parse."""
    sp = urlsplit(u)
    scheme = sp.scheme.lower()
    host = sp.hostname or ""
    if host.startswith("www."):
        host = host[4:]
    port = sp.port
    default = (scheme == "http" and port == 80) or (
        scheme == "https" and port == 443)
    port_part = "" if port is None or default else f":{port}"
    path = sp.path or "/"
    if len(path) > 1 and path.endswith("/"):
        path = path[:-1]
    q = f"?{sp.query}" if sp.query else ""
    return f"{scheme}://{host}{port_part}{path}{q}"


def py_regdom(host: str) -> str:
    labels = host.split(".")
    if len(labels) <= 2:
        return host
    if ".".join(labels[-2:]) in TWO_LEVEL_SUFFIXES:
        return ".".join(labels[-3:])
    return ".".join(labels[-2:])


@settings(max_examples=30, deadline=None)
@given(st.lists(urls(), min_size=1, max_size=25, unique=True))
def test_canonicalize_matches_urllib_reference(spark, batch):
    df = spark.createDataFrame([Row(u=u) for u in batch])
    got = df.select(
        "u",
        canonicalize_url(F.col("u")).alias("c"),
        registered_domain(url_host(canonicalize_url(F.col("u")))).alias("d"),
    ).collect()
    for r in got:
        want_c = py_canon(r.u)
        assert r.c == want_c, r.u
        want_host = urlsplit(want_c).hostname or ""
        assert r.d == py_regdom(want_host), r.u
