"""URL canonicalization and registered-domain extraction — pure JVM
column expressions (no Python UDFs), so the hot path stays inside
whole-stage codegen and pushes down.

Web-scale motivation: the input table for this engine is
Common-Crawl-style pages keyed by ``url`` (BASELINE input_hint).  At
10^12 documents the very first dedup signal is URL identity, and raw
crawl URLs disagree on scheme case, host case, ``www.`` prefixes,
default ports, fragments, and empty queries while naming the same
resource.  Canonicalization is therefore the cheapest dedup operator in
the stack: one narrow projection, no shuffle, and the canonical string
then feeds the exact-dedup hash groupBy (dedup/exact.py).

Reference parity: the reference keys its document cache on the raw
``file_path``/id string (medtype-as-service server pipeline); this
module is the web-native generalisation of that identity key.

Canonical form implemented (documented, deterministic):

- scheme lowercased;
- userinfo (``user:pass@``) dropped;
- host lowercased, one leading ``www.`` label dropped;
- default ports stripped (``:80`` for http, ``:443`` for https),
  non-default ports kept;
- empty path becomes ``/``; a single trailing slash is stripped from
  non-root paths (``/a/b/`` == ``/a/b``);
- query kept verbatim (parameter ORDER IS SIGNIFICANT — sorting
  parameters changes semantics for some sites, so we do not), but a
  bare ``?`` with no parameters is dropped;
- fragment dropped entirely (never sent to the server).

All regexes below are shared-dialect (work identically in Java regex
and DuckDB's RE2) so the DuckDB oracle can replay the same logic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Two-level public suffixes for the registered-domain heuristic.  A
# production system broadcasts the full Mozilla PSL; this bounded set
# covers the dominant ccTLD second-level registries and keeps the
# expression JVM-only.  The list is part of the operator's contract
# (documented + oracle-replayed), not a guess at runtime.
TWO_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp",
    "com.br", "net.br", "org.br",
    "com.cn", "net.cn", "org.cn",
    "co.in", "net.in", "org.in",
    "co.kr", "or.kr",
    "com.mx", "org.mx",
    "co.za", "org.za",
    "com.tr", "com.ar", "com.sg", "com.hk", "com.tw",
)


def _part(url: Column, group: int) -> Column:
    # ^scheme://authority path ?query #fragment
    #   1        2         3     4      (fragment never extracted)
    return F.regexp_extract(
        url, r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?", group
    )


def canonicalize_url(url: Column) -> Column:
    """Canonical URL string per the module contract. JVM-only."""
    scheme = F.lower(_part(url, 1))
    authority = _part(url, 2)
    path = _part(url, 3)
    query = _part(url, 4)

    hostport = F.lower(F.regexp_replace(authority, r"^[^@]*@", ""))
    host = F.regexp_replace(
        F.regexp_extract(hostport, r"^([^:]*)", 1), r"^www\.", ""
    )
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    default_port = (
        ((scheme == F.lit("http")) & (port == F.lit("80")))
        | ((scheme == F.lit("https")) & (port == F.lit("443")))
    )
    port_part = F.when(
        (port == F.lit("")) | default_port, F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))

    path_norm = F.when(path == F.lit(""), F.lit("/")).otherwise(
        F.when(
            (F.length(path) > 1) & path.endswith("/"),
            path.substr(F.lit(1), F.length(path) - 1),
        ).otherwise(path)
    )

    query_part = F.when(query == F.lit("?"), F.lit("")).otherwise(query)

    return F.concat(scheme, F.lit("://"), host, port_part, path_norm, query_part)


def url_host(url: Column) -> Column:
    """Lowercased host of a canonical-or-raw URL (www. stripped)."""
    authority = _part(url, 2)
    hostport = F.lower(F.regexp_replace(authority, r"^[^@]*@", ""))
    return F.regexp_replace(
        F.regexp_extract(hostport, r"^([^:]*)", 1), r"^www\.", ""
    )


def registered_domain(host: Column) -> Column:
    """Registrable domain of a host: last 3 labels when the last 2 form
    a known two-level public suffix, else last 2 labels.  Hosts with
    fewer labels than needed pass through unchanged."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    # F.get is 0-based and NULL-safe out of bounds (element_at throws
    # under Spark 4's default ANSI mode)
    last2 = F.concat_ws(".", F.get(labels, n - 2), F.get(labels, n - 1))
    last3 = F.concat_ws(
        ".", F.get(labels, n - 3), F.get(labels, n - 2), F.get(labels, n - 1)
    )
    is_two_level = last2.isin(*TWO_LEVEL_SUFFIXES)
    return (
        F.when(n <= 2, host)
        .when(is_two_level & (n >= 3), last3)
        .otherwise(last2)
    )
