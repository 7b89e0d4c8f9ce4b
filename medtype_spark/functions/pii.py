"""PII scrubbing: typed redaction of emails, phone numbers, and IPv4
addresses — pure JVM regexp columns (no Python, no shuffle).

Web-scale motivation: a Common-Crawl-derived training corpus must
redact contact PII before the text reaches a model (the C4/Dolma/
FineWeb pipelines all carry this stage).  At 10^12 documents the only
viable implementation is a narrow JVM projection: `regexp_replace`
and `regexp_count` stay inside whole-stage codegen, cost one pass per
pattern, and preserve pushdown on every other column.

Patterns are deliberately conservative (precision over recall — a
false redaction destroys training text):

- email: RFC-casual ``local@domain.tld`` with 2+ letter TLD;
- phone: international-ish ``[+]CC sep NNN sep NNNN`` (7-11 digits in
  1-3/3/4 groups, ``-`` or space separators) — digit runs inside
  words do not match;
- ipv4: four 1-3-digit octets, word-bounded.

Replacement tokens are angle-bracket typed placeholders (``<EMAIL>``,
``<PHONE>``, ``<IP>``), the convention the downstream tokenizer can
keep as single units.  Application order: email → ipv4 → phone
(email/ipv4 contain characters the phone class excludes, so the order
only matters defensively).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?\d{1,3}[-\s]\d{3}[-\s]\d{4}"
IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"

PATTERNS = (
    ("email", EMAIL_RE, "<EMAIL>"),
    ("ipv4", IPV4_RE, "<IP>"),
    ("phone", PHONE_RE, "<PHONE>"),
)


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-type match counts (for the metrics table / filter gates)."""
    return {
        name: F.regexp_count(text, F.lit(pat)).alias(f"n_pii_{name}")
        for name, pat, _ in PATTERNS
    }


def scrub_pii(text: Column) -> Column:
    """Text with every PII match replaced by its typed placeholder."""
    out = text
    for _, pat, token in PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out
