"""Text-cleaning column expressions (SURVEY §2.7).

The reference cleans comments with per-row Python `re` calls
(`Data Analysis/Reddit_4chan_Analysis.py:55-63`, `Youtube_Analysis.py:
55-63`) and BeautifulSoup HTML stripping (`Data Collection/chan4.py:
56-62`). Here each is a pure column expression — JVM-side, inside
whole-stage codegen, no Python boundary — which is the 10-100x-faster
path at scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# explicit classes, not \S / \s: Java's \s includes \x0B, RE2's does
# not — the spelled-out ASCII whitespace set is the portable contract
# shared with every DuckDB oracle (functions/hashing.py WS_CHARS)
URL_RE = r"https?://[^ \t\n\f\r]+"
NON_ALNUM_RE = r"[^a-zA-Z0-9 \t\n\f\r]"
HTML_TAG_RE = r"<[^>]+>"
QUOTE_MARKER_RE = r">>\d+"


def strip_urls(col: Column) -> Column:
    """Remove http(s) URLs (ref: `Reddit_4chan_Analysis.py:55-57`
    ``re.sub(r'https?://\\S+', '', s)``)."""
    return F.regexp_replace(col, URL_RE, "")


def normalize_text(col: Column) -> Column:
    """Strip non-alphanumerics and lowercase (ref:
    `Reddit_4chan_Analysis.py:61`)."""
    return F.lower(F.regexp_replace(col, NON_ALNUM_RE, ""))


def clean_comment(col: Column) -> Column:
    """Composite cleaner: URLs out, then normalize (ref:
    `Reddit_4chan_Analysis.py:55-63` ``clean_comment`` — an expression
    chain here, no UDF needed)."""
    return F.trim(normalize_text(strip_urls(col)))


def strip_html(col: Column) -> Column:
    """HTML → text: drop tags, unescape common entities, remove 4chan
    ``>>12345`` quote markers (ref: `chan4.py:56-62` BeautifulSoup
    ``get_text`` + unescape + quote-marker removal). Expression-only
    approximation covering the entity set that occurs in the domain;
    a full-fidelity bs4 variant would be a pandas UDF (slow path)."""
    out = F.regexp_replace(col, HTML_TAG_RE, "")
    for ent, ch in (("&amp;", "&"), ("&gt;", ">"), ("&lt;", "<"), ("&quot;", '"'), ("&#039;", "'")):
        out = F.replace(out, F.lit(ent), F.lit(ch))
    out = F.regexp_replace(out, QUOTE_MARKER_RE, "")
    return F.trim(out)


def sentiment_bucket(compound: Column) -> Column:
    """CASE on the VADER compound score; boundaries inclusive exactly
    as the reference (ref: `Reddit_4chan_Analysis.py:150-160`:
    >= 0.05 positive, <= -0.05 negative, else neutral)."""
    return (
        F.when(compound >= 0.05, "positive")
        .when(compound <= -0.05, "negative")
        .otherwise("neutral")
    )


def hate_flag(clazz: Column, confidence: Column) -> Column:
    """Flag iff class == 'flag' AND confidence strictly > 0.9 (ref:
    `Reddit_4chan_Analysis.py:19,42-45`)."""
    return (clazz == "flag") & (confidence > 0.9)
