"""Engine-parity hashing devices shared across operators.

The md5-derived 0-9 bucket is the repo's deterministic-split
primitive (`ext_data_split`, `ext_dedup_incremental`): a pure
function of the stringified key, so assignment is stable across
runs, engines, and partitionings. The Spark expression and the
DuckDB SQL template below MUST stay bit-identical — 15 hex chars of
md5, parsed base-16, cast to BIGINT, mod 10 — which is exactly why
they live in one place instead of per-operator copies.
"""

from __future__ import annotations

from pyspark.sql import functions as F

DOC_BUCKET_MOD = 10


def doc_bucket(col: str):
    """Deterministic bucket in [0, DOC_BUCKET_MOD) from md5 of the
    stringified key (Spark side of DOC_BUCKET_SQL)."""
    return (
        F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 15), 16, 10)
        .cast("long") % DOC_BUCKET_MOD
    )


def doc_bucket_sql(col: str) -> str:
    """DuckDB twin of `doc_bucket` — substitute into oracle SQL."""
    return (
        f"CAST(('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 15)) AS BIGINT) "
        f"% {DOC_BUCKET_MOD}"
    )


# ---------------------------------------- portable content folding

# Explicit ASCII whitespace classes: Java regex \s additionally
# matches \x0B where RE2's does not, so \s / \S are NOT portable
# across the engines — every shared regex spells the class out.
# (\x0B itself therefore counts as NON-whitespace on both engines.)
WS_CHARS = " \\t\\n\\f\\r"
WS_CLASS = f"[{WS_CHARS}]+"
NON_WS_CLASS = f"[^{WS_CHARS}]"

_AZ_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_AZ_LOWER = "abcdefghijklmnopqrstuvwxyz"


def ascii_fold(col):
    """ASCII-only case fold (A-Z -> a-z), the portable normalization
    for cross-stack CONTENT KEYS (fingerprints, dedup cluster keys).

    Full Unicode lowercasing is implementation-defined across engines
    (r7 unicode sweep): the JVM applies SpecialCasing.txt — final
    sigma 'ΣΟΦΟΣ'→'σοφος', Turkish 'İ'→'i'+U+0307 — while utf8proc
    (DuckDB) applies the simple per-codepoint map ('σοφοσ', 'i'), so
    an md5 over lower(text) silently forks the dedup universe the
    moment a Greek or Turkish document arrives. A content key must be
    byte-stable across every engine that computes it, so it folds
    ONLY the 26 ASCII letters — identical by construction everywhere,
    and identical to lower() on ASCII corpora. (Human-facing text
    normalization keeps real lower(); this device is for KEYS.)"""
    return F.translate(col, _AZ_UPPER, _AZ_LOWER)


def ascii_fold_sql(expr: str) -> str:
    """DuckDB twin of `ascii_fold` — substitute into oracle SQL."""
    return f"translate({expr}, '{_AZ_UPPER}', '{_AZ_LOWER}')"


def content_fp(col: str = "text"):
    """Portable content fingerprint: md5 over whitespace-collapsed,
    ASCII-folded, trimmed text — the cross-snapshot join key used by
    `ext_fingerprint`, `ext_corpus_curation`, `ext_dedup_cluster_pick`
    and `ext_cluster_diversity`. One definition, both engines."""
    return F.md5(ascii_fold(F.trim(F.regexp_replace(col, WS_CLASS, " "))))


def content_fp_sql(expr: str = "text") -> str:
    """DuckDB twin of `content_fp` — substitute into oracle SQL."""
    return (
        "md5("
        + ascii_fold_sql(f"trim(regexp_replace({expr}, '{WS_CLASS}', ' ', 'g'))")
        + ")"
    )
