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
