"""Unicode cross-engine parity pins (r7 unicode divergence sweep).

The shipped corpus is pure ASCII, so these pins freeze the THREE
portable-definition devices the sweep forced, on exactly the inputs
that diverged:

1. `content_fp` — content keys fold ONLY ASCII letters, because full
   Unicode lowercasing is engine-defined (JVM SpecialCasing: final
   sigma, Turkish I-dot vs utf8proc simple maps).
2. `_utf8_bytes_sql` — media oracles recover the exact UTF-8 byte
   stream via hex-pair arithmetic (ord(char) == byte held only for
   ASCII).
3. edit distance — DEFINED over UTF-8 bytes on both engines (DuckDB's
   levenshtein is byte-based; Spark's code-point DP is run through a
   latin-1 byte lens).

These are mostly DuckDB-side + pure-Python checks (fast); one Spark
case seals the Spark half of each device.
"""

from __future__ import annotations

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo/tools")

from degen_sweep import _UNICODE_CASES  # noqa: E402

from social_media_data_pipeline_recession_political_sentiment_spark.functions.hashing import (  # noqa: E402
    content_fp,
    content_fp_sql,
)
from social_media_data_pipeline_recession_political_sentiment_spark.operators.multimodal import (  # noqa: E402
    _utf8_bytes_sql,
)

# every enrichment string the sweep plants, plus the engine-divergence
# posters measured directly in the r7 probe
PROBE_STRINGS = [s for s, _ in _UNICODE_CASES if s] + [
    "İstanbul",  # Turkish dotted capital I
    "ΣΟΦΟΣ",  # all-caps sigma incl. final position
    "straße",  # sharp s (upper() diverges: STRASSE vs STRAẞE)
    "café vs café",  # precomposed vs decomposed
]


def _duck(sql: str, params=None):
    con = duckdb.connect()
    try:
        return con.execute(sql, params or []).fetchall()
    finally:
        con.close()


def test_duckdb_lower_is_not_java_lower():
    """The divergence that motivated ascii_fold: if this ever starts
    passing (engines converge), the fold device could be revisited."""
    s = "ΣΟΦΟΣ"  # ΣΟΦΟΣ
    (duck_lower,) = _duck("SELECT lower(?)", [s])[0]
    assert duck_lower == "σοφοσ"  # simple map: σοφοσ
    assert s.lower() == "σοφος"  # JVM/Python: final ς


def test_content_fp_sql_is_ascii_stable_on_unicode():
    """The DuckDB content key must equal the pure-Python reference
    (collapse ASCII whitespace, trim, fold ONLY A-Z) on every probe
    string — no engine case-mapping may leak into the key."""
    import hashlib
    import re

    for s in PROBE_STRINGS:
        # strip(' ') not strip(): SQL trim removes ONLY spaces, and the
        # reference must encode the device's definition, not Python's
        norm = re.sub(r"[ \t\n\f\r]+", " ", s).strip(" ")
        folded = "".join(
            chr(ord(c) + 32) if "A" <= c <= "Z" else c for c in norm
        )
        expect = hashlib.md5(folded.encode("utf-8")).hexdigest()
        got = _duck(f"SELECT {content_fp_sql('?')}", [s])[0][0]
        assert got == expect, f"content key drift on {s!r}"


def test_utf8_bytes_sql_recovers_exact_bytes():
    """The hex-pair byte device must reproduce the exact UTF-8 byte
    stream (offset AND value) for every probe string."""
    for s in PROBE_STRINGS:
        rows = _duck(
            "WITH rel AS (SELECT 1 AS doc_id, ? AS text), "
            + _utf8_bytes_sql("rel")
            + " SELECT p, b FROM bytes ORDER BY p",
            [s],
        )
        expect = list(enumerate(s.encode("utf-8")))
        assert [(int(p), int(b)) for p, b in rows] == expect, s


def test_duckdb_levenshtein_is_byte_based():
    """The fact the edit-distance pin relies on: DuckDB's DP runs on
    UTF-8 bytes. Verified against a reference byte-level DP."""

    def lev(a: bytes, b: bytes) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    pairs = [
        ("café", "cafe"),
        ("café", "café"),
        ("中文", "中"),
        ("abc", "axc"),
    ]
    for a, b in pairs:
        (got,) = _duck("SELECT levenshtein(?, ?)", [a, b])[0]
        assert got == lev(a.encode(), b.encode()), (a, b)


@pytest.mark.usefixtures("spark")
def test_spark_devices_match_duckdb_on_unicode(spark):
    """Seal the Spark half: content_fp and the latin-1 byte lens give
    the same values Spark-side as the DuckDB twins, on unicode."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(PROBE_STRINGS)], "doc_id int, text string"
    )
    got = {
        r["doc_id"]: (r["fp"], r["blen"])
        for r in df.select(
            "doc_id",
            content_fp("text").alias("fp"),
            F.length(
                F.decode(F.encode("text", "UTF-8"), "ISO-8859-1")
            ).alias("blen"),
        ).collect()
    }
    for i, s in enumerate(PROBE_STRINGS):
        (fp_duck,) = _duck(f"SELECT {content_fp_sql('?')}", [s])[0]
        assert got[i][0] == fp_duck, f"content_fp drift on {s!r}"
        assert got[i][1] == len(s.encode("utf-8")), f"byte lens drift on {s!r}"
