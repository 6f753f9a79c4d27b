"""Scalar-function layer queries (SURVEY §2.7): string / date / JSON
column expressions, each oracle-checked against DuckDB.

All of these are pure column expressions — JVM-side, whole-stage
codegen, no Python in the hot path. The reference runs every one of
them as per-row Python (`re.sub`, `datetime` parsing, dict.get
guards); that difference IS the scale story for text cleaning at
100 TB.

Testdata proxies: `documents.text` stands in for comment bodies;
synthetic URL/HTML decoration is concatenated on so the cleaning
expressions have something real to remove (the synthetic corpus is
plain word salad).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load
from ..functions.text import (
    clean_comment,
    hate_flag,
    normalize_text,
    sentiment_bucket,
    strip_html,
    strip_urls,
)
from ..functions.json_contract import (
    json_int_field,
    json_int_field_sql,
)
from ..registry import register


@register(
    "fn_strip_urls",
    oracle=(
        "SELECT doc_id, regexp_replace('see https://ex.com/p/' || doc_id || ' ' || text, "
        "'https?://[^ \\t\\n\\f\\r]+', '', 'g') AS cleaned FROM documents"
    ),
)
def fn_strip_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL removal (ref: `Reddit_4chan_Analysis.py:55-57`). A synthetic
    URL is prepended so the regex provably fires on every row."""
    d = load(spark, sf_dir, "documents")
    decorated = F.concat(F.lit("see https://ex.com/p/"), F.col("doc_id"), F.lit(" "), F.col("text"))
    return d.select("doc_id", strip_urls(decorated).alias("cleaned"))


@register(
    "fn_normalize_text",
    oracle=(
        "SELECT doc_id, lower(regexp_replace(text || ' Mixed-CASE!! 42?', "
        "'[^a-zA-Z0-9 \\t\\n\\f\\r]', '', 'g')) AS normalized FROM documents"
    ),
)
def fn_normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strip non-alphanumerics + lowercase (ref:
    `Reddit_4chan_Analysis.py:61`)."""
    d = load(spark, sf_dir, "documents")
    decorated = F.concat(F.col("text"), F.lit(" Mixed-CASE!! 42?"))
    return d.select("doc_id", normalize_text(decorated).alias("normalized"))


@register(
    "udf_clean_comment",
    oracle=(
        "SELECT doc_id, trim(lower(regexp_replace(regexp_replace("
        "'Visit https://spam.example/x?q=1 NOW! ' || text, "
        "'https?://[^ \\t\\n\\f\\r]+', '', 'g'), '[^a-zA-Z0-9 \\t\\n\\f\\r]', '', 'g'))) AS cleaned "
        "FROM documents"
    ),
)
def udf_clean_comment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's composite `clean_comment` (ref:
    `Reddit_4chan_Analysis.py:55-63`) — re-expressed as a pure
    expression chain; no UDF needed, despite the reference using one."""
    d = load(spark, sf_dir, "documents")
    decorated = F.concat(F.lit("Visit https://spam.example/x?q=1 NOW! "), F.col("text"))
    return d.select("doc_id", clean_comment(decorated).alias("cleaned"))


@register(
    "fn_strip_html",
    oracle=(
        "SELECT doc_id, trim(regexp_replace(replace(replace(replace(replace(replace("
        "regexp_replace('<p class=\"post\">&gt;&gt;12345 ' || text || ' &amp; more</p>', "
        "'<[^>]+>', '', 'g'), "
        "'&amp;', '&'), '&gt;', '>'), '&lt;', '<'), '&quot;', '\"'), '&#039;', ''''), "
        "'>>\\d+', '', 'g')) AS stripped FROM documents"
    ),
)
def fn_strip_html(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML → text (ref: `chan4.py:56-62` — bs4 get_text + entity
    unescape + `>>` quote-marker removal). 4chan comment markup is
    synthesized around the document text."""
    d = load(spark, sf_dir, "documents")
    decorated = F.concat(
        F.lit('<p class="post">&gt;&gt;12345 '), F.col("text"), F.lit(" &amp; more</p>")
    )
    return d.select("doc_id", strip_html(decorated).alias("stripped"))


@register(
    "fn_epoch_to_ts",
    oracle=(
        "SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s, "
        "(to_timestamp(CAST(floor(epoch(ts)) AS BIGINT)) AT TIME ZONE 'UTC') "
        "AS ts_roundtrip FROM events"
    ),
)
def fn_epoch_to_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unix epoch seconds ↔ timestamp (ref: `Reddit.py:81`
    ``datetime.utcfromtimestamp(created_utc)``; `chan4.py:76`).
    `timestamp_seconds` / long cast — no Python datetime per row."""
    e = load(spark, sf_dir, "events")
    epoch_s = F.col("ts").cast("long")
    return e.select(
        "event_id",
        epoch_s.alias("epoch_s"),
        F.timestamp_seconds(epoch_s).alias("ts_roundtrip"),
    )


@register(
    "fn_parse_iso_ts",
    oracle=(
        "SELECT event_id, strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS iso, "
        "strptime(strftime(ts, '%Y-%m-%dT%H:%M:%SZ'), '%Y-%m-%dT%H:%M:%SZ') AS parsed "
        "FROM events"
    ),
)
def fn_parse_iso_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ISO-8601 'Z' string → timestamp (ref: `Youtube_final.py:59`
    ``datetime.fromisoformat(s[:-1])`` — the trailing-Z strip). The
    string column is produced then re-parsed, proving both directions."""
    e = load(spark, sf_dir, "events")
    iso = F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss'Z'")
    return e.select(
        "event_id",
        iso.alias("iso"),
        F.to_timestamp(iso, "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("parsed"),
    )


@register(
    "fn_date_format",
    oracle=(
        "SELECT event_id, strftime(ts, '%Y-%m-%d') AS d, day(ts) AS dom FROM events"
    ),
)
def fn_date_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp → 'YYYY-MM-DD' + day-of-month (ref: `Reddit.py:46-47`
    strftime; `app.py:71,105,222` TO_CHAR/DATE; `app.py:51`
    strftime('%d') day compare)."""
    e = load(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd").alias("d"),
        F.dayofmonth("ts").cast("long").alias("dom"),
    )


@register(
    "fn_json_parse",
    oracle=(
        f"SELECT event_id, {json_int_field_sql('payload')} AS k_val FROM ("
        "  SELECT event_id, CASE WHEN event_id % 10 = 0 THEN '{corrupt' ELSE props END "
        "  AS payload FROM events)"
    ),
)
def fn_json_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerant JSON parse: malformed rows yield NULL, not errors (ref:
    `Reddit.py:103-107` try/except ValueError → skip; `chan4.py:73,89`).
    Every 10th payload is corrupted to prove the tolerant path;
    extraction follows the shared integral-token contract
    (functions/json_contract.py — the old oracle's hard CAST rounded
    '1.5' to 2 where Spark's typed parse read NULL, r7 json sweep)."""
    e = load(spark, sf_dir, "events")
    payload = F.when(F.col("event_id") % 10 == 0, F.lit("{corrupt")).otherwise(F.col("props"))
    return e.withColumn("payload", payload).select(
        "event_id", json_int_field("payload").alias("k_val")
    )


@register(
    "fn_null_guards",
    oracle=(
        "SELECT event_id, coalesce(CASE WHEN event_type = 'error' THEN NULL "
        "ELSE value END, 0.0) AS value_or_default FROM events"
    ),
)
def fn_null_guards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-default guards (ref: `Reddit.py:115` ``.get('score', 0)``;
    `chan4.py:76-83` ``.get(k,'')``). NULLs are injected on the
    'error' type then coalesced — the typed-schema replacement for
    dict.get defaults."""
    e = load(spark, sf_dir, "events")
    nullable = F.when(F.col("event_type") == "error", F.lit(None).cast("double")).otherwise(
        F.col("value")
    )
    return e.select("event_id", F.coalesce(nullable, F.lit(0.0)).alias("value_or_default"))


@register(
    "fn_sentiment_bucket",
    oracle=(
        "SELECT CASE WHEN (value - 100.0) / 200.0 >= 0.05 THEN 'positive' "
        "WHEN (value - 100.0) / 200.0 <= -0.05 THEN 'negative' "
        "ELSE 'neutral' END AS sentiment, count(*) AS cnt "
        "FROM events GROUP BY sentiment"
    ),
)
def fn_sentiment_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VADER compound → bucket CASE with the reference's exact
    inclusive ±0.05 boundaries (ref: `Reddit_4chan_Analysis.py:150-160`).
    events.value is rescaled to a pseudo-compound so all three branches
    fire."""
    e = load(spark, sf_dir, "events")
    compound = (F.col("value") - 100.0) / 200.0
    return (
        e.groupBy(sentiment_bucket(compound).alias("sentiment"))
        .agg(F.count("*").alias("cnt"))
    )


@register(
    "fn_hate_flag",
    oracle=(
        "SELECT (event_type = 'error' AND value / 330.0 > 0.9) AS is_hate_speech, "
        "count(*) AS cnt FROM events GROUP BY is_hate_speech"
    ),
)
def fn_hate_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hate flag iff class=='flag' AND confidence strictly > 0.9 (ref:
    `Reddit_4chan_Analysis.py:19,42-45`). event_type/value proxy the
    (class, confidence) pair; the > is strict, as in the reference.

    NULL pin (r8 sweep): a NULL class reads as UNKNOWN, not 'ok' —
    the class mapping has no `otherwise`, so NULL propagates through
    hate_flag's `&` with SQL Kleene semantics exactly like the
    oracle's (event_type = 'error' AND ...); an `.otherwise("ok")`
    had silently folded the NULL group into false on Spark only."""
    e = load(spark, sf_dir, "events")
    flag = hate_flag(
        F.when(F.col("event_type") == "error", "flag").when(
            F.col("event_type").isNotNull(), "ok"
        ),
        F.col("value") / 330.0,
    )
    return e.groupBy(flag.alias("is_hate_speech")).agg(F.count("*").alias("cnt"))


@F.pandas_udf(T.DoubleType())
def _value_range(v: pd.Series) -> float:
    """Grouped-agg pandas UDF (the UDAF surface): per-group
    max - min. Arrow ships each group's column once; max/min are
    order-independent so the result is bit-exact under any
    partitioning."""
    return float(v.max() - v.min())


@register(
    "udaf_value_range",
    oracle=(
        "SELECT event_type, max(value) - min(value) AS vrange "
        # finite-measure pin (r9 nonfinite gate): numpy max -> NaN
        # where SQL aggregates order NaN greatest
        "FROM events WHERE value IS NOT NULL AND NOT isnan(value) "
        "AND abs(value) < CAST('Infinity' AS DOUBLE) "
        "GROUP BY event_type"
    ),
)
def udaf_value_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregate via a GROUPED_AGG pandas UDF — the UDAF seam
    (SURVEY §2.8: the reference has none; this is the harness a real
    one — e.g. a t-digest or an HLL merge — would plug into). The
    chosen aggregate (per-type value range) is deliberately
    order-independent and builtin-checkable, so the slow-path plumbing
    is exercised while the oracle stays exact. Production code uses
    the builtin `max - min` (codegen'd, partial-aggregated); a pandas
    UDAF forces a full shuffle of raw values per group — the docstring
    price tag that justifies reaching for builtins first."""
    from .relational import FINITE_MEASURE_SQL

    e = load(spark, sf_dir, "events").where(FINITE_MEASURE_SQL)
    return e.groupBy("event_type").agg(
        _value_range(F.col("value")).alias("vrange")
    )


# ------------------------------- homoglyph/confusable folding

# minimal high-frequency confusable table (Cyrillic + Greek letters
# that render identically to Latin): the spam/evasion normalizer run
# before any dedup or blocklist match — "viаgra" with a Cyrillic а
# must collide with "viagra". Table deliberately small + auditable;
# a production deployment loads the full Unicode confusables list
# through the same translate() seam.
_CONF_FROM = "аеорсѕіху" + "οενραβ"
_CONF_TO = "aeopcsixy" + "oevpab"


@register(
    "fn_confusable_fold",
    oracle=(
        f"SELECT doc_id, translate(text, '{_CONF_FROM}', '{_CONF_TO}') AS folded, "
        f"translate(text, '{_CONF_FROM}', '{_CONF_TO}') <> text AS changed "
        "FROM documents"
    ),
)
def fn_confusable_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Homoglyph folding: map visually-identical Cyrillic/Greek
    letters onto their Latin ASCII confusables (translate(), a
    single codegen'd char-map pass) and flag documents that
    changed — the canonicalization gate in front of exact dedup,
    blocklists, and URL matching, where one substituted glyph
    otherwise defeats the hash. Complements `fn_unicode_nfc`
    (canonical equivalence) with the SECURITY equivalence NFC
    deliberately preserves.

    Scale shape: scan-local, zero shuffle, zero Python — a map
    stage that fuses into whatever runs next."""
    d = load(spark, sf_dir, "documents")
    folded = F.translate(F.col("text"), _CONF_FROM, _CONF_TO)
    return d.select(
        "doc_id",
        folded.alias("folded"),
        (folded != F.col("text")).alias("changed"),
    )


# ------------------------------------------ JSON shape profiling


_PROPS_SCHEMA_ORACLE = """
WITH k AS (SELECT event_type,
                  CASE WHEN props IS NULL THEN '<null>'
                       WHEN NOT json_valid(props)
                            OR json_type(props) <> 'OBJECT' THEN '<invalid>'
                       WHEN len(json_keys(props)) = 0 THEN '<empty>'
                       ELSE array_to_string(list_transform(
                              list_sort(json_keys(props)),
                              x -> concat(strlen(x), ':', x)), '+')
                  END AS signature
           FROM events),
n AS (SELECT CAST(count(*) AS BIGINT) AS total FROM k)
SELECT k.event_type, k.signature,
       CAST(count(*) AS BIGINT) AS n_events,
       round(count(*) * 1.0 / n.total, 6) AS share
FROM k, n GROUP BY 1, 2, n.total
"""


@register("fn_props_schema_census", oracle=_PROPS_SCHEMA_ORACLE)
def fn_props_schema_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured shape census: the sorted top-level key set of
    every `props` JSON payload, counted per event type — the
    data-profiling pass that catches producer drift BEFORE a
    downstream `get_json_object` silently nulls out (a new key
    appearing, an old one vanishing, malformed rows). Schema-on-read
    pipelines ship exactly this census as their first bronze-layer
    audit; `fn_json_parse` extracts known keys, this discovers the
    key population. NULL payloads, non-object/unparseable JSON, and
    empty objects land in explicit '<null>'/'<invalid>'/'<empty>'
    signatures instead of disappearing (the arms exist because the
    engines DIVERGE without them: DuckDB errors on malformed JSON
    where Spark nulls; DuckDB's json_keys returns [] for valid
    NON-object JSON like '[1,2]' where Spark's json_object_keys
    returns NULL — the json_type(props)='OBJECT' oracle guard pins
    both to '<invalid>'; and empty-list string joins return '' on
    Spark but NULL on DuckDB — all probed, r6).

    Exactness: both engines' native JSON key extraction returns the
    same key sets (parity verified incl. insertion order — sorted
    anyway for a canonical signature); each key is byte-length-
    prefixed before the '+' join so a key CONTAINING '+' cannot
    collide with a key split ('a+b' -> '3:a+b' vs 'a','b' ->
    '1:a+1:b' — unambiguously parseable, r6 review finding); counts
    are BIGINTs; share is one shared rounded division.

    Scale shape: scan-local JSON parsing + ONE (type,
    signature)-keyed count with map-side combine; output is bounded
    by the distinct shape population, not event volume."""
    e = load(spark, sf_dir, "events")
    # map_keys(from_json(...)), NOT json_object_keys: Spark's
    # json_object_keys is LENIENT about raw control chars inside
    # strings (it keyed '{"k":"-3\r"}') while from_json and DuckDB's
    # json_valid are RFC-strict and reject it — the census must use
    # ONE validity definition, and from_json's is the one the rest of
    # the props family (functions/json_contract.py) already pins.
    # from_json also reads NULL for valid NON-object JSON, matching
    # the oracle's json_type='OBJECT' guard, and keeps duplicate keys
    # exactly like DuckDB's json_keys (r7 json-edge sweep probes).
    keys = F.expr("map_keys(from_json(props, 'map<string,string>'))")
    sig = (
        F.when(F.col("props").isNull(), F.lit("<null>"))
        .when(keys.isNull(), F.lit("<invalid>"))
        # '{}' yields an EMPTY key list: array_join('') on Spark but
        # NULL from DuckDB's array_to_string — an explicit '<empty>'
        # arm keeps the engines aligned (both probed, r6)
        .when(F.size(keys) == 0, F.lit("<empty>"))
        .otherwise(
            F.expr(
                "array_join(transform(array_sort("
                "map_keys(from_json(props, 'map<string,string>'))), "
                "x -> concat(cast(octet_length(x) AS STRING), ':', x)), '+')"
            )
        )
        .alias("signature")
    )
    k = e.select("event_type", sig)
    n = k.agg(F.count("*").alias("total"))
    return (
        k.groupBy("event_type", "signature")
        .agg(F.count("*").alias("n_events"))
        .crossJoin(F.broadcast(n))
        .select(
            "event_type",
            "signature",
            "n_events",
            F.round(F.col("n_events") * 1.0 / F.col("total"), 6).alias("share"),
        )
    )
