"""Hate-speech enrichment (SURVEY §2.8 `udf_hatespeech_api`).

The reference POSTs every comment to the ModerateHateSpeech REST API,
one HTTP round-trip per row, skip-on-error (ref:
`Data Analysis/Reddit_4chan_Analysis.py:18-53`, `Youtube_Analysis.py:
18-53`). The engine shape here is ``mapInPandas``: one scorer
(HTTP session in the real deployment) per partition, whole Arrow
batches scored at once, client-side batching replacing per-row
round-trips.

The scorer is pluggable. Tests and the oracle gate use
``KeywordScorer`` — a deterministic, SQL-mirrorable stub — because
correctness tests never call external APIs (SURVEY §5 hermeticity).
A real ``ApiScorer`` would keep a requests.Session per partition and
rate-limit client-side; it is stubbed behind NotImplementedError
since this environment has no network.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register

CONF_THRESHOLD = 0.9  # strict >, ref: Reddit_4chan_Analysis.py:19,42


class KeywordScorer:
    """Deterministic stand-in for the ModerateHateSpeech API response:
    (class, confidence) per text. confidence = min(0.99, 0.2*n_dup +
    0.1*n_hash) over substring counts; class 'flag' iff conf >= 0.5."""

    def score(self, texts: pd.Series) -> pd.DataFrame:
        conf = np.minimum(0.99, 0.2 * texts.str.count("dup") + 0.1 * texts.str.count("hash"))
        clazz = np.where(conf >= 0.5, "flag", "ok")
        return pd.DataFrame({"hs_class": clazz, "hs_conf": conf})


class ApiScorer:
    """Per-partition HTTP client against the ModerateHateSpeech API
    (ref: `Reddit_4chan_Analysis.py:18-53`). Deliberately unbuilt in
    this hermetic environment — the engine plumbing (partition-level
    batching, session reuse, rate limiting) is what `mapInPandas`
    provides; the transport is deployment-specific."""

    def score(self, texts: pd.Series) -> pd.DataFrame:
        raise NotImplementedError("external API access is out of scope for tests")


def enrich_hatespeech(df: DataFrame, text_col: str = "text", scorer_cls=KeywordScorer) -> DataFrame:
    """Attach (is_hate_speech, hate_speech_confidence) — the an_*
    table's moderation half (ref: `Reddit_4chan_Analysis.py:65-77`,
    flag rule at `:42-45`: class=='flag' AND confidence > 0.9).

    STATED DELTA from the reference (r8 ADVICE): the reference's
    `hs_check_comment` (`Reddit_4chan_Analysis.py:54`) returns
    (False, None) for any unscorable comment — it folds "no
    verdict" into is_hate_speech=false. This engine instead reads
    NULL (class, confidence, flag) for a NULL comment, the Kleene
    three-valued contract the r8 NULL sweep pinned cross-engine: a
    downstream `is_hate_speech = false` filter here EXCLUDES
    NULL-text rows where the reference would include them. Chosen
    deliberately — "no text, no moderation verdict" keeps
    unscorable distinguishable from scored-clean; consumers that
    want the reference fold apply coalesce(is_hate_speech, false).
    """
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    out_schema = f"{fields}, hs_class string, hs_conf double"

    def score_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        scorer = scorer_cls()  # one per partition: session/model init amortized
        for pdf in batches:
            scores = scorer.score(pdf[text_col].fillna(""))
            yield pd.concat([pdf.reset_index(drop=True), scores], axis=1)

    scored = df.mapInPandas(score_partition, schema=out_schema)
    # NULL pin (r8 sweep): no text, no moderation verdict — a NULL
    # comment reads NULL (class, confidence, flag) on both engines.
    # The scorer still runs on fillna('') batches (mapInPandas row
    # alignment); the mask re-asserts the contract after the fact.
    scored = scored.withColumn(
        "hs_class", F.when(F.col(text_col).isNotNull(), F.col("hs_class"))
    ).withColumn(
        "hs_conf", F.when(F.col(text_col).isNotNull(), F.col("hs_conf"))
    )
    return scored.withColumn(
        "is_hate_speech",
        (F.col("hs_class") == "flag") & (F.col("hs_conf") > CONF_THRESHOLD),
    ).withColumnRenamed("hs_conf", "hate_speech_confidence")


@register(
    "udf_hatespeech_api",
    # 0.2/0.1 MUST be DOUBLE literals: DuckDB would otherwise do exact
    # DECIMAL arithmetic (0.2+0.1 = 0.3) while Spark/NumPy produce the
    # IEEE double 0.30000000000000004 — a value-hash mismatch that only
    # surfaces on rows with that keyword mix (seen at sf0.1)
    # the outer CASE WHEN text IS NULL: no text, no verdict (r8 NULL
    # sweep) — without it DuckDB's least() SKIPS the NULL operand and
    # reads 0.99 where Spark's masked column reads NULL
    oracle=(
        "WITH c AS (SELECT doc_id, CASE WHEN text IS NULL THEN NULL ELSE "
        "least(CAST(0.99 AS DOUBLE), "
        "CAST(0.2 AS DOUBLE) * (length(text) - length(replace(text, 'dup', ''))) / 3 + "
        "CAST(0.1 AS DOUBLE) * (length(text) - length(replace(text, 'hash', ''))) / 4) "
        "END AS conf "
        "FROM documents) "
        "SELECT doc_id, conf AS hate_speech_confidence, "
        "(CASE WHEN conf IS NULL THEN NULL "
        "WHEN conf >= 0.5 THEN 'flag' ELSE 'ok' END = 'flag' AND conf > 0.9) "
        "AS is_hate_speech FROM c"
    ),
)
def udf_hatespeech_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched hate-speech scoring through mapInPandas (ref:
    `Reddit_4chan_Analysis.py:116-137` — the per-row HTTP loop,
    re-expressed as partition-level batch scoring)."""
    d = load(spark, sf_dir, "documents")
    return enrich_hatespeech(d).select("doc_id", "hate_speech_confidence", "is_hate_speech")


@register(
    "enrich_table",
    oracle=(
        "WITH c AS (SELECT doc_id, text, "
        "(length(text) - length(replace(text, 'fast', ''))) / 4 AS n_fast, "
        "(length(text) - length(replace(text, 'big', ''))) / 3 AS n_big, "
        "(length(text) - length(replace(text, 'slow', ''))) / 4 AS n_slow, "
        "(length(text) - length(replace(text, 'small', ''))) / 5 AS n_small, "
        "CASE WHEN text IS NULL THEN NULL ELSE "
        "least(CAST(0.99 AS DOUBLE), "
        "CAST(0.2 AS DOUBLE) * (length(text) - length(replace(text, 'dup', ''))) / 3 + "
        "CAST(0.1 AS DOUBLE) * (length(text) - length(replace(text, 'hash', ''))) / 4) "
        "END AS conf "
        "FROM documents), "
        "s AS (SELECT doc_id, text, conf, "
        "(1.0*n_fast + 0.5*n_big - 1.0*n_slow - 0.5*n_small) / "
        "(1.0*n_fast + 0.5*n_big + 1.0*n_slow + 0.5*n_small + 1.0) AS sentiment_score "
        "FROM c) "
        "SELECT doc_id AS comment_id, text AS original_comment, "
        "trim(lower(regexp_replace(regexp_replace(text, 'https?://[^ \\t\\n\\f\\r]+', '', 'g'), "
        "'[^a-zA-Z0-9 \\t\\n\\f\\r]', '', 'g'))) AS cleaned_comment, "
        "(CASE WHEN conf IS NULL THEN NULL "
        "WHEN conf >= 0.5 THEN 'flag' ELSE 'ok' END = 'flag' AND conf > 0.9) "
        "AS is_hate_speech, conf AS hate_speech_confidence, "
        "CASE WHEN sentiment_score >= 0.05 THEN 'positive' "
        "WHEN sentiment_score <= -0.05 THEN 'negative' ELSE 'neutral' END AS sentiment, "
        "sentiment_score FROM s"
    ),
)
def enrich_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full enrichment-stage output — the an_* analysis table
    schema (ref: `Reddit_4chan_Analysis.py:65-77`: comment_id,
    original_comment, cleaned_comment, is_hate_speech,
    hate_speech_confidence, sentiment, sentiment_score), produced as
    one declarative pipeline: expression-chain cleaning + pandas-UDF
    sentiment + mapInPandas moderation. The reference does this with
    1 HTTP + 2 DB round-trips per row; here it is three narrow
    stages with zero shuffles."""
    from ..functions.text import clean_comment
    from .sentiment import enrich_sentiment

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    out = enrich_sentiment(enrich_hatespeech(d))
    return out.select(
        F.col("doc_id").alias("comment_id"),
        F.col("text").alias("original_comment"),
        clean_comment(F.col("text")).alias("cleaned_comment"),
        "is_hate_speech",
        "hate_speech_confidence",
        "sentiment",
        "sentiment_score",
    )
