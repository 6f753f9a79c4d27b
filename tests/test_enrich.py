"""Enrichment tier semantics (SURVEY §2.8): deterministic scorer
values, an_* output schema parity, threshold boundaries."""

from __future__ import annotations

import pandas as pd

from social_media_data_pipeline_recession_political_sentiment_spark.enrich.hatespeech import (
    KeywordScorer,
    enrich_hatespeech,
)
from social_media_data_pipeline_recession_political_sentiment_spark.enrich.sentiment import (
    LexiconAnalyzer,
    enrich_sentiment,
)


def test_lexicon_analyzer_exact_values():
    a = LexiconAnalyzer()
    s = a.score(pd.Series(["fast fast slow", "nothing here", "small big"]))
    # (2*1.0 - 1.0) / (2 + 1 + 1) = 0.25 ; 0 ; (0.5 - 0.5)/(1+1) = 0
    assert s.tolist() == [0.25, 0.0, 0.0]


def test_keyword_scorer_exact_values():
    s = KeywordScorer().score(pd.Series(["dup dup dup dup dup", "clean text", "hash dup"]))
    assert s["hs_conf"].tolist() == [0.99, 0.0, 0.2 + 0.1]
    assert s["hs_class"].tolist() == ["flag", "ok", "ok"]


def test_enrich_output_schema_matches_reference_ddl(spark):
    """an_* DDL: comment_id, original_comment, cleaned_comment,
    is_hate_speech, hate_speech_confidence, sentiment, sentiment_score
    (Reddit_4chan_Analysis.py:65-77)."""
    from social_media_data_pipeline_recession_political_sentiment_spark.registry import queries

    out = queries()["enrich_table"](spark, "/root/testdata/sf0.001")
    assert out.columns == [
        "comment_id",
        "original_comment",
        "cleaned_comment",
        "is_hate_speech",
        "hate_speech_confidence",
        "sentiment",
        "sentiment_score",
    ]
    types = dict(out.dtypes)
    assert types["is_hate_speech"] == "boolean"
    assert types["hate_speech_confidence"] == "double"
    assert types["sentiment_score"] == "double"


def test_hate_conf_exactly_09_not_flagged(spark):
    """Strict > 0.9: a doc scoring exactly 0.9 stays unflagged."""
    # 0.2 * n_dup = 0.9 is unreachable in steps of 0.2/0.1; use 'hash' x9 = 0.9
    df = spark.createDataFrame([(1, "hash " * 9)], "doc_id long, text string")
    row = enrich_hatespeech(df).collect()[0]
    assert abs(row.hate_speech_confidence - 0.9) < 1e-12
    assert row.is_hate_speech is False


def test_sentiment_bucket_on_scored_docs(spark):
    df = spark.createDataFrame(
        [(1, "fast fast fast fast"), (2, "slow slow slow slow"), (3, "x y z")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r.sentiment for r in enrich_sentiment(df).collect()}
    assert rows == {1: "positive", 2: "negative", 3: "neutral"}


def test_vader_mini_rules_fixture_buckets():
    """Vendored-lexicon VADER rules reproduce the real scorer's bucket
    behavior on unambiguous fixtures (±0.05 thresholds,
    Reddit_4chan_Analysis.py:152-158): valence lookup, negation flip,
    booster amplification, '!' emphasis, caps emphasis, compound
    normalization bounds."""
    from social_media_data_pipeline_recession_political_sentiment_spark.enrich.sentiment import (
        VaderMiniAnalyzer,
    )

    a = VaderMiniAnalyzer()
    texts = pd.Series(
        [
            "This is great, I love it!",
            "terrible awful hate everything",
            "the quarterly report was filed on schedule",
            "not good at all",
            "very good",
            "good",
            "this is GREAT",
        ]
    )
    s = a.score(texts)
    buckets = ["positive" if v >= 0.05 else "negative" if v <= -0.05 else "neutral" for v in s]
    assert buckets == ["positive", "negative", "neutral", "negative", "positive", "positive", "positive"]
    assert all(-1.0 < v < 1.0 for v in s)  # compound normalization bounds
    assert s[4] > s[5]  # 'very' boosts
    assert s[6] > s[5]  # ALL-CAPS emphasis on mixed-case text
    assert s[3] < 0 < s[5]  # negation flips 'good'


def test_enrich_sentiment_vader_path(spark):
    """The use_vader path runs through the same pandas-UDF plumbing and
    bucket expression as the oracle path."""
    df = spark.createDataFrame(
        [("a", "I love this, it is great!"), ("b", "awful terrible scam")],
        "id string, text string",
    )
    out = {r.id: r for r in enrich_sentiment(df, use_vader=True).collect()}
    assert out["a"].sentiment == "positive" and out["a"].sentiment_score > 0.05
    assert out["b"].sentiment == "negative" and out["b"].sentiment_score < -0.05
