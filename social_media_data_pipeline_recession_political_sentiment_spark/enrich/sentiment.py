"""Sentiment enrichment (SURVEY §2.8 `udf_vader_sentiment`).

The reference scores every comment with VADER, re-instantiating
``SentimentIntensityAnalyzer`` on every call — a per-row cost bug
(ref: `Data Analysis/Reddit_4chan_Analysis.py:145-163`,
`Youtube_Analysis.py:143-161`). Here the scorer is an Arrow-batched
**iterator-form pandas UDF**: the analyzer is built once per
partition, then scores whole batches vectorized. That is the correct
shape for any per-row NLP model at 100 TB — model init cost is
amortized O(partitions), not O(rows).

Hermeticity (SURVEY §5): real VADER needs the NLTK lexicon download
(a network dependency, `Reddit_4chan_Analysis.py:11`); tests and the
oracle gate use a deterministic lexicon stub with the same interface.
If ``vaderSentiment`` is importable it is used when
``use_vader=True`` is requested explicitly.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load
from ..functions.text import sentiment_bucket
from ..registry import register

# Deterministic lexicon stub: term -> weight. Terms chosen from the
# synthetic corpus vocabulary; none is a substring of another vocab
# word, so substring counting == token counting here.
_POS = {"fast": 1.0, "big": 0.5}
_NEG = {"slow": 1.0, "small": 0.5}


class LexiconAnalyzer:
    """Vectorized stand-in for VADER's SentimentIntensityAnalyzer.

    compound = (pos - neg) / (pos + neg + 1) over weighted
    non-overlapping term counts — bounded to (-1, 1) like VADER's
    normalized compound, and exactly reproducible in ANSI SQL (the
    oracle mirrors it with length/replace counting).
    """

    def score(self, texts: pd.Series) -> pd.Series:
        pos = sum(w * texts.str.count(t) for t, w in _POS.items())
        neg = sum(w * texts.str.count(t) for t, w in _NEG.items())
        return (pos - neg) / (pos + neg + 1.0)


def _make_analyzer(use_vader: bool = False):
    if use_vader:
        try:
            from vaderSentiment.vaderSentiment import SentimentIntensityAnalyzer

            class _Vader:
                def __init__(self) -> None:
                    self._a = SentimentIntensityAnalyzer()

                def score(self, texts: pd.Series) -> pd.Series:
                    return texts.map(lambda s: self._a.polarity_scores(s)["compound"])

            return _Vader()
        except ImportError:
            pass  # not in this image -- fall through to the stub
    return LexiconAnalyzer()


@F.pandas_udf(T.DoubleType())
def compound_score(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """Iterator pandas UDF: one analyzer per partition (fixes the
    reference's per-row re-instantiation), Arrow-batched scoring."""
    analyzer = _make_analyzer()
    for texts in batches:
        yield analyzer.score(texts.fillna(""))


def enrich_sentiment(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach sentiment_score + sentiment bucket columns (the an_*
    table's sentiment half, ref: `Reddit_4chan_Analysis.py:65-77`)."""
    scored = df.withColumn("sentiment_score", compound_score(F.col(text_col)))
    return scored.withColumn("sentiment", sentiment_bucket(F.col("sentiment_score")))


_ORACLE_COUNTS = (
    "(length(text) - length(replace(text, 'fast', ''))) / 4 AS n_fast, "
    "(length(text) - length(replace(text, 'big', ''))) / 3 AS n_big, "
    "(length(text) - length(replace(text, 'slow', ''))) / 4 AS n_slow, "
    "(length(text) - length(replace(text, 'small', ''))) / 5 AS n_small"
)
_ORACLE_COMPOUND = (
    "(1.0*n_fast + 0.5*n_big - 1.0*n_slow - 0.5*n_small) / "
    "(1.0*n_fast + 0.5*n_big + 1.0*n_slow + 0.5*n_small + 1.0)"
)


@register(
    "udf_vader_sentiment",
    oracle=(
        f"WITH c AS (SELECT doc_id, {_ORACLE_COUNTS} FROM documents), "
        f"s AS (SELECT doc_id, {_ORACLE_COMPOUND} AS sentiment_score FROM c) "
        "SELECT doc_id, sentiment_score, "
        "CASE WHEN sentiment_score >= 0.05 THEN 'positive' "
        "WHEN sentiment_score <= -0.05 THEN 'negative' "
        "ELSE 'neutral' END AS sentiment FROM s"
    ),
)
def udf_vader_sentiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document sentiment scoring through the pandas-UDF path
    (ref: `Reddit_4chan_Analysis.py:145-163`). The deterministic
    lexicon makes the whole Python-UDF pipeline oracle-checkable —
    counting, weighting, normalization, and the ±0.05 bucketing."""
    d = load(spark, sf_dir, "documents")
    return enrich_sentiment(d).select("doc_id", "sentiment_score", "sentiment")
