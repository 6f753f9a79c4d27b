"""The reference dashboard's query corpus, re-expressed as engine
calls (ref: `Analysis Dashboard/app.py` — 13 parametrized SQL routes;
`Data Analysis/Analysis_queries.ipynb` cells 0-1).

A reference user's daily queries are exactly these routes. Each is a
plain function `(spark, sf_dir, start, end) -> DataFrame` over gold
views derived deterministically from the testdata `events` table,
with the reference's three timestamp encodings preserved on purpose
(SURVEY §1.2): native timestamps (Reddit/politics), display TEXT
needing a cast at query time (4chan, `app.py:71,105,222`), and
ISO-8601 TEXT compared lexically (YouTube, `app.py:152,244`).

Platform mapping onto the synthetic events stream (fixed, arbitrary):
click=reddit, error=4chan, purchase=youtube, signup=politics.
Enrichment columns derive from `value` so both engines can compute
them: sentiment = value>=100 positive / value<30 negative / neutral;
is_hate_speech = value >= 150, confidence = min(value/200, 0.99).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load
from .registry import register

PLATFORMS = {
    "reddit": "click",
    "chan": "error",
    "youtube": "purchase",
    "politics": "signup",
}

# default route parameters (the Flask routes default to a fixed window,
# `app.py:290-292`); chosen inside the testdata's January 2024 span
DEFAULT_START = "2024-01-05"
DEFAULT_END = "2024-01-25"


def _base(spark: SparkSession, sf_dir: str, platform: str) -> DataFrame:
    e = load(spark, sf_dir, "events").filter(
        F.col("event_type") == PLATFORMS[platform]
    )
    return e.select(
        F.col("event_id").cast("string").alias("comment_id"),
        F.col("ts"),
        F.col("value"),
    )


def day_expr(platform: str):
    """The platform's day-of-comment expression over its raw table —
    the single dispatch site for the reference's three time encodings
    (native ts / display TEXT / ISO TEXT)."""
    if platform == "chan":  # TEXT display ts → cast (app.py:71)
        return F.to_date("timestamp")
    if platform == "youtube":  # ISO TEXT → parse (app.py:152)
        return F.to_date(F.to_timestamp("comment_time", "yyyy-MM-dd'T'HH:mm:ss'Z'"))
    return F.to_date("created_utc")  # native ts (reddit/politics)


def raw_comments(spark: SparkSession, sf_dir: str, platform: str) -> DataFrame:
    """Per-platform raw table with the reference's time encoding:
    native ts (reddit/politics), TEXT 'yyyy-MM-dd HH:mm:ss' (4chan),
    ISO-8601 TEXT (youtube)."""
    b = _base(spark, sf_dir, platform)
    if platform == "chan":
        return b.select(
            F.col("comment_id").alias("postnumber"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("timestamp"),
        )
    if platform == "youtube":
        return b.select(
            "comment_id",
            F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("comment_time"),
        )
    return b.select("comment_id", F.col("ts").alias("created_utc"))


def enriched(spark: SparkSession, sf_dir: str, platform: str) -> DataFrame:
    """The an_* analysis table for a platform (ref DDL:
    `Reddit_4chan_Analysis.py:65-77`), derived deterministically."""
    b = _base(spark, sf_dir, platform)
    sentiment = (
        F.when(F.col("value") >= 100, "positive")
        .when(F.col("value") < 30, "negative")
        .otherwise("neutral")
    )
    return b.select(
        "comment_id",
        sentiment.alias("sentiment"),
        (F.col("value") >= 150).alias("is_hate_speech"),
        F.least(F.col("value") / 200, F.lit(0.99)).alias("hate_speech_confidence"),
    )


# ---------------------------------------------------------------- routes
# 1 (app.py:34-38): politics comments in a half-open range, ordered
def politics_comments(spark, sf_dir, start=DEFAULT_START, end=DEFAULT_END):
    r = raw_comments(spark, sf_dir, "politics")
    return (
        r.filter(
            (F.col("created_utc") >= F.lit(start).cast("timestamp"))
            & (F.col("created_utc") < F.lit(end).cast("timestamp"))
        )
        .select("created_utc")
        .orderBy("created_utc")
    )


# 2-4 (app.py:70-77): per-platform volume counts, one per encoding
def platform_count(spark, sf_dir, platform, start=DEFAULT_START, end=DEFAULT_END):
    r = raw_comments(spark, sf_dir, platform)
    if platform == "chan":  # DATE(timestamp) cast on TEXT, app.py:71
        pred = (F.to_date("timestamp") >= F.lit(start).cast("date")) & (
            F.to_date("timestamp") < F.lit(end).cast("date")
        )
    elif platform == "youtube":  # lexical TEXT compare, app.py:72
        pred = (F.col("comment_time") >= f"{start}T00:00:00Z") & (
            F.col("comment_time") < f"{end}T00:00:00Z"
        )
    else:
        pred = (F.col("created_utc") >= F.lit(start).cast("timestamp")) & (
            F.col("created_utc") < F.lit(end).cast("timestamp")
        )
    return r.filter(pred).agg(F.count("*").alias("count"))


def _dist(spark, sf_dir, platform, col, start, end):
    """Routes 5-12 share one shape: enriched JOIN raw on the key,
    BETWEEN on the platform's time encoding, GROUP BY col
    (app.py:105-265)."""
    r = raw_comments(spark, sf_dir, platform)
    s = enriched(spark, sf_dir, platform)
    if platform == "chan":  # TO_CHAR(timestamp::date,...) BETWEEN, app.py:105,222
        key = "postnumber"
        s = s.withColumnRenamed("comment_id", key)
        cond = F.date_format(F.to_date("timestamp"), "yyyy-MM-dd").between(start, end)
    elif platform == "youtube":  # lexical BETWEEN, app.py:152,244
        key = "comment_id"
        cond = F.col("comment_time").between(f"{start}T00:00:00Z", f"{end}T23:59:59Z")
    else:  # native ts BETWEEN, app.py:109,175,198,265
        key = "comment_id"
        cond = F.col("created_utc").between(
            F.lit(start).cast("timestamp"), F.lit(end).cast("timestamp")
        )
    return (
        s.join(r, key, "inner").filter(cond).groupBy(col).agg(F.count("*").alias("count"))
    )


def sentiment_distribution(spark, sf_dir, platform, start=DEFAULT_START, end=DEFAULT_END):
    return _dist(spark, sf_dir, platform, "sentiment", start, end)


def hate_distribution(spark, sf_dir, platform, start=DEFAULT_START, end=DEFAULT_END):
    return _dist(spark, sf_dir, platform, "is_hate_speech", start, end)


# 13 (app.py:44-59): the manual daily-count loop as one aggregation.
# Works for every platform by normalizing its time encoding to a day.
def daily_counts(spark, sf_dir, platform="politics", start=DEFAULT_START, end=DEFAULT_END):
    r = raw_comments(spark, sf_dir, platform)
    day = day_expr(platform)
    return (
        r.filter((day >= F.lit(start).cast("date")) & (day < F.lit(end).cast("date")))
        .groupBy(day.alias("day"))
        .agg(F.count("*").alias("count"))
        .orderBy("day")
    )


def all_routes(spark, sf_dir, start=DEFAULT_START, end=DEFAULT_END) -> dict[str, DataFrame]:
    """Every dashboard route, keyed like the Flask endpoints — the
    drop-in surface for a reference user."""
    out = {"politics_comments": politics_comments(spark, sf_dir, start, end)}
    for p in PLATFORMS:
        out[f"count_{p}"] = platform_count(spark, sf_dir, p, start, end)
        out[f"sentiment_{p}"] = sentiment_distribution(spark, sf_dir, p, start, end)
        out[f"hate_{p}"] = hate_distribution(spark, sf_dir, p, start, end)
    out["daily_politics"] = daily_counts(spark, sf_dir, "politics", start, end)
    return out


# ------------------------------------------ oracle-checked registrations
# All 13 Flask routes (`app.py:34-265`) register with oracles. The SQL is
# built by the three helpers below so each platform's time-encoding quirk
# is written exactly once on the oracle side too.
_ENRICH_SQL = (
    "CASE WHEN value >= 100 THEN 'positive' WHEN value < 30 THEN 'negative' "
    "ELSE 'neutral' END AS sentiment, (value >= 150) AS is_hate_speech"
)


def _raw_sql(platform: str) -> str:
    et = PLATFORMS[platform]
    if platform == "chan":
        cols = (
            "CAST(event_id AS VARCHAR) AS postnumber, "
            "strftime(ts, '%Y-%m-%d %H:%M:%S') AS timestamp"
        )
    elif platform == "youtube":
        cols = (
            "CAST(event_id AS VARCHAR) AS comment_id, "
            "strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS comment_time"
        )
    else:
        cols = "CAST(event_id AS VARCHAR) AS comment_id, ts AS created_utc"
    return f"SELECT {cols} FROM events WHERE event_type='{et}'"


def _count_oracle(platform: str, start: str = DEFAULT_START, end: str = DEFAULT_END) -> str:
    raw = _raw_sql(platform)
    if platform == "chan":  # DATE(timestamp) cast on TEXT, app.py:71
        pred = f"CAST(timestamp AS DATE) >= DATE '{start}' AND CAST(timestamp AS DATE) < DATE '{end}'"
    elif platform == "youtube":  # lexical TEXT compare, app.py:72
        pred = f"comment_time >= '{start}T00:00:00Z' AND comment_time < '{end}T00:00:00Z'"
    else:
        pred = (
            f"created_utc >= TIMESTAMP '{start} 00:00:00' "
            f"AND created_utc < TIMESTAMP '{end} 00:00:00'"
        )
    return f"WITH raw AS ({raw}) SELECT count(*) AS count FROM raw WHERE {pred}"


def _dist_oracle(platform: str, col: str, start: str = DEFAULT_START, end: str = DEFAULT_END) -> str:
    et = PLATFORMS[platform]
    key = "postnumber" if platform == "chan" else "comment_id"
    if platform == "chan":  # TO_CHAR(timestamp::date,...) BETWEEN, app.py:105,222
        cond = (
            "strftime(CAST(raw.timestamp AS DATE), '%Y-%m-%d') "
            f"BETWEEN '{start}' AND '{end}'"
        )
    elif platform == "youtube":  # lexical BETWEEN, app.py:152,244
        cond = f"raw.comment_time BETWEEN '{start}T00:00:00Z' AND '{end}T23:59:59Z'"
    else:  # native ts BETWEEN, app.py:109,175,198,265
        cond = (
            f"raw.created_utc BETWEEN TIMESTAMP '{start} 00:00:00' "
            f"AND TIMESTAMP '{end} 00:00:00'"
        )
    return (
        f"WITH raw AS ({_raw_sql(platform)}), "
        f"an AS (SELECT CAST(event_id AS VARCHAR) AS {key}, {_ENRICH_SQL} "
        f"FROM events WHERE event_type='{et}') "
        f"SELECT an.{col}, count(*) AS count FROM an JOIN raw USING ({key}) "
        f"WHERE {cond} GROUP BY an.{col}"
    )


@register(
    "dash_politics_comments",
    oracle=(
        f"WITH raw AS ({_raw_sql('politics')}) SELECT created_utc FROM raw "
        f"WHERE created_utc >= TIMESTAMP '{DEFAULT_START} 00:00:00' "
        f"AND created_utc < TIMESTAMP '{DEFAULT_END} 00:00:00' ORDER BY created_utc"
    ),
)
def dash_politics_comments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Route 1 (`app.py:34-38`): politics comments in a half-open time
    range, ordered by comment time."""
    return politics_comments(spark, sf_dir)


@register("dash_count_reddit", oracle=_count_oracle("reddit"))
def dash_count_reddit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Route 2 (`app.py:70`): reddit volume count over native
    timestamps."""
    return platform_count(spark, sf_dir, "reddit")


@register("dash_count_chan", oracle=_count_oracle("chan"))
def dash_count_chan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Route 3 (`app.py:71`): 4chan volume count — DATE() cast over the
    display-TEXT timestamp."""
    return platform_count(spark, sf_dir, "chan")


@register("dash_count_youtube", oracle=_count_oracle("youtube"))
def dash_count_youtube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Route 4 (`app.py:72`): YouTube volume count — lexical compare on
    ISO-8601 TEXT."""
    return platform_count(spark, sf_dir, "youtube")


@register("dash_count_politics", oracle=_count_oracle("politics"))
def dash_count_politics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Route 2 politics variant (`app.py:70,175`): volume count over
    native timestamps."""
    return platform_count(spark, sf_dir, "politics")


@register("dash_sentiment_reddit", oracle=_dist_oracle("reddit", "sentiment"))
def dash_sentiment_reddit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Route 6 (`app.py:109`): reddit sentiment distribution."""
    return sentiment_distribution(spark, sf_dir, "reddit")


@register("dash_sentiment_chan", oracle=_dist_oracle("chan", "sentiment"))
def dash_sentiment_chan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Route 5 (`app.py:105`): 4chan sentiment distribution — the
    TEXT-timestamp cast quirk (`TO_CHAR(timestamp::date, ...)
    BETWEEN`) preserved end to end."""
    return sentiment_distribution(spark, sf_dir, "chan")


@register("dash_sentiment_youtube", oracle=_dist_oracle("youtube", "sentiment"))
def dash_sentiment_youtube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Route 7 (`app.py:152`): YouTube sentiment distribution — lexical
    ISO-TEXT BETWEEN."""
    return sentiment_distribution(spark, sf_dir, "youtube")


@register("dash_sentiment_politics", oracle=_dist_oracle("politics", "sentiment"))
def dash_sentiment_politics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Route 8 (`app.py:175`): politics sentiment distribution."""
    return sentiment_distribution(spark, sf_dir, "politics")


@register("dash_hate_reddit", oracle=_dist_oracle("reddit", "is_hate_speech"))
def dash_hate_reddit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Route 9 (`app.py:198`): reddit hate-speech distribution."""
    return hate_distribution(spark, sf_dir, "reddit")


@register("dash_hate_chan", oracle=_dist_oracle("chan", "is_hate_speech"))
def dash_hate_chan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Route 10 (`app.py:222`): 4chan hate-speech distribution — TEXT
    timestamp cast quirk."""
    return hate_distribution(spark, sf_dir, "chan")


@register("dash_hate_youtube", oracle=_dist_oracle("youtube", "is_hate_speech"))
def dash_hate_youtube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Route 11 (`app.py:244`): YouTube hate-speech distribution — the
    lexical ISO-TEXT BETWEEN quirk preserved end to end."""
    return hate_distribution(spark, sf_dir, "youtube")


@register("dash_hate_politics", oracle=_dist_oracle("politics", "is_hate_speech"))
def dash_hate_politics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Route 12 (`app.py:265`): politics hate-speech distribution."""
    return hate_distribution(spark, sf_dir, "politics")


@register(
    "dash_daily_politics",
    oracle=(
        "SELECT CAST(date_trunc('day', ts) AS DATE) AS day, count(*) AS count "
        "FROM events WHERE event_type = 'signup' "
        f"AND ts >= TIMESTAMP '{DEFAULT_START} 00:00:00' "
        f"AND ts < TIMESTAMP '{DEFAULT_END} 00:00:00' GROUP BY day ORDER BY day"
    ),
)
def dash_daily_politics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Route 13 (`app.py:44-59`): the manual daily-count pandas loop as
    a single daily aggregation (the `count/10*5.5` trailing-day
    extrapolation is presentation-layer, deliberately dropped —
    SURVEY §7 risk register)."""
    return daily_counts(spark, sf_dir, "politics")


# ---------------------------------------- one-pass dashboard summary

def _summary_oracle(start: str = DEFAULT_START, end: str = DEFAULT_END) -> str:
    """Replays each route family's predicate over the platform's OWN
    time encoding (TEXT casts and lexical compares included), so the
    one-pass operator's ts-derived predicates are independently
    cross-checked."""
    branches = []
    for p in PLATFORMS:
        raw = _raw_sql(p)
        if p == "chan":
            key = "postnumber"
            in_count = (
                f"CAST(r.timestamp AS DATE) >= DATE '{start}' "
                f"AND CAST(r.timestamp AS DATE) < DATE '{end}'"
            )
            in_dist = (
                f"strftime(CAST(r.timestamp AS DATE), '%Y-%m-%d') "
                f"BETWEEN '{start}' AND '{end}'"
            )
        elif p == "youtube":
            key = "comment_id"
            in_count = (
                f"r.comment_time >= '{start}T00:00:00Z' "
                f"AND r.comment_time < '{end}T00:00:00Z'"
            )
            in_dist = (
                f"r.comment_time BETWEEN '{start}T00:00:00Z' "
                f"AND '{end}T23:59:59Z'"
            )
        else:
            key = "comment_id"
            in_count = (
                f"r.created_utc >= TIMESTAMP '{start} 00:00:00' "
                f"AND r.created_utc < TIMESTAMP '{end} 00:00:00'"
            )
            in_dist = (
                f"r.created_utc BETWEEN TIMESTAMP '{start} 00:00:00' "
                f"AND TIMESTAMP '{end} 00:00:00'"
            )
        branches.append(
            f"SELECT '{p}' AS platform, an.sentiment, an.is_hate_speech, "
            f"({in_count}) AS in_count, ({in_dist}) AS in_dist "
            f"FROM ({raw}) r JOIN (SELECT CAST(event_id AS VARCHAR) AS {key}, "
            f"{_ENRICH_SQL} FROM events WHERE event_type='{PLATFORMS[p]}') an "
            f"USING ({key})"
        )
    u = " UNION ALL ".join(branches)
    return (
        f"WITH plat AS ({u}) "
        "SELECT platform, sentiment, is_hate_speech, "
        "CAST(sum(CASE WHEN in_count THEN 1 ELSE 0 END) AS BIGINT) AS n_count_window, "
        "CAST(sum(CASE WHEN in_dist THEN 1 ELSE 0 END) AS BIGINT) AS n_dist_window "
        "FROM plat WHERE in_count OR in_dist "
        "GROUP BY GROUPING SETS ((platform), (platform, sentiment), "
        "(platform, is_hate_speech))"
    )


@register("dash_summary_onepass", oracle=_summary_oracle())
def dash_summary_onepass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ENTIRE per-platform dashboard in ONE query: all four count
    routes and all eight distribution routes (`app.py:64-265`) as a
    single scan + single GROUPING SETS aggregate — the columnar-
    engine answer to the reference serving 12 separate SQL round
    trips per page load. Grouping-set rows: (platform) carries the
    count-route number in n_count_window; (platform, sentiment) and
    (platform, is_hate_speech) carry the distribution numbers in
    n_dist_window.

    The routes' time predicates differ per platform AND per family
    (half-open vs BETWEEN, TEXT casts, lexical ISO compares), so the
    one-pass derives each as a ts-native expression: the lexical
    'YYYY-MM-DDTHH:MM:SSZ' compare truncates to seconds, making
    `comment_time <= 'endT23:59:59Z'` ⟺ `ts < end+1 day` and
    `comment_time < 'endT00:00:00Z'` ⟺ `ts < end` — equivalences the
    oracle PROVES by replaying the original TEXT predicates over the
    encoded columns. pytest additionally reconciles every cell
    against the 12 individual routes.

    Scale shape: one events scan (ts, event_type, value pruned), one
    Expand(3) + hash aggregate — versus 12 scans and 12 aggregates;
    at dashboard QPS this is the difference between a cached
    one-job summary and hammering the warehouse."""
    start, end = DEFAULT_START, DEFAULT_END
    e = load(spark, sf_dir, "events")
    platform = (
        F.when(F.col("event_type") == "click", "reddit")
        .when(F.col("event_type") == "error", "chan")
        .when(F.col("event_type") == "purchase", "youtube")
        .when(F.col("event_type") == "signup", "politics")
    )
    s_ts = F.lit(start).cast("timestamp")
    e_ts = F.lit(end).cast("timestamp")
    e_next = F.date_add(F.lit(end).cast("date"), 1).cast("timestamp")
    sentiment = (
        F.when(F.col("value") >= 100, "positive")
        .when(F.col("value") < 30, "negative")
        .otherwise("neutral")
    )
    native_count = (F.col("ts") >= s_ts) & (F.col("ts") < e_ts)
    in_count = (
        F.when(
            F.col("platform") == "chan",
            (F.to_date("ts") >= F.lit(start).cast("date"))
            & (F.to_date("ts") < F.lit(end).cast("date")),
        ).otherwise(native_count)  # native ts AND the lexical-ISO form
    )
    in_dist = (
        F.when(
            F.col("platform") == "chan",
            F.to_date("ts").between(
                F.lit(start).cast("date"), F.lit(end).cast("date")
            ),
        )
        .when(
            F.col("platform") == "youtube",
            (F.col("ts") >= s_ts) & (F.col("ts") < e_next),
        )
        .otherwise((F.col("ts") >= s_ts) & (F.col("ts") <= e_ts))
    )
    d = (
        e.filter(F.col("event_type").isin(*PLATFORMS.values()))
        .select(
            platform.alias("platform"),
            sentiment.alias("sentiment"),
            (F.col("value") >= 150).alias("is_hate_speech"),
            "ts",
        )
        .select(
            "platform",
            "sentiment",
            "is_hate_speech",
            in_count.alias("in_count"),
            in_dist.alias("in_dist"),
        )
        .filter(F.col("in_count") | F.col("in_dist"))
    )
    return d.groupingSets(
        [["platform"], ["platform", "sentiment"], ["platform", "is_hate_speech"]],
        "platform",
        "sentiment",
        "is_hate_speech",
    ).agg(
        F.sum(F.col("in_count").cast("long")).alias("n_count_window"),
        F.sum(F.col("in_dist").cast("long")).alias("n_dist_window"),
    )
