"""The reference dashboard's 13 routes as engine calls (app.py parity
surface): every route runs, and the per-encoding quirks hold."""

from __future__ import annotations

from social_media_data_pipeline_recession_political_sentiment_spark import dashboard
from tests.conftest import SF_SMOKE


def test_all_routes_run(spark):
    routes = dashboard.all_routes(spark, SF_SMOKE)
    assert len(routes) == 14  # 1 scan + 4 counts + 4 sentiment + 4 hate + 1 daily
    for name, df in routes.items():
        assert df.count() >= 0, name  # executes without error


def test_counts_agree_across_encodings(spark):
    """The three time encodings select the same rows for aligned
    bounds: a platform's count via its encoding equals the native-ts
    count over the same window."""
    from pyspark.sql import functions as F

    from social_media_data_pipeline_recession_political_sentiment_spark.catalog import load

    start, end = dashboard.DEFAULT_START, dashboard.DEFAULT_END
    for platform in ("chan", "youtube"):
        got = dashboard.platform_count(spark, SF_SMOKE, platform, start, end).collect()[0][
            "count"
        ]
        want = (
            load(spark, SF_SMOKE, "events")
            .filter(F.col("event_type") == dashboard.PLATFORMS[platform])
            .filter(
                (F.col("ts") >= F.lit(start).cast("timestamp"))
                & (F.col("ts") < F.lit(end).cast("timestamp"))
            )
            .count()
        )
        assert got == want, (platform, got, want)


def test_sentiment_buckets_partition_rows(spark):
    out = dashboard.sentiment_distribution(spark, SF_SMOKE, "reddit").collect()
    assert {r.sentiment for r in out} <= {"positive", "negative", "neutral"}
    assert sum(r["count"] for r in out) > 0


def test_daily_counts_respects_platform(spark):
    """daily_counts(platform) must aggregate THAT platform's rows
    (regression: it used to always return politics data)."""
    from pyspark.sql import functions as F

    from social_media_data_pipeline_recession_political_sentiment_spark.catalog import load

    start, end = dashboard.DEFAULT_START, dashboard.DEFAULT_END
    for platform in ("politics", "reddit", "chan", "youtube"):
        rows = dashboard.daily_counts(spark, SF_SMOKE, platform, start, end).collect()
        want = (
            load(spark, SF_SMOKE, "events")
            .filter(F.col("event_type") == dashboard.PLATFORMS[platform])
            .filter(
                (F.col("ts") >= F.lit(start).cast("timestamp"))
                & (F.col("ts") < F.lit(end).cast("timestamp"))
            )
            .count()
        )
        assert sum(r["count"] for r in rows) == want, (platform, want)
        days = [r["day"] for r in rows]
        assert days == sorted(days)


def test_summary_onepass_reconciles_all_twelve_routes(spark):
    """dash_summary_onepass: every cell equals the corresponding
    individual route's number — 4 count routes and 8 distribution
    routes reproduced from one scan."""
    from tests.conftest import SF_SMOKE
    from social_media_data_pipeline_recession_political_sentiment_spark.registry import queries

    qs = queries()
    rows = qs["dash_summary_onepass"](spark, SF_SMOKE).collect()
    cells = {
        (r.platform, r.sentiment, r.is_hate_speech): (r.n_count_window, r.n_dist_window)
        for r in rows
    }
    for p in ("reddit", "chan", "youtube", "politics"):
        (cnt_row,) = qs[f"dash_count_{p}"](spark, SF_SMOKE).collect()
        assert cells[(p, None, None)][0] == cnt_row["count"], p
        sent = {r.sentiment: r["count"] for r in qs[f"dash_sentiment_{p}"](spark, SF_SMOKE).collect()}
        for s, n in sent.items():
            assert cells[(p, s, None)][1] == n, (p, s)
        # summary emits no cell for sentiments absent in the window
        assert {k[1] for k in cells if k[0] == p and k[1] is not None} == set(sent)
        hate = {r.is_hate_speech: r["count"] for r in qs[f"dash_hate_{p}"](spark, SF_SMOKE).collect()}
        for h, n in hate.items():
            assert cells[(p, None, h)][1] == n, (p, h)
