"""REST-JSON source adapter semantics (SURVEY §2.1/§3.1)."""

from __future__ import annotations

import datetime as dt

from social_media_data_pipeline_recession_political_sentiment_spark.registry import queries
from social_media_data_pipeline_recession_political_sentiment_spark.sources.rest_json import (
    REDDIT_LISTING_FIXTURE,
    flatten_reddit_listing,
    read_landed_pages,
)


def test_flatten_shape_and_types(spark):
    out = flatten_reddit_listing(read_landed_pages(spark, REDDIT_LISTING_FIXTURE))
    assert out.columns == ["subreddit", "post_id", "body", "score", "created_utc", "comment_id"]
    assert dict(out.dtypes)["created_utc"] == "timestamp"
    rows = out.collect()
    assert len(rows) == 7  # 5 + 2 incl. the cross-page duplicate


def test_null_score_defaults_to_zero(spark):
    out = flatten_reddit_listing(read_landed_pages(spark, REDDIT_LISTING_FIXTURE))
    c4 = [r for r in out.collect() if r.comment_id == "c4"][0]
    assert c4.score == 0  # Reddit.py:115 .get('score', 0)


def test_epoch_conversion(spark):
    out = flatten_reddit_listing(read_landed_pages(spark, REDDIT_LISTING_FIXTURE))
    c1 = [r for r in out.collect() if r.comment_id == "c1"][0]
    assert c1.created_utc == dt.datetime(2024, 1, 1, 10, 0, 0)


def test_malformed_payload_yields_nulls_not_errors(spark, tmp_path):
    """PERMISSIVE parsing: a garbage payload line becomes a null row,
    not an exception (Reddit.py:103-107 try/except-skip analog)."""
    p = tmp_path / "bad.json"
    p.write_text('{"kind": "Listing", "data": {"children": [{"data"\nnot json at all\n')
    out = flatten_reddit_listing(read_landed_pages(spark, str(p)))
    assert out.count() == 0  # no children -> no rows, and no crash


def test_registered_query_runs(spark):
    assert queries()["scan_rest_json"](spark, "unused").count() == 7


def test_chan_flatten_semantics(spark):
    """4chan adapter: HTML/entity/quote-marker strip, TEXT timestamp
    kept raw AND parsed typed, empty-string defaults (chan4.py:73-102)."""
    out = {r.postnumber: r for r in queries()["scan_chan_json"](spark, "unused").collect()}
    assert len(out) == 5
    assert out["1001"].comment == "recession incoming & markets down"  # tags+entities+>>quote gone
    assert out["1001"].timestamp_raw == "01/15/24(Mon)10:30:00"
    assert out["1001"].ts == dt.datetime(2024, 1, 15, 10, 30, 0)
    assert out["2001"].comment == "" and out["2001"].name == ""  # empty-string defaults
    assert out["3001"].comment == ""  # missing com -> ''
    assert out["2002"].comment == ">implying nothing happens"  # entity-unescaped > kept


def test_youtube_composite_key_dedup_and_lookback(spark):
    """YouTube adapter: (video_id, comment_id) composite dedup keeps
    the same comment_id under a different video; identical page rows
    collapse; lexical ISO BETWEEN drops out-of-range comments
    (Youtube_final.py:109-114, app.py:152)."""
    rows = queries()["scan_youtube_json"](spark, "unused").collect()
    keys = {(r.video_id, r.comment_id) for r in rows}
    assert keys == {("vidA", "c1"), ("vidA", "c2"), ("vidB", "c1")}  # c1 on vidB survives
    assert all(r.comment_time.startswith("2024") for r in rows)  # 2023 row filtered


def test_chan_catalog_shape(spark):
    """Catalog adapter: Thread columns plus PageNumber TEXT
    (chan4.py:29-39), page propagated to every thread row
    (chan4.py:90-102)."""
    out = queries()["scan_chan_catalog"](spark, "unused")
    assert out.columns == [
        "pagenumber", "postnumber", "timestamp_raw", "ts", "name", "comment", "imagefilename",
    ]
    rows = {r.postnumber: r for r in out.collect()}
    assert len(rows) == 6
    assert rows["1001"].pagenumber == "1" and rows["3002"].pagenumber == "3"
    assert rows["1001"].comment == "recession incoming & markets down"
    assert rows["3001"].ts == dt.datetime(2024, 1, 17, 8, 15, 45)


def test_batched_commit_parallel_writers(spark):
    """Commit-unit semantics without a single-writer funnel: rows
    conserved, >= ceil(rows/5000) files, no file over the 5000-row
    commit unit (Reddit_4chan_Analysis.py:135-137 intent)."""
    row = queries()["sink_batched_commit"](spark, "/root/testdata/sf0.001").collect()[0]
    assert row.files_ok and row.cap_ok
    assert row.n_rows == 1000  # sf0.001 events row count, conserved


def test_schema_evolution_nulls_only_on_v1_rows(spark):
    from social_media_data_pipeline_recession_political_sentiment_spark.registry import queries
    from tests.conftest import SF_SMOKE

    rows = queries()["scan_schema_evolution"](spark, SF_SMOKE).collect()
    e = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    assert sum(r.n_rows for r in rows) == e.count()
    evolved = e.filter("event_id % 2 = 0 AND value IS NOT NULL").count()
    assert sum(r.n_valued for r in rows) == evolved


def test_ntz_bridge_is_session_timezone_independent(spark):
    # the NTZ->TimestampType bridge must interpret the wall clock as
    # UTC no matter what session timezone the (driver's) session
    # carries; to_utc_timestamp/cast coerce through the session zone
    # and would shift the epoch by the zone offset
    from pyspark.sql import functions as F

    from social_media_data_pipeline_recession_political_sentiment_spark.catalog import (
        ntz_as_utc_instant,
    )

    key = "spark.sql.session.timeZone"
    old = spark.conf.get(key)
    try:
        for tz in ("UTC", "America/New_York", "Asia/Tokyo"):
            spark.conf.set(key, tz)
            df = spark.sql(
                "SELECT TIMESTAMP_NTZ '2020-01-01 00:00:00.123456' AS ts"
            )
            got = df.select(
                F.unix_micros(ntz_as_utc_instant("ts")).alias("u")
            ).collect()[0]["u"]
            assert got == 1577836800123456, (tz, got)
    finally:
        spark.conf.set(key, old)


def test_scd1_merge_actions(spark, tmp_path):
    """sink_scd1_merge: update rows overwrite base values, new keys
    insert, untouched keys keep — and the merge round-trips through
    the parquet sink."""
    from social_media_data_pipeline_recession_political_sentiment_spark.sources.sinks import (
        sink_scd1_merge,
    )

    rows = [(k, f"cust{k}", 2, float(k), "SEG") for k in range(1, 15)]
    d = spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    )
    import os
    tmp = str(tmp_path)
    d.coalesce(1).write.parquet(os.path.join(tmp, "customer.parquet"))
    out = {r.c_custkey: r for r in sink_scd1_merge(spark, tmp).collect()}
    # keys 1..14; base excludes %7==0 (7, 14); updates are %3==0 (3,6,9,12)
    assert set(out) == set(range(1, 15)) - {7, 14} | {12}  # 12 in both sets
    assert out[3].action == "update" and out[3].c_acctbal == 103.0
    assert out[3].c_mktsegment == "UPDATED"
    assert out[1].action == "keep" and out[1].c_acctbal == 1.0
    # %3==0 AND %7==0 would be insert; here none (21 > 14) — check 6/9/12
    assert {out[k].action for k in (6, 9, 12)} == {"update"}
    assert out[2].c_mktsegment == "SEG"


def test_sorted_runs_disjoint_and_balanced(spark):
    """sink_sorted_runs: 80 evenly spread keys split into 8 runs of
    10 with strictly disjoint [min, max] ranges, and the sink lands
    as one directory per run (partitionBy layout)."""
    import os
    import tempfile

    from social_media_data_pipeline_recession_political_sentiment_spark.sources.sinks import (
        SORTED_RUNS_K,
        sink_sorted_runs,
    )

    rows = [(i, 1 + i % 40, "O", float(i + 1), None, "1-URGENT") for i in range(80)]
    tmp = tempfile.mkdtemp(prefix="smdp_runs_")
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.parquet(os.path.join(tmp, "orders.parquet"))
    out = sorted(sink_sorted_runs(spark, tmp).collect(), key=lambda r: r.run)
    assert [r.run for r in out] == list(range(SORTED_RUNS_K))
    assert all(r.n_rows == 10 for r in out)
    for lo, hi in zip(out, out[1:]):
        assert lo.max_key < hi.min_key  # zone-map disjointness
    assert out[0].min_key == 1.0 and out[-1].max_key == 80.0


def test_sorted_runs_null_keys_excluded(spark):
    """sink_sorted_runs NULL-key pin (r7 review finding): NULL sort
    keys must be excluded, not crash — Spark's collect_list drops
    NULLs while count(*) counts them, so an unpinned NULL would
    desync the sorted boundary array from n and hit an ANSI
    INVALID_ARRAY_INDEX; the manifest over the non-NULL rows must be
    unaffected by the NULL rows' presence."""
    import os
    import tempfile

    from social_media_data_pipeline_recession_political_sentiment_spark.sources.sinks import (
        SORTED_RUNS_K,
        sink_sorted_runs,
    )

    rows = [(i, 1, "O", float(i + 1), None, "1-URGENT") for i in range(80)]
    rows += [(100 + j, 1, "O", None, None, "1-URGENT") for j in range(5)]
    tmp = tempfile.mkdtemp(prefix="smdp_runsnull_")
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.parquet(os.path.join(tmp, "orders.parquet"))
    out = sorted(sink_sorted_runs(spark, tmp).collect(), key=lambda r: r.run)
    assert [r.run for r in out] == list(range(SORTED_RUNS_K))
    assert sum(r.n_rows for r in out) == 80  # the 5 NULL rows excluded
    assert all(r.n_rows == 10 for r in out)
    for lo, hi in zip(out, out[1:]):
        assert lo.max_key < hi.min_key


def test_snapshot_read_time_travel(spark):
    """sink_snapshot_read: version 1 sees only base-commit rows,
    version 2 sees base + delta, with exact integer cent totals."""
    import os
    import tempfile

    from social_media_data_pipeline_recession_political_sentiment_spark.sources.sinks import (
        sink_snapshot_read,
    )

    rows = [(k, 1, "O", float(k) + 0.25, None, "1-URGENT") for k in range(1, 13)]
    tmp = tempfile.mkdtemp(prefix="smdp_snap_")
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.parquet(os.path.join(tmp, "orders.parquet"))
    out = {r.version: r for r in sink_snapshot_read(spark, tmp).collect()}
    base = [k for k in range(1, 13) if k % 3 != 0]
    assert out[1].n_rows == len(base)
    assert out[1].total_cents == sum(k * 100 + 25 for k in base)
    assert out[2].n_rows == 12
    assert out[2].total_cents == sum(k * 100 + 25 for k in range(1, 13))


def test_dynamic_overwrite_restates_only_target_day(spark):
    """sink_dynamic_overwrite: the earliest day's cents double while
    every other day's totals and row counts survive the overwrite
    untouched."""
    import datetime as dt
    import os
    import tempfile

    from social_media_data_pipeline_recession_political_sentiment_spark.sources.sinks import (
        sink_dynamic_overwrite,
    )

    rows, eid = [], 0
    for day, n in ((0, 3), (1, 2), (2, 4)):
        for i in range(n):
            rows.append((eid, dt.datetime(2021, 3, 1 + day, 10), 1, "a",
                         float(10 * (eid + 1)), "{}"))
            eid += 1
    d = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    tmp = tempfile.mkdtemp(prefix="smdp_dyn_")
    d.coalesce(1).write.parquet(os.path.join(tmp, "events.parquet"))
    out = {r.day_num: r for r in sink_dynamic_overwrite(spark, tmp).collect()}
    day0 = min(out)
    assert out[day0].n_rows == 3
    assert out[day0].total_cents == 2 * (1000 + 2000 + 3000)
    assert out[day0 + 1].total_cents == 4000 + 5000
    assert out[day0 + 2].n_rows == 4
    assert out[day0 + 2].total_cents == 6000 + 7000 + 8000 + 9000


def test_props_schema_census_signatures(spark):
    """fn_props_schema_census: sorted-key signatures with explicit
    <null>/<invalid>/<empty> arms (the probed engine-divergence
    edges) and exact shares."""
    import datetime as dt
    import os
    import tempfile

    from social_media_data_pipeline_recession_political_sentiment_spark.operators.scalar_fns import (
        fn_props_schema_census,
    )

    t0 = dt.datetime(2021, 3, 1)
    props = [
        '{"k": 1}',
        '{"b": 2, "a": 1}',
        None,
        "not json",
        "{}",
        # valid NON-object JSON: Spark's json_object_keys is NULL,
        # DuckDB's json_keys is [] — both must land in '<invalid>'
        "[1, 2]",
        # the collision pair: a key CONTAINING '+' vs two keys —
        # byte-length prefixes keep the signatures distinct
        '{"a+b": 1}',
    ]
    rows = [(i, t0, 1, "a", 1.0, p) for i, p in enumerate(props)]
    d = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    tmp = tempfile.mkdtemp(prefix="smdp_props_")
    d.coalesce(1).write.parquet(os.path.join(tmp, "events.parquet"))
    out = {r.signature: r for r in fn_props_schema_census(spark, tmp).collect()}
    assert set(out) == {
        "1:k",
        "1:a+1:b",
        "<null>",
        "<invalid>",
        "<empty>",
        "3:a+b",
    }
    assert out["<invalid>"].n_events == 2  # 'not json' AND '[1, 2]'
    assert out["1:a+1:b"].n_events == 1 and out["3:a+b"].n_events == 1
    assert out["1:k"].share == round(1 / 7, 6)


def test_minmax_prune_audit_footer_stats_and_probe(spark):
    """sink_minmax_prune_audit: 80 evenly spaced events land 10 per
    run; footer min/max equal the data extrema and exactly the runs
    outside the 25th-50th-percentile probe window read prunable."""
    import datetime as dt
    import os
    import tempfile

    from social_media_data_pipeline_recession_political_sentiment_spark.sources.sinks import (
        PRUNE_RUNS_K,
        sink_minmax_prune_audit,
    )

    assert PRUNE_RUNS_K == 8
    base = dt.datetime(2023, 1, 1)
    rows = [
        (i, base + dt.timedelta(seconds=1000 * i), 1, "post", 1.0, "{}")
        for i in range(80)
    ]
    e = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    tmp = tempfile.mkdtemp(prefix="smdp_prune_")
    e.coalesce(1).write.parquet(os.path.join(tmp, "events.parquet"))
    out = {r.run: r for r in sink_minmax_prune_audit(spark, tmp).collect()}
    assert set(out) == set(range(8))
    us = [int(base.replace(tzinfo=dt.timezone.utc).timestamp()) * 10**6
          + 1000 * i * 10**6 for i in range(80)]
    gmin, gmax = us[0], us[-1]
    lo, hi = gmin + (gmax - gmin) // 4, gmin + (gmax - gmin) // 2
    for i, u in enumerate(us):
        run = (u - gmin) * 8 // (gmax - gmin + 1)
        r = out[run]
        assert r.min_us <= u <= r.max_us
    for r in out.values():
        assert r.n_rows == 10
        assert r.prunable == (r.max_us < lo or r.min_us > hi)
    assert sum(1 for r in out.values() if r.prunable) == 6
