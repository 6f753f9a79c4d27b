"""Source-scan multiplicity regression locks (the r6 single-scan
sweep, BASELINE.md "Round-6 single-scan sweep").

Spark does not deduplicate common DataFrame subplans: a frame feeding
k plan branches re-scans its source (and re-runs its derivation) k
times. These tests pin the post-sweep scan counts of the sweep's
poster-child queries so a refactor that drops a `compute_once` seam
— or adds a new branch without one — fails HERE instead of silently
re-billing the corpus at 100 TB. Counts come from the same formatted-
plan parse as `tools/scan_count_audit.py`; plans only, nothing
executes.
"""

from __future__ import annotations

import contextlib
import io
import re
from collections import Counter

import pytest

from social_media_data_pipeline_recession_political_sentiment_spark.registry import (
    queries,
)

SF_SMOKE = "/root/testdata/sf0.001"

_LOC = re.compile(r"Location: \w+ \[[^\]]*?([\w.]+\.(?:parquet|csv|json))")


def _scan_counts(df) -> Counter:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    tables: Counter = Counter()
    for block in re.split(r"\n\(\d+\) ", buf.getvalue()):
        # ExistingRDD = a compute_once read, not a source re-scan
        if block.startswith("Scan ") and not block.startswith(
            "Scan ExistingRDD"
        ):
            m = _LOC.search(block)
            tables[m.group(1) if m else "<unknown>"] += 1
    return tables


# (query, table, max file scans of that table the plan may contain).
# The bound is the count the sweep achieved; 2 = a documented
# two-pass shape (stats pass + apply pass, or probe + corpus side).
CASES = [
    ("ext_dsir_resample", "documents.parquet", 2),  # was 18 pre-sweep
    ("ext_tfidf_cosine_pairs", "documents.parquet", 2),  # was 18
    ("ext_dedup_weighted_jaccard", "documents.parquet", 2),  # was 10
    ("ext_graph_degree_census", "documents.parquet", 2),  # was 9
    ("ext_mm_dedup_phash", "documents.parquet", 2),  # was 8
    ("agg_funnel_steps", "events.parquet", 3),  # was 6; one per step
    ("agg_seasonality_strength", "events.parquet", 1),  # was 6
    ("agg_dist_drift_probe", "events.parquet", 2),  # was 6
    ("ext_token_entropy_rate", "documents.parquet", 2),  # was 6
    ("ext_bm25_topk", "documents.parquet", 2),  # was 4
    ("agg_cusum_changepoint", "events.parquet", 1),  # was 3
    ("join_bloom_pruned", "orders.parquet", 1),  # was 3; one fact pass
    ("join_bloom_pruned", "customer.parquet", 1),  # was 4
]


@pytest.mark.parametrize("name,table,max_scans", CASES)
def test_scan_multiplicity_bounded(spark, name, table, max_scans):
    counts = _scan_counts(queries()[name](spark, SF_SMOKE))
    assert counts[table] <= max_scans, (
        f"{name} scans {table} {counts[table]}x (bound {max_scans}): "
        f"a shared frame lost its compute_once pin, or a new branch "
        f"needs one (see tools/scan_count_audit.py)"
    )


def test_compute_once_is_value_transparent(spark):
    """compute_once must be a pure plan device: same rows, any
    partitioning."""
    from social_media_data_pipeline_recession_political_sentiment_spark.catalog import (
        compute_once,
    )

    df = (
        spark.range(0, 1000, 1, 7)
        .selectExpr("id", "id % 13 AS k")
        .groupBy("k")
        .count()
    )
    pinned = compute_once(df)
    assert sorted(pinned.collect()) == sorted(df.collect())
    # and both downstream branches of the SAME pin agree with the
    # unpinned equivalents
    total = pinned.groupBy().sum("count").collect()[0][0]
    assert total == 1000
