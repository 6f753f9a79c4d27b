"""Query + oracle registry backing the driver contract.

Every implemented operator from SURVEY.md §2 registers here as
``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) the
equivalent ANSI SQL the DuckDB oracle runs on the same parquet
tables. Column names/aliases MUST match between the two sides —
the driver's compare hashes values after sorting columns by name.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

_OPERATOR_MODULES = (
    "operators.relational",
    "operators.scalar_fns",
    "operators.dedup",
    "operators.similarity",
    "operators.text_analysis",
    "operators.multimodal",
    "enrich.sentiment",
    "enrich.hatespeech",
    "sources.rest_json",
    "sources.sinks",
    "streaming.queries",
    "streaming.ingest",
    "plans.pipeline",
    "dashboard",
)


def register(name: str, oracle: Optional[str] = None):
    """Decorator: register a query function and (optionally) its DuckDB
    oracle SQL. ``oracle=None`` => driver records a rows-only check
    (reserved for genuinely non-SQL-expressible ops)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# The driver's CORRECTNESS report hard-checks only the FIRST 50 queries
# in registration order. Queries named here are emitted first (in this
# order) by queries()/oracles(); everything else follows in registration
# order. Round 3 front-loads the set that has never been inside the
# driver's window (VERDICT r2 item 1) plus everything new/rewritten this
# round; the relational/scalar core (green in r1+r2) rotates to the back.
# After r3 every oracle-bearing query has had a hard driver check in
# some round (only ext_dedup_embcos_lsh — rows-only by design — hasn't).
# ROTATION RULE for future rounds: front-load (1) anything added or
# rewritten since the last round, (2) the queries whose last hard check
# is oldest; tests/test_registry.py locks the list against typos.
# Added mid-r3 AFTER the window froze (=> front-load these in r4):
# join_star_schema, ext_text_repetition, agg_rollup, window_lag_delta,
# ext_tfidf_topterms, ext_quality_gate, ext_dedup_cluster_pick,
# join_salted_skew, ext_url_domains, stream_join_static, fn_unicode_nfc,
# ext_emb_norm, ext_dedup_components, ext_sample_per_group,
# agg_hourly_heatmap, join_semi_exists, agg_running_total, udaf_value_range,
# ext_dedup_pipeline, join_multihop_topk, agg_pivot_matrix, agg_unpivot_long,
# scan_schema_evolution, ext_shard_manifest, ext_contamination_check.
_WINDOW_PRIORITY = (
    # never driver-checked, oracle-bearing (VERDICT r2 "untested")
    "fn_lang_detect",
    "ext_text_quality",
    "fn_text_stats",
    "ext_token_count",
    "ext_fingerprint",
    "ext_props_map",
    "ext_corpus_curation",
    "ext_pii_redact",
    "ext_data_split",
    "ext_mm_metadata",
    "ext_mm_decode_stub",
    "ext_mm_frame_sample",
    "ext_mm_resize_stub",
    "udf_vader_sentiment",
    "udf_hatespeech_api",
    "enrich_table",
    "scan_chan_json",
    "scan_chan_catalog",
    "scan_youtube_json",
    "scan_rest_json",
    "sink_insert",
    "sink_create_table",
    "sink_batched_commit",
    "stream_tumbling_count",
    "stream_dedup",
    "stream_lookback_window",
    "stream_stateful_count",
    "stream_sessionize",
    "stream_rate_limit",
    "stream_microbatch",
    "orchestration_dag",
    "maintenance_vacuum",
    "cache_memo",
    # all 13 dashboard routes (9 newly registered this round)
    "dash_count_reddit",
    "dash_count_chan",
    "dash_count_youtube",
    "dash_count_politics",
    "dash_politics_comments",
    "dash_sentiment_reddit",
    "dash_sentiment_chan",
    "dash_sentiment_youtube",
    "dash_sentiment_politics",
    "dash_hate_reddit",
    "dash_hate_chan",
    "dash_hate_youtube",
    "dash_hate_politics",
    "dash_daily_politics",
    # rewritten this round / only r1-checked (join_similarity_topk is
    # r1-green and unchanged, so it cedes its slot and rotates next round)
    "ext_dedup_embcos",
    "ext_sim_ivf",
    "ext_sim_lsh",
)


def _window_order(d: dict) -> dict:
    front = {k: d[k] for k in _WINDOW_PRIORITY if k in d}
    rest = {k: v for k, v in d.items() if k not in front}
    return {**front, **rest}


_loaded = False


def load_all() -> None:
    """Import every operator module so registrations run."""
    global _loaded
    if _loaded:
        return
    pkg = __name__.rsplit(".", 1)[0]
    for mod in _OPERATOR_MODULES:
        importlib.import_module(f"{pkg}.{mod}")
    _loaded = True


def queries() -> dict[str, QueryFn]:
    load_all()
    return _window_order(QUERIES)


def oracles() -> dict[str, str]:
    load_all()
    return _window_order(ORACLES)
