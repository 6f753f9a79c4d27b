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
# order.
# ROTATION RULE: front-load (1) anything added or rewritten since the
# last round, (2) the queries whose last hard check is oldest;
# tests/test_registry.py locks the list against typos.
# Round 8 window (VERDICT r7 item 1): the SECOND and FINAL backlog
# burn-down window — all 47 still-never-driver-sampled queries (the
# session-3/4/5 tail) + the first 3 r3 source/sink scans
# (scan_rest_json, scan_chan_json, scan_chan_catalog) = exactly 50.
# After this window the never-sampled backlog is 47 -> 0; every
# registered query will then hold at least one hard driver check.
# Head = the four r8-touched queries per the rotation rule
# ("rewritten since last round" outranks all): join_bloom_pruned
# (fp_rate nullif guard, r8 empty-orders sweep), and the three
# consumers of the shared _pq_sql quantile device which grew its
# n=0 CASE guard (agg_quantile_sketch_audit, agg_mad_robust,
# agg_trend_theil_sen). sink_sorted_runs was also touched (read-back
# schema pin) but holds a GREEN r7 hard check and the change is
# vanilla-verified hash-identical, so per the r6 sweep precedent it
# does not re-consume a slot.
# Round 9 window (VERDICT r8 item 1, the staleness burn): head = the
# three operators ADDED this round (ext_dedup_substr_spans /
# ext_dedup_pipeline_recall / scan_schema_drift_audit — "added or
# rewritten since last round" outranks all), then EVERY query whose
# latest hard driver check is r3 (37: the remaining 4 r3 scans, the
# 14 dash_* routes, the streaming family, orchestration/vacuum/memo,
# the fingerprint/props/text-quality/token-count trios, and the
# rows-only ext_sim_lsh / ext_sim_ivf / ext_mm_resize_stub), then the
# first 10 r4-checked tags in registration order = exactly 50. After
# this window the oldest evidence tier is r4 (39 remaining r4 tags —
# r10's natural head, plus whatever r10 adds or rewrites).
# Session 2 added three more operators (ext_readability_flesch /
# ext_code_detect / ext_domain_cap) which outrank the tail per the
# rotation rule, so only the first 7 r4 tags keep window slots
# (filter_cast_date / filter_nonempty / join_star_schema join the
# r10 head alongside the other r4 tags). Session 2 batch B
# (ext_lm_kn_continuation / agg_burstiness_fano / agg_lorenz_deciles)
# takes three more tail slots (filter_time_range / filter_between /
# filter_recency -> r10 head), leaving 4 r4 tags in-window; batch C
# (ext_ttr_mattr / agg_sessions_bounce / sink_minmax_prune_audit)
# takes three more (scan_csv / project_columns / project_flatten_json
# -> r10 head), leaving scan_table as the one r4 tag in-window.
# Batch D adds ext_sample_temperature / ext_emb_pq_codebook, and the
# int8-family FINITE_AMAX_SQL rewrite re-windows its two cheapest
# standing representatives (ext_emb_quantize / ext_sim_topk_int8 —
# the other five family members hold r7/r8 checks and the change is
# verified value-neutral on real data); scan_table and the three
# rows-only/mm r3 tags yield (scan_table + ext_sim_lsh + ext_sim_ivf
# + ext_mm_resize_stub -> r10 head; the two rows-only miners carry
# no hash check either way and their _verify twins are in-window
# history). Batch E (agg_diff_in_diff / agg_dow_entropy /
# ext_emb_topk_pq) takes the last three r3 text-trio tail slots
# (ext_token_count / fn_text_stats / ext_mm_metadata -> r10 head
# with the other displaced r3/r4 tags). Batch F
# (ext_char_ngram_profile / agg_tail_hill) displaces
# ext_props_map / ext_text_quality the same way; ext_fingerprint
# keeps the last r3 slot.
_WINDOW_PRIORITY = (
    # -- added this round (session 2 adds at the very head) --
    "ext_readability_flesch",
    "ext_code_detect",
    "ext_domain_cap",
    "ext_lm_kn_continuation",
    "agg_burstiness_fano",
    "agg_lorenz_deciles",
    "ext_ttr_mattr",
    "agg_sessions_bounce",
    "sink_minmax_prune_audit",
    "ext_sample_temperature",
    "ext_emb_pq_codebook",
    "agg_diff_in_diff",
    "agg_dow_entropy",
    "ext_emb_topk_pq",
    "ext_char_ngram_profile",
    "agg_tail_hill",
    # -- rewritten this round: the int8 family's FINITE_AMAX_SQL
    #    contract (r9 nonfinite oracle-gate finding) --
    "ext_emb_quantize",
    "ext_sim_topk_int8",
    # -- added this round (session 1) --
    "ext_dedup_substr_spans",
    "ext_dedup_pipeline_recall",
    "scan_schema_drift_audit",
    # -- r3 evidence tier: scans --
    "scan_youtube_json",
    "sink_insert",
    "sink_create_table",
    "sink_batched_commit",
    # -- r3: dashboard routes --
    "dash_politics_comments",
    "dash_count_reddit",
    "dash_count_chan",
    "dash_count_youtube",
    "dash_count_politics",
    "dash_sentiment_reddit",
    "dash_sentiment_chan",
    "dash_sentiment_youtube",
    "dash_sentiment_politics",
    "dash_hate_reddit",
    "dash_hate_chan",
    "dash_hate_youtube",
    "dash_hate_politics",
    "dash_daily_politics",
    # -- r3: streaming family + plans --
    "stream_tumbling_count",
    "stream_dedup",
    "stream_lookback_window",
    "stream_sessionize",
    "stream_rate_limit",
    "stream_microbatch",
    "stream_stateful_count",
    "orchestration_dag",
    "maintenance_vacuum",
    "cache_memo",
    # -- r3: text/props/mm trios + rows-only miners --
    "ext_fingerprint",
    # -- r4 backfill, registration order --
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
