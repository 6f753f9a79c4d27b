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
# r9 head (staleness burn, in this order): the remaining 4 r3 scans
# (scan_youtube_json, sink_insert, sink_create_table,
# sink_batched_commit), the 14 dash_* routes, then the leftover r3
# tags by age — the streaming family (stream_tumbling_count,
# stream_dedup, stream_lookback_window, stream_sessionize,
# stream_rate_limit, stream_microbatch, stream_stateful_count),
# orchestration_dag / maintenance_vacuum / cache_memo, the
# fingerprint/props/text-quality/token-count trios, ext_sim_lsh,
# ext_sim_ivf, ext_mm_resize_stub — ~32 named slots; the balance of
# the 50 backfills the next-oldest (r4) tags. That 6-round staleness
# is the documented price of the r6 backlog (every one is green in
# every session's local gate, so the exposure is evidence freshness,
# not correctness risk).
_WINDOW_PRIORITY = (
    # -- touched this round: nullif/_pq_sql-n=0 guards (head per
    #    the rotation rule) --
    "join_bloom_pruned",
    "agg_quantile_sketch_audit",
    "agg_mad_robust",
    "agg_trend_theil_sen",
    # -- the session-3/4/5 never-driver-sampled tail, registration
    #    order --
    "agg_dp_noisy_counts",
    "ext_ngram_novelty",
    "ext_dedup_edit_distance",
    "ext_cluster_diversity",
    "agg_concurrency_peak",
    "agg_markov_entropy",
    "agg_occupancy_hours",
    "agg_daily_autocorr",
    "agg_value_log_histogram",
    "agg_survival_curve",
    "agg_user_type_venn",
    "agg_funnel_time_to_convert",
    "agg_seasonality_strength",
    "agg_wilson_bound",
    "agg_dist_drift_probe",
    "agg_ab_test_sizing",
    "agg_cusum_changepoint",
    "fn_props_schema_census",
    "ext_emb_anisotropy",
    "ext_emb_matryoshka_recall",
    "ext_emb_jl_audit",
    "ext_triplet_margin_audit",
    "ext_hybrid_rank_fusion",
    "ext_tfidf_cosine_pairs",
    "ext_length_bucket_batching",
    "ext_epoch_shuffle_plan",
    "agg_heavy_hitters_mg",
    "ext_vocab_coverage_curve",
    "ext_char_entropy",
    "ext_hapax_audit",
    "ext_prefix_templates",
    "ext_chunk_cdc",
    "ext_quality_ablation",
    "ext_token_entropy_rate",
    "ext_lm_bigram_score",
    "ext_keywords_textrank",
    "ext_bpe_learn_steps",
    "ext_bpe_apply",
    "ext_pii_census",
    "ext_mm_tile_plan",
    "sink_scd1_merge",
    "sink_snapshot_read",
    "sink_dynamic_overwrite",
    # -- first 3 r3 source/sink scans (oldest evidence tier) --
    "scan_rest_json",
    "scan_chan_json",
    "scan_chan_catalog",
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
