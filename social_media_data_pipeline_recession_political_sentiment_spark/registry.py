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
# Round 4 window (VERDICT r3 item 1): the 26 queries that have NEVER
# been inside any round's window (added mid-r3 after the r3 window
# froze, list from VERDICT r3 §2 "untested"), then the two mm stubs
# whose oracle HUGEINT casts were fixed this round, the TEN queries
# NEW in r4 (three falsifiable contracts for the approximate paths,
# LSS components, LM score, sequence packing, incremental dedup,
# RANGE-frame window, interval-overlap join, grouping sets),
# join_similarity_topk (oldest hard check, r1), and r2-green
# relational-core queries (oldest remaining checks) to fill the 50.
# Last hard check per query: see VERDICT.md r3 coverage tables.
_WINDOW_PRIORITY = (
    # -- 26 never driver-checked (VERDICT r3 "untested") --
    "scan_schema_evolution",
    "join_star_schema",
    "join_salted_skew",
    "join_semi_exists",
    "join_multihop_topk",
    "agg_rollup",
    "agg_hourly_heatmap",
    "agg_pivot_matrix",
    "agg_unpivot_long",
    "window_lag_delta",
    "agg_running_total",
    "fn_unicode_nfc",
    "udaf_value_range",
    "stream_join_static",
    "ext_dedup_embcos_lsh",  # rows-only by design; verify twin below
    "ext_dedup_cluster_pick",
    "ext_dedup_components",
    "ext_dedup_pipeline",
    "ext_contamination_check",
    "ext_emb_norm",
    "ext_text_repetition",
    "ext_quality_gate",
    "ext_tfidf_topterms",
    "ext_url_domains",
    "ext_sample_per_group",
    "ext_shard_manifest",
    # -- oracle fixed this round (r3 FAIL: DuckDB HUGEINT vs BIGINT) --
    "ext_mm_decode_stub",
    "ext_mm_frame_sample",
    # -- new this round: hash-checkable contract for the approx path --
    "ext_dedup_embcos_lsh_verify",
    # -- new this round: large-star/small-star CC (high-diameter path) --
    "ext_dedup_components_lss",
    # -- new this round: IVF probe-all exactness contract --
    "ext_sim_ivf_exhaustive",
    # -- new this round: CCNet-style unigram LM quality score --
    "ext_lm_unigram_score",
    # -- new this round: next-fit sequence packing --
    "ext_pack_sequences",
    # -- new this round: cross-corpus incremental dedup --
    "ext_dedup_incremental",
    # -- new this round: RANGE-interval moving window frame --
    "window_moving_range",
    # -- new this round: LSH precision (zero-violations) contract --
    "ext_sim_lsh_verify",
    # -- new this round: binned interval-overlap join --
    "join_interval_overlap",
    # -- new this round: explicit grouping-sets subtotals --
    "agg_grouping_sets",
    # -- new this round: mixture sampling + n-gram census --
    "ext_sample_mixture",
    "ext_ngram_census",
    # -- oldest hard check (r1) --
    "join_similarity_topk",
    # -- oldest r2-green (relational core), fills the window to 50 --
    "scan_csv",
    "scan_table",
    "project_flatten_json",
    "project_columns",
    "filter_time_range",
    "filter_between",
    "filter_recency",
    "filter_cast_date",
    "filter_nonempty",
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
