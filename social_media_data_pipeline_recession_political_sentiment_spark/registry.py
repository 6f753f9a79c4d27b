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
    return dict(QUERIES)


def oracles() -> dict[str, str]:
    load_all()
    return dict(ORACLES)
