"""Table catalog over the driver-generated parquet testdata.

Maps the reference's Postgres tables (SURVEY §1.1) onto columnar
parquet DataFrames. ``load`` is the single scan entry point so every
query benefits from parquet column pruning + predicate pushdown
(Catalyst handles both once the plan is declarative).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one testdata table (columnar parquet scan; SURVEY §2.1
    `scan_table`, reference `Data Analysis/Reddit_4chan_Analysis.py:106-113`).

    Timestamp normalization (the "one choke point" of session.py's
    docstring): driver testdata has shipped ts columns in two parquet
    encodings across rounds — TIMESTAMP(NANOS) (unreadable by Spark's
    vectorized reader; arrives as a long of nanos under
    spark.sql.legacy.parquet.nanosAsLong=true) and plain
    timestamp[us] without timezone (read as TIMESTAMP_NTZ since
    Spark's parquet reader infers NTZ for non-UTC-adjusted
    timestamps). Both are normalized to TimestampType here so every
    operator downstream sees ONE timestamp type. The NTZ bridge is
    `make_timestamp(..., 'UTC')` over the NTZ wall-clock components —
    the components are session-tz-independent by definition and the
    explicit 'UTC' zone argument pins the interpretation, so the
    resulting epoch equals DuckDB's `epoch_us` on the same naive
    column REGARDLESS of the session timezone.
    (`to_utc_timestamp(ntz, 'UTC')` and a plain cast both coerce NTZ
    through the SESSION zone first — verified empirically under an
    America/New_York session — and would shift every epoch on a
    non-UTC driver session.)"""
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        # legacy nanos encoding: long of nanos -> micros TimestampType
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    for f in df.schema.fields:
        if isinstance(f.dataType, T.TimestampNTZType):
            df = df.withColumn(f.name, ntz_as_utc_instant(f.name))
    return df


def compute_once(df: DataFrame) -> DataFrame:
    """Compute-once seam for a derived frame feeding MULTIPLE plan
    branches (`localCheckpoint(eager=False)`): Spark does not
    deduplicate common DataFrame subplans, so a frame referenced by k
    branches re-scans its source and re-runs its derivation k times —
    invisible at sf0.1, a k× corpus-read-and-tokenize bill at 100 TB
    (found by `tools/scan_count_audit.py`, r6: 37 queries scanned a
    big table ≥3×). The checkpoint pins the frame to one concrete
    RDD (MEMORY_AND_DISK, spills cleanly); every branch then reads
    the materialized partitions.

    Use it on SLIM frames only — a per-doc fingerprint/weight table,
    a tokenized/shingled relation about the size of the text it
    came from, a calendar- or vocab-bounded aggregate — where one
    materialization is cheaper than k scans PLUS k re-derivations
    (tokenize/regex/hash CPU dominates the re-scan at scale). Do NOT
    use it for the two-pass scalar-stats pattern (stats scan +
    apply scan is the standard, correct shape — a global-stats
    window would funnel the corpus into one task), and never on a
    raw wide-text frame (materializing 100 TB to save a columnar
    re-scan is a loss).

    eager=False keeps the registry contract lazy (queries() builds
    plans without executing); the first action materializes, and
    concurrent stages at worst duplicate the first computation.

    Operational caveats (r6 sweep review — stated, not hidden):
    localCheckpoint CUTS LINEAGE, so a pinned partition lost to an
    executor failure cannot be recomputed — the JOB fails (never a
    wrong answer) and must be retried; Spark documents it as unsafe
    under dynamic allocation. And pinned blocks live until the
    Python frame is GC'd and the ContextCleaner runs, so a long
    one-session sweep over many queries (bench.py, the verify gate)
    accumulates dead blocks on executor disk nondeterministically.
    A production deployment trades these off explicitly: reliable
    `checkpoint()` into a checkpoint dir (fault-tolerant, pays HDFS
    writes), or `persist()` + explicit `unpersist()` lifecycle
    (keeps lineage, needs cache management the harness's
    build-return-collect contract has no hook for). The seam exists
    so that swap is ONE line."""
    return df.localCheckpoint(eager=False)


def ntz_as_utc_instant(col: str):
    """TIMESTAMP_NTZ -> TimestampType with the wall clock interpreted
    as UTC, independent of `spark.sql.session.timeZone` (see `load`)."""
    return F.expr(
        f"make_timestamp(year({col}), month({col}), day({col}), "
        f"hour({col}), minute({col}), "
        f"cast(extract(second from {col}) as decimal(16,6)), 'UTC')"
    )


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
