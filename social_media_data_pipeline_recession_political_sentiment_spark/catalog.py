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
    `scan_table`, reference `Data Analysis/Reddit_4chan_Analysis.py:106-113`)."""
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    # events.ts is parquet TIMESTAMP(NANOS); with
    # spark.sql.legacy.parquet.nanosAsLong=true it arrives as a long of
    # nanos — normalize to TimestampType (micros, truncating like the
    # DuckDB oracle does).
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
