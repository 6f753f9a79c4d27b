"""REST-JSON source adapter (SURVEY §2.1 `scan_rest_json`, §2.2
`project_flatten_json`).

The reference polls REST APIs and flattens the JSON in Python loops
(`Data Collection/Reddit.py:48-50,101-123` Reddit listing pages;
`chan4.py:40-55,73-85`; `Youtube_final.py:15-24,67-76`). The engine
boundary here: HTTP fetching stays OUTSIDE the engine (a thin fetcher
lands raw payloads into a bronze directory); everything after the
landing is declarative Spark — `spark.read.json` with an explicit
nested schema, `explode` of the children array, field projection,
typed timestamp conversion.

A deterministic landed-payload fixture (resources/reddit_listing.json,
two Listing pages incl. a duplicate comment and a null score) stands
in for live API output; the same code reads any bronze dir at scale
(schema-on-read, no inference: inference would scan 100 TB twice).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import register

_RESOURCES = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "resources")
REDDIT_LISTING_FIXTURE = os.path.join(_RESOURCES, "reddit_listing.json")

# Explicit nested schema of a Reddit listing page (ref: the dict paths
# walked at Reddit.py:108-118: data.children[].data.{subreddit,link_id,
# body,score,created_utc,id}).
REDDIT_LISTING_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField(
            "data",
            T.StructType(
                [
                    T.StructField("after", T.StringType()),
                    T.StructField(
                        "children",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField("kind", T.StringType()),
                                    T.StructField(
                                        "data",
                                        T.StructType(
                                            [
                                                T.StructField("subreddit", T.StringType()),
                                                T.StructField("link_id", T.StringType()),
                                                T.StructField("body", T.StringType()),
                                                T.StructField("score", T.LongType()),
                                                T.StructField("created_utc", T.LongType()),
                                                T.StructField("id", T.StringType()),
                                            ]
                                        ),
                                    ),
                                ]
                            )
                        ),
                    ),
                ]
            ),
        ),
    ]
)


def flatten_reddit_listing(pages: DataFrame) -> DataFrame:
    """Nested listing pages → flat comment rows, the typed version of
    the reference's dict-walking loop (`Reddit.py:108-119`): explode
    children, project fields, default null score to 0
    (`Reddit.py:115` ``.get('score', 0)``), epoch → timestamp
    (`Reddit.py:81`)."""
    return (
        pages.select(F.explode(F.col("data.children")).alias("c"))
        .select(
            F.col("c.data.subreddit").alias("subreddit"),
            F.col("c.data.link_id").alias("post_id"),
            F.col("c.data.body").alias("body"),
            F.coalesce(F.col("c.data.score"), F.lit(0)).alias("score"),
            F.timestamp_seconds(F.col("c.data.created_utc")).alias("created_utc"),
            F.col("c.data.id").alias("comment_id"),
        )
    )


def read_landed_pages(spark: SparkSession, path: str) -> DataFrame:
    """Batch read of landed JSON payloads with the explicit schema
    (PERMISSIVE: malformed payload rows become nulls — the engine
    analog of the reference's try/except-skip, `Reddit.py:103-107`)."""
    return spark.read.schema(REDDIT_LISTING_SCHEMA).json(path)


@register(
    "scan_rest_json",
    oracle=(
        "WITH pages AS (SELECT unnest(data.children) AS c "
        f"FROM read_json('{REDDIT_LISTING_FIXTURE}', format='newline_delimited', "
        "columns={'kind': 'VARCHAR', 'data': 'STRUCT(after VARCHAR, children "
        "STRUCT(kind VARCHAR, data STRUCT(subreddit VARCHAR, link_id VARCHAR, "
        "body VARCHAR, score BIGINT, created_utc BIGINT, id VARCHAR))[])'}) ) "
        "SELECT c.data.subreddit AS subreddit, c.data.link_id AS post_id, "
        "c.data.body AS body, coalesce(c.data.score, 0) AS score, "
        "to_timestamp(c.data.created_utc) AS created_utc, c.data.id AS comment_id "
        "FROM pages"
    ),
)
def scan_rest_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Landed REST payloads → flat typed comment rows (the full §3.1
    ingest IR path minus the network). Fixture includes a duplicate
    comment across pages (dedup happens downstream, §2.9) and a null
    score (defaulted to 0)."""
    return flatten_reddit_listing(read_landed_pages(spark, REDDIT_LISTING_FIXTURE))
