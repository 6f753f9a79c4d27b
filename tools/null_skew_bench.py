"""Skew evidence for the null-bypass join (`join_null_skew_split`).

PLANS.md shows the split plan SHAPE; this tool shows the WIN on data
where it matters: a fact table whose join key is NULL on a large
share of rows (guest checkouts / anonymous events), LEFT-joined to a
per-key dim with AQE's skew split and broadcast DISABLED — the
both-sides-big regime where every NULL hashes to ONE reducer in the
naive plan while the split never shuffles them at all. Appends a
"Null-skew evidence" appendix to BASELINE.md. Usage:

    python tools/null_skew_bench.py [n_rows]
"""

from __future__ import annotations

import sys
import time

REPO = "/root/repo"
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from social_media_data_pipeline_recession_political_sentiment_spark.session import (  # noqa: E402
    get_session,
)

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
N_KEYS = 100_000
NULL_SHARE = 0.4  # 40% of fact rows carry no key
RUNS = 3


def build_fact(spark):
    u = F.pmod(F.xxhash64("id"), F.lit(1_000_000)) / 1_000_000.0
    return spark.range(N_ROWS).select(
        F.col("id").alias("event_id"),
        F.when(u < NULL_SHARE, F.lit(None).cast("long"))
        .otherwise(F.pmod(F.xxhash64("id", F.lit(7)), F.lit(N_KEYS)))
        .alias("key"),
        (F.pmod(F.xxhash64("id", F.lit(13)), F.lit(10_000)) / 100.0).alias(
            "value"
        ),
    )


def check_agg(df):
    return df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.coalesce(F.col("key_max"), F.lit(0.0)) + F.col("value")).alias(
            "s"
        ),
    )


def naive_join(fact, dim):
    return check_agg(fact.join(dim.hint("shuffle_hash"), ["key"], "left"))


def split_join(fact, dim):
    nulls = fact.filter(F.col("key").isNull()).withColumn(
        "key_max", F.lit(None).cast("double")
    )
    matched = fact.filter(F.col("key").isNotNull()).join(
        dim.hint("shuffle_hash"), ["key"], "left"
    )
    return check_agg(matched.unionByName(nulls.select(*matched.columns)))


def main() -> None:
    spark = get_session("null_skew_bench")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    fact = build_fact(spark).localCheckpoint(eager=True)
    dim = (
        fact.filter(F.col("key").isNotNull())
        .groupBy("key")
        .agg(F.max("value").alias("key_max"))
        .localCheckpoint(eager=True)
    )

    results, checks = {}, {}
    for name, fn in (("naive", naive_join), ("split", split_join)):
        best = None
        for _ in range(RUNS):
            t0 = time.perf_counter()
            row = fn(fact, dim).collect()[0]
            best = min(best or 1e9, time.perf_counter() - t0)
        results[name] = best
        checks[name] = (row["n"], round(row["s"], 3))
    assert checks["naive"] == checks["split"], checks

    ratio = results["naive"] / results["split"]
    stamp = time.strftime("%Y-%m-%d")
    section = [
        "",
        "## Null-skew evidence (r6 appendix)",
        "",
        f"`tools/null_skew_bench.py` ({stamp}): {N_ROWS:,}-row fact with",
        f"{int(NULL_SHARE * 100)}% NULL join keys, LEFT-joined to a {N_KEYS:,}-key dim",
        "with AQE skew-split and broadcast DISABLED (both-sides-big regime).",
        f"Best of {RUNS}, local[32]; identical (count, checksum) on both variants:",
        "",
        "| variant | wall (s) | vs split |",
        "|---|---|---|",
        f"| naive left join (nulls shuffle to one reducer) | {results['naive']:.2f} | {ratio:.2f}× |",
        f"| null-bypass split (`join_null_skew_split` device) | {results['split']:.2f} | 1.00× |",
        "",
        "SQL NULL keys never match, but hashpartitioning still sends every",
        "one of them to the same reducer; the split's null branch is",
        "map-side only, so the win grows with the null share and with",
        "corpus size — at 100 TB the naive plan's null reducer is a",
        "straggler measured in hours.",
    ]
    with open(f"{REPO}/BASELINE.md", "a") as f:
        f.write("\n".join(section) + "\n")
    print(
        f"naive {results['naive']:.2f}s vs split {results['split']:.2f}s "
        f"({ratio:.2f}x); appendix appended to BASELINE.md"
    )


if __name__ == "__main__":
    main()
