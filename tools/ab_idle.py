"""Idle-box A/B timing harness for bench watch items (r11 verdict
item 4): run a suspect query and a control query ALTERNATING for N
reps on one warm session at the canonical bench SF, and print
per-rep wall clocks plus min/median/max. If the suspect's spread is
wide while the control's is tight, the offender is the query's plan;
if both spread together, it's host load — re-freeze with this log as
the repro per the r11 re-freeze discipline.

Usage:
    python tools/ab_idle.py <suspect> [control] [reps] [sf_dir]

Defaults: control=agg_topk_groups, reps=10,
sf_dir=$SPARK_GRAFT_SF_DIR or /root/testdata/sf0.1.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from social_media_data_pipeline_recession_political_sentiment_spark import (  # noqa: E402
    registry,
)
from social_media_data_pipeline_recession_political_sentiment_spark.session import (  # noqa: E402
    get_session,
)


def main() -> None:
    suspect = sys.argv[1] if len(sys.argv) > 1 else "ext_pack_sequences"
    control = sys.argv[2] if len(sys.argv) > 2 else "agg_topk_groups"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    sf_dir = (
        sys.argv[4]
        if len(sys.argv) > 4
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or (os.cpu_count() or 8)
    spark = get_session("smdp_ab", cpus=cpus)
    qs = registry.queries()
    # warm both (JVM, codegen, parquet footers) before any timed rep
    qs[suspect](spark, sf_dir).collect()
    qs[control](spark, sf_dir).collect()

    times: dict[str, list[float]] = {suspect: [], control: []}
    for i in range(reps):
        for name in (suspect, control):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).collect()
            times[name].append(round(time.perf_counter() - t0, 3))
        print(
            f"rep {i + 1:2d}: {suspect}={times[suspect][-1]:.3f}s "
            f"{control}={times[control][-1]:.3f}s",
            flush=True,
        )
    for name, ts in times.items():
        print(
            f"{name}: min={min(ts):.3f} median={statistics.median(ts):.3f} "
            f"max={max(ts):.3f} spread={max(ts) / max(min(ts), 1e-9):.2f}x"
        )


if __name__ == "__main__":
    main()
