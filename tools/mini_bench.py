"""Time a SUBSET of registry queries with bench.py's exact methodology
(same session factory, warm-up, two passes, min per query) — for
before/after comparisons during an optimization round without paying
the full-registry wall clock.

Usage:
    SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
        python tools/mini_bench.py query [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from social_media_data_pipeline_recession_political_sentiment_spark import registry  # noqa: E402
from social_media_data_pipeline_recession_political_sentiment_spark.session import (  # noqa: E402
    get_session,
)


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or (os.cpu_count() or 8)
    spark = get_session("smdp_mini_bench", cpus=cpus)
    qs = registry.queries()
    qs["agg_topk_groups"](spark, sf_dir).collect()  # warm-up
    timings: dict[str, float] = {}
    for _ in range(2):
        for name in sorted(names):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).collect()
            dt = round(time.perf_counter() - t0, 3)
            timings[name] = min(timings.get(name, dt), dt)
    print(json.dumps({"queries": dict(sorted(timings.items())),
                      "total": round(sum(timings.values()), 3)}))


if __name__ == "__main__":
    main()
