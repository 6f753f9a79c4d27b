"""Fast oracle-SQL sanity: parse/plan EVERY registered oracle in
DuckDB (EXPLAIN, no execution, no Spark) against the sf0.001 views.

Catches dialect typos, missing aliases, and unregistered table
references in ~seconds — the cheap pre-flight before the full
`tools/verify_local.py` gate. A query whose oracle fails here would
fail the driver's CORRECTNESS check before Spark even runs. Usage:

    python tools/oracle_lint.py [sf_dir]
"""

from __future__ import annotations

import sys

REPO = "/root/repo"
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

from social_media_data_pipeline_recession_political_sentiment_spark.catalog import (  # noqa: E402
    TABLES,
)
from social_media_data_pipeline_recession_political_sentiment_spark.registry import (  # noqa: E402
    oracles,
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    bad = []
    os_ = oracles()
    for name, sql in os_.items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as e:  # noqa: BLE001 - report every failure kind
            bad.append((name, str(e).splitlines()[0]))
    for name, err in bad:
        print(f"FAIL  {name}: {err}")
    print(f"{len(os_) - len(bad)} ok, {len(bad)} fail ({len(os_)} oracles)")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
