"""Report every query's latest hard driver check (the rotation ledger).

Reads every CORRECTNESS_r*.json, records the newest round in which
each registered query got a hard (hash/schema/rows) result, and
prints the stalest tags first — the input to the next round's
`_WINDOW_PRIORITY` rotation (registry.py). Queries never checked
print as `NEVER`. Usage:

    python tools/staleness.py [--all]
"""

from __future__ import annotations

import glob
import json
import re
import sys

REPO = "/root/repo"
sys.path.insert(0, REPO)

from social_media_data_pipeline_recession_political_sentiment_spark.registry import (  # noqa: E402
    queries,
)


def main() -> int:
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(f"{REPO}/CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", path).group(1))
        for name, rec in json.load(open(path)).items():
            # a record counts as a hard check even when rows-only
            # (err == no_oracle) — it is still the latest driver look
            if isinstance(rec, dict):
                latest[name] = max(latest.get(name, 0), rnd)
    registered = list(queries())
    rows = sorted(
        ((latest.get(n, 0), n) for n in registered), key=lambda t: (t[0], t[1])
    )
    show = rows if "--all" in sys.argv else rows[:60]
    for rnd, name in show:
        tag = f"r{rnd}" if rnd else "NEVER"
        print(f"{tag:>6}  {name}")
    n_never = sum(1 for r, _ in rows if r == 0)
    print(
        f"\n{len(registered)} registered; {n_never} never driver-checked; "
        f"stalest checked tag: r{min((r for r, _ in rows if r), default=0)}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
