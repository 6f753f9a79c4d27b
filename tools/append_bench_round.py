"""Append a round's bench observations to BASELINE.md WITHOUT touching
the frozen baseline column.

Usage (after `python bench.py` has refreshed BENCH_FULL.json):

    python tools/append_bench_round.py r3

Adds one `rN (sec)` column from BENCH_FULL.json. Queries benched for
the first time get a NEW row whose frozen value is this round's number
(the only case where a current bench enters the frozen column).
"""

from __future__ import annotations

import json
import re
import sys

BASELINE = "/root/repo/BASELINE.md"
BENCH = "/root/repo/BENCH_FULL.json"


def main() -> int:
    round_tag = sys.argv[1] if len(sys.argv) > 1 else None
    if not round_tag or not re.fullmatch(r"r\d+", round_tag):
        print("usage: append_bench_round.py rN")
        return 1
    bench = json.load(open(BENCH))["queries"]

    # BENCH_FULL must cover the ENTIRE registry — a thin bench file
    # would silently thin every future BASELINE.md column
    sys.path.insert(0, "/root/repo")
    from social_media_data_pipeline_recession_political_sentiment_spark.registry import (
        queries as _registry_queries,
    )

    registered = set(_registry_queries())
    missing = registered - set(bench)
    if missing:
        print(
            f"BENCH_FULL.json is missing {len(missing)} registered queries "
            f"(rerun bench.py): {sorted(missing)[:10]}..."
        )
        return 1

    lines = open(BASELINE).read().splitlines()
    hdr_i = next(i for i, l in enumerate(lines) if l.startswith("| query ID"))
    header = [c.strip() for c in lines[hdr_i].strip("|").split("|")]
    if f"{round_tag} (sec)" in header:
        print(f"{round_tag} column already present; refusing to overwrite")
        return 1

    rows: dict[str, list[str]] = {}
    order: list[str] = []
    end_i = hdr_i + 2
    for i in range(hdr_i + 2, len(lines)):
        l = lines[i]
        if not l.startswith("| `"):
            end_i = i
            break
        cells = [c.strip() for c in l.strip("|").split("|")]
        name = cells[0].strip("`")
        rows[name] = cells
        order.append(name)
        end_i = i + 1

    ncols = len(header)
    for name in order:
        v = bench.get(name)
        rows[name].append(f"{v}" if v is not None else "—")
    for name in sorted(set(bench) - set(rows)):  # first-benched this round
        rows[name] = [f"`{name}`", f"{bench[name]}", round_tag] + ["—"] * (ncols - 3) + [f"{bench[name]}"]
        order.append(name)
    order.sort()

    # BASELINE.md must now cover the ENTIRE registry too — a query
    # registered but missing a frozen row would silently escape ratio
    # tracking forever (the r4 ext_sample_mixture/ext_ngram_census gap)
    missing_rows = registered - set(order)
    if missing_rows:
        print(
            f"BASELINE.md still missing {len(missing_rows)} registered "
            f"queries after append: {sorted(missing_rows)[:10]}..."
        )
        return 1

    def _tot(col: int) -> float:
        return sum(float(rows[n][col]) for n in order if rows[n][col] not in ("—", ""))

    header.append(f"{round_tag} (sec)")
    out = lines[:hdr_i]
    out.append("| " + " | ".join(header) + " |")
    out.append("|" + "---|" * len(header))
    for name in order:
        out.append("| " + " | ".join(rows[name]) + " |")
    totals = [f"**total ({len(order)} queries)**", f"**{_tot(1):.3f}**", "—"] + [
        f"**{_tot(c):.3f}**" for c in range(3, len(header))
    ]
    out.append("| " + " | ".join(totals) + " |")
    # preserve anything after the table (notes, later sections) — the
    # old totals row itself is regenerated above
    tail_i = end_i
    if tail_i < len(lines) and lines[tail_i].startswith("| **total"):
        tail_i += 1
    out.extend(lines[tail_i:])
    open(BASELINE, "w").write("\n".join(out) + "\n")
    print(f"appended {round_tag}: {len(bench)} benched, {len(order)} total rows")
    return 0


if __name__ == "__main__":
    sys.exit(main())
