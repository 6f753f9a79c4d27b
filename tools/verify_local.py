"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and the
matching ``oracle_sql()`` in DuckDB over the same parquet tables,
comparing row count, sorted column names, and an order-insensitive
value hash. Usage:

    python tools/verify_local.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime as dt
import hashlib
import math
import os
import sys
import time

REPO = "/root/repo"
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from social_media_data_pipeline_recession_political_sentiment_spark.catalog import (  # noqa: E402
    TABLES,
)
from social_media_data_pipeline_recession_political_sentiment_spark.session import (  # noqa: E402
    get_session,
)


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, dt.datetime):
        s = v.strftime("%Y-%m-%d %H:%M:%S.%f")
        # encode the offset so TIMESTAMPTZ values can never silently
        # collide with naive timestamps (the driver treats them apart)
        if v.tzinfo is not None:
            s += f"@{v.utcoffset()}"
        return s
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def _type_family(t: str) -> str:
    """Coarse type family for Spark dtype / DuckDB type strings, so a
    TIMESTAMPTZ-vs-TIMESTAMP (or string-vs-int) oracle mismatch fails
    locally the way it fails the driver's schema check."""
    t = str(t).lower()
    if "time zone" in t or t == "timestamptz":
        return "timestamptz"
    if t.startswith("timestamp"):
        return "timestamp"
    if t.endswith("[]") or t.startswith(("array", "list")):
        return "list"
    if t.startswith("struct"):
        return "struct"
    if t.startswith("map"):
        return "map"
    if t in ("blob", "binary", "bytea"):
        return "binary"
    if t.startswith(("decimal", "numeric")):
        return "decimal"
    if t.startswith("interval"):
        return "interval"
    if t in ("double", "float", "real", "float4", "float8"):
        return "float"
    if "int" in t:  # tinyint/smallint/int/bigint/hugeint/u*
        return "int"
    if t in ("varchar", "string", "text", "char"):
        return "string"
    if t.startswith("bool"):
        return "bool"
    if t == "date":
        return "date"
    return t


def _hash_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(_norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\x02")
    return h.hexdigest()[:16]


def _run_spark(spark, fn, sf_dir):
    sdf = fn(spark, sf_dir)
    return sdf.columns, dict(sdf.dtypes), [tuple(r) for r in sdf.collect()]


def compare_query(
    spark, con, fn, oracle_sql: str, sf_dir: str,
    samples: int = 0, _spark_result=None,
) -> list[str]:
    """Run one query on Spark and its oracle on an open DuckDB
    connection (tables already registered as views) and return the
    list of problems — [] means rowcount + schema family + value hash
    all agree. This is THE comparison (main() calls it too, per the
    r8 ADVICE de-duplication, so the pytest divergence pins and the
    driver replica can never drift apart). ``samples`` appends up to
    that many side-by-side sorted rows on a value-hash mismatch;
    ``_spark_result`` lets main() pre-run the Spark side to attribute
    spark-vs-oracle errors separately."""
    scols, stypes, srows = (
        _spark_result if _spark_result is not None
        else _run_spark(spark, fn, sf_dir)
    )
    res = con.sql(oracle_sql)
    ocols = list(res.columns)
    otypes = dict(zip(ocols, (str(t) for t in res.types)))
    orows = res.fetchall()
    problems = []
    if len(srows) != len(orows):
        problems.append(f"rowcount spark={len(srows)} duckdb={len(orows)}")
    if sorted(scols) != sorted(ocols):
        problems.append(f"cols spark={sorted(scols)} duckdb={sorted(ocols)}")
    else:
        for c in sorted(scols):
            fs, fo = _type_family(stypes[c]), _type_family(otypes[c])
            if fs != fo:
                problems.append(
                    f"type[{c}] spark={stypes[c]}({fs}) duckdb={otypes[c]}({fo})"
                )
    if not problems:
        hs, ho = _hash_rows(scols, srows), _hash_rows(ocols, orows)
        if hs != ho:
            problems.append(f"value-hash spark={hs} duckdb={ho}")
            if samples:
                pairs = zip(
                    sorted(map(repr, srows))[:samples],
                    sorted(map(repr, orows))[:samples],
                )
                for s, o in pairs:
                    problems.append(f"  s={s}\n  o={o}")
    return problems


DUCKDB_PINNED = "1.0.0"  # requirements-oracle.txt — fold-order contract


def check_duckdb_pin() -> None:
    """Warn LOUDLY when the installed duckdb differs from the pinned
    oracle version: the bit-equality assumptions documented at
    similarity._lsh_pairs_oracle (sequential-fold list_dot_product)
    are installed-version properties, so a drifted version makes any
    hash mismatch a triage-the-upgrade event, not an engine bug."""
    if duckdb.__version__ != DUCKDB_PINNED:
        print(
            f"WARNING: duckdb {duckdb.__version__} != pinned "
            f"{DUCKDB_PINNED} (requirements-oracle.txt) — fold-order "
            "bit-equality is certified against the pin; treat any "
            "hash mismatch below as a version-drift triage first.",
            flush=True,
        )


def main():
    args = [a for a in sys.argv[1:]]
    sf_dir = "/root/testdata/sf0.01"
    if args and args[0].startswith("/"):
        sf_dir = args.pop(0)
    only = set(args)

    check_duckdb_pin()
    con = duckdb.connect()
    # SMDP_VERIFY_TZ=<zone>: run BOTH engines with a non-UTC DEFAULT
    # timezone (JVM user.timezone for Spark, SET TimeZone for DuckDB)
    # while the Python comparison layer stays in the host zone. The
    # whole oracle contract is tz-naive UTC (session.py pins
    # spark.sql.session.timeZone=UTC; parquet carries naive
    # timestamp[us]; oracles use naive TIMESTAMP) so engine defaults
    # must be unobservable — this flag PROVES it gate-wide. The
    # Python py4j collect path is deliberately NOT moved off UTC
    # here: PySpark's TimestampType.fromInternal renders through the
    # PYTHON process's local zone, and at a DST fall-back fold two
    # distinct instants share one local wallclock — a lossy
    # REPRESENTATION seam of the collection API, not an engine
    # divergence (the engine's epoch microseconds stay exact;
    # pinned by tests/test_registry.py's TZ tests).
    verify_tz = os.environ.get("SMDP_VERIFY_TZ")
    if verify_tz:
        con.sql(f"SET TimeZone = '{verify_tz}'")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    if os.environ.get("SMDP_VERIFY_VANILLA"):
        # simulate the driver: a session built WITHOUT engine confs;
        # the contract must self-configure via apply_engine_confs
        from pyspark.sql import SparkSession

        b = SparkSession.builder.master("local[8]").appName("verify_vanilla")
        if verify_tz:
            b = b.config(
                "spark.driver.extraJavaOptions",
                f"-Duser.timezone={verify_tz}",
            ).config(
                "spark.executor.extraJavaOptions",
                f"-Duser.timezone={verify_tz}",
            )
        spark = b.getOrCreate()
    else:
        spark = get_session(
            "verify_local",
            extra_confs=(
                {
                    "spark.driver.extraJavaOptions":
                        f"-Duser.timezone={verify_tz}",
                    "spark.executor.extraJavaOptions":
                        f"-Duser.timezone={verify_tz}",
                }
                if verify_tz
                else None
            ),
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    n_pass = n_fail = n_rows_only = 0
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sres = _run_spark(spark, fn, sf_dir)
        except Exception as e:
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        srows = sres[2]
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows (rows-only, no oracle) [{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            problems = compare_query(
                spark, con, fn, oracles[name], sf_dir,
                samples=3, _spark_result=sres,
            )
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_rows_only} rows-only, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
