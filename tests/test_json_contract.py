"""JSON-edge cross-engine parity pins (r7 json divergence sweep).

The engines' native JSON extraction disagrees on the payloads real
producers ship — DuckDB hard-errors on malformed JSON and ROUNDS
'1.5' to 2 under (TRY_)CAST, Spark's typed map parse nulls the WHOLE
map on any sibling's coercion failure — so the props-reading family
follows the shared integral-token contract in
functions/json_contract.py. This test pins the Spark device and the
DuckDB twin to identical values on every probed edge case.
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, "/root/repo/tools")

from degen_sweep import _JSON_EDGE_PROPS  # noqa: E402

from social_media_data_pipeline_recession_political_sentiment_spark.functions.json_contract import (  # noqa: E402
    json_int_field,
    json_int_field_sql,
    json_n_keys,
    json_n_keys_sql,
)


def test_json_contract_devices_match_across_engines(spark):
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(_JSON_EDGE_PROPS)],
        "i int, props string",
    )
    got = {
        r["i"]: (r["kv"], r["nk"])
        for r in df.select(
            "i",
            json_int_field("props").alias("kv"),
            json_n_keys("props").alias("nk"),
        ).collect()
    }
    con = duckdb.connect()
    try:
        for i, c in enumerate(_JSON_EDGE_PROPS):
            # bind the payload ONCE via a CTE: the builders reference
            # their argument several times (and the regex itself
            # contains '?'), so positional substitution is fragile
            sql = (
                "WITH s(props) AS (SELECT ?) "
                f"SELECT {json_int_field_sql('props')}, "
                f"{json_n_keys_sql('props')} FROM s"
            )
            dk, dn = con.execute(sql, [c]).fetchone()
            assert got[i] == (dk, dn), f"json contract drift on {c!r}"
    finally:
        con.close()


def test_known_engine_divergences_still_exist():
    """The facts that motivated the contract — if an engine converges,
    the contract could be simplified."""
    con = duckdb.connect()
    try:
        # DuckDB TRY_CAST rounds non-integral numeric strings
        assert con.execute("SELECT TRY_CAST('1.5' AS BIGINT)").fetchone()[0] == 2
        # DuckDB json functions hard-error on malformed input
        try:
            con.execute("SELECT json_extract_string('not json', '$.k')")
            raised = False
        except Exception:
            raised = True
        assert raised, "DuckDB no longer errors on malformed JSON"
    finally:
        con.close()
