"""Portable JSON field-extraction contract (r7 json-edge sweep).

The engines' native JSON extraction disagrees on exactly the payloads
real producers ship (all probed, r7):

- malformed JSON: Spark's `from_json` reads NULL (PERMISSIVE) while
  DuckDB's `json_extract_string` is a HARD ERROR — an unguarded
  oracle dies on the first truncated payload;
- non-integral numbers: `CAST('1.5' AS BIGINT)` ROUNDS to 2 in DuckDB
  (TRY_CAST too) while Spark's typed parse / try_cast reads NULL;
- typed parses null differently: Spark `from_json(map<string,bigint>)`
  nulls the WHOLE map when ANY value fails coercion, so a sibling
  key's type error silently erases `k`.

The portable contract pinned here: a field reads as BIGINT iff the
payload is well-formed JSON and the QUOTE-STRIPPED field token is an
integral literal (`^-?[0-9]+$`) in BIGINT range — JSON number 7 and
numeric string "7" both count (both engines quote-strip identically),
1.5 / true / nested / 1e999 / overflow all read NULL, malformed
payloads read NULL. Key lookup is case-sensitive and first-wins on
duplicate keys (verified identical on both engines). The top-level
key count reads NULL for malformed or non-object payloads and counts
DUPLICATE keys (both engines' key extraction keeps them).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# \z, not $: Java's $ matches BEFORE a final line terminator while
# RE2's matches only at end of text, so a '7\n' token would read 7 on
# Spark and NULL on DuckDB — \z means end-of-text in BOTH dialects
# (r7 review finding; the trailing-newline payloads are planted in
# the sweep fixture). The _SPARK variant doubles the backslash for
# the Spark SQL string literal; DuckDB string literals take it raw.
JSON_INT_RE = "^-?[0-9]+\\z"
_JSON_INT_RE_SPARK = JSON_INT_RE.replace("\\", "\\\\")


def json_int_field(props_expr: str, key: str = "k") -> Column:
    """Spark side: integral-token field extraction per the module
    contract. ``props_expr`` is a SQL expression (usually a column
    name) evaluating to the JSON string."""
    return F.expr(
        f"try_cast(nullif(regexp_extract(element_at("
        f"from_json({props_expr}, 'map<string,string>'), '{key}'), "
        f"'{_JSON_INT_RE_SPARK}', 0), '') AS BIGINT)"
    )


def json_int_field_sql(props_expr: str, key: str = "k") -> str:
    """DuckDB twin of `json_int_field` — substitute into oracle SQL."""
    ex = f"json_extract_string({props_expr}, '$.{key}')"
    return (
        f"CASE WHEN json_valid({props_expr}) "
        f"AND regexp_matches({ex}, '{JSON_INT_RE}') "
        f"THEN TRY_CAST({ex} AS BIGINT) END"
    )


def json_n_keys(props_expr: str) -> Column:
    """Spark side: top-level key count (duplicates included), NULL for
    malformed or non-object payloads. Spark's map parse reads NULL on
    both malformed AND valid-non-object input, so size(NULL) = NULL
    lands both in the NULL arm without an explicit type check."""
    return F.expr(
        f"size(map_keys(from_json({props_expr}, 'map<string,string>')))"
    ).cast("long")


def json_n_keys_sql(props_expr: str) -> str:
    """DuckDB twin of `json_n_keys`: DuckDB parses valid non-object
    JSON (json_keys('[1,2]') = []) and ERRORS on malformed, so both
    cases need the explicit guard to read NULL like Spark."""
    return (
        f"CASE WHEN json_valid({props_expr}) "
        f"AND json_type({props_expr}) = 'OBJECT' "
        f"THEN CAST(len(json_keys({props_expr})) AS BIGINT) END"
    )
