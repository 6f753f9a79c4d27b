"""Degenerate-input crash sweep: run every registered query against a
deliberately pathological fixture and report CRASHES (exceptions), not
value differences.

The fixture plants the degeneracies that real 100 TB corpora contain
but the random testdata never produces, so ANSI-mode crash classes
(DIVIDE_BY_ZERO on zero variance / zero norms / empty slices,
INVALID_ARRAY_INDEX on desynced arrays, CAST_INVALID_INPUT on
malformed keys) surface here instead of in production:

- documents: every doc the SAME text (uniform term counts => the
  frequency-of-frequencies curve has zero variance), plus an
  empty-text doc and a single-token doc; one lang, one source with a
  name OUTSIDE the 'srcN' scheme
- events: one user, ALL events at one timestamp (zero gaps, zero
  variance, every row inside any head-slice split), NULL values/props
- embeddings: all-zero vectors (zero L2 norm => cosine undefined)
  plus identical unit vectors; a single label

r7 findings (all fixed, vanilla-verified hash-identical at
sf0.001+sf0.01 — the guards are value-neutral on non-degenerate
data): ext_zipf_fit (zero ff variance), the _cosine device behind
ext_sim_topk / join_similarity_topk / ext_sim_ivf_exhaustive /
ext_sim_ivf_recall / ext_emb_matryoshka_recall (zero-norm vectors),
ext_gopher_repetition (empty doc), agg_dist_drift_probe (empty
slice b), ext_dedup_cross_source (malformed source name).

Usage:  python tools/degen_sweep.py [query ...]
        python tools/degen_sweep.py --empty [query ...]
        python tools/degen_sweep.py --nulls [query ...]
--empty swaps the fixture for ZERO-ROW documents/events/embeddings
(the "my filter matched nothing" case that is routine at 100 TB —
every date-range or partition predicate can come back empty). r7
findings in that class (also fixed + verified value-neutral):
agg_funnel_steps / ext_chunk_cdc (conversion-and-ratio divisions by
zero entry counts) and sink_partitioned_prune /
sink_dynamic_overwrite (read-back schema inference over a data-less
_SUCCESS-only sink dir — fixed with explicit read schemas).
--nulls riddles every nullable corpus column with NULLs (NULL text /
lang / source / n_chars, NULL ts / user_id / event_type / value /
props, NULL embedding / label — failed encodes and partial ingests
look exactly like this). r7 findings in that class (fixed +
NULL-fixture oracle-verified AND real-data hash-identical): the
numpy seams behind 12 similarity queries np.stack'd None embeddings
— pinned as "no vector, no similarity op" with matching
embedding-IS-NOT-NULL oracle predicates on the ranking family;
ext_shard_manifest NULL text = ZERO tokens both engines (NaN
otherwise poisons the offset cumsum and the driver shard-total
loop); ext_mm_resize_stub excludes NULL-payload/dimension rows on
both engines. KNOWN accepted red on this fixture:
ext_sim_ivf_recall's meets_floor honestly reads false on a 4-vector
corpus (the measured recall floor needs a minimum corpus; slots
still hash-match) — an approximation property, not an engine
divergence.
Exit code = number of crashing queries.
"""

from __future__ import annotations

import datetime as dt
import os
import shutil
import sys

REPO = "/root/repo"
sys.path.insert(0, REPO)

FIXTURE = "/tmp/smdp_degen"
SRC_SF = "/root/testdata/sf0.001"


def build_fixture(empty: bool = False, nulls: bool = False) -> str:
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    shutil.rmtree(FIXTURE, ignore_errors=True)
    os.makedirs(FIXTURE)
    for f in glob.glob(f"{SRC_SF}/*.parquet"):
        name = os.path.basename(f)
        if name.split(".")[0] in ("documents", "events", "embeddings"):
            continue
        (shutil.copytree if os.path.isdir(f) else shutil.copy)(
            f, os.path.join(FIXTURE, name)
        )

    if nulls:
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
                    "text": pa.array(
                        [None, "alpha beta", None, "alpha beta gamma", "x", None],
                        pa.string(),
                    ),
                    "lang": pa.array([None, "en", "en", None, "de", None], pa.string()),
                    "source": pa.array(
                        ["src1", None, "src2", "src1", None, None], pa.string()
                    ),
                    "n_chars": pa.array([None, 10, None, 16, 1, None], pa.int64()),
                }
            ),
            os.path.join(FIXTURE, "documents.parquet"),
        )
        t0 = dt.datetime(2024, 1, 1)
        day = dt.timedelta(days=1)
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array(list(range(1, 11)), pa.int64()),
                    "ts": pa.array(
                        [t0, None, t0 + day, None, t0 + 2 * day,
                         t0, None, t0 + day / 2, t0, None],
                        pa.timestamp("us"),
                    ),
                    "user_id": pa.array(
                        [1, 2, None, 4, None, 1, 2, None, 3, 4], pa.int64()
                    ),
                    "event_type": pa.array(
                        ["view", None, "click", "view", None,
                         "purchase", "view", None, "click", "view"],
                        pa.string(),
                    ),
                    "value": pa.array(
                        [1.0, None, 2.5, None, 3.0, 1.0, None, 2.0, None, 4.5],
                        pa.float64(),
                    ),
                    "props": pa.array(
                        ['{"k":1}', None, "not json", None, '{"k":2}',
                         None, "{", '{"k":3}', None, None],
                        pa.string(),
                    ),
                }
            ),
            os.path.join(FIXTURE, "events.parquet"),
        )
        dim = 64
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(list(range(1, 7)), pa.int64()),
                    "embedding": pa.array(
                        [[1.0] + [0.0] * (dim - 1), None, [0.5] * dim,
                         None, [0.1] * dim, [0.2] * dim],
                        pa.list_(pa.float32()),
                    ),
                    "label": pa.array([0, None, 1, 0, None, 1], pa.int32()),
                }
            ),
            os.path.join(FIXTURE, "embeddings.parquet"),
        )
        return FIXTURE

    if empty:
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "text": pa.array([], pa.string()),
                    "lang": pa.array([], pa.string()),
                    "source": pa.array([], pa.string()),
                    "n_chars": pa.array([], pa.int64()),
                }
            ),
            os.path.join(FIXTURE, "documents.parquet"),
        )
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "ts": pa.array([], pa.timestamp("us")),
                    "user_id": pa.array([], pa.int64()),
                    "event_type": pa.array([], pa.string()),
                    "value": pa.array([], pa.float64()),
                    "props": pa.array([], pa.string()),
                }
            ),
            os.path.join(FIXTURE, "events.parquet"),
        )
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "embedding": pa.array([], pa.list_(pa.float32())),
                    "label": pa.array([], pa.int32()),
                }
            ),
            os.path.join(FIXTURE, "embeddings.parquet"),
        )
        return FIXTURE

    docs = {
        "doc_id": [1, 2, 3, 4, 5],
        "text": ["alpha beta alpha beta"] * 3 + ["", "solo"],
        "lang": ["en"] * 5,
        "source": ["s0"] * 5,  # outside the srcN priority scheme
        "n_chars": [21, 21, 21, 0, 4],
    }
    pq.write_table(
        pa.table(
            docs,
            schema=pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("text", pa.string()),
                    ("lang", pa.string()),
                    ("source", pa.string()),
                    ("n_chars", pa.int64()),
                ]
            ),
        ),
        os.path.join(FIXTURE, "documents.parquet"),
    )

    t0 = dt.datetime(2024, 1, 1)
    ev = {
        "event_id": list(range(1, 9)),
        "ts": [t0] * 8,
        "user_id": [7] * 8,
        "event_type": ["view"] * 8,
        "value": [1.0] * 6 + [None, None],
        "props": ['{"k":1}'] * 4 + [None] * 4,
    }
    pq.write_table(
        pa.table(
            ev,
            schema=pa.schema(
                [
                    ("event_id", pa.int64()),
                    ("ts", pa.timestamp("us")),
                    ("user_id", pa.int64()),
                    ("event_type", pa.string()),
                    ("value", pa.float64()),
                    ("props", pa.string()),
                ]
            ),
        ),
        os.path.join(FIXTURE, "events.parquet"),
    )

    dim = len(
        pq.read_table(f"{SRC_SF}/embeddings.parquet").column("embedding")[0]
    )
    vecs = [[0.0] * dim] * 3 + [[1.0] + [0.0] * (dim - 1)] * 3
    emb = {
        "vec_id": list(range(1, 7)),
        "embedding": [[float(x) for x in v] for v in vecs],
        "label": [0] * 6,
    }
    pq.write_table(
        pa.table(
            emb,
            schema=pa.schema(
                [
                    ("vec_id", pa.int64()),
                    ("embedding", pa.list_(pa.float32())),
                    ("label", pa.int32()),
                ]
            ),
        ),
        os.path.join(FIXTURE, "embeddings.parquet"),
    )
    return FIXTURE


def main() -> int:
    from social_media_data_pipeline_recession_political_sentiment_spark import (
        registry,
    )
    from social_media_data_pipeline_recession_political_sentiment_spark.session import (
        get_session,
    )

    args = sys.argv[1:]
    empty = "--empty" in args
    nulls = "--nulls" in args
    args = [a for a in args if a not in ("--empty", "--nulls")]
    build_fixture(empty=empty, nulls=nulls)
    spark = get_session("smdp_degen", cpus=8)
    qs = registry.queries()
    names = args or list(qs)
    crashes = {}
    for name in names:
        try:
            qs[name](spark, FIXTURE).collect()
        except Exception as exc:  # noqa: BLE001 - sweep reports, not raises
            first = str(exc).splitlines()
            crashes[name] = first[0][:200] if first else type(exc).__name__
            print(f"CRASH {name}: {crashes[name]}", flush=True)
    kind = (
        "EMPTY corpus tables"
        if empty
        else "NULL-riddled tables" if nulls else "degenerate input"
    )
    print(f"\n{len(crashes)} of {len(names)} queries crash on {kind}")
    return len(crashes)


if __name__ == "__main__":
    raise SystemExit(main())
