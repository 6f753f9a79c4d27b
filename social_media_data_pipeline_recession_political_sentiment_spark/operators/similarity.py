"""Similarity search over embedding vectors (SURVEY §2.10 EXT:
`ext_sim_topk`, `join_similarity_topk`, embedding-cosine near-dup).

Scale design:
- Brute-force cosine is the *correctness baseline*: the (small) query
  side is broadcast, so the big side streams through a map-only stage
  — O(Q*N) work, zero shuffle of the corpus, embarrassingly parallel.
  This is exactly how a 1000-executor batch scorer should run when Q
  is small.
- The scale path is LSH bucketing (`ext_sim_lsh`): random-hyperplane
  bucketing via Spark ML's BucketedRandomProjectionLSH turns the
  cross product into bucket-local joins. Approximate => rows-only
  driver check + recall-vs-brute-force assertion in
  tests/test_similarity.py.
- All vector math is `zip_with`/`aggregate` higher-order expressions
  on array<double> — JVM-side, no Python, and (verified) bit-exact
  against the DuckDB oracle's list_dot_product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register

TOP_K = 10
N_QUERY_VECS = 5  # vec_id < 5 are the query set
COS_DUP_THRESHOLD = 0.4

_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), cast(0.0 as double), (acc, v) -> acc + v)"


def _cosine(a: str, b: str):
    dot = F.expr(_DOT.format(a=a, b=b))
    na = F.sqrt(F.expr(_DOT.format(a=a, b=a)))
    nb = F.sqrt(F.expr(_DOT.format(a=b, b=b)))
    return dot / (na * nb)


def _with_double_vec(df: DataFrame, out: str) -> DataFrame:
    return df.withColumn(out, F.col("embedding").cast("array<double>"))


_COS_SQL = (
    "list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) / "
    "(sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[]))) * "
    "sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))))"
)


@register(
    "ext_sim_topk",
    oracle=(
        f"WITH c AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, {_COS_SQL} AS cos "
        f"FROM embeddings a JOIN embeddings b ON b.vec_id != a.vec_id "
        f"WHERE a.vec_id < {N_QUERY_VECS}) "
        "SELECT query_id, neighbor_id, cos, rank FROM ("
        "  SELECT query_id, neighbor_id, cos, row_number() OVER ("
        "    PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank FROM c) "
        f"WHERE rank <= {TOP_K}"
    ),
)
def ext_sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: broadcast the query vectors, stream
    the corpus through a map-only scoring stage, then a per-query
    window top-k (SURVEY §2.3 `join_similarity_topk`). Deterministic
    tiebreak on neighbor_id."""
    e = load(spark, sf_dir, "embeddings")
    q = _with_double_vec(e.filter(F.col("vec_id") < N_QUERY_VECS), "qv").select(
        F.col("vec_id").alias("query_id"), "qv"
    )
    c = _with_double_vec(e, "cv").select(F.col("vec_id").alias("neighbor_id"), "cv")
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", _cosine("qv", "cv").alias("cos"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


@register(
    "ext_dedup_embcos",
    oracle=(
        f"SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, {_COS_SQL} AS cos "
        "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
        f"WHERE {_COS_SQL} >= {COS_DUP_THRESHOLD}"
    ),
)
def ext_dedup_embcos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos >= threshold) — the
    semantic-dedup primitive for training corpora. Exact all-pairs
    form; at corpus scale, run it bucket-local after `ext_sim_lsh`
    bucketing instead of as a cross join."""
    e = load(spark, sf_dir, "embeddings")
    a = _with_double_vec(e, "va").select(F.col("vec_id").alias("vec_a"), "va")
    b = _with_double_vec(e, "vb").select(F.col("vec_id").alias("vec_b"), "vb")
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", _cosine("va", "vb").alias("cos"))
        .filter(F.col("cos") >= COS_DUP_THRESHOLD)
    )


@register("ext_sim_lsh")  # approximate => rows-only; recall asserted in pytest
def ext_sim_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale path for similarity: random-hyperplane bucketing with
    Spark ML's BucketedRandomProjectionLSH (seeded => deterministic),
    then an approximate distance join inside buckets. Returns
    candidate pairs with euclidean distance; recall vs brute force is
    asserted in tests/test_similarity.py."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", array_to_vector(F.col("embedding").cast("array<double>")).alias("features")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=0.5,
        numHashTables=4,
        seed=42,
    )
    model = lsh.fit(e)
    joined = model.approxSimilarityJoin(e, e, threshold=1.2, distCol="dist")
    return (
        joined.select(
            F.col("datasetA.vec_id").alias("vec_a"),
            F.col("datasetB.vec_id").alias("vec_b"),
            F.round(F.col("dist"), 6).alias("dist"),
        )
        .filter(F.col("vec_a") < F.col("vec_b"))
        .orderBy("vec_a", "vec_b")
    )
