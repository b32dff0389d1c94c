"""Similarity search over embedding columns (array<float>).

Two paths:
  - brute-force cosine top-k: exact; the query side is small (broadcast),
    the corpus side streams — correct baseline at any corpus size as long
    as |queries| is bounded.
  - random-hyperplane LSH buckets: the scale path — hyperplane weights
    are md5-derived (deterministic), signatures are computed map-only,
    and neighbor search joins on the bucket signature instead of
    crossing the corpus.

Dot products use higher-order functions (zip_with + aggregate) — JVM
whole-stage codegen, no Python.  Norms are precomputed per vector so the
pairwise stage multiplies scalars only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def with_norm(df: DataFrame, vec_col: str, out_col: str = "norm") -> DataFrame:
    """Attach the L2 norm of a vector column (one map-only pass)."""
    v = _as_double(F.col(vec_col))
    sq = F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)
    return df.withColumn(out_col, F.sqrt(sq))


def dot(a, b):
    """Sequential-fold dot product of two array<double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    round_digits: int = 6,
) -> DataFrame:
    """Exact brute-force cosine top-k neighbors for each query vector.

    Output: (q_id, neighbor_id, cos_sim), k rows per query, ordered by
    (rounded cosine desc, neighbor_id asc) for determinism.  The query
    side is broadcast; the corpus is scanned once — O(|Q| x |corpus|)
    scalar work but no shuffle of the corpus.
    """
    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("__cv"),
        F.col("norm").alias("__cn"),
    )
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("q_id"),
        _as_double(F.col(vec_col)).alias("__qv"),
        F.col("norm").alias("__qn"),
    )
    pairs = c.join(broadcast(q), F.col("q_id") != F.col("neighbor_id"))
    scored = pairs.withColumn(
        "cos_sim",
        F.round(dot(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn")),
                round_digits),
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "neighbor_id", "cos_sim")
    )


def hyperplane_signature(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 8,
    out_col: str = "bucket",
) -> DataFrame:
    """Random-hyperplane LSH signature (deterministic).

    Plane p's weight for dimension d is derived from md5(p:d), mapped to
    [-1, 1); the signature bit is sign(w . v).  Map-only — the 100 TB
    scale path buckets the corpus without any shuffle, then ANN search
    joins query buckets to corpus buckets.
    """
    v = _as_double(F.col(vec_col))
    bits = []
    for p in range(planes):
        proj = F.aggregate(
            F.zip_with(
                v,
                F.sequence(F.lit(0), F.size(v) - 1),
                lambda x, d: x
                * (
                    (
                        F.conv(
                            F.substring(F.md5(F.concat_ws(":", F.lit(p), d)), 1, 8),
                            16,
                            10,
                        ).cast("long")
                        % 2001
                        - 1000
                    )
                    / 1000.0
                ),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
    return df.withColumn(out_col, F.concat(*bits))


def lsh_ann(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 8,
    k: int = 3,
    round_digits: int = 6,
) -> DataFrame:
    """Approximate nearest neighbors: exact cosine top-k within the
    query's LSH bucket.  Bucket join replaces the cross product — the
    scale path for corpus sizes where brute force is off the table."""
    c = hyperplane_signature(with_norm(corpus, vec_col), id_col, vec_col, planes)
    q = hyperplane_signature(with_norm(queries, vec_col), id_col, vec_col, planes)
    c = c.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("__cv"),
        F.col("norm").alias("__cn"),
        "bucket",
    )
    q = q.select(
        F.col(id_col).alias("q_id"),
        _as_double(F.col(vec_col)).alias("__qv"),
        F.col("norm").alias("__qn"),
        "bucket",
    )
    pairs = c.join(broadcast(q), on="bucket").filter(
        F.col("q_id") != F.col("neighbor_id")
    )
    scored = pairs.withColumn(
        "cos_sim",
        F.round(dot(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn")),
                round_digits),
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "neighbor_id", "cos_sim")
    )
