"""Similarity search over embedding columns (array<float>).

Two paths:
  - brute-force cosine top-k: exact; the bounded query set is inlined
    as literal vectors (collected once — O(k) driver data, legitimate),
    so the corpus is scored in a single map-only pass + top-k window.
    No join, no shuffle of the corpus.
  - random-hyperplane LSH buckets: the scale path — hyperplane weights
    are md5-derived (deterministic, computed once at plan-build time),
    signatures are map-only, and neighbor search joins on the bucket
    signature instead of crossing the corpus.

Dot products use higher-order functions (zip_with + aggregate) — JVM
whole-stage codegen, sequential fold (deterministic result bits).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
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


def _lit_vec(values: list[float]):
    return F.array(*[F.lit(float(x)) for x in values])


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    round_digits: int = 6,
) -> DataFrame:
    """Exact brute-force cosine top-k neighbors for each query vector.

    The query set must be bounded (it is collected and inlined as
    literal vectors — the standard trick for a small probe set against
    an arbitrarily large corpus).  Scoring is one map-only pass over
    the corpus: for each corpus row an array of (q_id, cos) structs is
    built and exploded; top-k per query via window.  Output:
    (q_id, neighbor_id, cos_sim) ordered by (rounded cos desc, id asc).
    """
    qrows = queries.select(id_col, vec_col).collect()
    # python-side norms would introduce a second fp path; keep every
    # arithmetic step inside the engine so oracle results match bit-wise
    corpus_n = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("__cv"),
        F.col("norm").alias("__cn"),
    )
    scored_structs = []
    for row in qrows:
        qv = _lit_vec(list(row[vec_col]))
        qn = F.sqrt(F.aggregate(qv, F.lit(0.0), lambda acc, x: acc + x * x))
        cos = F.round(dot(qv, F.col("__cv")) / (qn * F.col("__cn")), round_digits)
        scored_structs.append(
            F.struct(F.lit(row[id_col]).alias("q_id"), cos.alias("cos_sim"))
        )
    exploded = (
        corpus_n.select("neighbor_id", F.explode(F.array(*scored_structs)).alias("s"))
        .select(F.col("s.q_id").alias("q_id"), "neighbor_id", F.col("s.cos_sim").alias("cos_sim"))
        .filter(F.col("q_id") != F.col("neighbor_id"))
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        exploded.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "neighbor_id", "cos_sim")
    )


def _plane_weights(planes: int, dims: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplane weights.

    weight(p, d) = (int(md5(f"{p}:{d}")[:8], 16) % 2001 - 1000) / 1000
    — same derivation as an in-engine md5 expression would produce, but
    computed once at plan-build time instead of per row."""
    return [
        [
            (int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:8], 16) % 2001 - 1000)
            / 1000.0
            for d in range(dims)
        ]
        for p in range(planes)
    ]


def hyperplane_signature(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 8,
    dims: int = 64,
    out_col: str = "bucket",
) -> DataFrame:
    """Random-hyperplane LSH signature (deterministic).

    The signature bit for plane p is sign(w_p . v).  Map-only — the
    100 TB scale path buckets the corpus without any shuffle, then ANN
    search joins query buckets to corpus buckets.
    """
    v = _as_double(F.col(vec_col))
    weights = _plane_weights(planes, dims)
    bits = []
    for p in range(planes):
        proj = dot(v, _lit_vec(weights[p]))
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
    dims = len(queries.select(vec_col).first()[0])
    c = hyperplane_signature(with_norm(corpus, vec_col), id_col, vec_col, planes, dims)
    q = hyperplane_signature(with_norm(queries, vec_col), id_col, vec_col, planes, dims)
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
    pairs = c.join(F.broadcast(q), on="bucket").filter(
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
