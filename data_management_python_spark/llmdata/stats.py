"""Distributed second-order statistics over embedding columns:
covariance matrix and PCA projection.

Beyond-reference (the reference has no vector analytics; SURVEY §2
maps its numeric work to scalar Pandas expressions).  These are the
embedding-curation primitives a training-data pipeline runs before
dedup/clustering: estimate the covariance structure, whiten/project.

Scale design — the covariance of N vectors of dimension d needs only
O(d^2) state no matter how large N is:

- one MAP-ONLY Arrow pass computes per-partition partials
  (n, sum-vector, sum-of-outer-products upper triangle) via
  ``mapInPandas`` — numpy does the d×d GEMM per batch, nothing
  shuffles;
- the partials (one row per partition, ~d^2/2 doubles each) are
  folded on the driver — bounded by partitions × d^2, independent of
  N, the same treeAggregate-to-driver shape MLlib's summarizers use
  (and the same bounded-collect convention as
  :func:`~data_management_python_spark.llmdata.similarity.kmeans_centroids`);
- eigen-decomposition happens on the d×d matrix on the driver
  (O(d^3), microseconds at d=64), and the projection is again a
  map-only Arrow pass against the broadcast component matrix.

The naive SS - S S^T/n form is used deliberately: embedding columns
are near-zero-mean by construction (unit-ish normalized model
outputs), so catastrophic cancellation cannot occur; a two-pass
centered variant would double the data scans for no accuracy gain
here.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _covariance_state(
    corpus: DataFrame, vec_col: str, dims: int
) -> tuple[int, np.ndarray, np.ndarray]:
    """(n, sum vector, full SS matrix) folded from per-partition
    Arrow partials.  Driver state is O(partitions * d^2), never O(N)."""
    iu = np.triu_indices(dims)

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = np.zeros(dims)
        ss = np.zeros((dims, dims))
        for pdf in batches:
            A = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            n += A.shape[0]
            s += A.sum(axis=0)
            ss += A.T @ A
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "ss": [ss[iu].tolist()]}
            )

    rows = (
        corpus.select(vec_col)
        .mapInPandas(part, "n long, s array<double>, ss array<double>")
        .collect()
    )
    n = sum(r["n"] for r in rows)
    s = np.zeros(dims)
    ss_flat = np.zeros(len(iu[0]))
    for r in rows:
        s += np.asarray(r["s"])
        ss_flat += np.asarray(r["ss"])
    ss = np.zeros((dims, dims))
    ss[iu] = ss_flat
    ss = ss + ss.T - np.diag(np.diag(ss))
    return n, s, ss


def embedding_covariance(
    corpus: DataFrame, vec_col: str = "embedding", dims: int = 64
) -> DataFrame:
    """Sample covariance matrix of a vector column as tidy rows
    (i, j, cov), 1-based upper triangle (i <= j)."""
    spark = corpus.sparkSession
    n, s, ss = _covariance_state(corpus, vec_col, dims)
    if n < 2:
        return spark.createDataFrame([], "i int, j int, cov double")
    cov = (ss - np.outer(s, s) / n) / (n - 1)
    iu = np.triu_indices(dims)
    data = [
        (int(i) + 1, int(j) + 1, float(cov[i, j]))
        for i, j in zip(iu[0], iu[1])
    ]
    return spark.createDataFrame(data, "i int, j int, cov double")


def pca_components(
    corpus: DataFrame, k: int = 2, vec_col: str = "embedding", dims: int = 64
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Top-``k`` principal axes of the vector column.

    Returns (mean vector, components [d, k], eigenvalues [k],
    descending).  Sign convention: each component's
    largest-|loading| coordinate is made positive, so the axes are
    reproducible across runs (eigenvectors are otherwise
    sign-ambiguous).
    """
    n, s, ss = _covariance_state(corpus, vec_col, dims)
    if n < 2:
        raise ValueError("need at least 2 vectors for PCA")
    mean = s / n
    cov = (ss - np.outer(s, s) / n) / (n - 1)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    W = vecs[:, order]
    for c in range(W.shape[1]):
        lead = np.argmax(np.abs(W[:, c]))
        if W[lead, c] < 0:
            W[:, c] = -W[:, c]
    return mean, W, vals[order]


def pca_project(
    corpus: DataFrame,
    k: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
    round_to: int = 3,
) -> DataFrame:
    """Project every vector onto the top-``k`` principal axes.

    Two map-only Arrow passes over the data (one for the covariance
    partials, one for the projection); the d×k component matrix rides
    into the projection UDF as a broadcast closure constant.
    """
    mean, W, _ = pca_components(corpus, k, vec_col, dims)
    mean_l, w_l = mean.tolist(), W.tolist()

    @pandas_udf("array<double>")
    def _proj(v: pd.Series) -> pd.Series:
        A = np.stack(v.to_numpy()).astype(np.float64)
        P = (A - np.asarray(mean_l)) @ np.asarray(w_l)
        return pd.Series(list(np.round(P, round_to)))

    out = corpus.select(id_col, _proj(F.col(vec_col)).alias("__p"))
    return out.select(
        id_col,
        *[F.col("__p").getItem(c).alias(f"pc{c + 1}") for c in range(k)],
    )


def _hll_bucket_rank(col: str, p: int):
    """The md5-derived (bucket, rank) column pair of the deterministic
    HLL sketch: bucket = first p hex bits, rank = leading zeros of the
    next 52 bits + 1 via the bin()/ltrim idiom both engines share."""
    m = 1 << p
    h = F.md5(F.col(col).cast("string"))
    bucket = (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % m
    ).alias("__j")
    w = F.conv(F.substring(h, 9, 13), 16, 10).cast("long")
    rank = (F.lit(53) - F.length(F.ltrim(F.bin(w), F.lit("0")))).alias("__r")
    return bucket, rank


def hll_registers(df: DataFrame, col: str, p: int = 8) -> DataFrame:
    """The (bucket, max-rank) register table of the deterministic HLL
    sketch — the MERGEABLE asset: registers of a union are the
    element-wise max of the parts' registers, so shards/days combine
    without re-reading data (pinned by property test)."""
    bucket, rank = _hll_bucket_rank(col, p)
    return (
        df.select(bucket, rank).groupBy("__j").agg(F.max("__r").alias("__M"))
    )


def merge_hll_registers(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union two register tables: element-wise max per bucket."""
    return (
        a.unionByName(b)
        .groupBy("__j")
        .agg(F.max("__M").alias("__M"))
    )


def hll_estimate(regs: DataFrame, p: int = 8) -> DataFrame:
    """Closed-form HLL estimate from a register table: harmonic mean
    of 2^-M over ALL 2^p registers (absent ones count rank 0), alpha
    bias correction, linear-counting small-range branch.  1 row:
    (m, n_zero_registers, hll_estimate)."""
    m = 1 << p
    spark = regs.sparkSession
    full = (
        spark.range(m)
        .select(F.col("id").alias("__j"))
        .join(regs, "__j", "left")
        .select(F.coalesce(F.col("__M"), F.lit(0)).alias("__M"))
    )
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = full.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("__M"))).alias("__S"),
        F.sum(F.when(F.col("__M") == 0, 1).otherwise(0)).alias("__V"),
    )
    raw = F.lit(alpha * m * m) / F.col("__S")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (F.col("__V") > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("__V")),
    ).otherwise(raw)
    return agg.select(
        F.lit(m).alias("m"),
        F.col("__V").cast("bigint").alias("n_zero_registers"),
        F.round(est, 6).alias("hll_estimate"),
    )


def hll_distinct(
    df: DataFrame,
    col: str,
    p: int = 8,
    exact: bool = True,
) -> DataFrame:
    """Deterministic HyperLogLog distinct-count — the mergeable
    cardinality sketch a 100-TB pipeline uses where exact COUNT
    DISTINCT would shuffle every value (vocabulary sizes, unique URLs
    per crawl, per-shard user counts).  Spark's built-in
    ``approx_count_distinct`` is HLL++ with engine-private hashing, so
    it can never hash-match an oracle; this sketch derives every
    register from md5, making the estimate — harmonic sum, alpha
    correction, linear-counting branch — bit-replayable in SQL.

    Shape: one groupBy(bucket).max(rank) partial agg (2^p registers of
    reduce state regardless of input size; see :func:`hll_registers` /
    :func:`merge_hll_registers` for the shard-merge algebra), then a
    1-row closed-form estimate.  ``exact`` appends the true distinct
    count and relative error (costs the real distinct shuffle the
    sketch exists to avoid; keep for oracle/QA runs).
    """
    # distinct-first: registers are insensitive to duplicates, so the
    # sketch and the exact QA count both derive from ONE distinct pass
    vals = df.select(F.col(col)).distinct()
    if not exact:
        return hll_estimate(hll_registers(vals, col, p), p)
    # The exact count rides the register aggregate itself: each
    # register row carries its bucket's distinct-value count, and the
    # estimate's final 2^p-row aggregate sums them — ONE corpus pass,
    # one lineage, no second branch.  (The previous two-branch shape's
    # "ReuseExchange wires both aggregates to one evaluation" claim
    # was disproven on the executed plan — 2 full scans per call; r12.)
    m = 1 << p
    bucket, rank = _hll_bucket_rank(col, p)
    regs = (
        vals.select(bucket, rank)
        .groupBy("__j")
        .agg(F.max("__r").alias("__M"), F.count(F.lit(1)).alias("__n"))
    )
    spark = df.sparkSession
    full = (
        spark.range(m)
        .select(F.col("id").alias("__j"))
        .join(regs, "__j", "left")
        .select(
            F.coalesce(F.col("__M"), F.lit(0)).alias("__M"), F.col("__n")
        )
    )
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = full.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("__M"))).alias("__S"),
        F.sum(F.when(F.col("__M") == 0, 1).otherwise(0)).alias("__V"),
        F.sum(F.coalesce(F.col("__n"), F.lit(0)))
        .cast("long")
        .alias("exact_distinct"),
    )
    raw = F.lit(alpha * m * m) / F.col("__S")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (F.col("__V") > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("__V")),
    ).otherwise(raw)
    est_rounded = F.round(est, 6)
    return agg.select(
        F.lit(m).alias("m"),
        F.col("__V").cast("bigint").alias("n_zero_registers"),
        est_rounded.alias("hll_estimate"),
        F.col("exact_distinct"),
        F.round(
            (est_rounded - F.col("exact_distinct"))
            / F.col("exact_distinct"),
            6,
        ).alias("rel_error"),
    )


def cms_registers(
    df: DataFrame, col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Count-Min Sketch register table (row, bucket, count): ``depth``
    md5-derived hash rows (seeded by row-index prefix), ``width``
    buckets each.  The frequency twin of :func:`hll_registers` —
    mergeable by SUM per (row, bucket), so shard/day sketches combine
    without re-reading data; reduce state is depth x width counters
    regardless of input size.  One generator explode (depth rows per
    value) + one partial-agg shuffle."""
    rows = F.array(
        *[
            F.struct(
                F.lit(i).alias("__i"),
                (
                    F.conv(
                        F.substring(
                            F.md5(
                                F.concat(
                                    F.lit(f"{i}:"),
                                    F.col(col).cast("string"),
                                )
                            ),
                            1,
                            8,
                        ),
                        16,
                        10,
                    ).cast("long")
                    % width
                ).alias("__b"),
            )
            for i in range(depth)
        ]
    )
    return (
        df.select(F.explode(rows).alias("__rb"))
        .select(F.col("__rb.__i").alias("__i"), F.col("__rb.__b").alias("__b"))
        .groupBy("__i", "__b")
        .agg(F.count(F.lit(1)).alias("__c"))
    )


def merge_cms_registers(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union two CMS register tables: counter SUM per (row, bucket)."""
    return (
        a.unionByName(b)
        .groupBy("__i", "__b")
        .agg(F.sum("__c").alias("__c"))
    )


def cms_point_estimates(
    regs: DataFrame,
    probes: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """CMS point-frequency estimates for a probe frame: est(x) =
    min over rows of counter[row][hash_row(x)] — an OVERESTIMATE by
    construction (never under; pinned by test/oracle).  Probe values
    explode into their depth (row, bucket) keys and join the register
    table — O(|probes| x depth) lookups, never a scan of the sketch
    domain."""
    rows = F.array(
        *[
            F.struct(
                F.lit(i).alias("__i"),
                (
                    F.conv(
                        F.substring(
                            F.md5(
                                F.concat(
                                    F.lit(f"{i}:"),
                                    F.col(col).cast("string"),
                                )
                            ),
                            1,
                            8,
                        ),
                        16,
                        10,
                    ).cast("long")
                    % width
                ).alias("__b"),
            )
            for i in range(depth)
        ]
    )
    keyed = probes.select(
        F.col(col), F.explode(rows).alias("__rb")
    ).select(
        col, F.col("__rb.__i").alias("__i"), F.col("__rb.__b").alias("__b")
    )
    return (
        keyed.join(regs, ["__i", "__b"], "left")
        .groupBy(col)
        .agg(
            F.min(F.coalesce(F.col("__c"), F.lit(0))).alias("cms_estimate")
        )
    )
