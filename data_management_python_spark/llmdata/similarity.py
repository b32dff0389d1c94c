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

Dot products: when the dimensionality is known (it always is for a
fixed embedding column) they are unrolled into flat left-associative
sums of ``element_at`` terms — plain arithmetic that stays inside
whole-stage codegen.  The higher-order-function forms (zip_with +
aggregate) are kept as the unknown-dims fallback, but HOFs are
CodegenFallback in Spark (interpreted per row) — measured ~3x slower
on the 64-dim bench corpus.  Both forms fold strictly left-to-right,
so they are bit-identical: ((0+x1)+x2)+... either way.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _flat_sum(terms):
    """Left-associative sum starting at 0.0 — the exact fp order of
    F.aggregate's sequential fold, but as a codegen-able expression."""
    acc = F.lit(0.0)
    for t in terms:
        acc = acc + t
    return acc


def with_norm(
    df: DataFrame, vec_col: str, out_col: str = "norm", dims: int | None = None
) -> DataFrame:
    """Attach the L2 norm of a vector column (one map-only pass).

    With ``dims`` the sum of squares is unrolled (codegen); without,
    it falls back to the interpreted aggregate HOF.  Same fp bits."""
    if dims is not None:
        e = [F.element_at(F.col(vec_col), d + 1).cast("double") for d in range(dims)]
        sq = _flat_sum(x * x for x in e)
    else:
        v = _as_double(F.col(vec_col))
        sq = F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)
    return df.withColumn(out_col, F.sqrt(sq))


def dot(a, b, dims: int | None = None):
    """Sequential-fold dot product of two array<double> columns.

    Unrolled into a flat codegen expression when ``dims`` is known;
    identical result bits either way (left-to-right fold)."""
    if dims is not None:
        return _flat_sum(
            F.element_at(a, d + 1) * F.element_at(b, d + 1) for d in range(dims)
        )
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _lit_dot(vec_col, weights: list[float]):
    """Dot of a vector column with a literal weight vector, via the
    sequential-fold HOF.  NOT unrolled: a signature concat over many
    planes would put planes*dims multiply-add terms into one generated
    method — measured to blow Janino's 64KB method limit (codegen
    disabled, 5-10x slower).  HOF bytecode stays O(1) per plane."""
    return dot(_as_double(vec_col), _lit_vec(weights))


def _lit_vec(values: list[float]):
    # single array<double> Literal node (not CreateArray of N Literals):
    # keeps expression trees O(1) per vector — with 8+ inlined centroid /
    # plane vectors of 64 dims the per-element form bloated analysis
    # time and task binaries (measured 2.8 MiB task binary on ivf_ann)
    return F.lit([float(x) for x in values])


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
    dims = len(qrows[0][vec_col]) if qrows else 0
    corpus_n = with_norm(corpus, vec_col, dims=dims).select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("__cv"),
        F.col("norm").alias("__cn"),
    )
    scored_structs = []
    for row in qrows:
        qvals = [float(x) for x in row[vec_col]]
        # python left-assoc double sum == the engine's sequential fold
        # bit-for-bit (both IEEE-754 doubles, same operation order);
        # IEEE sqrt is correctly rounded, so same bits as engine sqrt
        qsq = 0.0
        for x in qvals:
            qsq += x * x
        qn = F.lit(math.sqrt(qsq))
        # per-query dot stays HOF: k queries x dims terms unrolled into
        # one struct-array expression breaks Janino's method limit
        cos = F.round(
            dot(_lit_vec(qvals), F.col("__cv")) / (qn * F.col("__cn")), round_digits
        )
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
    weights = _plane_weights(planes, dims)
    bits = []
    for p in range(planes):
        proj = _lit_dot(F.col(vec_col), weights[p])
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
    c = hyperplane_signature(
        with_norm(corpus, vec_col, dims=dims), id_col, vec_col, planes, dims
    )
    q = hyperplane_signature(
        with_norm(queries, vec_col, dims=dims), id_col, vec_col, planes, dims
    )
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
        F.round(
            dot(F.col("__qv"), F.col("__cv"), dims=dims)
            / (F.col("__qn") * F.col("__cn")),
            round_digits,
        ),
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "neighbor_id", "cos_sim")
    )


def multitable_signatures(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    tables: int,
    planes: int,
    dims: int,
) -> DataFrame:
    """(id, table, sig) rows: one hyperplane signature per hash table.

    All tables draw from one deterministic plane family (table t uses
    planes t*planes .. t*planes+planes-1), so results are reproducible
    and an oracle can inline the same literal weights.  Map-only with
    an explode — no shuffle; the downstream bucket join shuffles on
    (table, sig), whose cardinality the caller controls via ``planes``.
    """
    weights = _plane_weights(tables * planes, dims)
    sig_structs = []
    for t in range(tables):
        bits = []
        for p in range(planes):
            proj = _lit_dot(F.col(vec_col), weights[t * planes + p])
            bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
        sig_structs.append(
            F.struct(F.lit(t).alias("t"), F.concat(*bits).alias("sig"))
        )
    return df.select(
        F.col(id_col).alias("__id"), F.explode(F.array(*sig_structs)).alias("ts")
    ).select(
        F.col("__id").alias(id_col),
        F.col("ts.t").alias("table_id"),
        F.col("ts.sig").alias("sig"),
    )


def embed_near_dup_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.45,
    tables: int = 4,
    planes: int = 6,
    round_digits: int = 6,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — the embedding member of
    the dedup family (exact / n-gram / MinHash-LSH / SimHash / this).

    Scale shape: candidates come from a multi-table random-hyperplane
    LSH bucket join (never all-pairs); exact cosine is verified only on
    the distinct candidate set, so verification work scales with
    near-dup density, not corpus size^2.  Recall < 1 by design (the
    standard LSH trade: more tables / fewer planes per table => higher
    recall, bigger buckets).  Output: (id_1, id_2, cos_sim) with
    id_1 < id_2 and rounded cos_sim >= threshold.
    """
    dims = len(corpus.select(vec_col).first()[0])
    tagged = multitable_signatures(corpus, id_col, vec_col, tables, planes, dims)
    a = tagged.select(F.col(id_col).alias("id_1"), "table_id", "sig")
    b = tagged.select(F.col(id_col).alias("id_2"), "table_id", "sig")
    cands = (
        a.join(b, on=["table_id", "sig"])
        .filter(F.col("id_1") < F.col("id_2"))
        .select("id_1", "id_2")
        .distinct()
    )
    vec = with_norm(corpus, vec_col, dims=dims).select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__v"),
        F.col("norm").alias("__n"),
    )
    va = vec.select(
        F.col("__id").alias("id_1"), F.col("__v").alias("__v1"), F.col("__n").alias("__n1")
    )
    vb = vec.select(
        F.col("__id").alias("id_2"), F.col("__v").alias("__v2"), F.col("__n").alias("__n2")
    )
    num = _flat_sum(
        F.element_at(F.col("__v1"), d + 1).cast("double")
        * F.element_at(F.col("__v2"), d + 1).cast("double")
        for d in range(dims)
    )
    return (
        cands.join(va, "id_1")
        .join(vb, "id_2")
        .withColumn(
            "cos_sim", F.round(num / (F.col("__n1") * F.col("__n2")), round_digits)
        )
        .filter(F.col("cos_sim") >= threshold)
        .select("id_1", "id_2", "cos_sim")
    )


def ivf_ann(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 8,
    k: int = 3,
    round_digits: int = 6,
) -> DataFrame:
    """IVF-flat approximate nearest neighbors (the inverted-file
    alternative to the hyperplane-LSH path in :func:`lsh_ann`).

    Coarse quantizer: the ``n_centroids`` lowest-id corpus vectors —
    a deterministic "training sample" (a production deployment would
    plug k-means centroids into the same plan; the index structure,
    assignment and probe machinery are identical).  Every vector is
    assigned to its nearest centroid by cosine (strict-max fold over
    the centroid array, first max wins — i.e. ties break to the lowest
    centroid id); search is exact cosine within the query's cell
    (nprobe=1).

    Scale shape: the centroid table is collected once (O(n_centroids)
    driver data) and inlined, so corpus assignment is MAP-ONLY — no
    shuffle to build the inverted file; the probe is a bucket join on
    cell id exactly like the LSH path.  Output: (q_id, neighbor_id,
    cos_sim) top-k per query, ties broken by neighbor id.
    """
    dims = len(queries.select(vec_col).first()[0])
    cents = [
        (r[id_col], [float(x) for x in r[vec_col]])
        for r in corpus.select(id_col, vec_col).orderBy(id_col).limit(n_centroids).collect()
    ]
    # python left-assoc double sum == engine fold bit-for-bit (see
    # cosine_topk); centroid norms are plan-time constants
    cnorms = []
    for _, cv in cents:
        s = 0.0
        for x in cv:
            s += x * x
        cnorms.append(math.sqrt(s))

    def assigned(df: DataFrame, out_id: str, vpfx: str) -> DataFrame:
        d = with_norm(df, vec_col, dims=dims)
        structs = [
            F.struct(
                (
                    dot(_lit_vec(cv), _as_double(F.col(vec_col)))
                    / (F.lit(cn) * F.col("norm"))
                ).alias("cos"),
                F.lit(cid).alias("cid"),
            )
            for (cid, cv), cn in zip(cents, cnorms)
        ]
        arr = F.array(*structs)
        best = F.aggregate(
            F.slice(arr, 2, len(cents) - 1),
            F.element_at(arr, 1),
            lambda acc, x: F.when(x["cos"] > acc["cos"], x).otherwise(acc),
        )
        return d.select(
            F.col(id_col).alias(out_id),
            _as_double(F.col(vec_col)).alias(f"{vpfx}v"),
            F.col("norm").alias(f"{vpfx}n"),
            best["cid"].alias("cell"),
        )

    c = assigned(corpus, "neighbor_id", "__c")
    q = assigned(queries, "q_id", "__q")
    pairs = c.join(F.broadcast(q), on="cell").filter(
        F.col("q_id") != F.col("neighbor_id")
    )
    scored = pairs.withColumn(
        "cos_sim",
        F.round(
            dot(F.col("__qv"), F.col("__cv"), dims=dims)
            / (F.col("__qn") * F.col("__cn")),
            round_digits,
        ),
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "neighbor_id", "cos_sim")
    )
