"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Design for 100 TB corpora:

  - exact dedup: one hash-groupBy — partial aggregation, no driver state.
  - near-dup: never all-pairs.  Candidate generation is always a
    *bucket join* (shared shingle, shared LSH band, shared SimHash
    prefix), so the shuffle is keyed by bucket and skew is bounded by
    document frequency of the bucket key.  Exact Jaccard is then
    computed only per candidate pair.
  - all hashing is md5-derived (deterministic, seedable by prefixing) —
    no RNG, so results are reproducible and oracle-checkable.

Pure DataFrame ops throughout; no Python in the per-row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_dedup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact duplicate groups by content hash.

    Returns (text_md5, keep_id, n_copies) — one row per distinct
    content, keep_id = min id (the canonical survivor).
    """
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("text_md5"))
        .groupBy("text_md5")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def word_shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle).

    Documents with fewer than ``n`` tokens produce no shingles.
    """
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    sh = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + k) for k in range(n)]
        ),
    )
    return (
        df.filter(F.size(toks) >= n)
        .select(F.col(id_col), F.explode(sh).alias("shingle"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """All document pairs with word-n-gram Jaccard >= threshold.

    Candidate pairs come from the shared-shingle join (a bucket join on
    the shingle value — no cross join), then Jaccard =
    |intersection| / |union| with exact integer counts, so the double
    division is bit-deterministic.  Output: (id_1, id_2, jaccard),
    id_1 < id_2.
    """
    sh = word_shingles(df, id_col, text_col, n)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col(id_col).alias("id_1"), "shingle")
    b = sh.select(F.col(id_col).alias("id_2"), "shingle")
    inter = (
        a.join(b, on="shingle")
        .filter(F.col("id_1") < F.col("id_2"))
        .groupBy("id_1", "id_2")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    na = sizes.select(F.col(id_col).alias("id_1"), F.col("n_sh").alias("n_a"))
    nb = sizes.select(F.col(id_col).alias("id_2"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(na, "id_1")
        .join(nb, "id_2")
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_1", "id_2", "jaccard")
    )


def minhash_signatures(
    shingles: DataFrame, id_col: str, num_hashes: int = 16
) -> DataFrame:
    """MinHash signature per document: (id, seed, minhash).

    Hash family: md5(seed || ':' || shingle); the per-seed minimum is
    the lexicographically smallest hex digest — a valid min-wise hash,
    deterministic across engines.  One groupBy(id, seed); partial-agg
    friendly.
    """
    seeds = F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("seed")
    return (
        shingles.select(F.col(id_col), F.col("shingle"), seeds)
        .withColumn(
            "h", F.md5(F.concat_ws(":", F.col("seed"), F.col("shingle")))
        )
        .groupBy(id_col, "seed")
        .agg(F.min("h").alias("minhash"))
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """MinHash-LSH candidate pairs: documents sharing any band signature.

    num_hashes/bands rows per band; band signature = ordered concat of
    the band's minhashes.  The join key is (band, signature) — the
    classic banding bucket join that replaces the O(N^2) compare at
    scale.  Output: distinct (id_1, id_2), id_1 < id_2.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(
        word_shingles(df, id_col, text_col, n), id_col, num_hashes
    )
    band_sigs = (
        sig.withColumn("band", (F.col("seed") / rows_per_band).cast("int"))
        .groupBy(id_col, "band")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("seed"), F.col("minhash")))
                    ),
                    lambda s: s["minhash"],
                ),
                "|",
            ).alias("band_sig")
        )
    )
    a = band_sigs.select(F.col(id_col).alias("id_1"), "band", "band_sig")
    b = band_sigs.select(F.col(id_col).alias("id_2"), "band", "band_sig")
    return (
        a.join(b, on=["band", "band_sig"])
        .filter(F.col("id_1") < F.col("id_2"))
        .select("id_1", "id_2")
        .distinct()
    )


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 16) -> DataFrame:
    """Per-document SimHash over whitespace tokens (with multiplicity).

    Token hash = first 4 md5 hex chars -> 16-bit int; bit k of the
    document hash is the sign of sum(+1/-1) of token bit k.  Two
    shuffles ((id, bit) then (id)), both partial-agg shapes.
    Output: (id, simhash int).
    """
    toks = F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("tok")
    tok_hash = F.conv(F.substring(F.md5(F.col("tok")), 1, 4), 16, 10).cast("int")
    exploded = (
        df.select(F.col(id_col), toks)
        .withColumn("h", tok_hash)
        .select(
            id_col,
            "h",
            F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit"),
        )
        .withColumn(
            "w",
            F.when(F.expr("shiftright(h, bit) & 1") == 1, F.lit(1)).otherwise(-1),
        )
    )
    bit_sums = exploded.groupBy(id_col, "bit").agg(F.sum("w").alias("s"))
    return (
        bit_sums.withColumn(
            "bit_val",
            F.when(F.col("s") > 0, F.expr("shiftleft(1, bit)")).otherwise(F.lit(0)),
        )
        .groupBy(id_col)
        .agg(F.sum("bit_val").cast("bigint").alias("simhash"))
    )
