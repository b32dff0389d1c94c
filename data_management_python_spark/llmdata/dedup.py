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


def _shingle_parts(df: DataFrame, id_col: str, text_col: str, n: int, distinct: bool):
    """(tokenized df, shingle-array EXPRESSION) building blocks.

    The token array is materialized as a column BEFORE the shingle
    lambda: referencing the raw split() inside transform() would
    re-evaluate the regex split per element (O(tokens^2) per document —
    measured 3x slowdown at bench scale).

    ``distinct=True`` dedups WITHIN the array (``array_distinct``) —
    shingle uniqueness is per-document, so this replaces a
    ``.distinct()`` shuffle of the exploded rows with a map-side op
    (measured 4.7s -> 0.5s for the shingle stage at bench scale; at
    100 TB it removes an all-shingle exchange entirely).

    Callers must explode the returned EXPRESSION in the same select
    (``select(id, explode(sh))``), never project the array to a column
    and explode the column reference in a second select: the optimizer
    does not collapse that projection into Generate, and the detached
    projection measured ~9x slower at bench scale.
    """
    toked = df.select(
        F.col(id_col),
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("__toks"),
    ).filter(F.size("__toks") >= n)
    sh = F.transform(
        F.sequence(F.lit(1), F.size("__toks") - (n - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(F.col("__toks"), i + k) for k in range(n)]
        ),
    )
    if distinct:
        sh = F.array_distinct(sh)
    return toked, sh


def word_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, distinct: bool = True
) -> DataFrame:
    """Word n-gram shingles per document: (id, shingle).

    Documents with fewer than ``n`` tokens produce no shingles.
    ``distinct`` dedups map-side in the array domain — no shuffle
    either way (see :func:`_shingle_parts`).
    """
    toked, sh = _shingle_parts(df, id_col, text_col, n, distinct)
    return toked.select(F.col(id_col), F.explode(sh).alias("shingle"))


def sized_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """Distinct shingles with the per-doc count riding along:
    (id, n_sh, shingle).  n_sh comes from the array size map-side —
    no counting aggregation downstream."""
    toked, sh = _shingle_parts(df, id_col, text_col, n, distinct=True)
    return toked.select(
        F.col(id_col),
        F.size(sh).alias("n_sh"),
        F.explode(sh).alias("shingle"),
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.2,
    max_doc_freq: int | None = None,
    prefix_filter: bool | None = None,
    prefix_filter_min_docs: int = 20_000,
) -> DataFrame:
    """All document pairs with word-n-gram Jaccard >= threshold.

    Candidate pairs come from the shared-shingle join (a bucket join on
    the shingle value — no cross join), then Jaccard =
    |intersection| / |union| with exact integer counts, so the double
    division is bit-deterministic.  Output: (id_1, id_2, jaccard),
    id_1 < id_2.

    Plan shape (all measured at bench scale, sf0.1):
      - shingles are hashed to LONGS (xxhash64) immediately after the
        explode and the narrow (id, hash) frame is materialized ONCE
        with an eager localCheckpoint; the hot-set scan, the anti-join,
        the size count, and both join branches all reuse it.  Joining
        and aggregating on 8-byte longs instead of ~30-byte 3-gram
        strings measured 1.4x faster end to end, and the checkpoint
        replaces three re-evaluations of the tokenize+explode stage.
        (A 64-bit hash collision would merge two shingles — probability
        ~m^2/2^65 for m distinct shingles, negligible below trillions
        of shingles; the DuckDB oracle joins on the exact strings, so
        the correctness gate would surface one instantly.)
      - candidate pairs come from a PREFIX-FILTERED self-join (the
        All-Pairs/PPJoin positional filter): only each doc's
        |s| - ceil(t*|s|) + 1 rarest shingles (global df order) enter
        the pair-generating join, which provably loses no pair with
        Jaccard >= t.  Exact intersection counts are then computed for
        candidates only — linear in candidates x set size.  The join
        is hinted shuffle-hash: both sides are the same size so
        sort-merge's double sort buys nothing, and the hash side is
        bounded by the shingle partition.
      - pair rows stay NARROW through the candidate stage — only
        (id_1, id_2) plus the hashed join key; sizes and the full sets
        ride on ONE per-doc materialization (a df-sorted array per
        document) that serves prefix, size, and the array_intersect
        verification — no window sort over occurrences, no occurrence
        re-join.  (For corpus-scale near-dup use :func:`near_dup_pairs`
        — this exact variant is inherently a verification-scale tool.)

    ``max_doc_freq``: the scale governor.  A shingle appearing in d
    documents yields O(d^2) pairs in the shared-shingle join, so one
    stop-word 3-gram in 1M docs is 10^12 pairs — the quadratic
    blow-up that makes exact Jaccard collapse at corpus scale.  With a
    cap, shingles whose document frequency exceeds it are dropped from
    BOTH the intersection and the union (idf-pruned Jaccard — hot
    shingles carry no discriminating signal, the same reason tf-idf
    down-weights them), bounding the join at O(cap * |shingles|)
    pairs.  The pruned measure is still a well-defined symmetric
    Jaccard on the reduced shingle sets, computed exactly — matchable
    by an oracle applying the same cap.  ``None`` = unbounded
    (reference-exact baseline; verification scale only).

    ``prefix_filter``: the positional filter is LOSSLESS, so skipping
    it changes the plan, never the result — and below a few tens of
    thousands of documents its fixed cost (the df-ordered per-doc
    array build: a dfreq rejoin plus a sorted collect per doc)
    exceeds what it saves (measured at sf0.1/5k docs: ~4.4 s plain vs
    ~9.8 s filtered; at 50k docs the filter wins 2.4x and at 500k
    docs 11x vs DuckDB — SCALE.md).  ``None`` (default) auto-gates on
    corpus size: filtered iff the corpus has more than
    ``prefix_filter_min_docs`` documents (one cheap count-star job);
    pass True/False to pin a branch (tests pin BOTH against a
    brute-force reference).
    """
    toked, shx = _shingle_parts(df, id_col, text_col, n, distinct=True)
    # checkpoint the hashed-shingle frame, repartitioned on the join
    # key at the operator's width.  (r12 correction: under AQE a
    # localCheckpoint reports UnknownPartitioning, so downstream joins
    # DO re-exchange the checkpoint — the repartition still sizes the
    # checkpoint blocks, but the zero-exchange co-location the
    # original note promised does not hold; the re-exchanged rows are
    # two longs, so the cost is bounded.)
    from data_management_python_spark.session import operator_width  # noqa: PLC0415

    width = operator_width(df.sparkSession)
    # no leading repartition: the trailing repartition(width, __sh)
    # already provides the checkpoint's parallelism, and a single-split
    # scan (the only case the extra shuffle would parallelize) is by
    # definition small enough to explode in one task — measured 1.4s ->
    # 1.1s warm at sf0.1 and neutral at 10x for dropping it
    sh = (
        toked.select(F.col(id_col), F.explode(shx).alias("shingle"))
        .select(F.col(id_col), F.xxhash64("shingle").alias("__sh"))
        .repartition(width, "__sh")
        .localCheckpoint(eager=True)
    )
    if prefix_filter is None:
        # plan gate only (the filter is lossless either way), resolved
        # on the ALREADY-CHECKPOINTED shingle frame: counting the raw
        # df here would re-execute the caller's full input lineage once
        # just to pick a plan.  approx_count_distinct is a single
        # map-side-sketch job over the checkpoint, and its ~2% error is
        # irrelevant to a 20k-doc plan threshold.  Callers with
        # expensive lineage AND a known corpus size should still pin
        # prefix_filter explicitly.
        n_docs = sh.agg(
            F.approx_count_distinct(id_col).alias("n")
        ).first()["n"]
        prefix_filter = n_docs > prefix_filter_min_docs
    # one df table serves both the hot-set cap and the prefix order;
    # computed on the colocated (__sh-partitioned) checkpoint, so the
    # groupBy and the rejoin below add no exchange on the big side
    dfreq = sh.groupBy("__sh").agg(F.count(F.lit(1)).alias("__df"))
    if max_doc_freq is not None:
        # hot set is tiny by construction (few shingles exceed the cap)
        # -> broadcast anti-join, no extra shuffle of the big side; an
        # EMPTY hot set makes the anti-join a no-op, so no fallback
        # branch (and no extra isEmpty job) is needed.
        hot = dfreq.filter(F.col("__df") > max_doc_freq).select("__sh")
        sh = sh.join(F.broadcast(hot), "__sh", "left_anti")
    # POSITIONAL (prefix) FILTER — the All-Pairs/PPJoin pruning
    # (Bayardo et al. 2007): under ANY global total order of shingles,
    # a pair with Jaccard >= t must share a shingle inside BOTH docs'
    # first |s| - ceil(t*|s|) + 1 shingles (the smallest common
    # shingle is forced into each prefix, else the >= ceil(t*|s|)
    # common shingles cannot fit in the suffix).  Ordering by
    # (document frequency asc, hash) puts the RAREST shingles in the
    # prefix, so the candidate join runs on the least-shared tokens —
    # the hot-shingle quadratic never reaches the pair stage.  The
    # filter is lossless under any consistent order, so the DuckDB
    # oracle mirrors it with its own (df, string) order and converges
    # to the identical pair set.
    #
    # ONE groupBy(id) materializes everything per-doc: the df-sorted
    # shingle array yields the prefix (map-side slice), the set size,
    # and the full set the verification stage intersects — no window
    # sort over all occurrences, no re-join of the occurrence frame.
    if prefix_filter:
        per_doc = (
            sh.join(dfreq, "__sh")
            .groupBy(id_col)
            .agg(
                F.sort_array(
                    F.collect_list(F.struct("__df", "__sh"))
                ).alias("__a")
            )
            .select(
                F.col(id_col),
                F.size("__a").alias("n_sh"),
                F.col("__a.__sh").alias("__set"),
            )
            .withColumn(
                # round the product to 6 places BEFORE ceil: IEEE fuzz
                # can land t*n a hair ABOVE the exact integer
                # (0.07*100 = 7.000000000000001), and a raw ceil would
                # then shorten the prefix by one and silently drop
                # boundary pairs.  Rounding first errs toward a LONGER
                # prefix (weaker pruning, never lossy); the oracle
                # mirrors the same expression.
                "__pref",
                F.slice(
                    F.col("__set"),
                    1,
                    (
                        F.col("n_sh")
                        - F.ceil(
                            F.round(F.lit(threshold) * F.col("n_sh"), 6)
                        )
                        + 1
                    ).cast("int"),
                ),
            )
            .localCheckpoint(eager=True)
        )
    else:
        # small-corpus plan: no dfreq rejoin, no df-ordered per-doc
        # collect, no candidate distinct — the shared-shingle
        # self-join feeds ONE groupBy(id_1, id_2) whose count IS the
        # exact intersection size (each co-occurring shingle
        # contributes exactly one joined row).  Same result set by the
        # prefix filter's losslessness, pinned against a brute-force
        # reference for BOTH branches in tests.  The df cap above
        # still bounds the join at O(cap x |shingles|) pairs.
        #
        # r12: pin the CAPPED frame and the per-doc sizes.  This
        # branch consumes the capped shingle frame four ways (two
        # self-join sides, two size lookups) and Spark shares no
        # subtrees between consumers — the executed plan re-ran the
        # O(shingles) doc-frequency aggregate and the anti-join four
        # times and the sizes aggregate twice (AQE exchange reuse did
        # not fire across the re-plans; see
        # plans/r12/d_ngram_jaccard_before.txt).  Both pins are
        # per-call and narrow: (id, __sh) longs / (id, n_sh) one row
        # per doc (guide §2.4, §1.2-1).
        if max_doc_freq is not None:
            sh = sh.localCheckpoint(eager=True)
        sizes = (
            sh.groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_sh"))
            .localCheckpoint(eager=True)
        )
        inter = (
            sh.select(F.col(id_col).alias("id_1"), "__sh")
            .join(
                sh.select(
                    F.col(id_col).alias("id_2"), "__sh"
                ).hint("shuffle_hash"),
                on="__sh",
            )
            .filter(F.col("id_1") < F.col("id_2"))
            .groupBy("id_1", "id_2")
            .agg(F.count(F.lit(1)).alias("n_inter"))
            .join(
                sizes.select(
                    F.col(id_col).alias("id_1"), F.col("n_sh").alias("n_a")
                ),
                "id_1",
            )
            .join(
                sizes.select(
                    F.col(id_col).alias("id_2"), F.col("n_sh").alias("n_b")
                ),
                "id_2",
            )
        )
        return (
            inter.withColumn(
                "jaccard",
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
            )
            .filter(F.col("jaccard") >= threshold)
            .select("id_1", "id_2", "jaccard")
        )
    # exploded prefix, materialized ONCE: both sides of the candidate
    # self-join read the checkpoint instead of re-running the explode.
    # (r12 correction, as for the shingle checkpoint above: under AQE a
    # localCheckpoint reports UnknownPartitioning, so the self-join DOES
    # re-exchange both sides — the repartition sizes the checkpoint
    # blocks; the win is the single explode, not exchange elision.)
    pref = (
        per_doc.select(
            F.col(id_col), "n_sh", F.explode("__pref").alias("__sh")
        )
        .repartition(width, "__sh")
        .localCheckpoint(eager=True)
    )
    cand = (
        pref.select(
            F.col(id_col).alias("id_1"), F.col("n_sh").alias("__n1"), "__sh"
        )
        .join(
            pref.select(
                F.col(id_col).alias("id_2"),
                F.col("n_sh").alias("__n2"),
                "__sh",
            ).hint("shuffle_hash"),
            on="__sh",
        )
        .filter(
            (F.col("id_1") < F.col("id_2"))
            # length filter: J >= t forces t*max(|a|,|b|) <= min — a
            # lossless necessary condition, applied before the
            # distinct shuffle.  RHS rounded to 6 so IEEE fuzz in
            # t*max can never exclude an exact-boundary pair (same
            # discipline as the prefix length above)
            & (
                F.least("__n1", "__n2")
                >= F.round(
                    F.lit(threshold) * F.greatest("__n1", "__n2"), 6
                )
            )
        )
        .select("id_1", "id_2")
        .distinct()
    )
    # exact verification for the surviving candidates only: two joins
    # against the per-doc set arrays (each candidate row carries two
    # bounded arrays), intersection counted map-side — linear in
    # candidates x set size, never quadratic in a shingle's document
    # frequency
    inter = (
        cand.join(
            per_doc.select(
                F.col(id_col).alias("id_1"),
                F.col("__set").alias("__s1"),
                F.col("n_sh").alias("n_a"),
            ),
            "id_1",
        )
        .join(
            per_doc.select(
                F.col(id_col).alias("id_2"),
                F.col("__set").alias("__s2"),
                F.col("n_sh").alias("n_b"),
            ),
            "id_2",
        )
        .select(
            "id_1",
            "id_2",
            "n_a",
            "n_b",
            F.size(F.array_intersect("__s1", "__s2")).alias("n_inter"),
        )
    )
    return (
        inter.withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_1", "id_2", "jaccard")
    )


# Prime just above 2^32 — the classic (h1 + i*h2) mod p MinHash family
# (Broder-style 2-universal combination; one md5 per shingle, k derived
# hashes by integer arithmetic).
MINHASH_PRIME = 4294967311


def minhash_signatures(
    shingles: DataFrame, id_col: str, num_hashes: int = 16
) -> DataFrame:
    """Wide MinHash signature per document: (id, mh0..mh{k-1}).

    One md5 per shingle, split into two 32-bit ints (h1, h2); hash i is
    (h1 + i*h2) mod p.  All k minima are computed in a SINGLE
    groupBy(id) with k min-aggregates — no row explosion, one
    partial-agg shuffle of doc-level rows.  This is the shape that
    survives 100 TB: shuffle volume is O(#docs x k ints), independent
    of shingle count.
    """
    h1 = F.conv(F.substring(F.md5("shingle"), 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(F.md5("shingle"), 9, 8), 16, 10).cast("long")
    hashed = shingles.select(F.col(id_col), h1.alias("h1"), h2.alias("h2"))
    aggs = [
        F.min((F.col("h1") + F.lit(i) * F.col("h2")) % MINHASH_PRIME).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    return hashed.groupBy(id_col).agg(*aggs)


def minhash_signature_map_side(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 16,
) -> DataFrame:
    """MinHash signature with NO shuffle: the k minima are folded over
    the per-document shingle ARRAY (array_min over a transform), so
    the operator is a pure projection.  Same (h1 + i*h2) mod p family
    and identical output to :func:`minhash_signatures` (min is
    multiplicity-invariant), but usable where an aggregation is not —
    Structured Streaming pre-state stages — and at 100 TB it trades
    the doc-level partial-agg shuffle for per-row array math.
    The md5s are materialized once as a struct-array column; the k
    minima then read that column, so hashing cost stays one md5 per
    shingle, not per (shingle x hash).
    """
    toked, shx = _shingle_parts(df, id_col, text_col, n, distinct=False)
    hashed = F.transform(
        shx,
        lambda s: F.struct(
            F.conv(F.substring(F.md5(s), 1, 8), 16, 10)
            .cast("long")
            .alias("h1"),
            F.conv(F.substring(F.md5(s), 9, 8), 16, 10)
            .cast("long")
            .alias("h2"),
        ),
    )
    with_h = toked.select(F.col(id_col), hashed.alias("__h"))
    minima = [
        F.array_min(
            F.transform(
                F.col("__h"),
                lambda h: (h["h1"] + F.lit(i) * h["h2"]) % MINHASH_PRIME,
            )
        ).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    return with_h.select(F.col(id_col), *minima)


def band_signature_structs(num_hashes: int, bands: int):
    """The banding expression shared by batch and streaming LSH: an
    array of (band, band_sig) structs over mh0..mh{k-1} columns."""
    rows_per_band = num_hashes // bands
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    "|",
                    *[
                        F.col(f"mh{b * rows_per_band + r}")
                        for r in range(rows_per_band)
                    ],
                ).alias("band_sig"),
            )
            for b in range(bands)
        ]
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    shingles: DataFrame | None = None,
    signatures: DataFrame | None = None,
) -> DataFrame:
    """MinHash-LSH candidate pairs: documents sharing any band signature.

    num_hashes/bands rows per band; band signature = ordered concat of
    the band's minhashes.  The join key is (band, signature) — the
    classic banding bucket join that replaces the O(N^2) compare at
    scale.  Output: distinct (id_1, id_2), id_1 < id_2.

    Pass precomputed ``shingles`` when the caller also needs them (e.g.
    near_dup_pairs verification) so tokenization runs once; pass
    precomputed ``signatures`` (id, mh0..mh{k-1}) when the caller
    already built the signature table (e.g. d_minhash_estimate, whose
    estimator join reads the same signatures — one subtree lets
    ReuseExchange evaluate the shingle+md5+agg shuffle once).
    """
    if signatures is not None:
        sig = signatures
    else:
        sig = minhash_signatures(
            shingles
            if shingles is not None
            # min is multiplicity-invariant: skip the distinct shuffle
            else word_shingles(df, id_col, text_col, n, distinct=False),
            id_col,
            num_hashes,
        )
    band_structs = band_signature_structs(num_hashes, bands)
    # hash-partition the persisted band table on ITS OWN join key at
    # the operator's width: both sides of the self-join below then
    # satisfy the join's required distribution from the cache — the
    # bucket join runs with ZERO exchanges, at a width the operator
    # controls rather than whatever spark.sql.shuffle.partitions the
    # session happens to carry
    from data_management_python_spark.session import operator_width  # noqa: PLC0415

    width = operator_width(df.sparkSession)
    band_sigs = (
        sig.select(F.col(id_col), F.explode(band_structs).alias("bs"))
        .select(id_col, F.col("bs.band").alias("band"), F.col("bs.band_sig").alias("band_sig"))
        .repartition(width, "band", "band_sig")
        .persist()
    )
    a = band_sigs.select(F.col(id_col).alias("id_1"), "band", "band_sig")
    b = band_sigs.select(F.col(id_col).alias("id_2"), "band", "band_sig")
    return (
        a.join(b, on=["band", "band_sig"])
        .filter(F.col("id_1") < F.col("id_2"))
        .select("id_1", "id_2")
        .distinct()
    )


def near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.2,
) -> DataFrame:
    """Scale-correct near-dup detection: MinHash-LSH candidates, then
    exact Jaccard verification ONLY on candidate pairs.

    The exact shared-shingle join (ngram_jaccard_pairs) goes quadratic
    when shingles are hot (measured 14.6x runtime at 10x data with
    duplicate-heavy corpora — tools/scale_stress.py); this composite
    keeps candidate generation proportional to true near-dup density,
    so verification work scales with the answer size, not the corpus.
    Output: (id_1, id_2, jaccard) with jaccard >= threshold — a subset
    of ngram_jaccard_pairs' result (LSH recall < 1 by design).
    """
    # the exploded shingle frame feeds FOUR branches (minhash
    # signatures, both verify join sides, and — via toked — the size
    # table): checkpoint it once so tokenize+explode runs once, not
    # once per branch.  (An in-memory .persist() of the Generate
    # output measured SLOWER than recompute — columnar cache build on
    # exploded rows — but a localCheckpoint is a plain RDD pin with
    # none of that cost, and under an untuned session each recompute
    # also pays the session's full shuffle width.)
    toked, shx = _shingle_parts(df, id_col, text_col, n, distinct=True)
    # widen BEFORE the explode: a single-file (or few-partition) corpus
    # would otherwise tokenize+shingle in one task regardless of
    # cluster width — the docs shuffle is doc-count-sized and buys a
    # fully parallel Generate stage
    from data_management_python_spark.session import operator_width  # noqa: PLC0415

    width = operator_width(df.sparkSession)
    # r12: hash every shingle ONCE in the explode stage — the two md5
    # halves the minhash family derives from plus the xxhash64 verify
    # key — so the pinned frame and every downstream shuffle carry
    # three longs, never ~25-byte shingle text (guide §2.3: shuffle
    # narrower types).  The verify join meets on the 64-bit key
    # exactly like the incremental twin (incremental_near_dup);
    # per-doc shingles are already distinct, so counts are unchanged
    # short of an xxhash64 collision inside one candidate pair
    # (~|shingles|^2/2^64; the oracle run proves none on the data).
    sh = (
        toked.repartition(width)
        .select(F.col(id_col), F.explode(shx).alias("shingle"))
        .select(
            F.col(id_col),
            F.conv(F.substring(F.md5("shingle"), 1, 8), 16, 10)
            .cast("long")
            .alias("h1"),
            F.conv(F.substring(F.md5("shingle"), 9, 8), 16, 10)
            .cast("long")
            .alias("h2"),
            F.xxhash64("shingle").alias("__sh"),
        )
        .localCheckpoint(eager=True)
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    sig_aggs = [
        F.min(
            (F.col("h1") + F.lit(i) * F.col("h2")) % MINHASH_PRIME
        ).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    cands = lsh_candidate_pairs(
        df, id_col, text_col, n, num_hashes, bands,
        signatures=sh.groupBy(id_col).agg(*sig_aggs),
    )
    a = sh.select(F.col(id_col).alias("id_1"), "__sh")
    b = sh.select(F.col(id_col).alias("id_2"), "__sh")
    # expand each candidate pair by id_1's shingles, then hash-join on
    # the composite (id_2, hash) key — only intersecting shingles
    # survive, so the intermediate is O(candidates x |shingles|), never
    # the |a| x |b| cross section; the candidate set is the small side,
    # broadcast it into the expansion
    inter = (
        F.broadcast(cands)
        .join(a, on="id_1")
        .join(b.hint("shuffle_hash"), on=["id_2", "__sh"])
        .groupBy("id_1", "id_2")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    na = F.broadcast(
        sizes.select(F.col(id_col).alias("id_1"), F.col("n_sh").alias("n_a"))
    )
    nb = F.broadcast(
        sizes.select(F.col(id_col).alias("id_2"), F.col("n_sh").alias("n_b"))
    )
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


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "id_1",
    dst_col: str = "id_2",
    max_iterations: int = 20,
) -> DataFrame:
    """Connected components over an undirected pair graph: each node is
    labeled with the smallest id reachable from it.

    This is the cluster-resolution step every near-dup pipeline needs
    after pair generation: similarity is not transitive (A~B, B~C,
    A!~C), so survivors must be picked per COMPONENT, not per pair.

    Algorithm: iterative min-label propagation — each round every node
    takes the minimum of its own label and its neighbors' labels.
    Converges in O(component diameter) rounds, which for near-dup
    graphs (dense clumps, tiny diameter) is a handful.  Each round is
    one join + partial-agg min keyed by node id; ``localCheckpoint``
    truncates the lineage so round N's plan does not replay rounds
    1..N-1.  Driver-side state is two scalars (changed-count,
    iteration) — labels never leave the cluster.

    Returns (id_col, cluster_id) for every node, singletons included
    (their cluster is themselves).

    Job-count discipline (iterative operators pay fixed job latency
    per round, which dominates when components are small): only edge
    ENDPOINTS iterate — singletons cannot change label and are
    union-ed back at the end.  The per-round checkpoint must stay
    EAGER: a lazy localCheckpoint re-runs the round's lineage on the
    materializing job (measured 2.5x slower end-to-end).
    """
    # symmetrize in ONE pass over the (possibly expensive) edge pipeline:
    # a two-branch union would re-run pair generation per branch.
    #
    # Iteration width is pinned EXPLICITLY (defaultParallelism, i.e.
    # cluster cores).  sym is hash-partitioned on the join key and
    # persist()ed — an InMemoryRelation DOES report its partitioning,
    # so sym's side of the per-round join skips the exchange.  The
    # label state is a localCheckpoint, which under AQE reports
    # UnknownPartitioning (r12 measurement) — ITS side re-exchanges
    # each round, but the state is node-sized narrow rows; the width
    # pin is what matters: each round runs `width` tasks, not
    # spark.sql.shuffle.partitions.  An
    # iterative operator must own its width — inheriting a session
    # default sized for one big fact shuffle (e.g. vanilla 200) makes
    # every tiny label round pay hundreds of task launches (measured
    # 22.7s -> ~4s for d_dup_clusters under a default-conf session).
    from data_management_python_spark.session import operator_width  # noqa: PLC0415

    width = operator_width(edges.sparkSession)
    sym = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col(src_col).alias("a"), F.col(dst_col).alias("b")
                    ),
                    F.struct(
                        F.col(dst_col).alias("a"), F.col(src_col).alias("b")
                    ),
                )
            ).alias("e")
        )
        .select("e.a", "e.b")
        .repartition(width, "a")
        .persist()
    )
    try:
        lbl = (
            sym.select(F.col("a").alias("id"))
            .distinct()
            .select("id", F.col("id").alias("lbl"))
            .repartition(width, "id")
            .localCheckpoint(eager=True)
        )
        for _ in range(max_iterations):
            neighbor_min = (
                sym.join(lbl.withColumnRenamed("id", "a"), on="a")
                .groupBy("b")
                .agg(F.min("lbl").alias("nlbl"))
                .withColumnRenamed("b", "id")
            )
            nxt = (
                lbl.join(neighbor_min, on="id", how="left")
                .select(
                    "id",
                    F.least(
                        F.col("lbl"), F.coalesce(F.col("nlbl"), F.col("lbl"))
                    ).alias("lbl"),
                    F.col("lbl").alias("__old"),
                )
                # re-pin the state width before materializing: keeps
                # every round's checkpoint (and the next round's join)
                # at the operator's own width
                .repartition(width, "id")
                .localCheckpoint(eager=True)
            )
            changed = nxt.filter(F.col("lbl") != F.col("__old")).count()
            lbl = nxt.drop("__old")
            if changed == 0:
                break
        # anti-join against the CHECKPOINTED label state (same id set as
        # sym's endpoints), never against sym: sym is unpersisted on
        # return, so a returned plan referencing it would re-run the
        # whole edge pipeline on every downstream action (measured 2x
        # the full LSH+verify cost inside d_dup_clusters)
        singletons = (
            nodes.select(F.col(id_col).alias("id"))
            .join(lbl.select("id"), "id", "left_anti")
            .select("id", F.col("id").alias("lbl"))
        )
        return lbl.unionByName(singletons).select(
            F.col("id").alias(id_col), F.col("lbl").alias("cluster_id")
        )
    finally:
        sym.unpersist()


def span_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    mod_p: int = 4,
) -> DataFrame:
    """Sampled fingerprints of k-token spans: (id, pos, fp).

    Every k-gram is hashed (md5-derived 32-bit int, deterministic);
    fingerprints with ``hash % mod_p == 0`` are kept — the standard
    hash-sampling scheme for document fingerprinting (the simpler
    sibling of winnowing): expected density 1/mod_p, and any span
    shared verbatim by two documents yields the SAME sampled subset on
    both sides, so shared spans cannot be missed by sampling skew.
    Map-side only: tokenize, k-gram hash per position, filter, explode.
    """
    toked, _sh = _shingle_parts(df, id_col, text_col, k, distinct=False)
    grams = F.transform(
        F.sequence(F.lit(1), F.size("__toks") - (k - 1)),
        lambda i: F.struct(
            (i - 1).cast("bigint").alias("pos"),
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            " ",
                            *[
                                F.element_at(F.col("__toks"), i + j)
                                for j in range(k)
                            ],
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            )
            .cast("long")
            .alias("fp"),
        ),
    )
    return (
        toked.select(F.col(id_col), F.explode(grams).alias("g"))
        .select(id_col, F.col("g.pos").alias("pos"), F.col("g.fp").alias("fp"))
        .filter(F.col("fp") % mod_p == 0)
    )


def duplicated_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    mod_p: int = 4,
) -> DataFrame:
    """K-token spans appearing verbatim in more than one document —
    the span-level (substring) duplication sweep run before training
    (repeated boilerplate/quotes survive document-level dedup; Lee et
    al.'s dedup work is the public reference point).  Output per
    duplicated sampled fingerprint: (fp, n_docs, n_occurrences,
    min_id, max_id).

    Scale shape: fingerprint generation is map-side with 1/mod_p
    density; the only shuffle is the fingerprint groupBy (partial agg)
    — never a self-join, so hot spans cost rows, not pairs.
    """
    fps = span_fingerprints(df, id_col, text_col, k, mod_p)
    return (
        fps.groupBy("fp")
        .agg(
            F.countDistinct(id_col).alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min(id_col).alias("min_id"),
            F.max(id_col).alias("max_id"),
        )
        .filter(F.col("n_docs") >= 2)
    )


def shingle_array_expr(col: Column | str, n: int = 3) -> Column:
    """Distinct word-n-gram shingle ARRAY of a text column as a pure
    expression — usable anywhere a projection is legal (including
    streaming stages).

    The token array is bound through an outer single-element
    ``transform`` lambda: inside the inner lambda every
    ``element_at(t, ...)`` references the LAMBDA VARIABLE, which is
    evaluated once per row — referencing the raw ``split()`` there
    instead would re-run the regex split per element access
    (O(tokens^2 x len) per document; the codegen subexpression
    eliminator does not reach into higher-order-function lambdas).
    Unlike :func:`_shingle_parts`' materialized-column shape, this
    stays a self-contained expression, so no projection barrier is
    needed at call sites."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(F.trim(F.lower(c)), r"\s+")

    def _shingles_of(t: Column) -> Column:
        return F.when(
            F.size(t) >= n,
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size(t) - (n - 1)),
                    lambda i: F.concat_ws(
                        " ", *[F.element_at(t, i + k) for k in range(n)]
                    ),
                )
            ),
        ).otherwise(F.array().cast("array<string>"))

    return F.element_at(F.transform(F.array(toks), _shingles_of), 1)


def verify_candidates_against_corpus(
    candidates: DataFrame,
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Exact-Jaccard confirmation of (doc_id, first_id) candidate pairs
    against a corpus snapshot — the verify half of the streaming
    near-dup contract (:func:`streaming.dedup.stream_lsh_candidates`
    emits the candidates; this closes them).

    Both joins are CANDIDATE x corpus equi-joins (stream-static joins
    are legal in append mode, so this composes directly into the
    streaming query), and the Jaccard itself is a map-side
    array_intersect/array_union over shingle arrays — no shuffle
    beyond the two id joins.  Pairs whose ids are missing from the
    snapshot drop out (re-verify against the next snapshot).
    """
    t1 = corpus.select(
        F.col(id_col).alias("doc_id"),
        shingle_array_expr(text_col, n).alias("__sh1"),
    )
    t2 = corpus.select(
        F.col(id_col).alias("first_id"),
        shingle_array_expr(text_col, n).alias("__sh2"),
    )
    joined = candidates.join(t1, "doc_id").join(t2, "first_id")
    inter = F.size(F.array_intersect("__sh1", "__sh2"))
    union = F.size(F.array_union("__sh1", "__sh2"))
    jac = F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))
    return (
        joined.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .drop("__sh1", "__sh2")
    )


def minhash_band_table(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    out_id: str = "doc_id",
) -> DataFrame:
    """The (id, band, band_sig) LSH band table for a corpus — the
    asset a standing-corpus dedup deployment MATERIALIZES once (write
    it with sources.sinks.write_bucketed_table, or hold it in
    operators.session_cache for a session) and probes with every new
    batch.  Map-only: signatures via the no-shuffle array-fold
    variant, bands exploded from the signature struct."""
    sig = minhash_signature_map_side(df, id_col, text_col, n, num_hashes)
    bs = band_signature_structs(num_hashes, bands)
    return sig.select(
        F.col(id_col).alias(out_id), F.explode(bs).alias("bs")
    ).select(
        out_id,
        F.col("bs.band").alias("band"),
        F.col("bs.band_sig").alias("band_sig"),
    )


def incremental_near_dup(
    base: DataFrame,
    delta: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.2,
    base_bands: DataFrame | None = None,
) -> DataFrame:
    """Which DELTA documents near-duplicate an existing BASE document —
    the incremental form every production dedup actually runs (today's
    crawl against the standing corpus), as opposed to the all-pairs
    self-join over base ∪ delta, which re-pays the base x base work on
    every batch.

    Shape: map-only MinHash signatures on BOTH sides (the no-shuffle
    array-fold variant), banded bucket join delta->base (shuffle keyed
    by band signature, skew bounded by bucket population), then exact
    Jaccard verification on candidates only via map-side shingle-array
    intersection.  Work scales with |delta| + matching bucket volume —
    the base side contributes one signature pass that a real
    deployment would have materialized already (write the base band
    table with :func:`sources.sinks.write_bucketed_table` and the
    per-batch cost drops to delta-only).  Pass that materialized
    table as ``base_bands`` (columns (base_id, band, band_sig), e.g.
    from :func:`minhash_band_table`) and the base-side signature pass
    is skipped — the registered d_incremental_dedup query holds it in
    operators.session_cache, the session-scoped stand-in for the
    bucketed table a deployment keeps on disk.

    Output: (delta_id, base_id, jaccard >= threshold).  Pairs within
    delta are NOT reported (run the self-join path for those).
    """
    from data_management_python_spark.session import operator_width  # noqa: PLC0415

    # widen both inputs once: signatures and the verify-side shingle
    # arrays are MAP-ONLY, so their parallelism is whatever the input
    # carries — a few-partition source would run all four per-row
    # passes serially (measured 3x on the signature pass alone)
    width = operator_width(base.sparkSession)
    base = base.repartition(width)
    delta = delta.repartition(width)

    b_bands = (
        base_bands
        if base_bands is not None
        else minhash_band_table(
            base, id_col, text_col, n, num_hashes, bands, out_id="base_id"
        )
    )
    # materialize the candidate set once: it feeds THREE consumers
    # (the verify join's broadcast, the base-size semi-join, and the
    # final shape) and each broadcast would otherwise re-run the whole
    # signature + banded-join pipeline
    cands = (
        minhash_band_table(
            delta, id_col, text_col, n, num_hashes, bands, out_id="delta_id"
        )
        .join(b_bands, on=["band", "band_sig"])
        .select("delta_id", "base_id")
        .distinct()
        .localCheckpoint(eager=True)
    )
    # verification uses the NARROW counting join (near_dup_pairs'
    # shape): candidate pairs expand by the delta side's hashed
    # shingles and meet the base side on (base_id, hash) — rows carry
    # two ids + one long, never a pair of whole shingle ARRAYS, whose
    # per-pair duplication measured ~3x this join's cost.  The
    # candidate table broadcasts (bounded by near-dup density, the
    # same envelope as near_dup_pairs' verification).
    # BOTH sides semi-join down to the ids that appear in any
    # candidate pair BEFORE the tokenize+explode (bounded by near-dup
    # density, same envelope as cands itself): the base-side shingle
    # table used to be checkpointed at FULL corpus size — the largest
    # materialization in the query — when only candidate base docs are
    # ever consumed (the counting join meets cands, the size agg is
    # broadcast per candidate id).  Work and checkpoint size now scale
    # with |delta|'s matches, never with |base|.
    def hashed_sized(df: DataFrame, key: str, out_n: str) -> DataFrame:
        ids = cands.select(F.col(key).alias(id_col)).distinct()
        part = df.join(F.broadcast(ids), id_col, "left_semi")
        toked, shx = _shingle_parts(part, id_col, text_col, n, distinct=True)
        return toked.select(
            F.col(id_col).alias(key),
            F.size(shx).alias(out_n),
            F.explode(shx).alias("shingle"),
        ).select(key, out_n, F.xxhash64("shingle").alias("__sh"))

    # per-doc sizes ride along map-side (sized_shingles shape), so no
    # separate size aggregation or join exists; each side materializes
    # ONCE (candidate docs only) for its single consumer pair.  The
    # base side stays a shuffle-hash join, NOT a broadcast: candidate
    # density bounds the PAIR count but sh_b is shingle-level fan-out
    # (candidate base docs x shingles per doc) — on a re-crawl where
    # nearly every base doc is a candidate, a forced broadcast would
    # bypass autoBroadcastJoinThreshold and OOM a job the shuffle-hash
    # shape completes.  Zero-intersection candidates drop in the inner
    # join, which is correct here: their jaccard is 0 and the output
    # filters to >= threshold.
    sh_d = hashed_sized(delta, "delta_id", "n_a").localCheckpoint(eager=True)
    sh_b = hashed_sized(base, "base_id", "n_b").localCheckpoint(eager=True)
    return (
        F.broadcast(cands)
        .join(sh_d, on="delta_id")
        .join(sh_b.hint("shuffle_hash"), on=["base_id", "__sh"])
        .groupBy("delta_id", "base_id", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
        .select(
            "delta_id",
            "base_id",
            (
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def remove_duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    mod_p: int = 4,
) -> DataFrame:
    """The WRITE side of span-level dedup (the removal step of the
    exact-substring dedup literature — Lee et al. 2021 — whose
    detection half is :func:`duplicated_spans`): for every sampled
    k-token fingerprint shared verbatim across documents, the
    occurrence in the LOWEST-id document survives and every other
    occurrence's k-token window is excised; each document is rebuilt
    from its surviving tokens.

    Output: (id, clean_text, n_tokens_removed) — one row per input
    document, text whitespace-NORMALIZED (single spaces) for removed
    and untouched documents alike, so downstream tokenization sees one
    format.  Tokens are cut from the ORIGINAL-case text; the
    fingerprints are computed on the lowercased form (same whitespace
    split, so positions align) — exactly the detection pass's hashes.

    Scale shape: fingerprinting is map-side at 1/mod_p density, the
    duplicate resolution is one partial-agg groupBy(fp) (no
    self-join), removals flow back as an (id, pos) frame that
    aggregates to ONE covered-position array per touched document, and
    the excision itself is a pure column expression (token index
    filtered by EXISTS over the array) — no Python in the path.  A
    document's cost is O(tokens x its removal count); untouched
    documents never join anything (left join, NULL-safe rebuild).
    """
    fps = span_fingerprints(df, id_col, text_col, k, mod_p)
    # (r12 audit: a windows-over-one-pass rewrite — the t_tfidf_topk
    # transform — was measured SLOWER here, steady 0.43 -> 0.62 s at
    # sf0.1: the full (fp,id,pos) sort costs more than the second
    # map-only fingerprint pass it saves, and the keeper table
    # broadcasts.  Kept as the two-branch shape deliberately.)
    keepers = (
        fps.groupBy("fp")
        .agg(
            F.min(id_col).alias("__keeper"),
            F.countDistinct(id_col).alias("__nd"),
        )
        .filter(F.col("__nd") >= 2)
        .select("fp", "__keeper")
    )
    removals = (
        fps.join(keepers, "fp")
        .filter(F.col(id_col) != F.col("__keeper"))
        .groupBy(id_col)
        .agg(F.collect_set("pos").alias("__cut"))
    )
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    kept = F.filter(
        F.transform(
            toks,
            lambda t, i: F.struct(t.alias("t"), i.alias("i")),
        ),
        lambda s: ~F.exists(
            F.col("__cut"),
            lambda p: (s["i"] >= p) & (s["i"] < p + F.lit(k)),
        ),
    )
    out = df.join(removals, on=id_col, how="left")
    cleaned = F.when(
        F.col("__cut").isNull(), F.array_join(toks, " ")
    ).otherwise(
        F.array_join(
            F.transform(kept, lambda s: s["t"]), " "
        )
    )
    removed = F.when(F.col("__cut").isNull(), F.lit(0)).otherwise(
        F.size(toks) - F.size(kept)
    )
    return out.select(
        F.col(id_col),
        cleaned.alias("clean_text"),
        removed.cast("bigint").alias("n_tokens_removed"),
    )


def ngram_novelty(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Per-document n-gram NOVELTY profile: of a document's distinct
    word n-gram shingles, what share appears in no other document —
    the corpus-internal duplication/memorization-risk signal (C4/
    Gopher's "duplicate n-gram fraction" family) that complements the
    pairwise dedup ops: a doc can evade pair-level Jaccard yet still
    be mostly boilerplate shared across hundreds of documents.

    Shape: the standard tokenize-once shingle explode, then every
    shuffle runs on a 60-bit md5-derived shingle HASH instead of the
    shingle string — the doc-frequency agg and the join back move
    8-byte longs, not ~25-byte text keys (measured 3x on the novelty
    profile at sf0.1; both engines hash identically, so even a
    collision — ~|shingles|^2 / 2^61 — yields the same counts on both
    sides).  Two shuffles, no driver state.  ``novel_ratio`` is an
    exact integer division rounded at the aggregate; ``max_dup_docs``
    is the doc frequency of the document's most-shared shingle (how
    viral its worst boilerplate is).  Tokenization goes through
    :func:`_shingle_parts` — the materialized-token-array shape whose
    filter barrier stops CollapseProject from re-inlining the regex
    split into the shingle lambda (the O(tokens^2 x len) per-doc trap;
    measured 20s -> 0.5s for the shingle stage at sf0.1).
    """
    sh = word_shingles(docs, id_col, text_col, n, distinct=True).select(
        id_col,
        F.conv(F.substring(F.md5("shingle"), 1, 15), 16, 10)
        .cast("long")
        .alias("__h"),
    )
    # r12: doc frequency as a WINDOW over the single shingle frame, not
    # a groupBy branch joined back.  The branch re-planned the whole
    # tokenize+explode+md5 subtree (two corpus scans), and its
    # (__h, count) build side is the full DISTINCT-SHINGLE table — not
    # broadcastable at 100 TB, where the join degrades to shuffling
    # both exploded sides.  The window shuffles the exploded frame
    # ONCE on __h; counts are exact integers either way (guide §2.4).
    from pyspark.sql.window import Window  # noqa: PLC0415

    w = Window.partitionBy("__h")
    return (
        sh.withColumn("__nd", F.count(F.lit(1)).over(w))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("__nd") == 1, 1).otherwise(0)).alias(
                "n_novel"
            ),
            F.round(
                F.sum(
                    F.when(F.col("__nd") == 1, 1).otherwise(0)
                ).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("novel_ratio"),
            F.max("__nd").alias("max_dup_docs"),
        )
    )


# -- content-defined chunking ------------------------------------------------
#
# Rabin-style polynomial rolling hash over the trailing ``window``
# characters: h = sum_j cp[j] * B^(w-1-j) mod M, boundary when
# h < M * boundary_mod / 256.  B = 263 deliberately (NOT 257: 257 == 1
# mod 256, which would make the low byte an order-INDEPENDENT char sum
# and anagram windows would share boundaries); comparing the full
# modulus against a threshold uses all 20 hash bits.  The same
# constants drive the O(1)-per-byte production scan (mapInPandas,
# numpy), the engine-portable explode twin, and the DuckDB oracle —
# identical chunking in all three by construction.

CDC_B = 263
CDC_M = 1 << 20


def _cdc_poly_coeffs(window: int) -> list[int]:
    return [pow(CDC_B, window - 1 - j, CDC_M) for j in range(window)]


def cdc_poly_oracle_sql(window: int = 24, boundary_mod: int = 4) -> str:
    """The DuckDB boundary-position CTE body for the polynomial rule —
    generated next to the constants so the oracle can never drift from
    the Spark implementations."""
    coeffs = "[" + ",".join(str(c) for c in _cdc_poly_coeffs(window)) + "]"
    thr = (CDC_M // 256) * boundary_mod
    return (
        f"SELECT doc_id, i AS e "
        f"FROM base, UNNEST(generate_series({window}, len(text) - 1)) AS u(i) "
        f"WHERE list_sum(list_transform(range(0, {window}), j -> "
        f"unicode(substr(text, i - {window - 1} + j, 1)) * ({coeffs})[j + 1])) "
        f"% {CDC_M} < {thr}"
    )


def _cdc_chunks_rolling(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    window: int,
    boundary_mod: int,
) -> DataFrame:
    """PRODUCTION boundary scan: one Arrow-batched pass per document,
    O(1) amortized per character (numpy computes all window hashes in
    ``window`` vectorized adds), chunk md5 in C via hashlib — no
    per-position explode, no shuffle until the chunk-hash agg.  Emits
    (id, __clen, __h): the exact rows the explode twin produces, so
    the whole downstream plan (frequency join + per-doc rollup) is
    shared and the DuckDB oracle replays every hash."""
    import pandas as pd  # noqa: PLC0415

    coeffs = _cdc_poly_coeffs(window)
    thr = (CDC_M // 256) * boundary_mod
    id_type = dict(docs.dtypes)[id_col]
    out_schema = f"{id_col} {id_type}, __clen int, __h string"

    def gen(batches):
        import hashlib  # noqa: PLC0415

        import numpy as np  # noqa: PLC0415

        c_arr = np.array(coeffs, dtype=np.int64)
        for pdf in batches:
            texts, dids = [], []
            for did, txt in zip(pdf[id_col], pdf[text_col]):
                if txt is None or len(txt) < 1:
                    continue
                texts.append(txt)
                dids.append(did)
            if not texts:
                yield pd.DataFrame(
                    {id_col: [], "__clen": [], "__h": []}
                )
                continue
            # ONE concatenated codepoint array per Arrow batch: the
            # window hashes for every doc compute in `window`
            # vectorized adds over the whole batch (per-doc numpy
            # dispatch overhead dominated short-doc corpora);
            # cross-doc windows are masked out afterwards
            big = "".join(texts)
            cp = np.frombuffer(
                big.encode("utf-32-le"), dtype=np.uint32
            ).astype(np.int64)
            n_total = len(cp)
            lens = np.array([len(t) for t in texts], dtype=np.int64)
            starts = np.concatenate(
                ([0], np.cumsum(lens)[:-1])
            )  # global 0-based doc starts
            di = np.array([], dtype=np.int64)
            local_e = np.array([], dtype=np.int64)
            if n_total >= window:
                # acc[k] = hash of cp[k : k+window] (1-based global
                # end k+window); max accumulator 24 * 2^20 * 0x10FFFF
                # < 2^46, inside int64 with one final mod
                acc = np.zeros(n_total - window + 1, dtype=np.int64)
                for j in range(window):
                    acc += cp[j : j + n_total - window + 1] * c_arr[j]
                cand = np.nonzero((acc % CDC_M) < thr)[0] + window
                di = np.searchsorted(starts, cand - 1, side="right") - 1
                local_e = cand - starts[di]
                # keep ends whose window sits fully inside the doc and
                # that are not the doc's final char (the end is always
                # a chunk end anyway): e in [window, len-1]
                valid = (local_e >= window) & (local_e <= lens[di] - 1)
                di, local_e = di[valid], local_e[valid]
            ids_out, lens_out, hs_out = [], [], []
            ptr, nb = 0, len(di)
            for k, (did, txt) in enumerate(zip(dids, texts)):
                s = 0
                while ptr < nb and di[ptr] == k:
                    e = int(local_e[ptr])
                    ptr += 1
                    ids_out.append(did)
                    lens_out.append(e - s)
                    hs_out.append(
                        hashlib.md5(txt[s:e].encode("utf-8")).hexdigest()
                    )
                    s = e
                ids_out.append(did)
                lens_out.append(len(txt) - s)
                hs_out.append(
                    hashlib.md5(txt[s:].encode("utf-8")).hexdigest()
                )
            yield pd.DataFrame(
                {id_col: ids_out, "__clen": lens_out, "__h": hs_out}
            )

    return docs.select(id_col, text_col).mapInPandas(gen, out_schema)


def _cdc_chunks_explode(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    window: int,
    boundary_mod: int,
    boundary: str,
) -> DataFrame:
    """Engine-portable boundary scan: per-character position explode,
    boundary predicate as a pure column expression (``md5`` — the
    original rsync-flavored rule — or ``poly``, the rolling hash's
    exact math), then a doc-partitioned window pairs consecutive
    boundaries into chunks.  O(chars) exploded rows: the honest cost
    of a content-defined scan without a sequential pass — kept as the
    parity twin the production path is pinned against."""
    from pyspark.sql.window import Window  # noqa: PLC0415

    base = docs.select(F.col(id_col), F.col(text_col).alias("__txt")).filter(
        F.length("__txt") >= 1
    )
    pos = base.select(
        id_col,
        "__txt",
        F.explode(
            F.when(
                F.length("__txt") - 1 >= window,
                F.sequence(F.lit(window), F.length("__txt") - 1),
            ).otherwise(F.array().cast("array<int>"))
        ).alias("__i"),
    )
    if boundary == "md5":
        pred = (
            F.conv(
                F.substring(
                    F.md5(
                        F.substring(
                            F.col("__txt"),
                            F.col("__i") - (window - 1),
                            F.lit(window),
                        )
                    ),
                    1,
                    2,
                ),
                16,
                10,
            ).cast("int")
            < boundary_mod
        )
    elif boundary == "poly":
        coeffs = F.array(*[F.lit(c) for c in _cdc_poly_coeffs(window)])
        thr = (CDC_M // 256) * boundary_mod
        h = F.aggregate(
            F.sequence(F.lit(0), F.lit(window - 1)),
            F.lit(0).cast("long"),
            lambda acc, j: acc
            + F.ascii(
                F.col("__txt").substr(
                    F.col("__i") - F.lit(window - 1) + j, F.lit(1)
                )
            ).cast("long")
            * F.element_at(coeffs, (j + F.lit(1)).cast("int")).cast(
                "long"
            ),
        )
        pred = (h % F.lit(CDC_M)) < F.lit(thr)
    else:
        raise ValueError(f"unknown boundary rule {boundary!r}")
    bounds = pos.filter(pred).select(
        id_col, "__txt", F.col("__i").alias("__e")
    )
    ends = bounds.unionByName(
        base.select(id_col, "__txt", F.length("__txt").alias("__e"))
    )
    w = Window.partitionBy(id_col).orderBy("__e")
    return ends.withColumn(
        "__s", F.lag("__e", 1, 0).over(w) + 1
    ).select(
        id_col,
        (F.col("__e") - F.col("__s") + 1).alias("__clen"),
        F.md5(
            F.substring(
                F.col("__txt"), F.col("__s"), F.col("__e") - F.col("__s") + 1
            )
        ).alias("__h"),
    )


def _cdc_rollup(chunks: DataFrame, id_col: str) -> DataFrame:
    # r12: chunk-hash document frequency via WINDOWS over the single
    # chunk frame — the former groupBy(countDistinct)+join-back paid
    # two O(chunks) shuffles (and the frequency table is NOT a
    # broadcastable dim at corpus scale); the windows shuffle the
    # chunk frame ONCE on __h.  The distinct-doc count folds the
    # lag-based "first row of this id in this hash" flag (rows sorted
    # by id within __h) — exactly countDistinct's value (guide §2.4).
    from pyspark.sql.window import Window  # noqa: PLC0415

    w = Window.partitionBy("__h")
    wseq = Window.partitionBy("__h").orderBy(id_col)
    new_doc = F.when(
        F.lag(id_col).over(wseq).isNull()
        | (F.lag(id_col).over(wseq) != F.col(id_col)),
        1,
    ).otherwise(0)
    return (
        chunks.withColumn("__new", new_doc)
        .withColumn("__nd", F.sum("__new").over(w))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.when(F.col("__nd") > 1, 1).otherwise(0)).alias(
                "n_shared_chunks"
            ),
            F.round(
                F.sum(
                    F.when(F.col("__nd") > 1, F.col("__clen")).otherwise(0)
                ).cast("double")
                / F.sum("__clen"),
                6,
            ).alias("shared_char_ratio"),
        )
    )


def cdc_chunk_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 24,
    boundary_mod: int = 4,
    boundary: str = "md5",
    engine: str = "explode",
) -> DataFrame:
    """Content-defined chunking (CDC) dedup profile: split each
    document at CONTENT-DERIVED boundaries — a position ends a chunk
    when the hash of the trailing ``window`` characters falls under
    ``boundary_mod``/256 of the hash space — then report, per
    document, how much of it is made of chunks byte-identical to a
    chunk of some OTHER document.  Content-defined boundaries are what
    make the chunking insertion-stable (an edit shifts at most the
    chunk it lands in, unlike fixed-width blocks), the property
    rsync/LBFS/backup dedup built on and the reason span-level corpus
    dedup uses it.

    Expected chunk length is ``256/boundary_mod * 16`` chars at the
    defaults (~64): long enough to be meaningful, short enough that
    near-dup documents still share most chunks.

    Two engines, one downstream plan (chunk-hash frequency join +
    per-doc rollup):

    - ``engine="explode"`` — per-character position explode with the
      boundary predicate as a pure column expression (``boundary`` in
      {"md5", "poly"}); engine-portable, the form a SQL oracle can
      replay position by position.
    - ``engine="rolling"`` (requires ``boundary="poly"``) — the
      PRODUCTION path: one Arrow-batched mapInPandas pass computes
      every window hash in ``window`` vectorized numpy adds (O(1)
      amortized per character) and the chunk md5 in C, emitting only
      (id, len, hash) rows.  No explode, no O(chars) shuffle — at
      100 TB the scan is a map-only pass whose output is
      O(chars / 64).  Pinned chunk-for-chunk against the explode twin
      by tests/test_cdc_rolling.py.
    """
    if engine == "rolling":
        if boundary != "poly":
            raise ValueError(
                "engine='rolling' implements the polynomial boundary "
                "rule; pass boundary='poly' (md5 is not a rolling hash)"
            )
        chunks = _cdc_chunks_rolling(
            docs, id_col, text_col, window, boundary_mod
        )
        # the rollup references the chunk frame twice (frequency agg
        # + the join back); without a materialization the Arrow scan
        # runs twice — checkpoint the ~chars/64 chunk rows once.
        # Input partitioning carries through: large corpora are
        # already split by files.maxPartitionBytes, so the scan
        # parallelizes without an extra text shuffle
        chunks = chunks.localCheckpoint(eager=True)
    elif engine == "explode":
        chunks = _cdc_chunks_explode(
            docs, id_col, text_col, window, boundary_mod, boundary
        )
    else:
        raise ValueError(f"unknown engine {engine!r}")
    return _cdc_rollup(chunks, id_col)


def _suffix_occurrences(
    df: DataFrame, id_col: str, text_col: str, k: int
) -> tuple[DataFrame, DataFrame]:
    """(tokenized docs, anchor occurrences) shared by the suffix-span
    family: one row per k-gram position with its 60-bit md5 anchor —
    the relational stand-in for a suffix array's sorted positions.
    The occurrence scan is repartitioned by id so the tokenize+md5
    explode parallelizes regardless of the input's file count."""
    from data_management_python_spark.session import (  # noqa: PLC0415
        operator_width,
    )

    toked = df.select(
        F.col(id_col),
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("__toks"),
    ).filter(F.size("__toks") >= k)
    grams = F.transform(
        F.sequence(F.lit(1), F.size("__toks") - (k - 1)),
        lambda i: F.struct(
            i.cast("int").alias("pos"),
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            " ",
                            *[
                                F.element_at(F.col("__toks"), i + j)
                                for j in range(k)
                            ],
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            )
            .cast("long")
            .alias("h"),
        ),
    )
    width = operator_width(df.sparkSession)
    occ = (
        toked.repartition(width, id_col)
        .select(F.col(id_col), F.explode(grams).alias("g"))
        .select(
            id_col, F.col("g.pos").alias("__pos"), F.col("g.h").alias("__h")
        )
    )
    return toked, occ


def _spans_from_anchor_pairs(pairs: DataFrame, k: int) -> DataFrame:
    """Maximal spans from shared-anchor pairs (__da, __db, __pa, __pb):
    a span of L tokens is L-k+1 consecutive anchors at constant
    offset, so group by (pair, __pa - __pb) and the islands trick
    (pos minus rank) recovers every maximal run; the best-span window
    then keeps the longest per pair (ties by start positions)."""
    from pyspark.sql.window import Window  # noqa: PLC0415

    wd = Window.partitionBy("__da", "__db", "__delta").orderBy("__pa")
    runs = pairs.withColumn(
        "__delta", F.col("__pa") - F.col("__pb")
    ).withColumn("__grp", F.col("__pa") - F.row_number().over(wd))
    spans = runs.groupBy("__da", "__db", "__delta", "__grp").agg(
        (F.count(F.lit(1)) + (k - 1)).alias("span_tokens"),
        F.min("__pa").alias("start_a"),
        F.min("__pb").alias("start_b"),
    )
    wp = Window.partitionBy("__da", "__db").orderBy(
        F.desc("span_tokens"), F.asc("start_a"), F.asc("start_b")
    )
    return (
        spans.withColumn("__rn", F.row_number().over(wp))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__delta", "__grp")
    )


def _spans_with_text(
    best: DataFrame, toked: DataFrame, id_col: str
) -> DataFrame:
    return best.join(
        toked.select(F.col(id_col).alias("__da"), "__toks"), "__da"
    ).select(
        F.col("__da").alias("doc_a"),
        F.col("__db").alias("doc_b"),
        F.col("span_tokens").cast("bigint").alias("span_tokens"),
        F.col("start_a").cast("bigint").alias("start_a"),
        F.col("start_b").cast("bigint").alias("start_b"),
        F.concat_ws(
            " ",
            F.slice(F.col("__toks"), F.col("start_a"), F.col("span_tokens")),
        ).alias("span_text"),
    )


def longest_duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    max_gram_freq: int = 64,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """EXACT longest duplicated token span per document pair — the
    read side of the suffix-array substring-dedup family (Lee et al.
    2022), complementing the SAMPLED detection
    (:func:`duplicated_spans`) and the span WRITE side
    (:func:`remove_duplicated_spans`).

    Relational suffix-array equivalence: a span of L >= k tokens
    shared verbatim by two documents appears as L-k+1 consecutive
    shared k-gram anchors at a CONSTANT position offset, so grouping
    shared-anchor pairs by (doc_a, doc_b, pos_a - pos_b) and finding
    maximal consecutive pos_a runs (the islands trick: pos_a minus
    its rank) recovers every maximal duplicated span exactly — the
    same answer a per-bucket suffix ordering yields, expressed as one
    hash-keyed self-join plus two windows instead of an index build.

    Scale shape: anchors are 60-bit md5 hashes (8-byte shuffle keys,
    never strings), one partial-agg frequency pass gates degenerate
    grams BEFORE the self-join (``max_gram_freq`` caps per-gram
    occurrence count, bounding pair fan-out to C(cap, 2) per gram —
    the boilerplate/stop-gram explosion every suffix-array dedup
    truncates one way or another), the join is bucket-local on the
    hash, and the windows partition by (pair, delta): no step holds
    more than one gram bucket or one pair's anchors.  Returns one row
    per document pair: (doc_a, doc_b, span_tokens, start_a, start_b,
    span_text) with 1-based token positions, longest span first on
    ties by (start_a, start_b); pairs sharing no >= k-token span
    produce no row.  Brute-force-pinned by
    tests/test_suffix_spans.py; the registered oracle replays the
    identical hash math.
    """
    # ``pairs``: an already-materialized _longest_span_pairs frame
    # with the SAME corpus and parameters (the session-cached family
    # share, r12) — skip the build AND the re-pin.
    if pairs is not None:
        best = pairs
    else:
        # the span-text pass consumes best twice (result-doc id set +
        # the slice join); it is one row per duplicated pair — pin it
        # so the whole anchor/window pipeline plans once (r12, §2.4)
        best = _longest_span_pairs(
            df, id_col, text_col, k, max_gram_freq
        ).localCheckpoint(eager=True)
    # tokenize ONLY documents that appear as doc_a in a result —
    # O(results), never a second full-corpus tokenize pass (r12)
    a_ids = best.select(F.col("__da").alias(id_col)).distinct()
    toked_a = df.join(F.broadcast(a_ids), id_col, "left_semi").select(
        F.col(id_col),
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("__toks"),
    )
    return _spans_with_text(best, toked_a, id_col)


def _longest_span_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    max_gram_freq: int,
) -> DataFrame:
    """Pair-detection core of :func:`longest_duplicate_spans` —
    (__da, __db, span_tokens, start_a, start_b), no span text, so the
    write side (:func:`excise_duplicate_spans`) never pays the text
    join it does not read."""
    from pyspark.sql.window import Window  # noqa: PLC0415

    _, occ = _suffix_occurrences(df, id_col, text_col, k)
    # ONE hash-keyed shuffle gates AND dedups the anchor scan: the
    # old groupBy-then-join computed the tokenize+md5 explode twice
    # (once per shuffle); window aggregates over the same partition
    # do both in a single pass.
    wg = Window.partitionBy("__h")
    shared = (
        occ.withColumn("__n", F.count(F.lit(1)).over(wg))
        .withColumn(
            "__nd", F.size(F.collect_set(F.col(id_col)).over(wg))
        )
        .filter(
            (F.col("__n") <= max_gram_freq) & (F.col("__nd") >= 2)
        )
        .drop("__n", "__nd")
        # the self-join below references this frame twice; the gated
        # anchor set is the (bounded) duplication structure — the
        # same standing-asset shape as the LSH band table — so
        # materialize it once instead of re-running the scan per side
        .localCheckpoint(eager=True)
    )
    a = shared.select(
        F.col("__h"),
        F.col(id_col).alias("__da"),
        F.col("__pos").alias("__pa"),
    )
    b = shared.select(
        F.col("__h"),
        F.col(id_col).alias("__db"),
        F.col("__pos").alias("__pb"),
    )
    pairs = a.join(b, "__h").filter(F.col("__da") < F.col("__db"))
    return _spans_from_anchor_pairs(pairs, k)


def suffix_gate_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    max_gram_freq: int = 64,
) -> DataFrame:
    """OBSERVABILITY for the suffix-span frequency gate (round-10
    verdict item: ``max_gram_freq`` silently truncates recall on
    boilerplate-heavy corpora — standard for the family, but the
    operator emitted no signal about how much was gated).  One row:
    total anchors, anchors dropped by the cap, distinct grams dropped,
    and the gated share — cheap (the same single anchor scan +
    per-gram aggregate the detection pass runs) and monitorable: a
    rising ``gated_share`` means spans are being missed and the cap
    (or the boilerplate stripping upstream) needs attention."""
    _, occ = _suffix_occurrences(df, id_col, text_col, k)
    per_gram = occ.groupBy("__h").agg(F.count(F.lit(1)).alias("__n"))
    return per_gram.agg(
        F.sum("__n").cast("bigint").alias("n_anchors"),
        F.sum(
            F.when(F.col("__n") > max_gram_freq, F.col("__n")).otherwise(
                F.lit(0)
            )
        )
        .cast("bigint")
        .alias("n_gated_anchors"),
        F.count(F.lit(1)).cast("bigint").alias("n_grams"),
        F.sum(
            F.when(F.col("__n") > max_gram_freq, 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_gated_grams"),
    ).select(
        "n_anchors",
        "n_gated_anchors",
        "n_grams",
        "n_gated_grams",
        F.round(
            F.col("n_gated_anchors")
            / F.greatest(F.col("n_anchors"), F.lit(1)),
            6,
        ).alias("gated_share"),
    )


def incremental_span_gate_stats(
    union_summary: DataFrame,
    delta_counts: DataFrame,
    max_gram_freq: int = 64,
    batch_id: int | None = None,
) -> DataFrame:
    """Gate observability for the INCREMENTAL / STREAMING
    exact-substring paths — the per-batch twin of
    :func:`suffix_gate_stats` (which covers the one-shot operator).
    ``union_summary`` carries the UNION occurrence counts (standing
    summary merged with the batch: exactly what the probe gates on);
    ``delta_counts`` is the batch's per-gram counts (__h, __nd).  One
    row: anchors/grams the batch contributed, how many fell to the
    frequency gate at union counts, and the gated share — the number
    that turns silent recall truncation into a monitorable drift
    signal exactly where it matters operationally (a rising
    ``gated_share`` across batches means boilerplate is saturating
    the cap and spans are being missed)."""
    j = union_summary.join(F.broadcast(delta_counts), "__h")
    out = j.agg(
        F.coalesce(F.sum("__nd"), F.lit(0))
        .cast("bigint")
        .alias("n_anchors"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("__n") > max_gram_freq, F.col("__nd")
                ).otherwise(F.lit(0))
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("n_gated_anchors"),
        F.count(F.lit(1)).cast("bigint").alias("n_grams"),
        F.coalesce(
            F.sum(
                F.when(F.col("__n") > max_gram_freq, 1).otherwise(0)
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("n_gated_grams"),
    ).select(
        "n_anchors",
        "n_gated_anchors",
        "n_grams",
        "n_gated_grams",
        F.round(
            F.col("n_gated_anchors")
            / F.greatest(F.col("n_anchors"), F.lit(1)),
            6,
        ).alias("gated_share"),
    )
    if batch_id is not None:
        out = out.select(
            F.lit(int(batch_id)).cast("long").alias("batch_id"), "*"
        )
    return out


def suffix_anchor_assets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    max_gram_freq: int = 64,
) -> tuple[DataFrame, DataFrame]:
    """The STANDING assets of incremental exact-substring dedup —
    built once per corpus, probed by every delta batch without
    re-tokenizing the base:

    - ``detail``: (id, __pos, __h) anchor occurrences for grams whose
      base frequency is within the cap (a gram already over the cap
      in the base alone stays over it in any union — its detail can
      never feed a pair, so it is not stored).
    - ``summary``: (__h, __n) occurrence counts for EVERY base gram —
      the probe needs exact union counts to apply the frequency gate
      the one-shot operator applies, including grams whose detail was
      dropped.

    In production both are TableStore tables (the summary is one row
    per distinct gram; the detail is bounded by corpus tokens).  The
    registered query keeps them session-cached, the same stand-in the
    MinHash band table uses (see incremental_near_dup)."""
    from pyspark import StorageLevel  # noqa: PLC0415

    _, occ = _suffix_occurrences(df, id_col, text_col, k)
    # one scan feeds both assets — DISK_ONLY: the anchor set is
    # O(corpus tokens) (27M rows at the 100x stress), and a standing
    # asset's natural home is serialized storage, not deserialized
    # executor memory blocks (MEMORY_AND_DISK unroll OOMed at 100x)
    occ = occ.localCheckpoint(eager=True, storageLevel=StorageLevel.DISK_ONLY)
    summary = occ.groupBy("__h").agg(F.count(F.lit(1)).alias("__n"))
    detail = occ.join(
        summary.filter(F.col("__n") <= max_gram_freq).select("__h"),
        "__h",
        "left_semi",
    )
    return detail, summary


def incremental_duplicate_spans(
    base: DataFrame | None,
    delta: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    max_gram_freq: int = 64,
    base_detail: DataFrame | None = None,
    base_summary: DataFrame | None = None,
    delta_occ: DataFrame | None = None,
    text_from_delta: bool = False,
) -> DataFrame:
    """Exact longest duplicated token span for every NEW pair a delta
    batch introduces — the incremental form of
    :func:`longest_duplicate_spans`, mirroring
    :func:`incremental_near_dup`'s standing-asset shape for the
    exact-substring family (Lee et al. 2022): today's crawl probes
    the standing anchor table; the base corpus is never re-tokenized.

    Semantics: the frequency gate uses UNION counts (base summary +
    delta counts — exactly what the one-shot operator over
    base ∪ delta applies), and only pairs involving at least one
    delta document are reported (base-base pairs were reported when
    the base was processed).  Document ids must be unique across
    base ∪ delta.  Output schema matches the one-shot operator.

    Scale shape: per-batch work is O(delta anchors + matching gram
    volume).  The delta tokenizes once; the standing ``detail`` joins
    by gram hash (bucket-local, fan-out bounded by the cap); span
    text materializes only for result documents (a semi-join keeps
    the token-slice pass at O(result docs), never O(base)).  Pass
    ``base_detail``/``base_summary`` from
    :func:`suffix_anchor_assets` to skip the base scan entirely."""
    if base_detail is None or base_summary is None:
        base_detail, base_summary = suffix_anchor_assets(
            base, id_col, text_col, k, max_gram_freq
        )
    if delta_occ is not None:
        d_occ = delta_occ  # caller-shared anchor scan (the monitor
        # computes it anyway for its asset update — no second pass)
    else:
        _, d_occ = _suffix_occurrences(delta, id_col, text_col, k)
        d_occ = d_occ.localCheckpoint(eager=True)  # counts + 2 sides
    d_cnt = d_occ.groupBy("__h").agg(F.count(F.lit(1)).alias("__nd"))
    # union-count gate: kept grams are those under the cap across
    # base + delta (grams unseen in the base carry __n = 0)
    kept = (
        d_cnt.join(base_summary, "__h", "left")
        .filter(
            F.coalesce(F.col("__n"), F.lit(0)) + F.col("__nd")
            <= max_gram_freq
        )
        .select("__h")
        # 4 downstream references (det_d x3 via the pair sides, det_b)
        # each re-planned this subtree — including a fresh scan of the
        # standing summary asset per reference.  O(delta grams) rows:
        # pin once (r12, guide §2.4)
        .localCheckpoint(eager=True)
    )
    det_d = d_occ.join(kept, "__h", "left_semi")
    # the base detail only needs grams the delta actually carries —
    # a semi-join against the (bounded) kept set, never a base rescan
    det_b = base_detail.join(kept, "__h", "left_semi")
    d_side = det_d.select(
        "__h",
        F.col(id_col).alias("__di"),
        F.col("__pos").alias("__dp"),
    )
    # cross pairs (delta x base), normalized so doc_a is the smaller
    # id with positions swapped to match
    b_side = det_b.select(
        "__h",
        F.col(id_col).alias("__bi"),
        F.col("__pos").alias("__bp"),
    )
    cross = (
        d_side.join(b_side, "__h")
        .select(
            F.least("__di", "__bi").alias("__da"),
            F.greatest("__di", "__bi").alias("__db"),
            F.when(F.col("__di") < F.col("__bi"), F.col("__dp"))
            .otherwise(F.col("__bp"))
            .alias("__pa"),
            F.when(F.col("__di") < F.col("__bi"), F.col("__bp"))
            .otherwise(F.col("__dp"))
            .alias("__pb"),
        )
    )
    within = (
        d_side.join(
            det_d.select(
                "__h",
                F.col(id_col).alias("__db"),
                F.col("__pos").alias("__pb"),
            ),
            "__h",
        )
        .filter(F.col("__di") < F.col("__db"))
        .select(
            F.col("__di").alias("__da"), "__db",
            F.col("__dp").alias("__pa"), "__pb",
        )
    )
    best = _spans_from_anchor_pairs(cross.unionByName(within), k)
    if not text_from_delta:
        # the batch text pass consumes best twice (doc_a id set + the
        # slice join) — one row per reported pair, pin it so the whole
        # probe pipeline plans once (r12, guide §2.4).  The streaming
        # path consumes best once and checkpoints the probe RESULT
        # per micro-batch already; no pin needed there.
        best = best.localCheckpoint(eager=True)
    if text_from_delta:
        # the span is VERBATIM-equal on both sides (lowered), so it
        # can be sliced from whichever side is the DELTA document —
        # every reported pair has one — and the base corpus text is
        # never touched (the streaming monitor's shape: no standing
        # docs table at all).  The slice key/start flip to the delta
        # side; output is string-identical to the doc_a slice.
        d_ids = delta.select(id_col).distinct()
        flagged = best.join(
            F.broadcast(
                d_ids.select(F.col(id_col).alias("__da"))
                .withColumn("__a_is_delta", F.lit(True))
            ),
            "__da",
            "left",
        )
        keyed = flagged.select(
            "__da",
            "__db",
            "span_tokens",
            "start_a",
            "start_b",
            F.when(F.col("__a_is_delta"), F.col("__da"))
            .otherwise(F.col("__db"))
            .alias("__tid"),
            F.when(F.col("__a_is_delta"), F.col("start_a"))
            .otherwise(F.col("start_b"))
            .alias("__tstart"),
        )
        toked_d = delta.select(
            F.col(id_col).alias("__tid"),
            F.split(
                F.trim(F.lower(F.col(text_col))), r"\s+"
            ).alias("__toks"),
        )
        return keyed.join(toked_d, "__tid").select(
            F.col("__da").alias("doc_a"),
            F.col("__db").alias("doc_b"),
            F.col("span_tokens").cast("bigint").alias("span_tokens"),
            F.col("start_a").cast("bigint").alias("start_a"),
            F.col("start_b").cast("bigint").alias("start_b"),
            F.concat_ws(
                " ",
                F.slice(
                    F.col("__toks"),
                    F.col("__tstart"),
                    F.col("span_tokens"),
                ),
            ).alias("span_text"),
        )
    # span text: tokenize ONLY documents that appear as doc_a in a
    # result (base or delta) — O(results), not O(corpus)
    if base is None:
        raise ValueError(
            "incremental_duplicate_spans: base=None with standing "
            "assets requires text_from_delta=True — the span-text "
            "pass would otherwise need the base documents (doc_a can "
            "be a base id).  Pass the base frame, or set "
            "text_from_delta=True to slice the (verbatim-equal) span "
            "from the delta side."
        )
    docs = base.select(id_col, text_col).unionByName(
        delta.select(id_col, text_col)
    )
    a_ids = best.select(F.col("__da").alias(id_col)).distinct()
    toked_a = (
        docs.join(F.broadcast(a_ids), id_col, "left_semi")
        .select(
            F.col(id_col),
            F.split(
                F.trim(F.lower(F.col(text_col))), r"\s+"
            ).alias("__toks"),
        )
    )
    return _spans_with_text(best, toked_a, id_col)


def excise_duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    max_gram_freq: int = 64,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """The EXACT span-rewrite: the write side driven by
    :func:`longest_duplicate_spans` output (round-10; the sampled
    fingerprint rewrite :func:`remove_duplicated_spans` excises
    k-token windows around SAMPLED hits — this one excises the
    maximal detected spans exactly).  Per detected pair the
    occurrence in the LOWEST-id document survives and the higher
    document's span token range [start_b, start_b + span_tokens) is
    cut; a document excised by several pairs cuts the UNION of its
    ranges.  Output (id, clean_text, n_tokens_removed), one row per
    input document, whitespace-normalized for touched and untouched
    documents alike — the same contract as the sampled rewrite, so
    downstream tokenization sees one format.

    Scale shape: detection is the gated anchor pipeline; the cut
    ranges aggregate to ONE array per touched document; the excision
    is a pure column expression (token index filtered by EXISTS over
    the range array) — untouched documents never join anything
    heavier than a left join against the (duplicate-density-bounded)
    cuts frame.  Brute-force rewrite parity pinned by
    tests/test_suffix_spans.py."""
    # detection core only: the rewrite reads (doc_b, start_b,
    # span_tokens) — the public operator's span-text join is dead
    # weight here (an inner join Catalyst cannot prune), so skip it
    # and its extra corpus scan outright (r12, guide §1.2)
    spans = (
        pairs
        if pairs is not None
        else _longest_span_pairs(df, id_col, text_col, k, max_gram_freq)
    ).select(
        F.col("__db").alias("doc_b"),
        "span_tokens",
        "start_b",
    )
    cuts = spans.groupBy(F.col("doc_b").alias(id_col)).agg(
        F.collect_list(
            F.struct(
                F.col("start_b").cast("int").alias("s"),
                F.col("span_tokens").cast("int").alias("n"),
            )
        ).alias("__cuts")
    )
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    kept = F.filter(
        F.transform(
            toks,
            lambda t, i: F.struct(t.alias("t"), i.alias("i")),
        ),
        # positions in the spans frame are 1-based; transform's index
        # is 0-based — compare on the 1-based grid
        lambda s: ~F.exists(
            F.col("__cuts"),
            lambda c: (s["i"] + 1 >= c["s"])
            & (s["i"] + 1 < c["s"] + c["n"]),
        ),
    )
    out = df.join(cuts, on=id_col, how="left")
    cleaned = F.when(
        F.col("__cuts").isNull(), F.array_join(toks, " ")
    ).otherwise(F.array_join(F.transform(kept, lambda s: s["t"]), " "))
    removed = F.when(F.col("__cuts").isNull(), F.lit(0)).otherwise(
        F.size(toks) - F.size(kept)
    )
    return out.select(
        F.col(id_col),
        cleaned.alias("clean_text"),
        removed.cast("bigint").alias("n_tokens_removed"),
    )


def bloom_dedup_probe(
    base: DataFrame,
    delta: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    m_bits: int | None = None,
    k: int = 4,
    bits_per_element: int = 10,
) -> DataFrame:
    """Bloom-filter membership probe of a delta batch against a
    standing corpus: the O(m_bits) SKETCH a 100-TB incremental dedup
    ships instead of the corpus itself (the exact-probe twin is
    d_incremental_dedup's band table).  The base's texts set k
    md5-derived bit positions each; a delta doc is ``bloom_maybe``
    iff ALL its k positions are set.  NO FALSE NEGATIVES by
    construction — every truly-present doc probes positive (pinned by
    test and visible in the oracle columns); false positives are the
    m/k/n trade.  Bit sets from shards merge by union (OR), the same
    shippable algebra as the HLL/CMS registers.

    Shape: the filter is a <= m_bits-row distinct-position table
    (broadcast to the probe join); the probe explodes k positions per
    delta doc and aggregates all-present per doc — O(delta x k), no
    base rescan.  Returns (id, bloom_maybe, exact_present).

    ``m_bits=None`` (default) sizes the filter from the BASE volume:
    the next power of two above ``bits_per_element`` x |base| (one
    O(1) count job — the same volume-derived sizing discipline as the
    store's bucket counts).  At 10 bits/element with k=4 the
    false-positive rate stays ~1%; a fixed m over a growing corpus
    silently degrades toward always-maybe (measured 42% FP when 3.3k
    docs were forced into 8k bits).  The sizing formula is
    integer-exact (bit length of 10n-1), so an oracle reproduces m
    from the same count."""

    if m_bits is None:
        n_base = base.count()
        m_bits = 1 << max(
            1, (bits_per_element * max(1, n_base) - 1).bit_length()
        )

    def positions(text_c):
        return F.array(
            *[
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit(f"{i}:"), text_c)), 1, 8
                    ),
                    16,
                    10,
                ).cast("long")
                % m_bits
                for i in range(k)
            ]
        )

    bits = (
        base.select(F.explode(positions(F.col(text_col))).alias("__p"))
        .distinct()
        .withColumn("__set", F.lit(1))
    )
    probe = delta.select(
        F.col(id_col), F.explode(positions(F.col(text_col))).alias("__p")
    )
    maybe = (
        probe.join(F.broadcast(bits), "__p", "left")
        .groupBy(id_col)
        .agg(
            (F.min(F.coalesce(F.col("__set"), F.lit(0))) == 1).alias(
                "bloom_maybe"
            )
        )
    )
    truth = delta.join(
        base.select(F.md5(F.col(text_col)).alias("__h")).distinct(),
        F.md5(F.col(text_col)) == F.col("__h"),
        "left",
    ).select(
        F.col(id_col), F.col("__h").isNotNull().alias("exact_present")
    )
    return maybe.join(truth, id_col).select(
        id_col, "bloom_maybe", "exact_present"
    )
