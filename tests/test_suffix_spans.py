"""Exact longest-duplicated-span (suffix-array family) parity: the
relational islands construction must recover EXACTLY the longest
common token substring (>= k tokens) per document pair — pinned
against an O(n*m) dynamic-programming brute force on planted corpora
(round-9, verdict item 8)."""

from __future__ import annotations

import itertools

from data_management_python_spark.llmdata import dedup


def _brute_longest(ta, tb, k):
    """Longest common contiguous token run (>= k) via DP; returns
    (length, start_a, start_b) with 1-based starts, ties by smallest
    (start_a, start_b), or None."""
    best = None
    n, m = len(ta), len(tb)
    prev = [0] * (m + 1)
    for i in range(1, n + 1):
        cur = [0] * (m + 1)
        for j in range(1, m + 1):
            if ta[i - 1] == tb[j - 1]:
                cur[j] = prev[j - 1] + 1
                ln = cur[j]
                if ln >= k:
                    cand = (ln, i - ln + 1, j - ln + 1)
                    if (
                        best is None
                        or ln > best[0]
                        or (ln == best[0] and cand[1:] < best[1:])
                    ):
                        best = cand
        prev = cur
    return best


WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta",
         "theta", "iota", "kappa"]


def _doc(seed, n):
    return " ".join(WORDS[(seed * 7 + i * 3 + i * i) % 10]
                    for i in range(n))


CORPUS = [
    # 1 and 2 share a planted 14-token verbatim span
    (1, _doc(1, 30) + " shared one two three four five six seven "
        "eight nine ten eleven twelve thirteen " + _doc(2, 10)),
    (2, _doc(3, 5) + " shared one two three four five six seven "
        "eight nine ten eleven twelve thirteen " + _doc(4, 25)),
    # 3 shares a shorter (9-token) span with 1
    (3, _doc(5, 12) + " shared one two three four five six seven "
        + _doc(6, 20)),
    # 4 shares nothing >= k with anyone
    (4, _doc(7, 40)),
    # 5 duplicates 2 entirely (longest span = min doc length run)
    (5, _doc(3, 5) + " shared one two three four five six seven "
        "eight nine ten eleven twelve thirteen " + _doc(4, 25)),
]


def test_matches_bruteforce(spark):
    k = 8
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b): (r.span_tokens, r.start_a, r.start_b,
                             r.span_text)
        for r in dedup.longest_duplicate_spans(
            docs, k=k
        ).collect()
    }
    toks = {i: t.strip().lower().split() for i, t in CORPUS}
    want = {}
    for a, b in itertools.combinations(sorted(toks), 2):
        best = _brute_longest(toks[a], toks[b], k)
        if best:
            ln, sa, sb = best
            want[(a, b)] = (ln, sa, sb,
                            " ".join(toks[a][sa - 1 : sa - 1 + ln]))
    assert got == want
    assert (1, 2) in got and got[(1, 2)][0] >= 14
    assert (4, 5) not in got and (1, 4) not in got


def test_gram_freq_gate_drops_degenerate(spark):
    """A gram occurring more than max_gram_freq times is gated before
    the self-join — the documented exactness cap on boilerplate."""
    boiler = " ".join(["spam"] * 200)
    docs = spark.createDataFrame(
        [(i, boiler) for i in range(1, 6)], "doc_id long, text string"
    )
    out = dedup.longest_duplicate_spans(docs, k=8, max_gram_freq=64)
    # every gram occurs 5 docs x 193 positions >> 64: all gated
    assert out.count() == 0
    # raising the cap finds the full-document duplication
    out2 = dedup.longest_duplicate_spans(
        docs, k=8, max_gram_freq=10000
    )
    rows = {(r.doc_a, r.doc_b): r.span_tokens for r in out2.collect()}
    assert rows[(1, 2)] == 200


def _brute_rewrite(corpus, k):
    """Reference rewrite: per pair's LONGEST span (the operator's
    contract), the higher doc's range is cut; union of ranges per
    doc; rebuild from surviving ORIGINAL-case tokens."""
    toks_l = {i: t.strip().lower().split() for i, t in corpus}
    cuts: dict[int, set[int]] = {}
    for a, b in itertools.combinations(sorted(toks_l), 2):
        best = _brute_longest(toks_l[a], toks_l[b], k)
        if best:
            ln, _sa, sb = best
            cuts.setdefault(b, set()).update(range(sb, sb + ln))
    out = {}
    for i, t in corpus:
        orig = t.strip().split()
        cut = cuts.get(i, set())
        kept = [tok for j, tok in enumerate(orig, start=1) if j not in cut]
        out[i] = (" ".join(kept), len(orig) - len(kept))
    return out


def test_exact_rewrite_matches_bruteforce(spark):
    """Round-10 (verdict item 5): the exact span rewrite excises the
    maximal detected spans exactly — lowest-id occurrence survives,
    union of ranges for multiply-cut documents, untouched documents
    whitespace-normalized only."""
    k = 8
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = {
        r.doc_id: (r.clean_text, r.n_tokens_removed)
        for r in dedup.excise_duplicate_spans(docs, k=k).collect()
    }
    want = _brute_rewrite(CORPUS, k)
    assert got == want
    # survivors keep their copy: doc 1 (lowest id of the 14-token
    # clique) is untouched; docs 2 and 5 lose at least that span
    assert got[1][1] == 0
    assert got[2][1] >= 14 and got[5][1] >= 14
    assert got[4][1] == 0  # no shared span, text normalized only


def test_incremental_spans_probe_semantics(spark):
    """Round-10 (verdict item 4): a delta batch probed against the
    standing anchor assets reports exactly the one-shot operator's
    delta-involving pairs over base ∪ delta — cross-batch spans
    included, base-base pairs excluded, base never re-tokenized
    (asset reuse pinned by passing the pre-built assets)."""
    k = 8
    base_rows = CORPUS  # ids 1..5
    delta_rows = [
        # planted cross-batch span: shares the 14-token clique
        (101, _doc(9, 7) + " shared one two three four five six seven "
              "eight nine ten eleven twelve thirteen " + _doc(8, 6)),
        # delta-delta pair: two deltas share their own 10-token span
        (102, _doc(2, 9) + " delta pair span aa bb cc dd ee ff gg "
              + _doc(5, 4)),
        (103, _doc(6, 11) + " delta pair span aa bb cc dd ee ff gg "
              + _doc(7, 3)),
        # shares nothing
        (104, _doc(1, 35)),
    ]
    base = spark.createDataFrame(base_rows, "doc_id long, text string")
    delta = spark.createDataFrame(delta_rows, "doc_id long, text string")
    detail, summary = dedup.suffix_anchor_assets(base, k=k)
    got = {
        (r.doc_a, r.doc_b): (r.span_tokens, r.start_a, r.start_b,
                             r.span_text)
        for r in dedup.incremental_duplicate_spans(
            base, delta, k=k,
            base_detail=detail, base_summary=summary,
        ).collect()
    }
    # reference: one-shot over the union, delta-involving pairs only
    union_rows = base_rows + delta_rows
    union = spark.createDataFrame(union_rows, "doc_id long, text string")
    delta_ids = {i for i, _ in delta_rows}
    want = {
        (r.doc_a, r.doc_b): (r.span_tokens, r.start_a, r.start_b,
                             r.span_text)
        for r in dedup.longest_duplicate_spans(union, k=k).collect()
        if r.doc_a in delta_ids or r.doc_b in delta_ids
    }
    assert got == want
    # the planted shapes actually showed up
    assert any(b == 101 for _, b in got)          # cross-batch
    assert (102, 103) in got                       # within-delta
    # no base-base pair leaked into the incremental output
    assert all(a in delta_ids or b in delta_ids for a, b in got)


def test_gate_stats_counts(spark):
    """suffix_gate_stats quantifies exactly what the frequency gate
    drops: a gram repeated past the cap accounts for all its anchors
    in n_gated_anchors."""
    from pyspark.sql import functions as F  # noqa: F401

    boiler = " ".join(["x"] * 19)  # one k-gram ('x'*8) occurring 12x/doc
    rows = [(i, boiler) for i in range(1, 7)]  # 6 docs x 12 = 72 > 64
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = dedup.suffix_gate_stats(docs, k=8, max_gram_freq=64).first()
    assert got.n_grams == 1 and got.n_gated_grams == 1
    assert got.n_anchors == 72 and got.n_gated_anchors == 72
    assert got.gated_share == 1.0
    # under the cap: nothing gated
    ok = dedup.suffix_gate_stats(
        docs.limit(3), k=8, max_gram_freq=64
    ).first()
    assert ok.n_gated_anchors == 0 and ok.gated_share == 0.0
