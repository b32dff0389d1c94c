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
