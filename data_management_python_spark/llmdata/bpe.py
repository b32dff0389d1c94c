"""Distributed BPE (byte-pair-encoding) merge training.

The classic tokenizer-training loop (Sennrich et al. 2016; the GPT-2
vocabulary was built this way) re-expressed for a corpus that does not
fit one machine:

1. The corpus is reduced ONCE to the distinct-word frequency table —
   the only state BPE ever needs (merging happens inside words).  For
   natural text this is Zipf-small relative to the corpus: the 100 TB
   input becomes a few hundred million (word, count) rows after one
   hash aggregate, partitioned across executors and never collected.
2. Each round: explode each word's adjacent symbol pairs weighted by
   the word count, hash-aggregate pair counts (map-side partials),
   take the argmax pair (deterministic tie-break: highest count, then
   lexicographic smallest) via a 1-row TakeOrdered — the ONLY thing
   that ever reaches the driver, two strings and a long per round.
3. The winning pair broadcasts back (closure capture) and an
   Arrow-batched pandas UDF rewrites each word's symbol array, merging
   non-overlapping occurrences left to right — the same greedy rule
   reference BPE uses.  ``localCheckpoint`` truncates lineage per
   round, same discipline as pagerank / connected_components.

Driver state is O(k) merge rules; cluster state is the word table.
Exactly parity-tested against a pure-Python reference implementation
(:func:`bpe_train_reference`) — merge-for-merge identical, which is
why the tie-break is part of the contract, not an afterthought.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

END = "</w>"  # end-of-word sentinel, as in the original algorithm


def _merge_word(
    symbols: list[str], left: str, right: str, joined: str
) -> list[str]:
    """Greedy left-to-right non-overlapping merge of (left, right)."""
    out = []
    i = 0
    n = len(symbols)
    while i < n:
        if i + 1 < n and symbols[i] == left and symbols[i + 1] == right:
            out.append(joined)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


def _merge_udf(left: str, right: str, joined: str):
    """Arrow-batched merge applier for one rule (factory so the rule
    travels in the closure — pandas_udf forbids default-arg capture)."""

    @pandas_udf("array<string>")
    def apply_merge(syms: pd.Series) -> pd.Series:
        return syms.map(lambda s: _merge_word(list(s), left, right, joined))

    return apply_merge


def word_frequency_table(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, count) over the whitespace-lowered corpus — the one
    corpus-sized reduction; everything after runs on distinct words."""
    return (
        docs.select(
            F.explode(
                F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
            ).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def bpe_train(
    docs: DataFrame,
    num_merges: int,
    text_col: str = "text",
) -> list[tuple[str, str, int]]:
    """Learn ``num_merges`` BPE merge rules; returns
    [(left, right, pair_count), ...] in merge order.

    See the module docstring for the distribution argument.  The
    return value is the tokenizer artifact (a few KB) — the corpus
    never moves.
    """
    words = word_frequency_table(docs, text_col).withColumn(
        "syms",
        F.concat(
            F.split(F.col("word"), ""), F.array(F.lit(END))
        ),
    ).select("syms", "cnt")
    words = words.localCheckpoint(eager=True)

    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        pairs = (
            words.select(
                F.explode(
                    F.expr(
                        "transform(slice(syms, 1, size(syms) - 1), "
                        "(s, i) -> struct(s AS l, syms[i + 1] AS r))"
                    )
                ).alias("p"),
                "cnt",
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("cnt").alias("n"))
        )
        top = pairs.orderBy(F.col("n").desc(), "l", "r").limit(1).collect()
        if not top or top[0]["n"] < 1:
            break
        left, right, n = top[0]["l"], top[0]["r"], int(top[0]["n"])
        merges.append((left, right, n))
        joined = left + right

        words = words.select(
            _merge_udf(left, right, joined)(F.col("syms")).alias("syms"),
            "cnt",
        ).localCheckpoint(eager=True)
    return merges


def bpe_train_reference(
    texts: list[str], num_merges: int
) -> list[tuple[str, str, int]]:
    """Single-machine reference implementation (the classic algorithm,
    verbatim) used to parity-test the distributed trainer."""
    vocab: Counter = Counter()
    for t in texts:
        for w in t.strip().lower().split():
            if w:
                vocab[tuple(list(w) + [END])] += 1
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for syms, cnt in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += cnt
        if not pairs:
            break
        # highest count, ties to lexicographic smallest — the same
        # total order the distributed argmax uses
        (left, right), n = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0])
        )
        merges.append((left, right, n))
        joined = left + right
        new_vocab: Counter = Counter()
        for syms, cnt in vocab.items():
            new_vocab[
                tuple(_merge_word(list(syms), left, right, joined))
            ] += cnt
        vocab = new_vocab
    return merges


def apply_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize the corpus with learned merges — map-only: the rule
    list broadcasts in the UDF closure, each word re-merges greedily
    in rule order (reference BPE application)."""
    rules = [(l, r, l + r) for l, r, _ in merges]

    @pandas_udf("array<string>")
    def tokenize(text: pd.Series) -> pd.Series:
        def one(t):
            if t is None:
                return []
            out = []
            for w in t.strip().lower().split():
                syms = list(w) + [END]
                for left, right, joined in rules:
                    if len(syms) < 2:
                        break
                    syms = _merge_word(syms, left, right, joined)
                out.extend(syms)
            return out

        return text.map(one)

    return docs.withColumn(out_col, tokenize(F.col(text_col)))
