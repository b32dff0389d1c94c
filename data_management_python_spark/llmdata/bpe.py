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


def _merge_batch_udf(rules: list[tuple[str, str, str]]):
    """Arrow-batched merge applier for a BATCH of rules, applied
    sequentially in rule order — identical to one UDF pass per rule,
    in a single Spark job (factory so the rules travel in the
    closure — pandas_udf forbids default-arg capture)."""

    @pandas_udf("array<string>")
    def apply_merges(syms: pd.Series) -> pd.Series:
        def one(s):
            s = list(s)
            for left, right, joined in rules:
                if len(s) < 2:
                    break
                s = _merge_word(s, left, right, joined)
            return s

        return syms.map(one)

    return apply_merges


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
    batch: int = 16,
) -> list[tuple[str, str, int]]:
    """Learn ``num_merges`` BPE merge rules; returns
    [(left, right, pair_count), ...] in merge order.

    See the module docstring for the distribution argument.  The
    return value is the tokenizer artifact (a few KB) — the corpus
    never moves.

    BATCHED rounds: a 32k-merge vocabulary at one Spark job per merge
    is 32k jobs, so each round selects up to ``batch`` merges from one
    pair-count aggregation — provably identical to sequential greedy:

    * the selected set is the longest PREFIX of the (count desc, lex)
      order whose members cannot AFFECT each other.  Merging (a, b)
      touches exactly the pairs with right == a or left == b (their
      occurrences are destroyed at "x a b" / "a b y" sites), pairs
      naming the joined string a+b (a rare symbol collision), and
      (a, b) itself; every other pair's occurrence set is untouched —
      two pairs merely SHARING a symbol (e.g. both ending in the
      end-of-word sentinel) are independent.  Two further conflicts
      close gaps the endpoint rule misses: two mergers with EQUAL
      joined strings ((a,bc) and (ab,c) both forming "abc") would
      jointly feed a created pair like (x,"abc") that the per-merger
      bound sees only once; and a SELF-OVERLAPPING merger (a,a) ends
      its batch, because on runs "aaa" it creates ("aa","a") out of
      its own occurrence mass, which the bound scan excludes as a
      batch member.  Unaffected merges commute with count (and
      tie-break) preservation, so the prefix applied in rank order
      replays sequential greedy exactly;
    * the batch is then shrunk until every pair a batch merge could
      CREATE or BOOST is strictly below the batch's last count.
      Merging (a,b) never increases a pair's count unless the pair
      names the joined string: a new (x, ab) is bounded by
      count(x, a) and (ab, y) by count(b, y) [bound A]; and when the
      joined string ab COLLIDES with an existing symbol (exact check
      against the driver-maintained symbol vocabulary — initial
      symbols collected once, every joined string added), a
      pre-existing pair naming it can ADD those occurrences to its
      current count [bound B].  Existing non-colliding non-batch
      pairs already rank after the whole batch (the selection is a
      rank PREFIX).  The shrink condition is A + B < n_m (B = 0 when
      no collision), with the last collected row's count bounding
      everything uncollected — exact greedy parity
      by induction over the batch's sequential application, without
      collapsing on mere count ties between independent pairs.

    Each round costs ONE Spark job: the per-round lineage-truncating
    localCheckpoint is LAZY (materialized by the next round's
    pair-count collect instead of an extra eager count), and AQE is
    suspended for the loop (saved/restored like the multimodal Arrow
    conf) — adaptive per-stage jobs buy nothing for a TakeOrdered
    over a bounded pair table and would double the round's job count;
    the shuffle width is pinned by the session conf either way.
    Measured on natural text (32 merges, sf0.001 documents): 16 jobs
    vs 98 for the classic one-eager-checkpoint-plus-collect-per-merge
    loop — 6x fewer driver round-trips for the identical merge table.

    ``bpe_train.last_num_rounds`` records the aggregation/collect
    rounds actually executed — the job-count contract the batching
    exists for.  ``batch=1`` degrades to the classic one-merge-per-job
    loop.
    """
    spark = docs.sparkSession
    words = word_frequency_table(docs, text_col).withColumn(
        "syms",
        F.concat(
            F.split(F.col("word"), ""), F.array(F.lit(END))
        ),
    ).select("syms", "cnt")
    words = words.localCheckpoint(eager=True)

    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        merges = _train_loop(words, num_merges, batch)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
    return merges


def _train_loop(
    words: DataFrame, num_merges: int, batch: int
) -> list[tuple[str, str, int]]:
    merges: list[tuple[str, str, int]] = []
    rounds = 0
    # the exact symbol vocabulary, maintained driver-side: initial
    # symbols collected once (distinct chars + sentinel — Zipf-tiny),
    # every joined string added as it is created.  Membership tells
    # the safety bound whether a merge's joined string COLLIDES with
    # an existing symbol (then pre-existing pairs naming it can gain
    # occurrences and need the additive bound); symbols that die out
    # are kept — stale members only make the check more conservative.
    symbols: set[str] = {
        r[0]
        for r in words.select(
            F.explode("syms").alias("s")
        ).distinct().collect()
    }
    while len(merges) < num_merges:
        m_cap = min(batch, num_merges - len(merges))
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
        limit = max(64, 4 * (m_cap + 1))
        top = (
            pairs.orderBy(F.col("n").desc(), "l", "r")
            .limit(limit)
            .collect()
        )
        rounds += 1
        if not top or top[0]["n"] < 1:
            break
        # longest mutually-unaffected prefix of the sorted candidates
        # (see docstring for the exact affected-pair characterization)
        def _affected(ql: str, qr: str, pl: str, pr: str) -> bool:
            j = pl + pr
            return (
                qr == pl
                or ql == pr
                or ql == j
                or qr == j
                # equal JOINED strings — e.g. (a,bc) and (ab,c) both
                # forming "abc" — are a conflict even though neither
                # shares an endpoint symbol: a pair created against
                # the joined string, like (x, "abc"), would accrue
                # occurrences from BOTH mergers, and the A+B safety
                # bound below only sees one of them (their join is not
                # in `symbols` yet, so bound B stays 0).  Keeping one
                # per batch restores the per-merger bound's premise.
                or ql + qr == j
                # a SELF-OVERLAPPING merger (left == right, e.g.
                # ('a','a')) ends its batch: on a run "aaa" it creates
                # ('aa','a') whose donor sites belong to the merger
                # ITSELF, which the bound-A scan excludes via
                # sel_keys — so the created pair can tie or outrank a
                # later batch member unseen (found by randomized
                # search: 'baaabb...' corpus, where created ('aa','a')
                # at 21 ties ('b','</w>') at 21 and wins the lex
                # tie-break that sequential greedy would have given
                # it).  As the LAST batch member it is always safe:
                # its created pairs are recounted next round.
                or pl == pr
            )

        sel = []
        for r in top[:m_cap]:
            if any(
                _affected(r["l"], r["r"], p["l"], p["r"]) for p in sel
            ):
                break
            sel.append(r)
        # new-pair safety bound (see docstring); batch of 1 is plain
        # greedy and always safe.  Uncollected pairs are bounded by
        # the last collected count (0 if the collect was exhaustive).
        tail_bound = int(top[-1]["n"]) if len(top) == limit else 0
        m = len(sel)
        while m >= 2:
            mergers = sel[: m - 1]
            sel_keys = {(p["l"], p["r"]) for p in sel[:m]}
            colliding = {
                j
                for j in (p["l"] + p["r"] for p in mergers)
                if j in symbols
            }
            # A bounds occurrences CREATED by a merger (each created
            # (x, j)/(j, y) site consumes an (x, p.l)/(p.r, y) site).
            # When a merger's joined string COLLIDES with an existing
            # symbol (exact driver-side vocabulary check), a
            # pre-existing pair naming it can gain occurrences too:
            # its post-merge count is <= B + A where B is its current
            # count — B covers collected colliding pairs plus the tail
            # bound for uncollected ones.  No collision (the usual
            # case) => B = 0 and the bound stays tight.
            bound_a = tail_bound
            bound_b = tail_bound if colliding else 0
            for q in top:
                if (q["l"], q["r"]) in sel_keys:
                    continue
                if any(
                    q["r"] == p["l"] or q["l"] == p["r"] for p in mergers
                ):
                    bound_a = max(bound_a, int(q["n"]))
                if q["l"] in colliding or q["r"] in colliding:
                    bound_b = max(bound_b, int(q["n"]))
            if bound_a + bound_b < int(sel[m - 1]["n"]):
                break
            m -= 1
        sel = sel[:m]
        batch_rules = [(r["l"], r["r"], int(r["n"])) for r in sel]
        merges.extend(batch_rules)
        symbols.update(l + r for l, r, _ in batch_rules)
        # LAZY checkpoint: lineage is truncated when the next round's
        # collect materializes it — no extra eager job per round
        words = words.select(
            _merge_batch_udf([(l, r, l + r) for l, r, _ in batch_rules])(
                F.col("syms")
            ).alias("syms"),
            "cnt",
        ).localCheckpoint(eager=False)
    bpe_train.last_num_rounds = rounds
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


def encode_word_rule_order(
    w: str, rules: list[tuple[str, str, str]]
) -> list[str]:
    """The textbook encode: every rule, in learned order, greedily
    merged left-to-right across the word.  O(|rules| * |word|) — kept
    as the parity REFERENCE for the rank-based fast path below (the
    two are proven-and-tested identical)."""
    syms = list(w) + [END]
    for left, right, joined in rules:
        if len(syms) < 2:
            break
        syms = _merge_word(syms, left, right, joined)
    return syms


def apply_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    cache_size: int = 1 << 18,
) -> DataFrame:
    """Tokenize the corpus with learned merges — map-only: the rule
    list broadcasts in the UDF closure, zero shuffle.

    Round-8 fast path: instead of sweeping EVERY rule over every word
    (O(|rules| x |word|), the tokenization wall a 32k-merge vocabulary
    hits at corpus scale), each word iterates "merge the lowest-RANK
    pair present" (the GPT-2-style encoder): O(|word| x merges applied)
    with one dict probe per adjacent pair.  This is EXACTLY rule-order
    application, not an approximation: a merge at rank k only creates
    pairs containing its new symbol, and any learned pair containing
    that symbol was necessarily learned AFTER step k (the symbol did
    not exist before), so no merge can ever re-expose a pair of rank
    <= k — the invariant the classic equivalence rests on, pinned by
    test against :func:`encode_word_rule_order`.

    A per-worker word cache (bounded at ``cache_size`` entries)
    exploits Zipf reuse: the overwhelming share of running words hit
    the cache and cost one dict lookup.  The cache lives in the UDF
    closure — one per Python worker process, shared across Arrow
    batches, never serialized back."""
    ranks = {(l, r): i for i, (l, r, _) in enumerate(merges)}
    rules = [(l, r, l + r) for l, r, _ in merges]

    @pandas_udf("array<string>")
    def tokenize(text: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def encode(w: str) -> list[str]:
            got = cache.get(w)
            if got is not None:
                return got
            syms = list(w) + [END]
            get = ranks.get
            while len(syms) >= 2:
                best = None
                for i in range(len(syms) - 1):
                    r = get((syms[i], syms[i + 1]))
                    if r is not None and (best is None or r < best):
                        best = r
                if best is None:
                    break
                left, right, joined = rules[best]
                syms = _merge_word(syms, left, right, joined)
            if len(cache) < cache_size:
                cache[w] = syms
            return syms

        def one(t):
            if t is None:
                return []
            out = []
            for w in t.strip().lower().split():
                out.extend(encode(w))
            return out

        return text.map(one)

    return docs.withColumn(out_col, tokenize(F.col(text_col)))
