"""Property-based tests (hypothesis) — invariants the reference never
checked but the engine guarantees.

Each property collects one batch of generated rows into a single
DataFrame per example run (createDataFrame per example is the cost
center, so examples are few and batches are wide).
"""

from __future__ import annotations

import datetime

from hypothesis import example, given, settings, strategies as st
from pyspark.sql import functions as F

from data_management_python_spark import functions as fn
from data_management_python_spark.eav import melt_attributes, unmelt_attributes
from data_management_python_spark.operators.upsert import merge_upsert

DNA = st.text(alphabet="ACGT", min_size=1, max_size=24)
SETTINGS = settings(max_examples=5, deadline=None)


def _pyrevcomp(s: str) -> str:
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    return "".join(comp[c] for c in reversed(s.upper()))


@SETTINGS
@given(st.lists(DNA, min_size=1, max_size=30))
def test_rev_comp_involution_and_reference_semantics(seqs):
    spark = _spark()
    df = spark.createDataFrame([(s,) for s in seqs], "seq string")
    out = df.select(
        "seq",
        fn.rev_comp("seq").alias("rc"),
        fn.rev_comp(fn.rev_comp("seq")).alias("rc2"),
    ).collect()
    for r in out:
        assert r.rc == _pyrevcomp(r.seq)   # matches the python definition
        assert r.rc2 == r.seq              # involution


@SETTINGS
@given(
    st.lists(
        st.dates(
            min_value=datetime.date(1969, 1, 1),
            max_value=datetime.date(2068, 12, 31),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_parse_yymmdd_matches_strptime(dates):
    spark = _spark()
    strs = [d.strftime("%y%m%d") for d in dates]
    df = spark.createDataFrame([(s,) for s in strs], "s string")
    out = df.select("s", fn.parse_yymmdd("s").alias("d")).collect()
    for r in out:
        assert r.d == datetime.datetime.strptime(r.s, "%y%m%d").date()


@SETTINGS
@given(
    st.lists(
        st.tuples(st.integers(0, 20), st.text("ab", min_size=0, max_size=3)),
        min_size=1,
        max_size=20,
        unique_by=lambda t: t[0],
    ),
    st.lists(
        st.tuples(st.integers(0, 20), st.text("cd", min_size=0, max_size=3)),
        min_size=1,
        max_size=20,
        unique_by=lambda t: t[0],
    ),
)
def test_merge_upsert_idempotent_and_key_preserving(target_rows, update_rows):
    spark = _spark()
    target = spark.createDataFrame(target_rows, "id long, v string")
    updates = spark.createDataFrame(update_rows, "id long, v string")
    once = merge_upsert(target, updates, ["id"])
    twice = merge_upsert(once, updates, ["id"])
    got_once = sorted((r.id, r.v) for r in once.collect())
    got_twice = sorted((r.id, r.v) for r in twice.collect())
    assert got_once == got_twice  # idempotent
    # keys = union of both sides; updated keys carry the update's value
    expect_keys = sorted({t[0] for t in target_rows} | {u[0] for u in update_rows})
    assert [k for k, _ in got_once] == expect_keys
    upd = dict(update_rows)
    for k, v in got_once:
        if k in upd:
            assert v == upd[k]


@SETTINGS
@given(
    st.lists(
        st.tuples(
            st.text("xy", min_size=1, max_size=4),
            st.one_of(st.none(), st.text("pq", min_size=1, max_size=4)),
        ),
        min_size=1,
        max_size=15,
    )
)
def test_eav_melt_unmelt_roundtrip(rows):
    spark = _spark()
    data = [(i, a, b) for i, (a, b) in enumerate(rows)]
    df = spark.createDataFrame(data, "id long, attr_a string, attr_b string")
    _, eav = melt_attributes(df, key_columns=["id"], table_columns=[])
    wide = unmelt_attributes(eav, "id", attribute_names=["attr_a", "attr_b"])
    back = {r.id: (r.attr_a, r.attr_b) for r in wide.collect()}
    for i, (a, b) in enumerate(rows):
        # empty strings are pruned on melt (reference semantics) -> NULL
        assert back.get(i, (None, None)) == (a or None, b or None)


def _spark():
    from data_management_python_spark.session import get_spark

    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions="4")
    s.sparkContext.setLogLevel("ERROR")
    return s


@SETTINGS
@given(
    st.lists(  # left: (key 0-2, ts seconds)
        st.tuples(st.integers(0, 2), st.integers(0, 3600)),
        min_size=1, max_size=25,
    ),
    st.lists(  # right: (key, ts, payload)
        st.tuples(st.integers(0, 2), st.integers(0, 3600), st.integers(0, 999)),
        min_size=0, max_size=25,
        unique_by=lambda t: (t[0], t[1]),  # one state row per (key, ts)
    ),
    st.sampled_from(["backward", "forward"]),
)
def test_asof_join_matches_pandas_merge_asof(left_rows, right_rows, direction):
    import pandas as pd

    from data_management_python_spark.operators.temporal import asof_join

    spark = _spark()
    base = datetime.datetime(2024, 1, 1)

    def ts(s):
        return base + datetime.timedelta(seconds=s)

    left = spark.createDataFrame(
        [(k, i, ts(s)) for i, (k, s) in enumerate(left_rows)],
        "k long, row_id long, lts timestamp",
    )
    right = spark.createDataFrame(
        [(k, ts(s), p) for (k, s, p) in right_rows],
        "k long, rts timestamp, payload long",
    )
    got = {
        r.row_id: r.payload
        for r in asof_join(
            left, right, on="k", left_ts="lts", right_ts="rts",
            direction=direction,
        ).collect()
    }
    lpd = pd.DataFrame(
        [(k, i, ts(s)) for i, (k, s) in enumerate(left_rows)],
        columns=["k", "row_id", "lts"],
    ).sort_values("lts", kind="stable")
    rpd = pd.DataFrame(
        [(k, ts(s), p) for (k, s, p) in right_rows],
        columns=["k", "rts", "payload"],
    )
    rpd["k"] = rpd["k"].astype("int64")
    rpd["rts"] = pd.to_datetime(rpd["rts"])
    rpd["payload"] = rpd["payload"].astype("Int64")
    rpd = rpd.sort_values("rts", kind="stable")
    merged = pd.merge_asof(
        lpd, rpd, left_on="lts", right_on="rts", by="k", direction=direction
    )
    for _, row in merged.iterrows():
        expect = None if pd.isna(row["payload"]) else int(row["payload"])
        assert got[row["row_id"]] == expect


@SETTINGS
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_000),
            st.one_of(
                st.none(), st.integers(min_value=-1000, max_value=1000)
            ),
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[0],
    ),
    st.integers(min_value=1, max_value=5),
)
def test_ordered_prefix_sum_matches_window_property(spark, rows, nparts):
    """For any frame (unique keys, NULLs allowed), the distributed
    prefix sum equals the SinglePartition window it replaces, with
    NULLs contributing zero."""
    from pyspark.sql import Window

    from data_management_python_spark.operators.ranking import (
        ordered_prefix_sum,
    )

    df = spark.createDataFrame(rows, "k long, v long")
    got = {
        r.k: r.cum
        for r in ordered_prefix_sum(
            df, ["k"], "v", "cum", num_partitions=nparts
        ).collect()
    }
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r.k: r.cum
        for r in df.withColumn(
            "cum", F.sum(F.coalesce("v", F.lit(0))).over(w)
        ).collect()
    }
    assert got == want


@SETTINGS
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=3),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_zorder_interleave_bijective_on_grid(spark, pts):
    """interleave_bits is injective on the grid (deinterleaving bits
    recovers both coordinates), so sorting by Z never conflates cells."""
    from data_management_python_spark.operators.layout import interleave_bits

    df = spark.createDataFrame(pts, "x long, y long").distinct()
    z = interleave_bits([F.col("x"), F.col("y")], bits=2)
    rows = df.select("x", "y", z.alias("z")).collect()
    for r in rows:
        back_x = sum(((r.z >> (2 * b)) & 1) << b for b in range(2))
        back_y = sum(((r.z >> (2 * b + 1)) & 1) << b for b in range(2))
        assert (back_x, back_y) == (r.x, r.y)
    assert len({r.z for r in rows}) == len(rows)


@SETTINGS
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),  # user
            st.integers(min_value=0, max_value=1000),  # minute offset
            st.sampled_from(["view", "click", "purchase", "other"]),
        ),
        min_size=1,
        max_size=80,
    )
)
def test_funnel_step_counts_monotone(spark, tmp_path_factory, evs):
    """For ANY event set the funnel is monotone: n_view >= n_click >=
    n_purchase, and conversion is within [0, 1]."""
    import datetime as dt

    from data_management_python_spark.plans import collect_queries

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, u, base + dt.timedelta(minutes=m), t)
        for i, (u, m, t) in enumerate(evs)
    ]
    d = tmp_path_factory.mktemp("funnel_prop")
    spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    ).write.parquet(str(d / "events.parquet"))
    got = {
        r.step: r for r in collect_queries()["e_funnel"].fn(spark, str(d)).collect()
    }
    n1, n2, n3 = (
        got["view"].n_users,
        got["click"].n_users,
        got["purchase"].n_users,
    )
    assert n1 >= n2 >= n3 >= 0
    for r in got.values():
        if r.conversion is not None:
            assert 0.0 <= r.conversion <= 1.0


@SETTINGS
@given(
    st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(min_value=0, max_value=5)),
            st.floats(
                min_value=-1e6, max_value=1e6,
                allow_nan=False, allow_infinity=False,
            ),
        ),
        min_size=0,
        max_size=40,
    )
)
def test_expectation_metrics_always_in_unit_interval(spark, rows):
    """Every rule metric is a ratio in [0, 1] for any input, including
    empty frames and all-NULL columns."""
    from data_management_python_spark.operators.expectations import (
        Expectation,
        evaluate,
    )

    df = spark.createDataFrame(rows, "id long, v double")
    rules = [
        Expectation("nn", "not_null", "id"),
        Expectation("uq", "unique", "id"),
        Expectation("rng", "between", "v", params={"lo": -10, "hi": 10}),
    ]
    for r in evaluate(df, rules).collect():
        assert 0.0 <= r.metric <= 1.0


WORD = st.text(alphabet="abcdef", min_size=1, max_size=8)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(WORD, min_size=1, max_size=12),
    st.lists(st.tuples(WORD, WORD), min_size=1, max_size=6),
)
def test_merge_word_matches_wrapped_replace_chain(words, rules):
    """The lemma the t_bpe_encode oracle rests on: greedy left-to-right
    non-overlapping pair merge over a symbol list equals a string
    replace over fully-wrapped tokens — for ANY symbols and ANY rule
    sequence (cascades, self-pairs 'a a', overlapping runs)."""
    from data_management_python_spark.llmdata.bpe import _merge_word

    syms = list(words)
    wrapped = "".join(f"\x01{t}\x02" for t in syms)
    for left, right in rules:
        joined = left + right
        syms = _merge_word(syms, left, right, joined)
        wrapped = wrapped.replace(
            f"\x01{left}\x02\x01{right}\x02", f"\x01{joined}\x02"
        )
    assert wrapped == "".join(f"\x01{t}\x02" for t in syms)


@settings(max_examples=25, deadline=None)
@given(
    st.integers(min_value=1, max_value=9),
    st.integers(min_value=1, max_value=9),
    st.randoms(use_true_random=False),
)
def test_bmp_encode_decode_roundtrip_random(w, h, rnd):
    """_encode_bmp24 and _decode_bmp_wh_pixels are exact inverses for
    arbitrary pixel content and any width (4-byte row padding paths
    included: widths 1-9 cover every stride remainder)."""
    from data_management_python_spark.llmdata.multimodal import (
        _decode_bmp_wh_pixels,
        _encode_bmp24,
    )

    px = [
        (rnd.randrange(256), rnd.randrange(256), rnd.randrange(256))
        for _ in range(w * h)
    ]
    got = _decode_bmp_wh_pixels(_encode_bmp24(w, h, px))
    assert got == (w, h, px)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),      # user_id
            st.integers(min_value=0, max_value=7200),   # seconds offset
        ),
        min_size=1,
        max_size=40,
        unique=True,
    )
)
@example([(0, 0), (0, 600)])  # exact-boundary pair: merges (inclusive)
@example([(0, 0), (0, 600), (0, 1201)])  # boundary merge then > gap split
def test_session_window_counts_match_gap_reference(spark, evs):
    """Spark's native session_window (as wrapped by
    streaming.windows.session_window_counts) follows the INCLUSIVE
    merge rule: an event exactly ``gap`` after the previous one still
    joins the open session (only diff > gap starts a new session),
    and session_end = last event + gap — checked against a pure-Python
    sweep for arbitrary event sets (including equal-gap boundaries,
    multiple users, single-event sessions).  Round-5 history: this
    test caught the operator family documenting the STRICT rule while
    Spark actually merges at diff == gap; the falsifying example
    [(0,0),(0,600)] is kept below as a hard regression case."""
    import datetime as dt

    from data_management_python_spark.streaming.windows import (
        session_window_counts,
    )

    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    gap = 600  # 10 minutes
    rows = [
        (i, uid, base + dt.timedelta(seconds=off))
        for i, (uid, off) in enumerate(evs)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp"
    )
    got = {
        (r.user_id, r.session_start, r.session_end): r.n_events
        for r in session_window_counts(df, gap=f"{gap} seconds").collect()
    }

    want = {}
    by_user: dict[int, list[dt.datetime]] = {}
    for _, uid, ts in rows:
        by_user.setdefault(uid, []).append(ts)
    for uid, tss in by_user.items():
        tss.sort()
        start, last, n = tss[0], tss[0], 1
        for ts in tss[1:]:
            if (ts - last).total_seconds() <= gap:
                last, n = ts, n + 1
            else:
                want[(uid, start, last + dt.timedelta(seconds=gap))] = n
                start, last, n = ts, ts, 1
        want[(uid, start, last + dt.timedelta(seconds=gap))] = n
    assert got == want


def test_session_window_oracle_parity_on_boundary_corpus(spark, tmp_path):
    """s_session_windows vs its DuckDB oracle on a corpus that CONTAINS
    same-user pairs exactly gap (1800 s) apart — the round-5 verdict's
    green-by-luck closure: the shared sf0.01/sf0.1 corpus happens to
    have no exact-boundary pair, so the driver's hash check could not
    distinguish the strict rule from Spark's actual inclusive rule.
    This fixture plants boundary pairs (merge), just-over pairs
    (split), and a boundary chain, then runs the REGISTERED query and
    its REGISTERED oracle SQL side by side."""
    import datetime as dt

    import duckdb

    import __spark_entry__ as entrymod

    base = dt.datetime(2024, 5, 1, 9, 0, 0)
    rows = []

    def ev(uid, sec):
        rows.append(
            (len(rows), base + dt.timedelta(seconds=sec), uid,
             "click", 1.0, "{}")
        )

    ev(1, 0); ev(1, 1800)                      # exact boundary: one session
    ev(2, 0); ev(2, 1801)                      # just over: two sessions
    ev(3, 0); ev(3, 1800); ev(3, 3600)         # boundary chain: one session
    ev(4, 0); ev(4, 900); ev(4, 2700)          # interior merges
    ev(5, 0)                                   # singleton
    ev(1, 7200); ev(1, 9000); ev(1, 9001)      # second session for user 1

    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    )
    sf_dir = str(tmp_path)
    df.coalesce(1).write.parquet(f"{sf_dir}/events.parquet")

    got_df = entrymod.queries()["s_session_windows"](spark, sf_dir)
    got = sorted(tuple(r) for r in got_df.collect())

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet/*.parquet')"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            entrymod.oracle_sql()["s_session_windows"]
        ).fetchall()
    )
    assert got == want
    # the inclusive rule's signature facts, asserted directly so a
    # future mirrored regression in BOTH engines cannot slip through:
    per_user = {}
    for uid, *_ in got:
        per_user[uid] = per_user.get(uid, 0) + 1
    assert per_user[1] == 2   # boundary pair merged; later trio separate
    assert per_user[2] == 2   # 1801 s splits
    assert per_user[3] == 1   # boundary chain merges end-to-end
    assert per_user[4] == 1


def test_prefix_filtered_jaccard_is_lossless_vs_bruteforce(spark):
    """The All-Pairs positional filter must lose NO qualifying pair —
    and this cannot be checked by the DuckDB oracle, which mirrors the
    same filter (a flaw in the prefix theorem would make both engines
    miss the same pairs and still hash-match).  Property: over random
    small-vocabulary corpora (adversarial for prefix filtering — high
    shingle overlap), the distributed prefix-filtered operator equals
    a brute-force all-pairs Python reference, exactly, across several
    thresholds including ones that make prefixes very short."""
    import itertools
    import random

    from data_management_python_spark.llmdata import dedup

    rng = random.Random(20260815)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"]

    def brute(texts, n, t, cap):
        shingle_sets = {}
        for i, txt in enumerate(texts):
            toks = txt.strip().lower().split()
            shingle_sets[i] = {
                " ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)
            } if len(toks) >= n else set()
        if cap is not None:
            from collections import Counter

            df = Counter(s for ss in shingle_sets.values() for s in ss)
            hot = {s for s, c in df.items() if c > cap}
            shingle_sets = {
                i: ss - hot for i, ss in shingle_sets.items()
            }
        out = {}
        for a, b in itertools.combinations(sorted(shingle_sets), 2):
            sa, sb = shingle_sets[a], shingle_sets[b]
            if not sa or not sb:
                continue
            inter = len(sa & sb)
            union = len(sa | sb)
            if union and inter / union >= t:
                out[(a, b)] = inter / union
        return out

    for trial in range(5):
        if trial == 4:
            # FP-boundary regime: threshold*n_sh lands a hair above an
            # exact integer in IEEE (0.07*100 = 7.000000000000001); a
            # raw ceil would shorten the prefix and lose boundary
            # pairs.  Long docs over a bigger vocabulary produce
            # shingle counts near 100.
            big_vocab = [f"w{i}" for i in range(140)]
            texts = [
                " ".join(rng.choices(big_vocab, k=rng.randint(90, 120)))
                for _ in range(10)
            ]
            thresholds = ((0.07, None), (0.07, 30))
        else:
            texts = [
                " ".join(rng.choices(vocab, k=rng.randint(3, 14)))
                for _ in range(rng.randint(8, 16))
            ]
            thresholds = ((0.1, None), (0.35, None), (0.7, 3))
        docs = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        for t, cap in thresholds:
            want = brute(texts, 2, t, cap)
            # pin BOTH physical branches: the corpus-size auto-gate
            # (round 6) would otherwise route these tiny corpora to
            # the plain join and silently un-test the prefix filter
            for filtered in (True, False):
                got = {
                    (r.id_1, r.id_2): r.jaccard
                    for r in dedup.ngram_jaccard_pairs(
                        docs, "doc_id", "text", n=2, threshold=t,
                        max_doc_freq=cap, prefix_filter=filtered,
                    ).collect()
                }
                assert set(got) == set(want), (trial, t, cap, filtered)
                for k in want:
                    assert abs(got[k] - want[k]) < 1e-12, (
                        trial, t, cap, filtered, k,
                    )


@settings(max_examples=4, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from("abcdefg"), min_size=3, max_size=12
        ).map(lambda cs: " ".join(cs)),
        min_size=2,
        max_size=10,
    )
)
def test_minhash_lsh_matches_pure_python_reference(spark, texts):
    """Mirrored-oracle cover for the d_minhash_lsh family: the DuckDB
    oracle computes the IDENTICAL md5-based minhash, so a flaw in the
    distributed plumbing that also lands in the oracle SQL (band
    grouping, 32-bit hex split, groupBy-min) could hash-match while
    both are wrong.  Pin the Spark signature table AND the banding
    candidate set against an independently-written single-machine
    reference: hashlib md5 per shingle, (h1 + i*h2) mod p minima per
    doc, pairs sharing any band tuple."""
    import hashlib

    from data_management_python_spark.llmdata import dedup

    n, k, bands = 2, 8, 4
    rows = list(enumerate(texts))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    # --- pure-Python reference ---
    P = dedup.MINHASH_PRIME
    want_sig: dict[int, list[int]] = {}
    for doc_id, text in rows:
        toks = text.strip().lower().split()
        shingles = {
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        }
        if not shingles:
            continue
        mins = [P] * k
        for s in shingles:
            hx = hashlib.md5(s.encode()).hexdigest()
            h1, h2 = int(hx[:8], 16), int(hx[8:16], 16)
            for i in range(k):
                v = (h1 + i * h2) % P
                if v < mins[i]:
                    mins[i] = v
        want_sig[doc_id] = mins
    want_pairs = set()
    ids = sorted(want_sig)
    r = k // bands
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            for band in range(bands):
                lo = band * r
                if want_sig[a][lo : lo + r] == want_sig[b][lo : lo + r]:
                    want_pairs.add((a, b))
                    break

    # --- distributed ---
    got_sig = {
        row["doc_id"]: [row[f"mh{i}"] for i in range(k)]
        for row in dedup.minhash_signatures(
            dedup.word_shingles(docs, "doc_id", "text", n=n),
            "doc_id",
            num_hashes=k,
        ).collect()
    }
    assert got_sig == want_sig
    got_pairs = {
        (row.id_1, row.id_2)
        for row in dedup.lsh_candidate_pairs(
            docs, "doc_id", "text", n=n, num_hashes=k, bands=bands
        ).collect()
    }
    assert got_pairs == want_pairs


@settings(max_examples=4, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd"]),
            min_size=1,
            max_size=20,
        ).map(" ".join),
        min_size=1,
        max_size=8,
    )
)
def test_simhash_matches_pure_python_reference(spark, texts):
    """Mirrored-oracle cover for d_simhash: the oracle computes the
    identical md5-derived bit votes in SQL, so both engines could agree
    on a wrong sign convention or bit order.  Exact parity against an
    independently-written reference (md5 16-bit token hash, +1/-1 vote
    per bit WITH multiplicity, strictly-positive sum sets the bit)."""
    import hashlib
    import re

    from data_management_python_spark.llmdata import dedup

    bits = 16
    rows = list(enumerate(texts))
    want = {}
    for doc_id, text in rows:
        # mirror the operator's tokenizer exactly: split(trim(lower))
        toks = re.split(r"\s+", text.strip().lower())
        votes = [0] * bits
        for t in toks:
            h = int(hashlib.md5(t.encode()).hexdigest()[:4], 16)
            for k in range(bits):
                votes[k] += 1 if (h >> k) & 1 else -1
        want[doc_id] = sum(1 << k for k in range(bits) if votes[k] > 0)

    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.simhash
        for r in dedup.simhash(docs, "doc_id", "text", bits=bits).collect()
    }
    assert got == want


@settings(max_examples=4, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["x", "y", "z"]), min_size=8, max_size=30
        ).map(" ".join),
        min_size=2,
        max_size=6,
    )
)
def test_duplicated_spans_matches_pure_python_reference(spark, texts):
    """Mirrored-oracle cover for d_span_dedup: fingerprints, the %4
    sample, and the cross-document grouping recomputed single-machine
    (hashlib md5 over the joined 8-gram, first 8 hex chars) and
    compared exactly."""
    import hashlib
    import re
    from collections import defaultdict

    from data_management_python_spark.llmdata import dedup

    k, mod_p = 8, 4
    rows = list(enumerate(texts))
    occ = defaultdict(list)  # fp -> [doc_id, ...] with multiplicity
    for doc_id, text in rows:
        toks = re.split(r"\s+", text.strip().lower())
        for i in range(len(toks) - k + 1):
            fp = int(
                hashlib.md5(
                    " ".join(toks[i : i + k]).encode()
                ).hexdigest()[:8],
                16,
            )
            if fp % mod_p == 0:
                occ[fp].append(doc_id)
    want = {
        fp: (len(set(ds)), len(ds), min(ds), max(ds))
        for fp, ds in occ.items()
        if len(set(ds)) >= 2
    }

    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.fp: (r.n_docs, r.n_occurrences, r.min_id, r.max_id)
        for r in dedup.duplicated_spans(
            docs, "doc_id", "text", k=k, mod_p=mod_p
        ).collect()
    }
    assert got == want


@settings(max_examples=4, deadline=None)
@given(
    st.integers(min_value=1, max_value=12),
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=11),
            st.integers(min_value=0, max_value=11),
        ),
        min_size=0,
        max_size=18,
    ),
)
def test_connected_components_matches_union_find(spark, n_nodes, raw_edges):
    """Mirrored-oracle cover for the dup-cluster family: the
    d_dup_clusters oracle replays the same min-label propagation in
    SQL, so a convergence or labeling flaw shared by both engines
    would hash-match.  Pin against an independent union-find on random
    graphs (self-loops, duplicate and reversed edges included)."""
    from data_management_python_spark.llmdata import dedup

    edges = [(a, b) for a, b in raw_edges if a < n_nodes and b < n_nodes]
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = smallest node id in the component
    comp_min = {}
    for x in range(n_nodes):
        r = find(x)
        comp_min[r] = min(comp_min.get(r, x), x)
    want = {x: comp_min[find(x)] for x in range(n_nodes)}

    nodes = spark.createDataFrame(
        [(i,) for i in range(n_nodes)], "doc_id long"
    )
    edges_df = spark.createDataFrame(
        edges or [(0, 0)], "id_1 long, id_2 long"
    )
    if not edges:
        edges_df = edges_df.limit(0)
    got = {
        r.doc_id: r.cluster_id
        for r in dedup.connected_components(nodes, edges_df).collect()
    }
    assert got == want
