"""BPE encode throughput benchmark (round-8, VERDICT item 5).

The testdata documents corpus has ~31 distinct words (Zipf toy), which
any per-word cache trivializes — so this harness builds a DETERMINISTIC
realistic corpus (20k-word vocabulary of random letter strings, Zipf
sampling, ~1M running words over 5k docs), trains 500 merges with the
pure-Python reference trainer, and times ``apply_bpe`` end to end.

Prints one JSON line: {"tokens": N, "sec": s, "tok_per_sec": r,
"tok_per_sec_core": r/cores, "merges": m, "vocab": v}.

Run: SPARK_GRAFT_CPUS=32 python tools/bpe_throughput.py [n_docs]
"""

from __future__ import annotations

import json
import os
import sys
import time
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synthetic_corpus(n_docs: int, words_per_doc: int = 200):
    import numpy as np

    rs = np.random.RandomState(8)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    vocab = [
        "".join(rs.choice(letters, size=rs.randint(3, 13)))
        for _ in range(20_000)
    ]
    # Zipf ranks: word i drawn with weight 1/(i+1)
    w = 1.0 / np.arange(1, len(vocab) + 1)
    p = w / w.sum()
    docs = []
    for d in range(n_docs):
        idx = rs.choice(len(vocab), size=words_per_doc, p=p)
        docs.append((d, " ".join(vocab[i] for i in idx)))
    return docs


def main() -> None:
    from data_management_python_spark.llmdata.bpe import (
        apply_bpe,
        bpe_train_reference,
    )
    from data_management_python_spark.session import get_spark
    from pyspark.sql import functions as F

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(shuffle_partitions="8")
    rows = synthetic_corpus(n_docs)
    counts: Counter = Counter()
    for _, t in rows:
        counts.update(t.split())
    merges = bpe_train_reference(counts, 500)
    docs = (
        spark.createDataFrame(rows, "doc_id long, text string")
        .repartition(cores)
        .localCheckpoint(eager=True)
    )
    # warm one pass (worker fork + codegen), then time two
    apply_bpe(docs, merges).select(F.sum(F.size("bpe_tokens"))).first()
    best = None
    ntok = 0
    for _ in range(2):
        t0 = time.time()
        ntok = (
            apply_bpe(docs, merges)
            .select(F.sum(F.size("bpe_tokens")))
            .first()[0]
        )
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    print(
        json.dumps(
            {
                "tokens": int(ntok),
                "sec": round(best, 3),
                "tok_per_sec": round(ntok / best),
                "tok_per_sec_core": round(ntok / best / cores),
                "merges": len(merges),
                "vocab": len(counts),
                "n_docs": n_docs,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
