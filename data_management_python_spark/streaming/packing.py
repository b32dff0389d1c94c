"""Streaming sequence packing: the stateful greedy analog of
``llmdata.packing.pack_sequences``.

Batch packing knows every document's global offset (concat-and-chunk);
a stream does not, so the streaming packer uses the greedy
boundary-respecting rule instead: documents are appended to the
shard's open pack in arrival order, and when the next document would
overflow the token budget the pack closes and a new one opens.  A
document never straddles packs, and a doc→pack assignment is final the
moment it is made — so the operator emits in APPEND mode with O(1)
state per shard: (open pack sequence number, tokens filled).

Scale shape: state size is independent of stream length (two longs per
shard), shards partition the state store, and each micro-batch does
one pass over its rows — the standard ``applyInPandasWithState``
pattern (SURVEY §2.9-2.10 beyond-reference set).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

PACK_OUTPUT = StructType(
    [
        StructField("shard", StringType()),
        StructField("pack_seq", LongType()),
        StructField("doc_id", LongType()),
        StructField("n_tokens", LongType()),
        StructField("pack_filled", LongType()),
    ]
)

_PACK_STATE = StructType(
    [StructField("seq", LongType()), StructField("filled", LongType())]
)


def stream_pack_sequences(
    docs: DataFrame,
    budget: int,
    shard_col: str = "shard",
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
) -> DataFrame:
    """Assign streaming documents to per-shard packs of ~``budget``
    tokens (greedy, arrival order; within a micro-batch rows are taken
    in ``id_col`` order for determinism).

    Emits one row per document: (shard, pack_seq, doc_id, n_tokens,
    pack_filled), where pack_filled is the pack's token total after
    the document lands.  A document larger than the budget gets a pack
    of its own.  Append mode; assignments are never revised.
    """
    keyed = docs.select(
        F.col(shard_col).alias("shard"),
        F.col(id_col).alias("doc_id"),
        F.col(token_col).alias("n_tokens"),
    )

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        seq, filled = (state.get[0], state.get[1]) if state.exists else (0, 0)
        out: list[tuple[str, int, int, int, int]] = []
        # one key's micro-batch rows may arrive as several Arrow chunks:
        # concatenate BEFORE sorting or cross-chunk order is lost
        chunks = [pdf for pdf in pdfs if len(pdf)]
        rows = (
            pd.concat(chunks).sort_values("doc_id").itertuples(index=False)
            if chunks
            else ()
        )
        for r in rows:
            n = int(r.n_tokens)
            if filled > 0 and filled + n > budget:
                seq += 1
                filled = 0
            filled += n
            out.append((key[0], seq, int(r.doc_id), n, filled))
        state.update((seq, filled))
        yield pd.DataFrame(
            out, columns=["shard", "pack_seq", "doc_id", "n_tokens", "pack_filled"]
        )

    return keyed.groupBy("shard").applyInPandasWithState(
        update,
        outputStructType=PACK_OUTPUT,
        stateStructType=_PACK_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
