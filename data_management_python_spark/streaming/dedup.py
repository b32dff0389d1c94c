"""Streaming deduplication — the incremental counterpart of
``llmdata.dedup`` for document streams.

Two shapes:

  - :func:`stream_exact_dedup`: first-seen exact dedup by content hash
    via Structured Streaming's built-in ``dropDuplicates`` /
    ``dropDuplicatesWithinWatermark``.  With an event-time column the
    watermark bounds state (the 100 TB-stream path: state holds only
    hashes younger than the lateness horizon); without one, state
    grows with distinct contents (documented, fine for bounded
    backfills).
  - :func:`running_dup_counter`: custom stateful operator
    (``applyInPandasWithState``) emitting, per content hash, the
    first-seen doc id and a running duplicate count — the streaming
    analog of ``exact_dedup_groups``'s (keep_id, n_copies) output,
    updated every micro-batch.

Reference parity note: the reference dedups batch-wise inside pandas
frames (metadata_validation duplicate checks); a continuously-fed
corpus needs the state-store form.
"""

from __future__ import annotations

from typing import Iterable

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


def stream_exact_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    event_time_col: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """First occurrence of each distinct content survives; later exact
    duplicates are dropped across micro-batches via the state store.

    Output: (id, text_md5, text[, event_time]).  State is keyed by the
    16-byte md5, not the document body — constant bytes per distinct
    content regardless of document size.
    """
    hashed = docs.select(
        F.col(id_col), F.md5(F.col(text_col)).alias("text_md5"), F.col(text_col),
        *([F.col(event_time_col)] if event_time_col else []),
    )
    if event_time_col is not None:
        from data_management_python_spark.streaming.windows import (
            ensure_event_time_ltz,
        )

        hashed = ensure_event_time_ltz(hashed, event_time_col)
        return hashed.withWatermark(event_time_col, watermark).dropDuplicatesWithinWatermark(
            ["text_md5"]
        )
    return hashed.dropDuplicates(["text_md5"])


DUP_COUNTER_OUTPUT = StructType(
    [
        StructField("text_md5", StringType()),
        StructField("keep_id", LongType()),
        StructField("n_copies", LongType()),
    ]
)

_DUP_STATE = StructType(
    [StructField("keep_id", LongType()), StructField("n", LongType())]
)


def running_dup_counter(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-content running duplicate counter (update mode).

    Emits (text_md5, keep_id, n_copies) each micro-batch a content hash
    appears; keep_id is the minimum id ever seen for that content —
    the same canonical-survivor rule as the batch
    ``exact_dedup_groups``.  O(1) state per distinct content.
    """
    hashed = docs.select(
        F.md5(F.col(text_col)).alias("text_md5"), F.col(id_col).alias("__id")
    )

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        keep, n = (state.get[0], state.get[1]) if state.exists else (None, 0)
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            n += len(pdf)
            batch_min = int(pdf["__id"].min())
            keep = batch_min if keep is None else min(keep, batch_min)
        state.update((keep, n))
        yield pd.DataFrame(
            {"text_md5": [key[0]], "keep_id": [keep], "n_copies": [n]}
        )

    return hashed.groupBy("text_md5").applyInPandasWithState(
        update,
        outputStructType=DUP_COUNTER_OUTPUT,
        stateStructType=_DUP_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


LSH_CANDIDATE_OUTPUT = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("first_id", LongType()),
        StructField("band", LongType()),
    ]
)

_LSH_STATE = StructType([StructField("first_id", LongType())])


def stream_lsh_candidates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Streaming MinHash-LSH near-duplicate CANDIDATES: each arriving
    document is flagged against the first document ever seen in any of
    its LSH band buckets.

    Pipeline: map-side MinHash signature
    (``dedup.minhash_signature_map_side`` — pure projection, no
    aggregation, so it is legal before the stateful stage) -> band
    explode -> ``applyInPandasWithState`` keyed by (band, band_sig)
    with O(1) state per bucket (the first doc id).  Output rows
    (doc_id, first_id, band) in append mode; exact-verify downstream
    (batch ``verified_pairs`` on the flagged ids) to confirm, same
    candidates-then-verify contract as the batch path.

    State grows with distinct band buckets; for unbounded streams put
    a TTL on buckets by switching to transformWithState timers or
    periodically compacting the checkpoint — documented limitation,
    same class as stream_exact_dedup without an event-time column.
    A document whose buckets are all fresh emits nothing.
    """
    from data_management_python_spark.llmdata.dedup import (
        band_signature_structs,
        minhash_signature_map_side,
    )

    sig = minhash_signature_map_side(docs, id_col, text_col, n, num_hashes)
    banded = sig.select(
        F.col(id_col),
        F.explode(band_signature_structs(num_hashes, bands)).alias("bs"),
    ).select(
        F.col(id_col).alias("doc_id"),
        F.col("bs.band").cast("long").alias("band"),
        F.col("bs.band_sig").alias("band_sig"),
    )

    def flag(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        band, _sig = key
        ids: list[int] = []
        for pdf in pdfs:
            ids.extend(int(x) for x in pdf["doc_id"])
        ids.sort()
        if state.exists:
            (first,) = state.get
            flagged = ids
        else:
            first = ids[0]
            state.update((first,))
            flagged = ids[1:]
        yield pd.DataFrame(
            {
                "doc_id": flagged,
                "first_id": [first] * len(flagged),
                "band": [band] * len(flagged),
            }
        )

    return banded.groupBy("band", "band_sig").applyInPandasWithState(
        flag,
        outputStructType=LSH_CANDIDATE_OUTPUT,
        stateStructType=_LSH_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
