"""Sequence packing (concat-and-chunk) for training-data pipelines.

Packing concatenates documents in a stable order and cuts the token
stream every ``budget`` tokens; each document belongs to the chunk its
START offset falls in.  The primitive underneath is a GLOBAL exclusive
prefix sum over the corpus — the op that naively becomes
``SUM() OVER (ORDER BY ...)``, i.e. a single-partition window that
serializes the whole corpus through one task.  At 100 TB that is the
difference between a plan that works and one that doesn't, so
:func:`global_prefix_sum` implements the classic two-pass distributed
scan instead:

  1. bin rows by a balanced, deterministic function of the (dense
     integer) order key — no sampling, no sort;
  2. aggregate one partial sum per bin (``num_bins`` rows — O(cluster
     parallelism), independent of corpus size) and exclusive-scan them
     on the driver;
  3. one ``applyInPandas`` pass per bin: local cumsum + the bin's base
     offset.  Token counts are int64, so every offset is exact.

Total cost: one shuffle by bin + one tiny agg — vs the single-reducer
global window.  The DuckDB oracle for the packing query IS the naive
window formulation, which is exactly the point: same semantics,
scale-correct plan.
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def global_prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "offset",
    num_bins: int | None = None,
) -> DataFrame:
    """Exclusive prefix sum of ``value_col`` in ``order_col`` order.

    ``order_col`` must be unique, non-negative integers, reasonably
    dense (bin balance degrades with sparsity — ids from
    monotonically_increasing_id or a dense sequence are fine).
    ``value_col`` must be integral (offsets stay exact).

    Returns the input plus ``out_col`` = sum of all values with a
    strictly smaller order key.
    """
    if num_bins is None:
        num_bins = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
    hi = df.select(F.max(order_col).alias("m")).first()["m"]
    if hi is None:
        return df.withColumn(out_col, F.lit(0).cast("long"))
    width = max(1, math.ceil((int(hi) + 1) / num_bins))
    bin_of = F.floor(F.col(order_col) / width).cast("long")

    partials = (
        df.select(bin_of.alias("__bin"), F.col(value_col))
        .groupBy("__bin")
        .agg(F.sum(value_col).alias("__s"))
        .collect()
    )
    sums = {int(r["__bin"]): int(r["__s"]) for r in partials}
    bases: dict[int, int] = {}
    acc = 0
    for b in sorted(sums):
        bases[b] = acc
        acc += sums[b]

    # copy first: StructType.add MUTATES the receiver, and df.schema
    # returns the DataFrame's cached instance — adding to it directly
    # corrupts the schema seen by later consumers of the same df
    schema = StructType(list(df.schema.fields)).add(
        StructField(out_col, LongType(), False)
    )
    o, v = order_col, value_col

    def scan(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(o)
        pdf[out_col] = bases[int(key[0])] + pdf[v].cumsum() - pdf[v]
        return pdf

    return (
        df.withColumn("__bin", bin_of)
        .groupBy("__bin")
        .applyInPandas(scan, schema=schema.add(StructField("__bin", LongType())))
        .drop("__bin")
    )


def pack_sequences(
    docs: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    num_bins: int | None = None,
) -> DataFrame:
    """Assign each document to its concat-and-chunk pack.

    Adds ``offset`` (the document's start position in the concatenated
    token stream, in ``id_col`` order) and ``pack_id`` =
    floor(offset / budget).  A document straddling a chunk boundary
    belongs to the chunk it starts in — the standard convention.
    """
    out = global_prefix_sum(docs, id_col, token_col, "offset", num_bins)
    return out.withColumn("pack_id", F.floor(F.col("offset") / budget))
