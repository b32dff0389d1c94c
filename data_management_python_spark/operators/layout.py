"""Multi-dimensional data layout: Z-order (Morton) clustering.

The lakehouse OPTIMIZE ZORDER primitive: interleave the bits of
several scaled key columns into one locality-preserving value, range-
partition and sort files by it, and a reader filtering on ANY subset
of those columns prunes most files from their min/max footer stats —
the layout answer to "we filter this 100 TB table by two different
keys and can only sort by one".

Everything here is expression-level (no UDF, no collect beyond one
1-row min/max aggregate), and the bit math is generated from ONE
Python loop for both the Spark Column and an equivalent SQL string
(:func:`zorder_sql_expr`) so an oracle can reproduce values exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fixed_width_bin(col, lo, hi, nbins: int, clamp_low: bool = False):
    """Shared fixed-width binning Column: floor((x-lo)*n/(hi-lo))
    clamped to the top bin, degenerate hi==lo range guarded to bin 0
    (divide-by-zero diverges between engines: Spark null vs DuckDB
    NaN).  ONE definition with a SQL twin (:func:`fixed_width_bin_sql`)
    so every binning consumer — batch histogram/PSI oracles AND the
    streaming drift monitor — guards identically.  ``clamp_low``
    additionally floors below-range values into bin 0 (needed when
    ``lo`` is a frozen baseline bound, not the batch min)."""
    binned = F.when(hi == lo, F.lit(0).cast("bigint")).otherwise(
        F.least(
            F.floor((col - lo) * nbins / (hi - lo)).cast("bigint"),
            F.lit(nbins - 1),
        )
    )
    if clamp_low:
        binned = F.greatest(F.lit(0).cast("bigint"), binned)
    return binned


def fixed_width_bin_sql(c: str, lo: str, hi: str, nbins: int) -> str:
    """The SQL twin of :func:`fixed_width_bin` — same guard, same
    IEEE arithmetic order."""
    return (
        f"CASE WHEN {hi} = {lo} THEN 0 "
        f"ELSE LEAST(CAST(FLOOR(({c} - {lo}) * {nbins} / ({hi} - {lo})) "
        f"AS BIGINT), {nbins - 1}) END"
    )


def scale_to_grid(
    col: Column, lo: Column, hi: Column, bits: int
) -> Column:
    """Min-max scale a numeric column onto the integer grid
    [0, 2^bits): floor((v - lo) / (hi - lo) * (2^bits - 1)).

    The (v-lo)/(hi-lo) ratio is computed BEFORE the grid multiply so
    v == hi lands exactly on 1.0 (same-operand division) and the top
    cell needs no epsilon; a degenerate lo == hi range maps to 0.
    Identical IEEE double sequence as the SQL twin below.
    """
    g = float(2**bits - 1)
    return F.when(hi == lo, F.lit(0).cast("bigint")).otherwise(
        F.least(
            F.floor(
                (col.cast("double") - lo) / (hi - lo) * F.lit(g)
            ).cast("bigint"),
            F.lit(2**bits - 1),
        )
    )


def interleave_bits(cols: list[Column], bits: int) -> Column:
    """Morton interleave: bit b of column i lands at position
    b * len(cols) + i.  Pure shift/mask arithmetic on longs — stays in
    whole-stage codegen; 2 cols x 16 bits fits comfortably in a long
    (32 bits), up to 4 cols x 16 = 64."""
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed long")
    z = F.lit(0).cast("bigint")
    for b in range(bits):
        for i, c in enumerate(cols):
            z = z + F.shiftleft(
                F.shiftright(c, b).bitwiseAND(F.lit(1)), b * n + i
            )
    return z


def zorder_sql_expr(
    scaled_cols: list[str], bits: int
) -> str:
    """The SQL twin of :func:`interleave_bits` over already-scaled
    integer column names — one formula, two engines, so Z-values are
    oracle-checkable."""
    n = len(scaled_cols)
    terms = [
        f"((({c} >> {b}) & 1) << {b * n + i})"
        for b in range(bits)
        for i, c in enumerate(scaled_cols)
    ]
    return " + ".join(terms)


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 16
) -> tuple[DataFrame, str]:
    """Attach a ``__z`` Morton key over ``cols`` (min-max scaled per
    column from one 1-row aggregate broadcast back).  Returns the
    augmented frame and the key column name."""
    bounds = df.agg(
        *[F.min(c).cast("double").alias(f"__lo_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"__hi_{c}") for c in cols],
    )
    withb = df.crossJoin(F.broadcast(bounds))
    scaled = [
        scale_to_grid(
            F.col(c), F.col(f"__lo_{c}"), F.col(f"__hi_{c}"), bits
        )
        for c in cols
    ]
    out = withb.withColumn("__z", interleave_bits(scaled, bits)).drop(
        *[f"__lo_{c}" for c in cols], *[f"__hi_{c}" for c in cols]
    )
    return out, "__z"


# The dataset WRITER built on this math lives with its siblings:
# sources.sinks.write_zorder_dataset (range-partition + in-file sort on
# the Morton key, timestamp-aware quantization).  This module is the
# expression library it and the oracle-checked a_zorder_cells query
# share.
