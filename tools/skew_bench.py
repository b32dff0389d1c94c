"""Skew-governor demo: a_skew_profile's derived salt feeding
operators.joins.salted_join, measured end-to-end against the plain
shuffle join and AQE's skew-join handling on a hub-skewed key.

Scenario: a big fact whose join key has one HUB value carrying ~40% of
all rows (hot customer / empty-barcode sentinel / viral product),
joined to a per-key dimension.  The plain shuffle join lands the hub's
entire volume on one task; AQE can split skewed SMJ partitions at
runtime; salting spreads the hub across `salt` sub-keys BEFORE the
shuffle — the only option when the downstream is an aggregation keyed
on the hub or a hinted shuffle-hash join outside AQE's skew rules.

Usage: python tools/skew_bench.py [n_rows]
Prints one line per strategy; results go into SCALE.md.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    from pyspark.sql import functions as F

    from data_management_python_spark.operators.joins import salted_join
    from data_management_python_spark.session import get_spark

    spark = get_spark(app_name="skew_bench")
    spark.sparkContext.setLogLevel("ERROR")

    n_keys = 100_000
    # realistic fact width: ~200-byte rows (a narrow all-long fact
    # sorts so fast the hub never shows; real events/docs rows are
    # wide, and the hub's cost is its shuffle+sort VOLUME)
    big = (
        spark.range(n)
        .select(
            F.when(F.col("id") % 5 < 2, F.lit(0))
            .otherwise(F.pmod(F.xxhash64("id"), F.lit(n_keys)))
            .alias("k"),
            F.col("id").alias("payload"),
            F.concat(
                F.lit("x" * 180), F.col("id").cast("string")
            ).alias("body"),
        )
        .localCheckpoint(eager=True)
    )
    small = (
        spark.range(n_keys)
        .select(F.col("id").alias("k"), (F.col("id") * 2).alias("dim"))
        .localCheckpoint(eager=True)
    )

    # the governor: profile the key, derive the salt (a_skew_profile's
    # exact recommended_salt formula)
    t0 = time.time()
    prof = (
        big.groupBy("k")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .agg(
            F.max("cnt").alias("mx"),
            F.expr("percentile(cnt, 0.99)").alias("p99"),
        )
        .withColumn(
            "recommended_salt",
            F.ceil(
                F.round(F.col("mx") / F.greatest("p99", F.lit(1.0)), 6)
            ).cast("bigint"),
        )
        .first()
    )
    salt = int(prof["recommended_salt"])
    print(
        f"profile: max/key={prof['mx']} p99={prof['p99']:.1f} "
        f"recommended_salt={salt}  [{time.time() - t0:.2f}s]"
    )
    # salting cost grows with the factor; cap at the session width the
    # way a governor would (spreading wider than the task slots buys
    # nothing)
    salt = min(salt, 32)

    def timed(label, fn):
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        # checksum, not a row count: strategies must agree on it
        print(f"{label:34s} {dt:7.2f}s  checksum={out}")
        return dt

    def consume(j):
        # force the joined rows through: length(body) touches the wide
        # column post-join, sum folds it — no decomposable shortcut
        # around the join itself
        return j.agg(
            F.sum(F.length("body") + F.col("dim")).alias("s")
        ).first()[0]

    def run_plain_no_aqe():
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            return consume(big.hint("merge").join(small, "k"))
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", "true")

    def run_aqe_skew():
        # AQE on (session default) with forced SMJ so the skew-join
        # rule applies; broadcast would dodge the skew entirely, which
        # is the right call for THIS dim size but not the scenario
        # (at 100 TB the dim side exceeds the broadcast threshold)
        return consume(big.hint("merge").join(small, "k"))

    def run_salted():
        return consume(salted_join(big, small, "k", salts=salt))

    def run_hub_agg_decomposable():
        # control row: a DECOMPOSABLE agg keyed on the hub needs no
        # salting — map-side partial aggregation collapses the hub
        # before the shuffle.  Recorded so the governor is not applied
        # where Spark already wins.
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            return (
                big.groupBy("k")
                .agg(F.sum(F.length("body")).alias("s"))
                .agg(F.count(F.lit(1)))
                .first()[0]
            )
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", "true")

    # warm the join code paths once
    big.limit(1000).join(small, "k").count()

    timed("join plain SMJ (AQE off)", run_plain_no_aqe)
    timed("join SMJ + AQE skew split", run_aqe_skew)
    timed(f"join salted_join(salts={salt})", run_salted)
    timed("hub groupBy sum (no salt needed)", run_hub_agg_decomposable)
    spark.stop()


if __name__ == "__main__":
    main()
