"""Spark-vs-DuckDB at 10x bench scale (round-11, verdict item 6).

Every bench number through round 10 was sf0.1 (600k lineitem).  This
records both engines on the same salted sf1-equivalent corpus
(/tmp/scale_sf10x, built by tools/scale_stress.build — 6M lineitem)
for the headline relational queries — the crossover region where
Spark's parallelism should start paying for its fixed overhead on
comparable work.

Method: Spark runs the registered query and COLLECTS the full result
(outputs are small aggregates, so collection cost is negligible and
both engines materialize values — bench.py's count() would let Spark
prune dead projections that DuckDB must compute).  DuckDB runs the
SAME registered oracle SQL over parquet views.  Both: min of two
runs in one process, Spark first warmed.

Usage: python tools/bench_sf1.py [q1_pricing_summary,...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

QUERIES = [
    "q1_pricing_summary",
    "q18_large_volume_customers",
    "j1_readcount_multiway",
]

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> None:
    import duckdb

    from data_management_python_spark.plans import collect_queries
    from data_management_python_spark.session import get_spark
    from tools.scale_stress import build

    names = (
        sys.argv[1].split(",") if len(sys.argv) > 1 else QUERIES
    )
    factor = int(os.environ.get("SPARK_GRAFT_BENCH_FACTOR", "10"))
    dst = f"/tmp/scale_sf{factor}x"
    spark = get_spark(
        app_name="bench_sf1",
        shuffle_partitions=os.environ.get("SPARK_GRAFT_SHUFFLE", "32"),
    )
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(os.path.join(dst, "lineitem.parquet")):
        print(f"building {dst} ...", flush=True)
        build(spark, "/root/testdata/sf0.1", dst, factor)
    qs = collect_queries()
    qs["p1_eq_filter"].fn(spark, dst).collect()  # warm

    con = duckdb.connect()
    con.execute(f"SET threads = {os.cpu_count()}")
    for t in TABLES:
        p = os.path.join(dst, f"{t}.parquet")
        if os.path.isdir(p):
            p = os.path.join(p, "*.parquet")
        if os.path.exists(p) or "*" in p:
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS "
                f"SELECT * FROM read_parquet('{p}')"
            )

    out = {}
    print(
        f"{'query':28s} {'spark s':>8s} {'duckdb s':>9s} {'ratio':>6s}"
    )
    for name in names:
        q = qs[name]
        ts = []
        for _ in range(2):
            t0 = time.time()
            rows = q.fn(spark, dst).collect()
            ts.append(time.time() - t0)
        t_spark = min(ts)
        td = []
        for _ in range(2):
            t0 = time.time()
            con.execute(q.oracle).fetchall()
            td.append(time.time() - t0)
        t_duck = min(td)
        out[name] = {
            "spark_sec": round(t_spark, 3),
            "duckdb_sec": round(t_duck, 3),
            "rows": len(rows),
        }
        print(
            f"{name:28s} {t_spark:8.2f} {t_duck:9.2f} "
            f"{t_spark / t_duck:6.2f}"
        )
    print(json.dumps({"sf": factor / 10.0, "dir": dst, "results": out}))
    spark.stop()


if __name__ == "__main__":
    main()
