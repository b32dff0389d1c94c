"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is executed to completion via a count-style action (collect of
the already-small result) after a warm-up of the parquet footer reads.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from data_management_python_spark.plans import collect_queries
    from data_management_python_spark.session import get_spark

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = collect_queries()
    # warm the JVM + file listing once so per-query timings measure the plan
    qs["p1_eq_filter"].fn(spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name, q in qs.items():
        t0 = time.time()
        df = q.fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.time() - t0, 4)
        _ = n
    total = round(sum(timings.values()), 4)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "total_query_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
