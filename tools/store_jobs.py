"""One-off r12 instrumentation: time every driver-blocking DataFrame
action fired by single invocations of the store-protocol queries, with
the store-code call site, by monkeypatching the action methods."""

import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Spark 4: concrete instances are the CLASSIC subclass, which overrides
# the pyspark.sql.DataFrame methods — wrap the subclass or see nothing
from pyspark.sql.classic.dataframe import DataFrame

from data_management_python_spark.plans import collect_queries
from data_management_python_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="store_jobs", shuffle_partitions=os.environ.get("SPARK_GRAFT_SHUFFLE", "8"))
spark.sparkContext.setLogLevel("ERROR")
qs = collect_queries()
qs["p1_eq_filter"].fn(spark, SF).collect()  # warmup

LOG = []


def _site():
    for fr in reversed(traceback.extract_stack()):
        f = fr.filename
        if "data_management_python_spark" in f and "tools" not in f:
            return f"{os.path.basename(f)}:{fr.lineno}:{fr.name}"
    return "?"


def wrap(cls, meth):
    orig = getattr(cls, meth)

    def timed(self, *a, **k):
        t0 = time.time()
        out = orig(self, *a, **k)
        LOG.append((time.time() - t0, meth, _site()))
        return out

    setattr(cls, meth, timed)


for m in ("isEmpty", "first", "count", "collect", "localCheckpoint"):
    wrap(DataFrame, m)

# the parquet/noop writes go through DataFrameWriter.parquet/save
from pyspark.sql.readwriter import DataFrameReader, DataFrameWriter

for m in ("parquet", "save"):
    wrap(DataFrameWriter, m)
for m in ("parquet", "load", "json"):
    wrap(DataFrameReader, m)

for qname in sys.argv[1:]:
    qs[qname].fn(spark, SF).write.format("noop").mode("overwrite").save()  # warm
    LOG.clear()
    t0 = time.time()
    qs[qname].fn(spark, SF).write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    print(f"\n=== {qname}: {wall:.2f}s wall, {len(LOG)} actions, {sum(d for d, _, _ in LOG):.2f}s in actions")
    for d, meth, site in LOG:
        if d >= 0.02:
            print(f"  {d:6.3f}s  {meth:16s} {site}")
