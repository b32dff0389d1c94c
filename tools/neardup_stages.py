"""One-off r12 instrumentation: time the stages inside the
near_dup_pairs + connected_components session-cache build at sf0.1."""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from data_management_python_spark.session import get_spark, operator_width
from data_management_python_spark.llmdata import dedup
from data_management_python_spark.llmdata.queries import load_table
from pyspark.sql import functions as F

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = get_spark(app_name="neardup_stages", shuffle_partitions=os.environ.get("SPARK_GRAFT_SHUFFLE", "8"))
spark.sparkContext.setLogLevel("ERROR")

docs = load_table(spark, SF, "documents")
docs.select("doc_id").count()  # warmup

t = {}


def clock(name):
    def deco(fn):
        t0 = time.time()
        out = fn()
        t[name] = time.time() - t0
        print(f"{name:28s} {t[name]:7.2f}s", flush=True)
        return out

    return deco


from data_management_python_spark.llmdata.dedup import _shingle_parts, minhash_signatures, band_signature_structs

width = operator_width(spark)

toked, shx = _shingle_parts(docs, "doc_id", "text", 3, distinct=True)


@clock("shingle_checkpoint")
def sh():
    return (
        toked.repartition(width)
        .select(F.col("doc_id"), F.explode(shx).alias("shingle"))
        .localCheckpoint(eager=True)
    )


@clock("sizes_agg")
def sizes():
    s = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    s.count()
    return s


@clock("minhash_sig")
def sig():
    s = minhash_signatures(sh, "doc_id", 16)
    s.count()
    return s


@clock("band_table_persist")
def band_sigs():
    bs = (
        sig.select(F.col("doc_id"), F.explode(band_signature_structs(16, 4)).alias("bs"))
        .select("doc_id", F.col("bs.band").alias("band"), F.col("bs.band_sig").alias("band_sig"))
        .repartition(width, "band", "band_sig")
        .persist()
    )
    bs.count()
    return bs


@clock("cands_selfjoin")
def cands():
    a = band_sigs.select(F.col("doc_id").alias("id_1"), "band", "band_sig")
    b = band_sigs.select(F.col("doc_id").alias("id_2"), "band", "band_sig")
    c = (
        a.join(b, on=["band", "band_sig"])
        .filter(F.col("id_1") < F.col("id_2"))
        .select("id_1", "id_2")
        .distinct()
    )
    c.count()
    return c


@clock("verify_join")
def pairs():
    a = sh.select(F.col("doc_id").alias("id_1"), F.col("shingle").alias("__s"))
    b = sh.select(F.col("doc_id").alias("id_2"), F.col("shingle").alias("__s"))
    inter = (
        F.broadcast(cands)
        .join(a, on="id_1")
        .join(b.hint("shuffle_hash"), on=["id_2", "__s"])
        .groupBy("id_1", "id_2")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    na = F.broadcast(sizes.select(F.col("doc_id").alias("id_1"), F.col("n_sh").alias("n_a")))
    nb = F.broadcast(sizes.select(F.col("doc_id").alias("id_2"), F.col("n_sh").alias("n_b")))
    p = (
        inter.join(na, "id_1")
        .join(nb, "id_2")
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= 0.2)
        .select("id_1", "id_2", "jaccard")
    )
    p.count()
    return p


@clock("full_near_dup_pairs_fresh")
def p2():
    p = dedup.near_dup_pairs(docs, "doc_id", "text", n=3, num_hashes=16, bands=4, threshold=0.2)
    p.count()
    return p


@clock("connected_components")
def comp():
    c = dedup.connected_components(docs.select("doc_id"), p2.select("id_1", "id_2"))
    c.count()
    return c


print("TOTAL staged:", round(sum(v for k, v in t.items() if k not in ("full_near_dup_pairs_fresh", "connected_components")), 2))
