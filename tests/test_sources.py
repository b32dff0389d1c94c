"""Tests for file-format sources against synthetic fixtures (fixture
files written from the public Illumina format specs — same structures
the reference's golden files exercise, SURVEY §5)."""

from __future__ import annotations

import gzip
import io
import zipfile
from pathlib import Path

from pyspark.sql import functions as F

from data_management_python_spark.sources import fastq as fastq_src
from data_management_python_spark.sources import interop as interop_src
from data_management_python_spark.sources import runinfo_xml as xml_src
from data_management_python_spark.sources import samplesheet as ss
from data_management_python_spark.sources import sinks
from data_management_python_spark.sources.fastqc import read_fastqc_zips
from data_management_python_spark.sources.stats_json import (
    read_demux_stats,
    with_mapping_stats,
)

FIX = Path(__file__).parent / "fixtures"


# --- SampleSheet -----------------------------------------------------------


def test_samplesheet_v1_parse_and_normalize(spark):
    df = ss.read_samplesheet(spark, str(FIX / "SampleSheet_v1.csv"))
    rows = {r.Sample_ID: r for r in df.collect()}
    assert len(rows) == 4
    assert df.filter(F.col("sheet_version") == "v1").count() == 4
    # ':user' suffix stripped; Description uppercased, ':' -> '-'
    assert rows["SMP001"].Sample_Project == "PROJ_A"
    assert rows["SMP003"].Description == "10X-V3"
    assert rows["SMP004"].Description == "10X"


def test_samplesheet_v2_detection(spark):
    df = ss.read_samplesheet(spark, str(FIX / "SampleSheet_v2.csv"))
    assert df.count() == 3
    assert df.first().sheet_version == "v2"
    assert "Lane" not in df.columns


def test_pseudo_lane(spark):
    v2 = ss.read_samplesheet(spark, str(FIX / "SampleSheet_v2.csv"))
    miseq = ss.add_pseudo_lane(v2, "MISEQ")
    assert {r.PseudoLane for r in miseq.collect()} == {"1"}
    nextseq = ss.add_pseudo_lane(v2, "NEXTSEQ2000")
    assert nextseq.count() == 12  # 3 rows x 4 pseudo-lanes
    v1 = ss.read_samplesheet(spark, str(FIX / "SampleSheet_v1.csv"))
    with_lane = ss.add_pseudo_lane(v1, "HISEQ4000")
    assert {r.PseudoLane for r in with_lane.collect()} == {"1", "2"}


def test_index_length_groups_and_revcomp(spark):
    v1 = ss.read_samplesheet(spark, str(FIX / "SampleSheet_v1.csv"))
    grouped = ss.group_by_index_length(v1)
    by_id = {r.Sample_ID: r.index_length_group for r in grouped.collect()}
    assert by_id["SMP001"] == 16  # 8 + 8 dual index
    rc = ss.revcomp_index(v1.filter(F.col("Sample_ID") == "SMP001"), "index2")
    assert rc.first().index2 == "AGGCTATA"  # revcomp of TATAGCCT


def test_samplesheet_validation_rules(spark):
    v1 = ss.read_samplesheet(spark, str(FIX / "SampleSheet_v1.csv"))
    assert ss.validate_samplesheet_rows(v1).count() == 0  # fixture is clean
    bad = spark.createDataFrame(
        [
            ("S1", "S1", "ACGT", "", ""),          # id == name
            ("S2", "N2", "SI-GA-B2", "", ""),      # 10X code on non-10X row
            ("S3", "N3", "not_a_barcode", "", ""),
        ],
        "Sample_ID string, Sample_Name string, index string, Description string, index2 string",
    )
    errs = {r.Sample_ID: r.validation_error for r in
            ss.validate_samplesheet_rows(bad).collect()}
    assert set(errs) == {"S1", "S2", "S3"}


# --- Stats.json ------------------------------------------------------------


def test_stats_json_flatten(spark):
    stats = read_demux_stats(spark, str(FIX / "Stats.json"))
    rows = stats.collect()
    known = [r for r in rows if r.tag == "known"]
    unknown = [r for r in rows if r.tag == "unknown"]
    assert len(known) == 3 and len(unknown) == 5
    lane1_known = {r.sample: r.reads for r in known if r.lane == 1}
    assert lane1_known == {"SMP001": 500000, "SMP002": 400000}
    # unknown rows inherit the lane's TotalClustersPF
    assert all(r.total_read in (1000000, 800000) for r in unknown)
    enriched = with_mapping_stats(stats)
    smp1 = enriched.filter(F.col("sample") == "SMP001").first()
    assert abs(smp1.mapping_ratio - 0.5) < 1e-12


# --- RunInfo / RunParameters / bases mask ----------------------------------


def test_runinfo_and_bases_mask(spark):
    run_df, reads_df = xml_src.read_runinfo(spark, str(FIX / "RunInfo.xml"))
    run = run_df.first()
    assert run.run_id == "260115_NS9001_0042_AHTESTFC42"
    assert run.lane_count == 2
    assert reads_df.count() == 4
    # samplesheet says 8bp indexes but the run sequenced 10 cycles
    assert xml_src.bases_mask(reads_df, [8, 8]) == "Y151,I8N2,I8N2,Y151"
    assert xml_src.bases_mask(reads_df, [10, 0]) == "Y151,I10,N10,Y151"


def test_runparameters_flatten(spark):
    df = xml_src.read_runparameters(spark, str(FIX / "RunParameters.xml"))
    row = df.first()
    assert row.InstrumentType == "NextSeq2000"
    assert row.Chemistry_ChemistryVersion == "3.1"


# --- InterOp ----------------------------------------------------------------


def test_interop_sections(spark):
    out = interop_src.read_interop_dump(spark, str(FIX / "interop_dump.txt"))
    assert set(out) == {"Tile", "Q2030", "Error"}
    assert out["Tile"].count() == 3
    q = out["Q2030"].withColumn("Q30", F.col("Q30").cast("long"))
    assert q.agg(F.sum("Q30")).first()[0] == 3900000 + 3890000 + 3910000


# --- fastq ------------------------------------------------------------------


def _make_fastq(path: Path, n_reads: int) -> None:
    rec = b"@read%d\nACGTACGT\n+\nFFFFFFFF\n"
    with gzip.open(path, "wb") as fh:
        for i in range(n_reads):
            fh.write(rec % i)


def test_fastq_listing_pairing_counting(spark, tmp_path):
    d = tmp_path / "fq" / "PROJ_A"
    d.mkdir(parents=True)
    _make_fastq(d / "SampleAlpha_S1_L001_R1_001.fastq.gz", 10)
    _make_fastq(d / "SampleAlpha_S1_L001_R2_001.fastq.gz", 10)
    _make_fastq(d / "SampleBeta_S2_L002_R1_001.fastq.gz", 7)

    files = fastq_src.list_fastq_files(spark, str(tmp_path / "fq"))
    assert files.count() == 3

    pairs = fastq_src.pair_fastq_files(files)
    by_sample = {r.sample_name: r for r in pairs.collect()}
    assert by_sample["SampleAlpha"].library_layout == "PAIRED"
    assert by_sample["SampleBeta"].library_layout == "SINGLE"
    assert by_sample["SampleBeta"].R2 is None

    n = fastq_src.count_fastq_reads(
        spark, str(d / "SampleAlpha_S1_L001_R1_001.fastq.gz")
    )
    assert n == 10
    counts = fastq_src.count_fastq_reads_many(
        spark,
        [str(d / "SampleAlpha_S1_L001_R1_001.fastq.gz"),
         str(d / "SampleBeta_S2_L002_R1_001.fastq.gz")],
    )
    got = {Path(r.file_path).name: r.n_reads for r in counts.collect()}
    assert got == {
        "SampleAlpha_S1_L001_R1_001.fastq.gz": 10,
        "SampleBeta_S2_L002_R1_001.fastq.gz": 7,
    }


# --- fastqc -----------------------------------------------------------------


def test_fastqc_scrape(spark, tmp_path):
    data = (
        "##FastQC\t0.11.9\n>>Basic Statistics\tpass\n"
        "#Measure\tValue\nFilename\tx.fastq.gz\n"
        "Total Sequences\t123456\nSequence length\t35-151\n>>END_MODULE\n"
    )
    zpath = tmp_path / "SampleAlpha_S1_L001_R1_001_fastqc.zip"
    with zipfile.ZipFile(zpath, "w") as zf:
        zf.writestr("SampleAlpha_fastqc/fastqc_data.txt", data)
    out = read_fastqc_zips(spark, str(tmp_path)).collect()
    assert len(out) == 1
    assert out[0].total_sequences == 123456
    assert out[0].sequence_length == "35-151"


# --- sinks ------------------------------------------------------------------


def test_manifest_and_gviz(spark, tmp_path):
    df = spark.createDataFrame(
        [("/data/a.fastq.gz", "abc123", 1000), ("/data/b.fastq.gz", "def456", 2000)],
        "file_path string, md5 string, size long",
    )
    out = tmp_path / "manifest"
    sinks.write_manifest_tsv(df.repartition(1), str(out))
    text = next(out.glob("*.csv")).read_text()
    assert "file_path\tmd5\tsize" in text and "/data/a.fastq.gz\tabc123\t1000" in text

    gviz = sinks.to_gviz_json(df, column_order=["file_path", "size"])
    import json

    parsed = json.loads(gviz)
    assert [c["id"] for c in parsed["cols"]] == ["file_path", "size"]
    assert parsed["cols"][1]["type"] == "number"
    assert len(parsed["rows"]) == 2


def test_dump_catalog_json_roundtrip(spark, tmp_path):
    """S18: whole-DB dump — per-table JSON dirs and the reference-shaped
    single-document dump (igf_portal/metadata_utils.py:33-121)."""
    import datetime
    import json

    import pytest

    tables = {
        "project": spark.createDataFrame(
            [(1, "PrjA", datetime.datetime(2020, 5, 4, 12, 0)),
             (2, "PrjB", datetime.datetime(2021, 6, 5, 13, 30))],
            "project_id long, igf_id string, start_timestamp timestamp",
        ),
        "sample": spark.createDataFrame(
            [(10, 1, "S1"), (11, 1, "S2"), (12, 2, "S3")],
            "sample_id long, project_id long, igf_id string",
        ),
        "platform": spark.createDataFrame(
            [(100, "HiSeq")], "platform_id long, model string"
        ),
    }

    # distributed per-table dump round-trips through spark.read.json
    out_dir = tmp_path / "dump_dirs"
    sinks.dump_catalog_json(tables, str(out_dir))
    back = spark.read.json(str(out_dir / "sample"))
    assert back.count() == 3
    assert {r.igf_id for r in back.collect()} == {"S1", "S2", "S3"}

    # single-document dump: {table: [records]}, temporals stringified
    out_file = tmp_path / "metadata.json"
    sinks.dump_catalog_single_json(tables, str(out_file))
    doc = json.loads(out_file.read_text())
    assert set(doc) == {"project", "sample", "platform"}
    assert len(doc["sample"]) == 3
    ts = {r["start_timestamp"] for r in doc["project"]}
    assert all(isinstance(t, str) and t.startswith("202") for t in ts)

    # reference refuses to overwrite an existing dump
    with pytest.raises(OSError):
        sinks.dump_catalog_single_json(tables, str(out_file))


def test_fastq_datasource_reads_records(spark, tmp_path):
    from data_management_python_spark.sources.fastq_datasource import (
        register_fastq_source,
    )

    d = tmp_path / "fqds"
    d.mkdir()
    _make_fastq(d / "SampleAlpha_S1_L001_R1_001.fastq.gz", 5)
    # plain-text file alongside gz: both open paths exercised
    rec = "@read%d\nTTTTACGT\n+\nIIIIIIII\n"
    with open(d / "SampleBeta_S2_L002_R1_001.fastq", "w") as fh:
        for i in range(3):
            fh.write(rec % i)

    register_fastq_source(spark)
    df = spark.read.format("fastq").load(str(d))
    assert df.columns == ["file_path", "record_no", "read_id", "sequence", "quality"]
    assert df.count() == 8
    # one partition per file (gz is unsplittable; file is the task unit)
    assert df.rdd.getNumPartitions() == 2
    rows = df.filter(F.col("file_path").endswith(".fastq")).orderBy("record_no").collect()
    assert [r.read_id for r in rows] == ["read0", "read1", "read2"]
    assert rows[0].sequence == "TTTTACGT" and rows[0].quality == "IIIIIIII"
    # distributed per-read aggregation over the source
    per_file = {r.file_path.split("/")[-1]: r.n for r in
                df.groupBy("file_path").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per_file == {
        "SampleAlpha_S1_L001_R1_001.fastq.gz": 5,
        "SampleBeta_S2_L002_R1_001.fastq": 3,
    }


def test_fastq_datasource_rejects_malformed(spark, tmp_path):
    from data_management_python_spark.sources.fastq_datasource import (
        register_fastq_source,
    )

    d = tmp_path / "fqbad"
    d.mkdir()
    with open(d / "Broken_S1_L001_R1_001.fastq", "w") as fh:
        fh.write("@read0\nACGT\n+\nFFFF\n@read1\nACGT\n")  # truncated record
    register_fastq_source(spark)
    import pytest as _pytest

    with _pytest.raises(Exception, match="truncated FASTQ"):
        spark.read.format("fastq").load(str(d)).count()


def test_write_partitioned_dataset_layout(spark, tmp_path):
    from data_management_python_spark.catalog import load_table
    from data_management_python_spark.sources.sinks import write_partitioned_dataset

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = str(tmp_path / "docs_by_lang")
    write_partitioned_dataset(docs, out, ["lang"], sort_by=["doc_id"])
    import os

    dirs = {d for d in os.listdir(out) if d.startswith("lang=")}
    langs = {r.lang for r in docs.select("lang").distinct().collect()}
    assert dirs == {f"lang={l}" for l in langs}
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    # partition pruning: a lang filter scans only that directory
    one = next(iter(langs))
    pruned = back.filter(back.lang == one)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert pruned.count() == docs.filter(docs.lang == one).count()


def test_write_bucketed_table_joins_without_shuffle(spark, tmp_path):
    from data_management_python_spark.catalog import load_table
    from data_management_python_spark.sources.sinks import write_bucketed_table

    orders = load_table(spark, "/root/testdata/sf0.001", "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    li = load_table(spark, "/root/testdata/sf0.001", "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    write_bucketed_table(orders, "t_orders_b", ["o_orderkey"], 4)
    write_bucketed_table(li, "t_lineitem_b", ["l_orderkey"], 4)
    try:
        threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            a = spark.table("t_orders_b")
            b = spark.table("t_lineitem_b")
            joined = a.join(b, a.o_orderkey == b.l_orderkey)
            joined.count()
            plan = joined._jdf.queryExecution().executedPlan().toString()
            # co-bucketed on the join key: neither side shuffles
            assert "Exchange hashpartitioning" not in plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_apply_flowcell_rules(spark):
    """Platform barcode-rule application (flowcell_rules.json parity):
    NextSeq revcomps index2 only; MiSeq is a no-op; unknown platform is
    a registration error."""
    import pytest

    sheet = spark.createDataFrame(
        [("S1", "ACGT", "GGCA")], "Sample_ID string, index string, index2 string"
    )
    nextseq = ss.apply_flowcell_rules(sheet, "NB00001", "NEXTSEQ")
    r = nextseq.collect()[0]
    assert r["index"] == "ACGT"          # NO_CHANGE
    assert r["index2"] == "TGCC"         # revcomp(GGCA)

    miseq = ss.apply_flowcell_rules(sheet, "MI00001", "MISEQ")
    r = miseq.collect()[0]
    assert (r["index"], r["index2"]) == ("ACGT", "GGCA")

    with pytest.raises(KeyError):
        ss.apply_flowcell_rules(sheet, "UNKNOWN", "NOVASEQ")


def test_write_sorted_dataset_global_order(spark, tmp_path):
    """Range-partitioned sorted write: files are internally sorted AND
    file ranges are disjoint, so concatenating files in range order
    yields a total order — with no single-reducer global sort."""
    df = spark.range(0, 10_000).select(
        (F.col("id") * 7919 % 10_000).alias("k"), F.col("id").alias("v")
    )
    out = tmp_path / "sorted"
    sinks.write_sorted_dataset(df, str(out), ["k"], num_files=4)
    import glob

    files = sorted(glob.glob(str(out / "*.parquet")))
    assert len(files) == 4
    ranges = []
    for f in files:
        pdf = spark.read.parquet(f).toPandas()
        ks = pdf["k"].tolist()
        assert ks == sorted(ks)  # sorted within file
        ranges.append((min(ks), max(ks)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # disjoint file ranges -> total order
    # all rows survive
    assert spark.read.parquet(str(out)).count() == 10_000


def test_write_zorder_dataset_prunes_both_dims(spark, tmp_path):
    from pyspark.sql import functions as F

    from data_management_python_spark.sources.sinks import (
        write_sorted_dataset,
        write_zorder_dataset,
    )

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )

    def avg_file_span(path, col):
        df = spark.read.parquet(path)
        lo, hi = df.agg(F.min(col), F.max(col)).first()
        spans = (
            df.groupBy(F.input_file_name().alias("f"))
            .agg((F.max(col) - F.min(col)).alias("span"))
            .agg(F.avg("span"))
            .first()[0]
        )
        return spans / ((hi - lo) or 1.0)

    zp, sp = str(tmp_path / "z"), str(tmp_path / "s")
    write_zorder_dataset(
        orders, zp, ["o_totalprice", "o_custkey"], num_files=16
    )
    write_sorted_dataset(orders, sp, ["o_totalprice"], num_files=16)

    # same rows either way
    assert spark.read.parquet(zp).count() == orders.count()
    # the single-key sorted layout leaves the second column unclustered
    # (every file spans ~the full custkey domain); z-order clusters both
    z2, s2 = avg_file_span(zp, "o_custkey"), avg_file_span(sp, "o_custkey")
    assert s2 > 0.8, f"sorted layout unexpectedly clustered custkey: {s2}"
    assert z2 < 0.6, f"z-order did not cluster custkey: {z2}"
    # and still clusters the first column far better than random
    assert avg_file_span(zp, "o_totalprice") < 0.6


def test_columnar_roundtrip_orc_and_zstd_parquet(spark, tmp_path):
    """ORC and zstd-parquet write/read round-trips preserve data, and
    both formats keep predicate pushdown in the scan plan."""
    from data_management_python_spark.sources.sinks import (
        read_columnar_dataset,
        write_columnar_dataset,
    )

    df = spark.range(0, 1000).selectExpr(
        "id", "id % 7 AS grp", "CAST(id AS STRING) AS s"
    )
    expect = sorted((r.id, r.grp, r.s) for r in df.collect())
    for fmt, codec in [("orc", "zstd"), ("parquet", "zstd"), ("orc", None)]:
        out = str(tmp_path / f"ds_{fmt}_{codec}")
        write_columnar_dataset(df, out, fmt=fmt, codec=codec)
        back = read_columnar_dataset(spark, out, fmt=fmt)
        assert sorted((r.id, r.grp, r.s) for r in back.collect()) == expect
        plan = (
            back.filter("grp = 3")
            .select("id")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "PushedFilters: [" in plan
        assert "grp" in plan.split("PushedFilters: [", 1)[1][:120]


def test_zordered_write_tightens_file_bounds(spark, tmp_path):
    """Z-ordered files must be tight in BOTH clustering columns at
    once: average per-file normalized range shrinks vs a random
    (hash-partitioned) layout for each column — which is exactly what
    footer-stats pruning needs for two-key workloads."""
    from pyspark.sql import functions as F

    from data_management_python_spark.catalog import load_table
    from data_management_python_spark.sources.sinks import (
        write_zorder_dataset,
    )

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    zpath = str(tmp_path / "zord")
    rpath = str(tmp_path / "rand")
    write_zorder_dataset(li, zpath, ["l_orderkey", "l_partkey"],
                         num_files=8)
    li.repartition(8).write.parquet(rpath)

    def avg_ranges(path):
        df = spark.read.parquet(path).withColumn("f", F.input_file_name())
        rows = (
            df.groupBy("f")
            .agg(
                (F.max("l_orderkey") - F.min("l_orderkey")).alias("ro"),
                (F.max("l_partkey") - F.min("l_partkey")).alias("rp"),
            )
            .collect()
        )
        return (
            sum(r.ro for r in rows) / len(rows),
            sum(r.rp for r in rows) / len(rows),
        )

    zo, zp = avg_ranges(zpath)
    ro, rp = avg_ranges(rpath)
    # random layout: every file spans ~the full range of both columns.
    # 8 z-ordered files ~ 3 extra bits of locality split across 2 dims
    assert zo < ro * 0.6, (zo, ro)
    assert zp < rp * 0.6, (zp, rp)
    # row fidelity: clustering must not lose or duplicate rows
    assert spark.read.parquet(zpath).count() == li.count()


def test_zorder_key_locality_roundtrip(spark):
    """Morton key basics: monotone in each dim when the other is fixed,
    and adjacent grid cells differ in few key bits (locality)."""
    from data_management_python_spark.operators.layout import (
        interleave_bits,
        zorder_key,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(x, y) for x in range(4) for y in range(4)], "x long, y long"
    )
    keyed, z = zorder_key(df, ["x", "y"], bits=2)
    rows = {(r.x, r.y): r["__z"] for r in keyed.collect()}
    # scaled to 2-bit grid: x,y in {0..3} map to themselves
    # (0,0)->0, (1,0)->1, (0,1)->2, (1,1)->3: the Morton curve
    assert rows[(0, 0)] == 0
    assert rows[(1, 0)] == 1
    assert rows[(0, 1)] == 2
    assert rows[(1, 1)] == 3
    assert rows[(3, 3)] == 15


def test_overwrite_partitions_replaces_only_touched(spark, tmp_path):
    """Dynamic partition overwrite: backfilling one partition replaces
    it and leaves the others byte-identical; re-running the same
    backfill is idempotent."""
    from pyspark.sql import functions as F

    from data_management_python_spark.sources.sinks import (
        overwrite_partitions,
        write_partitioned_dataset,
    )

    path = str(tmp_path / "parted")
    full = spark.createDataFrame(
        [(d, i, float(i)) for d in (1, 2, 3) for i in range(5)],
        "day int, id int, v double",
    )
    write_partitioned_dataset(full, path, ["day"])
    before = {
        (r.day, r.id): r.v for r in spark.read.parquet(path).collect()
    }
    assert len(before) == 15

    # backfill day 2 with corrected values (and one fewer row)
    fix = spark.createDataFrame(
        [(2, i, float(i) * 100) for i in range(4)], "day int, id int, v double"
    )
    overwrite_partitions(fix, path, ["day"])
    after = {(r.day, r.id): r.v for r in spark.read.parquet(path).collect()}
    assert len(after) == 14
    for (d, i), v in after.items():
        assert v == (float(i) * 100 if d == 2 else before[(d, i)])
    # untouched partitions really are untouched
    assert all(after[(d, i)] == before[(d, i)] for d in (1, 3) for i in range(5))

    # idempotence: same backfill again -> same result
    overwrite_partitions(fix, path, ["day"])
    again = {(r.day, r.id): r.v for r in spark.read.parquet(path).collect()}
    assert again == after
    # conf restored
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode").upper()
        == "STATIC"
    )


def test_transfer_tree_copies_and_verifies(spark, tmp_path):
    """Distributed tree copy: layout + bytes preserved, manifest md5s
    match, verify_transfer returns empty on success and flags
    corruption."""
    import hashlib
    import os

    from data_management_python_spark.sources.transfer import (
        transfer_tree,
        verify_transfer,
    )

    src = tmp_path / "run_src"
    (src / "fastq").mkdir(parents=True)
    files = {
        "RunInfo.xml": b"<RunInfo/>" * 10,
        "fastq/s1_R1.fastq": b"@r1\nACGT\n+\nFFFF\n" * 50,
        "fastq/s1_R2.fastq": b"@r1\nTGCA\n+\nFFFF\n" * 50,
    }
    for rel, data in files.items():
        (src / rel).write_bytes(data)
    dest = tmp_path / "run_dest"
    manifest = transfer_tree(spark, str(src), str(dest))
    rows = {r.rel_path: r for r in manifest.collect()}
    assert set(rows) == set(files)
    for rel, data in files.items():
        assert rows[rel].n_bytes == len(data)
        assert rows[rel].md5 == hashlib.md5(data).hexdigest()
        assert (dest / rel).read_bytes() == data

    man_df = spark.createDataFrame(
        [(r.rel_path, r.n_bytes, r.md5) for r in rows.values()],
        "rel_path string, n_bytes long, md5 string",
    )
    assert verify_transfer(spark, man_df, str(dest)).count() == 0
    # corrupt one file -> exactly that row flags
    (dest / "RunInfo.xml").write_bytes(b"tampered")
    bad = verify_transfer(spark, man_df, str(dest)).collect()
    assert [r.rel_path for r in bad] == ["RunInfo.xml"]
    os.remove(dest / "fastq" / "s1_R2.fastq")
    bad2 = {r.rel_path for r in verify_transfer(spark, man_df, str(dest)).collect()}
    assert bad2 == {"RunInfo.xml", "fastq/s1_R2.fastq"}


def test_transfer_tree_special_filenames_and_scheme_guard(spark, tmp_path):
    """Names with spaces/percent-signs round-trip through the URI
    decode on BOTH the copy and the verify side; cloud schemes are
    rejected loudly instead of creating literal 's3a:' dirs."""
    import pytest

    from data_management_python_spark.sources.transfer import (
        transfer_tree,
        verify_transfer,
    )

    src = tmp_path / "weird src"
    src.mkdir()
    (src / "my file %20.txt").write_bytes(b"payload-1")
    (src / "plain.txt").write_bytes(b"payload-2")
    dest = tmp_path / "weird dest"
    manifest = transfer_tree(spark, str(src), str(dest))
    rows = {r.rel_path for r in manifest.collect()}
    assert rows == {"my file %20.txt", "plain.txt"}
    assert (dest / "my file %20.txt").read_bytes() == b"payload-1"
    assert verify_transfer(spark, manifest, str(dest)).count() == 0

    with pytest.raises(ValueError, match="locally-mounted"):
        transfer_tree(spark, "s3a://bucket/run", str(dest))
    with pytest.raises(ValueError, match="locally-mounted"):
        verify_transfer(spark, manifest, "hdfs://nn/dest")


def test_transfer_manifest_is_eager(spark, tmp_path):
    """The copy happens exactly once, inside transfer_tree — reusing
    the returned manifest in later actions (e.g. verify_transfer) must
    not re-run the copy over a since-corrupted destination."""
    from data_management_python_spark.sources.transfer import (
        transfer_tree,
        verify_transfer,
    )

    src = tmp_path / "eager_src"
    src.mkdir()
    (src / "a.txt").write_bytes(b"original")
    dest = tmp_path / "eager_dest"
    manifest = transfer_tree(spark, str(src), str(dest))
    # corrupt AFTER the call returns; a lazy plan would heal this
    # during the verify join and nondeterministically report success
    (dest / "a.txt").write_bytes(b"tampered")
    bad = verify_transfer(spark, manifest, str(dest)).collect()
    assert [r.rel_path for r in bad] == ["a.txt"]
