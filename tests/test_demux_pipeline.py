"""End-to-end demux pipeline composition test: samplesheet fixture ->
work units -> simulated demux outputs -> registration -> report."""

from __future__ import annotations

import gzip
from pathlib import Path

from pyspark.sql import functions as F

from data_management_python_spark.plans.demux_pipeline import (
    build_work_units,
    demux_report,
    register_fastq_outputs,
    work_unit_manifest,
)
from data_management_python_spark.sources import fastq as fastq_src
from data_management_python_spark.sources.runinfo_xml import bases_mask, read_runinfo
from data_management_python_spark.sources.samplesheet import read_samplesheet

FIX = Path(__file__).parent / "fixtures"


def _make_fastq(path: Path, n_reads: int) -> None:
    rec = b"@r%d\nACGT\n+\nFFFF\n"
    with gzip.open(path, "wb") as fh:
        for i in range(n_reads):
            fh.write(rec % i)


def test_demux_pipeline_end_to_end(spark, tmp_path):
    # stages 1-2: work units from the samplesheet
    sheet = read_samplesheet(spark, str(FIX / "SampleSheet_v1.csv"))
    units = build_work_units(sheet, platform_series="HISEQ4000")
    manifest = work_unit_manifest(units)
    m = {r.work_unit: r for r in manifest.collect()}
    # the 10X kit sample expands to 4 single 8bp barcodes, which land in
    # their OWN index-length work unit — the exact reason the reference
    # splits demux by (project, lane, index-length group)
    assert m["PROJ_B:2:8"].n_samples == 4
    assert m["PROJ_B:2:8"].sample_ids == "SMP004_1;SMP004_2;SMP004_3;SMP004_4"
    assert m["PROJ_A:1:16"].n_samples == 2
    assert m["PROJ_B:2:16"].n_samples == 1

    # stage 3: bases mask for the run, using a unit's index lengths
    _, reads_df = read_runinfo(spark, str(FIX / "RunInfo.xml"))
    assert bases_mask(reads_df, [8, 8]) == "Y151,I8N2,I8N2,Y151"

    # stage 4 simulated: demultiplexer wrote per-sample fastqs
    fq = tmp_path / "fastq" / "PROJ_A"
    fq.mkdir(parents=True)
    _make_fastq(fq / "SampleAlpha_S1_L001_R1_001.fastq.gz", 12)
    _make_fastq(fq / "SampleAlpha_S1_L001_R2_001.fastq.gz", 12)
    _make_fastq(fq / "SampleBeta_S2_L001_R1_001.fastq.gz", 5)

    # stages 5-6: discover, pair, count, register
    files = fastq_src.list_fastq_files(spark, str(tmp_path / "fastq"))
    counts = fastq_src.count_fastq_reads_many(
        spark, [str(p) for p in fq.glob("*_R1_*.fastq.gz")]
    )
    registered = register_fastq_outputs(
        units, files, counts, platform_model="HISEQ4000",
        flowcell_id="HTESTFC42",
    )
    rows = {r.sample_name: r for r in registered.collect()}
    assert rows["SampleAlpha"].library_layout == "PAIRED"
    assert rows["SampleAlpha"].R1_READ_COUNT == 12
    assert rows["SampleAlpha"].experiment_igf_id == "SMP001_HISEQ4000"
    assert rows["SampleAlpha"].run_igf_id == "SMP001_HISEQ4000_HTESTFC42_1"
    assert rows["SampleBeta"].library_layout == "SINGLE"

    # stage 7: per-project report
    rep = {r.project_igf_id: r for r in demux_report(registered).collect()}
    assert rep["PROJ_A"].n_samples == 2
    assert rep["PROJ_A"].total_reads == 17
    assert rep["PROJ_A"].n_paired_units == 1
