"""data_management_python_spark — a PySpark-native analytics engine.

A brand-new, idiomatic-Spark engine with the query and data-processing
capabilities of ``imperial-genomics-facility/data-management-python``
(an ENA-style genomics metadata store + Pandas ETL/QC layer), re-expressed
as declarative DataFrame/SQL plans so Catalyst/Tungsten/AQE pick the
physical strategy.  Designed for 100 TB scale: broadcast joins for small
dims, partial aggregation, no collect-to-driver in data paths.

Layout:
  session     SparkSession builder tuned for the engine
  catalog     StructType schemas for the reference's core tables + loaders
  eav         EAV attribute melt/unmelt (wide <-> narrow)
  operators/  relational operator layer (filters, joins, aggregates, setops,
              sorts, upsert/merge)
  functions/  scalar function library (genomics + general)
  sources/    file-format sources & sinks (SampleSheet, Stats.json, XML,
              InterOp, fastq, manifests, gviz JSON)
  validation/ metadata + samplesheet validation rule engine
  qc/         barcode QC analytics (fuzzy index matching, gates)
  plans/      end-to-end query plans (read-count report, benchmarks)
  streaming/  incremental discovery + pipeline-seed state machine
  llmdata/    beyond-reference LLM-data ops: dedup, similarity, text, multimodal
"""

__version__ = "0.1.0"
