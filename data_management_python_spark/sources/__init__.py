"""File-format sources & sinks (SURVEY §1.5, §2.1).

KB-sized sectioned config files (SampleSheet, RunInfo.xml, InterOp
dumps) parse driver-side into Spark DataFrames — distributing a 2 KB
file is overhead, and the resulting frames join against arbitrarily
large fact tables.  Row-heavy inputs (Stats.json, fastq, manifests) go
through ``spark.read`` so they scale with the cluster.
"""
