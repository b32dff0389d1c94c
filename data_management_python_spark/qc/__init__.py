"""QC analytics pipelines."""
