"""Sources & sinks (SURVEY.md §2.1) — checkpointed Parquet tables with
manifests, the sandbox stand-in for Iceberg table commits."""
