"""Sources & sinks: input-table readers, Iceberg-or-parquet sink, the
partition-level checkpoint manifest, and per-partition lineage counters.
"""
