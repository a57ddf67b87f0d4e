"""Sources & sinks: OSC change batches, partitioned Parquet snapshot, ndjson features."""
