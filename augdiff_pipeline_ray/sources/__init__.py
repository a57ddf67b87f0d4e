"""Sources & sinks: OSC change batches, partitioned Parquet snapshot, ndjson features."""

from __future__ import annotations


def read_parquet_clean(path, columns=None, **kwargs):
    """``ray.data.read_parquet`` with the file's pandas metadata stripped from the
    schema. pandas-written parquet carries a ``b'pandas'`` schema-metadata blob that
    makes ``pyarrow.Schema`` unhashable — every block-schema unification in Ray Data
    then logs "Failed to hash the schemas (for deduplication)" and loses its early-exit
    (a real per-block cost in hot pipelines, noted in VERDICT r1 #8). Passing an
    explicit metadata-free schema keeps every downstream block schema hashable."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    import glob
    import os

    p = path
    if os.path.isdir(p):
        hits = sorted(glob.glob(os.path.join(p, "**", "*.parquet"), recursive=True))
        if not hits:
            return rd.read_parquet(path, columns=columns, **kwargs)
        p = hits[0]
    schema = pq.read_schema(p).remove_metadata()
    if columns is not None:
        schema = pa.schema([schema.field(c) for c in columns])
    return rd.read_parquet(path, schema=schema, columns=columns, **kwargs)
