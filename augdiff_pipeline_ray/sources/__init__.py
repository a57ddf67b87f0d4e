"""Sources & sinks: OSC change batches, partitioned columnar snapshot, ndjson features.

Storage format: the north rule specifies **Lance** tables; this container ships no
``lance`` package (and allows no installs), so Parquet is the in-sandbox stand-in.
Every table read/write in the engine goes through a chokepoint (``read_dataset`` /
``write_dataset`` here; the keyed snapshot store in :mod:`.snapshot`), so the format
is a swap at the chokepoint, not a rewrite: on a cluster with ``lance`` installed,
``AUGDIFF_STORAGE_FORMAT=lance`` (or a ``.lance`` path) routes through
``ray.data.read_lance`` / ``Dataset.write_lance`` — same schemas, same pipelines.
The Lance-specific wins SURVEY §1.4 maps out (scalar index on the packed key serving
the S3 point-reads via ``take``, fragment-level cell pruning for S4, version handles
as the T1 path cache) plug in behind the same snapshot-store interface."""

from __future__ import annotations

import os


def storage_format(path: str | None = None) -> str:
    """Resolve the active table format: explicit ``$AUGDIFF_STORAGE_FORMAT`` wins,
    else a ``.lance`` path suffix, else parquet (the sandbox stand-in)."""
    fmt = os.environ.get("AUGDIFF_STORAGE_FORMAT", "").lower()
    if fmt in ("parquet", "lance"):
        return fmt
    if path is not None and str(path).rstrip("/").endswith(".lance"):
        return "lance"
    return "parquet"


def _require_lance():
    try:
        import lance  # noqa: F401  (public package: lancedb/lance-format)
    except ImportError as e:  # pragma: no cover - exercised only without lance
        raise ImportError(
            "storage format 'lance' requested but the 'lance' package is not "
            "installed in this environment; Parquet is the in-sandbox stand-in "
            "(see sources/__init__.py docstring)"
        ) from e


def read_dataset(path, columns=None, **kwargs):
    """Format-dispatching table read → ``ray.data.Dataset`` (column-pruned)."""
    if storage_format(path) == "lance":
        _require_lance()
        import ray.data as rd

        return rd.read_lance(path, columns=columns, **kwargs)
    return read_parquet_clean(path, columns=columns, **kwargs)


def write_dataset(ds, path, **kwargs):
    """Format-dispatching table write (``Dataset.write_parquet``/``write_lance``)."""
    if storage_format(path) == "lance":
        _require_lance()
        return ds.write_lance(path, **kwargs)
    return ds.write_parquet(path, **kwargs)


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
