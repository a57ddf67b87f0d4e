"""ndjson GeoJSON feature sink — one atomically-written file per micro-batch (S8).

Reference: ChangeAugmenter.scala:151-157 opens one output stream per OSC batch and
RowsToJson emits newline-delimited features into it. Here the batch's features arrive as
ordered JSON strings; the file is written tmp+rename so a killed run never leaves a
half-written batch (idempotent by sequence number — part of the lineage commit protocol).

Paths may be plain local paths OR URIs (``file://``, ``s3://``, ``hdfs://``, ``gs://``
— the schemes the reference's writer reaches via the Hadoop FS layer,
ChangeAugmenter.scala:151-157): URI paths route through ``pyarrow.fs``. Local paths keep
the tmp+rename commit; object stores have no rename, so there stream *completion* is the
atomic commit (an interrupted write never becomes visible), preserving the idempotent
per-sequence protocol.
"""

from __future__ import annotations

import os
from pathlib import Path

from . import osc

_URI_SCHEMES = ("file", "s3", "hdfs", "gs")


def batch_json_path(template: str, seq: int) -> str:
    """'…/AAA/BBB/CCC.ndjson' template → concrete path for a sequence number
    (M17, AugmentedDiff.scala:161-163,217-223)."""
    aaa, bbb, ccc = osc.sequence_path(seq).split("/")
    return template.replace("AAA", aaa).replace("BBB", bbb).replace("CCC", ccc)


def _uri_fs(path: str):
    """→ (pyarrow FileSystem, fs-local path) for URI paths, (None, path) for local."""
    from urllib.parse import urlparse

    if urlparse(str(path)).scheme in _URI_SCHEMES:
        import pyarrow.fs as pafs

        return pafs.FileSystem.from_uri(str(path))
    return None, str(path)


def _commit_bytes(path: str, *parts) -> None:
    """Write one batch file so a partial write is never visible: local = tmp+rename;
    pyarrow-fs URI = single output stream (completion is the commit). ``parts`` are
    written back-to-back so zero-copy Arrow buffers never concatenate in Python."""
    fs, p = _uri_fs(path)
    if fs is not None:
        import posixpath

        fs.create_dir(posixpath.dirname(p), recursive=True)
        with fs.open_output_stream(p) as f:
            for part in parts:
                f.write(part)
        return
    pp = Path(p)
    pp.parent.mkdir(parents=True, exist_ok=True)
    tmp = p + ".tmp"
    with open(tmp, "wb") as f:
        for part in parts:
            f.write(part)
    os.replace(tmp, p)


def write_features(path: str, lines: list[str]) -> int:
    """Write ordered ndjson lines atomically; returns bytes written."""
    payload = "".join(s if s.endswith("\n") else s + "\n" for s in lines).encode()
    _commit_bytes(path, payload)
    return len(payload)


def write_features_arrow(path: str, features, order) -> int:
    """Arrow-native ordered ndjson write: take the permutation, wrap the column as one
    list row, ``binary_join`` with newline — the batch's feature bytes never become
    Python strings (they are ~the whole output volume). Byte-identical to
    :func:`write_features` (features carry no trailing newline; e2e goldens assert)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    n = len(features)
    if n == 0:
        return write_features(path, [])
    ordered = pc.take(features, order)
    if isinstance(ordered, pa.ChunkedArray):
        ordered = ordered.combine_chunks()
    as_bin = ordered.cast(pa.large_binary())
    one_row = pa.LargeListArray.from_arrays(
        pa.array([0, n], pa.int64()), as_bin
    )
    joined = pc.binary_join(one_row, pa.scalar(b"\n", pa.large_binary()))
    buf = joined[0].as_buffer()  # zero-copy view of the contiguous payload
    # trailing newline as a separate part, parity with write_features
    _commit_bytes(path, memoryview(buf), b"\n")
    return len(buf) + 1
