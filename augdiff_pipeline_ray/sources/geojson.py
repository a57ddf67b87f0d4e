"""ndjson GeoJSON feature sink — one atomically-written file per micro-batch (S8).

Reference: ChangeAugmenter.scala:151-157 opens one output stream per OSC batch and
RowsToJson emits newline-delimited features into it. Here the batch's features arrive as
ordered JSON strings; the file is written tmp+rename so a killed run never leaves a
half-written batch (idempotent by sequence number — part of the lineage commit protocol).
"""

from __future__ import annotations

import os
from pathlib import Path

from . import osc


def batch_json_path(template: str, seq: int) -> str:
    """'…/AAA/BBB/CCC.ndjson' template → concrete path for a sequence number
    (M17, AugmentedDiff.scala:161-163,217-223)."""
    aaa, bbb, ccc = osc.sequence_path(seq).split("/")
    return template.replace("AAA", aaa).replace("BBB", bbb).replace("CCC", ccc)


def write_features(path: str, lines: list[str]) -> int:
    """Write ordered ndjson lines atomically; returns bytes written."""
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    payload = "".join(s if s.endswith("\n") else s + "\n" for s in lines).encode()
    tmp = str(p) + ".tmp"
    with open(tmp, "wb") as f:
        f.write(payload)
    os.replace(tmp, p)
    return len(payload)


def write_features_arrow(path: str, features, order) -> int:
    """Arrow-native ordered ndjson write: take the permutation, wrap the column as one
    list row, ``binary_join`` with newline — the batch's feature bytes never become
    Python strings (they are ~the whole output volume). Byte-identical to
    :func:`write_features` (features carry no trailing newline; e2e goldens assert)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
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
    tmp = str(p) + ".tmp"
    with open(tmp, "wb") as f:
        f.write(memoryview(buf))
        f.write(b"\n")  # trailing newline, parity with write_features
    os.replace(tmp, p)
    return len(buf) + 1
