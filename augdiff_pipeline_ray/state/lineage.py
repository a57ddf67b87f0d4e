"""Per-(batch, cell) lineage checkpoints — the resume story the reference lacks.

The reference loses up to 5 batches of driver-buffered rows on a crash and leaves its
Postgres index ahead of the ORC table (SURVEY.md §3.3, §4.4.4). Here every micro-batch
commits atomically: all of the batch's outputs (ndjson, assignments, memory rows, index
append) are written first, then one lineage Parquet file ``lineage/batch-XXXXXXXXX.parquet``
is written via tmp+rename. Presence of that file == the batch is committed; a resumed run
skips committed batches entirely (their outputs are idempotent files named by batch_seq).

The file carries one row per touched cell — (batch_seq, cell, rows_in, rows_out, bytes,
wall_ms, status) — the per-partition metrics the north rule asks for.
"""

from __future__ import annotations

import os
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

from ..schemas import LINEAGE_SCHEMA


class Lineage:
    def __init__(self, root: str):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    def _path(self, batch_seq: int) -> Path:
        return self.root / f"batch-{batch_seq:09d}.parquet"

    def commit(self, batch_seq: int, cell_rows: list[dict]) -> None:
        """Atomically record a completed batch. cell_rows: dicts matching LINEAGE_SCHEMA."""
        if not cell_rows:
            cell_rows = [
                {"batch_seq": batch_seq, "cell": -1, "rows_in": 0, "rows_out": 0,
                 "bytes": 0, "wall_ms": 0.0, "status": "committed"}
            ]
        t = pa.Table.from_pylist(cell_rows, schema=LINEAGE_SCHEMA)
        tmp = self._path(batch_seq).with_suffix(".tmp")
        pq.write_table(t, tmp)
        os.replace(tmp, self._path(batch_seq))

    def completed(self) -> set[int]:
        return {
            int(p.stem.split("-")[1])
            for p in self.root.glob("batch-*.parquet")
        }

    def is_committed(self, batch_seq: int) -> bool:
        return self._path(batch_seq).exists()

    def load(self) -> pa.Table:
        files = sorted(self.root.glob("batch-*.parquet"))
        if not files:
            return LINEAGE_SCHEMA.empty_table()
        return pa.concat_tables([pq.read_table(f) for f in files])
