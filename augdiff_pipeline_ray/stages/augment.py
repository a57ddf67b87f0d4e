"""Augment: the dependency semi-join + fetch that assembles "rows from everywhere" (J5).

Reference (ad/src/main/scala/AugmentedDiff.scala:47-93): (p, id, type) triples from the
update rows ∪ triples from both endpoints of the closure edges; group triples by
partition; fetch matching snapshot rows (partition-pruned keyed ORC reads); union
update ∪ filtered-memory ∪ storage; ``.distinct``.

Rebuild mapping:
* triples → a packed-key set; partitions derived arithmetically from keys
  (sources.snapshot.parts_of_keys).
* memory tier → the per-batch durable Parquet files (sources.snapshot.append-style memory
  store, SURVEY.md §2.5 T2) filtered by the key set (M14 semi-join against broadcast keys).
* storage fetch → partition-pruned parallel Parquet point read (S3/S4 analogue).
* ``.distinct`` (A3) → full-row dedup that *ors* the ``in_update`` provenance flag across
  duplicates — exactly the reference's set-membership window semantics (A4) without
  full-row equality fragility (SURVEY.md §4.4.2).

The dedup canonical form (and thus "the join output row set") is over normalized python
rows because one micro-batch's augmented set is small by construction (minutely churn +
closure); the heavy fetch itself is distributed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import keys as K
from ..sources import snapshot as SNAP
from .render import rows_from_arrow


def needed_keys(
    update: pa.Table, edges: set[tuple[int, int]]
) -> tuple[set[int], set[int]]:
    """→ (packed key set, partition set) from update rows + both closure-edge endpoints."""
    ks: set[int] = set()
    if len(update):
        ks.update(
            K.pack_typed(
                update["id"].to_numpy(zero_copy_only=False),
                update["type"].to_numpy(zero_copy_only=False),
            ).tolist()
        )
    for a, b in edges:
        ks.add(a)
        ks.add(b)
    if not ks:
        return set(), set()
    arr = np.fromiter(ks, np.int64, len(ks))
    parts = set(SNAP.parts_of_keys(arr).tolist())
    return ks, parts


def _row_identity(r: dict) -> tuple:
    """Canonical full-row identity for exact dedup (A3) — everything except provenance."""
    return (
        r["type"],
        r["id"],
        r["version"],
        r["timestamp"],
        r["visible"],
        r["changeset"],
        r["uid"],
        r["user"],
        None if r["lat"] is None or (isinstance(r["lat"], float) and np.isnan(r["lat"])) else round(r["lat"], 9),
        None if r["lon"] is None or (isinstance(r["lon"], float) and np.isnan(r["lon"])) else round(r["lon"], 9),
        tuple(sorted(r["tags"].items())),
        tuple(r["nds"]),
        tuple((m["type"], m["ref"], m["role"]) for m in r["members"]),
    )


def augment_rows(
    update: pa.Table,
    memory: pa.Table,
    edges: set[tuple[int, int]],
    snapshot_root: str,
    drop_tags_on_load: bool = True,
    parallel_fetch: bool | str = "auto",
) -> list[dict]:
    """→ the deduped, provenance-flagged "rows from everywhere" as normalized dicts,
    deterministically ordered (type, id, -timestamp, -version)."""
    ks, parts = needed_keys(update, edges)

    from_update = rows_from_arrow(update, in_update=np.ones(len(update), bool))

    mem_rows: list[dict] = []
    if memory is not None and len(memory):
        mk = K.pack_typed(
            memory["id"].to_numpy(zero_copy_only=False),
            memory["type"].to_numpy(zero_copy_only=False),
        )
        mask = np.isin(mk, np.fromiter(ks, np.int64, len(ks))) if ks else np.zeros(len(memory), bool)
        mem_rows = rows_from_arrow(memory.filter(pa.array(mask)))

    storage = SNAP.load_keyed(
        snapshot_root, parts, ks,
        drop_tags_on_load=drop_tags_on_load,
        parallel=parallel_fetch,
    )
    stor_rows = rows_from_arrow(storage) if len(storage) else []

    seen: dict[tuple, dict] = {}
    for r in from_update + mem_rows + stor_rows:
        ident = _row_identity(r)
        cur = seen.get(ident)
        if cur is None:
            seen[ident] = r
        elif r["in_update"] and not cur["in_update"]:
            cur["in_update"] = True
    out = list(seen.values())
    out.sort(key=lambda r: ({"node": 0, "way": 1, "relation": 2}[r["type"]], r["id"], -r["timestamp"], -r["version"]))
    return out
