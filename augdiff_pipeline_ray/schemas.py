"""Arrow schemas for every table the engine reads or writes.

The element schema mirrors the reference's fixed ``osmSchema``
(common/src/main/scala/Common.scala:83-97) with the documented type mapping (SURVEY.md §1.4):
decimals → float64 (the reference itself consumes lat/lon as double at every use), timestamps
at ms precision, plus the engine's ``cell`` partition column next to the reference's ``p``.

``tags`` is a ``map<string,string>``; ``nds`` a ``list<struct<ref:int64>>``; ``members`` a
``list<struct<type:string, ref:int64, role:string>>`` — exactly the reference's nested shapes
so OSC parity fixtures round-trip.
"""

from __future__ import annotations

import pyarrow as pa

TAGS_TYPE = pa.map_(pa.string(), pa.string())
NDS_TYPE = pa.list_(pa.struct([pa.field("ref", pa.int64())]))
MEMBERS_TYPE = pa.list_(
    pa.struct(
        [
            pa.field("type", pa.string()),
            pa.field("ref", pa.int64()),
            pa.field("role", pa.string()),
        ]
    )
)

ELEMENT_FIELDS = [
    pa.field("p", pa.int64()),
    pa.field("cell", pa.int64()),
    pa.field("id", pa.int64()),
    pa.field("type", pa.string()),
    pa.field("tags", TAGS_TYPE),
    pa.field("lat", pa.float64()),
    pa.field("lon", pa.float64()),
    pa.field("nds", NDS_TYPE),
    pa.field("members", MEMBERS_TYPE),
    pa.field("changeset", pa.int64()),
    pa.field("timestamp", pa.timestamp("ms")),
    pa.field("uid", pa.int64()),
    pa.field("user", pa.string()),
    pa.field("version", pa.int64()),
    pa.field("visible", pa.bool_()),
]

ELEMENT_SCHEMA = pa.schema(ELEMENT_FIELDS)

# changes = element schema + batch bookkeeping (FIXTURES.md §3)
CHANGE_SCHEMA = pa.schema(
    ELEMENT_FIELDS
    + [pa.field("batch_seq", pa.int64()), pa.field("action", pa.string())]
)

# dependency-index edge (a ← b depends transitively on a); reference Common.scala:119-125
EDGE_SCHEMA = pa.schema(
    [
        pa.field("a", pa.int64()),
        pa.field("b", pa.int64()),
        pa.field("cell", pa.int64()),
    ]
)

# the hinted image table (BASELINE.json input_hint), exact shape
IMAGE_SCHEMA = pa.schema(
    [
        pa.field("image_id", pa.string()),
        pa.field("bytes", pa.binary()),
        pa.field("w", pa.int32()),
        pa.field("h", pa.int32()),
        pa.field("fmt", pa.string()),
        pa.field("caption", pa.string()),
        pa.field("phash", pa.int64()),
    ]
)

TILE_ASSIGNMENT_SCHEMA = pa.schema(
    [
        pa.field("batch_seq", pa.int64()),
        pa.field("image_id", pa.string()),
        pa.field("cell", pa.int64()),
        pa.field("key", pa.int64()),
        pa.field("assignment_kind", pa.string()),
    ]
)

LINEAGE_SCHEMA = pa.schema(
    [
        pa.field("batch_seq", pa.int64()),
        pa.field("cell", pa.int64()),
        pa.field("rows_in", pa.int64()),
        pa.field("rows_out", pa.int64()),
        pa.field("bytes", pa.int64()),
        pa.field("wall_ms", pa.float64()),
        pa.field("status", pa.string()),
    ]
)


def empty_table(schema: pa.Schema) -> pa.Table:
    return schema.empty_table()
