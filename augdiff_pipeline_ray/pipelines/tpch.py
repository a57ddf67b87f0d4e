"""Driver-testdata adapter: maps the TPC-H-ish tables onto the engine's data model and
exposes every operator as a (Ray pipeline, DuckDB oracle SQL) pair.

Derivations (all pure integer/double arithmetic so the DuckDB oracle can mirror them):

* **node** ← part:      id = p_partkey;  lat/lon from fixed multiplicative hashes
* **way** ← orders:     id = o_orderkey; nds = that order's l_partkey list (by l_linenumber)
* **relation** ← customer: id = c_custkey; members = that customer's orders (ways)
* **image** ← documents: phash = (doc_id·1103515245 + 12345) mod 2³¹; w/h/fmt from doc_id;
  caption = text; bytes = engine-codec-encoded deterministic pixels

This gives the real dependency DAG (node→way→relation) over driver-provided data, so the
closure/index/semi-join operators run with SQL-checkable ground truth, while the engine's
own synthetic world (worldgen.py) covers the geometry-rich cases SQL can't express.
"""

from __future__ import annotations

import hashlib
import os
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data as rd

from .. import sources as SRC

from .. import cells as C
from .. import georef
from .. import keys as K
from ..functions import dedup as DD
from ..functions import image as IMG
from ..functions import similarity as SIM
from ..functions import text as TX

BASE_TS_MS = 1_704_067_200_000  # 2024-01-01

LAT_MUL, LAT_MOD = 7919, 180_000
LON_MUL, LON_MOD = 104_729, 360_000


def _p(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# ---------------------------------------------------------------------------
# derivations (Ray side)
# ---------------------------------------------------------------------------


def node_latlon(partkeys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    pk = np.asarray(partkeys, np.int64)
    lat = ((pk * LAT_MUL) % LAT_MOD) / 1000.0 - 90.0
    lon = ((pk * LON_MUL) % LON_MOD) / 1000.0 - 180.0
    return lat, lon


def _const_key_map(key: str, items) -> pa.Array:
    """``map<string,string>`` column of one ``(key, item)`` entry per row, built from
    offsets + a repeated key — no per-row Python tuples (the ``[[(k, v)] for v ...]``
    construction cost seconds at 100k+ rows)."""
    if isinstance(items, pa.ChunkedArray):
        items = items.combine_chunks()
    if not isinstance(items, pa.Array):
        items = pa.array(items, pa.string())
    n = len(items)
    offsets = pa.array(np.arange(n + 1, dtype=np.int32), pa.int32())
    keys = pa.array(np.full(n, key, dtype=object), pa.string())
    return pa.MapArray.from_arrays(offsets, keys, items.cast(pa.string()))


def _empty_lists(n: int, item_type: pa.DataType) -> pa.Array:
    """All-empty ``list<item_type>`` column without materializing n Python lists."""
    return pa.ListArray.from_arrays(
        pa.array(np.zeros(n + 1, np.int32), pa.int32()), pa.array([], item_type)
    )


def _group_lists(sorted_keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(unique keys, list offsets) for a SORTED key column — the vectorized
    equivalent of ``groupby(key).apply(list)``. Empty input → ([], [0])."""
    if not len(sorted_keys):
        return sorted_keys[:0], np.zeros(1, np.int32)
    starts = np.nonzero(np.r_[True, np.diff(sorted_keys) != 0])[0]
    offsets = np.r_[starts, len(sorted_keys)].astype(np.int32)
    return sorted_keys[starts], offsets


def nodes_dataset(sf_dir: str) -> rd.Dataset:
    ds = SRC.read_parquet_clean(_p(sf_dir, "part"), columns=["p_partkey", "p_type", "p_size", "p_brand"])

    def build(t: pa.Table) -> pa.Table:
        pk = t["p_partkey"].to_numpy(zero_copy_only=False)
        lat, lon = node_latlon(pk)
        n = len(t)
        return pa.table(
            {
                "p": pa.array(K.partition_number(pk, np.zeros(n, np.int64))),
                "cell": pa.array(C.cell_of(lat, lon)),
                "id": pa.array(pk),
                "type": pa.array(["node"] * n, pa.string()),
                "tags": _const_key_map("part_type", t["p_type"]),
                "lat": pa.array(lat),
                "lon": pa.array(lon),
                "nds": _empty_lists(n, pa.struct([("ref", pa.int64())])),
                "members": _empty_lists(
                    n,
                    pa.struct([("type", pa.string()), ("ref", pa.int64()), ("role", pa.string())]),
                ),
                "changeset": pa.array(t["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)),
                "timestamp": pa.array(
                    BASE_TS_MS + pk * 1000, pa.timestamp("ms")
                ),
                "uid": pa.array(t["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)),
                "user": t["p_brand"].cast(pa.string()),
                "version": pa.array(np.ones(n, np.int64)),
                "visible": pa.array(np.ones(n, bool)),
            }
        )

    return ds.map_batches(build, batch_format="pyarrow")


def ways_table(sf_dir: str) -> pa.Table:
    """Orders as ways with lineitem partkeys as nds (grouped driver-side: the nds list
    build is a groupby that DuckDB mirrors with list(l_partkey ORDER BY l_linenumber))."""
    li = pq.read_table(_p(sf_dir, "lineitem"), columns=["l_orderkey", "l_partkey", "l_linenumber"])
    od = pq.read_table(
        _p(sf_dir, "orders"),
        columns=["o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate", "o_orderpriority"],
    )
    ldf = li.to_pandas().sort_values(["l_orderkey", "l_linenumber"])
    lok = ldf["l_orderkey"].to_numpy(np.int64)
    lpk = ldf["l_partkey"].to_numpy(np.int64)
    uniq_ok, offsets = _group_lists(lok)
    nds_arr = pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()),
        pa.StructArray.from_arrays([pa.array(lpk)], ["ref"]),
    )
    odf = od.to_pandas().sort_values("o_orderkey")
    keep = np.isin(odf["o_orderkey"].to_numpy(np.int64), uniq_ok)
    odf = odf[keep]
    ok = odf["o_orderkey"].to_numpy(np.int64)
    # lineitem may reference orderkeys outside a sliced orders table; drop those lists
    mkeep = np.isin(uniq_ok, ok)
    if not mkeep.all():
        nds_arr = nds_arr.take(pa.array(np.nonzero(mkeep)[0]))
    n = len(odf)
    first_ref = nds_arr.values.field("ref").to_numpy(zero_copy_only=False)[
        nds_arr.offsets.to_numpy(zero_copy_only=False)[:-1]
    ]
    la, lo = node_latlon(first_ref)  # first nd ref per kept way
    return pa.table(
        {
            "p": pa.array(K.partition_number(ok, np.ones(n, np.int64))),
            "cell": pa.array(C.cell_of(la, lo)),
            "id": pa.array(ok),
            "type": pa.array(["way"] * n, pa.string()),
            "tags": _const_key_map("status", pa.array(odf["o_orderstatus"], pa.string())),
            "lat": pa.array([None] * n, pa.float64()),
            "lon": pa.array([None] * n, pa.float64()),
            "nds": nds_arr,
            "members": _empty_lists(
                n,
                pa.struct([("type", pa.string()), ("ref", pa.int64()), ("role", pa.string())]),
            ),
            "changeset": pa.array(odf["o_custkey"].to_numpy(np.int64)),
            "timestamp": pa.array(odf["o_orderdate"].to_numpy().astype("datetime64[ms]")),
            "uid": pa.array(odf["o_custkey"].to_numpy(np.int64)),
            "user": pa.array(odf["o_orderpriority"], pa.string()),
            "version": pa.array(np.ones(n, np.int64)),
            "visible": pa.array(np.ones(n, bool)),
        }
    )


def relations_table(sf_dir: str) -> pa.Table:
    od = pq.read_table(_p(sf_dir, "orders"), columns=["o_orderkey", "o_custkey"]).to_pandas()
    cu = pq.read_table(
        _p(sf_dir, "customer"), columns=["c_custkey", "c_nationkey", "c_mktsegment"]
    ).to_pandas()
    ods = od.sort_values(["o_custkey", "o_orderkey"])
    mck = ods["o_custkey"].to_numpy(np.int64)
    mok = ods["o_orderkey"].to_numpy(np.int64)
    uniq_ck, offsets = _group_lists(mck)
    n_flat = len(mok)
    members_arr = pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()),
        pa.StructArray.from_arrays(
            [
                pa.array(np.full(n_flat, "way", dtype=object), pa.string()),
                pa.array(mok),
                pa.array(np.full(n_flat, "outer", dtype=object), pa.string()),
            ],
            ["type", "ref", "role"],
        ),
    )
    cu = cu.sort_values("c_custkey")
    keep = np.isin(cu["c_custkey"].to_numpy(np.int64), uniq_ck)
    cu = cu[keep]
    ck = cu["c_custkey"].to_numpy(np.int64)
    # orders may reference custkeys outside the customer table slice; drop those lists
    mkeep = np.isin(uniq_ck, ck)
    if not mkeep.all():
        members_arr = members_arr.take(pa.array(np.nonzero(mkeep)[0]))
    assert np.array_equal(ck, uniq_ck[mkeep])
    n = len(cu)
    return pa.table(
        {
            "p": pa.array(K.partition_number(ck, np.full(n, 2, np.int64))),
            "cell": pa.array(np.full(n, -1, np.int64)),
            "id": pa.array(ck),
            "type": pa.array(["relation"] * n, pa.string()),
            "tags": _const_key_map("segment", pa.array(cu["c_mktsegment"], pa.string())),
            "lat": pa.array([None] * n, pa.float64()),
            "lon": pa.array([None] * n, pa.float64()),
            "nds": _empty_lists(n, pa.struct([("ref", pa.int64())])),
            "members": members_arr,
            "changeset": pa.array(cu["c_nationkey"].to_numpy(np.int64)),
            "timestamp": pa.array(BASE_TS_MS + ck, pa.timestamp("ms")),
            "uid": pa.array(cu["c_nationkey"].to_numpy(np.int64)),
            "user": pa.array(cu["c_mktsegment"], pa.string()),
            "version": pa.array(np.ones(n, np.int64)),
            "visible": pa.array(np.ones(n, bool)),
        }
    )


def image_params(doc_ids: np.ndarray) -> dict[str, np.ndarray]:
    d = np.asarray(doc_ids, np.int64)
    return {
        "phash": (d * 1103515245 + 12345) % 2147483648,
        "w": (64 * (1 + d % 3)).astype(np.int32),
        "h": (64 * (1 + (d // 3) % 3)).astype(np.int32),
        "fmt": np.where(d % 2 == 0, "rawz", "qz"),
    }


def images_from_documents(sf_dir: str) -> pa.Table:
    """Derived image table (cached on disk — encoding thousands of tiles costs seconds)."""
    cache = Path("/tmp/augdiff_tpch_cache") / (
        hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    )
    cache.mkdir(parents=True, exist_ok=True)
    f = cache / "images_derived.parquet"
    if f.exists():
        return pq.read_table(f)
    t = _images_from_documents_build(sf_dir)
    tmp = f.with_suffix(".tmp")
    pq.write_table(t, tmp)
    os.replace(tmp, f)
    return t


def _images_from_documents_build(sf_dir: str) -> pa.Table:
    """Synthesize+encode fans out over Ray (zlib compress per tile is CPU-bound and
    was 14 s single-threaded on the driver at sf0.1); the deterministic per-row
    kernel makes the fan-out order-independent, re-sorted by doc_id at the end."""
    docs = pq.read_table(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def build(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        pr = image_params(d)
        ids = [f"doc-{i:08d}" for i in d]
        blobs = [
            IMG.encode(IMG.synth_pixels(iid, int(w), int(h)), str(f))
            for iid, w, h, f in zip(ids, pr["w"], pr["h"], pr["fmt"])
        ]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "image_id": pa.array(ids, pa.string()),
                "bytes": pa.array(blobs, pa.binary()),
                "w": pa.array(pr["w"]),
                "h": pa.array(pr["h"]),
                "fmt": pa.array(pr["fmt"].astype(str), pa.string()),
                "caption": t["text"],
                "phash": pa.array(pr["phash"]),
            }
        )

    parts = (
        rd.from_arrow(docs)
        .repartition(max(4, (os.cpu_count() or 8)))
        .map_batches(build, batch_format="pyarrow")
        .to_arrow_refs()
    )
    import ray as _ray

    t = pa.concat_tables([b for b in _ray.get(parts) if len(b)])
    t = t.sort_by("doc_id")
    return t.drop_columns(["doc_id"])


# ---------------------------------------------------------------------------
# SQL fragments shared by the oracles
# ---------------------------------------------------------------------------


def sql_squash(expr: str, rounds: int = 8) -> str:
    """The reference partition squash (÷10 while > 2048) as nested CASE (ids < 10^(3+rounds))."""
    e = expr
    for _ in range(rounds):
        e = f"(CASE WHEN {e} > 2048 THEN ({e}) // 10 ELSE {e} END)"
    return e


# the element universe: nodes = all parts; ways = orders that have lineitems (an order
# with no items derives a way with no nds, which the adapter drops); relations =
# customers that have orders
SQL_KEYS = """
    SELECT p_partkey * 4 AS key, p_partkey AS id, 'node' AS type FROM part
    UNION ALL
    SELECT o_orderkey * 4 + 1, o_orderkey, 'way' FROM orders
      WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem)
    UNION ALL
    SELECT c_custkey * 4 + 2, c_custkey, 'relation' FROM customer
      WHERE c_custkey IN (SELECT o_custkey FROM orders)
"""

SQL_EDGES = """
    SELECT l_partkey * 4 AS a, l_orderkey * 4 + 1 AS b FROM lineitem
    UNION ALL
    SELECT o_orderkey * 4 + 1, o_custkey * 4 + 2 FROM orders
"""

# the DAG is exactly 2 levels deep, so closure = direct ∪ (node → relation)
SQL_CLOSURE = f"""
    SELECT DISTINCT a, b FROM ({SQL_EDGES})
    UNION
    SELECT DISTINCT l.l_partkey * 4, o.o_custkey * 4 + 2
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
"""

SQL_NODE_LATLON = f"""
    SELECT p_partkey,
           ((p_partkey * {LAT_MUL}) % {LAT_MOD}) / 1000.0 - 90.0 AS lat,
           ((p_partkey * {LON_MUL}) % {LON_MOD}) / 1000.0 - 180.0 AS lon
    FROM part
"""

# cell id at the working resolution (grid res 15 ≈ H3 res-8 cell size): 2^15 rows ×
# 2^16 cols; must mirror cells.cell_of exactly
SQL_CELL = """
    (15::BIGINT << 50)
    + (LEAST(GREATEST(CAST(FLOOR((lat + 90.0) / 180.0 * 32768) AS BIGINT), 0), 32767) << 25)
    + (((CAST(FLOOR((lon + 180.0) / 360.0 * 65536) AS BIGINT) % 65536) + 65536) % 65536)
"""

SQL_TILES = """
    SELECT doc_id,
           'doc-' || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS image_id,
           (doc_id * 1103515245 + 12345) % 2147483648 AS phash,
           CAST(64 * (1 + doc_id % 3) AS INTEGER) AS w,
           CAST(64 * (1 + (doc_id // 3) % 3) AS INTEGER) AS h,
           CASE WHEN doc_id % 2 = 0 THEN 'rawz' ELSE 'qz' END AS fmt
    FROM documents
"""

SQL_TILE_LATLON = f"""
    SELECT *,
           ((phash % 65536) / 65536.0) * 360.0 - 180.0 AS lon,
           (((phash // 65536) % 32768) / 32768.0) * 180.0 - 90.0 AS lat
    FROM ({SQL_TILES})
"""


# ---------------------------------------------------------------------------
# the flagship: a full adiff stream over the tpch-derived world
# ---------------------------------------------------------------------------


def change_batches_from_events(sf_dir: str, n_batches: int = 3, max_events: int = 120) -> list[pa.Table]:
    """Events → minutely change batches: each event modifies (or, for 'error' events,
    deletes) a derived node; deterministic targeting and versioning."""
    from ..schemas import CHANGE_SCHEMA
    from .worldgen import _el, elements_to_table

    ev = (
        pq.read_table(_p(sf_dir, "events"), columns=["event_id", "ts", "event_type", "value"])
        .to_pandas()
        .sort_values("event_id")
        .head(max_events)
    )
    parts = pq.read_table(_p(sf_dir, "part"), columns=["p_partkey"])["p_partkey"].to_numpy(
        zero_copy_only=False
    )
    n_parts = len(parts)
    versions: dict[int, int] = {}
    out = []
    for k in range(1, n_batches + 1):
        sub = ev[ev["event_id"] % n_batches == (k - 1)]
        rows, acts = [], []
        for _, e in sub.iterrows():
            pk = int(parts[(int(e.event_id) * 37) % n_parts])
            v = versions.get(pk, 1) + 1
            versions[pk] = v
            ts_ms = int(pd.Timestamp(e.ts).value // 1_000_000) + 86_400_000
            if e.event_type == "error":
                rows.append(_el(pk, "node", ts_ms, version=v, visible=False,
                                changeset=None, uid=None, user=None))
                acts.append("delete")
            else:
                la, lo = node_latlon(np.array([pk]))
                rows.append(
                    _el(pk, "node", ts_ms, version=v,
                        lat=float(la[0]) + float(e.value) * 1e-5,
                        lon=float(lo[0]) + float(e.value) * 1e-5,
                        tags={"event": str(e.event_type)},
                        changeset=int(e.event_id), uid=int(e.event_id), user="ev")
                )
                acts.append("modify")
        out.append(
            elements_to_table(
                rows, CHANGE_SCHEMA,
                extra={
                    "batch_seq": pa.array([k] * len(rows), pa.int64()),
                    "action": pa.array(acts, pa.string()),
                },
            )
        )
    return out


def build_world(sf_dir: str, root: str, n_batches: int = 3) -> dict:
    """Materialize the tpch-derived world (snapshot + images + OSC batches) on disk."""
    from ..sources import osc as OSC

    rootp = Path(root)
    rootp.mkdir(parents=True, exist_ok=True)
    marker = rootp / "_WORLD_OK"
    if not marker.exists():
        elements = pa.concat_tables(
            [
                pa.concat_tables(
                    [
                        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
                        for b in nodes_dataset(sf_dir).iter_batches(batch_size=None, batch_format="pyarrow")
                    ],
                    promote_options="default",
                ),
                ways_table(sf_dir),
                relations_table(sf_dir),
            ],
            promote_options="default",
        )
        pq.write_table(elements, rootp / "snapshot.parquet")
        pq.write_table(images_from_documents(sf_dir), rootp / "images.parquet")
        for i, t in enumerate(change_batches_from_events(sf_dir, n_batches), start=1):
            rel = OSC.sequence_path(i)
            p = rootp / "changes" / rel
            p.parent.mkdir(parents=True, exist_ok=True)
            OSC.write_osc(t, str(p) + ".osc")
        marker.touch()
    return {"root": str(rootp), "n_batches": n_batches}


def run_flagship(sf_dir: str, work_root: str | None = None, n_batches: int = 3) -> pa.Table:
    """The flagship pipeline: index the derived world, stream the change batches through
    the full augmented-diff engine, and return the rendered features + assignments."""
    import json

    from .adiff import run_stream

    if work_root is None:
        h = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
        work_root = f"/tmp/augdiff_flagship_{h}"
    world = Path(work_root) / "world"
    out = Path(work_root) / "out"
    build_world(sf_dir, str(world), n_batches)
    run_stream(str(world), str(out))

    rows = []
    for p in sorted((out / "adiff").rglob("*.ndjson")):
        seq = int("".join(p.relative_to(out / "adiff").with_suffix("").parts))
        for line in p.read_text().splitlines():
            f = json.loads(line)
            rows.append(
                {
                    "batch_seq": seq,
                    "id": f["properties"]["id"],
                    "type": f["properties"]["type"],
                    "version": f["properties"]["version"],
                    "visible": f["properties"]["visible"],
                    "geom_type": f["geometry"]["type"],
                }
            )
    if not rows:
        return pa.table(
            {"batch_seq": pa.array([], pa.int64()), "id": pa.array([], pa.int64()),
             "type": pa.array([], pa.string()), "version": pa.array([], pa.int64()),
             "visible": pa.array([], pa.bool_()), "geom_type": pa.array([], pa.string())}
        )
    return pa.Table.from_pylist(rows)
