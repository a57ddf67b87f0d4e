"""Deterministic synthetic world generator (FIXTURES.md §1-§3). Seeded, pure — same
config ⇒ byte-identical tables. No external data.

Produces the three inputs the engine consumes:

* ``images_table`` — the hinted input table exactly (image_id, bytes, w, h, fmt, caption,
  phash); bytes are *real* encoded pixels via the engine codec (functions.image), phash
  encodes the deterministic georef position (georef.centroid inverse) with pixel-hash
  flavor in the high bits. Density is intentionally skewed: ``hot_frac`` of images land
  in two hot cells (exercises salting / skew handling).
* ``snapshot_table`` — OSM-style elements over a ~1°×1° box: node grid; closed building
  rings (isArea); open highways; a degenerate way referencing a missing node (P3);
  a multipolygon-with-hole relation; a multilinestring relation; a route; an incomplete
  relation; a relation-of-relations (P6-P8 recursion). Some ids are huge so they collide
  under the reference partition fn's ÷10 squash (skew parity, Common.scala:59-72).
* ``change_tables`` — K micro-batches mixing: node moves that ripple into way/relation
  geometry (closure J4/J5), tag-only modifies, creates of new ways over existing nodes,
  a delete of a node still referenced by a way, a modify of a relation member two hops
  deep, plus steady node-churn so every batch is non-trivial.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .. import cells as C
from .. import georef
from .. import keys as K
from ..functions import image as IMG
from ..schemas import CHANGE_SCHEMA, ELEMENT_SCHEMA, IMAGE_SCHEMA
from ..sources import osc

BASE_MS = 1_704_067_200_000  # 2024-01-01T00:00:00Z
LAT0, LON0 = 10.0, 20.0  # world box south-west corner (1°×1°)


@dataclass
class WorldConfig:
    seed: int = 42
    grid: int = 12          # node grid (grid × grid)
    n_images: int = 256
    n_batches: int = 6
    hot_frac: float = 0.3   # fraction of images forced into 2 hot cells
    churn_nodes: int = 8    # per-batch steady node churn


# ---------------------------------------------------------------------------
# element helpers
# ---------------------------------------------------------------------------


def _el(
    id_: int,
    tipe: str,
    ts_ms: int,
    version: int = 1,
    tags: dict | None = None,
    lat: float | None = None,
    lon: float | None = None,
    nds: list[int] | None = None,
    members: list[tuple[str, int, str]] | None = None,
    visible: bool = True,
    changeset: int = 1,
    uid: int = 1,
    user: str = "gen",
) -> dict:
    return {
        "id": id_,
        "type": tipe,
        "tags": [(k, v) for k, v in (tags or {}).items()],
        "lat": lat,
        "lon": lon,
        "nds": [{"ref": r} for r in (nds or [])],
        "members": [{"type": t, "ref": r, "role": ro} for t, r, ro in (members or [])],
        "changeset": changeset,
        "timestamp": ts_ms,
        "uid": uid,
        "user": user,
        "version": version,
        "visible": visible,
    }


def elements_to_table(rows: list[dict], schema: pa.Schema = ELEMENT_SCHEMA, extra: dict | None = None) -> pa.Table:
    ids = np.array([r["id"] for r in rows], np.int64) if rows else np.empty(0, np.int64)
    types = [r["type"] for r in rows]
    lats = np.array([np.nan if r["lat"] is None else r["lat"] for r in rows], np.float64)
    lons = np.array([np.nan if r["lon"] is None else r["lon"] for r in rows], np.float64)
    cols = {
        "p": pa.array(K.partition_number_typed(ids, types) if rows else np.empty(0, np.int64)),
        "cell": pa.array(C.cell_of(lats, lons) if rows else np.empty(0, np.int64)),
        "id": pa.array(ids),
        "type": pa.array(types, pa.string()),
        "tags": pa.array([r["tags"] for r in rows], schema.field("tags").type),
        "lat": pa.array([r["lat"] for r in rows], pa.float64()),
        "lon": pa.array([r["lon"] for r in rows], pa.float64()),
        "nds": pa.array([r["nds"] for r in rows], schema.field("nds").type),
        "members": pa.array([r["members"] for r in rows], schema.field("members").type),
        "changeset": pa.array([r["changeset"] for r in rows], pa.int64()),
        "timestamp": pa.array([r["timestamp"] for r in rows], pa.timestamp("ms")),
        "uid": pa.array([r["uid"] for r in rows], pa.int64()),
        "user": pa.array([r["user"] for r in rows], pa.string()),
        "version": pa.array([r["version"] for r in rows], pa.int64()),
        "visible": pa.array([r["visible"] for r in rows], pa.bool_()),
    }
    for k, v in (extra or {}).items():
        cols[k] = v
    return pa.table(cols)


# ---------------------------------------------------------------------------
# snapshot world
# ---------------------------------------------------------------------------

# id blocks
NODE0 = 1_000
RING_NODE0 = 50_000
WAY_BUILDING0 = 200_000
WAY_HIGHWAY0 = 210_000
WAY_RING0 = 220_000
WAY_DEGENERATE = 230_001
REL_MP = 300_001
REL_ML = 300_002
REL_ROUTE = 300_003
REL_INCOMPLETE = 300_004
REL_OF_RELS = 300_005
BIG_NODE0 = 10_000_000_000  # collides under ÷10 squash


def node_id(cfg: WorldConfig, r: int, c: int) -> int:
    return NODE0 + r * cfg.grid + c


def node_pos(cfg: WorldConfig, r: int, c: int) -> tuple[float, float]:
    g = cfg.grid
    return LAT0 + (r + 0.5) / g, LON0 + (c + 0.5) / g


def snapshot_rows(cfg: WorldConfig) -> list[dict]:
    g = cfg.grid
    ts = BASE_MS - 86_400_000  # snapshot a day before the stream
    rows: list[dict] = []

    # node grid
    for r in range(g):
        for c in range(g):
            la, lo = node_pos(cfg, r, c)
            rows.append(_el(node_id(cfg, r, c), "node", ts + (r * g + c), lat=la, lon=lo,
                            tags={"grid": f"{r}-{c}"} if (r + c) % 3 == 0 else None))

    # big-id nodes (partition-fn skew parity)
    for i in range(g):
        la, lo = LAT0 + 0.05 + i * 1e-3, LON0 + 0.05
        rows.append(_el(BIG_NODE0 + i, "node", ts + 10_000 + i, lat=la, lon=lo))

    # buildings: closed rings over 2×2 node blocks (area=implicit via building key)
    b = 0
    for r in range(0, g - 1, 3):
        for c in range(0, g - 1, 3):
            nds = [node_id(cfg, r, c), node_id(cfg, r, c + 1), node_id(cfg, r + 1, c + 1),
                   node_id(cfg, r + 1, c), node_id(cfg, r, c)]
            rows.append(_el(WAY_BUILDING0 + b, "way", ts + 20_000 + b, nds=nds,
                            tags={"building": "yes"}))
            b += 1

    # highways: open ways along each 4th row
    hw = 0
    for r in range(0, g, 4):
        nds = [node_id(cfg, r, c) for c in range(g)]
        rows.append(_el(WAY_HIGHWAY0 + hw, "way", ts + 30_000 + hw, nds=nds,
                        tags={"highway": "residential", "name": f"hw{hw}"}))
        hw += 1

    # dedicated ring nodes for the multipolygon-with-hole: outer square + inner square
    ring_pts = {
        "outer": [(0.02, 0.02), (0.18, 0.02), (0.18, 0.18), (0.02, 0.18)],
        "inner": [(0.07, 0.07), (0.13, 0.07), (0.13, 0.13), (0.07, 0.13)],
    }
    rid = RING_NODE0
    ring_ids: dict[str, list[int]] = {}
    for name, pts in ring_pts.items():
        ids = []
        for dy, dx in pts:
            rows.append(_el(rid, "node", ts + 40_000 + (rid - RING_NODE0),
                            lat=LAT0 + 0.55 + dy, lon=LON0 + 0.55 + dx))
            ids.append(rid)
            rid += 1
        ring_ids[name] = ids + [ids[0]]

    rows.append(_el(WAY_RING0, "way", ts + 41_000, nds=ring_ids["outer"]))         # untagged ring
    rows.append(_el(WAY_RING0 + 1, "way", ts + 41_001, nds=ring_ids["inner"]))

    # multipolygon relation (outer + inner)
    rows.append(_el(REL_MP, "relation", ts + 42_000,
                    members=[("way", WAY_RING0, "outer"), ("way", WAY_RING0 + 1, "inner")],
                    tags={"type": "multipolygon", "landuse": "forest"}))

    # multilinestring relation over two highways
    rows.append(_el(REL_ML, "relation", ts + 42_001,
                    members=[("way", WAY_HIGHWAY0, ""), ("way", WAY_HIGHWAY0 + 1, "")],
                    tags={"type": "multilinestring"}))

    # route relation
    rows.append(_el(REL_ROUTE, "relation", ts + 42_002,
                    members=[("way", WAY_HIGHWAY0, "forward"), ("way", WAY_HIGHWAY0 + 1, "backward")],
                    tags={"type": "route", "route": "bus"}))

    # degenerate way referencing a missing node (P3 incompleteness)
    rows.append(_el(WAY_DEGENERATE, "way", ts + 43_000,
                    nds=[node_id(cfg, 0, 0), 999_999], tags={"highway": "path"}))

    # incomplete relation (missing way member)
    rows.append(_el(REL_INCOMPLETE, "relation", ts + 43_001,
                    members=[("way", 999_998, "outer")], tags={"type": "multipolygon"}))

    # relation-of-relations (recursion in P6-P8)
    rows.append(_el(REL_OF_RELS, "relation", ts + 44_000,
                    members=[("relation", REL_MP, ""), ("way", WAY_HIGHWAY0, "")],
                    tags={"type": "boundary", "boundary": "administrative"}))

    return rows


def snapshot_table(cfg: WorldConfig) -> pa.Table:
    return elements_to_table(snapshot_rows(cfg))


# ---------------------------------------------------------------------------
# change stream
# ---------------------------------------------------------------------------


def change_tables(cfg: WorldConfig) -> list[pa.Table]:
    """K micro-batch tables (batch_seq 1..K) in CHANGE_SCHEMA."""
    g = cfg.grid
    rng = np.random.default_rng(cfg.seed)
    out: list[pa.Table] = []
    version_bump: dict[tuple[str, int], int] = {}

    def bump(tipe: str, id_: int) -> int:
        v = version_bump.get((tipe, id_), 1) + 1
        version_bump[(tipe, id_)] = v
        return v

    for seq in range(1, cfg.n_batches + 1):
        ts = BASE_MS + seq * 60_000
        rows: list[dict] = []
        acts: list[str] = []

        def add(row: dict, action: str):
            rows.append(row)
            acts.append(action)

        if seq == 1:
            # node move that ripples into building 0 + any relation above it
            nid = node_id(cfg, 0, 0)
            la, lo = node_pos(cfg, 0, 0)
            add(_el(nid, "node", ts, version=bump("node", nid),
                    lat=la + 0.002, lon=lo + 0.002, tags={"moved": "yes"},
                    changeset=100 + seq), "modify")
        if seq == 2:
            # tag-only modify of a highway; create a new way over existing nodes
            wid = WAY_HIGHWAY0
            nds = [node_id(cfg, 0, c) for c in range(g)]
            add(_el(wid, "way", ts, version=bump("way", wid), nds=nds,
                    tags={"highway": "primary", "name": "hw0", "lanes": "2"},
                    changeset=100 + seq), "modify")
            new_way = WAY_HIGHWAY0 + 900
            add(_el(new_way, "way", ts + 1, nds=[node_id(cfg, 1, 1), node_id(cfg, 1, 2)],
                    tags={"highway": "footway"}, changeset=100 + seq), "create")
        if seq == 3:
            # delete a node still referenced by a way (tombstone); move an inner-ring
            # node (ripples two hops: node → ring way → multipolygon relation)
            victim = node_id(cfg, 2, 2)
            add(_el(victim, "node", ts, version=bump("node", victim), visible=False,
                    changeset=None, uid=None, user=None), "delete")
            inner_node = RING_NODE0 + 4  # first inner-ring node
            add(_el(inner_node, "node", ts + 1, version=bump("node", inner_node),
                    lat=LAT0 + 0.55 + 0.071, lon=LON0 + 0.55 + 0.071,
                    changeset=100 + seq), "modify")
        if seq == 4:
            # create a relation over existing ways; modify the rel-of-rels member list
            new_rel = REL_OF_RELS + 100
            add(_el(new_rel, "relation", ts,
                    members=[("way", WAY_BUILDING0, "outer")],
                    tags={"type": "multipolygon", "amenity": "school"},
                    changeset=100 + seq), "create")
            add(_el(REL_OF_RELS, "relation", ts + 1, version=bump("relation", REL_OF_RELS),
                    members=[("relation", REL_MP, ""), ("way", WAY_HIGHWAY0, ""),
                             ("way", WAY_BUILDING0 + 1, "")],
                    tags={"type": "boundary", "boundary": "administrative"},
                    changeset=100 + seq), "modify")
        if seq == 5:
            # delete a whole building way; recreate one deleted node
            add(_el(WAY_BUILDING0 + 2, "way", ts, version=bump("way", WAY_BUILDING0 + 2),
                    visible=False, changeset=None, uid=None, user=None), "delete")
            victim = node_id(cfg, 2, 2)
            la, lo = node_pos(cfg, 2, 2)
            add(_el(victim, "node", ts + 1, version=bump("node", victim),
                    lat=la, lon=lo, tags={"recreated": "yes"}, changeset=100 + seq), "create")

        # steady churn: random node moves every batch (deterministic rng)
        picks = rng.integers(0, g * g, cfg.churn_nodes)
        for j, p in enumerate(picks):
            r, c = int(p) // g, int(p) % g
            nid = node_id(cfg, r, c)
            la, lo = node_pos(cfg, r, c)
            add(_el(nid, "node", ts + 100 + j, version=bump("node", nid),
                    lat=la + float(rng.uniform(-5e-4, 5e-4)),
                    lon=lo + float(rng.uniform(-5e-4, 5e-4)),
                    changeset=100 + seq), "modify")

        t = elements_to_table(
            rows, CHANGE_SCHEMA,
            extra={
                "batch_seq": pa.array([seq] * len(rows), pa.int64()),
                "action": pa.array(acts, pa.string()),
            },
        )
        out.append(t)
    return out


# ---------------------------------------------------------------------------
# images (the hinted table)
# ---------------------------------------------------------------------------


def _phash_for_position(lat: float, lon: float, flavor: int) -> int:
    """Inverse of georef.centroid: phash whose low 31 bits encode (lat, lon); higher
    bits carry pixel-hash flavor (keeps ids unique, georef stable)."""
    lonb = int((lon + 180.0) / 360.0 * 65536.0) & 0xFFFF
    latb = int((lat + 90.0) / 180.0 * 32768.0) & 0x7FFF
    return (flavor & 0x7FFF_FFFF) << 31 | (latb << 16) | lonb


def _image_plan(cfg: WorldConfig) -> dict[str, np.ndarray]:
    """Deterministic per-image parameters (positions, sizes, formats) — computed once
    up-front so generation parallelizes without breaking seed determinism."""
    rng = np.random.default_rng(cfg.seed + 1)
    sizes = np.array([64, 128, 256])
    n = cfg.n_images
    n_hot = int(n * cfg.hot_frac)
    # hot centers snapped to working-res cell midpoints so the deliberate skew survives
    # georef quantization: each cluster lands in exactly one hot cell
    hot_centers = []
    for cla, clo in ((LAT0 + 0.25, LON0 + 0.25), (LAT0 + 0.75, LON0 + 0.75)):
        cell = int(C.cell_of(np.array([cla]), np.array([clo]))[0])
        b = C.cell_bounds(np.array([cell]))
        hot_centers.append(((float(b[0]) + float(b[1])) / 2, (float(b[2]) + float(b[3])) / 2))
    ws = sizes[rng.integers(0, 3, n)]
    hs = sizes[rng.integers(0, 3, n)]
    fmt_raw = rng.random(n) < 0.5
    lat = np.empty(n)
    lon = np.empty(n)
    half_lat = 180.0 / (1 << C.DEFAULT_RES) / 2
    jit = half_lat * 0.45  # stays inside the hot cell after floor-quantization
    for i in range(n):  # rng call order matters for determinism; cheap scalar draws
        if i < n_hot:
            cla, clo = hot_centers[i % 2]
            lat[i] = cla + rng.uniform(-jit, jit)
            lon[i] = clo + rng.uniform(-jit, jit)
        else:
            lat[i] = LAT0 + rng.uniform(0.0, 1.0)
            lon[i] = LON0 + rng.uniform(0.0, 1.0)
    return {"w": ws, "h": hs, "raw": fmt_raw, "lat": lat, "lon": lon, "n_hot": n_hot}


def _build_image_rows(idx: np.ndarray, plan: dict) -> pa.Table:
    ids, blobs, ws, hs, fmts, caps, phs = [], [], [], [], [], [], []
    for i in idx:
        i = int(i)
        iid = f"img-{i:08d}"
        w, h = int(plan["w"][i]), int(plan["h"][i])
        # both flavors mix the engine container formats with the REAL codecs so the
        # decode path exercises foreign-consumable formats end-to-end: lossless
        # alternates rawz with PNG (functions/png.py), lossy alternates qz with
        # baseline JPEG (functions/jpeg.py) on the offset phase
        fmt = (
            ("png" if i % 16 == 0 else "rawz")
            if plan["raw"][i]
            else ("jpeg" if i % 16 == 8 else "qz")
        )
        px = IMG.synth_pixels(iid, w, h)
        ph = _phash_for_position(plan["lat"][i], plan["lon"][i], IMG.phash64(px) & 0x7FFF_FFFF)
        ids.append(iid)
        blobs.append(IMG.encode(px, fmt))
        ws.append(w)
        hs.append(h)
        fmts.append(fmt)
        caps.append(f"tile {iid} over {'hot' if i < plan['n_hot'] else 'cold'} {fmt}")
        phs.append(ph)
    return pa.table(
        {
            "image_id": pa.array(ids, pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
            "w": pa.array(ws, pa.int32()),
            "h": pa.array(hs, pa.int32()),
            "fmt": pa.array(fmts, pa.string()),
            "caption": pa.array(caps, pa.string()),
            "phash": pa.array(phs, pa.int64()),
        }
    )


def images_table(cfg: WorldConfig) -> pa.Table:
    """Deterministic image table; fans generation out over Ray when the table is large
    and a Ray session is live (same plan ⇒ identical bytes either way)."""
    plan = _image_plan(cfg)
    n = cfg.n_images
    use_ray = False
    if n >= 2048:
        try:
            import ray

            use_ray = ray.is_initialized()
        except Exception:
            use_ray = False
    if not use_ray:
        return _build_image_rows(np.arange(n), plan)

    import ray
    import ray.data as rd

    plan_ref = ray.put(plan)

    def gen(batch: pa.Table) -> pa.Table:
        p = ray.get(plan_ref)
        return _build_image_rows(batch["id"].to_numpy(zero_copy_only=False), p)

    ds = rd.range(n).map_batches(gen, batch_format="pyarrow", batch_size=512)
    parts = [
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in ds.iter_batches(batch_size=None, batch_format="pyarrow")
    ]
    tbl = pa.concat_tables(parts, promote_options="default")
    # iter order isn't guaranteed: restore id order for byte-stable output
    order = pa.compute.sort_indices(tbl["image_id"])
    return tbl.take(order)


def write_images(cfg: WorldConfig, path: str) -> None:
    """Write the image table: small → one file; large (with a live Ray session) →
    streaming Ray generation into a directory of parquet parts named ``path`` —
    readers use ``pyarrow.dataset`` so file-vs-directory is transparent."""
    n = cfg.n_images
    use_ray = False
    if n >= 16384:
        try:
            import ray

            use_ray = ray.is_initialized()
        except Exception:
            use_ray = False
    if not use_ray:
        pq.write_table(images_table(cfg), path)
        return

    import shutil

    import ray
    import ray.data as rd

    plan_ref = ray.put(_image_plan(cfg))

    def gen(batch: pa.Table) -> pa.Table:
        p = ray.get(plan_ref)
        return _build_image_rows(batch["id"].to_numpy(zero_copy_only=False), p)

    shutil.rmtree(path, ignore_errors=True)
    # many ~1024-tile files (not Ray's default few big blocks): the ingest's
    # direct-read decode path needs ≥4×pool files to let actors read their own
    # files (no object-store hop for the blob bytes), with enough tasks per actor
    # that the last wave doesn't idle the pool
    rd.range(n, override_num_blocks=max(32, n // 1024)).map_batches(
        gen, batch_format="pyarrow", batch_size=1024
    ).write_parquet(path)


# ---------------------------------------------------------------------------
# materialize a world on disk
# ---------------------------------------------------------------------------


def write_world(root: str, cfg: WorldConfig | None = None) -> dict:
    """Write snapshot.parquet, images.parquet, and changes/AAA/BBB/CCC.osc files.

    Returns paths dict. Idempotent (overwrites).
    """
    cfg = cfg or WorldConfig()
    root_p = Path(root)
    root_p.mkdir(parents=True, exist_ok=True)
    snap = snapshot_table(cfg)
    pq.write_table(snap, root_p / "snapshot.parquet")
    write_images(cfg, str(root_p / "images.parquet"))
    osc_paths = []
    for i, t in enumerate(change_tables(cfg), start=1):
        rel = osc.sequence_path(i)
        p = root_p / "changes" / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        path = str(p) + ".osc"
        osc.write_osc(t, path)
        osc_paths.append(path)
    return {
        "snapshot": str(root_p / "snapshot.parquet"),
        "images": str(root_p / "images.parquet"),
        "osc_template": str(root_p / "changes" / "AAA/BBB/CCC.osc"),
        "osc_paths": osc_paths,
        "config": cfg,
    }
