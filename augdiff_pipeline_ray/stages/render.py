"""Augmented-diff render: version histories, window predicates, geometry build, features.

Re-expression of the reference's ``RowsToJson`` (ad/src/main/scala/RowsToJson.scala) —
the semantic heart of the augmented diff:

* ``build_histories`` (A1, :42-81): per (type, id), versions sorted by timestamp desc; the
  first satisfying (complete ∧ in-window) and the first satisfying (complete ∧ before)
  become ``RowHistory(in_window, before_window)``.
* window membership (A4, :106,114): the reference tests full-row set membership against the
  update batch; the rebuild stamps an ``in_update`` provenance flag at union time —
  identical semantics, robust across Arrow value comparison (SURVEY.md §4.4.2).
* predicates P1–P8 (:111-244): node/way/relation completeness & window membership,
  way windows depending on node histories, relations recursing through the latest-version
  relation map (A2, :173-178) — with a visited-set cycle guard the reference lacks
  (SURVEY.md §4.4.3; behavior identical on acyclic data).
* geometry (G1/G2, :272-347): node → Point; way → Polygon if isArea ∧ closed else Line,
  resolving each nd ref via the node history with the in-window→before-window fallback
  chain (:283-289); relation → multipolygon assembly / multiline fold / collection, with
  build failure falling back to GeometryCollection (:333-336).
* emission (:353-383): (Some, Some) ⇒ modify (after-feature + before-feature with
  visible=false) or delete (single before-feature with visible=false); (Some, None) ⇒
  create (one feature if visible); else nothing. Metadata keys exactly
  {id, type, tags, changeset, timestamp, uid, user, version, visible} (:251-269), with
  numeric/boolean JSON types (the reference post-fixes quoting via its
  VERY_UNIQUE_STRING regex hack, M16 — the rebuild emits typed JSON directly).

Deviation (documented): member arrays passed to multipolygon assembly stay aligned with
resolved geometries; the reference's ``types.zip(wkbs)`` silently misaligns when a member
fails to resolve (RowsToJson.scala:320-331) — unreachable for complete relations, which
are the only ones rendered.

Output ordering: the reference iterates an unordered Scala Map; the rebuild emits features
deterministically sorted by (type order node<way<relation, id) for stable goldens.
"""

from __future__ import annotations

import json
from typing import NamedTuple

import numpy as np
import pyarrow as pa

from ..functions import assembly as A
from ..functions import geom as G
from ..functions import osm as OSM

_TYPE_ORDER = {"node": 0, "way": 1, "relation": 2}


class RowHistory(NamedTuple):
    in_window: dict | None
    before_window: dict | None


def _iso_instant(ms: int) -> str:
    """Epoch ms → Java Instant.toString-style ISO-8601 (no .000 when ms == 0)."""
    if ms % 1000 == 0:
        return str(np.datetime64(ms // 1000, "s")) + "Z"
    return str(np.datetime64(ms, "ms")) + "Z"


def _list_offsets(arr) -> np.ndarray:
    """Logical offsets of a (Map/List)Array, slice-adjusted, as int64."""
    off = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    return off


def _maps_to_dicts(col, n: int) -> list[dict]:
    """map<string,string> column → per-row dicts via flat keys/items decode."""
    if n == 0:
        return []
    arr = col.combine_chunks()
    off = _list_offsets(arr)
    if off[-1] == off[0]:  # every row empty/null — the common storage-row case
        return [{} for _ in range(n)]
    keys = arr.keys.to_pylist()
    vals = arr.items.to_pylist()
    base = off[0]
    return [
        dict(zip(keys[a - base:b - base], vals[a - base:b - base])) if b > a else {}
        for a, b in zip(off[:-1], off[1:])
    ]


def _nds_to_lists(col, n: int) -> list[list[int]]:
    """list<struct<ref:int64>> column → per-row ref int lists via flat decode."""
    if n == 0:
        return []
    arr = col.combine_chunks()
    off = _list_offsets(arr)
    if off[-1] == off[0]:
        return [[] for _ in range(n)]
    refs = arr.values.field("ref").to_pylist()
    base = off[0]
    return [refs[a - base:b - base] for a, b in zip(off[:-1], off[1:])]


def _members_to_lists(col, n: int) -> list[list[dict]]:
    """list<struct<type,ref,role>> column → per-row member-dict lists, flat decode."""
    if n == 0:
        return []
    arr = col.combine_chunks()
    off = _list_offsets(arr)
    if off[-1] == off[0]:
        return [[] for _ in range(n)]
    vals = arr.values
    mt = vals.field("type").to_pylist()
    mr = vals.field("ref").to_pylist()
    ro = vals.field("role").to_pylist()
    base = off[0]
    return [
        [
            {"type": mt[j], "ref": mr[j], "role": ro[j]}
            for j in range(a - base, b - base)
        ]
        for a, b in zip(off[:-1], off[1:])
    ]


def rows_from_arrow(table: pa.Table, in_update: np.ndarray | None = None) -> list[dict]:
    """Arrow element rows → normalized python dicts for the render kernel.

    tags → dict; nds → list[int]; members → list[{'type','ref','role'}];
    timestamp → epoch ms int; plus the ``in_update`` provenance flag.
    """
    n = len(table)
    flags = (
        in_update
        if in_update is not None
        else (
            table["in_update"].to_numpy(zero_copy_only=False)
            if "in_update" in table.column_names
            else np.zeros(n, bool)
        )
    )
    # columnar extraction: epoch-ms ints straight from Arrow (no datetime objects);
    # nested columns (tags/nds/members) via FLAT offset+values decode — nested
    # to_pylist built a python object per struct field and was ~75% of this
    # function's cost (which is the distributed render's per-shard context build)
    ids = table["id"].to_pylist()
    types = table["type"].to_pylist()
    tags_l = _maps_to_dicts(table["tags"], n)
    lat_l = table["lat"].to_pylist()
    lon_l = table["lon"].to_pylist()
    nds_l = _nds_to_lists(table["nds"], n)
    mem_l = _members_to_lists(table["members"], n)
    cs_l = table["changeset"].to_pylist()
    ts_np = table["timestamp"].combine_chunks().cast(pa.timestamp("ms")).cast(pa.int64()).to_numpy(zero_copy_only=False)
    uid_l = table["uid"].to_pylist()
    user_l = table["user"].to_pylist()
    ver_l = table["version"].to_pylist()
    vis_l = table["visible"].to_pylist()
    cell_l = table["cell"].to_pylist() if "cell" in table.column_names else [-1] * n

    out = []
    for i in range(n):
        out.append(
            {
                "id": ids[i],
                "type": types[i],
                "tags": tags_l[i],
                "lat": lat_l[i],
                "lon": lon_l[i],
                "nds": nds_l[i],
                "members": mem_l[i],
                "changeset": cs_l[i],
                "timestamp": int(ts_np[i]),
                "uid": uid_l[i],
                "user": user_l[i],
                "version": ver_l[i],
                "visible": bool(vis_l[i]),
                "cell": cell_l[i],
                "in_update": bool(flags[i]),
            }
        )
    return out


def _histories(
    rows: list[dict],
    tipe: str,
    complete_p,
    window_p,
    before_p,
) -> dict[int, RowHistory]:
    by_id: dict[int, list[dict]] = {}
    for r in rows:
        if r["type"] == tipe:
            by_id.setdefault(r["id"], []).append(r)
    out: dict[int, RowHistory] = {}
    for id_, versions in by_id.items():
        versions.sort(key=lambda r: -r["timestamp"])
        in_w = next((r for r in versions if complete_p(r) and window_p(r)), None)
        before = next((r for r in versions if complete_p(r) and before_p(r)), None)
        out[id_] = RowHistory(in_w, before)
    return out


class RenderContext:
    """All per-batch render state: histories + support maps, built once per micro-batch.

    The context is small (bounded by minutely-diff churn + its closure) and is broadcast
    via ``ray.put`` to the distributed render stage; geometry build + JSON encode — the
    heavy part — fan out by cell (SURVEY.md §2.3 J6).
    """

    def __init__(self, all_rows: list[dict]):
        self.rows = all_rows

        # nodes: P1/P2
        self.nodes = _histories(
            all_rows,
            "node",
            lambda r: True,
            lambda r: r["in_update"],
            lambda r: not r["in_update"],
        )
        node_ids = set(self.nodes)

        # ways: P3/P4/P5
        def way_complete(r):
            return all(nd in node_ids for nd in r["nds"])

        def way_window(r):
            if r["in_update"]:
                return True
            return any(
                self.nodes.get(nd, _EMPTY).in_window is not None for nd in r["nds"]
            )

        def way_before(r):
            if r["in_update"]:
                return False
            return all(
                self.nodes.get(nd, _EMPTY).before_window is not None for nd in r["nds"]
            )

        self.ways = _histories(all_rows, "way", way_complete, way_window, way_before)
        way_ids = set(self.ways)

        # relations: latest-version map (A2) + P6/P7/P8 with cycle guard
        rel_rows = [r for r in all_rows if r["type"] == "relation"]
        rel_ids = {r["id"] for r in rel_rows}
        latest: dict[int, dict] = {}
        for r in rel_rows:
            cur = latest.get(r["id"])
            if cur is None or r["timestamp"] > cur["timestamp"]:
                latest[r["id"]] = r
        self._latest_relations = latest

        def rel_complete(r):
            for m in r["members"]:
                if m["type"] == "node" and m["ref"] not in node_ids:
                    return False
                if m["type"] == "way" and m["ref"] not in way_ids:
                    return False
                if m["type"] == "relation" and m["ref"] not in rel_ids:
                    return False
            return True

        def rel_window(r, _visited=None):
            if r["in_update"]:
                return True
            visited = _visited or set()
            if r["id"] in visited:
                return False  # cycle guard (deviation §4.4.3)
            visited = visited | {r["id"]}
            for m in r["members"]:
                if m["type"] == "node":
                    if self.nodes.get(m["ref"], _EMPTY).in_window is not None:
                        return True
                elif m["type"] == "way":
                    if self.ways.get(m["ref"], _EMPTY).in_window is not None:
                        return True
                else:
                    sub = latest.get(m["ref"])
                    if sub is not None and rel_window(sub, visited):
                        return True
            return False

        def rel_before(r, _visited=None):
            if r["in_update"]:
                return False
            visited = _visited or set()
            if r["id"] in visited:
                return True  # cycle guard: vacuous forall
            visited = visited | {r["id"]}
            for m in r["members"]:
                if m["type"] == "node":
                    if self.nodes.get(m["ref"], _EMPTY).before_window is None:
                        return False
                elif m["type"] == "way":
                    if self.ways.get(m["ref"], _EMPTY).before_window is None:
                        return False
                else:
                    sub = latest.get(m["ref"])
                    if sub is not None and not rel_before(sub, visited):
                        return False
            return True

        self.relations = _histories(
            all_rows, "relation", rel_complete, rel_window, rel_before
        )

    # -- geometry (G1) -------------------------------------------------------

    def _resolve(self, hist: RowHistory | None, in_window: bool) -> dict | None:
        """The in-window → before-window fallback chain (RowsToJson.scala:283-289)."""
        if hist is None:
            return None
        if in_window:
            if hist.in_window is not None:
                return hist.in_window
            return hist.before_window
        return hist.before_window

    def geometry(self, row: dict, in_window: bool = True):
        t = row["type"]
        if t == "node":
            return ("Point", np.array([row["lon"], row["lat"]], dtype=np.float64))
        if t == "way":
            pts = []
            for nd in row["nds"]:
                nrow = self._resolve(self.nodes.get(nd), in_window)
                if nrow is None:
                    raise KeyError(f"unresolvable node {nd} for way {row['id']}")
                pts.append((nrow["lon"], nrow["lat"]))
            coords = np.array(pts, dtype=np.float64)
            closed = len(coords) >= 2 and bool((coords[0] == coords[-1]).all())
            if OSM.is_area(row["tags"]) and closed:
                return ("Polygon", [coords])
            return ("LineString", coords)
        # relation
        resolved_rows: list[dict | None] = []
        for m in row["members"]:
            hist = {
                "node": self.nodes,
                "way": self.ways,
                "relation": self.relations,
            }[m["type"]].get(m["ref"])
            if hist is None:
                raise KeyError(f"unknown member {m} of relation {row['id']}")
            resolved_rows.append(self._resolve(hist, in_window))

        members = row["members"]
        kept = [(m, rr) for m, rr in zip(members, resolved_rows) if rr is not None]
        geoms = [self.geometry(rr, in_window) for _, rr in kept]
        types = [OSM.MEMBER_CODES[m["type"]] for m, _ in kept]
        roles = [m["role"] for m, _ in kept]

        if OSM.is_multipolygon(row["tags"]):
            wkbs = [G.geom_to_wkb(g) for g in geoms]
            built = A.build_multipolygon(types, roles, wkbs)
            if built is not None:
                return G.wkb_to_geom(built)
            return ("GeometryCollection", geoms)
        if geoms and all(g[0] in ("LineString", "MultiLineString") for g in geoms):
            ml = A.get_multiline(geoms)
            if ml is not None:
                return ml
        return ("GeometryCollection", geoms)

    # -- metadata + emission -------------------------------------------------

    @staticmethod
    def _metadata(row: dict, visible: bool | None = None) -> dict:
        return {
            "id": row["id"],
            "type": row["type"],
            "tags": row["tags"],
            "changeset": row["changeset"],
            "timestamp": _iso_instant(row["timestamp"]),
            "uid": row["uid"],
            "user": row["user"],
            "version": row["version"],
            "visible": row["visible"] if visible is None else visible,
        }

    def features_for(self, tipe: str, id_: int) -> list[dict]:
        """Emission rules for one entity (RowsToJson.scala:353-383)."""
        hist = {"node": self.nodes, "way": self.ways, "relation": self.relations}[
            tipe
        ].get(id_)
        if hist is None:
            return []
        in_w, before = hist
        out: list[dict] = []
        if in_w is not None and before is not None:  # modify / delete
            visible_now = in_w["visible"]
            if visible_now:
                g1 = self.geometry(in_w, in_window=True)
                out.append(_feature(g1, self._metadata(in_w)))
                g2 = self.geometry(before, in_window=False)
                out.append(_feature(g2, self._metadata(before, visible=False)))
            else:  # delete: single before-feature marked invisible
                g1 = self.geometry(before, in_window=False)
                out.append(_feature(g1, self._metadata(before, visible=False)))
        elif in_w is not None:  # create
            if in_w["visible"]:
                g = self.geometry(in_w, in_window=True)
                out.append(_feature(g, self._metadata(in_w)))
        return out

    def entity_list(self) -> list[tuple[str, int, int]]:
        """(type, id, cell) of every entity with a history — the distributed render's
        work list; cell comes from the entity's most recent row."""
        out = []
        for tipe, hists in (
            ("node", self.nodes),
            ("way", self.ways),
            ("relation", self.relations),
        ):
            for id_, h in hists.items():
                row = h.in_window or h.before_window
                cell = row["cell"] if row else -1
                out.append((tipe, id_, cell if cell is not None else -1))
        return sorted(out, key=lambda t: (_TYPE_ORDER[t[0]], t[1]))

    def all_features(self) -> list[dict]:
        """Every feature of the batch, deterministically ordered."""
        out = []
        for tipe, id_, _ in self.entity_list():
            out.extend(self.features_for(tipe, id_))
        return out


_EMPTY = RowHistory(None, None)


def _geom_json(geom) -> dict:
    kind, payload = geom
    if kind == "Point":
        return {"type": "Point", "coordinates": [float(payload[0]), float(payload[1])]}
    if kind == "LineString":
        return {"type": "LineString", "coordinates": payload.tolist()}
    if kind == "Polygon":
        return {"type": "Polygon", "coordinates": [r.tolist() for r in payload]}
    if kind == "MultiLineString":
        return {"type": "MultiLineString", "coordinates": [l.tolist() for l in payload]}
    if kind == "MultiPolygon":
        return {
            "type": "MultiPolygon",
            "coordinates": [[r.tolist() for r in p] for p in payload],
        }
    if kind == "GeometryCollection":
        return {
            "type": "GeometryCollection",
            "geometries": [_geom_json(g) for g in payload],
        }
    raise ValueError(kind)


def _feature(geom, metadata: dict) -> dict:
    return {"type": "Feature", "geometry": _geom_json(geom), "properties": metadata}


def features_to_ndjson(features: list[dict]) -> str:
    return "".join(json.dumps(f, separators=(",", ":")) + "\n" for f in features)
