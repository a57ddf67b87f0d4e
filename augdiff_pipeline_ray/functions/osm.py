"""OSM tag-semantics kernels: isArea / isMultiPolygon / isRoute / member compression / tag merge.

Semantics reproduced from the reference's osmesa UDF library
(ingest/src/main/scala/osmesa/functions/osm/package.scala:127-176) which in turn encodes the
public `osmlab/id-area-keys` dataset @ v2.8.0 — "values are inverted": a key listed below
marks a closed way as an area *unless* its value appears in the key's exception set.

Quirks preserved for parity:
* explicit ``area`` tag wins only when its lowercased value is one of the six boolean
  spellings; truthy = {yes, true, 1}.
* ``addr:*`` / ``area:highway`` / ``piste:type`` are *literal* key strings in the table
  (no wildcard expansion) — matching the reference's ``keySet.intersect`` behavior.

These are per-row dict functions by nature (map-typed column); they run inside
``map_batches`` over the Arrow map column rendered as lists of (key, value) pairs, with the
constant tables loaded once per worker process at import (reference holds them JVM-static).
"""

from __future__ import annotations

TRUTHY = {"yes", "true", "1"}

# member-type compression codes (reference ProcessOSM.scala:3-8, compressMemberTypes
# osm/package.scala:156-176)
MEMBER_NODE_CODE = 1
MEMBER_WAY_CODE = 2
MEMBER_RELATION_CODE = 3
MEMBER_CODES = {"node": MEMBER_NODE_CODE, "way": MEMBER_WAY_CODE, "relation": MEMBER_RELATION_CODE}


def compress_member_types(members: list[dict]) -> list[dict]:
    """Replace member `type` strings with byte codes inside the nested list (M12)."""
    return [
        {"type": MEMBER_CODES[m["type"]], "ref": m["ref"], "role": m["role"]}
        for m in (members or [])
    ]
BOOLEAN_VALUES = {"yes", "no", "true", "false", "1", "0"}
MULTIPOLYGON_TYPES = {"multipolygon", "boundary"}

# osmlab/id-area-keys v2.8.0 (public): key → set of values for which the key does NOT
# imply an area (inverted semantics).
AREA_KEYS: dict[str, set[str]] = {
    "addr:*": set(),
    "advertising": {"billboard"},
    "aerialway": {
        "cable_car", "chair_lift", "drag_lift", "gondola", "goods",
        "magic_carpet", "mixed_lift", "platter", "rope_tow", "t-bar",
    },
    "aeroway": {"runway", "taxiway"},
    "allotments": set(),
    "amenity": {"bench"},
    "area:highway": set(),
    "attraction": {"dark_ride", "river_rafting", "train", "water_slide"},
    "building": set(),
    "camp_site": set(),
    "club": set(),
    "craft": set(),
    "emergency": {"designated", "destination", "no", "official", "private", "yes"},
    "golf": {"hole", "lateral_water_hazard", "water_hazard"},
    "healthcare": set(),
    "historic": set(),
    "industrial": set(),
    "junction": {"circular", "roundabout"},
    "landuse": set(),
    "leisure": {"slipway", "track"},
    "man_made": {"breakwater", "crane", "cutline", "embankment", "groyne", "pier", "pipeline"},
    "military": set(),
    "natural": {"cliff", "coastline", "ridge", "tree_row"},
    "office": set(),
    "piste:type": set(),
    "place": set(),
    "playground": {"balancebeam", "slide", "zipwire"},
    "power": {"line", "minor_line"},
    "public_transport": {"platform"},
    "shop": set(),
    "tourism": set(),
    "waterway": {"canal", "dam", "ditch", "drain", "river", "stream", "weir"},
}


def is_area(tags: dict[str, str]) -> bool:
    """Tag heuristic: explicit area=... boolean wins; else id-area-keys inverted lookup."""
    if not tags:
        return False
    area = tags.get("area")
    if area is not None and area.lower() in BOOLEAN_VALUES:
        return area.lower() in TRUTHY
    for k, v in tags.items():
        exceptions = AREA_KEYS.get(k)
        if exceptions is not None and v not in exceptions:
            return True
    return False


def is_multipolygon(tags: dict[str, str]) -> bool:
    t = tags.get("type") if tags else None
    return t is not None and t.lower() in MULTIPOLYGON_TYPES


def is_route(tags: dict[str, str]) -> bool:
    return bool(tags) and tags.get("type") == "route"


def merge_tags(a: dict[str, str] | None, b: dict[str, str] | None) -> dict[str, str]:
    """Union of two tag maps, right side wins on conflict (reference osm/package.scala:555-557)."""
    out = dict(a or {})
    out.update(b or {})
    return out


def tags_from_arrow(tags_value) -> dict[str, str]:
    """Arrow map scalar (list of {'key','value'} dicts or (k,v) tuples) → python dict."""
    if tags_value is None:
        return {}
    if isinstance(tags_value, dict):
        return tags_value
    out = {}
    for kv in tags_value:
        if isinstance(kv, tuple):
            out[kv[0]] = kv[1]
        else:
            out[kv["key"]] = kv["value"]
    return out
