"""OSC (OsmChange XML) micro-batch reader/writer → Arrow change rows.

Replaces the reference's Osmosis `XmlChangeReader` + `ChangeAugmenter` entity→row builders
(ad/src/main/scala/AugmentedDiff.scala:95-159, ChangeAugmenter.scala:28-135):

* create/modify → full rows (`entity_to_row`), delete → "lesser" tombstone rows with only
  id/type/timestamp/version populated, empty tags, empty nds/members, ``visible=False``
  (ChangeAugmenter.scala:28-51).
* gz/bz2 sniffing by filename suffix (AugmentedDiff.scala:141-143).
* exponential-backoff retry ×2 capped at 2^8 s for flaky fetch, mirrored as a parameter
  (AugmentedDiff.scala:103,148-156) — local files rarely need it, the hook stays.
* sequence-number → AAA/BBB/CCC zero-padded replication path (AugmentedDiff.scala:217-223).

Parsing one OSC file is a bounded, per-micro-batch operation; inside the engine it runs as
``ray.data.read_binary_files(...) → map_batches(parse_osc_batch)`` so many batches parse in
parallel, each emitting Arrow tables in ``CHANGE_SCHEMA``.
"""

from __future__ import annotations

import bz2
import gzip
import time
import xml.etree.ElementTree as ET
from xml.sax.saxutils import escape, quoteattr

import numpy as np
import pyarrow as pa

from .. import cells as C
from .. import keys as K
from ..schemas import CHANGE_SCHEMA

_ACTIONS = ("create", "modify", "delete")
_EPOCH = np.datetime64("1970-01-01T00:00:00", "ms")


def sequence_path(seq: int) -> str:
    """Sequence number → 'AAA/BBB/CCC' zero-padded path (planet replication layout)."""
    return f"{(seq // 1_000_000) % 1000:03d}/{(seq // 1000) % 1000:03d}/{seq % 1000:03d}"


def _decompress(data: bytes, name: str) -> bytes:
    if name.endswith(".bz2"):
        return bz2.decompress(data)
    if name.endswith(".gz"):
        return gzip.decompress(data)
    return data


def _fetch_uri(uri: str) -> bytes:
    """Resolve the four URI schemes the reference's fetch supports
    (AugmentedDiff.scala:106-156: file, hdfs, s3, http(s)) and read the bytes.

    * plain path / ``file://`` → local read
    * ``http(s)://`` → stdlib urllib (URLError subclasses OSError, so the retry loop
      in :func:`read_osc_file` covers flaky fetches)
    * ``s3://`` / ``hdfs://`` → ``pyarrow.fs.FileSystem.from_uri`` (the public Arrow
      filesystem layer; raises cleanly when the scheme's driver isn't available in the
      environment — this sandbox has neither network nor HDFS)
    """
    from urllib.parse import urlparse

    scheme = urlparse(uri).scheme
    if scheme in ("http", "https"):
        import urllib.request

        with urllib.request.urlopen(uri, timeout=30) as r:
            return r.read()
    if scheme == "file":
        with open(urlparse(uri).path, "rb") as f:
            return f.read()
    if scheme in ("s3", "hdfs"):
        import pyarrow.fs as pafs

        fs, p = pafs.FileSystem.from_uri(uri)
        with fs.open_input_stream(p) as f:
            return f.read()
    with open(uri, "rb") as f:
        return f.read()


def read_osc_file(
    path: str,
    batch_seq: int,
    max_retries: int = 8,
    backoff_base_s: float | None = None,
) -> pa.Table:
    """Fetch (any supported URI scheme) + parse one OSC file with exponential-backoff
    retry (×2, capped at 2^8 s, mirroring AugmentedDiff.scala:148-156; retries fire
    only on IO/HTTP errors, never on clean parses). Remote schemes back off in real
    seconds; local reads keep a 10 ms-scaled backoff so resume tests stay fast."""
    from urllib.parse import urlparse

    remote = urlparse(path).scheme in ("http", "https", "s3", "hdfs")
    if backoff_base_s is None:
        backoff_base_s = 1.0 if remote else 0.01
    delay = 1
    while True:
        try:
            data = _fetch_uri(path)
            return parse_osc(_decompress(data, path), batch_seq)
        except OSError:  # covers URLError/HTTPError (urllib) and local IO errors
            if delay > (1 << 8) // 2 or max_retries <= 0:
                raise
            time.sleep(min(delay, 4) * backoff_base_s)
            delay *= 2
            max_retries -= 1


def _find_pat(arr: np.ndarray, pat: bytes, cand0: np.ndarray | None = None) -> np.ndarray:
    """Positions of ``pat`` in a uint8 array — vectorized sliding compare: one
    candidate filter on the first byte (or a precomputed candidate set shared
    across patterns with the same first byte), then one mask per remaining byte."""
    if len(arr) < len(pat):
        return np.empty(0, np.int64)
    if cand0 is not None:
        cand = cand0[cand0 <= len(arr) - len(pat)]
    else:
        cand = np.flatnonzero(arr[: len(arr) - len(pat) + 1] == pat[0])
    for j in range(1, len(pat)):
        if not len(cand):
            break
        cand = cand[arr[cand + j] == pat[j]]
    return cand.astype(np.int64)


def _gather_utf8(data: np.ndarray, starts: np.ndarray, ends: np.ndarray) -> pa.Array:
    """Non-contiguous byte slices → one Arrow utf8 array (vectorized gather).
    utf8 offsets are int32 — callers must guarantee < 2 GiB of gathered bytes
    (parse_osc routes ≥ 2 GiB documents to the ElementTree path); raise rather
    than silently wrap if that contract is ever violated."""
    lens = (ends - starts).astype(np.int64)
    total = int(lens.sum())
    if total >= 1 << 31:
        raise ValueError(f"gathered bytes {total} overflow utf8 int32 offsets")
    if total:
        flat = data[
            np.repeat(starts, lens)
            + np.arange(total, dtype=np.int64)
            - np.repeat(np.concatenate([[0], np.cumsum(lens)[:-1]]), lens)
        ]
        vals = flat.tobytes()
    else:
        vals = b""
    offs = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
    return pa.Array.from_buffers(
        pa.utf8(), len(starts), [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(vals)]
    )


def _attr(attrs: pa.Array, name: str) -> pa.Array:
    """Vectorized attribute extraction (RE2): leading whitespace anchors the attr
    name so ``id=`` never matches inside ``uid=``."""
    import pyarrow.compute as pc

    ex = pc.extract_regex(attrs, f'[ \\t\\r\\n]{name}\\s*=\\s*"(?P<v>[^"]*)"')
    return pc.struct_field(ex, "v")


# fall back to the ElementTree path when the document uses constructs the byte
# scanner doesn't model exactly (single-quoted attributes, comments/CDATA —
# both start with "<!" — non-action blocks, numeric character entities)
_FALLBACK_PATTERNS = (b"='", b"<!", b"<bound", b"&#")

# the canonical OSM attribute layout, matched in ONE anchored RE2 pass per
# element; optional blocks cover tombstones (id/version/timestamp only) and
# non-node elements (no lat/lon). Rows in any other attribute order fall back
# to the per-attribute extraction path below.
_WS = "[ \\t\\r\\n]+"
_COMBINED_ATTR_RE = (
    f'^{_WS}id="(?P<id>[^"]*)"'
    f'{_WS}version="(?P<ver>[^"]*)"'
    f'{_WS}timestamp="(?P<ts>[^"]*)"'
    f'(?:{_WS}changeset="(?P<cs>[^"]*)"'
    f'{_WS}uid="(?P<uid>[^"]*)"'
    f'{_WS}user="(?P<user>[^"]*)")?'
    f'(?:{_WS}lat="(?P<lat>[^"]*)"'
    f'{_WS}lon="(?P<lon>[^"]*)")?'
    "[ \\t\\r\\n]*$"
)


def parse_osc(xml_bytes: bytes, batch_seq: int) -> pa.Table:
    """OsmChange XML → Arrow table in CHANGE_SCHEMA.

    Vectorized byte-scan parser (VERDICT r3 #5): element/child/action tag
    positions come from numpy sliding-compare scans over the raw bytes, attribute
    strings are gathered into ONE Arrow utf8 array and pulled apart with RE2
    ``extract_regex`` kernels, children (tag/nd/member) are globally scanned and
    assigned to parents with ``searchsorted`` — no per-element Python, no DOM.
    Documents using constructs outside that fast path (single-quoted attributes,
    comments, CDATA, ``<bound>``, numeric entities) take the ElementTree path,
    which stays the semantic reference (equivalence-pinned in tests)."""
    import pyarrow.compute as pc

    if any(p in xml_bytes for p in _FALLBACK_PATTERNS):
        return _parse_osc_et(xml_bytes, batch_seq)
    if len(xml_bytes) >= 1 << 31:
        # gathered attribute spans are disjoint within the document, so doc
        # size < 2 GiB guarantees _gather_utf8's int32 utf8 offsets can't wrap
        return _parse_osc_et(xml_bytes, batch_seq)

    data = np.frombuffer(xml_bytes, np.uint8)
    n_total = len(data)
    lt_pos = np.flatnonzero(data == 60)  # '<' — shared candidate set for all tags

    def bounded(pos: np.ndarray, width: int) -> np.ndarray:
        """Keep matches whose next char ends the tag name (space, '/', '>')."""
        nxt = np.minimum(pos + width, n_total - 1)
        c = data[nxt]
        return pos[(c == 32) | (c == 9) | (c == 10) | (c == 13) | (c == 47) | (c == 62)]

    el_parts = []
    for tag, code in ((b"<node", 0), (b"<way", 1), (b"<relation", 2)):
        p = bounded(_find_pat(data, tag, lt_pos), len(tag))
        el_parts.append((p, np.full(len(p), code, np.int8)))
    el_pos = np.concatenate([p for p, _ in el_parts])
    el_code = np.concatenate([c for _, c in el_parts])
    order = np.argsort(el_pos, kind="stable")  # document order
    el_pos, el_code = el_pos[order], el_code[order]
    n = len(el_pos)
    if n == 0:
        return _parse_osc_et(xml_bytes, batch_seq)

    # action of each element: most recent action-open before it
    act_parts = []
    for tag, code in ((b"<create", 0), (b"<modify", 1), (b"<delete", 2)):
        p = bounded(_find_pat(data, tag, lt_pos), len(tag))
        act_parts.append((p, np.full(len(p), code, np.int8)))
    act_pos = np.concatenate([p for p, _ in act_parts])
    act_code = np.concatenate([c for _, c in act_parts])
    aorder = np.argsort(act_pos, kind="stable")
    act_pos, act_code = act_pos[aorder], act_code[aorder]
    if len(act_pos) == 0 or el_pos[0] < act_pos[0]:
        return _parse_osc_et(xml_bytes, batch_seq)
    el_action = act_code[np.searchsorted(act_pos, el_pos, side="right") - 1]
    is_del = el_action == 2

    # attribute span of each element: from after the tag name to the next '>'
    # (minus a trailing '/' for self-closing tags)
    gt_pos = np.flatnonzero(data == 62)
    # a '>' with an odd number of '"' before it sits INSIDE an attribute value
    # (legal XML the tag scanner can't cut at) — take the exact path instead
    q_pos = np.flatnonzero(data == 34)
    if len(gt_pos) and (np.searchsorted(q_pos, gt_pos) % 2 == 1).any():
        return _parse_osc_et(xml_bytes, batch_seq)
    name_len = np.array([5, 4, 9], np.int64)[el_code]  # <node <way <relation
    a_start = el_pos + name_len
    a_end = gt_pos[np.searchsorted(gt_pos, el_pos)]
    a_end = np.where(data[np.maximum(a_end - 1, 0)] == 47, a_end - 1, a_end)
    attrs = _gather_utf8(data, a_start, a_end)

    null_s = pa.scalar(None, pa.string())

    def _blank_null(a: pa.Array) -> pa.Array:
        # combined-pattern non-participating groups come back "" — map to null
        # (no numeric OSM attribute is legitimately empty)
        return pc.if_else(pc.equal(pc.fill_null(a, ""), ""), null_s, a)

    ex = pc.extract_regex(attrs, _COMBINED_ATTR_RE)
    if not pc.any(pc.is_null(ex)).as_py():
        # canonical attribute order: ONE anchored RE2 pass covered every element
        ids_s = pc.struct_field(ex, "id")
        ver_s = pc.struct_field(ex, "ver")
        ts_s = pc.struct_field(ex, "ts")
        cs_s = _blank_null(pc.struct_field(ex, "cs"))
        uid_s = _blank_null(pc.struct_field(ex, "uid"))
        user_s = pc.struct_field(ex, "user")
        lat_s = _blank_null(pc.struct_field(ex, "lat"))
        lon_s = _blank_null(pc.struct_field(ex, "lon"))
    else:
        # uncommon attribute order somewhere: per-attribute extraction
        ids_s = _attr(attrs, "id")
        ver_s = pc.fill_null(_attr(attrs, "version"), "1")
        ts_s = _attr(attrs, "timestamp")
        cs_s = _attr(attrs, "changeset")
        uid_s = _attr(attrs, "uid")
        user_s = _attr(attrs, "user")
        lat_s = _attr(attrs, "lat")
        lon_s = _attr(attrs, "lon")
        if pc.any(pc.is_null(ids_s)).as_py() or pc.any(pc.is_null(ts_s)).as_py():
            return _parse_osc_et(xml_bytes, batch_seq)

    id_arr = pc.cast(ids_s, pa.int64()).to_numpy(zero_copy_only=False)
    versions = pc.cast(ver_s, pa.int64()).to_numpy(zero_copy_only=False)
    ts_ms = pc.cast(
        pc.cast(pc.replace_substring(ts_s, "Z", ""), pa.timestamp("ms")), pa.int64()
    ).to_numpy(zero_copy_only=False)

    del_mask_arr = pa.array(is_del)
    changesets = pc.if_else(
        del_mask_arr, pa.scalar(None, pa.int64()),
        pc.cast(pc.fill_null(cs_s, "0"), pa.int64()),
    )
    uids = pc.if_else(
        del_mask_arr, pa.scalar(None, pa.int64()),
        pc.cast(pc.fill_null(uid_s, "0"), pa.int64()),
    )
    users = pc.if_else(del_mask_arr, null_s, pc.fill_null(user_s, ""))
    null_f64 = pa.scalar(None, pa.float64())
    lats = pc.if_else(del_mask_arr, null_f64, pc.cast(lat_s, pa.float64()))
    lons = pc.if_else(del_mask_arr, null_f64, pc.cast(lon_s, pa.float64()))

    # children: global scans, parent = element whose open precedes the child
    def _children(pat: bytes, want_code: int | None):
        p = bounded(_find_pat(data, pat), len(pat))
        if not len(p):
            return p, np.zeros(n, np.int64), None
        parent = np.searchsorted(el_pos, p, side="right") - 1
        keep = ~is_del[parent]
        if want_code is not None:
            keep &= el_code[parent] == want_code
        p, parent = p[keep], parent[keep]
        c_end = gt_pos[np.searchsorted(gt_pos, p)]
        c_end = np.where(data[np.maximum(c_end - 1, 0)] == 47, c_end - 1, c_end)
        cattrs = _gather_utf8(data, p + len(pat), c_end)
        counts = np.bincount(parent, minlength=n).astype(np.int64)
        return p, counts, cattrs

    _, tag_counts, tag_attrs = _children(b"<tag", None)
    _, nd_counts, nd_attrs = _children(b"<nd", 1)
    _, mem_counts, mem_attrs = _children(b"<member", 2)

    def _offsets(counts: np.ndarray) -> pa.Array:
        return pa.array(
            np.concatenate([[0], np.cumsum(counts)]).astype(np.int32), pa.int32()
        )

    if tag_attrs is not None:
        keys = _attr(tag_attrs, "k")
        vals = _attr(tag_attrs, "v")
        if pc.any(pc.is_null(keys)).as_py() or pc.any(pc.is_null(vals)).as_py():
            return _parse_osc_et(xml_bytes, batch_seq)
        tags_col = pa.MapArray.from_arrays(_offsets(tag_counts), keys, vals)
    else:
        tags_col = pa.MapArray.from_arrays(
            _offsets(tag_counts), pa.array([], pa.string()), pa.array([], pa.string())
        )
    if nd_attrs is not None:
        refs = pc.cast(_attr(nd_attrs, "ref"), pa.int64())
        if pc.any(pc.is_null(refs)).as_py():
            return _parse_osc_et(xml_bytes, batch_seq)
        nds_col = pa.ListArray.from_arrays(
            _offsets(nd_counts),
            pa.StructArray.from_arrays([refs], ["ref"]),
            CHANGE_SCHEMA.field("nds").type,
        )
    else:
        nds_col = pa.ListArray.from_arrays(
            _offsets(nd_counts),
            pa.array([], CHANGE_SCHEMA.field("nds").type.value_type),
            CHANGE_SCHEMA.field("nds").type,
        )
    if mem_attrs is not None:
        mtypes = _attr(mem_attrs, "type")
        mrefs = pc.cast(_attr(mem_attrs, "ref"), pa.int64())
        mroles = pc.fill_null(_attr(mem_attrs, "role"), "")
        if pc.any(pc.is_null(mtypes)).as_py() or pc.any(pc.is_null(mrefs)).as_py():
            return _parse_osc_et(xml_bytes, batch_seq)
        members_col = pa.ListArray.from_arrays(
            _offsets(mem_counts),
            pa.StructArray.from_arrays([mtypes, mrefs, mroles], ["type", "ref", "role"]),
            CHANGE_SCHEMA.field("members").type,
        )
    else:
        members_col = pa.ListArray.from_arrays(
            _offsets(mem_counts),
            pa.array([], CHANGE_SCHEMA.field("members").type.value_type),
            CHANGE_SCHEMA.field("members").type,
        )

    # standard XML entities in string values: vectorized unescape (amp LAST);
    # numeric entities already routed to the ET path above
    def _unescape(a):
        if not pc.any(pc.match_substring(pc.fill_null(a, ""), "&")).as_py():
            return a
        for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                        ("&apos;", "'"), ("&amp;", "&")):
            a = pc.replace_substring(a, ent, ch)
        return a

    users = _unescape(users)
    if tag_attrs is not None:
        tags_col = pa.MapArray.from_arrays(
            _offsets(tag_counts), _unescape(tags_col.keys), _unescape(tags_col.items)
        )
    if mem_attrs is not None and pc.any(
        pc.match_substring(members_col.values.field("role"), "&")
    ).as_py():
        members_col = pa.ListArray.from_arrays(
            _offsets(mem_counts),
            pa.StructArray.from_arrays(
                [members_col.values.field("type"), members_col.values.field("ref"),
                 _unescape(members_col.values.field("role"))],
                ["type", "ref", "role"],
            ),
            CHANGE_SCHEMA.field("members").type,
        )

    types = pa.DictionaryArray.from_arrays(
        pa.array(el_code.astype(np.int8)), pa.array(["node", "way", "relation"])
    ).cast(pa.string())
    actions = pa.DictionaryArray.from_arrays(
        pa.array(el_action.astype(np.int8)), pa.array(["create", "modify", "delete"])
    ).cast(pa.string())
    p_col = K.partition_number(id_arr, el_code.astype(np.int64))
    lat_np = lats.to_numpy(zero_copy_only=False)
    lon_np = lons.to_numpy(zero_copy_only=False)
    cell = C.cell_of(lat_np, lon_np)

    return pa.table(
        {
            "p": pa.array(p_col),
            "cell": pa.array(cell),
            "id": pa.array(id_arr),
            "type": types,
            "tags": tags_col,
            "lat": lats,
            "lon": lons,
            "nds": nds_col,
            "members": members_col,
            "changeset": changesets,
            "timestamp": pa.array(ts_ms).cast(pa.timestamp("ms")),
            "uid": uids,
            "user": users,
            "version": pa.array(versions),
            "visible": pa.array(~is_del),
            "batch_seq": pa.array(np.full(n, batch_seq, np.int64)),
            "action": actions,
        }
    )


def _parse_osc_et(xml_bytes: bytes, batch_seq: int) -> pa.Table:
    """OsmChange XML → Arrow table in CHANGE_SCHEMA (ElementTree reference path;
    the vectorized ``parse_osc`` is equivalence-pinned against this)."""
    root = ET.fromstring(xml_bytes)
    ids: list[int] = []
    types: list[str] = []
    tags: list[list[tuple[str, str]]] = []
    lats: list[float | None] = []
    lons: list[float | None] = []
    nds: list[list[dict] | None] = []
    members: list[list[dict] | None] = []
    changesets: list[int | None] = []
    timestamps: list[int] = []
    uids: list[int | None] = []
    users: list[str | None] = []
    versions: list[int] = []
    visibles: list[bool] = []
    actions: list[str] = []

    for action_el in root:
        action = action_el.tag
        if action not in _ACTIONS:
            continue
        for el in action_el:
            etype = el.tag  # node | way | relation
            ids.append(int(el.get("id")))
            types.append(etype)
            ts = np.datetime64(el.get("timestamp").rstrip("Z"), "ms")
            timestamps.append(int((ts - _EPOCH).astype(np.int64)))
            versions.append(int(el.get("version", "1")))
            actions.append(action)
            if action == "delete":
                # lesser row: tombstone (ChangeAugmenter.scala:28-51)
                tags.append([])
                lats.append(None)
                lons.append(None)
                nds.append([])
                members.append([])
                changesets.append(None)
                uids.append(None)
                users.append(None)
                visibles.append(False)
                continue
            tags.append([(t.get("k"), t.get("v")) for t in el.findall("tag")])
            lats.append(float(el.get("lat")) if el.get("lat") is not None else None)
            lons.append(float(el.get("lon")) if el.get("lon") is not None else None)
            nds.append(
                [{"ref": int(nd.get("ref"))} for nd in el.findall("nd")]
                if etype == "way"
                else []
            )
            members.append(
                [
                    {
                        "type": m.get("type"),
                        "ref": int(m.get("ref")),
                        "role": m.get("role", ""),
                    }
                    for m in el.findall("member")
                ]
                if etype == "relation"
                else []
            )
            changesets.append(int(el.get("changeset", "0")))
            uids.append(int(el.get("uid", "0")))
            users.append(el.get("user", ""))
            visibles.append(True)

    n = len(ids)
    id_arr = np.asarray(ids, dtype=np.int64) if n else np.empty(0, np.int64)
    p = K.partition_number_typed(id_arr, types) if n else np.empty(0, np.int64)
    lat_np = np.array([float("nan") if v is None else v for v in lats], dtype=np.float64)
    lon_np = np.array([float("nan") if v is None else v for v in lons], dtype=np.float64)
    cell = C.cell_of(lat_np, lon_np) if n else np.empty(0, np.int64)

    return pa.table(
        {
            "p": pa.array(p),
            "cell": pa.array(cell),
            "id": pa.array(id_arr),
            "type": pa.array(types, pa.string()),
            "tags": pa.array(tags, CHANGE_SCHEMA.field("tags").type),
            "lat": pa.array(lats, pa.float64()),
            "lon": pa.array(lons, pa.float64()),
            "nds": pa.array(nds, CHANGE_SCHEMA.field("nds").type),
            "members": pa.array(members, CHANGE_SCHEMA.field("members").type),
            "changeset": pa.array(changesets, pa.int64()),
            "timestamp": pa.array(timestamps, pa.timestamp("ms")),
            "uid": pa.array(uids, pa.int64()),
            "user": pa.array(users, pa.string()),
            "version": pa.array(versions, pa.int64()),
            "visible": pa.array(visibles, pa.bool_()),
            "batch_seq": pa.array([batch_seq] * n, pa.int64()),
            "action": pa.array(actions, pa.string()),
        }
    )


# ---------------------------------------------------------------------------
# writer (used by the synthetic world generator to produce real OSC inputs)
# ---------------------------------------------------------------------------


def _ts_str(ts) -> str:
    """datetime (UTC-naive, from Arrow to_pylist) or epoch-ms int → ISO-8601 Z string."""
    if isinstance(ts, (int, np.integer)):
        return str(np.datetime64(int(ts), "ms")) + "Z"
    return ts.isoformat(timespec="milliseconds") + "Z"


def write_osc(table: pa.Table, path: str) -> None:
    """Arrow change rows (CHANGE_SCHEMA) → OsmChange XML file (gz/bz2 by suffix)."""
    rows = table.to_pylist()
    out: list[str] = ['<?xml version="1.0" encoding="UTF-8"?>', '<osmChange version="0.6">']
    for r in rows:
        a = r["action"]
        etype = r["type"]
        attrs = [
            f'id="{r["id"]}"',
            f'version="{r["version"]}"',
            f'timestamp={quoteattr(_ts_str(r["timestamp"]))}',
        ]
        if a != "delete":
            attrs += [
                f'changeset="{r["changeset"]}"',
                f'uid="{r["uid"]}"',
                f"user={quoteattr(r['user'] or '')}",
            ]
            if etype == "node":
                attrs += [f'lat="{r["lat"]:.7f}"', f'lon="{r["lon"]:.7f}"']
        body: list[str] = []
        if a != "delete":
            for kv in r["tags"] or []:
                k, v = (kv["key"], kv["value"]) if isinstance(kv, dict) else kv
                body.append(f"<tag k={quoteattr(k)} v={quoteattr(v)}/>")
            for nd in r["nds"] or []:
                body.append(f'<nd ref="{nd["ref"]}"/>')
            for m in r["members"] or []:
                body.append(
                    f'<member type="{m["type"]}" ref="{m["ref"]}" role={quoteattr(m["role"] or "")}/>'
                )
        el = f"<{etype} {' '.join(attrs)}>{''.join(body)}</{etype}>"
        out.append(f"<{a}>{el}</{a}>")
    out.append("</osmChange>")
    payload = "\n".join(out).encode()
    if path.endswith(".bz2"):
        payload = bz2.compress(payload)
    elif path.endswith(".gz"):
        payload = gzip.compress(payload)
    with open(path, "wb") as f:
        f.write(payload)
