"""Unit tests: OSC parse/write round-trip, edge extraction, closure fixpoints."""

import numpy as np
import pyarrow as pa

from augdiff_pipeline_ray import keys as K
from augdiff_pipeline_ray.sources import osc
from augdiff_pipeline_ray.stages import closure, edges

OSC_XML = b"""<?xml version="1.0" encoding="UTF-8"?>
<osmChange version="0.6">
<create><node id="101" version="1" timestamp="2024-01-01T00:00:00Z" changeset="7" uid="3" user="alice" lat="10.5" lon="20.5"><tag k="amenity" v="bench"/></node></create>
<create><node id="102" version="1" timestamp="2024-01-01T00:00:01Z" changeset="7" uid="3" user="alice" lat="10.6" lon="20.6"/></create>
<modify><way id="201" version="2" timestamp="2024-01-01T00:01:00Z" changeset="8" uid="4" user="bob"><nd ref="101"/><nd ref="102"/><tag k="highway" v="residential"/></way></modify>
<delete><relation id="301" version="3" timestamp="2024-01-01T00:02:00Z"/></delete>
<modify><relation id="302" version="1" timestamp="2024-01-01T00:03:00Z" changeset="9" uid="5" user="carol"><member type="way" ref="201" role="outer"/><member type="node" ref="101" role=""/></relation></modify>
</osmChange>
"""


def test_parse_osc():
    t = osc.parse_osc(OSC_XML, batch_seq=42)
    assert len(t) == 5
    d = t.to_pylist()
    n = d[0]
    assert n["id"] == 101 and n["type"] == "node" and n["action"] == "create"
    assert n["lat"] == 10.5 and n["visible"] is True and n["batch_seq"] == 42
    assert dict(n["tags"]) == {"amenity": "bench"}
    w = d[2]
    assert w["type"] == "way" and [nd["ref"] for nd in w["nds"]] == [101, 102]
    tomb = d[3]
    assert tomb["action"] == "delete" and tomb["visible"] is False
    assert tomb["tags"] == [] and tomb["changeset"] is None and tomb["user"] is None
    r = d[4]
    assert r["members"] == [
        {"type": "way", "ref": 201, "role": "outer"},
        {"type": "node", "ref": 101, "role": ""},
    ]
    # partition numbers stamped per reference fn
    assert n["p"] == 101
    assert w["p"] == 201 ^ 1


def test_parse_osc_vectorized_equals_elementtree():
    """The byte-scan parser (VERDICT r3 #5) is equivalence-pinned against the
    ElementTree reference path — full-table equality including nested columns."""
    new = osc.parse_osc(OSC_XML, batch_seq=9)
    old = osc._parse_osc_et(OSC_XML, batch_seq=9)
    assert new.equals(old)
    assert new.schema.equals(old.schema)


def test_parse_osc_entities_and_multi_element_blocks():
    """Escaped XML entities in attribute values + several elements per action
    block (the real replication-file layout) — both parsers agree."""
    xml = b"""<?xml version="1.0" encoding="UTF-8"?>
<osmChange version="0.6">
<create>
<node id="1" version="1" timestamp="2024-01-01T00:00:00Z" changeset="1" uid="1" user="a&amp;b &lt;x&gt; &quot;q&quot;" lat="1.5" lon="2.5"><tag k="na&amp;me" v="v&lt;1&gt;"/></node>
<node id="2" version="1" timestamp="2024-01-01T00:00:01.250Z" changeset="1" uid="1" user="" lat="-3.25" lon="4.75"/>
<way id="3" version="1" timestamp="2024-01-01T00:00:02Z" changeset="1" uid="1" user="w"><nd ref="1"/><nd ref="2"/></way>
</create>
<delete>
<node id="1" version="2" timestamp="2024-01-02T00:00:00Z"/>
<way id="3" version="2" timestamp="2024-01-02T00:00:01Z"/>
</delete>
<modify><relation id="4" version="1" timestamp="2024-01-03T00:00:00Z" changeset="2" uid="2" user="r"><member type="way" ref="3" role="r&amp;role"/></relation></modify>
</osmChange>
"""
    new = osc.parse_osc(xml, batch_seq=3)
    old = osc._parse_osc_et(xml, batch_seq=3)
    assert new.equals(old)
    d = new.to_pylist()
    assert d[0]["user"] == 'a&b <x> "q"'
    assert dict(d[0]["tags"]) == {"na&me": "v<1>"}
    assert d[5]["members"][0]["role"] == "r&role"
    assert [r["action"] for r in d] == ["create"] * 3 + ["delete"] * 2 + ["modify"]


def test_parse_osc_fallback_constructs():
    """Single-quoted attributes, comments and numeric entities route to the
    ElementTree path and still parse correctly."""
    xml = b"""<?xml version="1.0"?>
<osmChange version="0.6">
<!-- a comment with a fake <node id="99"> inside -->
<create><node id='7' version='1' timestamp='2024-01-01T00:00:00Z' changeset='1' uid='1' user='n&#97;me' lat='1.0' lon='2.0'/></create>
</osmChange>
"""
    t = osc.parse_osc(xml, batch_seq=1)
    assert len(t) == 1
    r = t.to_pylist()[0]
    assert r["id"] == 7 and r["user"] == "name" and r["lat"] == 1.0


def test_parse_osc_gt_in_attribute_value():
    """A literal '>' inside an attribute value is legal XML the tag scanner
    can't cut at — the quote-parity guard must route to the exact path."""
    xml = b"""<?xml version="1.0"?>
<osmChange version="0.6">
<create><node id="8" version="1" timestamp="2024-01-01T00:00:00Z" changeset="1" uid="1" user="a>b" lat="1.0" lon="2.0"/></create>
</osmChange>
"""
    t = osc.parse_osc(xml, batch_seq=1)
    assert t.to_pylist()[0]["user"] == "a>b"
    assert t.equals(osc._parse_osc_et(xml, batch_seq=1))


def test_osc_write_read_roundtrip(tmp_path):
    t = osc.parse_osc(OSC_XML, batch_seq=1)
    for suffix in ("plain.osc", "z.osc.gz", "z.osc.bz2"):
        p = str(tmp_path / suffix)
        osc.write_osc(t, p)
        back = osc.read_osc_file(p, batch_seq=1)
        assert back.to_pylist() == t.to_pylist()


def test_sequence_path():
    assert osc.sequence_path(0) == "000/000/000"
    assert osc.sequence_path(1234567) == "001/234/567"
    assert osc.sequence_path(999999999) == "999/999/999"


def test_edges_from_batch():
    t = osc.parse_osc(OSC_XML, batch_seq=1)
    e = edges.edges_from_batch(t)
    pairs = set(zip(e["a"].to_pylist(), e["b"].to_pylist()))
    w = K.pack_typed(np.array([201]), np.array(["way"]))[0]
    n1 = K.pack_typed(np.array([101]), np.array(["node"]))[0]
    n2 = K.pack_typed(np.array([102]), np.array(["node"]))[0]
    r = K.pack_typed(np.array([302]), np.array(["relation"]))[0]
    assert pairs == {(n1, w), (n2, w), (w, r), (n1, r)}
    # local variant adds node self-edges
    local = edges.edges_from_rows_local(t)
    assert (n1, n1) in local and (n2, n2) in local
    assert pairs < local


def test_local_closure_matches_brute_force():
    # node → way → rel → rel chain plus a diamond
    e = {(1, 10), (2, 10), (10, 100), (100, 200), (2, 11), (11, 100)}
    new, alle = closure.local_closure(e, set())
    assert alle == closure.brute_force_closure(e)
    assert new == alle
    # incremental: existing edges subtracted
    new2, alle2 = closure.local_closure(e, alle)
    assert alle2 == alle and new2 == set()


def test_local_closure_handles_cycles():
    e = {(1, 2), (2, 3), (3, 1)}
    _, alle = closure.local_closure(e, set())
    assert alle == closure.brute_force_closure(e)


def test_closure_numpy_matches_brute_force():
    rng = np.random.default_rng(13)
    n = 80
    a = rng.integers(0, n - 1, 200)
    b = a + 1 + rng.integers(0, 6, 200)
    pairs = {(int(x), int(y)) for x, y in zip(a, b) if x != y}
    arr = np.array(sorted(pairs), np.int64)
    ca, cb = closure.closure_numpy(arr[:, 0], arr[:, 1])
    assert set(zip(ca.tolist(), cb.tolist())) == closure.brute_force_closure(pairs)


def test_closure_dataset_matches_brute_force(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(7)
    # random DAG: edges only from lower to higher ids
    n = 60
    a = rng.integers(0, n - 1, 150)
    b = a + 1 + rng.integers(0, 5, 150)
    pairs = {(int(x), int(y)) for x, y in zip(a, b) if x != y}
    ds = rd.from_arrow(
        pa.table(
            {
                "a": pa.array([p[0] for p in sorted(pairs)], pa.int64()),
                "b": pa.array([p[1] for p in sorted(pairs)], pa.int64()),
                "cell": pa.array([0] * len(pairs), pa.int64()),
            }
        )
    )
    out = closure.closure_dataset(ds, max_rounds=10, num_partitions=4)
    pdf = out.to_pandas()
    got = set(zip(pdf["a"].tolist(), pdf["b"].tolist()))
    assert got == closure.brute_force_closure(pairs)


def test_remote_osc_fetch_with_flaky_http_server(tmp_path):
    """S6 parity: http URI resolution + exponential-backoff retry — a local server
    fails the first two requests (HTTP 500), the third serves the gzipped OSC body;
    read_osc_file must come back with the parsed table (AugmentedDiff.scala:106-156)."""
    import gzip
    import http.server
    import threading

    from augdiff_pipeline_ray.sources import osc as OSC

    body = gzip.compress(
        b'<osmChange version="0.6"><create>'
        b'<node id="7" version="1" timestamp="2024-01-01T00:00:00Z" changeset="1" '
        b'uid="1" user="u" lat="1.5" lon="2.5"/>'
        b"</create></osmChange>"
    )
    fails = {"left": 2}

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            if fails["left"] > 0:
                fails["left"] -= 1
                self.send_response(500)
                self.end_headers()
                return
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}/001/002/003.osc.gz"
        tbl = OSC.read_osc_file(url, batch_seq=3, backoff_base_s=0.01)
        assert len(tbl) == 1
        assert tbl["id"].to_pylist() == [7]
        assert tbl["type"].to_pylist() == ["node"]
        assert fails["left"] == 0
    finally:
        srv.shutdown()


def test_remote_osc_fetch_exhausts_retries(tmp_path):
    import http.server
    import threading

    import pytest

    from augdiff_pipeline_ray.sources import osc as OSC

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            self.send_response(503)
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}/x.osc"
        with pytest.raises(OSError):
            OSC.read_osc_file(url, batch_seq=1, max_retries=2, backoff_base_s=0.001)
    finally:
        srv.shutdown()


def test_local_closure_np_matches_set_variant():
    """The stream's numpy edge path must be pair-for-pair identical to the
    set-based reference transcription, including the new/existing diff."""
    rng = np.random.default_rng(21)
    for trial in range(6):
        n = int(rng.integers(8, 60))
        row = {
            (int(x), int(y))
            for x, y in zip(rng.integers(0, n, 40), rng.integers(0, n, 40))
        }
        # some trials include cycles + self-edges (node self-edge convention)
        row |= {(i, i) for i in range(0, n, 7)}
        if trial % 2:
            row |= {(0, 1), (1, 2), (2, 0)}
        ex_new, ex_all = closure.local_closure(row, set())
        # existing = half of the full closure, as a prior batch would have stored
        ex_sorted = sorted(ex_all)
        existing = set(ex_sorted[: len(ex_sorted) // 2])

        want_new, want_all = closure.local_closure(row, existing)
        ra = np.array([a for a, _ in row], np.int64)
        rb = np.array([b for _, b in row], np.int64)
        ea = np.array([a for a, _ in existing], np.int64)
        eb = np.array([b for _, b in existing], np.int64)
        na, nb, aa, ab = closure.local_closure_np(ra, rb, ea, eb)
        assert set(zip(na.tolist(), nb.tolist())) == want_new
        assert set(zip(aa.tolist(), ab.tolist())) == want_all
        # output is (a, b)-sorted and deduped
        packed = list(zip(aa.tolist(), ab.tolist()))
        assert packed == sorted(set(packed))


def test_local_closure_np_empty_inputs():
    e = np.empty(0, np.int64)
    na, nb, aa, ab = closure.local_closure_np(e, e, e, e)
    assert len(na) == len(aa) == 0
    # only self-edges → empty closure
    s = np.array([5, 9], np.int64)
    na, nb, aa, ab = closure.local_closure_np(s, s, e, e)
    assert len(aa) == 0


def test_edges_from_rows_np_matches_local():
    t = osc.parse_osc(OSC_XML, batch_seq=1)
    a, b = edges.edges_from_rows_np(t)
    assert set(zip(a.tolist(), b.tolist())) == edges.edges_from_rows_local(t)


def test_geojson_writer_uri_and_local_parity(tmp_path):
    """S8 sink: local tmp+rename path and the pyarrow-fs URI path (file://) produce
    byte-identical ndjson, for both the string and the Arrow zero-copy writer."""
    import pyarrow as pa
    import numpy as np

    from augdiff_pipeline_ray.sources import geojson as GJ

    lines = ['{"a":1}', '{"b":2}', '{"c":3}']
    feats = pa.array([s.encode() for s in lines], pa.binary())
    order = np.array([2, 0, 1])

    p_local = str(tmp_path / "a" / "local.ndjson")
    n1 = GJ.write_features(p_local, [lines[i] for i in order])
    p_uri = "file://" + str(tmp_path / "b" / "uri.ndjson")
    n2 = GJ.write_features(p_uri, [lines[i] for i in order])
    b_local = open(p_local, "rb").read()
    b_uri = open(tmp_path / "b" / "uri.ndjson", "rb").read()
    assert b_local == b_uri and n1 == n2 == len(b_local)

    p_arrow = str(tmp_path / "c" / "arrow.ndjson")
    n3 = GJ.write_features_arrow(p_arrow, feats, order)
    assert open(p_arrow, "rb").read() == b_local and n3 == n1
    p_arrow_uri = "file://" + str(tmp_path / "d" / "arrow_uri.ndjson")
    GJ.write_features_arrow(p_arrow_uri, feats, order)
    assert open(tmp_path / "d" / "arrow_uri.ndjson", "rb").read() == b_local
    # empty batch still commits a (zero-byte) file — the lineage protocol needs it
    p_empty = str(tmp_path / "e" / "empty.ndjson")
    assert GJ.write_features_arrow(p_empty, feats.slice(0, 0), np.array([], np.int64)) == 0
    assert open(p_empty, "rb").read() == b""


def test_local_closure_matches_brute_force_random_graphs():
    """Property: on ANY random directed graph (cycles, self-loops, dense and sparse),
    the incremental fixpoint equals brute-force transitive reachability, and feeding
    its own output back as the existing-edge set is a no-op (idempotence)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(seed=st.integers(0, 10_000), n=st.integers(2, 12), m=st.integers(1, 40))
    @settings(max_examples=80, deadline=None)
    def check(seed, n, m):
        import numpy as np

        rng = np.random.default_rng(seed)
        e = set(zip(rng.integers(0, n, m).tolist(), rng.integers(0, n, m).tolist()))
        new, alle = closure.local_closure(e, set())
        assert alle == closure.brute_force_closure(e)
        assert new == alle
        new2, alle2 = closure.local_closure(e, alle)
        assert alle2 == alle and new2 == set()

    check()


def test_osc_roundtrip_randomized_adversarial(tmp_path):
    """Generative write→parse round-trip: random mixed-type rows with
    adversarial attribute/tag strings (entities, quotes, '>', unicode) must
    survive the OSC writer and the byte-scan parser (or its ET fallback)
    byte-for-byte at the value level."""
    import numpy as np

    rng = np.random.default_rng(42)
    weird = ["plain", "a&b", 'x"y', "it's", "<tagish>", "a>b", "ünïcode™",
             "sp ace", "", "amp;&lt;"]
    rows = []
    ts0 = 1_700_000_000_000
    for i in range(60):
        etype = ["node", "way", "relation"][int(rng.integers(3))]
        action = ["create", "modify", "delete"][int(rng.integers(3))]
        lat = float(np.round(rng.uniform(-85, 85), 7))
        lon = float(np.round(rng.uniform(-179, 179), 7))
        r = {
            "id": int(rng.integers(1, 1 << 40)),
            "type": etype,
            "tags": ([] if action == "delete" else
                     [(weird[int(rng.integers(len(weird) - 1)) + 1],
                       weird[int(rng.integers(len(weird)))])
                      for _ in range(int(rng.integers(3)))]),
            "lat": lat if etype == "node" and action != "delete" else None,
            "lon": lon if etype == "node" and action != "delete" else None,
            "nds": ([{"ref": int(rng.integers(1, 1000))} for _ in range(int(rng.integers(4)))]
                    if etype == "way" and action != "delete" else []),
            "members": ([{"type": "node", "ref": int(rng.integers(1, 1000)),
                          "role": weird[int(rng.integers(len(weird)))]}
                         for _ in range(int(rng.integers(3)))]
                        if etype == "relation" and action != "delete" else []),
            "changeset": None if action == "delete" else int(rng.integers(1, 10**6)),
            "timestamp": ts0 + int(rng.integers(0, 10**9)),
            "uid": None if action == "delete" else int(rng.integers(1, 10**5)),
            "user": None if action == "delete" else weird[int(rng.integers(len(weird)))],
            "version": int(rng.integers(1, 50)),
            "visible": action != "delete",
            "action": action,
        }
        rows.append(r)
    import pyarrow as pa

    from augdiff_pipeline_ray import keys as K2
    from augdiff_pipeline_ray.schemas import CHANGE_SCHEMA

    ids = np.array([r["id"] for r in rows], np.int64)
    types = [r["type"] for r in rows]
    lats = np.array([np.nan if r["lat"] is None else r["lat"] for r in rows])
    lons = np.array([np.nan if r["lon"] is None else r["lon"] for r in rows])
    from augdiff_pipeline_ray import cells as C2

    t = pa.table({
        "p": pa.array(K2.partition_number_typed(ids, types)),
        "cell": pa.array(C2.cell_of(lats, lons)),
        "id": pa.array(ids),
        "type": pa.array(types, pa.string()),
        "tags": pa.array([r["tags"] for r in rows], CHANGE_SCHEMA.field("tags").type),
        "lat": pa.array([r["lat"] for r in rows], pa.float64()),
        "lon": pa.array([r["lon"] for r in rows], pa.float64()),
        "nds": pa.array([r["nds"] for r in rows], CHANGE_SCHEMA.field("nds").type),
        "members": pa.array([r["members"] for r in rows], CHANGE_SCHEMA.field("members").type),
        "changeset": pa.array([r["changeset"] for r in rows], pa.int64()),
        "timestamp": pa.array([r["timestamp"] for r in rows], pa.timestamp("ms")),
        "uid": pa.array([r["uid"] for r in rows], pa.int64()),
        "user": pa.array([r["user"] for r in rows], pa.string()),
        "version": pa.array([r["version"] for r in rows], pa.int64()),
        "visible": pa.array([r["visible"] for r in rows], pa.bool_()),
        "batch_seq": pa.array([5] * len(rows), pa.int64()),
        "action": pa.array([r["action"] for r in rows], pa.string()),
    })
    p = str(tmp_path / "rand.osc")
    osc.write_osc(t, p)
    back = osc.read_osc_file(p, batch_seq=5)
    a, b = t.to_pylist(), back.to_pylist()
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        for k in ("id", "type", "changeset", "timestamp", "uid", "user",
                  "version", "visible", "action", "nds", "members"):
            assert ra[k] == rb[k], (k, ra, rb)
        assert dict(ra["tags"]) == dict(rb["tags"])
        for k in ("lat", "lon"):
            va, vb = ra[k], rb[k]
            assert (va is None) == (vb is None)
            if va is not None:
                assert abs(va - vb) < 5e-8  # %.7f writer quantization
