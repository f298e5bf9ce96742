"""Bolt/PackStream wire-format reader (SURVEY.md §2.1 S1).

The protocol layer is pinned against the public PackStream v2 spec:
marker-exact encodings for every integer width, strings/lists/maps at
tiny/8/16-bit sizes, Node/Relationship/Record structures, and Bolt
chunked framing incl. multi-chunk messages. The distributed reader is
checked for parity with the driver-side cypher-JSON loader on the
reference's movies fixture."""

import json
import pathlib
import struct

import pytest

from prec_spark.pg.bolt import (
    Structure,
    bolt_records_to_pg,
    frame_message,
    iter_messages,
    ps_encode,
    write_bolt_records,
    _dec,
)


def roundtrip(v):
    out, end = _dec(ps_encode(v), 0)
    assert end == len(ps_encode(v))
    return out


@pytest.mark.parametrize(
    "value",
    [
        None, True, False,
        0, -1, -16, 127, -17, -128, 128, 32767, -32768, 2**31 - 1,
        -(2**31), 2**31, 2**63 - 1, -(2**63),
        1.5, -0.0, 3.141592653589793,
        "", "a", "x" * 15, "y" * 16, "z" * 300, "é∂ƒ unicode",
        [], [1, "two", [3.0, None]], list(range(20)),
        {}, {"k": 1}, {f"k{i}": i for i in range(20)},
    ],
)
def test_packstream_value_roundtrip(value):
    assert roundtrip(value) == value


def test_packstream_marker_exactness():
    # spec-pinned first bytes (PackStream v2)
    assert ps_encode(None)[0] == 0xC0
    assert ps_encode(True)[0] == 0xC3
    assert ps_encode(7) == b"\x07"
    assert ps_encode(-16) == b"\xf0"
    assert ps_encode(-17)[0] == 0xC8
    assert ps_encode(200)[0] == 0xC9  # >127 needs int16
    assert ps_encode(2**31)[0] == 0xCB
    assert ps_encode(1.0)[0] == 0xC1
    assert ps_encode("abc")[0] == 0x80 + 3
    assert ps_encode("x" * 16)[0] == 0xD0
    assert ps_encode([1])[0] == 0x90 + 1
    assert ps_encode({"a": 1})[0] == 0xA0 + 1


def test_structure_roundtrip():
    s = Structure(0x4E, [1, ["A"], {"k": "v"}])
    out = roundtrip(s)
    assert isinstance(out, Structure)
    assert out.tag == 0x4E and out.fields == [1, ["A"], {"k": "v"}]


def test_multi_chunk_framing():
    payload = ps_encode("x" * 1000)
    framed = frame_message(payload, max_chunk=64)
    # many chunks, each with a u16 header, terminated by 0x0000
    assert framed.endswith(b"\x00\x00")
    (first_len,) = struct.unpack_from(">H", framed, 0)
    assert first_len == 64
    msgs = list(iter_messages(framed))
    assert msgs == ["x" * 1000]


def test_unterminated_message_raises():
    payload = ps_encode([1, 2, 3])
    framed = frame_message(payload)[:-2]  # strip terminator
    with pytest.raises(ValueError):
        list(iter_messages(framed))


def test_bolt_reader_matches_cypher_loader(spark, tmp_path):
    """Distributed decode of wire-framed movies records == the
    driver-side cypher-JSON loader output (node/edge sets, labels,
    term-encoded properties)."""
    from prec_spark.pg.cypher import cypher_to_pg

    rows = json.loads(
        pathlib.Path("/root/reference/data/movies_cypher_all.json").read_text()
    )
    want_nodes, want_edges = cypher_to_pg(spark, rows)

    triples = [(r["src"], r["edge"], r["dest"]) for r in rows]
    # several files -> several decode tasks (the parallelism unit)
    third = (len(triples) + 2) // 3
    d = tmp_path / "bolt"
    d.mkdir()
    for i in range(3):
        write_bolt_records(
            str(d / f"part-{i}.bolt"), triples[i * third : (i + 1) * third]
        )
    nodes, edges = bolt_records_to_pg(spark, str(d))

    def norm(df):
        return sorted(
            (
                r["node_id"] if "node_id" in df.columns else r["edge_id"],
                tuple(sorted(r.labels)) if "labels" in df.columns else
                (r["src_id"], r["dst_id"], r["label"]),
                tuple(sorted((k, tuple(v)) for k, v in r.properties.items())),
            )
            for r in df.collect()
        )

    assert norm(nodes) == norm(want_nodes)
    assert norm(edges) == norm(want_edges)


@pytest.mark.parametrize(
    "value",
    [
        None, True, 0, -17, 200, 2**31, 1.5, "", "a", "z" * 300,
        [1, "two", [3.0, None]], {"k": 1, "m": {"n": [2]}},
        Structure(0x4E, [1, ["A", "B"], {"k": "v" * 20}]),
    ],
)
def test_skip_advances_exactly_one_value(value):
    """_skip (the repeated-endpoint byte-walk) must land on exactly the
    same offset the full decoder would, for every marker family."""
    from prec_spark.pg.bolt import _skip

    enc = ps_encode(value)
    assert _skip(enc + b"\xc0trailing", 0) == len(enc)


def test_multichunk_record_roundtrips_through_reader(spark, tmp_path):
    """A property too large for one 65535-byte Bolt chunk forces the
    reassembly path; the reader must still recover the exact value."""
    big = "v" * 70000
    src = {"identity": 1, "labels": ["A"], "properties": {"big": big}}
    dst = {"identity": 2, "labels": ["B"], "properties": {}}
    e = {"identity": 5, "start": 1, "end": 2, "type": "R", "properties": {}}
    p = tmp_path / "big.bolt"
    write_bolt_records(str(p), [(src, e, dst)])
    nodes, edges = bolt_records_to_pg(spark, str(p))
    got = {r["node_id"]: r["properties"] for r in nodes.collect()}
    assert got["node:1"]["big"][0] == f'"{big}"'
    assert edges.count() == 1


def test_repeated_elements_dedup_map_side(spark, tmp_path):
    """The same (src, edge, dest) record streamed twice — as a server
    re-matching the pattern would — must still yield one row per
    element identity."""
    a = {"identity": 1, "labels": ["A"], "properties": {"p": "x"}}
    b = {"identity": 2, "labels": ["B"], "properties": {}}
    e = {"identity": 9, "start": 1, "end": 2, "type": "R", "properties": {}}
    p = tmp_path / "dup.bolt"
    write_bolt_records(str(p), [(a, e, b), (a, e, b), (b, e, a)])
    nodes, edges = bolt_records_to_pg(spark, str(p))
    assert nodes.count() == 2
    assert edges.count() == 1


def test_packed_writer_bytes_identical(tmp_path):
    """The fixture fast path (cached node bytes spliced after
    RECORD_HEADER_3) must produce byte-identical output to the
    structure-walking write_bolt_records."""
    from prec_spark.pg.bolt import (
        NODE_TAG,
        RECORD_HEADER_3,
        REL_TAG,
        Structure,
        frame_message,
        ps_encode,
    )

    nodes = {
        "a": {"identity": 0, "labels": ["L1", "L2"], "properties": {"p": "x", "n": 7}},
        "b": {"identity": 1, "labels": ["L3"], "properties": {"long": "y" * 300}},
    }
    edges = [
        {"identity": 0, "start": 0, "end": 1, "type": "REL", "properties": {}},
        {"identity": 1, "start": 1, "end": 0, "type": "OTHER", "properties": {}},
    ]
    slow = tmp_path / "slow.bolt"
    write_bolt_records(
        str(slow),
        [(nodes["a"], edges[0], nodes["b"]), (nodes["b"], edges[1], nodes["a"])],
    )

    node_bytes = {
        k: ps_encode(Structure(NODE_TAG, [n["identity"], n["labels"], n["properties"]]))
        for k, n in nodes.items()
    }
    fast = bytearray()
    for src, e, dst in [("a", edges[0], "b"), ("b", edges[1], "a")]:
        rel = ps_encode(
            Structure(
                REL_TAG,
                [e["identity"], e["start"], e["end"], e["type"], e["properties"]],
            )
        )
        fast += frame_message(RECORD_HEADER_3 + node_bytes[src] + rel + node_bytes[dst])
    assert bytes(fast) == slow.read_bytes()
