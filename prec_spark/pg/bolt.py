"""Bolt / PackStream reader (S1 in SURVEY.md §2.1).

The reference's Neo4j scan drives a live Bolt session and consumes the
RECORD stream of ``match (src)-[edge]->(dest) return src, edge, dest``
(/root/reference/src/prec-0/from-cypher.js:8-49), deduping nodes and
edges by identity. A live server cannot exist in this sandbox, but the
Bolt WIRE FORMAT is fully public, so the protocol layer is implemented
for real:

* PackStream v2 values — null, boolean, all integer widths, float64,
  string, list, map — and structures: Node (tag 0x4E: id, labels,
  properties[, element_id]), Relationship (tag 0x52: id, start, end,
  type, properties[, element_ids]), Record (tag 0x71: fields).
* Bolt message framing — messages split into <=65535-byte chunks, each
  with a big-endian u16 length header, terminated by 0x0000.

``bolt_records_to_pg`` reads dump files of framed RECORD messages (the
exact bytes a Bolt server streams for the reference's query, minus the
session handshake) DISTRIBUTED: one executor task per file via the
``binaryFile`` source + mapInPandas decode (Arrow batches), then a
distributed identity dedup — the only shuffle, on the (small) distinct
element ids. ``write_bolt_records`` is the matching encoder, used by
tests to synthesize wire-faithful fixtures and as a sink.

Value conversion mirrors the reference's transformProperty
(from-cypher.js:49-60): strings stay strings, Bolt integers/floats
become numbers, lists recurse — then the shared ``_encode_props``
produces the canonical term-encoded PG property map.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .apoc import _encode_props

NODE_TAG = 0x4E
REL_TAG = 0x52
RECORD_TAG = 0x71

#: Pre-baked header of a RECORD whose single field is a 3-item list —
#: 0xB1 (struct, 1 field), the RECORD tag, 0x93 (tiny list of 3). Lets
#: callers splice pre-encoded Node/Relationship bytes into records
#: without re-walking the value tree (fixture writers cache each node's
#: encoding once across its incident edges).
RECORD_HEADER_3 = bytes((0xB1, RECORD_TAG, 0x93))


@dataclass
class Structure:
    tag: int
    fields: list


# ----------------------------------------------------------------- encode

def ps_encode(value) -> bytes:
    """PackStream-encode one value (spec: Bolt PackStream v2)."""
    out = bytearray()
    _enc(value, out)
    return bytes(out)


def _enc(v, out: bytearray) -> None:
    if v is None:
        out.append(0xC0)
    elif isinstance(v, bool):
        out.append(0xC3 if v else 0xC2)
    elif isinstance(v, int):
        if -16 <= v <= 127:
            out += struct.pack(">b", v)
        elif -0x80 <= v <= 0x7F:
            out.append(0xC8)
            out += struct.pack(">b", v)
        elif -0x8000 <= v <= 0x7FFF:
            out.append(0xC9)
            out += struct.pack(">h", v)
        elif -0x80000000 <= v <= 0x7FFFFFFF:
            out.append(0xCA)
            out += struct.pack(">i", v)
        else:
            out.append(0xCB)
            out += struct.pack(">q", v)
    elif isinstance(v, float):
        out.append(0xC1)
        out += struct.pack(">d", v)
    elif isinstance(v, str):
        b = v.encode("utf-8")
        _enc_sized(len(b), 0x80, (0xD0, 0xD1, 0xD2), out)
        out += b
    elif isinstance(v, (list, tuple)):
        _enc_sized(len(v), 0x90, (0xD4, 0xD5, 0xD6), out)
        for item in v:
            _enc(item, out)
    elif isinstance(v, dict):
        _enc_sized(len(v), 0xA0, (0xD8, 0xD9, 0xDA), out)
        for k, item in v.items():
            _enc(str(k), out)
            _enc(item, out)
    elif isinstance(v, Structure):
        if len(v.fields) > 15:
            raise ValueError("structure arity > 15")
        out.append(0xB0 + len(v.fields))
        out.append(v.tag)
        for f in v.fields:
            _enc(f, out)
    else:
        raise TypeError(f"cannot PackStream-encode {type(v).__name__}")


def _enc_sized(n: int, tiny: int, markers: tuple, out: bytearray) -> None:
    if n <= 15:
        out.append(tiny + n)
    elif n <= 0xFF:
        out.append(markers[0])
        out.append(n)
    elif n <= 0xFFFF:
        out.append(markers[1])
        out += struct.pack(">H", n)
    else:
        out.append(markers[2])
        out += struct.pack(">I", n)


def frame_message(payload: bytes, max_chunk: int = 0xFFFF) -> bytes:
    """Bolt chunked framing: u16-length chunks + 0x0000 terminator."""
    out = bytearray()
    for i in range(0, len(payload), max_chunk) or [0]:
        chunk = payload[i : i + max_chunk]
        out += struct.pack(">H", len(chunk))
        out += chunk
    out += b"\x00\x00"
    return bytes(out)


# ----------------------------------------------------------------- decode

def _dec(buf: bytes, pos: int):
    m = buf[pos]
    pos += 1
    if m == 0xC0:
        return None, pos
    if m == 0xC2:
        return False, pos
    if m == 0xC3:
        return True, pos
    if m <= 0x7F or m >= 0xF0:
        return struct.unpack_from(">b", buf, pos - 1)[0], pos
    if m == 0xC8:
        return struct.unpack_from(">b", buf, pos)[0], pos + 1
    if m == 0xC9:
        return struct.unpack_from(">h", buf, pos)[0], pos + 2
    if m == 0xCA:
        return struct.unpack_from(">i", buf, pos)[0], pos + 4
    if m == 0xCB:
        return struct.unpack_from(">q", buf, pos)[0], pos + 8
    if m == 0xC1:
        return struct.unpack_from(">d", buf, pos)[0], pos + 8
    if 0x80 <= m <= 0x8F or m in (0xD0, 0xD1, 0xD2):
        n, pos = _dec_size(buf, pos, m, 0x80, (0xD0, 0xD1, 0xD2))
        return buf[pos : pos + n].decode("utf-8"), pos + n
    if 0x90 <= m <= 0x9F or m in (0xD4, 0xD5, 0xD6):
        n, pos = _dec_size(buf, pos, m, 0x90, (0xD4, 0xD5, 0xD6))
        items = []
        for _ in range(n):
            item, pos = _dec(buf, pos)
            items.append(item)
        return items, pos
    if 0xA0 <= m <= 0xAF or m in (0xD8, 0xD9, 0xDA):
        n, pos = _dec_size(buf, pos, m, 0xA0, (0xD8, 0xD9, 0xDA))
        d = {}
        for _ in range(n):
            k, pos = _dec(buf, pos)
            v, pos = _dec(buf, pos)
            d[k] = v
        return d, pos
    if 0xB0 <= m <= 0xBF:
        n = m - 0xB0
        tag = buf[pos]
        pos += 1
        fields = []
        for _ in range(n):
            f, pos = _dec(buf, pos)
            fields.append(f)
        return Structure(tag, fields), pos
    raise ValueError(f"unknown PackStream marker 0x{m:02X} at {pos - 1}")


def _dec_size(buf: bytes, pos: int, m: int, tiny: int, markers: tuple):
    if markers[0] != m and markers[1] != m and markers[2] != m:
        return m - tiny, pos
    if m == markers[0]:
        return buf[pos], pos + 1
    if m == markers[1]:
        return struct.unpack_from(">H", buf, pos)[0], pos + 2
    return struct.unpack_from(">I", buf, pos)[0], pos + 4


def _skip(buf: bytes, pos: int) -> int:
    """Advance past one PackStream value WITHOUT materializing it.

    The decode hot path calls this for values it will discard — the
    labels/properties of a node whose identity was already seen in this
    partition (nodes repeat once per incident record on the wire) — so
    repeated endpoints cost a byte-walk, not UTF-8 decodes and dict
    builds."""
    m = buf[pos]
    pos += 1
    if m <= 0x7F or m >= 0xF0 or m in (0xC0, 0xC2, 0xC3):
        return pos
    if m == 0xC8:
        return pos + 1
    if m == 0xC9:
        return pos + 2
    if m == 0xCA:
        return pos + 4
    if m == 0xCB or m == 0xC1:
        return pos + 8
    if 0x80 <= m <= 0x8F:
        return pos + (m - 0x80)
    if m == 0xD0:
        return pos + 1 + buf[pos]
    if m == 0xD1:
        return pos + 2 + struct.unpack_from(">H", buf, pos)[0]
    if m == 0xD2:
        return pos + 4 + struct.unpack_from(">I", buf, pos)[0]
    if 0x90 <= m <= 0x9F:
        n = m - 0x90
    elif m == 0xD4:
        n = buf[pos]
        pos += 1
    elif m == 0xD5:
        n = struct.unpack_from(">H", buf, pos)[0]
        pos += 2
    elif m == 0xD6:
        n = struct.unpack_from(">I", buf, pos)[0]
        pos += 4
    elif 0xA0 <= m <= 0xAF:
        n = 2 * (m - 0xA0)
    elif m == 0xD8:
        n = 2 * buf[pos]
        pos += 1
    elif m == 0xD9:
        n = 2 * struct.unpack_from(">H", buf, pos)[0]
        pos += 2
    elif m == 0xDA:
        n = 2 * struct.unpack_from(">I", buf, pos)[0]
        pos += 4
    elif 0xB0 <= m <= 0xBF:
        n = m - 0xB0
        pos += 1  # tag byte
    else:
        raise ValueError(f"unknown PackStream marker 0x{m:02X} at {pos - 1}")
    for _ in range(n):
        pos = _skip(buf, pos)
    return pos


def iter_messages(data: bytes) -> Iterator:
    """De-chunk a Bolt stream and decode each message."""
    pos = 0
    payload = bytearray()
    while pos + 2 <= len(data):
        (n,) = struct.unpack_from(">H", data, pos)
        pos += 2
        if n == 0:
            if payload:
                value, end = _dec(bytes(payload), 0)
                if end != len(payload):
                    raise ValueError(
                        f"trailing bytes in Bolt message: {len(payload) - end}"
                    )
                yield value
                payload = bytearray()
            continue
        payload += data[pos : pos + n]
        pos += n
    if payload:
        raise ValueError("unterminated Bolt message (missing 0x0000)")


# ------------------------------------------------------------- PG loading

def write_bolt_records(path: str, rows: list[tuple[dict, dict, dict]]) -> None:
    """Encode (src, edge, dest) dicts — the cypher-JSON row shape — as
    framed Bolt RECORD messages. Test-fixture writer and sink."""
    def node(n) -> Structure:
        return Structure(
            NODE_TAG,
            [int(n["identity"]), list(n.get("labels") or []), n.get("properties") or {}],
        )

    def rel(e) -> Structure:
        return Structure(
            REL_TAG,
            [
                int(e["identity"]),
                int(e["start"]),
                int(e["end"]),
                e["type"],
                e.get("properties") or {},
            ],
        )

    with open(path, "wb") as f:
        for src, edge, dest in rows:
            record = Structure(RECORD_TAG, [[node(src), rel(edge), node(dest)]])
            f.write(frame_message(ps_encode(record)))


_FLAT_SCHEMA = (
    "kind STRING, identity LONG, labels ARRAY<STRING>, "
    "start LONG, end LONG, rel_type STRING, "
    "properties MAP<STRING, ARRAY<STRING>>"
)


def _consume_value(buf, pos, seen_nodes, seen_edges, emit):
    """Decode one value of a RECORD's field list directly from the wire
    bytes. Node/Relationship structures whose identity was already seen
    in this partition are SKIPPED by a byte-walk (no string decode, no
    dict build); anything that is not a graph element is skipped too
    (the reference only consumes src/edge/dest, from-cypher.js:31-47)."""
    m = buf[pos]
    if 0xB0 <= m <= 0xBF:
        nf = m - 0xB0
        tag = buf[pos + 1]
        p = pos + 2
        if tag == NODE_TAG and nf >= 3:
            ident, p = _dec(buf, p)
            if ident in seen_nodes:
                for _ in range(nf - 1):
                    p = _skip(buf, p)
            else:
                seen_nodes.add(ident)
                labels, p = _dec(buf, p)
                props, p = _dec(buf, p)
                for _ in range(nf - 3):
                    p = _skip(buf, p)  # v5 element_id etc.
                emit("node", ident, sorted(labels), None, None, None, props)
            return p
        if tag == REL_TAG and nf >= 5:
            ident, p = _dec(buf, p)
            if ident in seen_edges:
                for _ in range(nf - 1):
                    p = _skip(buf, p)
            else:
                seen_edges.add(ident)
                start, p = _dec(buf, p)
                end, p = _dec(buf, p)
                rtype, p = _dec(buf, p)
                props, p = _dec(buf, p)
                for _ in range(nf - 5):
                    p = _skip(buf, p)
                emit("edge", ident, None, start, end, rtype, props)
            return p
    return _skip(buf, pos)


def _handle_message(buf, pos, end, seen_nodes, seen_edges, emit):
    """Decode one de-chunked Bolt message in place (no payload copy).

    Fast path: the standard RECORD-of-a-list header (0xB1 0x71 + list
    marker) is recognized byte-wise and its items stream through
    ``_consume_value`` — no Structure/list allocation for the envelope.
    Anything else (SUCCESS metadata, unusual record shapes) falls back
    to the generic decoder."""
    m = buf[pos]
    if m == 0xB1 and buf[pos + 1] == RECORD_TAG:
        lm = buf[pos + 2]
        p = pos + 3
        cnt = -1
        if 0x90 <= lm <= 0x9F:
            cnt = lm - 0x90
        elif lm == 0xD4:
            cnt = buf[p]
            p += 1
        elif lm == 0xD5:
            cnt = struct.unpack_from(">H", buf, p)[0]
            p += 2
        elif lm == 0xD6:
            cnt = struct.unpack_from(">I", buf, p)[0]
            p += 4
        if cnt >= 0:
            for _ in range(cnt):
                p = _consume_value(buf, p, seen_nodes, seen_edges, emit)
            if p != end:
                raise ValueError(f"trailing bytes in Bolt message: {end - p}")
            return
    value, p = _dec(buf, pos)
    if p != end:
        raise ValueError(f"trailing bytes in Bolt message: {end - p}")
    if isinstance(value, Structure) and value.tag == RECORD_TAG:
        for v in value.fields[0]:
            if not isinstance(v, Structure):
                continue
            if v.tag == NODE_TAG:
                ident, labels, props = v.fields[:3]
                if ident not in seen_nodes:
                    seen_nodes.add(ident)
                    emit("node", ident, sorted(labels), None, None, None, props)
            elif v.tag == REL_TAG:
                ident, start, end_, rtype, props = v.fields[:5]
                if ident not in seen_edges:
                    seen_edges.add(ident)
                    emit("edge", ident, None, start, end_, rtype, props)


def _decode_partition(batches):
    """mapInPandas worker: decode each file's framed RECORD stream into
    flat node/edge rows with term-encoded properties.

    Elements repeat on the wire (a node once per incident record), so
    the worker dedups nodes AND edges by identity WITHIN the partition
    (map-side combine): the global dropDuplicates shuffle then moves
    only each partition's distinct elements, and repeated endpoints are
    byte-skipped without ever being decoded. Single-chunk messages —
    the overwhelmingly common case — are decoded IN PLACE from the
    file's byte buffer; only messages that actually span chunks are
    reassembled."""
    import pandas as pd

    seen_nodes: set = set()
    seen_edges: set = set()
    for pdf in batches:
        out = {
            "kind": [], "identity": [], "labels": [],
            "start": [], "end": [], "rel_type": [], "properties": [],
        }

        def emit(kind, ident, labels, start, end, rtype, props):
            out["kind"].append(kind)
            out["identity"].append(ident)
            out["labels"].append(labels)
            out["start"].append(start)
            out["end"].append(end)
            out["rel_type"].append(rtype)
            out["properties"].append(_encode_props(props))

        for content in pdf["content"]:
            data = bytes(content)
            ln = len(data)
            pos = 0
            payload = None
            while pos + 2 <= ln:
                n = (data[pos] << 8) | data[pos + 1]
                pos += 2
                if n == 0:
                    if payload is not None:
                        b = bytes(payload)
                        _handle_message(b, 0, len(b), seen_nodes, seen_edges, emit)
                        payload = None
                    continue
                if (
                    payload is None
                    and pos + n + 2 <= ln
                    and data[pos + n] == 0
                    and data[pos + n + 1] == 0
                ):
                    # complete single-chunk message: decode in place
                    _handle_message(
                        data, pos, pos + n, seen_nodes, seen_edges, emit
                    )
                    pos += n + 2
                    continue
                if payload is None:
                    payload = bytearray()
                payload += data[pos : pos + n]
                pos += n
            if payload:
                raise ValueError("unterminated Bolt message (missing 0x0000)")
        if out["kind"]:
            yield pd.DataFrame(out)


def bolt_records_to_pg(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """(nodes, edges) from a directory/glob of Bolt RECORD dump files.

    One decode task per file (binaryFile source); the identity dedup
    (every node appears once per incident record, from-cypher.js:37-40)
    is the only shuffle. File-level parallelism is the scale unit, as
    with any record-dump format."""
    raw = spark.read.format("binaryFile").load(path).select("content")
    flat = raw.mapInPandas(_decode_partition, _FLAT_SCHEMA)
    nodes = (
        flat.filter(F.col("kind") == "node")
        .dropDuplicates(["identity"])
        .select(
            F.concat(F.lit("node:"), F.col("identity").cast("string")).alias(
                "node_id"
            ),
            "labels",
            "properties",
        )
    )
    empty_props = F.map_from_arrays(
        F.array().cast("array<string>"), F.array().cast("array<array<string>>")
    )
    edges = (
        flat.filter(F.col("kind") == "edge")
        .dropDuplicates(["identity"])
        .select(
            F.concat(F.lit("edge:"), F.col("identity").cast("string")).alias(
                "edge_id"
            ),
            F.concat(F.lit("node:"), F.col("start").cast("string")).alias(
                "src_id"
            ),
            F.concat(F.lit("node:"), F.col("end").cast("string")).alias("dst_id"),
            F.col("rel_type").alias("label"),
            F.coalesce("properties", empty_props).alias("properties"),
        )
    )
    # align column types with the driver-side loaders' schema
    return (
        nodes.select(
            F.col("node_id").cast("string"),
            F.col("labels").cast("array<string>"),
            F.col("properties"),
        ),
        edges,
    )
