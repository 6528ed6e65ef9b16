"""OGC WKB <-> GeoJSON-with-srid strings (MySQL GEOMETRY cell payloads).

Parity target: the reference converts MySQL GEOMETRY columns to STRING as
a GeoJSON-shaped document ``{"type", "coordinates" | "geometries",
"srid"}`` (`flink-cdc-pipeline-connector-mysql/.../source/
MySqlEventDeserializer.java:175-205` — Debezium ships ``{wkb, srid}``,
the deserializer renders GeoJSON via OGCGeometry). This module implements
the same rendering from the PUBLIC OGC 06-103r4 well-known-binary layout:
byte-order flag (0 big-endian / 1 little-endian), uint32 geometry type
(1 Point … 7 GeometryCollection), IEEE-754 doubles; Multi*/collection
children are complete nested WKB values with their own headers.

MySQL stores a GEOMETRY value as ``uint32le SRID + WKB`` (the internal
geometry storage format, public MySQL documentation); the binlog ships it
like a BLOB cell. Key order here is fixed (type, coordinates/geometries,
srid) — the reference writes a Java HashMap through Jackson, so its key
order is unspecified; fixing ours keeps fixtures deterministic.
"""

from __future__ import annotations

import json
import struct

_TYPES = {1: "Point", 2: "LineString", 3: "Polygon", 4: "MultiPoint",
          5: "MultiLineString", 6: "MultiPolygon", 7: "GeometryCollection"}
_CODES = {v: k for k, v in _TYPES.items()}


def _parse_wkb(data: bytes, pos: int) -> tuple[dict, int]:
    if pos + 5 > len(data):
        raise ValueError("truncated WKB header at %d" % pos)
    order = data[pos]
    if order not in (0, 1):
        raise ValueError("bad WKB byte-order flag %d" % order)
    endian = "<" if order == 1 else ">"
    code = struct.unpack_from(endian + "I", data, pos + 1)[0]
    pos += 5
    gtype = _TYPES.get(code)
    if gtype is None:
        raise ValueError("unsupported WKB geometry type %d" % code)

    def u32() -> int:
        nonlocal pos
        v = struct.unpack_from(endian + "I", data, pos)[0]
        pos += 4
        return v

    def point() -> list:
        nonlocal pos
        x, y = struct.unpack_from(endian + "dd", data, pos)
        pos += 16
        return [x, y]

    def ring() -> list:
        return [point() for _ in range(u32())]

    if gtype == "Point":
        return {"type": gtype, "coordinates": point()}, pos
    if gtype == "LineString":
        return {"type": gtype, "coordinates": ring()}, pos
    if gtype == "Polygon":
        return {"type": gtype, "coordinates": [ring() for _ in range(u32())]}, pos
    n = u32()
    if gtype == "GeometryCollection":
        geoms = []
        for _ in range(n):
            g, pos = _parse_wkb(data, pos)
            geoms.append(g)
        return {"type": gtype, "geometries": geoms}, pos
    # Multi*: children are complete WKB values; strip their outer layer
    coords = []
    for _ in range(n):
        g, pos = _parse_wkb(data, pos)
        coords.append(g["coordinates"])
    return {"type": gtype, "coordinates": coords}, pos


def wkb_to_geojson(wkb: bytes, srid: int = 0) -> str:
    """WKB bytes -> the reference's GeoJSON-with-srid string form."""
    try:
        doc, end = _parse_wkb(bytes(wkb), 0)
    except struct.error as e:
        raise ValueError("truncated WKB value: %s" % e) from e
    if end != len(wkb):
        raise ValueError("%d trailing bytes after WKB value"
                         % (len(wkb) - end))
    doc["srid"] = int(srid)
    return json.dumps(doc, separators=(",", ":"))


def mysql_geometry_to_geojson(payload: bytes) -> str:
    """MySQL internal geometry value (uint32le SRID + WKB) -> GeoJSON."""
    if len(payload) < 4:
        raise ValueError("geometry payload shorter than the SRID header")
    srid = struct.unpack_from("<I", payload, 0)[0]
    return wkb_to_geojson(payload[4:], srid)


def _write_wkb(doc: dict, out: bytearray) -> None:
    gtype = doc["type"]
    code = _CODES.get(gtype)
    if code is None:
        raise ValueError("unsupported GeoJSON type %r" % gtype)
    out += b"\x01" + struct.pack("<I", code)  # always little-endian

    def point(c) -> None:
        out.extend(struct.pack("<dd", float(c[0]), float(c[1])))

    if gtype == "Point":
        point(doc["coordinates"])
    elif gtype == "LineString":
        out += struct.pack("<I", len(doc["coordinates"]))
        for c in doc["coordinates"]:
            point(c)
    elif gtype == "Polygon":
        out += struct.pack("<I", len(doc["coordinates"]))
        for r in doc["coordinates"]:
            out += struct.pack("<I", len(r))
            for c in r:
                point(c)
    elif gtype == "GeometryCollection":
        out += struct.pack("<I", len(doc["geometries"]))
        for g in doc["geometries"]:
            _write_wkb(g, out)
    else:  # Multi*: children are complete WKB values
        child = {"MultiPoint": "Point", "MultiLineString": "LineString",
                 "MultiPolygon": "Polygon"}[gtype]
        out += struct.pack("<I", len(doc["coordinates"]))
        for c in doc["coordinates"]:
            _write_wkb({"type": child, "coordinates": c}, out)


def geojson_to_mysql_geometry(geojson: str | dict) -> bytes:
    """GeoJSON(+srid) -> the MySQL internal value (uint32le SRID + WKB,
    little-endian) — the fixture writer's inverse of
    :func:`mysql_geometry_to_geojson`."""
    doc = json.loads(geojson) if isinstance(geojson, str) else geojson
    out = bytearray(struct.pack("<I", int(doc.get("srid", 0))))
    _write_wkb(doc, out)
    return bytes(out)
