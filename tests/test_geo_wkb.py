"""MySQL GEOMETRY cells: OGC WKB <-> GeoJSON-with-srid strings
(functions/geo.py; reference rendering
MySqlEventDeserializer.java:175-205) and the binlog cell codec path."""

import json
import struct

import pytest
from hypothesis import given, settings, strategies as st

from source_flink_cdc_3_5_0_spark.functions.geo import (
    geojson_to_mysql_geometry, mysql_geometry_to_geojson, wkb_to_geojson)

# the classic WKB known answer: POINT(1 2), NDR (little-endian)
WKB_POINT_1_2 = bytes.fromhex(
    "0101000000" "000000000000F03F" "0000000000000040")


def test_point_known_answer():
    doc = json.loads(wkb_to_geojson(WKB_POINT_1_2, srid=4326))
    assert doc == {"type": "Point", "coordinates": [1.0, 2.0],
                   "srid": 4326}


def test_big_endian_point():
    xdr = bytes.fromhex("0000000001"
                        "3FF0000000000000" "4000000000000000")
    assert json.loads(wkb_to_geojson(xdr))["coordinates"] == [1.0, 2.0]


def test_mysql_value_roundtrip_all_types():
    docs = [
        {"type": "Point", "coordinates": [3.5, -7.25], "srid": 0},
        {"type": "LineString", "coordinates": [[0, 0], [1, 1], [2, 0.5]],
         "srid": 4326},
        {"type": "Polygon", "coordinates": [
            [[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]],
            [[1, 1], [2, 1], [2, 2], [1, 2], [1, 1]]], "srid": 0},
        {"type": "MultiPoint", "coordinates": [[1, 2], [3, 4]], "srid": 7},
        {"type": "MultiLineString",
         "coordinates": [[[0, 0], [1, 1]], [[2, 2], [3, 3]]], "srid": 0},
        {"type": "MultiPolygon", "coordinates": [
            [[[0, 0], [1, 0], [1, 1], [0, 0]]],
            [[[5, 5], [6, 5], [6, 6], [5, 5]]]], "srid": 0},
        {"type": "GeometryCollection", "geometries": [
            {"type": "Point", "coordinates": [9.0, 9.0]},
            {"type": "LineString", "coordinates": [[0, 0], [1, 2]]}],
         "srid": 4326},
    ]
    for doc in docs:
        payload = geojson_to_mysql_geometry(doc)
        back = json.loads(mysql_geometry_to_geojson(payload))
        want = json.loads(json.dumps(
            {**{k: doc[k] for k in ("type",)},
             **({"geometries": doc["geometries"]} if "geometries" in doc
                else {"coordinates": doc["coordinates"]}),
             "srid": doc["srid"]}))
        # coordinates re-read as floats
        assert back["type"] == want["type"]
        assert back["srid"] == want["srid"]
        def normf(x):
            if isinstance(x, list):
                return [normf(i) for i in x]
            if isinstance(x, dict):
                return {k: normf(v) for k, v in x.items()}
            return float(x) if isinstance(x, (int, float)) else x
        assert normf(back) == normf(want)


def test_corrupt_wkb_raises():
    with pytest.raises(ValueError, match="byte-order"):
        wkb_to_geojson(b"\x02\x01\x00\x00\x00" + b"\x00" * 16)
    with pytest.raises(ValueError, match="geometry type"):
        wkb_to_geojson(b"\x01\x63\x00\x00\x00")
    with pytest.raises(ValueError, match="truncated"):
        wkb_to_geojson(WKB_POINT_1_2[:10])
    with pytest.raises(ValueError, match="trailing"):
        wkb_to_geojson(WKB_POINT_1_2 + b"\x00")
    with pytest.raises(ValueError, match="SRID header"):
        mysql_geometry_to_geojson(b"\x01")


coord = st.floats(allow_nan=False, allow_infinity=False, width=64,
                  min_value=-1e6, max_value=1e6)
points = st.lists(st.tuples(coord, coord), min_size=1, max_size=6)


@given(st.integers(0, 2**32 - 1), points)
@settings(max_examples=60, deadline=None)
def test_linestring_property_roundtrip(srid, pts):
    doc = {"type": "LineString",
           "coordinates": [[x, y] for x, y in pts], "srid": srid}
    back = json.loads(mysql_geometry_to_geojson(geojson_to_mysql_geometry(doc)))
    assert back["coordinates"] == [[x, y] for x, y in pts]
    assert back["srid"] == srid


def test_binlog_geometry_cell_roundtrip():
    """GEOMETRY through the full binlog wire: TABLE_MAP meta, lenenc cell,
    decode back to the reference's GeoJSON string."""
    from source_flink_cdc_3_5_0_spark.sources.mysql_binlog import (
        MYSQL_TYPE_GEOMETRY, MYSQL_TYPE_LONG, WRITE_ROWS_EVENT,
        BinlogColumn, BinlogTableMap, BinlogWriter, binlog_changes)

    geo = json.dumps({"type": "Point", "coordinates": [12.5, -3.0],
                      "srid": 4326}, separators=(",", ":"))
    tmap = BinlogTableMap(31, "d", "t", (
        BinlogColumn("id", MYSQL_TYPE_LONG, (), False),
        BinlogColumn("g", MYSQL_TYPE_GEOMETRY, (4,))), (0,))
    w = BinlogWriter()
    w.table_map(tmap)
    w.rows(tmap, WRITE_ROWS_EVENT, [dict(id=1, g=geo), dict(id=2, g=None)])
    changes = [c for c in binlog_changes(w.getvalue(), "mysql-bin.000001")
               if c.get("kind") == "change"]
    assert json.loads(changes[0]["after"]["g"]) == json.loads(geo)
    assert changes[1]["after"]["g"] is None
