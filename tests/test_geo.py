

def test_multipoint_both_wkt_spellings(spark):
    """MULTIPOINT parses in both WKT spellings (bare and parenthesized)
    and encodes the ESRI points JSON; empty/NULL -> {"points": []}."""
    from pipeline311_spark.functions.geo import (
        esri_multipoint_geometry_json,
        parse_wkt_multipoint,
    )

    df = spark.createDataFrame(
        [
            (1, "MULTIPOINT (10.5 40.25, 40.5 30.25)"),
            (2, "MULTIPOINT ((10.5 40.25), (40.5 30.25))"),
            (3, ""),
            (4, None),
        ],
        "id long, wkt string",
    )
    rows = {
        r["id"]: (r["pts"], r["js"])
        for r in df.select(
            "id",
            parse_wkt_multipoint("wkt").alias("pts"),
            esri_multipoint_geometry_json("wkt").alias("js"),
        ).collect()
    }
    want_pts = [[10.5, 40.25], [40.5, 30.25]]
    want_js = '{"points":[[10.5,40.25],[40.5,30.25]],"spatial_reference":{"wkid":4326}}'
    assert rows[1] == (want_pts, want_js)
    assert rows[2] == (want_pts, want_js)  # both spellings identical
    empty = '{"points":[],"spatial_reference":{"wkid":4326}}'
    assert rows[3] == ([], empty) and rows[4] == ([], empty)


def test_wkt_parsers_accept_no_space_spelling(spark):
    """PostGIS ST_AsText emits 'POINT(1 2)' with no space before the
    paren (GEOS/Shapely emit one); a rigid single-space regex silently
    parsed the PostGIS spelling as empty geometry."""
    from pipeline311_spark.functions.geo import (
        parse_point_ewkt,
        parse_wkt_multipoint,
        parse_wkt_path,
    )

    df = spark.createDataFrame(
        [
            (1, "SRID=4326;POINT(-75.16 39.95)", "LINESTRING(0 0, 1 1)",
             "MULTIPOINT(10 40, 40 30)"),
        ],
        "id long, pt string, ln string, mp string",
    )
    r = df.select(
        parse_point_ewkt("pt").alias("p"),
        parse_wkt_path("ln").alias("path"),
        parse_wkt_multipoint("mp").alias("pts"),
    ).first()
    assert (r["p"]["x"], r["p"]["y"], r["p"]["srid"]) == (-75.16, 39.95, 4326)
    assert r["path"] == [[0.0, 0.0], [1.0, 1.0]]
    assert r["pts"] == [[10.0, 40.0], [40.0, 30.0]]
