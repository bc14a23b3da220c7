

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
