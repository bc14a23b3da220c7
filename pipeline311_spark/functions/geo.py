"""Geometry functions — EWKT point build/parse and ESRI feature encoding.

The reference's geometry surface is 2D points in EPSG:4326 serialized as
EWKT ``SRID=4326;POINT (x y)`` (common.py:119-128; config.py:5-6), read
back via ``st_astext`` and encoded to ESRI feature JSON
(sync-db2-ago.py:171-246).  SURVEY §2.3 P2/P18/P19.  No geometry UDT is
needed: WKT strings + a {x,y,srid} struct cover the used surface;
polygons/linestrings would bring in Sedona (out of scope — dead
capability in the reference, only exercised for point layers).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SRID = 4326  # config.py:5-6 (IN_SRID == AGO_SRID == 4326 → reprojection is identity)

_POINT_RE = r"POINT \(([-0-9.eE]+) ([-0-9.eE]+)\)"


def point_ewkt_from_xy(lon: Column, lat: Column) -> Column:
    """P2: EWKT point from string/numeric lon/lat columns.

    Exact reference semantics (common.py:119-128): non-numeric or NULL
    input -> NULL; either coordinate == 0 -> NULL (the ``'POINT EMPTY'``
    branch at common.py:124 is unreachable dead code, SURVEY §2.9.5).
    """
    # try_cast: parse failure -> NULL (ANSI-safe; reference catches
    # ValueError/TypeError and leaves shape None, common.py:125-126)
    x = lon.try_cast("double")
    y = lat.try_cast("double")
    return F.when(
        x.isNotNull() & y.isNotNull() & (x != 0) & (y != 0),
        F.concat(
            F.lit(f"SRID={SRID};POINT ("),
            x.cast("string"),
            F.lit(" "),
            y.cast("string"),
            F.lit(")"),
        ),
    )


def parse_point_ewkt(col: Column | str) -> Column:
    """Inverse of P2: EWKT/WKT point string -> struct{x,y,srid}.

    NULL or non-point input -> NULL struct fields (consumers treat that
    as 'empty geometry', mirroring sync-db2-ago.py:177-205).
    """
    c = F.col(col) if isinstance(col, str) else col
    x = F.regexp_extract(c, _POINT_RE, 1)
    y = F.regexp_extract(c, _POINT_RE, 2)
    srid = F.regexp_extract(c, r"SRID=(\d+)", 1)
    return F.struct(
        F.nullif(x, F.lit("")).cast("double").alias("x"),
        F.nullif(y, F.lit("")).cast("double").alias("y"),
        F.coalesce(F.nullif(srid, F.lit("")).cast("int"), F.lit(SRID)).alias("srid"),
    )


def esri_point_feature(shape: Column | str, attrs: list[Column]) -> Column:
    """P18: encode a row as an ESRI feature struct
    ``{attributes:{...}, geometry:{x,y,spatial_reference:{wkid}}}``
    (sync-db2-ago.py:183-246).  Empty geometry -> NaN x/y, matching the
    reference's point-layer empty convention (sync-db2-ago.py:177-188).
    Serialize with ``F.to_json`` at the sink.
    """
    pt = parse_point_ewkt(shape)
    geometry = F.struct(
        F.coalesce(pt["x"], F.lit(float("nan"))).alias("x"),
        F.coalesce(pt["y"], F.lit(float("nan"))).alias("y"),
        F.struct(pt["srid"].alias("wkid")).alias("spatial_reference"),
    )
    return F.struct(F.struct(*attrs).alias("attributes"), geometry.alias("geometry"))


def reproject_identity(x: Column, y: Column, in_srid: int = SRID, out_srid: int = SRID):
    """P19: coordinate reprojection.  For the reference's configured
    4326->4326 this is the identity (sync-db2-ago.py:40-42 hoists a
    pyproj Transformer that never changes anything).  A real CRS change
    would be a pandas UDF wrapping pyproj — gated off because pyproj is
    not a dependency and the capability is unused.
    """
    if in_srid != out_srid:
        raise NotImplementedError(
            "non-identity reprojection requires pyproj (pandas UDF); "
            "reference only ever runs 4326->4326 (config.py:5-6)"
        )
    return x, y
