"""The 311 cleaning kernel + gold projection, end-to-end, oracle-checked.

A Salesforce-shaped source table is derived *deterministically* from the
driver's ``events`` table (every dirty-value branch of FIXTURES.md is
exercised: ordinal districts, >100 districts, '0' parent ids, zero/junk
coordinates, 'false'/'true'/NULL private flags, unparseable timestamps,
NULL text fields), then run through ``clean_cases`` — the full P1-P12
kernel — and compared against a DuckDB oracle that re-implements the
reference semantics (common.py:112-224) independently in SQL.

The NFKD→ASCII pandas UDF is exercised too: on this ASCII source it is
an identity, which is exactly what makes it oracle-checkable; the
non-ASCII branches are covered by golden-row pytest tests.
"""

from __future__ import annotations


from pyspark.sql import functions as F

from pipeline311_spark.functions.cleaning import clean_cases
from pipeline311_spark.plans.common import fmt_ts, fmt_ts_sql, table
from pipeline311_spark.plans.registry import register
from pipeline311_spark.schemas import SF_CASE_RAW
from pipeline311_spark.ext.hashing import jvm_memo


def _sf_source(spark, sf_dir):
    """events -> a 38-column Salesforce-shaped string table."""
    e = table(spark, sf_dir, "events")
    return e.select(list(_sf_source_cols()))


@jvm_memo(maxsize=1)
def _sf_source_cols():
    """Memoized 38-column synthesis select list (~0.3 s of py4j-bound
    driver time per build; pure unresolved expressions over fixed
    column names)."""
    eid = F.col("event_id")
    uid = F.col("user_id")
    iso = F.concat(F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss"), F.lit("+0000"))
    def _null(name):
        return F.lit(None).cast("string").alias(name)

    # name -> expression; selected below in declared-schema order
    by_name = {
        "CaseNumber": (eid + 1000).cast("string"),
        "Status": F.when(F.col("event_type") == "error", "Closed").otherwise("Open"),
        "Description": F.concat(F.lit("<'evt "), F.col("event_type"), F.lit(" #"), eid.cast("string"), F.lit("'>")),
        "CreatedDate": iso,
        "LastModifiedDate": iso,
        "Sla_date__c": F.when(eid % 7 == 0, F.lit("not a date")).otherwise(iso),
        "ClosedDate": _null("ClosedDate"),
        "Case_Record_Type__c": F.col("event_type"),
        "RecordTypeId": F.lit("012OTHER"),
        "Centerline__Longitude__s": F.when(eid % 10 == 0, F.lit("0"))
        .when(eid % 11 == 0, F.lit("oops"))
        .otherwise((-(F.lit(75) + uid)).cast("double").cast("string")),
        "Centerline__Latitude__s": (F.lit(39) + uid / F.lit(100.0)).cast("double").cast("string"),
        "Centerline_2272x__c": _null("Centerline_2272x__c"),
        "Centerline_2272y__c": _null("Centerline_2272y__c"),
        "Department__c": _null("Department__c"),
        "Street__c": _null("Street__c"),
        "Private_Case__c": F.when(uid % 3 == 0, F.lit("false")).when(uid % 3 == 1, F.lit("true")),
        "SLA__c": _null("SLA__c"),
        "Service_Code__c": _null("Service_Code__c"),
        "ZipCode__c": _null("ZipCode__c"),
        "Media_Url__c": _null("Media_Url__c"),
        "Close_Reason__c": F.concat(F.lit("closed: "), F.col("event_type")),
        "Status_Update__c": F.concat(F.lit("update: "), F.col("props")),
        "Subject": _null("Subject"),
        "Type": _null("Type"),
        "Police_District__c": F.when(eid % 4 == 0, F.concat(F.lit("The "), uid.cast("string"), F.lit("nd")))
        .when(eid % 4 == 1, F.lit("911"))
        .when(eid % 4 == 2, F.lit(None).cast("string"))
        .otherwise((uid % 30).cast("string")),
        "Council_District_No__c": (uid % 120).cast("string"),
        "Pinpoint_Area__c": F.concat(F.lit("  "), F.upper(F.col("event_type")), F.lit(" ")),
        "SAG_Parent_Case_Number__c": F.when(eid % 3 == 0, F.lit("0")).when(eid % 3 == 1, eid.cast("string")),
        "L_I_District__c": _null("L_I_District__c"),
        "Sanitation_District__c": _null("Sanitation_District__c"),
        "Origin": _null("Origin"),
        "Service_Request_Type__c": _null("Service_Request_Type__c"),
        "Id": eid.cast("string"),
        "Model__c": _null("Model__c"),
        "Make__c": _null("Make__c"),
        "Color__c": _null("Color__c"),
        "Body_Style__c": _null("Body_Style__c"),
        "License_Plate__c": _null("License_Plate__c"),
        "License_Plate_State__c": F.expr("repeat('P', CAST(event_id % 40 AS INT))"),
    }
    # conform to the declared raw schema (order + nullability)
    return tuple(by_name[f.name].alias(f.name) for f in SF_CASE_RAW.fields)


# DuckDB CTE mirroring _sf_source, column-for-column.  String
# building uses || (NOT concat): DuckDB's concat ignores NULL inputs
# while Spark's propagates them — the hostile-gate divergence class.
_SRC_CTE = """
src AS (
  SELECT
    CAST(event_id + 1000 AS VARCHAR) AS CaseNumber,
    CASE WHEN event_type = 'error' THEN 'Closed' ELSE 'Open' END AS Status,
    ('<''evt ' || event_type || ' #' || CAST(event_id AS VARCHAR) || '''>') AS Description,
    (strftime(ts, '%Y-%m-%dT%H:%M:%S') || '+0000') AS CreatedDate,
    (strftime(ts, '%Y-%m-%dT%H:%M:%S') || '+0000') AS LastModifiedDate,
    CASE WHEN event_id % 7 = 0 THEN 'not a date'
         ELSE (strftime(ts, '%Y-%m-%dT%H:%M:%S') || '+0000') END AS Sla_date__c,
    CASE WHEN event_id % 10 = 0 THEN '0'
         WHEN event_id % 11 = 0 THEN 'oops'
         ELSE CAST(CAST(-(75 + user_id) AS DOUBLE) AS VARCHAR) END AS lon_s,
    CAST(CAST(39 + user_id / 100.0 AS DOUBLE) AS VARCHAR) AS lat_s,
    CASE WHEN user_id % 3 = 0 THEN 'false' WHEN user_id % 3 = 1 THEN 'true' END AS Private_Case__c,
    ('closed: ' || event_type) AS Close_Reason__c,
    ('update: ' || props) AS Status_Update__c,
    CASE WHEN event_id % 4 = 0 THEN ('The ' || CAST(user_id AS VARCHAR) || 'nd')
         WHEN event_id % 4 = 1 THEN '911'
         WHEN event_id % 4 = 2 THEN NULL
         ELSE CAST(user_id % 30 AS VARCHAR) END AS Police_District__c,
    CAST(user_id % 120 AS VARCHAR) AS Council_District_No__c,
    ('  ' || upper(event_type) || ' ') AS Pinpoint_Area__c,
    CASE WHEN event_id % 3 = 0 THEN '0'
         WHEN event_id % 3 = 1 THEN CAST(event_id AS VARCHAR) END AS SAG_Parent_Case_Number__c,
    repeat('P', CAST(event_id % 40 AS INTEGER)) AS License_Plate_State__c
  FROM events)
"""

# Cleaning-kernel semantics re-implemented independently in SQL
# (reference: common.py:112-224; NFKD is identity on this ASCII source).
_STRIP = "regexp_replace({c}, '^[<>'']+|[<>'']+$', '', 'g')"
_DIGIT = (
    "CASE WHEN regexp_extract({c}, '([0-9]+)', 1) = '' THEN NULL "
    "WHEN CAST(regexp_extract({c}, '([0-9]+)', 1) AS BIGINT) > 100 THEN NULL "
    "ELSE CAST(regexp_extract({c}, '([0-9]+)', 1) AS BIGINT) END"
)
_TS = "try_strptime(substring({c}, 1, 19), '%Y-%m-%dT%H:%M:%S')"

_CLEAN_SQL = f"""
WITH {_SRC_CTE},
cleaned AS (
  SELECT
    CAST(CaseNumber AS BIGINT) AS service_request_id,
    Status AS status,
    coalesce(substring({_STRIP.format(c='Description')}, 1, 250), '') AS description,
    substring({_STRIP.format(c='Description')}, 1, 2000) AS description_full,
    coalesce(substring({_STRIP.format(c="CASE WHEN Status = 'Closed' THEN Close_Reason__c ELSE Status_Update__c END")}, 1, 2000), '') AS status_notes,
    {fmt_ts_sql(_TS.format(c='CreatedDate'))} AS requested_ts,
    {fmt_ts_sql(_TS.format(c='Sla_date__c'))} AS expected_ts,
    CAST({_DIGIT.format(c='Police_District__c')} AS DOUBLE) AS police_district,
    CAST({_DIGIT.format(c='Council_District_No__c')} AS DOUBLE) AS council_district_num,
    lower(trim(Pinpoint_Area__c)) AS pinpoint_area,
    CAST(CASE WHEN SAG_Parent_Case_Number__c = '0' THEN NULL
         ELSE TRY_CAST(SAG_Parent_Case_Number__c AS BIGINT) END AS DOUBLE) AS parent_service_request_id,
    CASE WHEN Private_Case__c = 'false' THEN 0 ELSE 1 END AS private_case,
    substring(License_Plate_State__c, 1, 30) AS vehicle_license_plate_state,
    CASE WHEN TRY_CAST(lon_s AS DOUBLE) IS NOT NULL AND TRY_CAST(lat_s AS DOUBLE) IS NOT NULL
              AND TRY_CAST(lon_s AS DOUBLE) != 0 AND TRY_CAST(lat_s AS DOUBLE) != 0
         THEN concat('SRID=4326;POINT (', CAST(TRY_CAST(lon_s AS DOUBLE) AS VARCHAR), ' ',
                     CAST(TRY_CAST(lat_s AS DOUBLE) AS VARCHAR), ')')
         END AS shape,
    '' AS address
  FROM src)
SELECT * FROM cleaned
"""


@register(
    "pipeline_clean_cases",
    _CLEAN_SQL,
    covers=("P1", "P2", "P3", "P4", "P5", "P6", "P7", "P8", "P9", "P10", "P11", "P12"),
)
def q_clean_cases(spark, sf_dir):
    src = _sf_source(spark, sf_dir)
    out = clean_cases(src)
    return out.select(
        "service_request_id",
        "status",
        "description",
        "description_full",
        "status_notes",
        fmt_ts("requested_datetime").alias("requested_ts"),
        fmt_ts("expected_datetime").alias("expected_ts"),
        # nullable numeric outputs cross the pandas boundary as double on
        # BOTH engines: a nullable BIGINT turns into float64 only when
        # nulls happen to be present at a given SF (data-dependent dtype,
        # round-1 canon hazard) — the explicit cast makes it deterministic
        F.col("police_district").cast("double").alias("police_district"),
        F.col("council_district_num").cast("double").alias("council_district_num"),
        "pinpoint_area",
        F.col("parent_service_request_id").cast("double").alias("parent_service_request_id"),
        "private_case",
        "vehicle_license_plate_state",
        "shape",
        "address",
    )


# ---------------------------------------------------------------------------
# Gold projection (P13/P14/P16: AGO sanitize, null conventions, ts render)
# ---------------------------------------------------------------------------

_GOLD_SQL = f"""
WITH {_SRC_CTE},
cleaned AS (
  SELECT
    CAST(CaseNumber AS BIGINT) AS service_request_id,
    Status AS status,
    substring({_STRIP.format(c='Description')}, 1, 250) AS description,
    {_TS.format(c='CreatedDate')} AS requested_dt
  FROM src)
SELECT service_request_id,
       coalesce(status, '') AS status,
       coalesce(regexp_replace(description, '[''"<>]', '', 'g'), '') AS description,
       coalesce({fmt_ts_sql('requested_dt', micros=False)}, '') AS requested_datetime
FROM cleaned
"""


@register("pipeline_gold_projection", _GOLD_SQL, covers=("P13", "P14", "P16", "P17", "K4"))
def q_gold(spark, sf_dir):
    from pipeline311_spark.functions.text import ago_sanitize

    src = _sf_source(spark, sf_dir)
    out = clean_cases(src)
    # P13 sanitize, P14 NULL->'' for strings / ''->NULL handled by
    # coalesce at the edge, P16 timestamp->string, P17 lowercase keys.
    return out.select(
        "service_request_id",
        F.coalesce("status", F.lit("")).alias("status"),
        F.coalesce(ago_sanitize("description"), F.lit("")).alias("description"),
        F.coalesce(fmt_ts("requested_datetime", micros=False), F.lit("")).alias("requested_datetime"),
    )
