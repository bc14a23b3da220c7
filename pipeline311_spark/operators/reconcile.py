"""Deletion reconciliation (SURVEY §3.3; J3/K8).

Reference: delete-removed-tickets.py — full id scan, 1000-id chunked
SOQL existence probes, python set-minus, then 4 SQL statements
(clear prior tombstones for those ids, archive, delete from raw, delete
from viewer).  Engine: one anti-join + three derived DataFrames.  No
chunking, no sleeps, no driver-side id sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from pipeline311_spark.operators.joins import anti_join, semi_join


def deleted_keys(ours: DataFrame, source: DataFrame, key: str) -> DataFrame:
    """J3: ids we hold that the source no longer has
    (delete-removed-tickets.py:138-142)."""
    return ours.select(key).distinct().join(source.select(key).distinct(), key, "left_anti")


def reconcile_deletes(
    raw: DataFrame,
    viewer: DataFrame,
    tombstones: DataFrame,
    source_ids: DataFrame,
    key: str,
) -> dict[str, DataFrame]:
    """Full reconciliation: returns the new state of every affected
    table (delete-removed-tickets.py:153-179).

    * ``deleted``     — keys to remove (anti-join J3)
    * ``tombstones``  — prior tombstones for other keys + archived rows
                        (K8: delete-then-insert of the full raw rows)
    * ``raw`` / ``viewer`` — targets rewritten without the deleted keys
    """
    dead = deleted_keys(raw, source_ids, key)
    archived = semi_join(raw, dead, key, broadcast_right=True)
    kept_tombstones = anti_join(tombstones, dead, key, broadcast_right=True)
    return {
        "deleted": dead,
        "tombstones": kept_tombstones.unionByName(archived, allowMissingColumns=True),
        "raw": anti_join(raw, dead, key, broadcast_right=True),
        "viewer": anti_join(viewer, dead, key, broadcast_right=True),
    }
