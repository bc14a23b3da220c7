"""A recording, EXECUTING fake of the ``delta.tables.DeltaTable``
builder API — just enough surface for operators/merge_backends.py's
DeltaMergeBackend, so the adapter's clause chain and tie-break
semantics are contract-asserted in this container (delta-spark is not
installable here; the live test in test_merge_backends.py still runs
wherever it is).

Faithfulness rules (mirroring documented Delta MERGE semantics):

* ``whenMatchedUpdateAll(condition)`` — matched target rows are
  replaced by the source row iff the condition holds; otherwise kept.
* ``whenNotMatchedInsertAll()`` — unmatched source rows insert.
* Unmatched target rows always survive.
* Multiple source rows matching ONE target row raise (Delta's
  DELTA_MULTIPLE_SOURCE_ROW_MATCHING_TARGET_ROW_IN_MERGE) — the fake
  must not be more forgiving than the real engine.
* Conditions are interpreted, not pattern-matched away: only the two
  shapes the backend emits (``t.`k` = u.`k``, ``u.`v` >= t.`v```) are
  accepted; anything else raises so a changed clause can't silently
  pass.

State lives in a per-test in-memory store (``reset()`` between tests):
path -> list of row dicts.
"""

from __future__ import annotations

import re

_STORES: dict[str, list[dict]] = {}
CALLS: list[tuple] = []


def reset() -> None:
    _STORES.clear()
    CALLS.clear()


def seed(path: str, df) -> None:
    """Create the 'Delta table' at path from a DataFrame (stands in for
    the first-batch ``df.write.format('delta').save(path)``, which the
    fake cannot intercept without patching DataFrameWriter)."""
    _STORES[path] = [r.asDict() for r in df.collect()]


def stored(path: str) -> list[dict]:
    return list(_STORES[path])


class _MergeBuilder:
    def __init__(self, table: "DeltaTable", source_df, cond: str):
        self._table = table
        self._source = source_df
        self._cond = cond
        self._matched_cond: str | None = None
        self._matched_update_all = False
        self._not_matched_insert_all = False
        CALLS.append(("merge", cond))

    def whenMatchedUpdateAll(self, condition: str | None = None) -> "_MergeBuilder":
        self._matched_update_all = True
        self._matched_cond = condition
        CALLS.append(("whenMatchedUpdateAll", condition))
        return self

    def whenNotMatchedInsertAll(self, condition: str | None = None) -> "_MergeBuilder":
        if condition is not None:
            raise NotImplementedError("fake supports unconditional insert-all only")
        self._not_matched_insert_all = True
        CALLS.append(("whenNotMatchedInsertAll", None))
        return self

    def execute(self) -> None:
        CALLS.append(("execute",))
        m = re.fullmatch(r"t\.`(\w+)` = u\.`(\w+)`", self._cond)
        if not m or m.group(1) != m.group(2):
            raise ValueError(f"fake cannot interpret merge condition {self._cond!r}")
        key = m.group(1)
        if self._matched_cond is None:
            version = None
        else:
            vm = re.fullmatch(r"u\.`(\w+)` >= t\.`(\w+)`", self._matched_cond)
            if not vm or vm.group(1) != vm.group(2):
                raise ValueError(
                    f"fake cannot interpret matched condition {self._matched_cond!r}"
                )
            version = vm.group(1)

        target_rows = _STORES[self._table.path]
        src_rows = [r.asDict() for r in self._source.collect()]
        src_keys = [r[key] for r in src_rows]
        if len(src_keys) != len(set(src_keys)):
            raise ValueError(
                "DELTA_MULTIPLE_SOURCE_ROW_MATCHING_TARGET_ROW_IN_MERGE: "
                "multiple source rows share a merge key"
            )
        by_key = {r[key]: dict(r) for r in target_rows}
        for s in src_rows:
            k = s[key]
            if k in by_key:
                if self._matched_update_all and (
                    version is None or s[version] >= by_key[k][version]
                ):
                    by_key[k] = dict(s)
            elif self._not_matched_insert_all:
                by_key[k] = dict(s)
        _STORES[self._table.path] = list(by_key.values())


class _Aliased:
    def __init__(self, table: "DeltaTable", alias: str):
        self._table = table
        self._alias = alias

    def merge(self, source_df, cond: str) -> _MergeBuilder:
        return _MergeBuilder(self._table, source_df, cond)


class DeltaTable:
    def __init__(self, path: str):
        self.path = path

    @classmethod
    def isDeltaTable(cls, spark, path: str) -> bool:
        CALLS.append(("isDeltaTable", path))
        return path in _STORES

    @classmethod
    def forPath(cls, spark, path: str) -> "DeltaTable":
        CALLS.append(("forPath", path))
        if path not in _STORES:
            raise ValueError(f"{path} is not a (fake) Delta table")
        return cls(path)

    def alias(self, name: str) -> _Aliased:
        CALLS.append(("alias", name))
        return _Aliased(self, name)
