"""Text normalization functions.

The single genuine Python UDF in the engine: NFKD->ASCII fold
(reference: common.py:135,212 ``unicodedata.normalize('NFKD', s)
.encode('ascii','ignore')``) — Spark has no builtin for Unicode
normalization, so this is an Arrow-batched pandas UDF (SURVEY §7.4).
Everything else here is pure Column expressions.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


@pandas_udf(T.StringType())
def _nfkd_ascii_udf(s: pd.Series) -> pd.Series:
    def fold(v):
        if v is None:
            return None
        return unicodedata.normalize("NFKD", v).encode("ascii", "ignore").decode()

    return s.map(fold, na_action="ignore")


def nfkd_ascii(col: Column | str) -> Column:
    """NFKD-normalize then drop non-ASCII (emoji, accents).

    Reference semantics: common.py:135 (description), :212 (status_notes).
    Arrow-batched; NULL passes through.
    """
    return _nfkd_ascii_udf(F.col(col) if isinstance(col, str) else col)


def strip_edge_chars(col: Column | str, chars: str = "<>'") -> Column:
    """Python ``str.strip("<>'")`` equivalent: remove any run of the given
    characters from both ends (common.py:134,211)."""
    c = F.col(col) if isinstance(col, str) else col
    cls = "[" + "".join("\\" + ch for ch in chars) + "]+"
    return F.regexp_replace(c, f"^{cls}|{cls}$", "")


def ago_sanitize(col: Column | str) -> Column:
    """AGO string sanitizer (SURVEY P13; sync-db2-ago.py:135-152):
    ASCII-fold then delete ``' " < >`` entirely.  NULL passthrough."""
    return F.regexp_replace(nfkd_ascii(col), "['\"<>]", "")
