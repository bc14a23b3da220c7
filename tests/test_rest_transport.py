"""The S1 connector's HTTP seam (sources/rest_transport.py), driven
through a RECORDING fake transport — the same environment-boundary
treatment as the Delta adapter: SOQL text from pushed DSv2 filters,
query_all_iter-style cursor pagination, and the reference retry
ladder (Retry(total=10, backoff_factor=3) — delete-removed-
tickets.py:24-25) asserted without a network."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql.datasource import EqualTo, GreaterThan, IsNotNull, StringStartsWith

from pipeline311_spark.sources.rest_transport import (
    RetryPolicy,
    TransportError,
    fetch_all,
    soql_query,
    soql_where,
)


def test_soql_text_from_pushed_filters():
    q = soql_query(
        "Case",
        ["CaseNumber", "Status", "LastModifiedDate"],
        [
            GreaterThan(("LastModifiedDate",), dt.datetime(2024, 3, 1, 12, 30)),
            EqualTo(("Status",), "Closed"),
            IsNotNull(("CaseNumber",)),
        ],
    )
    assert q == (
        "SELECT CaseNumber, Status, LastModifiedDate FROM Case "
        "WHERE LastModifiedDate > 2024-03-01T12:30:00Z "
        "AND Status = 'Closed' AND CaseNumber != null"
    )
    # string escaping: quotes/backslashes cannot break out of the literal
    assert soql_where([EqualTo(("s",), "O'Brien \\ co")]) == "s = 'O\\'Brien \\\\ co'"
    # unsupported filter classes must raise, never silently drop
    with pytest.raises(ValueError, match="not expressible"):
        soql_where([StringStartsWith(("s",), "x")])


class _FakeRest:
    """Recording fake: scripted pages keyed by URL, with optional
    per-URL failure counts before success (5xx behavior)."""

    def __init__(self, pages: dict, fail_first: dict | None = None):
        self.pages = pages
        self.fail_left = dict(fail_first or {})
        self.calls: list[tuple[str, dict | None]] = []

    def __call__(self, url: str, params):
        self.calls.append((url, params))
        if self.fail_left.get(url, 0) > 0:
            self.fail_left[url] -= 1
            raise TransportError("503 service unavailable")
        return self.pages[url]


def test_pagination_follows_cursor_in_order():
    fake = _FakeRest(
        {
            "/q": {"records": [{"id": 1}, {"id": 2}], "done": False, "nextRecordsUrl": "/q-2"},
            "/q-2": {"records": [{"id": 3}], "done": False, "nextRecordsUrl": "/q-3"},
            "/q-3": {"records": [{"id": 4}], "done": True},
        }
    )
    got = list(fetch_all(fake, "/q", "SELECT Id FROM Case", sleep=lambda s: None))
    assert [r["id"] for r in got] == [1, 2, 3, 4]
    # the SOQL rides only the FIRST request; cursor URLs are opaque
    assert fake.calls[0] == ("/q", {"q": "SELECT Id FROM Case"})
    assert fake.calls[1:] == [("/q-2", None), ("/q-3", None)]


def test_retry_ladder_matches_reference_schedule():
    """Two 5xx failures then success: sleeps must be the urllib3
    schedule backoff_factor * 2^(attempt-1) = 3, 6 — the reference's
    Retry(backoff_factor=3) — and the page still arrives intact."""
    fake = _FakeRest(
        {"/q": {"records": [{"id": 9}], "done": True}}, fail_first={"/q": 2}
    )
    slept: list[float] = []
    got = list(fetch_all(fake, "/q", "soql", sleep=slept.append))
    assert [r["id"] for r in got] == [9]
    assert slept == [3.0, 6.0]
    assert len(fake.calls) == 3


def test_retry_ladder_exhausts_and_raises():
    fake = _FakeRest({"/q": {"records": []}}, fail_first={"/q": 99})
    slept: list[float] = []
    with pytest.raises(TransportError):
        list(
            fetch_all(
                fake, "/q", "soql",
                retry=RetryPolicy(max_tries=4, backoff_factor=0.5),
                sleep=slept.append,
            )
        )
    assert slept == [0.5, 1.0, 2.0]  # 3 sleeps between 4 tries
    assert len(fake.calls) == 4


def test_mid_pagination_failure_retries_only_that_page():
    fake = _FakeRest(
        {
            "/q": {"records": [{"id": 1}], "done": False, "nextRecordsUrl": "/q-2"},
            "/q-2": {"records": [{"id": 2}], "done": True},
        },
        fail_first={"/q-2": 1},
    )
    slept: list[float] = []
    got = list(fetch_all(fake, "/q", "soql", sleep=slept.append))
    assert [r["id"] for r in got] == [1, 2]
    assert slept == [3.0]
    # the first page was NOT re-fetched (no duplicate records)
    assert [u for u, _ in fake.calls] == ["/q", "/q-2", "/q-2"]


def test_urllib_transport_maps_failures_to_transport_error():
    """Offline: any network failure surfaces as TransportError (so the
    ladder owns policy), never a raw URLError escaping to Spark."""
    from pipeline311_spark.sources.rest_transport import UrllibTransport

    t = UrllibTransport("http://127.0.0.1:1", token="x", timeout_s=0.2)
    with pytest.raises(TransportError):
        t("/services/data/v58.0/query", {"q": "SELECT Id FROM Case"})
