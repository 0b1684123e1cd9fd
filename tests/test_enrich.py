"""External-service enrichment stage (stages/enrich.py): flaky mock
service, at-least-once retries, poison-row quarantine, rate limiting."""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray.data as rd

from theoremkb_ray.stages.enrich import (
    ERR_COL,
    OK_COL,
    ServiceEnricher,
    bibliography_via_service,
    enrich_with_service,
    split_enriched,
)


def _ds(n=20):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([f"d{i}" for i in range(n)]),
                "title": pa.array([f"title {i}" for i in range(n)]),
            }
        )
    )


FIELDS = [("norm", pa.string()), ("score", pa.float64())]

# NOTE: transports handed to Ray actors are defined INSIDE each test:
# cloudpickle serializes test-local closures by VALUE, while a
# module-level function would pickle by reference to this test module,
# which Ray workers cannot import (not on their sys.path).


def _echo_rows(rows):  # only used OUTSIDE Ray (direct calls)
    return [
        {"norm": r["title"].upper(), "score": float(len(r["title"]))}
        for r in rows
    ]


def test_happy_path_enriches_every_row(ray_session):
    def echo(rows):
        return [
            {"norm": r["title"].upper(), "score": float(len(r["title"]))}
            for r in rows
        ]

    out = enrich_with_service(
        _ds(), lambda: echo, FIELDS, concurrency=1
    ).to_pandas()
    assert len(out) == 20
    assert out[OK_COL].all()
    assert (out["norm"] == out["title"].str.upper()).all()


def test_flaky_service_retried_at_least_once(ray_session):
    """Service fails twice then succeeds: every row comes back
    enriched, and the transport demonstrably saw >1 attempt for the
    same payload (at-least-once), while the OUTPUT stays exactly-once."""

    class Flaky:
        def __init__(self):
            self.calls = 0

        def __call__(self, rows):
            self.calls += 1
            if self.calls <= 2:
                raise ConnectionError("transient")
            return _echo_rows(rows)

    enr = ServiceEnricher(
        Flaky,
        FIELDS,
        request_rows=64,
        rate_per_actor=0,
        max_retries=3,
        backoff_base_s=0.0,
        sleep=lambda s: None,
    )
    batch = pa.table({"doc_id": ["a", "b"], "title": ["x", "yy"]})
    out = enr(batch)
    assert out[OK_COL].to_pylist() == [True, True]
    assert enr.transport.calls == 3  # 2 failures + 1 success
    assert out.num_rows == 2  # exactly-once output


def test_poison_row_quarantined_neighbours_survive(ray_session):
    """A row the service can never process dead-letters ALONE — the
    failing chunk is re-tried row-by-row so its neighbours still
    enrich."""

    def poison_transport(rows):
        for r in rows:
            if r["title"] == "title 7":
                raise ValueError("unparseable citation")
        return [
            {"norm": r["title"].upper(), "score": float(len(r["title"]))}
            for r in rows
        ]

    enriched = enrich_with_service(
        _ds(),
        lambda: poison_transport,
        FIELDS,
        concurrency=1,
        max_retries=2,
        backoff_base_s=0.0,
        rate_per_actor=0,
    )
    ok, dead = split_enriched(enriched)
    ok_df, dead_df = ok.to_pandas(), dead.to_pandas()
    assert len(ok_df) == 19 and len(dead_df) == 1
    assert dead_df["doc_id"].iloc[0] == "d7"
    assert "unparseable" in dead_df[ERR_COL].iloc[0]
    assert OK_COL not in ok_df.columns and ERR_COL not in ok_df.columns


def test_rate_limit_enforces_min_interval():
    """With rate_per_actor=10, consecutive calls are spaced >=0.1s on
    the injected clock — the fleet-wide cap is concurrency x rate."""
    t = {"now": 0.0}
    sleeps = []

    def clock():
        return t["now"]

    def sleep(s):
        sleeps.append(s)
        t["now"] += s

    enr = ServiceEnricher(
        lambda: _echo_rows,
        FIELDS,
        request_rows=1,
        rate_per_actor=10.0,
        clock=clock,
        sleep=sleep,
    )
    batch = pa.table(
        {"doc_id": ["a", "b", "c"], "title": ["t1", "t2", "t3"]}
    )
    out = enr(batch)
    assert out[OK_COL].to_pylist() == [True] * 3
    # 3 calls at >=0.1s spacing -> at least 2 throttle sleeps of 0.1
    assert len(sleeps) >= 2
    assert all(abs(s - 0.1) < 1e-9 for s in sleeps)


def test_retry_backoff_doubles_with_jitter():
    slept = []

    class AlwaysDown:
        def __call__(self, rows):
            raise TimeoutError("down")

    enr = ServiceEnricher(
        AlwaysDown,
        FIELDS,
        request_rows=4,
        rate_per_actor=0,
        max_retries=3,
        backoff_base_s=0.1,
        sleep=slept.append,
    )
    out = enr(pa.table({"doc_id": ["a"], "title": ["x"]}))
    assert out[OK_COL].to_pylist() == [False]
    assert "TimeoutError" in out[ERR_COL].to_pylist()[0]
    # chunk pass: 2 backoffs (0.1x, 0.2x); isolation pass: 2 more.
    # every backoff within the +-25% jitter band of its doubled base
    backoffs = [s for s in slept if s > 0]
    assert len(backoffs) == 4
    for base, got in zip([0.1, 0.2, 0.1, 0.2], backoffs):
        assert 0.75 * base <= got <= 1.25 * base


def test_bibliography_via_service_resolves_and_quarantines(ray_session):
    """GROBID-analog integration: per-citation calls, resolved rows
    feed the links shape, poison citations quarantine."""
    bib = rd.from_arrow(
        pa.table(
            {
                "doc_from": pa.array(["p1", "p1", "p2"]),
                "tag": pa.array(["[1]", "[2]", "[1]"]),
                "raw_title": pa.array(
                    ["on graphs", "CORRUPT", "spectral bounds"]
                ),
            }
        )
    )

    def grobid_like(rows):
        out = []
        for r in rows:
            if r["raw_title"] == "CORRUPT":
                raise ValueError("503 unprocessable")
            out.append(
                {
                    "doc_to": "t_" + r["raw_title"].replace(" ", "_"),
                    "confidence": 0.9,
                }
            )
        return out

    ok, dead = bibliography_via_service(
        bib,
        lambda: grobid_like,
        concurrency=1,
        max_retries=2,
        backoff_base_s=0.0,
        rate_per_actor=0,
    )
    ok_df = ok.to_pandas().sort_values(["doc_from", "tag"])
    assert list(ok_df["doc_to"]) == ["t_on_graphs", "t_spectral_bounds"]
    dead_df = dead.to_pandas()
    assert len(dead_df) == 1 and dead_df["tag"].iloc[0] == "[2]"
