"""External-service enrichment: a rate-limited, retrying, dead-letter
actor-pool stage for network side services.

The reference enriches bibliographies by calling a live GROBID HTTP
service per citation with ad-hoc requests and no retry/rate discipline
(reference: Styling/tools/references/get_links.py:22-50 the
``process_citation`` POST, :105-162 the resolution loop). At corpus
scale that shape needs to be a first-class stage with an explicit
contract:

- **actor pool**: one transport (HTTP session / client) per actor,
  built once in ``__init__`` — never per batch;
- **rate limit**: a per-actor token interval (``rate_per_actor``
  calls/sec) so ``concurrency x rate_per_actor`` bounds the fleet's
  aggregate request rate against the service;
- **retry**: exponential backoff with deterministic jitter, up to
  ``max_retries`` per service call;
- **poison-row quarantine**: a request batch that keeps failing is
  re-tried row-by-row so one poison row cannot dead-letter its
  neighbours; rows that still fail are emitted with
  ``_enrich_ok=False`` and the error string instead of aborting the
  job (the ingest ``on_error="quarantine"`` contract,
  stages/ingest.py);
- **at-least-once semantics**: a retried call may reach the service
  more than once — enrichment requests must be idempotent on the
  service side (GROBID lookups are). The OUTPUT is exactly-once: each
  input row appears exactly once, enriched or dead-lettered.

No network exists in the test sandbox, so the transport is an injected
callable; ``tests/test_enrich.py`` drives the stage with flaky and
poison mock services.

Transport contract: ``transport_factory() -> transport``;
``transport(rows: list[dict]) -> list[dict]`` returns one dict of
enrichment columns per input row (aligned by index; missing keys
become nulls). Raising signals a (retryable) service failure.
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa

#: columns appended to every enriched batch
OK_COL = "_enrich_ok"
ERR_COL = "_enrich_err"


class ServiceEnricher:
    """Actor-pool callable for ``map_batches``.

    Parameters
    ----------
    transport_factory : zero-arg callable building the service client
        (one per actor — a requests.Session / socket pool analog).
    fields : list of (name, pyarrow type) enrichment columns the
        service fills. Declared up front so every output block has an
        identical schema, success or failure.
    request_rows : rows per service call (the service's batch size;
        1 = per-row calls like the reference's per-citation POSTs).
    rate_per_actor : max service calls per second per actor.
    max_retries : attempts per call before isolation / dead-letter.
    backoff_base_s : first backoff sleep; doubles per retry, with a
        deterministic +-25% jitter keyed on the attempt counter (no
        wall-clock randomness — reproducible schedules).
    clock, sleep : injectable time sources (tests).
    """

    def __init__(
        self,
        transport_factory,
        fields: list[tuple[str, pa.DataType]],
        request_rows: int = 32,
        rate_per_actor: float = 8.0,
        max_retries: int = 3,
        backoff_base_s: float = 0.05,
        clock=time.monotonic,
        sleep=time.sleep,
    ) -> None:
        self.transport = transport_factory()
        self.fields = fields
        self.request_rows = max(1, int(request_rows))
        self.min_interval = (
            1.0 / rate_per_actor if rate_per_actor > 0 else 0.0
        )
        self.max_retries = max(1, int(max_retries))
        self.backoff_base_s = backoff_base_s
        self.clock, self.sleep = clock, sleep
        self._next_ok_at = 0.0
        self._attempt_no = 0

    # ------------------------------------------------------ internals

    def _throttle(self) -> None:
        now = self.clock()
        if now < self._next_ok_at:
            self.sleep(self._next_ok_at - now)
            now = self._next_ok_at
        self._next_ok_at = now + self.min_interval

    def _call_with_retry(self, rows: list[dict]) -> list[dict]:
        last = None
        for attempt in range(self.max_retries):
            self._throttle()
            self._attempt_no += 1
            try:
                out = self.transport(rows)
                if len(out) != len(rows):
                    raise RuntimeError(
                        f"transport returned {len(out)} rows for "
                        f"{len(rows)} inputs"
                    )
                return out
            except Exception as e:  # noqa: BLE001 — service boundary
                last = e
                if attempt + 1 < self.max_retries:
                    # deterministic jitter: splitmix-style mix of the
                    # attempt counter -> +-25% of the doubled base
                    h = (self._attempt_no * 0x9E3779B97F4A7C15) & (
                        (1 << 64) - 1
                    )
                    jitter = 0.75 + 0.5 * ((h >> 32) / 2**32)
                    self.sleep(
                        self.backoff_base_s * (2**attempt) * jitter
                    )
        raise last  # type: ignore[misc]

    # ------------------------------------------------------- __call__

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        in_rows = batch.to_pylist()
        out_rows: list[dict | None] = [None] * n
        errs: list[str | None] = [None] * n
        for s in range(0, n, self.request_rows):
            chunk = in_rows[s : s + self.request_rows]
            try:
                res = self._call_with_retry(chunk)
                out_rows[s : s + len(res)] = res
            except Exception:
                # the chunk keeps failing: isolate per row so one
                # poison row can't dead-letter its neighbours
                for j, row in enumerate(chunk):
                    try:
                        out_rows[s + j] = self._call_with_retry([row])[0]
                    except Exception as e:  # noqa: BLE001
                        errs[s + j] = f"{type(e).__name__}: {e}"
        cols = {name: batch[name] for name in batch.column_names}
        for name, typ in self.fields:
            cols[name] = pa.array(
                [
                    (r or {}).get(name)
                    for r in out_rows
                ],
                typ,
            )
        cols[OK_COL] = pa.array(
            [e is None for e in errs], pa.bool_()
        )
        cols[ERR_COL] = pa.array(errs, pa.string())
        return pa.table(cols)


def enrich_with_service(
    ds,
    transport_factory,
    fields: list[tuple[str, pa.DataType]],
    batch_size: int = 256,
    concurrency=(1, 4),
    **kwargs,
):
    """``ds`` -> enriched Dataset (+ ``_enrich_ok`` / ``_enrich_err``).

    ``concurrency x rate_per_actor`` is the fleet-wide request-rate
    cap against the external service; size both to the service's
    capacity, not the cluster's."""
    return ds.map_batches(
        ServiceEnricher,
        fn_constructor_args=(transport_factory, fields),
        fn_constructor_kwargs=kwargs,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def split_enriched(ds):
    """(ok Dataset sans bookkeeping cols, dead-letter Dataset with the
    error column) — the quarantine fork. Both stream; neither
    materializes."""
    import pyarrow.compute as pc

    ok = ds.map_batches(
        lambda b: b.filter(b[OK_COL]).drop_columns([OK_COL, ERR_COL]),
        batch_format="pyarrow",
    )
    dead = ds.map_batches(
        lambda b: b.filter(pc.invert(b[OK_COL])).drop_columns([OK_COL]),
        batch_format="pyarrow",
    )
    return ok, dead


def bibliography_via_service(
    bib_ds,
    transport_factory,
    **kwargs,
):
    """The reference's GROBID bibliography enrichment as a plug-in of
    this stage (Styling/tools/references/get_links.py:105-162): raw
    citation rows (doc_from, tag, raw_title) -> resolved
    (..., doc_to, confidence) plus the quarantine fork. The service
    contract mirrors GROBID's processCitation: one request per
    citation row, idempotent, so at-least-once retries are safe."""
    enriched = enrich_with_service(
        bib_ds,
        transport_factory,
        fields=[("doc_to", pa.string()), ("confidence", pa.float64())],
        request_rows=kwargs.pop("request_rows", 1),
        **kwargs,
    )
    return split_enriched(enriched)
