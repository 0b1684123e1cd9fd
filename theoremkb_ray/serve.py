"""Read-only HTTP serving layer over a materialized triple store.

The reference ships a falcon REST server exposing annotation classes,
papers and layers backed by its SQLite database (reference:
Styling/src/server.py:403-412). This engine has no serving database
by design (SURVEY.md S9) — the store IS the sorted,
repo-hash-partitioned parquet the sink wrote. The server re-expresses
the reference's read surface directly on top of it:

- ``GET /classes`` / ``GET /classes/<name>`` — the annotation-class
  registry (server.py:31-38 analog);
- ``GET /subject/<entity-id>`` — all triples for one subject. The
  partition is a PURE FUNCTION of the subject (hash(repo) % P, salt
  from ``_store_meta.json``), so a point lookup reads exactly ONE
  partition file with a parquet predicate — no scan, no index, no
  database, O(partition) regardless of store size;
- ``GET /document/<doc-id>`` — prefix lookup (same single-partition
  property: a doc's entities share its repo);
- ``GET /stats`` / ``GET /partitions`` — manifest roll-up.

One surface IS mutable, matching the reference server's layer CRUD
(Styling/src/server.py POST/DELETE routes): annotation-layer METADATA
(name / class / training flag / tag dict) lives in a ``_layers.json``
sidecar (state/layers.py) behind ``GET/POST/DELETE /layers[/<id>]``.
Box-geometry editing stays out of scope by design — in a batch engine
the correction cycle is "edit gold, re-run extraction", not row-level
mutation of the immutable sorted parquet.

Multi-node note: the server is stateless over shared storage — any
number of replicas can serve the same store directory (single-writer
contract for the layer sidecar).
"""

from __future__ import annotations

import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import unquote

import numpy as np
import pyarrow.compute as pc
import pyarrow.parquet as pq

from .functions.hashing import hash_strings, splitmix64
from .sources.sinks import subject_repo
from .state.manifest import read_manifests


def load_store_meta(store_dir: str) -> dict:
    path = os.path.join(store_dir, "_store_meta.json")
    with open(path) as f:
        return json.load(f)


def subject_partition(subject: str, meta: dict) -> int:
    """The one partition holding a subject's triples (mirrors
    sinks.add_partition_column exactly, including salting)."""
    P = int(meta["num_partitions"])
    repo = str(subject_repo(np.array([subject], dtype=object))[0])
    salt_repos = meta.get("salt_repos") or {}
    if repo in salt_repos:
        base = int(hash_strings([repo])[0] % np.uint64(P))
        factor = int(salt_repos[repo])
        salt = int(
            splitmix64(hash_strings([subject]))[0] % np.uint64(factor)
        )
        return (base + salt) % P
    return int(hash_strings([repo])[0] % np.uint64(P))


def partition_files(store_dir: str, part: int) -> list:
    """A logical partition's files across the base segment and any
    delta_NNN segments (pipelines/delta.py) — all segments share the
    partition function, so a point lookup reads O(segments) files."""
    import glob as _glob

    rel = os.path.join(f"part={part:05d}", "data.parquet")
    paths = [os.path.join(store_dir, rel)]
    paths += sorted(
        _glob.glob(os.path.join(store_dir, "delta_*", rel))
    )
    return [p for p in paths if os.path.exists(p)]


def lookup_subject(store_dir: str, subject: str, meta: dict | None = None):
    """Point lookup: one partition file per segment, one predicate."""
    meta = meta or load_store_meta(store_dir)
    part = subject_partition(subject, meta)
    out = []
    for path in partition_files(store_dir, part):
        tbl = pq.read_table(path, filters=[("subject", "=", subject)])
        out.extend(tbl.to_pylist())
    return out


def lookup_document(store_dir: str, doc_id: str, meta: dict | None = None):
    """All triples whose subject is the doc or one of its entities
    (``doc`` / ``doc#Entity N``). Salted repos spread a doc's entities
    over the salt range, so the prefix scan reads those partitions."""
    meta = meta or load_store_meta(store_dir)
    P = int(meta["num_partitions"])
    repo = str(subject_repo(np.array([doc_id], dtype=object))[0])
    base = int(hash_strings([repo])[0] % np.uint64(P))
    factor = int((meta.get("salt_repos") or {}).get(repo, 1))
    parts = {(base + s) % P for s in range(factor)}
    out = []
    for part in sorted(parts):
        for path in partition_files(store_dir, part):
            tbl = pq.read_table(path)
            keep = pc.or_(
                pc.equal(tbl["subject"], doc_id),
                pc.starts_with(tbl["subject"], doc_id + "#"),
            )
            out.extend(tbl.filter(keep).to_pylist())
    return out


def store_stats(store_dir: str) -> dict:
    manifests = read_manifests(store_dir)
    return {
        "num_partitions_written": len(manifests),
        "total_rows": sum(m["rows"] for m in manifests),
        "lineage": (manifests[0].get("lineage") if manifests else None),
    }


class _Handler(BaseHTTPRequestHandler):
    server_version = "theoremkb_ray/1"

    def log_message(self, *args) -> None:  # quiet
        pass

    def _json(self, code: int, payload) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self) -> None:  # noqa: N802 (http.server API)
        store = self.server.store_dir  # type: ignore[attr-defined]
        meta = self.server.meta  # type: ignore[attr-defined]
        path = unquote(self.path)
        try:
            if path == "/classes":
                from .classes import list_annotation_classes

                self._json(200, list_annotation_classes())
            elif path.startswith("/classes/"):
                from .classes import get_annotation_class

                name = path[len("/classes/") :]
                try:
                    c = get_annotation_class(name)
                except KeyError:
                    self._json(404, {"error": f"no class {name!r}"})
                    return
                self._json(
                    200,
                    {
                        "name": c.name,
                        "labels": list(c.labels),
                        "parents": [
                            {"name": p.name, "labels": list(p.labels)}
                            for p in c.parents
                        ],
                    },
                )
            elif path.startswith("/subject/"):
                sub = path[len("/subject/") :]
                self._json(200, lookup_subject(store, sub, meta))
            elif path.startswith("/document/"):
                doc = path[len("/document/") :]
                self._json(200, lookup_document(store, doc, meta))
            elif path == "/stats":
                self._json(200, store_stats(store))
            elif path == "/partitions":
                self._json(200, read_manifests(store))
            elif path == "/layers":
                self._json(200, self._layers().list())
            elif path.startswith("/layers/"):
                try:
                    self._json(
                        200, self._layers().get(path[len("/layers/") :])
                    )
                except KeyError as e:
                    self._json(404, {"error": str(e)})
            else:
                self._json(404, {"error": f"no route {path!r}"})
        except Exception as e:  # pragma: no cover - defensive
            self._json(500, {"error": str(e)})

    # ---- layer-metadata CRUD (reference server.py POST/DELETE layer
    # routes; geometry editing is out of scope — see state/layers.py)
    def _layers(self):
        from .state.layers import LayerRegistry

        return LayerRegistry(self.server.store_dir)  # type: ignore[attr-defined]

    def _body(self) -> dict:
        n = int(self.headers.get("Content-Length") or 0)
        return json.loads(self.rfile.read(n) or b"{}")

    def do_POST(self) -> None:  # noqa: N802
        path = unquote(self.path)
        try:
            if path == "/layers":
                b = self._body()
                row = self._layers().create(
                    b["name"],
                    b["class"],
                    training=b.get("training", False),
                    tags=b.get("tags"),
                )
                self._json(201, row)
            elif path.startswith("/layers/"):
                lid = path[len("/layers/") :]
                try:
                    row = self._layers().update(lid, **self._body())
                except KeyError as e:
                    self._json(404, {"error": str(e)})
                    return
                self._json(200, row)
            else:
                self._json(404, {"error": f"no route {path!r}"})
        except (KeyError, ValueError) as e:
            self._json(400, {"error": str(e)})
        except Exception as e:  # pragma: no cover - defensive
            self._json(500, {"error": str(e)})

    def do_DELETE(self) -> None:  # noqa: N802
        path = unquote(self.path)
        try:
            if path.startswith("/layers/"):
                try:
                    self._layers().delete(path[len("/layers/") :])
                except KeyError as e:
                    self._json(404, {"error": str(e)})
                    return
                self._json(200, {"deleted": path[len("/layers/") :]})
            else:
                self._json(404, {"error": f"no route {path!r}"})
        except Exception as e:  # pragma: no cover - defensive
            self._json(500, {"error": str(e)})


class TripleStoreServer:
    """``with TripleStoreServer(store_dir) as url: ...`` or
    ``start()`` / ``stop()``; port 0 picks a free port."""

    def __init__(
        self, store_dir: str, host: str = "127.0.0.1", port: int = 0
    ) -> None:
        self.store_dir = store_dir
        self._httpd = ThreadingHTTPServer((host, port), _Handler)
        self._httpd.store_dir = store_dir  # type: ignore[attr-defined]
        self._httpd.meta = load_store_meta(store_dir)  # type: ignore[attr-defined]
        self._thread: threading.Thread | None = None

    @property
    def url(self) -> str:
        h, p = self._httpd.server_address[:2]
        return f"http://{h}:{p}"

    def start(self) -> "TripleStoreServer":
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread:
            self._thread.join(timeout=5)

    def __enter__(self) -> str:
        self.start()
        return self.url

    def __exit__(self, *exc) -> None:
        self.stop()
