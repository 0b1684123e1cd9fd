"""Annotation-layer metadata registry (the reference's editable
AnnotationLayerInfo surface, re-expressed for a batch store).

The reference's falcon server mutates layer rows in SQLite — create /
rename / flag-as-training / delete, plus per-layer tag dicts
(reference: Styling/src/lib/paper/__init__.py:40-127 AnnotationLayerInfo
/ AnnotationLayerTag; Styling/src/server.py POST/DELETE layer routes).
This engine's store is immutable sorted parquet, so the *mutable*
part — layer metadata, NOT box geometry — lives in a JSON sidecar
(``_layers.json``) next to the store, edited atomically
(write-temp + ``os.replace``). Box/geometry editing stays out of
scope by design: annotations are produced by batch extraction runs,
and a correction cycle is "edit gold, re-run the pipeline", not
row-level mutation (COVERAGE.md records this scope line).

Single-writer contract: the registry assumes one coordinating editor
at a time (same as the reference's single SQLite writer); replicas of
the read server see updates on their next read.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from typing import Any

_FILE = "_layers.json"


class LayerRegistry:
    """CRUD over the layer-metadata sidecar of one store directory."""

    def __init__(self, store_dir: str) -> None:
        self.store_dir = store_dir
        self.path = os.path.join(store_dir, _FILE)

    # ------------------------------------------------------------ io
    def _read(self) -> dict[str, dict]:
        if not os.path.exists(self.path):
            return {}
        with open(self.path) as f:
            return json.load(f)

    def _write(self, layers: dict[str, dict]) -> None:
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(layers, f, indent=1, sort_keys=True)
        os.replace(tmp, self.path)

    # ---------------------------------------------------------- CRUD
    def list(self) -> list[dict]:
        return sorted(self._read().values(), key=lambda l: l["id"])

    def get(self, layer_id: str) -> dict:
        layers = self._read()
        if layer_id not in layers:
            raise KeyError(f"no layer {layer_id!r}")
        return layers[layer_id]

    def create(
        self,
        name: str,
        annotation_class: str,
        training: bool = False,
        tags: dict[str, Any] | None = None,
    ) -> dict:
        """New layer row. The id is content-derived (sha1 of
        name+class+creation counter) — deterministic per registry
        history, no uuid/random dependency."""
        from ..classes import get_annotation_class

        get_annotation_class(annotation_class)  # must exist in taxonomy
        layers = self._read()
        raw = f"{name}|{annotation_class}|{len(layers)}"
        lid = "ly_" + hashlib.sha1(raw.encode()).hexdigest()[:12]
        row = {
            "id": lid,
            "name": name,
            "class": annotation_class,
            "training": bool(training),
            "tags": dict(tags or {}),
            "created_at": int(time.time()),
        }
        layers[lid] = row
        self._write(layers)
        return row

    def update(self, layer_id: str, **fields: Any) -> dict:
        """Patch name / training / tags (tags merge; None deletes a
        tag key). Class and id are immutable, like the reference's."""
        layers = self._read()
        if layer_id not in layers:
            raise KeyError(f"no layer {layer_id!r}")
        row = layers[layer_id]
        for k, v in fields.items():
            if k == "name":
                row["name"] = str(v)
            elif k == "training":
                row["training"] = bool(v)
            elif k == "tags":
                for tk, tv in dict(v).items():
                    if tv is None:
                        row["tags"].pop(tk, None)
                    else:
                        row["tags"][tk] = tv
            else:
                raise ValueError(f"immutable or unknown field {k!r}")
        self._write(layers)
        return row

    def delete(self, layer_id: str) -> None:
        layers = self._read()
        if layer_id not in layers:
            raise KeyError(f"no layer {layer_id!r}")
        del layers[layer_id]
        self._write(layers)
