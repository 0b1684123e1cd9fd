"""Serving layer: point lookups hit exactly one partition, salted
repos resolve, classes/stats routes serve, lookups stay consistent
with the sink's partitioning."""

import json
import shutil
import urllib.error
import urllib.parse
import urllib.request

import pyarrow as pa
import ray.data as rd

from theoremkb_ray.serve import (
    TripleStoreServer,
    lookup_document,
    lookup_subject,
    subject_partition,
)
from theoremkb_ray.sources.sinks import materialize_triples


def _get(url: str):
    try:
        with urllib.request.urlopen(url, timeout=10) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _doc(r: int) -> str:
    return f"org{r}/repo{r}/src/main.tex@{'ab' * 20}"


HOT = "big/hot/src/main.tex@" + "cd" * 20


def _store(tmp: str):
    subs, preds, objs = [], [], []
    for r in range(12):
        doc = _doc(r)
        for t in range(4):
            subs.append(f"{doc}#Theorem {t}")
            preds.append("states")
            objs.append(f"{doc}#stmt{t}")
        subs.append(f"{doc}#Theorem 0")
        preds.append("cites")
        objs.append(f"{_doc(0)}#Theorem 1")
    for t in range(40):  # hot repo to exercise salting
        subs.append(f"{HOT}#Theorem {t}")
        preds.append("states")
        objs.append(f"{HOT}#stmt{t}")
    triples = pa.table(
        {
            "subject": pa.array(subs),
            "predicate": pa.array(preds),
            "object": pa.array(objs),
            "confidence": pa.array([1.0] * len(subs)),
            "provenance": pa.array(["test"] * len(subs)),
        }
    )
    shutil.rmtree(tmp, ignore_errors=True)
    materialize_triples(
        rd.from_arrow(triples),
        tmp,
        num_partitions=8,
        resume=False,
        salt_repos={"big/hot": 3},
    )
    return tmp


def test_point_lookup_and_salted_repo(tmp_path, ray_session):
    store = _store(str(tmp_path / "store"))
    rows = lookup_subject(store, f"{_doc(3)}#Theorem 2")
    assert len(rows) == 1 and rows[0]["object"] == f"{_doc(3)}#stmt2"
    # salted subjects resolve to their exact salted partition
    for t in (0, 7, 33):
        sub = f"{HOT}#Theorem {t}"
        rows = lookup_subject(store, sub)
        assert [r["object"] for r in rows if r["predicate"] == "states"] == [
            f"{HOT}#stmt{t}"
        ], sub
    # document lookup collects entities across the salt range
    doc_rows = lookup_document(store, HOT)
    assert len(doc_rows) == 40
    meta = json.load(open(f"{store}/_store_meta.json"))
    parts = {subject_partition(f"{HOT}#Theorem {t}", meta) for t in range(40)}
    assert len(parts) == 3  # spread over exactly the salt factor


def test_http_routes(tmp_path, ray_session):
    store = _store(str(tmp_path / "store"))
    with TripleStoreServer(store) as url:
        code, classes = _get(f"{url}/classes")
        assert code == 200 and "segmentation" in classes
        code, seg = _get(f"{url}/classes/segmentation")
        assert code == 200 and len(seg["labels"]) > 0
        code, err = _get(f"{url}/classes/nope")
        assert code == 404 and "error" in err
        sub = urllib.parse.quote(f"{_doc(5)}#Theorem 1", safe="")
        code, rows = _get(f"{url}/subject/{sub}")
        assert code == 200
        assert [r["object"] for r in rows] == [f"{_doc(5)}#stmt1"]
        code, stats = _get(f"{url}/stats")
        assert stats["total_rows"] == 100  # 12*(4+1) + 40
        code, parts = _get(f"{url}/partitions")
        assert sum(m["rows"] for m in parts) == 100
        doc = urllib.parse.quote(_doc(0), safe="")
        code, doc_rows = _get(f"{url}/document/{doc}")
        assert code == 200 and len(doc_rows) == 5


def _req(url: str, method: str, payload=None):
    data = json.dumps(payload).encode() if payload is not None else None
    req = urllib.request.Request(url, data=data, method=method)
    if data:
        req.add_header("Content-Type", "application/json")
    try:
        with urllib.request.urlopen(req, timeout=10) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_layer_metadata_crud(tmp_path, ray_session):
    """The reference server's editable layer surface (create/update/
    delete + tag dict), over the JSON sidecar registry."""
    store = _store(str(tmp_path / "store"))
    with TripleStoreServer(store) as url:
        code, empty = _get(f"{url}/layers")
        assert code == 200 and empty == []
        code, row = _req(
            f"{url}/layers",
            "POST",
            {"name": "run-1", "class": "segmentation", "training": True},
        )
        assert code == 201 and row["training"] and row["id"].startswith("ly_")
        lid = row["id"]
        # unknown class rejected
        code, err = _req(f"{url}/layers", "POST", {"name": "x", "class": "nope"})
        assert code == 400
        # update: rename + tag merge + tag delete
        code, row = _req(
            f"{url}/layers/{lid}", "POST",
            {"name": "run-1b", "tags": {"reviewed": True, "note": "a"}},
        )
        assert code == 200 and row["name"] == "run-1b"
        code, row = _req(
            f"{url}/layers/{lid}", "POST", {"tags": {"note": None}}
        )
        assert code == 200 and "note" not in row["tags"]
        code, got = _get(f"{url}/layers/{lid}")
        assert code == 200 and got["tags"] == {"reviewed": True}
        # immutable field rejected
        code, err = _req(f"{url}/layers/{lid}", "POST", {"class": "x"})
        assert code == 400
        # delete + 404 after
        code, _ = _req(f"{url}/layers/{lid}", "DELETE")
        assert code == 200
        code, err = _get(f"{url}/layers/{lid}")
        assert code == 404
        code, err = _req(f"{url}/layers/ly_missing", "DELETE")
        assert code == 404
