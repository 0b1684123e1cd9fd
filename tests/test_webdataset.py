"""WebDataset tar-shard sink/source roundtrip (sources/webdataset.py)."""

from __future__ import annotations

import glob
import json
import tarfile

import ray.data as rd

from theoremkb_ray.sources.webdataset import (
    read_webdataset,
    write_webdataset,
)
from theoremkb_ray.stages.multimodal import synth_real_media_table


def test_webdataset_roundtrip_and_determinism(tmp_path):
    tbl = synth_real_media_table(24, seed=5)
    out = str(tmp_path / "wds")
    summary = write_webdataset(
        rd.from_arrow(tbl).repartition(4), out, num_shards=4
    )
    assert summary["rows"].sum() == 24
    assert len(glob.glob(f"{out}/shard_*.tar")) <= 4
    man = json.load(open(f"{out}/_wds_manifest.json"))
    assert man["num_shards"] == 4

    back = read_webdataset(out).to_pandas().set_index("key")
    assert len(back) == 24
    want = {
        r["media_id"]: r["payload"] for r in tbl.to_pylist()
    }
    for k, payload in want.items():
        assert bytes(back.loc[k, "payload"]) == payload
        meta = json.loads(back.loc[k, "meta_json"])
        assert meta["media_id"] == k and "kind" in meta

    # byte-deterministic shards: rewrite -> identical tar bytes
    out2 = str(tmp_path / "wds2")
    write_webdataset(
        rd.from_arrow(tbl).repartition(7), out2, num_shards=4
    )
    for p in glob.glob(f"{out}/shard_*.tar"):
        p2 = f"{out2}/{p.split('/')[-1]}"
        assert open(p, "rb").read() == open(p2, "rb").read()

    # tar members pair <key>.payload with <key>.json
    with tarfile.open(glob.glob(f"{out}/shard_*.tar")[0]) as tar:
        names = tar.getnames()
    stems = {n.rsplit(".", 1)[0] for n in names}
    for s in stems:
        assert f"{s}.payload" in names and f"{s}.json" in names


def test_cli_wds_export(tmp_path):
    import json as _json

    import pyarrow.parquet as pq

    from theoremkb_ray.__main__ import main

    tbl = synth_real_media_table(12, seed=2)
    src = str(tmp_path / "media.parquet")
    pq.write_table(tbl, src)
    out = str(tmp_path / "shards")
    rc = main(["wds-export", src, out, "--shards", "3"])
    assert rc == 0
    assert len(glob.glob(f"{out}/shard_*.tar")) <= 3
    man = _json.load(open(f"{out}/_wds_manifest.json"))
    assert sum(s["rows"] for s in man["shards"]) == 12
