"""The disk-spool keyed exchange: parity with Ray's native groupby,
enforced storage contract (reconciliation raises instead of silently
under-merging), the multi-node fallback, and adaptive fan-out."""

import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from theoremkb_ray.state import spool
from theoremkb_ray.state.spool import (
    _finalize_spool,
    _split_oversized,
    spool_write_partitioned,
    spooled_group_map,
)


def _make_ds(n=5_000, coarse=8, seed=0, payload=16):
    rng = np.random.default_rng(seed)
    fine = rng.integers(0, 400, n, dtype=np.uint64) * np.uint64(
        0x9E3779B97F4A7C15
    )
    # INCOMPRESSIBLE padding: the byte-cap assertions below must hold
    # under whatever spool compression is configured (a constant pad
    # collapses to nothing under zstd and no partition ever splits)
    pad = [
        rng.bytes(payload).hex()[:payload] for _ in range(n)
    ]
    return rd.from_arrow(
        pa.table(
            {
                "fine": pa.array(fine),
                "k": pa.array((fine % np.uint64(coarse)).astype(np.int64)),
                "v": pa.array(rng.integers(0, 1000, n)),
                "pad": pa.array(pad),
            }
        )
    ).repartition(8)


def _make_group_stats():
    # nested def => cloudpickle serializes by VALUE (test modules are
    # not importable from Ray workers)
    def group_stats(g: pa.Table) -> pa.Table:
        # per-FINE-key aggregate: depends only on fine-key
        # co-location, the invariant the adaptive re-split preserves
        df = g.to_pandas()
        out = (
            df.groupby("fine", as_index=False)
            .agg(n=("v", "size"), s=("v", "sum"))
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    return group_stats


_group_stats = _make_group_stats()


def _collect(ds) -> pd.DataFrame:
    return (
        ds.to_pandas()
        .sort_values("fine")
        .reset_index(drop=True)
        .astype({"fine": "uint64", "n": "int64", "s": "int64"})
    )


def _expected_df(ds) -> pd.DataFrame:
    df = ds.to_pandas()
    out = (
        df.groupby("fine", as_index=False)
        .agg(n=("v", "size"), s=("v", "sum"))
        .sort_values("fine")
        .reset_index(drop=True)
    )
    return out.astype({"fine": "uint64", "n": "int64", "s": "int64"})


def test_spool_matches_native_groupby(ray_session, tmp_path):
    ds = _make_ds()
    got = _collect(
        spooled_group_map(
            ds, "k", _group_stats, spool_dir=str(tmp_path / "sp")
        )
    )
    pd.testing.assert_frame_equal(got, _expected_df(ds))


def test_missing_partition_dir_raises(ray_session, tmp_path):
    base = str(tmp_path / "sp")
    ds = _make_ds(n=2_000)
    keys, expected = spool_write_partitioned(ds, base, "k")
    assert keys and sum(expected.values()) == 2_000
    shutil.rmtree(os.path.join(base, f"k={keys[0]}"))
    with pytest.raises(Exception, match="(?i)spool|shared storage"):
        _finalize_spool(base, "k", keys, expected, _group_stats, "pyarrow")


def test_lost_file_rowcount_raises(ray_session, tmp_path):
    base = str(tmp_path / "sp")
    ds = _make_ds(n=2_000)
    keys, expected = spool_write_partitioned(ds, base, "k")
    # drop ONE feather file from a multi-file partition: the dir still
    # exists, only the recount catches it
    for k in keys:
        d = os.path.join(base, f"k={k}")
        files = [f for f in os.listdir(d) if f.endswith(".feather")]
        if len(files) > 1:
            os.remove(os.path.join(d, files[0]))
            break
    else:
        pytest.skip("no multi-file partition produced")
    # surfaces as RayTaskError wrapping the RuntimeError
    with pytest.raises(Exception, match="reconciliation"):
        _finalize_spool(base, "k", keys, expected, _group_stats, "pyarrow")


def test_multinode_without_shared_scratch_falls_back(
    ray_session, monkeypatch
):
    """>1 alive node + no declared shared scratch => the exchange must
    route through Ray's native groupby (correct on any topology), and
    must not touch the spool write path at all."""
    monkeypatch.delenv(spool.SCRATCH_ENV, raising=False)
    monkeypatch.setattr(spool, "_alive_nodes", lambda: 2)

    def _boom(*a, **k):  # the spool write must NOT run
        raise AssertionError("spool path used despite multi-node guard")

    monkeypatch.setattr(spool, "spool_write_partitioned", _boom)
    ds = _make_ds(n=2_000)
    got = _collect(spooled_group_map(ds, "k", _group_stats))
    pd.testing.assert_frame_equal(got, _expected_df(ds))


def test_multinode_with_declared_scratch_uses_spool(
    ray_session, monkeypatch, tmp_path
):
    """An explicit spool_dir declares the storage contract — the spool
    path stays active even on multi-node."""
    monkeypatch.setattr(spool, "_alive_nodes", lambda: 4)
    ds = _make_ds(n=2_000)
    got = _collect(
        spooled_group_map(
            ds, "k", _group_stats, spool_dir=str(tmp_path / "sp")
        )
    )
    pd.testing.assert_frame_equal(got, _expected_df(ds))


def test_adaptive_fanout_grows_with_volume(ray_session, tmp_path):
    """With a byte cap, bucket count grows with data volume while the
    max per-reduce-task partition stays bounded — the 100x-scale
    guard: no task ever concat-reads 1/coarse of the survivor set."""
    cap = 64 << 10  # 64 KiB — force splitting at test scale

    def run(n, tag):
        base = str(tmp_path / tag)
        ds = _make_ds(n=n, coarse=4, payload=64)
        keys, expected = spool_write_partitioned(ds, base, "k")
        assert len(keys) <= 4
        keys2, expected2 = _split_oversized(
            base, "k", "fine", keys, expected, cap
        )
        assert sum(expected2.values()) == n  # no rows lost in re-split
        sizes = [spool._partition_bytes(base, "k", k) for k in keys2]
        got = _collect(
            _finalize_spool(base, "k", keys2, expected2, _group_stats,
                            "pyarrow")
        )
        pd.testing.assert_frame_equal(got, _expected_df(ds))
        return len(keys2), max(sizes)

    nb_small, max_small = run(3_000, "small")
    nb_big, max_big = run(30_000, "big")
    assert nb_big > nb_small  # fan-out scales with volume...
    # ...while per-task bytes stay flat (files can't be split below
    # one slice, so allow slack over the cap but nowhere near 10x)
    assert max_big < 3 * max(cap, max_small)


def test_fanout_in_spooled_group_map(ray_session, tmp_path):
    """End-to-end: fine_col + tiny cap through the public API."""
    ds = _make_ds(n=20_000, coarse=4, payload=64)
    got = _collect(
        spooled_group_map(
            ds,
            "k",
            _group_stats,
            spool_dir=str(tmp_path / "sp"),
            fine_col="fine",
            max_partition_bytes=32 << 10,
        )
    )
    pd.testing.assert_frame_equal(got, _expected_df(ds))
