"""Join strategy equivalence: broadcast vs distributed shuffle paths."""

import os

import pandas as pd
import pyarrow as pa
import ray.data as rd

SF_DIR = "/root/testdata/sf0.001"

import pytest  # noqa: E402

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


def _sorted_df(ds) -> pd.DataFrame:
    df = ds.to_pandas()
    return (
        df.sort_values(list(df.columns))
        .reset_index(drop=True)
        .astype(str)
    )


def test_semi_join_shuffle_matches_broadcast():
    from theoremkb_ray.pipelines.relational import q_semi_join

    b = _sorted_df(q_semi_join(SF_DIR, shuffle=False))
    s = _sorted_df(q_semi_join(SF_DIR, shuffle=True))
    pd.testing.assert_frame_equal(b, s)


def test_anti_join_shuffle_matches_broadcast():
    from theoremkb_ray.pipelines.relational import q_anti_join

    b = _sorted_df(q_anti_join(SF_DIR, shuffle=False))
    s = _sorted_df(q_anti_join(SF_DIR, shuffle=True))
    pd.testing.assert_frame_equal(b, s)


def test_hash_join_semi_anti_small():
    """semi + anti partition the left side exactly."""
    from theoremkb_ray.stages.joins import hash_join

    left = rd.from_arrow(
        pa.table({"k": pa.array([1, 2, 3, 4, 5]), "v": pa.array(list("abcde"))})
    )
    right = rd.from_arrow(pa.table({"k": pa.array([2, 4, 9])}))
    semi = hash_join(left, right, on=["k"], how="semi").to_pandas()
    anti = hash_join(left, right, on=["k"], how="anti").to_pandas()
    assert sorted(semi["k"]) == [2, 4]
    assert sorted(anti["k"]) == [1, 3, 5]
    assert len(semi) + len(anti) == 5


def test_broadcast_join_autoswitch(ray_session, monkeypatch):
    """Above max_broadcast_bytes the broadcast plan must route to the
    hash-partitioned join — same rows, no oversized ray.put."""
    from theoremkb_ray.stages import joins

    left = rd.from_arrow(
        pa.table(
            {"k": pa.array([1, 2, 3, 4, 4], pa.int64()),
             "v": pa.array(list("abcde"))}
        )
    )
    right = pa.table(
        {"rk": pa.array([2, 4, 5], pa.int64()),
         "w": pa.array(["x", "y", "z"])}
    )

    def run(**kw):
        return (
            joins.broadcast_join(left, right, on=["k"], right_on=["rk"], **kw)
            .to_pandas()
            .sort_values(["k", "v"])
            .reset_index(drop=True)[["k", "v", "rk", "w"]]
        )

    base = run()  # broadcast plan (side is tiny)

    calls = []
    real_hash_join = joins.hash_join

    def spy(*a, **kw):
        calls.append(1)
        return real_hash_join(*a, **kw)

    monkeypatch.setattr(joins, "hash_join", spy)
    switched = run(max_broadcast_bytes=1)  # force the switch
    assert calls, "auto-switch did not route to hash_join"
    pd.testing.assert_frame_equal(base, switched)


def test_broadcast_join_autoswitch_semi_anti(ray_session):
    from theoremkb_ray.stages import joins

    left = rd.from_arrow(
        pa.table({"k": pa.array([1, 2, 3, 4], pa.int64())})
    )
    right = pd.DataFrame({"k": [2, 4]})
    for how, want in (("semi", [2, 4]), ("anti", [1, 3])):
        out = (
            joins.broadcast_join(
                left, right, on=["k"], how=how, max_broadcast_bytes=1
            )
            .to_pandas()["k"]
            .sort_values()
            .tolist()
        )
        assert out == want
