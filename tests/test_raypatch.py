"""Regression: Dataset.join vs schema-less empty blocks.

Ray 2.49's hash-shuffle join broadcasts each input's schema exactly
once, via the FIRST submitted block. Sort-based groupby reduce tasks
emit 0-row blocks with ZERO columns; when one of those is submitted
first, the broadcast disseminates an empty schema and any partition
that receives rows from only the other side crashes Acero with
"No match or multiple matches for key field reference ...". The crash
is partitioning-dependent (passed at num_cpus=8, failed at 32 on
exact_ngram_dup_edges' pair<->size join), i.e. exactly the
nondeterminism-under-parallelism class this repo must not have.
state/raypatch.py installs the fix; this is its pinned repro:
WITHOUT the patch the join below raises ArrowInvalid deterministically
(0-col block first + left keys sparse enough to leave partitions
right-only)."""

import pyarrow as pa
import ray.data as rd

from theoremkb_ray.state.raypatch import apply_join_patch


def test_join_schemaless_empty_first_block(ray_session):
    apply_join_patch()  # idempotent; session imports likely did it
    left = rd.from_arrow(
        [
            pa.table({}),  # 0-row, 0-column — the poison block
            pa.table({"a": ["k0", "k1"], "v": [1, 2]}),
        ]
    )
    right = rd.from_arrow(
        pa.table(
            {"a": [f"k{i}" for i in range(200)], "w": list(range(200))}
        )
    )
    out = (
        left.join(right, join_type="inner", num_partitions=8, on=("a",))
        .to_pandas()
        .sort_values("a")
        .reset_index(drop=True)
    )
    assert list(out["a"]) == ["k0", "k1"]
    assert list(out["v"]) == [1, 2]
    assert list(out["w"]) == [0, 1]


def test_join_all_empty_side_still_short_circuited(ray_session):
    """A FULLY schema-less empty side remains unjoinable at the Ray
    level — call sites must short-circuit zero-row sides (see
    delta.select_delta); pin that the patch does not silently change
    that contract by dropping every bundle."""
    apply_join_patch()
    left = rd.from_arrow(pa.table({"a": ["k0"], "v": [1]}))
    right = rd.from_arrow(pa.table({"a": ["k0"], "w": [2]}))
    out = left.join(right, join_type="inner", num_partitions=4, on=("a",)).to_pandas()
    assert len(out) == 1
