"""Targeted runtime patch for a Ray 2.49.2 hash-shuffle bug that
breaks ``Dataset.join`` under unlucky block scheduling.

The bug (``ray/data/_internal/execution/operators/hash_shuffle.py``):
the shuffle operator asks exactly ONE block per join input to fan an
empty schema-carrying shard out to every aggregator partition
(``send_empty_blocks=True``) and immediately marks the schema as
broadcast. But ``_shuffle_block`` early-returns on ``num_rows == 0``
BEFORE that fan-out — so if the block chosen to broadcast the schema
happens to be empty (filters, groupbys and selective map stages emit
0-row blocks routinely), partitions that receive no real rows from
that side build a SCHEMA-LESS empty table, and Acero fails the join
with "No match or multiple matches for key field reference ...".

The failure is partitioning-dependent (needs an empty block scheduled
first AND a partition that gets rows only from the other side), which
is exactly the nondeterminism-under-parallelism class this repo
promises not to have: the same query that passes at ``num_cpus=8``
crashes at 32. Seen live on ``exact_ngram_dup_edges``'s pair<->size
join at sf0.01/32cpus.

Fix: replace ``hash_shuffle._shuffle_block`` with a wrapper that
handles the empty+broadcast case (fan the empty schema shard to every
partition, mirroring the non-empty path's dissemination) and defers
everything else to the ORIGINAL implementation. Strictly a superset
of upstream behavior; idempotent; no-op once upstream fixes it.
"""

from __future__ import annotations

import ray

_PATCHED = False


def apply_join_patch() -> None:
    """Install the schema-broadcast fix (idempotent, driver-side).

    Must run before a ``Dataset.join`` plan executes; importing any of
    the join-using stage modules triggers it."""
    global _PATCHED
    if _PATCHED:
        return
    from ray.data._internal.execution.operators import hash_shuffle as hs

    orig_fn = hs._shuffle_block._function

    @ray.remote
    def _shuffle_block_schema_safe(
        block,
        input_index,
        key_columns,
        pool,
        block_transformer=None,
        send_empty_blocks=False,
        override_partition_id=None,
    ):
        from ray.data._internal.execution.operators.hash_shuffle import (
            _create_empty_table,
        )
        from ray.data._internal.table_block import TableBlockAccessor
        from ray.data.block import BlockAccessor, BlockExecStats, BlockType

        stats = BlockExecStats.builder()
        if block_transformer is not None:
            block = block_transformer(block)
        block = TableBlockAccessor.try_convert_block_type(
            block, block_type=BlockType.ARROW
        )
        if block.num_rows == 0 and send_empty_blocks:
            # the upstream early-return would swallow the one-shot
            # schema broadcast — disseminate it here instead
            shard = _create_empty_table(block.schema)
            pending = []
            for pid in range(pool.num_partitions):
                agg = pool.get_aggregator_for_partition(pid)
                ref = ray.put(shard)
                pending.append(agg.submit.remote(input_index, pid, ref))
            while pending:
                _ready, pending = ray.wait(
                    pending, num_returns=len(pending), timeout=1
                )
            meta = BlockAccessor.for_block(block).get_metadata(
                exec_stats=stats.build()
            )
            return (meta, {})
        # non-empty (or non-broadcast) path: original implementation,
        # transformer already applied above
        return orig_fn(
            block,
            input_index,
            key_columns,
            pool,
            block_transformer=None,
            send_empty_blocks=send_empty_blocks,
            override_partition_id=override_partition_id,
        )

    hs._shuffle_block = _shuffle_block_schema_safe

    # Second half of the fix, driver-side: sort-based groupby reduce
    # tasks emit 0-row blocks with ZERO COLUMNS (the executor's
    # "produced a RefBundle with a different schema ... new schema: ."
    # warning). If such a block is the first one submitted for a join
    # input, the one-shot broadcast disseminates an EMPTY schema —
    # which is how the left side of ngram's pair<->size join ended up
    # with [] columns at 32 CPUs. Schema-less empty bundles carry no
    # rows and no schema, so dropping them before submission is
    # loss-free and leaves the broadcast flag for a real block.
    orig_add = hs.HashShufflingOperatorBase._do_add_input_inner

    def _do_add_input_skip_schemaless(self, input_bundle, input_index):
        schema = input_bundle.schema
        names = getattr(
            schema, "names", getattr(getattr(schema, "base_schema", None), "names", None)
        )
        if not names and all(
            (m.num_rows or 0) == 0 for m in input_bundle.metadata
        ):
            return
        return orig_add(self, input_bundle, input_index)

    hs.HashShufflingOperatorBase._do_add_input_inner = (
        _do_add_input_skip_schemaless
    )
    _PATCHED = True


_PANDAS_PATCHED = False


def apply_empty_to_pandas_patch() -> None:
    """Ray 2.49.2 ``Dataset.to_pandas()`` returns a ZERO-COLUMN frame
    for an empty dataset even when the dataset carries a schema
    (empty blocks are skipped during collection), so every typed-empty
    result this repo deliberately returns (exact_dedup, kgquery's
    ``empty_schema`` paths, bgp_query) loses its columns exactly when
    a caller would select on them. Wrap to_pandas: when the collected
    frame has no columns but the dataset schema does, return a typed
    empty frame built from the schema instead. Idempotent; defers to
    the original in every non-empty case."""
    global _PANDAS_PATCHED
    if _PANDAS_PATCHED:
        return
    from ray.data import Dataset

    orig = Dataset.to_pandas

    def to_pandas_typed_empty(self, *args, **kwargs):
        df = orig(self, *args, **kwargs)
        if len(df.columns) == 0 and len(df) == 0:
            # fetch_if_missing: to_pandas just executed the plan, so
            # the schema is already resolved (or trivially resolvable)
            schema = self.schema(fetch_if_missing=True)
            base = getattr(schema, "base_schema", None)
            if base is not None and getattr(base, "names", None):
                try:
                    return base.empty_table().to_pandas()
                except Exception:
                    return df
        return df

    Dataset.to_pandas = to_pandas_typed_empty
    _PANDAS_PATCHED = True
