"""theoremkb_ray — a from-scratch Ray-Data-native KG-construction engine.

Re-expresses the query/data-processing capabilities of the TheoremKB
reference (PierreSenellart/theoremkb, snapshot at /root/reference) as
streaming ``ray.data.Dataset`` pipelines over zero-copy Arrow batches:

    corpus parquet -> ingest (doc_id + sha256 invariant)
                   -> tokenize (per-document line/token list columns)
                   -> features (vectorized per-line feature kernels)
                   -> segment (CRF actor pool / naive scan)
                   -> stitch (spans -> results -> (s,p,o) triples)
                   -> mentions (regex reference extraction)
                   -> link (broadcast citation join + minhash-LSH)
                   -> canonicalize (groupby min-label union-find)
                   -> materialize (sorted partitioned parquet + manifests)

No code is ported from the reference; file:line citations in docstrings
point at the behavior being re-expressed, for parity checking only.

IMPORTANT: nothing in this package calls ``ray.init()`` — the driver,
``bench.py`` and the pytest session fixture own the Ray session.
"""

__version__ = "0.1.0"

import logging as _logging


class _SchemaHashNoise(_logging.Filter):
    """Drop Ray Data's harmless 'Failed to hash the schemas (for
    deduplication)' warning: our span/feature struct columns carry
    nested metadata Ray's schema-dedup cache can't hash; the warning
    is advisory (the dedup cache is an optimization) and fires once
    per unioned block otherwise."""

    def filter(self, record: _logging.LogRecord) -> bool:  # noqa: A003
        return "Failed to hash the schemas" not in record.getMessage()


_logging.getLogger(
    "ray.data._internal.arrow_ops.transform_pyarrow"
).addFilter(_SchemaHashNoise())
