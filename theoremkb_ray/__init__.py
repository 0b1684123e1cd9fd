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
