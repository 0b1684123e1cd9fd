"""Checkpoint manifests + lineage (replaces the reference's SQLite/CSV
cumulative checkpoints; reference: Styling/tools/theoremdb/extract_graph.py:334)."""
