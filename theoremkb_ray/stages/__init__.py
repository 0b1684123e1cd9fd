"""Batch-transform stages (each compiles to ``Dataset.map_batches``)."""
