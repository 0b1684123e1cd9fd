"""Vectorized scalar/array kernels used inside map_batches stages."""
