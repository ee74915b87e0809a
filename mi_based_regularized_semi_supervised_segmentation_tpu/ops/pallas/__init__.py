"""Pallas TPU kernels for the hot custom ops (displaced-MI joint)."""
