"""Pallas TPU kernels for the hot sequential paths."""
