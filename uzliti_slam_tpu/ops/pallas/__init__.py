"""Pallas TPU kernels for the hot ops (bitwise matching, raycast)."""
