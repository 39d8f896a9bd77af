"""Batched numerical kernels: Lie algebra, matching, RANSAC, ICP, features."""
