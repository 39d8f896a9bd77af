"""Pose-graph state, factors, and the Gauss-Newton/LM solver."""
