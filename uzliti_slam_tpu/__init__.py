"""uzliti_slam_tpu — TPU-native visual graph-SLAM trajectory-optimization engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
uzliti_slam ROS stack (multi-camera RGB-D graph SLAM): batched feature
extraction, Hamming matching on the MXU, vectorized RANSAC edge estimation,
robust SE3 Gauss-Newton/LM pose-graph optimization with a block-sparse PCG
solver, place recognition, scope windowing / node merging, occupancy-grid
projection, and graph persistence — all as functionally-pure array programs
shardable over TPU device meshes.
"""

__version__ = "0.1.0"

from uzliti_slam_tpu.ops import lie  # noqa: F401
