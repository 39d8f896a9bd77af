"""Multi-chip / multi-host parallelism: edge-sharded solves, instance batching."""
