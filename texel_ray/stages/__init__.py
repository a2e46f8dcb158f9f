"""Ray Data stages: vectorized map_batches kernels and actor-pool stages."""
