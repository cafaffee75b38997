"""Device execution: fused single-chip pipeline step and multi-chip mesh sharding."""
