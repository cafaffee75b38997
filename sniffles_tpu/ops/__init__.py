"""Compute kernels: host exact implementations + JAX/Pallas device kernels."""
